"""Full recipe smoke: the examples/gigaspeech/run.sh stage flow on synthetic
data — make_shard -> compute_cmvn -> train (with global_cmvn) ->
average_model -> recognize -> compute_wer."""
import numpy as np
import pytest
import yaml

from tests.test_train_cli import _wav_bytes


@pytest.mark.parametrize("seed", [0])
def test_recipe_stages(tmp_path, seed):
    from paper_accurate_fast_cheap_tpu.bin.average_model import (
        main as avg_main,
    )
    from paper_accurate_fast_cheap_tpu.bin.compute_cmvn_stats import (
        main as cmvn_main,
    )
    from paper_accurate_fast_cheap_tpu.bin.compute_wer import (
        main as wer_main,
    )
    from paper_accurate_fast_cheap_tpu.bin.make_shard import (
        main as shard_main,
    )
    from paper_accurate_fast_cheap_tpu.bin.recognize import (
        main as rec_main,
    )
    from paper_accurate_fast_cheap_tpu.bin.train import main as train_main

    rng = np.random.RandomState(seed)
    data = tmp_path / "data"
    data.mkdir()
    texts = {}
    for i in range(4):
        key = f"utt{i}"
        (data / f"{key}.wav").write_bytes(
            _wav_bytes(rng.randn(8000) * 0.05))
        texts[key] = ["a b", "b c", "c a", "a c b"][i]
    (data / "wav.scp").write_text(
        "".join(f"utt{i} {data}/utt{i}.wav\n" for i in range(4)))
    (data / "text").write_text(
        "".join(f"utt{i} {texts[f'utt{i}']}\n" for i in range(4)))

    # stage 0: shards
    assert shard_main([
        "--wav_scp", str(data / "wav.scp"), "--text", str(data / "text"),
        "--output_dir", str(data / "shards"), "--num_utts_per_shard", "4",
    ]) == 0
    shards = str(data / "shards" / "shards.txt")

    # stage 1: cmvn
    assert cmvn_main([
        "--data", shards, "--data_type", "shard",
        "--num_mel_bins", "23", "--out_cmvn", str(data / "global_cmvn"),
    ]) == 0

    # stage 2: train (with cmvn wired through the config)
    units = data / "units.txt"
    units.write_text("<blank> 0\n<unk> 1\na 2\nb 3\nc 4\n<sos> 5\n")
    config = {
        "encoder": "conformer",
        "encoder_conf": {
            "output_size": 32, "attention_heads": 2, "linear_units": 64,
            "num_blocks": 1, "dropout_rate": 0.0,
            "selfattention_layer_type": "rwkv_tmix60_bidirectional",
            "input_layer": "conv2d",
        },
        "tokenizer": "whitespace",
        "tokenizer_conf": {"symbol_table_path": str(units),
                           "special_tokens": {"<sos>": 5, "<eos>": 5}},
        "model": "asr_model",
        "model_conf": {"ctc_weight": 1.0},
        "cmvn": "global_cmvn",
        "cmvn_conf": {"cmvn_file": str(data / "global_cmvn"),
                      "is_json_cmvn": True},
        "dataset_conf": {
            "fbank_conf": {"num_mel_bins": 23, "dither": 0.0},
            "filter_conf": {"max_length": 2000, "min_length": 1},
            "batch_conf": {"batch_type": "static", "batch_size": 4},
            "shuffle": False,
        },
        "grad_clip": 5.0, "optim": "adam", "optim_conf": {"lr": 3e-3},
        "scheduler": "steadylr", "scheduler_conf": {"warmup_steps": 5},
        "max_epoch": 2, "log_interval": 5,
    }
    (tmp_path / "cfg.yaml").write_text(yaml.safe_dump(config))
    exp = tmp_path / "exp"
    assert train_main([
        "--config", str(tmp_path / "cfg.yaml"),
        "--train_data", shards, "--data_type", "shard",
        "--model_dir", str(exp), "--num_epochs", "2",
    ]) == 0

    # stage 3: average the two epoch checkpoints
    assert avg_main([
        "--src_path", str(exp), "--dst_path", str(exp / "avg"),
        "--num", "2", "--config", str(exp / "train.yaml"),
    ]) == 0

    # stage 4: decode + WER
    assert rec_main([
        "--config", str(exp / "train.yaml"),
        "--checkpoint", str(exp / "avg"),
        "--test_data", shards, "--data_type", "shard",
        "--result_dir", str(exp / "results"),
        "--modes", "ctc_greedy_search", "--batch_size", "4",
    ]) == 0
    hyp = exp / "results" / "ctc_greedy_search" / "text"
    assert hyp.exists()
    rc = wer_main([str(data / "text"), str(hyp), "--giga"])
    assert rc == 0


def test_latency_alignment_comparison():
    """`tools/latency_metrics.py:206-274`: forced-alignment comparison —
    tolerance skip, token-count skip, and delay percentile report."""
    from paper_accurate_fast_cheap_tpu.tools import latency_metrics as lm

    # alignment: token every 4th 10ms frame; emissions one encoder frame
    # (40 ms) late
    aligns = {
        "u1": ["<blank>", "a", "<blank>", "<blank>", "b", "<blank>",
               "<blank>", "<blank>"],
        "u2": ["a"] + ["<blank>"] * 50,          # frame count mismatch
        "u3": ["<blank>", "a", "<blank>", "<blank>"],  # token mismatch
    }
    timestamps = {
        "u1": [5, 7],    # tokens at enc frames 0 and 1 (8 fa frames ~ 2*4)
        "u2": [5],       # 1*4 st frames vs 51 fa frames -> ignored
        "u3": [0],       # zero emissions vs one aligned token -> unequal
    }
    per_utt, counters = lm.compare_with_alignment(
        timestamps, aligns, subsampling=4)
    assert counters["valid"] == 1
    assert counters["ignored"] == 1        # u2 frame-count mismatch
    assert counters["len_unequal"] == 1    # u3
    # u1: fa times [10, 40]; st times [0, 40] -> delays [-10, 0]
    u = per_utt[0]
    assert u.first_token == -10.0 and u.last_token == 0.0
    rep = lm.latency_report(per_utt)
    assert "p90" in rep["first_token"]
    lm.print_report(per_utt)  # smoke
