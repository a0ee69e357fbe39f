"""Decode CLIs (recognize, recognize_wav, average_model, encoder_rtf) on a
tiny trained model."""
import io
import tarfile
import wave

import numpy as np
import pytest
import yaml

from tests.test_train_cli import _wav_bytes, workspace  # noqa: F401


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train the tiny model ONCE per module (training is the slow part)."""
    from tests.test_train_cli import workspace as ws_fixture  # noqa

    tmp_path = tmp_path_factory.mktemp("decode_cli")
    # materialize the workspace fixture body manually for module scope
    ws = ws_fixture.__wrapped__(tmp_path)
    from paper_accurate_fast_cheap_tpu.bin.train import main

    model_dir = ws / "exp"
    rc = main([
        "--config", str(ws / "train.yaml"),
        "--train_data", str(ws / "shards.txt"),
        "--data_type", "shard",
        "--model_dir", str(model_dir),
        "--num_epochs", "1",
    ])
    assert rc == 0
    return ws, model_dir


def test_recognize_cli(trained):
    from paper_accurate_fast_cheap_tpu.bin.recognize import main

    workspace, model_dir = trained
    result_dir = workspace / "results"
    rc = main([
        "--config", str(model_dir / "train.yaml"),
        "--test_data", str(workspace / "shards.txt"),
        "--data_type", "shard",
        "--checkpoint", str(model_dir / "epoch_0000"),
        "--result_dir", str(result_dir),
        "--modes", "ctc_greedy_search", "ctc_prefix_beam_search",
        "attention_rescoring",
        "--batch_size", "2", "--beam_size", "3",
    ])
    assert rc == 0
    for mode in ("ctc_greedy_search", "ctc_prefix_beam_search",
                 "attention_rescoring"):
        text = (result_dir / mode / "text").read_text()
        lines = text.strip().split("\n") if text.strip() else []
        # every utterance got an output line (possibly empty hypothesis)
        keys = {ln.split()[0] for ln in lines if ln}
        assert len(text.split("\n")) >= 4 or len(keys) >= 1


def test_recognize_wav_cli(trained, tmp_path):
    from paper_accurate_fast_cheap_tpu.bin.recognize_wav import main

    workspace, model_dir = trained
    rng = np.random.RandomState(7)
    wav_path = tmp_path / "long.wav"
    wav_path.write_bytes(_wav_bytes(rng.randn(16000 * 4) * 0.05))
    out_dir = tmp_path / "lf"
    rc = main([
        "--config", str(model_dir / "train.yaml"),
        "--checkpoint", str(model_dir / "epoch_0000"),
        "--wav", str(wav_path),
        "--output_dir", str(out_dir),
        "--chunk_size", "120", "--batch_size", "2",
    ])
    assert rc == 0
    assert (out_dir / "long.txt").exists()
    assert (out_dir / "long.ctm").exists()
    rtf = (out_dir / "long.rtf").read_text()
    assert "final_rtf" in rtf
    # CTM lines well-formed: name ch start dur word
    for ln in (out_dir / "long.ctm").read_text().strip().split("\n"):
        if not ln:
            continue
        parts = ln.split()
        assert len(parts) == 5
        assert float(parts[3]) >= 0

    # --fuse split (encoder-chain jit + standalone beam program, the
    # wide-batch auto mode) must produce the same transcript/CTM
    out_dir2 = tmp_path / "lf_split"
    rc = main([
        "--config", str(model_dir / "train.yaml"),
        "--checkpoint", str(model_dir / "epoch_0000"),
        "--wav", str(wav_path),
        "--output_dir", str(out_dir2),
        "--chunk_size", "120", "--batch_size", "2",
        "--fuse", "split", "--precision", "fp32",
    ])
    assert rc == 0
    base = main([
        "--config", str(model_dir / "train.yaml"),
        "--checkpoint", str(model_dir / "epoch_0000"),
        "--wav", str(wav_path),
        "--output_dir", str(tmp_path / "lf_off"),
        "--chunk_size", "120", "--batch_size", "2",
        "--fuse", "off", "--precision", "fp32",
    ])
    assert base == 0
    assert ((out_dir2 / "long.txt").read_text()
            == (tmp_path / "lf_off" / "long.txt").read_text())
    assert ((out_dir2 / "long.ctm").read_text()
            == (tmp_path / "lf_off" / "long.ctm").read_text())


def test_average_model_cli(trained):
    from paper_accurate_fast_cheap_tpu.bin.average_model import main

    workspace, model_dir = trained
    rc = main([
        "--src_path", str(model_dir),
        "--dst_path", str(workspace / "avg"),
        "--num", "1",
        "--config", str(model_dir / "train.yaml"),
    ])
    assert rc == 0
    assert (workspace / "avg").is_dir()


def test_encoder_rtf_cli(trained, tmp_path):
    from paper_accurate_fast_cheap_tpu.bin.encoder_rtf import main

    workspace, model_dir = trained
    out = tmp_path / "bench.rtf"
    rc = main([
        "--config", str(model_dir / "train.yaml"),
        "--chunk_size", "200", "--batch_size", "1",
        "--warmup", "1", "--iters", "2",
        "--no-bf16",
        "--output", str(out),
    ])
    assert rc == 0
    txt = out.read_text()
    assert "final_rtf" in txt and "minutes_audio_per_sec" in txt


def test_python_api_transcribe(trained, tmp_path):
    from paper_accurate_fast_cheap_tpu.api import load_model

    workspace, model_dir = trained
    model = load_model(str(model_dir))
    rng = np.random.RandomState(11)
    wav_path = tmp_path / "u.wav"
    wav_path.write_bytes(_wav_bytes(rng.randn(8000) * 0.05))
    out = model.transcribe(str(wav_path), tokens_info=True)
    assert "text" in out and isinstance(out["text"], str)
    assert "tokens" in out and "times" in out
    # array input works too
    out2 = model.transcribe(rng.randn(8000).astype(np.float32) * 0.05)
    assert "text" in out2


def test_make_shard_and_cmvn_tools(tmp_path):
    from paper_accurate_fast_cheap_tpu.bin.compute_cmvn_stats import (
        main as cmvn_main,
    )
    from paper_accurate_fast_cheap_tpu.bin.make_shard import (
        main as shard_main,
    )
    from paper_accurate_fast_cheap_tpu.frontend.cmvn import load_cmvn_json

    rng = np.random.RandomState(3)
    wavs = {}
    for i in range(3):
        p = tmp_path / f"w{i}.wav"
        p.write_bytes(_wav_bytes(rng.randn(8000) * 0.05))
        wavs[f"utt{i}"] = str(p)
    (tmp_path / "wav.scp").write_text(
        "".join(f"{k} {v}\n" for k, v in wavs.items()))
    (tmp_path / "text").write_text(
        "".join(f"utt{i} hello {i}\n" for i in range(3)))
    out_dir = tmp_path / "shards"
    rc = shard_main([
        "--wav_scp", str(tmp_path / "wav.scp"),
        "--text", str(tmp_path / "text"),
        "--output_dir", str(out_dir),
        "--num_utts_per_shard", "2",
    ])
    assert rc == 0
    shards = (out_dir / "shards.txt").read_text().strip().split("\n")
    assert len(shards) == 2

    rc = cmvn_main([
        "--data", str(out_dir / "shards.txt"),
        "--data_type", "shard",
        "--num_mel_bins", "23",
        "--out_cmvn", str(tmp_path / "cmvn.json"),
    ])
    assert rc == 0
    mean, istd = load_cmvn_json(str(tmp_path / "cmvn.json"))
    assert mean.shape == (23,) and np.isfinite(mean).all()


def test_lf_sweep_driver(trained, tmp_path):
    """examples/gigaspeech/local/run_lf_sweep.py end-to-end on synthetic
    audio: chunk-size sweep -> per-chunk summary.txt + top-level table
    (shape of `go-LF-dev-one-model-paper.sh:90-124`), including the
    --rwkv_r / --verbatimicity paper flags and a flac input."""
    import importlib.util

    from paper_accurate_fast_cheap_tpu.data.flac import encode_flac

    workspace, model_dir = trained
    spec = importlib.util.spec_from_file_location(
        "run_lf_sweep", "examples/gigaspeech/local/run_lf_sweep.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.RandomState(3)
    wav_dir = tmp_path / "eps"
    wav_dir.mkdir()
    (wav_dir / "ep1.wav").write_bytes(_wav_bytes(rng.randn(16000 * 3) * 0.05))
    (wav_dir / "ep2.flac").write_bytes(
        encode_flac((rng.randn(16000 * 2) * 0.05).astype(np.float32), 16000))
    (wav_dir / "ep1.ref_txt").write_text("hello world\n")
    (wav_dir / "ep2.ref_txt").write_text("hello\n")
    out_dir = tmp_path / "lf_sweep"
    rc = mod.main([
        "--config", str(model_dir / "train.yaml"),
        "--checkpoint", str(model_dir / "epoch_0000"),
        "--wav_dir", str(wav_dir), "--out_dir", str(out_dir),
        "--chunk_sizes", "120,200", "--mode", "ctc_greedy_search",
        "--batch_size", "2", "--rwkv_r", "1024",
    ])
    assert rc == 0
    top = (out_dir / "summary.txt").read_text().strip().split("\n")
    assert top[0].startswith("chunk_frames wer")
    assert len(top) == 3  # header + 2 chunk sizes
    for chunk in (120, 200):
        s = (out_dir / f"chunk{chunk}" / "summary.txt").read_text()
        assert "wer" in s and "num_files 2" in s


def test_segments_to_files(tmp_path):
    from paper_accurate_fast_cheap_tpu.bin import data_tools

    inp = tmp_path / "text"
    inp.write_text(
        "fileA_001 hello there\nfileA_002 again\nfileB_001 other\n")
    out = tmp_path / "refs"
    rc = data_tools.main([
        "segments_to_files", "--input", str(inp),
        "--out_dir", str(out), "--ext", ".ref_txt"])
    assert rc == 0
    assert (out / "fileA.ref_txt").read_text().split() == \
        ["hello", "there", "again"]
    assert (out / "fileB.ref_txt").read_text().split() == ["other"]


def test_segment_scp_and_gigaspeech_meta(tmp_path):
    import json

    from paper_accurate_fast_cheap_tpu.bin import data_tools

    scp = tmp_path / "wav.scp"
    scp.write_text("recA /x/a.wav\n")
    seg = tmp_path / "segments"
    seg.write_text("recA_001 recA 0.0 1.5\nrecA_002 recA 1.5 3.0\n")
    out = tmp_path / "seg.scp"
    assert data_tools.main(["segment_scp", "--segments", str(seg),
                            "--input", str(scp),
                            "--output", str(out)]) == 0
    assert out.read_text().splitlines() == [
        "recA_001 /x/a.wav,0.0,1.5", "recA_002 /x/a.wav,1.5,3.0"]

    # gigaspeech meta extraction
    audio = tmp_path / "audio.opus"
    audio.write_bytes(b"x")
    meta = {"audios": [{
        "aid": "POD1", "path": audio.name, "duration": 12.5,
        "format": "opus", "sample_rate": 16000,
        "segments": [{"sid": "POD1_S1", "begin_time": 0.0,
                      "end_time": 4.0, "text_tn": "HELLO WORLD",
                      "subsets": ["{XL}", "{DEV}"]}],
    }]}
    mj = tmp_path / "GigaSpeech.json"
    mj.write_text(json.dumps(meta))
    od = tmp_path / "meta"
    assert data_tools.main(["gigaspeech_meta", "--input_json", str(mj),
                            "--output_dir", str(od)]) == 0
    assert (od / "text").read_text() == "POD1_S1\tHELLO WORLD\n"
    assert (od / "segments").read_text() == "POD1_S1\tPOD1\t0.0\t4.0\n"
    assert "POD1" in (od / "wav.scp").read_text()
    assert (od / "utt2subsets").read_text() == "POD1_S1\t{XL} {DEV}\n"


def test_decode_rtf_cli(tmp_path):
    """bin/decode_rtf.py: end-to-end decode benchmark (encoder + search)
    at a tiny version of the paper's SF operating point, both modes."""
    from paper_accurate_fast_cheap_tpu.bin.decode_rtf import main

    cfg = {
        "model": "transducer",
        "encoder": "conformer",
        "encoder_conf": {
            "output_size": 32, "attention_heads": 2, "linear_units": 48,
            "num_blocks": 1, "input_layer": "conv2d",
            "selfattention_layer_type": "rwkv_tmix60_bidirectional",
            "rwkv_head_size": 16,
        },
        "predictor": "rnn",
        "predictor_conf": {"embed_size": 32, "hidden_size": 32,
                           "output_size": 32, "num_layers": 1},
        "joint_conf": {"join_dim": 32},
        "model_conf": {"ctc_weight": 0.3, "transducer_weight": 0.7,
                       "attention_weight": 0.0},
        "vocab_size_for_bench": 40,
        "dataset_conf": {"fbank_conf": {"num_mel_bins": 80}},
    }
    cfg_path = tmp_path / "tiny_trans.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    for mode in ("ctc_greedy_search", "rnnt_beam_search"):
        out = tmp_path / f"{mode}.rtf"
        rc = main([
            "--config", str(cfg_path), "--mode", mode,
            "--batch_size", "2", "--chunk_size", "120",
            "--beam_size", "2", "--warmup", "1", "--iters", "2",
            "--no-bf16", "--output", str(out),
        ])
        assert rc == 0
        txt = out.read_text()
        assert "final_rtf" in txt and f"decode_{mode}" in txt

    # fused single-dispatch chain: params must ride as traced jit args
    # (regression: _search used to close over the concrete weights,
    # baking them into the fused HLO as literals)
    out = tmp_path / "fused.rtf"
    rc = main([
        "--config", str(cfg_path), "--mode", "rnnt_beam_search",
        "--batch_size", "2", "--chunk_size", "120",
        "--beam_size", "2", "--warmup", "1", "--iters", "2",
        "--no-bf16", "--fuse", "on", "--output", str(out),
    ])
    assert rc == 0
    assert "fuse on" in out.read_text()


def test_data_tools_validate(tmp_path):
    """data_tools validate: kaldi-dir and raw-list sanity checks
    (reference `tools/validate_data_dir.sh` role)."""
    from paper_accurate_fast_cheap_tpu.bin.data_tools import main as dt

    rng = np.random.RandomState(0)
    wav = tmp_path / "a.wav"
    wav.write_bytes(_wav_bytes(rng.randn(1600) * 0.05))

    d = tmp_path / "data"
    d.mkdir()
    (d / "wav.scp").write_text(f"utt1 {wav}\nutt2 {tmp_path}/missing.wav\n")
    (d / "text").write_text("utt1 hello\nutt2 world\n")
    rc = dt(["validate", "--dir", str(d), "--check_audio"])
    assert rc == 1  # missing.wav

    (d / "wav.scp").write_text(f"utt1 {wav}\nutt2 {wav}\n")
    rc = dt(["validate", "--dir", str(d), "--check_audio"])
    assert rc == 0

    raw = tmp_path / "raw.jsonl"
    import json as _json
    raw.write_text("\n".join([
        _json.dumps({"key": "u1", "wav": str(wav), "txt": "hi"}),
        _json.dumps({"key": "u1", "wav": str(wav), "txt": "dup key"}),
    ]))
    assert dt(["validate", "--data", str(raw)]) == 1
    raw.write_text(_json.dumps({"key": "u1", "wav": str(wav), "txt": "hi"}))
    assert dt(["validate", "--data", str(raw)]) == 0


def test_align_cli(trained, tmp_path):
    """bin/align.py: CTC forced alignment -> token CTM (the reference's
    tools/alignment.sh capability; its alignment.py binary is absent
    from the release)."""
    import json as _json

    from paper_accurate_fast_cheap_tpu.bin.align import main

    workspace, model_dir = trained
    rng = np.random.RandomState(5)
    wav = tmp_path / "a.wav"
    wav.write_bytes(_wav_bytes(rng.randn(16000) * 0.05))
    raw = tmp_path / "raw.jsonl"
    raw.write_text(_json.dumps(
        {"key": "utt1", "wav": str(wav), "txt": "hello world"}) + "\n")
    out = tmp_path / "ali.ctm"
    frames = tmp_path / "ali.frames"
    rc = main([
        "--config", str(model_dir / "train.yaml"),
        "--checkpoint", str(model_dir / "epoch_0000"),
        "--input_data", str(raw), "--output", str(out),
        "--frames_path", str(frames),
    ])
    assert rc == 0
    lines = out.read_text().strip().split("\n")
    assert lines and all(len(l.split()) == 5 for l in lines)
    # CTM: key channel start dur token; times monotonic non-negative
    starts = [float(l.split()[2]) for l in lines]
    assert starts == sorted(starts) and starts[0] >= 0.0
    assert frames.read_text().startswith("utt1 ")


def test_recognize_wav_seq_parallel(trained, tmp_path):
    """`recognize_wav --seq_parallel 4`: T-sharded LF decode through the
    CLI (halo'd ds4 + sp WKV) vs the single-device run on the same wav.
    Contract (tests/test_sequence_parallel.py): each window is decoded
    under +6-frame zero-pad full-length semantics; on this model the
    hypotheses match the single-device CLI output."""
    from paper_accurate_fast_cheap_tpu.bin.recognize_wav import main

    workspace, model_dir = trained
    rng = np.random.RandomState(9)
    wav_path = tmp_path / "sp.wav"
    wav_path.write_bytes(_wav_bytes(rng.randn(16000 * 4) * 0.05))
    outs = {}
    for tag, extra in (("base", []), ("sp", ["--seq_parallel", "4"])):
        out_dir = tmp_path / f"lf_{tag}"
        rc = main([
            "--config", str(model_dir / "train.yaml"),
            "--checkpoint", str(model_dir / "epoch_0000"),
            "--wav", str(wav_path),
            "--output_dir", str(out_dir),
            "--mode", "ctc_greedy_search",
            "--chunk_size", "160", "--batch_size", "2",
        ] + extra)
        assert rc == 0
        outs[tag] = (out_dir / "sp.txt").read_text()
    assert outs["sp"] == outs["base"], outs
