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
