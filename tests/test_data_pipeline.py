"""Data pipeline: shard IO, processors, batching, collation + ctc_utils."""
import io
import json
import tarfile
import wave

import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.data import pipeline as pl
from paper_accurate_fast_cheap_tpu.ops import ctc_utils
from paper_accurate_fast_cheap_tpu.text.tokenizers import WhitespaceTokenizer


def _wav_bytes(samples, sr=16000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((samples * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


@pytest.fixture
def tar_shard(tmp_path):
    rng = np.random.RandomState(0)
    path = tmp_path / "shard0.tar"
    with tarfile.open(path, "w") as tf:
        for i in range(4):
            key = f"utt{i}"
            wav = _wav_bytes(rng.randn(16000 + i * 4000) * 0.1)
            for ext, data in ((f"txt", f"hello world {i}".encode()),
                              ("wav", wav)):
                info = tarfile.TarInfo(f"{key}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    return str(path)


@pytest.fixture
def tok():
    vocab = {"<unk>": 0, "hello": 1, "world": 2, "0": 3, "1": 4, "2": 5,
             "3": 6, "<sw>": 7}
    return WhitespaceTokenizer(vocab)


def test_tar_shard_roundtrip(tar_shard, tok):
    samples = list(pl.decode_wav(pl.tar_shard_source([tar_shard])))
    assert len(samples) == 4
    assert samples[0]["key"] == "utt0"
    assert samples[0]["sample_rate"] == 16000
    assert len(samples[1]["wav"]) == 20000


def test_build_dataset_batches(tar_shard, tmp_path, tok):
    lst = tmp_path / "shards.txt"
    lst.write_text(tar_shard + "\n")
    conf = {
        "filter_conf": {"max_length": 40000, "min_length": 1},
        "batch_conf": {"batch_type": "static", "batch_size": 2},
        "shuffle": False,
    }
    batches = list(pl.build_dataset("shard", str(lst), tok, conf,
                                    mode="train"))
    assert len(batches) == 2
    b = batches[0]
    assert b["wavs"].shape[0] == 2
    assert b["wavs"].shape[1] % 16000 == 0  # bucketed pad
    assert (b["wav_lens"] > 0).all()
    assert b["labels"].shape[1] == 16
    # sorted desc within batch
    assert b["wav_lens"][0] >= b["wav_lens"][1]


def test_raw_source_with_segments(tmp_path, tok):
    rng = np.random.RandomState(1)
    wav_path = tmp_path / "a.wav"
    wav_path.write_bytes(_wav_bytes(rng.randn(32000) * 0.1))
    lst = tmp_path / "raw.list"
    lst.write_text(json.dumps({
        "key": "seg1", "wav": str(wav_path), "txt": "hello",
        "start": 0.5, "end": 1.5,
    }) + "\n")
    samples = list(pl.decode_wav(pl.raw_source(str(lst))))
    assert len(samples[0]["wav"]) == 16000


def test_dynamic_batch_budget():
    samples = [
        {"key": f"u{i}", "wav": np.zeros(16000 * (1 + i % 3)),
         "sample_rate": 16000, "label": np.asarray([1])}
        for i in range(10)
    ]
    batches = list(pl.dynamic_batch(iter(samples), max_frames_in_batch=500))
    for b in batches:
        longest = max(
            pl.compute_num_frames(len(s["wav"]), 16000) for s in b
        )
        assert longest * len(b) <= 500 or len(b) == 1


def test_merge_utterances_budget_and_sw():
    sr = 16000
    samples = [
        {"key": f"u{i}", "wav": np.zeros(sr * 30, np.float32),
         "sample_rate": sr, "txt": f"t{i}", "job": "j0"}
        for i in range(6)
    ]
    out = list(pl.merge_utterances(iter(samples), min_sec=75, max_sec=85))
    assert len(out) == 2
    assert "<sw>" in out[0]["txt"]
    assert len(out[0]["wav"]) == sr * 90  # 3 x 30s (85 cap hit after >= 75)


def test_speed_perturb_changes_length():
    import random

    s = {"key": "u", "wav": np.zeros(16000, np.float32),
         "sample_rate": 16000}
    outs = [list(pl.speed_perturb(iter([s]),
                                  rng=random.Random(seed)))[0]
            for seed in range(10)]
    lens = {len(o["wav"]) for o in outs}
    assert len(lens) > 1  # at least one non-1.0 speed drawn


def test_force_align_and_spans():
    # 6 frames, vocab 4, labels [1, 2]
    logp = np.log(np.full((6, 4), 0.01))
    peaks = {0: 0, 1: 1, 2: 0, 3: 2, 4: 0, 5: 0}
    for t, v in peaks.items():
        logp[t, v] = 0.0
    ali = ctc_utils.force_align(logp, [1, 2])
    assert ctc_utils.remove_duplicates_and_blank(ali) == [1, 2]
    spans = ctc_utils.alignment_to_token_spans(ali)
    assert [s[0] for s in spans] == [1, 2]
    assert spans[0][1] == 1 and spans[1][1] == 3


def test_gen_timestamps_from_peak():
    times = ctc_utils.gen_timestamps_from_peak([5, 10, 50], 10.0,
                                               frame_rate=0.04)
    assert len(times) == 3
    for (s, e), p in zip(times, [5, 10, 50]):
        assert s <= p * 0.04 <= e
        assert e - s <= 1.0 + 1e-6
