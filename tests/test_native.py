"""Native C++ helpers: build, correctness vs python fallbacks."""
import io
import wave

import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu import native
from paper_accurate_fast_cheap_tpu.tools import wer


@pytest.fixture(scope="module")
def native_lib():
    L = native.lib()
    if L is None:
        pytest.skip("native build unavailable")
    return L


def test_native_levenshtein_matches_python(native_lib):
    rng = np.random.RandomState(0)
    for _ in range(20):
        ref = [str(x) for x in rng.randint(0, 5, rng.randint(1, 30))]
        hyp = [str(x) for x in rng.randint(0, 5, rng.randint(1, 30))]
        st = wer.align_words(ref, hyp)  # native path
        # pure python DP for comparison
        R, H = len(ref), len(hyp)
        cost = np.zeros((R + 1, H + 1), np.int32)
        cost[:, 0] = np.arange(R + 1)
        cost[0, :] = np.arange(H + 1)
        for i in range(1, R + 1):
            for j in range(1, H + 1):
                cost[i, j] = min(
                    cost[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]),
                    cost[i - 1, j] + 1, cost[i, j - 1] + 1)
        assert st.errors == cost[R, H]
        assert st.sub + st.dele + st.ins == st.errors


def test_native_wav_parse(native_lib):
    rng = np.random.RandomState(1)
    samples = (rng.randn(5000) * 0.1).astype(np.float32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)  # stereo -> mono averaging
        w.setsampwidth(2)
        w.setframerate(22050)
        inter = np.repeat(samples, 2)
        w.writeframes((inter * 32767).astype("<i2").tobytes())
    out = native.parse_wav(buf.getvalue())
    assert out is not None
    got, sr = out
    assert sr == 22050
    assert len(got) == 5000
    np.testing.assert_allclose(got, samples, atol=2e-4)


def test_pipeline_uses_native(native_lib):
    from paper_accurate_fast_cheap_tpu.data.pipeline import _read_wav_bytes

    rng = np.random.RandomState(2)
    samples = (rng.randn(1000) * 0.1).astype(np.float32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((samples * 32767).astype("<i2").tobytes())
    wav, sr = _read_wav_bytes(buf.getvalue())
    assert sr == 16000 and len(wav) == 1000
