"""Frontend: fbank vs independent numpy oracle; CMVN; SpecAugment."""
import json

import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.frontend import augment, cmvn, features


def numpy_kaldi_fbank_oracle(wav, num_bins=80, frame_len=400, shift=160,
                             sr=16000, preemph=0.97):
    """Independent straight-line implementation of Kaldi fbank semantics
    (dither off): framing (snip_edges), DC removal, pre-emphasis with
    replicated first sample, povey window, 512-pt power FFT, Kaldi mel
    banks (1127*ln(1+f/700), low=20Hz..nyquist), ln with fp32-eps floor."""
    wav = np.asarray(wav, np.float64)
    nf = 1 + (len(wav) - frame_len) // shift
    frames = np.stack([wav[i * shift : i * shift + frame_len]
                       for i in range(nf)])
    frames = frames - frames.mean(axis=1, keepdims=True)
    prev = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames - preemph * prev
    n = np.arange(frame_len)
    window = (0.5 - 0.5 * np.cos(2 * np.pi * n / (frame_len - 1))) ** 0.85
    frames = frames * window
    fft_size = 512
    spec = np.fft.rfft(frames, n=fft_size)
    power = np.abs(spec) ** 2

    def mel(f):
        return 1127.0 * np.log1p(f / 700.0)

    low, high = 20.0, sr / 2.0
    pts = np.linspace(mel(low), mel(high), num_bins + 2)
    bin_mels = mel(np.arange(fft_size // 2) * sr / fft_size)
    banks = np.zeros((num_bins, fft_size // 2 + 1))
    for b in range(num_bins):
        up = (bin_mels - pts[b]) / (pts[b + 1] - pts[b])
        down = (pts[b + 2] - bin_mels) / (pts[b + 2] - pts[b + 1])
        banks[b, : fft_size // 2] = np.clip(np.minimum(up, down), 0, None)
    melspec = power @ banks.T
    return np.log(np.maximum(melspec, 1.1920928955078125e-07))


def test_fbank_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    wav = (rng.randn(16000) * 4000).astype(np.float32)  # 1s of int16-scale
    got = np.asarray(features.fbank(jnp.asarray(wav)))
    want = numpy_kaldi_fbank_oracle(wav)
    assert got.shape == want.shape == (98, 80)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_fbank_frame_count_semantics():
    assert features.num_frames(399) == 0
    assert features.num_frames(400) == 1
    assert features.num_frames(559) == 1
    assert features.num_frames(560) == 2


def test_fbank_batch_masks_lengths():
    rng = np.random.RandomState(1)
    wavs = jnp.asarray(rng.randn(2, 8000).astype(np.float32) * 1000)
    lens = jnp.asarray([8000, 4000])
    feats, flens = features.fbank_batch(wavs, lens)
    assert feats.shape[0] == 2 and feats.shape[2] == 80
    assert int(flens[0]) == features.num_frames(8000)
    assert int(flens[1]) == features.num_frames(4000)
    # the valid prefix of the short utterance matches its unpadded fbank
    solo = features.fbank(wavs[1][:4000])
    np.testing.assert_allclose(
        np.asarray(feats[1][: int(flens[1])]), np.asarray(solo),
        rtol=1e-4, atol=1e-4,
    )


def test_fbank_dither_reproducible():
    wav = jnp.asarray(np.random.RandomState(2).randn(4000).astype(np.float32))
    k = jax.random.PRNGKey(0)
    a = features.fbank(wav, dither=1.0, rng=k)
    b = features.fbank(wav, dither=1.0, rng=k)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cmvn_json_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    feats = rng.randn(1000, 4) * 3.0 + 5.0
    stats = {
        "mean_stat": feats.sum(0).tolist(),
        "var_stat": (feats ** 2).sum(0).tolist(),
        "frame_num": feats.shape[0],
    }
    p = tmp_path / "global_cmvn"
    p.write_text(json.dumps(stats))
    mean, istd = cmvn.load_cmvn_json(str(p))
    normed = np.asarray(cmvn.apply_cmvn(jnp.asarray(feats, jnp.float32),
                                        mean, istd))
    np.testing.assert_allclose(normed.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(normed.std(0), 1.0, atol=1e-3)


def test_cmvn_kaldi_text(tmp_path):
    mean_stat = [10.0, 20.0]
    var_stat = [60.0, 220.0]
    count = 10.0
    p = tmp_path / "cmvn.txt"
    p.write_text(f"[ {mean_stat[0]} {mean_stat[1]} {count} "
                 f"{var_stat[0]} {var_stat[1]} 0 ]")
    mean, istd = cmvn.load_cmvn_kaldi_text(str(p))
    np.testing.assert_allclose(mean, [1.0, 2.0])
    np.testing.assert_allclose(istd, 1.0 / np.sqrt([5.0, 18.0]), rtol=1e-6)


def test_spec_aug_masks_zero_spans():
    x = jnp.ones((100, 80))
    y = np.asarray(augment.spec_aug(jax.random.PRNGKey(0), x, length=100,
                                    num_t_mask=2, num_f_mask=2))
    assert (y == 0).any()
    # masked rows are fully zero, others untouched
    zero_rows = (y == 0).all(axis=1)
    full_rows = (y[:, (y != 0).any(axis=0)] == 1).all(axis=1)
    assert np.all(zero_rows | full_rows)


def test_spec_sub_copies_earlier_frames():
    T, D = 50, 8
    x = jnp.asarray(np.arange(T, dtype=np.float32)[:, None].repeat(D, 1))
    y = np.asarray(augment.spec_sub(jax.random.PRNGKey(1), x, length=T))
    # every row is a copy of some row at index <= its own
    for t in range(T):
        src = int(y[t, 0])
        assert src <= t


def test_spec_trim_reduces_length():
    lens = [augment.spec_trim_length(jax.random.PRNGKey(s), jnp.asarray(100))
            for s in range(5)]
    assert all(80 <= int(l) <= 99 for l in lens)


def test_mfcc_shapes_and_dct():
    wav = jnp.asarray(np.random.RandomState(9).randn(8000).astype(
        np.float32) * 1000)
    ceps = features.mfcc(wav, num_mel_bins=23, num_ceps=13)
    assert ceps.shape == (features.num_frames(8000), 13)
    assert np.isfinite(np.asarray(ceps)).all()
    # c0 carries the energy scale: louder audio -> larger c0
    ceps2 = features.mfcc(wav * 8, num_mel_bins=23, num_ceps=13)
    assert float(ceps2[:, 0].mean()) > float(ceps[:, 0].mean())
