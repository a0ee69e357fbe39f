"""Kaldi-compatible log-mel filterbank front-end, fused into one XLA graph.

Reproduces the semantics of the reference's feature extraction
(`wenet/dataset/processor.py:343-371`: torchaudio `kaldi.fbank` on
`waveform * (1 << 15)` with energy_floor=0, snip_edges, povey window,
preemphasis 0.97, DC removal, power spectrum, Kaldi mel banks at
low=20 Hz..nyquist, natural log with float-eps floor), plus the
whisper-style log-mel spectrogram (`processor.py:419-458`).

TPU-first: the whole front-end (framing -> dither -> DC -> preemph ->
window -> rFFT -> mel -> log) is pure jnp on statically-shaped arrays, so
it jits into a single XLA program and can be fused with CMVN/SpecAugment
and the encoder (the reference runs this per-utterance on CPU workers).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_KALDI_EPS = 1.1920928955078125e-07  # float32 machine epsilon, Kaldi's floor


def mel_scale(freq):
    return 1127.0 * np.log1p(np.asarray(freq, np.float64) / 700.0)


def kaldi_mel_banks(
    num_bins: int,
    fft_size: int,
    sample_rate: float,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi-style triangular mel filterbank matrix (num_bins, fft_size//2+1).

    high_freq <= 0 means nyquist + high_freq.  Triangles are linear in mel
    space evaluated at FFT-bin center frequencies (Kaldi semantics; note
    librosa's variant normalizes differently).
    """
    nyquist = 0.5 * sample_rate
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    num_fft_bins = fft_size // 2
    fft_bin_width = sample_rate / fft_size
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    # mel frequency of every FFT bin (excluding nyquist bin, Kaldi computes
    # num_fft_bins = fft_size/2 columns then pads a zero nyquist column)
    mel_of_bin = mel_scale(fft_bin_width * np.arange(num_fft_bins))
    banks = np.zeros((num_bins, num_fft_bins + 1), np.float64)
    for b in range(num_bins):
        left = mel_low + b * mel_delta
        center = mel_low + (b + 1) * mel_delta
        right = mel_low + (b + 2) * mel_delta
        up = (mel_of_bin - left) / (center - left)
        down = (right - mel_of_bin) / (right - center)
        banks[b, :num_fft_bins] = np.clip(np.minimum(up, down), 0.0, None)
    return banks.astype(np.float32)


def _povey_window(n: int) -> np.ndarray:
    a = 2.0 * math.pi / (n - 1)
    return (0.5 - 0.5 * np.cos(a * np.arange(n))) ** 0.85


def num_frames(num_samples: int, frame_length: int = 400,
               frame_shift: int = 160) -> int:
    """snip_edges=True frame count (Kaldi default used by the reference)."""
    if num_samples < frame_length:
        return 0
    return 1 + (num_samples - frame_length) // frame_shift


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_mel_bins", "frame_length", "frame_shift", "sample_rate",
        "dither", "preemphasis", "round_to_power_of_two", "use_power",
        "remove_dc_offset",
    ),
)
def fbank(
    waveform: jax.Array,
    num_mel_bins: int = 80,
    frame_length: int = 400,
    frame_shift: int = 160,
    sample_rate: int = 16000,
    dither: float = 0.0,
    preemphasis: float = 0.97,
    rng: Optional[jax.Array] = None,
    round_to_power_of_two: bool = True,
    use_power: bool = True,
    remove_dc_offset: bool = True,
) -> jax.Array:
    """Kaldi fbank of a single waveform (num_samples,) -> (frames, bins).

    The caller is expected to pass int16-scaled float samples (the reference
    multiplies normalized audio by 2**15, `processor.py:361`).  ``dither``
    requires ``rng``.  frame_length/shift are in SAMPLES (the reference's
    25 ms / 10 ms at 16 kHz = 400 / 160).
    """
    nf = num_frames(waveform.shape[0], frame_length, frame_shift)
    fft_size = frame_length
    if round_to_power_of_two:
        fft_size = 1 << (frame_length - 1).bit_length()

    idx = (
        jnp.arange(nf)[:, None] * frame_shift + jnp.arange(frame_length)[None]
    )
    frames = waveform[idx].astype(jnp.float32)  # (nf, frame_length)

    if dither != 0.0:
        if rng is None:
            raise ValueError("dither > 0 requires an rng key")
        frames = frames + dither * jax.random.normal(
            rng, frames.shape, jnp.float32
        )
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    if preemphasis != 0.0:
        prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis * prev
    frames = frames * jnp.asarray(_povey_window(frame_length), jnp.float32)

    if fft_size > frame_length:
        frames = jnp.pad(frames, ((0, 0), (0, fft_size - frame_length)))
    spec = jnp.fft.rfft(frames, n=fft_size)
    power = jnp.abs(spec)
    if use_power:
        power = power * power

    banks = jnp.asarray(
        kaldi_mel_banks(num_mel_bins, fft_size, float(sample_rate))
    )
    mel = power @ banks.T
    return jnp.log(jnp.maximum(mel, _KALDI_EPS)).astype(jnp.float32)


def fbank_batch(waveforms: jax.Array, lengths: jax.Array, **kw) -> tuple:
    """Batched fbank over padded waveforms (B, S) -> ((B, F, bins), frame_lens).

    Padded samples only affect the trailing (invalid) frames, which callers
    mask via the returned frame lengths.
    """
    feats = jax.vmap(lambda w: fbank(w, **kw))(waveforms)
    fl = kw.get("frame_length", 400)
    fs = kw.get("frame_shift", 160)
    frame_lens = jnp.where(
        lengths < fl, 0, 1 + (lengths - fl) // fs
    ).astype(jnp.int32)
    return feats, frame_lens


@functools.partial(
    jax.jit,
    static_argnames=("num_mel_bins", "num_ceps", "frame_length",
                     "frame_shift", "sample_rate", "dither",
                     "cepstral_lifter", "low_freq", "high_freq"),
)
def mfcc(
    waveform: jax.Array,
    num_mel_bins: int = 23,
    num_ceps: int = 13,
    frame_length: int = 400,
    frame_shift: int = 160,
    sample_rate: int = 16000,
    dither: float = 0.0,
    rng: Optional[jax.Array] = None,
    cepstral_lifter: float = 22.0,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> jax.Array:
    """Kaldi-style MFCC: fbank -> DCT-II -> cepstral liftering
    (`processor.py:385` compute_mfcc parity surface)."""
    fb = fbank(
        waveform, num_mel_bins=num_mel_bins, frame_length=frame_length,
        frame_shift=frame_shift, sample_rate=sample_rate, dither=dither,
        rng=rng,
    )
    n = num_mel_bins
    # orthonormal DCT-II matrix (kaldi convention)
    j = np.arange(n)
    dct = np.cos(np.pi / n * (j[None, :] + 0.5) * np.arange(num_ceps)[:, None])
    dct *= np.sqrt(2.0 / n)
    dct[0] *= np.sqrt(0.5)  # orthonormal first row: sqrt(1/N) overall
    ceps = fb @ jnp.asarray(dct.astype(np.float32)).T
    if cepstral_lifter > 0:
        i = np.arange(num_ceps)
        lifter = 1.0 + 0.5 * cepstral_lifter * np.sin(
            np.pi * i / cepstral_lifter
        )
        ceps = ceps * jnp.asarray(lifter.astype(np.float32))
    return ceps


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length",
                                             "num_mel_bins", "sample_rate"))
def whisper_log_mel(
    waveform: jax.Array,
    n_fft: int = 400,
    hop_length: int = 160,
    num_mel_bins: int = 80,
    sample_rate: int = 16000,
) -> jax.Array:
    """Whisper-style log-mel spectrogram (`processor.py:419-458` semantics).

    Expects normalized [-1, 1] audio (NOT int16-scaled).  Uses a centred hann
    STFT (torch.stft default center=True, reflect pad), slaney-normalized mel
    banks (librosa default), log10 with 1e-10 floor, max-8dB clamp, /4 shift.
    """
    pad = n_fft // 2
    w = jnp.pad(waveform.astype(jnp.float32), (pad, pad), mode="reflect")
    nf = 1 + (w.shape[0] - n_fft) // hop_length
    idx = jnp.arange(nf)[:, None] * hop_length + jnp.arange(n_fft)[None]
    window = 0.5 - 0.5 * jnp.cos(
        2.0 * jnp.pi * jnp.arange(n_fft) / n_fft
    )
    frames = w[idx] * window
    spec = jnp.fft.rfft(frames, n=n_fft)
    mag = jnp.abs(spec) ** 2
    mag = mag[:-1]  # whisper drops the final frame (stft[..., :-1])
    banks = jnp.asarray(_slaney_mel_banks(num_mel_bins, n_fft, sample_rate))
    mel = mag @ banks.T
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0


def _slaney_mel_banks(n_mels: int, n_fft: int, sr: int) -> np.ndarray:
    """librosa.filters.mel defaults: slaney scale + slaney area norm."""
    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = f / (200.0 / 3.0)
        log_t = f >= 1000.0
        mel = np.where(
            log_t, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / np.log(6.4) * 27.0, mel
        )
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = m * (200.0 / 3.0)
        log_t = m >= 15.0
        f = np.where(log_t, 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0)), f)
        return f

    fmax = sr / 2.0
    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(fmax), n_mels + 2)
    hzs = mel_to_hz(mels)
    fft_freqs = np.linspace(0, fmax, 1 + n_fft // 2)
    weights = np.zeros((n_mels, len(fft_freqs)))
    fdiff = np.diff(hzs)
    ramps = hzs[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (hzs[2 : n_mels + 2] - hzs[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)
