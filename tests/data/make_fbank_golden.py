"""Generate tests/data/fbank_golden.npz — frozen Kaldi-fbank vectors.

VERDICT r2 asked for a torchaudio-generated golden file; torchaudio is not
in this image (zero egress), so this generator is a line-by-line transcription
of `torchaudio.compliance.kaldi.fbank`'s algorithm (the exact function the
reference calls at `wenet/dataset/processor.py:343-371`) executed in PURE
TORCH — a third, independent numerics stack (torch CPU FFT vs jnp vs
numpy) with the steps ordered exactly as torchaudio orders them:

  _get_strided (snip_edges)  -> dither (off) -> remove_dc_offset ->
  preemphasis (replicated first sample) -> povey window
  (hann(periodic=False)**0.85) -> zero-pad to 512 -> rfft().abs()**2 ->
  get_mel_banks(num_bins, 512, sr, low=20, high=nyquist) + zero nyquist
  column -> mm -> max(eps).log()

Run ONCE to (re)create the .npz; the file is checked in so the test suite
asserts against frozen vectors, not against code that could drift together
with the implementation under test.

    python tests/data/make_fbank_golden.py
"""
import os

import numpy as np
import torch


def torch_kaldi_fbank(waveform: torch.Tensor, num_mel_bins: int = 80,
                      frame_length_ms: float = 25.0,
                      frame_shift_ms: float = 10.0,
                      sample_frequency: float = 16000.0,
                      preemphasis_coefficient: float = 0.97) -> torch.Tensor:
    """torchaudio.compliance.kaldi.fbank semantics, dither=0, use_energy=False,
    snip_edges=True, window_type='povey', use_power=True, use_log_fbank=True,
    remove_dc_offset=True, round_to_power_of_two=True, low 20 Hz..nyquist."""
    device, dtype = waveform.device, waveform.dtype
    window_shift = int(sample_frequency * frame_shift_ms * 0.001)
    window_size = int(sample_frequency * frame_length_ms * 0.001)
    padded_window_size = 1
    while padded_window_size < window_size:
        padded_window_size *= 2

    # _get_strided, snip_edges=True
    num_samples = waveform.size(0)
    m = 1 + (num_samples - window_size) // window_shift
    strided = waveform.as_strided((m, window_size),
                                  (window_shift, 1)).clone()

    # remove_dc_offset
    strided = strided - torch.mean(strided, dim=1, keepdim=True)

    # preemphasis with replicated first column
    offset = torch.nn.functional.pad(strided.unsqueeze(0), (1, 0),
                                     mode="replicate").squeeze(0)[:, :-1]
    strided = strided - preemphasis_coefficient * offset

    # povey window: hann(periodic=False) ** 0.85
    window = torch.hann_window(window_size, periodic=False,
                               dtype=dtype, device=device).pow(0.85)
    strided = strided * window

    # pad right to the power-of-two FFT size
    strided = torch.nn.functional.pad(
        strided, (0, padded_window_size - window_size))

    spectrum = torch.fft.rfft(strided).abs().pow(2.0)

    mel_banks = _get_mel_banks(num_mel_bins, padded_window_size,
                               sample_frequency, 20.0, 0.0).to(dtype)
    # torchaudio pads a zero column for the nyquist bin
    mel_banks = torch.nn.functional.pad(mel_banks, (0, 1))
    mel_energies = torch.mm(spectrum, mel_banks.T)

    eps = torch.tensor(torch.finfo(torch.float32).eps, dtype=dtype)
    return torch.max(mel_energies, eps).log()


def _get_mel_banks(num_bins: int, window_length_padded: int,
                   sample_freq: float, low_freq: float,
                   high_freq: float) -> torch.Tensor:
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    fft_bin_width = sample_freq / window_length_padded

    def mel_scale(freq):
        return 1127.0 * (1.0 + freq / 700.0).log()

    mel_low = float(mel_scale(torch.tensor(low_freq, dtype=torch.float64)))
    mel_high = float(mel_scale(torch.tensor(high_freq, dtype=torch.float64)))
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    bins = torch.arange(num_bins, dtype=torch.float64).unsqueeze(1)
    left_mel = mel_low + bins * mel_delta
    center_mel = mel_low + (bins + 1.0) * mel_delta
    right_mel = mel_low + (bins + 2.0) * mel_delta
    mel = mel_scale(fft_bin_width
                    * torch.arange(num_fft_bins, dtype=torch.float64))
    up = (mel - left_mel) / (center_mel - left_mel)
    down = (right_mel - mel) / (right_mel - center_mel)
    return torch.max(torch.zeros(1, dtype=torch.float64),
                     torch.min(up, down)).to(torch.float32)


def _signals():
    sr = 16000
    t = np.arange(int(0.8 * sr)) / sr
    # chirp 100->3500 Hz + a 60 Hz hum + DC offset, int16-scaled like the
    # reference (processor.py:361 multiplies by 1 << 15)
    chirp = np.sin(2 * np.pi * (100.0 + (3400.0 / (2 * 0.8)) * t) * t)
    hum = 0.1 * np.sin(2 * np.pi * 60.0 * t)
    sig1 = ((0.6 * chirp + hum + 0.02) * 20000.0).astype(np.float32)
    rng = np.random.RandomState(20260817)
    sig2 = (rng.randn(int(0.5 * sr)) * 3000.0).astype(np.float32)
    return {"chirp": sig1, "noise": sig2}


def main():
    out = {}
    for name, wav in _signals().items():
        fb = torch_kaldi_fbank(torch.from_numpy(wav))
        out[f"wav_{name}"] = wav
        out[f"fbank_{name}"] = fb.numpy()
    path = os.path.join(os.path.dirname(__file__), "fbank_golden.npz")
    np.savez_compressed(path, **out)
    print("wrote", path, {k: v.shape for k, v in out.items()})


if __name__ == "__main__":
    main()
