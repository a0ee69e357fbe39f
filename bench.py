"""Driver benchmark: encoder RTF on the flagship model (real TPU).

Equivalent of `wenet/bin/encoder-rtf.py:285-555`: encoder + CTC log-probs
over long windows, warmup then timed runs; reports audio-hours decoded per
wall-second per chip (= 1/RTF / 3600 * 3600 ... i.e. hours-of-audio per
second).  BASELINE.md north-star: >= 100x real-time per v5e chip, so
vs_baseline = (1/RTF) / 100.

Prints exactly one JSON line.
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    from __graft_entry__ import FLAGSHIP_ENCODER, VOCAB

    import flax.linen as nn

    from paper_accurate_fast_cheap_tpu.models.conformer import (
        ConformerEncoder,
    )
    from paper_accurate_fast_cheap_tpu.models.ctc_head import CTCHead

    class EncoderCTC(nn.Module):
        @nn.compact
        def __call__(self, feats, lens):
            enc, out_lens = ConformerEncoder(
                **FLAGSHIP_ENCODER, name="encoder"
            )(feats, lens)
            return jax.nn.log_softmax(
                CTCHead(vocab_size=VOCAB, name="ctc")(enc), axis=-1
            ), out_lens

    # LF-decode shape: batch of 9000-frame (90 s) windows, bf16 activations
    # (batch 8 saturates the chip; the reference LF harness sweeps 1-14)
    B, T = 8, 9000
    model = EncoderCTC()
    feats32 = jax.random.normal(jax.random.PRNGKey(0), (B, T, 80))
    feats = feats32.astype(jnp.bfloat16)
    lens = jnp.full((B,), T, jnp.int32)
    params = model.init(jax.random.PRNGKey(1), feats[:1, :256], lens[:1])
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x, params)

    import numpy as np

    fwd = jax.jit(lambda p, f, l: model.apply(p, f, l))
    # warmup / compile.  NOTE: through the remote-TPU relay,
    # block_until_ready returns early on the first post-compile call, so the
    # warmup must force a host transfer to be sure execution finished.
    for _ in range(2):
        out = fwd(params, feats, lens)
        float(np.asarray(out[0][0, 0, 0]))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, feats, lens)
    # single dependent host read drains the full device queue
    float(np.asarray(out[0][0, 0, 0]))
    elapsed = time.perf_counter() - t0

    audio_seconds = iters * B * T * 0.01  # 100 frames/s
    inv_rtf = audio_seconds / elapsed
    hours_per_sec = inv_rtf / 3600.0
    print(json.dumps({
        "metric": "encoder_1_over_rtf",
        "value": round(inv_rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(inv_rtf / 100.0, 3),
        "detail": {
            "audio_hours_per_sec": round(hours_per_sec, 4),
            "batch": B, "chunk_frames": T, "iters": iters,
            "elapsed_s": round(elapsed, 3),
            "model": "conformer12x512-rwkv6-bidirectional",
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
