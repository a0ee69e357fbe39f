#!/usr/bin/env python
"""Regenerate the long-form bench fixture (checkpoint + config + episode
wavs) used by the TPU measurement runbook (NOTES.md).

The reference's LF protocol decodes real GigaSpeech episodes with a
trained model (`go-LF-dev-one-model-paper.sh:90-124`); for RTF (not WER)
measurement all that matters is the compute shape, so this builds:

  <out>/config.yaml    flagship conformer12x512-rwkv6-bi transducer with a
                       self-contained char tokenizer + identity CMVN
  <out>/ckpt           random-init params with blank-dominant output heads
                       (joint/ctc blank bias +2.5 -> ~3-5 emitted tokens/s,
                       speech-realistic; random init degenerates to ~25/s)
  <out>/episode.wav    60 min of speech-band noise, 16 kHz mono PCM16
  <out>/episode3h.wav  180 min   (the steady-state measurement file)

Runs entirely on CPU (never touches the TPU tunnel).
"""
import argparse
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "../../.."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def synth_wav(path, seconds, seed, sr=16000):
    """Speech-band (100-4000 Hz) noise with a slow amplitude envelope —
    enough spectral structure that fbank features are non-degenerate."""
    import numpy as np
    from scipy.signal import butter, sosfilt

    rng = np.random.default_rng(seed)
    n = seconds * sr
    chunks = []
    sos = butter(4, [100, 4000], btype="band", fs=sr, output="sos")
    for i in range(0, n, 60 * sr):  # bound peak memory
        m = min(60 * sr, n - i)
        x = sosfilt(sos, rng.standard_normal(m).astype(np.float32))
        t = np.arange(m, dtype=np.float32) / sr
        env = 0.55 + 0.45 * np.sin(2 * np.pi * 0.31 * (t + i / sr))
        chunks.append((x * env).astype(np.float32))
    x = np.concatenate(chunks)
    x = x / (np.abs(x).max() + 1e-9) * 0.5
    import wave

    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype(np.int16).tobytes())


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/lf")
    p.add_argument("--vocab", type=int, default=5002)
    p.add_argument("--minutes", default="60,180",
                   help="episode lengths to synthesize")
    p.add_argument("--config",
                   default=os.path.join(
                       REPO, "examples/gigaspeech/conf/"
                       "rwkvbi_ds4k31nc_12le_trans_shortform.yaml"))
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from paper_accurate_fast_cheap_tpu.models import factory
    from paper_accurate_fast_cheap_tpu.train import checkpointing
    from paper_accurate_fast_cheap_tpu.utils.config import load_config

    os.makedirs(args.out, exist_ok=True)

    # self-contained char tokenizer at flagship vocab size
    units = os.path.join(args.out, "units.txt")
    with open(units, "w") as f:
        f.write("<blank> 0\n<unk> 1\n<sos/eos> 2\n")
        for i in range(3, args.vocab):
            f.write(f"tok{i} {i}\n")

    cmvn = os.path.join(args.out, "global_cmvn")
    with open(cmvn, "w") as f:
        json.dump({"mean_stat": [0.0] * 80,
                   "var_stat": [100.0] * 80, "frame_num": 100}, f)

    config = load_config(args.config)
    config["tokenizer"] = "char"
    config["tokenizer_conf"] = {"symbol_table_path": units}
    config["cmvn_conf"] = {"cmvn_file": cmvn, "is_json_cmvn": True}
    cfg_path = os.path.join(args.out, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    model, _ = factory.init_model(dict(config), args.vocab, 80)
    feats0 = jnp.zeros((1, 64, 80))
    params = model.init(jax.random.PRNGKey(1), feats0, jnp.asarray([64]),
                        jnp.ones((1, 4), jnp.int32), jnp.asarray([4]))
    # blank-dominant heads => speech-realistic emission rate (bench.py)
    prm = params["params"]
    prm["joint"]["ffn_out"]["bias"] = (
        prm["joint"]["ffn_out"]["bias"].at[0].add(2.5))
    prm["ctc"]["ctc_lo"]["bias"] = (
        prm["ctc"]["ctc_lo"]["bias"].at[0].add(2.5))
    ckpt = os.path.join(args.out, "ckpt")
    checkpointing.save_checkpoint(ckpt, params, info={
        "note": "LF bench fixture, random init + blank bias 2.5"})

    names = {60: "episode.wav", 180: "episode3h.wav"}
    for m in [int(x) for x in args.minutes.split(",")]:
        name = names.get(m, f"episode{m}m.wav")
        synth_wav(os.path.join(args.out, name), m * 60, seed=m)
        print("wrote", name)
    print("fixture ready:", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
