#!/usr/bin/env python
"""On-chip accuracy loop: train -> checkpoint -> recognize_wav -> WER.

The reference's QA is empirical (SURVEY.md §4): a model is trusted when
the train->decode->score pipeline (`run-pipeline-v3.sh` +
`go-SF-dev-one-model-paper.sh:10-41` / `go-LF-dev-one-model-paper.sh`)
shows WER moving.  No GigaSpeech data or released checkpoint exists in
this environment, so this script builds the strongest available
substitute: a LEARNABLE synthetic task decoded through the exact product
CLIs, asserting WER strictly improves from init.

Task: 8 "words" a..h, each a distinct pure-tone burst (300..2050 Hz,
250 ms + 50 ms gap) — fbank separates them trivially, so a small model
learns the mapping in a few hundred steps.  The pipeline is the real
one end to end:

  make_shard -> compute_cmvn -> [init ckpt] recognize_wav + compute_wer
  -> bin/train (N epochs) -> recognize_wav + compute_wer -> assert
  WER(trained) < WER(init), and by default assert it reaches
  --target_wer (0.1).

Decode mode is the paper's `rnnt_beam_search` (beam 8, ctc 0.3 /
transducer 0.7) through `bin/recognize_wav` — the LF product path
(window -> encoder -> device beam), matching the QA role of
`go-SF-dev-one-model-paper.sh` + `recognize_wav2.py`.

Run on the TPU by default (the point is ON-CHIP evidence); --cpu forces
the host backend for a mechanical check.  Prints one JSON summary line.
"""
import argparse
import json
import os
import subprocess
import sys
import time
import wave

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "../../.."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

WORDS = "abcdefgh"
SR = 16000


def word_wave(i, rng, sr=SR):
    """250 ms tone burst for word i + 50 ms silence, mild noise/jitter."""
    f = 300.0 + 250.0 * i
    n = int(0.25 * sr)
    t = np.arange(n) / sr
    x = 0.35 * np.sin(2 * np.pi * f * t * (1.0 + rng.uniform(-.01, .01)))
    # 10 ms fade in/out so window edges don't ring
    r = int(0.01 * sr)
    env = np.ones(n)
    env[:r] = np.linspace(0, 1, r)
    env[-r:] = np.linspace(1, 0, r)
    x = x * env + rng.standard_normal(n) * 0.01
    return np.concatenate([x, np.zeros(int(0.05 * sr))])


def write_wav(path, x, sr=SR):
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype(np.int16)
                      .tobytes())


def synth_split(out, n_utts, min_w, max_w, seed):
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    scp, txt = [], []
    for u in range(n_utts):
        k = int(rng.integers(min_w, max_w + 1))
        ws = rng.integers(0, len(WORDS), size=k)
        x = np.concatenate([word_wave(int(i), rng) for i in ws])
        key = f"utt{u:04d}"
        p = os.path.join(out, key + ".wav")
        write_wav(p, x)
        scp.append(f"{key} {p}\n")
        txt.append(f"{key} {' '.join(WORDS[i] for i in ws)}\n")
    with open(os.path.join(out, "wav.scp"), "w") as f:
        f.writelines(scp)
    with open(os.path.join(out, "text"), "w") as f:
        f.writelines(txt)


def synth_longform(out, n_files, n_words, seed):
    """Long word streams for the recognize_wav LF path (one ref per
    file, the `.ref_txt` convention of `segments_to_files.py`)."""
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    names = []
    for u in range(n_files):
        ws = rng.integers(0, len(WORDS), size=n_words)
        x = np.concatenate([word_wave(int(i), rng) for i in ws])
        name = f"ep{u}"
        write_wav(os.path.join(out, name + ".wav"), x)
        with open(os.path.join(out, name + ".ref_txt"), "w") as f:
            f.write(" ".join(WORDS[i] for i in ws) + "\n")
        names.append(name)
    return names


def run_cli(mod, args, cpu=False):
    if cpu:
        # the container pre-registers the remote TPU backend at
        # interpreter start; only an in-process config update forces CPU
        # (NOTES.md "Gotchas")
        code = ("import jax, sys; "
                "jax.config.update('jax_platforms', 'cpu'); "
                f"from paper_accurate_fast_cheap_tpu.bin.{mod} "
                "import main; sys.exit(main(sys.argv[1:]) or 0)")
        cmd = [sys.executable, "-c", code] + args
    else:
        cmd = [sys.executable, "-m",
               f"paper_accurate_fast_cheap_tpu.bin.{mod}"] + args
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + r.stderr[-4000:])
        raise RuntimeError(f"{mod} failed rc={r.returncode}")
    return r.stdout


def wer_of(ref_file, hyp_file):
    from paper_accurate_fast_cheap_tpu.tools.wer import compute_wer
    refs, hyps = {}, {}
    for path, d in ((ref_file, refs), (hyp_file, hyps)):
        with open(path) as f:
            for line in f:
                parts = line.strip().split(None, 1)
                if parts:
                    d[parts[0]] = parts[1] if len(parts) > 1 else ""
    total, _ = compute_wer(refs, hyps)
    return total.wer


def decode_and_score(tag, out_root, lf_dir, names, cfg, ckpt, args,
                     cpu=False):
    out = os.path.join(out_root, f"decode_{tag}")
    if os.path.exists(os.path.join(out, "hyp.text")):
        # reuse a previous run's decode (e.g. the init point when only
        # --epochs changed) — delete the decode_<tag> dir to force
        w = wer_of(os.path.join(out, "ref.text"),
                   os.path.join(out, "hyp.text"))
        print(f"# [{tag}] WER={w:.4f} (reused {out})", file=sys.stderr)
        return w, 0.0
    os.makedirs(out, exist_ok=True)
    t0 = time.time()
    for name in names:
        run_cli("recognize_wav", [
            "--config", cfg, "--checkpoint", ckpt,
            "--wav", os.path.join(lf_dir, name + ".wav"),
            "--output_dir", out, "--mode", "rnnt_beam_search",
            "--chunk_size", str(args.chunk_size),
            "--batch_size", str(args.decode_batch),
            "--beam_size", "8", "--ctc_weight", "0.3",
            "--transducer_weight", "0.7", "--fuse", args.fuse,
        ], cpu=cpu)
    dt = time.time() - t0
    ref = os.path.join(out, "ref.text")
    hyp = os.path.join(out, "hyp.text")
    with open(ref, "w") as fr, open(hyp, "w") as fh:
        for name in names:
            fr.write(name + " " + open(os.path.join(
                lf_dir, name + ".ref_txt")).read().strip() + "\n")
            h = open(os.path.join(out, name + ".txt")).read().strip() \
                if os.path.exists(os.path.join(out, name + ".txt")) else ""
            fh.write(name + " " + h + "\n")
    w = wer_of(ref, hyp)
    print(f"# [{tag}] WER={w:.4f} decode_s={dt:.1f}", file=sys.stderr)
    return w, dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/acc_loop")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (mechanical check)")
    p.add_argument("--train_utts", type=int, default=96)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--merge_secs", type=int, default=0,
                   help="merge_utterances long-form synthesis target "
                        "(secs; 0 = off).  Matching train length to the "
                        "decode window is what the reference's LFXL "
                        "fine-tune stage exists for — short-utterance "
                        "training + 20 s windows decodes with doubled "
                        "emissions (round-5 finding)")
    p.add_argument("--lf_files", type=int, default=2)
    p.add_argument("--lf_words", type=int, default=100)
    p.add_argument("--chunk_size", type=int, default=2000)
    p.add_argument("--decode_batch", type=int, default=4)
    p.add_argument("--fuse", default="auto")
    p.add_argument("--blocks", type=int, default=2)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--target_wer", type=float, default=0.1,
                   help="trained-model WER the loop must reach "
                        "(<=0 disables the threshold assert)")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)

    # ---- data ----
    train_dir = os.path.join(args.out, "train")
    if not os.path.exists(os.path.join(train_dir, "text")):
        synth_split(train_dir, args.train_utts, 5, 10, seed=11)
    lf_dir = os.path.join(args.out, "longform")
    names = synth_longform(lf_dir, args.lf_files, args.lf_words, seed=21)

    run_cli("make_shard", [
        "--wav_scp", os.path.join(train_dir, "wav.scp"),
        "--text", os.path.join(train_dir, "text"),
        "--output_dir", os.path.join(train_dir, "shards"),
        "--num_utts_per_shard", "32"])
    shards = os.path.join(train_dir, "shards", "shards.txt")
    cmvn = os.path.join(args.out, "global_cmvn")
    run_cli("compute_cmvn_stats", [
        "--data", shards, "--data_type", "shard",
        "--num_mel_bins", "80", "--out_cmvn", cmvn])

    # ---- config: flagship structure at toy scale ----
    units = os.path.join(args.out, "units.txt")
    with open(units, "w") as f:
        f.write("<blank> 0\n<unk> 1\n")
        for i, w in enumerate(WORDS):
            f.write(f"{w} {i + 2}\n")
        f.write(f"<sos> {len(WORDS) + 2}\n")
    sos = len(WORDS) + 2
    config = {
        "encoder": "conformer",
        "encoder_conf": {
            "output_size": args.dim, "attention_heads": 2,
            "linear_units": 4 * args.dim, "num_blocks": args.blocks,
            "dropout_rate": 0.1, "input_layer": "conv2d",
            "selfattention_layer_type": "rwkv_tmix60_bidirectional",
        },
        "tokenizer": "whitespace",
        "tokenizer_conf": {"symbol_table_path": units,
                           "special_tokens": {"<sos>": sos,
                                              "<eos>": sos}},
        "model": "transducer",
        "predictor": "rnn",
        "predictor_conf": {"embed_size": args.dim,
                           "output_size": args.dim,
                           "embed_dropout": 0.1,
                           "hidden_size": args.dim, "num_layers": 1,
                           "dropout": 0.1},
        "joint_conf": {"join_dim": args.dim},
        "decoder": None,
        "model_conf": {"ctc_weight": 0.3, "transducer_weight": 0.7,
                       "attention_weight": 0.0},
        "cmvn": "global_cmvn",
        "cmvn_conf": {"cmvn_file": cmvn, "is_json_cmvn": True},
        "dataset_conf": {
            "fbank_conf": {"num_mel_bins": 80, "dither": 0.0},
            "filter_conf": {"max_length": 4000, "min_length": 1},
            "batch_conf": {"batch_type": "static",
                           "batch_size": args.batch_size},
            "shuffle": True, "shuffle_conf": {"shuffle_size": 256},
            **({"merge_utterances": True,
                "merge_utterances_conf": {
                    "min_audio_len_acceptable_secs": 1,
                    "min_audio_len_secs": args.merge_secs,
                    "max_audio_len_secs": args.merge_secs + 7,
                    "max_utt_combined": 12,
                }} if args.merge_secs > 0 else {}),
        },
        "grad_clip": 5.0, "optim": "adamw",
        "optim_conf": {"lr": args.lr, "weight_decay": 1e-6},
        "scheduler": "warmuplr", "scheduler_conf": {"warmup_steps": 50},
        "max_epoch": args.epochs, "log_interval": 10,
    }
    import yaml
    cfg = os.path.join(args.out, "config.yaml")
    with open(cfg, "w") as f:
        yaml.safe_dump(config, f)

    # ---- init checkpoint (the WER-from-init reference point) ----
    def make_init():
        import jax
        if args.cpu:
            jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from paper_accurate_fast_cheap_tpu.models import factory
        from paper_accurate_fast_cheap_tpu.train import checkpointing
        model, _ = factory.init_model(dict(config), sos + 1, 80)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 80)),
            jnp.asarray([64]), jnp.ones((1, 4), jnp.int32),
            jnp.asarray([4]))
        path = os.path.join(args.out, "ckpt_init")
        checkpointing.save_checkpoint(path, params,
                                      info={"note": "accuracy-loop init"})
        return path

    init_ckpt = make_init()
    exp = os.path.join(args.out, "exp")

    # ---- decode at init ----
    wer_init, dt_init = decode_and_score(
        "init", args.out, lf_dir, names, cfg, init_ckpt, args, args.cpu)

    # ---- train ----
    t0 = time.time()
    run_cli("train", [
        "--config", cfg, "--train_data", shards, "--data_type", "shard",
        "--model_dir", exp, "--checkpoint", init_ckpt,
        "--num_epochs", str(args.epochs)], cpu=args.cpu)
    train_s = time.time() - t0
    # newest epoch checkpoint
    ckpts = sorted(d for d in os.listdir(exp) if d.startswith("epoch_")
                   and os.path.isdir(os.path.join(exp, d)))
    assert ckpts, os.listdir(exp)
    trained = os.path.join(exp, ckpts[-1])

    # ---- decode trained ----
    wer_trained, dt_tr = decode_and_score(
        "trained", args.out, lf_dir, names, cfg,
        trained, args, args.cpu)

    ok = wer_trained < wer_init
    reached = args.target_wer <= 0 or wer_trained <= args.target_wer
    print(json.dumps({
        "metric": "accuracy_loop_wer",
        "wer_init": round(wer_init, 4),
        "wer_trained": round(wer_trained, 4),
        "improved": bool(ok), "reached_target": bool(reached),
        "target_wer": args.target_wer,
        "train_s": round(train_s, 1),
        "decode_s": [round(dt_init, 1), round(dt_tr, 1)],
        "epochs": args.epochs, "train_utts": args.train_utts,
        "backend": "cpu" if args.cpu else "tpu",
        "mode": "rnnt_beam_search beam8 ctc0.3/tw0.7 via recognize_wav",
    }))
    if not (ok and reached):
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
