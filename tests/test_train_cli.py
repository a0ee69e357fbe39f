"""End-to-end training CLI on a synthetic shard + checkpoint machinery."""
import io
import tarfile
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from paper_accurate_fast_cheap_tpu.train import checkpointing


def _wav_bytes(samples, sr=16000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((samples * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


@pytest.fixture
def workspace(tmp_path):
    rng = np.random.RandomState(0)
    shard = tmp_path / "shard0.tar"
    texts = ["a b", "b c a", "c", "a a b"]
    with tarfile.open(shard, "w") as tf:
        for i, txt in enumerate(texts):
            key = f"utt{i}"
            wav = _wav_bytes(rng.randn(8000) * 0.05)
            for ext, data in (("txt", txt.encode()), ("wav", wav)):
                info = tarfile.TarInfo(f"{key}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    (tmp_path / "shards.txt").write_text(str(shard) + "\n")
    units = tmp_path / "units.txt"
    units.write_text("<blank> 0\n<unk> 1\na 2\nb 3\nc 4\n<sos> 5\n")
    config = {
        "encoder": "conformer",
        "encoder_conf": {
            "output_size": 32, "attention_heads": 2, "linear_units": 64,
            "num_blocks": 1, "dropout_rate": 0.0,
            "selfattention_layer_type": "rwkv_tmix60_bidirectional",
            "rnn_att_version": "rwkv", "rnn_att_direction": "bi",
            "input_layer": "conv2d",
        },
        "decoder": "bitransformer",
        "decoder_conf": {"attention_heads": 2, "linear_units": 64,
                         "num_blocks": 1, "r_num_blocks": 1,
                         "dropout_rate": 0.0},
        "tokenizer": "whitespace",
        "tokenizer_conf": {"symbol_table_path": str(units),
                           "special_tokens": {"<sos>": 5, "<eos>": 5}},
        "model": "asr_model",
        "model_conf": {"ctc_weight": 0.5, "reverse_weight": 0.3},
        "dataset_conf": {
            "fbank_conf": {"num_mel_bins": 23, "frame_shift": 10,
                           "frame_length": 25, "dither": 0.1},
            "spec_aug": True,
            "spec_aug_conf": {"num_t_mask": 1, "num_f_mask": 1,
                              "max_t": 10, "max_f": 5},
            "filter_conf": {"max_length": 2000, "min_length": 1},
            "batch_conf": {"batch_type": "static", "batch_size": 2},
            "shuffle": False,
        },
        "grad_clip": 5.0,
        "optim": "adam",
        "optim_conf": {"lr": 1e-3},
        "scheduler": "steadylr",
        "scheduler_conf": {"warmup_steps": 5},
        "max_epoch": 1,
        "log_interval": 1,
        "snapshot_saving_conf": {"save_interval": 2,
                                 "save_optimizer_every": 1},
    }
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(yaml.safe_dump(config))
    return tmp_path


def test_train_cli_end_to_end(workspace):
    from paper_accurate_fast_cheap_tpu.bin.train import main

    model_dir = workspace / "exp"
    rc = main([
        "--config", str(workspace / "train.yaml"),
        "--train_data", str(workspace / "shards.txt"),
        "--cv_data", str(workspace / "shards.txt"),
        "--data_type", "shard",
        "--model_dir", str(model_dir),
        "--num_epochs", "1",
        "--print_model",
    ])
    assert rc == 0
    assert (model_dir / "train.yaml").exists()
    epochs = [p for p in model_dir.iterdir()
              if p.name.startswith("epoch_")]
    assert any(p.is_dir() for p in epochs)
    # mid-epoch snapshot with cv_loss in sidecar
    snaps = [p for p in model_dir.iterdir() if "snapshot" in p.name
             and p.suffix == ".yaml"]
    assert snaps
    info = yaml.safe_load(snaps[0].read_text())
    assert "cv_loss" in info and np.isfinite(info["cv_loss"])

    # resume from the epoch checkpoint
    ck = sorted(str(p) for p in epochs if p.is_dir())[0]
    rc = main([
        "--config", str(workspace / "train.yaml"),
        "--train_data", str(workspace / "shards.txt"),
        "--data_type", "shard",
        "--model_dir", str(model_dir),
        "--checkpoint", ck,
        "--num_epochs", "2",
    ])
    assert rc == 0
    assert (model_dir / "epoch_0001").is_dir()


def test_checkpoint_roundtrip_and_average(tmp_path):
    params = {"w": jnp.arange(4.0), "b": jnp.ones((2, 2))}
    checkpointing.save_checkpoint(str(tmp_path / "epoch_0001"), params,
                                  info={"cv_loss": 1.0})
    params2 = {"w": jnp.arange(4.0) * 3, "b": jnp.ones((2, 2)) * 3}
    checkpointing.save_checkpoint(str(tmp_path / "epoch_0002"), params2,
                                  info={"cv_loss": 0.5})
    restored, _, info = checkpointing.load_checkpoint(
        str(tmp_path / "epoch_0001"), params)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.arange(4.0))
    assert info["cv_loss"] == 1.0
    avg = checkpointing.average_checkpoints(
        [str(tmp_path / "epoch_0001"), str(tmp_path / "epoch_0002")], params)
    np.testing.assert_allclose(np.asarray(avg["w"]), np.arange(4.0) * 2)
    best = checkpointing.select_best_checkpoints(str(tmp_path), 1)
    assert best == [str(tmp_path / "epoch_0002")]


def test_forced_snapshot_flag(tmp_path):
    assert not checkpointing.check_forced_full_snapshot_flag(str(tmp_path))
    (tmp_path / "force_full_snapshot").touch()
    assert checkpointing.check_forced_full_snapshot_flag(str(tmp_path))
    assert not (tmp_path / "force_full_snapshot").exists()


def test_train_bench_cli(tmp_path):
    """bin/train_bench.py: jitted train-step throughput on a tiny model."""
    import yaml as _yaml

    from paper_accurate_fast_cheap_tpu.bin.train_bench import main

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
        "accum_grad": 2,
    }
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(_yaml.safe_dump(cfg))
    out = tmp_path / "train.bench"
    rc = main(["--config", str(cfg_path), "--batch_size", "2",
               "--frames", "120", "--label_len", "6",
               "--warmup", "1", "--iters", "2", "--output", str(out)])
    assert rc == 0
    txt = out.read_text()
    assert "steps_per_sec" in txt and "audio_hours_per_compute_hour" in txt


def test_train_cli_pipeline_parallel(workspace):
    """`train.py --pp_stages 2`: the flagship block stack stage-sharded
    with exact grads (parallel/pp_encoder.py; grad parity proven in
    test_pp_train.py — this drives the CLI wiring end to end)."""
    import yaml as _yaml

    cfg = _yaml.safe_load((workspace / "train.yaml").read_text())
    cfg["encoder_conf"]["num_blocks"] = 2
    (workspace / "train_pp.yaml").write_text(_yaml.safe_dump(cfg))
    from paper_accurate_fast_cheap_tpu.bin.train import main

    model_dir = workspace / "exp_pp"
    rc = main([
        "--config", str(workspace / "train_pp.yaml"),
        "--train_data", str(workspace / "shards.txt"),
        "--data_type", "shard",
        "--model_dir", str(model_dir),
        "--num_epochs", "1",
        "--pp_stages", "2",
    ])
    assert rc == 0
    epochs = [p for p in model_dir.iterdir()
              if p.name.startswith("epoch_") and p.is_dir()]
    assert epochs


def test_mixed_precision_step_fp32_master_bf16_compute():
    """wrap_mixed_precision: bf16 forward/backward over fp32 master
    weights — grads and updated params stay fp32, the first-step loss
    tracks the fp32 loss, and the loss decreases over steps."""
    from paper_accurate_fast_cheap_tpu.models.asr_model import ASRModel
    from paper_accurate_fast_cheap_tpu.train import schedulers
    from paper_accurate_fast_cheap_tpu.train import train_step as ts

    vocab = 16
    model = ASRModel(
        vocab_size=vocab,
        encoder_conf=dict(input_size=23, output_size=32,
                          attention_heads=2, linear_units=64, num_blocks=1,
                          selfattention_layer_type="rwkv_tmix60"),
        decoder_conf=dict(attention_heads=2, linear_units=64,
                          num_blocks=1, r_num_blocks=0),
        ctc_weight=0.5, reverse_weight=0.0, sos=vocab - 1, eos=vocab - 1,
    )
    B, T, U = 2, 64, 6
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, 23))
    flens = jnp.full((B,), T, jnp.int32)
    labels = jax.random.randint(jax.random.PRNGKey(1), (B, U), 1, vocab - 2)
    llens = jnp.full((B,), U, jnp.int32)
    params = model.init(jax.random.PRNGKey(2), feats, flens, labels, llens)

    def loss_fn(p, batch, rng):
        out = model.apply(p, *batch, deterministic=False,
                          rngs={"dropout": rng})
        return out["loss"], {}

    opt = ts.make_optimizer("adam", schedulers.steady_lr(5e-3),
                            grad_clip=5.0)
    batch = (feats, flens, labels, llens)

    step32 = ts.make_train_step(loss_fn, opt)
    stepmx = ts.make_train_step(ts.wrap_mixed_precision(loss_fn), opt)
    s32 = ts.init_train_state(params, opt)
    smx = ts.init_train_state(params, opt)

    _, l32, _ = jax.jit(step32)(s32, batch, jax.random.PRNGKey(3))
    smx1, lmx, _ = jax.jit(stepmx)(smx, batch, jax.random.PRNGKey(3))
    assert lmx.dtype == jnp.float32
    # master weights stay fp32 after the update
    assert all(x.dtype == jnp.float32
               for x in jax.tree.leaves(smx1.params)
               if jnp.issubdtype(x.dtype, jnp.floating))
    # bf16 compute tracks the fp32 loss (bf16 has ~3 decimal digits)
    np.testing.assert_allclose(float(lmx), float(l32), rtol=0.05)

    # and training actually descends under mixed precision: dropout noise
    # swamps 15-step descent on this tiny model, so measure with the
    # deterministic loss and a steeper lr over 30 steps
    def det_loss_fn(p, batch_, rng):
        out = model.apply(p, *batch_, deterministic=True)
        return out["loss"], {}

    opt_hi = ts.make_optimizer("adam", schedulers.steady_lr(3e-2),
                               grad_clip=5.0)
    jstep = jax.jit(ts.make_train_step(
        ts.wrap_mixed_precision(det_loss_fn), opt_hi))
    losses = []
    st = ts.init_train_state(params, opt_hi)
    for i in range(30):
        st, loss, _ = jstep(st, batch, jax.random.PRNGKey(10 + i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 2.0, losses


def test_train_cli_mixed_precision(workspace):
    """config `dtype: bf16` drives wrap_mixed_precision through train.py."""
    import yaml as _yaml

    cfg = _yaml.safe_load((workspace / "train.yaml").read_text())
    cfg["dtype"] = "bf16"
    (workspace / "train_bf16.yaml").write_text(_yaml.safe_dump(cfg))
    from paper_accurate_fast_cheap_tpu.bin.train import main

    model_dir = workspace / "exp_bf16"
    rc = main([
        "--config", str(workspace / "train_bf16.yaml"),
        "--train_data", str(workspace / "shards.txt"),
        "--data_type", "shard",
        "--model_dir", str(model_dir),
        "--num_epochs", "1",
    ])
    assert rc == 0
    epochs = [p for p in model_dir.iterdir()
              if p.name.startswith("epoch_") and p.is_dir()]
    assert epochs


def test_train_bench_set_overrides_and_typo_warning(caplog):
    """--set applies dotted overrides; creating a brand-new key (the typo
    failure mode for A/B benches) logs a warning."""
    import logging

    from paper_accurate_fast_cheap_tpu.bin.train_bench import get_args
    from paper_accurate_fast_cheap_tpu.utils.config import override_config

    args = get_args([
        "--config", "x.yaml", "--platform", "cpu",
        "--set", "encoder_conf.rwkv_conf.wkv_impl=chunked_ad",
        "--set", "grad_clip=1.5",
    ])
    assert args.platform == "cpu"
    cfg = {"encoder_conf": {"rwkv_conf": {"wkv_impl": "chunked"}},
           "grad_clip": 5.0}
    with caplog.at_level(logging.WARNING):
        out = override_config(cfg, args.overrides)
    assert out["encoder_conf"]["rwkv_conf"]["wkv_impl"] == "chunked_ad"
    assert out["grad_clip"] == 1.5
    assert not caplog.records  # both keys existed: no warning

    with caplog.at_level(logging.WARNING):
        out = override_config(cfg, ["encoder_conf.rwkv_conf.wkv_imp=x"])
    assert any("wkv_imp" in r.getMessage() for r in caplog.records)
    # the typo'd key is still created (optional keys are legitimate)
    assert out["encoder_conf"]["rwkv_conf"]["wkv_imp"] == "x"
