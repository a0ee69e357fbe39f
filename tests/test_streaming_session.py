"""Incremental StreamingSession == offline decode of the same audio.

The session featurizes sample-domain windows (whole-file-fbank exact),
carries encoder streaming state across chunks, and collapses CTC greedy
output across chunk boundaries — so for a causal encoder its final
token sequence must equal the offline ctc_greedy_search of the full
utterance (audio length chosen so windows tile the frames exactly).
"""
import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.decode import search
from paper_accurate_fast_cheap_tpu.frontend.pipeline import make_feature_fn
from paper_accurate_fast_cheap_tpu.models import factory
from paper_accurate_fast_cheap_tpu.streaming import make_session_factory


class _Tok:
    def detokenize(self, ids):
        return " ".join(f"T{i}" for i in ids), [f"T{i}" for i in ids]

    def vocab_size(self):
        return 11


def _assets(att="rwkv_tmix60"):
    extras = {"rwkv_do_bfloat16": False, "wkv_chunk_size": 16}
    if att == "mamba_att":
        extras = {"rnn_att_direction": "uni"}
    config = {
        "model": "asr_model",
        "encoder": "conformer",
        "encoder_conf": dict(
            output_size=32, attention_heads=2, linear_units=64,
            num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
            selfattention_layer_type=att, causal=True,
            input_layer="conv2d", cnn_module_kernel=7,
            use_cnn_module=True,
            **extras,
        ),
        "decoder": None,
        "model_conf": {"ctc_weight": 1.0},
    }
    tok = _Tok()
    model, _ = factory.init_model(config, tok.vocab_size(), 23)
    featurize = make_feature_fn(
        {"fbank_conf": {"num_mel_bins": 23, "frame_shift": 10,
                        "frame_length": 25, "dither": 0.0},
         "spec_aug": False, "spec_sub": False}, None)
    feats0 = jnp.zeros((1, 64, 23))
    params = model.init(jax.random.PRNGKey(0), feats0, jnp.asarray([64]),
                        jnp.ones((1, 4), jnp.int32), jnp.asarray([4]))
    return model, params, tok, featurize


def test_streaming_session_matches_offline():
    model, params, tok, featurize = _assets()
    c, k = 8, 4                      # chunk 8 enc frames, 4 full windows
    factory_fn = make_session_factory(model, params, tok, featurize,
                                      decoding_chunk_size=c)
    # tail = 3 frames (< context: dropped, as offline ds4 drops them) and
    # tail = 20 frames (>= context: flushed through the padded window)
    for tail in (3, 20):
        T = 4 * k * c + tail
        n_samples = (T - 1) * 160 + 400
        rng = np.random.RandomState(5)
        wav = (rng.randn(n_samples) * 0.1).astype(np.float32)

        # offline: whole-file features -> full forward -> greedy
        feats, flens = featurize(jnp.asarray(wav[None]),
                                 jnp.asarray([len(wav)]), train=False)
        enc, el = model.apply(params, feats, flens,
                              method=model.forward_encoder)
        logp = model.apply(params, enc, method=model.ctc_logprobs)
        offline = search.ctc_greedy_search(np.asarray(logp),
                                           np.asarray(el))[0].tokens

        sess = factory_fn()
        # drip-feed in uneven pieces
        for p in np.array_split(wav, 7):
            sess.accept_waveform(p)
        final = sess.finalize()
        assert final.final
        assert final.tokens == offline, (tail, final.tokens, offline)
        # per-token timestamps: one per token, the greedy peak frame's
        # audio time — non-decreasing, within the utterance, on the
        # 40 ms ds4 grid
        assert len(final.times) == len(final.tokens)
        audio_sec = n_samples / 16000.0
        assert all(0.0 <= t <= audio_sec + 0.04 for t in final.times)
        assert all(b >= a for a, b in zip(final.times, final.times[1:]))
        assert all(abs(t / 0.04 - round(t / 0.04)) < 1e-6
                   for t in final.times)

        # a second session reuses the compiled programs, independent
        sess2 = factory_fn()
        sess2.accept_waveform(wav)
        assert sess2.finalize().tokens == offline


def test_streaming_websocket_mode():
    """`{"signal": "start", "streaming": true}` gives a per-connection
    incremental session over the ws protocol; final == offline."""
    import json
    import socket
    import threading
    import types

    from paper_accurate_fast_cheap_tpu.bin import serve as serve_mod
    from paper_accurate_fast_cheap_tpu.bin import ws_client

    model, params, tok, featurize = _assets()
    c, k = 8, 3
    T = 4 * k * c + 3
    n_samples = (T - 1) * 160 + 400
    rng = np.random.RandomState(6)
    wav = (rng.randn(n_samples) * 0.1).astype(np.float32)

    feats, flens = featurize(jnp.asarray(wav[None]),
                             jnp.asarray([len(wav)]), train=False)
    enc, el = model.apply(params, feats, flens,
                          method=model.forward_encoder)
    logp = model.apply(params, enc, method=model.ctc_logprobs)
    offline = search.ctc_greedy_search(np.asarray(logp),
                                       np.asarray(el))[0].tokens
    offline_text, _ = tok.detokenize(offline)

    shim = types.SimpleNamespace(model=model, params=params,
                                 tokenizer=tok, featurize=featurize,
                                 transcribe_batch=None)
    srv = serve_mod.serve(shim, host="127.0.0.1", port=0,
                          streaming_chunk=c)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    # pcm16 round-trip loses low bits; decode the quantized audio offline
    pcm = np.clip(wav * 32767, -32768, 32767).astype("<i2")
    wav_q = pcm.astype(np.float32) / 32768.0
    feats, flens = featurize(jnp.asarray(wav_q[None]),
                             jnp.asarray([len(wav_q)]), train=False)
    enc, el = model.apply(params, feats, flens,
                          method=model.forward_encoder)
    logp = model.apply(params, enc, method=model.ctc_logprobs)
    offline_q = search.ctc_greedy_search(np.asarray(logp),
                                         np.asarray(el))[0].tokens
    offline_text, _ = tok.detokenize(offline_q)
    try:
        sock = socket.create_connection(("127.0.0.1", port))
        ws_client._handshake(sock, "127.0.0.1", port)
        ws_client._send(sock, json.dumps(
            {"signal": "start", "streaming": True}).encode(), 1)
        raw = pcm.tobytes()
        for i in range(0, len(raw), 4096):
            ws_client._send(sock, raw[i : i + 4096], 2)
        ws_client._send(sock, json.dumps({"signal": "end"}).encode(), 1)
        final = None
        partials = 0
        while True:
            opcode, payload = ws_client._recv(sock)
            if opcode == 8:
                break
            msg = json.loads(payload.decode("utf-8"))
            if msg.get("type") == "partial_result":
                partials += 1
            if msg.get("type") == "final_result":
                final = msg.get("nbest")
                break
        sock.close()
        assert final == offline_text, (final, offline_text)
    finally:
        srv.shutdown()


def test_streaming_session_mamba_family():
    """The session covers the mamba_att (uni) family too."""
    model, params, tok, featurize = _assets("mamba_att")
    c, k = 8, 3
    T = 4 * k * c + 20
    n_samples = (T - 1) * 160 + 400
    rng = np.random.RandomState(8)
    wav = (rng.randn(n_samples) * 0.1).astype(np.float32)

    feats, flens = featurize(jnp.asarray(wav[None]),
                             jnp.asarray([len(wav)]), train=False)
    enc, el = model.apply(params, feats, flens,
                          method=model.forward_encoder)
    logp = model.apply(params, enc, method=model.ctc_logprobs)
    offline = search.ctc_greedy_search(np.asarray(logp),
                                       np.asarray(el))[0].tokens

    sess = make_session_factory(model, params, tok, featurize,
                                decoding_chunk_size=c)()
    for p in np.array_split(wav, 5):
        sess.accept_waveform(p)
    assert sess.finalize().tokens == offline


def _offline_greedy(model, params, featurize, wav):
    feats, flens = featurize(jnp.asarray(wav[None]),
                             jnp.asarray([len(wav)]), train=False)
    enc, el = model.apply(params, feats, flens,
                          method=model.forward_encoder)
    logp = model.apply(params, enc, method=model.ctc_logprobs)
    return search.ctc_greedy_search(np.asarray(logp),
                                    np.asarray(el))[0].tokens


def test_streaming_batch_matches_offline():
    """StreamingBatch (one fused dispatch for all slots) == offline, with
    staggered joins, different utterance lengths, and slot reuse."""
    from paper_accurate_fast_cheap_tpu.streaming import StreamingBatch

    model, params, tok, featurize = _assets()
    c = 8
    batch = StreamingBatch(model, params, tok, featurize,
                           max_sessions=3, decoding_chunk_size=c)
    rng = np.random.RandomState(11)

    def make_wav(t_frames):
        n = (t_frames - 1) * 160 + 400
        return (rng.randn(n) * 0.1).astype(np.float32)

    # three concurrent utterances, different lengths (one with a flushed
    # tail, one tail-less, one short)
    wavs = [make_wav(4 * 3 * c + 20), make_wav(4 * 4 * c),
            make_wav(4 * 2 * c + 3)]
    offline = [_offline_greedy(model, params, featurize, w) for w in wavs]

    sids = [batch.open(), batch.open(), batch.open()]
    # staggered drip-feed: slot 0 gets audio first, others join later
    pieces = [list(np.array_split(w, 5)) for w in wavs]
    for rounds in range(7):
        for j, sid in enumerate(sids):
            if rounds >= j and pieces[j]:
                batch.accept_waveform(sid, pieces[j].pop(0))
        while batch.any_ready():
            batch.step()
    finals = [batch.finalize(sid) for sid in sids]
    for j, f in enumerate(finals):
        assert f.final
        assert f.tokens == offline[j], (j, f.tokens, offline[j])
        assert len(f.times) == len(f.tokens)
        assert all(b >= a for a, b in zip(f.times, f.times[1:]))

    # slot reuse: freed slots accept a NEW utterance; the fresh-mask
    # state reset must make it independent of the previous occupant
    w_new = make_wav(4 * 3 * c)
    sid = batch.open()
    batch.accept_waveform(sid, w_new)
    fin = batch.finalize(sid)
    assert fin.tokens == _offline_greedy(model, params, featurize, w_new)


def test_streaming_batch_rejects_mha():
    from paper_accurate_fast_cheap_tpu.streaming import StreamingBatch

    config = {
        "model": "asr_model", "encoder": "conformer",
        "encoder_conf": dict(
            output_size=32, attention_heads=2, linear_units=64,
            num_blocks=1, dropout_rate=0.0,
            selfattention_layer_type="selfattn", causal=True,
            input_layer="conv2d", cnn_module_kernel=7,
            use_cnn_module=True),
        "decoder": None, "model_conf": {"ctc_weight": 1.0},
    }
    tok = _Tok()
    model, _ = factory.init_model(config, tok.vocab_size(), 23)
    import pytest

    with pytest.raises(ValueError, match="recurrent-attention"):
        StreamingBatch(model, None, tok, None)


def test_streaming_websocket_batched():
    """--streaming_batch N: two concurrent ws connections ride one
    fused device step; finals equal their offline decodes."""
    import json
    import socket
    import threading
    import types

    from paper_accurate_fast_cheap_tpu.bin import serve as serve_mod
    from paper_accurate_fast_cheap_tpu.bin import ws_client

    model, params, tok, featurize = _assets()
    c = 8
    rng = np.random.RandomState(9)
    wavs, pcms, want = [], [], []
    for k in (3, 4):
        n = (4 * k * c + 3 - 1) * 160 + 400
        w = (rng.randn(n) * 0.1).astype(np.float32)
        pcm = np.clip(w * 32767, -32768, 32767).astype("<i2")
        wq = pcm.astype(np.float32) / 32768.0
        wavs.append(w)
        pcms.append(pcm)
        want.append(tok.detokenize(
            _offline_greedy(model, params, featurize, wq))[0])

    shim = types.SimpleNamespace(model=model, params=params,
                                 tokenizer=tok, featurize=featurize,
                                 transcribe_batch=None)
    srv = serve_mod.serve(shim, host="127.0.0.1", port=0,
                          streaming_chunk=c, streaming_batch=2)
    assert srv.stream_worker is not None
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    finals = [None, None]

    def run_conn(j):
        sock = socket.create_connection(("127.0.0.1", port))
        ws_client._handshake(sock, "127.0.0.1", port)
        ws_client._send(sock, json.dumps(
            {"signal": "start", "streaming": True}).encode(), 1)
        raw = pcms[j].tobytes()
        for i in range(0, len(raw), 4096):
            ws_client._send(sock, raw[i : i + 4096], 2)
        ws_client._send(sock, json.dumps({"signal": "end"}).encode(), 1)
        while True:
            opcode, payload = ws_client._recv(sock)
            if opcode == 8:
                break
            msg = json.loads(payload.decode("utf-8"))
            if msg.get("type") == "final_result":
                finals[j] = msg.get("nbest")
                break
        sock.close()

    try:
        threads = [threading.Thread(target=run_conn, args=(j,))
                   for j in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert finals[0] == want[0], (finals[0], want[0])
        assert finals[1] == want[1], (finals[1], want[1])
    finally:
        srv.shutdown()
        srv.stream_worker.shutdown()
