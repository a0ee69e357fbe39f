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
