"""On-device RNN-T prefix beam search: parity vs the host oracle and vs the
reference's own `prefix_beam_search_decode_batch`
(`/root/reference/wenet/transducer/search/prefix_beam_search.py:428-574`)
on identical random posteriors with a shared recurrent predictor.
"""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.decode import rnnt_search


class _Setup:
    """Random joint/predictor weights shared between jax and torch."""

    def __init__(self, seed, B=3, T=12, V=9, H=8, De=4):
        rng = np.random.RandomState(seed)
        self.B, self.T, self.V, self.H, self.De = B, T, V, H, De
        self.E = (rng.randn(V, H) * 0.5).astype(np.float32)
        self.W = (rng.randn(H, H) * 0.3).astype(np.float32)
        self.A = rng.randn(De, V).astype(np.float32)
        self.Bm = rng.randn(H, V).astype(np.float32)
        self.enc = rng.randn(B, T, De).astype(np.float32)
        ctc = rng.randn(B, T, V).astype(np.float32) * 1.5
        ctc = ctc - np.log(np.exp(ctc).sum(-1, keepdims=True))
        self.ctc = ctc.astype(np.float32)
        self.lens = np.asarray(
            [max(1, T - 3 * i) for i in range(B)], np.int32
        )

    # jax side -----------------------------------------------------------
    def jax_fns(self):
        E, W, A, Bm = map(jnp.asarray, (self.E, self.W, self.A, self.Bm))

        def predictor_step(tokens, state):
            s = jnp.tanh(state @ W + E[tokens])
            return s, s

        def joint_step(enc_t, pred):
            return jax.nn.log_softmax(enc_t @ A + pred @ Bm)

        return predictor_step, joint_step, lambda n: jnp.zeros((n, self.H))


def _run_ours(setup, impl, beam=4, cw=0.3, tw=0.7, merge="sort"):
    ps, js, init = setup.jax_fns()
    return rnnt_search.rnnt_beam_search(
        ps, js, init, jnp.asarray(setup.enc), jnp.asarray(setup.lens),
        jnp.asarray(setup.ctc), beam_size=beam, blank_id=0,
        ctc_weight=cw, transducer_weight=tw, impl=impl, merge=merge,
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6])
def test_pairwise_merge_matches_sort(seed):
    """The sort-free (pairwise) duplicate-merge must reproduce the sorted
    walk exactly — hypotheses AND scores (same float ops, same order)."""
    setup = _Setup(seed)
    pw = _run_ours(setup, "device", merge="pairwise")
    srt = _run_ours(setup, "device", merge="sort")
    host = _run_ours(setup, "host")
    for p, s, h in zip(pw, srt, host):
        assert p.nbest == s.nbest == h.nbest, (seed, p.nbest, s.nbest)
        np.testing.assert_allclose(p.nbest_scores, s.nbest_scores,
                                   rtol=1e-6, atol=1e-6)


def test_pairwise_merge_bigger_beam():
    setup = _Setup(13, B=4, T=20, V=16, H=12)
    pw = _run_ours(setup, "device", beam=8, merge="pairwise")
    host = _run_ours(setup, "host", beam=8)
    for p, h in zip(pw, host):
        assert p.nbest == h.nbest
        np.testing.assert_allclose(p.nbest_scores, h.nbest_scores,
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6])
def test_device_matches_host(seed):
    setup = _Setup(seed)
    dev = _run_ours(setup, "device")
    host = _run_ours(setup, "host")
    for d, h in zip(dev, host):
        assert d.nbest == h.nbest, (seed, d.nbest, h.nbest)
        np.testing.assert_allclose(
            d.nbest_scores, h.nbest_scores, rtol=2e-4, atol=2e-4
        )


def test_device_matches_host_bigger_beam():
    setup = _Setup(11, B=4, T=20, V=16, H=12)
    dev = _run_ours(setup, "device", beam=8)
    host = _run_ours(setup, "host", beam=8)
    for d, h in zip(dev, host):
        assert d.nbest == h.nbest
        np.testing.assert_allclose(
            d.nbest_scores, h.nbest_scores, rtol=2e-4, atol=2e-4
        )


# --- reference parity ----------------------------------------------------

@pytest.fixture(scope="module")
def ref_pbs():
    import torch  # noqa: F401

    for name in ("torchaudio", "torchaudio.compliance",
                 "torchaudio.compliance.kaldi", "langid", "sentencepiece"):
        sys.modules.setdefault(name, types.ModuleType(name))
    wh = types.ModuleType("whisper")
    wt = types.ModuleType("whisper.tokenizer")
    wt.LANGUAGES = {"en": "english"}
    wh.tokenizer = wt
    sys.modules.setdefault("whisper", wh)
    sys.modules.setdefault("whisper.tokenizer", wt)
    dec = types.ModuleType("wenet.transformer.decoder")
    for cls in ("LanguageSpecificTransformerDecoder", "TransformerDecoder",
                "BiTransformerDecoder"):
        setattr(dec, cls, type(cls, (), {}))
    sys.modules["wenet.transformer.decoder"] = dec
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from wenet.transducer.search import prefix_beam_search as pbs
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference prefix_beam_search unimportable: {e}")
    return pbs


def _ref_stub(setup):
    import torch

    E = torch.from_numpy(setup.E)
    W = torch.from_numpy(setup.W)
    A = torch.from_numpy(setup.A)
    Bm = torch.from_numpy(setup.Bm)
    H = setup.H

    class Pred:
        def init_state(self, batch, method="zero", device=None):
            return [torch.zeros(batch, H)]

        def cache_to_batch(self, caches):
            return [torch.cat([c[0] for c in caches], dim=0)]

        def batch_to_cache(self, cache):
            s = cache[0]
            return [[s[i : i + 1]] for i in range(s.shape[0])]

        def forward_step(self, pre_t, padding, cache):
            # pre_t (n, 1); cache [s (n, H)]
            s = torch.tanh(cache[0] @ W + E[pre_t[:, 0]])
            return s.unsqueeze(1), [s]

    def joint(enc_x, pred_t):
        # enc_x (n, 1, De), pred_t (n, 1, H) -> (n, 1, 1, V) raw logits
        return (enc_x @ A).unsqueeze(2) + (pred_t @ Bm).unsqueeze(2)

    return Pred(), joint


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_device_matches_reference_batch(ref_pbs, seed):
    import torch

    setup = _Setup(seed)
    pred, joint = _ref_stub(setup)
    searcher = ref_pbs.PrefixBeamSearch(
        encoder=None, predictor=pred, joint=joint, ctc=None, blank=0
    )
    ref = searcher.prefix_beam_search_decode_batch(
        torch.from_numpy(setup.enc), torch.from_numpy(setup.lens.copy()),
        torch.from_numpy(setup.ctc), beam_size=4,
        ctc_weight=0.3, transducer_weight=0.7,
    )
    dev = _run_ours(setup, "device", beam=4)
    for r, d in zip(ref, dev):
        r_nbest = [list(h) for h in r.nbest]
        assert d.nbest == r_nbest, (seed, d.nbest, r_nbest)
        np.testing.assert_allclose(
            d.nbest_scores, [float(s) for s in r.nbest_scores],
            rtol=2e-4, atol=2e-4,
        )


def test_beam_cache_survives_nested_tracing():
    """Tracing rnnt_beam_search under an OUTER jit twice (same shapes)
    must not reuse a cached scan whose closure holds first-trace tracers
    (regression: the fused recognize_wav chain + any same-key re-trace
    raised UnexpectedTracerError), and a traced call must not poison the
    cache for later eager same-key calls."""
    setup = _Setup(11)
    ps, js, init = setup.jax_fns()
    enc, lens, ctc = map(
        jnp.asarray, (setup.enc, setup.lens, setup.ctc))

    def search(e, l, c):
        out = rnnt_search.rnnt_beam_search(
            ps, js, init, e, l, c, beam_size=4, blank_id=0,
            ctc_weight=0.3, transducer_weight=0.7, defer=True)
        return out["scores"]

    s1 = jax.jit(search)(enc, lens, ctc)          # first trace
    s2 = jax.jit(search)(enc, lens, ctc)          # fresh jit, re-trace
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))
    # eager call after traced ones: must not pick up tracer closures
    eager = rnnt_search.rnnt_beam_search(
        ps, js, init, enc, lens, ctc, beam_size=4, blank_id=0,
        ctc_weight=0.3, transducer_weight=0.7, defer=True)
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(eager["scores"]), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("V,k", [(1100, 16), (1100, 9), (2000, 8)])
def test_top_k_vocab_no_duplicates(V, k):
    """k >= number-of-chunks used to duplicate tokens: _top_k_iter over the
    G chunk maxima returns chunk id 0 once every chunk is masked (argmax
    of all -inf), so the duplicated chunk's elements could win top-k twice
    with finite scores.  V=1100 -> G=9 chunks (>8*128 so the chunked path
    is eligible); k=16 and k=9 hit the guard, k=8/V=2000 exercises the
    two-level path itself."""
    rng = np.random.RandomState(V + k)
    x = jnp.asarray(rng.randn(3, V).astype(np.float32))
    vals, idx = jax.jit(
        lambda a: rnnt_search.top_k_vocab(a, k))(x)
    vals, idx = np.asarray(vals), np.asarray(idx)
    for b in range(x.shape[0]):
        assert len(set(idx[b].tolist())) == k, idx[b]
        ref = np.sort(np.asarray(x)[b])[::-1][:k]
        np.testing.assert_allclose(np.sort(vals[b])[::-1], ref, rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 3])
def test_packed_finalize_matches_dict(seed):
    """pack_device_beam -> finalize(packed, beam=N) reproduces the plain
    3-array finalize exactly (tokens, nbest, bit-exact scores), including
    under an outer jit (the fused product chain's usage)."""
    setup = _Setup(seed)
    ps, js, init = setup.jax_fns()

    def deferred():
        return rnnt_search.rnnt_beam_search(
            ps, js, init, jnp.asarray(setup.enc), jnp.asarray(setup.lens),
            jnp.asarray(setup.ctc), beam_size=4, blank_id=0,
            ctc_weight=0.3, transducer_weight=0.7, impl="device",
            defer=True)

    out = deferred()
    want = rnnt_search.finalize_device_beam(
        {k: out[k] for k in ("hyps", "hyp_len", "scores")})
    # same carry through the packed path: must be BIT-exact
    packed = rnnt_search.pack_device_beam(out)
    got = rnnt_search.finalize_device_beam(packed, beam=4)
    for w, g in zip(want, got):
        assert g.tokens == w.tokens
        assert g.nbest == w.nbest
        assert g.nbest_scores == w.nbest_scores   # bitcast round trip
    # and the fused-product usage: pack inside an outer jit traces fine
    # (float fusion may differ across compilation contexts; hypotheses
    # on this well-separated setup must not)
    packed2 = jax.jit(lambda: rnnt_search.pack_device_beam(deferred()))()
    got2 = rnnt_search.finalize_device_beam(packed2, beam=4)
    for w, g in zip(want, got2):
        assert g.tokens == w.tokens


def test_under_trace_detection():
    """_under_trace() must be True inside jit tracing and False eagerly.

    The VMEM-pinned fused predictor is gated on this (a pinned-weight
    kernel inside an ENCLOSING jit kills the TPU worker at runtime —
    NOTES.md round-4 crash envelope), so the detection must hold under
    jax.jit, vmap, and grad tracing regardless of jax's constant-folding
    behavior (ADVICE r4).
    """
    assert not rnnt_search._under_trace()
    seen = {}

    def probe(x):
        seen["jit"] = rnnt_search._under_trace()
        return x * 2

    jax.jit(probe)(jnp.ones(()))
    assert seen["jit"] is True
    assert not rnnt_search._under_trace()  # clean again after tracing

    def probe_grad(x):
        seen["grad"] = rnnt_search._under_trace()
        return (x * x).sum()

    jax.grad(probe_grad)(jnp.ones(()))
    assert seen["grad"] is True

    def probe_vmap(x):
        seen["vmap"] = rnnt_search._under_trace()
        return x + 1

    jax.vmap(probe_vmap)(jnp.ones((3,)))
    assert seen["vmap"] is True
    assert not rnnt_search._under_trace()


def test_beam_cache_key_tracks_env(monkeypatch):
    """Flipping PAFC_PRED_FUSED / PAFC_TOPK_VMEM between calls must not
    silently reuse a scan compiled for the other predictor/top-k path
    (ADVICE r4): the resolved decisions ride in the cache key."""
    setup = _Setup(0)
    ps, js, init = setup.jax_fns()
    args = (ps, js, init, jnp.asarray(setup.enc), jnp.asarray(setup.lens),
            jnp.asarray(setup.ctc))
    kw = dict(beam_size=4, blank_id=0, ctc_weight=0.3,
              transducer_weight=0.7, impl="device")
    rnnt_search._DEVICE_BEAM_CACHE.clear()
    monkeypatch.setenv("PAFC_TOPK_VMEM", "1")
    r1 = rnnt_search.rnnt_beam_search(*args, **kw)
    n1 = len(rnnt_search._DEVICE_BEAM_CACHE)
    assert n1 == 1
    # on CPU topk_w_vmem_enabled() is False either way (backend gate), so
    # assert on the key structure instead: the trailing fields are the
    # resolved (pred_fused, topk_w_vmem) decisions + align_pack
    key = next(iter(rnnt_search._DEVICE_BEAM_CACHE))
    assert isinstance(key[-2], bool) and isinstance(key[-3], bool)
    assert key[-1] == 0  # align_pack off in this call
    # same env -> cache hit (no growth)
    r2 = rnnt_search.rnnt_beam_search(*args, **kw)
    assert len(rnnt_search._DEVICE_BEAM_CACHE) == 1
    for a, b in zip(r1, r2):
        assert a.tokens == b.tokens


def test_align_pack_parity():
    """align_pack: the beam's own program with folded Viterbi align +
    one-buffer packing reproduces (a) the plain device beam's hypotheses
    bit-exactly and (b) the separately-computed
    `force_align_device_tokens` path/ok on the same top hypotheses —
    the `recognize_wav --fuse split` single-fetch contract."""
    from paper_accurate_fast_cheap_tpu.ops import ctc_utils

    setup = _Setup(3)
    ps, js, init = setup.jax_fns()
    enc = jnp.asarray(setup.enc)
    lens = jnp.asarray(setup.lens)
    ctc = jnp.asarray(setup.ctc)
    kw = dict(beam_size=4, blank_id=0, ctc_weight=0.3,
              transducer_weight=0.7, impl="device")

    plain = rnnt_search.rnnt_beam_search(ps, js, init, enc, lens, ctc,
                                         **kw)
    buf = rnnt_search.rnnt_beam_search(ps, js, init, enc, lens, ctc,
                                       defer=True, align_pack=8, **kw)
    res, path, ok, lens_out = rnnt_search.finalize_device_beam_aligned(
        buf, beam=4)
    assert list(lens_out) == list(np.asarray(setup.lens))
    for a, b in zip(plain, res):
        assert a.tokens == b.tokens
        assert a.nbest == b.nbest
        assert a.nbest_scores == b.nbest_scores

    # reference align on the final hypotheses
    carry = rnnt_search.rnnt_beam_search(ps, js, init, enc, lens, ctc,
                                         defer=True, **kw)
    want_path, want_ok = ctc_utils.force_align_device_tokens(
        ctc, lens, carry["hyps"][:, 0, :8], carry["hyp_len"][:, 0])
    np.testing.assert_array_equal(np.asarray(want_ok), ok)
    np.testing.assert_array_equal(np.asarray(want_path), path)

    # non-deferred aligned call returns plain results
    res2 = rnnt_search.rnnt_beam_search(ps, js, init, enc, lens, ctc,
                                        align_pack=8, **kw)
    for a, b in zip(plain, res2):
        assert a.tokens == b.tokens
