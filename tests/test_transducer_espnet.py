"""ESPnet-style transducer alt search stack: synthetic correctness + parity
against the reference's own `beam_search_transducer.py` (default/TSD/ALSD)
run on a shared stub recurrent predictor + linear joint.
"""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paper_accurate_fast_cheap_tpu.decode.transducer_espnet import (
    BeamSearchTransducer,
)

V = D = 10


def predictor_step(tokens, state):
    return jax.nn.one_hot(tokens, D), state


def joint_step(enc_t, pred_out):
    logits = enc_t * 10.0
    same = jnp.sum(enc_t * pred_out, -1, keepdims=True) > 0.5
    blank_boost = jnp.where(same, 20.0, -20.0)
    logits = logits.at[:, 0].set(blank_boost[:, 0])
    return jax.nn.log_softmax(logits)


@pytest.mark.parametrize("stype", ["default", "tsd", "alsd", "nsc",
                                   "maes"])
def test_synthetic_sequence_recovered(stype):
    seq = [5, 7, 3]
    # ALSD caps symbols at u_max <= T-1 (`:423`), so give it T=4 frames
    enc = jax.nn.one_hot(jnp.asarray(seq + [3]), D)
    bs = BeamSearchTransducer(
        predictor_step, joint_step, lambda n: jnp.zeros((n,)),
        beam_size=4, search_type=stype)
    res = bs.decode(enc)
    assert res.tokens == seq, (stype, res.tokens)


# --- reference parity ------------------------------------------------------

class _Shared:
    def __init__(self, seed, T=8, V=7, H=6, De=4):
        rng = np.random.RandomState(seed)
        self.T, self.V, self.H, self.De = T, V, H, De
        self.E = (rng.randn(V, H) * 0.5).astype(np.float32)
        self.W = (rng.randn(H, H) * 0.3).astype(np.float32)
        self.A = rng.randn(De, V).astype(np.float32)
        self.Bm = rng.randn(H, V).astype(np.float32)
        self.enc = rng.randn(T, De).astype(np.float32)

    def jax_fns(self):
        E, W, A, Bm = map(jnp.asarray, (self.E, self.W, self.A, self.Bm))

        def pstep(tokens, state):
            s = jnp.tanh(state @ W + E[tokens])
            return s, s

        def jstep(enc_t, pred):
            return jax.nn.log_softmax(enc_t @ A + pred @ Bm)

        return pstep, jstep, lambda n: jnp.zeros((n, self.H))


@pytest.fixture(scope="module")
def ref_bst():
    import torch  # noqa: F401

    for name in ("torchaudio", "torchaudio.compliance",
                 "torchaudio.compliance.kaldi", "langid", "sentencepiece"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
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
    sys.modules.setdefault("wenet.transformer.decoder", dec)
    try:
        from wenet.transducer_espnet import beam_search_transducer as bst
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference espnet stack unimportable: {e}")
    return bst


def _ref_stub(shared):
    """Duck-typed AbsDecoder + JointNetwork over the shared weights.
    State = single tensor (1, B, H); dec_out = tanh recurrence output."""
    import torch

    E = torch.from_numpy(shared.E)
    W = torch.from_numpy(shared.W)
    A = torch.from_numpy(shared.A)
    Bm = torch.from_numpy(shared.Bm)
    H = shared.H

    class Dec:
        dunits = H
        odim = shared.V
        blank_id = 0
        device = torch.device("cpu")

        def set_device(self, device):
            pass

        def init_state(self, batch):
            return (torch.zeros(1, batch, H), None)

        def select_state(self, states, idx):
            return (states[0][:, idx : idx + 1], None)

        def create_batch_states(self, states, new_states, check=None):
            return (torch.cat([s[0] for s in new_states], dim=1), None)

        def _step(self, last_tokens, s):
            # s (1, B, H); tokens (B,)
            s2 = torch.tanh(s[0].squeeze(0) @ W + E[last_tokens])
            return s2, (s2.unsqueeze(0), None)

        def score(self, hyp, cache):
            key = "_".join(map(str, hyp.yseq))
            if key in cache:
                dec_out, dec_state = cache[key]
            else:
                toks = torch.tensor([hyp.yseq[-1]])
                dec_out, dec_state = self._step(toks, hyp.dec_state)
                dec_out = dec_out[0]
                cache[key] = (dec_out, dec_state)
            import torch as _t

            return dec_out, dec_state, _t.tensor([hyp.yseq[-1]])

        def batch_score(self, hyps, dec_states, cache, use_lm):
            done = [None] * len(hyps)
            proc = []
            for i, hyp in enumerate(hyps):
                key = "_".join(map(str, hyp.yseq))
                if key in cache:
                    done[i] = cache[key]
                else:
                    proc.append((i, key, hyp))
            if proc:
                toks = torch.tensor([p[2].yseq[-1] for p in proc])
                s = torch.cat([p[2].dec_state[0] for p in proc], dim=1)
                out, _ = self._step(toks, (s, None))
                for j, (i, key, hyp) in enumerate(proc):
                    st = (out[j][None, None, :], None)
                    done[i] = (out[j], st)
                    cache[key] = (out[j], st)
            dec_out = torch.stack([d[0] for d in done])
            states = (torch.cat([d[1][0] for d in done], dim=1), None)
            lm_tokens = torch.tensor([h.yseq[-1] for h in hyps])
            return dec_out, states, lm_tokens

    def joint(enc, dec):
        return enc @ A + dec @ Bm

    return Dec(), joint


@pytest.mark.parametrize("stype", ["default", "tsd", "alsd", "nsc",
                                   "maes"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_reference_parity(ref_bst, stype, seed):
    import torch

    shared = _Shared(seed)
    dec, joint = _ref_stub(shared)
    kw = dict(beam_size=4, search_type=stype, max_sym_exp=2, u_max=50,
              nstep=2, prefix_alpha=2, expansion_gamma=2.3,
              expansion_beta=2, nbest=4)
    ref = ref_bst.BeamSearchTransducer(decoder=dec, joint_network=joint,
                                       **kw)
    with torch.no_grad():
        ref_hyps = ref(torch.from_numpy(shared.enc))

    pstep, jstep, init = shared.jax_fns()
    ours = BeamSearchTransducer(pstep, jstep, init, **kw)
    our_hyps = ours(jnp.asarray(shared.enc))

    ref_seqs = [list(h.yseq) for h in ref_hyps]
    our_seqs = [list(h.yseq) for h in our_hyps]
    assert our_seqs == ref_seqs, (stype, seed, our_seqs, ref_seqs)
    np.testing.assert_allclose(
        [h.score for h in our_hyps], [float(h.score) for h in ref_hyps],
        rtol=1e-4, atol=1e-4)
