"""Bidirectional transducer: forward + time-reversed RNN-T heads.

Parity target: `wenet/transducer_espnet/bitransducer.py:12-110` — a shared
encoder feeds two independent (predictor, joint) pairs; the right head sees
the encoder output time-reversed within each utterance's valid region
(`reverse_features_pad_list`, pad 0.0) and the label sequence reversed
(`reverse_pad_list`), and the losses combine as ``0.7 * L + 0.3 * R``
(`bitransducer.py:106`).

TPU-first notes: both branches reuse the chunked-gather RNN-T loss
(`ops/rnnt.py`) — no (B, T, U, V) lattice is ever materialized — and the
valid-region flip is a static-shape `take_along_axis`, the same masked-flip
trick the bidirectional RWKV uses, so the whole loss stays inside one jit.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.models.encoder_registry import (
    build_encoder,
)
from paper_accurate_fast_cheap_tpu.models import joint as joint_mod
from paper_accurate_fast_cheap_tpu.models.joint import TransducerJoint
from paper_accurate_fast_cheap_tpu.models.transducer import PREDICTORS
from paper_accurate_fast_cheap_tpu.ops import rnnt as rnnt_ops
from paper_accurate_fast_cheap_tpu.utils import common


def reverse_features_pad_list(x: jax.Array, lens: jax.Array) -> jax.Array:
    """Flip each (B, T, D) row's valid prefix in time; zero the padding
    (`bitransducer.py:47-72`, pad_value 0.0)."""
    B, T, _ = x.shape
    pos = jnp.arange(T)[None, :]
    idx = jnp.clip(lens[:, None] - 1 - pos, 0, T - 1)
    rev = jnp.take_along_axis(x, idx[..., None], axis=1)
    return jnp.where((pos < lens[:, None])[..., None], rev, 0.0)


class BiTransducer(nn.Module):
    """`bitransducer.py:12-110` (LM/CTC-free: pure dual RNN-T loss)."""

    vocab_size: int
    encoder_conf: Any
    encoder_type: str = "conformer"
    predictor: str = "rnn"
    predictor_conf: Any = None
    joint_conf: Any = None
    blank_id: int = 0
    weight_fwd: float = 0.7   # `bitransducer.py:106`
    weight_rev: float = 0.3
    ignore_id: int = common.IGNORE_ID
    rnnt_t_chunk: int = 16

    def setup(self):
        enc_conf = dict(self.encoder_conf)
        self.encoder = build_encoder(self.encoder_type, enc_conf)
        pred_conf = dict(self.predictor_conf or {})
        joint_conf = dict(self.joint_conf or {})
        joint_conf.setdefault("enc_output_size",
                              enc_conf.get("output_size", 512))
        joint_conf.setdefault("pred_output_size",
                              pred_conf.get("output_size", 640))
        self.predictor_l = PREDICTORS[self.predictor](
            vocab_size=self.vocab_size, **pred_conf, name="predictor")
        self.predictor_r = PREDICTORS[self.predictor](
            vocab_size=self.vocab_size, **pred_conf, name="predictor_r")
        self.joint_l = TransducerJoint(
            vocab_size=self.vocab_size, **joint_conf, name="joint")
        self.joint_r = TransducerJoint(
            vocab_size=self.vocab_size, **joint_conf, name="joint_r")

    def _branch_loss(self, predictor, joint, enc, enc_lens, labels,
                     label_lens, deterministic):
        ys_blank = common.add_blank(labels, label_lens, self.blank_id)
        pred_out = predictor(ys_blank, deterministic=deterministic)
        enc_p = joint.project_enc(enc)
        pred_p = joint.project_pred(pred_out)
        _ = joint.joint_projected(enc_p[:1, :1, None, :],
                                  pred_p[:1, None, :1, :])
        joint_fn = joint_mod.make_pure_joint_fn(
            joint.variables["params"], activation=joint.activation,
            postjoin_linear=joint.postjoin_linear,
            hat_joint=joint.hat_joint)
        lab_lp, blank_lp = rnnt_ops.gather_rnnt_logprobs_chunked(
            enc_p, pred_p, labels, joint_fn,
            blank_id=self.blank_id, t_chunk=self.rnnt_t_chunk)
        return jnp.mean(
            rnnt_ops.rnnt_forward(lab_lp, blank_lp, enc_lens, label_lens))

    def __call__(self, feats, feat_lens, labels, label_lens,
                 deterministic: bool = True) -> Dict[str, jax.Array]:
        enc, enc_lens = self.encoder(feats, feat_lens,
                                     deterministic=deterministic)
        loss_l = self._branch_loss(
            self.predictor_l, self.joint_l, enc, enc_lens, labels,
            label_lens, deterministic)
        enc_r = reverse_features_pad_list(enc, enc_lens)
        labels_r = common.reverse_pad_list(labels, label_lens, 0)
        loss_r = self._branch_loss(
            self.predictor_r, self.joint_r, enc_r, enc_lens, labels_r,
            label_lens, deterministic)
        loss = self.weight_fwd * loss_l + self.weight_rev * loss_r
        return {"loss": loss, "loss_rnnt": loss_l, "loss_rnnt_r": loss_r}
