"""Teacher-student distillation.

Parity target: `wenet/transformer/ts_asr_model.py` (TeacherStudentASRModel)
+ `wenet/utils/executor_ts.py`: a frozen teacher provides CTC posterior
targets; the student minimizes its own supervised loss plus a KL/distill
term on CTC distributions (and optionally an L2 on encoder outputs).

TPU-first: the teacher forward runs inside the same jitted loss with
stop_gradient (no separate executor needed — `make_ts_loss_fn` drops into
`train_step.make_train_step`).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp


def kl_ctc_distill(student_logp, teacher_logp, enc_mask):
    """KL(teacher || student) over frames (teacher fixed)."""
    t = jnp.exp(teacher_logp)
    kl = jnp.sum(t * (teacher_logp - student_logp), axis=-1)  # (B, T)
    kl = jnp.where(enc_mask, kl, 0.0)
    return jnp.sum(kl) / jnp.maximum(jnp.sum(enc_mask), 1)


def make_ts_loss_fn(
    student_model,
    teacher_model,
    teacher_params,
    distill_weight: float = 1.0,
    student_weight: float = 1.0,
    encoder_l2_weight: float = 0.0,
) -> Callable:
    """Build loss_fn(params, batch, rng) for train_step.make_train_step."""
    from paper_accurate_fast_cheap_tpu.utils import masks as mask_utils

    def loss_fn(params, batch, rng):
        feats, feat_lens, labels, label_lens = batch
        out = student_model.apply(
            params, feats, feat_lens, labels, label_lens,
            deterministic=False, rngs={"dropout": rng},
        )
        s_enc, s_lens = student_model.apply(
            params, feats, feat_lens, method=student_model.forward_encoder
        )
        s_logp = student_model.apply(params, s_enc,
                                     method=student_model.ctc_logprobs)
        t_enc, t_lens = teacher_model.apply(
            teacher_params, feats, feat_lens,
            method=teacher_model.forward_encoder,
        )
        t_logp = teacher_model.apply(teacher_params, t_enc,
                                     method=teacher_model.ctc_logprobs)
        t_logp = jax.lax.stop_gradient(t_logp)
        mask = mask_utils.make_pad_mask(s_lens, s_enc.shape[1])
        loss_distill = kl_ctc_distill(s_logp, t_logp, mask)
        loss = student_weight * out["loss"] + distill_weight * loss_distill
        if encoder_l2_weight > 0.0:
            l2 = jnp.mean(jnp.square(
                s_enc - jax.lax.stop_gradient(t_enc)))
            loss = loss + encoder_l2_weight * l2
        metrics = {
            "loss_student": out["loss"],
            "loss_distill": loss_distill,
        }
        return loss, metrics

    return loss_fn
