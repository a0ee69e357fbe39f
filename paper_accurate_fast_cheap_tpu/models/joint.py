"""Transducer joint network.

Parity target: `wenet/transducer/joint.py` — add-mode join with optional
pre/post projections, tanh|relu activation, HAT variant (`:52-108`).  The
reference's `forward_optimized` packed layout (`:111-148`) exists only to
feed the external optimized_transducer CUDA loss; our chunked lax.scan loss
(ops/rnnt.py) takes the projected activations directly, so no packed-layout
surface is needed.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class TransducerJoint(nn.Module):
    vocab_size: int
    enc_output_size: int = 512
    pred_output_size: int = 640
    join_dim: int = 640
    prejoin_linear: bool = True
    postjoin_linear: bool = False
    joint_mode: str = "add"
    activation: str = "tanh"
    hat_joint: bool = False

    def setup(self):
        assert self.joint_mode == "add"
        if self.prejoin_linear:
            self.enc_ffn = nn.Dense(self.join_dim, name="enc_ffn")
            self.pred_ffn = nn.Dense(self.join_dim, name="pred_ffn")
        if self.postjoin_linear:
            self.post_ffn = nn.Dense(self.join_dim, name="post_ffn")
        if not self.hat_joint:
            self.ffn_out = nn.Dense(self.vocab_size, name="ffn_out")
        else:
            self.blank_pred = nn.Dense(1, name="blank_pred")
            self.token_pred = nn.Dense(self.vocab_size - 1,
                                       name="token_pred")

    def _act(self, x):
        return {"tanh": jnp.tanh, "relu": nn.relu, "swish": nn.silu}[
            self.activation
        ](x)

    def project_enc(self, enc):
        return self.enc_ffn(enc) if self.prejoin_linear else enc

    def project_pred(self, pred):
        return self.pred_ffn(pred) if self.prejoin_linear else pred

    def joint_projected(self, enc_p, pred_p):
        """enc_p: (..., T, 1, J) or (..., J); pred_p broadcastable.  Applies
        add + activation + vocab projection (logits)."""
        x = enc_p + pred_p
        if self.postjoin_linear:
            x = self.post_ffn(x)
        x = self._act(x)
        if not self.hat_joint:
            return self.ffn_out(x)
        blank = self.blank_pred(x)
        token = jax.nn.log_softmax(self.token_pred(x), axis=-1)
        blank_logp = jax.nn.log_sigmoid(blank)
        token_logp = jnp.log1p(-jnp.exp(blank_logp)) + token
        return jnp.concatenate([blank_logp, token_logp], axis=-1)

    def __call__(self, enc, pred):
        """Full dense join: enc (B, T, De), pred (B, U, Dp) ->
        logits (B, T, U, V)."""
        e = self.project_enc(enc)[:, :, None, :]
        p = self.project_pred(pred)[:, None, :, :]
        return self.joint_projected(e, p)

    def single_step(self, enc_t, pred_u):
        """enc_t (B, De), pred_u (B, Dp) -> (B, V) logits (decode path)."""
        return self.joint_projected(self.project_enc(enc_t),
                                    self.project_pred(pred_u))

    def preact(self, enc_p, pred_u):
        """Everything up to (excluding) the vocab head: the activation fed
        to ffn_out.  ``enc_p`` is ALREADY enc-projected (callers hoist
        `project_enc` out of per-frame loops — one batched MXU matmul over
        all frames instead of T small ones).  Only meaningful for the
        non-HAT joint, whose head is a single Dense the device beam fuses
        into its pallas top-k kernel (`ops/topk_pallas.joint_top_k_vocab_
        pallas`)."""
        x = enc_p + self.project_pred(pred_u)
        if self.postjoin_linear:
            x = self.post_ffn(x)
        return self._act(x)


def make_pure_joint_fn(jparams, activation: str = "tanh",
                       postjoin_linear: bool = False,
                       hat_joint: bool = False):
    """Build a transform-safe (pure-array) version of joint_projected.

    flax module calls cannot appear inside raw lax.map/checkpoint (the RNN-T
    chunked loss), so the joint's projection weights are closed over as plain
    arrays.  ``jparams`` is the joint's bound param dict.
    """
    act = {"tanh": jnp.tanh, "relu": nn.relu, "swish": nn.silu}[activation]

    def dense(p, x):
        return x @ p["kernel"] + p["bias"]

    def fn(enc_p, pred_p):
        x = enc_p + pred_p
        if postjoin_linear:
            x = dense(jparams["post_ffn"], x)
        x = act(x)
        if not hat_joint:
            return dense(jparams["ffn_out"], x)
        blank_logp = jax.nn.log_sigmoid(dense(jparams["blank_pred"], x))
        token_logp = jnp.log1p(-jnp.exp(blank_logp)) + jax.nn.log_softmax(
            dense(jparams["token_pred"], x), axis=-1
        )
        return jnp.concatenate([blank_logp, token_logp], axis=-1)

    return fn
