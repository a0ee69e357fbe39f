"""Hybrid CTC + attention ASR model.

Parity target: `wenet/transformer/asr_model.py` — joint loss
``ctc_weight * ctc + (1 - ctc_weight) * att`` (`:131-211`), attention loss
with reversed-label right decoder weighted by ``reverse_weight``
(`:251-292`), encoder/ctc activation surfaces used by decoding
(`:294-335`).  Decode dispatch itself lives in `decode/` (functional, jitted
per method) instead of a model method.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from paper_accurate_fast_cheap_tpu.models import ctc_head as ctc_mod
from paper_accurate_fast_cheap_tpu.models.conformer import (
    ConformerEncoder,
    TransformerEncoder,
)
from paper_accurate_fast_cheap_tpu.models.decoder import BiTransformerDecoder
from paper_accurate_fast_cheap_tpu.models.encoder_registry import build_encoder
from paper_accurate_fast_cheap_tpu.ops.losses import label_smoothing_loss
from paper_accurate_fast_cheap_tpu.utils import common


class ASRModel(nn.Module):
    """CTC/AED conformer model.

    encoder_conf / decoder_conf are keyword dicts for the submodules
    (mirrors the YAML schema, e.g.
    `conf/rwkv/giga.rwkvbi_ds4k31nc_12le.trans.shortform.yaml`).
    """

    vocab_size: int
    encoder_conf: Any
    encoder_type: str = "conformer"
    decoder_conf: Any = None
    ctc_weight: float = 0.3
    reverse_weight: float = 0.0
    lsm_weight: float = 0.1
    length_normalized_loss: bool = False
    sos: Optional[int] = None
    eos: Optional[int] = None
    ignore_id: int = common.IGNORE_ID
    use_focal_ctc: bool = False

    def setup(self):
        enc_conf = dict(self.encoder_conf)
        self.encoder = build_encoder(self.encoder_type, enc_conf)
        self.ctc = ctc_mod.CTCHead(vocab_size=self.vocab_size, name="ctc")
        if self.decoder_conf is not None:
            self.decoder = BiTransformerDecoder(
                vocab_size=self.vocab_size,
                encoder_output_size=dict(self.encoder_conf).get(
                    "output_size", 512
                ),
                **dict(self.decoder_conf),
                name="decoder",
            )
        else:
            self.decoder = None

    def _sos_eos(self):
        sos = self.vocab_size - 1 if self.sos is None else self.sos
        eos = self.vocab_size - 1 if self.eos is None else self.eos
        return sos, eos

    def __call__(self, feats, feat_lens, labels, label_lens,
                 cat_embs=None,
                 deterministic: bool = True) -> Dict[str, jax.Array]:
        enc_kw = {} if cat_embs is None else {"cat_embs": cat_embs}
        enc, enc_lens = self.encoder(feats, feat_lens,
                                     deterministic=deterministic, **enc_kw)
        return self.loss_from_encoder(enc, enc_lens, labels, label_lens,
                                      deterministic=deterministic)

    def loss_from_encoder(self, enc, enc_lens, labels, label_lens,
                          deterministic: bool = True):
        """Losses given encoder outputs — the post-encoder half of
        ``__call__``; the pipeline-parallel trainer runs the encoder
        blocks itself and enters here (`parallel/pp_encoder.py`)."""
        loss_ctc = jnp.asarray(0.0)
        if self.ctc_weight > 0.0:
            logits = self.ctc(enc, deterministic=deterministic)
            loss_ctc = ctc_mod.ctc_loss(
                logits, enc_lens, labels, label_lens,
                use_focal_loss=self.use_focal_ctc,
            )
        loss_att = jnp.asarray(0.0)
        acc_att = jnp.asarray(0.0)
        if self.decoder is not None and self.ctc_weight < 1.0:
            loss_att, acc_att = self._att_loss(
                enc, enc_lens, labels, label_lens, deterministic
            )
        loss = self.ctc_weight * loss_ctc + (1.0 - self.ctc_weight) * loss_att
        return {
            "loss": loss,
            "loss_ctc": loss_ctc,
            "loss_att": loss_att,
            "th_accuracy": acc_att,
        }

    def _att_loss(self, enc, enc_lens, labels, label_lens, deterministic):
        sos, eos = self._sos_eos()
        ys_in, ys_out = common.add_sos_eos(labels, label_lens, sos, eos,
                                           self.ignore_id)
        r_ys = common.reverse_pad_list(labels, label_lens, 0)
        r_ys_in, r_ys_out = common.add_sos_eos(r_ys, label_lens, sos, eos,
                                               self.ignore_id)
        l_logits, r_logits = self.decoder(
            enc, enc_lens, ys_in, label_lens + 1, r_ys_in,
            self.reverse_weight, deterministic=deterministic,
        )
        loss_l = label_smoothing_loss(
            l_logits, ys_out, self.lsm_weight, self.ignore_id,
            self.length_normalized_loss,
        )
        if self.reverse_weight > 0.0:
            loss_r = label_smoothing_loss(
                r_logits, r_ys_out, self.lsm_weight, self.ignore_id,
                self.length_normalized_loss,
            )
            loss = (1.0 - self.reverse_weight) * loss_l + (
                self.reverse_weight * loss_r
            )
        else:
            loss = loss_l
        acc = common.accuracy(l_logits, ys_out, self.ignore_id)
        return loss, acc

    # ---- inference surfaces (`asr_model.py:294-335`) ----

    def forward_encoder(self, feats, feat_lens, decoding_chunk_size: int = 0,
                        num_decoding_left_chunks: int = -1, cat_embs=None):
        if isinstance(self.encoder, ConformerEncoder):
            if cat_embs is not None:
                return self.encoder(feats, feat_lens, decoding_chunk_size,
                                    num_decoding_left_chunks,
                                    cat_embs=cat_embs, deterministic=True)
            return self.encoder(feats, feat_lens, decoding_chunk_size,
                                num_decoding_left_chunks,
                                deterministic=True)
        return self.encoder(feats, feat_lens, deterministic=True)

    def decoder_one_step_attn(self, enc, enc_lens, ys, ys_lens):
        """AR decoder step surface for the GNMT coverage scorer
        (`asr_model.py:1051` forward_one_step_with_attn role; decoder.py
        is missing from the release, so the attn definition is ours: the
        cross-attention weights are exposed via `sow('intermediates')` —
        apply with mutable=["intermediates"] or use
        `decode.search.make_gnmt_step_fn`)."""
        return self.decoder.forward_one_step(enc, enc_lens, ys, ys_lens)

    def ctc_logprobs(self, enc_out, blank_penalty: float = 0.0,
                     blank_id: int = 0):
        logits = self.ctc(enc_out, deterministic=True)
        if blank_penalty > 0.0:
            logits = logits.at[..., blank_id].add(-blank_penalty)
        return jax.nn.log_softmax(logits, axis=-1)

    def decoder_forward(self, enc, enc_lens, ys_in, ys_lens, r_ys_in,
                        reverse_weight: float):
        return self.decoder(enc, enc_lens, ys_in, ys_lens, r_ys_in,
                            reverse_weight, deterministic=True)
