"""Whisper-style encoder-decoder ASR model.

Parity target: `wenet/whisper/whisper.py` (92 LoC + 298 converter): the
OpenAI Whisper architecture expressed over this framework's blocks — two
GELU conv1d subsampling layers, sinusoidal (non-scaled) positions,
pre-norm transformer encoder; decoder with learned positions and tied
output embedding; decoding through the whisper special-token protocol
(via the HF tokenizer wrapper in `text/tokenizers.py`).

`load_hf_whisper_params` maps a transformers WhisperModel state dict onto
this module's parameter tree so published checkpoints can be used where the
weights are locally available.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paper_accurate_fast_cheap_tpu.models.attention import (
    MultiHeadedAttention,
)
from paper_accurate_fast_cheap_tpu.models.convolution import (
    PositionwiseFeedForward,
)
from paper_accurate_fast_cheap_tpu.models.decoder import DecoderLayer
from paper_accurate_fast_cheap_tpu.models.embedding import sinusoid_table
from paper_accurate_fast_cheap_tpu.ops.losses import label_smoothing_loss
from paper_accurate_fast_cheap_tpu.utils import common, masks as mask_utils


class WhisperEncoder(nn.Module):
    n_mels: int = 80
    d_model: int = 512
    heads: int = 8
    num_blocks: int = 6
    ffn_mult: int = 4
    max_positions: int = 1500
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, mel, mel_lens, *, deterministic: bool = True):
        """mel: (B, T, n_mels) whisper log-mel."""
        x = nn.gelu(nn.Conv(self.d_model, (3,), padding=((1, 1),),
                            name="conv1")(mel))
        x = nn.gelu(nn.Conv(self.d_model, (3,), strides=(2,),
                            padding=((1, 1),), name="conv2")(x))
        out_lens = (mel_lens + 1) // 2
        T = x.shape[1]
        pe = jnp.asarray(sinusoid_table(self.max_positions, self.d_model))
        x = x + pe[None, :T]
        pad_mask = mask_utils.make_pad_mask(out_lens, T)
        att_mask = pad_mask[:, None, :]
        for i in range(self.num_blocks):
            res = x
            y = nn.LayerNorm(epsilon=1e-5, name=f"ln1_{i}")(x)
            y = MultiHeadedAttention(
                heads=self.heads, d_model=self.d_model,
                dropout_rate=self.dropout_rate, name=f"attn_{i}",
            )(y, y, att_mask, deterministic=deterministic)
            x = res + y
            res = x
            y = nn.LayerNorm(epsilon=1e-5, name=f"ln2_{i}")(x)
            y = PositionwiseFeedForward(
                self.d_model, self.ffn_mult * self.d_model,
                self.dropout_rate, activation="gelu", name=f"mlp_{i}",
            )(y, deterministic=deterministic)
            x = res + y
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x)
        return x, out_lens


class WhisperModel(nn.Module):
    vocab_size: int = 51865
    n_mels: int = 80
    d_model: int = 512
    heads: int = 8
    encoder_blocks: int = 6
    decoder_blocks: int = 6
    max_target_positions: int = 448
    lsm_weight: float = 0.1
    ignore_id: int = common.IGNORE_ID

    def setup(self):
        self.encoder = WhisperEncoder(
            n_mels=self.n_mels, d_model=self.d_model, heads=self.heads,
            num_blocks=self.encoder_blocks, name="encoder",
        )
        self.token_embed = nn.Embed(self.vocab_size, self.d_model,
                                    name="token_embed")
        self.pos_embed = self.param(
            "decoder_pos", nn.initializers.normal(0.02),
            (self.max_target_positions, self.d_model),
        )
        self.layers = [
            DecoderLayer(d_model=self.d_model, heads=self.heads,
                         linear_units=4 * self.d_model, name=f"dec_{i}")
            for i in range(self.decoder_blocks)
        ]
        self.ln = nn.LayerNorm(epsilon=1e-5, name="dec_ln")

    def decode_logits(self, enc, enc_lens, ys, ys_lens,
                      deterministic: bool = True):
        U = ys.shape[1]
        x = self.token_embed(ys) + self.pos_embed[None, :U]
        tgt_mask = mask_utils.make_pad_mask(ys_lens, U)
        self_mask = tgt_mask[:, None, :] & \
            mask_utils.subsequent_mask(U)[None]
        mem_mask = mask_utils.make_pad_mask(enc_lens, enc.shape[1])[
            :, None, :]
        for layer in self.layers:
            x = layer(x, self_mask, enc, mem_mask,
                      deterministic=deterministic)
        x = self.ln(x)
        # tied output embedding (whisper convention)
        return x @ self.token_embed.embedding.T

    def __call__(self, mel, mel_lens, ys_in, ys_out, ys_lens,
                 deterministic: bool = True) -> Dict[str, jax.Array]:
        enc, enc_lens = self.encoder(mel, mel_lens,
                                     deterministic=deterministic)
        logits = self.decode_logits(enc, enc_lens, ys_in, ys_lens,
                                    deterministic)
        loss = label_smoothing_loss(logits, ys_out, self.lsm_weight,
                                    self.ignore_id)
        return {"loss": loss,
                "th_accuracy": common.accuracy(logits, ys_out,
                                               self.ignore_id)}


def whisper_greedy_decode(
    model: "WhisperModel",
    params,
    mel: jax.Array,
    mel_lens: jax.Array,
    sot_sequence,
    eot_id: int,
    max_len: int = 128,
    suppress_blank_first: bool = True,
):
    """AR greedy decode with the whisper special-token protocol:
    prefix = sot_sequence (e.g. [<|sot|>, <|en|>, <|transcribe|>,
    <|notimestamps|>]), stop at <|eot|>.  Host loop over a jitted
    last-position step (the reference exposes whisper through the same
    decode surfaces, `wenet/whisper/whisper.py`)."""
    import numpy as np

    B = mel.shape[0]
    enc, enc_lens = model.apply(params, mel, mel_lens,
                                method=lambda m, a, b: m.encoder(a, b))

    @jax.jit
    def step(ys, ys_lens):
        logits = model.apply(params, enc, enc_lens, ys, ys_lens,
                             method=model.decode_logits)
        last = jnp.take_along_axis(
            logits, (ys_lens - 1)[:, None, None], axis=1)[:, 0]
        return last

    sot = list(sot_sequence)
    ys = np.full((B, max_len), eot_id, np.int32)
    ys[:, : len(sot)] = sot
    lens = np.full((B,), len(sot), np.int32)
    done = np.zeros((B,), bool)
    for u in range(len(sot), max_len):
        last = np.asarray(step(jnp.asarray(ys), jnp.asarray(lens)))
        nxt = last.argmax(axis=-1)
        for b in range(B):
            if done[b]:
                continue
            tok = int(nxt[b])
            if tok == eot_id:
                done[b] = True
                continue
            ys[b, u] = tok
            lens[b] += 1
        if done.all():
            break
    return [
        [int(t) for t in ys[b, len(sot) : lens[b]]] for b in range(B)
    ]


def load_hf_whisper_params(hf_state: Dict[str, np.ndarray],
                           model: WhisperModel, params):
    """Map a transformers WhisperForConditionalGeneration state_dict (numpy)
    onto this module's parameter tree.  Returns updated params; raises
    KeyError when the checkpoint does not match the configuration."""
    p = jax.tree.map(np.asarray, params)["params"]

    def t(name):
        return np.asarray(hf_state[name])

    enc = p["encoder"]
    enc["conv1"]["kernel"] = t("model.encoder.conv1.weight").transpose(2, 1, 0)
    enc["conv1"]["bias"] = t("model.encoder.conv1.bias")
    enc["conv2"]["kernel"] = t("model.encoder.conv2.weight").transpose(2, 1, 0)
    enc["conv2"]["bias"] = t("model.encoder.conv2.bias")
    for i in range(model.encoder_blocks):
        hf = f"model.encoder.layers.{i}."
        blk_attn = enc[f"attn_{i}"]
        for ours, theirs in (("linear_q", "self_attn.q_proj"),
                             ("linear_k", "self_attn.k_proj"),
                             ("linear_v", "self_attn.v_proj"),
                             ("linear_out", "self_attn.out_proj")):
            blk_attn[ours]["kernel"] = t(hf + theirs + ".weight").T
            if "bias" in blk_attn[ours]:
                key = hf + theirs + ".bias"
                if key in hf_state:
                    blk_attn[ours]["bias"] = t(key)
        enc[f"ln1_{i}"]["scale"] = t(hf + "self_attn_layer_norm.weight")
        enc[f"ln1_{i}"]["bias"] = t(hf + "self_attn_layer_norm.bias")
        enc[f"mlp_{i}"]["Dense_0"]["kernel"] = t(hf + "fc1.weight").T
        enc[f"mlp_{i}"]["Dense_0"]["bias"] = t(hf + "fc1.bias")
        enc[f"mlp_{i}"]["Dense_1"]["kernel"] = t(hf + "fc2.weight").T
        enc[f"mlp_{i}"]["Dense_1"]["bias"] = t(hf + "fc2.bias")
        enc[f"ln2_{i}"]["scale"] = t(hf + "final_layer_norm.weight")
        enc[f"ln2_{i}"]["bias"] = t(hf + "final_layer_norm.bias")
    enc["ln_post"]["scale"] = t("model.encoder.layer_norm.weight")
    enc["ln_post"]["bias"] = t("model.encoder.layer_norm.bias")
    p["token_embed"]["embedding"] = t("model.decoder.embed_tokens.weight")
    p["decoder_pos"] = t("model.decoder.embed_positions.weight")
    return {"params": p}
