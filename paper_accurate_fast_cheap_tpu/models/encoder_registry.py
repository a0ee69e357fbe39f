"""Encoder class registry.

Parity target: `WENET_ENCODER_CLASSES` (`wenet/utils/init_model.py:50-96`):
conformer (default), transformer, branchformer, e_branchformer; the squeeze/
efficient-conformer variants will join as they are implemented.
"""
from __future__ import annotations

from typing import Any, Dict

from paper_accurate_fast_cheap_tpu.models.branchformer import (
    BranchformerEncoder,
)
from paper_accurate_fast_cheap_tpu.models.conformer import (
    ConformerEncoder,
    TransformerEncoder,
)

_BRANCHFORMER_KEYS = {
    "input_size", "output_size", "attention_heads", "cgmlp_linear_units",
    "cgmlp_conv_kernel", "num_blocks", "dropout_rate",
    "positional_dropout_rate", "attention_dropout_rate", "input_layer",
    "pos_enc_layer_type", "use_ffn", "linear_units", "merge_conv_kernel",
}

_TRANSFORMER_KEYS = {
    "input_size", "output_size", "attention_heads", "linear_units",
    "num_blocks", "dropout_rate", "positional_dropout_rate",
    "attention_dropout_rate", "input_layer", "pos_enc_layer_type",
    "normalize_before", "key_bias", "activation_type",
}


_CONFORMER_KEYS = set(ConformerEncoder.__dataclass_fields__) - {
    "parent", "name"
}


def build_encoder(encoder_type: str, enc_conf: Dict[str, Any]):
    if encoder_type in ("conformer", "lora_conformer"):
        conf = {k: v for k, v in enc_conf.items() if k in _CONFORMER_KEYS}
        return ConformerEncoder(**conf, name="encoder")
    if encoder_type == "transformer":
        conf = {k: v for k, v in enc_conf.items() if k in _TRANSFORMER_KEYS}
        return TransformerEncoder(**conf, name="encoder")
    if encoder_type == "squeezeformer":
        from paper_accurate_fast_cheap_tpu.models.squeezeformer import (
            SqueezeformerEncoder,
        )

        keys = set(SqueezeformerEncoder.__dataclass_fields__) - {
            "parent", "name"}
        conf = {k: v for k, v in enc_conf.items() if k in keys}
        return SqueezeformerEncoder(**conf, name="encoder")
    if encoder_type == "efficient_conformer":
        from paper_accurate_fast_cheap_tpu.models.efficient_conformer import (
            EfficientConformerEncoder,
        )

        keys = set(EfficientConformerEncoder.__dataclass_fields__) - {
            "parent", "name"}
        conf = {k: v for k, v in enc_conf.items() if k in keys}
        return EfficientConformerEncoder(**conf, name="encoder")
    if encoder_type in ("branchformer", "e_branchformer"):
        conf = {k: v for k, v in enc_conf.items() if k in _BRANCHFORMER_KEYS}
        if encoder_type == "e_branchformer":
            conf.setdefault("use_ffn", True)
            conf.setdefault("merge_conv_kernel", 3)
        return BranchformerEncoder(**conf, name="encoder")
    raise NotImplementedError(f"encoder type {encoder_type!r}")


def is_chunkable(encoder) -> bool:
    return isinstance(encoder, ConformerEncoder)
