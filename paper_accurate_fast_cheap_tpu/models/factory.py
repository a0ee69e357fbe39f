"""Model factory: build models from WeNet-style YAML config dicts.

Parity target: `wenet/utils/init_model.py` — registries (`:50-96`),
encoder/decoder/ctc/predictor/joint construction (`:162-235`).  Accepts the
reference's YAML schema directly (e.g.
`conf/rwkv/giga.rwkvbi_ds4k31nc_12le.trans.shortform.yaml`) so existing
experiment configs port over unchanged.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from paper_accurate_fast_cheap_tpu.models.asr_model import ASRModel
from paper_accurate_fast_cheap_tpu.models.transducer import Transducer

# encoder_conf keys that map 1:1 onto our ConformerEncoder fields
_ENCODER_KEYS = {
    "output_size", "attention_heads", "linear_units", "num_blocks",
    "dropout_rate", "positional_dropout_rate", "attention_dropout_rate",
    "input_layer", "pos_enc_layer_type", "normalize_before",
    "macaron_style", "use_cnn_module", "cnn_module_kernel",
    "cnn_module_norm", "activation_type", "causal", "key_bias",
    "selfattention_layer_type", "static_chunk_size", "use_dynamic_chunk",
    "use_dynamic_left_chunk", "gradient_checkpointing",
    # branchformer family (filtered per-encoder in encoder_registry)
    "cgmlp_linear_units", "cgmlp_conv_kernel", "use_ffn",
    "merge_conv_kernel",
}
# keys routed into rwkv_conf (rwkv/mamba/lca extras)
_RWKV_KEYS = {
    "rnn_att_version", "rnn_att_direction", "rwkv_ctx_len",
    "rwkv_do_bfloat16", "att_context_size", "global_tokens",
    "global_tokens_spacing", "global_attn_separate", "wkv_impl",
    "wkv_chunk_size",
}


def encoder_conf_from_yaml(conf: Dict[str, Any],
                           input_dim: int = 80) -> Dict[str, Any]:
    enc = {k: v for k, v in conf.items() if k in _ENCODER_KEYS}
    rwkv = {k: v for k, v in conf.items() if k in _RWKV_KEYS}
    if "rwkv_do_bfloat16" in conf:
        rwkv["rwkv_do_bfloat16"] = conf["rwkv_do_bfloat16"]
    enc["input_size"] = input_dim
    if rwkv:
        enc["rwkv_conf"] = rwkv
    unknown = set(conf) - _ENCODER_KEYS - _RWKV_KEYS
    if unknown:
        import logging

        logging.getLogger(__name__).info(
            "encoder_conf keys ignored: %s", sorted(unknown)
        )
    return enc


def init_model(config: Dict[str, Any], vocab_size: int,
               input_dim: int = 80):
    """Build the model described by a WeNet-style config dict.

    Returns (model, model_type_str).  Supported `model:` values:
    'asr_model' (default, hybrid CTC/AED) and 'transducer'.
    """
    model_type = config.get("model", "asr_model")
    encoder_type = config.get("encoder", "conformer")
    enc_conf = encoder_conf_from_yaml(
        config.get("encoder_conf", {}), input_dim
    )
    model_conf = dict(config.get("model_conf", {}))
    special = config.get("tokenizer_conf", {}).get("special_tokens", {})
    sos = special.get("<sos>", vocab_size - 1)
    eos = special.get("<eos>", vocab_size - 1)

    dec_conf = None
    if config.get("decoder") is not None:
        d = dict(config.get("decoder_conf", {}))
        if config.get("decoder") == "transformer":
            d.pop("r_num_blocks", None)
            d["r_num_blocks"] = 0
        dec_conf = d

    if model_type == "transducer":
        joint_conf = dict(config.get("joint_conf", {}))
        joint_conf.pop("enc_output_size", None)
        joint_conf.pop("pred_output_size", None)
        pred_conf = dict(config.get("predictor_conf", {}))
        # keys the reference's RNNPredictor takes but ours fixes (lstm, bias)
        pred_conf.pop("rnn_type", None)
        pred_conf.pop("bias", None)
        model = Transducer(
            vocab_size=vocab_size,
            encoder_conf=enc_conf,
            encoder_type=encoder_type,
            predictor=config.get("predictor", "rnn"),
            predictor_conf=pred_conf,
            joint_conf=joint_conf,
            decoder_conf=dec_conf,
            blank_id=config.get("ctc_conf", {}).get("ctc_blank_id", 0),
            transducer_weight=model_conf.get("transducer_weight", 0.3),
            ctc_weight=model_conf.get("ctc_weight", 0.2),
            attention_weight=model_conf.get("attention_weight", 0.5),
            reverse_weight=model_conf.get("reverse_weight", 0.0),
            lsm_weight=model_conf.get("lsm_weight", 0.1),
            length_normalized_loss=model_conf.get(
                "length_normalized_loss", False),
            sos=sos, eos=eos,
        )
        return model, "transducer"

    model = ASRModel(
        vocab_size=vocab_size,
        encoder_conf=enc_conf,
        encoder_type=encoder_type,
        decoder_conf=dec_conf,
        ctc_weight=model_conf.get("ctc_weight", 0.3),
        reverse_weight=model_conf.get("reverse_weight", 0.0),
        lsm_weight=model_conf.get("lsm_weight", 0.1),
        length_normalized_loss=model_conf.get("length_normalized_loss",
                                              False),
        sos=sos, eos=eos,
        use_focal_ctc=config.get("ctc_conf", {}).get("use_focal_loss",
                                                     False),
    )
    return model, "asr_model"
