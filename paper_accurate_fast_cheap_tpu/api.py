"""Python inference API.

Parity target: `wenet/cli/model.py:29-157` + `wenet/cli/transcribe.py` —
``load_model(...)`` / ``Model.transcribe(audio) -> {text, tokens, times}``
convenience surface over a trained model directory.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np


class Model:
    """Loaded ASR model + tokenizer + feature pipeline."""

    def __init__(self, config, tokenizer, model, model_type, params,
                 featurize, precision: str = "fp32"):
        self.config = config
        self.tokenizer = tokenizer
        self.model = model
        self.model_type = model_type
        if precision == "bf16":
            # serving default stays fp32 for exactness; bf16 mirrors the
            # decode CLIs (recognize_wav --precision) and is ~50x faster
            # on the MXU
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
        self.precision = precision
        self.params = params
        self.featurize = featurize
        special = config.get("tokenizer_conf", {}).get("special_tokens", {})
        self.sos = special.get("<sos>", tokenizer.vocab_size() - 1)
        self.eos = special.get("<eos>", tokenizer.vocab_size() - 1)
        self._fwd = jax.jit(
            lambda p, f, l: model.apply(p, f, l,
                                        method=model.forward_encoder))
        self._ctc = jax.jit(
            lambda p, e: model.apply(p, e, method=model.ctc_logprobs))

    @classmethod
    def from_dir(cls, model_dir: str, checkpoint: Optional[str] = None,
                 precision: str = "fp32"):
        """Load from a training run dir (uses train.yaml + latest epoch)."""
        from paper_accurate_fast_cheap_tpu.bin.recognize import (
            build_decode_assets,
        )
        from paper_accurate_fast_cheap_tpu.train import checkpointing
        from paper_accurate_fast_cheap_tpu.utils.config import load_config

        config = load_config(os.path.join(model_dir, "train.yaml"))
        if checkpoint is None:
            cks = checkpointing.list_checkpoints(model_dir)
            if not cks:
                raise FileNotFoundError(f"no checkpoints in {model_dir}")
            checkpoint = cks[-1]
        tokenizer, model, model_type, params, featurize, _ = \
            build_decode_assets(config, checkpoint)
        return cls(config, tokenizer, model, model_type, params, featurize,
                   precision=precision)

    def transcribe_batch(
        self,
        wavs,
        mode: str = "ctc_greedy_search",
        beam_size: int = 8,
    ):
        """Batched decode of float waveforms (16 kHz, [-1, 1]): one
        featurize + encoder + search call over the whole batch, with
        bucketed padding to bound XLA recompiles.  This is the serving
        micro-batcher's entry (`bin/serve.py`)."""
        from paper_accurate_fast_cheap_tpu.data.pipeline import (
            bucket_pad_length,
        )
        from paper_accurate_fast_cheap_tpu.decode import rnnt_search, search

        B = len(wavs)
        S = bucket_pad_length(max(len(w) for w in wavs), None, 16000)
        batch = np.zeros((B, S), np.float32)
        lens = np.zeros((B,), np.int32)
        for i, w in enumerate(wavs):
            batch[i, : len(w)] = w
            lens[i] = len(w)
        feats, feat_lens = self.featurize(
            jnp.asarray(batch), jnp.asarray(lens), train=False)
        if self.precision == "bf16":
            feats = feats.astype(jnp.bfloat16)
        enc, enc_lens = self._fwd(self.params, feats, feat_lens)
        logp = self._ctc(self.params, enc)
        logp_np, lens_np = np.asarray(logp), np.asarray(enc_lens)
        if mode == "ctc_greedy_search":
            res = search.ctc_greedy_search(logp_np, lens_np)
        elif mode == "ctc_prefix_beam_search":
            res = search.ctc_prefix_beam_search(logp_np, lens_np,
                                                beam_size=beam_size)
        elif mode == "rnnt_beam_search":
            assert self.model_type == "transducer"
            predictor_step, joint_step, init_state_fn = \
                rnnt_search.make_transducer_step_fns(self.model, self.params)
            res = rnnt_search.rnnt_beam_search(
                predictor_step, joint_step, init_state_fn, enc, enc_lens,
                logp, beam_size=beam_size, params=self.params)
        else:
            raise ValueError(f"unknown mode {mode!r}")
        return [self.tokenizer.detokenize(r.tokens)[0] for r in res]

    def transcribe(
        self,
        audio: Union[str, np.ndarray],
        sample_rate: int = 16000,
        mode: str = "ctc_greedy_search",
        beam_size: int = 8,
        tokens_info: bool = False,
    ) -> Dict:
        """audio: wav path or float waveform in [-1, 1]."""
        from paper_accurate_fast_cheap_tpu.data.pipeline import (
            _read_wav_bytes,
        )
        from paper_accurate_fast_cheap_tpu.decode import rnnt_search, search

        if isinstance(audio, str):
            with open(audio, "rb") as f:
                wav, sr = _read_wav_bytes(f.read())
            sample_rate = sr
        else:
            wav = np.asarray(audio, np.float32)
        if sample_rate != 16000:
            from scipy.signal import resample_poly

            g = np.gcd(int(sample_rate), 16000)
            wav = resample_poly(wav, 16000 // g,
                                int(sample_rate) // g).astype(np.float32)

        feats, feat_lens = self.featurize(
            jnp.asarray(wav[None]), jnp.asarray([len(wav)]), train=False
        )
        if self.precision == "bf16":
            feats = feats.astype(jnp.bfloat16)
        enc, enc_lens = self._fwd(self.params, feats, feat_lens)
        logp = self._ctc(self.params, enc)
        logp_np, lens_np = np.asarray(logp), np.asarray(enc_lens)
        if mode == "ctc_greedy_search":
            res = search.ctc_greedy_search(logp_np, lens_np)[0]
        elif mode == "ctc_prefix_beam_search":
            res = search.ctc_prefix_beam_search(logp_np, lens_np,
                                                beam_size=beam_size)[0]
        elif mode == "rnnt_beam_search":
            assert self.model_type == "transducer"
            predictor_step, joint_step, init_state_fn = \
                rnnt_search.make_transducer_step_fns(self.model, self.params)
            res = rnnt_search.rnnt_beam_search(
                predictor_step, joint_step, init_state_fn, enc, enc_lens,
                logp, beam_size=beam_size, params=self.params)[0]
        else:
            raise ValueError(f"unknown mode {mode!r}")

        text, tokens = self.tokenizer.detokenize(res.tokens)
        out = {"text": text}
        if tokens_info:
            out["tokens"] = tokens
            out["token_ids"] = res.tokens
            out["times"] = [t * 0.04 for t in res.times]
            out["confidence"] = res.confidence
        return out


def load_model(model_dir: str, checkpoint: Optional[str] = None,
               precision: str = "fp32") -> Model:
    """Accepts a local model dir, a registered hub name, or a direct
    archive URL (`wenet/cli/model.py:load_model` + `cli/hub.py`)."""
    from paper_accurate_fast_cheap_tpu import hub

    return Model.from_dir(hub.resolve(model_dir), checkpoint,
                          precision=precision)
