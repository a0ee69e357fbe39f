"""Per-layer utterance embedding extraction (+local vector index).

Parity target: `tools/embeddings/write_embeddings.py` — run the encoder
over a dataset, mean-pool each layer's output per utterance (`:95-101`),
and write `sample_names` + `embeddings_layer_i` files (`:205-233`);
optionally also insert into a vector store (the reference uses a Milvus
IVF/COSINE collection via `tools/embeddings/milvus.py`; here
`tools/vector_index.VectorIndex`, saved as `<output>/index_layer_i.npz`).

One deliberate fix over the reference: `:99` pools with an UNMASKED
`torch.mean(xs, 1)`, contaminating short utterances with padding; the
pool here is masked by the encoder's valid length.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(description="write encoder embeddings")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--test_data", required=True)
    p.add_argument("--data_type", default="raw",
                   choices=["raw", "shard", "zip_shard"])
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--output_name", required=True,
                   help="output directory for sample_names + "
                        "embeddings_layer_i")
    p.add_argument("--cat_embs", default="",
                   help="comma floats for LSL conditioning")
    p.add_argument("--layers", default=None,
                   help="comma layer ids to keep (default: all)")
    p.add_argument("--build_index", action="store_true",
                   help="also write index_layer_i.npz cosine indexes "
                        "(Milvus-collection role)")
    p.add_argument("--index_nlist", type=int, default=128,
                   help="IVF coarse lists (reference milvus.py:47)")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    logging.basicConfig(level=logging.INFO)
    from paper_accurate_fast_cheap_tpu.bin.recognize import (
        build_decode_assets,
    )
    from paper_accurate_fast_cheap_tpu.data import pipeline as dp
    from paper_accurate_fast_cheap_tpu.utils.config import load_config

    config = load_config(args.config)
    tokenizer, model, model_type, params, featurize, dataset_conf = \
        build_decode_assets(config, args.checkpoint)
    dataset_conf = dict(dataset_conf)
    # test-conf surgery (`write_embeddings.py:112-139`): no filtering,
    # no augmentation, static batches, preserve order
    dataset_conf["filter_conf"] = {
        "max_length": 102400, "min_length": 0,
        "token_max_length": 102400, "token_min_length": 0,
    }
    for k in ("speed_perturb", "spec_aug", "spec_sub", "spec_trim",
              "apply_rir", "apply_telephony", "shuffle", "sort"):
        dataset_conf[k] = False
    dataset_conf["batch_conf"] = {"batch_type": "static",
                                  "batch_size": args.batch_size}

    cat_embs = None
    if args.cat_embs:
        cat_embs = jnp.asarray(
            [[float(x) for x in args.cat_embs.split(",")]])

    def _enc_layers(m, f, l):
        kw = {} if cat_embs is None else dict(cat_embs=jnp.broadcast_to(
            cat_embs, (f.shape[0], cat_embs.shape[1])))
        return m.encoder(f, l, return_layers=True, deterministic=True,
                         **kw)

    def layer_embeddings(p, f, l):
        """(B, layers, D) masked-mean layer outputs."""
        out, enc_lens, layers = model.apply(p, f, l, method=_enc_layers)
        mask = (jnp.arange(out.shape[1])[None, :]
                < enc_lens[:, None]).astype(jnp.float32)  # (B, T')
        denom = jnp.maximum(enc_lens.astype(jnp.float32), 1.0)[:, None]
        pooled = [jnp.einsum("btd,bt->bd", x.astype(jnp.float32), mask)
                  / denom for x in layers]
        return jnp.stack(pooled, axis=1)

    emb_fn = jax.jit(layer_embeddings)

    os.makedirs(args.output_name, exist_ok=True)
    names = []
    per_layer = None
    for batch in dp.build_dataset(args.data_type, args.test_data,
                                  tokenizer, dataset_conf,
                                  partition=False, mode="test"):
        feats, feat_lens = featurize(
            jnp.asarray(batch["wavs"]), jnp.asarray(batch["wav_lens"]),
            train=False)
        embs = np.asarray(emb_fn(params, feats, feat_lens))  # (B, L, D)
        if per_layer is None:
            per_layer = [[] for _ in range(embs.shape[1])]
        for i in range(embs.shape[1]):
            per_layer[i].append(embs[:, i])
        names.extend(batch["keys"])

    if per_layer is None:
        logging.warning("no utterances read from %s", args.test_data)
        return 1
    keep = (set(int(x) for x in args.layers.split(","))
            if args.layers else None)
    with open(os.path.join(args.output_name, "sample_names"), "w") as f:
        f.write("\n".join(names) + "\n")
    for i, chunks in enumerate(per_layer):
        if keep is not None and i not in keep:
            continue
        mat = np.concatenate(chunks, axis=0)
        np.savetxt(os.path.join(args.output_name,
                                f"embeddings_layer_{i}"), mat)
        if args.build_index:
            from paper_accurate_fast_cheap_tpu.tools.vector_index import (
                VectorIndex,
            )

            idx = VectorIndex(mat.shape[1], nlist=args.index_nlist)
            idx.add(names, mat)
            idx.save(os.path.join(args.output_name,
                                  f"index_layer_{i}.npz"))
    logging.info("wrote %d utterances x %d layers to %s", len(names),
                 len(per_layer), args.output_name)
    return 0


if __name__ == "__main__":
    sys.exit(main())
