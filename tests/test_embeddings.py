"""Embedding extraction + vector index.

Parity targets: `tools/embeddings/write_embeddings.py` (per-layer
mean-pooled encoder embeddings -> sample_names + embeddings_layer_i
files) and `tools/embeddings/milvus.py` (cosine vector store surface).
"""
import numpy as np
import pytest

from tests.test_decode_cli import trained  # noqa: F401
from tests.test_train_cli import workspace  # noqa: F401


def test_vector_index_exact_and_ivf(tmp_path):
    from paper_accurate_fast_cheap_tpu.tools.vector_index import VectorIndex

    rng = np.random.RandomState(0)
    dim, n = 16, 300
    vecs = rng.randn(n, dim).astype(np.float32)
    names = [f"utt{i}" for i in range(n)]
    idx = VectorIndex(dim)
    idx.add(names, vecs, payloads=[f"c{i % 3}" for i in range(n)])

    # querying a stored vector returns itself with cosine ~1
    hits = idx.search(vecs[42], k=3)
    assert hits[0].name == "utt42"
    assert hits[0].score == pytest.approx(1.0, abs=1e-5)
    assert hits[0].payload == "c0"

    # exact top-k matches brute force
    q = rng.randn(dim).astype(np.float32)
    normed = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    want = np.argsort(-(normed @ (q / np.linalg.norm(q))))[:5]
    got = [h.name for h in idx.search(q, k=5)]
    assert got == [f"utt{i}" for i in want]

    # IVF probe finds the true neighbour for a stored vector
    ivf = VectorIndex(dim, nlist=8)
    ivf.add(names, vecs)
    assert ivf.search(vecs[7], k=1)[0].name == "utt7"

    # persistence round-trip
    p = str(tmp_path / "idx.npz")
    idx.save(p)
    idx2 = VectorIndex.load(p)
    assert [h.name for h in idx2.search(q, k=5)] == got


def test_write_embeddings_cli(trained, tmp_path):  # noqa: F811
    from paper_accurate_fast_cheap_tpu.bin.write_embeddings import main
    from paper_accurate_fast_cheap_tpu.tools.vector_index import VectorIndex

    ws, model_dir = trained
    out = tmp_path / "embs"
    rc = main([
        "--config", str(model_dir / "train.yaml"),
        "--checkpoint", str(model_dir / "epoch_0000"),
        "--test_data", str(ws / "shards.txt"),
        "--data_type", "shard",
        "--batch_size", "2",
        "--output_name", str(out),
        "--build_index",
    ])
    assert rc == 0
    names = (out / "sample_names").read_text().strip().split("\n")
    assert len(names) >= 2
    layer_files = sorted(out.glob("embeddings_layer_*"))
    assert layer_files, "no layer embedding files written"
    mat = np.loadtxt(layer_files[0])
    mat = mat.reshape(len(names), -1)
    assert np.isfinite(mat).all()
    # rows differ per utterance (pooled over different audio)
    assert not np.allclose(mat[0], mat[-1])
    # index round-trip: a stored row retrieves its own name
    idx = VectorIndex.load(str(out / "index_layer_0.npz"))
    assert idx.search(mat[0], k=1)[0].name == names[0]
