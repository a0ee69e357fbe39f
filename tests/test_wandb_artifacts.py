"""wandb as system of record (gated): artifact uploads for code/data/
tokenizer/snapshots (`train_utils.py:506-544`, `checkpoint.py:180-190`)
and resume-from-wandb (`checkpoint.py:266-291`), exercised against a fake
wandb module (the real package is not in this image)."""
import os
import shutil
import sys
import types

import numpy as np
import pytest


class _FakeArtifact:
    def __init__(self, name, type=None, metadata=None):
        self.name = name
        self.type = type
        self.metadata = metadata or {}
        self.paths = []

    def add_file(self, p):
        self.paths.append(("file", p))

    def add_dir(self, p):
        self.paths.append(("dir", p))

    def download(self, root="dl"):
        dest = None
        os.makedirs(root, exist_ok=True)
        for kind, src in self.paths:
            d = os.path.join(root, os.path.basename(src))
            if kind == "dir":
                shutil.copytree(src, d, dirs_exist_ok=True)
                dest = d
            else:
                shutil.copy(src, d)
        return dest


def _fake_wandb():
    mod = types.ModuleType("wandb")
    mod.logged = []
    mod.Artifact = _FakeArtifact

    def init(**kw):
        mod.init_kwargs = kw

    def log(rec, step=None):
        pass

    def log_artifact(art, aliases=None):
        art.aliases = aliases or []
        mod.logged.append(art)

    def finish():
        pass

    class _Run:
        def logged_artifacts(self):
            return mod.logged

    class Api:
        def runs(self, path):
            return [_Run()]

        def run(self, path):
            return _Run()

    mod.init = init
    mod.log = log
    mod.log_artifact = log_artifact
    mod.finish = finish
    mod.Api = Api
    return mod


@pytest.fixture
def fake_wandb(monkeypatch):
    mod = _fake_wandb()
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def test_run_and_checkpoint_artifacts(fake_wandb, tmp_path):
    from paper_accurate_fast_cheap_tpu.train.metrics_logger import (
        MetricsLogger,
    )

    lists = tmp_path / "train.list"
    lists.write_text("shard0.tar\n")
    tok = tmp_path / "units.txt"
    tok.write_text("<blank> 0\n")
    code_dir = tmp_path / "code"
    code_dir.mkdir()
    (code_dir / "x.py").write_text("pass\n")

    ml = MetricsLogger(str(tmp_path / "logs"), use_tensorboard=False,
                       use_wandb=True)
    ml.log_run_artifacts(code_dir=str(code_dir),
                         data_lists=[str(lists), None],
                         tokenizer_files=[str(tok)])
    types_ = sorted(a.type for a in fake_wandb.logged)
    assert types_ == ["code", "data_list", "tokenizer"]

    snap = tmp_path / "step_000000010"
    snap.mkdir()
    (snap / "dummy").write_text("x")
    ml.log_checkpoint(str(snap), metadata={"step": 10, "cv_loss": 1.5},
                      with_optimizer=True)
    art = fake_wandb.logged[-1]
    assert art.type == "model"
    assert art.metadata["with_optimizer"] is True
    assert art.metadata["step"] == 10
    assert "latest-optimizer" in art.aliases


def test_resume_from_wandb_roundtrip(fake_wandb, tmp_path):
    """Save a REAL orbax checkpoint, register it as a wandb artifact,
    download via the resume helper, and load it back — full round trip."""
    import jax.numpy as jnp

    from paper_accurate_fast_cheap_tpu.train import checkpointing
    from paper_accurate_fast_cheap_tpu.train.metrics_logger import (
        MetricsLogger,
        download_checkpoint_from_wandb,
    )

    params = {"params": {"w": jnp.asarray([1.0, 2.0, 3.0])}}
    ck = tmp_path / "snapshot_and_optimizer_000000020"
    checkpointing.save_checkpoint(str(ck), params, None,
                                  {"step": 20, "epoch": 1})

    ml = MetricsLogger(str(tmp_path / "logs"), use_tensorboard=False,
                       use_wandb=True)
    # an older optimizer-less snapshot must NOT win
    ml.log_checkpoint(str(ck), metadata={"step": 5}, with_optimizer=False)
    ml.log_checkpoint(str(ck), metadata={"step": 20}, with_optimizer=True)

    dest = download_checkpoint_from_wandb("proj",
                                          dest=str(tmp_path / "dl"))
    assert dest is not None
    loaded, _, info = checkpointing.load_checkpoint(dest, params)
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["w"]), [1.0, 2.0, 3.0])
    assert info.get("step") == 20


def test_wandb_absent_is_noop(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> ImportError
    from paper_accurate_fast_cheap_tpu.train.metrics_logger import (
        MetricsLogger,
        download_checkpoint_from_wandb,
    )

    ml = MetricsLogger(str(tmp_path / "logs"), use_tensorboard=False,
                       use_wandb=True)
    ml.log_run_artifacts(code_dir=str(tmp_path))  # no raise
    ml.log_checkpoint(str(tmp_path))
    assert download_checkpoint_from_wandb("proj") is None
