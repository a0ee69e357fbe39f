

def test_hub_resolve_and_cache(tmp_path, monkeypatch):
    """Hub surface (`wenet/cli/hub.py` parity): local dirs pass through,
    registered names download-once into the cache, archives unpack flat."""
    import io
    import tarfile

    from paper_accurate_fast_cheap_tpu import hub

    monkeypatch.setenv("PAFC_HOME", str(tmp_path / "cache"))
    # local dir passthrough
    mdir = tmp_path / "local_model"
    mdir.mkdir()
    (mdir / "train.yaml").write_text("model: asr_model\n")
    assert hub.resolve(str(mdir)) == str(mdir)
    # unknown name
    import pytest as _pytest

    with _pytest.raises(KeyError):
        hub.get_model_by_name("nope")
    # registered name -> "download" from a file:// url
    tar_p = tmp_path / "m.tar.gz"
    with tarfile.open(tar_p, "w:gz") as tf:
        data = b"model: asr_model\n"
        info = tarfile.TarInfo("bundle/train.yaml")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    hub.register_model("toy_en", f"file://{tar_p}")
    try:
        got = hub.get_model_by_name("toy_en")
        assert got.endswith("toy_en")
        assert (tmp_path / "cache" / "toy_en" / "train.yaml").exists()
        # second call = cache hit (delete the archive to prove no re-fetch)
        tar_p.unlink()
        assert hub.get_model_by_name("toy_en") == got
    finally:
        hub.Assets.pop("toy_en", None)
