"""checkpoint.ChunkStore unit contracts: atomicity artifacts, match
guards, corruption tolerance, meta wipe semantics. The pipeline-level
resume behavior is pinned in test_extraction.py / test_assign.py."""

import json

import numpy as np
import pytest

from salamander_tpu.checkpoint import ChunkStore, data_fingerprint


def test_roundtrip_and_missing(tmp_path):
    store = ChunkStore(tmp_path / "s", {"pipeline": "t", "x": 1})
    assert store.load("absent") is None
    store.save("a", W=np.arange(6.0).reshape(2, 3), n=np.asarray(4))
    loaded = store.load("a")
    np.testing.assert_array_equal(loaded["W"], np.arange(6.0).reshape(2, 3))
    assert int(loaded["n"]) == 4


def test_match_guard(tmp_path):
    store = ChunkStore(tmp_path / "s", {"pipeline": "t"})
    guard = np.array([1.0, 2.0])
    store.save("a", match={"g": guard}, H=np.ones(3))
    assert store.load("a", match={"g": guard}) is not None
    assert store.load("a", match={"g": guard + 1e-9}) is None  # exact only
    assert store.load("a", match={"missing": guard}) is None
    # guards are stripped from the returned payload
    assert set(store.load("a", match={"g": guard})) == {"H"}


def test_match_key_collision_rejected(tmp_path):
    store = ChunkStore(tmp_path / "s", {"pipeline": "t"})
    with pytest.raises(ValueError, match="collides"):
        store.save("a", match={"H": np.ones(2)}, H=np.ones(2))


def test_corrupt_entry_is_recomputed_not_trusted(tmp_path):
    store = ChunkStore(tmp_path / "s", {"pipeline": "t"})
    store.save("a", H=np.ones(3))
    (tmp_path / "s" / "a.npz").write_bytes(b"not a zipfile")
    assert store.load("a") is None


def test_meta_mismatch_wipes_and_warns(tmp_path):
    directory = tmp_path / "s"
    store = ChunkStore(directory, {"pipeline": "t", "seed": 0})
    store.save("a", H=np.ones(3))
    with pytest.warns(UserWarning, match="different run"):
        ChunkStore(directory, {"pipeline": "t", "seed": 1})
    assert not list(directory.glob("*.npz"))
    assert json.loads((directory / "meta.json").read_text())["seed"] == 1
    # matching meta resumes silently and keeps entries
    store2 = ChunkStore(directory, {"pipeline": "t", "seed": 1})
    store2.save("b", H=np.zeros(2))
    ChunkStore(directory, {"pipeline": "t", "seed": 1})
    assert store2.load("b") is not None


def test_corrupt_meta_treated_as_mismatch(tmp_path):
    directory = tmp_path / "s"
    ChunkStore(directory, {"pipeline": "t"})
    (directory / "meta.json").write_text("{broken json")
    ChunkStore(directory, {"pipeline": "t"})  # no raise, silent rebuild
    assert json.loads((directory / "meta.json").read_text()) == {
        "pipeline": "t"
    }


def test_data_fingerprint_sensitivity():
    a = np.arange(6.0).reshape(2, 3)
    assert data_fingerprint(a) == data_fingerprint(a.copy())
    assert data_fingerprint(a) != data_fingerprint(a.T)        # shape
    assert data_fingerprint(a) != data_fingerprint(a.astype("f4"))  # dtype
    assert data_fingerprint(a) != data_fingerprint(a + 1e-300)  # bytes
    assert data_fingerprint(a, a) != data_fingerprint(a)        # arity
