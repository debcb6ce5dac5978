"""Container layer: AnnData/MuData work-alike behavior the framework relies
on (alignment guards, subsetting, concat with annotations, npz round-trip,
MuData update)."""

import numpy as np
import pandas as pd
import pytest

from salamander_tpu import containers
from salamander_tpu.containers import AnnData, MuData


@pytest.fixture
def adata():
    df = pd.DataFrame(
        np.arange(12.0).reshape(3, 4),
        index=["s1", "s2", "s3"],
        columns=["f1", "f2", "f3", "f4"],
    )
    return AnnData(df)


def test_dataframe_ctor_and_views(adata):
    assert adata.shape == (3, 4)
    assert list(adata.obs_names) == ["s1", "s2", "s3"]
    assert list(adata.var_names) == ["f1", "f2", "f3", "f4"]
    df = adata.to_df()
    assert np.array_equal(df.values, adata.X)


def test_x_setter_shape_guard(adata):
    with pytest.raises(ValueError):
        adata.X = np.zeros((2, 2))
    adata.X = adata.X * 2  # same shape ok


def test_obsm_alignment(adata):
    adata.obsm["emb"] = np.zeros((3, 5))
    with pytest.raises(ValueError):
        adata.obsm["bad"] = np.zeros((4, 2))
    adata.obsp["corr"] = np.eye(3)
    with pytest.raises(ValueError):
        adata.obsp["bad"] = np.eye(2)


def test_subsetting_rows_and_annotations(adata):
    adata.obs["group"] = ["a", "b", "a"]
    adata.obsm["emb"] = np.arange(6.0).reshape(3, 2)
    sub = adata[[0, 2], :]
    assert list(sub.obs_names) == ["s1", "s3"]
    assert list(sub.obs["group"]) == ["a", "a"]
    assert np.array_equal(sub.obsm["emb"], [[0.0, 1.0], [4.0, 5.0]])
    # by name and by boolean mask
    assert list(adata[np.array(["s2"])].obs_names) == ["s2"]
    assert list(adata[np.array([True, False, True])].obs_names) == ["s1", "s3"]
    # slicing with step (reorder() uses [::-1])
    assert list(adata[::-1].obs_names) == ["s3", "s2", "s1"]


def test_copy_is_deep(adata):
    adata.obsm["emb"] = np.zeros((3, 2))
    clone = adata.copy()
    clone.X[0, 0] = 99.0
    clone.obsm["emb"][0, 0] = 99.0
    assert adata.X[0, 0] == 0.0
    assert adata.obsm["emb"][0, 0] == 0.0


def test_concat_outer_union(adata):
    other = AnnData(pd.DataFrame(
        np.ones((2, 2)), index=["t1", "t2"], columns=["f1", "f9"]
    ))
    merged = containers.concat([adata, other], join="outer")
    assert merged.n_obs == 5
    assert list(merged.var_names) == ["f1", "f2", "f3", "f4", "f9"]
    # zero-filled where a variable is absent
    assert merged.to_df().loc["t1", "f2"] == 0.0
    assert merged.to_df().loc["s1", "f9"] == 0.0


def test_npz_roundtrip(tmp_path, adata):
    adata.obs["scalings"] = np.array([0.1, 0.2, 0.3])
    adata.obsm["exposures"] = np.ones((3, 2))
    path = str(tmp_path / "model.npz")
    adata.write_npz(path)
    loaded = AnnData.read_npz(path)
    assert np.array_equal(loaded.X, adata.X)
    assert list(loaded.obs_names) == list(adata.obs_names)
    assert np.array_equal(loaded.obsm["exposures"], adata.obsm["exposures"])
    assert np.allclose(np.asarray(loaded.obs["scalings"]), [0.1, 0.2, 0.3])


def test_mudata_shared_names_and_update():
    a = AnnData(pd.DataFrame(np.ones((3, 2)), index=["s1", "s2", "s3"]))
    b = AnnData(pd.DataFrame(np.ones((3, 4)), index=["s1", "s2", "s3"]))
    mdata = MuData({"sbs": a, "indel": b})
    assert mdata.n_mod == 2
    assert mdata.n_obs == 3
    assert list(mdata.obs_names) == ["s1", "s2", "s3"]
    mdata.obsm["embeddings"] = np.zeros((3, 2))
    a.obs["scalings"] = [1.0, 2.0, 3.0]
    mdata.update()
    assert "sbs:scalings" in mdata.obs.columns
    clone = mdata.copy()
    clone["sbs"].X[0, 0] = 7.0
    assert mdata["sbs"].X[0, 0] == 1.0


def test_h5ad_roundtrip(tmp_path, adata):
    pytest.importorskip("h5py")
    adata.obs["group"] = ["a", "b", "a"]
    adata.obs["score"] = [0.1, 0.2, 0.3]
    adata.obsm["exposures"] = np.ones((3, 2))
    adata.obsp["corr"] = np.eye(3)
    path = str(tmp_path / "model.h5ad")
    adata.write_h5ad(path)
    loaded = AnnData.read_h5ad(path)
    assert np.array_equal(loaded.X, adata.X)
    assert list(loaded.obs_names) == list(adata.obs_names)
    assert list(loaded.var_names) == list(adata.var_names)
    assert list(loaded.obs["group"]) == ["a", "b", "a"]
    assert np.allclose(np.asarray(loaded.obs["score"]), [0.1, 0.2, 0.3])
    assert np.array_equal(loaded.obsm["exposures"], adata.obsm["exposures"])
    assert np.array_equal(loaded.obsp["corr"], np.eye(3))


def test_h5ad_spec_markers(tmp_path, adata):
    h5py = pytest.importorskip("h5py")
    path = str(tmp_path / "spec.h5ad")
    adata.write_h5ad(path)
    with h5py.File(path, "r") as handle:
        assert handle.attrs["encoding-type"] == "anndata"
        assert handle["obs"].attrs["encoding-type"] == "dataframe"
        assert handle["obs"].attrs["_index"] == "_index"
        assert handle["X"].attrs["encoding-type"] == "array"


def test_h5mu_roundtrip(tmp_path):
    pytest.importorskip("h5py")
    a = AnnData(np.arange(6.0).reshape(3, 2))
    a.obs_names = ["s1", "s2", "s3"]
    a.var_names = ["f1", "f2"]
    a.obsm["exposures"] = np.ones((3, 2))
    b = AnnData(np.arange(9.0).reshape(3, 3))
    b.obs_names = ["s1", "s2", "s3"]
    b.var_names = ["g1", "g2", "g3"]
    mdata = MuData({"sbs": a, "indel": b})
    mdata.obsm["embeddings"] = np.full((3, 2), 0.5)

    path = str(tmp_path / "model.h5mu")
    mdata.write_h5mu(path)
    loaded = MuData.read_h5mu(path)
    assert loaded.mod_names == ["sbs", "indel"]
    assert np.array_equal(loaded["sbs"].X, a.X)
    assert np.array_equal(loaded["indel"].X, b.X)
    assert list(loaded["indel"].var_names) == ["g1", "g2", "g3"]
    assert np.array_equal(loaded.obsm["embeddings"], mdata.obsm["embeddings"])
    assert np.array_equal(loaded["sbs"].obsm["exposures"], np.ones((3, 2)))
    assert list(loaded.obs_names) == ["s1", "s2", "s3"]


def test_h5mu_spec_markers(tmp_path):
    h5py = pytest.importorskip("h5py")
    a = AnnData(np.ones((2, 2)))
    mdata = MuData({"sbs": a})
    path = str(tmp_path / "spec.h5mu")
    mdata.write_h5mu(path)
    with h5py.File(path, "r") as handle:
        assert handle.attrs["encoding-type"] == "MuData"
        assert handle.attrs["encoding-version"] == "0.1.0"
        assert handle["mod"]["sbs"].attrs["encoding-type"] == "anndata"
        assert list(handle["mod"].attrs["mod-order"].astype(str)) == ["sbs"]
        assert handle["obs"].attrs["encoding-type"] == "dataframe"


def test_subsetting_keeps_varm(adata):
    adata.varm["anno"] = np.arange(8.0).reshape(4, 2)
    sub = adata[[0, 2], :]
    assert np.array_equal(sub.varm["anno"], adata.varm["anno"])


def test_obsp_requires_square(adata):
    with pytest.raises(ValueError):
        adata.obsp["bad"] = np.zeros((3, 2))
    adata.obsp["good"] = np.zeros((3, 3))
