"""Analysis tools: dimensionality reductions and correlations."""

import numpy as np
import pytest

from salamander_tpu import tools as tl
from salamander_tpu.containers import AnnData


@pytest.fixture
def adata():
    rng = np.random.default_rng(0)
    adata = AnnData(np.abs(rng.normal(size=(30, 8))) + 0.1)
    adata.obsm["exposures"] = np.abs(rng.normal(size=(30, 5))) + 0.1
    return adata


def test_reduce_dimension_pca(adata):
    tl.reduce_dimension(adata, basis="exposures", method="pca")
    assert adata.obsm["X_pca"].shape == (30, 2)


def test_reduce_dimension_tsne(adata):
    tl.reduce_dimension(adata, basis="exposures", method="tsne")
    assert adata.obsm["X_tsne"].shape == (30, 2)


def test_reduce_dimension_skips_low_dim(adata):
    adata.obsm["flat"] = np.zeros((30, 2))
    with pytest.warns(UserWarning):
        tl.reduce_dimension(adata, basis="flat", method="pca")
    assert "X_pca" not in adata.obsm


def test_reduce_dimension_rejects_bad_method(adata):
    with pytest.raises(ValueError):
        tl.reduce_dimension_numpy(adata.obsm["exposures"], method="bogus")


def test_reduce_dimension_multiple_splits_back(adata):
    other = AnnData(np.ones((12, 8)))
    other.obsm["exposures"] = np.abs(
        np.random.default_rng(1).normal(size=(12, 5))
    )
    tl.reduce_dimension_multiple([adata, other], basis="exposures",
                                 method="pca")
    assert adata.obsm["X_pca"].shape == (30, 2)
    assert other.obsm["X_pca"].shape == (12, 2)


def test_umap_falls_back_to_pca_when_missing(adata):
    try:
        import umap  # noqa: F401
        pytest.skip("umap-learn installed; fallback not exercised")
    except ImportError:
        pass
    with pytest.warns(UserWarning, match="umap-learn"):
        tl.reduce_dimension(adata, basis="exposures", method="umap")
    assert adata.obsm["X_umap"].shape == (30, 2)


def test_correlation_stores_obsp(adata):
    tl.correlation(adata, basis="exposures")
    corr = adata.obsp["X_correlation"]
    assert corr.shape == (30, 30)
    assert np.allclose(np.diag(corr), 1.0)
    assert np.allclose(corr, corr.T)


def test_basis_resolution_fallback(adata):
    tl.pca(adata, basis="exposures")
    # 'pca' resolves to 'X_pca' through the _get_basis convention
    tl.correlation(adata, basis="pca")
    assert adata.obsp["X_correlation"].shape == (30, 30)
