"""Analysis tools (`sal.tl`): dimensionality reduction and correlation,
compute-and-store into the annotated containers.

API parity with /root/reference/src/salamander/tools.py (pca/tsne/umap
:16-79, reduce_dimension(+_numpy/_multiple) :82-161, correlation :164-177).
Host-side by design: these run once on small fitted representations. UMAP is
optional (umap-learn is not a hard dependency); PCA falls back to a numpy SVD
if scikit-learn is missing.
"""

from __future__ import annotations

import warnings
from typing import Iterable

import numpy as np
import pandas as pd

from .utils import _get_basis_obsm, value_checker

DIM_REDUCTION_METHODS = ("pca", "tsne", "umap")


def _pca(data: np.ndarray, n_components: int = 2, **kwargs) -> np.ndarray:
    try:
        from sklearn.decomposition import PCA

        return PCA(n_components=n_components, **kwargs).fit_transform(data)
    except ImportError:  # pragma: no cover
        centered = data - data.mean(axis=0)
        _, _, vt = np.linalg.svd(centered, full_matrices=False)
        return centered @ vt[:n_components].T


def pca(adata, basis: str, **kwargs) -> None:
    """Compute and store the PCA of adata.obsm[basis] as 'X_pca'."""
    adata.obsm["X_pca"] = _pca(_get_basis_obsm(adata, basis), **kwargs)


def _tsne(data: np.ndarray, n_components: int = 2, perplexity: float = 30.0,
          **kwargs) -> np.ndarray:
    from sklearn.manifold import TSNE

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        perplexity = min(perplexity, len(data) - 1)
        return TSNE(
            n_components=n_components, perplexity=perplexity, **kwargs
        ).fit_transform(data)


def tsne(adata, basis: str, **kwargs) -> None:
    """Compute and store the t-SNE of adata.obsm[basis] as 'X_tsne'."""
    adata.obsm["X_tsne"] = _tsne(_get_basis_obsm(adata, basis), **kwargs)


def _umap(data: np.ndarray, n_components: int = 2, n_neighbors: float = 15,
          min_dist: float = 0.1, **kwargs) -> np.ndarray:
    try:
        import umap
    except ImportError:
        warnings.warn(
            "umap-learn is not installed; falling back to PCA. Install the "
            "optional 'umap-learn' package or pass method='pca'/'tsne' to "
            "silence this warning.",
            UserWarning,
        )
        return _pca(data, n_components=n_components)
    n_neighbors = min(n_neighbors, len(data) - 1.0)
    return umap.UMAP(
        n_components=n_components, n_neighbors=n_neighbors,
        min_dist=min_dist, **kwargs
    ).fit_transform(data)


def umap(adata, basis: str, **kwargs) -> None:
    """Compute and store the UMAP of adata.obsm[basis] as 'X_umap'."""
    adata.obsm["X_umap"] = _umap(_get_basis_obsm(adata, basis), **kwargs)


_REDUCERS = {"pca": _pca, "tsne": _tsne, "umap": _umap}


def _warn_nothing_to_reduce(n_dimensions: int, what: str) -> bool:
    if n_dimensions not in (1, 2):
        return False
    warnings.warn(
        f"The dimension of the {what} is {n_dimensions}. "
        + ("The dimensionality of the data will not be reduced."
           if what == "data points"
           else "No dimensionality reduction will be applied."),
        UserWarning,
    )
    return True


def reduce_dimension_numpy(
    data: np.ndarray,
    method: str = "umap",
    n_components: int = 2,
    normalize: bool = False,
    **kwargs,
) -> np.ndarray:
    """Reduce rows of 'data' to n_components; 1-D/2-D data passes through
    with a warning (nothing to reduce)."""
    value_checker("method", method, DIM_REDUCTION_METHODS)
    if normalize:
        data = data / np.sqrt(np.sum(data**2, axis=1))[:, None]
    if _warn_nothing_to_reduce(data.shape[1], "data points"):
        return data
    return _REDUCERS[method](data, n_components=n_components, **kwargs)


def reduce_dimension(adata, basis: str, method: str = "umap",
                     n_components: int = 2, **kwargs) -> None:
    """Compute and store a dimensionality reduction of adata.obsm[basis]."""
    data = _get_basis_obsm(adata, basis)
    if _warn_nothing_to_reduce(data.shape[1], "observation annotations"):
        return
    adata.obsm[f"X_{method}"] = reduce_dimension_numpy(
        data, method=method, n_components=n_components, **kwargs
    )


def reduce_dimension_multiple(adatas: Iterable, basis: str,
                              method: str = "umap", **kwargs) -> None:
    """Jointly reduce the same obsm basis of several containers (used for the
    shared CorrNMF signature+sample embedding space)."""
    adatas = list(adatas)
    data = np.concatenate([_get_basis_obsm(a, basis) for a in adatas])
    if _warn_nothing_to_reduce(data.shape[1], "observation annotations"):
        return
    reduced = reduce_dimension_numpy(data, method=method, **kwargs)
    offset = 0
    for adata in adatas:
        adata.obsm[f"X_{method}"] = reduced[offset : offset + adata.n_obs, :]
        offset += adata.n_obs


def correlation_numpy(data: np.ndarray, **kwargs) -> np.ndarray:
    """Pearson correlation of the rows of 'data'."""
    return pd.DataFrame(data.T).corr(**kwargs).values


def correlation(adata, basis: str, **kwargs) -> None:
    """Compute and store the row correlation of adata.obsm[basis]."""
    adata.obsp["X_correlation"] = correlation_numpy(
        _get_basis_obsm(adata, basis), **kwargs
    )
