"""Acceptance of REAL scverse containers (anndata.AnnData / mudata.MuData).

The reference operates directly on anndata/mudata objects
(/root/reference/src/salamander/models/signature_nmf.py:269-281 clips
adata.X in place at fit start; mmcorrnmf.py:200-215 validates mdata
modalities). This repo duck-types the container protocol (containers.py)
and these tests run the SAME protocol against the real classes - they are
skipped wherever anndata/mudata are not installed (this build environment
lacks them; the moment a `pip install anndata mudata` is possible,
acceptance is one pytest run away).
"""

import numpy as np
import pytest

anndata = pytest.importorskip("anndata")


def _counts(seed=0, shape=(20, 12)):
    return np.random.default_rng(seed).poisson(30.0, shape).astype(float)


def test_klnmf_fit_accepts_real_anndata():
    from salamander_tpu.models import KLNMF

    adata = anndata.AnnData(X=_counts())
    model = KLNMF(n_signatures=2, min_iterations=10, max_iterations=30)
    model.fit(adata, init_kwargs={"seed": 0})
    assert model._is_fitted
    # learned state lands in the real container's slots, reference layout
    assert adata.obsm["exposures"].shape == (20, 2)
    # the EPSILON clip mutated the real adata.X in place (reference
    # signature_nmf.py:269-281 semantics)
    assert float(np.min(adata.X)) >= float(np.finfo(np.float32).eps)
    assert model.exposures.shape == (20, 2)


def test_corrnmf_fit_accepts_real_anndata():
    from salamander_tpu.models import CorrNMFDet

    adata = anndata.AnnData(X=_counts(1))
    model = CorrNMFDet(n_signatures=2, dim_embeddings=2,
                       min_iterations=10, max_iterations=30)
    model.fit(adata, init_kwargs={"seed": 1})
    assert adata.obsm["exposures"].shape == (20, 2)
    assert adata.obsm["embeddings"].shape == (20, 2)
    assert "scalings" in adata.obs


def test_multimodal_fit_accepts_real_mudata():
    mudata = pytest.importorskip("mudata")

    from salamander_tpu.models import MultimodalCorrNMF

    mdata = mudata.MuData({
        "sbs": anndata.AnnData(X=_counts(2, (20, 12))),
        "indel": anndata.AnnData(X=_counts(3, (20, 8))),
    })
    model = MultimodalCorrNMF(ns_signatures=[2, 2], dim_embeddings=2,
                              min_iterations=5, max_iterations=10)
    model.fit(mdata, init_kwargs={"seed": 2})
    assert mdata["sbs"].obsm["exposures"].shape == (20, 2)
    assert mdata.obsm["embeddings"].shape == (20, 2)


def test_h5ad_roundtrip_readable_by_real_anndata(tmp_path):
    """The spec-level h5ad writer (io.py) must produce files the real
    anndata reader accepts."""
    from salamander_tpu.containers import AnnData as LightAnnData

    light = LightAnnData(_counts(4))
    light.obsm["exposures"] = np.ones((20, 2))
    path = tmp_path / "model.h5ad"
    light.write_h5ad(str(path))
    back = anndata.read_h5ad(path)
    np.testing.assert_allclose(np.asarray(back.X), light.X)
    np.testing.assert_allclose(back.obsm["exposures"], np.ones((20, 2)))
