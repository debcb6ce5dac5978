"""Initialization parity against the reference goldens (all seven methods),
plus container-level behavior (signature naming, given-signature stitching)."""

import numpy as np
import pytest

from salamander_tpu import containers
from salamander_tpu.initialization import initialize_mat
from salamander_tpu.initialization.initialize import (
    initialize_base,
    initialize_corrnmf,
    initialize_mmcorrnmf,
    initialize_standard_nmf,
)

SEED = 1
N_SIGNATURES = 2
DETERMINISTIC = ["flat"]
STOCHASTIC = ["nndsvd", "nndsvda", "nndsvdar", "random", "separableNMF"]


@pytest.fixture(scope="module")
def init_dir(reference_data_path):
    return reference_data_path / "initialization"


@pytest.fixture(scope="module")
def data_mat(init_dir):
    return np.load(init_dir / "data_mat.npy")


@pytest.mark.parametrize("method", DETERMINISTIC + STOCHASTIC)
def test_initialize_mat_matches_golden(init_dir, data_mat, method):
    suffix = f"{method}.npy" if method in DETERMINISTIC else f"{method}_seed{SEED}.npy"
    signatures_expected = np.load(init_dir / f"signatures_mat_{suffix}")
    exposures_expected = np.load(init_dir / f"exposures_mat_{suffix}")
    kwargs = {"seed": SEED} if method in STOCHASTIC else {}
    signatures_mat, exposures_mat = initialize_mat(
        data_mat, N_SIGNATURES, method, **kwargs
    )
    assert np.allclose(signatures_mat, signatures_expected)
    assert np.allclose(exposures_mat, exposures_expected)


def test_initialize_mat_custom_roundtrip(data_mat):
    signatures = np.array([[0.1, 0.2, 0.7], [0.6, 0.1, 0.3]])
    exposures = np.arange(1, 9).reshape((4, 2))
    signatures_out, exposures_out = initialize_mat(
        data_mat,
        N_SIGNATURES,
        "custom",
        signatures_mat=signatures,
        exposures_mat=exposures,
    )
    assert np.array_equal(signatures, signatures_out)
    assert np.array_equal(exposures, exposures_out)


def test_initialize_mat_given_signatures_overwrite(data_mat):
    given = np.array([[0.5, 0.25, 0.25]])
    signatures_mat, _ = initialize_mat(
        data_mat, N_SIGNATURES, "flat", given_signatures_mat=given
    )
    assert np.allclose(signatures_mat[0], given[0])


def test_initialize_mat_rejects_bad_given(data_mat):
    with pytest.raises(ValueError):
        initialize_mat(
            data_mat, 1, "flat",
            given_signatures_mat=np.ones((2, data_mat.shape[1])) / data_mat.shape[1],
        )
    with pytest.raises(ValueError):
        initialize_mat(
            data_mat, 2, "flat", given_signatures_mat=np.ones((1, 99)) / 99.0
        )


@pytest.fixture
def adata(data_mat):
    adata = containers.AnnData(data_mat.astype(float))
    adata.var_names = [f"mt{j}" for j in range(data_mat.shape[1])]
    adata.obs_names = [f"s{i}" for i in range(data_mat.shape[0])]
    return adata


def test_initialize_base_names_and_given_annotations(adata):
    asigs, exposures = initialize_base(adata, 3, "flat")
    assert list(asigs.obs_names) == ["Sig1", "Sig2", "Sig3"]
    assert list(asigs.var_names) == list(adata.var_names)
    assert exposures.shape == (adata.n_obs, 3)

    given = containers.AnnData(np.full((1, adata.n_vars), 1.0 / adata.n_vars))
    given.var_names = adata.var_names
    given.obs_names = ["KnownSig"]
    asigs2, _ = initialize_base(adata, 3, "flat", given_asignatures=given)
    assert list(asigs2.obs_names) == ["KnownSig", "Sig1", "Sig2"]
    assert np.allclose(asigs2.X[0], given.X[0])


def test_initialize_standard_nmf_stores_exposures(adata):
    asigs = initialize_standard_nmf(adata, 2, "flat")
    assert "exposures" in adata.obsm
    assert adata.obsm["exposures"].shape == (adata.n_obs, 2)
    assert asigs.n_obs == 2


def test_initialize_corrnmf_state(adata):
    np.random.seed(0)
    asigs, variance = initialize_corrnmf(adata, 2, 2, "flat")
    assert variance == 1.0
    assert asigs.obsm["embeddings"].shape == (2, 2)
    assert adata.obsm["embeddings"].shape == (adata.n_obs, 2)
    assert np.allclose(asigs.obs["scalings"], 0.0)
    assert np.allclose(adata.obs["scalings"], 0.0)


def test_initialize_corrnmf_rejects_custom(adata):
    with pytest.raises(ValueError):
        initialize_corrnmf(adata, 2, 2, "custom")


def test_initialize_corrnmf_given_parameters(adata):
    given = {
        "signature_scalings": np.array([0.5, -0.5]),
        "sample_scalings": np.full(adata.n_obs, 0.25),
        "signature_embeddings": np.ones((2, 2)),
        "sample_embeddings": np.ones((adata.n_obs, 2)),
        "variance": 3,
    }
    asigs, variance = initialize_corrnmf(adata, 2, 2, "flat", given)
    assert variance == 3.0
    assert np.array_equal(asigs.obs["scalings"], given["signature_scalings"])
    assert np.array_equal(np.asarray(adata.obs["scalings"]), given["sample_scalings"])
    assert np.array_equal(asigs.obsm["embeddings"], given["signature_embeddings"])
    assert np.array_equal(adata.obsm["embeddings"], given["sample_embeddings"])


def test_initialize_mmcorrnmf_names_and_shared_embeddings(data_mat):
    mods = {}
    for name, n_vars in [("sbs", 3), ("indel", 2)]:
        adata = containers.AnnData(
            np.abs(np.random.default_rng(0).normal(size=(4, n_vars))) + 1.0
        )
        adata.obs_names = [f"s{i}" for i in range(4)]
        mods[name] = adata
    mdata = containers.MuData(mods)
    np.random.seed(0)
    asignatures, variance = initialize_mmcorrnmf(mdata, [2, 3], 3, "flat")
    assert variance == 1.0
    assert list(asignatures["sbs"].obs_names) == ["sbs Sig1", "sbs Sig2"]
    assert list(asignatures["indel"].obs_names) == [
        "indel Sig1", "indel Sig2", "indel Sig3"
    ]
    assert mdata.obsm["embeddings"].shape == (4, 3)
    for name, k in [("sbs", 2), ("indel", 3)]:
        assert asignatures[name].obsm["embeddings"].shape == (k, 3)


def test_initialize_mmcorrnmf_rejects_modality_level_shared_params(data_mat):
    mods = {"m1": containers.AnnData(np.ones((4, 3)))}
    mdata = containers.MuData(mods)
    with pytest.raises(KeyError):
        initialize_mmcorrnmf(
            mdata, [2], 2, "flat",
            {"m1": {"sample_embeddings": np.ones((4, 2))}},
        )
    with pytest.raises(KeyError):
        initialize_mmcorrnmf(mdata, [2], 2, "flat", {"m1": {"variance": 2.0}})


def test_initialize_mat_degenerate_component_stays_finite():
    """Low-rank data can give NNDSVD components that are all-zero; the
    normalization must not produce NaN signatures (the fit would silently
    burn max_iterations on NaN otherwise)."""
    rank1 = np.outer(np.arange(1.0, 7.0), [1.0, 2.0, 3.0, 4.0])
    signatures_mat, exposures_mat = initialize_mat(rank1, 3, "nndsvd")
    assert np.all(np.isfinite(signatures_mat))
    assert np.all(np.isfinite(exposures_mat))
    assert np.all(signatures_mat > 0)
