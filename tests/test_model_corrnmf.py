"""CorrNMFDet model-layer parity: each EM sub-update vs goldens, the ELBO,
and all six given-parameter freezing guarantees through short fits."""

import numpy as np
import pandas as pd
import pytest

from salamander_tpu.containers import AnnData
from salamander_tpu.models import CorrNMFDet


@pytest.fixture(scope="module")
def data_dir(reference_data_path):
    return reference_data_path / "models" / "corrnmf"


@pytest.fixture(scope="module")
def counts(data_dir):
    return pd.read_csv(data_dir / "counts.csv", index_col=0).T


@pytest.fixture(params=[(1, 1), (2, 2)], ids=["nsigs1_dim1", "nsigs2_dim2"])
def dims(request):
    return request.param


@pytest.fixture
def load(data_dir, dims):
    nsigs, dim = dims

    def _load(name):
        return np.load(data_dir / f"{name}_nsigs{nsigs}_dim{dim}.npy")

    return _load


@pytest.fixture
def model_init(counts, load, dims):
    nsigs, dim = dims
    adata = AnnData(counts)
    adata.obs["scalings"] = load("sample_scalings_init")
    adata.obsm["embeddings"] = load("sample_embeddings_init").T

    asignatures = AnnData(load("signatures_mat_init").T)
    asignatures.var_names = adata.var_names
    asignatures.obs["scalings"] = load("signature_scalings_init")
    asignatures.obsm["embeddings"] = load("signature_embeddings_init").T

    model = CorrNMFDet(n_signatures=nsigs, dim_embeddings=dim)
    model.adata = adata
    model.asignatures = asignatures
    model.compute_exposures()
    model.variance = float(load("variance_init"))
    return model


def test_objective_function(model_init, load):
    assert np.allclose(model_init.objective_function(), load("objective_init"))


class TestUpdates:
    def test_update_signatures(self, model_init, load):
        model_init.update_signatures()
        assert np.allclose(
            model_init.asignatures.X, load("signatures_mat_updated").T
        )

    def test_update_signature_scalings(self, model_init, load):
        model_init.update_signature_scalings(load("aux"))
        assert np.allclose(
            np.asarray(model_init.asignatures.obs["scalings"]),
            load("signature_scalings_updated"),
        )

    def test_update_sample_scalings(self, model_init, load):
        model_init.update_sample_scalings()
        assert np.allclose(
            np.asarray(model_init.adata.obs["scalings"]),
            load("sample_scalings_updated"),
        )

    def test_update_signature_embeddings(self, model_init, load):
        model_init.update_signature_embeddings(load("aux"))
        assert np.allclose(
            model_init.asignatures.obsm["embeddings"],
            load("signature_embeddings_updated").T,
        )

    def test_update_sample_embeddings(self, model_init, load):
        model_init.update_sample_embeddings(load("aux"))
        assert np.allclose(
            model_init.adata.obsm["embeddings"],
            load("sample_embeddings_updated").T,
        )

    def test_update_variance(self, model_init, load):
        model_init.update_variance()
        assert np.allclose(model_init.variance, load("variance_updated"))

    def test_update_signature_embeddings_newton_cg_compat(
        self, model_init, load
    ):
        """The opt-in compat mode runs the reference's exact scipy Newton-CG
        per row, reproducing the golden tightly."""
        model_init.newton_cg_compat = True
        model_init.update_signature_embeddings(load("aux"))
        np.testing.assert_allclose(
            model_init.asignatures.obsm["embeddings"],
            load("signature_embeddings_updated").T, rtol=1e-5, atol=1e-8,
        )

    def test_update_sample_embeddings_newton_cg_compat(self, model_init, load):
        model_init.newton_cg_compat = True
        model_init.update_sample_embeddings(load("aux"))
        np.testing.assert_allclose(
            model_init.adata.obsm["embeddings"],
            load("sample_embeddings_updated").T, rtol=1e-5, atol=1e-8,
        )


def test_fit_elbo_increases(counts):
    model = CorrNMFDet(
        n_signatures=2, dim_embeddings=2,
        min_iterations=20, max_iterations=60, conv_test_freq=10,
    )
    np.random.seed(2)
    model.fit(AnnData(counts))
    trace = model.history["objective_function"]
    assert len(trace) >= 2
    # maximized ELBO: trace non-decreasing (EM guarantee, fp tolerance)
    diffs = np.diff(trace)
    assert np.all(diffs >= -np.abs(np.asarray(trace[:-1])) * 1e-8 - 1e-8)
    assert model.exposures.shape == (counts.shape[0], 2)
    assert model.variance > 0


def test_fit_newton_cg_compat_host_loop(counts):
    """newton_cg_compat=True fits through the host loop with scipy-exact
    embedding M-steps: ELBO non-decreasing, history recorded, model usable."""
    model = CorrNMFDet(
        n_signatures=2, dim_embeddings=2, newton_cg_compat=True,
        min_iterations=10, max_iterations=30, conv_test_freq=10,
    )
    np.random.seed(3)
    model.fit(AnnData(counts))
    trace = model.history["objective_function"]
    assert model.history["n_iterations"] <= 30
    assert len(trace) >= 2
    diffs = np.diff(trace)
    assert np.all(diffs >= -np.abs(np.asarray(trace[:-1])) * 1e-8 - 1e-8)
    assert model._is_fitted
    assert model.exposures.shape == (counts.shape[0], 2)


@pytest.mark.parametrize("nsigs,dim", [(1, 1), (2, 1), (2, 2)])
class TestGivenParameters:
    @pytest.fixture
    def model(self, nsigs, dim):
        return CorrNMFDet(
            n_signatures=nsigs, dim_embeddings=dim,
            min_iterations=3, max_iterations=3,
        )

    @pytest.fixture
    def adata(self, counts):
        return AnnData(counts)

    def test_given_signatures(self, model, adata):
        for n_given in range(1, model.n_signatures + 1):
            given = adata[:n_given, :].copy()
            given.X = given.X / np.sum(given.X, axis=1, keepdims=True)
            model.fit(adata, given_parameters={"asignatures": given})
            assert np.allclose(given.X, model.asignatures.X[:n_given, :])

    def test_given_signature_scalings(self, model, adata):
        given = np.random.uniform(size=model.n_signatures)
        model.fit(adata, given_parameters={"signature_scalings": given})
        assert np.allclose(given, np.asarray(model.asignatures.obs["scalings"]))

    def test_given_sample_scalings(self, model, adata):
        given = np.random.uniform(size=adata.n_obs)
        model.fit(adata, given_parameters={"sample_scalings": given})
        assert np.allclose(given, np.asarray(model.adata.obs["scalings"]))

    def test_given_signature_embeddings(self, model, adata):
        given = np.random.uniform(size=(model.n_signatures, model.dim_embeddings))
        model.fit(adata, given_parameters={"signature_embeddings": given})
        assert np.allclose(given, model.asignatures.obsm["embeddings"])

    def test_given_sample_embeddings(self, model, adata):
        given = np.random.uniform(size=(adata.n_obs, model.dim_embeddings))
        model.fit(adata, given_parameters={"sample_embeddings": given})
        assert np.allclose(given, model.adata.obsm["embeddings"])

    def test_given_variance(self, model, adata):
        model.fit(adata, given_parameters={"variance": 3})
        assert np.allclose(3.0, model.variance)


def test_correlation_scaled(counts):
    model = CorrNMFDet(n_signatures=2, dim_embeddings=2,
                       min_iterations=3, max_iterations=3)
    np.random.seed(0)
    model.fit(AnnData(counts))
    model.compute_correlation_scaled("signatures")
    corr = model.asignatures.obsp["correlation"]
    assert corr.shape == (2, 2)
    assert np.allclose(np.diag(corr), 1.0)
    assert np.all(np.abs(corr) <= 1.0 + 1e-12)


def test_transform_projects_new_samples(counts):
    np.random.seed(3)
    model = CorrNMFDet(n_signatures=2, dim_embeddings=2,
                       min_iterations=30, max_iterations=100)
    model.fit(AnnData(counts.copy()))
    frozen = {
        "signatures": model.asignatures.X.copy(),
        "scalings": np.asarray(model.asignatures.obs["scalings"]).copy(),
        "embeddings": model.asignatures.obsm["embeddings"].copy(),
        "variance": model.variance,
    }
    new = AnnData(counts[:6].copy())
    np.random.seed(4)
    projected = model.transform(new)
    # signature side frozen exactly, sample side learned for the new cohort
    assert np.allclose(projected.asignatures.X, frozen["signatures"])
    assert np.allclose(
        np.asarray(projected.asignatures.obs["scalings"]), frozen["scalings"]
    )
    assert np.allclose(
        projected.asignatures.obsm["embeddings"], frozen["embeddings"]
    )
    assert np.isclose(projected.variance, frozen["variance"])
    assert projected.exposures.shape == (6, 2)
    assert projected.adata.obsm["embeddings"].shape == (6, 2)
    # original untouched
    assert np.allclose(model.asignatures.X, frozen["signatures"])


def test_transform_requires_fitted(counts):
    with pytest.raises(ValueError):
        CorrNMFDet(n_signatures=2).transform(AnnData(counts))


def test_transform_preserves_hyperparameters(counts):
    """The projector must inherit dtype and newton_cg_compat: an audit-mode
    model has to project with audit-mode (scipy-exact) numerics."""
    np.random.seed(5)
    model = CorrNMFDet(n_signatures=2, dim_embeddings=2,
                       min_iterations=5, max_iterations=10,
                       newton_cg_compat=True)
    model.fit(AnnData(counts.copy()))
    np.random.seed(6)
    projected = model.transform(AnnData(counts[:4].copy()))
    assert projected.newton_cg_compat is True
    assert projected.dtype == model.dtype
    assert projected.tol == model.tol


def test_warm_start_continues_corrnmf(counts):
    """warm_start=True resumes the EM from the container state (ELBO not
    worse); missing scalings/embeddings are rejected with the CorrNMF
    message."""
    from salamander_tpu.containers import AnnData
    from salamander_tpu.models import CorrNMFDet

    model = CorrNMFDet(n_signatures=2, dim_embeddings=2,
                       min_iterations=20, max_iterations=60)
    container = AnnData(np.asarray(counts, dtype=float).copy())
    model.fit(container, init_kwargs={"seed": 1})
    elbo_cold = model.objective_function()
    model.fit(container, warm_start=True)
    assert model.objective_function() >= elbo_cold - 1e-9 * abs(elbo_cold)

    fresh = CorrNMFDet(n_signatures=2, dim_embeddings=2)
    with pytest.raises(ValueError, match="warm_start"):
        fresh.fit(AnnData(np.asarray(counts, dtype=float).copy()),
                  warm_start=True)
