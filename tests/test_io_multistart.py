"""Checkpoint round-trips for all four model families, the generic batched
multi-start driver, profiling utilities, and the engine's NaN guard."""

import warnings

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from salamander_tpu import io, profiling
from salamander_tpu.containers import AnnData, MuData
from salamander_tpu.engine import FitConfig, fit_loop
from salamander_tpu.models import KLNMF, CorrNMFDet, MultimodalCorrNMF, MvNMF
from salamander_tpu.parallel import fit_best_of


@pytest.fixture(scope="module")
def counts(reference_data_path):
    return pd.read_csv(
        reference_data_path / "models" / "klnmf" / "counts.csv", index_col=0
    ).T


@pytest.fixture(scope="module")
def counts2(reference_data_path):
    return pd.read_csv(
        reference_data_path / "models" / "corrnmf" / "counts.csv", index_col=0
    ).T


# ---------------------------------------------------------------------- #
# checkpointing
# ---------------------------------------------------------------------- #

def roundtrip(model, tmp_path):
    path = str(tmp_path / "model.npz")
    io.save_model(model, path)
    return io.load_model(path)


def test_checkpoint_klnmf(counts, tmp_path):
    model = KLNMF(n_signatures=3, min_iterations=20, max_iterations=20)
    model.fit(AnnData(counts), init_kwargs={"seed": 1})
    loaded = roundtrip(model, tmp_path)
    assert isinstance(loaded, KLNMF)
    assert np.array_equal(loaded.asignatures.X, model.asignatures.X)
    assert np.array_equal(
        loaded.adata.obsm["exposures"], model.adata.obsm["exposures"]
    )
    assert loaded.history["objective_function"] == model.history[
        "objective_function"
    ]
    assert list(loaded.signature_names) == list(model.signature_names)
    # the restored model keeps working: objective + plots + more fitting
    assert np.isclose(loaded.objective_function(), model.objective_function())


def test_checkpoint_mvnmf(counts, tmp_path):
    model = MvNMF(n_signatures=2, lam=0.5, delta=2.0,
                  min_iterations=10, max_iterations=10)
    model.fit(AnnData(counts))
    loaded = roundtrip(model, tmp_path)
    assert loaded.lam == 0.5 and loaded.delta == 2.0
    assert np.isclose(loaded._gamma, model._gamma)
    assert np.array_equal(loaded.asignatures.X, model.asignatures.X)


def test_checkpoint_corrnmf(counts2, tmp_path):
    np.random.seed(0)
    model = CorrNMFDet(n_signatures=2, dim_embeddings=2,
                       min_iterations=10, max_iterations=10)
    model.fit(AnnData(counts2))
    loaded = roundtrip(model, tmp_path)
    assert np.isclose(loaded.variance, model.variance)
    assert np.array_equal(
        loaded.adata.obsm["embeddings"], model.adata.obsm["embeddings"]
    )
    assert np.array_equal(
        np.asarray(loaded.asignatures.obs["scalings"]),
        np.asarray(model.asignatures.obs["scalings"]),
    )
    assert np.isclose(loaded.objective_function(), model.objective_function())


def test_checkpoint_multimodal(counts, counts2, tmp_path):
    mdata = MuData({"a": AnnData(counts.copy()), "b": AnnData(counts2.copy())})
    np.random.seed(1)
    model = MultimodalCorrNMF(ns_signatures=[2, 2], dim_embeddings=2,
                              min_iterations=5, max_iterations=5)
    model.fit(mdata)
    loaded = roundtrip(model, tmp_path)
    assert loaded.mod_names == model.mod_names
    for name in model.mod_names:
        assert np.array_equal(
            loaded.asignatures[name].X, model.asignatures[name].X
        )
    assert np.array_equal(
        loaded.mdata.obsm["embeddings"], model.mdata.obsm["embeddings"]
    )
    assert np.isclose(loaded.objective_function(), model.objective_function())


def test_extraction_roundtrip(counts, tmp_path):
    """save_extraction/load_extraction round-trip every ExtractionResult
    field exactly, including the embedded fitted model."""
    import salamander_tpu as sal

    result = sal.extract_signatures(
        counts, ranks=[2, 3], n_bootstraps=4, seed=0,
        min_iterations=50, max_iterations=500, dtype=np.float64,
    )
    path = str(tmp_path / "extraction.npz")
    sal.save_extraction(result, path)
    loaded = sal.load_extraction(path)

    pd.testing.assert_frame_equal(loaded.table, result.table)
    assert loaded.suggested_rank == result.suggested_rank
    for k in (2, 3):
        pd.testing.assert_frame_equal(loaded.consensus[k], result.consensus[k])
        pd.testing.assert_frame_equal(loaded.exposures[k], result.exposures[k])
        np.testing.assert_array_equal(
            loaded.silhouettes[k], result.silhouettes[k]
        )
        np.testing.assert_array_equal(loaded.matched[k], result.matched[k])
        np.testing.assert_array_equal(
            loaded.replicate_losses[k], result.replicate_losses[k]
        )
        np.testing.assert_array_equal(
            loaded.replicate_iterations[k], result.replicate_iterations[k]
        )
    if result.suggested_rank is not None:
        assert type(loaded.model).__name__ == type(result.model).__name__
        np.testing.assert_array_equal(
            loaded.model.asignatures.X, result.model.asignatures.X
        )
        np.testing.assert_array_equal(
            loaded.model.adata.obsm["exposures"],
            result.model.adata.obsm["exposures"],
        )
    # fit_final=False round-trips model=None
    result_nofit = sal.extract_signatures(
        counts, ranks=[2], n_bootstraps=2, seed=0, fit_final=False,
        min_iterations=50, max_iterations=200, dtype=np.float64,
    )
    path2 = str(tmp_path / "extraction2.npz")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # single-rank silhouette warning
        sal.save_extraction(result_nofit, path2)
        loaded2 = sal.load_extraction(path2)
    assert loaded2.model is None
    with pytest.raises(ValueError, match="not a save_extraction"):
        io.save_model(
            result.model, str(tmp_path / "plain_model.npz")
        ) or sal.load_extraction(str(tmp_path / "plain_model.npz"))


def test_checkpoint_rejects_unknown(tmp_path):
    with pytest.raises(TypeError):
        io.save_model(object(), str(tmp_path / "x.npz"))


# ---------------------------------------------------------------------- #
# generic batched multi-start
# ---------------------------------------------------------------------- #

def test_fit_best_of_klnmf(counts):
    model = KLNMF(n_signatures=3, init_method="random",
                  min_iterations=30, max_iterations=100)
    summary = fit_best_of(model, AnnData(counts), n_restarts=6, base_seed=0)
    assert summary.losses.shape == (6,)
    assert summary.best_index == int(np.argmin(summary.losses))
    # the model holds the best restart
    assert np.isclose(model.objective_function(),
                      summary.losses[summary.best_index], rtol=1e-6)
    assert len(set(np.round(summary.losses, 6))) > 1, "restarts must differ"
    assert model.history["multistart_losses"] == summary.losses.tolist()


def test_fit_best_of_corrnmf_maximizes(counts2):
    model = CorrNMFDet(n_signatures=2, dim_embeddings=2,
                       min_iterations=10, max_iterations=30)
    summary = fit_best_of(model, AnnData(counts2), n_restarts=3, base_seed=7)
    assert summary.best_index == int(np.argmax(summary.losses))
    assert np.all(np.isfinite(summary.losses))


def test_fit_best_of_multimodal(counts, counts2):
    mdata = MuData({"a": AnnData(counts.copy()), "b": AnnData(counts2.copy())})
    model = MultimodalCorrNMF(ns_signatures=[2, 2], dim_embeddings=2,
                              min_iterations=5, max_iterations=10)
    summary = fit_best_of(model, mdata, n_restarts=2, base_seed=0)
    assert summary.losses.shape == (2,)
    assert summary.best_index == int(np.argmax(summary.losses))


def test_fit_best_of_device_init_leaves_global_rng_alone(counts):
    """The 'random' init path builds all restarts on device with jax.random;
    the global numpy RNG state must be untouched (round-1 footgun)."""
    model = KLNMF(n_signatures=2, init_method="random",
                  min_iterations=10, max_iterations=30)
    np.random.seed(12345)
    state_before = np.random.get_state()
    summary = fit_best_of(model, AnnData(counts), n_restarts=4, base_seed=3)
    state_after = np.random.get_state()
    assert state_before[0] == state_after[0]
    assert np.array_equal(state_before[1], state_after[1])
    assert len(set(np.round(summary.losses, 6))) > 1


def test_fit_best_of_device_init_corrnmf(counts2):
    """CorrNMF-family multi-start inits on device (no host loop)."""
    model = CorrNMFDet(n_signatures=2, dim_embeddings=2, init_method="random",
                       min_iterations=10, max_iterations=30)
    summary = fit_best_of(model, AnnData(counts2), n_restarts=4, base_seed=0)
    assert np.all(np.isfinite(summary.losses))
    assert len(set(np.round(summary.losses, 4))) > 1
    assert model.variance > 0


def test_fit_best_of_device_init_mvnmf_gamma(counts):
    model = MvNMF(n_signatures=2, init_method="random",
                  min_iterations=10, max_iterations=30)
    summary = fit_best_of(model, AnnData(counts), n_restarts=3, base_seed=0)
    assert np.all(np.isfinite(summary.losses))
    assert 0.0 < model._gamma <= 1.0


def test_fit_best_of_forced_batched_init_validates(counts):
    model = KLNMF(n_signatures=2, init_method="nndsvd",
                  min_iterations=10, max_iterations=10)
    with pytest.raises(ValueError, match="batched_init"):
        fit_best_of(model, AnnData(counts), n_restarts=2, batched_init=True)


def test_fit_best_of_host_init_restores_rng(counts):
    """Non-'random' inits fall back to the host loop, which must restore the
    global RNG state afterwards."""
    model = KLNMF(n_signatures=2, init_method="separableNMF",
                  min_iterations=10, max_iterations=20)
    np.random.seed(999)
    expected_next = np.random.random()
    np.random.seed(999)
    fit_best_of(model, AnnData(counts), n_restarts=2, base_seed=1)
    assert np.random.random() == expected_next


def test_fit_best_of_respects_given_parameters(counts):
    adata = AnnData(counts)
    given = adata[:1, :].copy()
    given.X = given.X / given.X.sum(axis=1, keepdims=True)
    model = KLNMF(n_signatures=2, init_method="random",
                  min_iterations=10, max_iterations=10)
    fit_best_of(model, adata, n_restarts=3,
                given_parameters={"asignatures": given})
    assert np.allclose(model.asignatures.X[:1], given.X)


# ---------------------------------------------------------------------- #
# engine NaN guard + profiling
# ---------------------------------------------------------------------- #

def test_engine_stop_on_nonfinite():
    config = FitConfig(min_iterations=0, max_iterations=1000,
                       conv_test_freq=10, tol=0.0, stop_on_nonfinite=True)

    def update(x):
        return x * 10.0  # diverges to inf

    def objective(x):
        return jnp.sum(jnp.log(-x))  # NaN for positive x

    result = fit_loop(update, objective, jnp.asarray([2.0]), config)
    assert int(result.n_iterations) == 10  # stopped at the first eval


def test_profiling_timings(counts):
    model = KLNMF(n_signatures=2, min_iterations=5, max_iterations=5)
    model, timings = profiling.timed_fit(model, AnnData(counts))
    assert "fit(total, incl. compile)" in timings.phases
    assert timings.phases["fit(total, incl. compile)"] > 0
    assert "fit" in timings.report()


def test_checkpoint_preserves_klnmf_weights(counts, tmp_path):
    """Loss weights are model state: the restored objective must match."""
    model = KLNMF(n_signatures=2, min_iterations=10, max_iterations=10)
    model.fit(
        AnnData(counts),
        fitting_kwargs={"weights_kl": 2.0, "weights_lhalf": 0.1},
    )
    loaded = roundtrip(model, tmp_path)
    assert loaded.weights_kl is not None
    assert loaded.weights_lhalf is not None
    assert np.isclose(loaded.objective_function(), model.objective_function())


def test_npz_roundtrip_with_string_obs(counts, tmp_path):
    """plot_embeddings adds string obs columns; npz round-trip must survive."""
    from salamander_tpu.containers import AnnData as C

    adata = AnnData(counts)
    adata.obs["color_embeddings"] = ["black"] * adata.n_obs
    path = str(tmp_path / "strings.npz")
    adata.write_npz(path)
    loaded = C.read_npz(path)
    assert list(loaded.obs["color_embeddings"]) == ["black"] * adata.n_obs


def test_fit_best_of_warns_on_deterministic_init(counts):
    model = KLNMF(n_signatures=2, min_iterations=10, max_iterations=10)
    with pytest.warns(UserWarning, match="deterministic"):
        fit_best_of(model, AnnData(counts), n_restarts=3)


def test_multimodal_fit_accepts_stop_on_nonfinite(counts, counts2):
    mdata = MuData({"a": AnnData(counts.copy()), "b": AnnData(counts2.copy())})
    np.random.seed(0)
    model = MultimodalCorrNMF(ns_signatures=[2, 2], dim_embeddings=2,
                              min_iterations=5, max_iterations=5)
    model.fit(mdata, stop_on_nonfinite=True)
    assert np.isfinite(model.objective_function())


def test_fit_best_of_mvnmf(counts):
    """MvNMF's params carry the scalar line-search gamma; the batched
    multi-start must stack and fit it like any other leaf."""
    model = MvNMF(n_signatures=2, init_method="random", lam=0.5,
                  min_iterations=20, max_iterations=60)
    summary = fit_best_of(model, AnnData(counts), n_restarts=4, base_seed=2)
    assert summary.losses.shape == (4,)
    assert summary.best_index == int(np.argmin(summary.losses))
    assert np.isclose(model.objective_function(),
                      summary.losses[summary.best_index], rtol=1e-6)
    assert 0.0 < model._gamma <= 1.0


def test_bootstrap_refits_mvnmf_under_own_objective(counts):
    from salamander_tpu.parallel import bootstrap_stability

    model = MvNMF(n_signatures=2, lam=0.5, min_iterations=10,
                  max_iterations=20)
    model.fit(AnnData(counts))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no 'wrong objective' warning anymore
        result = bootstrap_stability(model, n_bootstraps=3, seed=0)
    assert result.similarities.shape == (3, 2)
    assert np.all(np.isfinite(result.losses))
    # replicate losses are volume-penalized KL values, not plain KL: they
    # must match re-evaluating the MvNMF objective, i.e. include lam*logdet
    assert np.all(result.losses > 0)


def test_bootstrap_refits_corrnmf_under_own_objective(counts):
    from salamander_tpu.models import CorrNMFDet
    from salamander_tpu.parallel import bootstrap_stability

    np.random.seed(1)
    model = CorrNMFDet(n_signatures=2, dim_embeddings=2, min_iterations=5,
                       max_iterations=10)
    model.fit(AnnData(counts))
    result = bootstrap_stability(model, n_bootstraps=3, seed=0)
    assert result.similarities.shape == (3, 2)
    # the replicate objective is the ELBO (maximized, negative-valued for
    # count data), not a KL divergence
    assert np.all(np.isfinite(result.losses))
    assert np.all(result.losses < 0)


def test_bootstrap_multimodal_joint_refits(counts, counts2):
    """Multimodal bootstrap resamples the shared sample axis and refits the
    JOINT model; matching/stability reported per modality."""
    from salamander_tpu.parallel import bootstrap_stability

    mdata = MuData({"a": AnnData(counts.copy()), "b": AnnData(counts2.copy())})
    np.random.seed(0)
    model = MultimodalCorrNMF(ns_signatures=[2, 2], dim_embeddings=2,
                              min_iterations=5, max_iterations=10)
    model.fit(mdata)
    result = bootstrap_stability(model, n_bootstraps=3, seed=0)
    expected_columns = sum(model.signature_names.values(), [])
    assert list(result.similarities.columns) == expected_columns
    assert result.similarities.shape == (3, 4)
    assert set(result.signatures) == {"a", "b"}
    assert result.signatures["a"].shape == (3, 2, counts.shape[1])
    assert np.all(np.isfinite(result.losses))
    assert np.all(result.losses < 0)  # joint ELBO, maximized


def test_bootstrap_requires_fitted_multimodal():
    from salamander_tpu.parallel import bootstrap_stability

    with pytest.raises(ValueError, match="fitted"):
        bootstrap_stability(
            MultimodalCorrNMF(ns_signatures=[2, 2]), n_bootstraps=2
        )


def test_fit_best_of_device_init_multimodal(counts, counts2):
    """Multimodal multi-start inits on device too (shared sample
    embeddings across modalities, per-modality signature draws, no host
    loop, no np.random.seed mutation)."""
    mdata = MuData({"a": AnnData(counts.copy()), "b": AnnData(counts2.copy())})
    model = MultimodalCorrNMF(ns_signatures=[2, 3], dim_embeddings=2,
                              init_method="random",
                              min_iterations=5, max_iterations=10)
    np.random.seed(999)
    state_before = np.random.get_state()
    summary = fit_best_of(model, mdata, n_restarts=4, base_seed=1,
                          batched_init=True)
    state_after = np.random.get_state()
    assert np.array_equal(state_before[1], state_after[1])
    assert summary.losses.shape == (4,)
    assert np.all(np.isfinite(summary.losses))
    assert len(set(np.round(summary.losses, 4))) > 1
    assert summary.best_index == int(np.argmax(summary.losses))
    assert model._is_fitted
    assert model.mdata["a"].obsm["exposures"].shape == (counts.shape[0], 2)
    assert model.mdata["b"].obsm["exposures"].shape == (counts.shape[0], 3)
    assert model.mdata.obsm["embeddings"].shape == (counts.shape[0], 2)
