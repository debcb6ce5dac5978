"""KLNMF model-layer parity (objective, one joint update vs pickled goldens,
given-signature freezing through fit) + end-to-end engine behavior."""

import pickle

import numpy as np
import pandas as pd
import pytest

from salamander_tpu.containers import AnnData
from salamander_tpu.models import KLNMF


@pytest.fixture(scope="module")
def data_dir(reference_data_path):
    return reference_data_path / "models" / "klnmf"


@pytest.fixture
def adata(data_dir):
    counts = pd.read_csv(data_dir / "counts.csv", index_col=0)
    return AnnData(counts.T)


@pytest.fixture(params=[1, 2])
def nsigs(request):
    return request.param


@pytest.fixture
def model_init(data_dir, adata, nsigs):
    W = np.load(data_dir / f"W_init_nsigs{nsigs}.npy")
    H = np.load(data_dir / f"H_init_nsigs{nsigs}.npy")
    asignatures = AnnData(W.T)
    asignatures.var_names = adata.var_names
    model = KLNMF(n_signatures=nsigs)
    model.adata = adata
    model.asignatures = asignatures
    model.adata.obsm["exposures"] = H.T
    return model


def test_objective_function(data_dir, model_init, nsigs):
    expected = np.load(data_dir / f"objective_init_nsigs{nsigs}.npy")
    assert np.allclose(model_init.objective_function(), expected)


def test_update_parameters(data_dir, model_init, nsigs):
    with open(data_dir / f"WH_updated_joint_nsigs{nsigs}.pkl", "rb") as handle:
        W_updated, H_updated = pickle.load(handle)
    model_init._update_parameters()
    assert np.allclose(model_init.asignatures.X, W_updated.T)
    assert np.allclose(model_init.adata.obsm["exposures"], H_updated.T)


def test_given_signatures_through_fit(adata, nsigs):
    for n_given in range(1, nsigs + 1):
        given = adata[:n_given, :].copy()
        given.X = given.X / np.sum(given.X, axis=1, keepdims=True)
        model = KLNMF(n_signatures=nsigs, min_iterations=3, max_iterations=3)
        model.fit(adata, given_parameters={"asignatures": given})
        assert np.allclose(given.X, model.asignatures.X[:n_given, :])


def test_fit_converges_and_traces_history(adata):
    model = KLNMF(
        n_signatures=2, init_method="random",
        min_iterations=20, max_iterations=200, conv_test_freq=10, tol=1e-6,
    )
    model.fit(adata, init_kwargs={"seed": 3})
    trace = model.history["objective_function"]
    assert len(trace) >= 2
    # minimized objective: the trace is non-increasing (within fp noise)
    diffs = np.diff(trace)
    assert np.all(diffs <= np.abs(np.asarray(trace[:-1])) * 1e-6 + 1e-8)
    assert model.history["n_iterations"] <= 200
    # container state is populated
    assert model.exposures.shape == (adata.n_obs, 2)
    assert np.allclose(model.signatures.sum(axis=1), 1.0)
    assert model.reconstruction_error > 0


def test_fit_respects_max_iterations(adata):
    model = KLNMF(n_signatures=2, min_iterations=5, max_iterations=5)
    model.fit(adata)
    assert model.history["n_iterations"] == 5
    # evals only at multiples of conv_test_freq=10 > 5 iterations -> none
    assert model.history["objective_function"] == []


def test_fit_with_weights(adata):
    weights = 2.0 * np.ones(adata.n_obs)
    model = KLNMF(n_signatures=2, min_iterations=10, max_iterations=10)
    model.fit(adata.copy(), fitting_kwargs={"weights_kl": weights})
    assert model.weights_kl is not None
    model_plain = KLNMF(n_signatures=2, min_iterations=10, max_iterations=10)
    model_plain.fit(adata.copy())
    # constant KL weights leave the updates unchanged
    assert np.allclose(model.asignatures.X, model_plain.asignatures.X)
    # ... but scale the objective
    assert np.allclose(
        model.objective_function(), 2 * model_plain.objective_function()
    )


def test_fit_lhalf_sparsifies(adata):
    dense = KLNMF(n_signatures=2, min_iterations=50, max_iterations=50)
    dense.fit(adata.copy())
    sparse = KLNMF(n_signatures=2, min_iterations=50, max_iterations=50)
    sparse.fit(adata.copy(), fitting_kwargs={"weights_lhalf": 100.0})
    assert (
        np.sum(np.sqrt(sparse.adata.obsm["exposures"]))
        < np.sum(np.sqrt(dense.adata.obsm["exposures"]))
    )


def test_rejects_bad_fitting_kwargs(adata):
    model = KLNMF(n_signatures=2)
    with pytest.raises(ValueError):
        model.fit(adata, fitting_kwargs={"bogus": 1.0})
    with pytest.raises(ValueError):
        model.fit(adata, fitting_kwargs={"weights_kl": -np.ones(adata.n_obs)})


def test_reorder_and_correlation(adata):
    model = KLNMF(n_signatures=3, min_iterations=30, max_iterations=30)
    model.fit(adata)
    order_before = model.signatures.copy()
    target = model.asignatures[::-1, :].copy()
    model.reorder(target, keep_names=False)
    assert np.allclose(model.signatures.values, order_before.values[::-1])
    corr = model.correlation("signatures")
    assert corr.shape == (3, 3)
    assert np.allclose(np.diag(corr.values), 1.0)


def test_fit_trace_equals_eager_reference_loop(adata):
    """Full-stack pin: the jitted engine fit must reproduce, value for
    value, the reference's host-level loop built from single eager updates
    (the same order the reference executes: update, then evaluate every
    conv_test_freq iterations)."""
    model_engine = KLNMF(n_signatures=2, min_iterations=10, max_iterations=30,
                         conv_test_freq=10)
    model_engine.fit(adata.copy(), init_kwargs={"seed": 9},
                     fitting_kwargs=None)

    model_eager = KLNMF(n_signatures=2)
    data = adata.copy()
    model_eager._setup_adata(data)
    np.random.seed(9)
    model_eager._initialize(None, {"seed": 9})
    model_eager._setup_fitting_parameters(None)
    trace = []
    for iteration in range(1, 31):
        model_eager._update_parameters()
        if iteration % 10 == 0:
            trace.append(model_eager.objective_function())

    np.testing.assert_allclose(
        model_engine.history["objective_function"], trace, rtol=1e-9
    )
    np.testing.assert_allclose(
        model_engine.asignatures.X, model_eager.asignatures.X, rtol=1e-9
    )


def test_transform_projects_new_samples(adata):
    model = KLNMF(n_signatures=3, min_iterations=50, max_iterations=100)
    model.fit(adata.copy(), init_kwargs={"seed": 2})
    signatures_before = model.asignatures.X.copy()

    new_samples = adata[:5, :].copy()
    projected = model.transform(new_samples, history=False)
    # signatures frozen exactly; only exposures learned for the new samples
    assert np.allclose(projected.asignatures.X, signatures_before)
    assert np.array_equal(model.asignatures.X, signatures_before)
    assert projected.exposures.shape == (5, 3)
    assert list(projected.exposures.columns) == list(model.signature_names)
    # the projection reconstructs the new samples reasonably
    assert projected.reconstruction_error < float(
        np.sum(new_samples.X)
    )


def test_transform_repeats_share_runner_without_leak(adata):
    """Repeated transform() calls share one cached fit runner (the
    projector would otherwise re-trace every call); the cache must not
    leak state - a second transform on different samples equals the same
    transform done first, bitwise."""
    model = KLNMF(n_signatures=3, min_iterations=50, max_iterations=100)
    model.fit(adata.copy(), init_kwargs={"seed": 2})

    first_batch = adata[:5, :].copy()
    second_batch = adata[5:12, :].copy()
    model.transform(first_batch.copy(), history=False)
    reused = model.transform(second_batch.copy(), history=False)

    fresh_model = KLNMF(n_signatures=3, min_iterations=50,
                        max_iterations=100)
    fresh_model.fit(adata.copy(), init_kwargs={"seed": 2})
    direct = fresh_model.transform(second_batch.copy(), history=False)
    np.testing.assert_array_equal(
        np.asarray(reused.exposures.to_numpy()),
        np.asarray(direct.exposures.to_numpy()),
    )
    # the shared cache lives on the parent, and both projectors use it
    assert getattr(model, "_transform_runner_cache", None)
    assert len(model._transform_runner_cache) == 1


def test_warm_start_continues_and_validates(adata, tmp_path):
    """fit(warm_start=True) resumes from the state in the model/container:
    the objective keeps improving, missing state and given_parameters are
    rejected, and a save_model/load_model round-trip resumes too (the
    manual checkpoint path for long single fits)."""
    from salamander_tpu.io import load_model, save_model

    model = KLNMF(n_signatures=3, min_iterations=20, max_iterations=60)
    container = adata.copy()
    model.fit(container, init_kwargs={"seed": 1})
    of_cold = model.objective_function()

    model.fit(container, warm_start=True)
    of_warm = model.objective_function()
    assert of_warm <= of_cold + 1e-9 * abs(of_cold)

    # resume from disk: the saved container carries the fitted state
    save_model(model, str(tmp_path / "ckpt.npz"))
    restored = load_model(str(tmp_path / "ckpt.npz"))
    restored.fit(restored.adata, warm_start=True)
    assert restored.objective_function() <= of_warm + 1e-9 * abs(of_warm)

    with pytest.raises(ValueError, match="warm_start"):
        KLNMF(n_signatures=3).fit(adata.copy(), warm_start=True)
    with pytest.raises(ValueError, match="given_parameters"):
        model.fit(container, warm_start=True,
                  given_parameters={"asignatures": model.asignatures})
    # wrong-shape state (another model's rank) is rejected, not used
    other = KLNMF(n_signatures=2, min_iterations=10, max_iterations=10)
    other.fit(adata.copy(), init_kwargs={"seed": 0})
    with pytest.raises(ValueError, match="wrong shape"):
        other.fit(container, warm_start=True)


def test_transform_requires_fitted_model(adata):
    with pytest.raises(ValueError):
        KLNMF(n_signatures=3).transform(adata)


def test_transform_preserves_subclass_hyperparameters(adata):
    from salamander_tpu.models import MvNMF

    model = MvNMF(n_signatures=2, lam=50.0, delta=2.0,
                  min_iterations=10, max_iterations=10)
    model.fit(adata.copy())
    projector = model.transform(adata[:4, :].copy())
    assert projector.lam == 50.0 and projector.delta == 2.0


def test_transform_does_not_mutate_input(adata):
    model = KLNMF(n_signatures=2, min_iterations=10, max_iterations=10)
    model.fit(adata.copy())
    new = adata[:4, :].copy()
    new.X[0, 0] = 0.0  # a true zero the clip would destroy
    model.transform(new)
    assert new.X[0, 0] == 0.0
    assert "exposures" not in new.obsm


def test_transform_rejects_given_parameters_override(adata):
    model = KLNMF(n_signatures=2, min_iterations=10, max_iterations=10)
    model.fit(adata.copy())
    with pytest.raises(ValueError, match="given_parameters"):
        model.transform(adata.copy(), given_parameters={})


def test_transform_works_for_user_subclass(adata):
    class MyKLNMF(KLNMF):
        pass

    model = MyKLNMF(n_signatures=2, min_iterations=10, max_iterations=10)
    model.fit(adata.copy())
    projector = model.transform(adata[:3, :].copy())
    assert type(projector) is MyKLNMF
    assert projector.exposures.shape == (3, 2)


def test_fit_invalidates_stale_derived_caches(adata):
    """A container carrying another model's derived columns must not leak
    them through the lazy reconstruction_error / data_reconstructed
    properties (regression: a copy of a fitted model's adata previously
    served the OLD model's reconstruction error after a fresh fit)."""
    first = KLNMF(n_signatures=1, min_iterations=10, max_iterations=10)
    first.fit(adata)
    stale_total = first.reconstruction_error
    assert "reconstruction_error" in first.adata.obs
    _ = first.data_reconstructed
    assert "X_reconstructed" in first.adata.obsm

    carried = adata.copy()
    assert "reconstruction_error" in carried.obs

    second = KLNMF(n_signatures=3, min_iterations=200, max_iterations=200)
    second.fit(carried)
    assert "reconstruction_error" not in carried.obs  # dropped at setup
    fresh_total = second.reconstruction_error
    assert fresh_total < stale_total  # k=3/200 iters beats k=1/10 iters
    errors = np.asarray(second.adata.obs["reconstruction_error"])
    W = second.asignatures.X.T
    H = second.adata.obsm["exposures"].T
    from salamander_tpu.ops.klnmf import samplewise_kl_divergence

    assert np.allclose(errors, np.asarray(
        samplewise_kl_divergence(second.adata.X.T, W, H)))
