"""Parallel layer on the virtual 8-device CPU mesh: mesh factorization,
sharded multi-start fits (numerics must match the unsharded run), rank scan,
and the dryrun entry point."""

import jax
import numpy as np
import pytest

from salamander_tpu.engine import FitConfig
from salamander_tpu.parallel import (
    fit_klnmf_restarts,
    make_mesh,
    rank_scan_klnmf,
)
from salamander_tpu.parallel.mesh import _factor


def test_factorization():
    assert _factor(8) == (2, 4)
    assert _factor(7) == (7, 1)
    assert _factor(4) == (1, 4)
    assert _factor(1) == (1, 1)
    assert _factor(16) == (4, 4)


@pytest.fixture(scope="module")
def X():
    rng = np.random.default_rng(0)
    W = rng.dirichlet(np.ones(16), size=3).T
    H = rng.gamma(2.0, 50.0, size=(3, 32))
    X = rng.poisson(W @ H).astype(np.float64)
    return np.clip(X, np.finfo(np.float32).eps, None)


@pytest.fixture(scope="module")
def config():
    return FitConfig(min_iterations=20, max_iterations=100, conv_test_freq=10,
                     tol=1e-8)


def test_multistart_unsharded(X, config):
    result = fit_klnmf_restarts(X, 3, 8, seed=0, config=config,
                                dtype=np.float64)
    assert result.losses.shape == (8,)
    assert np.all(np.isfinite(result.losses))
    assert result.best_index == int(np.argmin(result.losses))
    assert result.best_W.shape == (16, 3)
    # column-stochastic signatures
    np.testing.assert_allclose(np.asarray(result.best_W).sum(0), 1.0,
                               rtol=1e-9)


def test_multistart_sharded_matches_unsharded(X, config):
    """Sharding over the (restarts, samples) mesh must not change numerics."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    baseline = fit_klnmf_restarts(X, 3, 8, seed=0, config=config,
                                  dtype=np.float64)
    mesh = make_mesh(jax.devices()[:8])  # 2 restarts x 4 samples
    sharded = fit_klnmf_restarts(X, 3, 8, seed=0, config=config, mesh=mesh,
                                 dtype=np.float64)
    np.testing.assert_allclose(sharded.losses, baseline.losses, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sharded.W), np.asarray(baseline.W),
                               rtol=1e-8)
    assert np.array_equal(sharded.n_iterations, baseline.n_iterations)


def test_multistart_restart_only_mesh(X, config):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(jax.devices()[:8], sample_ways=1)
    result = fit_klnmf_restarts(X, 3, 16, seed=1, config=config, mesh=mesh)
    assert result.losses.shape == (16,)
    assert np.all(np.isfinite(result.losses))


def test_rank_scan(X, config):
    scan = rank_scan_klnmf(X, [2, 3], 4, config=config, dtype=np.float64)
    assert set(scan) == {2, 3}
    # higher rank fits at least as well (best over restarts)
    assert scan[3].best_loss <= scan[2].best_loss + 1e-6


def test_dryrun_entry():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)
    fn, args = graft.entry()
    W, H, of = jax.jit(fn)(*args)
    assert np.isfinite(float(of))


def test_generic_rank_scan(X, config):
    from salamander_tpu.containers import AnnData
    from salamander_tpu.models import KLNMF
    from salamander_tpu.parallel import rank_scan

    adata = AnnData(np.asarray(X).T)

    def factory(k):
        return KLNMF(n_signatures=k, init_method="random",
                     min_iterations=20, max_iterations=60)

    results = rank_scan(factory, adata, [2, 3], n_restarts=4)
    assert set(results) == {2, 3}
    for k, (model, summary) in results.items():
        assert model.n_signatures == k
        assert summary.losses.shape == (4,)
        assert np.isclose(
            model.objective_function(),
            summary.losses[summary.best_index], rtol=1e-6,
        )
    assert (results[3][1].losses.min() <= results[2][1].losses.min() + 1e-6)


def test_bootstrap_stability(reference_data_path):
    import pandas as pd

    from salamander_tpu.containers import AnnData
    from salamander_tpu.models import KLNMF
    from salamander_tpu.parallel import bootstrap_stability

    counts = pd.read_csv(
        reference_data_path / "models" / "klnmf" / "counts.csv", index_col=0
    ).T
    model = KLNMF(n_signatures=2, min_iterations=60, max_iterations=200,
                  tol=1e-7)
    model.fit(AnnData(counts), init_kwargs={"seed": 0})

    result = bootstrap_stability(model, n_bootstraps=8, seed=1)
    assert result.similarities.shape == (8, 2)
    assert list(result.stability.index) == list(model.signature_names)
    # matched cosines are valid similarities and reasonably high for a
    # well-separated 2-signature toy problem
    values = result.similarities.to_numpy()
    assert np.all(values <= 1.0 + 1e-9)
    assert np.all(values >= -1.0 - 1e-9)
    assert result.stability.mean() > 0.7
    assert np.all(np.isfinite(result.losses))


def test_bootstrap_requires_fitted(reference_data_path):
    from salamander_tpu.models import KLNMF
    from salamander_tpu.parallel import bootstrap_stability

    with pytest.raises(ValueError):
        bootstrap_stability(KLNMF(n_signatures=2), n_bootstraps=2)
