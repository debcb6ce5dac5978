"""ARDNMF: automatic relevance determination (beyond-reference family).

No reference goldens exist (the reference has no ARD model); correctness is
pinned by the algorithm's own mathematical guarantees instead:
monotone descent of the MAP objective under the sequential MM updates,
closed-form optimality of the lambda update, exact rank recovery on planted
synthetic cohorts, WH-invariance of init rebalancing and pruning, and the
package contracts every family honors (given-signature freezing, engine fit
semantics, io round-trip, multi-start integration).
"""

import numpy as np
import pytest

from salamander_tpu import fit_best_of, io, ops
from salamander_tpu.containers import AnnData
from salamander_tpu.models import ARDNMF
from salamander_tpu.ops import ardnmf
from salamander_tpu.utils import match_signatures_pair

K_TRUE = 3
K_MAX = 8


def planted_adata(seed=0, n_features=30, n_samples=120, mean_count=20.0,
                  poisson=True):
    rng = np.random.default_rng(seed)
    W = rng.dirichlet(np.full(n_features, 0.5), size=K_TRUE).T  # (V, k)
    H = rng.gamma(2.0, 1.0, size=(K_TRUE, n_samples))
    H *= mean_count * n_features / (W @ H).mean()
    X = rng.poisson(W @ H).astype(np.float64) if poisson else W @ H
    adata = AnnData(X.T)
    return adata, W


@pytest.fixture(scope="module", params=["L1", "L2"])
def prior(request):
    return request.param


@pytest.fixture(scope="module")
def fitted(prior):
    # L1 prunes exactly through Poisson noise (the realistic case); L2's
    # softer shrinkage is pinned on a noise-free cohort (see the class
    # docstring's prior guidance - both measured, ROADMAP/ BENCHMARKS)
    poisson = prior == "L1"
    adata, W_true = planted_adata(poisson=poisson)
    model = ARDNMF(
        n_signatures=K_MAX, prior=prior, a=5.0 if prior == "L1" else 3.0,
        min_iterations=200,
    )
    model.fit(adata, init_kwargs={"seed": 1})
    return model, W_true


def test_objective_monotone_decrease(prior):
    adata, _ = planted_adata(seed=3)
    model = ARDNMF(n_signatures=K_MAX, prior=prior)
    model._setup_adata(adata)
    model._initialize(init_kwargs={"seed": 1})
    values = [model.objective_function()]
    for _ in range(60):
        model._update_parameters()
        values.append(model.objective_function())
    values = np.asarray(values)
    assert np.all(np.diff(values) <= np.abs(values[:-1]) * 1e-12)


def test_lambda_update_is_exact_minimizer(prior):
    adata, _ = planted_adata(seed=4)
    model = ARDNMF(n_signatures=K_MAX, prior=prior)
    model._setup_adata(adata)
    model._initialize(init_kwargs={"seed": 2})
    for _ in range(5):
        model._update_parameters()
    params, data = model._device_state()
    lam_star = ardnmf.update_lambda(
        params["W"], params["H"], data["ard_ab"], prior
    )

    def objective(lam):
        return float(ardnmf.ard_objective(
            data["X"], params["W"], params["H"], lam, data["ard_ab"], prior
        ))

    best = objective(lam_star)
    for factor in (0.9, 1.1):
        assert objective(lam_star * factor) > best


def test_objective_decomposition(prior):
    """ard_objective == KL + sum (f+b)/lam + c sum log lam, recomputed in
    plain numpy."""
    adata, _ = planted_adata(seed=5)
    model = ARDNMF(n_signatures=K_MAX, prior=prior, a=7.0)
    model._setup_adata(adata)
    model._initialize(init_kwargs={"seed": 3})
    params, data = model._device_state()
    X = np.asarray(data["X"])
    W, H = np.asarray(params["W"]), np.asarray(params["H"])
    lam = np.asarray(params["lam"])
    a, b = np.asarray(data["ard_ab"])

    kl = float(ops.klnmf.kl_divergence(X, W, H))
    if prior == "L1":
        f = W.sum(axis=0) + H.sum(axis=1)
        c = X.shape[0] + X.shape[1] + a + 1.0
    else:
        f = 0.5 * ((W**2).sum(axis=0) + (H**2).sum(axis=1))
        c = (X.shape[0] + X.shape[1]) / 2.0 + a + 1.0
    expected = kl + np.sum((f + b) / lam) + c * np.sum(np.log(lam))
    assert np.isclose(model.objective_function(), expected, rtol=1e-12)


def test_rank_recovery(fitted):
    model, W_true = fitted
    assert model.n_active_signatures == K_TRUE
    relevance = model.relevance.to_numpy()
    active = np.sort(relevance)[::-1]
    # clear separation: pruned components sit orders of magnitude below
    assert active[K_TRUE - 1] > 100 * active[K_TRUE]


def test_recovered_signatures_match_planted(fitted):
    model, W_true = fitted
    import copy

    model = copy.deepcopy(model)
    model.prune()
    assert model.n_signatures == K_TRUE
    W_hat = model.asignatures.X.T  # (V, k), normalized by prune()
    import pandas as pd

    order = match_signatures_pair(
        pd.DataFrame(W_true.T), pd.DataFrame(W_hat.T)
    )
    W_hat = W_hat[:, order]
    cosines = np.sum(W_hat * W_true, axis=0) / (
        np.linalg.norm(W_hat, axis=0) * np.linalg.norm(W_true, axis=0)
    )
    assert np.all(cosines > 0.95)


def test_prune_is_wh_invariant(fitted):
    model, _ = fitted
    import copy

    model = copy.deepcopy(model)
    before = model.exposures.to_numpy() @ model.asignatures.X
    model.prune(normalize=True)
    after = model.exposures.to_numpy() @ model.asignatures.X
    # discarded components carry only EPSILON-floor mass
    assert np.allclose(before, after, rtol=1e-6, atol=1e-9)
    # normalized convention restored for downstream tooling
    assert np.allclose(model.asignatures.X.sum(axis=1), 1.0)


def test_init_rebalance_is_wh_invariant(prior):
    rng = np.random.default_rng(6)
    W = rng.uniform(0.1, 1.0, size=(30, K_MAX))
    W = W / W.sum(axis=0)
    H = rng.gamma(2.0, 50.0, size=(K_MAX, 40))
    ab = np.array([3.0, 7.0])
    params = ardnmf.init_params(W, H, ab, prior, n_given_signatures=2)
    W_new, H_new = np.asarray(params["W"]), np.asarray(params["H"])
    assert np.allclose(W @ H, W_new @ H_new, rtol=1e-12)
    # given leading columns pass through exactly
    assert np.array_equal(W_new[:, :2], W[:, :2])
    # free components rebalanced to f(w) == f(h)
    if prior == "L1":
        fw, fh = W_new.sum(axis=0), H_new.sum(axis=1)
    else:
        fw, fh = 0.5 * (W_new**2).sum(axis=0), 0.5 * (H_new**2).sum(axis=1)
    assert np.allclose(fw[2:], fh[2:], rtol=1e-10)
    # lambda is the closed form at the rebalanced point
    expected_lam = ardnmf.update_lambda(W_new, H_new, ab, prior)
    assert np.allclose(np.asarray(params["lam"]), np.asarray(expected_lam))


def test_given_signatures_frozen(prior):
    adata, W_true = planted_adata(seed=7)
    given = AnnData(W_true.T[:1])
    given.var_names = adata.var_names
    model = ARDNMF(
        n_signatures=4, prior=prior, min_iterations=3, max_iterations=3,
    )
    model.fit(adata, given_parameters={"asignatures": given})
    assert np.array_equal(model.asignatures.X[0], W_true.T[0])


def test_fitting_kwargs_rejected():
    adata, _ = planted_adata(seed=8)
    model = ARDNMF(n_signatures=4)
    with pytest.raises(ValueError, match="no fitting keyword"):
        model.fit(adata, fitting_kwargs={"weights_kl": 1.0})


def test_hyperparameter_validation():
    with pytest.raises(ValueError, match="prior"):
        ARDNMF(prior="L3")
    with pytest.raises(ValueError, match="positive"):
        ARDNMF(a=-1.0)
    with pytest.raises(ValueError, match="positive"):
        ARDNMF(b=0.0)
    with pytest.raises(ValueError, match="a > 2"):
        ardnmf.default_b("L1", 10.0, 5, a=2.0)
    with pytest.raises(ValueError, match="a > 1"):
        ardnmf.default_b("L2", 10.0, 5, a=1.0)


def test_io_roundtrip(tmp_path, fitted):
    model, _ = fitted
    path = str(tmp_path / "ard.npz")
    io.save_model(model, path)
    loaded = io.load_model(path)
    assert isinstance(loaded, ARDNMF)
    assert loaded.prior == model.prior
    assert loaded.b_resolved_ == model.b_resolved_
    assert np.array_equal(loaded.asignatures.X, model.asignatures.X)
    assert np.array_equal(
        loaded.adata.obsm["exposures"], model.adata.obsm["exposures"]
    )
    assert np.array_equal(
        loaded.lambdas.to_numpy(), model.lambdas.to_numpy()
    )
    assert loaded.n_active_signatures == model.n_active_signatures


def test_transform_freezes_signatures(fitted):
    model, _ = fitted
    adata_new, _ = planted_adata(seed=9, n_samples=17)
    projector = model.transform(adata_new)
    assert np.array_equal(projector.asignatures.X, model.asignatures.X)
    assert projector.adata.obsm["exposures"].shape == (17, K_MAX)


def test_fit_best_of_host_init(prior):
    adata, _ = planted_adata(seed=10)
    model = ARDNMF(
        n_signatures=K_MAX, prior=prior, init_method="random",
        min_iterations=100, max_iterations=600,
    )
    summary = fit_best_of(model, adata, n_restarts=3, batched_init=False)
    assert summary.losses.shape == (3,)
    assert np.all(np.isfinite(summary.losses))
    assert summary.best_index == int(np.argmin(summary.losses))
    assert model._is_fitted
    assert model.n_active_signatures >= 1
    assert summary.signatures.shape == (3, adata.n_vars, K_MAX)


def test_fit_best_of_device_init(prior):
    adata, _ = planted_adata(seed=11)
    model = ARDNMF(
        n_signatures=K_MAX, prior=prior, init_method="random",
        min_iterations=100, max_iterations=600,
    )
    summary = fit_best_of(model, adata, n_restarts=3, batched_init=True)
    assert np.all(np.isfinite(summary.losses))
    assert model._is_fitted


def test_engine_history_contract(fitted):
    model, _ = fitted
    history = model.history
    assert "objective_function" in history
    assert "tol_effective" in history
    assert history["n_iterations"] >= 200
    values = np.asarray(history["objective_function"])
    assert np.all(np.isfinite(values))
    # engine trace is the same objective the host computes
    assert np.isclose(values[-1], model.objective_function(), rtol=1e-9)


def test_plot_relevance(fitted):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    model, _ = fitted
    ax = model.plot_relevance()
    assert ax.get_yscale() == "log"
    # one bar per signature plus the threshold rule
    assert len(ax.patches) == K_MAX
    plt.close("all")

    from salamander_tpu import plot as pl

    ax = pl.relevance(model.relevance)  # plain-Series entry
    assert len(ax.patches) == K_MAX
    plt.close("all")


def test_bootstrap_stability_after_prune(fitted):
    import copy

    from salamander_tpu.engine import FitConfig
    from salamander_tpu.parallel import bootstrap_stability

    model, _ = fitted
    model = copy.deepcopy(model)
    model.prune()
    boot = bootstrap_stability(
        model, n_bootstraps=3, seed=0,
        config=FitConfig(min_iterations=100, max_iterations=600),
    )
    assert boot.similarities.shape == (3, K_TRUE)
    assert np.all(np.isfinite(boot.losses))
    # planted signatures are strongly supported -> near-1 matched cosines
    assert float(boot.stability.min()) > 0.9


def test_warm_start_continues_ardnmf():
    """warm_start=True resumes the ARD fit (objective not worse); an
    unfitted model is rejected with the relevance-state message."""
    from salamander_tpu.models import ARDNMF

    adata, _ = planted_adata()
    model = ARDNMF(n_signatures=K_MAX, prior="L1", a=5.0,
                   min_iterations=20, max_iterations=60)
    model.fit(adata, init_kwargs={"seed": 1})
    of_cold = model.objective_function()
    model.fit(adata, warm_start=True)
    assert model.objective_function() <= of_cold + 1e-9 * abs(of_cold)

    from salamander_tpu.models import ARDNMF

    fresh = ARDNMF(n_signatures=model.n_signatures)
    with pytest.raises(ValueError, match="warm_start"):
        fresh.fit(adata.copy(), warm_start=True)
