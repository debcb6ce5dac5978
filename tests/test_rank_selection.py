"""Stability-based rank selection (tools.signature_stability /
rank_selection_table / suggest_rank).

Beyond-reference subsystem: the reference leaves choosing n_signatures to
the user (its tutorial loops fits over ranks and eyeballs losses). The
invariants pinned here: matched-cosine stability is permutation- and
scale-invariant, identical restarts are perfectly stable, and on planted
synthetic data the contiguous-stable-prefix rule recovers the true rank
while raw best-loss alone would not (it keeps improving past the truth).
"""

import numpy as np
import pytest

from salamander_tpu import tl
from salamander_tpu.engine import FitConfig
from salamander_tpu.parallel import rank_scan_klnmf


def _random_signatures(rng, V, k):
    W = rng.dirichlet(np.ones(V) * 0.3, size=k).T
    return W / W.sum(axis=0)


def test_stability_permutation_and_scale_invariant():
    rng = np.random.default_rng(1)
    V, k, R = 12, 4, 6
    W = _random_signatures(rng, V, k)
    stack = []
    for r in range(R):
        perm = rng.permutation(k)
        scales = rng.uniform(0.5, 2.0, size=k)
        stack.append(W[:, perm] * scales)
    per_sig, matched = tl.signature_stability(np.stack(stack))
    np.testing.assert_allclose(per_sig, 1.0, atol=1e-12)
    np.testing.assert_allclose(matched, 1.0, atol=1e-12)


def test_stability_detects_noise_component():
    rng = np.random.default_rng(2)
    V, k, R = 24, 3, 8
    W = _random_signatures(rng, V, k)
    stack = []
    for r in range(R):
        noisy = W.copy()
        # the last column is restart-specific noise; the others reproduce
        noisy[:, -1] = rng.dirichlet(np.ones(V))
        stack.append(noisy)
    per_sig, _ = tl.signature_stability(np.stack(stack))
    assert np.all(per_sig[:-1] > 0.999)
    assert per_sig[-1] < 0.9


def test_stability_single_restart_is_nan():
    rng = np.random.default_rng(3)
    per_sig, matched = tl.signature_stability(
        _random_signatures(rng, 10, 2)[None]
    )
    assert np.isnan(per_sig).all()
    np.testing.assert_array_equal(matched, 1.0)


def test_stability_rejects_2d():
    with pytest.raises(ValueError, match="n_restarts"):
        tl.signature_stability(np.ones((4, 3)))


@pytest.fixture(scope="module")
def planted_scan():
    rng = np.random.default_rng(0)
    V, D, k_true = 24, 150, 3
    W = rng.dirichlet(np.ones(V) * 0.3, size=k_true).T
    H = rng.gamma(2.0, 120.0, size=(k_true, D))
    X = rng.poisson(W @ H).astype(np.float64) + 1e-9
    cfg = FitConfig(min_iterations=100, max_iterations=2000,
                    conv_test_freq=10, tol=1e-6)
    return rank_scan_klnmf(X, range(2, 6), 8, seed=0, config=cfg,
                           )


def test_rank_selection_table_shape_and_loss(planted_scan):
    table = tl.rank_selection_table(planted_scan)
    assert list(table.index) == [2, 3, 4, 5]
    # more parameters always fit better: best_loss strictly decreases,
    # which is exactly why loss alone cannot pick the rank
    assert np.all(np.diff(table["best_loss"].to_numpy()) < 0)
    assert np.isnan(table["loss_improvement"].iloc[0])
    assert table["loss_improvement"].iloc[1] > table["loss_improvement"].iloc[2]
    # the planted rank is the stability optimum
    assert table["min_stability"].idxmax() == 3


def test_suggest_rank_recovers_planted_truth(planted_scan):
    assert tl.suggest_rank(planted_scan) == 3


def test_suggest_rank_raises_when_first_rank_unstable(planted_scan):
    with pytest.raises(ValueError, match="smallest scanned rank"):
        tl.suggest_rank(planted_scan, min_stability=0.9999)


def test_rank_selection_corrnmf_scan():
    """CorrScanResult flavor: the scan exposes every restart's signature
    matrix, rank_selection_table handles ELBO maximization (positive
    loss_improvement still means 'fits better'), and suggest_rank works
    on scalar-keyed CorrNMF scans."""
    from salamander_tpu.parallel import rank_scan_corrnmf

    rng = np.random.default_rng(5)
    V, D, k_true = 16, 60, 2
    W = rng.dirichlet(np.ones(V) * 0.3, size=k_true).T
    H = rng.gamma(2.0, 60.0, size=(k_true, D))
    X = rng.poisson(W @ H).astype(np.float64).T + 1e-9  # (D, V) samples-rows

    cfg = FitConfig(min_iterations=30, max_iterations=200,
                    conv_test_freq=10, tol=1e-5)
    res = rank_scan_corrnmf(X, range(2, 4), dim_embeddings=2, n_restarts=4,
                            base_seed=0, config=cfg, build_models=False)

    for k, point in res.items():
        assert point.signatures.shape == (4, V, k)  # same orientation as W
    table = tl.rank_selection_table(res)
    assert list(table.index) == [2, 3]
    # ELBO is maximized: best_loss must increase with rank, and the
    # improvement column must still read positive
    assert table["best_loss"].iloc[1] > table["best_loss"].iloc[0]
    assert table["loss_improvement"].iloc[1] > 0
    assert ((table["min_stability"] >= -1)
            & (table["min_stability"] <= 1 + 1e-12)).all()
    assert tl.suggest_rank(res, min_stability=0.0) in (2, 3)

    # (k, m) grid keys: the rule runs per m and returns {m: suggested_k}
    grid = {(2, 2): res[2], (3, 2): res[3], (2, 3): res[2]}
    per_m = tl.suggest_rank(grid, min_stability=0.0)
    assert set(per_m) == {2, 3}
    assert per_m[2] in (2, 3) and per_m[3] == 2

    with pytest.raises(ValueError, match="takes"):
        tl.suggest_rank({"not-a-key": res[2]})


def test_plot_rank_selection_smoke(planted_scan):
    import matplotlib

    matplotlib.use("Agg")
    from salamander_tpu import pl

    table = tl.rank_selection_table(planted_scan)
    ax = pl.rank_selection(table)
    assert ax.get_xlabel() == "n_signatures"
    # twin axis carries the stability curves
    assert len(ax.figure.axes) == 2
    import matplotlib.pyplot as plt

    plt.close(ax.figure)


def test_grid_table_multiindex_and_per_m_improvement(planted_scan):
    """(k, m) grid tables use a (n_signatures, dim_embeddings) MultiIndex
    and chain loss_improvement within each m only - cross-m ELBO deltas
    are differently regularized and must never appear as 'improvement'."""
    grid = {(2, 2): planted_scan[2], (3, 2): planted_scan[3],
            (2, 3): planted_scan[2], (3, 3): planted_scan[3]}
    table = tl.rank_selection_table(grid)
    assert list(table.index.names) == ["n_signatures", "dim_embeddings"]
    for m in (2, 3):
        part = table.xs(m, level="dim_embeddings")
        assert np.isnan(part["loss_improvement"].iloc[0])  # first k of each m
        assert part["loss_improvement"].iloc[1] > 0

    from salamander_tpu import pl

    with pytest.raises(ValueError, match="one embedding dimension"):
        pl.rank_selection(table)


def test_table_zero_previous_loss_is_nan():
    """A rank whose predecessor reached best_loss == 0 (exact
    reconstruction) reports NaN improvement instead of crashing."""
    from salamander_tpu.parallel.restarts import RestartResult

    rng = np.random.default_rng(9)

    def point(k, losses):
        W = np.stack([rng.dirichlet(np.ones(10), size=k).T for _ in range(3)])
        return RestartResult(W=W, H=None, losses=np.asarray(losses),
                             n_iterations=np.ones(3, int), best_index=0)

    table = tl.rank_selection_table(
        {2: point(2, [0.0, 1.0, 2.0]), 3: point(3, [5.0, 6.0, 7.0])}
    )
    assert table["best_loss"].iloc[0] == 0.0
    assert np.isnan(table["loss_improvement"].iloc[1])


def test_suggest_rank_single_restart_diagnosis():
    from salamander_tpu.parallel.restarts import RestartResult

    rng = np.random.default_rng(11)
    W = rng.dirichlet(np.ones(10), size=2).T[None]  # one restart
    res = RestartResult(W=W, H=None, losses=np.asarray([1.0]),
                        n_iterations=np.ones(1, int), best_index=0)
    with pytest.raises(ValueError, match="n_restarts >= 2"):
        tl.suggest_rank({2: res})


def test_multistart_summary_signature_stack():
    """fit_best_of exposes every restart's signatures as (R, V, K) for all
    families ({mod: stack} for multimodal), feeding signature_stability
    without a rank scan."""
    from salamander_tpu.containers import AnnData, MuData
    from salamander_tpu.models import CorrNMFDet, KLNMF, MultimodalCorrNMF
    from salamander_tpu.parallel import fit_best_of

    rng = np.random.default_rng(4)
    V, D, k = 12, 40, 3
    W = rng.dirichlet(np.ones(V) * 0.4, size=k).T
    H = rng.gamma(2.0, 50.0, size=(k, D))
    X = rng.poisson(W @ H).astype(np.float64).T + 1e-9  # samples as rows

    klnmf = KLNMF(n_signatures=k, init_method="random", min_iterations=10,
                  max_iterations=100, conv_test_freq=10, tol=1e-5)
    summary = fit_best_of(klnmf, AnnData(X.copy()), 4, base_seed=0)
    assert summary.signatures.shape == (4, V, k)
    per_sig, _ = tl.signature_stability(summary.signatures,
                                        summary.best_index)
    assert per_sig.shape == (k,)
    assert np.all((per_sig >= -1) & (per_sig <= 1 + 1e-12))
    # the best lane's stack column matches the fitted model's signatures
    np.testing.assert_allclose(
        summary.signatures[summary.best_index].T,
        klnmf.signatures.values, rtol=1e-6)

    corr = CorrNMFDet(n_signatures=2, dim_embeddings=2, init_method="random",
                      min_iterations=10, max_iterations=60,
                      conv_test_freq=10, tol=1e-5)
    summary = fit_best_of(corr, AnnData(X.copy()), 3, base_seed=0)
    assert summary.signatures.shape == (3, V, 2)

    mm = MultimodalCorrNMF(ns_signatures=[2, 2], dim_embeddings=2,
                           init_method="random", min_iterations=10,
                           max_iterations=60, conv_test_freq=10, tol=1e-5)
    mdata = MuData({"a": AnnData(X.copy()), "b": AnnData(X.copy())})
    summary = fit_best_of(mm, mdata, 3, base_seed=0)
    assert set(summary.signatures) == {"a", "b"}
    assert summary.signatures["a"].shape == (3, V, 2)
