"""Parity of the minimum-volume NMF kernels (objective, W update incl. line
search, H update) against the reference goldens; lam = delta = 1, gamma = 1."""

import numpy as np
import pandas as pd
import pytest

from salamander_tpu.ops import klnmf, mvnmf

LAM = 1.0
DELTA = 1.0


@pytest.fixture(scope="module")
def data_dir(reference_data_path):
    return reference_data_path / "models" / "mvnmf"


@pytest.fixture(scope="module")
def counts(data_dir):
    return pd.read_csv(data_dir / "counts.csv", index_col=0).values.astype(float)


@pytest.fixture(params=[1, 2])
def nsigs(request):
    return request.param


@pytest.fixture
def matrices(data_dir, counts, nsigs):
    W = np.load(data_dir / f"W_init_nsigs{nsigs}.npy")
    H = np.load(data_dir / f"H_init_nsigs{nsigs}.npy")
    return counts, W, H


def test_objective(data_dir, matrices, nsigs):
    expected = np.load(data_dir / f"objective_init_nsigs{nsigs}.npy")
    result = mvnmf.kl_divergence_penalized(*matrices, LAM, DELTA)
    assert np.allclose(result, expected)


def test_update_H(data_dir, matrices, nsigs):
    expected = np.load(data_dir / f"H_updated_nsigs{nsigs}.npy")
    X, W, H = matrices
    assert np.allclose(klnmf.update_H(X, W, H), expected)


def test_update_W_with_line_search(data_dir, matrices, nsigs):
    expected = np.load(data_dir / f"W_updated_nsigs{nsigs}.npy")
    X, W, H = matrices
    W_unconstrained = mvnmf.update_W_unconstrained(X, W, H, LAM, DELTA)
    W_new, _, gamma = mvnmf.line_search(X, W, H, LAM, DELTA, 1.0, W_unconstrained)
    assert np.allclose(W_new, expected)
    assert 0.0 < float(gamma) <= 1.0


def test_update_W_given_signatures_frozen(matrices):
    X, W, H = matrices
    for n_given in range(1, W.shape[1] + 1):
        W_unc = np.asarray(
            mvnmf.update_W_unconstrained(X, W, H, LAM, DELTA, n_given)
        )
        assert np.array_equal(W_unc[:, :n_given], W[:, :n_given])


def test_line_search_never_increases_objective(matrices):
    X, W, H = matrices
    of_before = float(mvnmf.kl_divergence_penalized(X, W, H, LAM, DELTA))
    W_unc = mvnmf.update_W_unconstrained(X, W, H, LAM, DELTA)
    W_new, H_new, _ = mvnmf.line_search(X, W, H, LAM, DELTA, 1.0, W_unc)
    of_after = float(mvnmf.kl_divergence_penalized(X, W_new, H_new, LAM, DELTA))
    assert of_after <= of_before + 1e-9 * abs(of_before)


@pytest.mark.parametrize("trial_batch", [2, 3, 8])
def test_line_search_batched_equals_serial(matrices, trial_batch):
    """trial_batch > 1 evaluates shrink candidates as one vmapped pass and
    reproduces the serial backtracking BITWISE away from accept-boundary
    ties: the same gamma chain (iterated-multiply scan) and the same
    accepted (W, H) — including under deep backtracking (adversarial
    W_unconstrained) and at the gamma floor. (Exactly AT a tie — a trial
    objective within an ulp of the previous one — the batched evaluation's
    fusion ulps may flip the accept by a shrink step; that case is covered
    by the semantic assertions in
    test_line_search_batched_near_tie_still_valid.)"""
    X, W, H = matrices
    rng = np.random.default_rng(5)
    # a run-in so the state is typical, then an adversarial far-away
    # "unconstrained" step that forces many shrink trials
    gamma = 1.0
    for _ in range(20):
        H = klnmf.update_H(X, W, H)
        W_unc = mvnmf.update_W_unconstrained(X, W, H, LAM, DELTA)
        W, H, gamma = mvnmf.line_search(X, W, H, LAM, DELTA, gamma, W_unc)
    W_bad = rng.dirichlet(np.ones(X.shape[0]) * 0.05, size=W.shape[1]).T
    for g0 in (1.0, 0.3, 1e-17):
        serial = mvnmf.line_search(X, W, H, LAM, DELTA, g0, W_bad)
        batched = mvnmf.line_search(
            X, W, H, LAM, DELTA, g0, W_bad, trial_batch=trial_batch
        )
        for s, b in zip(serial, batched):
            assert np.array_equal(np.asarray(s), np.asarray(b))


@pytest.mark.parametrize("trial_batch", [3, 8])
def test_line_search_batched_near_tie_still_valid(matrices, trial_batch):
    """At a converged state the genuine unconstrained step's trials tie the
    previous objective to ulps, so batched evaluation may accept a later
    shrink trial than the serial loop. The result must still be a VALID
    backtracking outcome: gamma on the serial shrink chain (an exact power
    of 0.8 off), the objective not increased, and (W, H) close."""
    X, W, H = matrices
    gamma = 1.0
    for _ in range(20):
        H = klnmf.update_H(X, W, H)
        W_unc = mvnmf.update_W_unconstrained(X, W, H, LAM, DELTA)
        W, H, gamma = mvnmf.line_search(X, W, H, LAM, DELTA, gamma, W_unc)
    prev = float(mvnmf.kl_divergence_penalized(X, W, H, LAM, DELTA))
    serial = mvnmf.line_search(X, W, H, LAM, DELTA, float(gamma), W_unc)
    batched = mvnmf.line_search(
        X, W, H, LAM, DELTA, float(gamma), W_unc, trial_batch=trial_batch
    )
    ratio = float(batched[2]) / float(serial[2])
    k = np.log(ratio) / np.log(0.8) if ratio != 1.0 else 0.0
    assert abs(k - round(k)) < 1e-6  # gamma stays on the 0.8 shrink chain
    of_b = float(
        mvnmf.kl_divergence_penalized(X, batched[0], batched[1], LAM, DELTA)
    )
    assert of_b <= prev + 1e-9 * abs(prev)
    np.testing.assert_allclose(
        np.asarray(batched[0]), np.asarray(serial[0]), rtol=1e-4, atol=1e-12
    )


def test_full_iterations_monotone(matrices):
    """H update then W line-search step, repeated: objective decreasing."""
    X, W, H = matrices
    gamma = 1.0
    of = float(mvnmf.kl_divergence_penalized(X, W, H, LAM, DELTA))
    for _ in range(10):
        H = klnmf.update_H(X, W, H)
        W_unc = mvnmf.update_W_unconstrained(X, W, H, LAM, DELTA)
        W, H, gamma = mvnmf.line_search(X, W, H, LAM, DELTA, gamma, W_unc)
        of_new = float(mvnmf.kl_divergence_penalized(X, W, H, LAM, DELTA))
        assert of_new <= of + 1e-6 * abs(of)
        of = of_new
