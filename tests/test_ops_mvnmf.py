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
