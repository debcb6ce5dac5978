"""Parity of the KLNMF kernels against the reference goldens, plus the
algebraic invariants the reference pins (constant weights scale the KL
linearly, leave updates unchanged; given signatures frozen exactly)."""

import numpy as np
import pandas as pd
import pytest

from salamander_tpu.ops import klnmf


@pytest.fixture(scope="module")
def data_dir(reference_data_path):
    return reference_data_path / "models" / "utils_klnmf"


@pytest.fixture(scope="module")
def counts(data_dir):
    return pd.read_csv(data_dir / "counts.csv", index_col=0).values.astype(float)


@pytest.fixture(params=[1, 2])
def nsigs(request):
    return request.param


@pytest.fixture
def matrices(data_dir, counts, nsigs):
    W = np.load(data_dir / f"W_nsigs{nsigs}.npy")
    H = np.load(data_dir / f"H_nsigs{nsigs}.npy")
    return counts, W, H


@pytest.fixture
def weights_kl(counts):
    return 2.0 * np.ones(counts.shape[1])


def golden(data_dir, name, nsigs):
    return np.load(data_dir / f"{name}_nsigs{nsigs}.npy")


def test_kl_divergence(data_dir, matrices, nsigs):
    expected = golden(data_dir, "kl_divergence", nsigs)
    assert np.allclose(klnmf.kl_divergence(*matrices), expected)


def test_kl_divergence_weights_scale_linearly(data_dir, matrices, nsigs, weights_kl):
    expected = golden(data_dir, "kl_divergence", nsigs)
    assert np.allclose(klnmf.kl_divergence(*matrices, weights_kl), 2 * expected)


def test_samplewise_kl_divergence(data_dir, matrices, nsigs):
    expected = golden(data_dir, "samplewise_kl_divergence", nsigs)
    assert np.allclose(klnmf.samplewise_kl_divergence(*matrices), expected)


def test_samplewise_kl_divergence_weights(data_dir, matrices, nsigs, weights_kl):
    expected = golden(data_dir, "samplewise_kl_divergence", nsigs)
    weights_kl[0] = 3.0
    result = np.asarray(klnmf.samplewise_kl_divergence(*matrices, weights_kl))
    assert np.allclose(result[0], 3 * expected[0])
    assert np.allclose(result[1:], 2 * expected[1:])


def test_poisson_llh(data_dir, matrices, nsigs):
    expected = golden(data_dir, "poisson_llh", nsigs)
    assert np.allclose(klnmf.poisson_llh(*matrices), expected)


def test_update_W(data_dir, matrices, nsigs):
    expected = golden(data_dir, "W_updated_standard", nsigs)
    assert np.allclose(klnmf.update_W(*matrices), expected)


def test_update_W_constant_weights_noop(data_dir, matrices, nsigs, weights_kl):
    expected = golden(data_dir, "W_updated_standard", nsigs)
    assert np.allclose(klnmf.update_W(*matrices, weights_kl), expected)


def test_update_W_given_signatures_frozen(matrices):
    X, W, H = matrices
    n_signatures = W.shape[1]
    for n_given in range(1, n_signatures + 1):
        W_new = np.asarray(klnmf.update_W(X, W, H, n_given_signatures=n_given))
        assert np.array_equal(W_new[:, :n_given], W[:, :n_given])


def test_update_H(data_dir, matrices, nsigs):
    expected = golden(data_dir, "H_updated_standard", nsigs)
    assert np.allclose(klnmf.update_H(*matrices), expected)


def test_update_H_zero_lhalf_reduces_to_plain(data_dir, matrices, nsigs, weights_kl):
    expected = golden(data_dir, "H_updated_standard", nsigs)
    zero_lhalf = np.zeros(matrices[0].shape[1])
    result = klnmf.update_H(*matrices, weights_kl, zero_lhalf)
    assert np.allclose(result, expected)


def test_update_WH(data_dir, matrices, nsigs):
    W_expected = golden(data_dir, "W_updated_joint", nsigs)
    H_expected = golden(data_dir, "H_updated_joint", nsigs)
    W_new, H_new = klnmf.update_WH(*matrices)
    assert np.allclose(W_new, W_expected)
    assert np.allclose(H_new, H_expected)


def test_update_WH_constant_weights_noop(data_dir, matrices, nsigs, weights_kl):
    W_expected = golden(data_dir, "W_updated_joint", nsigs)
    H_expected = golden(data_dir, "H_updated_joint", nsigs)
    W_new, H_new = klnmf.update_WH(*matrices, weights_kl)
    assert np.allclose(W_new, W_expected)
    assert np.allclose(H_new, H_expected)


def test_update_WH_zero_lhalf_reduces_to_plain(data_dir, matrices, nsigs, weights_kl):
    W_expected = golden(data_dir, "W_updated_joint", nsigs)
    H_expected = golden(data_dir, "H_updated_joint", nsigs)
    zero_lhalf = np.zeros(matrices[0].shape[1])
    W_new, H_new = klnmf.update_WH(*matrices, weights_kl, zero_lhalf)
    assert np.allclose(W_new, W_expected)
    assert np.allclose(H_new, H_expected)


def test_update_WH_given_signatures_frozen(matrices):
    X, W, H = matrices
    n_signatures = W.shape[1]
    for n_given in range(1, n_signatures + 1):
        W_new, _ = klnmf.update_WH(X, W, H, n_given_signatures=n_given)
        assert np.array_equal(np.asarray(W_new)[:, :n_given], W[:, :n_given])


def test_update_WH_monotone_objective(matrices):
    """The multiplicative updates never increase the KL objective."""
    X, W, H = matrices
    of = float(klnmf.kl_divergence(X, W, H))
    for _ in range(25):
        W, H = klnmf.update_WH(X, W, H)
        of_new = float(klnmf.kl_divergence(X, W, H))
        assert of_new <= of + 1e-9 * abs(of)
        of = of_new


def test_normalize_wh_preserves_product(matrices):
    _, W, H = matrices
    W_n, H_n = klnmf.normalize_wh(2.0 * W, H)
    assert np.allclose(np.asarray(W_n).sum(axis=0), 1.0)
    assert np.allclose(np.asarray(W_n) @ np.asarray(H_n), 2.0 * W @ H)


def test_update_WH_weights_and_given_signatures_combined(matrices):
    """Weights and frozen signatures compose: given columns exact, free
    columns follow the weighted update."""
    X, W, H = matrices
    n_signatures = W.shape[1]
    if n_signatures < 2:
        return
    weights = np.linspace(0.5, 2.0, X.shape[1])
    W_new, H_new = klnmf.update_WH(X, W, H, weights_kl=weights,
                                   n_given_signatures=1)
    W_new = np.asarray(W_new)
    assert np.array_equal(np.maximum(W[:, :1], klnmf.EPSILON), W_new[:, :1])
    # free column changed and stays normalized
    assert not np.allclose(W_new[:, 1], W[:, 1])
    np.testing.assert_allclose(W_new[:, 1].sum(), 1.0, rtol=1e-8)
    assert np.all(np.asarray(H_new) >= klnmf.EPSILON)


def test_kernels_on_random_shapes():
    """Shape robustness: odd V/K/D combinations keep all invariants."""
    rng = np.random.default_rng(7)
    for V, K, D in [(3, 1, 2), (17, 7, 5), (5, 5, 33)]:
        X = np.clip(rng.poisson(8.0, (V, D)).astype(float), klnmf.EPSILON, None)
        W = rng.dirichlet(np.ones(V), K).T
        H = rng.uniform(0.5, 2.0, (K, D))
        of0 = float(klnmf.kl_divergence(X, W, H))
        for _ in range(5):
            W, H = klnmf.update_WH(X, W, H)
            of1 = float(klnmf.kl_divergence(X, W, H))
            assert of1 <= of0 + 1e-9 * abs(of0)
            of0 = of1
        np.testing.assert_allclose(np.asarray(W).sum(0), 1.0, rtol=1e-8)
