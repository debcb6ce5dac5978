"""K-padded rank scans: masked lanes must behave exactly like unpadded fits.

The masked step functions (ops/klnmf.py make_masked_step_functions) let many
ranks share one compiled program; these tests pin that padding is inert -
a rank-k lane inside a K-padded program produces the same updates, losses
and convergence behavior as the plain rank-k program.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from salamander_tpu.engine import FitConfig
from salamander_tpu.ops import klnmf as ops
from salamander_tpu.parallel.restarts import rank_scan_klnmf


def problem(V=12, D=20, k=3, seed=0):
    rng = np.random.default_rng(seed)
    Wt = rng.dirichlet(np.ones(V), size=k).T
    Ht = rng.gamma(2.0, 50.0, size=(k, D))
    X = np.clip(rng.poisson(Wt @ Ht), np.finfo(np.float32).eps, None)
    W0 = rng.dirichlet(np.ones(V), size=k).T
    H0 = rng.uniform(0.5, 2.0, size=(k, D)) * X.sum(0) / k
    return jnp.asarray(X), jnp.asarray(W0), jnp.asarray(H0)


def test_pad_rank_shapes_and_mask():
    _, W, H = problem()
    W_pad, H_pad, mask = ops.pad_rank(W, H, 8)
    assert W_pad.shape == (12, 8) and H_pad.shape == (8, 20)
    assert mask.tolist() == [True] * 3 + [False] * 5
    np.testing.assert_array_equal(np.asarray(H_pad[3:]), 0.0)
    with pytest.raises(ValueError):
        ops.pad_rank(W, H, 2)


@pytest.mark.parametrize("weighted", [False, True])
def test_masked_update_equals_unpadded(weighted):
    X, W, H = problem()
    data = {"X": X}
    if weighted:
        data["weights_kl"] = jnp.linspace(0.5, 2.0, X.shape[1])
        data["weights_lhalf"] = jnp.linspace(0.0, 1.0, X.shape[1])
    plain_update, plain_objective = ops.make_step_functions()
    masked_update, masked_objective = ops.make_masked_step_functions()

    W_pad, H_pad, mask = ops.pad_rank(W, H, 8)
    plain = {"W": W, "H": H}
    masked = {"W": W_pad, "H": H_pad, "mask": mask}
    for _ in range(5):
        plain = plain_update(plain, data)
        masked = masked_update(masked, data)
        np.testing.assert_allclose(
            np.asarray(masked["W"][:, :3]), np.asarray(plain["W"]), rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(masked["H"][:3]), np.asarray(plain["H"]), rtol=1e-12
        )
        np.testing.assert_array_equal(np.asarray(masked["H"][3:]), 0.0)
        np.testing.assert_allclose(
            float(masked_objective(masked, data)),
            float(plain_objective(plain, data)),
            rtol=1e-12,
        )


def test_masked_update_respects_given_signatures():
    X, W, H = problem()
    data = {"X": X}
    update_fn, _ = ops.make_masked_step_functions(n_given_signatures=2)
    W_pad, H_pad, mask = ops.pad_rank(W, H, 8)
    out = update_fn({"W": W_pad, "H": H_pad, "mask": mask}, data)
    np.testing.assert_array_equal(np.asarray(out["W"][:, :2]),
                                  np.asarray(W[:, :2]))
    assert not np.array_equal(np.asarray(out["W"][:, 2]), np.asarray(W[:, 2]))


def test_padded_rank_scan_matches_unpadded():
    rng = np.random.default_rng(3)
    X = np.clip(
        rng.poisson(30.0, size=(16, 24)).astype(np.float64),
        np.finfo(np.float32).eps, None,
    )
    config = FitConfig(min_iterations=20, max_iterations=200,
                       conv_test_freq=10, tol=1e-6)
    ranks = range(2, 6)
    padded = rank_scan_klnmf(X, ranks, n_restarts=4, seed=11, config=config,
                             dtype=jnp.float64, pad_ranks=True, rank_bucket=4)
    plain = rank_scan_klnmf(X, ranks, n_restarts=4, seed=11, config=config,
                            dtype=jnp.float64, pad_ranks=False)
    assert sorted(padded) == sorted(plain) == list(ranks)
    for k in ranks:
        np.testing.assert_allclose(padded[k].losses, plain[k].losses,
                                   rtol=1e-9)
        np.testing.assert_array_equal(padded[k].n_iterations,
                                      plain[k].n_iterations)
        assert padded[k].best_index == plain[k].best_index
        np.testing.assert_allclose(np.asarray(padded[k].W),
                                   np.asarray(plain[k].W), rtol=1e-9)
        assert np.asarray(padded[k].W).shape == (4, 16, k)


def test_padded_rank_scan_under_mesh():
    import jax

    from salamander_tpu.parallel import make_mesh

    rng = np.random.default_rng(4)
    X = np.clip(
        rng.poisson(30.0, size=(8, 16)).astype(np.float32),
        np.finfo(np.float32).eps, None,
    )
    mesh = make_mesh(jax.devices("cpu")[:4], sample_ways=2)
    config = FitConfig(min_iterations=10, max_iterations=50,
                       conv_test_freq=10, tol=0.0)
    results = rank_scan_klnmf(X, [2, 3], n_restarts=4, seed=0, config=config,
                              mesh=mesh, pad_ranks=True, rank_bucket=4)
    for k in (2, 3):
        assert np.all(np.isfinite(results[k].losses))
        assert np.asarray(results[k].W).shape == (4, 8, k)
