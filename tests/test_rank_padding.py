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


# --------------------------------------------------------------------- #
# CorrNMF K-padding
# --------------------------------------------------------------------- #


def test_masked_corrnmf_cycles_equal_unpadded():
    """A rank-k CorrNMF lane padded to Kp runs the rank-k EM cycles up to
    dot-product rounding: padded exposures are exact zeros
    (NEG_PAD_SCALING underflow), but XLA picks different fma/reduction
    kernels for different contraction widths, so trajectories agree to
    ~1e-9 over short horizons (the branchy Newton amplifies ulps over long
    ones - convergence-level equivalence is pinned separately below)."""
    import jax

    from salamander_tpu.containers import AnnData
    from salamander_tpu.models import CorrNMFDet
    from salamander_tpu.ops import corrnmf

    rng = np.random.default_rng(3)
    V, D, k = 18, 30, 2
    S = rng.dirichlet(np.ones(V), size=k)
    E = rng.gamma(2.0, 40.0, size=(D, k))
    X = np.clip(rng.poisson(E @ S).astype(float), 1.0, None)

    model = CorrNMFDet(n_signatures=k, dim_embeddings=2)
    model._setup_adata(AnnData(X.copy()))
    model._initialize(init_kwargs={"seed": 4})
    model._setup_fitting_parameters()
    params, data = model._device_state()

    plain_update, plain_obj = model._build_step()
    masked_update, masked_obj = corrnmf.make_masked_corrnmf_step()
    padded = corrnmf.pad_rank_corrnmf(params, 6)
    assert padded["signatures"].shape == (6, V)
    assert bool(np.all(np.asarray(padded["mask"])[:k]))
    assert not np.any(np.asarray(padded["mask"])[k:])

    p_plain, p_masked = params, padded
    plain_update = jax.jit(plain_update)
    masked_update = jax.jit(masked_update)
    for cycle in range(2):
        p_plain = plain_update(p_plain, data)
        p_masked = masked_update(p_masked, data)
        np.testing.assert_allclose(
            float(masked_obj(p_masked, data)),
            float(plain_obj(p_plain, data)),
            rtol=1e-9, err_msg=f"ELBO cycle {cycle}",
        )
    for name in ("signatures", "signature_scalings", "signature_embeddings",
                 "exposures"):
        active = np.asarray(p_masked[name])
        active = active[:k] if name != "exposures" else active[:, :k]
        np.testing.assert_allclose(
            active, np.asarray(p_plain[name]), rtol=1e-8, atol=1e-10,
            err_msg=name,
        )
    for name in ("sample_scalings", "sample_embeddings", "variance"):
        np.testing.assert_allclose(
            np.asarray(p_masked[name]), np.asarray(p_plain[name]),
            rtol=1e-8, atol=1e-10, err_msg=name,
        )
    # padded lanes stayed inert
    np.testing.assert_array_equal(
        np.asarray(p_masked["signature_embeddings"])[k:], 0.0
    )
    assert np.all(np.asarray(p_masked["exposures"])[:, k:] == 0.0)

    # convergence-level equivalence: run both programs to (near) fixed
    # point - final ELBOs agree far inside model-selection resolution
    def run_many(update, obj, p, n=150):
        update_j = jax.jit(
            lambda q: jax.lax.fori_loop(0, n, lambda _, r: update(r, data), q)
        )
        p = update_j(p)
        return float(obj(p, data)), p

    elbo_plain, _ = run_many(plain_update, plain_obj, p_plain)
    elbo_masked, p_final = run_many(masked_update, masked_obj, p_masked)
    np.testing.assert_allclose(elbo_masked, elbo_plain, rtol=1e-8)
    assert np.all(np.asarray(p_final["exposures"])[:, k:] == 0.0)


def test_rank_scan_corrnmf_padded_matches_unpadded():
    """The K-padded CorrNMF rank scan gives the same per-rank losses and
    best parameters as the one-program-per-rank path (same seeds)."""
    from salamander_tpu.engine import FitConfig
    from salamander_tpu.parallel import rank_scan_corrnmf

    rng = np.random.default_rng(0)
    V, D = 16, 24
    S = rng.dirichlet(np.ones(V), size=3)
    E = rng.gamma(2.0, 40.0, size=(D, 3))
    X = np.clip(rng.poisson(E @ S).astype(float), 1.0, None)

    config = FitConfig(min_iterations=20, max_iterations=40,
                       conv_test_freq=10, tol=0.0)
    padded = rank_scan_corrnmf(
        X, range(2, 5), dim_embeddings=2, n_restarts=2, base_seed=0,
        config=config, pad_ranks=True, rank_bucket=4,
    )
    plain = rank_scan_corrnmf(
        X, range(2, 5), dim_embeddings=2, n_restarts=2, base_seed=0,
        config=config, pad_ranks=False,
    )
    assert set(padded) == {2, 3, 4}
    for k in padded:
        np.testing.assert_allclose(
            padded[k].losses, plain[k].losses, rtol=1e-6,
            err_msg=f"k={k} losses",
        )
        assert padded[k].best_index == plain[k].best_index
        bp, pp = padded[k].best_params, plain[k].best_params
        assert bp["signatures"].shape == (k, V)
        assert bp["signature_embeddings"].shape == (k, 2)
        assert bp["exposures"].shape == (D, k)
        np.testing.assert_allclose(
            bp["signatures"], pp["signatures"], rtol=1e-5, atol=1e-8,
            err_msg=f"k={k} signatures",
        )
