"""The fused Pallas MU block (interpreter mode) vs the XLA path, and the
lockstep-batched engine loop vs vmap(fit_loop).

The wider fused-kernel family (batched/weighted/rank-masked/D-tiled) was
retired after losing every measured regime - see the ops/pallas_klnmf.py
docstring for the numbers. What remains is the single-problem block used
by bench.py as the on-hardware Mosaic self-check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salamander_tpu.engine import FitConfig, fit_loop, fit_loop_lockstep
from salamander_tpu.ops import klnmf
from salamander_tpu.ops.pallas_klnmf import fused_mu_block


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    V, K, D = 16, 3, 32
    X = jnp.asarray(np.clip(rng.poisson(30, (V, D)), klnmf.EPSILON, None),
                    jnp.float32)
    W = jnp.asarray(rng.dirichlet(np.ones(V), K).T, jnp.float32)
    H = jnp.asarray(rng.uniform(size=(K, D)).astype(np.float32) * 30)
    return X, W, H


def reference_steps(X, W, H, n):
    for _ in range(n):
        W, H = klnmf.update_WH(X, W, H)
    return W, H


@pytest.mark.parametrize("steps", [1, 7, 10])
def test_fused_block_matches_xla(problem, steps):
    X, W, H = problem
    W_ref, H_ref = reference_steps(X, W, H, steps)
    W_pl, H_pl = fused_mu_block(X, W, H, steps, interpret=True)
    np.testing.assert_allclose(W_pl, W_ref, rtol=1e-5)
    np.testing.assert_allclose(H_pl, H_ref, rtol=1e-5)


def test_fused_block_traced_step_count(problem):
    """n_steps is a traced scalar: the same compiled kernel serves partial
    blocks (the engine's remainder tail)."""
    X, W, H = problem
    fn = jax.jit(
        lambda s: fused_mu_block(X, W, H, s, interpret=True)
    )
    for steps in (2, 5):
        W_ref, H_ref = reference_steps(X, W, H, steps)
        W_pl, H_pl = fn(jnp.asarray(steps, jnp.int32))
        np.testing.assert_allclose(W_pl, W_ref, rtol=1e-5)
        np.testing.assert_allclose(H_pl, H_ref, rtol=1e-5)


def test_lockstep_loop_matches_vmap(problem):
    """fit_loop_lockstep must reproduce vmap(fit_loop) exactly: per-lane
    histories, eval counts, iteration counts and final params."""
    X, _, _ = problem
    rng = np.random.default_rng(2)
    R, V, K, D = 4, X.shape[0], 3, X.shape[1]
    W0 = jnp.asarray(rng.dirichlet(np.ones(V), (R, K)).transpose(0, 2, 1),
                     jnp.float32)
    H0 = jnp.asarray(rng.uniform(size=(R, K, D)).astype(np.float32) * 30)
    params0 = {"W": W0, "H": H0}
    config = FitConfig(min_iterations=10, max_iterations=200,
                       conv_test_freq=10, tol=1e-5)

    def update(p):
        W, H = klnmf.update_WH(X, p["W"], p["H"])
        return {"W": W, "H": H}

    def objective(p):
        return klnmf.kl_divergence(X, p["W"], p["H"])

    vmapped = jax.jit(jax.vmap(
        lambda p: fit_loop(update, objective, p, config)
    ))(params0)

    batched_update = jax.vmap(update)

    def block_update(p, steps):
        return jax.lax.fori_loop(0, steps, lambda _, q: batched_update(q), p)

    lockstep = jax.jit(lambda p: fit_loop_lockstep(
        jax.vmap(objective), p, config, block_update
    ))(params0)

    assert np.array_equal(np.asarray(lockstep.n_iterations),
                          np.asarray(vmapped.n_iterations))
    assert np.array_equal(np.asarray(lockstep.n_evals),
                          np.asarray(vmapped.n_evals))
    np.testing.assert_allclose(np.asarray(lockstep.params["W"]),
                               np.asarray(vmapped.params["W"]), rtol=1e-6)
    lh, vh = np.asarray(lockstep.history), np.asarray(vmapped.history)
    np.testing.assert_allclose(
        np.where(np.isnan(lh), -1.0, lh), np.where(np.isnan(vh), -1.0, vh),
        rtol=1e-6,
    )
