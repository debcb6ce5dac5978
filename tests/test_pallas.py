"""Fused Pallas MU kernels in interpreter mode: numerics vs the XLA path,
and the lockstep-batched engine loop vs vmap(fit_loop)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salamander_tpu.engine import FitConfig, fit_loop, fit_loop_lockstep
from salamander_tpu.ops import klnmf
from salamander_tpu.ops.pallas_klnmf import (
    default_chunk,
    fused_mu_block,
    fused_mu_block_batched,
    fused_mu_block_batched_weighted,
    fused_mu_iteration_dtiled,
    make_block_update_auto,
    pick_d_tile,
)


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


def test_fused_batched_matches_xla(problem):
    X, _, _ = problem
    rng = np.random.default_rng(1)
    R, V, K, D = 6, X.shape[0], 3, X.shape[1]
    W = jnp.asarray(rng.dirichlet(np.ones(V), (R, K)).transpose(0, 2, 1),
                    jnp.float32)
    H = jnp.asarray(rng.uniform(size=(R, K, D)).astype(np.float32) * 30)
    W_ref = np.stack([
        np.asarray(reference_steps(X, W[r], H[r], 5)[0]) for r in range(R)
    ])
    W_pl, H_pl = fused_mu_block_batched(X, W, H, 5, chunk=3, interpret=True)
    np.testing.assert_allclose(np.asarray(W_pl), W_ref, rtol=1e-5)
    assert np.asarray(H_pl).shape == (R, K, D)


def test_fused_batched_rejects_bad_chunk(problem):
    X, _, _ = problem
    W = jnp.ones((5, X.shape[0], 2), jnp.float32)
    H = jnp.ones((5, 2, X.shape[1]), jnp.float32)
    with pytest.raises(ValueError):
        fused_mu_block_batched(X, W, H, 1, chunk=3, interpret=True)


def test_default_chunk_divides_and_scales():
    assert 100 % default_chunk(100, 96, 192) == 0
    # big problems fall back to tiny chunks
    assert default_chunk(100, 96, 100_000) == 1
    assert default_chunk(7, 8, 8) == 7


def batched_problem(X, R=4, K=3, seed=1):
    rng = np.random.default_rng(seed)
    V, D = X.shape
    W = jnp.asarray(rng.dirichlet(np.ones(V), (R, K)).transpose(0, 2, 1),
                    jnp.float32)
    H = jnp.asarray(rng.uniform(size=(R, K, D)).astype(np.float32) * 30)
    return W, H


@pytest.mark.parametrize("use_kl,use_lhalf", [
    (True, False), (False, True), (True, True), (False, False),
])
def test_fused_weighted_matches_xla(problem, use_kl, use_lhalf):
    X, _, _ = problem
    rng = np.random.default_rng(3)
    W, H = batched_problem(X)
    weights_kl = (
        jnp.asarray(rng.uniform(0.5, 2.0, X.shape[1]), jnp.float32)
        if use_kl else None
    )
    weights_lhalf = (
        jnp.asarray(rng.uniform(0.0, 1.0, X.shape[1]), jnp.float32)
        if use_lhalf else None
    )
    steps = 4
    W_ref, H_ref = [], []
    for r in range(W.shape[0]):
        Wr, Hr = W[r], H[r]
        for _ in range(steps):
            Wr, Hr = klnmf.update_WH(X, Wr, Hr, weights_kl, weights_lhalf)
        W_ref.append(np.asarray(Wr))
        H_ref.append(np.asarray(Hr))
    W_pl, H_pl = fused_mu_block_batched_weighted(
        X, W, H, steps, weights_kl=weights_kl, weights_lhalf=weights_lhalf,
        chunk=2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(W_pl), np.stack(W_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(H_pl), np.stack(H_ref), rtol=1e-5)


def test_fused_weighted_given_signatures(problem):
    X, _, _ = problem
    W, H = batched_problem(X)
    steps = 3
    W_ref, H_ref = [], []
    for r in range(W.shape[0]):
        Wr, Hr = W[r], H[r]
        for _ in range(steps):
            Wr, Hr = klnmf.update_WH(X, Wr, Hr, n_given_signatures=2)
        W_ref.append(np.asarray(Wr))
        H_ref.append(np.asarray(Hr))
    W_pl, H_pl = fused_mu_block_batched_weighted(
        X, W, H, steps, chunk=2, n_given_signatures=2, interpret=True,
    )
    # the frozen columns pass through exactly; the free ones evolve
    np.testing.assert_array_equal(np.asarray(W_pl[:, :, :2]),
                                  np.asarray(W[:, :, :2]))
    np.testing.assert_allclose(np.asarray(W_pl), np.stack(W_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(H_pl), np.stack(H_ref), rtol=1e-5)


def test_dtiled_iteration_matches_xla(problem):
    X, _, _ = problem
    W, H = batched_problem(X)
    W_ref = np.stack([
        np.asarray(klnmf.update_WH(X, W[r], H[r])[0])
        for r in range(W.shape[0])
    ])
    H_ref = np.stack([
        np.asarray(klnmf.update_WH(X, W[r], H[r])[1])
        for r in range(W.shape[0])
    ])
    W_pl, H_pl = fused_mu_iteration_dtiled(X, W, H, chunk=2, d_tile=8,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(W_pl), W_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(H_pl), H_ref, rtol=1e-5)


def test_dtiled_iteration_with_padding_matches_xla(problem):
    """A d_tile that does not divide D exercises the mask-padded remainder."""
    X, _, _ = problem
    W, H = batched_problem(X)
    W_ref = np.stack([
        np.asarray(klnmf.update_WH(X, W[r], H[r])[0])
        for r in range(W.shape[0])
    ])
    H_ref = np.stack([
        np.asarray(klnmf.update_WH(X, W[r], H[r])[1])
        for r in range(W.shape[0])
    ])
    W_pl, H_pl = fused_mu_iteration_dtiled(X, W, H, chunk=2, d_tile=7,
                                           interpret=True)
    assert np.asarray(H_pl).shape == H.shape
    np.testing.assert_allclose(np.asarray(W_pl), W_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(H_pl), H_ref, rtol=1e-5)


def test_pick_d_tile_is_lane_aligned():
    assert pick_d_tile(10_000) == 2048
    assert pick_d_tile(192) == 256
    assert pick_d_tile(100) == 128
    assert pick_d_tile(4096) == 2048
    assert all(pick_d_tile(n) % 128 == 0 for n in (5, 200, 1000, 99999))


def test_block_update_auto_selects_variants(problem):
    X, _, _ = problem
    W, H = batched_problem(X)
    params = {"W": W, "H": H}
    # small problem, unweighted -> plain batched kernel path
    update = make_block_update_auto(X, W.shape[0], interpret=True)
    out = update(params, jnp.asarray(2, jnp.int32))
    assert out["W"].shape == W.shape
    # weighted path
    weights = jnp.ones((X.shape[1],), jnp.float32) * 1.5
    update_w = make_block_update_auto(X, W.shape[0], weights_kl=weights,
                                      interpret=True)
    out_w = update_w(params, jnp.asarray(2, jnp.int32))
    assert out_w["H"].shape == H.shape
    # weighted + too-large D -> explicit error (fall back to XLA)
    X_big = jnp.ones((96, 100_000), jnp.float32)
    with pytest.raises(ValueError, match="VMEM"):
        make_block_update_auto(X_big, 4, weights_kl=jnp.ones((100_000,)))


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


def test_masked_block_kernel_matches_masked_xla():
    """The rank-masked fused block kernel must reproduce the masked XLA
    step functions (ops.klnmf.make_masked_step_functions) on K-padded
    lanes: active lanes advance, padded W columns untouched, padded H rows
    exact zeros."""
    from salamander_tpu.ops.klnmf import make_masked_step_functions, pad_rank
    from salamander_tpu.ops.pallas_klnmf import fused_mu_block_batched_masked

    rng = np.random.default_rng(0)
    V, D, steps = 12, 20, 5
    ranks = [2, 3, 5]
    Kp = 6
    Ws, Hs, masks = [], [], []
    X = jnp.asarray(
        np.clip(rng.poisson(30.0, (V, D)).astype(np.float64), 1.0, None)
    )
    for k in ranks:
        W = jnp.asarray(rng.dirichlet(np.ones(V), size=k).T)
        H = jnp.asarray(rng.uniform(0.5, 2.0, (k, D)) * 40)
        W_pad, H_pad, mask = pad_rank(W, H, Kp)
        Ws.append(W_pad)
        Hs.append(H_pad)
        masks.append(mask)
    W = jnp.stack(Ws)
    H = jnp.stack(Hs)
    mask = jnp.stack(masks)

    update_fn, _ = make_masked_step_functions()
    data = {"X": X}

    def xla_lane(params):
        for _ in range(steps):
            params = update_fn(params, data)
        return params

    expected = [
        xla_lane({"W": W[i], "H": H[i], "mask": mask[i]})
        for i in range(len(ranks))
    ]
    W_pl, H_pl = fused_mu_block_batched_masked(
        X, W, H, mask, steps, chunk=3, interpret=True
    )
    for i, k in enumerate(ranks):
        np.testing.assert_allclose(
            np.asarray(W_pl[i]), np.asarray(expected[i]["W"]),
            rtol=5e-5, err_msg=f"W lane {i}",
        )
        np.testing.assert_allclose(
            np.asarray(H_pl[i]), np.asarray(expected[i]["H"]),
            rtol=5e-5, err_msg=f"H lane {i}",
        )
        # inert padding is EXACT
        np.testing.assert_array_equal(np.asarray(H_pl[i])[k:], 0.0)
        np.testing.assert_array_equal(
            np.asarray(W_pl[i])[:, k:], np.asarray(W[i])[:, k:]
        )


def test_masked_dtiled_kernel_matches_masked_xla():
    """The rank-masked D-tiled iteration (same Pallas kernel as the plain
    D-tiled path, masked postprocessing outside) == masked XLA step."""
    from salamander_tpu.ops.klnmf import make_masked_step_functions, pad_rank
    from salamander_tpu.ops.pallas_klnmf import (
        fused_mu_iteration_dtiled_masked,
    )

    rng = np.random.default_rng(1)
    V, D, k, Kp = 10, 37, 3, 5  # D deliberately not a tile multiple
    X = jnp.asarray(
        np.clip(rng.poisson(30.0, (V, D)).astype(np.float64), 1.0, None)
    )
    W = jnp.asarray(rng.dirichlet(np.ones(V), size=k).T)
    H = jnp.asarray(rng.uniform(0.5, 2.0, (k, D)) * 40)
    W_pad, H_pad, mask = pad_rank(W, H, Kp)
    W_b = jnp.stack([W_pad, W_pad])
    H_b = jnp.stack([H_pad, H_pad])
    mask_b = jnp.stack([mask, mask])

    update_fn, _ = make_masked_step_functions()
    expected = update_fn({"W": W_pad, "H": H_pad, "mask": mask}, {"X": X})
    W_dt, H_dt = fused_mu_iteration_dtiled_masked(
        X, W_b, H_b, mask_b, chunk=1, d_tile=16, interpret=True
    )
    for lane in range(2):
        np.testing.assert_allclose(
            np.asarray(W_dt[lane]), np.asarray(expected["W"]), rtol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(H_dt[lane]), np.asarray(expected["H"]), rtol=5e-5
        )
        np.testing.assert_array_equal(np.asarray(H_dt[lane])[k:], 0.0)


def test_rank_scan_klnmf_use_pallas_matches_xla():
    """The padded rank scan through the masked Pallas kernels returns the
    same per-rank losses/winners as the XLA path."""
    from salamander_tpu.engine import FitConfig
    from salamander_tpu.parallel import rank_scan_klnmf

    rng = np.random.default_rng(2)
    V, D = 12, 24
    X = np.clip(rng.poisson(30.0, (V, D)).astype(np.float32), 1.0, None)
    config = FitConfig(min_iterations=20, max_iterations=40,
                       conv_test_freq=10, tol=0.0)
    xla = rank_scan_klnmf(X, range(2, 5), n_restarts=2, seed=0,
                          config=config, rank_bucket=4)
    pallas = rank_scan_klnmf(X, range(2, 5), n_restarts=2, seed=0,
                             config=config, rank_bucket=4,
                             use_pallas=True, pallas_interpret=True)
    for k in xla:
        np.testing.assert_allclose(
            pallas[k].losses, xla[k].losses, rtol=2e-4, err_msg=f"k={k}"
        )
        assert pallas[k].best_index == xla[k].best_index
