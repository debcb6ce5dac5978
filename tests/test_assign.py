"""Catalog assignment: dense refit + sparse greedy backward elimination.

The reference only covers the dense case (fit with given asignatures,
reference src/salamander/models/klnmf.py:83-121); the sparse per-sample
search is beyond-reference, so these tests pin the feature's own contract:
exact-zero off-support exposures, the KL acceptance budget, support
recovery on well-separated synthetic data, and chunking invariance.
"""

import numpy as np
import pandas as pd
import pytest

import salamander_tpu as sal
from salamander_tpu.assign import assign_exposures, assign_signatures
from salamander_tpu.containers import AnnData
from salamander_tpu.ops.klnmf import EPSILON


def _synthetic(seed=0, n_features=24, n_samples=8, n_catalog=6,
               active_per_sample=2, scale=2_000.0):
    """Exactly factorizable counts over a well-separated catalog with a
    KNOWN sparse per-sample support."""
    rng = np.random.default_rng(seed)
    # near-orthogonal catalog: disjoint dominant blocks + small background
    W = np.full((n_features, n_catalog), 0.01)
    block = n_features // n_catalog
    for k in range(n_catalog):
        W[k * block:(k + 1) * block, k] += 1.0
    W /= W.sum(axis=0, keepdims=True)
    H = np.zeros((n_catalog, n_samples))
    supports = []
    for d in range(n_samples):
        active = rng.choice(n_catalog, size=active_per_sample, replace=False)
        supports.append(np.sort(active))
        H[active, d] = scale * (0.5 + rng.random(active_per_sample))
    X = W @ H
    return X, W, H, supports


def _frames(X, W):
    n_features, n_samples = X.shape
    features = [f"f{v}" for v in range(n_features)]
    data = pd.DataFrame(
        X.T, index=[f"s{d}" for d in range(n_samples)], columns=features
    )
    catalog = pd.DataFrame(
        W.T, index=[f"Sig{k}" for k in range(W.shape[1])], columns=features
    )
    return data, catalog


@pytest.fixture(scope="module")
def problem():
    return _synthetic()


def test_dense_refit_reaches_exact_factorization(problem):
    X, W, H_true, _ = problem
    data, catalog = _frames(X, W)
    exposures = assign_exposures(
        data, catalog, tol=1e-12, max_iterations=50_000
    )
    assert list(exposures.index) == list(data.index)
    assert list(exposures.columns) == list(catalog.index)
    recon = exposures.to_numpy() @ W.T
    # X = W @ H_true exactly, so the dense KL optimum is ~0; MU's tail is
    # O(1/t), hence the generous iteration budget for a 1e-4 pin
    np.testing.assert_allclose(recon, X.T, rtol=1e-4)


def test_sparse_assignment_recovers_known_supports(problem):
    X, W, _, supports = problem
    data, catalog = _frames(X, W)
    res = assign_signatures(data, catalog, rel_tol=0.02)
    active = res.active.to_numpy()
    for d, true_support in enumerate(supports):
        assert list(np.flatnonzero(active[d])) == list(true_support)
    assert (res.n_active.to_numpy() == [len(s) for s in supports]).all()


def test_exposures_exact_zero_off_support_epsilon_on(problem):
    X, W, _, _ = problem
    data, catalog = _frames(X, W)
    res = assign_signatures(data, catalog, rel_tol=0.02)
    exposures = res.exposures.to_numpy()
    active = res.active.to_numpy()
    assert (exposures[~active] == 0.0).all()
    assert (exposures[active] >= EPSILON).all()


def test_kl_budget_holds_per_sample(problem):
    """The acceptance budget is a CONTRACT on the reported numbers: the
    same-program recheck (ops/assign._finalize_contract) makes it exact,
    no slack."""
    X, W, _, _ = problem
    data, catalog = _frames(X, W)
    rel_tol, abs_tol = 0.05, 1e-9
    res = assign_signatures(data, catalog, rel_tol=rel_tol, abs_tol=abs_tol)
    kl_dense = res.kl_dense.to_numpy()
    kl_sparse = res.kl_sparse.to_numpy()
    budget = (1.0 + rel_tol) * kl_dense + abs_tol
    assert (kl_sparse <= budget).all()
    assert res.meta["rel_tol"] == rel_tol


def test_noisy_counts_still_within_budget():
    X, W, _, _ = _synthetic(seed=3)
    X = np.random.default_rng(5).poisson(X).astype(np.float64) + EPSILON
    data, catalog = _frames(X, W)
    res = assign_signatures(data, catalog, rel_tol=0.02)
    assert (res.kl_sparse.to_numpy()
            <= 1.02 * res.kl_dense.to_numpy()).all()
    # sparser than dense for at least some samples at this tolerance
    assert res.n_active.min() < W.shape[1]


def test_finalize_contract_fallback_chain():
    """Direct pin of ops/assign._finalize_contract: an over-budget final
    state falls back to the pre-polish accepted state (same support), an
    over-budget accepted state falls back to the dense refit (full
    support), and the reported kl_sparse is the SELECTED evaluation — so
    the budget holds exactly in every case."""
    from salamander_tpu.ops import assign as ops

    X, W, _, _ = _synthetic(seed=11)
    K, D = W.shape[1], X.shape[1]
    mask0 = np.ones((K, D), dtype=bool)
    H_dense = np.asarray(ops.refit_exposures(X, W, mask0,
                                             max_iterations=2000)[0])
    out = ops.eliminate_signatures(X, W, rel_tol=0.05,
                                   candidate_iters=30)
    mask = np.asarray(out["mask"]).astype(bool)
    H_good = np.asarray(out["H"])
    rel_tol, abs_tol = 0.05, 0.0
    kl_dense = np.asarray(ops._kl(X, W, H_dense))
    budget = (1.0 + rel_tol) * kl_dense + abs_tol

    # corrupt the "final" state for sample 0 only -> fallback to accepted
    H_bad_final = H_good.copy()
    H_bad_final[:, 0] *= 3.0
    m, H, kd, ks, n_active = ops._finalize_contract(
        X, W, mask, H_bad_final, H_good, H_dense, rel_tol, abs_tol
    )
    ks = np.asarray(ks)
    assert (ks <= (1.0 + rel_tol) * np.asarray(kd) + abs_tol).all()
    np.testing.assert_array_equal(np.asarray(H)[:, 0], H_good[:, 0])
    np.testing.assert_array_equal(np.asarray(m), mask)

    # corrupt final AND accepted for sample 0 -> fallback to dense,
    # support reset to full, reported kl == kl_dense for that sample
    H_bad_acc = H_good.copy()
    H_bad_acc[:, 0] *= 2.0
    m, H, kd, ks, n_active = ops._finalize_contract(
        X, W, mask, H_bad_final, H_bad_acc, H_dense, rel_tol, abs_tol
    )
    ks, kd, m = np.asarray(ks), np.asarray(kd), np.asarray(m)
    assert (ks <= (1.0 + rel_tol) * kd + abs_tol).all()
    assert ks[0] == kd[0]
    assert m[:, 0].all() and int(np.asarray(n_active)[0]) == K
    np.testing.assert_array_equal(np.asarray(H)[:, 0], H_dense[:, 0])
    # untouched samples keep their sparse result
    np.testing.assert_array_equal(m[:, 1:], mask[:, 1:])


def test_chunked_equals_unchunked(problem):
    """Samples are independent; a non-divisible batch_size (with a padded
    tail chunk) must reproduce the one-shot result."""
    X, W, _, _ = problem
    data, catalog = _frames(X, W)
    whole = assign_signatures(data, catalog, rel_tol=0.02)
    chunked = assign_signatures(data, catalog, rel_tol=0.02, batch_size=3)
    pd.testing.assert_frame_equal(whole.active, chunked.active)
    np.testing.assert_allclose(
        whole.exposures.to_numpy(), chunked.exposures.to_numpy(),
        rtol=1e-6, atol=1e-9,
    )
    # exactly-factorizable data: kl_sparse is float jitter around 0, and
    # the convergence test aggregates per chunk, so stopping blocks may
    # differ — compare with an absolute floor
    np.testing.assert_allclose(
        whole.kl_sparse.to_numpy(), chunked.kl_sparse.to_numpy(),
        rtol=1e-6, atol=1e-9,
    )


def test_catalog_orientation_and_feature_order_invariance(problem):
    """features-x-signatures catalogs and shuffled feature columns must
    align back to the data's var_names."""
    X, W, _, _ = problem
    data, catalog = _frames(X, W)
    res = assign_signatures(data, catalog, rel_tol=0.02)

    rng = np.random.default_rng(7)
    perm = rng.permutation(catalog.shape[1])
    shuffled_T = catalog.iloc[:, perm].T  # features x signatures, reordered
    res_shuffled = assign_signatures(data, shuffled_T, rel_tol=0.02)
    pd.testing.assert_frame_equal(res.active, res_shuffled.active)
    np.testing.assert_allclose(
        res.exposures.to_numpy(), res_shuffled.exposures.to_numpy(),
        rtol=1e-10,
    )


def test_anndata_inputs_and_package_export(problem):
    X, W, _, supports = problem
    data, catalog = _frames(X, W)
    adata = AnnData(data)
    acatalog = AnnData(catalog)
    res = sal.assign_signatures(adata, acatalog, rel_tol=0.02)
    assert isinstance(res, sal.AssignmentResult)
    active = res.active.to_numpy()
    for d, true_support in enumerate(supports):
        assert list(np.flatnonzero(active[d])) == list(true_support)
    assert set(res.assigned_signatures()) == {
        f"Sig{k}" for s in supports for k in s
    }
    # dense helper exported too
    dense = sal.assign_exposures(adata, acatalog)
    assert dense.shape == res.exposures.shape


def test_input_validation(problem):
    X, W, _, _ = problem
    data, catalog = _frames(X, W)
    with pytest.raises(TypeError, match="AnnData-like container"):
        assign_signatures([[1.0]], catalog)
    with pytest.raises(TypeError, match="DataFrame or an AnnData-like"):
        assign_signatures(data, np.asarray(W))
    with pytest.raises(ValueError, match="do not match"):
        assign_signatures(data, catalog.iloc[:, :-1])
    # the input data must never be mutated
    before = data.copy()
    assign_exposures(data, catalog, max_iterations=20)
    pd.testing.assert_frame_equal(data, before)


def test_abs_tol_only_budget():
    """rel_tol=0 with a generous abs_tol still sparsifies (the acceptance
    rule is the sum of both budgets)."""
    X, W, _, supports = _synthetic(seed=11)
    data, catalog = _frames(X, W)
    res = assign_signatures(data, catalog, rel_tol=0.0, abs_tol=1.0)
    assert res.n_active.max() <= max(len(s) for s in supports) + 1


# --------------------------------------------------------------------- #
# bootstrap exposure uncertainty
# --------------------------------------------------------------------- #


def test_bootstrap_point_equals_dense_refit(problem):
    X, W, _, _ = problem
    data, catalog = _frames(X, W)
    from salamander_tpu.assign import bootstrap_exposures

    res = bootstrap_exposures(data, catalog, n_replicates=8, seed=0)
    dense = assign_exposures(data, catalog)
    # replicate 0 is the original counts: the point estimate IS the dense
    # refit. The shared program's convergence aggregates the resampled
    # columns too, so refits stop at different blocks - compare per-sample
    # exposure FRACTIONS with a floor that ignores the noise-floor
    # entries a stopped-earlier MU leaves at ~1e-5 of the sample mass.
    def fractions(E):
        return E / E.sum(axis=1, keepdims=True)

    np.testing.assert_allclose(
        fractions(res.point.to_numpy()), fractions(dense.to_numpy()),
        atol=1e-4,
    )
    assert res.mean.shape == dense.shape
    assert set(res.quantiles) == {0.05, 0.5, 0.95}
    assert res.meta["n_replicates"] == 8


def test_bootstrap_concentrates_with_counts():
    """More counts -> tighter bootstrap: the relative spread of exposures
    must shrink when every sample's total count is scaled up 100x."""
    from salamander_tpu.assign import bootstrap_exposures

    X_small, W, _, _ = _synthetic(seed=2, scale=300.0)
    X_big = X_small * 100.0
    rels = []
    for X in (X_small, X_big):
        data, catalog = _frames(X, W)
        res = bootstrap_exposures(data, catalog, n_replicates=30, seed=1)
        mean = res.mean.to_numpy()
        # spread of the REAL exposures only: noise-floor entries have O(1)
        # relative spread at any count depth
        real = mean / mean.sum(axis=1, keepdims=True) > 0.05
        rels.append(np.median((res.std.to_numpy() / mean)[real]))
    # multinomial bootstrap: spread ~ 1/sqrt(total), 100x counts ~ 10x
    assert rels[1] < rels[0] * 0.5


def test_bootstrap_respects_sparse_support(problem):
    X, W, _, supports = problem
    data, catalog = _frames(X, W)
    from salamander_tpu.assign import bootstrap_exposures

    assignment = assign_signatures(data, catalog, rel_tol=0.02)
    res = bootstrap_exposures(
        data, catalog, n_replicates=10, seed=3, active=assignment.active
    )
    off = ~assignment.active.to_numpy()
    assert (res.point.to_numpy()[off] == 0.0).all()
    assert (res.mean.to_numpy()[off] == 0.0).all()
    assert (res.presence.to_numpy()[off] == 0.0).all()
    # planted signatures are present with probability ~1
    for d, true_support in enumerate(supports):
        assert (res.presence.to_numpy()[d, true_support] > 0.9).all()
    assert res.meta["sparse"] is True


def test_bootstrap_chunked_replicates_consistent(problem):
    """replicate_batch chunks share the compiled program; the point
    estimate and the moments must agree with the unchunked run at
    bootstrap-noise level (different keys -> statistically equal)."""
    X, W, _, _ = problem
    data, catalog = _frames(X, W)
    from salamander_tpu.assign import bootstrap_exposures

    whole = bootstrap_exposures(data, catalog, n_replicates=21, seed=5)
    chunked = bootstrap_exposures(
        data, catalog, n_replicates=21, seed=5, replicate_batch=6
    )

    def fractions(E):
        return E / E.sum(axis=1, keepdims=True)

    np.testing.assert_allclose(
        fractions(whole.point.to_numpy()),
        fractions(chunked.point.to_numpy()), atol=1e-4,
    )
    assert len(chunked.mean) == len(whole.mean)
    # exact replicate count: ceil(20 / 5) chunks of 5 resamples, last takes 0?
    assert chunked.meta["n_replicates"] == 21


def test_bootstrap_methods_and_validation(problem):
    X, W, _, _ = problem
    data, catalog = _frames(X, W)
    from salamander_tpu.assign import bootstrap_exposures

    poisson = bootstrap_exposures(
        data, catalog, n_replicates=6, seed=2, method="poisson"
    )
    assert np.isfinite(poisson.std.to_numpy()).all()
    with pytest.raises(ValueError, match="n_replicates"):
        bootstrap_exposures(data, catalog, n_replicates=1)
    with pytest.raises(ValueError, match="active must be"):
        bootstrap_exposures(
            data, catalog, n_replicates=4,
            active=np.ones((3, 3), dtype=bool),
        )


# --------------------------------------------------------------------- #
# program-kill guard: guarded drivers == monolithic programs
# --------------------------------------------------------------------- #


def test_refit_guarded_segmented_matches_monolithic(problem):
    """A forced tiny program budget chops the refit into capped segments;
    the chained while_loop must reproduce the monolithic program exactly
    (same blocks, same convergence exit). CPU, so bitwise."""
    import jax.numpy as jnp

    from salamander_tpu.ops import assign as ops

    X, W, _, _ = problem
    mask = jnp.ones((W.shape[1], X.shape[1]), dtype=bool)
    H_mono, it_mono = ops.refit_exposures(
        jnp.asarray(X), jnp.asarray(W), mask, max_iterations=400, tol=1e-9,
    )
    H_seg, it_seg = ops.refit_exposures_guarded(
        jnp.asarray(X), jnp.asarray(W), mask, max_iterations=400, tol=1e-9,
        program_seconds=1e-12,
    )
    assert int(it_mono) == int(it_seg)
    np.testing.assert_array_equal(np.asarray(H_mono), np.asarray(H_seg))
    # generous budget: defers to the monolithic program
    H_safe, it_safe = ops.refit_exposures_guarded(
        jnp.asarray(X), jnp.asarray(W), mask, max_iterations=400, tol=1e-9,
        program_seconds=1e9,
    )
    assert int(it_safe) == int(it_mono)
    np.testing.assert_array_equal(np.asarray(H_mono), np.asarray(H_safe))


def test_eliminate_guarded_matches_monolithic(problem):
    """Host-driven per-round elimination (+ capped dense/final refits)
    reproduces the monolithic while_loop's supports and exposures."""
    import jax.numpy as jnp

    from salamander_tpu.ops import assign as ops

    X, W, _, supports = problem
    mono = ops.eliminate_signatures(
        jnp.asarray(X), jnp.asarray(W), 0.02, candidate_iters=30,
        polish_iterations=100, max_polish_iterations=2000,
    )
    guarded = ops.eliminate_signatures_guarded(
        jnp.asarray(X), jnp.asarray(W), 0.02, candidate_iters=30,
        polish_iterations=100, max_polish_iterations=2000,
        program_seconds=1e-12,
    )
    np.testing.assert_array_equal(
        np.asarray(mono["mask"]), np.asarray(guarded["mask"])
    )
    assert int(mono["n_rounds"]) == int(guarded["n_rounds"])
    np.testing.assert_allclose(
        np.asarray(mono["H"]), np.asarray(guarded["H"]), rtol=1e-12, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(mono["kl_sparse"]), np.asarray(guarded["kl_sparse"]),
        rtol=1e-12,
    )


def test_bootstrap_guarded_matches_monolithic(problem):
    import jax
    import jax.numpy as jnp

    from salamander_tpu.ops import assign as ops

    X, W, _, _ = problem
    mask = jnp.ones((W.shape[1], X.shape[1]), dtype=bool)
    key = jax.random.PRNGKey(4)
    H_mono = ops.bootstrap_refit(
        jnp.asarray(X), jnp.asarray(W), mask, key, 4, max_iterations=500,
    )
    H_guard = ops.bootstrap_refit_guarded(
        jnp.asarray(X), jnp.asarray(W), mask, key, 4, max_iterations=500,
        program_seconds=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(H_mono), np.asarray(H_guard), rtol=1e-12, atol=0
    )


def test_assign_signatures_guarded_dispatch_and_autobatch(problem):
    """With a program budget forced on (PROGRAM_SECONDS_OVERRIDE), the
    public driver auto-chunks and routes through the guarded elimination;
    supports must match the unguarded run, exposures to convergence
    tolerance (chunking aggregates the refit convergence test per chunk)."""
    from salamander_tpu.parallel import compaction

    X, W, _, _ = problem
    data, catalog = _frames(X, W)
    baseline = assign_signatures(data, catalog, rel_tol=0.02)
    compaction.PROGRAM_SECONDS_OVERRIDE = 1e-4  # force tiny auto batches
    try:
        guarded = assign_signatures(data, catalog, rel_tol=0.02)
    finally:
        compaction.PROGRAM_SECONDS_OVERRIDE = None
    pd.testing.assert_frame_equal(baseline.active, guarded.active)
    np.testing.assert_allclose(
        baseline.exposures.to_numpy(), guarded.exposures.to_numpy(),
        rtol=1e-5, atol=1e-6,
    )


# --------------------------------------------------------------------- #
# sample-axis sharding (mesh=)
# --------------------------------------------------------------------- #


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 8, reason="needs 8 virtual devices"
)
def test_assignment_sharded_matches_unsharded():
    """Sample-sharded assignment == unsharded on the CPU mesh: samples are
    independent, so sharding is pure data parallelism (the only collectives
    are the aggregated convergence sums — f64 CPU keeps decisions stable)."""
    import jax

    from salamander_tpu.parallel import make_mesh

    X, W, _, supports = _synthetic(n_samples=16)
    data, catalog = _frames(X, W)
    mesh = make_mesh(jax.devices()[:8], sample_ways=4)

    base = assign_signatures(data, catalog, rel_tol=0.02)
    sharded = assign_signatures(data, catalog, rel_tol=0.02, mesh=mesh)
    pd.testing.assert_frame_equal(base.active, sharded.active)
    np.testing.assert_allclose(
        base.exposures.to_numpy(), sharded.exposures.to_numpy(),
        rtol=1e-9, atol=1e-12,
    )
    # chunked + sharded composes; batch_size rounds up to the sample ways
    chunked = assign_signatures(
        data, catalog, rel_tol=0.02, batch_size=6, mesh=mesh
    )
    pd.testing.assert_frame_equal(base.active, chunked.active)

    dense = assign_exposures(data, catalog)
    dense_sharded = assign_exposures(data, catalog, mesh=mesh)
    np.testing.assert_allclose(
        dense.to_numpy(), dense_sharded.to_numpy(), rtol=1e-9, atol=1e-12,
    )


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 8, reason="needs 8 virtual devices"
)
def test_bootstrap_sharded_matches_unsharded():
    """jax's partitionable RNG makes the resamples value-deterministic
    regardless of sharding, so the sharded bootstrap matches unsharded."""
    import jax

    from salamander_tpu import bootstrap_exposures
    from salamander_tpu.parallel import make_mesh

    X, W, _, _ = _synthetic(n_samples=16)
    data, catalog = _frames(X, W)
    mesh = make_mesh(jax.devices()[:8], sample_ways=4)
    base = bootstrap_exposures(data, catalog, n_replicates=5, seed=1)
    sharded = bootstrap_exposures(
        data, catalog, n_replicates=5, seed=1, mesh=mesh
    )
    np.testing.assert_allclose(
        base.point.to_numpy(), sharded.point.to_numpy(),
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(
        base.mean.to_numpy(), sharded.mean.to_numpy(),
        rtol=1e-9, atol=1e-12,
    )


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 8, reason="needs 8 virtual devices"
)
def test_sharded_assignment_rejects_indivisible_samples():
    import jax

    from salamander_tpu.parallel import make_mesh

    X, W, _, _ = _synthetic(n_samples=10)  # 10 % 4 != 0
    data, catalog = _frames(X, W)
    mesh = make_mesh(jax.devices()[:8], sample_ways=4)
    with pytest.raises(ValueError, match="sample ways"):
        assign_exposures(data, catalog, mesh=mesh)


# --------------------------------------------------------------------- #
# preemption-safe checkpointing (checkpoint.ChunkStore)
# --------------------------------------------------------------------- #


def test_assign_checkpoint_full_and_partial_resume(problem, tmp_path,
                                                   monkeypatch):
    """A checkpointed assignment equals the plain run; a full resume does
    ZERO elimination work (both search entry points stubbed to raise); a
    partial store recomputes exactly the missing chunk."""
    from salamander_tpu.ops import assign as ops

    X, W, _, _ = problem
    data, catalog = _frames(X, W)
    kwargs = dict(rel_tol=0.02, batch_size=3)  # 8 samples -> 3 chunks
    baseline = assign_signatures(data, catalog, **kwargs)
    store = tmp_path / "assign_ckpt"
    first = assign_signatures(data, catalog, checkpoint_dir=store, **kwargs)
    pd.testing.assert_frame_equal(baseline.active, first.active)
    np.testing.assert_array_equal(
        baseline.exposures.to_numpy(), first.exposures.to_numpy()
    )
    chunk_files = sorted(store.glob("chunk_*.npz"))
    assert len(chunk_files) == 3

    def boom(*args, **bkwargs):
        raise AssertionError("resume must not recompute completed chunks")

    monkeypatch.setattr(ops, "eliminate_signatures", boom)
    monkeypatch.setattr(ops, "eliminate_signatures_guarded", boom)
    resumed = assign_signatures(data, catalog, checkpoint_dir=store, **kwargs)
    pd.testing.assert_frame_equal(baseline.active, resumed.active)
    np.testing.assert_array_equal(
        baseline.exposures.to_numpy(), resumed.exposures.to_numpy()
    )
    monkeypatch.undo()

    chunk_files[1].unlink()
    calls = []
    real = ops.eliminate_signatures

    def counting(*args, **ckwargs):
        calls.append(1)
        return real(*args, **ckwargs)

    monkeypatch.setattr(ops, "eliminate_signatures", counting)
    partial = assign_signatures(data, catalog, checkpoint_dir=store, **kwargs)
    assert len(calls) == 1
    pd.testing.assert_frame_equal(baseline.active, partial.active)

    # a different configuration discards the stale store instead of mixing
    with pytest.warns(UserWarning, match="different run"):
        other = assign_signatures(
            data, catalog, rel_tol=0.05, batch_size=3, checkpoint_dir=store
        )
    fresh = assign_signatures(data, catalog, rel_tol=0.05, batch_size=3)
    pd.testing.assert_frame_equal(other.active, fresh.active)


def test_bootstrap_checkpoint_resume(problem, tmp_path, monkeypatch):
    """Bootstrap chunks resume from the store; summaries (quantiles) are
    deliberately outside the store identity, so re-summarizing is free."""
    from salamander_tpu.ops import assign as ops

    X, W, _, _ = problem
    data, catalog = _frames(X, W)
    store = tmp_path / "boot_ckpt"
    base = sal.bootstrap_exposures(
        data, catalog, n_replicates=5, seed=2, replicate_batch=3,
    )
    first = sal.bootstrap_exposures(
        data, catalog, n_replicates=5, seed=2, replicate_batch=3,
        checkpoint_dir=store,
    )
    np.testing.assert_array_equal(
        base.mean.to_numpy(), first.mean.to_numpy()
    )

    def boom(*args, **bkwargs):
        raise AssertionError("resume must not refit completed chunks")

    monkeypatch.setattr(ops, "bootstrap_refit", boom)
    monkeypatch.setattr(ops, "bootstrap_refit_guarded", boom)
    resumed = sal.bootstrap_exposures(
        data, catalog, n_replicates=5, seed=2, replicate_batch=3,
        checkpoint_dir=store, quantiles=(0.1, 0.9),  # new summaries, free
    )
    np.testing.assert_array_equal(
        base.mean.to_numpy(), resumed.mean.to_numpy()
    )
    assert set(resumed.quantiles) == {0.1, 0.9}
