"""De novo consensus extraction pipeline (salamander_tpu.extraction).

The reference has no counterpart (its tutorial loops restarts on the host);
these tests pin the pipeline's own contracts: planted-rank recovery,
lane-key independence (a rank's result does not depend on which other ranks
share the padded program), determinism, resampler semantics, and silhouette
correctness vs sklearn.
"""


import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

import salamander_tpu as sal
from salamander_tpu.extraction import (
    _cluster_silhouettes,
    _consensus_cluster,
)
from salamander_tpu.ops.assign import resample_counts


@pytest.fixture(scope="module")
def planted():
    """Poisson counts with k_true = 3 well-separated signatures."""
    rng = np.random.default_rng(7)
    n_features, n_samples, k_true = 16, 60, 3
    W = rng.dirichlet(np.full(n_features, 0.4), size=k_true)
    H = rng.gamma(2.0, 50.0, size=(n_samples, k_true))
    X = rng.poisson(H @ W).astype(float)
    data = pd.DataFrame(
        X,
        index=[f"s{i}" for i in range(n_samples)],
        columns=[f"v{j}" for j in range(n_features)],
    )
    return data, W


@pytest.fixture(scope="module")
def extracted(planted):
    data, _ = planted
    return sal.extract_signatures(
        data, ranks=range(2, 5), n_bootstraps=6, seed=0,
        min_iterations=100, max_iterations=2000, dtype=np.float64,
    )


def test_recovers_planted_rank_and_signatures(planted, extracted):
    _, W_true = planted
    assert extracted.suggested_rank == 3
    consensus = extracted.consensus[3].to_numpy()
    units = consensus / np.linalg.norm(consensus, axis=1, keepdims=True)
    planted_units = W_true / np.linalg.norm(W_true, axis=1, keepdims=True)
    sim = planted_units @ units.T
    from scipy.optimize import linear_sum_assignment

    rows, cols = linear_sum_assignment(1.0 - sim)
    assert np.all(sim[rows, cols] > 0.98)
    # stability collapses past the true rank, the selection signal itself
    assert (
        extracted.table.loc[4, "min_stability"]
        < extracted.table.loc[3, "min_stability"]
    )


def test_result_structure(planted, extracted):
    data, _ = planted
    n_samples, n_features = data.shape
    assert list(extracted.table.index) == [2, 3, 4]
    for col in ("best_loss", "mean_stability", "min_stability",
                "mean_sample_cosine", "relative_error",
                "mean_replicate_loss"):
        assert col in extracted.table.columns
    for k in (2, 3, 4):
        assert extracted.consensus[k].shape == (k, n_features)
        np.testing.assert_allclose(
            extracted.consensus[k].sum(axis=1), 1.0, rtol=1e-12
        )
        assert extracted.exposures[k].shape == (n_samples, k)
        assert extracted.matched[k].shape == (6, k, n_features)
        assert extracted.replicate_losses[k].shape == (6,)
        assert extracted.silhouettes[k].shape == (k,)
    # loss decreases with rank (more parameters always fit better)
    losses = extracted.table["best_loss"].to_numpy()
    assert np.all(np.diff(losses) < 0)


def test_final_model_surface(planted, extracted):
    data, _ = planted
    model = extracted.model
    assert type(model).__name__ == "KLNMF"
    assert model.signatures.shape == (3, data.shape[1])
    # given signatures stay frozen through the exposure-only refit
    np.testing.assert_allclose(
        model.signatures.to_numpy(),
        extracted.consensus[3].to_numpy(),
        rtol=1e-6,
    )
    assert model.exposures.shape == (data.shape[0], 3)


def test_lane_independence_across_rank_sets(planted, extracted):
    """A rank's lanes depend only on (seed, rank, replicate): at the SAME
    padded rank results are bitwise equal no matter which other ranks share
    the program; across different paddings they agree to fusion ulps (XLA
    regroups reductions per contraction width)."""
    data, _ = planted
    kwargs = dict(
        n_bootstraps=6, seed=0, min_iterations=100, max_iterations=2000,
        dtype=np.float64, fit_final=False,
    )
    solo = sal.extract_signatures(data, ranks=[3], **kwargs)
    pair = sal.extract_signatures(data, ranks=[2, 3], **kwargs)  # Kp = 3
    np.testing.assert_array_equal(
        solo.replicate_losses[3], pair.replicate_losses[3]
    )
    np.testing.assert_array_equal(
        solo.consensus[3].to_numpy(), pair.consensus[3].to_numpy()
    )
    # the fixture scanned ranks 2..4 (padded rank 4): fusion-ulp agreement
    np.testing.assert_allclose(
        solo.replicate_losses[3], extracted.replicate_losses[3], rtol=1e-9
    )
    np.testing.assert_allclose(
        solo.consensus[3].to_numpy(), extracted.consensus[3].to_numpy(),
        rtol=1e-6, atol=1e-9,
    )


def test_deterministic(planted):
    data, _ = planted
    kwargs = dict(
        ranks=[2, 3], n_bootstraps=4, seed=11, min_iterations=50,
        max_iterations=500, dtype=np.float64, fit_final=False,
    )
    first = sal.extract_signatures(data, **kwargs)
    second = sal.extract_signatures(data, **kwargs)
    pd.testing.assert_frame_equal(first.table, second.table)
    for k in (2, 3):
        np.testing.assert_array_equal(
            first.consensus[k].to_numpy(), second.consensus[k].to_numpy()
        )


def test_extraction_under_mesh(planted):
    """Lane-sharded discovery (lanes over restart ways, samples over sample
    ways) matches the unsharded run to reduction-regrouping ulps."""
    from salamander_tpu.parallel import make_mesh

    data, _ = planted
    mesh = make_mesh(jax.devices("cpu")[:8], sample_ways=2)
    kwargs = dict(
        ranks=[2, 3], n_bootstraps=4, seed=3, min_iterations=50,
        max_iterations=500, dtype=np.float64, fit_final=False,
    )
    plain = sal.extract_signatures(data, **kwargs)
    sharded = sal.extract_signatures(data, mesh=mesh, **kwargs)
    for k in (2, 3):
        np.testing.assert_allclose(
            sharded.replicate_losses[k], plain.replicate_losses[k],
            rtol=1e-10,
        )
        np.testing.assert_allclose(
            sharded.consensus[k].to_numpy(), plain.consensus[k].to_numpy(),
            rtol=1e-8, atol=1e-12,
        )
    pd.testing.assert_frame_equal(
        sharded.table, plain.table, rtol=1e-8, atol=1e-12
    )
    with pytest.raises(ValueError, match="must divide"):
        sal.extract_signatures(
            data, ranks=[2], n_bootstraps=3, mesh=mesh, fit_final=False,
            dtype=np.float64,
        )


def test_mvnmf_extraction(planted):
    """model='mvnmf' runs min-vol lanes (masked MU + line search with the
    per-lane persistent gamma), reports the penalized objective in the
    table, returns a fitted MvNMF at the suggestion, and its compacted
    discovery is bit-identical to the monolithic loop on CPU."""
    data, W_true = planted
    kwargs = dict(
        ranks=range(2, 5), n_bootstraps=4, seed=0, model="mvnmf", lam=0.5,
        min_iterations=100, max_iterations=1500, dtype=np.float64,
    )
    result = sal.extract_signatures(data, **kwargs)
    assert result.suggested_rank == 3
    from salamander_tpu.models import MvNMF

    assert isinstance(result.model, MvNMF)
    assert result.model.lam == 0.5
    # the table's best_loss is the PENALIZED objective: KL(consensus refit)
    # + lam * logdet(W^T W + delta I)
    consensus = result.consensus[3].to_numpy()
    H = result.exposures[3].to_numpy().T
    X = data.to_numpy().T.astype(np.float64)
    recon = consensus.T @ H
    positive = X > 0
    kl = float(
        np.sum(X[positive] * np.log(X[positive] / recon[positive]))
        - X.sum() + recon.sum()
    )
    Wc = consensus.T
    _, logdet = np.linalg.slogdet(Wc.T @ Wc + np.eye(3))
    np.testing.assert_allclose(
        result.table.loc[3, "best_loss"], kl + 0.5 * logdet, rtol=1e-10
    )
    # planted signatures recovered (cosine >= 0.9 after Hungarian match)
    units = consensus / np.linalg.norm(consensus, axis=1, keepdims=True)
    planted_units = W_true / np.linalg.norm(W_true, axis=1, keepdims=True)
    from scipy.optimize import linear_sum_assignment

    rows, cols = linear_sum_assignment(1.0 - planted_units @ units.T)
    assert (planted_units @ units.T)[rows, cols].min() > 0.9

    compacted = sal.extract_signatures(
        data, compact=True, fit_final=False, **kwargs
    )
    for k in (2, 3, 4):
        np.testing.assert_array_equal(
            compacted.replicate_losses[k], result.replicate_losses[k]
        )


def test_extraction_compacted_matches_monolithic(planted):
    """compact=True (lanes + their own bootstrap data gathered as lanes
    converge) is bit-identical to the monolithic lockstep loop on CPU —
    the same invariant test_compaction pins for shared-data multi-starts,
    extended to the batched-data runner."""
    data, _ = planted
    kwargs = dict(
        ranks=[2, 3, 4], n_bootstraps=8, seed=5, min_iterations=50,
        max_iterations=500, dtype=np.float64, fit_final=False,
    )
    plain = sal.extract_signatures(data, compact=False, **kwargs)
    compacted = sal.extract_signatures(data, compact=True, **kwargs)
    for k in (2, 3, 4):
        np.testing.assert_array_equal(
            compacted.replicate_losses[k], plain.replicate_losses[k]
        )
        np.testing.assert_array_equal(
            compacted.replicate_iterations[k], plain.replicate_iterations[k]
        )
        np.testing.assert_array_equal(
            compacted.consensus[k].to_numpy(), plain.consensus[k].to_numpy()
        )
    pd.testing.assert_frame_equal(compacted.table, plain.table)


def test_extraction_lane_chunking_matches_single_chunk(planted):
    """A tiny max_lane_gb forces the discovery lanes into several
    consecutive chunks; results are bit-identical to the single-chunk call
    on CPU (lane draws are (seed, rank, replicate)-keyed, so a lane never
    depends on its co-tenants — the same invariant the lane-independence
    test pins across rank compositions)."""
    data, _ = planted
    kwargs = dict(
        ranks=[2, 3], n_bootstraps=6, seed=2, min_iterations=50,
        max_iterations=500, dtype=np.float64, fit_final=False,
    )
    single = sal.extract_signatures(data, **kwargs)
    # ~20 KB per lane here; 1e-4 GiB ~ 107 KB budget -> 3 chunks of 4
    chunked = sal.extract_signatures(data, max_lane_gb=1e-4, **kwargs)
    for k in (2, 3):
        np.testing.assert_array_equal(
            chunked.replicate_losses[k], single.replicate_losses[k]
        )
        np.testing.assert_array_equal(
            chunked.replicate_iterations[k], single.replicate_iterations[k]
        )
        np.testing.assert_array_equal(
            chunked.consensus[k].to_numpy(), single.consensus[k].to_numpy()
        )
    pd.testing.assert_frame_equal(chunked.table, single.table)
    with pytest.raises(ValueError, match="max_lane_gb"):
        sal.extract_signatures(data, max_lane_gb=0.0, **kwargs)


def test_extraction_resample_residency_fallback(planted, monkeypatch):
    """Beyond the resample-residency budget the driver regenerates the
    (B, V, D) bootstrap stack per chunk instead of keeping it resident;
    results are identical either way (same key, same draw op)."""
    from salamander_tpu import extraction

    data, _ = planted
    kwargs = dict(
        ranks=[2, 3], n_bootstraps=4, seed=2, min_iterations=50,
        max_iterations=300, dtype=np.float64, fit_final=False,
        max_lane_gb=1e-4,  # several chunks, so the fallback re-draws
    )
    resident = sal.extract_signatures(data, **kwargs)
    monkeypatch.setattr(extraction, "_BOOT_RESIDENT_BUDGET_BYTES", 0)
    regenerated = sal.extract_signatures(data, **kwargs)
    for k in (2, 3):
        np.testing.assert_array_equal(
            regenerated.replicate_losses[k], resident.replicate_losses[k]
        )
        np.testing.assert_array_equal(
            regenerated.consensus[k].to_numpy(),
            resident.consensus[k].to_numpy(),
        )
    pd.testing.assert_frame_equal(regenerated.table, resident.table)


def test_rank1_prefix_skips_undefined_silhouette(planted):
    data, _ = planted
    result = sal.extract_signatures(
        data, ranks=[1, 2, 3], n_bootstraps=4, seed=0,
        min_iterations=50, max_iterations=1000, dtype=np.float64,
        fit_final=False,
    )
    assert np.isnan(result.table.loc[1, "min_stability"])
    assert result.suggested_rank in (2, 3)


def test_no_suggestion_warns(planted):
    data, _ = planted
    with pytest.warns(UserWarning, match="falls below min_stability"):
        result = sal.extract_signatures(
            data, ranks=[2, 3], n_bootstraps=4, seed=0,
            min_iterations=50, max_iterations=500, dtype=np.float64,
            min_stability=1.5, fit_final=True,
        )
    assert result.suggested_rank is None
    assert result.model is None


def test_single_bootstrap_warns(planted):
    data, _ = planted
    with pytest.warns(UserWarning, match="silhouettes are undefined"):
        result = sal.extract_signatures(
            data, ranks=[2], n_bootstraps=1, seed=0,
            min_iterations=50, max_iterations=500, dtype=np.float64,
            fit_final=False,
        )
    assert result.suggested_rank is None
    assert np.isnan(result.silhouettes[2]).all()


def test_invalid_inputs(planted):
    data, _ = planted
    with pytest.raises(ValueError, match="positive"):
        sal.extract_signatures(data, ranks=[0, 2])
    with pytest.raises(ValueError, match="exceeds"):
        sal.extract_signatures(data, ranks=[200])
    with pytest.raises(ValueError, match="n_bootstraps"):
        sal.extract_signatures(data, ranks=[2], n_bootstraps=0)
    with pytest.raises(ValueError, match="rank_rule"):
        sal.extract_signatures(data, ranks=[2, 3], rank_rule="knee")


def test_rank_rule_largest_vs_prefix():
    """The two suggestion rules on a silhouette profile with a stability
    GAP — the planted-k-at-cohort-scale shape (config 7b: under-rank fits
    merge well-separated processes differently across replicates, so only
    the true rank is stable). 'largest' recovers it; 'prefix' (the
    conservative tl.suggest_rank semantics) refuses."""
    from salamander_tpu.extraction import _suggest_rank

    ranks = np.array([2, 3, 4, 5, 6])
    gap = np.array([0.9, 0.6, 0.7, 0.95, 0.3])
    assert _suggest_rank(ranks, gap, 0.8, "largest") == 5
    assert _suggest_rank(ranks, gap, 0.8, "prefix") == 2

    # contiguous profile: both rules agree on the boundary
    contiguous = np.array([0.95, 0.9, 0.85, 0.4, 0.3])
    assert _suggest_rank(ranks, contiguous, 0.8, "largest") == 4
    assert _suggest_rank(ranks, contiguous, 0.8, "prefix") == 4

    # leading NaN (rank 1's undefined silhouette) is skipped by both
    lead_nan = np.array([np.nan, 0.9, 0.85, 0.4, 0.4])
    assert _suggest_rank(ranks, lead_nan, 0.8, "largest") == 4
    assert _suggest_rank(ranks, lead_nan, 0.8, "prefix") == 4

    with pytest.warns(UserWarning, match="every scanned rank falls below"):
        assert _suggest_rank(ranks, gap, 0.99, "largest") is None
    with pytest.warns(UserWarning, match="smallest measurable rank"):
        assert _suggest_rank(
            ranks, np.array([0.5, 0.9, 0.9, 0.9, 0.9]), 0.8, "prefix"
        ) is None
    with pytest.warns(UserWarning, match="silhouettes are undefined"):
        assert _suggest_rank(
            ranks, np.full(5, np.nan), 0.8, "largest"
        ) is None


def test_rank_rule_prefix_through_pipeline(planted, extracted):
    """rank_rule='prefix' threads through extract_signatures; on the
    contiguous planted profile it matches the default suggestion."""
    data, _ = planted
    result = sal.extract_signatures(
        data, ranks=range(2, 5), n_bootstraps=6, seed=0, rank_rule="prefix",
        min_iterations=100, max_iterations=2000, dtype=np.float64,
        fit_final=False,
    )
    assert result.suggested_rank == extracted.suggested_rank == 3


# --------------------------------------------------------------------- #
# resampler
# --------------------------------------------------------------------- #


def test_resample_counts_multinomial_preserves_totals():
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.poisson(20.0, size=(12, 30)).astype(np.float64))
    draws = np.asarray(
        resample_counts(X, jax.random.PRNGKey(0), 5, "multinomial")
    )
    assert draws.shape == (5, 12, 30)
    totals = np.asarray(X.sum(axis=0))
    np.testing.assert_allclose(
        draws.sum(axis=1), np.broadcast_to(totals, (5, 30))
    )
    assert not np.array_equal(draws[0], draws[1])


def test_resample_counts_poisson_varies_totals():
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.poisson(20.0, size=(12, 30)).astype(np.float64))
    draws = np.asarray(
        resample_counts(X, jax.random.PRNGKey(0), 5, "poisson")
    )
    assert draws.shape == (5, 12, 30)
    totals = np.asarray(X.sum(axis=0))
    assert not np.allclose(draws.sum(axis=1), totals[None, :])
    # unbiasedness sanity at the matrix level
    assert abs(draws.mean() - np.asarray(X).mean()) < 1.0
    with pytest.raises(ValueError, match="unknown bootstrap method"):
        resample_counts(X, jax.random.PRNGKey(0), 2, "jackknife")


# --------------------------------------------------------------------- #
# clustering + silhouettes
# --------------------------------------------------------------------- #


def test_consensus_cluster_recovers_permuted_replicates():
    """Replicates that are column-permuted noisy copies of k prototypes
    must cluster back onto the prototypes regardless of their order."""
    rng = np.random.default_rng(5)
    k, n_features, n_replicates = 4, 20, 8
    prototypes = rng.dirichlet(np.full(n_features, 0.5), size=k)
    stack = np.empty((n_replicates, k, n_features))
    perms = []
    for b in range(n_replicates):
        perm = rng.permutation(k)
        perms.append(perm)
        noisy = prototypes[perm] * rng.uniform(0.95, 1.05, (k, n_features))
        stack[b] = noisy / noisy.sum(axis=1, keepdims=True)
    consensus, matched, _, cosines = _consensus_cluster(stack, 0)
    # every cluster is one prototype (in replicate 0's order)
    units_c = consensus / np.linalg.norm(consensus, axis=1, keepdims=True)
    units_p = prototypes / np.linalg.norm(prototypes, axis=1, keepdims=True)
    sim = units_c @ units_p[perms[0]].T
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-3)
    assert np.all(cosines > 0.999)
    silhouette = _cluster_silhouettes(matched)
    assert np.all(silhouette > 0.9)


def test_silhouette_matches_sklearn():
    pytest.importorskip("sklearn")
    from sklearn.metrics import silhouette_samples

    rng = np.random.default_rng(9)
    n_replicates, k, n_features = 6, 3, 10
    matched = rng.uniform(0.1, 1.0, size=(n_replicates, k, n_features))
    ours = _cluster_silhouettes(matched)
    units = matched / np.linalg.norm(matched, axis=-1, keepdims=True)
    points = units.transpose(1, 0, 2).reshape(k * n_replicates, n_features)
    labels = np.repeat(np.arange(k), n_replicates)
    theirs = silhouette_samples(points, labels, metric="cosine")
    np.testing.assert_allclose(
        ours, theirs.reshape(k, n_replicates).mean(axis=1), atol=1e-10
    )


def test_silhouette_undefined_cases():
    assert np.isnan(_cluster_silhouettes(np.ones((1, 3, 5)))).all()
    assert np.isnan(_cluster_silhouettes(np.ones((4, 1, 5)))).all()


# --------------------------------------------------------------------- #
# preemption-safe checkpointing
# --------------------------------------------------------------------- #


def _result_equal(a, b):
    pd.testing.assert_frame_equal(a.table, b.table)
    assert a.suggested_rank == b.suggested_rank
    for k in a.consensus:
        np.testing.assert_array_equal(
            a.consensus[k].to_numpy(), b.consensus[k].to_numpy()
        )
        np.testing.assert_array_equal(
            a.exposures[k].to_numpy(), b.exposures[k].to_numpy()
        )
        np.testing.assert_array_equal(
            a.replicate_losses[k], b.replicate_losses[k]
        )


def test_checkpoint_roundtrip_and_full_resume(planted, tmp_path, monkeypatch):
    """A checkpointed run equals the plain run bitwise (CPU); resuming with
    the store complete performs ZERO device work — both the discovery fit
    and every consensus refit are stubbed to raise."""
    import salamander_tpu.extraction as extraction
    import salamander_tpu.ops.assign as ops_assign

    data, _ = planted
    kwargs = dict(
        ranks=[2, 3], n_bootstraps=4, seed=3, min_iterations=50,
        max_iterations=500, dtype=np.float64, fit_final=False,
        max_lane_gb=6e-5,  # force several discovery chunks
    )
    baseline = sal.extract_signatures(data, **kwargs)
    store = tmp_path / "ckpt"
    first = sal.extract_signatures(data, checkpoint_dir=store, **kwargs)
    _result_equal(first, baseline)
    chunk_files = sorted(store.glob("chunk_*.npz"))
    rank_files = sorted(store.glob("rank_*.npz"))
    assert len(chunk_files) >= 2 and len(rank_files) == 2
    assert (store / "meta.json").exists()

    def boom(*args, **bkwargs):
        raise AssertionError("resume must not recompute completed work")

    monkeypatch.setattr(extraction, "make_fit_function", boom)
    monkeypatch.setattr(ops_assign, "refit_exposures_guarded", boom)
    resumed = sal.extract_signatures(data, checkpoint_dir=store, **kwargs)
    _result_equal(resumed, baseline)


def test_checkpoint_partial_resume_recomputes_only_missing(
    planted, tmp_path, monkeypatch
):
    """Deleting one chunk and one rank file simulates a mid-run kill:
    resume recomputes exactly the missing pieces and matches the
    uninterrupted run bitwise."""
    import salamander_tpu.extraction as extraction
    import salamander_tpu.ops.assign as ops_assign

    data, _ = planted
    kwargs = dict(
        ranks=[2, 3], n_bootstraps=4, seed=3, min_iterations=50,
        max_iterations=500, dtype=np.float64, fit_final=False,
        max_lane_gb=6e-5,
    )
    store = tmp_path / "ckpt"
    full = sal.extract_signatures(data, checkpoint_dir=store, **kwargs)
    chunk_files = sorted(store.glob("chunk_*.npz"))
    chunk_files[1].unlink()
    (store / "rank_003.npz").unlink()

    fit_calls, refit_calls = [], []
    real_fit = extraction.make_fit_function
    real_refit = ops_assign.refit_exposures_guarded

    def counting_fit(*args, **fkwargs):
        fit_calls.append(1)
        return real_fit(*args, **fkwargs)

    def counting_refit(*args, **rkwargs):
        refit_calls.append(1)
        return real_refit(*args, **rkwargs)

    monkeypatch.setattr(extraction, "make_fit_function", counting_fit)
    monkeypatch.setattr(ops_assign, "refit_exposures_guarded", counting_refit)
    resumed = sal.extract_signatures(data, checkpoint_dir=store, **kwargs)
    assert len(fit_calls) == 1      # one missing discovery chunk
    assert len(refit_calls) == 1    # one missing rank refit
    _result_equal(resumed, full)


def test_checkpoint_mismatch_discards_store(planted, tmp_path):
    """A store written by a different run (other seed) is detected via
    meta.json, warned about, wiped and rebuilt — never silently mixed."""
    data, _ = planted
    shared = dict(
        ranks=[2, 3], n_bootstraps=4, min_iterations=50,
        max_iterations=500, dtype=np.float64, fit_final=False,
    )
    store = tmp_path / "ckpt"
    sal.extract_signatures(data, seed=3, checkpoint_dir=store, **shared)
    baseline5 = sal.extract_signatures(data, seed=5, **shared)
    with pytest.warns(UserWarning, match="different run"):
        resumed = sal.extract_signatures(
            data, seed=5, checkpoint_dir=store, **shared
        )
    _result_equal(resumed, baseline5)


# --------------------------------------------------------------------- #
# semi-supervised extraction (given_signatures)
# --------------------------------------------------------------------- #


def test_given_signatures_semisupervised(planted):
    """One planted signature supplied as given: lanes carry it frozen,
    the scan discovers the remaining two, and the result frames carry
    given + new with the given row bit-exact."""
    data, W_true = planted  # 3 planted row signatures
    given = pd.DataFrame(
        W_true[:1], index=["Known1"], columns=data.columns
    )
    result = sal.extract_signatures(
        data, ranks=[1, 2, 3], n_bootstraps=6, seed=0,
        min_iterations=100, max_iterations=2000, dtype=np.float64,
        given_signatures=given,
    )
    assert result.suggested_rank == 2  # 2 NEW signatures on top of 1 given

    cons = result.consensus[2]
    assert cons.shape == (3, data.shape[1])  # given + 2 new, full frame
    assert list(cons.index) == ["Known1", "Sig1", "Sig2"]
    # the given row is the aligned given signature EXACTLY (frozen columns
    # never move through the masked updates)
    from salamander_tpu.ops.klnmf import EPSILON

    aligned = np.maximum(W_true[0], EPSILON)
    aligned = aligned / aligned.sum()
    np.testing.assert_array_equal(cons.to_numpy()[0], aligned)

    # the two new consensus signatures recover the other planted processes
    units = cons.to_numpy()[1:]
    units = units / np.linalg.norm(units, axis=1, keepdims=True)
    rest = W_true[1:] / np.linalg.norm(W_true[1:], axis=1, keepdims=True)
    sim = rest @ units.T
    from scipy.optimize import linear_sum_assignment

    r, c = linear_sum_assignment(1.0 - sim)
    assert np.all(sim[r, c] > 0.95)

    # stability/silhouettes are NEW-signature quantities
    assert result.silhouettes[2].shape == (2,)
    assert result.matched[2].shape[1] == 2
    # exposures and the final model span given + new
    assert result.exposures[2].shape == (data.shape[0], 3)
    assert result.model is not None
    assert result.model.signatures.shape[0] == 3  # (signatures, features)
    np.testing.assert_array_equal(
        np.asarray(result.model.asignatures.X)[0], aligned
    )


def test_given_signatures_name_rolling_and_mvnmf(planted):
    """Given names colliding with the Sig{j} scheme roll the new names
    forward (reference initialize_base semantics); the min-vol family
    threads n_given through its masked line search too."""
    data, W_true = planted
    given = pd.DataFrame(
        W_true[:1], index=["Sig1"], columns=data.columns
    )
    result = sal.extract_signatures(
        data, ranks=[2], n_bootstraps=3, seed=1,
        min_iterations=50, max_iterations=500, dtype=np.float64,
        given_signatures=given, model="mvnmf", fit_final=False,
        min_stability=0.0,
    )
    assert list(result.consensus[2].index) == ["Sig1", "Sig2", "Sig3"]
    from salamander_tpu.ops.klnmf import EPSILON

    aligned = np.maximum(W_true[0], EPSILON)
    aligned = aligned / aligned.sum()
    np.testing.assert_array_equal(
        result.consensus[2].to_numpy()[0], aligned
    )
