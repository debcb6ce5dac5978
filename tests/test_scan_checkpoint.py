"""Preemption-safe resume for the long-running scan drivers and
fit_best_of (checkpoint.ChunkStore entries per rank / point / restart
chunk): checkpointed == plain bitwise on CPU, a complete store resumes
with ZERO recompute, a partial store recomputes exactly the missing
pieces, and a mismatched store is discarded with a warning."""

import numpy as np
import pytest

from salamander_tpu.containers import AnnData
from salamander_tpu.engine import FitConfig
from salamander_tpu.models import CorrNMFDet, KLNMF
from salamander_tpu.parallel import (
    fit_best_of,
    rank_scan_corrnmf,
    rank_scan_klnmf,
    rank_scan_mvnmf,
)


@pytest.fixture(scope="module")
def counts():
    rng = np.random.default_rng(7)
    V, D, K = 12, 24, 3
    W = rng.dirichlet(np.ones(V) * 0.4, size=K)
    H = rng.gamma(2.0, 50.0, size=(D, K))
    return rng.poisson(H @ W).astype(np.float64).T + 1.0  # (V, D)


CFG = FitConfig(min_iterations=30, max_iterations=120, conv_test_freq=10,
                tol=1e-6)


def _scan_equal(a, b):
    assert sorted(a) == sorted(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k].W), np.asarray(b[k].W))
        np.testing.assert_array_equal(np.asarray(a[k].H), np.asarray(b[k].H))
        np.testing.assert_array_equal(a[k].losses, b[k].losses)
        np.testing.assert_array_equal(a[k].n_iterations, b[k].n_iterations)
        assert a[k].best_index == b[k].best_index


def test_rank_scan_klnmf_checkpoint_roundtrip_and_resume(
    counts, tmp_path, monkeypatch
):
    from salamander_tpu.parallel import restarts

    kwargs = dict(n_restarts=4, seed=2, config=CFG, dtype=np.float64)
    baseline = rank_scan_klnmf(counts, [2, 3], **kwargs)
    store = tmp_path / "ckpt"
    first = rank_scan_klnmf(counts, [2, 3], checkpoint_dir=store, **kwargs)
    _scan_equal(first, baseline)
    assert sorted(p.name for p in store.glob("rank*.npz")) == [
        "rank2.npz", "rank3.npz",
    ]

    def boom(*args, **bkwargs):
        raise AssertionError("resume must not recompute completed ranks")

    # every CPU scan path initializes through _padded_random_init
    monkeypatch.setattr(restarts, "_padded_random_init", boom)
    resumed = rank_scan_klnmf(counts, [2, 3], checkpoint_dir=store, **kwargs)
    _scan_equal(resumed, baseline)


def test_rank_scan_klnmf_partial_resume(counts, tmp_path, monkeypatch):
    from salamander_tpu.parallel import restarts

    kwargs = dict(n_restarts=4, seed=2, config=CFG, dtype=np.float64)
    store = tmp_path / "ckpt"
    full = rank_scan_klnmf(counts, [2, 3], checkpoint_dir=store, **kwargs)
    (store / "rank3.npz").unlink()

    calls = []
    real = restarts._padded_random_init

    def counting(*args, **ckwargs):
        calls.append(1)
        return real(*args, **ckwargs)

    monkeypatch.setattr(restarts, "_padded_random_init", counting)
    resumed = rank_scan_klnmf(counts, [2, 3], checkpoint_dir=store, **kwargs)
    assert len(calls) == 1  # only the deleted rank recomputed
    _scan_equal(resumed, full)


def test_rank_scan_klnmf_checkpoint_mismatch_discards(counts, tmp_path):
    kwargs = dict(n_restarts=4, config=CFG, dtype=np.float64)
    store = tmp_path / "ckpt"
    rank_scan_klnmf(counts, [2, 3], seed=2, checkpoint_dir=store, **kwargs)
    baseline5 = rank_scan_klnmf(counts, [2, 3], seed=5, **kwargs)
    with pytest.warns(UserWarning, match="different run"):
        resumed = rank_scan_klnmf(
            counts, [2, 3], seed=5, checkpoint_dir=store, **kwargs
        )
    _scan_equal(resumed, baseline5)


def test_rank_scan_mvnmf_checkpoint_roundtrip(counts, tmp_path):
    kwargs = dict(n_restarts=3, seed=1, config=CFG, dtype=np.float64)
    baseline = rank_scan_mvnmf(counts, [2, 3], **kwargs)
    store = tmp_path / "ckpt"
    first = rank_scan_mvnmf(counts, [2, 3], checkpoint_dir=store, **kwargs)
    _scan_equal(first, baseline)
    # complete store: a rerun loads host entries only
    resumed = rank_scan_mvnmf(counts, [2, 3], checkpoint_dir=store, **kwargs)
    _scan_equal(resumed, baseline)
    assert isinstance(resumed[2].W, np.ndarray)


def test_rank_scan_corrnmf_checkpoint_roundtrip_and_resume(
    counts, tmp_path, monkeypatch
):
    from salamander_tpu.parallel import corrnmf_scan

    X = counts.T  # (samples, features) model orientation
    kwargs = dict(dim_embeddings=2, n_restarts=2, base_seed=4, config=CFG)
    baseline = rank_scan_corrnmf(X, [2, 3], **kwargs)
    store = tmp_path / "ckpt"
    first = rank_scan_corrnmf(X, [2, 3], checkpoint_dir=store, **kwargs)

    def point_equal(a, b, with_model=True):
        np.testing.assert_array_equal(a.losses, b.losses)
        np.testing.assert_array_equal(a.n_iterations, b.n_iterations)
        assert a.best_index == b.best_index
        for key in a.best_params:
            np.testing.assert_array_equal(
                a.best_params[key], b.best_params[key]
            )
        np.testing.assert_array_equal(a.signatures, b.signatures)
        if with_model:
            np.testing.assert_array_equal(
                np.asarray(a.model.signatures),
                np.asarray(b.model.signatures),
            )
            assert (a.model.history["n_iterations"]
                    == b.model.history["n_iterations"])

    for k in (2, 3):
        point_equal(first[k], baseline[k])

    calls = []
    real = corrnmf_scan.rank_scan_corrnmf

    def counting(*args, **ckwargs):
        calls.append(1)
        return real(*args, **ckwargs)

    monkeypatch.setattr(corrnmf_scan, "rank_scan_corrnmf", counting)
    resumed = rank_scan_corrnmf(X, [2, 3], checkpoint_dir=store, **kwargs)
    assert calls == []  # complete store: zero recompute
    for k in (2, 3):
        point_equal(resumed[k], baseline[k])

    # partial resume: exactly one recursive singleton call
    (store / "point_k3_m2.npz").unlink()
    resumed = rank_scan_corrnmf(X, [2, 3], checkpoint_dir=store, **kwargs)
    assert len(calls) == 1
    for k in (2, 3):
        point_equal(resumed[k], baseline[k])


def test_fit_best_of_checkpoint_roundtrip_and_resume(
    counts, tmp_path, monkeypatch
):
    from salamander_tpu.parallel import multistart

    adata = AnnData(counts.T)

    def make_model():
        return KLNMF(n_signatures=3, init_method="random",
                     min_iterations=30, max_iterations=120,
                     conv_test_freq=10, tol=1e-6)

    def summaries_equal(a, b):
        np.testing.assert_array_equal(a.losses, b.losses)
        np.testing.assert_array_equal(a.n_iterations, b.n_iterations)
        assert a.best_index == b.best_index
        np.testing.assert_array_equal(a.history, b.history)
        np.testing.assert_array_equal(a.signatures, b.signatures)

    model = make_model()
    baseline = fit_best_of(model, AnnData(counts.T.copy()), 4, base_seed=0)
    base_sigs = np.asarray(model.asignatures.X)

    store = tmp_path / "ckpt"
    model = make_model()
    first = fit_best_of(model, AnnData(counts.T.copy()), 4, base_seed=0,
                        checkpoint_dir=store)
    summaries_equal(first, baseline)
    np.testing.assert_array_equal(np.asarray(model.asignatures.X), base_sigs)

    def boom(*args, **bkwargs):
        raise AssertionError("resume must not recompute completed chunks")

    monkeypatch.setattr(multistart, "make_fit_function", boom)
    model = make_model()
    resumed = fit_best_of(model, AnnData(counts.T.copy()), 4, base_seed=0,
                          checkpoint_dir=store)
    summaries_equal(resumed, baseline)
    np.testing.assert_array_equal(np.asarray(model.asignatures.X), base_sigs)

    # given_parameters cannot be fingerprinted -> explicit refusal
    with pytest.raises(ValueError, match="given_parameters"):
        fit_best_of(
            make_model(), AnnData(counts.T.copy()), 4, base_seed=0,
            checkpoint_dir=tmp_path / "ckpt2",
            given_parameters={"asignatures": model.asignatures},
        )
    del adata


def test_fit_best_of_restart_chunks_match_monolithic(counts, tmp_path):
    """Chunked restarts (the checkpoint granularity) reproduce the
    single-call run bitwise on CPU (per-lane lockstep trajectories are
    co-tenant-independent), and a chunked checkpointed run resumes from
    per-chunk entries."""
    def make_model():
        return KLNMF(n_signatures=3, init_method="random",
                     min_iterations=30, max_iterations=120,
                     conv_test_freq=10, tol=1e-6)

    plain = fit_best_of(make_model(), AnnData(counts.T.copy()), 4,
                        base_seed=0)
    chunked = fit_best_of(make_model(), AnnData(counts.T.copy()), 4,
                          base_seed=0, restart_chunk=2)
    np.testing.assert_array_equal(plain.losses, chunked.losses)
    np.testing.assert_array_equal(plain.history, chunked.history)
    assert plain.best_index == chunked.best_index

    store = tmp_path / "ckpt"
    first = fit_best_of(make_model(), AnnData(counts.T.copy()), 4,
                        base_seed=0, restart_chunk=2, checkpoint_dir=store)
    assert sorted(p.name for p in store.glob("restarts_*.npz")) == [
        "restarts_0_2.npz", "restarts_2_4.npz",
    ]
    (store / "restarts_2_4.npz").unlink()
    resumed = fit_best_of(make_model(), AnnData(counts.T.copy()), 4,
                          base_seed=0, restart_chunk=2,
                          checkpoint_dir=store)
    np.testing.assert_array_equal(resumed.losses, first.losses)
    np.testing.assert_array_equal(resumed.signatures, first.signatures)


def test_generic_rank_scan_splits_checkpoint_per_rank(counts, tmp_path):
    """rank_scan (the generic fit_best_of driver) splits checkpoint_dir
    into per-rank stores - sharing one ChunkStore would wipe the previous
    rank's entries on every point (run identities differ)."""
    from salamander_tpu.parallel import rank_scan

    def factory(k):
        return KLNMF(n_signatures=k, init_method="random",
                     min_iterations=20, max_iterations=60,
                     conv_test_freq=10, tol=1e-6)

    store = tmp_path / "ckpt"
    first = rank_scan(factory, AnnData(counts.T.copy()), [2, 3], 3,
                      base_seed=0, checkpoint_dir=store)
    assert (store / "rank2" / "meta.json").exists()
    assert (store / "rank3" / "meta.json").exists()
    resumed = rank_scan(factory, AnnData(counts.T.copy()), [2, 3], 3,
                        base_seed=0, checkpoint_dir=store)
    for k in (2, 3):
        np.testing.assert_array_equal(first[k][1].losses,
                                      resumed[k][1].losses)


def test_fit_best_of_checkpoint_multimodal(counts, tmp_path):
    """The checkpoint path round-trips the NESTED multimodal params
    pytree (mods dict) and resumes bitwise."""
    from salamander_tpu.containers import AnnData, MuData
    from salamander_tpu.models import MultimodalCorrNMF

    rng = np.random.default_rng(3)
    other = rng.poisson(25.0, size=(counts.shape[1], 7)) + 1.0

    def mdata():
        return MuData({
            "a": AnnData(counts.T.copy()),
            "b": AnnData(other.astype(np.float64).copy()),
        })

    def make_model():
        return MultimodalCorrNMF(ns_signatures=[2, 2], dim_embeddings=2,
                                 init_method="random", min_iterations=10,
                                 max_iterations=30, conv_test_freq=10,
                                 tol=1e-6)

    store = tmp_path / "ckpt"
    first = fit_best_of(make_model(), mdata(), 3, base_seed=0,
                        checkpoint_dir=store)
    assert (store / "restarts_0_3.npz").exists()
    resumed = fit_best_of(make_model(), mdata(), 3, base_seed=0,
                          checkpoint_dir=store)
    np.testing.assert_array_equal(first.losses, resumed.losses)
    for name in ("a", "b"):
        np.testing.assert_array_equal(first.signatures[name],
                                      resumed.signatures[name])
