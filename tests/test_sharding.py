"""Sharding semantics on the 8-virtual-device CPU mesh: sample-sharded
CorrNMF EM updates and restart-sharded generic multi-start must match their
unsharded twins exactly (XLA inserts the collectives; numerics unchanged)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from salamander_tpu.containers import AnnData
from salamander_tpu.models import KLNMF, CorrNMFDet
from salamander_tpu.ops import corrnmf
from salamander_tpu.parallel import fit_best_of, make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def corr_state():
    rng = np.random.default_rng(0)
    D, V, K, m = 64, 16, 4, 2
    S = rng.dirichlet(np.ones(V), K)
    L = rng.normal(size=(K, m))
    U = rng.normal(size=(D, m))
    sig_scal = rng.normal(size=K) * 0.1
    smp_scal = rng.normal(size=D) * 0.1
    E = np.exp(sig_scal[:, None] + smp_scal[None, :] + L @ U.T).T
    X = np.clip(rng.poisson(E @ S * 50.0), np.finfo(np.float32).eps, None)
    return dict(X=X, S=S, L=L, U=U, sig_scal=sig_scal, smp_scal=smp_scal)


def test_sample_sharded_corrnmf_updates_match(corr_state):
    """One full CorrNMF EM cycle with X/U/exposures sharded over samples must
    equal the unsharded cycle; the signature-side reductions become
    all-reduces over the sample axis."""
    mesh = make_mesh(jax.devices()[:8], sample_ways=8)
    shard_samples = NamedSharding(mesh, P("samples"))
    replicated = NamedSharding(mesh, P())

    def em_cycle(X, S, L, U, sig_scal, smp_scal):
        smp_scal = corrnmf.update_sample_scalings(X, sig_scal, L, U)
        E = corrnmf.compute_exposures(sig_scal, smp_scal, L, U)
        aux = corrnmf.compute_aux(X, S, E)
        sig_scal = corrnmf.update_signature_scalings(aux, smp_scal, L, U)
        L = corrnmf.update_embeddings(L, U, sig_scal, smp_scal, 1.0, aux,
                                      max_iter=20)
        U = corrnmf.update_embeddings(U, L, smp_scal, sig_scal, 1.0, aux.T,
                                      max_iter=3)
        return S, L, U, sig_scal, smp_scal

    args = (
        corr_state["X"], corr_state["S"], corr_state["L"], corr_state["U"],
        corr_state["sig_scal"], corr_state["smp_scal"],
    )
    baseline = jax.jit(em_cycle)(*args)

    sharded_args = (
        jax.device_put(corr_state["X"], shard_samples),      # (D, V) on D
        jax.device_put(corr_state["S"], replicated),
        jax.device_put(corr_state["L"], replicated),
        jax.device_put(corr_state["U"], shard_samples),      # (D, m) on D
        jax.device_put(corr_state["sig_scal"], replicated),
        jax.device_put(corr_state["smp_scal"], shard_samples),
    )
    sharded = jax.jit(em_cycle)(*sharded_args)

    # U runs a data-dependent Newton/line-search whose stopping comparisons
    # can flip on 1-ulp partitioned-execution differences; everything else
    # must match to fp noise.
    tolerances = {"S": 1e-12, "L": 1e-12, "U": 1e-6, "sig": 1e-12,
                  "smp": 1e-12}
    for name, a, b in zip("S L U sig smp".split(), baseline, sharded):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=tolerances[name],
            err_msg=f"mismatch in {name}",
        )


def test_sample_sharded_svi_steps_match(corr_state):
    """Minibatch (SVI) steps with X and the sample-axis parameters sharded
    over the mesh's sample axis must equal the unsharded run: the minibatch
    gather/scatter and the epoch reshuffle compile to collectives without
    changing numerics (the ops/svi.py mesh-compatibility claim)."""
    from salamander_tpu.ops import svi

    mesh = make_mesh(jax.devices()[:8], sample_ways=8)
    shard_samples = NamedSharding(mesh, P("samples"))
    replicated = NamedSharding(mesh, P())

    D = corr_state["X"].shape[0]
    params = {
        "signatures": jnp.asarray(corr_state["S"]),
        "signature_scalings": jnp.asarray(corr_state["sig_scal"]),
        "sample_scalings": jnp.asarray(corr_state["smp_scal"]),
        "signature_embeddings": jnp.asarray(corr_state["L"]),
        "sample_embeddings": jnp.asarray(corr_state["U"]),
        "variance": jnp.asarray(1.0),
    }
    X = jnp.asarray(corr_state["X"])
    step_fn = svi.make_svi_step(D, svi.SVIConfig(batch_size=16))
    key = jax.random.PRNGKey(7)

    # 6 steps crosses an epoch boundary at B=16, D=64 (reshuffle on step 4)
    baseline, base_hist = svi.run_svi(
        step_fn, svi.svi_init(params), X, key, n_steps=6, eval_freq=3
    )

    sharded_params = dict(params)
    for name in ("sample_scalings", "sample_embeddings"):
        sharded_params[name] = jax.device_put(params[name], shard_samples)
    for name in ("signatures", "signature_scalings",
                 "signature_embeddings", "variance"):
        sharded_params[name] = jax.device_put(params[name], replicated)
    sharded, shard_hist = svi.run_svi(
        step_fn, svi.svi_init(sharded_params),
        jax.device_put(X, shard_samples), key, n_steps=6, eval_freq=3,
    )

    np.testing.assert_allclose(
        np.asarray(base_hist), np.asarray(shard_hist), rtol=1e-12
    )
    for name in baseline.params:
        np.testing.assert_allclose(
            np.asarray(sharded.params[name]),
            np.asarray(baseline.params[name]),
            rtol=1e-9, err_msg=name,
        )


def test_fit_best_of_with_mesh_matches_unsharded(reference_data_path):
    import pandas as pd

    counts = pd.read_csv(
        reference_data_path / "models" / "klnmf" / "counts.csv", index_col=0
    ).T
    mesh = make_mesh(jax.devices()[:8], sample_ways=1)

    model_a = KLNMF(n_signatures=2, init_method="random",
                    min_iterations=20, max_iterations=60)
    summary_a = fit_best_of(model_a, AnnData(counts.copy()), n_restarts=8,
                            base_seed=0)
    model_b = KLNMF(n_signatures=2, init_method="random",
                    min_iterations=20, max_iterations=60)
    summary_b = fit_best_of(model_b, AnnData(counts.copy()), n_restarts=8,
                            base_seed=0, mesh=mesh)
    np.testing.assert_allclose(summary_b.losses, summary_a.losses, rtol=1e-10)
    assert summary_b.best_index == summary_a.best_index


def test_fit_best_of_corrnmf_with_mesh(reference_data_path):
    import pandas as pd

    counts = pd.read_csv(
        reference_data_path / "models" / "corrnmf" / "counts.csv", index_col=0
    ).T
    mesh = make_mesh(jax.devices()[:8], sample_ways=1)
    model = CorrNMFDet(n_signatures=2, dim_embeddings=2,
                       min_iterations=10, max_iterations=20)
    summary = fit_best_of(model, AnnData(counts), n_restarts=8, base_seed=0,
                          mesh=mesh)
    assert np.all(np.isfinite(summary.losses))
    assert summary.best_index == int(np.argmax(summary.losses))


@pytest.mark.parametrize("family", ["klnmf", "mvnmf", "ardnmf", "corrnmf"])
def test_model_fit_with_mesh_matches_unsharded(corr_state, family):
    """model.fit(adata, mesh=...) - the user-facing single-fit sharding -
    must reproduce the unsharded fit: same trace, same parameters (the
    sample axis of X and the per-sample parameters shard over the mesh;
    XLA's inserted all-reduces don't change f64 numerics beyond ulps)."""
    from salamander_tpu.models import ARDNMF, MvNMF

    X = corr_state["X"]  # (64, 16) samples x features

    def build():
        if family == "klnmf":
            return KLNMF(n_signatures=3, min_iterations=20,
                         max_iterations=60)
        if family == "mvnmf":
            return MvNMF(n_signatures=3, min_iterations=20,
                         max_iterations=60)
        if family == "ardnmf":
            return ARDNMF(n_signatures=4, min_iterations=20,
                          max_iterations=60)
        return CorrNMFDet(n_signatures=3, dim_embeddings=2,
                          min_iterations=10, max_iterations=30)

    init_kwargs = {"seed": 0}
    plain = build().fit(AnnData(X.copy()), init_kwargs=init_kwargs)

    mesh = make_mesh(jax.devices()[:8], sample_ways=4)
    sharded = build().fit(AnnData(X.copy()), init_kwargs=init_kwargs,
                          mesh=mesh)

    assert sharded.history["n_iterations"] == plain.history["n_iterations"]
    np.testing.assert_allclose(
        sharded.history["objective_function"],
        plain.history["objective_function"], rtol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.asignatures.X), np.asarray(plain.asignatures.X),
        rtol=1e-7,
    )
    np.testing.assert_allclose(
        sharded.adata.obsm["exposures"], plain.adata.obsm["exposures"],
        rtol=1e-6,
    )


def test_model_fit_mesh_rejects_bad_axis(corr_state):
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("lanes",))
    model = KLNMF(n_signatures=2, min_iterations=10, max_iterations=20)
    with pytest.raises(ValueError, match="samples"):
        model.fit(AnnData(corr_state["X"].copy()), mesh=mesh)


@pytest.fixture(scope="module")
def mm_cohort():
    """Two planted modalities over the same 48 samples (ragged features
    and signature counts)."""
    rng = np.random.default_rng(5)
    D = 48
    mods = {}
    for name, V, K in [("sbs", 14, 2), ("indel", 9, 3)]:
        W = rng.dirichlet(np.ones(V) * 0.5, size=K)
        H = rng.gamma(2.0, 30.0, size=(D, K))
        mods[name] = np.clip(
            rng.poisson(H @ W).astype(float), np.finfo(np.float32).eps, None
        )
    return mods


def _make_mdata(mods):
    from salamander_tpu.containers import MuData

    return MuData({
        name: AnnData(X.copy()) for name, X in mods.items()
    })


def test_mmcorrnmf_fit_with_mesh_matches_unsharded(mm_cohort):
    """MultimodalCorrNMF.fit(mesh=...) shards the shared sample axis; the
    joint sample-embedding solve is sample-local and the signature-side
    aux reductions all-reduce - numerics must match the unsharded fit."""
    from salamander_tpu.models import MultimodalCorrNMF

    def build():
        return MultimodalCorrNMF(
            ns_signatures=[2, 3], dim_embeddings=2,
            min_iterations=10, max_iterations=30,
        )

    plain = build().fit(_make_mdata(mm_cohort), init_kwargs={"seed": 0})
    mesh = make_mesh(jax.devices()[:8], sample_ways=4)
    sharded = build().fit(_make_mdata(mm_cohort), init_kwargs={"seed": 0},
                          mesh=mesh)

    assert sharded.history["n_iterations"] == plain.history["n_iterations"]
    np.testing.assert_allclose(
        sharded.history["objective_function"],
        plain.history["objective_function"], rtol=1e-9,
    )
    for name in plain.mod_names:
        np.testing.assert_allclose(
            np.asarray(sharded.asignatures[name].X),
            np.asarray(plain.asignatures[name].X), rtol=1e-7,
            err_msg=f"signatures[{name}]",
        )
        np.testing.assert_allclose(
            sharded.mdata[name].obsm["exposures"],
            plain.mdata[name].obsm["exposures"], rtol=1e-6,
            err_msg=f"exposures[{name}]",
        )
    np.testing.assert_allclose(
        sharded.mdata.obsm["embeddings"], plain.mdata.obsm["embeddings"],
        rtol=1e-6,
    )


def test_mmcorrnmf_fit_minibatch_with_mesh_matches_unsharded(mm_cohort):
    from salamander_tpu.models import MultimodalCorrNMF

    def build():
        return MultimodalCorrNMF(
            ns_signatures=[2, 3], dim_embeddings=2,
        )

    kwargs = dict(batch_size=16, n_steps=6, eval_freq=3, seed=3,
                  init_kwargs={"seed": 0})
    plain = build().fit_minibatch(_make_mdata(mm_cohort), **kwargs)
    mesh = make_mesh(jax.devices()[:8], sample_ways=4)
    sharded = build().fit_minibatch(_make_mdata(mm_cohort), mesh=mesh,
                                    **kwargs)
    np.testing.assert_allclose(
        sharded.history["objective_function"],
        plain.history["objective_function"], rtol=1e-9,
    )
    # the joint sample-embedding update runs a data-dependent Newton/line
    # search whose stopping comparisons can flip on 1-ulp partitioned
    # execution differences (same rationale as the EM-cycle test's U pin)
    np.testing.assert_allclose(
        sharded.mdata.obsm["embeddings"], plain.mdata.obsm["embeddings"],
        rtol=1e-6,
    )


def test_mmcorrnmf_mesh_rejects_streaming_and_compat(mm_cohort):
    from salamander_tpu.models import MultimodalCorrNMF

    mesh = make_mesh(jax.devices()[:8], sample_ways=4)
    model = MultimodalCorrNMF(ns_signatures=[2, 3], dim_embeddings=2,
                              newton_cg_compat=True)
    with pytest.raises(ValueError, match="newton_cg_compat"):
        model.fit(_make_mdata(mm_cohort), mesh=mesh)
    model2 = MultimodalCorrNMF(ns_signatures=[2, 3], dim_embeddings=2)
    with pytest.raises(ValueError, match="streaming"):
        model2.fit_minibatch(_make_mdata(mm_cohort), streaming=True,
                             mesh=mesh)


@pytest.mark.parametrize("family", ["klnmf", "corrnmf"])
def test_fit_minibatch_with_mesh_matches_unsharded(corr_state, family):
    """Single-modality fit_minibatch(mesh=...) == unsharded."""
    X = corr_state["X"]

    def build():
        if family == "klnmf":
            return KLNMF(n_signatures=3)
        return CorrNMFDet(n_signatures=3, dim_embeddings=2)

    kwargs = dict(batch_size=16, n_steps=6, eval_freq=3, seed=3,
                  init_kwargs={"seed": 0})
    plain = build().fit_minibatch(AnnData(X.copy()), **kwargs)
    mesh = make_mesh(jax.devices()[:8], sample_ways=4)
    sharded = build().fit_minibatch(AnnData(X.copy()), mesh=mesh, **kwargs)
    np.testing.assert_allclose(
        sharded.history["objective_function"],
        plain.history["objective_function"], rtol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.asignatures.X), np.asarray(plain.asignatures.X),
        rtol=1e-7,
    )


def test_stop_on_nonfinite_through_fit(reference_data_path):
    import pandas as pd

    counts = pd.read_csv(
        reference_data_path / "models" / "klnmf" / "counts.csv", index_col=0
    ).T
    model = KLNMF(n_signatures=2, min_iterations=10, max_iterations=50)
    model.fit(AnnData(counts), stop_on_nonfinite=True)
    assert np.all(np.isfinite(model.history["objective_function"]))

def test_fit_best_of_ardnmf_with_mesh_matches_unsharded():
    """Restart-sharded ARDNMF multi-start must equal the unsharded run
    (the lam leaf shards on its restart axis like W/H)."""
    from salamander_tpu.models import ARDNMF

    rng = np.random.default_rng(0)
    W = rng.dirichlet(np.full(20, 0.5), size=3).T
    H = rng.gamma(2.0, 20.0, size=(3, 48))
    X = np.clip(rng.poisson(W @ H), np.finfo(np.float32).eps, None)
    mesh = make_mesh(jax.devices()[:8], sample_ways=1)

    def run(mesh_arg):
        model = ARDNMF(n_signatures=6, init_method="random",
                       min_iterations=50, max_iterations=200)
        summary = fit_best_of(model, AnnData(X.T), n_restarts=8,
                              base_seed=0, mesh=mesh_arg)
        return model, summary

    model_a, summary_a = run(None)
    model_b, summary_b = run(mesh)
    np.testing.assert_allclose(summary_b.losses, summary_a.losses, rtol=1e-10)
    assert summary_b.best_index == summary_a.best_index
    assert model_b.n_active_signatures == model_a.n_active_signatures
