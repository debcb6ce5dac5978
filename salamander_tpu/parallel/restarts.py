"""Batched multi-start fits and rank scans.

The reference's tutorial runs restarts and rank scans as serial Python loops
over single fits; here all restarts of one rank are ONE device program: the
batched init lives on device, every restart steps in lockstep inside the
jitted convergence engine (converged lanes frozen), and only the final loss
table returns to the host. Under a multi-device mesh the restart axis is
sharded (perfect scaling - no communication) and the sample axis may be
sharded too (XLA all-reduces the cross-sample contractions).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import FitConfig, fit_loop_lockstep
from ..initialization.methods import random_init_batch
from ..ops import klnmf as ops
from .mesh import restart_sharding


class RestartResult(NamedTuple):
    """Outcome of a batched multi-start fit."""

    W: Any            # (R, V, K) signatures per restart
    H: Any            # (R, K, D) exposures per restart
    losses: Any       # (R,) final objective per restart
    n_iterations: Any # (R,) iterations run per restart
    best_index: int

    @property
    def best_loss(self) -> float:
        return float(self.losses[self.best_index])

    @property
    def best_W(self):
        return self.W[self.best_index]

    @property
    def best_H(self):
        return self.H[self.best_index]


def build_klnmf_restart_runner(config: FitConfig, weighted: bool = False,
                               mesh=None, use_pallas: bool = False):
    """Compile (once) the batched multi-start KLNMF fit.

    Returns a jitted function (params0, data) -> (FitResult, losses) where
    params0 = {"W": (R,V,K), "H": (R,K,D)} and data = {"X": (V,D)} plus any
    'weights_kl'/'weights_lhalf' entries (set weighted=True when the data
    will carry weights; it only gates the Pallas-compatibility check - the
    weights themselves always come from the data pytree at call time).
    use_pallas fuses each convergence block of MU updates into one
    VMEM-resident TPU kernel (unweighted path only).
    """
    update_fn, objective_fn = ops.make_step_functions()
    if use_pallas and weighted:
        raise ValueError("The fused Pallas path supports only unweighted KLNMF.")
    if use_pallas and mesh is not None:
        raise ValueError("The fused Pallas path is single-device; drop 'mesh'.")

    if use_pallas:
        # Natively-batched loop around the chunked VMEM-resident MU kernel:
        # the kernel advances ALL restarts per call (vmap would serialize it).
        from ..ops.pallas_klnmf import make_block_update_batched

        def run_pallas(params0, data):
            n_restarts = params0["W"].shape[0]
            block_update = make_block_update_batched(data["X"], n_restarts)
            batched_objective = jax.vmap(objective_fn, in_axes=(0, None))
            result = fit_loop_lockstep(
                lambda p: batched_objective(p, data),
                params0,
                config,
                lambda p, steps: block_update(p, steps),
            )
            final_loss = batched_objective(result.params, data)
            return result.params, final_loss, result.n_iterations

        return jax.jit(run_pallas)

    # Natively-batched lockstep loop (one while over the whole batch):
    # ~40% higher aggregate throughput than vmap-of-while for multi-start.
    def run(params0, data):
        batched_update = jax.vmap(lambda p: update_fn(p, data))
        batched_objective = jax.vmap(lambda p: objective_fn(p, data))

        def block(params, steps):
            return jax.lax.fori_loop(
                0, steps, lambda _, q: batched_update(q), params
            )

        result = fit_loop_lockstep(batched_objective, params0, config, block)
        final_loss = batched_objective(result.params)
        return result.params, final_loss, result.n_iterations

    if mesh is None:
        return jax.jit(run)

    shardings = restart_sharding(mesh)
    in_shardings = (
        {"W": shardings["W"], "H": shardings["H"]},
        {"X": shardings["X"]},
    )
    out_shardings = (
        {"W": shardings["W"], "H": shardings["H"]},
        shardings["per_restart"],
        shardings["per_restart"],
    )
    return jax.jit(run, in_shardings=in_shardings, out_shardings=out_shardings)


def fit_klnmf_restarts(
    X,
    n_signatures: int,
    n_restarts: int,
    seed: int = 0,
    config: FitConfig | None = None,
    weights_kl=None,
    weights_lhalf=None,
    mesh=None,
    dtype=jnp.float32,
    runner=None,
    use_pallas: bool = False,
) -> RestartResult:
    """Fit `n_restarts` random-initialized KLNMF models at once on device.

    X is (n_features, n_samples) in kernel orientation. Pass a `mesh` from
    make_mesh() to shard restarts/samples across devices; pass a prebuilt
    `runner` (build_klnmf_restart_runner) to amortize compilation across
    calls with identical shapes/config. use_pallas enables the fused
    VMEM-resident MU-block kernel (single-device, unweighted).
    """
    config = config or FitConfig()
    X = jnp.asarray(X, dtype)
    key = jax.random.PRNGKey(seed)
    W0, H0 = random_init_batch(key, X, n_signatures, n_restarts, dtype)

    data = {"X": X}
    if weights_kl is not None:
        data["weights_kl"] = jnp.asarray(weights_kl, dtype)
    if weights_lhalf is not None:
        data["weights_lhalf"] = jnp.asarray(weights_lhalf, dtype)

    if runner is None:
        runner = build_klnmf_restart_runner(
            config,
            weighted=(weights_kl is not None or weights_lhalf is not None),
            mesh=mesh,
            use_pallas=use_pallas,
        )
    if mesh is not None:
        shardings = restart_sharding(mesh)
        W0 = jax.device_put(W0, shardings["W"])
        H0 = jax.device_put(H0, shardings["H"])
        data["X"] = jax.device_put(data["X"], shardings["X"])

    params, losses, n_iterations = runner({"W": W0, "H": H0}, data)
    losses_host = np.asarray(losses)
    best = int(np.argmin(losses_host))
    return RestartResult(
        W=params["W"],
        H=params["H"],
        losses=losses_host,
        n_iterations=np.asarray(n_iterations),
        best_index=best,
    )


def rank_scan(
    model_factory,
    data_container,
    n_signatures_range,
    n_restarts: int,
    base_seed: int = 0,
    **fit_best_of_kwargs,
):
    """Model-selection scan for ANY model family.

    model_factory(k) must return an unfitted model with k signatures (e.g.
    `lambda k: CorrNMFDet(n_signatures=k, dim_embeddings=2)`). Each rank runs
    `n_restarts` batched restarts via fit_best_of; returns {k: (model,
    MultiStartSummary)} with each model holding its best restart.
    """
    from .multistart import fit_best_of

    results = {}
    for offset, k in enumerate(n_signatures_range):
        model = model_factory(int(k))
        container = (
            data_container.copy()
            if hasattr(data_container, "copy")
            else data_container
        )
        summary = fit_best_of(
            model, container, n_restarts,
            base_seed=base_seed + 1000 * offset,
            **fit_best_of_kwargs,
        )
        results[int(k)] = (model, summary)
    return results


def rank_scan_klnmf(
    X,
    n_signatures_range,
    n_restarts: int,
    seed: int = 0,
    config: FitConfig | None = None,
    mesh=None,
    dtype=jnp.float32,
) -> dict[int, RestartResult]:
    """Multi-start KLNMF over a range of ranks (the model-selection scan the
    reference tutorial runs as a nested Python loop). One compiled program
    per rank; all restarts of a rank run simultaneously."""
    results: dict[int, RestartResult] = {}
    for offset, k in enumerate(n_signatures_range):
        results[int(k)] = fit_klnmf_restarts(
            X, int(k), n_restarts,
            seed=seed + 1000 * offset,
            config=config, mesh=mesh, dtype=dtype,
        )
    return results
