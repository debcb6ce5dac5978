"""K-padded CorrNMF rank scans: many ranks, few compiled programs.

The model-selection scan for CorrNMF (choose n_signatures at a fixed
embedding dimension) costs one XLA compilation per rank when driven through
the generic rank_scan() - on a remote-compile TPU platform that is minutes
per rank. Here every rank is padded to a shared bucket size and runs as
lanes of ONE compiled program per bucket, using the rank-masked CorrNMF
step (ops/corrnmf.py make_masked_corrnmf_step): padded lanes' exposures are
exact zeros, so each lane computes its own rank-k EM cycles (equivalence
pinned by tests/test_rank_padding.py).

dim_embeddings is fixed across the scan (it is part of the compiled shape);
scanning dim_embeddings too multiplies the bucket count accordingly.

Measured (PCAWG SBS, k=2..7 x 4 restarts, 200 cycles, TPU v5e): warm-
process wall 6.6s padded vs 25.0s unpadded (3.8x - two big batched
programs instead of six small ones), with identical per-rank losses.
Fresh-process cold walls on this remote-compile platform are dominated
by the first compile's 40-75s tunnel warmup (high variance), so the
compile-count saving (2 programs vs one per rank) pays off in proportion
to how many ranks the scan covers - the same mechanism measured at
2.4-2.7x cold for the 19-rank KLNMF scan (BENCHMARKS.md).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import numpy as np

from ..engine import FitConfig, make_fit_function
from ..engine.transfer import fetch_pytree
from ..ops import corrnmf as corr_ops


@functools.lru_cache(maxsize=8)
def _cached_masked_run(config: FitConfig, x64: bool):
    """One engine program + final-losses evaluator per FitConfig: repeated
    scans (and every bucket of one scan) share a single jit cache instead
    of re-tracing per call (the klnmf twin's _cached_masked_runner
    pattern). x64 is part of the key because promote_objective's wrapping
    depends on it."""
    from ..models.signature_nmf import promote_objective

    update_fn, objective_fn = corr_ops.make_masked_corrnmf_step()
    import jax.numpy as jnp

    objective = promote_objective(
        objective_fn, {"probe": jnp.zeros((), jnp.float32)}
    )
    run = make_fit_function(
        update_fn, objective, config, batched=True, unroll=False,
    )
    losses_fn = jax.jit(jax.vmap(objective, in_axes=(0, None)))
    return run, losses_fn


# the batched aux/ratio intermediates cost ~3 (D, V) + 2 (D, Kp) buffers
# per lane; cap lanes per program call so big cohorts don't OOM (every
# call of a bucket still shares the SAME compiled program: per-rank calls
# all carry n_restarts lanes of identical shape)
_LANE_BUDGET_BYTES = 4 * 1024**3

_PARAM_KEYS = (
    "signatures", "signature_scalings", "sample_scalings",
    "signature_embeddings", "sample_embeddings", "variance", "exposures",
)


class CorrScanResult(NamedTuple):
    """Per-rank outcome of a (padded) multi-start CorrNMF rank scan."""

    losses: Any        # (n_restarts,) final ELBO per restart (maximize)
    n_iterations: Any  # (n_restarts,)
    best_index: int
    best_params: dict  # host pytree of the winning restart, padding stripped

    @property
    def best_loss(self) -> float:
        return float(self.losses[self.best_index])


def rank_scan_corrnmf(
    X,
    n_signatures_range,
    dim_embeddings: int,
    n_restarts: int = 1,
    base_seed: int = 0,
    config: FitConfig | None = None,
    pad_ranks: bool = True,
    rank_bucket: int = 4,
    init_method: str = "nndsvd",
) -> dict[int, CorrScanResult]:
    """Multi-start CorrNMF model-selection scan over n_signatures.

    X: (n_samples, n_features) counts (model orientation, samples as rows).
    With pad_ranks=True, ranks round up to multiples of `rank_bucket` and
    all ranks of a bucket share ONE compiled program with per-lane masks;
    pad_ranks=False compiles one program per distinct rank (same code path
    with an all-true mask). Restart r of rank-offset o is seeded
    base_seed + 1000*o + r, matching the generic rank_scan/fit_best_of
    convention. Returns {k: CorrScanResult}.
    """
    from ..containers import AnnData
    from ..models import CorrNMFDet

    config = config or FitConfig()
    ranks = [int(k) for k in n_signatures_range]
    X = np.asarray(X, dtype=float)
    # one container for the whole scan (every lane shares the same counts;
    # _setup_adata's EPSILON clip is idempotent)
    adata = AnnData(X.copy())

    # host-pinned per-lane init: _device_state under the CPU backend so
    # nothing round-trips the accelerator tunnel (see parallel/multistart.py)
    def init_lane(k, seed):
        model = CorrNMFDet(
            n_signatures=k, dim_embeddings=dim_embeddings,
            init_method=init_method,
        )
        model._setup_adata(adata)
        np.random.seed(seed)
        model._initialize(init_kwargs={"seed": seed})
        model._setup_fitting_parameters()
        params, lane_data = model._device_state()
        return jax.tree.map(np.asarray, params), lane_data

    # group ranks into shared-padded-K buckets
    buckets: dict[int, list[tuple[int, int]]] = {}
    for offset, k in enumerate(ranks):
        padded = (
            ((k + rank_bucket - 1) // rank_bucket) * rank_bucket
            if pad_ranks else k
        )
        buckets.setdefault(padded, []).append((offset, k))

    run, losses_fn = _cached_masked_run(
        config, bool(jax.config.jax_enable_x64)
    )
    rng_state = np.random.get_state()
    results: dict[int, CorrScanResult] = {}
    cpu = jax.devices("cpu")[0]

    def run_group(padded_k, group):
        """One program call for `group` (list of (offset, k)): returns the
        fetched (result, final_losses)."""
        lanes = []
        data = None
        with jax.default_device(cpu):
            for offset, k in group:
                for restart in range(n_restarts):
                    seed = base_seed + 1000 * offset + restart
                    params, data = init_lane(k, seed)
                    padded = corr_ops.pad_rank_corrnmf(params, padded_k)
                    lanes.append(jax.tree.map(np.asarray, padded))
        params0 = jax.tree.map(lambda *leaves: np.stack(leaves), *lanes)
        result = run(params0, data)
        final_losses = losses_fn(result.params, data)
        # one batched device->host transfer for everything
        return fetch_pytree((result, final_losses))

    def absorb(result, final_losses, group):
        for i, (offset, k) in enumerate(group):
            sl = slice(i * n_restarts, (i + 1) * n_restarts)
            losses = np.asarray(final_losses[sl])
            best = int(np.argmax(losses))  # ELBO: maximize
            lane = sl.start + best
            best_params = {}
            for key in _PARAM_KEYS:
                value = np.asarray(result.params[key][lane])
                if key in ("signatures", "signature_scalings",
                           "signature_embeddings"):
                    value = value[:k]
                elif key == "exposures":
                    value = value[:, :k]
                best_params[key] = value
            results[k] = CorrScanResult(
                losses=losses,
                n_iterations=np.asarray(result.n_iterations[sl]),
                best_index=best,
                best_params=best_params,
            )

    n_samples, n_features = X.shape
    try:
        for padded_k, group in sorted(buckets.items()):
            per_lane = (
                3 * n_samples * n_features + 2 * n_samples * padded_k
            ) * 8
            lanes_cap = max(n_restarts, _LANE_BUDGET_BYTES // per_lane)
            if len(group) * n_restarts <= lanes_cap:
                chunks = [group]
            else:
                # one rank per call: every call still has n_restarts lanes
                # of identical shape, so the bucket keeps ONE compiled
                # program (the klnmf twin's HBM guard)
                chunks = [[entry] for entry in group]
            for chunk in chunks:
                result, final_losses = run_group(padded_k, chunk)
                absorb(result, final_losses, chunk)
    finally:
        np.random.set_state(rng_state)
    return results
