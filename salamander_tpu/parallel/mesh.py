"""Device-mesh construction and sharding helpers.

Axes:
  'restarts' - independent fits (multi-start / rank-scan fan-out); pure data
               parallelism, the only cross-device communication is the final
               argmin over losses.
  'samples'  - the D axis of X and H; the W-update numerator (aux @ H^T), the
               column sums and every objective reduce over D, so XLA inserts
               all-reduces over this axis (rides ICI within a slice).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RESTART_AXIS = "restarts"
SAMPLE_AXIS = "samples"


def _factor(n_devices: int, max_sample_ways: int = 4) -> tuple[int, int]:
    """Split n_devices into (restart_ways, sample_ways): prefer a modest
    sample-sharding degree and put the rest on restarts."""
    for sample_ways in range(min(max_sample_ways, n_devices), 0, -1):
        if n_devices % sample_ways == 0:
            return n_devices // sample_ways, sample_ways
    return n_devices, 1


def make_mesh(devices=None, sample_ways: int | None = None) -> Mesh:
    """Build a (restarts, samples) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if sample_ways is None:
        restart_ways, sample_ways = _factor(n)
    else:
        if n % sample_ways:
            raise ValueError(f"{n} devices not divisible by sample_ways={sample_ways}")
        restart_ways = n // sample_ways
    grid = np.asarray(devices).reshape(restart_ways, sample_ways)
    return Mesh(grid, (RESTART_AXIS, SAMPLE_AXIS))


def restart_sharding(mesh: Mesh):
    """Shardings for the batched KLNMF state under a (restarts, samples) mesh.

    W: (R, V, K) restart-sharded, replicated over samples.
    H: (R, K, D) restart- and sample-sharded.
    X: (V, D)    replicated over restarts, sample-sharded.
    """
    return {
        "W": NamedSharding(mesh, P(RESTART_AXIS, None, None)),
        "H": NamedSharding(mesh, P(RESTART_AXIS, None, SAMPLE_AXIS)),
        "X": NamedSharding(mesh, P(None, SAMPLE_AXIS)),
        "per_restart": NamedSharding(mesh, P(RESTART_AXIS)),
        "replicated": NamedSharding(mesh, P()),
    }
