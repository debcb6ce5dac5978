"""Device-mesh construction and sharding helpers.

Axes:
  'restarts' - independent fits (multi-start / rank-scan fan-out); pure data
               parallelism, the only cross-device communication is the final
               argmin over losses.
  'samples'  - the D axis of X and H; the W-update numerator (aux @ H^T), the
               column sums and every objective reduce over D, so XLA inserts
               all-reduces over this axis (rides ICI within a slice).

Multi-host/multi-slice: init_distributed() brings up the jax.distributed
runtime, and make_hybrid_mesh() factors the global device set so the
communication-free restart axis is the ONLY axis crossing slice boundaries
(DCN), while the all-reducing sample axis stays inside a slice (ICI).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RESTART_AXIS = "restarts"
SAMPLE_AXIS = "samples"


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> None:
    """Initialize the multi-process JAX runtime (multi-host TPU pods /
    multi-slice deployments).

    Thin, idempotent wrapper around jax.distributed.initialize: on managed
    TPU platforms all arguments auto-detect from the environment; on manual
    clusters pass coordinator_address='host:port', num_processes and
    process_id. After this, jax.devices() is the GLOBAL device set and
    make_mesh()/make_hybrid_mesh() build meshes spanning all hosts.

    The reference is strictly single-process (SURVEY.md section 5.8); this is
    the TPU-native replacement for the distributed runtime it lacks.
    """
    if jax.distributed.is_initialized():
        return  # already initialized - keep it
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def slice_groups(devices) -> list[list]:
    """Group devices by TPU slice (falls back to one group when the platform
    exposes no slice_index - CPU, single slice)."""
    groups: dict[int, list] = {}
    for device in devices:
        groups.setdefault(getattr(device, "slice_index", 0), []).append(device)
    return [groups[index] for index in sorted(groups)]


def hybrid_mesh_shape(
    n_devices_per_slice: int,
    n_slices: int,
    sample_ways: int | None = None,
) -> tuple[tuple[int, int], tuple[int, int]]:
    """Factor a multi-slice deployment into (per-slice ICI shape, DCN shape)
    for a (restarts, samples) mesh.

    The sample axis all-reduces every iteration, so it must never cross DCN:
    its full extent lives inside one slice. Restarts communicate only at the
    final argmin, so they take the whole DCN axis plus the leftover ICI.
    Returns ((restarts_per_slice, sample_ways), (n_slices, 1)).
    """
    if sample_ways is None:
        _, sample_ways = _factor(n_devices_per_slice)
    if n_devices_per_slice % sample_ways:
        raise ValueError(
            f"{n_devices_per_slice} devices per slice not divisible by "
            f"sample_ways={sample_ways}"
        )
    return (n_devices_per_slice // sample_ways, sample_ways), (n_slices, 1)


def make_hybrid_mesh(devices=None, sample_ways: int | None = None) -> Mesh:
    """Build a (restarts, samples) mesh over a (possibly multi-slice,
    multi-host) device set with DCN-aware axis placement.

    Single-slice sets reduce to make_mesh. Multi-slice sets are laid out so
    that consecutive sample-axis neighbors are always intra-slice (ICI) and
    only the restart axis spans slices (DCN) - the layout
    jax.experimental.mesh_utils.create_hybrid_device_mesh produces for
    (ici_shape, dcn_shape) as computed by hybrid_mesh_shape.
    """
    if devices is None:
        devices = jax.devices()
    groups = slice_groups(devices)
    if len(groups) == 1:
        return make_mesh(devices, sample_ways)
    per_slice = len(groups[0])
    if any(len(group) != per_slice for group in groups):
        raise ValueError("Slices expose different device counts.")
    ici_shape, dcn_shape = hybrid_mesh_shape(
        per_slice, len(groups), sample_ways
    )
    from jax.experimental import mesh_utils

    grid = mesh_utils.create_hybrid_device_mesh(
        ici_shape, dcn_shape, devices=devices,
        process_is_granule=False,
    )
    # hybrid grid is (dcn_restarts * ici_restarts, samples)
    return Mesh(grid, (RESTART_AXIS, SAMPLE_AXIS))


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
        "mask": NamedSharding(mesh, P(RESTART_AXIS, None)),
        "per_restart": NamedSharding(mesh, P(RESTART_AXIS)),
        "replicated": NamedSharding(mesh, P()),
    }
