"""Matmul precision policy for the device compute path.

On TPU, JAX's DEFAULT precision for float32 matmuls is a single bf16 MXU
pass (~8 mantissa bits). For this package that is not a benign speed knob:
multiplicative updates iterate ``aux = X / (W @ H)`` thousands of times, so
bf16-pass noise shifts the MU fixed points, and convergence decisions made
on a bf16-noisy objective stop at the wrong block. Measured on the real
chip (2026-08-18, PCAWG breast SBS, k=5; fixed 5000-iteration 100-restart
window for throughput):

| f32 matmul mode      | single-fit KL | n_it | best-of-100 | headline   |
|----------------------|---------------|------|-------------|------------|
| DEFAULT (bf16x1)     | 20500.6 WRONG | 1790 | 20419.6     | 6.3M it/s  |
| HIGH    (bf16x3)     | 20430.9       | 4610 | 20413.8     | 2.34M it/s |
| HIGHEST (bf16x6)     | 20430.7       | 4680 | 20413.7     | 1.53M it/s |
| CPU f32 reference    | 20428.9       | 4680 | -           | -          |

DEFAULT also broke the sparse catalog assignment's acceptance invariant
outright (146/192 samples over their KL budget, supports 42-79 instead of
14-36). Alternatives measured and rejected: an XLA-level multiply-reduce
(VPU) formulation reaches 2.27M, a VPU-contraction Pallas kernel 1.82M,
the MXU Pallas fused block at HIGHEST 1.97M - full-f32 arithmetic tops
out around ~2M it/s on this chip regardless of route, so HIGH (bf16x3) is
the best correct-arithmetic operating point for the bulk update path.

Hence the TIERED policy:

- ``MATMUL_PRECISION`` (= HIGH, via :func:`mm`): the bulk multiplicative
  update path. bf16x3 error (~2^-18 per product) is measured
  indistinguishable from full f32 in fit quality (best-of-100 identical,
  final KL within 1e-5 relative of the f32 trajectory).
- ``OBJECTIVE_PRECISION`` (= HIGHEST, via :func:`omm`): objectives,
  convergence tests, line-search/acceptance comparisons, Newton solves
  and Gram matrices feeding Cholesky. These make DECISIONS (stop/accept/
  direction), are evaluated ~1/conv_test_freq as often as updates, and
  get full f32 so the decision noise floor stays at f32 resolution.

CPU ignores precision entirely, which is why the golden-fixture tests
could not catch the DEFAULT corruption; tests/test_precision.py walks the
traced jaxprs instead and fails on any unpinned dot_general.

The policy is a CONSTANT, not a runtime knob: JAX's trace caches key on
function identity + shapes, so a precision flipped after any tracing
silently would not take effect (verified: a re-trace of ``mm`` under a
mutated module global returns the first trace's precision). A throughput
experiment should edit this module and restart the process.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["MATMUL_PRECISION", "OBJECTIVE_PRECISION", "mm", "omm"]

MATMUL_PRECISION = lax.Precision.HIGH
OBJECTIVE_PRECISION = lax.Precision.HIGHEST


def mm(a, b):
    """Matmul at the bulk-update precision (bf16x3 on TPU; see module doc)."""
    return jnp.matmul(a, b, precision=MATMUL_PRECISION)


def omm(a, b):
    """Matmul at decision precision (full f32): objectives, convergence
    tests, acceptance rules, solver systems."""
    return jnp.matmul(a, b, precision=OBJECTIVE_PRECISION)
