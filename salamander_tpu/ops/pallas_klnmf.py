"""Minimal fused Pallas TPU kernel: one KLNMF MU block in VMEM.

This file once carried a full family of fused multiplicative-update
kernels (batched/weighted/rank-masked/D-tiled streaming variants, ~720
LoC). They were retired after two rounds of measurement closed every
regime:

- Correct-arithmetic steady state (round 3): Mosaic supports only
  DEFAULT/HIGHEST dot precisions, so the kernels pay full-f32 (bf16x6)
  MXU passes while the XLA update path runs the tiered HIGH policy
  (ops/precision.py) - measured 848.8 s vs 66.0 s on the 19-rank 96x10k
  scan, ~15% behind at the PCAWG headline (BENCHMARKS.md config 5c).
- HBM-bound cohort scale (round 4): the D-tiled streaming kernel - the
  last plausible win, avoiding the (V, D) aux materialization - measured
  0.78x (R=1) and 0.92x (R=8) of the XLA path at 96x200k, with ~6x
  slower compiles (40 s vs 6.6 s). XLA's own fusion already keeps the
  regime at ~680 GB/s effective HBM bandwidth; there is nothing left to
  stream.

What remains is the single-problem fused MU block used by bench.py as an
on-hardware Mosaic self-check (interpret-mode tests cannot catch real
lowering constraints - e.g. the last BlockSpec dim must be a multiple of
128 or the full array dim). Numerics match ops.klnmf.update_WH
(unweighted, no given signatures; reference semantics
models/_utils_klnmf.py:281-361): aux = X/(WH) is computed once per
iteration from the OLD W,H and reused by both updates; W is
column-normalized then clipped; H is clipped. Float32 only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .klnmf import EPSILON
# Mosaic supports only DEFAULT/HIGHEST dot precisions (rejects HIGH with
# 'Unsupported dot precision', observed 2026-08-18), so the kernel runs
# its dots at full f32 regardless of the XLA update tier.
from .precision import OBJECTIVE_PRECISION as _PALLAS_PRECISION


def _mu_block_kernel(steps_ref, x_ref, w_ref, h_ref, w_out, h_out):
    """steps_ref[0] joint MU updates for ONE problem, entirely in VMEM."""
    X = x_ref[:]

    def one_update(_, carry):
        W, H = carry
        WH = jnp.dot(W, H, preferred_element_type=jnp.float32,
                     precision=_PALLAS_PRECISION)
        aux = X / WH
        W_new = W * jnp.dot(aux, H.T,
                            preferred_element_type=jnp.float32,
                            precision=_PALLAS_PRECISION)
        W_new = W_new / jnp.sum(W_new, axis=0, keepdims=True)
        W_new = jnp.maximum(W_new, EPSILON)
        # H uses the OLD W and the shared aux (reference update_WH semantics)
        H_new = jnp.maximum(
            H * jnp.dot(W.T, aux, preferred_element_type=jnp.float32,
                        precision=_PALLAS_PRECISION),
            EPSILON,
        )
        return W_new, H_new

    W, H = jax.lax.fori_loop(0, steps_ref[0], one_update,
                             (w_ref[:], h_ref[:]))
    w_out[:] = W
    h_out[:] = H


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_mu_block(X, W, H, n_steps, interpret: bool = False):
    """Advance (W, H) by n_steps joint multiplicative updates in one fused
    TPU kernel (the bench.py hardware self-check). X: (V, D), W: (V, K),
    H: (K, D); n_steps is a traced scalar. The only HBM traffic per block
    is reading X once and writing the final W, H. On real hardware D must
    be a multiple of 128 or small enough to be the full array dim."""
    V, D = X.shape
    K = W.shape[1]
    steps = jnp.asarray(n_steps, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        _mu_block_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((V, K), W.dtype),
            jax.ShapeDtypeStruct((K, D), H.dtype),
        ),
        interpret=interpret,
    )(steps, X, W, H)
