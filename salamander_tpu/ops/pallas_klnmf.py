"""Fused Pallas TPU kernels for the KLNMF multiplicative-update hot path.

Two fusion levels:

fused_mu_block(X, W, H, steps)
    Single-problem kernel: one invocation advances a whole convergence-test
    block (default 10 joint W,H updates) with every intermediate - the (V,D)
    ratio matrix, both numerators, the normalization - living in VMEM. The
    only HBM traffic per block is reading X once and writing the final W,H.

fused_mu_block_batched(X, W[R], H[R], steps, chunk)
    Multi-restart kernel: restarts are processed in VMEM-sized chunks along
    the Pallas grid, with the per-chunk matmuls batched inside the kernel
    (jax.lax.dot_general with a leading batch dimension). This is the form
    the multi-start driver uses: measured on a TPU v5e it slightly beats the
    XLA-fused path at steady state and compiles ~50x faster (seconds instead
    of minutes), because the whole 10-update block is one Mosaic kernel
    instead of a long unrolled HLO pipeline.

Numerics match ops.klnmf.update_WH (unweighted, no given signatures): the
ratio aux = X/(WH) is computed once per iteration from the OLD W,H and
reused by both updates; W is column-normalized then clipped; H is clipped.
Float32 only (TPU VMEM kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .klnmf import EPSILON

# Conservative VMEM working-set budget for choosing the restart chunk size.
# Mosaic keeps the fori-loop carries, the (V,D) ratio/product matrices and
# the double-buffered in/out blocks live simultaneously; empirically the
# footprint is ~6x V*D floats per restart (chunk 20 fits and is fastest for
# the 96x192 benchmark; chunk 50 OOMs at 20.1M vs the 16M VMEM limit).
_VMEM_BUDGET_BYTES = 9 * 1024 * 1024
_PER_RESTART_FLOATS = 6.0


def _mu_block_kernel(steps_ref, x_ref, w_ref, h_ref, w_out, h_out):
    """steps_ref[0] joint MU updates for ONE problem, entirely in VMEM."""
    X = x_ref[:]

    def one_update(_, carry):
        W, H = carry
        WH = jnp.dot(W, H, preferred_element_type=jnp.float32)
        aux = X / WH
        W_new = W * jnp.dot(aux, H.T, preferred_element_type=jnp.float32)
        W_new = W_new / jnp.sum(W_new, axis=0, keepdims=True)
        W_new = jnp.maximum(W_new, EPSILON)
        # H uses the OLD W and the shared aux (reference update_WH semantics)
        H_new = jnp.maximum(
            H * jnp.dot(W.T, aux, preferred_element_type=jnp.float32), EPSILON
        )
        return W_new, H_new

    W, H = jax.lax.fori_loop(0, steps_ref[0], one_update, (w_ref[:], h_ref[:]))
    w_out[:] = W
    h_out[:] = H


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_mu_block(X, W, H, n_steps, interpret: bool = False):
    """Advance (W, H) by n_steps joint multiplicative updates in one fused
    TPU kernel. X: (V, D), W: (V, K), H: (K, D); n_steps is a traced scalar
    (the engine's possibly-partial block size)."""
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


def _mu_block_kernel_batched(steps_ref, x_ref, w_ref, h_ref, w_out, h_out):
    """steps_ref[0] joint MU updates for a CHUNK of restarts: matmuls are
    batched over the leading restart dimension inside the kernel."""
    X = x_ref[:]

    def one_update(_, carry):
        W, H = carry  # (C, V, K), (C, K, D)
        WH = jax.lax.dot_general(
            W, H, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        aux = X[None] / WH
        numer_w = jax.lax.dot_general(
            aux, H, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        W_new = W * numer_w
        W_new = W_new / jnp.sum(W_new, axis=1, keepdims=True)
        W_new = jnp.maximum(W_new, EPSILON)
        numer_h = jax.lax.dot_general(
            W, aux, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        H_new = jnp.maximum(H * numer_h, EPSILON)
        return W_new, H_new

    W, H = jax.lax.fori_loop(0, steps_ref[0], one_update, (w_ref[:], h_ref[:]))
    w_out[:] = W
    h_out[:] = H


def default_chunk(n_restarts: int, n_features: int, n_samples: int) -> int:
    """Largest divisor of n_restarts whose VMEM working set fits the budget."""
    per_restart = _PER_RESTART_FLOATS * n_features * n_samples * 4
    limit = max(1, int(_VMEM_BUDGET_BYTES / per_restart))
    for chunk in range(min(limit, n_restarts), 0, -1):
        if n_restarts % chunk == 0:
            return chunk
    return 1


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def fused_mu_block_batched(X, W, H, n_steps, chunk: int | None = None,
                           interpret: bool = False):
    """Advance all restarts' (W, H) by n_steps updates; restarts processed in
    grid chunks of `chunk` with batched matmuls inside the kernel.
    X: (V, D); W: (R, V, K); H: (R, K, D)."""
    R, V, K = W.shape
    D = X.shape[1]
    if chunk is None:
        chunk = default_chunk(R, V, D)
    if R % chunk:
        raise ValueError(f"n_restarts={R} not divisible by chunk={chunk}")
    steps = jnp.asarray(n_steps, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // chunk,),
        in_specs=[
            pl.BlockSpec((V, D), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, V, K), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, K, D), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, V, K), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, K, D), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        _mu_block_kernel_batched,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R, V, K), W.dtype),
            jax.ShapeDtypeStruct((R, K, D), H.dtype),
        ),
        interpret=interpret,
    )(steps, X, W, H)


def make_block_update(X, interpret: bool = False):
    """Engine hook for a SINGLE problem: block_update_fn(params, steps)."""

    def block_update(params, steps):
        W, H = fused_mu_block(X, params["W"], params["H"], steps,
                              interpret=interpret)
        return {"W": W, "H": H}

    return block_update


def make_block_update_batched(X, n_restarts: int, chunk: int | None = None,
                              interpret: bool = False):
    """Engine hook for the lockstep-batched loop: operates on (R,...) params."""
    if chunk is None:
        chunk = default_chunk(n_restarts, X.shape[0], X.shape[1])

    def block_update(params, steps):
        W, H = fused_mu_block_batched(
            X, params["W"], params["H"], steps, chunk=chunk,
            interpret=interpret,
        )
        return {"W": W, "H": H}

    return block_update
