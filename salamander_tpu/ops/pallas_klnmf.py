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
# Mosaic supports only DEFAULT/HIGHEST dot precisions (rejects HIGH
# with 'Unsupported dot precision', observed 2026-08-18), so kernels
# run their dots at full f32 regardless of the XLA update tier.
from .precision import OBJECTIVE_PRECISION as _PALLAS_PRECISION

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
            precision=_PALLAS_PRECISION,
        )
        aux = X[None] / WH
        numer_w = jax.lax.dot_general(
            aux, H, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_PALLAS_PRECISION,
        )
        W_new = W * numer_w
        W_new = W_new / jnp.sum(W_new, axis=1, keepdims=True)
        W_new = jnp.maximum(W_new, EPSILON)
        numer_h = jax.lax.dot_general(
            W, aux, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_PALLAS_PRECISION,
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


def _mu_block_kernel_batched_weighted(steps_ref, x_ref, wkl_ref, wlh_ref,
                                      w_ref, h_ref, w_out, h_out,
                                      *, n_given: int, use_lhalf: bool):
    """Weighted twin of _mu_block_kernel_batched: per-sample KL weights scale
    the W numerator (they cancel in the unpenalized H update), the l1/2
    sparsity closed form from ops.klnmf._update_H_from_aux runs when the
    penalty weights are in play, and the leading n_given signature columns
    are frozen each iteration (semantics: reference _utils_klnmf.py:220-361).
    """
    X = x_ref[:]
    weights_kl = wkl_ref[:][None]     # (1, 1, D) after the leading newaxis
    weights_lhalf = wlh_ref[:][None]  # (inputs arrive as (1, D) blocks)
    n_signatures = w_ref.shape[-1]

    def one_update(_, carry):
        W, H = carry  # (C, V, K), (C, K, D)
        WH = jax.lax.dot_general(
            W, H, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_PALLAS_PRECISION,
        )
        aux = X[None] / WH

        if n_given == n_signatures:
            W_new = W
        else:
            numer_w = jax.lax.dot_general(
                weights_kl * aux, H,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=_PALLAS_PRECISION,
            )
            W_new = W * numer_w
            W_new = W_new / jnp.sum(W_new, axis=1, keepdims=True)
            if n_given > 0:
                given = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, n_signatures), 2
                ) < n_given
                W_new = jnp.where(given, W, W_new)
            W_new = jnp.maximum(W_new, EPSILON)

        numer_h = jax.lax.dot_general(
            W, aux, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_PALLAS_PRECISION,
        )
        if use_lhalf:
            # cancellation-free l1/2 closed form (ops.klnmf._update_H_from_aux)
            quad = 4.0 * H * numer_h * weights_kl**2
            half_weight = weights_lhalf / 2.0
            root = jnp.sqrt(half_weight**2 + quad)
            H_new = 0.25 * (quad / (root + half_weight)) ** 2
            H_new = H_new / weights_kl**2
        else:
            H_new = H * numer_h
        H_new = jnp.maximum(H_new, EPSILON)
        return W_new, H_new

    W, H = jax.lax.fori_loop(0, steps_ref[0], one_update, (w_ref[:], h_ref[:]))
    w_out[:] = W
    h_out[:] = H


@functools.partial(
    jax.jit, static_argnames=("chunk", "n_given_signatures", "interpret")
)
def fused_mu_block_batched_weighted(
    X, W, H, n_steps, weights_kl=None, weights_lhalf=None, chunk=None,
    n_given_signatures: int = 0, interpret: bool = False,
):
    """Weighted / given-signature variant of fused_mu_block_batched.

    weights_kl: per-sample (D,) KL weights or None (None lowers to neutral
    ones). weights_lhalf: (D,) sparsity weights or None - None selects the
    plain multiplicative H update (the l1/2 closed form at weight 0 equals
    it mathematically but not bitwise, so the branch is static). Given
    signature columns are frozen INSIDE the per-iteration loop, exactly like
    ops.klnmf.update_WH.
    """
    R, V, K = W.shape
    D = X.shape[1]
    if chunk is None:
        chunk = default_chunk(R, V, D)
    if R % chunk:
        raise ValueError(f"n_restarts={R} not divisible by chunk={chunk}")
    use_lhalf = weights_lhalf is not None
    if weights_kl is None:
        weights_kl = jnp.ones((D,), X.dtype)
    if weights_lhalf is None:
        weights_lhalf = jnp.zeros((D,), X.dtype)
    # Mosaic-friendly 2-D layout for the per-sample weight vectors
    weights_kl = jnp.reshape(weights_kl, (1, D)).astype(X.dtype)
    weights_lhalf = jnp.reshape(weights_lhalf, (1, D)).astype(X.dtype)
    kernel = functools.partial(
        _mu_block_kernel_batched_weighted,
        n_given=int(n_given_signatures), use_lhalf=use_lhalf,
    )
    steps = jnp.asarray(n_steps, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // chunk,),
        in_specs=[
            pl.BlockSpec((V, D), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, *_: (0, 0),
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
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R, V, K), W.dtype),
            jax.ShapeDtypeStruct((R, K, D), H.dtype),
        ),
        interpret=interpret,
    )(steps, X, weights_kl, weights_lhalf, W, H)


def _mu_block_kernel_batched_masked(steps_ref, x_ref, mask_w_ref, mask_h_ref,
                                    w_ref, h_ref, w_out, h_out):
    """Rank-masked twin of _mu_block_kernel_batched for K-padded rank
    scans: per-restart masks mark the active leading signatures, arriving
    pre-broadcast as (C, 1, K) / (C, K, 1) floats (see the wrapper for the
    Mosaic block-shape rationale). Masked-off lanes are inert exactly as
    in ops.klnmf make_masked_step_functions - H rows held at exact zero,
    W columns passed through, normalization denominators pinned at 1."""
    X = x_ref[:]
    # Mask stays float (exact 0/1) end to end: Mosaic cannot insert a
    # minor dim on i1 vectors ("only supported for 32-bit types" — hit on
    # real v5e, invisible in interpret mode), so masking is arithmetic
    # blends instead of jnp.where on a broadcast bool. Exact because the
    # mask values are exactly 0.0/1.0.
    mk_w = mask_w_ref[:]              # (C, 1, K) — broadcast over V
    inv_w = 1.0 - mk_w
    mk_h = mask_h_ref[:]              # (C, K, 1) — broadcast over D

    def one_update(_, carry):
        W, H = carry  # (C, V, K), (C, K, D)
        WH = jax.lax.dot_general(
            W, H, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_PALLAS_PRECISION,
        )
        aux = X[None] / WH
        numer_w = jax.lax.dot_general(
            aux, H, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_PALLAS_PRECISION,
        )
        W_new = W * numer_w
        sums = jnp.sum(W_new, axis=1, keepdims=True)       # (C, 1, K)
        W_new = W_new / (sums * mk_w + inv_w)
        W_new = jnp.maximum(W_new, EPSILON)
        W_new = W_new * mk_w + W * inv_w
        # H uses the OLD W and the shared aux (reference update_WH order)
        numer_h = jax.lax.dot_general(
            W, aux, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_PALLAS_PRECISION,
        )
        H_new = jnp.maximum(H * numer_h, EPSILON)
        H_new = H_new * mk_h
        return W_new, H_new

    W, H = jax.lax.fori_loop(0, steps_ref[0], one_update, (w_ref[:], h_ref[:]))
    w_out[:] = W
    h_out[:] = H


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def fused_mu_block_batched_masked(X, W, H, rank_mask, n_steps,
                                  chunk: int | None = None,
                                  interpret: bool = False):
    """Advance all lanes of a K-padded rank scan by n_steps masked updates
    in one fused TPU kernel. X: (V, D); W: (R, V, Kp); H: (R, Kp, D);
    rank_mask: (R, Kp) bool.

    The mask rides in as TWO pre-broadcast float operands - (R, 1, Kp)
    for the W side and (R, Kp, 1) for the H side - so the lane-chunk axis
    never lands in a block's sublane position: a 2D (chunk, Kp) mask block
    violates Mosaic's (8, 128) last-two-dims rule whenever chunk is not a
    multiple of 8 (default_chunk returns ANY divisor of R under the VMEM
    budget; hit on real v5e at chunk=2, invisible in interpret mode). 3D
    blocks put (1, Kp)/(Kp, 1) in the constrained positions, which satisfy
    the full-dimension rule for every chunk."""
    R, V, K = W.shape
    D = X.shape[1]
    if chunk is None:
        chunk = default_chunk(R, V, D)
    if R % chunk:
        raise ValueError(f"n_restarts={R} not divisible by chunk={chunk}")
    steps = jnp.asarray(n_steps, jnp.int32).reshape(1)
    mask_f = rank_mask.astype(X.dtype)
    mask_w = mask_f[:, None, :]   # (R, 1, K)
    mask_h = mask_f[:, :, None]   # (R, K, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R // chunk,),
        in_specs=[
            pl.BlockSpec((V, D), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1, K), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, K, 1), lambda i, *_: (i, 0, 0),
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
        _mu_block_kernel_batched_masked,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R, V, K), W.dtype),
            jax.ShapeDtypeStruct((R, K, D), H.dtype),
        ),
        interpret=interpret,
    )(steps, X, mask_w, mask_h, W, H)


def make_block_update_auto_masked(X, n_restarts: int,
                                  interpret: bool = False):
    """Engine hook for the K-padded rank scan's lockstep loop: picks the
    VMEM-resident masked block kernel or the masked D-tiled iteration by
    problem size (the make_block_update_auto of the masked world).
    block_update(params, steps) operates on {"W", "H", "mask"} pytrees."""
    V, D = X.shape
    if whole_problem_fits_vmem(V, D):
        chunk = default_chunk(n_restarts, V, D)

        def block_update(params, steps):
            W, H = fused_mu_block_batched_masked(
                X, params["W"], params["H"], params["mask"], steps,
                chunk=chunk, interpret=interpret,
            )
            return {"W": W, "H": H, "mask": params["mask"]}

        return block_update

    d_tile = pick_d_tile(D)
    per_chunk = 3.0 * V * d_tile * 4
    chunk = max(1, int(_VMEM_BUDGET_BYTES / per_chunk))
    while chunk > 1 and n_restarts % chunk:
        chunk -= 1

    def block_update(params, steps):
        def one(_, carry):
            W, H = carry
            return fused_mu_iteration_dtiled_masked(
                X, W, H, params["mask"], chunk=chunk, d_tile=d_tile,
                interpret=interpret,
            )

        W, H = jax.lax.fori_loop(0, steps, one, (params["W"], params["H"]))
        return {"W": W, "H": H, "mask": params["mask"]}

    return block_update


# ---------------------------------------------------------------------------
# D-tiled variant: sample counts too large for a whole problem in VMEM.
# ---------------------------------------------------------------------------

def _mu_iteration_dtile_kernel(x_ref, mask_ref, w_ref, h_ref,
                               numer_w_out, h_out):
    """One joint MU iteration for a restart chunk, one D tile per grid step.

    Grid is (restart_chunks, d_tiles) with the d axis iterating fastest; the
    (C, V, K) W-numerator output block is revisited across a chunk's d steps,
    so it accumulates the full-D reduction in VMEM while each H tile is
    updated in place (H's update is sample-local, so one pass over D per
    iteration suffices). The aux ratio tile never touches HBM - the fusion
    XLA cannot do here, because aux feeds two different contractions.

    mask marks real sample columns: D is zero-padded up to a multiple of the
    tile (Mosaic needs 128-aligned tiles); padded columns contribute exact
    zeros to the W numerator and their H entries are pinned at 1.
    """
    d_index = pl.program_id(1)
    X = x_ref[:]             # (V, Dt)
    valid = mask_ref[:] > 0  # (1, Dt)
    W = w_ref[:]             # (C, V, K)
    H = h_ref[:]             # (C, K, Dt)
    WH = jax.lax.dot_general(
        W, H, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_PALLAS_PRECISION,
    )
    aux = X[None] / WH       # (C, V, Dt)
    aux_valid = jnp.where(valid[None], aux, 0.0)
    partial_numer = jax.lax.dot_general(
        aux_valid, H, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_PALLAS_PRECISION,
    )

    @pl.when(d_index == 0)
    def _():
        numer_w_out[:] = jnp.zeros_like(numer_w_out)

    numer_w_out[:] += partial_numer
    numer_h = jax.lax.dot_general(
        W, aux, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_PALLAS_PRECISION,
    )
    h_out[:] = jnp.where(valid[None], jnp.maximum(H * numer_h, EPSILON), 1.0)


def _dtiled_numer(X, W, H, chunk: int, d_tile: int, interpret: bool):
    """Run the D-tiled kernel: returns (full-D W numerator, updated H with
    the sample padding stripped). The W normalization happens in the caller
    (it needs the completed reduction; XLA fuses it into the loop)."""
    R, V, K = W.shape
    D = X.shape[1]
    if R % chunk:
        raise ValueError(f"n_restarts={R} not divisible by chunk={chunk}")
    n_tiles = -(-D // d_tile)
    D_pad = n_tiles * d_tile
    pad = D_pad - D
    mask = (jnp.arange(D_pad) < D).astype(X.dtype).reshape(1, D_pad)
    if pad:
        X = jnp.pad(X, ((0, 0), (0, pad)), constant_values=1.0)
        H = jnp.pad(H, ((0, 0), (0, 0), (0, pad)), constant_values=1.0)
    grid = (R // chunk, n_tiles)
    numer_w, H_new = pl.pallas_call(
        _mu_iteration_dtile_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((V, d_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, V, K), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, K, d_tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, V, K), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, K, d_tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, V, K), W.dtype),
            jax.ShapeDtypeStruct((R, K, D_pad), H.dtype),
        ),
        interpret=interpret,
    )(X, mask, W, H)
    if pad:
        H_new = H_new[:, :, :D]
    return numer_w, H_new


@functools.partial(
    jax.jit, static_argnames=("chunk", "d_tile", "interpret")
)
def fused_mu_iteration_dtiled(X, W, H, chunk: int = 1, d_tile: int = 1024,
                              interpret: bool = False):
    """One joint multiplicative update with the sample axis streamed through
    VMEM in d_tile-column tiles (for problems where a whole (V, D) working
    set cannot live in VMEM, e.g. 96 x 10k rank scans).

    X: (V, D); W: (R, V, K); H: (R, K, D). D is zero-mask-padded up to a
    multiple of d_tile internally (use a multiple of 128 on hardware). The W
    column-normalization + clip happens outside the kernel (it needs the
    completed full-D numerator; XLA fuses it into the surrounding loop).
    """
    numer_w, H_new = _dtiled_numer(X, W, H, chunk, d_tile, interpret)
    W_new = W * numer_w
    W_new = W_new / jnp.sum(W_new, axis=1, keepdims=True)
    W_new = jnp.maximum(W_new, EPSILON)
    return W_new, H_new


@functools.partial(
    jax.jit, static_argnames=("chunk", "d_tile", "interpret")
)
def fused_mu_iteration_dtiled_masked(X, W, H, rank_mask,
                                     chunk: int = 1, d_tile: int = 1024,
                                     interpret: bool = False):
    """Rank-masked D-tiled iteration for K-padded rank scans at large D.

    rank_mask: (R, K) bool, True for active signatures. Reuses the SAME
    Pallas kernel as fused_mu_iteration_dtiled - masking needs only the
    out-of-kernel postprocessing (padded K rows of the input H are exact
    zeros, so their W-numerator columns come out exactly zero; the masked
    normalization and the H re-zeroing match ops.klnmf
    make_masked_step_functions semantics).
    """
    numer_w, H_new = _dtiled_numer(X, W, H, chunk, d_tile, interpret)
    active = rank_mask[:, None, :]                  # (R, 1, K)
    W_new = W * numer_w
    sums = jnp.sum(W_new, axis=1, keepdims=True)
    W_new = W_new / jnp.where(active, sums, 1.0)
    W_new = jnp.maximum(W_new, EPSILON)
    W_new = jnp.where(active, W_new, W)
    H_new = jnp.where(rank_mask[:, :, None], H_new, 0.0)
    return W_new, H_new


def pick_d_tile(n_samples: int, max_tile: int = 2048) -> int:
    """Tile size for the D-streamed kernel: a multiple of 128 (Mosaic's lane
    alignment), capped at max_tile; D is mask-padded up to a tile multiple."""
    aligned = -(-min(n_samples, max_tile) // 128) * 128
    return min(aligned, max_tile)


def make_block_update_dtiled(X, n_restarts: int, chunk: int | None = None,
                             d_tile: int | None = None,
                             interpret: bool = False):
    """Engine hook for the lockstep-batched loop at large D: each block is a
    fori_loop of D-tiled fused iterations."""
    V, D = X.shape
    if d_tile is None:
        d_tile = pick_d_tile(D)
    if chunk is None:
        # VMEM per grid step ~ chunk * (V*d_tile aux + 2*K*d_tile H) floats
        per_chunk = 3.0 * V * d_tile * 4
        chunk = max(1, int(_VMEM_BUDGET_BYTES / per_chunk))
        while chunk > 1 and n_restarts % chunk:
            chunk -= 1

    def block_update(params, steps):
        def one(_, carry):
            W, H = carry
            return fused_mu_iteration_dtiled(
                X, W, H, chunk=chunk, d_tile=d_tile, interpret=interpret
            )

        W, H = jax.lax.fori_loop(
            0, steps, one, (params["W"], params["H"])
        )
        return {"W": W, "H": H}

    return block_update


def whole_problem_fits_vmem(n_features: int, n_samples: int) -> bool:
    """Whether one restart's full MU working set fits the VMEM budget."""
    return (
        _PER_RESTART_FLOATS * n_features * n_samples * 4 <= _VMEM_BUDGET_BYTES
    )


def make_block_update_auto(X, n_restarts: int, weights_kl=None,
                           weights_lhalf=None, interpret: bool = False):
    """Pick the right fused TPU kernel for the problem shape:

    - weighted (per-sample KL / l1/2 weights): the weighted VMEM-resident
      block kernel (requires the whole problem to fit VMEM);
    - large D (whole problem exceeds VMEM): the D-tiled streaming kernel;
    - otherwise: the plain VMEM-resident block kernel.
    """
    V, D = X.shape
    weighted = weights_kl is not None or weights_lhalf is not None
    fits = whole_problem_fits_vmem(V, D)
    if weighted:
        if not fits:
            raise ValueError(
                "The weighted fused Pallas path needs the whole (V, D) "
                "problem in VMEM; use the XLA path for weighted fits at "
                f"this size (V={V}, D={D})."
            )
        chunk = default_chunk(n_restarts, V, D)

        def block_update(params, steps):
            W, H = fused_mu_block_batched_weighted(
                X, params["W"], params["H"], steps,
                weights_kl=weights_kl, weights_lhalf=weights_lhalf,
                chunk=chunk, interpret=interpret,
            )
            return {"W": W, "H": H}

        return block_update
    if not fits:
        return make_block_update_dtiled(X, n_restarts, interpret=interpret)
    return make_block_update_batched(X, n_restarts, interpret=interpret)


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
