"""Minimum-volume NMF kernels: volume-regularized objective, unconstrained
W update, and a backtracking line search compiled as a lax.while_loop.

Numeric semantics match the reference's numba kernels in
/root/reference/src/salamander/models/mvnmf.py:
  volume_logdet          :19-24   log det(W^T W + delta I)
  kl_divergence_penalized:27-34   KL + lam * volume
  update_W_unconstrained :37-66   Leplat-Gillis-Ang closed-form MU step with
                                  the (K,K) inverse Y = (W^T W + delta I)^-1
  line_search            :69-92   shrink gamma by 0.8 while the objective is
                                  worse (floor 1e-16), first trial is the full
                                  unconstrained step; afterwards gamma is
                                  relaxed to min(1, 1.2*gamma)

The data-dependent backtracking loop - a Python while in the reference -
compiles to a jax.lax.while_loop so the whole MvNMF iteration stays on
device. The (K,K) inverse is a trivial on-device solve (K <= ~20).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .klnmf import EPSILON, kl_divergence, normalize_wh


def volume_logdet(W, delta: float):
    """log det(W^T W + delta I) - the signature-simplex volume surrogate."""
    gram = W.T @ W + delta * jnp.eye(W.shape[1], dtype=W.dtype)
    _, logdet = jnp.linalg.slogdet(gram)
    return logdet


def kl_divergence_penalized(X, W, H, lam: float, delta: float):
    """The MvNMF objective: generalized KL plus lam * volume."""
    return kl_divergence(X, W, H) + lam * volume_logdet(W, delta)


def update_W_unconstrained(X, W, H, lam: float, delta: float,
                           n_given_signatures: int = 0):
    """Closed-form minimum-volume multiplicative W step (before the
    normalization line search). Given columns are frozen and left unclipped.
    """
    n_signatures = W.shape[1]
    # (W^T W + delta I) is SPD: invert via Cholesky (cheaper and better
    # conditioned than LU-based inv; the reference's numba kernel uses
    # np.linalg.inv, mvnmf.py:44)
    eye = jnp.eye(n_signatures, dtype=W.dtype)
    chol = jax.scipy.linalg.cho_factor(W.T @ W + delta * eye)
    Y = jax.scipy.linalg.cho_solve(chol, eye)
    Y_minus = jnp.maximum(0.0, -Y)
    Y_abs = jnp.abs(Y)
    WY_minus = W @ Y_minus
    WY_abs = W @ Y_abs

    rowsums_H = jnp.sum(H, axis=1)
    linear = rowsums_H - 4.0 * lam * WY_minus
    disc_ratio = 8.0 * lam * WY_abs * ((X / (W @ H)) @ H.T)
    root = jnp.sqrt(linear**2 + disc_ratio)
    # numerator = sqrt(linear^2 + d) - linear. The reference evaluates this
    # literally (mvnmf.py:56-60), which catastrophically cancels in float32
    # when d << linear^2 (measured: 5-10% objective oscillations on PCAWG);
    # for positive `linear` use the equivalent d / (sqrt(linear^2+d)+linear),
    # which is cancellation-free. Identical in exact arithmetic.
    numerator = jnp.where(
        linear > 0.0,
        disc_ratio / (root + jnp.abs(linear)),
        root - linear,
    )
    denominator = 4.0 * lam * WY_abs
    W_new = W * numerator / denominator

    clipped = jnp.maximum(W_new, EPSILON)
    if n_given_signatures > 0:
        given = jnp.arange(n_signatures) < n_given_signatures
        return jnp.where(given[None, :], W, clipped)
    return clipped


def _renormalized_objective(X, W_trial, H, lam, delta):
    """Normalize the trial W (pushing scale into H), clip, and evaluate."""
    W_new, H_new = normalize_wh(W_trial, H)
    W_new = jnp.maximum(W_new, EPSILON)
    H_new = jnp.maximum(H_new, EPSILON)
    return W_new, H_new, kl_divergence_penalized(X, W_new, H_new, lam, delta)


def line_search(X, W, H, lam: float, delta: float, gamma, W_unconstrained):
    """Backtracking line search on the interpolation parameter gamma.

    Carries gamma across outer iterations (the caller persists it). Returns
    (W_new, H_new, gamma_new). Fully jittable: the data-dependent
    backtracking is a lax.while_loop with carry (W, H, objective, gamma).
    """
    prev_objective = kl_divergence_penalized(X, W, H, lam, delta)
    W0, H0, of0 = _renormalized_objective(X, W_unconstrained, H, lam, delta)

    def cond(carry):
        _, _, of_value, g = carry
        return (of_value > prev_objective) & (g > 1e-16)

    def body(carry):
        _, _, _, g = carry
        g = g * 0.8
        W_trial = (1.0 - g) * W + g * W_unconstrained
        W_new, H_new, of_value = _renormalized_objective(X, W_trial, H, lam, delta)
        return W_new, H_new, of_value, g

    W_new, H_new, _, gamma = jax.lax.while_loop(cond, body, (W0, H0, of0, gamma))
    gamma = jnp.minimum(1.0, 1.2 * gamma)
    return W_new, H_new, gamma
