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
from .precision import mm, omm


def volume_logdet(W, delta: float):
    """log det(W^T W + delta I) - the signature-simplex volume surrogate."""
    gram = omm(W.T, W) + delta * jnp.eye(W.shape[1], dtype=W.dtype)
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
    chol = jax.scipy.linalg.cho_factor(omm(W.T, W) + delta * eye)
    Y = jax.scipy.linalg.cho_solve(chol, eye)
    Y_minus = jnp.maximum(0.0, -Y)
    Y_abs = jnp.abs(Y)
    WY_minus = mm(W, Y_minus)
    WY_abs = mm(W, Y_abs)

    rowsums_H = jnp.sum(H, axis=1)
    linear = rowsums_H - 4.0 * lam * WY_minus
    disc_ratio = 8.0 * lam * WY_abs * mm(X / mm(W, H), H.T)
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


# ---------------------------------------------------------------------------
# rank-masked twins: several MvNMF problems of different rank k share ONE
# compiled program of padded rank Kp (the K-padded rank-scan mechanism,
# mirroring klnmf.make_masked_step_functions). Padded H rows are exact
# zeros and padded W columns pass through unchanged; the volume term and
# the (Kp, Kp) inverse see an identity-padded Gram matrix, so the active
# block's logdet/inverse equal the rank-k values exactly (block-diagonal
# determinant/inverse). Reference semantics:
# /root/reference/src/salamander/models/mvnmf.py:19-92.
# ---------------------------------------------------------------------------


def _masked_gram(W, delta, mask):
    """(W^T W + delta I) with padded rows/columns replaced by identity:
    blockdiag(active Gram + delta I, I) - its logdet and inverse restrict
    exactly to the active block."""
    n_signatures = W.shape[1]
    eye = jnp.eye(n_signatures, dtype=W.dtype)
    gram = omm(W.T, W) + delta * eye
    both = mask[:, None] & mask[None, :]
    return jnp.where(both, gram, eye)


def volume_logdet_masked(W, delta, mask):
    """log det of the ACTIVE signatures' Gram block (identity padding
    contributes log det I = 0)."""
    _, logdet = jnp.linalg.slogdet(_masked_gram(W, delta, mask))
    return logdet


def kl_divergence_penalized_masked(X, W, H, lam, delta, mask):
    """Rank-k MvNMF objective evaluated through the Kp-padded arrays:
    padded H rows are exact zeros (KL term exact), padded Gram rows are
    identity (volume term exact)."""
    return kl_divergence(X, W, H) + lam * volume_logdet_masked(
        W, delta, mask
    )


def update_W_unconstrained_masked(X, W, H, lam, delta, mask,
                                  n_given_signatures: int = 0):
    """update_W_unconstrained through the identity-padded Gram inverse.

    Y = blockdiag((Wa^T Wa + delta I)^-1, I): padded columns of Y are unit
    vectors, so active columns of W @ |Y| / W @ max(0, -Y) never see padded
    contributions and compute their exact rank-k update; padded W columns
    are restored unchanged."""
    n_signatures = W.shape[1]
    eye = jnp.eye(n_signatures, dtype=W.dtype)
    chol = jax.scipy.linalg.cho_factor(_masked_gram(W, delta, mask))
    Y = jax.scipy.linalg.cho_solve(chol, eye)
    Y_minus = jnp.maximum(0.0, -Y)
    Y_abs = jnp.abs(Y)
    WY_minus = mm(W, Y_minus)
    WY_abs = mm(W, Y_abs)

    rowsums_H = jnp.sum(H, axis=1)
    linear = rowsums_H - 4.0 * lam * WY_minus
    disc_ratio = 8.0 * lam * WY_abs * mm(X / mm(W, H), H.T)
    root = jnp.sqrt(linear**2 + disc_ratio)
    # cancellation-free form, as update_W_unconstrained (REQUIRED for f32)
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
        clipped = jnp.where(given[None, :], W, clipped)
    return jnp.where(mask[None, :], clipped, W)


def _renormalized_objective_masked(X, W_trial, H, lam, delta, mask):
    """normalize + clip + evaluate, keeping padded lanes EXACTLY inert:
    padded H rows stay exact zeros (the unmasked twin's EPSILON clip would
    lift them and perturb W @ H) and padded W columns bypass the
    normalization (dividing the uniform dummies by their ~1.0 float sum
    would walk them by an ulp per line-search trial)."""
    W_new, H_new = normalize_wh(W_trial, H)
    W_new = jnp.where(
        mask[None, :], jnp.maximum(W_new, EPSILON), W_trial
    )
    H_new = jnp.where(mask[:, None], jnp.maximum(H_new, EPSILON), 0.0)
    return W_new, H_new, kl_divergence_penalized_masked(
        X, W_new, H_new, lam, delta, mask
    )


def line_search_masked(X, W, H, lam, delta, gamma, W_unconstrained, mask):
    """line_search through the masked objective/renormalization. Padded W
    columns are identical in W and W_unconstrained (update_W_..._masked
    restores them), so every trial interpolation leaves them fixed; their
    column sums are 1 (uniform dummies), so normalization is a no-op on
    padded H rows too."""
    prev_objective = kl_divergence_penalized_masked(X, W, H, lam, delta, mask)
    W0, H0, of0 = _renormalized_objective_masked(
        X, W_unconstrained, H, lam, delta, mask
    )

    def cond(carry):
        _, _, of_value, g = carry
        return (of_value > prev_objective) & (g > 1e-16)

    def body(carry):
        _, _, _, g = carry
        g = g * 0.8
        W_trial = (1.0 - g) * W + g * W_unconstrained
        W_new, H_new, of_value = _renormalized_objective_masked(
            X, W_trial, H, lam, delta, mask
        )
        return W_new, H_new, of_value, g

    W_new, H_new, _, gamma = jax.lax.while_loop(
        cond, body, (W0, H0, of0, gamma)
    )
    gamma = jnp.minimum(1.0, 1.2 * gamma)
    return W_new, H_new, gamma


def make_masked_step_functions(lam: float, delta: float,
                               n_given_signatures: int = 0):
    """Rank-masked MvNMF engine step for K-padded rank scans.

    params = {"W": (V, Kp), "H": (Kp, D), "gamma": scalar, "mask": (Kp,)};
    data = {"X": (V, D)}. Each active lane computes the rank-k MvNMF
    iteration (H multiplicative update, then the min-vol W update with
    backtracking line search and per-lane persistent gamma); padded lanes
    are inert. One compiled program serves every rank of a bucket
    (parallel/restarts.py rank_scan_mvnmf)."""
    from . import klnmf as klops

    def update_fn(params, data):
        X = data["X"]
        W, H, mask = params["W"], params["H"], params["mask"]
        aux = X / mm(W, H)
        H = jnp.where(
            mask[:, None],
            jnp.maximum(H * mm(W.T, aux), klops.EPSILON),
            0.0,
        )
        W_unconstrained = update_W_unconstrained_masked(
            X, W, H, lam, delta, mask, n_given_signatures
        )
        W, H, gamma = line_search_masked(
            X, W, H, lam, delta, params["gamma"], W_unconstrained, mask
        )
        return {"W": W, "H": H, "gamma": gamma, "mask": mask}

    def objective_fn(params, data):
        return kl_divergence_penalized_masked(
            data["X"], params["W"], params["H"], lam, delta, params["mask"]
        )

    return update_fn, objective_fn
