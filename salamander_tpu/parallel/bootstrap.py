"""Bootstrap stability analysis for signatures.

A standard question the reference cannot answer efficiently: how stable are
the extracted signatures under resampling of the cohort? Here B bootstrap
replicates (samples drawn with replacement) are fitted SIMULTANEOUSLY - the
per-replicate count matrices ride a batched data axis through the lockstep
engine - and each replicate's signatures are Hungarian-matched back to the
full-data fit to produce per-signature cosine-stability distributions
(the SigProfiler-style stability score).

Currently implemented for the W/H families (KLNMF semantics; the fit uses
the unweighted joint multiplicative update).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np
import pandas as pd

from ..engine import FitConfig, make_fit_function
from ..initialization.methods import random_init_batch
from ..ops import klnmf as ops
from ..utils import match_signatures_pair


class BootstrapResult(NamedTuple):
    """Per-signature stability of a fitted model under cohort resampling."""

    stability: pd.Series        # mean matched cosine per signature
    similarities: pd.DataFrame  # (n_bootstraps, n_signatures) matched cosines
    signatures: np.ndarray      # (B, K, V) matched bootstrap signatures
    losses: np.ndarray          # (B,) final objective per replicate


def _cosine(u, v):
    return float(np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v)))


def bootstrap_stability(
    model,
    n_bootstraps: int = 50,
    seed: int = 0,
    config: FitConfig | None = None,
    dtype=np.float32,
) -> BootstrapResult:
    """Assess signature stability of a FITTED StandardNMF-family model.

    Draws `n_bootstraps` resampled cohorts (samples with replacement), fits
    all of them in one device program (random init per replicate), matches
    each replicate's signatures to the model's, and reports matched cosine
    similarities. Stability near 1 = robust signature; low mean stability
    flags overfitting / rank too high.
    """
    if not getattr(model, "_is_fitted", False):
        raise ValueError("bootstrap_stability() requires a fitted model.")
    if type(model).__name__ != "KLNMF":
        import warnings

        warnings.warn(
            "bootstrap_stability refits replicates with the plain KLNMF "
            f"update; stability of {type(model).__name__} signatures is "
            "assessed under the KL objective, not the model's own.",
            UserWarning,
        )
    X = np.asarray(model.adata.X.T, dtype=dtype)  # (V, D)
    n_features, n_samples = X.shape
    n_signatures = model.n_signatures
    config = config or FitConfig(
        min_iterations=model.min_iterations,
        max_iterations=model.max_iterations,
        conv_test_freq=model.conv_test_freq,
        tol=model.tol,
    )

    rng = np.random.default_rng(seed)
    sample_indices = rng.integers(
        0, n_samples, size=(n_bootstraps, n_samples)
    )
    X_boot = np.stack([X[:, idx] for idx in sample_indices])  # (B, V, D)

    # per-replicate random init (jax.random, batched)
    key = jax.random.PRNGKey(seed)
    W0, H0 = random_init_batch(
        key, jax.numpy.asarray(X, dtype), n_signatures, n_bootstraps, dtype
    )

    update_fn, objective_fn = ops.make_step_functions()
    run = make_fit_function(
        update_fn, objective_fn, config, batched=True, batched_data=True
    )
    result = run(
        {"W": W0, "H": H0}, {"X": jax.numpy.asarray(X_boot, dtype)}
    )
    W_boot = np.asarray(result.params["W"])  # (B, V, K)
    losses = np.asarray(
        jax.jit(
            jax.vmap(objective_fn, in_axes=(0, 0))
        )({"W": result.params["W"], "H": result.params["H"]},
          {"X": jax.numpy.asarray(X_boot, dtype)})
    )

    reference_signatures = model.signatures  # (K, V) dataframe
    matched = np.empty((n_bootstraps, n_signatures, n_features))
    similarities = np.empty((n_bootstraps, n_signatures))
    for b in range(n_bootstraps):
        replicate = pd.DataFrame(
            W_boot[b].T, columns=reference_signatures.columns
        )
        order = match_signatures_pair(reference_signatures, replicate)
        matched[b] = W_boot[b].T[order]
        for k in range(n_signatures):
            similarities[b, k] = _cosine(
                reference_signatures.values[k], matched[b, k]
            )

    names = list(model.signature_names)
    similarity_frame = pd.DataFrame(similarities, columns=names)
    return BootstrapResult(
        stability=similarity_frame.mean(axis=0),
        similarities=similarity_frame,
        signatures=matched,
        losses=losses,
    )
