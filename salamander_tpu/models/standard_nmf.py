"""Shared structure of W/H-parameterized models (KLNMF, MvNMF).

Mirrors the reference StandardNMF (models/standard_nmf.py:19-99): common
initialization through initialize_standard_nmf, exposures as the
lower-dimensional representation, and the exposure-based embedding plot.
"""

from __future__ import annotations

import warnings
from typing import Any

import jax.numpy as jnp
import numpy as np

from .. import tools as tl
from ..initialization.initialize import initialize_standard_nmf
from .signature_nmf import SignatureNMF


class StandardNMF(SignatureNMF):
    """NMF models parameterized directly by a signature and exposure matrix."""

    def _initialize(self, given_parameters=None, init_kwargs=None) -> None:
        init_kwargs = {} if init_kwargs is None else init_kwargs.copy()
        self.asignatures = initialize_standard_nmf(
            self.adata,
            self.n_signatures,
            self.init_method,
            given_parameters,
            **init_kwargs,
        )

    def compute_reconstruction_errors(self) -> None:
        """Per-sample generalized KL between X and W @ H - the shared
        reconstruction error of every W/H-parameterized family (reference
        models/klnmf.py:54-62 semantics)."""
        from ..ops.klnmf import samplewise_kl_divergence

        errors = samplewise_kl_divergence(
            self.adata.X.T, self.asignatures.X.T,
            self.adata.obsm["exposures"].T,
        )
        self.adata.obs["reconstruction_error"] = np.asarray(errors)

    @staticmethod
    def _n_given_signatures(given_parameters: dict[str, Any] | None) -> int:
        if given_parameters and "asignatures" in given_parameters:
            return int(given_parameters["asignatures"].n_obs)
        return 0

    def _device_state(self):
        # kernel orientation: X (V, D), W (V, K), H (K, D)
        dtype = self._device_dtype
        data = {"X": jnp.asarray(self.adata.X.T, dtype)}
        return self._device_params(), data

    def _device_params(self):
        """The (W, H) parameter pytree alone - no count-matrix upload
        (the streaming fit path's entry; see KLNMF.fit_minibatch)."""
        dtype = self._device_dtype
        return {
            "W": jnp.asarray(self.asignatures.X.T, dtype),
            "H": jnp.asarray(self.adata.obsm["exposures"].T, dtype),
        }

    def _absorb_params(self, params) -> None:
        self.asignatures.X = np.asarray(params["W"]).T
        self.adata.obsm["exposures"] = np.asarray(params["H"]).T

    def transform(self, adata, **fit_kwargs):
        """Infer exposures for NEW samples under this model's (frozen)
        signatures: a fresh fit of the same class with all signatures given,
        so only the exposure matrix is learned. Returns the fitted projector
        model; neither `self` nor the input container is modified.

        (The reference expresses this via
        fit(given_parameters={'asignatures': ...}); this is the one-call
        convenience for the common project-new-samples workflow.)
        """
        if not getattr(self, "_is_fitted", False):
            raise ValueError("transform() requires a fitted model.")
        if "given_parameters" in fit_kwargs:
            raise ValueError(
                "transform() freezes this model's signatures itself; "
                "'given_parameters' cannot be overridden here - use fit() "
                "directly for custom given parameters."
            )
        from ..io import _HYPERPARAM_KEYS

        # walk the MRO so user subclasses of KLNMF/MvNMF keep working
        for klass in type(self).__mro__:
            if klass.__name__ in _HYPERPARAM_KEYS:
                hyperparameter_keys = _HYPERPARAM_KEYS[klass.__name__]
                break
        else:
            raise TypeError(
                f"transform() does not know the hyperparameters of "
                f"{type(self).__name__}."
            )
        hyperparameters = {
            key: getattr(self, key) for key in hyperparameter_keys
        }
        hyperparameters["init_method"] = "flat"
        projector = type(self)(**hyperparameters)
        from .signature_nmf import share_transform_runner_cache

        share_transform_runner_cache(self, projector)
        projector.fit(
            adata.copy() if hasattr(adata, "copy") else adata,
            given_parameters={"asignatures": self.asignatures.copy()},
            **fit_kwargs,
        )
        return projector

    def plot_embeddings(
        self,
        method: str = "umap",
        n_components: int = 2,
        dimensions: tuple[int, int] = (0, 1),
        color: str | None = None,
        zorder: str | None = None,
        annotations=None,
        outfile: str | None = None,
        **kwargs,
    ):
        from .. import plot as pl
        import matplotlib.pyplot as plt

        tl.reduce_dimension(
            self.adata, basis="exposures", method=method,
            n_components=n_components,
        )
        if self.n_signatures <= 2:
            warnings.warn(
                f"There are only {self.n_signatures} many signatures. "
                "The exposures are plotted directly.",
                UserWarning,
            )
            basis = "exposures"
        else:
            basis = method

        ax = pl.embedding(
            adata=self.adata,
            basis=basis,
            dimensions=dimensions,
            color=color,
            zorder=zorder,
            annotations=annotations,
            **kwargs,
        )
        if outfile is not None:
            plt.savefig(outfile, bbox_inches="tight")
        return ax
