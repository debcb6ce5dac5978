"""KLNMF: weighted generalized-KL NMF with optional l1/2 exposure sparsity.

API parity with the reference KLNMF (models/klnmf.py:18-153): fitting_kwargs
'weights_kl'/'weights_lhalf' (scalar/list broadcast to per-sample arrays,
non-negativity enforced), joint update_WH per iteration, weighted-KL +
penalty objective. The per-iteration update and the convergence loop run
jitted on device.
"""

from __future__ import annotations

from typing import Any, Literal

import jax.numpy as jnp
import numpy as np

from ..ops import klnmf as ops
from ..utils import shape_checker, type_checker
from .standard_nmf import StandardNMF

FITTING_KWARGS = ("weights_kl", "weights_lhalf")


class KLNMF(StandardNMF):
    """Decompose counts X into W @ H by minimizing weighted generalized KL
    divergence under normalized signatures (Lee & Seung multiplicative
    updates), with an optional sparsity-inducing l1/2 exposure penalty."""

    def __init__(
        self,
        n_signatures: int = 1,
        init_method: str = "nndsvd",
        min_iterations: int = 500,
        max_iterations: int = 10000,
        conv_test_freq: int = 10,
        tol: float = 1e-7,
        dtype: str | None = None,
    ):
        super().__init__(
            n_signatures, init_method, min_iterations, max_iterations,
            conv_test_freq, tol, dtype=dtype,
        )
        self.weights_kl: np.ndarray | None = None
        self.weights_lhalf: np.ndarray | None = None

    @property
    def objective(self) -> Literal["minimize", "maximize"]:
        return "minimize"

    def compute_reconstruction_errors(self) -> None:
        errors = ops.samplewise_kl_divergence(
            self.adata.X.T, self.asignatures.X.T, self.adata.obsm["exposures"].T
        )
        self.adata.obs["reconstruction_error"] = np.asarray(errors)

    def objective_function(self) -> float:
        return float(
            ops.klnmf_objective(
                self.adata.X.T,
                self.asignatures.X.T,
                self.adata.obsm["exposures"].T,
                self.weights_kl,
                self.weights_lhalf,
            )
        )

    # ------------------------------------------------------------------ #
    # engine hooks
    # ------------------------------------------------------------------ #
    def _device_state(self):
        params, data = super()._device_state()
        dtype = self._device_dtype
        if self.weights_kl is not None:
            data["weights_kl"] = jnp.asarray(self.weights_kl, dtype)
        if self.weights_lhalf is not None:
            data["weights_lhalf"] = jnp.asarray(self.weights_lhalf, dtype)
        return params, data

    def _build_step(self, given_parameters=None):
        return ops.make_step_functions(
            self._n_given_signatures(given_parameters)
        )

    # ------------------------------------------------------------------ #
    # fitting kwargs
    # ------------------------------------------------------------------ #
    def _check_weights(self, weights: np.ndarray, name: str = "weights") -> None:
        type_checker(name, weights, np.ndarray)
        shape_checker(name, weights, (self.adata.n_obs,))
        if not all(weights >= 0):
            raise ValueError(
                "Only non-negative KL-divergence and sparsity penalty weights "
                "are allowed."
            )

    def _setup_fitting_parameters(
        self, fitting_kwargs: dict[str, Any] | None = None
    ) -> None:
        if fitting_kwargs is None:
            fitting_kwargs = {name: None for name in FITTING_KWARGS}

        for kwarg in fitting_kwargs:
            if kwarg not in FITTING_KWARGS:
                raise ValueError(
                    "The given fitting keyword arguments include parameters "
                    f"outside of {list(FITTING_KWARGS)}."
                )

        for name, weights in fitting_kwargs.items():
            if weights is not None:
                type_checker(name, weights, [float, int, list, np.ndarray])
                if type(weights) in [float, int]:
                    weights = weights * np.ones(self.adata.n_obs)
                if type(weights) is list:
                    weights = np.array(weights)
                self._check_weights(weights, name)
            setattr(self, name, weights)
