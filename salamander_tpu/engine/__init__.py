"""The device-resident fit engine (jitted convergence loop)."""

from .fit import FitConfig, FitResult, fit_loop, make_fit_function  # noqa: F401
