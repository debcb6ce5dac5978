"""The device-resident fit engine (jitted convergence loop)."""

from .fit import (  # noqa: F401
    FitConfig,
    FitResult,
    effective_tolerance,
    fit_loop,
    fit_loop_lockstep,
    make_fit_function,
    tolerance_floor,
)
