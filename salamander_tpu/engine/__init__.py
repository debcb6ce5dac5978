"""The device-resident fit engine (jitted convergence loop)."""

from .fit import (  # noqa: F401
    FitConfig,
    FitResult,
    LockstepState,
    effective_tolerance,
    finish_lockstep,
    fit_loop,
    fit_loop_lockstep,
    init_lockstep_state,
    make_fit_function,
    run_lockstep_segment,
    tolerance_floor,
)
