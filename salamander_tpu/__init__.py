"""salamander_tpu: a TPU-native NMF framework for mutational-signature analysis.

A ground-up JAX rebuild of the capabilities of parklab/Salamander v0.4.2:
KLNMF, minimum-volume NMF, correlated NMF and multimodal correlated NMF over
annotated data containers, with initialization, signature matching,
dimensionality reduction and plotting - compute expressed as jitted XLA/Pallas
programs that vmap over restarts and shard over device meshes.
"""

from . import (
    consts,
    containers,
    datasets,
    engine,
    initialization,
    io,
    ops,
    parallel,
    profiling,
    utils,
)
from .assign import (
    AssignmentResult,
    BootstrapExposuresResult,
    assign_exposures,
    assign_signatures,
    bootstrap_exposures,
)
from .containers import AnnData, MuData
from .extraction import ExtractionResult, extract_signatures
from .io import load_extraction, load_model, save_extraction, save_model
from .parallel import bootstrap_stability, fit_best_of

__version__ = "0.5.0"

__all__ = [
    "__version__",
    "AnnData",
    "AssignmentResult",
    "MuData",
    "BootstrapExposuresResult",
    "assign_exposures",
    "assign_signatures",
    "bootstrap_exposures",
    "bootstrap_stability",
    "consts",
    "containers",
    "datasets",
    "engine",
    "ExtractionResult",
    "extract_signatures",
    "fit_best_of",
    "initialization",
    "io",
    "load_extraction",
    "load_model",
    "ops",
    "parallel",
    "profiling",
    "save_extraction",
    "save_model",
    "utils",
]


try:  # plotting style applied on import, as in the reference facade
    from . import plot as pl  # noqa: F401

    pl.set_salamander_style()
    __all__.append("pl")
except ImportError:  # pragma: no cover - plotting lands later in the build
    pass

try:
    from . import tools as tl  # noqa: F401

    __all__.append("tl")
except ImportError:  # pragma: no cover
    pass

try:
    from . import models  # noqa: F401

    __all__.append("models")
except ImportError:  # pragma: no cover
    pass
