"""Model layer (L2): the public NMF model families.

Each model is a thin stateful wrapper - holding annotated containers and
hyperparameters - around a parameter pytree plus pure update/objective
functions, driven by the shared on-device fit engine.
"""

from .ardnmf import ARDNMF  # noqa: F401
from .corrnmf_det import CorrNMFDet  # noqa: F401
from .klnmf import KLNMF  # noqa: F401
from .mmcorrnmf import MultimodalCorrNMF  # noqa: F401
from .mvnmf import MvNMF  # noqa: F401

__all__ = ["ARDNMF", "CorrNMFDet", "KLNMF", "MultimodalCorrNMF", "MvNMF"]
