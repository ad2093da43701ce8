"""msm_we_tpu: TPU-native haMSM estimation from weighted-ensemble data.

A ground-up JAX/XLA/Pallas re-design with the capability surface of the
reference ``msm_we`` package (see SURVEY.md): WESTPA ``west.h5`` ingest,
featurization and dimensionality reduction, (stratified per-WE-bin) k-means
clustering, weighted flux-matrix estimation, steady-state/committor/flux
analysis, first-passage-time engines, WE bin/allocation optimization, and
WESTPA plugin drivers.
"""

__version__ = "0.1.0"

from . import utils  # noqa: F401
from ._logging import log  # noqa: F401
from .msm import (  # noqa: F401
    DirectFPT,
    DiscreteEnsemble,
    DiscretePathEnsemble,
    Ensemble,
    MarkovFPT,
    MarkovPlusColorModel,
    MatrixFPT,
    NonMarkovFPT,
    NonMarkovModel,
    PathEnsemble,
)

# Heavier, JAX-dependent pieces are imported lazily by users:
#   from msm_we_tpu.model import modelWE
#   from msm_we_tpu import optimization
