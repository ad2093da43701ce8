"""Standalone trajectory-MSM and first-passage-time library (reference L8).

Parity targets: ``msm_we/nmm.py``, ``msm_we/fpt.py``, ``msm_we/ensembles.py``.
"""
from .ensembles import DiscreteEnsemble, DiscretePathEnsemble, Ensemble, PathEnsemble
from .fpt import DirectFPT, MarkovFPT, MatrixFPT, NonMarkovFPT
from .nmm import MarkovPlusColorModel, NonMarkovModel

__all__ = [
    "Ensemble",
    "PathEnsemble",
    "DiscreteEnsemble",
    "DiscretePathEnsemble",
    "DirectFPT",
    "MatrixFPT",
    "MarkovFPT",
    "NonMarkovFPT",
    "NonMarkovModel",
    "MarkovPlusColorModel",
]
