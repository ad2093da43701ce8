"""Loader for the reference's real-NTL9 stage pickles.

The reference's tier-2 regression tests resume from pickled ``modelWE``
snapshots at each pipeline stage (``/root/reference/tests/fixtures/
hamsms.py:13-258``). This module unpickles those snapshots *without* the
reference's heavy dependency stack: the reference package is imported
under a synthetic ``msm_we`` package (only the pure-python modules the
pickles need), and any class that still cannot be resolved (mdtraj
topology internals, westpa bin mappers, ...) is replaced by a tolerant
stub that simply keeps the pickled ``__dict__``. Every consumer below
only reads plain numpy arrays / dicts off the stubs, so the stubbing is
lossless for test purposes.

Used by ``tests/test_ntl9_cleaning_acceptance.py`` -- the real-data
302->194 flux-matrix-cleaning acceptance test (SURVEY.md section 7,
hard part 5).
"""
import importlib
import importlib.util
import os
import pickle
import sys
import types

import numpy as np

REF_MODELS = "/root/reference/tests/reference/1000ns_ntl9/models"
REF_PKG = "/root/reference/msm_we"


def reference_pickles_available():
    return os.path.isdir(REF_MODELS) and os.path.isdir(REF_PKG)


def _stub_module(name, **attrs):
    m = types.ModuleType(name)
    m.__path__ = []
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _missing(name):
    """True when ``name`` is neither imported nor installed.

    Stubs must only fill genuine absences: registering a stub for a
    package that *is* installed but merely not yet imported would shadow
    the real package for every later test in the session (e.g. the
    TICA/VAMP deeptime cross-check silently downgrading to its local
    oracle because ``sys.modules['deeptime']`` is our TICA=object stub).
    """
    if name in sys.modules:
        return False
    try:
        return importlib.util.find_spec(name) is None
    except (ImportError, ValueError):
        return True


def _install_reference_package():
    """Register the reference tree as importable ``msm_we`` with stubbed
    third-party leaves (same machinery as test_reference_differential)."""
    pkg = sys.modules.get("msm_we")
    if pkg is None or getattr(pkg, "__path__", [None])[0] != REF_PKG:
        pkg = types.ModuleType("msm_we")
        pkg.__path__ = [REF_PKG]
        sys.modules["msm_we"] = pkg
    sput = sys.modules.get("scipy.sparse.sputils")
    if sput is None:
        try:
            import scipy.sparse.sputils as sput  # noqa: F401
        except ImportError:
            sput = _stub_module("scipy.sparse.sputils")
    if not hasattr(sput, "isdense"):
        sput.isdense = lambda m: isinstance(m, np.ndarray)
    if _missing("mdtraj"):
        _stub_module("mdtraj", load=lambda *a, **k: None)
    if _missing("ray"):
        _stub_module(
            "ray",
            remote=lambda f=None, **k: (f if f is not None else (lambda g: g)),
            put=lambda x: x,
            get=lambda x: x,
            init=lambda *a, **k: None,
            is_initialized=lambda: False,
        )
    if _missing("westpa"):
        class _RectMapper:
            def __init__(self, *a, **k):
                pass

        class _VorMapper:
            def __init__(self, *a, **k):
                pass

        class _FuncMapper:
            def __init__(self, *a, **k):
                pass

        west = _stub_module("westpa")
        wa = _stub_module("westpa.analysis")
        wc = _stub_module("westpa.core")
        wb = _stub_module(
            "westpa.core.binning",
            RectilinearBinMapper=_RectMapper,
            VoronoiBinMapper=_VorMapper,
            FuncBinMapper=_FuncMapper,
        )
        west.analysis, west.core, wc.binning = wa, wc, wb
    if _missing("deeptime"):
        dt = _stub_module("deeptime")
        dt.decomposition = _stub_module(
            "deeptime.decomposition", TICA=object, VAMP=object
        )
    if _missing("pyemma"):
        _stub_module("pyemma")
    importlib.import_module("msm_we.msm_we")
    importlib.import_module("msm_we.stratified_clustering")


def _make_stub_class(module, name):
    """A pickle-compatible placeholder that keeps the pickled state."""

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_pickled_state"] = state

    return type(
        name,
        (),
        {
            "__new__": lambda cls, *a, **k: object.__new__(cls),
            "__init__": lambda self, *a, **k: None,
            "__setstate__": __setstate__,
            "_stub_origin": f"{module}.{name}",
        },
    )


_STUB_CACHE = {}


class TolerantUnpickler(pickle.Unpickler):
    """Unpickler that substitutes data-preserving stubs for any class it
    cannot import (mdtraj topologies, old sklearn internals, ...)."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            key = (module, name)
            if key not in _STUB_CACHE:
                _STUB_CACHE[key] = _make_stub_class(module, name)
            return _STUB_CACHE[key]


def load_stage_pickle(stage):
    """Load ``<stage>.obj`` from the reference NTL9 model mirror.

    Stages present in this mirror: initialized, loaded, clustered,
    fluxmatrixed, organized (``completed.obj`` and the west.h5 inputs
    are listed in ``.MISSING_LARGE_BLOBS``).
    """
    _install_reference_package()
    path = os.path.join(REF_MODELS, f"{stage}.obj")
    import warnings

    with open(path, "rb") as fh, warnings.catch_warnings():
        # sklearn 1.0.2-era estimators unpickle with version warnings;
        # only their plain ndarray attributes (cluster_centers_) are read
        warnings.simplefilter("ignore")
        return TolerantUnpickler(fh).load()


def load_golden(name):
    return np.load(os.path.join(REF_MODELS, f"{name}.npy"))
