"""Round-3 housekeeping regressions: VERDICT weak-items 6/8 and the round-2
advisor findings (self-iadd, dedup_coordinates validation, populations raise,
pcoord_len read from file)."""
import numpy as np
import pytest

from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.data.synthetic import SynthWESettings
from msm_we_tpu.model import modelWE


def _init_model(path, **kwargs):
    model = modelWE()
    model.initialize(
        [str(path)],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "synth",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none",
        tau=1.0,
        **kwargs,
    )
    return model


def test_populations_raises():
    """The reference *returns* the NotImplementedError (nmm.py:574); we raise."""
    from msm_we_tpu.msm.nmm import MarkovPlusColorModel

    model = MarkovPlusColorModel.__new__(MarkovPlusColorModel)
    with pytest.raises(NotImplementedError):
        model.populations()


def test_ensemble_self_iadd_terminates():
    from msm_we_tpu.msm.ensembles import Ensemble

    ens = Ensemble([np.arange(4.0), np.arange(5.0)], verbose=False)
    ens += ens
    assert len(ens.trajectories) == 4


def test_dedup_coordinates_validation(tmp_path):
    path = tmp_path / "west.h5"
    generate_west_h5(str(path), n_iterations=3, n_segments=4, seed=3)

    with pytest.raises(ValueError, match="dedup_coordinates"):
        _init_model(path, dedup_coordinates="yes")

    # Truthy-but-not-literal-True values normalize instead of silently
    # falling through to the direct path (round-2 advisor finding).
    model = _init_model(path, dedup_coordinates=np.True_)
    assert model.dedup_coordinates is True
    model = _init_model(path, dedup_coordinates=1)
    assert model.dedup_coordinates is True
    model = _init_model(path, dedup_coordinates=0)
    assert model.dedup_coordinates is False
    model = _init_model(path, dedup_coordinates="auto")
    assert model.dedup_coordinates == "auto"


def test_pcoord_len_read_from_file(tmp_path):
    """pcoord_len must reflect the file's frames-per-segment (reference
    ``_data.py:843``), not a hardcoded 2."""
    path = tmp_path / "west.h5"
    settings = SynthWESettings(n_iterations=4, n_segments=4, seed=5, pcoord_len=7)
    generate_west_h5(str(path), settings=settings)

    model = _init_model(path)
    model.get_iterations()
    model.load_iter_data(1)
    assert model.pcoord_len == 7


def test_collect_iter_coordinates_delegates(tmp_path):
    """The facade method delegates to scripts.augment_west_h5 instead of
    raising; with a non-path topology it asks for topology_path."""
    path = tmp_path / "west.h5"
    generate_west_h5(str(path), n_iterations=3, n_segments=4, seed=3)
    model = _init_model(path)
    with pytest.raises(ValueError, match="topology_path"):
        model.collect_iter_coordinates()


def test_version_consistent():
    import os
    import re

    import msm_we_tpu

    pyproject_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pyproject.toml",
    )
    pyproject = open(pyproject_path).read()
    version = re.search(r'^version = "([^"]+)"', pyproject, re.M).group(1)
    assert msm_we_tpu.__version__ == version
