"""End-to-end ``build_analyze_model`` tests: the one-shot pipeline the
reference drives from its plugins (``msm_we.py:588-882``), including the live
step display and (later stages) the device-pipeline parity checks."""
import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.model import modelWE
from msm_we_tpu.tracing import StageTimer, live_stage_display


@pytest.fixture(scope="module")
def west_h5(tmp_path_factory):
    path = tmp_path_factory.mktemp("we_build") / "west.h5"
    generate_west_h5(str(path), n_iterations=40, n_segments=24, seed=11)
    return str(path)


def _build(west_h5, **kwargs):
    model = modelWE()
    mapper = RectilinearBinMapper([np.linspace(0, 10, 11)])
    defaults = dict(
        file_paths=[west_h5],
        ref_struct={"coords": None, "nAtoms": 4, "coord_ndim": 3},
        modelName="synth",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dimreduce_method="pca",
        tau=1.0,
        n_clusters=2,
        cross_validation_groups=0,
        step_kwargs={"clustering": {"user_bin_mapper": mapper}},
    )
    defaults.update(kwargs)
    return model.build_analyze_model(**defaults)


def test_build_analyze_model_end_to_end(west_h5):
    model = _build(west_h5, show_live_display=False)
    assert model.JtargetSS > 0
    assert np.isclose(model.pSS.sum(), 1.0)
    names = [s[0] for s in model.stage_timings.stages]
    assert "Flux matrix" in names and "Steady-state target flux" in names
    assert model.stage_timings.total > 0


def test_build_analyze_model_live_display(west_h5, capsys):
    """show_live_display=True must actually render the step table (the
    reference's Live table, ``msm_we.py:529-586``) -- it was previously an
    ignored kwarg."""
    model = _build(west_h5, show_live_display=True, cross_validation_groups=2)
    captured = capsys.readouterr()
    assert "haMSM build" in captured.out
    assert "Flux matrix" in captured.out
    assert model.JtargetSS > 0
    # The validation-model deepcopy happens while the display callback is
    # attached; the snapshot must not carry it
    assert model.post_cluster_model.stage_timings._on_change is None


def test_live_stage_display_unit():
    """Display updates fire on stage start/finish and failures get a cross."""
    timer = StageTimer()
    with live_stage_display(timer, enabled=True):
        with timer.stage("alpha"):
            timer.set_note("n=3")
        with pytest.raises(ValueError):
            with timer.stage("beta"):
                raise ValueError("boom")
    assert timer.failed == {1}
    assert timer.stages[0][2] == "n=3"
    # disabled path is a clean no-op
    with live_stage_display(timer, enabled=False) as live:
        assert live is None
