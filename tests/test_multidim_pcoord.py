"""Multi-dimensional progress coordinates end to end (the reference supports
pcoord_ndim > 1: per-dim bounds checks, N-D bin mappers, and loading only the
first pcoord_ndim dims of wider datasets, ``_data.py:878-889``)."""
import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.data.synthetic import SynthWESettings, generate_west_h5
from msm_we_tpu.model import modelWE


@pytest.fixture(scope="module")
def west_h5_2d(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("we2d") / "west.h5")
    generate_west_h5(
        path,
        settings=SynthWESettings(
            n_iterations=41, n_segments=24, pcoord_ndim=2, seed=23, warmup=20
        ),
    )
    return path


def test_2d_pcoord_full_build(west_h5_2d):
    """End-to-end build with 2-D pcoords: per-dim bounds, a 2-D rectilinear
    WE bin grid, flux/steady state, host-vs-device parity."""
    def build(device):
        model = modelWE()
        model.initialize(
            [west_h5_2d],
            {"coords": None, "nAtoms": 4, "coord_ndim": 3},
            "p2d",
            basis_pcoord_bounds=[[9.0, 10.0], [-3.0, 3.0]],
            target_pcoord_bounds=[[0.0, 1.0], [-3.0, 3.0]],
            dim_reduce_method="pca",
            tau=1.0,
            pcoord_ndim=2,
        )
        if device:
            model.enable_mesh()
        model.get_iterations()
        model.get_coordSet(model.maxIter)
        model.dimReduce()
        # 2-D WE bin grid: 10 bins along dim 0 x 2 along dim 1
        mapper = RectilinearBinMapper(
            [np.linspace(0, 10, 11), np.array([-3.0, 0.0, 3.0])]
        )
        model.cluster_coordinates(
            n_clusters=2, stratified=True, user_bin_mapper=mapper
        )
        model.get_fluxMatrix(0)
        model.organize_fluxMatrix()
        model.get_Tmatrix()
        model.get_steady_state()
        model.get_steady_state_target_flux()
        return model

    host = build(False)
    assert host.pcoordSet.shape[1] == 2
    assert host.JtargetSS > 0
    assert np.isclose(host.pSS.sum(), 1.0)
    # Pcoord-sorted centers exist for both dims
    assert host.targetRMSD_centers.shape[1] == 2

    meshed = build(True)
    np.testing.assert_allclose(meshed.fluxMatrixRaw, host.fluxMatrixRaw, rtol=1e-12)
    assert meshed.JtargetSS == pytest.approx(host.JtargetSS, rel=1e-6)


def test_wider_pcoord_clipped_with_warning(west_h5_2d, caplog):
    """A pcoord_ndim=1 model on a 2-dim dataset loads only dim 0 and warns
    once (reference ``_data.py:878-889``)."""
    import logging

    from msm_we_tpu._logging import log as pkg_log

    model = modelWE()
    pkg_log.addHandler(caplog.handler)
    try:
        with caplog.at_level(logging.WARNING, logger="msm_we_tpu"):
            model.initialize(
                [west_h5_2d],
                {"coords": None, "nAtoms": 4, "coord_ndim": 3},
                "clip",
                basis_pcoord_bounds=[[9.0, 10.0]],
                target_pcoord_bounds=[[0.0, 1.0]],
                dim_reduce_method="none",
                tau=1.0,
                pcoord_ndim=1,
            )
            model.get_iterations()
            model.load_iter_data(2)
    finally:
        pkg_log.removeHandler(caplog.handler)
    assert model.pcoord1List.shape[1] == 1
    assert any("loading only the first" in r.message for r in caplog.records)


def test_lagged_flux_2d(west_h5_2d):
    """Lag-1 transitions work with multi-dim pcoords."""
    model = modelWE()
    model.initialize(
        [west_h5_2d],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "p2dlag",
        basis_pcoord_bounds=[[9.0, 10.0], [-3.0, 3.0]],
        target_pcoord_bounds=[[0.0, 1.0], [-3.0, 3.0]],
        dim_reduce_method="none",
        tau=1.0,
        pcoord_ndim=2,
    )
    model.get_iterations()
    model.dimReduce()
    mapper = RectilinearBinMapper(
        [np.linspace(0, 10, 11), np.array([-3.0, 3.0])]
    )
    model.cluster_coordinates(n_clusters=2, stratified=True, user_bin_mapper=mapper)
    model.get_fluxMatrix(1)
    model.organize_fluxMatrix()
    model.get_Tmatrix()
    model.get_steady_state()
    model.get_steady_state_target_flux()
    assert model.lagtime == pytest.approx(2.0)
    assert model.JtargetSS >= 0
