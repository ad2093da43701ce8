"""Multi-device model build: a mesh-enabled build must produce identical
results to the single-device build (virtual 8-device CPU mesh)."""
import jax
import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.model import modelWE
from msm_we_tpu.ops.stratified import HOST_BATCH_THRESHOLD


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_build_matches_single(tmp_path, monkeypatch):
    # Force large-batch predictions through the device paths
    monkeypatch.setattr(
        "msm_we_tpu.ops.stratified.HOST_BATCH_THRESHOLD", 64
    )
    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=30, n_segments=24, seed=41)

    def build(mesh):
        model = modelWE()
        model.initialize(
            [path],
            {"coords": None, "nAtoms": 4, "coord_ndim": 3},
            "mesh",
            basis_pcoord_bounds=[[9.0, 10.0]],
            target_pcoord_bounds=[[0.0, 1.0]],
            dim_reduce_method="pca",
            tau=1.0,
        )
        model.get_iterations()
        model.get_coordSet(model.maxIter)
        model.dimReduce()
        if mesh:
            model.enable_mesh()
        model.cluster_coordinates(
            n_clusters=2,
            stratified=True,
            user_bin_mapper=RectilinearBinMapper([np.linspace(0, 10, 11)]),
        )
        model.get_fluxMatrix(0)
        model.organize_fluxMatrix()
        model.get_Tmatrix()
        model.get_steady_state()
        model.get_steady_state_target_flux()
        return model

    single = build(mesh=False)
    meshed = build(mesh=True)

    assert np.array_equal(
        np.concatenate(single.dtrajs), np.concatenate(meshed.dtrajs)
    )
    assert np.allclose(single.fluxMatrix, meshed.fluxMatrix)
    assert np.allclose(single.pSS, meshed.pSS)
    assert np.isclose(single.JtargetSS, meshed.JtargetSS)

    # Mesh-enabled models still checkpoint (meshes are process-local)
    ckpt = str(tmp_path / "meshed.obj")
    meshed.save(ckpt)
    restored = modelWE.load(ckpt)
    assert np.allclose(restored.pSS, meshed.pSS)
