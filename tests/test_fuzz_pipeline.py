"""Randomized robustness sweep: the full pipeline must build valid models
across dataset seeds/shapes without crashing (padding, ragged bins, cleaning
edge cases)."""
import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.model import modelWE


@pytest.mark.parametrize(
    "seed,n_iters,n_segs,k",
    [(101, 30, 12, 2), (202, 50, 20, 3), (303, 35, 40, 4)],
)
def test_pipeline_seed_sweep(tmp_path, seed, n_iters, n_segs, k):
    path = str(tmp_path / f"west_{seed}.h5")
    generate_west_h5(path, n_iterations=n_iters, n_segments=n_segs, seed=seed)
    model = modelWE()
    model.initialize(
        [path],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        f"fuzz{seed}",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="pca",
        tau=1.0,
    )
    model.get_iterations()
    model.get_coordSet(model.maxIter)
    model.dimReduce()
    model.cluster_coordinates(
        n_clusters=k,
        stratified=True,
        user_bin_mapper=RectilinearBinMapper([np.linspace(0, 10, 11)]),
    )
    model.get_fluxMatrix(0)
    model.organize_fluxMatrix()
    model.get_Tmatrix()
    model.get_steady_state()
    model.get_steady_state_target_flux()
    model.get_committor()

    assert np.isclose(model.pSS.sum(), 1.0)
    assert (model.pSS >= 0).all()
    assert model.JtargetSS >= 0
    assert np.allclose(model.Tmatrix.sum(axis=1), 1.0)
    q = model.q
    interior = np.setdiff1d(
        np.arange(model.nBins), np.append(model.indBasis, model.indTargets)
    )
    assert (q[interior] >= -1e-9).all() and (q[interior] <= 1 + 1e-9).all()


@pytest.mark.parametrize(
    "seed,n_lag,device", [(404, 1, False), (505, 2, True), (606, 0, True)]
)
def test_pipeline_lag_and_device_sweep(tmp_path, seed, n_lag, device):
    """The lag>0 and device-pipeline variants must satisfy the same physical
    invariants across random datasets."""
    path = str(tmp_path / f"west_{seed}.h5")
    generate_west_h5(path, n_iterations=40, n_segments=24, seed=seed)
    model = modelWE()
    model.initialize(
        [path],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        f"fuzz{seed}",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="pca",
        tau=1.0,
    )
    if device:
        model.enable_mesh()
    model.get_iterations()
    model.get_coordSet(model.maxIter)
    model.dimReduce()
    model.cluster_coordinates(
        n_clusters=2,
        stratified=True,
        user_bin_mapper=RectilinearBinMapper([np.linspace(0, 10, 11)]),
    )
    model.get_fluxMatrix(n_lag)
    model.organize_fluxMatrix()
    model.get_Tmatrix()
    model.get_steady_state()
    model.get_steady_state_target_flux()

    assert np.isclose(model.pSS.sum(), 1.0)
    assert (model.pSS >= 0).all()
    assert model.JtargetSS >= 0
    assert np.allclose(model.Tmatrix.sum(axis=1), 1.0)
    assert model.lagtime == pytest.approx(1.0 * (n_lag + 1))


@pytest.mark.parametrize("seed", [707, 808])
def test_pipeline_dedup_transparency_sweep(tmp_path, seed):
    """Across random datasets, auto-dedup featurization must be bitwise
    transparent: identical features and identical JtargetSS vs direct."""
    path = str(tmp_path / f"west_{seed}.h5")
    generate_west_h5(path, n_iterations=35, n_segments=20, seed=seed)

    results = {}
    for dedup in ("auto", False):
        model = modelWE()
        model.build_analyze_model(
            file_paths=[path],
            ref_struct={"coords": None, "nAtoms": 4, "coord_ndim": 3},
            modelName=f"fuzz{seed}",
            basis_pcoord_bounds=[[9.0, 10.0]],
            target_pcoord_bounds=[[0.0, 1.0]],
            dimreduce_method="pca",
            tau=1.0,
            n_clusters=2,
            cross_validation_groups=0,
            show_live_display=False,
            step_kwargs={
                "clustering": {
                    "user_bin_mapper": RectilinearBinMapper([np.linspace(0, 10, 11)])
                }
            },
            dedup_coordinates=dedup,
        )
        results[dedup] = model

    a, b = results["auto"], results[False]
    for key in ("parent", "child", "weights"):
        assert np.array_equal(a._features[key], b._features[key]), key
    assert a.JtargetSS == b.JtargetSS
    np.testing.assert_array_equal(a.pSS, b.pSS)
