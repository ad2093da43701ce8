"""Tests for the extended (legacy-parity) analysis surface."""
import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.extended import ExtendedModelWE


@pytest.fixture(scope="module")
def ext_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("weext") / "west.h5"
    generate_west_h5(str(path), n_iterations=40, n_segments=24, seed=17)
    model = ExtendedModelWE()
    model.initialize(
        [str(path)],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "ext",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none",
        tau=1.0,
    )
    model.get_iterations()
    model.get_coordSet(model.maxIter)
    model.dimReduce()
    model.cluster_coordinates(
        n_clusters=2, stratified=True,
        user_bin_mapper=RectilinearBinMapper([np.linspace(0, 10, 11)]),
    )
    model.get_fluxMatrix(0)
    model.organize_fluxMatrix()
    model.get_Tmatrix()
    model.get_steady_state()
    model.get_steady_state_target_flux()
    return model


def test_pcoord1d_fluxmatrix(ext_model):
    binbounds = np.linspace(0, 10, 11)
    fm = ext_model.get_pcoord1D_fluxMatrix(0, 1, ext_model.maxIter - 1, binbounds)
    assert fm.shape == (10, 10)
    assert (fm >= 0).all()
    # Probability conservation: total flux per iteration ~1 (weights sum to 1)
    assert np.isclose(fm.sum(), 1.0, rtol=1e-6)


def test_hflux_and_aristoffian(ext_model):
    h = ext_model.get_hflux(conv=1e-3, max_iters=500)
    assert h.shape == (ext_model.nBins, 1)
    kh, varh = ext_model.get_model_aristoffian()
    assert kh.shape == (ext_model.nBins, 1)
    assert (varh >= -1e-8).all()  # variance is nonnegative modulo roundoff


@pytest.mark.parametrize("bin_method", ["uniform", "adaptive"])
def test_aristoffian_allocation(ext_model, bin_method):
    ext_model.get_hflux(conv=1e-3, max_iters=500)
    ext_model.get_model_aristoffian()
    ext_model.binMethod = bin_method
    ext_model.nB = 5
    ext_model.nW = 50
    ext_model.get_model_steady_state_aristoffian()
    assert np.isclose(ext_model.alloc.sum(), 1.0)
    assert ext_model.walkers_per_bin.sum() >= 5
    assert ext_model.binObjective >= 0
    assert len(ext_model.khbins_binEdges) == len(ext_model.khbins_binCenters) + 1


def test_bin_kh_var(ext_model):
    ext_model.get_hflux(conv=1e-3, max_iters=500)
    ext_model.get_model_aristoffian()
    centers = np.linspace(
        ext_model.kh.min(), ext_model.kh.max(), 4
    )
    total = ext_model.get_bin_kh_var(centers)
    assert total >= 0


def test_direct_flux_window(ext_model):
    Jdirect, times = ext_model.get_direct_target_flux(2, ext_model.maxIter - 2, window=5)
    assert (Jdirect >= 0).all()
    assert len(Jdirect) == len(times)
    # Direct flux should be within a couple orders of magnitude of the haMSM
    # estimate when events exist
    if Jdirect.max() > 0:
        assert Jdirect.max() < 1.0


def test_warps_from_parent(ext_model):
    warps = ext_model.get_warps_from_parent(2, 10)
    assert len(warps) == 8
    for w in warps:
        assert (np.asarray(w) >= 0).all()


def test_evolve_probability(ext_model):
    ext_model.get_Tmatrix()
    ref_pss = ext_model.pSS.copy() if ext_model.pSS is not None else None
    ext_model.get_steady_state()
    ref_pss = ext_model.pSS.copy()

    prob = ext_model.evolve_probability(nEvolve=2000, nStore=100)
    assert prob.shape[1] == ext_model.nBins
    assert np.allclose(prob.sum(axis=1), 1.0, atol=1e-8)
    # Long-time evolution converges to the steady state -- exposed as
    # pEvolved; pSS must NOT be clobbered by a diagnostic relaxation
    assert np.allclose(ext_model.pEvolved, ref_pss, atol=1e-3)
    np.testing.assert_array_equal(ext_model.pSS, ref_pss)
    # evolve_target_flux consumes probTransient
    ext_model.evolve_target_flux()
    assert ext_model.Jtarget.shape[0] == prob.shape[0]

    prob2 = ext_model.evolve_probability2(nEvolve=100, nStore=50)
    assert np.allclose(prob2.sum(axis=1), 1.0)
    p0 = np.ones(ext_model.nBins) / ext_model.nBins
    prob3 = ext_model.evolve_probability_from_initial(p0, 100, 50)
    assert np.allclose(prob3.sum(axis=1), 1.0)
    np.testing.assert_array_equal(ext_model.pSS, ref_pss)


def test_iter_aristoffian_and_kh_pcoord_write(tmp_path):
    """get_iter_aristoffian assigns segments to the cleaned model's clusters
    and looks up kh; write_iter_kh_pcoord extends the iteration's pcoord
    dataset with the kh dimension (the Aristoffian-WE extended pcoord).
    These are unreachable dead code in the reference (_untested.py:581-800,
    gated behind the broken pyemma loader)."""
    import shutil

    import h5py

    from msm_we_tpu.binning import RectilinearBinMapper

    src = str(tmp_path / "west.h5")
    generate_west_h5(src, n_iterations=30, n_segments=16, seed=9)
    work = str(tmp_path / "west_copy.h5")
    shutil.copyfile(src, work)

    model = ExtendedModelWE()
    model.initialize(
        [work],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "kh",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none",
        tau=1.0,
    )
    model.get_iterations()
    model.dimReduce()
    model.cluster_coordinates(
        n_clusters=2, stratified=True,
        user_bin_mapper=RectilinearBinMapper([np.linspace(0, 10, 11)]),
    )
    model.get_fluxMatrix(0)
    model.organize_fluxMatrix()
    model.get_Tmatrix()
    model.get_steady_state()
    model.get_hflux(1e-3, max_iters=200)
    model.get_model_aristoffian()

    kh_list = model.get_iter_aristoffian(10)
    assert kh_list.shape == (model.nSeg, 1)
    assert np.isfinite(kh_list).all()
    kh = np.asarray(model.kh).reshape(-1)
    assert kh_list.min() >= kh.min() - 1e-9
    assert kh_list.max() <= kh.max() + 1e-9

    model.load_iter_data(10)
    written = model.write_iter_kh_pcoord()
    assert written.shape == (model.nSeg, 2, 2)
    with h5py.File(work) as h5:
        pc = h5["iterations/iter_00000010/pcoord"][:]
    assert pc.shape == (model.nSeg, 2, 2)
    np.testing.assert_allclose(pc[:, 1, 1], kh_list[:, 0])
    # Dim 0 keeps the original progress coordinate
    with h5py.File(src) as h5:
        orig = h5["iterations/iter_00000010/pcoord"][:]
    np.testing.assert_allclose(pc[:, :, 0], orig[:, :, 0])


def test_get_bin_total_var(ext_model):
    """The kh-bin optimizer objective evaluates candidate centers."""
    m = ext_model
    kh = np.asarray(m.kh).reshape(-1)
    centers = np.linspace(kh.min(), kh.max(), 4)
    obj = m.get_bin_total_var(centers)
    assert np.isfinite(obj) and obj >= 0
    assert m.binMethod == "optimized"
