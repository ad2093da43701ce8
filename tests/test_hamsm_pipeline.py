"""Tier-2 pipeline tests: end-to-end haMSM build on a deterministic synthetic
WE dataset, checked against independent numpy reference computations and
physical invariants.

This replaces the reference suite's golden-pickle fixtures (SURVEY.md section
4) with a generator + invariants + cross-implementation checks.
"""
import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.model import modelWE


@pytest.fixture(scope="module")
def west_h5(tmp_path_factory):
    path = tmp_path_factory.mktemp("we") / "west.h5"
    generate_west_h5(str(path), n_iterations=40, n_segments=24, seed=7)
    return str(path)


@pytest.fixture(scope="module")
def built_model(west_h5):
    model = modelWE()
    model.initialize(
        [west_h5],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "synth",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="pca",
        tau=1.0,
    )
    model.get_iterations()
    model.get_coordSet(model.maxIter)
    model.dimReduce()
    mapper = RectilinearBinMapper([np.linspace(0, 10, 11)])
    model.cluster_coordinates(
        n_clusters=2, stratified=True, user_bin_mapper=mapper,
        store_validation_model=True,
    )
    model.get_fluxMatrix(0)
    model.organize_fluxMatrix()
    model.get_Tmatrix()
    model.get_steady_state()
    model.get_steady_state_target_flux()
    return model


def test_dataset_shape(built_model):
    assert built_model.maxIter == 40
    assert built_model.pcoordSet.shape[1] == 1


def test_dimreduce_covariance(built_model):
    """Streamed PCA covariance must equal the batch covariance exactly."""
    coords = np.concatenate(
        [built_model._dataset.iter_child_coords(i) for i in range(1, built_model.maxIter)]
    )
    feats = built_model.processCoordinates(coords)
    ref_cov = np.cov(feats.T)
    assert np.allclose(built_model.coordinates.covariance_, ref_cov, atol=1e-4)


def test_dtrajs_structure(built_model):
    """Dtrajs exist for every discretizable iteration with valid indices."""
    assert len(built_model.dtrajs) == built_model.maxIter - 1
    n = built_model.n_clusters
    for dtraj in built_model.dtrajs:
        assert dtraj.min() >= 0
        assert dtraj.max() <= n + 1  # basis/target indices allowed


def test_fluxmatrix_against_numpy_reference(built_model):
    """The engine's flux matrix must equal a direct numpy re-computation from
    its own dtrajs and the raw h5 weights."""
    model = built_model
    n_states = model.n_clusters + 2
    ref = np.zeros((n_states, n_states))
    iters_used = range(2, model.maxIter)
    for iteration in iters_used:
        d = model._dataset.iter_data(iteration)
        _p, _c, weights = model._dataset.iter_coord_pairs(iteration)
        pairs = model.pair_dtrajs[iteration - 1]
        for seg, (start, end) in enumerate(pairs):
            start, end = int(start), int(end)
            if model.is_WE_target(d["pcoord1"][seg : seg + 1])[0]:
                end = model.n_clusters + 1
            if model.is_WE_basis(d["pcoord0"][seg : seg + 1])[0]:
                start = model.n_clusters
            if model.is_WE_basis(d["pcoord1"][seg : seg + 1])[0]:
                end = model.n_clusters
            ref[start, end] += weights[seg]
    ref /= len(list(iters_used))

    model.get_fluxMatrix(0)  # recompute raw at current clustering
    assert np.allclose(model.fluxMatrixRaw, ref, rtol=1e-12, atol=1e-300)


def test_flux_conservation(built_model):
    """Total probability is conserved: raw flux matrix sums to ~1 per iter."""
    built_model.get_fluxMatrix(0)
    total = built_model.fluxMatrixRaw.sum()
    assert np.isclose(total, 1.0, rtol=1e-8)


def test_cleaned_matrix_connected(built_model):
    from msm_we_tpu.utils import find_connected_sets

    f = built_model.fluxMatrix.copy()
    f[-1, -2] = 1.0
    assert len(find_connected_sets(f, directed=True)) == 1


def test_tmatrix_rows(built_model):
    T = built_model.Tmatrix
    assert np.allclose(T.sum(axis=1), 1.0)
    assert (T >= 0).all()
    # Target rows recycle uniformly into the basis
    for t in built_model.indTargets:
        assert np.isclose(T[t, built_model.indBasis].sum(), 1.0)


def test_steady_state(built_model):
    pSS = built_model.pSS
    assert np.isclose(pSS.sum(), 1.0)
    assert (pSS >= 0).all()
    # Stationarity: pSS is a fixed point of T^T
    assert np.allclose(built_model.Tmatrix.T @ pSS, pSS, atol=1e-10)


def test_target_flux(built_model):
    assert built_model.JtargetSS > 0
    # In steady state with full recycling, pSS[target] equals the flux in
    assert np.isclose(
        built_model.JtargetSS * built_model.lagtime,
        built_model.pSS[built_model.indTargets].sum(),
        rtol=1e-6,
    )


def test_committor(built_model):
    built_model.get_committor()
    q = built_model.q
    n = built_model.nBins
    assert q.shape == (n,)
    interior = np.setdiff1d(
        np.arange(n), np.append(built_model.indBasis, built_model.indTargets)
    )
    assert (q[interior] >= 0).all() and (q[interior] <= 1).all()
    assert np.isclose(q[built_model.indBasis[0]], 0.0, atol=1e-4)


def test_flux_profiles(built_model):
    built_model.get_committor()
    built_model.get_flux()
    built_model.get_flux_committor()
    assert built_model.J.shape == (built_model.nBins,)
    assert built_model.Jq.shape == (built_model.nBins,)
    assert "slope" in built_model.fit_parameters


def test_flux_profile_matches_bruteforce(built_model):
    """Cumsum-based profile equals the reference's O(n^3) double loop."""
    built_model.get_committor()
    built_model.get_flux()
    F = built_model.fluxMatrix
    centers = built_model.targetRMSD_centers[:, 0].copy()
    centers[built_model.indBasis] = built_model.basis_bin_centers[0]
    centers[built_model.indTargets] = built_model.target_bin_centers[0]
    order = np.argsort(centers)
    Fo = F[np.ix_(order, order)]
    n = len(Fo)
    J_ref = np.zeros(n)
    for i in range(n - 1):
        JR = Fo[i + 1 :, : i + 1].sum()
        JF = Fo[: i + 1, i + 1 :].sum()
        J_ref[order[i]] = JR - JF
    assert np.allclose(built_model.J, J_ref)


def test_cluster_structures(built_model):
    built_model.update_cluster_structures(build_pcoord_cache=True)
    assert len(built_model.cluster_structures) > 0
    key = next(iter(built_model.cluster_structures))
    assert len(built_model.cluster_structures[key]) == len(
        built_model.cluster_structure_weights[key]
    )
    assert built_model.pcoord_cache is not None


def test_block_validation(built_model):
    built_model.do_block_validation(
        cross_validation_groups=2, cross_validation_blocks=4
    )
    assert len(built_model.validation_models) == 2
    for vm in built_model.validation_models:
        assert vm.JtargetSS >= 0
        assert np.isclose(vm.pSS.sum(), 1.0)


def test_aggregated_clustering(west_h5):
    """Aggregate (non-stratified) path builds a valid model too."""
    model = modelWE()
    model.initialize(
        [west_h5],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "synth_agg",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none",
        tau=1.0,
    )
    model.get_iterations()
    model.get_coordSet(model.maxIter)
    model.dimReduce()
    model.cluster_coordinates(n_clusters=8, stratified=False)
    model.get_fluxMatrix(0)
    model.organize_fluxMatrix()
    model.get_Tmatrix()
    model.get_steady_state()
    model.get_steady_state_target_flux()
    assert np.isclose(model.pSS.sum(), 1.0)
    assert model.JtargetSS > 0
