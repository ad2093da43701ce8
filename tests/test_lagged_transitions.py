"""Lag > 0 transition machinery: ancestry walks, coordinate pairs, and the
lagged flux matrix, validated against independent brute-force numpy walks.

This capability *extends* the reference: its lag>0 path exists but is gated
off by the ``n_lag`` setter (``msm_we.py:353-359``) and internally
unreachable (``_data.py:48-252`` indexes out-of-bounds history columns)."""
import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.data.westh5 import WEDataset
from msm_we_tpu.model import modelWE


@pytest.fixture(scope="module")
def west_h5(tmp_path_factory):
    path = tmp_path_factory.mktemp("we_lag") / "west.h5"
    generate_west_h5(str(path), n_iterations=30, n_segments=24, seed=13)
    return str(path)


@pytest.fixture(scope="module")
def model(west_h5):
    m = modelWE()
    m.initialize(
        [west_h5],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "synth",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none",
        tau=1.0,
    )
    m.get_iterations()
    m.dimReduce()
    mapper = RectilinearBinMapper([np.linspace(0, 10, 11)])
    m.cluster_coordinates(n_clusters=2, stratified=True, user_bin_mapper=mapper)
    return m


def _brute_ancestor(ds, n_iter, seg, n_lag):
    """Per-segment python ancestry walk (independent of the vectorized one)."""
    idx = seg
    for h in range(1, n_lag + 1):
        parents = ds.iter_data(n_iter - h + 1)["parent_ids_global"]
        idx = parents[idx]
        if idx < 0:
            return -1, True
    return idx, False


def test_ancestor_ids_match_bruteforce(west_h5):
    ds = WEDataset([west_h5])
    found_warp = False
    for n_iter in range(5, ds.maxIter + 1, 2):
        for lag in (1, 2, 4):
            anc, warped = ds.ancestor_ids(n_iter, lag)
            for s in range(ds.iter_data(n_iter)["n_segs"]):
                ref_idx, ref_warp = _brute_ancestor(ds, n_iter, s, lag)
                assert warped[s] == ref_warp, (n_iter, lag, s)
                assert anc[s] == ref_idx, (n_iter, lag, s)
            found_warp |= warped.any()
    assert found_warp, "dataset produced no recycling events -- test is vacuous"


def test_lag0_pairs_identical_to_iter_coord_pairs(west_h5):
    ds = WEDataset([west_h5])
    parent, child, w = ds.iter_coord_pairs(7)
    tp = ds.iter_transition_pairs(7, 0)
    np.testing.assert_array_equal(tp["start"], parent)
    np.testing.assert_array_equal(tp["end"], child)
    np.testing.assert_array_equal(tp["weights"], w)
    assert not tp["warped"].any()


def test_transition_pairs_basis_substitution(west_h5):
    ds = WEDataset([west_h5])
    basis = np.zeros((4, 3))
    # Find an iteration with a warp inside a lag-2 window
    for n_iter in range(3, ds.maxIter):
        _anc, warped = ds.ancestor_ids(n_iter, 2)
        if warped.any():
            break
    else:
        pytest.skip("no warps in dataset")
    tp = ds.iter_transition_pairs(n_iter, 2, basis_coords=basis)
    w_rows = np.flatnonzero(tp["warped"])
    np.testing.assert_array_equal(tp["start"][w_rows[0]], basis)
    assert np.isnan(tp["start_pcoord"][w_rows]).all()
    # Unwarped rows: start is the ancestor's frame-0 coordinates
    ok = np.flatnonzero(~tp["warped"])[0]
    anc = tp["anc"][ok]
    start_all, _c, _w = ds.iter_coord_pairs(n_iter - 2)
    np.testing.assert_array_equal(tp["start"][ok], start_all[anc])
    # Missing basis_coords with warps present must raise
    with pytest.raises(ValueError, match="basis_coords"):
        ds.iter_transition_pairs(n_iter, 2)


def test_lagged_fluxmatrix_matches_bruteforce(model):
    """get_fluxMatrix(1) == a from-scratch numpy accumulation using the
    model's own dtrajs and an independent ancestry walk."""
    model.get_fluxMatrix(1)
    got = model.fluxMatrixRaw.copy()

    ds = model._dataset
    n = model.n_clusters
    n_states = n + 2
    iters = list(range(2, model.maxIter))
    ref = np.zeros((n_states, n_states))
    for it in iters:
        d_now = ds.iter_data(it)
        d_lag = ds.iter_data(it - 1)
        dtraj_end = model.dtrajs[it - 1]  # child assignments of iteration it
        # parent (frame-0) assignments of iteration it-1, recomputed via the
        # stored pair_dtrajs
        dtraj_start_lag = np.array([p for p, _c in model.pair_dtrajs[it - 2]])
        for s in range(d_now["n_segs"]):
            a, warped = _brute_ancestor(ds, it, s, 1)
            w = d_now["weights"][s]
            end = dtraj_end[s]
            if model.is_WE_target(d_now["pcoord1"][s : s + 1])[0]:
                end = n + 1
            elif model.is_WE_basis(d_now["pcoord1"][s : s + 1])[0]:
                end = n
            if warped:
                start = n
            else:
                start = dtraj_start_lag[a]
                if model.is_WE_basis(d_lag["pcoord0"][a : a + 1])[0]:
                    start = n
            ref[start, end] += w
    ref /= len(iters)
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_lagged_flux_weight_conservation(model):
    """Every segment contributes exactly its weight once: the lag-L matrix
    total equals the mean per-iteration weight sum (minus NaN-zeroed rows)."""
    model.get_fluxMatrix(2)
    iters = list(range(3, model.maxIter))
    totals = []
    for it in iters:
        _p, _c, w = model._dataset.iter_coord_pairs(it)
        totals.append(w.sum())
    assert model.fluxMatrixRaw.sum() == pytest.approx(np.mean(totals), rel=1e-9)


def test_lag1_analysis_tail_runs(model):
    import copy

    m = copy.deepcopy(model)
    m.get_fluxMatrix(1)
    m.organize_fluxMatrix()
    m.get_Tmatrix()
    m.get_steady_state()
    m.get_steady_state_target_flux()
    assert m.lagtime == pytest.approx(2.0)  # tau * (n_lag + 1)
    assert m.JtargetSS > 0
    assert np.isclose(m.pSS.sum(), 1.0)


def test_get_transition_data_lag1_compat(model):
    model.set_basis({"coords": np.zeros((4, 3))})
    model.load_iter_data(10)
    model.get_transition_data(1)
    n_segs = model.nSeg
    assert model.coordPairList.shape == (n_segs, 4, 3, 2)
    assert model.transitionWeights.shape == (n_segs,)
    assert model.departureWeights.shape == (n_segs,)
    assert model.n_lag == 1
    model.n_lag = 0  # restore for other tests
