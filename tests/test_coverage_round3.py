"""Round-3 coverage: incremental cleaning parity, host-flux cleaning path.

The incremental cleaning pass (``organize_stratified(incremental=True)``,
the default) must produce results identical to the full re-discretization
(``incremental=False``, the reference's behavior, ``_clustering.py:1101-1115``)
-- same dtrajs, same cleaned flux matrix, same steady state.
"""
import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.model import modelWE


@pytest.fixture(scope="module")
def west_h5_mid(tmp_path_factory):
    # Big enough that predict takes the device path (>= HOST_BATCH_THRESHOLD
    # rows), so the incremental subset re-scoring is compared against the
    # same scoring family the full path used
    path = tmp_path_factory.mktemp("we") / "west.h5"
    generate_west_h5(str(path), n_iterations=60, n_segments=100, seed=11)
    return str(path)


def _build(path, incremental, device_pipeline=False):
    model = modelWE()
    model.initialize(
        [path],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "synth",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="pca",
        tau=1.0,
        _suppress_boundary_warning=True,
    )
    if device_pipeline:
        import jax

        from msm_we_tpu.parallel import make_mesh

        model.enable_mesh(make_mesh(jax.devices()[:4]))
    model.get_iterations()
    model.get_coordSet(model.maxIter)
    model.dimReduce()
    mapper = RectilinearBinMapper([np.linspace(0, 10, 11)])
    model.cluster_coordinates(
        n_clusters=3, stratified=True, user_bin_mapper=mapper
    )
    model.get_fluxMatrix(0)
    model.organize_stratified(incremental=incremental)
    model.get_Tmatrix()
    model.get_steady_state()
    model.get_steady_state_target_flux()
    return model


@pytest.mark.parametrize("device_pipeline", [False, True])
def test_incremental_cleaning_matches_full(west_h5_mid, device_pipeline):
    full = _build(west_h5_mid, incremental=False,
                  device_pipeline=device_pipeline)
    inc = _build(west_h5_mid, incremental=True,
                 device_pipeline=device_pipeline)

    assert inc.n_clusters == full.n_clusters
    for i, (a, b) in enumerate(zip(inc.dtrajs, full.dtrajs)):
        np.testing.assert_array_equal(a, b, err_msg=f"dtrajs iter {i}")
    np.testing.assert_array_equal(inc._parent_idx, full._parent_idx)
    # The cleaned flux matrix: the incremental path accumulates with the
    # host f64 bincount; the full path may accumulate on device (psum) when
    # a mesh is enabled, so equality is up to f64 summation order there
    if device_pipeline:
        np.testing.assert_allclose(
            inc.fluxMatrix, full.fluxMatrix, rtol=1e-12
        )
    else:
        np.testing.assert_array_equal(inc.fluxMatrix, full.fluxMatrix)
    np.testing.assert_allclose(inc.pSS, full.pSS, rtol=1e-10, atol=1e-18)
    assert inc.JtargetSS == pytest.approx(full.JtargetSS, rel=1e-10)


def test_incremental_cleaning_multiple_passes(tmp_path):
    """A dataset engineered to need > 1 cleaning pass still fixpoints to a
    clean matrix under the incremental path (the driver loop asserts
    cleanliness at exit)."""
    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=25, n_segments=12, seed=23)
    model = _build(path, incremental=True)
    fcheck = model.fluxMatrix.copy()
    fcheck[-1, -2] = 1.0
    from msm_we_tpu.utils import find_connected_sets

    assert len(find_connected_sets(fcheck, directed=True)) == 1
    assert model.pSS.sum() == pytest.approx(1.0)


def test_sharded_pair_discretize_matches_predict(west_h5_mid):
    """The one-dispatch pair-assign discretization (shared device feature
    cache) must produce ids identical to strat.predict."""
    model = _build(west_h5_mid, incremental=True, device_pipeline=True)
    assert model._mesh is not None
    strat = model._strat
    feats = model._featurize_all()
    parent_bins, child_bins = model._raw_we_bins()

    n = len(parent_bins)
    both = strat.predict(
        np.concatenate([feats["parent"], feats["child"]]),
        np.concatenate([parent_bins, child_bins]),
        is_basis=np.concatenate(
            [model.is_WE_basis(feats["pcoord0"]),
             model.is_WE_basis(feats["pcoord1"])]
        ),
        is_target=np.concatenate(
            [model.is_WE_target(feats["pcoord0"]),
             model.is_WE_target(feats["pcoord1"])]
        ),
    )
    pidx, cidx = model._sharded_pair_discretize(strat, parent_bins, child_bins)
    np.testing.assert_array_equal(pidx, both[:n])
    np.testing.assert_array_equal(cidx, both[n:])


def test_pair_discretize_override_order_overlap(west_h5_mid):
    """Rows inside BOTH basis and target regions must take the target id in
    dtrajs (the reference's predict checks target first,
    stratified_clustering.py:159-169) -- on the host predict path AND the
    mesh pair-assign path."""
    model = _build(west_h5_mid, incremental=True, device_pipeline=True)
    # Overlapping bounds: [7, 10] is both basis and target
    model.basis_pcoord_bounds = [[5.0, 10.0]]
    model.target_pcoord_bounds = [[7.0, 10.0]]

    strat = model._strat
    feats = model._featurize_all()
    parent_bins, child_bins = model._raw_we_bins()
    n = len(parent_bins)

    both = strat.predict(
        np.concatenate([feats["parent"], feats["child"]]),
        np.concatenate([parent_bins, child_bins]),
        is_basis=np.concatenate(
            [model.is_WE_basis(feats["pcoord0"]),
             model.is_WE_basis(feats["pcoord1"])]
        ),
        is_target=np.concatenate(
            [model.is_WE_target(feats["pcoord0"]),
             model.is_WE_target(feats["pcoord1"])]
        ),
    )
    pidx, cidx = model._sharded_pair_discretize(strat, parent_bins, child_bins)
    np.testing.assert_array_equal(pidx, both[:n])
    np.testing.assert_array_equal(cidx, both[n:])

    overlap_child = np.asarray(model.is_WE_basis(feats["pcoord1"])) & np.asarray(
        model.is_WE_target(feats["pcoord1"])
    )
    assert overlap_child.any(), "test dataset must exercise the overlap"
    assert (cidx[overlap_child] == strat.target_cluster_index).all()


def _build_aggregated(path, incremental):
    model = modelWE()
    model.initialize(
        [path],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "synth",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="pca",
        tau=1.0,
        _suppress_boundary_warning=True,
    )
    model.get_iterations()
    model.get_coordSet(model.maxIter)
    model.dimReduce()
    model.cluster_coordinates(n_clusters=24, stratified=False)
    model.get_fluxMatrix(0)
    model.organize_aggregated_simple(incremental=incremental)
    model.get_Tmatrix()
    model.get_steady_state()
    model.get_steady_state_target_flux()
    return model


def test_incremental_aggregated_cleaning_matches_full(west_h5_mid):
    full = _build_aggregated(west_h5_mid, incremental=False)
    inc = _build_aggregated(west_h5_mid, incremental=True)
    assert inc.n_clusters == full.n_clusters
    np.testing.assert_array_equal(inc._parent_idx, full._parent_idx)
    np.testing.assert_array_equal(inc._child_idx, full._child_idx)
    np.testing.assert_array_equal(inc.fluxMatrix, full.fluxMatrix)
    np.testing.assert_allclose(inc.pSS, full.pSS, rtol=1e-10, atol=1e-18)


def _snapshot_for_incremental(strat):
    """Pre-removal state the incremental pass needs (mirrors
    remove_and_rediscretize in model.organize_stratified)."""
    return strat.we_remap.copy(), strat.global_id.copy(), strat.n_total_clusters


def test_incremental_rediscretize_rescore_branch(west_h5_mid):
    """Remove a well-connected mid-bin cluster directly, so non-overridden
    segments LOSE their winner and the subset re-scoring branch actually
    runs (cleaning on this dataset only ever removes basis/target-bin
    clusters, whose members are overridden -- the relabel path alone)."""
    from msm_we_tpu import model as M

    model = _build(west_h5_mid, incremental=True)
    strat = model._strat

    # A cluster with non-overridden members whose bin keeps >= 1 other
    # live center (so no bin is emptied by the removal)
    counts = np.bincount(
        model._child_idx[model._child_idx < strat.n_total_clusters],
        minlength=strat.n_total_clusters,
    )
    bins_of_gid = strat.center_bin[np.flatnonzero(strat.valid)]
    centers_per_bin = np.bincount(bins_of_gid, minlength=strat.n_bins)
    eligible = np.flatnonzero(centers_per_bin[bins_of_gid] >= 2)
    gid = int(eligible[np.argmax(counts[eligible])])
    n_members = int(
        (model._parent_idx == gid).sum() + (model._child_idx == gid).sum()
    )
    assert n_members > 0

    calls = {"rows": 0}
    orig = M.modelWE._assign_rows_subset

    def counting(self, strat_, X, bins_eff):
        calls["rows"] += len(X)
        return orig(self, strat_, X, bins_eff)

    M.modelWE._assign_rows_subset = counting
    try:
        old_remap, old_global, old_total = _snapshot_for_incremental(strat)
        strat.remove_global_clusters([gid])
        model.n_clusters = strat.n_total_clusters
        model._incremental_rediscretize(strat, old_remap, old_global, old_total)
    finally:
        M.modelWE._assign_rows_subset = orig

    assert calls["rows"] >= n_members  # the branch genuinely ran
    inc_p = model._parent_idx.copy()
    inc_c = model._child_idx.copy()

    # Ground truth: full re-discretization at the same bank state
    model.launch_discretization()
    np.testing.assert_array_equal(inc_p, model._parent_idx)
    np.testing.assert_array_equal(inc_c, model._child_idx)


def test_incremental_rediscretize_remap_branch(west_h5_mid):
    """Emptying a whole WE bin exercises the remap-changed branch: every
    (non-overridden) segment in the remapped bin must re-score against the
    delegate bin's centers."""
    model = _build(west_h5_mid, incremental=True)
    strat = model._strat

    # Pick a mid bin with live centers and empty it entirely
    mid_bins = [
        b for b in range(strat.n_bins)
        if strat.initialized[b] and strat.n_centers_per_bin[b] > 0
    ]
    bin_to_empty = mid_bins[len(mid_bins) // 2]
    gids = [
        int(strat.global_id[r])
        for r in np.flatnonzero(
            strat.valid & (strat.center_bin == bin_to_empty)
        )
    ]
    old_remap, old_global, old_total = _snapshot_for_incremental(strat)
    strat.remove_global_clusters(gids)
    model.n_clusters = strat.n_total_clusters
    from msm_we_tpu.binning import find_nearest_bin

    populated = [
        b for b in range(strat.n_bins)
        if strat.initialized[b] and strat.n_centers_per_bin[b] > 0
    ]
    strat.set_remap(
        bin_to_empty, find_nearest_bin(model._bin_mapper, bin_to_empty, populated)
    )
    model._incremental_rediscretize(strat, old_remap, old_global, old_total)
    inc_p = model._parent_idx.copy()
    inc_c = model._child_idx.copy()

    model.launch_discretization()
    np.testing.assert_array_equal(inc_p, model._parent_idx)
    np.testing.assert_array_equal(inc_c, model._child_idx)


def test_incremental_cleaning_matches_full_small_dataset(tmp_path):
    """Below HOST_BATCH_THRESHOLD the full discretization scores with the
    host numpy formula; the incremental subset re-scoring must use the same
    family or near-ties could round differently (round-3 review finding)."""
    from msm_we_tpu.ops.stratified import HOST_BATCH_THRESHOLD

    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=30, n_segments=30, seed=41)
    full = _build(path, incremental=False)
    assert 2 * len(full._parent_idx) < HOST_BATCH_THRESHOLD
    inc = _build(path, incremental=True)
    for a, b in zip(inc.dtrajs, full.dtrajs):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(inc.fluxMatrix, full.fluxMatrix)
    np.testing.assert_allclose(inc.pSS, full.pSS, rtol=1e-10, atol=1e-18)
