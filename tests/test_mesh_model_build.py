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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_deferred_discretization_matches_eager(tmp_path):
    """cluster_stratified(defer_discretization=True) + get_fluxMatrix(0) on
    a mesh must produce identical dtrajs AND flux to the eager two-program
    path (the combined device program computes both in one dispatch)."""
    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=25, n_segments=20, seed=43)

    def build(defer, prefer_host_flux=False, n_clusters=2,
              stop_before_flux=False):
        model = modelWE()
        model.initialize(
            [path],
            {"coords": None, "nAtoms": 4, "coord_ndim": 3},
            "defer",
            basis_pcoord_bounds=[[9.0, 10.0]],
            target_pcoord_bounds=[[0.0, 1.0]],
            dim_reduce_method="pca",
            tau=1.0,
        )
        model.get_iterations()
        model.get_coordSet(model.maxIter)
        model.dimReduce()
        model.enable_mesh()
        model.cluster_coordinates(
            n_clusters=n_clusters,
            stratified=True,
            user_bin_mapper=RectilinearBinMapper([np.linspace(0, 10, 11)]),
            defer_discretization=defer,
        )
        if defer:
            assert model.dtrajs is None  # not materialized yet
        if stop_before_flux:
            return model
        if prefer_host_flux:
            model._flux_prefer_host = True
        model.get_fluxMatrix(0)
        model.organize_fluxMatrix()
        model.get_Tmatrix()
        model.get_steady_state()
        model.get_steady_state_target_flux()
        return model

    eager = build(defer=False)
    deferred = build(defer=True)
    np.testing.assert_array_equal(
        np.concatenate(eager.dtrajs), np.concatenate(deferred.dtrajs)
    )
    np.testing.assert_array_equal(eager._parent_idx, deferred._parent_idx)
    np.testing.assert_array_equal(eager.fluxMatrixRaw, deferred.fluxMatrixRaw)
    assert eager.JtargetSS == deferred.JtargetSS

    # Deferred + host-path flux (the device-fallback leg): get_fluxMatrix
    # must materialize ids via launch_discretization before using them
    host_fallback = build(defer=True, prefer_host_flux=True)
    np.testing.assert_array_equal(
        eager._parent_idx, host_fallback._parent_idx
    )
    np.testing.assert_allclose(
        eager.fluxMatrixRaw, host_fallback.fluxMatrixRaw, rtol=1e-12
    )

    # RE-clustering with deferral must not leak the previous clustering's
    # ids: the deferred early-return clears dtrajs state, so the combined
    # program re-materializes fresh ids under the new numbering
    reclustered = deferred
    reclustered.cluster_coordinates(
        n_clusters=3,
        stratified=True,
        user_bin_mapper=RectilinearBinMapper([np.linspace(0, 10, 11)]),
        defer_discretization=True,
    )
    assert reclustered.dtrajs is None
    assert reclustered._parent_idx is None
    reclustered.get_fluxMatrix(0)
    reclustered.organize_fluxMatrix()
    reclustered.get_Tmatrix()
    reclustered.get_steady_state()
    reclustered.get_steady_state_target_flux()

    fresh = build(defer=False, n_clusters=3)
    np.testing.assert_array_equal(
        np.concatenate(fresh.dtrajs), np.concatenate(reclustered.dtrajs)
    )
    np.testing.assert_array_equal(fresh.fluxMatrixRaw, reclustered.fluxMatrixRaw)
    assert fresh.JtargetSS == reclustered.JtargetSS

    # In the deferred window, dtrajs consumers self-materialize instead of
    # failing with a NoneType error
    lazy = build(defer=True, stop_before_flux=True)
    assert lazy.dtrajs is None
    lazy.update_cluster_structures()
    assert lazy.dtrajs is not None
    assert lazy.cluster_structures


def test_flux_routing_single_process_prefers_host_bincount(tmp_path, monkeypatch):
    """On a single process, get_fluxMatrix(0) with a mesh routes to the host
    f64 bincount of the (device-computed) predict ids — measured 30x faster
    than the device f64 scatter program — and _force_device_flux pins the
    fused combined program, whose flux must agree to f64 summation order."""
    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=20, n_segments=16, seed=91)

    def build(force_device):
        if force_device:
            monkeypatch.setattr(modelWE, "_force_device_flux", True)
        else:
            monkeypatch.setattr(modelWE, "_force_device_flux", False)
        model = modelWE()
        model.initialize(
            [path],
            {"coords": None, "nAtoms": 4, "coord_ndim": 3},
            "route",
            basis_pcoord_bounds=[[9.0, 10.0]],
            target_pcoord_bounds=[[0.0, 1.0]],
            dim_reduce_method="pca",
            tau=1.0,
        )
        model.get_iterations()
        model.get_coordSet(model.maxIter)
        model.dimReduce()
        model.enable_mesh()
        model.cluster_coordinates(
            n_clusters=2,
            stratified=True,
            user_bin_mapper=RectilinearBinMapper([np.linspace(0, 10, 11)]),
            defer_discretization=True,
        )
        spy = {"device": 0}
        orig = modelWE._device_flux_lag0

        def counting(self, iters):
            spy["device"] += 1
            return orig(self, iters)

        monkeypatch.setattr(modelWE, "_device_flux_lag0", counting)
        model.get_fluxMatrix(0)
        return model, spy["device"]

    routed, n_device_routed = build(force_device=False)
    # Default single-process route: no device flux program ran, but the
    # ids were still materialized (by the sharded pair-discretize program)
    assert n_device_routed == 0
    assert routed._parent_idx is not None

    forced, n_device_forced = build(force_device=True)
    assert n_device_forced == 1
    np.testing.assert_allclose(
        routed.fluxMatrixRaw, forced.fluxMatrixRaw, rtol=1e-12
    )


def test_dedup_child_only_discretization_matches_pair_program(tmp_path):
    """The dedup fast path (score N child rows, gather parent ids on host)
    must equal the 2N-row pair program bitwise — including rows whose
    parent metadata DISAGREES with the source child row (forced here by
    mutating one parent pcoord), which detour through strat.predict."""
    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=22, n_segments=18, seed=77)
    model = modelWE()
    model.initialize(
        [path],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "dd",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="pca",
        tau=1.0,
    )
    model.get_iterations()
    model.get_coordSet(model.maxIter)
    model.dimReduce()
    model.enable_mesh()
    model.cluster_coordinates(
        n_clusters=2,
        stratified=True,
        user_bin_mapper=RectilinearBinMapper([np.linspace(0, 10, 11)]),
        defer_discretization=True,
    )
    feats = model._featurize_all()
    assert getattr(feats, "_parent_src", None) is not None, (
        "dedup recipe expected on synthetic (continuous) data"
    )
    # Break pcoord continuity for a few rows: their parent flags disagree
    # with the source child row, forcing the strat.predict detour
    src = feats._parent_src
    rows = np.flatnonzero(src >= 0)[:3]
    feats["pcoord0"][rows] = 9.5  # inside the basis region
    model._invalidate_pcoord_caches()

    strat = model._strat
    parent_bins, child_bins = model._raw_we_bins()
    # Spy: the child-only program must actually run (a silent fallback to
    # the pair program would make the equality below vacuous)
    from msm_we_tpu.parallel import sharded as _sharded
    calls = {"n": 0}
    orig_single = _sharded.build_sharded_single_assign

    def counting(*a, **k):
        calls["n"] += 1
        return orig_single(*a, **k)

    _sharded.build_sharded_single_assign = counting
    try:
        fast = model._sharded_pair_discretize(strat, parent_bins, child_bins)
    finally:
        _sharded.build_sharded_single_assign = orig_single
    assert calls["n"] == 1

    # Force the pair program by hiding the recipe (materialize the parent
    # array first so _device_row_feats can upload it without the recipe)
    feats["parent"]
    feats._parent_src = None
    try:
        model._dev_feats_cache = None
        pair = model._sharded_pair_discretize(strat, parent_bins, child_bins)
    finally:
        feats._parent_src = src
        model._dev_feats_cache = None

    np.testing.assert_array_equal(fast[0], pair[0])
    np.testing.assert_array_equal(fast[1], pair[1])
