"""Regression tests pinning the fixes from code review."""
import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper, bin_centers_of
from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.model import modelWE
from msm_we_tpu.msm.nmm import NonMarkovModel
from msm_we_tpu.ops.pca import MomentAccumulator
from msm_we_tpu.ops.stratified import StratifiedKmeans


def test_batch_pca_keeps_all_components():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(300, 7))
    acc = MomentAccumulator(7)
    acc.add(X)
    assert acc.finalize(variance_cutoff=1.0).n_components == 7


def test_batch_pca_keeps_zero_variance_components():
    """Rank-deficient data: sklearn PCA(n_components=None) keeps trailing
    zero-variance components; cutoff=1.0 must too."""
    rng = np.random.default_rng(1)
    X = np.zeros((200, 5))
    X[:, :2] = rng.normal(size=(200, 2))  # rank 2; 3 constant columns
    acc = MomentAccumulator(5)
    acc.add(X)
    assert acc.finalize(variance_cutoff=1.0).n_components == 5


def test_multifile_ancestry_globalized(tmp_path):
    """Parent ids from multi-file datasets must be offset into the
    concatenated ordering, so trajectory reconstruction is continuous."""
    p1 = str(tmp_path / "a.h5")
    p2 = str(tmp_path / "b.h5")
    generate_west_h5(p1, n_iterations=15, n_segments=10, seed=61)
    generate_west_h5(p2, n_iterations=15, n_segments=10, seed=62)
    model = modelWE()
    model.initialize(
        [p1, p2],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "mf",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none",
        tau=1.0,
    )
    model.get_iterations()
    trajs = model.get_traj_coordinates(8, 4)
    parent, _child, _w = model._dataset.iter_coord_pairs(8)
    for i, t in enumerate(trajs):
        if len(t) >= 2:
            # Second-to-last frame must be this walker's own start structure
            assert np.allclose(t[-2], parent[i], atol=1e-6)


def test_noninteger_lag_rejected():
    with pytest.raises(ValueError, match="lag time"):
        NonMarkovModel([np.array([0, 1, 2, 0])], stateA=[0], stateB=[2], lag_time=2.5)


@pytest.mark.parametrize("ndims", [1, 2, 3])
def test_rectilinear_centers_self_assign(ndims):
    """bin_centers_of must order centers consistently with assign's flat
    indices for every dimensionality (the reference's meshgrid walks the
    wrong axis for >=3 dims)."""
    bounds = [np.linspace(0, d + 2, d + 3) for d in range(ndims)]
    mapper = RectilinearBinMapper(bounds)
    centers = bin_centers_of(mapper)
    assert np.array_equal(mapper.assign(centers), np.arange(mapper.nbins))


def test_seg_histories_stop_at_recycle(tmp_path):
    """After a recycle event the ancestry walk must stop permanently --
    not resume from segment 0."""
    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=30, n_segments=16, seed=11)
    model = modelWE()
    model.initialize(
        [path],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "sh",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none",
        tau=1.0,
    )
    model.get_iterations()
    # Find an iteration with a recycled walker (parent_id < 0)
    for it in range(5, model.maxIter):
        model.load_iter_data(it)
        model.get_seg_histories(4)
        hist = model.seg_histories
        recycled_rows = np.flatnonzero((hist < 0).any(axis=1))
        if len(recycled_rows):
            for r in recycled_rows:
                h0 = int(np.argmax(hist[r] < 0))
                # Everything after the recycle marker stays at the initial 0
                # fill AND weight histories carry no other walker's data
                assert (hist[r, h0:] <= 0).all()
            return
    pytest.skip("no recycle event found in history window")


def test_chained_remap_resolves():
    """A bin remapped to a bin that is later remapped elsewhere must resolve
    transitively, and predict must reject truly dead bins loudly."""
    sk = StratifiedKmeans(n_bins=3, k_per_bin=2, n_features=1, seed=0)
    rng = np.random.default_rng(0)
    X01 = np.concatenate([rng.normal(0, 0.1, 40), rng.normal(5, 0.1, 40)])[:, None]
    bins01 = np.array([0] * 40 + [1] * 40)
    sk.partial_fit(X01.astype(np.float32), bins01)

    # Bin 2 never filled: remap to 1. Then bin 1 is emptied and remapped to 0.
    sk.set_remap(2, 1)
    sk.remove_global_clusters([g for g in sk.global_id[2 * 2 : 3 * 2] if g >= 0])
    emptied = sk.remove_global_clusters(
        [g for g in sk.global_id[1 * 2 : 2 * 2] if g >= 0]
    )
    assert 1 in emptied
    sk.set_remap(1, 0)
    # Chain 2 -> 1 -> 0 must now resolve to 0
    assert sk.we_remap[2] == 0

    out = sk.predict(np.zeros((3, 1), np.float32), np.array([2, 2, 2]))
    assert (out >= 0).all()


def test_initialize_does_not_swallow_real_errors(tmp_path):
    """A malformed west.h5 must fail loudly, not warn-and-continue."""
    import h5py

    bad = str(tmp_path / "bad.h5")
    with h5py.File(bad, "w") as h5:
        # seg_index exists but is garbage (not a structured array)
        for i in (1, 2):
            h5.create_dataset(
                f"iterations/iter_{i:08d}/seg_index", data=np.zeros(4)
            )
            h5.create_dataset(
                f"iterations/iter_{i:08d}/pcoord", data=np.zeros((4, 2, 1))
            )
    model = modelWE()
    with pytest.raises(Exception) as excinfo:
        model.initialize(
            [bad],
            {"coords": None, "nAtoms": 4, "coord_ndim": 3},
            "bad",
            basis_pcoord_bounds=[[9.0, 10.0]],
            target_pcoord_bounds=[[0.0, 1.0]],
            dim_reduce_method="none",
            tau=1.0,
        )
    assert not isinstance(excinfo.value, KeyError)


def test_committor_iteration_cap_on_slow_mixing_matrix(caplog):
    """A near-periodic non-absorbing block mixes at rate ~(1 - 1e-12) per
    iteration -- the reference's unbounded ``while dconv > conv`` loop would
    effectively hang. The capped loop must return (with a warning) instead.

    States: 0=basis, 3=target; 1 -> 2 always, 2 -> 1 except a 1e-12 leak to
    the target.
    """
    import logging

    from msm_we_tpu._logging import log as pkg_log
    from msm_we_tpu.ops import linalg

    # Random-walk chain over 40 states (basis at 0, target at the end):
    # mixing time is O(n^2), so with a near-machine-precision tolerance the
    # iteration needs thousands of steps; a cap of 10 must fire.
    n = 40
    F = np.zeros((n, n))
    for i in range(n):
        F[i, max(i - 1, 0)] += 0.5
        F[i, min(i + 1, n - 1)] += 0.5
    # The package logger doesn't propagate to root, so attach caplog's
    # handler to it directly
    pkg_log.addHandler(caplog.handler)
    try:
        with caplog.at_level(logging.WARNING, logger="msm_we_tpu"):
            q = linalg.committor(F, [n - 1], [0], n, conv=1e-14, max_iters=10)
        assert q.shape == (n,)
        assert np.all(np.isfinite(q))
        assert any("did not converge" in r.message for r in caplog.records)

        caplog.clear()
        with caplog.at_level(logging.WARNING, logger="msm_we_tpu"):
            qm = linalg.backwards_committor(
                F, [n - 1], [0], n, conv=1e-14, max_iters=10
            )
        assert qm.shape == (n,)
        assert any("did not converge" in r.message for r in caplog.records)
    finally:
        pkg_log.removeHandler(caplog.handler)


def test_committor_cap_does_not_change_converging_result():
    """On a well-mixing matrix the capped committor equals the uncapped one."""
    from msm_we_tpu.ops import linalg

    rng = np.random.default_rng(5)
    F = rng.random((6, 6))
    q_capped = linalg.committor(F, [5], [0], 6, conv=1e-10, max_iters=100_000)
    q_loose = linalg.committor(F, [5], [0], 6, conv=1e-10, max_iters=10**9)
    np.testing.assert_allclose(q_capped, q_loose)


def test_masked_assign_onehot_equals_wheremask_and_numpy():
    """The GEMM-folded bin penalty (one-hot block), the elementwise
    where-mask fallback, and a numpy brute force must agree, including with
    invalid centers present."""
    import jax.numpy as jnp

    from msm_we_tpu.ops.kmeans import masked_assign

    rng = np.random.default_rng(9)
    N, d, n_bins, k = 400, 7, 6, 4
    K = n_bins * k
    X = rng.normal(size=(N, d)).astype(np.float32)
    seg_bin = rng.integers(0, n_bins, N).astype(np.int32)
    C = rng.normal(size=(K, d)).astype(np.float32)
    center_bin = np.repeat(np.arange(n_bins, dtype=np.int32), k)
    valid = rng.random(K) < 0.8
    # every bin keeps at least one valid center
    for b in range(n_bins):
        valid[b * k] = True

    onehot = np.asarray(
        masked_assign(jnp.asarray(X), jnp.asarray(seg_bin), jnp.asarray(C),
                      jnp.asarray(center_bin), jnp.asarray(valid), n_bins=n_bins)
    )
    wheremask = np.asarray(
        masked_assign(jnp.asarray(X), jnp.asarray(seg_bin), jnp.asarray(C),
                      jnp.asarray(center_bin), jnp.asarray(valid), n_bins=None)
    )
    d2 = ((X[:, None, :] - C[None]) ** 2).sum(-1)
    bad = ~(valid[None, :] & (center_bin[None, :] == seg_bin[:, None]))
    d2[bad] = np.inf
    ref = d2.argmin(1)

    np.testing.assert_array_equal(onehot, ref)
    np.testing.assert_array_equal(wheremask, ref)


def test_compact_bank_after_removals():
    """compact_bank keeps valid centers in global-id order through cleaning,
    so a compact-bank argmin row equals StratifiedKmeans.predict's global id."""
    rng = np.random.default_rng(10)
    sk = StratifiedKmeans(n_bins=3, k_per_bin=4, n_features=5, seed=0)
    X = rng.normal(size=(120, 5)).astype(np.float32)
    bins = rng.integers(0, 3, 120)
    sk.partial_fit(X, bins)
    # Remove a few global clusters (as organize_stratified would)
    sk.remove_global_clusters([1, 5, 9])

    centers, center_bin, valid = sk.compact_bank()
    assert valid.all() and len(centers) == sk.n_total_clusters
    # Row i of the compact bank is the center with global id i
    for gid_row in range(sk.n_total_clusters):
        orig_row = np.flatnonzero(sk.global_id == gid_row)[0]
        np.testing.assert_array_equal(centers[gid_row], sk.centers[orig_row])
        assert center_bin[gid_row] == sk.center_bin[orig_row]

    # And a direct compact-bank assignment reproduces predict()
    q = rng.normal(size=(50, 5)).astype(np.float32)
    qb = rng.integers(0, 3, 50)
    want = sk.predict(q, qb)
    d2 = ((q[:, None, :] - centers[None]) ** 2).sum(-1)
    d2[~(center_bin[None, :] == qb[:, None])] = np.inf
    np.testing.assert_array_equal(d2.argmin(1), want)


def _built(tmp_path, stratified=True, seed=71):
    from msm_we_tpu.binning import RectilinearBinMapper

    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=30, n_segments=20, seed=seed)
    model = modelWE()
    model.initialize(
        [path],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "rr",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="pca",
        tau=1.0,
    )
    model.get_iterations()
    model.dimReduce()
    kwargs = (
        {"user_bin_mapper": RectilinearBinMapper([np.linspace(0, 10, 11)])}
        if stratified
        else {}
    )
    model.cluster_coordinates(n_clusters=3, stratified=stratified, **kwargs)
    return model


@pytest.mark.parametrize("stratified", [True, False])
def test_device_flux_matches_host_with_target_region_parents(tmp_path, stratified):
    """Parents whose pcoord lies inside the *analysis* target (possible when
    it differs from the sim-time recycling boundary) must route identically
    on the host and fused device paths: to the target state for stratified
    clustering (the reference's predict-time short-circuit), and to their
    raw cluster for aggregated (the reference applies no such override)."""
    sub = tmp_path / ("strat" if stratified else "agg")
    sub.mkdir()
    model = _built(sub, stratified=stratified)
    feats = model._featurize_all()
    # Force some parent pcoords into the target region
    rows = np.arange(3, len(feats["pcoord0"]), 11)
    feats["pcoord0"][rows] = 0.5
    model._invalidate_pcoord_caches()  # pcoords mutated in place

    # Re-discretize so host pair_dtrajs see the mutated pcoords
    if stratified:
        model.launch_discretization()
    else:
        model._discretize_all_aggregated()

    model._mesh = None
    model.get_fluxMatrix(0)
    host_fm = model.fluxMatrixRaw.copy()

    model.enable_mesh()
    model.get_fluxMatrix(0)
    device_fm = model.fluxMatrixRaw.copy()

    np.testing.assert_allclose(device_fm, host_fm, rtol=1e-12)
    target_row = model.n_clusters + 1
    if stratified:
        assert host_fm[target_row].sum() > 0  # target-parents flowed from it


def test_lagged_flux_zeroes_bad_ancestor_weights(tmp_path):
    """Descendants of segments whose lagged frame had bad (weight-zeroed)
    augmentation coords must contribute no flux at lag>0 -- the lag-0
    NaN->weight-0 convention extended through ancestry."""
    model = _built(tmp_path, stratified=True)
    feats = model._featurize_all()

    model.get_fluxMatrix(1)
    before = model.fluxMatrixRaw.sum()

    # Zero iteration 5's weights, simulating the NaN-coordinate convention
    it5 = feats["iteration"] == 5
    saved = feats["weights"].copy()
    feats["weights"] = np.where(it5, 0.0, feats["weights"])
    model.get_fluxMatrix(1)
    after = model.fluxMatrixRaw.sum()
    feats["weights"] = saved

    # Iteration 5's own rows AND iteration 6's rows (whose lag-1 ancestors
    # live in iteration 5) are gone from the total
    d5 = model._dataset.iter_coord_pairs(5)[2].sum()
    d6 = model._dataset.iter_coord_pairs(6)[2].sum()
    n_iters = len(range(2, model.maxIter))
    expected_drop = (d5 + d6) / n_iters
    assert before - after == pytest.approx(expected_drop, rel=1e-9)


def test_mesh_swap_rebuilds_flux_step(tmp_path):
    """Re-enabling a different mesh must not reuse a step compiled for the
    old mesh (shapes no longer divide the axes)."""
    import jax

    from msm_we_tpu.parallel import make_mesh

    model = _built(tmp_path, stratified=True)
    model.enable_mesh()  # all 8 virtual devices
    model.get_fluxMatrix(0)
    fm8 = model.fluxMatrixRaw.copy()

    model.enable_mesh(make_mesh(jax.devices()[:1]))
    model.get_fluxMatrix(0)
    fm1 = model.fluxMatrixRaw.copy()
    np.testing.assert_allclose(fm1, fm8, rtol=1e-12)


def test_update_cluster_structures_short_run(tmp_path):
    """Fewer than 3 usable iterations: empty maps, not a concatenate crash
    (the restart driver calls this on every restart, including short runs)."""
    model = _built(tmp_path, stratified=True)
    model.maxIter = 2
    model.update_cluster_structures(build_pcoord_cache=True)
    assert model.cluster_structures == {}
    assert model.pcoord_cache == {}


def test_pca_transform_far_from_origin():
    """The offset-folded transform must not lose precision for data with a
    huge common offset (the fold cancels catastrophically in f32 there; the
    model falls back to centered subtraction)."""
    from msm_we_tpu.ops.pca import MomentAccumulator

    rng = np.random.default_rng(8)
    X = rng.normal(size=(500, 6)) + 1e6  # offset 1e6, spread 1
    acc = MomentAccumulator(6)
    acc.add(X)
    pca = acc.finalize(variance_cutoff=1.0)
    assert not pca._fold_ok

    got = pca.transform(X[:50])
    want = (X[:50] - pca.mean_) @ pca.components_.T  # f64 reference
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_fluxmatrix_empty_lag_raises_valueerror(tmp_path):
    model = _built(tmp_path, stratified=True)
    with pytest.raises(ValueError, match="enough history"):
        model.get_fluxMatrix(0, iters_to_use=[])


def test_device_resident_streaming_state(monkeypatch):
    """The deferred-sync device streaming path must produce identical centers
    to eager per-batch sync, including across host/device branch crossings
    and a mid-stream pickle."""
    import pickle

    rng = np.random.default_rng(17)
    n_bins, k, d = 3, 2, 4

    def feed(sk, thresholds, sync_after=None):
        for i, thr in enumerate(thresholds):
            monkeypatch.setattr("msm_we_tpu.ops.stratified.HOST_BATCH_THRESHOLD", thr)
            n = 500
            X = rng.normal(size=(n, d)).astype(np.float32) + i
            bins = rng.integers(0, n_bins, n)
            sk.partial_fit(X, bins)
            if sync_after is not None and i == sync_after:
                # Mid-stream materialization: the next device batch must
                # re-upload from the synced host state
                _ = sk.centers_of_bin(0)
                assert sk._dev_state is None
        monkeypatch.setattr("msm_we_tpu.ops.stratified.HOST_BATCH_THRESHOLD", 4096)

    # Same RNG stream for both runs
    rng = np.random.default_rng(17)
    a = StratifiedKmeans(n_bins, k, d, seed=1)
    feed(a, [1, 1, 10**9, 1, 1])  # device, device, host, device, device

    rng = np.random.default_rng(17)
    b = StratifiedKmeans(n_bins, k, d, seed=1)
    # Materialize between device batches 3 and 4: sync -> host -> re-upload
    feed(b, [1, 1, 10**9, 1, 1], sync_after=3)

    a._sync_host()
    b._sync_host()
    np.testing.assert_array_equal(a.centers, b.centers)
    np.testing.assert_array_equal(a.counts, b.counts)

    # Pickle round trip with device-resident state pending
    rng = np.random.default_rng(17)
    c = StratifiedKmeans(n_bins, k, d, seed=1)
    feed(c, [1, 1, 10**9, 1, 1])
    c2 = pickle.loads(pickle.dumps(c))
    np.testing.assert_array_equal(c2.centers, a.centers)
    assert c2._dev_state is None


def test_nan_coordinate_segments_excluded_from_cluster_training(tmp_path):
    """Segments with NaN augmentation coords (weight zeroed by convention)
    must not enter k-means training as zero-filled full-weight rows."""
    import h5py

    from msm_we_tpu.binning import RectilinearBinMapper

    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=25, n_segments=16, seed=33)
    # Corrupt some segments' coords with NaN (bad augmentation)
    with h5py.File(path, "a") as h5:
        for it in (3, 7, 11):
            d = h5[f"iterations/iter_{it:08d}/auxdata/coord"]
            arr = d[:]
            arr[::3] = np.nan
            d[...] = arr

    def build(stratified):
        model = modelWE()
        model.initialize(
            [path],
            {"coords": None, "nAtoms": 4, "coord_ndim": 3},
            "nan",
            basis_pcoord_bounds=[[9.0, 10.0]],
            target_pcoord_bounds=[[0.0, 1.0]],
            dim_reduce_method="none",
            tau=1.0,
        )
        model.get_iterations()
        model.dimReduce()
        kwargs = (
            {"user_bin_mapper": RectilinearBinMapper([np.linspace(0, 10, 11)])}
            if stratified
            else {}
        )
        model.cluster_coordinates(n_clusters=2, stratified=stratified, **kwargs)
        return model

    for stratified in (True, False):
        model = build(stratified)
        # No center may sit at the zero-coordinate image (the NaN fill):
        # features are flattened coords, so a spurious center would be ~0
        if stratified:
            centers = model._strat.compact_bank()[0]
        else:
            centers = model.clusters.cluster_centers_
        norms = np.linalg.norm(centers, axis=1)
        assert (norms > 0.3).all(), (
            f"spurious near-zero center (stratified={stratified}): {norms.min()}"
        )


def test_fluxmatrix_drops_out_of_range_iterations(tmp_path):
    model = _built(tmp_path, stratified=True)
    # maxIter itself is not featurized; it must be dropped (warned), not
    # silently deflate the normalization
    model.get_fluxMatrix(0, iters_to_use=[5, 6, model.maxIter])
    expected = model.fluxMatrixRaw.copy()
    model.get_fluxMatrix(0, iters_to_use=[5, 6])
    np.testing.assert_allclose(model.fluxMatrixRaw, expected)


def test_coords_exist_reflects_auxdata(tmp_path):
    """coordsExist must be False for un-augmented datasets (reference probes
    coordinates at initialize, msm_we.py:265-273)."""
    import h5py

    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=10, n_segments=8, seed=3)
    with h5py.File(path, "a") as h5:
        for k in list(h5["iterations"].keys()):
            if "auxdata" in h5[f"iterations/{k}"]:
                del h5[f"iterations/{k}/auxdata"]
    model = modelWE()
    model.initialize(
        [path],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "noaux",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none",
        tau=1.0,
        _suppress_boundary_warning=True,
    )
    assert model.coordsExist is False


def test_nm_mfpt_callable():
    """The reference's nm_mfpt is uncallable (missing map_function); ours
    defaults to identity for discrete paths."""
    from msm_we_tpu.msm.ensembles import DiscretePathEnsemble

    np.random.seed(4)
    T = np.array([[0.7, 0.2, 0.1], [0.3, 0.4, 0.3], [0.2, 0.2, 0.6]])
    dpe = DiscretePathEnsemble.from_transition_matrix(
        T, stateA=[0], stateB=[2], n_paths=30, ini_pops=[1.0]
    )
    out = float(dpe.nm_mfpt(n_states=3))
    assert np.isfinite(out) and out > 0


def test_committor_jax_matches_host():
    """The device committor (absorbing basis rows applied internally) must
    match the host committor's converged values, with q[basis] == 0."""
    import jax.numpy as jnp

    from msm_we_tpu.ops import linalg

    rng = np.random.default_rng(6)
    F = rng.random((8, 8))
    q_host = linalg.committor(F, [7], [0], 8, conv=1e-12)

    # Build the same row-normalized M the host starts from (pre-absorption)
    M = F / F.sum(axis=1, keepdims=True)
    basis = np.arange(8) == 0
    target = np.arange(8) == 7
    q_dev = np.asarray(
        linalg.committor_jax(
            jnp.asarray(M, jnp.float32), jnp.asarray(target), jnp.asarray(basis),
            conv=1e-10, max_iters=100000,
        )
    )
    assert q_dev[0] == 0.0
    np.testing.assert_allclose(q_dev, q_host, atol=1e-4)


def test_multifile_mixed_dtype_aux_promotes(tmp_path):
    """``_iter_frame_block`` must promote the output dtype over ALL files'
    auxdata dtypes -- fixing it from the first (f32) block would silently
    truncate a later file's f64 coordinates."""
    import h5py

    from msm_we_tpu.data import WEDataset

    p1 = str(tmp_path / "a.h5")
    p2 = str(tmp_path / "b.h5")
    generate_west_h5(p1, n_iterations=5, n_segments=6, seed=71)
    generate_west_h5(p2, n_iterations=5, n_segments=6, seed=72)
    needle = 1.0 + 2.0**-40  # survives f64, rounds to 1.0 in f32
    with h5py.File(p1, "a") as h5:
        for k in list(h5["iterations"]):
            grp = h5[f"iterations/{k}"]
            if "auxdata/coord" not in grp:
                continue
            d = grp["auxdata/coord"][:].astype(np.float32)
            del grp["auxdata/coord"]
            grp["auxdata"].create_dataset("coord", data=d)
    with h5py.File(p2, "a") as h5:
        grp = h5["iterations/iter_00000002"]
        d = grp["auxdata/coord"][:].astype(np.float64)
        d[0, -1] = needle
        del grp["auxdata/coord"]
        grp["auxdata"].create_dataset("coord", data=d)
    ds = WEDataset([p1, p2])
    try:
        block = ds._iter_frame_block(2, -1)
        assert block.dtype == np.float64
        row = np.flatnonzero(ds.iter_data(2)["west_idx"] == 1)[0]
        assert np.all(block[row] == needle)
    finally:
        ds.close()


def test_single_file_truncated_auxdata_raises(tmp_path):
    """A truncated auxdata write (fewer segments than seg_index) must fail
    loudly on the single-file fast path, not return a short block."""
    import h5py

    from msm_we_tpu.data import WEDataset

    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=5, n_segments=8, seed=73)
    with h5py.File(path, "a") as h5:
        grp = h5["iterations/iter_00000003"]
        d = grp["auxdata/coord"][:-2]
        del grp["auxdata/coord"]
        grp["auxdata"].create_dataset("coord", data=d)
    ds = WEDataset([path])
    try:
        with pytest.raises(ValueError, match="truncated"):
            ds._iter_frame_block(3, -1)
    finally:
        ds.close()


def test_flux_duplicate_iters_skip_slice_fastpath(tmp_path):
    """``iters_to_use`` containing duplicates whose *length* equals the
    number of discretizable iterations must not take the select-everything
    slice fast path (which would wrongly include unselected iterations)."""
    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=10, n_segments=12, seed=74)
    model = modelWE()
    model.initialize(
        [path],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "dup",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="pca",
        tau=1.0,
    )
    model.get_iterations()
    model.get_coordSet(model.maxIter)
    model.dimReduce()
    model.cluster_coordinates(n_clusters=2, stratified=False)

    subset = list(range(1, model.maxIter - 1))  # drops the last usable iter
    model.get_fluxMatrix(0, iters_to_use=subset)
    expected = model.fluxMatrixRaw * len(subset)  # undo per-iter normalizer

    dup = [1] + subset  # same length as ALL usable iters, but not all of them
    assert len(dup) == model.maxIter - 1
    model.get_fluxMatrix(0, iters_to_use=dup)
    got = model.fluxMatrixRaw * len(dup)
    # rtol covers the 1-ulp wobble from undoing the /len normalizer; a
    # slice-fast-path bug would include a whole extra iteration (O(0.1))
    np.testing.assert_allclose(got, expected, rtol=1e-12)

    model.get_fluxMatrix(0)  # all usable iterations: a genuinely different sum
    full = model.fluxMatrixRaw * (model.maxIter - 1)
    assert not np.allclose(full, expected)


def test_inverse_iteration_singular_retry_large_n():
    """n > 4096 takes the spsolve branch, which reports an exactly singular
    factor with NaN + a warning instead of raising; the mu=0.999 retry must
    still fire (it did on the raising dense/inv paths)."""
    import warnings

    from scipy import sparse

    from msm_we_tpu.utils import inverse_iteration

    n = 4200
    matrix = sparse.identity(n, format="csr")  # M^T - 1*I is exactly 0
    guess = np.full(n, 1.0 / n)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # MatrixRankWarning from the probe
        result = inverse_iteration(guess, matrix)
    # Retry solves (M^T - 0.999 I) x = guess -> x ∝ guess; normalized
    np.testing.assert_allclose(result, guess, rtol=1e-10)
    assert np.all(np.isfinite(result))


def test_power_correct_keeps_success_on_last_iteration():
    """A power-method correction that succeeds exactly on the final iteration
    must be kept. (The reference keys success on ``N == max_iters - 1``,
    ``_analysis.py:254-261``, which throws that case away.)"""
    from msm_we_tpu.ops.linalg import _power_correct

    T = np.full((2, 2), 0.5)  # uniform: one multiply fixes any signed vector
    pSS = np.array([1.2, -0.2])
    out, corrected = _power_correct(T, pSS, max_iters=1)
    assert corrected
    np.testing.assert_allclose(out, [0.5, 0.5])

    # Genuine failure still reports uncorrected and returns the input
    Tb = np.eye(2)  # powers never mix the entries
    out, corrected = _power_correct(Tb, pSS, max_iters=3)
    assert not corrected
    np.testing.assert_array_equal(out, pSS)


def test_steady_state_refined_raises_clearly_on_disconnected():
    """Basis that cannot reach the target: a clear ValueError, not the
    reference's opaque ``assert last_flux >= 0`` crash (_analysis.py:184-188)."""
    from msm_we_tpu.ops import linalg

    # 3 states; state 2 (target) unreachable from state 0 (basis)
    T = np.array(
        [
            [0.9, 0.1, 0.0],
            [0.2, 0.8, 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    with pytest.raises(ValueError, match="no path from the basis"):
        linalg.steady_state_refined(T, [2], [0], 3, 1.0)


def test_nonmarkov_fit_reversible_flag_honored():
    """reversible=False must skip the (T + T^T) symmetrization. The reference
    stores the flag but hardcodes reversible=True (nmm.py:161)."""
    trajs = [np.array([0, 2, 2, 1, 0, 2, 1])]
    rev = NonMarkovModel(
        trajs, stateA=[0], stateB=[1], reversible=True, clean_traj=True
    )
    nonrev = NonMarkovModel(
        trajs, stateA=[0], stateB=[1], reversible=False, clean_traj=True
    )

    # Same counts either way
    np.testing.assert_array_equal(rev.markov_cmatrix, nonrev.markov_cmatrix)
    # 1 -> 2 is never observed: non-reversible T must keep it zero, while the
    # symmetrized T leaks probability from the observed 2 -> 1 transitions
    assert nonrev.markov_tmatrix[1, 2] == 0.0
    assert rev.markov_tmatrix[1, 2] > 0.0
    # Rows still stochastic
    np.testing.assert_allclose(nonrev.markov_tmatrix.sum(axis=1), 1.0)


def _oracle_colored_counts(trajs, stateA, stateB, lag, sliding_window):
    """Straight per-frame transcription of the documented chain convention:
    each lag-strided chain starts uncolored (its anchor frame contributes a
    Markov count but no color), labels forward-fill along the chain."""
    n = int(max(int(np.max(t)) for t in trajs)) + 1
    nm = np.zeros((2 * n, 2 * n))
    mk = np.zeros((n, n))
    step = 1 if sliding_window else lag
    for traj in trajs:
        for start in range(lag, min(2 * lag, len(traj)), step):
            prev = None
            for i in range(start, len(traj), lag):
                s = int(traj[i])
                cur = 0 if s in stateA else (1 if s in stateB else None)
                if cur is None:
                    cur = prev
                p = int(traj[i - lag])
                mk[p, s] += 1.0
                if prev is not None and cur is not None:
                    nm[2 * p + (prev == 1), 2 * s + (cur == 1)] += 1.0
                prev = cur
    return nm, mk


@pytest.mark.parametrize("lag,sliding", [(1, True), (2, True), (3, False)])
def test_nonmarkov_fit_matches_per_frame_oracle(lag, sliding):
    """Vectorized colored counting == the per-frame chain oracle, including
    the anchor-colorless first pair of every chain."""
    rng = np.random.default_rng(11)
    trajs = [rng.integers(0, 5, size=L) for L in (3, 7, 20, 41)]
    m = NonMarkovModel(
        [t.copy() for t in trajs],
        stateA=[0],
        stateB=[1],
        lag_time=lag,
        sliding_window=sliding,
        clean_traj=True,
    )
    nm, mk = _oracle_colored_counts(trajs, {0}, {1}, lag, sliding)
    np.testing.assert_array_equal(m.nm_cmatrix, nm)
    np.testing.assert_array_equal(m.markov_cmatrix, mk)

    # The documented edge: an A->B transition living entirely in the first
    # chain contributes Markov counts but zero colored counts
    m2 = NonMarkovModel([np.array([0, 2, 1])], stateA=[0], stateB=[1], lag_time=1)
    assert m2.nm_cmatrix.sum() == 0.0
    assert m2.markov_cmatrix.sum() == 2.0


def test_markov_plus_color_nan_fluxsplit_warns():
    """U-colored pairs between zero-stationary-flux states produce NaN rows
    (reference parity) -- but now with a loud warning."""
    import logging

    from msm_we_tpu._logging import log as pkg_log
    from msm_we_tpu.msm.nmm import MarkovPlusColorModel

    records = []

    class _Catch(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = _Catch(level=logging.WARNING)
    pkg_log.addHandler(h)
    # bench.py (imported by the bench smoke test) pins the package logger to
    # ERROR process-wide; this test needs WARNING through
    old_level = pkg_log.level
    pkg_log.setLevel(logging.WARNING)
    try:
        m = MarkovPlusColorModel(
            [[0, 2, 1, 2, 0], [3, 4, 3, 4, 3]],
            stateA=[0],
            stateB=[1],
            hist_length=2,
        )
    finally:
        pkg_log.removeHandler(h)
        pkg_log.setLevel(old_level)
    assert np.isnan(m.nm_tmatrix).any()
    assert any("Flux-splitting produced NaN" in r for r in records)


def test_directional_tmatrix_matches_elementwise_construction():
    """The vectorized A->B / B->A directional matrices equal the per-element
    definition (absorbing rows identity, entry column from the opposite label)."""
    rng = np.random.default_rng(5)
    trajs = [rng.integers(0, 4, size=60) for _ in range(3)]
    m = NonMarkovModel(trajs, stateA=[0], stateB=[2], clean_traj=True)

    for keep_state, parity in ((m.stateB, 0), (m.stateA, 1)):
        got = m._directional_tmatrix(keep_state, parity)
        n = m.n_states
        idx = 2 * np.arange(n) + parity
        other = idx + (1 if parity == 0 else -1)
        expected = np.empty((n, n))
        for i in range(n):
            for j in range(n):
                if i in keep_state:
                    expected[i, j] = 1.0 if i == j else 0.0
                elif j in keep_state:
                    expected[i, j] = m.nm_tmatrix[idx[i], other[j]]
                else:
                    expected[i, j] = m.nm_tmatrix[idx[i], idx[j]]
        np.testing.assert_array_equal(got, expected)


def test_windowed_committor_flux_pairs_q_with_same_states_flux():
    """Jq is stored in original state order (get_flux_committor scatters via
    J[indq[i]]); the windowing must reorder it by indq exactly like q. The
    reference windows the unsorted Jq (_plotting.py:68-70), pairing each
    plotted committor with another state's flux."""
    from msm_we_tpu.plotting import _windowed_committor_flux

    class _M:
        pass

    m = _M()
    rng = np.random.default_rng(3)
    n = 12
    m.q = rng.random(n)
    m.Jq = rng.normal(size=n)
    m.targetRMSD_centers = np.zeros((n, 2))

    q_avg, jq_avg, indq = _windowed_committor_flux(m, nwin=1)
    assert not np.array_equal(indq, np.arange(n))  # non-trivial ordering
    # rtol: nwin=1 reconstructs x via cumsum differences (ULP wobble)
    np.testing.assert_allclose(q_avg[:-1], np.asarray(m.q)[indq][:-1], rtol=1e-12)
    # nwin=1: each plotted flux must be the SAME state's flux as its q
    np.testing.assert_allclose(jq_avg, np.asarray(m.Jq)[indq], rtol=1e-12)


def test_plot_flux_save_writes_the_axes_figure(tmp_path, monkeypatch, built_tiny_model=None):
    """save=True must write ax.figure, not whatever figure is pyplot-current."""
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from msm_we_tpu import plotting

    saved = []
    monkeypatch.setattr(
        matplotlib.figure.Figure,
        "savefig",
        lambda self, *a, **k: saved.append(self),
    )

    class _M:
        tau = 1.0
        modelName = "t"
        fit_parameters = {"slope": 1.0, "intercept": 0.0, "r_value": 1.0}
        validation_models = []
        no_validation_models = True
        J = np.array([1.0, -1.0, 2.0])
        targetRMSD_centers = np.array([[0.5], [1.5], [2.5]])
        indTargets = np.array([0])
        indBasis = np.array([2])
        target_bin_centers = np.array([0.5])
        basis_bin_centers = np.array([2.5])
        target_pcoord_bounds = np.array([[0.0, 1.0]])
        basis_pcoord_bounds = np.array([[2.0, 3.0]])
        all_centers = np.array([0.5, 1.5, 2.5])
        sorted_centers = np.array([0, 1, 2])

        def get_flux(self):
            pass

    fig1, ax1 = plt.subplots()
    fig2 = plt.figure()  # becomes pyplot-current
    try:
        plotting.plot_flux(
            _M(), ax=ax1, save=True, suppress_validation=True,
            custom_name=str(tmp_path / "f.pdf"),
        )
        assert saved and saved[0] is fig1
        assert fig2 not in saved
    finally:
        plt.close(fig1)
        plt.close(fig2)


def test_lagged_weights_ignore_current_iter_frame0_nan(tmp_path):
    """A NaN in the CURRENT iteration's frame 0 must not zero a lag>0
    transition weight: the lagged pair uses the ancestor's frame 0 and the
    current final frame only. A NaN in the final frame still zeroes it."""
    import h5py

    from msm_we_tpu.data import generate_west_h5
    from msm_we_tpu.data.westh5 import WEDataset

    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=6, n_segments=8, seed=3)
    with h5py.File(path, "r+") as h5:
        coords = h5["iterations/iter_00000005/auxdata/coord"]
        coords[0, 0] = np.nan  # frame 0 of current iteration: irrelevant at lag 1
        coords[1, -1] = np.nan  # final frame: must zero the weight

    ds = WEDataset([path])
    basis = np.zeros((4, 3))
    tp = ds.iter_transition_pairs(5, 1, basis_coords=basis)
    d = ds.iter_data(5)
    assert tp["weights"][0] == d["weights"][0]  # NOT zeroed
    assert tp["weights"][1] == 0.0  # zeroed by the end-frame NaN
    # lag-0 convention unchanged: frame-0 NaN zeroes the lag-0 pair
    _p, _c, w0 = ds.iter_coord_pairs(5)
    assert w0[0] == 0.0 and w0[1] == 0.0


def test_iter_coord_pairs_preserves_f32_single_file(tmp_path):
    """Single-file f32 auxdata must come back f32 (no NaN-staging f64 upcast
    doubling downstream featurization memory)."""
    import h5py

    from msm_we_tpu.data import generate_west_h5
    from msm_we_tpu.data.westh5 import WEDataset

    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=4, n_segments=6, seed=9)
    with h5py.File(path, "r+") as h5:
        for it in list(h5["iterations"]):
            grp = h5[f"iterations/{it}/auxdata"]
            data = grp["coord"][:].astype(np.float32)
            del grp["coord"]
            grp.create_dataset("coord", data=data)

    ds = WEDataset([path])
    parent, child, w = ds.iter_coord_pairs(3)
    assert parent.dtype == np.float32
    assert child.dtype == np.float32
    assert w.dtype == np.float64  # weights stay f64 (from seg_index)


def test_voronoi_mapper_rejects_flat_centers():
    """A flat centers list is ambiguous (one 3-D center vs three 1-D
    centers); it must raise instead of silently building a 1-bin mapper."""
    from msm_we_tpu.binning import VoronoiBinMapper

    with pytest.raises(ValueError, match="must be 2-D"):
        VoronoiBinMapper([0.0, 5.0, 10.0])
    m = VoronoiBinMapper(np.array([0.0, 5.0, 10.0])[:, None])
    assert m.nbins == 3 and m.ndim == 1
    np.testing.assert_array_equal(m.assign([[0.4], [9.0], [4.0]]), [0, 2, 1])


def test_package_logger_emits_info_by_default():
    """The package logger must be INFO like the reference (_logging.py:16);
    propagate=False + the root WARNING default would otherwise drop every
    stage-timing report and plugin lifecycle message. Checked in a clean
    subprocess: in-process, other tests (e.g. bench.py's import) may have
    pinned a different level, which the default must respect."""
    import subprocess
    import sys

    code = (
        "import logging\n"
        "from msm_we_tpu._logging import log\n"
        "assert log.getEffectiveLevel() == logging.INFO\n"
        "assert log.isEnabledFor(logging.INFO)\n"
        "logging.getLogger('other_pkg')\n"
        "print('ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=60
    )
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout

    # An embedder-pinned level survives the package import
    code2 = (
        "import logging\n"
        "logging.getLogger('msm_we_tpu').setLevel(logging.ERROR)\n"
        "from msm_we_tpu._logging import log\n"
        "assert log.getEffectiveLevel() == logging.ERROR\n"
        "print('ok')\n"
    )
    out2 = subprocess.run(
        [sys.executable, "-c", code2], capture_output=True, text=True, timeout=60
    )
    assert out2.returncode == 0, out2.stderr
    assert "ok" in out2.stdout


def test_check_target_reached_scans_first_iteration(tmp_path):
    """A recycle event in iteration 1 must be found (the reference's
    [-2:0:-1] slice skips index 0 and scans nothing in a 2-iteration file)."""
    import h5py

    from msm_we_tpu.westpa_plugins.restart_driver import (
        SEG_ENDPOINT_RECYCLED,
        check_target_reached,
    )

    path = str(tmp_path / "west.h5")
    dtype = np.dtype([("endpoint_type", int), ("weight", float)])
    with h5py.File(path, "w") as h5:
        seg1 = np.zeros(4, dtype)
        seg1["endpoint_type"][2] = SEG_ENDPOINT_RECYCLED  # only recycle: iter 1
        h5.create_dataset("iterations/iter_00000001/seg_index", data=seg1)
        h5.create_dataset(
            "iterations/iter_00000002/seg_index", data=np.zeros(4, dtype)
        )
    assert check_target_reached(path)

    # ... and a clean file still reports False
    clean = str(tmp_path / "clean.h5")
    with h5py.File(clean, "w") as h5:
        for i in (1, 2, 3):
            h5.create_dataset(
                f"iterations/iter_{i:08d}/seg_index", data=np.zeros(4, dtype)
            )
    assert not check_target_reached(clean)


def test_build_hamsm_from_config_honors_first_analysis_iter(monkeypatch):
    """The WESTPA-free entry point must read first_analysis_iter from the
    config when the parameter isn't threaded in explicitly."""
    from msm_we_tpu import model as model_mod
    from msm_we_tpu.westpa_plugins.hamsm_driver import build_hamsm_from_config

    captured = {}

    def fake_build(self, **kwargs):
        captured.update(kwargs)

    monkeypatch.setattr(model_mod.modelWE, "build_analyze_model", fake_build)
    cfg = {
        "model_name": "m",
        "n_clusters": 2,
        "tau": 1.0,
        "basis_pcoord_bounds": [[9, 10]],
        "target_pcoord_bounds": [[0, 1]],
        "first_analysis_iter": 7,
    }
    build_hamsm_from_config(cfg, ["x.h5"])
    assert captured["fluxmatrix_iters"] == [7, -1]
    assert captured["step_kwargs"]["dimReduce"]["first_iter"] == 7
    assert captured["step_kwargs"]["clustering"]["first_cluster_iter"] == 7

    # An explicit parameter wins over the config (driver path)
    captured.clear()
    build_hamsm_from_config(cfg, ["x.h5"], first_iter_to_use=3)
    assert captured["fluxmatrix_iters"] == [3, -1]


def test_live_display_marks_enclosing_stage_running():
    """While a nested stage runs, its enclosing stage must render as running
    ('...'), not as finished with 0.00s."""
    pytest.importorskip("rich")
    from rich.console import Console

    from msm_we_tpu.tracing import StageTimer, live_stage_display

    timer = StageTimer()
    mid_render = []
    with live_stage_display(timer, enabled=True) as live:
        assert live is not None
        with timer.stage("outer"):
            with timer.stage("inner"):
                assert timer.running == 1 and 0 in timer._stack
                console = Console(record=True, width=100)
                console.print(live.renderable)
                mid_render.append(console.export_text())
    text = mid_render[0]
    outer_row = next(line for line in text.splitlines() if "outer" in line)
    # In-progress marker and elapsed placeholder, not "OK ... 0.00s"
    assert ">" in outer_row and "..." in outer_row
    assert "OK" not in outer_row


def test_minibatch_update_exact_divisor_tiny_weights():
    """f32 weight sums in (0, 1e-30) must divide exactly -- the old 1e-30
    clamp collapsed such centers toward the origin (WE weights routinely sit
    hundreds of orders of magnitude down)."""
    import jax.numpy as jnp

    from msm_we_tpu.ops.kmeans import lloyd, minibatch_update

    X = np.array([[10.0, 0.0], [12.0, 0.0]], np.float32)
    w = np.array([1e-35, 1e-35], np.float32)  # sums to 2e-35 < 1e-30
    centers = np.array([[11.0, 0.0]], np.float32)

    new, counts = minibatch_update(
        jnp.asarray(centers), jnp.zeros(1), jnp.asarray(X), jnp.asarray(w),
        jnp.zeros(2, np.int32),
    )
    np.testing.assert_allclose(np.asarray(new)[0, 0], 11.0, rtol=1e-6)
    assert np.asarray(new)[0, 0] > 1.0  # not collapsed toward origin

    out = lloyd(jnp.asarray(X), jnp.asarray(w), jnp.asarray(centers), n_iter=1)
    np.testing.assert_allclose(np.asarray(out)[0, 0], 11.0, rtol=1e-6)


def test_steady_state_from_flux_rows_stochastic_tiny_outflux():
    """A state whose total outflux is in (0, 1e-30) must still get a
    stochastic row (the old clamp left it summing to ~out/1e-30)."""
    import jax.numpy as jnp

    from msm_we_tpu.parallel.sharded import steady_state_from_flux

    fm = np.zeros((4, 4), np.float32)
    fm[0, 1] = 1.0
    fm[1, 0] = 0.5
    fm[1, 2] = 0.5
    fm[2, 3] = 1e-35  # tiny but positive outflux
    basis = np.array([False, False, False, False])
    basis[0] = True
    target = np.zeros(4, bool)
    target[3] = True
    T, p, flux, residual = steady_state_from_flux(
        jnp.asarray(fm), jnp.asarray(target), jnp.asarray(basis), 512
    )
    np.testing.assert_allclose(np.asarray(T).sum(axis=1), 1.0, rtol=1e-6)


def test_moment_accumulator_weighted_convention():
    """Weights summing to O(1) over many samples must produce the biased
    weighted covariance (PairMomentAccumulator's convention), not n-1 math."""
    rng = np.random.default_rng(8)
    X = rng.normal(size=(500, 3))
    w = rng.random(500)
    w = w / w.sum()  # sums to 1.0 -- the WE normalization

    acc = MomentAccumulator(3)
    acc.add(X[:250], weights=w[:250])
    acc.add(X[250:], weights=w[250:])
    model = acc.finalize(n_components=3)

    mu = (X * w[:, None]).sum(axis=0)
    Xc = X - mu
    cov = (Xc * w[:, None]).T @ Xc  # biased weighted covariance (V1=1)
    np.testing.assert_allclose(acc.mean, mu, rtol=1e-10)
    np.testing.assert_allclose(model.covariance_, cov, rtol=1e-10)

    # Unweighted path unchanged: sklearn ddof=1
    acc_u = MomentAccumulator(3)
    acc_u.add(X)
    np.testing.assert_allclose(
        acc_u.finalize(n_components=3).covariance_, np.cov(X.T, ddof=1),
        rtol=1e-10,
    )


def test_tica_small_variance_scale_units():
    """TICA must be scale-equivariant: features measured in units that put
    variances below 1e-10 (the old absolute rank floor) must not silently
    produce an all-zero transform."""
    from msm_we_tpu.ops.pca import PairMomentAccumulator

    rng = np.random.default_rng(4)
    n, d = 4000, 3
    X = np.zeros((n, d))
    for t in range(1, n):
        X[t] = 0.9 * X[t - 1] + rng.normal(size=d)

    def fit(scale):
        acc = PairMomentAccumulator(d)
        acc.add(X[:-1] * scale, X[1:] * scale)
        return acc.finalize(method="tica")

    big = fit(1.0)
    tiny = fit(1e-8)  # variances ~1e-16, far below the old 1e-10 floor
    assert tiny.components_.shape == big.components_.shape
    assert np.abs(tiny.components_).max() > 0
    # Same eigenvalues regardless of units
    np.testing.assert_allclose(tiny.scales_, big.scales_, rtol=1e-6)

    # Constant features now fail loudly instead of returning zeros
    acc = PairMomentAccumulator(2)
    const = np.ones((100, 2))
    acc.add(const[:-1], const[1:])
    with pytest.raises(ValueError, match="no positive eigenvalues"):
        acc.finalize(method="tica")


def test_scan_trailing_zero_length_batches_are_identity():
    """Batch-count padding appends zero-length batches; they must be exact
    identity steps (bitwise), since the per-batch sequence skips empties."""
    import jax.numpy as jnp

    from msm_we_tpu.ops.kmeans import masked_minibatch_scan

    rng = np.random.default_rng(2)
    n_bins, k, d = 2, 2, 3
    X = rng.normal(size=(64, d)).astype(np.float32)
    bins = rng.integers(0, n_bins, 64).astype(np.int32)
    centers = rng.normal(size=(n_bins * k, d)).astype(np.float32)
    counts = np.abs(rng.normal(size=n_bins * k)).astype(np.float32)
    center_bin = np.repeat(np.arange(n_bins, dtype=np.int32), k)
    valid = np.ones(n_bins * k, bool)
    init = np.ones(n_bins, bool)

    def run(starts, lengths):
        c, n = masked_minibatch_scan(
            jnp.asarray(centers), jnp.asarray(counts), jnp.asarray(X),
            jnp.asarray(bins), None, jnp.asarray(init),
            jnp.asarray(np.asarray(starts, np.int32)),
            jnp.asarray(np.asarray(lengths, np.int32)),
            jnp.asarray(center_bin), jnp.asarray(valid),
            n_bins=n_bins, window=32,
        )
        return np.asarray(c), np.asarray(n)

    c_real, n_real = run([0, 32], [32, 32])
    c_pad, n_pad = run([0, 32, 0, 0], [32, 32, 0, 0])
    np.testing.assert_array_equal(c_real, c_pad)
    np.testing.assert_array_equal(n_real, n_pad)


def test_predict_pow2_padding_matches_host():
    """The padded device predict path must agree exactly with the host
    masked-assign on an awkward (non-pow2) row count."""
    from msm_we_tpu.ops.stratified import HOST_BATCH_THRESHOLD

    n_bins, k, d = 3, 2, 4
    sk = StratifiedKmeans(n_bins=n_bins, k_per_bin=k, n_features=d, seed=1)
    rng = np.random.default_rng(7)
    Xfit = rng.normal(size=(600, d)).astype(np.float32)
    bfit = rng.integers(0, n_bins, 600)
    sk.partial_fit(Xfit, bfit)

    N = HOST_BATCH_THRESHOLD + 321  # odd size, forces padding
    X = rng.normal(size=(N, d)).astype(np.float32)
    b = rng.integers(0, n_bins, N)
    got = sk.predict(X, b)

    from msm_we_tpu.ops.stratified import _np_masked_assign

    sk._sync_host()
    flat = _np_masked_assign(X, sk.we_remap[b], sk.centers, sk.center_bin, sk.valid)
    np.testing.assert_array_equal(got, sk.global_id[flat])


def _tiny_built_model(tmp_path, name="wv5", stratified=True, n_iters=20):
    path = str(tmp_path / f"{name}.h5")
    generate_west_h5(path, n_iterations=n_iters, n_segments=12, seed=41)
    m = modelWE()
    m.initialize(
        [path],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        name,
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none",
        tau=1.0,
    )
    m.get_iterations()
    m.dimReduce()
    mapper = RectilinearBinMapper([np.linspace(0, 10, 7)])
    m.cluster_coordinates(
        n_clusters=2, stratified=stratified,
        user_bin_mapper=mapper if stratified else None,
    )
    return m, path


def test_cluster_aggregated_clears_stale_stratified_bank(tmp_path):
    """Re-clustering a stratified model with stratified=False must drop the
    old stratified bank -- the device flux path keys on model._strat and
    would otherwise assign against defunct per-bin centers."""
    m, _ = _tiny_built_model(tmp_path)
    assert m._strat is not None
    m.cluster_coordinates(n_clusters=5, stratified=False)
    assert m._strat is None
    assert m._bin_mapper is None
    # The flux build must follow the aggregated numbering without error
    m.get_fluxMatrix(0)
    assert m.fluxMatrixRaw.shape == (5 + 2, 5 + 2)


def test_reinitialize_invalidates_feature_cache(tmp_path):
    """initialize() with new files must drop caches built from old data."""
    m, _ = _tiny_built_model(tmp_path, name="a")
    assert m._features is not None
    p2 = str(tmp_path / "b.h5")
    generate_west_h5(p2, n_iterations=20, n_segments=12, seed=77)
    m.initialize(
        [p2],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "b",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none",
        tau=1.0,
    )
    assert m._features is None
    assert m._strat is None
    assert m.clusters is None
    assert m.dtrajs is None


def test_dimreduce_empty_window_raises_clearly(tmp_path):
    """An iteration window yielding no usable coordinates must raise a clear
    ValueError, not AttributeError on a None accumulator."""
    path = str(tmp_path / "w.h5")
    generate_west_h5(path, n_iterations=10, n_segments=8, seed=5)
    for method in ("pca", "tica"):
        m = modelWE()
        m.initialize(
            [path],
            {"coords": None, "nAtoms": 4, "coord_ndim": 3},
            "dr",
            basis_pcoord_bounds=[[9.0, 10.0]],
            target_pcoord_bounds=[[0.0, 1.0]],
            dim_reduce_method=method,
            tau=1.0,
        )
        m.get_iterations()
        with pytest.raises(ValueError, match="No usable coordinate"):
            m.dimReduce(first_iter=5, last_iter=5)  # empty window


def test_get_transition_data_lag0_resets_n_lag(tmp_path):
    """get_transition_data(0) after a lag>0 call must reset n_lag, or
    downstream lagtime math scales rates by the stale lag."""
    m, _ = _tiny_built_model(tmp_path, name="lag")
    m.set_basis({"coords": np.zeros((4, 3))})
    m.load_iter_data(6)
    m.get_transition_data(2)
    assert m.n_lag == 2
    m.get_transition_data(0)
    assert m.n_lag == 0


def test_get_iter_fluxMatrix_weights_match_coord_pairs(tmp_path):
    """The feature-cache weights used by get_iter_fluxMatrix must equal the
    NaN-zeroed weights iter_coord_pairs computes (including a NaN case)."""
    import h5py

    path = str(tmp_path / "w.h5")
    generate_west_h5(path, n_iterations=12, n_segments=10, seed=19)
    with h5py.File(path, "r+") as h5:
        h5["iterations/iter_00000006/auxdata/coord"][3, -1] = np.nan

    m = modelWE()
    m.initialize(
        [path],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "wx",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none",
        tau=1.0,
    )
    m.get_iterations()
    m.dimReduce()
    mapper = RectilinearBinMapper([np.linspace(0, 10, 7)])
    m.cluster_coordinates(n_clusters=2, stratified=True, user_bin_mapper=mapper)

    for it in (5, 6):
        _p, _c, w_ref = m._dataset.iter_coord_pairs(it)
        feats = m._featurize_all()
        offs = feats["offsets"]
        np.testing.assert_array_equal(
            feats["weights"][offs[it - 1] : offs[it]], w_ref
        )
        fm = m.get_iter_fluxMatrix(it)
        assert np.isfinite(fm).all()
    # The NaN segment contributes zero flux
    assert w_ref is not None


def test_shim_records_remapped_bins(tmp_path):
    """StratifiedClustersShim must record REMAPPED bins in
    target_bins/basis_bins, as the reference does
    (stratified_clustering.py:135,163-169)."""
    m, _ = _tiny_built_model(tmp_path, name="remap")
    strat = m._strat
    shim = m.clusters
    # Force a remap of some bin onto another, then re-run a predict pass
    src = int(np.flatnonzero(strat.initialized)[0])
    dst = int(np.flatnonzero(strat.initialized)[1])
    strat.set_remap(src, dst)
    shim.target_bins.clear()
    shim.basis_bins.clear()
    m.load_iter_data(5)
    m.load_iter_coordinates()
    shim.toggle = False
    shim.processing_from = False
    shim.predict(m.reduceCoordinates(m.cur_iter_coords))
    recorded = shim.target_bins | shim.basis_bins
    assert src not in recorded or strat.we_remap[src] == src
