"""Guard tests for the budget-bounded block cache + prefetch reader.

These pin the failure mode of the 10M-segment stress shape (VERDICT round-3
item 6): when the dataset outgrows ``MSM_WE_TPU_BLOCK_CACHE_MB`` the cache
must stop growing and the build must degrade to the previous streaming
behavior with *identical* numerics -- never deadlock, never overshoot the
budget, never serve a block twice after a consume hand-over.

Reference semantics being preserved: the streaming contract of
``_hamsm/_data.py:677-755`` (coordinates may be re-read from h5 at any time;
caching is purely an overlap optimization).
"""
import threading
import time

import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.data.westh5 import WEDataset
from msm_we_tpu.model import modelWE

N_ITER = 12
N_SEGS = 16


@pytest.fixture(scope="module")
def h5path(tmp_path_factory):
    path = tmp_path_factory.mktemp("prefetch") / "west.h5"
    generate_west_h5(str(path), n_iterations=N_ITER, n_segments=N_SEGS, seed=11)
    return str(path)


def _wait_thread_done(ds, timeout=30.0):
    t = ds._prefetch_thread
    if t is not None:
        t.join(timeout=timeout)
        assert not t.is_alive(), "prefetch thread did not finish"


def test_block_cache_budget_respected(h5path):
    ds = WEDataset([h5path])
    one_block = ds._read_frame_block(1, -1).nbytes
    # Room for exactly two blocks; the third read must not be cached
    ds.enable_block_cache(budget_bytes=2 * one_block)
    direct = {i: np.array(ds._read_frame_block(i, -1)) for i in (1, 2, 3)}
    for i in (1, 2, 3):
        got = ds._iter_frame_block(i, -1)
        assert np.array_equal(np.asarray(got), direct[i])
        assert ds._block_used <= ds._block_budget
    assert set(ds._block_cache) == {(1, -1), (2, -1)}
    assert ds._block_used == 2 * one_block
    ds.close()


def test_consume_hand_over_serves_once(h5path):
    ds = WEDataset([h5path])
    ds.enable_block_cache()
    first = np.array(ds._iter_frame_block(2, -1))  # populates the cache
    assert (2, -1) in ds._block_cache
    used_before = ds._block_used
    assert used_before > 0

    owned = ds._iter_frame_block(2, -1, consume=True)
    assert np.array_equal(np.asarray(owned), first)
    # Ownership transferred: entry gone, accounting restored, key tombstoned
    assert (2, -1) not in ds._block_cache
    assert ds._block_used == used_before - owned.nbytes
    assert (2, -1) in ds._block_consumed
    # A consuming re-read goes to disk and never re-populates the cache
    again = ds._iter_frame_block(2, -1, consume=True)
    assert np.array_equal(np.asarray(again), first)
    assert (2, -1) not in ds._block_cache
    ds.close()


def test_prefetch_fills_then_consumer_drains(h5path):
    ds = WEDataset([h5path])
    direct = {
        i: np.array(ds._read_frame_block(i, -1)) for i in range(1, N_ITER)
    }
    ds.start_prefetch(N_ITER)
    _wait_thread_done(ds)
    # Everything fits in the default budget at this size
    assert set(ds._block_cache) == {(i, -1) for i in range(1, N_ITER)}
    for i in range(1, N_ITER):
        got = ds._iter_frame_block(i, -1, consume=True)
        assert np.array_equal(np.asarray(got), direct[i])
    assert ds._block_cache == {}
    assert ds._block_used == 0
    ds.stop_prefetch()
    ds.close()


def test_prefetch_backpressure_tiny_budget_no_deadlock(h5path):
    """Budget below one block: the reader must idle (not busy-cache), the
    consumer must still get correct data from disk, and stop must return
    promptly -- this is exactly what a 10M-segment dataset does to the
    default 512 MB budget."""
    ds = WEDataset([h5path])
    direct = {
        i: np.array(ds._read_frame_block(i, -1)) for i in range(1, N_ITER)
    }
    ds.enable_block_cache(budget_bytes=1)
    ds.start_prefetch(N_ITER)
    for i in range(1, N_ITER):
        got = ds._iter_frame_block(i, -1, consume=True)
        assert np.array_equal(np.asarray(got), direct[i])
        assert ds._block_used <= 1
    t0 = time.perf_counter()
    ds.stop_prefetch()
    assert time.perf_counter() - t0 < 5.0
    assert ds._prefetch_thread is None
    ds.close()


def test_stop_and_close_are_idempotent_under_active_prefetch(h5path):
    ds = WEDataset([h5path])
    ds.start_prefetch(N_ITER)
    ds.close()  # close() stops the prefetch first
    ds.stop_prefetch()  # then both are no-ops
    ds.stop_prefetch()
    assert ds._prefetch_thread is None
    # The dataset must still be readable after close (lazy reopen)
    assert ds.iter_data(1)["n_segs"] == N_SEGS
    ds.close()


def test_concurrent_consumers_never_corrupt_accounting(h5path):
    """Hammer the cache from several threads while a prefetch runs; the
    invariants 0 <= _block_used <= _block_budget and value-correctness must
    hold throughout (the caches are shared by the prefetch daemon and the
    pipeline thread in production)."""
    ds = WEDataset([h5path])
    direct = {
        i: np.array(ds._read_frame_block(i, -1)) for i in range(1, N_ITER)
    }
    ds.enable_block_cache()
    ds.start_prefetch(N_ITER)
    errors = []

    def worker(seed):
        rng = np.random.default_rng(seed)
        try:
            for _ in range(30):
                i = int(rng.integers(1, N_ITER))
                got = ds._iter_frame_block(i, -1, consume=bool(rng.integers(2)))
                if not np.array_equal(np.asarray(got), direct[i]):
                    errors.append(f"wrong data for iter {i}")
                with ds._io_lock:
                    used, budget = ds._block_used, ds._block_budget
                if not (0 <= used <= budget):
                    errors.append(f"accounting violated: {used}/{budget}")
        except Exception as e:  # surface, don't hang the join
            errors.append(repr(e))

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    ds.stop_prefetch()
    assert not errors, errors[:5]
    ds.close()


def _build(path, cache_mb=None, monkeypatch=None):
    if monkeypatch is not None and cache_mb is not None:
        monkeypatch.setenv("MSM_WE_TPU_BLOCK_CACHE_MB", str(cache_mb))
    m = modelWE()
    m.build_analyze_model(
        file_paths=[path],
        ref_struct={"coords": None, "nAtoms": 4, "coord_ndim": 3},
        modelName="t",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dimreduce_method="pca",
        tau=1.0,
        n_clusters=4,
        cross_validation_groups=0,
        show_live_display=False,
        step_kwargs={
            "clustering": {
                "user_bin_mapper": RectilinearBinMapper([np.linspace(0, 10, 7)])
            }
        },
    )
    return m


def test_build_with_zero_budget_matches_default(h5path, monkeypatch):
    """The end-to-end guard: a build whose block cache can never hold a
    single block (the degraded large-dataset regime) must produce
    bit-identical features and analysis results to the default build."""
    m_default = _build(h5path)
    m_tiny = _build(h5path, cache_mb=0, monkeypatch=monkeypatch)
    for k in ["parent", "child", "weights"]:
        assert np.array_equal(m_default._features[k], m_tiny._features[k]), k
    assert np.array_equal(m_default.pSS, m_tiny.pSS)
    assert m_default.JtargetSS == m_tiny.JtargetSS


def test_subset_reads_are_transient(h5path):
    """ADVICE r4 (medium): continuity/subset reads must not populate the
    block cache -- frame-0 blocks cached during check_continuity occupied
    the 512 MB budget for the whole build (the featurizer never consumes
    frame 0) and starved phase-2 prefetch."""
    ds = WEDataset([h5path])
    ds.enable_block_cache()
    out = ds.iter_frame_subset(2, [0, 1, 3], 0)
    assert out.shape[0] == 3
    assert ds._block_cache == {} and ds._block_used == 0

    # A transient HIT must not mark the block shared (fancy indexing
    # copies), so a later consume=True owner still gets the original
    # array without a defensive copy
    first = np.array(ds._iter_frame_block(2, -1))  # populates the cache
    assert (2, -1) in ds._block_cache
    sub = ds.iter_frame_subset(2, [1, 2], -1)
    sub[:] = -999.0  # mutating the gathered copy never reaches the cache
    assert np.array_equal(np.asarray(ds._block_cache[(2, -1)]), first)
    ds.close()


def test_continuity_check_leaves_cache_empty(h5path):
    ds = WEDataset([h5path])
    ds.enable_block_cache()
    assert ds._check_continuity_uncached(
        sample_per_iter=4, full_iters=2, seed=0, last_iter=None
    ) is True
    assert ds._block_cache == {} and ds._block_used == 0
    ds.close()


def test_aux_full_respects_per_iteration_dtype(tmp_path):
    """ADVICE r4 (low): a per-file dtype memo silently down-converted later
    iterations written with a wider dtype. The full-block low-level read
    must use each iteration's own on-disk dtype."""
    import h5py

    src = str(tmp_path / "mixed.h5")
    generate_west_h5(src, n_iterations=6, n_segments=4, seed=5)
    # Rewrite iteration 3's auxdata as f64 with values that do not survive
    # an f32 round-trip
    with h5py.File(src, "r+") as h5:
        g = h5["iterations/iter_00000003/auxdata"]
        name = list(g)[0]
        data = g[name][:].astype(np.float64)
        data += 1e-12  # sub-f32-resolution perturbation
        del g[name]
        g.create_dataset(name, data=data)
    ds = WEDataset([src])
    # Read iteration 1 first so the (old) per-file memo would have locked f32
    b1 = ds._read_frame_block(1, -1)
    b3 = ds._aux_full(0, 3)
    assert b3.dtype == np.float64
    with h5py.File(src, "r") as h5:
        raw = h5["iterations/iter_00000003/auxdata/" + name][:]
    np.testing.assert_array_equal(b3, raw)
    assert np.isfinite(np.asarray(b1, dtype=np.float64)).any()
    ds.close()


def test_iter_frame_subset_fast_path_matches_selective(h5path, monkeypatch):
    """VERDICT r4 item 7: the 32 MB-threshold whole-block fast path must
    return the same rows (as an independent copy) as the row-selective
    HDF5 read path."""
    ds = WEDataset([h5path])
    rows = [3, 0, 3, 7]  # repeats: split walkers share a parent
    fast = ds.iter_frame_subset(2, rows, -1)
    # Force the selective path by making every block look > 32 MB
    monkeypatch.setattr(
        ds, "_block_nbytes_estimate", lambda: (33 << 20)
    )
    selective = ds.iter_frame_subset(2, rows, -1)
    np.testing.assert_array_equal(fast, selective)
    ds.close()


def test_iter_frame_subset_dtype_stable_across_paths(tmp_path, monkeypatch):
    """The selective path must return the same dtype as the whole-block
    path (native f32 stays f32) -- a np.full-default f64 upcast made the
    same call site flip dtype with cache state, breaking byte-exact
    consumers like featurize_dedup's verify sample."""
    import h5py

    src = str(tmp_path / "f32.h5")
    generate_west_h5(src, n_iterations=6, n_segments=200, seed=2)
    with h5py.File(src, "r+") as h5:
        for it in list(h5["iterations"]):
            g = h5[f"iterations/{it}/auxdata"]
            name = list(g)[0]
            data = g[name][:].astype(np.float32)
            del g[name]
            g.create_dataset(name, data=data)
    ds = WEDataset([src])
    rows = [0, 3, 3, 7]  # sparse: 4 * 16 < 200 segments
    fast = ds.iter_frame_subset(2, rows, -1)
    assert fast.dtype == np.float32
    # Force the size gate open so the sparse-rows selective branch runs
    monkeypatch.setattr(ds, "_block_nbytes_estimate", lambda: (33 << 20))
    sel = ds.iter_frame_subset(2, rows, -1)
    assert sel.dtype == np.float32, "selective path upcast the coords"
    np.testing.assert_array_equal(fast, sel)
    ds.close()
