"""WE-continuity featurization dedup: parent features gathered from the
previous iteration's child features must be bitwise-identical to the direct
(read + featurize both frames) path, with automatic fallback whenever the
continuity invariant or featurizer row-independence fails."""
import h5py
import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.data.westh5 import WEDataset
from msm_we_tpu.model import modelWE


@pytest.fixture(scope="module")
def h5path(tmp_path_factory):
    path = tmp_path_factory.mktemp("dedup") / "west.h5"
    generate_west_h5(str(path), n_iterations=25, n_segments=24, seed=3)
    return str(path)


def _build(path, dedup, process=None, files=None):
    m = modelWE()
    m.build_analyze_model(
        file_paths=files or [path],
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
            },
            **({"initialize": {"processCoordinates": process}} if process else {}),
        },
        dedup_coordinates=dedup,
    )
    return m


def _assert_same_features_and_results(m_a, m_b):
    for k in ["parent", "child", "weights", "pcoord0", "pcoord1"]:
        assert np.array_equal(m_a._features[k], m_b._features[k]), k
    assert np.array_equal(m_a.pSS, m_b.pSS)
    assert m_a.JtargetSS == m_b.JtargetSS


def test_generator_data_is_continuous_and_has_recycling(h5path):
    ds = WEDataset([h5path])
    assert ds.check_continuity()
    # The equality test below is only meaningful if recycled (parent_id < 0)
    # fallback rows actually occur past iteration 1
    any_recycled = any(
        (ds.iter_data(i)["parent_ids_global"] < 0).any()
        for i in range(2, max(ds._iter_index) + 1)
        if i in ds._iter_index
    )
    assert any_recycled


def test_dedup_build_bitwise_matches_direct(h5path):
    m_direct = _build(h5path, dedup=False)
    m_auto = _build(h5path, dedup="auto")
    _assert_same_features_and_results(m_direct, m_auto)


def test_broken_continuity_auto_falls_back(h5path, tmp_path):
    broken = str(tmp_path / "broken.h5")
    import shutil

    shutil.copy(h5path, broken)
    with h5py.File(broken, "r+") as h5:
        # Convention-level break: every iteration's start frames are the
        # child's own first saved MD frame, not the parent's final frame
        # (the failure mode check_continuity is designed to detect; a
        # single corrupted row is NOT -- the check is sampled because an
        # exhaustive one would read back exactly the I/O dedup saves, so
        # per-row corruption requires dedup_coordinates=False).
        for name, grp in h5["iterations"].items():
            if "auxdata" in grp:
                coords = grp["auxdata/coord"]
                coords[:, 0] = coords[:, 0] + 1e-3

    ds = WEDataset([broken])
    assert not ds.check_continuity()

    m_direct = _build(broken, dedup=False)
    m_auto = _build(broken, dedup="auto")  # must detect and fall back
    _assert_same_features_and_results(m_direct, m_auto)


def test_nan_coordinates_propagate_through_gather(h5path, tmp_path):
    """A NaN final frame zero-weights the parent's children in BOTH paths:
    the dedup path must propagate NaN-ness through the feature gather."""
    nanpath = str(tmp_path / "nan.h5")
    import shutil

    shutil.copy(h5path, nanpath)
    with h5py.File(nanpath, "r+") as h5:
        grp = h5["iterations/iter_00000007"]
        coords = grp["auxdata/coord"]
        coords[2, -1] = np.nan
        # Keep continuity: children of segment 2 start from that NaN frame
        nxt = h5["iterations/iter_00000008"]
        children = np.flatnonzero(nxt["seg_index"]["parent_id"] == 2)
        cc = nxt["auxdata/coord"]
        for ch in children:
            cc[ch, 0] = np.nan

    ds = WEDataset([nanpath])
    assert ds.check_continuity()

    m_direct = _build(nanpath, dedup=False)
    m_auto = _build(nanpath, dedup="auto")
    _assert_same_features_and_results(m_direct, m_auto)
    # The NaN rows were actually zero-weighted
    it = m_auto._features["iteration"]
    off = m_auto._features["offsets"]
    assert m_auto._features["weights"][off[6] + 2] == 0.0
    assert (it[m_auto._features["weights"] == 0.0] >= 7).any()


def test_non_rowwise_featurizer_falls_back(h5path):
    """A featurizer whose output depends on the whole batch (batch-mean
    centering) breaks the gather; the sampled verification must catch it."""

    def batch_dependent(coords):
        flat = np.asarray(coords).reshape(len(coords), -1)
        return flat - flat.mean(axis=0, keepdims=True)

    m_direct = _build(h5path, dedup=False, process=batch_dependent)
    m_auto = _build(h5path, dedup="auto", process=batch_dependent)
    # Fallback means the direct path ran: everything matches bitwise
    _assert_same_features_and_results(m_direct, m_auto)


def test_multifile_dedup_matches_direct(h5path, tmp_path):
    second = str(tmp_path / "west2.h5")
    generate_west_h5(second, n_iterations=25, n_segments=16, seed=9)
    files = [h5path, second]

    m_direct = _build(h5path, dedup=False, files=files)
    m_auto = _build(h5path, dedup="auto", files=files)
    _assert_same_features_and_results(m_direct, m_auto)
