"""Tests for the WESTPA-independent plugin logic (no westpa install needed)."""
import json
import os

import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.westpa_plugins.hamsm_driver import build_hamsm_from_config
from msm_we_tpu.westpa_plugins.optimization_driver import (
    compute_new_pcoord_map,
    compute_optimized_bins_for_model,
)
from msm_we_tpu.westpa_plugins.restart_driver import (
    check_target_reached,
    fix_deprecated_initialization,
    load_restart_state,
    marathon_west_files,
    save_restart_state,
    start_state_entries,
    write_restart_artifacts,
)


@pytest.fixture(scope="module")
def west_h5(tmp_path_factory):
    path = tmp_path_factory.mktemp("weplug") / "west.h5"
    generate_west_h5(str(path), n_iterations=40, n_segments=24, seed=21)
    return str(path)


@pytest.fixture(scope="module")
def hamsm_model(west_h5):
    config = {
        "model_name": "plugin_test",
        "n_clusters": 2,
        "tau": 1.0,
        "basis_pcoord_bounds": [[9.0, 10.0]],
        "target_pcoord_bounds": [[0.0, 1.0]],
        "dimreduce_method": "pca",
        "cross_validation_groups": 0,
        "user_bin_mapper": RectilinearBinMapper([np.linspace(0, 10, 11)]),
        "ref_pdb_file": {"coords": None, "nAtoms": 4, "coord_ndim": 3},
    }
    return build_hamsm_from_config(config, [west_h5])


def test_check_target_reached(west_h5, tmp_path):
    assert check_target_reached(west_h5)  # synthetic data has recycling events

    # A file with no recycling events
    import h5py

    norec = tmp_path / "norec.h5"
    with h5py.File(west_h5, "r") as src, h5py.File(norec, "w") as dst:
        src.copy("iterations", dst)
        for key in dst["iterations"]:
            seg_index = dst[f"iterations/{key}/seg_index"]
            data = seg_index[:]
            data["endpoint_type"] = 1
            seg_index[...] = data
    assert not check_target_reached(str(norec))


def test_restart_state_roundtrip(tmp_path):
    f = str(tmp_path / "restart.dat")
    state = load_restart_state(f)
    assert state == {"restarts_completed": 0, "runs_completed": 0}
    state["runs_completed"] = 3
    save_restart_state(f, state)
    assert load_restart_state(f) == state


def test_fix_deprecated_initialization():
    fixed = fix_deprecated_initialization(
        {"tstate-file": "a", "bstate_file": "b", "segs-per-state": 2}
    )
    assert fixed == {"tstate_file": "a", "bstate_file": "b", "segs_per_state": 2}


def test_marathon_west_files():
    state = {"restarts_completed": 2, "runs_completed": 3}
    files = marathon_west_files(state, n_runs=3, restarts_to_use=-1, base_path="B")
    assert len(files) == 9  # 3 restarts (0,1,2) x 3 runs
    assert files[0] == "B/restart0/run1/west.h5"

    files = marathon_west_files(state, n_runs=3, restarts_to_use=2, base_path="B")
    assert len(files) == 6
    assert files[0] == "B/restart1/run1/west.h5"

    files = marathon_west_files(state, n_runs=3, restarts_to_use=0.5, base_path="B")
    assert len(files) == 3  # last 0.5 * 3 = 1 restart


def test_hamsm_from_config(hamsm_model):
    assert hamsm_model.JtargetSS > 0
    assert np.isclose(hamsm_model.pSS.sum(), 1.0)


def test_start_state_entries(hamsm_model):
    hamsm_model.update_cluster_structures(build_pcoord_cache=True)
    entries = list(start_state_entries(hamsm_model, hamsm_model.pSS))
    assert len(entries) > 0
    # Total start-state weight should be close to the non-basis/target pSS mass
    total = sum(w for _b, _s, w, _x in entries)
    expected = hamsm_model.pSS[: hamsm_model.n_clusters].sum()
    assert np.isclose(total, expected, rtol=1e-6)
    # No basis/target entries
    bins = {b for b, _s, _w, _x in entries}
    assert hamsm_model.n_clusters not in bins
    assert hamsm_model.n_clusters + 1 not in bins


def test_write_restart_artifacts(hamsm_model, tmp_path):
    hamsm_model.update_cluster_structures(build_pcoord_cache=True)
    restart_dir = str(tmp_path / "restart0")
    sstates = write_restart_artifacts(hamsm_model, restart_dir, store_h5=True)

    assert os.path.exists(f"{restart_dir}/JtargetSS.txt")
    assert float(open(f"{restart_dir}/JtargetSS.txt").read()) == hamsm_model.JtargetSS
    pss = np.loadtxt(f"{restart_dir}/pSS.txt")
    assert np.allclose(pss, hamsm_model.pSS)

    lines = open(sstates).read().strip().splitlines()
    assert len(lines) > 0
    label, weight, ref = lines[0].split()
    assert label.startswith("b") and "_s" in label
    assert float(weight) > 0
    assert ref.startswith("hdf:")

    # Model pickle round-trips
    import pickle

    with open(f"{restart_dir}/hamsm.obj", "rb") as f:
        restored = pickle.load(f)
    assert np.allclose(restored.pSS, hamsm_model.pSS)


def test_compute_optimized_bins(hamsm_model):
    mapper = compute_optimized_bins_for_model(hamsm_model, n_active_bins=8)
    # Assign some coordinates: [pcoord, reduced features...]
    feats = hamsm_model._featurize_all()
    n = 16
    coords = np.concatenate(
        [feats["pcoord1"][:n], feats["child"][:n]], axis=1
    ).astype(np.float32)
    out = mapper.assign(coords)
    assert out.shape == (n,)
    assert (out >= 0).all() and (out < 8).all()


def test_compute_new_pcoord_map(hamsm_model):
    rng = np.random.default_rng(0)
    coord_map = {i: rng.normal(size=(4, 3)) for i in range(10)}
    pcoord_map = compute_new_pcoord_map(
        hamsm_model, coord_map, lambda s: np.array([float(s)])
    )
    assert set(pcoord_map.keys()) == set(range(10))
    # original pcoord (1) + reduced dims
    assert pcoord_map[3].shape == (1 + hamsm_model.ndim,)
    assert pcoord_map[3][0] == 3.0


def test_hamsm_config_device_pipeline(west_h5, hamsm_model):
    """The west.cfg schema's device_pipeline/show_live_display keys flow
    through to build_analyze_model; results match the host-path build."""
    config = {
        "model_name": "plugin_dp",
        "n_clusters": 2,
        "tau": 1.0,
        "basis_pcoord_bounds": [[9.0, 10.0]],
        "target_pcoord_bounds": [[0.0, 1.0]],
        "dimreduce_method": "pca",
        "cross_validation_groups": 0,
        "user_bin_mapper": RectilinearBinMapper([np.linspace(0, 10, 11)]),
        "ref_pdb_file": {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "device_pipeline": True,
        "show_live_display": False,
    }
    model = build_hamsm_from_config(config, [west_h5])
    assert model._mesh is not None
    assert model.JtargetSS == pytest.approx(hamsm_model.JtargetSS, rel=1e-6)


def test_marathon_fraction_uses_at_least_one_restart():
    from msm_we_tpu.westpa_plugins.restart_driver import marathon_west_files

    state = {"restarts_completed": 3, "runs_completed": 2}
    files = marathon_west_files(state, restarts_to_use=0.2, base_path=".")
    # 0.2 * 4 rounds to 0 -> clamp to the single most recent restart,
    # NOT the whole marathon history
    assert {f.split("/")[1] for f in files} == {"restart3"}


def test_optimized_bin_mapper_rejects_single_positional():
    from msm_we_tpu.optimization import OptimizedBinMapper

    with pytest.raises(TypeError, match="bytestring"):
        OptimizedBinMapper(b"deadbeef")


def test_wrap_for_westpa_funcbinmapper(monkeypatch):
    """The WESTPA-facing mapper is a FuncBinMapper wrapping assign() with
    the (coords, mask, output) contract."""
    import sys
    import types

    captured = {}

    class FakeFuncBinMapper:
        def __init__(self, func, nbins, args=None, kwargs=None):
            captured.update(func=func, nbins=nbins, args=args or ())

    binning_mod = types.ModuleType("westpa.core.binning")
    binning_mod.FuncBinMapper = FakeFuncBinMapper
    core_mod = types.ModuleType("westpa.core")
    core_mod.binning = binning_mod
    westpa_mod = types.ModuleType("westpa")
    westpa_mod.core = core_mod
    monkeypatch.setitem(sys.modules, "westpa", westpa_mod)
    monkeypatch.setitem(sys.modules, "westpa.core", core_mod)
    monkeypatch.setitem(sys.modules, "westpa.core.binning", binning_mod)

    from msm_we_tpu.westpa_plugins.optimization_driver import _wrap_for_westpa

    class FakeMapper:
        nbins = 5

        def assign(self, coords):
            return np.full(len(coords), 3)

    _wrap_for_westpa(FakeMapper())
    assert captured["nbins"] == 5
    func, (mapper,) = captured["func"], captured["args"]
    coords = np.zeros((4, 2))
    mask = np.array([True, False, True, True])
    output = np.zeros(4, int)
    func(coords, mask, output, mapper)
    assert output.tolist() == [3, 0, 3, 3]


def test_pcoord1d_flux_empty_range_raises(west_h5):
    from msm_we_tpu.extended import ExtendedModelWE

    model = ExtendedModelWE()
    model.initialize(
        [west_h5],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "ext",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none",
        tau=1.0,
    )
    model.get_iterations()
    with pytest.raises(ValueError, match="last_iter > first_iter"):
        model.get_pcoord1D_fluxMatrix(0, 5, 5, np.linspace(0, 10, 5))


def test_start_state_weights_use_sorted_pss(hamsm_model):
    """Per-cluster start-state weight mass must equal the pcoord-SORTED pSS
    entry for that cluster: cluster_structures is keyed by raw dtraj ids,
    pSS lives in the sorted fluxMatrix numbering, and the two differ by the
    recorded sort permutation. (The total-mass check above cannot catch a
    permutation mixup -- sums are permutation-invariant; the reference
    indexes raw ids directly and gets this wrong.)"""
    hamsm_model.update_cluster_structures(build_pcoord_cache=True)
    sort_idx = np.asarray(hamsm_model.pcoord_sort_indices)
    assert not np.array_equal(sort_idx, np.arange(hamsm_model.nBins)), (
        "fixture's sort permutation became the identity; this test would "
        "no longer distinguish raw from sorted indexing"
    )
    inv = np.empty(hamsm_model.nBins, dtype=int)
    inv[sort_idx] = np.arange(hamsm_model.nBins)

    per_bin = {}
    for b, _s, w, _x in start_state_entries(hamsm_model, hamsm_model.pSS):
        per_bin[b] = per_bin.get(b, 0.0) + w
    assert per_bin
    for b, w in per_bin.items():
        np.testing.assert_allclose(w, hamsm_model.pSS[inv[b]], rtol=1e-9)
