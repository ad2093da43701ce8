"""Integration test: OptimizationDriver bin/allocation computation against a
mocked WESTPA runtime (the SynD-specific pcoord surgery is exercised only for
its pure parts)."""
import pickle
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.westpa_plugins.hamsm_driver import build_hamsm_from_config


@pytest.fixture(scope="module")
def built_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("weopt") / "west.h5")
    generate_west_h5(path, n_iterations=40, n_segments=24, seed=27)
    config = {
        "model_name": "opt_test",
        "n_clusters": 2,
        "tau": 1.0,
        "basis_pcoord_bounds": [[9.0, 10.0]],
        "target_pcoord_bounds": [[0.0, 1.0]],
        "dimreduce_method": "pca",
        "cross_validation_groups": 0,
        "user_bin_mapper": RectilinearBinMapper([np.linspace(0, 10, 11)]),
        "ref_pdb_file": {"coords": None, "nAtoms": 4, "coord_ndim": 3},
    }
    return build_hamsm_from_config(config, [path])


@pytest.fixture
def fake_westpa(monkeypatch, tmp_path, built_model):
    westpa = types.ModuleType("westpa")

    class FakeConfig:
        def get(self, keys, default=None):
            return {("west", "system", "system_options", "pcoord_ndim"): 1}.get(
                tuple(keys), default
            )

    we_driver = SimpleNamespace(
        bin_target_counts=np.full(8, 4), bin_mapper=None
    )
    rng = np.random.default_rng(0)
    coord_map = {i: rng.normal(size=(4, 3)) for i in range(12)}
    coord_map_path = tmp_path / "coord_map.pkl"
    with open(coord_map_path, "wb") as fp:
        pickle.dump(coord_map, fp)

    propagator = SimpleNamespace(
        synd_model=SimpleNamespace(backmap=lambda s: np.array([float(s), 99.0]))
    )
    westpa.rc = SimpleNamespace(
        pstatus=lambda *a, **k: None,
        config=FakeConfig(),
        get_we_driver=lambda: we_driver,
        get_propagator=lambda: propagator,
    )
    monkeypatch.setitem(sys.modules, "westpa", westpa)

    data_manager = SimpleNamespace(hamsm_model=built_model, processCoordinates=None)
    sim_manager = SimpleNamespace(
        data_manager=data_manager,
        work_manager=SimpleNamespace(is_master=True),
        max_total_iterations=25,
        register_callback=lambda hook, cb, p: None,
        finalize_run=object(),
    )
    return dict(
        sim_manager=sim_manager,
        we_driver=we_driver,
        coord_map_path=str(coord_map_path),
        coord_map=coord_map,
    )


def test_optimization_driver_bins_and_pcoord_map(fake_westpa, built_model):
    from msm_we_tpu.westpa_plugins.optimization_driver import OptimizationDriver

    driver = OptimizationDriver(
        fake_westpa["sim_manager"],
        {"full_coord_map": fake_westpa["coord_map_path"], "max_iters": 100},
    )

    mapper = driver.compute_optimized_bins()
    # Assign extended pcoords: [original pcoord, reduced features]
    feats = built_model._featurize_all()
    n = 12
    coords = np.concatenate(
        [feats["pcoord1"][:n], feats["child"][:n]], axis=1
    ).astype(np.float32)
    out = mapper.assign(coords)
    assert (out >= 0).all() and (out < 8).all()

    # Allocation: default keeps current counts
    alloc = driver.compute_optimized_allocation()
    assert np.array_equal(alloc, fake_westpa["we_driver"].bin_target_counts)

    # Extended pcoord map: original pcoord (1 dim, from the backmap) + features
    pcoord_map = driver.compute_new_pcoord_map()
    assert set(pcoord_map) == set(fake_westpa["coord_map"])
    assert pcoord_map[5].shape == (1 + built_model.ndim,)
    assert pcoord_map[5][0] == 5.0


def test_custom_binning_strategy(fake_westpa, built_model):
    from msm_we_tpu.westpa_plugins.optimization_driver import (
        compute_optimized_bins_for_model,
    )

    def halves(model):
        n = model.n_clusters
        return np.array([0] * (n // 2) + [1] * (n - n // 2))

    mapper = compute_optimized_bins_for_model(
        built_model, n_active_bins=8, binning_strategy=halves
    )
    # Microstates map only to bins {0, 1} plus basis/target {6, 7}
    assert set(np.unique(list(mapper.microstate_mapper))) <= {0, 1, 6, 7}
