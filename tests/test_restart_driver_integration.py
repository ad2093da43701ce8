"""Integration test: the RestartDriver state machine end-to-end against a
mocked WESTPA runtime (the plugin's pure logic is unit-tested elsewhere; this
exercises the full prepare_new_we flow -- archive run, build the haMSM over
marathon files, write start/basis/target states, re-init and relaunch)."""
import json
import os
import sys
import types
from collections import defaultdict
from types import SimpleNamespace

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.data import generate_west_h5


class FakeRC:
    def __init__(self, config):
        self.config = config
        self.propagator = SimpleNamespace(get_pcoord=lambda state: None)
        self.sim_manager = None

    def pstatus(self, *args, **kwargs):
        pass


class FakeConfig:
    def __init__(self, values):
        self.values = values

    def get(self, keys, default=None):
        return self.values.get(tuple(keys), default)


class FakeDataManager:
    def __init__(self, h5file):
        self.we_h5filename = h5file
        self.store_h5 = True
        self.hamsm_model = None

    def finalize_run(self):
        pass

    def close_backing(self):
        pass

    def get_basis_states(self, n_iter):
        return [SimpleNamespace(label="b0", probability=0.5, auxref="bstate.pdb")]

    def get_target_states(self, n_iter):
        return [SimpleNamespace(label="t0", pcoord=[0.5])]


class FakeSimManager:
    def __init__(self, data_manager, max_iters):
        self.data_manager = data_manager
        self.work_manager = SimpleNamespace(is_master=True)
        self.n_iter = max_iters + 1  # finalize_run: iter already incremented
        self.max_total_iterations = max_iters
        self.current_iter_bstates = [
            SimpleNamespace(label="b0", probability=0.5, auxref="bstate.pdb")
        ]
        self._callback_table = defaultdict(set)
        self.finalize_run = object()  # just a key for the callback table
        self.post_propagation = object()

    def register_callback(self, hook, cb, priority):
        self._callback_table[hook].add((priority, cb.__name__, cb))


@pytest.fixture
def fake_westpa(monkeypatch, tmp_path):
    """Install mock westpa modules and chdir into a prepared WE directory."""
    calls = {"w_init": [], "w_run": 0}

    westpa = types.ModuleType("westpa")
    westpa.rc = FakeRC(
        FakeConfig({("west", "propagation", "max_total_iterations"): 25})
    )
    cli = types.ModuleType("westpa.cli")
    core = types.ModuleType("westpa.cli.core")
    w_init = types.ModuleType("westpa.cli.core.w_init")
    w_run = types.ModuleType("westpa.cli.core.w_run")

    def initialize(**kwargs):
        calls["w_init"].append(kwargs)

    def run_simulation():
        calls["w_run"] += 1

    w_init.initialize = initialize
    w_run.run_simulation = run_simulation
    core.w_init = w_init
    core.w_run = w_run

    for name, mod in [
        ("westpa", westpa),
        ("westpa.cli", cli),
        ("westpa.cli.core", core),
        ("westpa.cli.core.w_init", w_init),
        ("westpa.cli.core.w_run", w_run),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)

    monkeypatch.chdir(tmp_path)
    os.mkdir("traj_segs")
    os.mkdir("seg_logs")
    generate_west_h5("west.h5", n_iterations=25, n_segments=16, seed=23)
    with open("restart_initialization.json", "w") as fp:
        json.dump({"bstate_file": "b.txt", "tstate_file": "t.txt",
                   "segs_per_state": 1}, fp)

    return dict(calls=calls, westpa=westpa, dir=tmp_path)


def test_restart_driver_full_cycle(fake_westpa):
    from msm_we_tpu.westpa_plugins.restart_driver import RestartDriver

    dm = FakeDataManager("west.h5")
    sm = FakeSimManager(dm, max_iters=25)
    fake_westpa["westpa"].rc.sim_manager = sm

    plugin_config = {
        "n_restarts": 2,
        "n_runs": 1,
        "extension_iters": 0,
        "model_name": "restart_test",
        "n_clusters": 2,
        "tau": 1.0,
        "basis_pcoord_bounds": [[9.0, 10.0]],
        "target_pcoord_bounds": [[0.0, 1.0]],
        "dimreduce_method": "pca",
        "cross_validation_groups": 0,
        "ref_pdb_file": {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "user_bin_mapper": RectilinearBinMapper([np.linspace(0, 10, 11)]),
        "base_path": str(fake_westpa["dir"]),
    }

    driver = RestartDriver(sm, plugin_config)
    driver.prepare_new_we()

    # Run archived, restart state advanced
    assert os.path.exists("restart0/run1/west.h5")
    state = json.load(open("restart.dat"))
    assert state == {"restarts_completed": 1, "runs_completed": 0}

    # haMSM built and artifacts written
    model = driver.model
    assert model is not None and model.JtargetSS > 0
    assert float(open("restart0/JtargetSS.txt").read()) == model.JtargetSS
    pss = np.loadtxt("restart0/pSS.txt")
    assert np.allclose(pss, model.pSS)

    # Start states: weighted per Aristoff-Zuckerman, hdf: references
    lines = open("restart0/startstates.txt").read().strip().splitlines()
    assert len(lines) > 0
    weights = []
    for line in lines:
        label, weight, ref = line.split()
        assert label.startswith("b") and "_s" in label
        assert ref.startswith("hdf:")
        weights.append(float(weight))
    assert np.isclose(sum(weights), model.pSS[: model.n_clusters].sum(), rtol=1e-6)

    # Basis-state probabilities crushed by 1e-10
    blines = open("restart0/basisstates.txt").read().strip().splitlines()
    assert float(blines[0].split()[1]) == pytest.approx(0.5 * 1e-10)
    assert open("restart0/targetstates.txt").read().startswith("t0 0.5")

    # Diagnostics and checkpoint
    assert os.path.exists("restart0/hamsm.obj")
    assert os.path.exists("restart0/flux_plot.pdf")
    assert os.path.exists("restart0/coarse_flux_profile.pdf")

    # New WE initialized in the steady state and relaunched
    calls = fake_westpa["calls"]
    assert len(calls["w_init"]) == 1
    assert calls["w_init"][0]["sstate_file"].endswith("startstates.txt")
    assert calls["w_run"] == 1
    # Initialization file rolled over for the next marathon
    assert os.path.exists("restart0/restart_initialization.json")
    new_init = json.load(open("restart_initialization.json"))
    assert new_init["sstate_file"].endswith("startstates.txt")


def test_restart_driver_mid_marathon_run(fake_westpa):
    """With n_runs=3, finishing run 1 must archive it, re-init from the
    initialization JSON, and relaunch -- without building an haMSM."""
    from msm_we_tpu.westpa_plugins.restart_driver import RestartDriver

    dm = FakeDataManager("west.h5")
    sm = FakeSimManager(dm, max_iters=25)
    fake_westpa["westpa"].rc.sim_manager = sm

    driver = RestartDriver(
        sm,
        {
            "n_restarts": 2,
            "n_runs": 3,
            "model_name": "x",
            "n_clusters": 2,
            "tau": 1.0,
            "basis_pcoord_bounds": [[9.0, 10.0]],
            "target_pcoord_bounds": [[0.0, 1.0]],
        },
    )
    driver.prepare_new_we()

    state = json.load(open("restart.dat"))
    assert state == {"restarts_completed": 0, "runs_completed": 1}
    assert os.path.exists("restart0/run1/west.h5")
    calls = fake_westpa["calls"]
    assert len(calls["w_init"]) == 1
    assert calls["w_init"][0]["bstate_file"] == "b.txt"  # from the init JSON
    assert calls["w_run"] == 1
    assert driver.model is None  # no haMSM built mid-marathon


def test_restart_driver_extension_when_target_unreached(fake_westpa):
    """First restart with zero recycling events and extension_iters > 0 must
    enter extension mode: lockfile written, runs_completed reset, data
    re-linked, and the run continued."""
    import h5py

    from msm_we_tpu.westpa_plugins.restart_driver import (
        EXTENSION_LOCKFILE,
        RestartDriver,
    )

    # Strip all recycling events from the data
    with h5py.File("west.h5", "a") as h5:
        for key in h5["iterations"]:
            seg_index = h5[f"iterations/{key}/seg_index"]
            data = seg_index[:]
            data["endpoint_type"] = 1
            seg_index[...] = data

    # west.cfg for the max-iteration rewrite
    with open("west.cfg", "w") as fp:
        fp.write("west:\n  propagation:\n    max_total_iterations: 25\n")

    dm = FakeDataManager("west.h5")
    dm.open_backing = lambda: None
    sm = FakeSimManager(dm, max_iters=25)
    fake_westpa["westpa"].rc.sim_manager = sm

    driver = RestartDriver(
        sm,
        {
            "n_restarts": 2,
            "n_runs": 1,
            "extension_iters": 10,
            "model_name": "x",
            "n_clusters": 2,
            "tau": 1.0,
            "basis_pcoord_bounds": [[9.0, 10.0]],
            "target_pcoord_bounds": [[0.0, 1.0]],
        },
    )
    driver.prepare_new_we()

    assert os.path.exists(EXTENSION_LOCKFILE)
    state = json.load(open("restart.dat"))
    assert state == {"restarts_completed": 0, "runs_completed": 0}
    assert os.path.islink("traj_segs")
    assert "max_total_iterations: 35" in open("west.cfg").read()
    assert fake_westpa["westpa"].rc.sim_manager.max_total_iterations == 35
    assert fake_westpa["calls"]["w_run"] == 1
    assert fake_westpa["calls"]["w_init"] == []  # extensions don't re-init


def test_restart_driver_skips_mid_run(fake_westpa):
    """Nothing happens when it's not the final iteration."""
    from msm_we_tpu.westpa_plugins.restart_driver import RestartDriver

    dm = FakeDataManager("west.h5")
    sm = FakeSimManager(dm, max_iters=25)
    sm.n_iter = 10  # mid-run
    fake_westpa["westpa"].rc.sim_manager = sm

    driver = RestartDriver(
        sm,
        {
            "n_restarts": 2,
            "n_runs": 1,
            "model_name": "x",
            "n_clusters": 2,
            "tau": 1.0,
            "basis_pcoord_bounds": [[9.0, 10.0]],
            "target_pcoord_bounds": [[0.0, 1.0]],
        },
    )
    driver.prepare_new_we()
    assert not os.path.exists("restart.dat")
    assert fake_westpa["calls"]["w_run"] == 0
