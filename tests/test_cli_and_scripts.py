"""CLI entry point and post-hoc augmentation script coverage."""
import json
import sys
import types

import h5py
import numpy as np
import pytest

from msm_we_tpu.cli import main
from msm_we_tpu.data import generate_west_h5


@pytest.fixture(scope="module")
def west_h5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "west.h5")
    generate_west_h5(path, n_iterations=30, n_segments=16, seed=21)
    return path


def test_cli_generate_and_info(tmp_path, capsys):
    out = str(tmp_path / "gen.h5")
    assert main(["generate", out, "--iterations", "8", "--segments", "6"]) == 0
    with h5py.File(out) as h5:
        assert "iterations/iter_00000001/seg_index" in h5
    assert main(["info"]) == 0
    assert "jax backend" in capsys.readouterr().out


def test_cli_build_basic(west_h5, tmp_path, capsys):
    out_json = str(tmp_path / "results.json")
    rc = main([
        "build", west_h5, "--basis", "9", "10", "--target", "0", "1",
        "--n-clusters", "6", "--output", out_json,
    ])
    assert rc == 0
    results = json.load(open(out_json))
    assert results["JtargetSS"] > 0
    assert np.isclose(sum(results["pSS"]), 1.0)
    assert results["n_lag"] == 0


def test_cli_build_stratified_lag_device(west_h5, tmp_path):
    out_json = str(tmp_path / "results2.json")
    model_path = str(tmp_path / "model.obj")
    rc = main([
        "build", west_h5, "--basis", "9", "10", "--target", "0", "1",
        "--n-clusters", "2", "--stratified", "--lag", "1",
        "--device-pipeline", "--output", out_json, "--save-model", model_path,
    ])
    assert rc == 0
    results = json.load(open(out_json))
    assert results["n_lag"] == 1 and results["lagtime"] == pytest.approx(2.0)

    from msm_we_tpu.model import modelWE

    restored = modelWE.load(model_path, h5_paths=[west_h5])
    assert restored.JtargetSS == pytest.approx(results["JtargetSS"])


def test_cli_no_command_prints_help(capsys):
    assert main([]) == 1


class _FakeTraj:
    def __init__(self, xyz):
        self.xyz = xyz
        self.topology = "fake-topology"


def _install_fake_mdtraj(monkeypatch, coords_of):
    """Stub mdtraj: load(path) returns a 1-frame trajectory whose coordinates
    are derived from the path via ``coords_of``."""
    import os

    fake = types.ModuleType("mdtraj")

    def load(path, top=None):
        if not os.path.exists(path):
            raise OSError(f"No such file: {path}")
        return _FakeTraj(np.asarray(coords_of(path))[None])

    fake.load = load
    monkeypatch.setitem(sys.modules, "mdtraj", fake)


def test_augment_west_h5_writes_coord_pairs(tmp_path, monkeypatch):
    """The post-hoc augmentation utility (working replacement for the
    reference's bit-rotted collectCoordinates.py) writes the
    (n_segs, 2, atoms, 3) auxdata the pipeline ingests."""
    from msm_we_tpu.scripts import augment_west_h5

    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=6, n_segments=4, seed=2)
    # Strip the generator's auxdata to simulate an unaugmented run
    with h5py.File(path, "a") as h5:
        for k in list(h5["iterations"].keys()):
            if "auxdata" in h5[f"iterations/{k}"]:
                del h5[f"iterations/{k}/auxdata"]

    # Create the per-segment directory layout the script expects
    n_atoms = 3
    made = set()
    with h5py.File(path) as h5:
        for k in h5["iterations"]:
            it = int(k.split("_")[1])
            n_segs = h5[f"iterations/{k}/seg_index"].shape[0]
            for s in range(n_segs):
                d = tmp_path / "traj_segs" / f"{it:06d}" / f"{s:06d}"
                d.mkdir(parents=True, exist_ok=True)
                (d / "parent.rst7").write_text("stub")
                (d / "seg.rst7").write_text("stub")
                made.add((it, s))

    def coords_of(p):
        # Deterministic per-path coordinates so we can verify placement
        seed = abs(hash(str(p))) % (2**31)
        return np.random.default_rng(seed).normal(size=(n_atoms, 3))

    _install_fake_mdtraj(monkeypatch, coords_of)
    (tmp_path / "top.pdb").write_text("stub")

    n = augment_west_h5(
        path, str(tmp_path / "top.pdb"),
        seg_dir_format="traj_segs/{iteration:06d}/{seg_id:06d}",
    )
    assert n >= 4  # all but the (incomplete) last iteration

    with h5py.File(path) as h5:
        grp = h5["iterations/iter_00000002"]
        dset = grp["auxdata/coord"]
        n_segs = grp["seg_index"].shape[0]
        assert dset.shape == (n_segs, 2, n_atoms, 3)
        assert np.isfinite(dset[:]).all()

    # Idempotent without overwrite; re-runs with overwrite
    _install_fake_mdtraj(monkeypatch, coords_of)
    assert augment_west_h5(path, str(tmp_path / "top.pdb")) == 0
    _install_fake_mdtraj(monkeypatch, coords_of)
    assert augment_west_h5(path, str(tmp_path / "top.pdb"), overwrite=True) >= 4


def test_augment_missing_segment_files_get_nan(tmp_path, monkeypatch):
    from msm_we_tpu.scripts import augment_west_h5

    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=4, n_segments=3, seed=3)
    with h5py.File(path, "a") as h5:
        for k in list(h5["iterations"].keys()):
            if "auxdata" in h5[f"iterations/{k}"]:
                del h5[f"iterations/{k}/auxdata"]
    # Only segment 0 of each iteration has files
    with h5py.File(path) as h5:
        for k in h5["iterations"]:
            it = int(k.split("_")[1])
            d = tmp_path / "traj_segs" / f"{it:06d}" / "000000"
            d.mkdir(parents=True, exist_ok=True)
            (d / "parent.rst7").write_text("stub")
            (d / "seg.rst7").write_text("stub")

    _install_fake_mdtraj(
        monkeypatch, lambda p: np.zeros((2, 3)) + 1.0
    )
    (tmp_path / "top.pdb").write_text("stub")
    augment_west_h5(path, str(tmp_path / "top.pdb"))

    with h5py.File(path) as h5:
        dset = h5["iterations/iter_00000001/auxdata/coord"][:]
    assert np.isfinite(dset[0]).all()
    assert np.isnan(dset[1]).all()  # missing files -> NaN (weight-0 downstream)


def test_cli_validate(tmp_path):
    from msm_we_tpu.cli import main
    from msm_we_tpu.data import generate_west_h5

    h5 = str(tmp_path / "west.h5")
    generate_west_h5(h5, n_iterations=25, n_segments=24, seed=3)
    model_path = str(tmp_path / "model.obj")
    out_path = str(tmp_path / "validate.json")

    assert main([
        "build", h5, "--basis", "9", "10", "--target", "0", "1",
        "--n-clusters", "3", "--stratified", "--save-model", model_path,
    ]) == 0

    assert main([
        "validate", model_path, "--lags", "0", "1", "2",
        "--pcca-sets", "2", "--output", out_path,
    ]) == 0

    import json

    results = json.load(open(out_path))
    assert results["lag_times"] == [1.0, 2.0, 3.0]
    assert len(results["implied_timescales"]) == 3
    assert len(results["ck_sets"]) == 2
    assert results["ck_max_abs_deviation"] < 0.5


def test_cli_validate_reports_ck_error_for_bad_lags(tmp_path):
    """Non-integer lag multiples must not discard the implied-timescale
    results: the CLI reports them alongside a ck_error field."""
    import json

    from msm_we_tpu.cli import main
    from msm_we_tpu.data import generate_west_h5

    h5 = str(tmp_path / "west.h5")
    generate_west_h5(h5, n_iterations=25, n_segments=24, seed=3)
    model_path = str(tmp_path / "model.obj")
    out_path = str(tmp_path / "validate.json")
    assert main([
        "build", h5, "--basis", "9", "10", "--target", "0", "1",
        "--n-clusters", "3", "--stratified", "--save-model", model_path,
    ]) == 0

    assert main(["validate", model_path, "--lags", "1", "2",
                 "--output", out_path]) == 0
    results = json.load(open(out_path))
    assert "ck_error" in results and "integer lag multiples" in results["ck_error"]
    assert len(results["implied_timescales"]) == 2
