"""Large-N scaling: ingest + full build on a ~500k-segment synthetic dataset
with wall-clock budgets on the paths that used to be per-segment python
loops (``get_seg_histories``, ``update_cluster_structures``).

The README claims million-segment practicality; this pins the 500k point so
an accidental O(N) python loop reappearing on the critical path fails CI
loudly rather than silently degrading."""
import time

import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.model import modelWE


@pytest.fixture(scope="module")
def big_h5(tmp_path_factory):
    path = tmp_path_factory.mktemp("we_big") / "west.h5"
    generate_west_h5(str(path), n_iterations=55, n_segments=10_000, seed=3)
    return str(path)


def test_500k_segment_build_within_budget(big_h5):
    model = modelWE()
    t0 = time.perf_counter()
    model.initialize(
        [big_h5],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "big",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none",
        tau=1.0,
    )
    model.get_iterations()
    assert model._dataset.numSegments.sum() >= 490_000

    model.dimReduce()
    mapper = RectilinearBinMapper([np.linspace(0, 10, 11)])
    model.cluster_coordinates(
        n_clusters=5, stratified=True, user_bin_mapper=mapper
    )
    model.get_fluxMatrix(0)
    model.organize_fluxMatrix()
    model.get_Tmatrix()
    model.get_steady_state()
    model.get_steady_state_target_flux()
    build_s = time.perf_counter() - t0
    assert model.JtargetSS > 0
    # Generous CI budget; locally this is ~5 s on CPU
    assert build_s < 120, f"500k-segment build took {build_s:.1f}s"

    # Ancestry walk: one gather per history step, not per segment
    model.load_iter_data(model.maxIter - 1)
    t0 = time.perf_counter()
    model.get_seg_histories(20)
    hist_s = time.perf_counter() - t0
    assert hist_s < 2.0, f"get_seg_histories took {hist_s:.2f}s at 10k segs"
    assert model.seg_histories.shape == (model.nSeg, 20)

    # Structure export: argsort+split grouping, not per-segment appends
    t0 = time.perf_counter()
    model.update_cluster_structures(build_pcoord_cache=True)
    ucs_s = time.perf_counter() - t0
    assert ucs_s < 30, f"update_cluster_structures took {ucs_s:.1f}s at 500k"
    total = sum(len(v) for v in model.cluster_structure_weights.values())
    # every discretizable segment lands in exactly one cluster bucket
    expected = int(sum(len(d) for d in model.dtrajs[: model.maxIter - 2]))
    assert total == expected
    assert model.pcoord_cache is not None


def test_seg_histories_vectorized_matches_loop_reference(big_h5):
    """The gather-based ancestry walk equals a per-segment python walk."""
    model = modelWE()
    model.initialize(
        [big_h5],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "big",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none",
        tau=1.0,
    )
    model.get_iterations()
    n_iter = model.maxIter - 1
    model.load_iter_data(n_iter)
    n_hist = 6
    model.get_seg_histories(n_hist)

    ds = model._dataset
    rng = np.random.default_rng(0)
    for iS in rng.choice(model.nSeg, 200, replace=False):
        cur = iS
        warped = False
        for iH in range(1, n_hist):
            if warped or cur < 0:
                warped = True
                expect = 0
            else:
                d = ds.iter_data(n_iter - iH + 1)
                expect = d["parent_ids_global"][cur]
            assert model.seg_histories[iS, iH] == expect, (iS, iH)
            if not warped:
                cur = expect
