"""Round-2 coverage batch: directly exercise functions previously reachable
only through higher-level paths (found by a test-reference audit)."""
import json

import numpy as np
import pytest

from msm_we_tpu.utils import random_markov_matrix


def test_stage_timer_dict_report_json(tmp_path):
    from msm_we_tpu.tracing import StageTimer

    timer = StageTimer()
    with timer.stage("Alpha"):
        timer.set_note("three things")
    with timer.stage("Beta"):
        pass

    d = timer.as_dict()
    assert [s["name"] for s in d["stages"]] == ["Alpha", "Beta"]
    assert d["stages"][0]["note"] == "three things"
    assert d["total_seconds"] >= 0

    text = timer.report()
    assert "Alpha" in text and "TOTAL" in text

    out = tmp_path / "stages.json"
    timer.to_json(str(out))
    loaded = json.loads(out.read_text())
    assert loaded == d


def test_steady_state_power_jax_matches_algebraic():
    import jax.numpy as jnp

    from msm_we_tpu.ops.linalg import steady_state_algebraic, steady_state_power_jax

    T = random_markov_matrix(12, seed=42)
    p_exact = steady_state_algebraic(T)
    p_power = np.asarray(
        steady_state_power_jax(
            jnp.asarray(T, jnp.float32),
            jnp.ones(12, jnp.float32) / 12,
            n_iters=600,
        )
    )
    np.testing.assert_allclose(p_power, p_exact, atol=5e-5)


def test_net_flux_profile_matches_bruteforce():
    from msm_we_tpu.ops.linalg import net_flux_profile

    rng = np.random.default_rng(5)
    F = rng.random((7, 7))
    order = rng.permutation(7)
    J = net_flux_profile(F, order)

    # J is indexed by ORIGINAL state id (scattered back through the order)
    Fo = F[np.ix_(order, order)]
    for i in range(6):  # the last ordered state keeps J = 0
        expected = Fo[i + 1 :, : i + 1].sum() - Fo[: i + 1, i + 1 :].sum()
        np.testing.assert_allclose(J[order[i]], expected)
    assert J[order[6]] == 0.0


def test_equilibrium_tmatrix_from_flux_symmetrizes():
    from msm_we_tpu.ops.linalg import equilibrium_tmatrix_from_flux

    rng = np.random.default_rng(3)
    F = rng.random((7, 7))
    T = equilibrium_tmatrix_from_flux(F, ind_targets=[6], ind_basis=[5])
    assert T.shape == (5, 5)  # basis/target states dropped
    np.testing.assert_allclose(T.sum(axis=1), 1.0, atol=1e-12)
    assert (T >= 0).all()


def test_best_mesh_shape_factorizations():
    from msm_we_tpu.parallel.mesh import best_mesh_shape

    for n in (1, 2, 4, 6, 8, 16):
        shape = best_mesh_shape(n)
        assert np.prod(shape) == n


def test_progress_bar_task_api():
    from msm_we_tpu._logging import DefaultProgress, ProgressBar

    with ProgressBar(DefaultProgress()) as bar:
        task = bar.add_task("working", total=3)
        for _ in range(3):
            bar.advance(task)


class TestExtendedKhBins:
    @pytest.fixture(scope="class")
    def kh_model(self):
        from msm_we_tpu.extended import ExtendedModelWE

        m = ExtendedModelWE()
        rng = np.random.default_rng(0)
        m.kh = rng.normal(0.3, 0.4, size=(50, 1))
        m.nB = 8
        return m

    def test_get_initial_khbins(self, kh_model, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)  # writes khbins_binCenters.dat like the reference
        kh_model.get_initial_khbins()
        centers = kh_model.khbins_binCenters
        edges = kh_model.khbins_binEdges
        assert len(centers) == kh_model.nB
        assert np.all(np.diff(centers) > 0)
        assert edges[0] == -np.inf and edges[-1] == np.inf
        # Every center lies within its own bin
        inner = np.digitize(centers, edges) - 1
        np.testing.assert_array_equal(inner, np.arange(kh_model.nB))
        assert (tmp_path / "khbins_binCenters.dat").exists()


def test_iter_fluxmatrix_sums_to_full_fluxmatrix(tmp_path):
    """get_iter_fluxMatrix must apply the same basis/target routing as
    get_fluxMatrix (including the stratified start-in-target override), so
    summing it over the default iteration range reproduces fluxMatrixRaw --
    with bounds widened so start-in-target rows actually occur."""
    from msm_we_tpu.binning import RectilinearBinMapper
    from msm_we_tpu.data import generate_west_h5
    from msm_we_tpu.model import modelWE

    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=30, n_segments=24, seed=5)
    m = modelWE()
    m.initialize(
        [path], {"coords": None, "nAtoms": 4, "coord_ndim": 3}, "ifm",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none", tau=1.0,
    )
    m.get_iterations()
    m.get_coordSet(m.maxIter)
    m.dimReduce()
    m.cluster_coordinates(
        n_clusters=2, stratified=True,
        user_bin_mapper=RectilinearBinMapper([np.linspace(0, 10, 11)]),
    )
    # Widen the target so some segments *start* inside it (the generator
    # recycles target-reachers, so with the narrow bounds no parent is ever
    # in the target region and the routing branch would go unexercised)
    m.target_pcoord_bounds = [[0.0, 3.0]]
    m.get_fluxMatrix(0)

    iters = range(2, m.maxIter)
    total = sum(m.get_iter_fluxMatrix(i) for i in iters) / len(list(iters))
    np.testing.assert_allclose(total, m.fluxMatrixRaw, rtol=1e-12, atol=1e-300)
    # The widened bounds actually exercised start-in-target routing
    assert any(
        m.is_WE_target(m._dataset.iter_data(i)["pcoord0"]).any() for i in iters
    )


def test_partial_fit_counts_seed_batch_once():
    """A bin initialized by a batch must not also route that same batch
    through the minibatch update (seed weights counted twice, centers taking
    an extra half-step; sklearn's partial_fit counts a first batch once)."""
    from msm_we_tpu.ops.stratified import StratifiedKmeans

    rng = np.random.default_rng(0)
    n, k = 40, 3
    X = rng.normal(size=(n, 2)).astype(np.float32)
    w = rng.random(n).astype(np.float32)
    bins = np.zeros(n, np.int32)

    strat = StratifiedKmeans(n_bins=2, k_per_bin=k, n_features=2, seed=1)
    strat.partial_fit(X, bins, weights=w)
    strat._sync_host()
    np.testing.assert_allclose(
        strat.counts[: k].sum(), w.sum(), rtol=1e-5,
        err_msg="seed batch weights entered the counts more than once",
    )

    # A second batch with already-initialized bins DOES update counts
    X2 = rng.normal(size=(8, 2)).astype(np.float32)
    w2 = rng.random(8).astype(np.float32)
    strat.partial_fit(X2, np.zeros(8, np.int32), weights=w2)
    strat._sync_host()
    np.testing.assert_allclose(strat.counts[:k].sum(), w.sum() + w2.sum(), rtol=1e-5)


def test_path_ensemble_from_column_vector_discrete_trajs():
    """(n, 1) discrete trajectories must find the same reactive paths as
    their 1-D equivalents (2-D labels silently found zero paths)."""
    from msm_we_tpu.msm.ensembles import DiscreteEnsemble, PathEnsemble

    traj = np.array([5, 5, 0, 2, 9, 9, 0, 3, 9])
    flat = DiscreteEnsemble([traj])
    col = DiscreteEnsemble([traj[:, None]])
    p_flat = PathEnsemble.from_ensemble(flat, stateA=[0], stateB=[9], discrete=True)
    p_col = PathEnsemble.from_ensemble(col, stateA=[0], stateB=[9], discrete=True)
    assert len(p_flat.trajectories) == 2
    assert len(p_col.trajectories) == len(p_flat.trajectories)


def test_corr_function_short_trajectories_give_nan():
    from msm_we_tpu.msm.ensembles import Ensemble

    ens = Ensemble([np.arange(3, dtype=float)])
    vals = ens.empirical_corr_function([0, 1.5], [1.5, 3], [1, 5])
    assert np.isfinite(vals[0])
    assert np.isnan(vals[1])


def test_generator_honors_n_segments_and_first_iter_sentinel():
    from msm_we_tpu.data.synthetic import SynthWESettings, generate_trajectory_arrays

    its = generate_trajectory_arrays(
        SynthWESettings(n_iterations=4, n_segments=32, warmup=3, seed=2)
    )
    assert all(len(d["weights"]) == 32 for d in its)
    # First recorded iteration: start-of-trajectory sentinel, as in real
    # west.h5 files (parents would index an unrecorded warmup iteration)
    assert (its[0]["parent_ids"] == -1).all()
    assert any((d["parent_ids"] >= 0).any() for d in its[1:])


def test_optimized_mapper_handles_dict_with_gaps():
    """A dict microstate_mapper with non-contiguous keys must route unknown
    microstates to the pcoord fallback instead of KeyError-ing."""
    from msm_we_tpu.binning import RectilinearBinMapper
    from msm_we_tpu.model import StratifiedClustersShim, modelWE
    from msm_we_tpu.optimization import OptimizedBinMapper
    from msm_we_tpu.ops.stratified import StratifiedKmeans

    rng = np.random.default_rng(0)
    strat = StratifiedKmeans(n_bins=2, k_per_bin=2, n_features=1, seed=0)
    strat.partial_fit(
        rng.normal(size=(40, 1)).astype(np.float32) + 2.0,
        np.repeat([0, 1], 20).astype(np.int32),
    )
    model = modelWE()
    model._strat = strat
    base_mapper = RectilinearBinMapper([[-100.0, 0.0, 100.0]])
    shim = StratifiedClustersShim(base_mapper, model, strat)

    mapper = OptimizedBinMapper(
        6, 1, [[9.0, 10.0]], [[-10.0, -9.0]],
        base_mapper,
        {0: 0.0, 2: 1.0},  # microstate 1/3 missing (cleaned)
        shim,
    )
    # Column 0: original pcoord; column 1: the extended (reduced) feature
    coords = np.array([[1.0, 2.1], [2.5, 1.9], [9.5, 2.0], [-9.5, 2.2]])
    out = mapper.assign(coords)
    assert out.shape == (4,)
    assert out[2] == 5 and out[3] == 4  # basis/target -> last two WE bins


def test_masked_minibatch_step_equals_separate_calls():
    """The fused one-dispatch streaming step must be bitwise-identical to
    masked_assign followed by minibatch_update."""
    import jax.numpy as jnp

    from msm_we_tpu.ops.kmeans import (
        masked_assign,
        masked_minibatch_step,
        minibatch_update,
    )

    rng = np.random.default_rng(1)
    n, K, d, n_bins = 256, 12, 5, 4
    X = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.random(n).astype(np.float32))
    seg_bin = jnp.asarray(rng.integers(0, n_bins, n).astype(np.int32))
    centers = jnp.asarray(rng.normal(size=(K, d)).astype(np.float32))
    counts = jnp.asarray(rng.random(K).astype(np.float32))
    center_bin = jnp.asarray(np.repeat(np.arange(n_bins, dtype=np.int32), 3))
    valid = jnp.asarray(np.ones(K, bool))

    idx = masked_assign(X, seg_bin, centers, center_bin, valid, n_bins=n_bins)
    c_sep, n_sep = minibatch_update(centers, counts, X, w, idx)
    c_fused, n_fused = masked_minibatch_step(
        centers, counts, X, w, seg_bin, center_bin, valid, n_bins=n_bins
    )
    np.testing.assert_array_equal(np.asarray(c_sep), np.asarray(c_fused))
    np.testing.assert_array_equal(np.asarray(n_sep), np.asarray(n_fused))
