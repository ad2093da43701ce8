"""Lock the reference's public API surface (SURVEY.md section 2).

Every public class/method/function the reference exposes must resolve here
(same name, compatible home). Names that were pure Ray/fork plumbing in the
reference are intentionally absent and listed as such, with their replacement
named -- so the list is an auditable design decision, not a gap.
"""
import numpy as np
import pytest


# (module, class-or-None, [names...]) -- names must exist as attributes.
REFERENCE_SURFACE = [
    # msm_we.py :: modelWE (facade + mixins; reference msm_we.py:35-42)
    (
        "msm_we_tpu.model",
        "modelWE",
        [
            # AnalysisMixin (_analysis.py)
            "evolve_target_flux", "get_Tmatrix", "get_backwards_committor",
            "get_committor", "get_eqTmatrix", "get_flux", "get_flux_committor",
            "get_steady_state", "get_steady_state_algebraic",
            "get_steady_state_matrixpowers", "get_steady_state_target_flux",
            "print_pseudocommittor_warning",
            # ClusteringMixin (_clustering.py)
            "cluster_aggregated", "cluster_coordinates", "cluster_stratified",
            "find_nearest_bin", "get_cluster_centers", "launch_ray_discretization",
            "organize_stratified", "update_cluster_structures",
            "update_sorted_cluster_centers",
            # DataMixin (_data.py)
            "collect_iter_coordinates", "get_coordSet", "get_coordinates",
            "get_iter_coordinates", "get_iterations", "get_iterations_iters",
            "get_seg_histories", "get_traj_coordinates", "get_transition_data",
            "get_transition_data_lag0", "load_iter_coordinates",
            "load_iter_coordinates0", "load_iter_data",
            # DimensionalityReductionMixin
            "dimReduce", "reduceCoordinates",
            # FluxMatrixMixin
            "get_fluxMatrix", "get_iter_fluxMatrix", "organize_aggregated",
            "organize_fluxMatrix",
            # PlottingMixin
            "check_display_overcorrection_warning",
            "draw_basis_target_boundaries", "get_coarse_flux_profile",
            "plot_coarse_flux_profile", "plot_committor", "plot_flux",
            "plot_flux_committor", "plot_flux_committor_pcoordcolor",
            # facade proper (msm_we.py)
            "WEbasisp1_bounds", "WEtargetp1_bounds", "basis_pcoord_bounds",
            "build_analyze_model", "check_connect_ray", "do_block_validation",
            "do_step", "initialize", "is_WE_basis", "is_WE_target", "n_lag",
            "new_table", "progress_disable", "progress_enable", "set_basis",
            "set_note", "set_topology", "target_pcoord_bounds",
        ],
    ),
    ("msm_we_tpu.model", None, ["BlockValidationError", "StratifiedClustersShim"]),
    ("msm_we_tpu.model", "StratifiedClustersShim", ["predict"]),
    ("msm_we_tpu.ops.pca", None, ["Coordinates"]),
    ("msm_we_tpu._logging", None, ["log", "DefaultProgress", "ProgressBar"]),
    # ensembles.py
    ("msm_we_tpu.msm.ensembles", "Ensemble",
     ["add_trajectory", "empirical_corr_function", "empirical_mfpts"]),
    ("msm_we_tpu.msm.ensembles", "PathEnsemble", ["cluster", "from_ensemble"]),
    ("msm_we_tpu.msm.ensembles", "DiscreteEnsemble",
     ["from_ensemble", "from_transition_matrix"]),
    ("msm_we_tpu.msm.ensembles", "DiscretePathEnsemble",
     ["from_ensemble", "from_transition_matrix", "nm_mfpt",
      "weighted_fundamental_sequences"]),
    # fpt.py
    ("msm_we_tpu.msm.fpt", "DirectFPT", ["fpts", "mean_fpts"]),
    ("msm_we_tpu.msm.fpt", "MatrixFPT",
     ["adaptive_fpt_distribution", "calc_fmatrix", "directional_mfpt",
      "fpt_distribution", "max_commute_time", "mean_fpts", "mfpts_matrix",
      "mfpts_to_target_microstate", "min_commute_time"]),
    ("msm_we_tpu.msm.fpt", "MarkovFPT", ["markov_commute_time", "mean_fpts"]),
    ("msm_we_tpu.msm.fpt", "NonMarkovFPT", ["mean_fpts"]),
    # nmm.py
    ("msm_we_tpu.msm.nmm", "NonMarkovModel",
     ["corr_function", "empirical_fpts", "empirical_mfpts",
      "empirical_weighted_FS", "fit", "fluxAB_distribution_on_B",
      "fluxBA_distribution_on_A", "fpt_distrib_AB", "fpt_distrib_BA",
      "from_nm_tmatrix", "lag_time", "mfpts", "popA", "popB", "populations",
      "tmatrixAB", "tmatrixBA", "weighted_FS"]),
    ("msm_we_tpu.msm.nmm", "MarkovPlusColorModel", ["fit", "populations"]),
    # optimization.py
    ("msm_we_tpu.optimization", None,
     ["get_clustered_mfpt_bins", "get_uniform_mfpt_bins", "solve_discrepancy"]),
    ("msm_we_tpu.optimization", "OptimizedBinMapper",
     ["create_new", "mapper", "unpickle"]),
    # utils.py
    ("msm_we_tpu.utils", None,
     ["Interval", "check_tmatrix", "clean_tmatrix", "find_connected_sets",
      "get_shape", "inverse_iteration", "is_connected", "map_to_integers",
      "normalize", "normalize_markov_matrix", "num_of_nonzero_elements",
      "pops_from_nm_tmatrix", "pops_from_tmatrix", "pseudo_nm_tmatrix",
      "random_markov_matrix", "reverse_sort_lists", "weighted_choice"]),
    # westpa_plugins
    ("msm_we_tpu.westpa_plugins.augmentation_driver", "H5AugmentationDriver",
     ["augment_coordinates"]),
    ("msm_we_tpu.westpa_plugins.augmentation_driver", "MDAugmentationDriver",
     ["augment_coordinates"]),
    ("msm_we_tpu.westpa_plugins.hamsm_driver", "HAMSMDriver", ["construct_hamsm"]),
    ("msm_we_tpu.westpa_plugins.optimization_driver", "OptimizationDriver",
     ["compute_new_pcoord_map", "compute_optimized_allocation",
      "compute_optimized_bins", "default_allocation_optimizer",
      "default_bin_optimizer", "do_optimization", "update_westpa_pcoord"]),
    ("msm_we_tpu.westpa_plugins.restart_driver", "RestartDriver",
     ["cur_iter", "generate_plots", "get_original_bins", "init_we",
      "is_last_iteration", "prepare_extension_run", "prepare_new_we"]),
    ("msm_we_tpu.westpa_plugins.restart_driver", None,
     ["check_target_reached", "fix_deprecated_initialization"]),
]

# Reference names that are deliberately NOT reproduced: each was an artifact
# of the Ray-task / fork-subprocess execution model, replaced by a batched
# JAX path (SURVEY.md P1/P2). Kept here so the omission is explicit.
INTENTIONALLY_ABSENT = {
    "do_clustering": "cluster_aggregated / cluster_stratified run batched",
    "do_discretization": "launch_discretization (one masked matmul+argmin)",
    "do_ray_discretization": "launch_discretization",
    "do_stratified_clustering": "cluster_stratified streams device batches",
    "do_stratified_ray_discretization": "launch_discretization",
    "do_pca": "ops.pca.MomentAccumulator streaming add()",
    "do_full_pca": "ops.pca.MomentAccumulator.finalize()",
    "build_flux_matrix": "ops.fluxmatrix.flux_matrix (segment-sum kernel)",
    "build_flux_matrix_remote": "parallel.sharded psum path",
    "GlobalModelActor": "batched compute_new_pcoord_map",
    "PcoordCalculator": "batched compute_new_pcoord_map",
}


def test_reference_surface_resolves():
    import importlib

    missing = []
    for modname, clsname, names in REFERENCE_SURFACE:
        mod = importlib.import_module(modname)
        obj = mod if clsname is None else getattr(mod, clsname)
        for name in names:
            if not hasattr(obj, name):
                missing.append(f"{modname}:{clsname or '<module>'}.{name}")
    assert not missing, f"reference API names missing: {missing}"


def test_calc_fmatrix_matches_fpt_distribution():
    """The per-state recursion shim agrees with the vectorized engine."""
    from msm_we_tpu.msm.fpt import MatrixFPT
    from msm_we_tpu.utils import random_markov_matrix

    rng_matrix = random_markov_matrix(6, seed=7)
    ini_state = [0, 2]
    f_state = 5
    lag_list = np.arange(0, 40, dtype=int)

    list_of_pdfs = np.zeros((len(ini_state), len(lag_list)))
    for idx in range(len(ini_state)):
        MatrixFPT.calc_fmatrix(
            None, rng_matrix, rng_matrix.copy(), list_of_pdfs, lag_list,
            ini_state, idx, f_state,
        )

    # Same readout via the vectorized distribution (uniform initial distrib,
    # single initial state isolates one row).
    for row, state in enumerate(ini_state):
        dist = MatrixFPT.fpt_distribution(
            rng_matrix, [state], [f_state], [1.0], max_n_lags=len(lag_list)
        )
        expected = list_of_pdfs[row] / list_of_pdfs[row].sum()
        np.testing.assert_allclose(dist[1:, 1] / dist[1:, 1].sum(), expected,
                                   rtol=1e-12, atol=1e-15)


def test_manual_live_table_helpers():
    pytest.importorskip("rich")
    from msm_we_tpu.model import modelWE

    table = modelWE.new_table()
    assert len(table.columns) == 3
    n_rows = len(table.columns[0]._cells)
    assert n_rows == len(modelWE._TABLE_STEPS)

    seen = []
    result = modelWE.do_step(table, 1, lambda x: seen.append(x) or "ok", args=(42,))
    assert result == "ok" and seen == [42]
    assert "✓" in table.columns[0]._cells[1]

    modelWE.set_note(table, 1, "note text")
    assert table.columns[2]._cells[1] == "note text"

    def boom():
        raise ValueError("exploded")

    with pytest.raises(ValueError):
        modelWE.do_step(table, 2, boom)
    assert "x" in table.columns[0]._cells[2]
    assert "exploded" in table.columns[2]._cells[2]


def test_module_level_block_validation_error():
    from msm_we_tpu.model import BlockValidationError, modelWE

    assert BlockValidationError is modelWE.BlockValidationError


def test_coordinates_alias_is_identity():
    from msm_we_tpu.ops.pca import Coordinates

    x = np.arange(6.0).reshape(2, 3)
    assert Coordinates().transform(x) is x


def test_get_original_bins_reads_we_driver_binning():
    from types import SimpleNamespace

    from msm_we_tpu.westpa_plugins.restart_driver import RestartDriver

    class FakeBin:
        def __init__(self, weight):
            self.weight = weight

    driver = RestartDriver.__new__(RestartDriver)  # no westpa in tests
    driver.sim_manager = SimpleNamespace(
        we_driver=SimpleNamespace(
            next_iter_binning=[FakeBin(0.25), FakeBin(0.5), FakeBin(0.25)]
        )
    )
    bins, binprobs = driver.get_original_bins()
    assert len(bins) == 3
    np.testing.assert_allclose(binprobs, [0.25, 0.5, 0.25])
    assert binprobs.dtype == np.float64
