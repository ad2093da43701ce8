"""Block-bootstrap confidence intervals for the target flux (an extension;
the reference ships only point estimates plus block cross-validation)."""
import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.model import modelWE


@pytest.fixture(scope="module")
def built_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("boot") / "west.h5")
    generate_west_h5(path, n_iterations=35, n_segments=20, seed=55)
    m = modelWE()
    m.build_analyze_model(
        file_paths=[path],
        ref_struct={"coords": np.zeros((4, 3)), "nAtoms": 4, "coord_ndim": 3},
        modelName="boot",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dimreduce_method="pca",
        tau=1.0,
        n_clusters=3,
        cross_validation_groups=0,
        show_live_display=False,
        step_kwargs={
            "clustering": {
                "user_bin_mapper": RectilinearBinMapper([np.linspace(0, 10, 8)])
            }
        },
    )
    return m


def test_bootstrap_point_estimate_matches_build(built_model):
    """The identity resample (mean of per-iteration matrices) through the
    bootstrap's pipeline must reproduce the build's JtargetSS -- the
    per-iteration decomposition and the full build are the same math."""
    res = built_model.bootstrap_target_flux(n_boot=25, seed=3)
    np.testing.assert_allclose(
        res["flux"], float(built_model.JtargetSS), rtol=1e-8
    )
    # The result is also stored on the model
    assert built_model.flux_bootstrap is res


def test_bootstrap_deterministic_and_sane(built_model):
    res1 = built_model.bootstrap_target_flux(n_boot=60, seed=7)
    res2 = built_model.bootstrap_target_flux(n_boot=60, seed=7)
    np.testing.assert_array_equal(
        np.nan_to_num(res1["fluxes"]), np.nan_to_num(res2["fluxes"])
    )
    lo, hi = res1["ci"]
    assert lo <= hi
    ok = res1["fluxes"][np.isfinite(res1["fluxes"])]
    assert len(ok) + res1["n_failed"] == 60
    assert (ok >= 0).all()
    assert lo >= ok.min() - 1e-15 and hi <= ok.max() + 1e-15
    # replicate values live in the model's flux scale
    assert ok.max() < 1.0


def test_bootstrap_block_resampling(built_model):
    res = built_model.bootstrap_target_flux(n_boot=40, seed=2, block_size=5)
    assert res["block_size"] == 5
    ok = res["fluxes"][np.isfinite(res["fluxes"])]
    assert len(ok) > 0

    with pytest.raises(ValueError, match="block_size"):
        built_model.bootstrap_target_flux(n_boot=5, block_size=10_000)


def test_bootstrap_degenerate_iterations_zero_width(built_model):
    """Resampling a single iteration's matrix n times: every replicate is
    that same matrix, so either the CI collapses to a point (iteration is
    connected) or every replicate fails loudly (it is not)."""
    from msm_we_tpu.utils import is_connected
    import scipy.sparse as sparse

    from msm_we_tpu.ops import linalg

    iters = list(range(2, built_model.maxIter))
    n = built_model.n_clusters
    chosen = None
    for it in iters:
        F = built_model.get_iter_fluxMatrix(it)
        T = linalg.tmatrix_from_flux(F, [n + 1], [n], n + 2)
        if is_connected(sparse.csr_matrix(T), np.array([n]), np.array([n + 1])):
            chosen = it
            break

    if chosen is None:
        with pytest.raises(RuntimeError, match="Every bootstrap replicate"):
            built_model.bootstrap_target_flux(
                n_boot=10, seed=1, iters_to_use=[iters[0], iters[0]]
            )
        return

    res = built_model.bootstrap_target_flux(
        n_boot=10, seed=1, iters_to_use=[chosen, chosen]
    )
    ok = res["fluxes"][np.isfinite(res["fluxes"])]
    assert len(ok) == 10
    assert res["ci"][1] - res["ci"][0] < 1e-14


def test_bootstrap_pss_and_committor_observables(built_model):
    res = built_model.bootstrap_target_flux(
        n_boot=30, seed=11, observables=("flux", "pss", "committor")
    )
    n_states = built_model.n_clusters + 2

    # Point estimates: pSS matches the build's steady state (same identity
    # resample property as the flux), committor is a valid probability with
    # the absorbing boundary values
    np.testing.assert_allclose(
        res["pss"], np.ravel(built_model.pSS), rtol=1e-8
    )
    q = res["committor"]
    assert q.shape == (n_states,)
    assert (q >= -1e-12).all() and (q <= 1 + 1e-12).all()
    # Identity-resample committor agrees with the facade's own committor
    # (computed from the sorted fluxMatrix): the bootstrap computes in raw
    # numbering and reorders, and the power iteration is
    # permutation-equivariant up to float accumulation order
    built_model.get_committor()
    np.testing.assert_allclose(q, built_model.q, atol=1e-4)

    for name in ("pss", "committor"):
        mean = res[f"{name}_mean"]
        ci = res[f"{name}_ci"]
        assert mean.shape == (n_states,)
        assert ci.shape == (2, n_states)
        assert np.isfinite(ci).all()
        assert (ci[0] <= ci[1] + 1e-15).all()
        # The mean of percentile-bounded samples lies within the bounds
        assert (mean >= ci[0] - 1e-12).all() and (mean <= ci[1] + 1e-12).all()

    # pSS replicates are distributions
    assert abs(res["pss_mean"].sum() - 1.0) < 1e-8

    # Determinism: same seed, same bands
    res2 = built_model.bootstrap_target_flux(
        n_boot=30, seed=11, observables=("flux", "pss", "committor")
    )
    np.testing.assert_array_equal(res["pss_ci"], res2["pss_ci"])
    np.testing.assert_array_equal(res["committor_ci"], res2["committor_ci"])

    # Default observables add no extra keys
    res_default = built_model.bootstrap_target_flux(n_boot=5, seed=1)
    assert "pss_ci" not in res_default and "committor_ci" not in res_default

    with pytest.raises(ValueError, match="Unknown bootstrap observables"):
        built_model.bootstrap_target_flux(n_boot=5, observables=("flux", "nope"))


def test_bootstrap_stale_sort_index_raises_for_per_state_observables(built_model):
    """A re-clustering after the last organize leaves pcoord_sort_indices at
    the old state count; per-state observables must fail loudly instead of
    mislabeling states (flux alone is permutation-invariant and still OK)."""
    saved = built_model.pcoord_sort_indices
    built_model.pcoord_sort_indices = np.arange(len(saved) + 3)
    try:
        with pytest.raises(ValueError, match="re-run\\s+organize_fluxMatrix"):
            built_model.bootstrap_target_flux(
                n_boot=4, observables=("flux", "pss")
            )
        res = built_model.bootstrap_target_flux(n_boot=4)  # flux-only: fine
        assert np.isfinite(res["flux"])
    finally:
        built_model.pcoord_sort_indices = saved
