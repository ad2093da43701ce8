"""Implied-timescale lag analysis (extends the reference: its lag machinery
is gated off, so it cannot run this standard MSM validation at all)."""
import numpy as np
import pytest

from msm_we_tpu.ops.linalg import implied_timescales_from_flux
from msm_we_tpu.utils import random_markov_matrix


def test_markov_chain_timescales_are_lag_independent_and_exact():
    """For flux matrices diag(pi) @ T^k of an exact Markov chain, the
    implied timescales must be -tau/ln(lambda_i(T)) at EVERY lag."""
    T = random_markov_matrix(6, seed=11)
    evals, evecs = np.linalg.eig(T.T)
    pi = np.real(evecs[:, np.argmax(np.real(evals))])
    pi = pi / pi.sum()
    tau = 2.5

    lags = [1, 2, 3, 5]
    fms = [np.diag(pi) @ np.linalg.matrix_power(T, k) for k in lags]
    lag_times = [k * tau for k in lags]
    ts = implied_timescales_from_flux(fms, lag_times, n_timescales=3)

    mags = np.sort(np.abs(np.linalg.eigvals(T)))[::-1]
    expected = -tau / np.log(mags[1:4])
    for row in ts:
        np.testing.assert_allclose(row, expected, rtol=1e-8)


def test_eigenvalue_magnitude_one_maps_to_inf():
    # Two disconnected 2-cycles: the largest SCC is a 2-state cycle whose
    # spectrum is {1, -1}; |lambda_2| = 1 -> infinite timescale
    fm = np.zeros((4, 4))
    fm[0, 1] = fm[1, 0] = 1.0
    fm[2, 3] = fm[3, 2] = 1.0
    ts = implied_timescales_from_flux([fm], [1.0], n_timescales=2)
    assert np.isinf(ts[0, 0])


def test_degenerate_matrix_gives_nan():
    fm = np.zeros((3, 3))
    fm[0, 0] = 1.0  # largest SCC is a single state
    ts = implied_timescales_from_flux([fm], [1.0], n_timescales=2)
    assert np.isnan(ts).all()


@pytest.fixture(scope="module")
def built_model(tmp_path_factory):
    from msm_we_tpu.binning import RectilinearBinMapper
    from msm_we_tpu.data import generate_west_h5
    from msm_we_tpu.model import modelWE

    path = tmp_path_factory.mktemp("its") / "west.h5"
    generate_west_h5(str(path), n_iterations=40, n_segments=24, seed=17)
    m = modelWE()
    m.build_analyze_model(
        file_paths=[str(path)],
        ref_struct={"coords": None, "nAtoms": 4, "coord_ndim": 3},
        modelName="its",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dimreduce_method="none",
        tau=1.0,
        n_clusters=3,
        cross_validation_groups=0,
        show_live_display=False,
        step_kwargs={
            "clustering": {
                "user_bin_mapper": RectilinearBinMapper([np.linspace(0, 10, 11)])
            }
        },
    )
    return m


def test_model_implied_timescales_and_state_restoration(built_model):
    m = built_model
    fm_before = np.array(m.fluxMatrixRaw)
    n_lag_before = m.n_lag

    lag_times, ts = m.get_implied_timescales(lags=(0, 1, 2), n_timescales=2)

    np.testing.assert_allclose(lag_times, [1.0, 2.0, 3.0])
    assert ts.shape == (3, 2)
    # The slowest timescale is physical: finite and positive at every lag
    assert (ts[:, 0] > 0).all() and np.isfinite(ts[:, 0]).all()
    assert ts is m.implied_timescales
    # Flux-matrix state untouched
    np.testing.assert_array_equal(np.array(m.fluxMatrixRaw), fm_before)
    assert m.n_lag == n_lag_before


def test_model_plot_implied_timescales(built_model):
    pytest.importorskip("matplotlib")
    import matplotlib

    matplotlib.use("Agg")
    fig, ax = built_model.plot_implied_timescales(lags=(0, 1))
    assert len(ax.lines) >= 1


def test_ck_exact_markov_chain():
    """For matrices diag(pi) @ T^k, predicted and estimated CK curves must
    coincide to numerical precision at every factor and for any sets."""
    from msm_we_tpu.ops.linalg import chapman_kolmogorov_from_flux

    T = random_markov_matrix(6, seed=23)
    evals, evecs = np.linalg.eig(T.T)
    pi = np.real(evecs[:, np.argmax(np.real(evals))])
    pi = pi / pi.sum()

    factors = [1, 2, 3, 5]
    fms = [np.diag(pi) @ np.linalg.matrix_power(T, k) for k in factors]

    for sets in (None, [np.array([0, 1, 2]), np.array([3, 4, 5])]):
        out_sets, predicted, estimated = chapman_kolmogorov_from_flux(
            fms, factors, sets=sets
        )
        assert np.isfinite(predicted).all() and np.isfinite(estimated).all()
        np.testing.assert_allclose(predicted, estimated, rtol=1e-8, atol=1e-12)
        # Residence probabilities
        assert (predicted >= -1e-12).all() and (predicted <= 1 + 1e-12).all()
        # At factor 1, predicted == estimated trivially (same matrix)
        np.testing.assert_allclose(predicted[:, 0], estimated[:, 0], rtol=1e-12)


def test_model_ck_test_and_plot(built_model):
    m = built_model
    lag_times, sets, predicted, estimated = m.get_ck_test(lags=(0, 1, 2))
    assert len(sets) == 2
    assert predicted.shape == estimated.shape == (2, 3)
    assert np.isfinite(predicted).all()
    assert m.ck_test[0] is lag_times

    with pytest.raises(ValueError):
        m.get_ck_test(lags=(1, 2))  # base window 2*tau, 3*tau not a multiple

    pytest.importorskip("matplotlib")
    import matplotlib

    matplotlib.use("Agg")
    fig, axes = m.plot_ck_test(lags=(0, 1))
    assert len(axes) >= 1


def test_pcca_sets_recover_metastable_blocks():
    """On a 3-block metastable chain, PCCA+ must recover the blocks."""
    from msm_we_tpu.ops.linalg import pcca_sets

    rng = np.random.default_rng(4)
    blocks = [np.arange(0, 4), np.arange(4, 7), np.arange(7, 11)]
    n = 11
    T = np.zeros((n, n))
    for block in blocks:
        sub = rng.random((len(block), len(block))) + 1.0
        T[np.ix_(block, block)] = sub
    # Weak inter-block links (both directions, so the chain is one SCC)
    T[3, 4] = T[4, 3] = T[6, 7] = T[7, 6] = T[0, 10] = T[10, 0] = 1e-4
    T = T / T.sum(axis=1, keepdims=True)

    sets = pcca_sets(T, 3)
    assert len(sets) == 3
    found = sorted(tuple(sorted(s)) for s in sets)
    expected = sorted(tuple(b) for b in blocks)
    assert found == expected

    # Partition property: every state in exactly one set
    all_states = np.sort(np.concatenate(sets))
    np.testing.assert_array_equal(all_states, np.arange(n))


def test_ck_test_with_pcca_sets(built_model):
    lag_times, sets, predicted, estimated = built_model.get_ck_test(
        lags=(0, 1), sets=2
    )
    assert len(sets) == 2
    assert np.isfinite(predicted).all()
    # PCCA sets partition the base component
    assert len(np.intersect1d(sets[0], sets[1])) == 0


def test_pcca_sets_with_complex_eigenvalue_pair():
    """A directed 3-block cycle puts a complex-conjugate pair in the top-3
    spectrum (routine for non-reversible WE matrices); the Re/Im invariant-
    subspace basis must still recover the blocks exactly."""
    from msm_we_tpu.ops.linalg import pcca_sets

    rng = np.random.default_rng(7)
    blocks = [np.arange(0, 3), np.arange(3, 6), np.arange(6, 9)]
    T = np.zeros((9, 9))
    for bi, b in enumerate(blocks):
        T[np.ix_(b, b)] = (rng.random((3, 3)) + 1.0) * 0.9
        nxt = blocks[(bi + 1) % 3]
        T[np.ix_(b, nxt)] = (rng.random((3, 3)) + 0.5) * 0.02
    T /= T.sum(axis=1, keepdims=True)

    evals = np.linalg.eigvals(T)
    top3 = evals[np.argsort(-np.real(evals))[:3]]
    assert np.abs(top3.imag).max() > 1e-6  # the pair is really in the top 3

    sets = pcca_sets(T, 3)
    assert sorted(tuple(sorted(s)) for s in sets) == sorted(
        tuple(b) for b in blocks
    )


def test_get_ck_test_rejects_bool_sets(built_model):
    with pytest.raises(ValueError):
        built_model.get_ck_test(lags=(0, 1), sets=True)
