"""Tier-1 golden tests for the matrix FPT engines.

Golden values are exact mathematical outcomes for the seeded random stochastic
matrix, matching the reference test suite (tests/test_fpt.py there) -- they are
portable specifications of the math, independent of implementation.
"""
import numpy as np

import msm_we_tpu.utils as utils
from msm_we_tpu.msm.fpt import MarkovFPT, MatrixFPT


def _seeded_matrix():
    return utils.random_markov_matrix(5, seed=1)


def test_markov_fpt_mean():
    markov_mfpts = MarkovFPT.mean_fpts(_seeded_matrix(), [0], [4])
    assert np.isclose(markov_mfpts["mfptAB"], 6.420918178038423)
    assert np.isclose(markov_mfpts["mfptBA"], 4.920174169581114)


def test_matrix_fpt_directional():
    directional_mfpt = MatrixFPT.directional_mfpt(_seeded_matrix(), [0], [4], [1])
    assert np.isclose(directional_mfpt, 6.420918178038424)


def test_matrix_fpt_to_target_microstate():
    mfpts_to_micro = MatrixFPT.mfpts_to_target_microstate(_seeded_matrix(), 4)
    result = np.array([6.42091818, 5.35994556, 7.24671735, 6.81752892, 0.0])
    assert np.allclose(mfpts_to_micro, result)


def test_matrix_fpt_matrix():
    mfpts_matrix = MatrixFPT.mfpts_matrix(_seeded_matrix())
    result = np.array(
        [
            [0.0, 2.62899481, 7.65074814, 4.37254081, 6.42091818],
            [5.58481382, 0.0, 6.21851058, 4.00702426, 5.35994556],
            [4.98545579, 3.15239528, 0.0, 3.43921253, 7.24671735],
            [4.37802054, 3.33697554, 6.03713191, 0.0, 6.81752892],
            [4.92017417, 3.26320798, 7.20000135, 4.36442835, 0.0],
        ]
    )
    assert np.allclose(mfpts_matrix, result)


def test_min_commute_time():
    mfpts_matrix = MatrixFPT.mfpts_matrix(_seeded_matrix())
    min_comm_time, a, b = MatrixFPT.min_commute_time(mfpts_matrix)
    assert np.isclose(min_comm_time, 7.343999799826479)
    assert a == 1
    assert b == 3


def test_max_commute_time():
    mfpts_matrix = MatrixFPT.mfpts_matrix(_seeded_matrix())
    max_comm_time, a, b = MatrixFPT.max_commute_time(mfpts_matrix)
    assert np.isclose(max_comm_time, 14.446718700939037)
    assert a == 2
    assert b == 4


def test_fpt_distribution():
    fpt_distribution = MatrixFPT.fpt_distribution(
        _seeded_matrix(), [0], [4], [0.5], max_n_lags=10
    )
    result = [
        [0.0, 0.0],
        [1.0, 0.11289507],
        [2.0, 0.24431041],
        [3.0, 0.13232006],
        [4.0, 0.11478687],
        [5.0, 0.0968178],
        [6.0, 0.08185738],
        [7.0, 0.06886433],
        [8.0, 0.05804509],
        [9.0, 0.04890027],
        [10.0, 0.04120272],
    ]
    assert np.allclose(fpt_distribution, result)


def test_fpt_distribution_log():
    fpt_distribution = MatrixFPT.fpt_distribution(
        _seeded_matrix(),
        [0],
        [4],
        [0.5],
        max_n_lags=10,
        clean_recycling=True,
        logscale=True,
    )
    result = [
        [0.00000000e000, 0.00000000e000],
        [1.00000000e001, 1.00000000e000],
        [1.66000000e002, 3.85697122e-011],
        [2.78200000e003, 1.48701736e-204],
        [4.64150000e004, 0.00000000e000],
        [7.74263000e005, 0.00000000e000],
        [1.29154960e007, 0.00000000e000],
        [2.15443469e008, 0.00000000e000],
        [3.59381366e009, 0.00000000e000],
        [5.99484250e010, 0.00000000e000],
        [1.00000000e012, 0.00000000e000],
    ]
    assert np.allclose(fpt_distribution, result)


def _random_metastable(n, seed=0):
    rng = np.random.default_rng(seed)
    T = rng.random((n, n)) * 0.05 + np.diag(rng.random(n) * 10 + 1)
    return T / T.sum(axis=1, keepdims=True)


def test_fpt_distribution_device_engine_matches_host():
    """engine="device" (one jitted bit-basis recursion, f32 tier) must
    match the f64 host engine to f32-roundoff at every readout."""
    T = _random_metastable(60, seed=3)
    ini, fin, w = [0, 7, 11], [40, 41], [0.5, 0.3, 0.2]
    host = MatrixFPT.fpt_distribution(T, ini, fin, w, max_n_lags=25)
    dev = MatrixFPT.fpt_distribution(
        T, ini, fin, w, max_n_lags=25, engine="device"
    )
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=1e-7)


def test_fpt_distribution_device_engine_logscale():
    T = _random_metastable(40, seed=9)
    kwargs = dict(
        min_power=1, max_power=3, max_n_lags=12, clean_recycling=True,
        logscale=True,
    )
    host = MatrixFPT.fpt_distribution(T, [0, 2], [30], [0.7, 0.3], **kwargs)
    dev = MatrixFPT.fpt_distribution(
        T, [0, 2], [30], [0.7, 0.3], engine="device", **kwargs
    )
    np.testing.assert_allclose(dev, host, rtol=5e-4, atol=1e-7)


def test_fpt_distribution_engine_validation():
    import pytest

    with pytest.raises(ValueError, match="engine"):
        MatrixFPT.fpt_distribution(
            _seeded_matrix(), [0], [4], [0.5], max_n_lags=5, engine="gpu"
        )


def test_device_vector_powers_match_matrix_power():
    from msm_we_tpu.msm.fpt import _DeviceVectorPowers

    T = _random_metastable(50, seed=4)
    # Absorbing targets, as the adaptive sweep builds them
    T[48:, :] = 0.0
    T[48, 48] = T[49, 49] = 1.0
    v0 = np.zeros(50)
    v0[:3] = [0.5, 0.3, 0.2]
    probs = _DeviceVectorPowers(T, v0)
    for step in (0, 1, 2, 5, 17, 64, 1000, 12345):
        want = v0 @ np.linalg.matrix_power(T, step)
        got = probs(step)
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-7), step


def test_adaptive_fpt_device_engine_matches_host():
    T = _random_metastable(40, seed=6)
    args = (T, [0, 1], [0.6, 0.4], [38, 39])
    kwargs = dict(max_steps=300, max_time=1e6)
    h_probs, h_all, h_i, h_times = MatrixFPT.adaptive_fpt_distribution(
        *args, **kwargs
    )
    d_probs, d_all, d_i, d_times = MatrixFPT.adaptive_fpt_distribution(
        *args, engine="device", **kwargs
    )
    # The schedule is data-dependent; on this well-separated fixture the
    # f32 arrivals pick the same refinement point, so schedules (and thus
    # the sampled distribution) must coincide
    np.testing.assert_array_equal(d_times, h_times)
    np.testing.assert_allclose(d_probs, h_probs, rtol=1e-3, atol=1e-6)
    assert d_i == h_i
    np.testing.assert_allclose(
        np.nansum(d_all[-1]), np.nansum(h_all[-1]), rtol=1e-4
    )


def test_adaptive_fpt_device_engine_rejects_renormalization():
    import pytest

    T = _random_metastable(10, seed=1)
    with pytest.raises(ValueError, match="renormaliz"):
        MatrixFPT.adaptive_fpt_distribution(
            T, [0], [1.0], [9], engine="device",
            explicit_renormalization=True,
        )
