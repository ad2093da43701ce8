"""Tier-1 golden tests for the colored non-Markov model (seeded trajectory)."""
import numpy as np

from msm_we_tpu.msm.nmm import NonMarkovModel


def _model():
    np.random.seed(192348)
    trajectories = [np.random.randint(0, 3, 100000)]
    return NonMarkovModel(
        trajectories,
        stateA=[0],
        stateB=[2],
        clean_traj=False,
        sliding_window=True,
        lag_time=100,
    )


def test_transition_matrix():
    nmm_tmatrix = np.array(
        [
            [0.33380383, 0.0, 0.33455463, 0.0, 0.0, 0.33164154],
            [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            [0.33983051, 0.0, 0.32717918, 0.0, 0.0, 0.33299031],
            [0.32879530, 0.0, 0.0, 0.33194167, 0.0, 0.33926302],
            [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            [0.33247538, 0.0, 0.0, 0.33109867, 0.0, 0.33642594],
        ]
    )
    assert np.allclose(nmm_tmatrix, _model().nm_tmatrix)


def test_mfpts():
    mean_fpts = _model().mfpts()
    assert np.isclose(mean_fpts["mfptAB"], 301.1236654158612)
    assert np.isclose(mean_fpts["mfptBA"], 301.88142788292384)


def test_empirical_mfpts():
    expected = {
        "mfptAB": 312.34567901234567,
        "std_err_mfptAB": 19.4177836447053,
        "mfptBA": 306.2111801242236,
        "std_err_mfptBA": 19.75290907085678,
    }
    result = _model().empirical_mfpts()
    assert np.isclose(result["mfptAB"], expected["mfptAB"])
    assert np.isclose(result["std_err_mfptAB"], expected["std_err_mfptAB"])
    assert np.isclose(result["mfptBA"], expected["mfptBA"])
    assert np.isclose(result["std_err_mfptBA"], expected["std_err_mfptBA"])


def test_populations():
    populations = np.array([0.33352775, 0.33174116, 0.3347311])
    assert np.allclose(populations, _model().populations())
