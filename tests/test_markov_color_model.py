"""Tier-1 golden tests for the Markov-plus-color model (seeded trajectory)."""
import numpy as np

from msm_we_tpu.msm.nmm import MarkovPlusColorModel


def _model():
    np.random.seed(192348)
    trajectories = [np.random.randint(0, 3, 100000)]
    return MarkovPlusColorModel(
        trajectories,
        stateA=[0],
        stateB=[2],
        clean_traj=False,
        sliding_window=True,
        lag_time=1,
    )


def test_transition_matrix():
    nmm_tmatrix = np.array(
        [
            [0.33355320, 0.0, 0.33412287, 0.0, 0.0, 0.33232393],
            [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            [0.33502155, 0.0, 0.32667089, 0.0, 0.0, 0.33830756],
            [0.33502155, 0.0, 0.0, 0.32667089, 0.0, 0.33830756],
            [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            [0.33203883, 0.0, 0.0, 0.33430919, 0.0, 0.33365198],
        ]
    )
    assert np.allclose(nmm_tmatrix, _model().nm_tmatrix)


def test_mfpts():
    mean_fpts = _model().mfpts()
    assert np.isclose(mean_fpts["mfptAB"], 2.991249925379562)
    assert np.isclose(mean_fpts["mfptBA"], 3.0027466707370256)


def test_empirical_mfpts():
    expected = {
        "mfptAB": 2.9808209356515505,
        "std_err_mfptAB": 0.018764714746890707,
        "mfptBA": 2.9939057178705863,
        "std_err_mfptBA": 0.01875220558579723,
    }
    result = _model().empirical_mfpts()
    for key, val in expected.items():
        assert np.isclose(result[key], val), key
