"""Tier-1 golden tests for trajectory ensembles (seeded MC trajectories)."""
import numpy as np
import pytest

from msm_we_tpu.msm.ensembles import DiscretePathEnsemble, Ensemble, PathEnsemble
from msm_we_tpu.utils import Interval


def mc_simulation(numsteps):
    x = 5
    int_1d = Interval([0, 100], 1)
    mc_traj = []
    for _ in range(numsteps):
        dx = np.random.uniform(-10, 10)
        if (x + dx) in int_1d:
            x = x + dx
        mc_traj.append(x)
    return np.array(mc_traj)


def simple_mapping(x):
    return int(x / 10)


@pytest.fixture(scope="module")
def setup():
    np.random.seed(192348)
    t0 = mc_simulation(10000)
    t1 = mc_simulation(10000)
    t2 = mc_simulation(10000)
    stateA = [0, 10]
    stateB = [90, 100]
    ensemble0 = Ensemble([t0], verbose=True)
    ensemble2 = Ensemble([t1], verbose=True)
    ensemble2.add_trajectory(t2)
    ensemble_tot = ensemble0 + ensemble2
    K = ensemble_tot._mle_transition_matrix(n_states=10, map_function=simple_mapping)
    return dict(
        ensemble0=ensemble0, ensemble_tot=ensemble_tot, K=K, stateA=stateA, stateB=stateB
    )


def test_ensemble(setup):
    result = setup["ensemble0"].empirical_mfpts(setup["stateA"], setup["stateB"])
    expected = {
        "mfptAB": 220.38095238095238,
        "std_err_mfptAB": 32.381265838152025,
        "mfptBA": 255.57142857142858,
        "std_err_mfptBA": 36.77686417987655,
    }
    for key, val in expected.items():
        assert np.isclose(result[key], val), key

    assert len(setup["ensemble_tot"]) == 3
    assert np.array(setup["ensemble_tot"].trajectories).shape == (3, 10000)

    result = setup["ensemble_tot"].empirical_mfpts(setup["stateA"], setup["stateB"])
    expected = {
        "mfptAB": 197.28125,
        "std_err_mfptAB": 18.417726005823464,
        "mfptBA": 271.5079365079365,
        "std_err_mfptBA": 26.119151297618238,
    }
    for key, val in expected.items():
        assert np.isclose(result[key], val), key


def test_path_ensemble(setup):
    pathE = PathEnsemble.from_ensemble(
        setup["ensemble_tot"], setup["stateA"], setup["stateB"]
    )
    result = pathE.empirical_mfpts(setup["stateA"], setup["stateB"])
    assert np.isclose(result["mfptAB"], 197.28125)
    assert np.isclose(result["std_err_mfptAB"], 18.417726005823464)
    assert result["mfptBA"] == "NaN"
    assert result["std_err_mfptBA"] == "NaN"


def test_discrete_path_ensemble(setup):
    stateA = [0]
    stateB = [9]
    dpathEnsemble = DiscretePathEnsemble.from_transition_matrix(
        setup["K"], stateA=stateA, stateB=stateB, n_paths=5, ini_pops=[1]
    )
    result = dpathEnsemble.empirical_mfpts(stateA, stateB)
    assert np.isclose(result["mfptAB"], 158.0)
    assert np.isclose(result["std_err_mfptAB"], 41.22814572594794)
    assert result["mfptBA"] == "NaN"

    dpathEnsemble = DiscretePathEnsemble.from_ensemble(
        setup["ensemble_tot"], stateA, stateB, map_function=simple_mapping
    )
    result = dpathEnsemble.empirical_mfpts(stateA, stateB)
    assert np.isclose(result["mfptAB"], 197.28125)
    assert np.isclose(result["std_err_mfptAB"], 18.417726005823464)
    assert result["mfptBA"] == "NaN"


def test_from_transition_matrix_ss_ini_pops():
    """ini_pops='ss' (declared but unimplemented in the reference) draws
    initial states from the stationary distribution restricted to A."""
    import numpy as np

    from msm_we_tpu.msm.ensembles import DiscretePathEnsemble

    np.random.seed(0)
    T = np.array(
        [
            [0.6, 0.3, 0.1, 0.0],
            [0.2, 0.5, 0.3, 0.0],
            [0.0, 0.3, 0.5, 0.2],
            [0.5, 0.0, 0.0, 0.5],
        ]
    )
    dpe = DiscretePathEnsemble.from_transition_matrix(
        T, stateA=[0, 1], stateB=[3], n_paths=40, ini_pops="ss"
    )
    assert len(dpe.trajectories) == 40
    for path in dpe.trajectories:
        assert path[0] in (0, 1)
        assert path[-1] == 3
