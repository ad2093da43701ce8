"""Numerical parity against the reference's NTL9 golden arrays.

These tests feed the reference's golden flux matrix directly into our
analysis tail and optimization module and require bit-level-close agreement
with the golden tmatrix/pSS/JtargetSS/discrepancy/variance arrays -- the
acceptance criterion of SURVEY.md section 7 step 3 ("analysis tail first"),
with no clustering in the loop.

Skipped when the reference checkout isn't mounted.
"""
import os

import numpy as np
import pytest

GOLDEN_DIR = "/root/reference/tests/reference/1000ns_ntl9/models"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="reference goldens not available"
)


@pytest.fixture(scope="module")
def goldens():
    load = lambda name: np.load(os.path.join(GOLDEN_DIR, name + ".npy"))  # noqa: E731
    g = {
        name: load(name)
        for name in [
            "fluxmatrix",
            "tmatrix",
            "pSS",
            "JtargetSS",
            "discrepancy",
            "variance",
            "optimized_clustered_bins",
        ]
    }
    n = g["fluxmatrix"].shape[0]
    g["n"] = n
    g["ind_basis"] = [n - 2]
    g["ind_targets"] = [n - 1]
    # NTL9 set: tau = 1 ns -> JtargetSS in 1/s
    g["lagtime"] = 1e-9
    return g


def test_tmatrix_parity(goldens):
    from msm_we_tpu.ops import linalg

    T = linalg.tmatrix_from_flux(
        goldens["fluxmatrix"], goldens["ind_targets"], goldens["ind_basis"], goldens["n"]
    )
    assert np.allclose(T, goldens["tmatrix"], atol=1e-14)


def test_steady_state_parity(goldens):
    from msm_we_tpu.ops import linalg

    pSS, flux = linalg.steady_state_refined(
        goldens["tmatrix"],
        goldens["ind_targets"],
        goldens["ind_basis"],
        goldens["n"],
        goldens["lagtime"],
    )
    assert np.allclose(pSS, goldens["pSS"], atol=1e-12)
    assert np.isclose(flux, float(goldens["JtargetSS"]), rtol=1e-8)


def test_target_flux_parity(goldens):
    from msm_we_tpu.ops import linalg

    J = linalg.target_flux(
        goldens["tmatrix"],
        goldens["pSS"],
        goldens["ind_targets"],
        goldens["n"],
        goldens["lagtime"],
    )
    assert np.isclose(J, float(goldens["JtargetSS"]), rtol=1e-12)


def test_discrepancy_parity(goldens):
    from msm_we_tpu import optimization

    discrepancy, variance = optimization.solve_discrepancy(
        tmatrix=goldens["tmatrix"], pi=goldens["pSS"], B=goldens["ind_targets"]
    )
    assert np.allclose(discrepancy, goldens["discrepancy"])
    assert np.allclose(variance, goldens["variance"])


def test_clustered_mfpt_bins_parity(goldens):
    """Partition similarity with the golden (bitwise parity is impossible:
    the golden was generated with sklearn < 1.1, whose seeded KMeans differs
    from modern sklearn), plus determinism of our own result."""
    from sklearn.metrics import adjusted_rand_score

    from msm_we_tpu import optimization

    args = (
        goldens["variance"][:-2],
        goldens["discrepancy"][:-2],
        goldens["pSS"][:-2],
    )
    optimized_bins = optimization.get_clustered_mfpt_bins(
        *args, n_desired_we_bins=11, seed=42
    )
    assert len(optimized_bins) == goldens["n"] - 2
    ari = adjusted_rand_score(
        goldens["optimized_clustered_bins"].astype(int), optimized_bins.astype(int)
    )
    assert ari > 0.85, f"Partition too different from golden (ARI={ari:.3f})"

    again = optimization.get_clustered_mfpt_bins(*args, n_desired_we_bins=11, seed=42)
    assert np.allclose(optimized_bins, again), "Seeded binning is not deterministic"


def test_cleaning_scc_selection():
    """The cleaning step's connected-set selection reproduces the reference's
    302 -> 194 state reduction on the raw NTL9 flux matrix (the acceptance
    criterion of SURVEY.md section 7 hard-part 5; re-discretization itself
    needs the full h5 inputs, which the reference mirror doesn't ship)."""
    raw = np.load(os.path.join(GOLDEN_DIR, "fluxmatrix_raw.npy"))
    from msm_we_tpu.utils import find_connected_sets

    f = raw.copy()
    f[-1, -2] = 1.0  # artificial target->basis recycle edge
    sets = find_connected_sets(f, directed=True)
    assert len(sets[0]) == 194
    assert raw.shape[0] - sum(len(s) for s in sets[1:]) == 194
    # Basis (300) and target (301) are in the surviving set
    assert 300 in sets[0] and 301 in sets[0]


def test_uniform_mfpt_bins(goldens):
    from msm_we_tpu import optimization

    bins = optimization.get_uniform_mfpt_bins(
        goldens["variance"][:-2],
        goldens["discrepancy"][:-2],
        goldens["pSS"][:-2],
        n_desired_we_bins=11,
    )
    assert len(bins) == goldens["n"] - 2
    assert bins.min() >= 0 and bins.max() <= 8
