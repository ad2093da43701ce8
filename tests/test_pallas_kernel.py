"""The fused Pallas assign+flux kernel must agree exactly with the jnp path
(interpret mode on CPU; the driver exercises compiled mode on TPU)."""
import numpy as np
import pytest

from msm_we_tpu.ops.pallas_kernels import fused_assign_flux, pallas_available
from msm_we_tpu.parallel.sharded import fused_step_single

pytestmark = pytest.mark.skipif(not pallas_available(), reason="pallas missing")


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    N, d, n_bins, k = 500, 11, 5, 3
    K = n_bins * k
    valid = rng.random(K) < 0.85
    gid = np.full(K, -1, np.int64)
    gid[valid] = np.arange(valid.sum())
    return dict(
        fp=rng.normal(size=(N, d)).astype(np.float32),
        fc=rng.normal(size=(N, d)).astype(np.float32),
        pbins=rng.integers(0, n_bins, N).astype(np.int32),
        cbins=rng.integers(0, n_bins, N).astype(np.int32),
        w=rng.random(N).astype(np.float32),
        basis_p=(rng.random(N) < 0.1),
        basis_c=(rng.random(N) < 0.05),
        target_c=(rng.random(N) < 0.05),
        centers=rng.normal(size=(K, d)).astype(np.float32),
        center_bin=np.repeat(np.arange(n_bins, dtype=np.int32), k),
        valid=valid,
        global_id=gid,
        n_states=int(valid.sum()) + 2,
    )


def test_fused_kernel_matches_jnp(problem):
    p = problem
    fm_ref, pidx_ref, cidx_ref = fused_step_single(
        p["fp"], p["fc"], p["pbins"], p["cbins"],
        p["basis_p"], p["basis_c"], p["target_c"], p["w"],
        p["centers"], p["center_bin"], p["valid"], p["global_id"],
        p["n_states"],
    )
    pidx, cidx, fm = fused_assign_flux(
        p["fp"], p["fc"], p["pbins"], p["cbins"], p["w"],
        p["basis_p"], p["basis_c"], p["target_c"],
        p["centers"], p["center_bin"], p["valid"], p["global_id"],
        p["n_states"], tile=128,
    )
    assert np.array_equal(pidx, np.asarray(pidx_ref))
    assert np.array_equal(cidx, np.asarray(cidx_ref))
    assert np.allclose(fm, np.asarray(fm_ref), atol=1e-5)
