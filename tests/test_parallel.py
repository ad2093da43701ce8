"""Multi-device tests on the virtual 8-device CPU mesh.

Checks that the (data, model)-sharded discretize+flux step produces exactly
the same flux matrix as the single-device fused step and the host reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msm_we_tpu.parallel import (
    build_sharded_step,
    fused_step_single,
    make_mesh,
    steady_state_from_flux,
)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    N, d, n_bins, k = 256, 8, 4, 4
    K = n_bins * k
    X_p = rng.normal(size=(N, d)).astype(np.float32)
    X_c = rng.normal(size=(N, d)).astype(np.float32)
    pbins = rng.integers(0, n_bins, N).astype(np.int32)
    cbins = rng.integers(0, n_bins, N).astype(np.int32)
    w = rng.random(N).astype(np.float32)
    basis_p = rng.random(N) < 0.1
    basis_c = rng.random(N) < 0.05
    target_c = rng.random(N) < 0.05
    centers = rng.normal(size=(K, d)).astype(np.float32)
    center_bin = np.repeat(np.arange(n_bins, dtype=np.int32), k)
    holey = rng.random(K) < 0.9  # simulate cleaned-away centers
    # Compact bank (the kernel contract): valid centers first, in
    # global-id order, so the argmin row IS the global cluster id
    rows = np.flatnonzero(holey)
    centers = centers[rows]
    center_bin = center_bin[rows]
    valid = np.ones(len(rows), bool)
    n_states = len(rows) + 2
    return dict(
        fp=X_p, fc=X_c, pbins=pbins, cbins=cbins,
        basis_p=basis_p, basis_c=basis_c, target_c=target_c, w=w,
        centers=centers, center_bin=center_bin, valid=valid,
        n_states=n_states,
    )


def _host_reference(p):
    """Brute-force numpy version of the fused step."""
    def assign(X, bins):
        d2 = ((X[:, None, :] - p["centers"][None]) ** 2).sum(-1)
        ok = p["valid"][None, :] & (p["center_bin"][None, :] == bins[:, None])
        d2[~ok] = np.inf
        return d2.argmin(1)  # compact bank: row == global id

    pidx = assign(p["fp"], p["pbins"])
    cidx = assign(p["fc"], p["cbins"])
    n = p["n_states"]
    cidx = np.where(p["target_c"], n - 1, cidx)
    pidx = np.where(p["basis_p"], n - 2, pidx)
    cidx = np.where(p["basis_c"], n - 2, cidx)
    fm = np.zeros((n, n))
    np.add.at(fm, (pidx, cidx), p["w"])
    return fm


def test_single_device_fused_matches_host(problem):
    p = problem
    fm, _, _ = fused_step_single(
        p["fp"], p["fc"], p["pbins"], p["cbins"],
        p["basis_p"], p["basis_c"], p["target_c"], p["w"],
        p["centers"], p["center_bin"], p["valid"],
        p["n_states"],
    )
    assert np.allclose(np.asarray(fm), _host_reference(p), atol=1e-5)


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_sharded_matches_single(problem, model_parallel):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    p = problem
    mesh = make_mesh(jax.devices()[:8], model_parallel=model_parallel)
    step = build_sharded_step(mesh, p["n_states"], n_bins=int(p["center_bin"].max()) + 1)
    # Pad the center bank so it divides the model axis
    K = len(p["centers"])
    mp = model_parallel
    pad = (-K) % mp
    centers = np.concatenate([p["centers"], np.zeros((pad, p["centers"].shape[1]), np.float32)])
    center_bin = np.concatenate([p["center_bin"], np.full(pad, -2, np.int32)])
    valid = np.concatenate([p["valid"], np.zeros(pad, bool)])

    fm = step(
        p["fp"], p["fc"], p["pbins"], p["cbins"],
        p["basis_p"], p["basis_c"], p["target_c"], p["w"],
        centers, center_bin, valid,
    )
    assert np.allclose(np.asarray(fm), _host_reference(p), atol=1e-5)


def test_steady_state_from_flux(problem):
    p = problem
    fm = jnp.asarray(_host_reference(p), jnp.float32)
    n = p["n_states"]
    basis_mask = jnp.arange(n) == n - 2
    target_mask = jnp.arange(n) == n - 1
    T, pss, flux, residual = steady_state_from_flux(fm, basis_mask, target_mask)
    assert np.allclose(np.asarray(T).sum(1), 1.0, atol=1e-5)
    assert np.isclose(float(np.asarray(pss).sum()), 1.0, atol=1e-5)
    assert float(flux) >= 0
    assert float(residual) < 1e-5


def test_multihost_style_ingest():
    """Per-'host' local shards assembled via make_array_from_single_device_
    arrays must produce the identical flux matrix to the single-array path
    (the multi-host ingest boundary, docs/multihost.md)."""
    import os
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    import __graft_entry__ as graft

    graft.dryrun_multihost(8)


def test_steady_state_slow_mixing_converges():
    """A nearly-reducible chain (mixing time >> the fixed 512 powers) must
    still converge: the residual-checked while_loop keeps squaring
    (round-2 VERDICT item 6)."""
    eps = 1e-5
    fm = np.array(
        [
            [0.5, 0.5, eps, 0.0],
            [0.5, 0.5, 0.0, 0.0],
            [0.0, 0.0, 0.5, 0.5],
            [3 * eps, 0.0, 0.5, 0.5],
        ],
        np.float32,
    )
    basis_mask = jnp.zeros(4, bool)
    target_mask = jnp.zeros(4, bool)
    # Without the residual-checked extension, 512 powers leave the chain
    # unconverged: the one-step residual scales with gap * deviation, so it
    # is small in absolute terms but still above tol -- which is exactly
    # what triggers the extension loop.
    _T0, _p0, _f0, residual_fixed = steady_state_from_flux(
        fm, basis_mask, target_mask, max_extra_squarings=0
    )
    assert float(residual_fixed) > 5e-6
    # ...with it, the tail converges to tol.
    T, pss, _flux, residual = steady_state_from_flux(
        fm, basis_mask, target_mask
    )
    assert float(residual) < 1e-6
    # Cross-check against a dense f64 eigensolve of the same T. The
    # achievable accuracy is gap-limited (|err| ~ residual / spectral gap;
    # the gap here is ~2e-5), so the bound is loose but still far tighter
    # than the unconverged fixed-power answer.
    Th = np.asarray(T, np.float64)
    vals, vecs = np.linalg.eig(Th.T)
    p_ref = np.real(vecs[:, np.argmax(np.real(vals))])
    p_ref = np.abs(p_ref) / np.abs(p_ref).sum()
    assert np.allclose(np.asarray(pss), p_ref, atol=0.05)
    err_converged = np.abs(np.asarray(pss) - p_ref).max()
    err_fixed = np.abs(np.asarray(_p0) - p_ref).max()
    assert err_converged < err_fixed / 3
