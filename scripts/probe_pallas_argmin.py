#!/usr/bin/env python
"""Measure the Pallas in-tile argmin epilogue against the XLA assignment
(VERDICT round-3 item 4) at bench shapes on the real TPU.

Variants, each timed with bench.py's methodology (inner_reps steps inside one
jit with a loop-carried perturbation, minus the measured no-op dispatch RTT):

* ``xla_dedup_full``  -- the production dedup tier (transform + gather +
  pair assign + flux + steady state), the 2.05 ms / SoL 0.37 step.
* ``xla_child_ids``   -- XLA transform + child-only masked assign, ids out
  (the (N, K) scores materialize to HBM between GEMM and argmin).
* ``pallas_child_ids[_tile]`` -- ops.pallas_kernels child kernel: same math,
  scores live and die in VMEM (argmin epilogue in-tile).
* ``pallas_child_ids_feats`` -- same, also emitting the (N, F) features the
  dedup parent gather consumes.
* ``ss_only``         -- the steady-state solve alone (sizes the non-
  assignment tail of the full step).

Prints one JSON line. Pallas/Mosaic compiles go through the remote AOT
service (minutes per new shape) -- run in background.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench

INNER = 25


def measure(step_fn, args, result_index=0):
    import jax

    out = step_fn(*args)
    np.asarray(jax.tree.leaves(out)[result_index])  # drain compile + run

    @jax.jit
    def _noop(x):
        return x + 1.0

    dummy = jax.device_put(np.zeros((256, 256), np.float32))
    np.asarray(_noop(dummy))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(_noop(dummy))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = step_fn(*args)
        np.asarray(jax.tree.leaves(out)[result_index])
        times.append(time.perf_counter() - t0)
    return max(min(times) - rtt, 1e-9) / INNER, out


def main():
    import jax
    import jax.numpy as jnp

    from msm_we_tpu.ops.kmeans import masked_assign
    from msm_we_tpu.ops.pallas_kernels import (
        _col,
        _pad2,
        _round_up,
        _transform_assign_child_call,
    )

    p = bench.make_problem()
    N = len(p["raw_child"])
    D = p["raw_child"].shape[1]
    F = p["comp"].shape[1]
    K = len(p["centers"])
    n_states = p["n_states"]
    prec = jax.lax.Precision.HIGHEST
    results = {"n_segments": N, "raw_dim": D, "n_components": F, "K": K}

    # ---------------- baseline: the full XLA dedup step
    step_dd, args_dd = bench.device_pipeline(p, inner_reps=INNER, dedup=True)
    args_dd = tuple(jax.device_put(a) for a in args_dd)
    t, _ = measure(step_dd, args_dd)
    results["xla_dedup_full_ms"] = round(t * 1e3, 3)

    # ---------------- steady-state tail alone
    from msm_we_tpu.parallel.sharded import steady_state_from_flux

    fm0 = np.abs(np.random.default_rng(0).normal(size=(n_states, n_states))).astype(
        np.float32
    )
    basis_mask = np.arange(n_states) == n_states - 2
    target_mask = np.arange(n_states) == n_states - 1

    @jax.jit
    def ss_step(fm):
        def body(_i, carry):
            _T, pss, flux, _res = carry
            return steady_state_from_flux(
                fm + flux * 1e-30, jnp.asarray(basis_mask), jnp.asarray(target_mask)
            )

        init = steady_state_from_flux(
            fm, jnp.asarray(basis_mask), jnp.asarray(target_mask)
        )
        return jax.lax.fori_loop(0, INNER - 1, body, init)

    t, _ = measure(ss_step, (jax.device_put(fm0),), result_index=1)
    results["ss_only_ms"] = round(t * 1e3, 3)

    # ---------------- XLA child-only ids (scores materialize in HBM)
    offset_np = p["mean"] @ p["comp"]

    @jax.jit
    def xla_child(raw_c, comp, offset, cbins, basis_c, target_c,
                  centers, center_bin, valid):
        def one(comp_i):
            fc = jnp.matmul(raw_c, comp_i, precision=prec) - offset[None, :]
            # n_bins static: the bin mask folds INTO the GEMM (the
            # production formula, ops/kmeans.masked_scores)
            idx = masked_assign(
                fc, cbins, centers, center_bin, valid,
                n_bins=int(p["center_bin"].max()) + 1,
            )
            idx = jnp.where(target_c, n_states - 1, idx)
            idx = jnp.where(basis_c, n_states - 2, idx)
            return idx

        def body(_i, carry):
            return one(comp + carry.sum().astype(jnp.float32) * 1e-30)

        return jax.lax.fori_loop(0, INNER - 1, body, one(comp))

    xla_args = tuple(
        jax.device_put(a)
        for a in (
            p["raw_child"], p["comp"], offset_np.astype(np.float32),
            p["cbins"], p["basis_c"], p["target_c"],
            p["centers"], p["center_bin"], p["valid"],
        )
    )
    t, idx_xla = measure(xla_child, xla_args)
    results["xla_child_ids_ms"] = round(t * 1e3, 3)

    # ---------------- Pallas child kernel, padded once on the host
    bias = p["mean"].astype(np.float32) @ p["comp"]
    c2adj = (p["centers"] * p["centers"]).sum(1) + 2.0 * p["centers"] @ bias
    D_pad = _round_up(D, 128)
    F_pad = _round_up(F, 128)
    K_pad = _round_up(K, 128)

    idx_ref = np.asarray(idx_xla)
    best = None
    for tile in (256, 512, 1024):
        N_pad = _round_up(N, tile)
        dev_args = tuple(
            jax.device_put(a)
            for a in (
                _pad2(p["raw_child"], N_pad, D_pad),
                _col(p["cbins"], N_pad, fill=-1),
                _col(p["basis_c"].astype(np.int32), N_pad),
                _col(p["target_c"].astype(np.int32), N_pad),
                _pad2(p["comp"], D_pad, F_pad),
                _pad2(p["centers"], K_pad, F_pad).T.copy(),
                _col(c2adj, K_pad, fill=0.0, dtype=np.float32),
                _col(p["center_bin"], K_pad, fill=-2),
                _col(p["valid"].astype(np.int32), K_pad),
            )
        )

        for emit in ((False, True) if tile == 512 else (False,)):
            @jax.jit
            def pallas_step(raw, bins, basis, target, proj, cT, c2a, cb, vd,
                            _tile=tile, _emit=emit):
                def one(proj_i):
                    idx, feats = _transform_assign_child_call(
                        raw, bins, basis, target, proj_i, cT, c2a, cb, vd,
                        n_states=n_states, tile=_tile, interpret=False,
                        precision=prec, emit_features=_emit,
                    )
                    return idx

                def body(_i, carry):
                    return one(proj + carry.sum().astype(jnp.float32) * 1e-30)

                return jax.lax.fori_loop(0, INNER - 1, body, one(proj))

            label = f"pallas_child_ids{'_feats' if emit else ''}_t{tile}"
            try:
                t, idx_pl = measure(pallas_step, dev_args)
            except Exception as e:  # Mosaic compile failures are data too
                results[label] = f"FAILED: {type(e).__name__}: {e}"[:300]
                continue
            results[label + "_ms"] = round(t * 1e3, 3)
            # Agreement fraction, not strict equality: the kernel folds the
            # centering bias into c2adj (score = c2adj - 2 g.c) while XLA
            # scores centered features (|c|^2 - 2 x.c) -- identical argmins
            # except f32 rounding on near-equidistant centers
            agree = float(
                np.mean(np.asarray(idx_pl)[:N] == idx_ref)
            )
            results[label + "_ids_agree_frac"] = round(agree, 6)
            if not emit and (best is None or t < best):
                best = t

    if best is not None:
        results["pallas_best_ms"] = round(best * 1e3, 3)
        results["pallas_vs_xla_child"] = round(
            results["xla_child_ids_ms"] / results["pallas_best_ms"], 3
        )
    results["backend"] = jax.default_backend()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
