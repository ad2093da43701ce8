"""Benchmark: stratified discretization + flux-matrix build throughput.

Measures the framework's hot path -- PCA transform -> stratified cluster
assignment -> weighted flux-matrix accumulation -> steady state -- on an
NTL9-scale problem (~100k WE segments, 250 stratified cluster centers across
10 WE bins; the reference regression set is 100 iters / 300 clusters,
``tests/fixtures/hamsms.py:63-72`` there).

Baseline: the reference's hottest loop is one sklearn ``predict([coord])``
call per frame inside ``StratifiedClusters.predict``
(``stratified_clustering.py:152-203``), plus per-iteration scipy coo_matrix
summation. That per-frame path is timed here on a subsample and scaled
linearly (it is strictly O(N) Python) to get the baseline wall-clock.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

import numpy as np

# Persistent XLA compile cache: repeat bench runs skip the (remote) compile.
# Min compile time 0: on remote-AOT backends the locally-measured compile
# time can be tiny even when the wall wait was minutes, which would skip
# caching exactly the entries that matter.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/msm_we_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def make_problem(n_segments=102_400, n_raw_features=48, n_components=8,
                 n_bins=10, k_per_bin=25, seed=0):
    """Synthesize an NTL9-scale stratified-assignment problem."""
    rng = np.random.default_rng(seed)
    # Double-well-ish pcoord population over [0, 10]
    pc_parent = np.abs(rng.normal(0, 1, n_segments)) % 10
    pc_parent = 10 * rng.beta(0.7, 0.7, n_segments)
    pc_child = np.clip(pc_parent + rng.normal(0, 0.7, n_segments), 1e-3, 10 - 1e-3)

    def embed(pc):
        base = np.outer(pc, rng.normal(1, 0.2, n_raw_features) * 0.3)
        return (base + rng.normal(0, 0.3, base.shape)).astype(np.float32)

    raw_parent = embed(pc_parent)
    raw_child = embed(pc_child)

    # PCA transform fitted on a subsample
    sub = raw_child[:: max(1, n_segments // 8192)]
    mean = sub.mean(0)
    cov = np.cov((sub - mean).T)
    evals, evecs = np.linalg.eigh(cov)
    comp = evecs[:, np.argsort(evals)[::-1][:n_components]].astype(np.float32)

    edges = np.linspace(0, 10, n_bins + 1)
    pbins = np.clip(np.digitize(pc_parent, edges) - 1, 0, n_bins - 1).astype(np.int32)
    cbins = np.clip(np.digitize(pc_child, edges) - 1, 0, n_bins - 1).astype(np.int32)

    # Stratified centers: fit per bin on a subsample (host, not timed)
    feats_sub = ((sub - mean) @ comp)
    K = n_bins * k_per_bin
    centers = np.zeros((K, n_components), np.float32)
    sub_pc = pc_child[:: max(1, n_segments // 8192)]
    sub_bins = np.clip(np.digitize(sub_pc, edges) - 1, 0, n_bins - 1)
    for b in range(n_bins):
        members = feats_sub[sub_bins == b]
        if len(members) >= k_per_bin:
            idx = rng.choice(len(members), k_per_bin, replace=False)
            centers[b * k_per_bin : (b + 1) * k_per_bin] = members[idx]
        else:
            centers[b * k_per_bin : (b + 1) * k_per_bin] = rng.normal(
                0, 1, (k_per_bin, n_components)
            )

    weights = np.exp(rng.uniform(np.log(1e-12), 0, n_segments))
    weights /= weights.sum()

    return dict(
        raw_parent=raw_parent, raw_child=raw_child,
        mean=mean.astype(np.float32), comp=comp,
        pbins=pbins, cbins=cbins,
        basis_p=(pc_parent > 9.0), basis_c=(pc_child > 9.0),
        target_c=(pc_child < 1.0),
        w=weights.astype(np.float32),
        centers=centers,
        center_bin=np.repeat(np.arange(n_bins, dtype=np.int32), k_per_bin),
        valid=np.ones(K, bool),
        global_id=np.arange(K, dtype=np.int64),
        n_states=K + 2,
    )


def device_pipeline(p, inner_reps=1):
    """Jitted transform + stratified assign + flux + steady state.

    ``inner_reps`` > 1 runs the whole step that many times *inside* the jit
    (a fori_loop), so one host dispatch measures pure device throughput --
    relevant when host->device dispatch latency is high (e.g. a remote
    tunnel) and would otherwise dominate the per-step timing.
    """
    import jax
    import jax.numpy as jnp

    from msm_we_tpu.parallel.sharded import (
        _discretize_and_flux,
        steady_state_from_flux,
    )

    n_states = p["n_states"]

    def one_step(raw_parent, raw_child, mean, comp, pbins, cbins,
                 basis_p, basis_c, target_c, w,
                 centers, center_bin, valid, global_id):
        fp = (raw_parent - mean) @ comp
        fc = (raw_child - mean) @ comp
        fm, _pi, _ci = _discretize_and_flux(
            fp, fc, pbins, cbins, basis_p, basis_c, target_c, w,
            centers, center_bin, valid, global_id, n_states,
        )
        basis_mask = jnp.arange(n_states) == n_states - 2
        target_mask = jnp.arange(n_states) == n_states - 1
        _T, pss, flux = steady_state_from_flux(fm, basis_mask, target_mask)
        return fm, pss, flux

    @jax.jit
    def step(*args):
        if inner_reps == 1:
            return one_step(*args)

        def body(_i, carry):
            _fm, _pss, flux = carry
            # Thread the previous step's flux into the weights: a genuine
            # data dependence, so XLA cannot hoist/CSE the loop-invariant
            # body and execute the step only once (which would inflate the
            # reported throughput by inner_reps)
            perturbed = list(args)
            perturbed[0] = args[0] + flux * 1e-30  # raw_parent
            perturbed[1] = args[1] + flux * 1e-30  # raw_child
            return one_step(*perturbed)

        init = one_step(*args)
        return jax.lax.fori_loop(0, inner_reps - 1, body, init)

    args = (
        p["raw_parent"], p["raw_child"], p["mean"], p["comp"],
        p["pbins"], p["cbins"], p["basis_p"], p["basis_c"], p["target_c"],
        p["w"], p["centers"], p["center_bin"], p["valid"], p["global_id"],
    )
    return step, args


def baseline_per_frame_seconds(p, sample=2000):
    """Reference-style per-frame assignment cost, measured then scaled O(N).

    Reproduces the reference stratified predict faithfully: a Python loop over
    frames, each computing the per-bin offset by summing model sizes and
    calling sklearn ``predict`` on a single row
    (``stratified_clustering.py:173-195``), for parent and child coords.
    Scaling is linear because the loop is O(N) Python.
    """
    from sklearn.cluster import MiniBatchKMeans

    feats = ((p["raw_child"][:sample] - p["mean"]) @ p["comp"]).astype(np.float64)
    k = p["centers"].shape[0] // 10
    models = []
    for b in range(10):
        m = MiniBatchKMeans(n_clusters=k, n_init=1)
        m.fit(p["centers"][b * k : (b + 1) * k])  # seed with the same centers
        m.cluster_centers_ = p["centers"][b * k : (b + 1) * k].astype(np.float64)
        models.append(m)
    bins = p["cbins"][:sample]

    t0 = time.perf_counter()
    out = []
    for i in range(sample):
        b = int(bins[i])
        offset = sum(len(models[j].cluster_centers_) for j in range(b))
        out.append(int(models[b].predict(feats[i : i + 1])[0]) + offset)
    elapsed = time.perf_counter() - t0

    n = len(p["raw_parent"])
    # Two assignments per segment (parent + child), as in the flux build
    return elapsed / sample * n * 2


def main():
    import jax

    p = make_problem()
    n_segments = len(p["raw_parent"])

    inner_reps = 10
    step, args = device_pipeline(p, inner_reps=inner_reps)
    # Device-resident inputs: the pipeline holds features on device, so input
    # transfer is not part of the per-build cost being measured
    args = tuple(jax.device_put(a) for a in args)
    # Warm up (compile)
    fm, pss, flux = step(*args)
    fm.block_until_ready()

    outer = 3
    t0 = time.perf_counter()
    for _ in range(outer):
        fm, pss, flux = step(*args)
    fm.block_until_ready()
    device_time = (time.perf_counter() - t0) / (outer * inner_reps)

    frames_per_sec = n_segments / device_time
    baseline_time = baseline_per_frame_seconds(p)
    vs_baseline = baseline_time / device_time

    result = {
        "metric": "stratified cluster-assign + fluxmatrix + steady-state throughput",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec",
        "vs_baseline": round(vs_baseline, 1),
        "device_time_s": round(device_time, 5),
        "baseline_time_s_scaled": round(baseline_time, 3),
        "n_segments": n_segments,
        "n_states": p["n_states"],
        "backend": jax.default_backend(),
        "JtargetSS": float(flux),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
