"""Benchmark: haMSM hot path + end-to-end build, with speed-of-light analysis.

Two measurements:

1. **Hot path** -- the fused device step (PCA transform -> stratified cluster
   assignment -> weighted flux scatter -> steady state) at realistic shapes:
   raw featurization dim 900 (~300 atoms x 3, NTL9-scale) projected to 30
   components on device, 102k WE segments, 250 stratified centers. Reports
   frames/s, achieved TFLOP/s, fraction of peak FLOPs, and fraction of the
   roofline speed-of-light (the transform at d=30 components is HBM-bound:
   arithmetic intensity ~15 FLOP/byte vs the v5e ridge at ~240).

2. **End-to-end** -- h5 ingest -> featurize -> stratified cluster -> flux ->
   clean -> steady state (``build_analyze_model(device_pipeline=True)``) on a
   100k-segment synthetic WE dataset, the BASELINE.md north-star shape
   (100 iters, ~300 clusters). Two builds run back-to-back; the second
   (warm-compile) wall-clock is reported, with the per-stage breakdown.

Baseline: the reference's hottest loop is one sklearn ``predict([coord])``
call per frame inside ``StratifiedClusters.predict``
(``stratified_clustering.py:152-203``). That per-frame path is timed on a
subsample and scaled linearly (it is strictly O(N) Python).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import logging
import os
import time

import numpy as np

# The package logger defaults to INFO (stage reports etc., via a RichHandler
# that writes to stdout); the bench's contract is ONE JSON line on stdout
logging.getLogger("msm_we_tpu").setLevel(logging.ERROR)

# Persistent XLA compile cache: repeat bench runs skip the (remote) compile.
# Min compile time 0: on remote-AOT backends the locally-measured compile
# time can be tiny even when the wall wait was minutes, which would skip
# caching exactly the entries that matter.
_DEFAULT_CACHE = "/tmp/msm_we_tpu_jax_cache"
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
if os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _DEFAULT_CACHE) == _DEFAULT_CACHE:
    # JAX skips the persistent cache silently if the directory is missing;
    # only create OUR default -- a user-supplied path may be remote (gs://)
    # or intentionally read-only
    os.makedirs(_DEFAULT_CACHE, exist_ok=True)

# (peak_flops_f32_matmul, hbm_bytes_per_s) by TPU generation. v5e MXU peak is
# 197 TFLOP/s in bf16; XLA's default f32 matmul precision on TPU runs the MXU
# in bf16-input mode, so the bf16 figure is the honest peak for these kernels.
# Match order matters: "TPU v5 lite" must be tried before "TPU v5".
DEVICE_PEAKS = {
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v5": (459e12, 2765e9),  # v5p device_kind variants without the 'p'
    "TPU v4": (275e12, 1228e9),
    "TPU v6 lite": (918e12, 1640e9),
    "TPU v6": (918e12, 1640e9),
}


def device_peaks():
    """(peak_flops, hbm_bytes_per_s) for the attached TPU, or (None, None).

    Unknown generations return (None, None) -- reporting v5e constants for a
    v6/v7 chip would silently misstate pct_peak and sol_fraction by large
    factors; a null roofline is honest, the throughput numbers still stand.
    """
    import jax

    dev = jax.devices()[0]
    if dev.platform != "tpu":
        return None, None
    kind = getattr(dev, "device_kind", "")
    for key, peaks in DEVICE_PEAKS.items():
        if key in kind:
            return peaks
    return None, None


def make_problem(n_segments=102_400, n_raw_features=900, n_components=30,
                 n_bins=10, k_per_bin=25, seed=0, fallback_frac=0.02):
    """Synthesize an NTL9-scale stratified-assignment problem.

    Raw features are ~300 atoms x 3 coords; the PCA projection runs on
    device, so the MXU sees the real (N, 900) @ (900, 30) transform.

    Parent coordinates carry WE's trajectory-continuity structure: each
    segment's parent frame is a bit-copy of another segment's child frame
    (``parent_rows``), except a ``fallback_frac`` recycled fraction
    (``parent_rows == -1``) with independent basis-region frames
    (``raw_fallback``). The dedup step variant exploits this; the
    two-transform step ignores it (both see identical raw arrays).
    """
    rng = np.random.default_rng(seed)
    n_fb = max(int(n_segments * fallback_frac), 1)
    parent_rows = rng.permutation(n_segments).astype(np.int32)
    fb_idx = np.sort(rng.choice(n_segments, n_fb, replace=False)).astype(np.int32)

    pc_child = 10 * rng.beta(0.7, 0.7, n_segments)
    pc_parent = pc_child[parent_rows].copy()
    pc_parent[fb_idx] = 9.0 + rng.random(n_fb)  # recycled: basis region
    parent_rows[fb_idx] = -1

    def embed(pc):
        base = np.outer(pc, rng.normal(1, 0.2, n_raw_features) * 0.3)
        return (base + rng.normal(0, 0.3, base.shape)).astype(np.float32)

    raw_child = embed(pc_child)
    raw_fallback = embed(pc_parent[fb_idx])
    raw_parent = raw_child[np.where(parent_rows < 0, 0, parent_rows)].copy()
    raw_parent[fb_idx] = raw_fallback

    # PCA transform fitted on a subsample (host, not timed)
    sub = raw_child[:: max(1, n_segments // 4096)]
    mean = sub.mean(0)
    cov = np.cov((sub - mean).T)
    evals, evecs = np.linalg.eigh(cov)
    comp = evecs[:, np.argsort(evals)[::-1][:n_components]].astype(np.float32)

    edges = np.linspace(0, 10, n_bins + 1)
    pbins = np.clip(np.digitize(pc_parent, edges) - 1, 0, n_bins - 1).astype(np.int32)
    cbins = np.clip(np.digitize(pc_child, edges) - 1, 0, n_bins - 1).astype(np.int32)

    # Stratified centers: fit per bin on a subsample (host, not timed)
    feats_sub = (sub - mean) @ comp
    K = n_bins * k_per_bin
    centers = np.zeros((K, n_components), np.float32)
    sub_pc = pc_child[:: max(1, n_segments // 4096)]
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
        parent_rows=parent_rows, fb_idx=fb_idx, raw_fallback=raw_fallback,
        mean=mean.astype(np.float32), comp=comp,
        pbins=pbins, cbins=cbins,
        basis_p=(pc_parent > 9.0), basis_c=(pc_child > 9.0),
        target_c=(pc_child < 1.0),
        w=weights.astype(np.float32),
        centers=centers,
        center_bin=np.repeat(np.arange(n_bins, dtype=np.int32), k_per_bin),
        valid=np.ones(K, bool),
        n_states=K + 2,
    )


def step_flops_bytes(p, ss_iters=512, dedup=False):
    """Matmul FLOPs and minimum HBM traffic of one fused step."""
    import math

    N, Draw = p["raw_child"].shape
    n_fb = len(p["fb_idx"])
    Dc = p["comp"].shape[1]
    K = len(p["centers"])
    S = p["n_states"]
    n_transformed = (N + n_fb) if dedup else 2 * N
    # Steady state runs by repeated matrix squaring: ceil(log2(ss_iters))
    # (S, S) @ (S, S) matmuls (steady_state_from_flux)
    squarings = max(math.ceil(math.log2(max(ss_iters, 2))), 1)
    flops = (
        2.0 * n_transformed * Draw * Dc  # PCA transforms
        + 2 * (2.0 * N * Dc * K)       # parent+child distance matmuls
        + squarings * 2.0 * S**3       # steady-state matrix squarings
    )
    bytes_moved = (
        n_transformed * Draw * 4       # raw coords read (dominant)
        + 2 * (2 * N * Dc * 4)         # feature write + read
        + 2 * N * K * 4                # distance matrices write (argmin fused read)
        + N * (4 * 4)                  # bins/masks/weights
    )
    if dedup:
        # One extended feature array instead of two: write + child-assign
        # read + gather read feeding the parent GEMM (the minimum, with the
        # gather fused into the GEMM input) = 3 N*Dc transfers vs the
        # two-array path's 4. Understates rather than inflates sol_fraction.
        bytes_moved -= N * Dc * 4
    return flops, bytes_moved


def device_pipeline(p, inner_reps=1, fast_math=False, dedup=False):
    """Jitted transform + stratified assign + flux + steady state.

    ``inner_reps`` > 1 runs the whole step that many times *inside* the jit
    (a fori_loop), so one host dispatch measures pure device throughput --
    relevant when host->device dispatch latency is high (e.g. a remote
    tunnel) and would otherwise dominate the per-step timing.

    ``dedup=True`` exploits WE trajectory continuity (the production
    ``dedup_coordinates`` path): parent features are a row-gather of the
    child features at ``parent_rows``, so only ONE (N, 900) raw array is
    read and transformed per step instead of two. Recycled rows' fallback
    frames are concatenated onto the raw array host-side and addressed by
    extended gather indices -- a ``.at[fb_idx].set()`` scatter of the
    fallback features measured ~0.5 ms on v5e (XLA lowers small-row
    scatters serially), the concat+gather is free. Identical flux matrix.
    """
    import jax
    import jax.numpy as jnp

    from msm_we_tpu.parallel.sharded import (
        _discretize_and_flux,
        steady_state_from_flux,
    )

    n_states = p["n_states"]
    n_bins = int(p["center_bin"].max()) + 1

    def one_step(raw_parent, raw_child, mean, comp, pbins, cbins,
                 basis_p, basis_c, target_c, w,
                 centers, center_bin, valid,
                 parent_rows=None):
        # Centering folded into a bias: (x - mu) @ C == x @ C - mu @ C.
        # The transform is HBM-bound, so the elementwise (x - mu) pre-pass
        # would cost as much as the matmul itself.
        # Precision HIGHEST by default: bf16 MXU matmuls flip near-tie
        # cluster assignments (measured 41% of rows vs f64). fast_math is
        # the explicit bf16 serving tier.
        prec = "default" if fast_math else jax.lax.Precision.HIGHEST
        offset = mean @ comp
        if dedup:
            # raw_child is [child rows; fallback rows] (N + n_fb, 900);
            # parent_rows already point into the extended feature array
            fc_ext = jnp.matmul(raw_child, comp, precision=prec) - offset[None, :]
            fc = fc_ext[: len(pbins)]
            fp = fc_ext[parent_rows]
        else:
            fc = jnp.matmul(raw_child, comp, precision=prec) - offset[None, :]
            fp = jnp.matmul(raw_parent, comp, precision=prec) - offset[None, :]
        fm, _pi, _ci = _discretize_and_flux(
            fp, fc, pbins, cbins, basis_p, basis_c, target_c, w,
            centers, center_bin, valid, n_states, n_bins=n_bins,
            precision=prec,
        )
        basis_mask = jnp.arange(n_states) == n_states - 2
        target_mask = jnp.arange(n_states) == n_states - 1
        _T, pss, flux, residual = steady_state_from_flux(fm, basis_mask, target_mask)
        return fm, pss, flux, residual

    @jax.jit
    def step(*args):
        if inner_reps == 1:
            return one_step(*args)

        def body(_i, carry):
            _fm, _pss, flux, _res = carry
            # Thread the previous step's flux into the inputs: a genuine
            # data dependence, so XLA cannot hoist/CSE the loop-invariant
            # body and execute the step only once (which would inflate the
            # reported throughput by inner_reps). The dependence goes
            # through the TINY projection matrix (900x30), not the raw
            # coordinate arrays -- perturbing those would add two 737 MB
            # copies per iteration and the harness would dwarf the step.
            perturbed = list(args)
            perturbed[3] = args[3] + flux * 1e-30  # comp (projection)
            return one_step(*perturbed)

        init = one_step(*args)
        return jax.lax.fori_loop(0, inner_reps - 1, body, init)

    args = (
        p["raw_parent"], p["raw_child"], p["mean"], p["comp"],
        p["pbins"], p["cbins"], p["basis_p"], p["basis_c"], p["target_c"],
        p["w"], p["centers"], p["center_bin"], p["valid"],
    )
    if dedup:
        # The full raw_parent array is not an input at all in this tier.
        # Fallback frames ride as extra rows of the raw array; recycled
        # parents gather from them via extended indices.
        n = len(p["raw_child"])
        rows_ext = p["parent_rows"].copy()
        rows_ext[p["fb_idx"]] = n + np.arange(len(p["fb_idx"]), dtype=np.int32)
        raw_ext = np.concatenate([p["raw_child"], p["raw_fallback"]])
        args = (
            (np.zeros((1, 1), np.float32), raw_ext) + args[2:] + (rows_ext,)
        )
    return step, args


def baseline_per_frame_seconds(p, sample=2000):
    """Reference-style per-frame assignment cost, measured then scaled O(N).

    Reproduces the reference stratified predict faithfully: a Python loop over
    frames, each computing the per-bin offset by summing model sizes and
    calling sklearn ``predict`` on a single row
    (``stratified_clustering.py:173-195``), for parent and child coords.
    Scaling is linear because the loop is O(N) Python. The (vectorized numpy)
    PCA transform is included at host speed.
    """
    from sklearn.cluster import MiniBatchKMeans

    t_feat0 = time.perf_counter()
    feats = ((p["raw_child"][:sample] - p["mean"]) @ p["comp"]).astype(np.float64)
    feat_time = time.perf_counter() - t_feat0

    n_bins = int(p["center_bin"].max()) + 1
    k = p["centers"].shape[0] // n_bins
    models = []
    for b in range(n_bins):
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
    return (elapsed + feat_time) / sample * n * 2


def run_end_to_end(n_warm=5):
    """h5 -> JtargetSS via build_analyze_model(device_pipeline=True) on a
    100k-segment dataset (the north-star shape). Runs ``n_warm`` warm
    builds after one compile run and returns (summary, JtargetSS):
    summary carries min/median/max wall-clock and per-stage medians --
    single warm measurements through the remote tunnel historically swung
    1.1-2.9 s under transient congestion (docs/performance.md)."""
    from msm_we_tpu.binning import RectilinearBinMapper
    from msm_we_tpu.data import generate_west_h5
    from msm_we_tpu.model import modelWE

    path = "/tmp/msm_we_tpu_bench_100k.h5"

    def _valid():
        # Guard against a truncated file from an interrupted earlier run
        # (or one written by an older generator): silently benchmarking a
        # different dataset would misreport the north-star shape
        try:
            import h5py

            with h5py.File(path, "r") as h5:
                groups = list(h5["iterations"])
                return len(groups) == 102 and "auxdata/coord" in h5[
                    f"iterations/{groups[-1]}"
                ]
        except Exception:
            return False

    if not os.path.exists(path) or not _valid():
        tmp = path + ".tmp"
        generate_west_h5(tmp, n_iterations=101, n_segments=1000, seed=17)
        os.replace(tmp, path)  # atomic: no truncated file on interruption

    def build():
        mapper = RectilinearBinMapper([np.linspace(0, 10, 13)])
        model = modelWE()
        t0 = time.perf_counter()
        model.build_analyze_model(
            file_paths=[path],
            ref_struct={"coords": None, "nAtoms": 4, "coord_ndim": 3},
            modelName="bench",
            basis_pcoord_bounds=[[9.0, 10.0]],
            target_pcoord_bounds=[[0.0, 1.0]],
            dimreduce_method="pca",
            tau=1.0,
            n_clusters=25,
            cross_validation_groups=0,
            show_live_display=False,
            device_pipeline=True,
            # scan_small_batches: the whole fill loop (one sub-threshold
            # batch per iteration at these shapes) runs as ONE device scan
            # dispatch -- the documented device-family clustering mode
            step_kwargs={
                "clustering": {
                    "user_bin_mapper": mapper,
                    "scan_small_batches": True,
                }
            },
        )
        return time.perf_counter() - t0, model

    _cold, _m = build()  # compiles
    runs = [build() for _ in range(n_warm)]
    times = sorted(t for t, _m in runs)
    # Per-stage medians across the warm runs (stage names are identical
    # across builds -- same pipeline, same config)
    stage_samples = {}
    for _t, m in runs:
        for name, secs, _note in m.stage_timings.stages:
            stage_samples.setdefault(name, []).append(secs)
    stages = {
        name: round(float(np.median(v)), 3) for name, v in stage_samples.items()
    }
    summary = {
        "end_to_end_s": round(times[0], 2),  # min: steady-state cost
        "end_to_end_median_s": round(float(np.median(times)), 2),
        "end_to_end_max_s": round(times[-1], 2),
        "end_to_end_n_warm": n_warm,
        "end_to_end_stages_median": stages,
    }
    return summary, float(runs[0][1].JtargetSS)


# The probe writes progress lines to a file (not a pipe): on timeout the
# parent still sees how far it got -- "no output" (import/init hang) vs
# "platform=tpu reached, exec hung" are different failure modes and the
# attempt log records which one happened.
_PROBE_SNIPPET = """
import sys, time
t0 = time.time()
log = open(sys.argv[1], "w")
def mark(s):
    log.write(f"{s} t={time.time()-t0:.1f}\\n"); log.flush()
mark("start")
import jax
mark("import_done")
d = jax.devices()[0]
mark(f"platform={d.platform}")
import numpy as np
x = jax.device_put(np.ones((8, 8), np.float32))
np.asarray(jax.jit(lambda a: a + 1.0)(x))
mark("exec_ok")
mark(f"backend={jax.default_backend()}")
"""


def _read_marks(log_path):
    try:
        with open(log_path) as fh:
            return [ln.strip() for ln in fh if ln.strip()]
    except OSError:
        return []


def _probe_once(timeout, exec_timeout=None):
    """One killable-subprocess probe of the default backend.

    Two-stage deadline: the device LISTING is near-instant when the tunnel
    is up (measured 0.1 s), but the first jitted EXEC pays tunnel handshake
    + remote compile (measured 275 s for a trivial kernel). So ``timeout``
    bounds reaching the ``platform=`` mark; once the probe reports an
    accelerator platform, the deadline extends to ``exec_timeout`` -- slow
    progress is not a hang. Returns (backend_or_None, attempt_record).

    The remote-tunnel backend can also hang indefinitely on init when the
    far side is down; a hung bench leaves the driver with no artifact at
    all, while a CPU-fallback run still records a well-formed (clearly
    flagged) JSON line.
    """
    import signal
    import subprocess
    import sys
    import tempfile

    if exec_timeout is None:
        exec_timeout = max(timeout, 60)
    with tempfile.NamedTemporaryFile(
        mode="r", suffix=".probelog", delete=False
    ) as tf:
        log_path = tf.name
    t0 = time.perf_counter()
    # Popen + killpg rather than subprocess.run: run() only kills the
    # direct child on timeout and would then block until pipe EOF, so a
    # hung grandchild (backend helper holding inherited fds) would wedge
    # the bench anyway. A fresh session lets us kill the whole tree.
    proc = subprocess.Popen(
        [sys.executable, "-c", _PROBE_SNIPPET, log_path],
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        start_new_session=True,
    )
    deadline = t0 + timeout
    extended = False
    timed_out = False
    while proc.poll() is None:
        if not extended:
            for m in _read_marks(log_path):
                if m.startswith("platform=") and not m.startswith("platform=cpu"):
                    deadline = t0 + exec_timeout
                    extended = True
                    break
        if time.perf_counter() >= deadline:
            timed_out = True
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except Exception:
                proc.kill()
            break
        time.sleep(min(0.25, max(deadline - time.perf_counter(), 0.01)))
    try:
        _, stderr = proc.communicate(timeout=10)
    except Exception:
        stderr = b""
    duration = time.perf_counter() - t0
    marks = _read_marks(log_path)
    try:
        os.unlink(log_path)
    except OSError:
        pass
    progress = marks[-1] if marks else "no output"
    rec = {
        "duration_s": round(duration, 1),
        "progress": progress,
        "deadline_extended": extended,
    }
    if timed_out:
        rec["outcome"] = "timeout"
        return None, rec
    if proc.returncode != 0:
        rec["outcome"] = f"exit {proc.returncode}"
        rec["stderr_tail"] = stderr.decode(errors="replace").strip()[-300:]
        return None, rec
    backend = None
    for m in marks:
        if m.startswith("backend="):
            backend = m.split("=", 1)[1].split()[0]
    if backend is None:
        # Clean exit but no backend mark (truncated/unwritable log): a
        # FAILED attempt -- "ok:None" here would log success while the
        # retry loop (correctly) kept retrying, corrupting the evidence
        # trail probe_attempts exists to provide
        rec["outcome"] = "exit 0 without backend mark"
        return None, rec
    rec["outcome"] = f"ok:{backend}"
    return backend, rec


def _device_reachable():
    """Probe the default backend, retrying across tunnel flaps.

    The round-4 postmortem (VERDICT.md weak #1): the tunnel flaps between
    <90 s init and >9 min hangs within a single hour, and a single 240 s
    probe attempt turned the whole round's evidence into a CPU artifact.
    Up to ``MSM_WE_TPU_BENCH_PROBE_ATTEMPTS`` (default 5) attempts with
    escalating sleeps (~18 min worst-case window) before giving up.

    Returns (backend_or_None, attempt_log).
    """
    import sys

    attempts = int(os.environ.get("MSM_WE_TPU_BENCH_PROBE_ATTEMPTS", "5"))
    timeout = float(os.environ.get("MSM_WE_TPU_BENCH_PROBE_TIMEOUT", "120"))
    # First-exec over the tunnel measured 275 s healthy and >600 s under
    # remote-compile contention; 900 s covers both while still bounding a
    # genuinely hung exec
    exec_timeout = float(
        os.environ.get("MSM_WE_TPU_BENCH_PROBE_EXEC_TIMEOUT", "900")
    )
    budget = float(os.environ.get("MSM_WE_TPU_BENCH_PROBE_BUDGET", "2400"))
    sleeps = [15, 30, 60, 90, 120]
    log = []
    t_start = time.perf_counter()
    for i in range(max(attempts, 1)):
        backend, rec = _probe_once(timeout, exec_timeout)
        rec["attempt"] = i + 1
        log.append(rec)
        print(
            f"probe attempt {i + 1}/{attempts}: {rec['outcome']} "
            f"({rec['duration_s']} s, {rec['progress']})",
            file=sys.stderr, flush=True,
        )
        if backend is not None:
            return backend, log
        elapsed = time.perf_counter() - t_start
        if elapsed > budget:
            log.append({"outcome": f"probe budget exhausted ({budget} s)"})
            break
        if i < attempts - 1:
            time.sleep(sleeps[min(i, len(sleeps) - 1)])
    return None, log


def main():
    import sys

    probed, probe_log = _device_reachable()
    device_fallback = None
    if probed is None:
        device_fallback = (
            "default backend unreachable (all init probe attempts timed "
            "out or failed -- see probe_attempts); measured on CPU fallback"
        )
        os.environ["JAX_PLATFORMS"] = "cpu"
    elif probed == "cpu":
        device_fallback = "no accelerator backend; measured on CPU"

    import jax

    if device_fallback:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        # stderr: stdout carries exactly one JSON line (module contract)
        print(f"WARNING: {device_fallback}", file=sys.stderr, flush=True)

    # The problem keeps the full TPU shape even on CPU fallback (round-4
    # lesson: shrinking n_segments 102k -> 8k made `value` non-comparable
    # across rounds). Fallback instead cuts repetitions: fewer in-jit steps
    # and fewer trials, so the measurement stays O(minutes) on host CPU.
    p = make_problem()
    n_segments = len(p["raw_parent"])
    n_trials = 7 if not device_fallback else 2
    n_warm_e2e = 5 if not device_fallback else 3

    # Timing methodology (round-3 correction): on a remote-tunnel backend,
    # `block_until_ready` returns without waiting (measured: 30 fused steps
    # "completed" in 0.1 ms while the queue was still executing) and each
    # dispatch costs a synchronous ~27 ms enqueue round trip. The round-2
    # numbers timed THAT, not device compute. Honest per-step time:
    # execute `inner_reps` steps inside one jit (loop-carried perturbation,
    # so XLA cannot collapse the loop), force completion by materializing
    # the output (np.asarray round-trips the result buffer), and subtract
    # the same-shaped no-op dispatch+transfer baseline measured separately.
    inner_reps = 25 if not device_fallback else 2

    @jax.jit
    def _noop(fmp):
        return fmp + 1.0

    def measure_step(step, args):
        out = step(*args)
        np.asarray(out[0])  # warm: drains remote compile + first run
        rtts = []
        dummy = jax.device_put(np.zeros((p["n_states"], p["n_states"]), np.float32))
        np.asarray(_noop(dummy))
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(_noop(dummy))
            rtts.append(time.perf_counter() - t0)
        rtt = min(rtts)
        # 7 trials (each ~inner_reps*2 ms): tunnel congestion inflates
        # individual trials by up to ~15%; the min over 7 is stable to a
        # few percent across sessions where the min over 3 swung the
        # recorded SoL fractions (0.37 vs 0.32 for the dedup tier)
        times = []
        for _ in range(n_trials):
            t0 = time.perf_counter()
            out = step(*args)
            np.asarray(out[0])
            times.append(time.perf_counter() - t0)
        per_step = max(min(times) - rtt, 1e-9) / inner_reps
        return per_step, out

    t_tiers0 = time.perf_counter()
    step, args = device_pipeline(p, inner_reps=inner_reps)
    # Device-resident inputs: the pipeline holds features on device, so input
    # transfer is not part of the per-build cost being measured
    args = tuple(jax.device_put(a) for a in args)
    device_time, (fm, pss, flux, ss_residual) = measure_step(step, args)

    frames_per_sec = n_segments / device_time

    # On CPU fallback the full-shape hot step can be very slow; the value
    # metric (primary tier, full shape, cross-round comparable) always
    # runs, but the secondary tiers are skipped when the primary already
    # ate a third of the fallback budget -- a bench that overruns the
    # driver's timeout leaves NO artifact at all, the exact failure the
    # probe-retry machinery exists to prevent.
    budget = float(os.environ.get("MSM_WE_TPU_BENCH_FALLBACK_BUDGET", "900"))
    skip_tiers = (
        device_fallback is not None
        and (time.perf_counter() - t_tiers0) > budget / 3
    )
    if skip_tiers:
        print(
            "WARNING: skipping fast-math/dedup tiers on fallback "
            f"(primary tier took {time.perf_counter() - t_tiers0:.0f} s)",
            file=sys.stderr, flush=True,
        )
        device_time_fast = device_time_dedup = None
        frames_per_sec_fast = frames_per_sec_dedup = None
        dedup_max_diff = None
    else:
        # Fast-math serving tier (explicit bf16 matmuls; assignments may
        # flip on near-ties -- documented opt-in, never the default).
        # Reuses the already device-resident inputs: a second device_put
        # would duplicate ~740 MB of raw coordinates on the device.
        step_fast, _ = device_pipeline(p, inner_reps=inner_reps, fast_math=True)
        device_time_fast, _out_f = measure_step(step_fast, args)
        frames_per_sec_fast = n_segments / device_time_fast

        # Continuity-dedup tier (the production dedup_coordinates path):
        # one raw transform + a feature gather replaces the second
        # transform. Exact: the flux matrix must match the two-transform
        # step bitwise-close.
        step_dd, args_dd = device_pipeline(p, inner_reps=inner_reps, dedup=True)
        # Reuse the device-resident shared arguments (indices 2..12);
        # device_put the dedup-specific ones (dummy raw_parent slot,
        # extended raw array, extended parent gather rows)
        args_dd = (
            (jax.device_put(args_dd[0]), jax.device_put(args_dd[1]))
            + args[2:13]
            + (jax.device_put(args_dd[13]),)
        )
        device_time_dedup, (fm_d, _pss_d, _flux_d, _res_d) = measure_step(
            step_dd, args_dd
        )
        frames_per_sec_dedup = n_segments / device_time_dedup
        dedup_max_diff = float(
            np.max(np.abs(np.asarray(fm_d) - np.asarray(fm)))
            / max(float(np.max(np.abs(np.asarray(fm)))), 1e-30)
        )
    flops_dd, bytes_dd = step_flops_bytes(p, dedup=True)
    baseline_time = baseline_per_frame_seconds(p)
    vs_baseline = baseline_time / device_time

    flops, bytes_moved = step_flops_bytes(p)
    achieved_tflops = flops / device_time / 1e12
    peak_flops, peak_bw = device_peaks()
    pct_peak = 100 * achieved_tflops * 1e12 / peak_flops if peak_flops else None
    if peak_flops:
        sol_time = max(flops / peak_flops, bytes_moved / peak_bw)
        sol_fraction = sol_time / device_time
        bound = "hbm" if bytes_moved / peak_bw > flops / peak_flops else "mxu"
    else:
        sol_fraction = None
        bound = None

    e2e, j_e2e = run_end_to_end(n_warm=n_warm_e2e)
    end_to_end_s = e2e["end_to_end_s"]

    result = {
        "metric": "PCA-transform + stratified-assign + fluxmatrix + steady-state throughput",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec",
        "vs_baseline": round(vs_baseline, 1),
        "device_time_s": round(device_time, 5),
        "baseline_time_s_scaled": round(baseline_time, 3),
        "n_segments": n_segments,
        "raw_dim": int(p["raw_parent"].shape[1]),
        "n_components": int(p["comp"].shape[1]),
        "n_states": p["n_states"],
        "frames_per_sec_fast_math": (
            round(frames_per_sec_fast, 1)
            if frames_per_sec_fast is not None else None
        ),
        "frames_per_sec_dedup": (
            round(frames_per_sec_dedup, 1)
            if frames_per_sec_dedup is not None else None
        ),
        "device_time_dedup_s": (
            round(device_time_dedup, 5)
            if device_time_dedup is not None else None
        ),
        "sol_fraction_dedup": (
            round(max(flops_dd / peak_flops, bytes_dd / peak_bw)
                  / device_time_dedup, 3)
            if peak_flops and device_time_dedup else None
        ),
        "dedup_flux_max_rel_diff": dedup_max_diff,
        "tiers_skipped_on_fallback": bool(skip_tiers),
        "achieved_tflops": round(achieved_tflops, 3),
        "pct_peak": round(pct_peak, 2) if pct_peak is not None else None,
        "sol_fraction": round(sol_fraction, 3) if sol_fraction is not None else None,
        "roofline_bound": bound,
        **e2e,
        "end_to_end_JtargetSS": j_e2e,
        "north_star_met": bool(end_to_end_s < 10.0),
        "backend": jax.default_backend(),
        "device_fallback": device_fallback,
        "probe_attempts": probe_log,
        "JtargetSS": float(flux),
        "ss_residual": float(ss_residual),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
