"""Pallas TPU kernel: fused stratified assignment + flux accumulation.

The haMSM hot path is, per transition: score parent/child features against
every stratified cluster center (masked to the segment's WE bin), argmin to a
global cluster index, apply basis/target overrides, and scatter the segment
weight into the flux matrix. The jnp pipeline (ops/kmeans.masked_assign +
segment_sum) materializes two (N, K) distance matrices and an (N,) index
array in HBM between ops; this kernel keeps everything in VMEM:

* grid over segment tiles; per tile, both distance computations are MXU
  matmuls against the (K, d) center bank held in VMEM;
* the bank is **compact** (valid centers first, in global-id order, like
  the production kernels), so the argmin row index IS the global cluster
  id -- no gather, no id table;
* the flux scatter becomes ``onehot_start^T @ (w * onehot_end)`` -- another
  MXU matmul -- accumulated into a VMEM-resident (S, S) flux matrix across
  sequential grid steps.

All logically-1D per-segment and per-center vectors travel as (n, 1) arrays:
Mosaic requires 2-D tileable layouts for small-width operands.

f32 throughput tier: the numerical-parity path accumulates flux in f64 on the
host (model.get_fluxMatrix); this kernel is for the benchmark/serving path.
Falls back to interpreter mode off-TPU for testing.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fused_assign_flux",
    "fused_transform_assign",
    "fused_transform_assign_child",
    "pallas_available",
]

_BIG = 3.4e38


def pallas_available():
    try:
        import jax.experimental.pallas  # noqa: F401

        return True
    except ImportError:  # pragma: no cover
        return False


def _round_up(x, m):
    return ((x + m - 1) // m) * m

def _pad2(x, rows, cols, dtype=np.float32):
    """Zero-pad a 2-D array to (rows, cols) -- shared wrapper padding."""
    out = np.zeros((rows, cols), dtype)
    out[: x.shape[0], : x.shape[1]] = x
    return out


def _col(x, rows, fill=0, dtype=np.int32):
    """Pad a 1-D array into a (rows, 1) column with the given fill."""
    out = np.full((rows, 1), fill, dtype)
    out[: len(x), 0] = x
    return out



def _kernel(
    fp_ref, fc_ref, pbin_ref, cbin_ref, wp_ref,
    basis_p_ref, basis_c_ref, target_c_ref,
    c_ref, centerbin_ref, valid_ref,
    pidx_ref, cidx_ref, fm_ref,
    *, n_states,
):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        fm_ref[:] = jnp.zeros_like(fm_ref)

    CT = c_ref[:]  # (d, K) -- pre-transposed on host: in-kernel
    # transposes force Mosaic into broadcast-multiply-reduce lowerings that
    # materialize a (tile, K, d) intermediate and blow scoped VMEM
    c2 = jnp.sum(CT * CT, axis=0)[None, :]
    center_bin = centerbin_ref[:][:, 0]  # (K,)
    valid = valid_ref[:][:, 0]

    def assign(x, seg_bin):
        x2 = jnp.sum(x * x, axis=1, keepdims=True)
        d2 = (
            x2
            - 2.0
            * jnp.dot(
                x, CT,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            + c2
        )
        ok = (valid[None, :] > 0) & (center_bin[None, :] == seg_bin[:, None])
        d2 = jnp.where(ok, d2, _BIG)
        # First-minimum selection as pure VPU reductions (argmin lowers
        # poorly in Mosaic). Compact bank: the row index IS the global id.
        K = CT.shape[1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], K), 1)
        minval = jnp.min(d2, axis=1, keepdims=True)
        return jnp.min(jnp.where(d2 == minval, iota, K), axis=1)

    pidx = assign(fp_ref[:], pbin_ref[:][:, 0])
    cidx = assign(fc_ref[:], cbin_ref[:][:, 0])

    basis_cluster = n_states - 2
    target_cluster = n_states - 1
    # Reference override order (_fluxmatrix.py:134-137)
    cidx = jnp.where(target_c_ref[:][:, 0] > 0, target_cluster, cidx)
    pidx = jnp.where(basis_p_ref[:][:, 0] > 0, basis_cluster, pidx)
    cidx = jnp.where(basis_c_ref[:][:, 0] > 0, basis_cluster, cidx)

    pidx_ref[:] = pidx[:, None]
    cidx_ref[:] = cidx[:, None]

    # Flux scatter as a one-hot matmul: (S, TN) @ (TN, S). The left one-hot
    # is constructed already-transposed (iota over dim 0) so the contraction
    # is the standard minor-dims form -- contracting over axis 0 of both
    # operands is a fragile Mosaic pattern.
    TN = pidx.shape[0]
    S = fm_ref.shape[0]
    w = wp_ref[:][:, 0]
    oh_start_T = (
        jax.lax.broadcasted_iota(jnp.int32, (S, TN), 0) == pidx[None, :]
    ).astype(jnp.float32)
    oh_end = (
        jax.lax.broadcasted_iota(jnp.int32, (TN, S), 1) == cidx[:, None]
    ).astype(jnp.float32)
    # Precision.HIGHEST: the MXU truncates f32 operands to bf16 at default
    # precision, which costs ~0.4% relative error on the weights
    fm_ref[:] += jnp.dot(
        oh_start_T,
        oh_end * w[:, None],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _assign_kernel(
    fp_ref, fc_ref, pbin_ref, cbin_ref,
    c_ref, centerbin_ref, valid_ref,
    pidx_ref, cidx_ref,
):
    """Assignment-only kernel: fused transform-free distance + argmin over a
    compact bank (row index == global id), no flux accumulation (XLA's
    native scatter wins that op)."""
    CT = c_ref[:]
    c2 = jnp.sum(CT * CT, axis=0)[None, :]
    center_bin = centerbin_ref[:][:, 0]
    valid = valid_ref[:][:, 0]

    def assign(x, seg_bin):
        x2 = jnp.sum(x * x, axis=1, keepdims=True)
        d2 = (
            x2
            - 2.0
            * jnp.dot(x, CT, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
            + c2
        )
        ok = (valid[None, :] > 0) & (center_bin[None, :] == seg_bin[:, None])
        d2 = jnp.where(ok, d2, _BIG)
        K = CT.shape[1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], K), 1)
        minval = jnp.min(d2, axis=1, keepdims=True)
        return jnp.min(jnp.where(d2 == minval, iota, K), axis=1)

    pidx_ref[:] = assign(fp_ref[:], pbin_ref[:][:, 0])[:, None]
    cidx_ref[:] = assign(fc_ref[:], cbin_ref[:][:, 0])[:, None]


@partial(jax.jit, static_argnames=("tile", "interpret"))
def _assign_call(fp, fc, pbins, cbins, centers_T, center_bin, valid,
                 tile, interpret):
    import jax.experimental.pallas as pl

    N = fp.shape[0]
    K = centers_T.shape[1]
    grid = (N // tile,)
    seg1 = pl.BlockSpec((tile, 1), lambda i: (i, 0))
    seg2 = pl.BlockSpec((tile, fp.shape[1]), lambda i: (i, 0))
    bank2 = pl.BlockSpec((centers_T.shape[0], K), lambda i: (0, 0))
    bank1 = pl.BlockSpec((K, 1), lambda i: (0, 0))

    kwargs = {}
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    pidx, cidx = pl.pallas_call(
        _assign_kernel,
        grid=grid,
        in_specs=[seg2, seg2, seg1, seg1, bank2, bank1, bank1],
        out_specs=[seg1, seg1],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
        ],
        interpret=interpret,
        **kwargs,
    )(fp, fc, pbins, cbins, centers_T, center_bin, valid)
    return pidx[:, 0], cidx[:, 0]


@partial(jax.jit, static_argnames=("n_states", "tile", "interpret"))
def _fused_call(
    fp, fc, pbins, cbins, w, basis_p, basis_c, target_c,
    centers_T, center_bin, valid,
    n_states, tile, interpret,
):
    import jax.experimental.pallas as pl

    N = fp.shape[0]
    S = _round_up(n_states, 128)
    K = centers_T.shape[1]
    grid = (N // tile,)

    seg1 = pl.BlockSpec((tile, 1), lambda i: (i, 0))
    seg2 = pl.BlockSpec((tile, fp.shape[1]), lambda i: (i, 0))
    bank2 = pl.BlockSpec((centers_T.shape[0], K), lambda i: (0, 0))
    bank1 = pl.BlockSpec((K, 1), lambda i: (0, 0))
    fm_spec = pl.BlockSpec((S, S), lambda i: (0, 0))

    kwargs = {}
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        # Mosaic's conservative intermediate analysis over-estimates this
        # kernel's footprint; the true working set is the (tile, K) distance
        # blocks. Raise the scoped-VMEM cap accordingly.
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )

    pidx, cidx, fm = pl.pallas_call(
        partial(_kernel, n_states=n_states),
        grid=grid,
        in_specs=[
            seg2, seg2, seg1, seg1, seg1,
            seg1, seg1, seg1,
            bank2, bank1, bank1,
        ],
        out_specs=[seg1, seg1, fm_spec],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((S, S), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(
        fp, fc, pbins, cbins, w, basis_p, basis_c, target_c,
        centers_T, center_bin, valid,
    )
    return pidx[:, 0], cidx[:, 0], fm[:n_states, :n_states]


def _transform_assign_kernel(
    raw_p_ref, raw_c_ref, pbin_ref, cbin_ref, wp_ref,
    basis_p_ref, basis_c_ref, target_c_ref,
    proj_ref, cT_ref, c2adj_ref, centerbin_ref, valid_ref,
    pidx_ref, cidx_ref, fm_ref,
    *, n_states, with_flux, precision,
):
    """Whole-step kernel: raw coords -> PCA features -> masked nearest center
    -> basis/target overrides (-> one-hot flux accumulation).

    The centering bias is folded into ``c2adj`` on the host
    (``|c|^2 + 2 (mu @ P) . c``), so the kernel computes
    ``scores = c2adj - 2 (x @ P) @ C^T`` -- exactly the production XLA
    scores, never materializing features or the (N, K) score matrix in HBM.
    """
    import jax.experimental.pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        fm_ref[:] = jnp.zeros_like(fm_ref)

    proj = proj_ref[:]          # (D, F)
    cT = cT_ref[:]              # (F, K)
    c2adj = c2adj_ref[:][:, 0]  # (K,)
    center_bin = centerbin_ref[:][:, 0]
    valid = valid_ref[:][:, 0]
    K = cT.shape[1]

    def assign(x, seg_bin):
        g = jnp.dot(x, proj, preferred_element_type=jnp.float32,
                    precision=precision)
        scores = c2adj[None, :] - 2.0 * jnp.dot(
            g, cT, preferred_element_type=jnp.float32, precision=precision
        )
        ok = (valid[None, :] > 0) & (center_bin[None, :] == seg_bin[:, None])
        scores = jnp.where(ok, scores, _BIG)
        # First-minimum selection as pure VPU reductions (argmin lowers
        # poorly in Mosaic). Compact bank: the row index IS the global id.
        iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        minval = jnp.min(scores, axis=1, keepdims=True)
        return jnp.min(jnp.where(scores == minval, iota, K), axis=1)

    pidx = assign(raw_p_ref[:], pbin_ref[:][:, 0])
    cidx = assign(raw_c_ref[:], cbin_ref[:][:, 0])

    basis_cluster = n_states - 2
    target_cluster = n_states - 1
    # Reference override order (_fluxmatrix.py:134-137)
    cidx = jnp.where(target_c_ref[:][:, 0] > 0, target_cluster, cidx)
    pidx = jnp.where(basis_p_ref[:][:, 0] > 0, basis_cluster, pidx)
    cidx = jnp.where(basis_c_ref[:][:, 0] > 0, basis_cluster, cidx)

    pidx_ref[:] = pidx[:, None]
    cidx_ref[:] = cidx[:, None]

    if with_flux:
        TN = pidx.shape[0]
        S = fm_ref.shape[0]
        w = wp_ref[:][:, 0]
        oh_start_T = (
            jax.lax.broadcasted_iota(jnp.int32, (S, TN), 0) == pidx[None, :]
        ).astype(jnp.float32)
        oh_end = (
            jax.lax.broadcasted_iota(jnp.int32, (TN, S), 1) == cidx[:, None]
        ).astype(jnp.float32)
        fm_ref[:] += jnp.dot(
            oh_start_T,
            oh_end * w[:, None],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


@partial(
    jax.jit,
    static_argnames=("n_states", "tile", "with_flux", "interpret", "precision"),
)
def _transform_assign_call(
    raw_p, raw_c, pbins, cbins, w, basis_p, basis_c, target_c,
    proj, cT, c2adj, center_bin, valid,
    n_states, tile, with_flux, interpret, precision,
):
    import jax.experimental.pallas as pl

    N, D = raw_p.shape
    F = proj.shape[1]
    K = cT.shape[1]
    S = _round_up(n_states, 128)
    grid = (N // tile,)

    seg1 = pl.BlockSpec((tile, 1), lambda i: (i, 0))
    raw_spec = pl.BlockSpec((tile, D), lambda i: (i, 0))
    proj_spec = pl.BlockSpec((D, F), lambda i: (0, 0))
    cT_spec = pl.BlockSpec((F, K), lambda i: (0, 0))
    bank1 = pl.BlockSpec((K, 1), lambda i: (0, 0))
    fm_spec = pl.BlockSpec((S, S), lambda i: (0, 0))

    kwargs = {}
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    outs = pl.pallas_call(
        partial(
            _transform_assign_kernel,
            n_states=n_states,
            with_flux=with_flux,
            precision=precision,
        ),
        grid=grid,
        in_specs=[
            raw_spec, raw_spec, seg1, seg1, seg1,
            seg1, seg1, seg1,
            proj_spec, cT_spec, bank1, bank1, bank1,
        ],
        out_specs=[seg1, seg1, fm_spec],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((S, S), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(
        raw_p, raw_c, pbins, cbins, w, basis_p, basis_c, target_c,
        proj, cT, c2adj, center_bin, valid,
    )
    pidx, cidx, fm = outs
    return pidx[:, 0], cidx[:, 0], fm[:n_states, :n_states]


def fused_transform_assign(
    raw_p, raw_c, pbins, cbins, w, basis_p, basis_c, target_c,
    mean, proj, centers, center_bin, valid, n_states,
    tile=256, with_flux=True, interpret=None, precision=None,
):
    """Whole hot step as one Pallas kernel: raw coordinates -> PCA transform
    -> stratified assignment -> overrides (-> flux matrix).

    vs the XLA pipeline (bench.py device_pipeline), this never writes the
    (N, F) features or the two (N, K) score matrices to HBM -- the minimum
    traffic is the raw coordinate reads. ``with_flux=False`` returns ids only
    (flux left to XLA's scatter); the returned flux matrix is zeros then.

    Caveat: the stratified predict-time *target* short-circuit for parents
    (``target_p`` routing, applied by the production host path and by
    ``parallel.sharded._discretize_and_flux`` before ``basis_p``) is NOT
    implemented here -- in a stratified build where parents can already sit
    in the target, this kernel's flux would diverge from the host matrix.
    The kernel is a documented performance experiment (rejected: 61.9 ms vs
    XLA's 3.16 ms at bench shapes), not a production path.

    Host-facing wrapper (pads rows to ``tile``, feature dims to 128); for
    in-jit use call ``_transform_assign_call`` with pre-padded device arrays.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if precision is None:
        precision = jax.lax.Precision.HIGHEST

    raw_p = np.asarray(raw_p, np.float32)
    raw_c = np.asarray(raw_c, np.float32)
    N, D = raw_p.shape
    F = proj.shape[1]
    K = centers.shape[0]

    N_pad = _round_up(max(N, tile), tile)
    D_pad = _round_up(D, 128)
    F_pad = _round_up(F, 128)
    K_pad = _round_up(K, 128)

    proj = np.asarray(proj, np.float32)
    centers = np.asarray(centers, np.float32)
    bias = np.asarray(mean, np.float32) @ proj  # (F,)
    c2adj = (centers * centers).sum(1) + 2.0 * centers @ bias

    args = (
        jnp.asarray(_pad2(raw_p, N_pad, D_pad)),
        jnp.asarray(_pad2(raw_c, N_pad, D_pad)),
        jnp.asarray(_col(np.asarray(pbins), N_pad, fill=-1)),
        jnp.asarray(_col(np.asarray(cbins), N_pad, fill=-1)),
        jnp.asarray(_col(np.asarray(w, np.float32), N_pad, fill=0.0, dtype=np.float32)),
        jnp.asarray(_col(np.asarray(basis_p, np.int32), N_pad)),
        jnp.asarray(_col(np.asarray(basis_c, np.int32), N_pad)),
        jnp.asarray(_col(np.asarray(target_c, np.int32), N_pad)),
        jnp.asarray(_pad2(proj, D_pad, F_pad)),
        jnp.asarray(_pad2(centers, K_pad, F_pad).T.copy()),
        jnp.asarray(_col(c2adj, K_pad, fill=0.0, dtype=np.float32)),
        jnp.asarray(_col(np.asarray(center_bin), K_pad, fill=-2)),
        jnp.asarray(_col(np.asarray(valid, np.int32), K_pad)),
    )
    pidx, cidx, fm = _transform_assign_call(
        *args, n_states=n_states, tile=tile, with_flux=with_flux,
        interpret=interpret, precision=precision,
    )
    return np.asarray(pidx)[:N], np.asarray(cidx)[:N], np.asarray(fm)


def _transform_assign_child_kernel(
    raw_ref, bin_ref, basis_ref, target_ref,
    proj_ref, cT_ref, c2adj_ref, centerbin_ref, valid_ref,
    idx_ref, feat_ref,
    *, n_states, precision, emit_features,
):
    """Child-only tier of :func:`_transform_assign_kernel`: raw coords ->
    features -> masked nearest center -> overrides, ids out. The (tile, K)
    score block lives and dies in VMEM (the in-tile argmin epilogue VERDICT
    round-3 item 4 asks to measure); with ``emit_features`` the (tile, F)
    feature block is also written out so the dedup parent gather can reuse
    it (the production dedup contract, ``features.featurize_dedup``)."""
    proj = proj_ref[:]
    cT = cT_ref[:]
    c2adj = c2adj_ref[:][:, 0]
    center_bin = centerbin_ref[:][:, 0]
    valid = valid_ref[:][:, 0]
    K = cT.shape[1]

    g = jnp.dot(raw_ref[:], proj, preferred_element_type=jnp.float32,
                precision=precision)
    if emit_features:
        feat_ref[:] = g
    scores = c2adj[None, :] - 2.0 * jnp.dot(
        g, cT, preferred_element_type=jnp.float32, precision=precision
    )
    seg_bin = bin_ref[:][:, 0]
    ok = (valid[None, :] > 0) & (center_bin[None, :] == seg_bin[:, None])
    scores = jnp.where(ok, scores, _BIG)
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    minval = jnp.min(scores, axis=1, keepdims=True)
    idx = jnp.min(jnp.where(scores == minval, iota, K), axis=1)

    idx = jnp.where(target_ref[:][:, 0] > 0, n_states - 1, idx)
    idx = jnp.where(basis_ref[:][:, 0] > 0, n_states - 2, idx)
    idx_ref[:] = idx[:, None]


@partial(
    jax.jit,
    static_argnames=(
        "n_states", "tile", "interpret", "precision", "emit_features"
    ),
)
def _transform_assign_child_call(
    raw, bins, basis, target, proj, cT, c2adj, center_bin, valid,
    n_states, tile, interpret, precision, emit_features,
):
    import jax.experimental.pallas as pl

    N, D = raw.shape
    F = proj.shape[1]
    K = cT.shape[1]
    grid = (N // tile,)

    seg1 = pl.BlockSpec((tile, 1), lambda i: (i, 0))
    raw_spec = pl.BlockSpec((tile, D), lambda i: (i, 0))
    # Without emit_features the dummy output is a single (tile, F) block
    # every grid step aliases (never written by the kernel)
    feat_spec = pl.BlockSpec(
        (tile, F), (lambda i: (i, 0)) if emit_features else (lambda i: (0, 0))
    )
    proj_spec = pl.BlockSpec((D, F), lambda i: (0, 0))
    cT_spec = pl.BlockSpec((F, K), lambda i: (0, 0))
    bank1 = pl.BlockSpec((K, 1), lambda i: (0, 0))

    kwargs = {}
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    idx, feats = pl.pallas_call(
        partial(
            _transform_assign_child_kernel,
            n_states=n_states,
            precision=precision,
            emit_features=emit_features,
        ),
        grid=grid,
        in_specs=[raw_spec, seg1, seg1, seg1,
                  proj_spec, cT_spec, bank1, bank1, bank1],
        out_specs=[seg1, feat_spec],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((N if emit_features else tile, F),
                                 jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(raw, bins, basis, target, proj, cT, c2adj, center_bin, valid)
    return idx[:, 0], (feats if emit_features else None)


def fused_transform_assign_child(
    raw, bins, basis, target, mean, proj, centers, center_bin, valid,
    n_states, tile=512, interpret=None, precision=None, emit_features=False,
):
    """Child-only whole-hot-step assignment: raw coordinates -> PCA
    transform -> stratified assignment -> basis/target overrides, with the
    (N, K) score matrix never written to HBM (in-tile argmin epilogue).

    This is the dedup-tier shape: under WE continuity only child rows are
    scored on device (``discretization.sharded_pair_discretize`` fast path /
    the bench dedup tier); parent ids derive from a host or XLA gather.
    ``emit_features=True`` additionally writes the (N, F) feature block so
    a downstream parent-row gather + parent assignment can consume it.

    Host-facing wrapper (pads rows to ``tile``, dims to 128). Measured
    verdict at bench shapes (102,400 x 900 -> 30, K=250, v5e): XLA child-ids
    1.11 ms vs this kernel 32.7 ms at tile=256 (tile>=512 and
    ``emit_features`` fail Mosaic compilation) -- the Mosaic lowering of the
    (tile, 900) x (900, F) HIGHEST-precision transform GEMM dominates, so
    the XLA assignment stays production; details in docs/performance.md
    ("Child-only fused transform+assign", Rejected list).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if precision is None:
        precision = jax.lax.Precision.HIGHEST

    raw = np.asarray(raw, np.float32)
    N, D = raw.shape
    F = proj.shape[1]
    K = centers.shape[0]

    N_pad = _round_up(max(N, tile), tile)
    D_pad = _round_up(D, 128)
    F_pad = _round_up(F, 128)
    K_pad = _round_up(K, 128)

    proj = np.asarray(proj, np.float32)
    centers = np.asarray(centers, np.float32)
    bias = np.asarray(mean, np.float32) @ proj  # (F,)
    c2adj = (centers * centers).sum(1) + 2.0 * centers @ bias

    idx, feats = _transform_assign_child_call(
        jnp.asarray(_pad2(raw, N_pad, D_pad)),
        jnp.asarray(_col(np.asarray(bins), N_pad, fill=-1)),
        jnp.asarray(_col(np.asarray(basis, np.int32), N_pad)),
        jnp.asarray(_col(np.asarray(target, np.int32), N_pad)),
        jnp.asarray(_pad2(proj, D_pad, F_pad)),
        jnp.asarray(_pad2(centers, K_pad, F_pad).T.copy()),
        jnp.asarray(_col(c2adj, K_pad, fill=0.0, dtype=np.float32)),
        jnp.asarray(_col(np.asarray(center_bin), K_pad, fill=-2)),
        jnp.asarray(_col(np.asarray(valid, np.int32), K_pad)),
        n_states=n_states, tile=tile, interpret=interpret,
        precision=precision, emit_features=emit_features,
    )
    out_idx = np.asarray(idx)[:N]
    if emit_features:
        return out_idx, np.asarray(feats)[:N, :F]
    return out_idx, None


def fused_assign_flux(
    fp, fc, pbins, cbins, w, basis_p, basis_c, target_c,
    centers, center_bin, valid, n_states,
    tile=128, interpret=None,
):
    """Fused stratified assign + flux accumulate.

    Host-facing wrapper: pads segments to the tile size (weight 0) and the
    center bank/dims to MXU-friendly shapes, then launches the kernel. The
    bank must be compact (valid-first, global-id order), as the production
    kernels require. Returns (parent_idx, child_idx, flux_matrix).

    Caveat (same as :func:`fused_transform_assign`): the stratified
    predict-time *target* short-circuit for parents (``target_p`` routing,
    applied by ``parallel.sharded._discretize_and_flux`` before ``basis_p``)
    is NOT implemented -- in a stratified build where parents can sit inside
    the target region this kernel's flux diverges from the production
    matrix. A documented performance experiment, not a production path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    fp = np.asarray(fp, np.float32)
    fc = np.asarray(fc, np.float32)
    N, d = fp.shape
    K = centers.shape[0]

    N_pad = _round_up(max(N, tile), tile)
    d_pad = _round_up(d, 128)
    K_pad = _round_up(K, 128)

    args = (
        jnp.asarray(_pad2(fp, N_pad, d_pad)),
        jnp.asarray(_pad2(fc, N_pad, d_pad)),
        jnp.asarray(_col(np.asarray(pbins), N_pad, fill=-1)),
        jnp.asarray(_col(np.asarray(cbins), N_pad, fill=-1)),
        jnp.asarray(_col(np.asarray(w, np.float32), N_pad, fill=0.0, dtype=np.float32)),
        jnp.asarray(_col(np.asarray(basis_p, np.int32), N_pad)),
        jnp.asarray(_col(np.asarray(basis_c, np.int32), N_pad)),
        jnp.asarray(_col(np.asarray(target_c, np.int32), N_pad)),
        jnp.asarray(_pad2(np.asarray(centers, np.float32), K_pad, d_pad).T.copy()),
        jnp.asarray(_col(np.asarray(center_bin), K_pad, fill=-2)),
        jnp.asarray(_col(np.asarray(valid, np.int32), K_pad)),
    )
    pidx, cidx, fm = _fused_call(
        *args, n_states=n_states, tile=tile, interpret=interpret
    )
    return (
        np.asarray(pidx)[:N],
        np.asarray(cidx)[:N],
        np.asarray(fm),
    )
