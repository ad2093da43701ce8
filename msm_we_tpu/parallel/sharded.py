"""Mesh-sharded haMSM build step.

This is the TPU-native replacement for the reference's Ray fan-out: the whole
discretize -> flux-matrix computation runs as one ``shard_map`` program over a
('data', 'model') mesh.

* Segments (transitions) are sharded over ``data`` -- each device discretizes
  its slice of parent/child features and accumulates a partial flux matrix;
  an in-mesh ``psum`` over ``data`` replaces the reference's driver-side
  summation of Ray task results (``_fluxmatrix.py:311-342``).
* The stratified center bank is sharded over ``model`` -- each device scores
  its center shard (an MXU matmul) and the global nearest center is combined
  with an ``all_gather`` + argmin over the axis (tensor parallelism over
  centers).

The same kernel with a trivial 1x1 mesh is the single-chip fused step used by
``__graft_entry__.entry`` and the benchmark.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.6
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

__all__ = ["build_sharded_step", "fused_step_single"]

_BIG = jnp.float32(3.4e38)


def _local_masked_min(X, seg_bin, C, center_bin, valid, global_id):
    """Nearest valid same-bin center within the local center shard.

    Returns (min_dist, best_global_id) per row.
    """
    x2 = jnp.sum(X * X, axis=1, keepdims=True)
    c2 = jnp.sum(C * C, axis=1)[None, :]
    d2 = x2 - 2.0 * (X @ C.T) + c2
    ok = valid[None, :] & (center_bin[None, :] == seg_bin[:, None])
    d2 = jnp.where(ok, d2, _BIG)
    k = jnp.argmin(d2, axis=1)
    return jnp.take_along_axis(d2, k[:, None], axis=1)[:, 0], global_id[k]


def _combine_argmin(local_min, local_gid, axis_name):
    """Global argmin across a mesh axis, propagating the winner's global id."""
    mins = jax.lax.all_gather(local_min, axis_name)  # (axis, n_local)
    gids = jax.lax.all_gather(local_gid, axis_name)
    sel = jnp.argmin(mins, axis=0)
    return jnp.take_along_axis(gids, sel[None, :], axis=0)[0]


def _discretize_and_flux(
    fp, fc, pbins, cbins, basis_p, basis_c, target_c, w,
    centers, center_bin, valid, global_id, n_states, model_axis=None,
    target_p=None,
):
    """Shared kernel body: assign parent+child, apply overrides, scatter flux.

    The scatter accumulates in the dtype of ``w``: trace under
    ``jax.enable_x64(True)`` with float64 weights and the flux matrix is
    accumulated (and psum-reduced) in f64 while the distance matmuls stay
    f32 -- the facade's parity-grade device path. WE weights span hundreds
    of orders of magnitude (the reference does all accumulation in host
    f64, ``_fluxmatrix.py:311-342``), so an f32 scatter would flush small
    weights to zero and could silently disconnect low-weight states.
    """
    pmin, pgid = _local_masked_min(fp, pbins, centers, center_bin, valid, global_id)
    cmin, cgid = _local_masked_min(fc, cbins, centers, center_bin, valid, global_id)
    if model_axis is not None:
        pidx = _combine_argmin(pmin, pgid, model_axis)
        cidx = _combine_argmin(cmin, cgid, model_axis)
    else:
        pidx, cidx = pgid, cgid

    basis_cluster = n_states - 2
    target_cluster = n_states - 1
    # Reference override order (_fluxmatrix.py:134-137), composed with the
    # predict-time overrides the host path bakes into pair_dtrajs
    # (stratified_clustering.py:159-169): parent-in-target wins over
    # parent-in-basis; child-in-basis wins over child-in-target
    cidx = jnp.where(target_c, target_cluster, cidx)
    pidx = jnp.where(basis_p, basis_cluster, pidx)
    if target_p is not None:
        pidx = jnp.where(target_p, target_cluster, pidx)
    cidx = jnp.where(basis_c, basis_cluster, cidx)

    flat = pidx.astype(jnp.int32) * n_states + cidx.astype(jnp.int32)
    fm = jax.ops.segment_sum(w, flat, num_segments=n_states * n_states)
    return fm.reshape(n_states, n_states), pidx, cidx


def build_sharded_step(mesh, n_states, with_target_p=False):
    """Jitted (data, model)-sharded discretize+flux step over ``mesh``.

    Inputs (global shapes): parent/child features (N, d); parent/child WE bin
    ids, basis/target masks, weights (N,); center bank arrays (K, ...).
    N must divide the data axis, K the model axis. Returns the replicated
    (n_states, n_states) flux matrix.

    ``with_target_p`` appends a parent-in-target mask argument (the facade's
    parity path needs it; the benchmark/entry shapes don't carry one).
    Trace/call under ``jax.enable_x64(True)`` with f64 weights for the
    f64-accumulating production variant.
    """

    def body(fp, fc, pbins, cbins, basis_p, basis_c, target_c, w,
             centers, center_bin, valid, global_id, *rest):
        fm, _pidx, _cidx = _discretize_and_flux(
            fp, fc, pbins, cbins, basis_p, basis_c, target_c, w,
            centers, center_bin, valid, global_id, n_states,
            model_axis="model",
            target_p=rest[0] if rest else None,
        )
        # Sum partial flux matrices over the segment shards. Every model rank
        # computed identical values; the pmean is a semantic no-op that lets
        # the compiler prove replication over 'model' for out_specs=P().
        return jax.lax.pmean(jax.lax.psum(fm, "data"), "model")

    data_spec = P("data")
    model_spec = P("model")
    in_specs = (
        data_spec, data_spec, data_spec, data_spec,
        data_spec, data_spec, data_spec, data_spec,
        model_spec, model_spec, model_spec, model_spec,
    )
    if with_target_p:
        in_specs = in_specs + (data_spec,)
    sharded = shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=P())
    return jax.jit(sharded)


def build_sharded_assign(mesh):
    """Jitted data-parallel stratified assignment over ``mesh``.

    Shards segments over 'data' and the center bank over 'model'; returns the
    flat *global cluster ids* for every row. Used by the model facade for
    multi-chip discretization (``modelWE.enable_mesh``); N must divide the
    data axis and K the model axis (callers pad).
    """

    def body(X, seg_bin, centers, center_bin, valid, global_id):
        local_min, local_gid = _local_masked_min(
            X, seg_bin, centers, center_bin, valid, global_id
        )
        gid = _combine_argmin(local_min, local_gid, "model")
        # Identity on already-identical values; lets the compiler prove
        # replication over 'model' for the out_specs
        return jax.lax.pmax(gid, "model")

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("model"), P("model"), P("model"), P("model")),
        out_specs=P("data"),
    )
    return jax.jit(sharded)


@partial(jax.jit, static_argnames=("n_states",))
def fused_step_single(
    fp, fc, pbins, cbins, basis_p, basis_c, target_c, w,
    centers, center_bin, valid, global_id, n_states, target_p=None,
):
    """Single-device fused discretize+flux (the benchmark hot path)."""
    fm, pidx, cidx = _discretize_and_flux(
        fp, fc, pbins, cbins, basis_p, basis_c, target_c, w,
        centers, center_bin, valid, global_id, n_states, model_axis=None,
        target_p=target_p,
    )
    return fm, pidx, cidx


@partial(jax.jit, static_argnames=("n_iters",))
def steady_state_from_flux(fm, basis_mask, target_mask, n_iters=300):
    """f32 device tail: row-normalize with sink recycling + power iteration.

    The parity path solves this in f64 on the host (ops.linalg); this fused
    variant keeps the whole step on-device for the benchmark/entry point.
    """
    out = fm.sum(axis=1)
    T = jnp.where(out[:, None] > 0, fm / jnp.maximum(out, 1e-30)[:, None], 0.0)
    T = jnp.where(
        (out <= 0)[:, None] & (jnp.eye(fm.shape[0]) > 0), 1.0, T
    )
    # Target rows recycle uniformly into the basis
    n_basis = jnp.maximum(basis_mask.sum(), 1)
    recycle_row = jnp.where(basis_mask, 1.0 / n_basis, 0.0)
    T = jnp.where(target_mask[:, None], recycle_row[None, :], T)

    p = jnp.ones(fm.shape[0]) / fm.shape[0]

    def body(_i, p):
        p = T.T @ p
        return p / jnp.maximum(p.sum(), 1e-30)

    p = jax.lax.fori_loop(0, n_iters, body, p)
    flux = jnp.sum(jnp.where(target_mask[None, :], T, 0.0) * p[:, None])
    return T, p, flux
