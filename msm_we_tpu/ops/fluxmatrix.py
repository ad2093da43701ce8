"""Weighted flux-matrix accumulation as a segment-sum scatter.

Replaces the reference's per-iteration Ray tasks building scipy ``coo_matrix``
objects that are summed on the driver (``_fluxmatrix.py:74-164,263-342``): all
iterations' (start_cluster, end_cluster, weight) triples are accumulated in one
jitted ``segment_sum`` over flattened indices. On a device mesh, each shard
accumulates its slice and a ``psum`` replaces the driver-side reduction
(see msm_we_tpu.parallel).

Semantics preserved exactly (``build_flux_matrix``, ``_fluxmatrix.py:98-164``):
basis/target membership overrides the cluster index (basis = n_clusters,
target = n_clusters + 1) for (parent in basis), (child in basis),
(child in target); the matrix is (n_clusters + 2)^2 and is divided by the
number of iterations used.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["flux_accumulate", "apply_state_overrides"]


@partial(jax.jit, static_argnames=("n_states",))
def flux_accumulate(start_idx, end_idx, weights, n_states):
    """Sum ``weights`` into a (n_states, n_states) matrix at (start, end).

    All arguments are flat arrays over every transition (all iterations
    concatenated); padding entries must carry weight 0.
    """
    flat = start_idx.astype(jnp.int32) * n_states + end_idx.astype(jnp.int32)
    fm = jax.ops.segment_sum(weights, flat, num_segments=n_states * n_states)
    return fm.reshape(n_states, n_states)


@jax.jit
def apply_state_overrides(
    start_idx, end_idx, start_in_basis, end_in_basis, end_in_target, n_clusters
):
    """Reassign basis/target members to their dedicated cluster indices.

    Mirrors ``_fluxmatrix.py:134-137``: end-in-target wins over end-in-basis
    is irrelevant since the reference applies target first then basis -- i.e.
    a child in *both* ends up in basis. Order preserved here.
    """
    basis_cluster = n_clusters
    target_cluster = n_clusters + 1
    end_idx = jnp.where(end_in_target, target_cluster, end_idx)
    start_idx = jnp.where(start_in_basis, basis_cluster, start_idx)
    end_idx = jnp.where(end_in_basis, basis_cluster, end_idx)
    return start_idx, end_idx
