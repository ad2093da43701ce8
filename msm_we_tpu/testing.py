"""Shared synthetic problem generators for dryruns and tests.

One definition of the tiny stratified-assignment problem, used by the
driver entry points (``__graft_entry__``) and the multi-process dryrun
(``parallel.distributed``) -- keeping the dyadic-weight construction (cell
sums exact in f32 under ANY summation order, so sharded-vs-single bitwise
equality tests indexing/collectives rather than float addition order) in
one place.
"""
from __future__ import annotations

import numpy as np

__all__ = ["tiny_stratified_problem", "pad_stratified_problem"]


def tiny_stratified_problem(n_rows=64, d=8, n_bins=4, k=4, seed=0):
    """Rows + compact center bank for one fused discretize+flux step."""
    rng = np.random.default_rng(seed)
    K = n_bins * k
    return dict(
        fp=rng.normal(size=(n_rows, d)).astype(np.float32),
        fc=rng.normal(size=(n_rows, d)).astype(np.float32),
        pbins=rng.integers(0, n_bins, n_rows).astype(np.int32),
        cbins=rng.integers(0, n_bins, n_rows).astype(np.int32),
        basis_p=(rng.random(n_rows) < 0.1),
        basis_c=(rng.random(n_rows) < 0.05),
        target_c=(rng.random(n_rows) < 0.05),
        # Dyadic weights (j/16): exact f32 sums under any order
        w=(rng.integers(1, 17, n_rows) / 16.0).astype(np.float32),
        centers=rng.normal(size=(K, d)).astype(np.float32),
        center_bin=np.repeat(np.arange(n_bins, dtype=np.int32), k),
        valid=np.ones(K, bool),
        n_states=K + 2,
    )


def pad_stratified_problem(problem, n_pad, k_pad):
    """Pad a :func:`tiny_stratified_problem` to ``n_pad`` rows and a
    ``k_pad``-row center bank — the exact inert-padding contract the facade
    applies before sharding (``discretization.sharded_pair_discretize``):
    junk rows carry bin -1 / weight 0 / masks False (zero-weight scatter
    contributions), bank pad rows are invalid (bin -2, masked out of every
    score). ``n_states`` is unchanged: padding must not change the answer.
    """
    from .features import _pad_rows_to

    p = dict(problem)
    fills = dict(
        fp=0.0, fc=0.0, pbins=-1, cbins=-1,
        basis_p=False, basis_c=False, target_c=False, w=0.0,
    )
    for key, fill in fills.items():
        p[key] = _pad_rows_to(np.asarray(problem[key]), n_pad, fill)
    K = len(problem["valid"])
    assert k_pad >= K and n_pad >= len(problem["w"])
    p["centers"] = _pad_rows_to(np.asarray(problem["centers"]), k_pad, 0.0)
    p["center_bin"] = _pad_rows_to(
        np.asarray(problem["center_bin"]), k_pad, -2
    )
    p["valid"] = _pad_rows_to(np.asarray(problem["valid"]), k_pad, False)
    return p
