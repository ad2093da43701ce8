"""Flux-matrix cleaning engine: SCC-based state removal, incremental
re-discretization, empty-bin remapping, and the clean-until-fixpoint loop.

Extracted from the ``modelWE`` facade (which delegates here unchanged).
Capability parity with the reference's ``organize_fluxMatrix`` /
``organize_stratified`` (``msm_we/_hamsm/_fluxmatrix.py:347-415``,
``_clustering.py:920-1142``), with two redesigns: the cleaning loop repeats
to a fixpoint (the reference's single pass can fail its own post-assert),
and the default incremental pass re-scores only rows whose winning center
was removed instead of re-discretizing everything.
"""
from __future__ import annotations

import numpy as np

from ._logging import log
from .binning import find_nearest_bin
from .features import _feat_parent_rows


def organize_flux_cleaning(model, remove_and_rediscretize, max_passes=10,
                           host_flux=False):
    """Shared flux-matrix cleaning driver (stratified + aggregated).

    Each pass: find strongly connected sets (with the artificial
    target->basis recycle edge), delete everything outside the largest
    via ``remove_and_rediscretize`` (the path-specific step), recompute
    the flux matrix at the new clustering, pcoord-sort and normalize.

    ``host_flux`` recomputes the per-pass flux matrix from the (already
    updated) dtrajs with the host f64 bincount even when a device mesh
    is enabled: the assignments are in hand after the incremental
    update, so the fused device step would only re-upload the feature
    arrays to recompute what is already known.

    Improvement over the reference: re-discretization can itself create
    new disconnected states (segments move to surviving clusters), which
    makes the reference's single pass fail its own post-assert
    (``_clustering.py:1140-1142``). Here the cycle repeats until the
    matrix is clean (bounded by ``max_passes``).
    """
    from .utils import find_connected_sets

    fmatrix_original = model.fluxMatrixRaw.copy()

    for _pass in range(max_passes):
        fmatrix = model.fluxMatrixRaw.copy()
        fmatrix[-1, -2] = 1.0
        connected_sets = find_connected_sets(fmatrix, directed=True)

        if len(connected_sets) == 1 and _pass > 0:
            break  # clean; keep the previous pass's results

        if len(connected_sets) == 1:
            log.info("Nothing to clean")
            states_to_remove = np.array([], dtype=int)
        else:
            states_to_remove = np.concatenate(connected_sets[1:]).astype(int)
            log.debug(f"Pass {_pass}: cleaning states {states_to_remove}")

        basis_target = {model.n_clusters, model.n_clusters + 1}
        if basis_target & set(states_to_remove.tolist()):
            raise RuntimeError(
                "The basis or target state is disconnected from the main "
                "flux network -- this data contains no transitions into "
                "the target (or out of the basis), so no steady-state "
                "model can be built from it. Use more iterations or a "
                "dataset with recycling events."
            )

        remove_and_rediscretize(states_to_remove)

        # Recompute the flux matrix at the new clustering (unsorted
        # global-id order), then pcoord-sort and normalize
        pcoord_sort_indices = model.get_cluster_centers()
        # Kept current for downstream consumers mapping raw (global-id)
        # assignments into the sorted fluxMatrix numbering (e.g. the
        # Aristoffian kh machinery in extended.py)
        model.pcoord_sort_indices = pcoord_sort_indices
        model._flux_prefer_host = host_flux
        try:
            model.get_fluxMatrix(*model._fluxMatrixParams)
        finally:
            model._flux_prefer_host = False
        fluxMatrix = model.fluxMatrixRaw[
            np.ix_(pcoord_sort_indices, pcoord_sort_indices)
        ]
        model.fluxMatrix = fluxMatrix / fluxMatrix.sum()
        # model.fluxMatrixRaw stays at the *new* clustering so the next
        # pass's SCC indices line up with the current global ids

    model.fluxMatrixRaw = fmatrix_original
    model.indBasis = np.array([model.n_clusters])
    model.indTargets = np.array([model.n_clusters + 1])
    model.nBins = model.n_clusters + 2
    model.update_sorted_cluster_centers()

    # Sanity check: everything is connected now
    fcheck = model.fluxMatrix.copy()
    fcheck[-1, -2] = 1.0
    remaining = find_connected_sets(fcheck, directed=True)
    assert len(remaining) == 1, "Still not clean after cleaning!"


def organize_stratified(model, max_passes=10, incremental=True):
    """Stratified cleaning (reference ``organize_stratified``,
    ``_clustering.py:920-1142``): remove everything outside the largest
    strongly connected set, remap emptied WE bins, re-discretize,
    recompute, sort by mean pcoord, normalize. See
    :func:`organize_flux_cleaning` for the shared loop semantics.

    ``incremental`` (default): removing centers never changes the
    nearest-center argmin of a row whose winner survives, so each pass
    re-scores ONLY segments whose winning center was removed or whose WE
    bin remap changed; everyone else's assignment is relabeled through
    the old-row -> new-global-id map, and the flux matrix is rebuilt
    with the host f64 bincount (no device feature re-upload). The full
    re-discretization per pass (reference ``_clustering.py:1101-1115``)
    is the ``incremental=False`` escape hatch; results are identical
    (asserted in ``test_coverage_round3.py``).
    """
    strat = model._strat

    def remove_and_rediscretize(states_to_remove):
        real_removals = states_to_remove[
            states_to_remove < strat.n_total_clusters
        ]
        # Snapshot the pre-removal numbering for the incremental update
        old_remap = strat.we_remap.copy()
        old_global = strat.global_id.copy()
        old_total = strat.n_total_clusters

        emptied = strat.remove_global_clusters(real_removals)
        # Bins never initialized also count as empty (reference
        # ``_clustering.py:1023-1034``)
        for b in range(strat.n_bins):
            if not strat.initialized[b]:
                emptied.add(b)

        model.n_clusters = strat.n_total_clusters
        assert model.n_clusters > 1, (
            "All clusters would be cleaned! You probably need more data, "
            "fewer clusters, or both."
        )

        populated = np.setdiff1d(np.arange(strat.n_bins), sorted(emptied))
        if emptied:
            log.warning(
                f"All clusters were cleaned from bins {emptied} (normal "
                "for source/target WE bins)."
            )
        for b in emptied:
            strat.set_remap(
                int(b), find_nearest_bin(model._bin_mapper, int(b), populated)
            )
        if incremental and model._parent_idx is not None:
            model._incremental_rediscretize(
                strat, old_remap, old_global, old_total
            )
        elif model._mesh is not None and model._parent_idx is None:
            # Deferred device build: the pass needs no host assignments at
            # all -- the bank surgery above is the whole re-discretization
            # (the next flux recompute re-assigns against the updated bank
            # on device, and the pcoord sort takes the device stats route
            # at scale). dtrajs stay deferred; any later host consumer
            # materializes them against the FINAL bank via
            # ``_ensure_discretized`` -- paying the (N,) download once
            # per build instead of once per pass.
            model.dtrajs = None
            model.pair_dtrajs = None
        else:
            model.launch_discretization()

    organize_flux_cleaning(
        model, remove_and_rediscretize, max_passes=max_passes,
        # Forcing the host bincount is only a win when the updated
        # assignments are already in hand (the incremental path); a
        # deferred device build must stay free to device-route the
        # per-pass flux recompute (big-N: no id download per pass)
        host_flux=incremental and model._parent_idx is not None,
    )
    model.cluster_mapping = {x: x for x in range(model.n_clusters + 2)}


def incremental_rediscretize(model, strat, old_remap, old_global, old_total):
    """Patch the stored dtrajs after center removal/remap instead of
    re-discretizing every segment (see :func:`organize_stratified`).

    Invariant: a masked argmin over a row's (remapped) WE-bin centers is
    unchanged by deleting centers the row did not win -- its winner is
    still present and still beats the (shrunk) candidate set. Only rows
    whose winner was deleted, or whose ``we_remap`` target changed (a
    different candidate set entirely), are re-scored, through the same
    jitted ``masked_assign`` scoring as the full path.

    Survivors (and basis/target rows, whose stored ids already carry the
    predict-time override priority -- target wins overlaps,
    ``stratified_clustering.py:159-169``) relabel through ONE
    old-state -> new-state table gather; removed states map to -1 and
    flag their rows for re-scoring. The previous where-chain rebuild
    was ~7 O(N) array passes per dtraj (5.3 s of a 2M cleaning stage on
    a 1-core host); this is ~3.
    """
    feats = model._featurize_all()
    pbins_raw, cbins_raw = model._raw_we_bins()
    masks = model._pc_masks()
    remap_changed = strat.we_remap != old_remap
    any_remap_changed = bool(remap_changed.any())

    # old-state -> new-state: surviving global ids renumber, the old
    # basis/target states become the new ones, removed ids stay -1.
    # int32 keeps the relabeled dtrajs the dtype the device path
    # produced (and halves the bytes of every later O(N) host pass)
    table = np.full(old_total + 2, -1, np.int32)
    still = np.flatnonzero(strat.valid)
    table[old_global[still]] = strat.global_id[still]
    table[old_total] = strat.basis_cluster_index
    table[old_total + 1] = strat.target_cluster_index

    def update(idx_old, rows_of, raw_bins, is_b, is_t):
        new_idx = table[idx_old]
        affected = new_idx < 0
        if any_remap_changed:
            affected |= remap_changed[raw_bins] & ~(is_b | is_t)
        if affected.any():
            sub = np.flatnonzero(affected)
            new_idx[sub] = model._assign_rows_subset(
                strat, rows_of(sub), strat.we_remap[raw_bins[sub]]
            )
        assert (new_idx >= 0).all()
        return new_idx

    # Row-getters instead of full arrays: the parent side reads the few
    # affected rows through the FeatureSet recipe without materializing
    # the (possibly lazy) full parent array
    parent_idx = update(
        model._parent_idx, lambda r: _feat_parent_rows(feats, r),
        pbins_raw, masks["basis_p"], masks["target_p"],
    )
    child_idx = update(
        model._child_idx, lambda r: feats["child"][r], cbins_raw,
        masks["basis_c"], masks["target_c"],
    )
    model._store_dtrajs(parent_idx, child_idx)


def assign_rows_subset(model, strat, X, bins_eff):
    """Stratified assignment for a (usually small) row subset, through
    the SAME scoring family the full discretization used: the host
    numpy formula when the original predict ran on host (no mesh and
    under ``HOST_BATCH_THRESHOLD`` rows), the jitted ``masked_assign``
    otherwise. Matching matters for the incremental==full identity: the
    two families' f32 roundings differ on near-ties. Device rows are
    padded to the next power of two so cleaning passes reuse a handful
    of compiled shapes."""
    from .ops.stratified import HOST_BATCH_THRESHOLD, _np_masked_assign

    full_rows = 2 * len(model._parent_idx)
    if model._mesh is None and full_rows < HOST_BATCH_THRESHOLD:
        strat._sync_host()
        flat = _np_masked_assign(
            np.asarray(X, np.float32), np.asarray(bins_eff),
            strat.centers, strat.center_bin, strat.valid,
        )
        return strat.global_id[flat]

    import jax.numpy as jnp

    from .ops.kmeans import masked_assign

    m = len(X)
    M = max(1 << (m - 1).bit_length(), 64)
    Xp = np.zeros((M, X.shape[1]), np.float32)
    Xp[:m] = X
    bp = np.full(M, -1, np.int32)
    bp[:m] = bins_eff
    strat._sync_host()
    flat = np.asarray(
        masked_assign(
            jnp.asarray(Xp), jnp.asarray(bp),
            jnp.asarray(strat.centers), jnp.asarray(strat.center_bin),
            jnp.asarray(strat.valid), n_bins=strat.n_bins,
        )
    )[:m]
    return strat.global_id[flat]


def organize_aggregated_simple(model, max_passes=10, incremental=True):
    """Aggregate-path cleaning: same SCC criterion applied to the
    aggregate cluster bank. (The reference's ``organize_aggregated`` is
    deprecated and raises -- ``_fluxmatrix.py:452-454``; this is the
    working equivalent built on the shared cleaning driver.)

    ``incremental`` (default) mirrors the stratified incremental pass:
    survivors relabel through the old-id -> new-id map (removal cannot
    change an argmin whose winner survives); only rows assigned to a
    removed center re-score against the kept bank. ``incremental=False``
    re-discretizes everything, as the reference would.
    """
    from .model import _AggregateClustersShim

    def remove_and_rediscretize(states_to_remove):
        old_n = model.n_clusters
        keep = np.setdiff1d(np.arange(old_n), states_to_remove)
        relabel = np.full(old_n, -1, np.int64)
        relabel[keep] = np.arange(len(keep))
        model.removed_clusters = states_to_remove
        model.clusters = _AggregateClustersShim(
            model.clusters.cluster_centers_[keep]
        )
        model.n_clusters = len(keep)
        if incremental and model._parent_idx is not None and len(keep) < old_n:
            feats = model._featurize_all()

            def upd(idx, rows_of):
                new_idx = relabel[idx]
                aff = np.flatnonzero(new_idx < 0)
                if len(aff):
                    new_idx[aff] = model.clusters.predict(rows_of(aff))
                return new_idx

            model._store_dtrajs(
                upd(model._parent_idx, lambda r: _feat_parent_rows(feats, r)),
                upd(model._child_idx, lambda r: feats["child"][r]),
            )
        elif incremental and model._parent_idx is not None:
            pass  # nothing removed: ids unchanged
        else:
            model._discretize_all_aggregated()

    organize_flux_cleaning(
        model, remove_and_rediscretize, max_passes=max_passes,
        host_flux=incremental,
    )
    model.removed_clusters = []
