"""modelWE facade: the reference-compatible haMSM model object.

Capability parity with the reference ``msm_we/msm_we.py`` ``modelWE`` (mixin
composite of data/dimensionality/clustering/fluxmatrix/analysis/plotting,
``msm_we.py:35-42``) and its attribute surface (``pSS``, ``Tmatrix``,
``fluxMatrix``, ``fluxMatrixRaw``, ``JtargetSS``, ``targetRMSD_centers``,
``dtrajs``, ``pair_dtrajs``, ``cluster_structures``, ``indBasis``,
``indTargets``, ``nBins``, ...).

Re-design (SURVEY.md section 7): instead of Ray task fan-out and fork
subprocesses, the engine
* ingests west.h5 once into cached host index arrays (data.WEDataset),
* featurizes + reduces all iterations into small device-resident feature
  arrays,
* discretizes every segment pair in one masked-distance matmul
  (ops.stratified), and
* accumulates the flux matrix with one jitted segment-sum
  (parallel.sharded._discretize_and_flux on device; f64 host bincount for
  the parity path).

The analysis tail (transition matrix, steady state, committors) runs in
float64 on the host for numerical parity (ops.linalg).

``use_ray`` / ``streaming`` / ``progress_bar`` keyword arguments are accepted
for API compatibility and ignored where the redesign makes them moot.
"""
from __future__ import annotations

from copy import deepcopy
from functools import lru_cache

import numpy as np

from ._logging import ProgressBar, log  # noqa: F401
from .binning import find_nearest_bin
from .data.westh5 import WEDataset
from .ops import linalg
from .ops.kmeans import kmeans_fit
from .ops.pca import (
    IdentityCoordinates,
    MomentAccumulator,
    PairMomentAccumulator,
)
from .ops.stratified import StratifiedKmeans

SUPPORTED_DIMREDUCE = ["none", "pca", "vamp", "tica", "batch-pca"]


def default_process_coordinates(coords):
    """Default featurization: flatten (n, atoms, 3) -> (n, atoms*3).

    The reference requires the user to monkey-patch ``processCoordinates``
    (``docs/usage.rst:41-60``); here a sane default exists and a user function
    can be passed to ``initialize`` or assigned as an attribute.
    """
    coords = np.asarray(coords)
    return coords.reshape(coords.shape[0], -1)


class _BinModelView:
    """Per-bin compatibility view with a ``cluster_centers_`` attribute."""

    def __init__(self, strat: StratifiedKmeans, bin_idx: int):
        self._strat = strat
        self._bin = bin_idx

    @property
    def cluster_centers_(self):
        return self._strat.centers_of_bin(self._bin)


class StratifiedClustersShim:
    """API-compatible stand-in for the reference ``StratifiedClusters``.

    Exposes ``cluster_models`` (per-bin views), ``we_remap``, ``bin_mapper``,
    ``predict`` with the reference's ``toggle``/``processing_from`` flip-flop
    (``stratified_clustering.py:101-212``), backed by the flattened
    :class:`~msm_we_tpu.ops.stratified.StratifiedKmeans` bank.
    """

    def __init__(self, bin_mapper, model, strat: StratifiedKmeans):
        self.bin_mapper = bin_mapper
        self.model = model
        self.strat = strat
        self.n_clusters_per_bin = strat.k
        self.processing_from = False
        self.toggle = False
        self.target_bins = set()
        self.basis_bins = set()

    @property
    def cluster_models(self):
        return [
            _BinModelView(self.strat, b) if self.strat.initialized[b] else object()
            for b in range(self.strat.n_bins)
        ]

    @property
    def we_remap(self):
        return {i: int(v) for i, v in enumerate(self.strat.we_remap)}

    @property
    def n_total_clusters(self):
        return self.strat.n_total_clusters

    def predict(self, coords):
        """Reference-compatible predict: bins from the model's pcoord lists.

        ``processing_from`` selects pcoord0List (parents) vs pcoord1List
        (children); ``toggle`` alternates after each call (fluxmatrix mode).
        """
        model = self.model
        pcoords = model.pcoord0List if self.processing_from else model.pcoord1List
        we_bins = self.bin_mapper.assign(pcoords)
        is_target = model.is_WE_target(pcoords)
        is_basis = model.is_WE_basis(pcoords)
        # The reference records REMAPPED bins (stratified_clustering.py:135,
        # 163-169: we_remap is applied before target_bins/basis_bins.add)
        remapped = self.strat.we_remap[we_bins]
        self.target_bins.update(np.unique(remapped[is_target]).tolist())
        self.basis_bins.update(np.unique(remapped[is_basis]).tolist())
        result = self.strat.predict(
            np.asarray(coords), we_bins, is_basis=is_basis, is_target=is_target
        )
        if self.toggle:
            self.processing_from = not self.processing_from
        return result


class _AggregateClustersShim:
    """Compatibility wrapper for aggregate (non-stratified) k-means."""

    def __init__(self, centers):
        self.cluster_centers_ = np.asarray(centers)

    def predict(self, X):
        from .ops.kmeans import assign_flat
        import jax.numpy as jnp

        idx, _ = assign_flat(
            jnp.asarray(np.asarray(X, np.float32)),
            jnp.asarray(self.cluster_centers_.astype(np.float32)),
            jnp.ones(len(self.cluster_centers_), bool),
        )
        return np.asarray(idx)



def _pad_rows_to(a, n_pad, fill):
    """Pad a row-sharded array to ``n_pad`` rows with ``fill`` (shared by the
    mesh discretization and flux paths -- padded rows must be inert there:
    weight 0, bin -1, masks False)."""
    n = len(a)
    if n_pad == n:
        return a
    out = np.full((n_pad,) + a.shape[1:], fill, dtype=a.dtype)
    out[:n] = a
    return out


def _check_live_centers(strat, pbins, cbins):
    """Predict-path guard shared by every device program that assigns rows
    to the stratified bank: a present (remapped) WE bin with no live
    centers and no remap would silently produce junk ids on device.
    Single implementation: ``StratifiedKmeans.check_live_bins``."""
    strat.check_live_bins(np.concatenate([pbins, cbins]))


def _id_columns_to_host(both, n_rows):
    """Download a device (N_pad, 2) stacked-id array and split it into
    contiguous int32 (parent_idx, child_idx) columns, dropping pad rows."""
    both = np.asarray(both)[:n_rows].astype(np.int32)
    return np.ascontiguousarray(both[:, 0]), np.ascontiguousarray(both[:, 1])


class FeatureSet(dict):
    """Concatenated per-segment feature arrays (see ``modelWE._featurize_all``).

    Under the continuity dedup the parent feature array is redundant with
    the child array: parent row ``i`` is a bit-copy of child row ``src[i]``
    (WE continuity), except for a few directly-featurized *fallback* rows
    (iteration 1 and recycled segments). This class stores that recipe
    instead of the materialized array: host consumers that index
    ``feats["parent"]`` trigger a one-time materialization, subset
    consumers use :meth:`parent_rows` (no full gather), and the device
    pipeline (``modelWE._device_row_feats``) performs the gather on-device
    from the child upload — large builds never pay the host gather or the
    redundant parent transfer (~240 MB at 2M segments, 30 components).
    """

    def __init__(self, *args, parent_src=None, parent_fb_rows=None,
                 parent_fb_feats=None, **kw):
        super().__init__(*args, **kw)
        # Recipe: parent[i] = child[parent_src[i]] where parent_src[i] >= 0;
        # rows with parent_src[i] < 0 appear in parent_fb_rows (sorted
        # ascending) with their directly-featurized values in parent_fb_feats
        self._parent_src = parent_src
        self._parent_fb_rows = parent_fb_rows
        self._parent_fb_feats = parent_fb_feats

    @property
    def parent_is_lazy(self):
        return dict.__getitem__(self, "parent") is None

    def __getitem__(self, key):
        val = dict.__getitem__(self, key)
        if val is None and key == "parent":
            val = self.parent_rows()
            # Keep the recipe: the device path still prefers the on-device
            # gather even after a host consumer forced materialization
            dict.__setitem__(self, "parent", val)
        return val

    # Accessors that would otherwise leak the raw None placeholder
    # materialize first. (Plain ``dict(fs)`` bypasses all overrides via
    # CPython's fast path and is not interceptable -- use ``fs.copy()``.)
    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    def __reduce__(self):
        # Custom pickling: dict-subclass pickling walks obj.items(), which
        # (overridden below) would materialize the lazy parent and bloat
        # the pickle with a redundant array; ship the recipe instead
        return (
            _featureset_unpickle,
            (
                dict.copy(self),
                self._parent_src,
                self._parent_fb_rows,
                self._parent_fb_feats,
            ),
        )

    def _materialized(self):
        if self.parent_is_lazy:
            self["parent"]
        return self

    def items(self):
        return dict.items(self._materialized())

    def values(self):
        return dict.values(self._materialized())

    def copy(self):
        return FeatureSet(
            dict.copy(self._materialized()),
            parent_src=self._parent_src,
            parent_fb_rows=self._parent_fb_rows,
            parent_fb_feats=self._parent_fb_feats,
        )

    def parent_rows(self, rows=None):
        """Parent feature rows without materializing the full array.

        ``rows``: integer indices, a boolean mask, or None for all rows."""
        parent = dict.__getitem__(self, "parent")
        if parent is not None:
            return parent if rows is None else parent[rows]
        child = dict.__getitem__(self, "child")
        src = self._parent_src
        fbr = self._parent_fb_rows
        fbv = self._parent_fb_feats
        if rows is None:
            out = child[np.maximum(src, 0)]
            if len(fbr):
                out[fbr] = fbv
            return out
        rows = np.asarray(rows)
        if rows.dtype == bool:
            rows = np.flatnonzero(rows)
        rows = rows.astype(np.int64, copy=False)
        out = child[np.maximum(src[rows], 0)]
        if len(fbr):
            pos = np.minimum(np.searchsorted(fbr, rows), len(fbr) - 1)
            hit = fbr[pos] == rows
            if hit.any():
                out[hit] = fbv[pos[hit]]
        return out


def _featureset_unpickle(d, src, fbr, fbv):
    return FeatureSet(d, parent_src=src, parent_fb_rows=fbr, parent_fb_feats=fbv)


def _feat_parent_rows(feats, rows):
    """Subset of parent feature rows; avoids full materialization for
    :class:`FeatureSet`, falls back to plain indexing for legacy dicts."""
    if isinstance(feats, FeatureSet):
        return feats.parent_rows(rows)
    return feats["parent"][rows]


@lru_cache(maxsize=None)
def _parent_gather_fn(sharding, with_fallback):
    """Jitted on-device parent-from-child row gather (memoized per sharding
    like the other mesh builders; retracing per build would dominate)."""
    import jax
    import jax.numpy as jnp

    if with_fallback:
        def f(child, src, fb_rows, fb_vals):
            return jnp.take(child, src, axis=0).at[fb_rows].set(fb_vals)
    else:
        def f(child, src):
            return jnp.take(child, src, axis=0)

    return jax.jit(f, out_shardings=sharding)


def _device_parent_from_child(child_dev, feats, N_pad, row_sharding):
    """Build the padded parent feature array ON DEVICE from the child upload
    and the :class:`FeatureSet` recipe — the "features born on device" path:
    no host gather, no redundant parent upload. Bitwise-identical rows to
    the host materialization (gather and scatter copy f32 bits exactly);
    pad rows (weight 0, bin -1) read child row 0, which no consumer looks at.
    """
    import jax

    src = feats._parent_src
    idx_dtype = np.int64 if N_pad > np.iinfo(np.int32).max else np.int32
    src_pad = np.zeros(N_pad, idx_dtype)
    src_pad[: len(src)] = np.maximum(src, 0)
    src_dev = jax.device_put(src_pad, row_sharding)
    fbr = feats._parent_fb_rows
    if len(fbr):
        fn = _parent_gather_fn(row_sharding, True)
        return fn(
            child_dev, src_dev,
            np.asarray(fbr, idx_dtype), np.asarray(feats._parent_fb_feats),
        )
    return _parent_gather_fn(row_sharding, False)(child_dev, src_dev)


class modelWE:
    """History-augmented Markov state model estimation from WE data."""

    # Force the fused device scatter+psum flux program even on one process
    # (where the host f64 bincount of the device ids is measured faster and
    # is the default -- get_fluxMatrix). Class-level so tests can pin the
    # device program for parity coverage.
    _force_device_flux = False

    class BlockValidationError(Exception):
        pass

    def __init__(self):
        self.modelName = None
        self.pcoord_ndim = None
        self.pcoord_len = None
        self.tau = None
        self.n_lag = 0

        self._basis_pcoord_bounds = None
        self._target_pcoord_bounds = None
        self.basis_bin_centers = None
        self.target_bin_centers = None
        # Singular bin centers stay None -> NaN in sort arrays, which is what
        # pins basis/target to the last two positions of the pcoord sort
        # (reference behavior via None->NaN assignment, _clustering.py:1544-1545)
        self.target_bin_center = None
        self.basis_bin_center = None

        self.reference_structure = None
        self.reference_coord = None
        self.basis_coords = None
        self.nAtoms = None
        self.coord_ndim = 3

        self.coordinates = None
        self.ndim = None
        self.dimReduceMethod = None
        self.dedup_coordinates = "auto"

        self.n_clusters = None
        self.clusters = None
        self.clustering_method = None
        self.dtrajs = None
        self.pair_dtrajs = None
        self._parent_idx = None
        self._child_idx = None

        self.fluxMatrixRaw = None
        self.fluxMatrix = None
        self.Tmatrix = None
        self.pSS = None
        self.JtargetSS = None
        self.lagtime = None
        self.indBasis = None
        self.indTargets = None
        self.nBins = None
        self.q = None
        self.Jq = None
        self.J = None
        self.fit_parameters = {}
        self.slope_overcorrected = None

        self.targetRMSD_centers = None
        self.targetRMSD_minmax = None
        self.targetRMSD_all = None
        self.all_centers = None
        self.sorted_centers = None
        self.removed_clusters = []
        self.cluster_structures = None
        self.cluster_structure_weights = None
        self.structure_iteration_segments = None
        self.pcoord_cache = None

        self.validation_models = []
        self.validation_iterations = []
        self.post_cluster_model = None
        self.pre_discretization_model = None
        self.use_weights_in_clustering = False

        self.processCoordinates = default_process_coordinates

        # Engine internals
        self._dataset = None
        self._features = None  # dict with concatenated parent/child features
        self._strat = None
        self._bin_mapper = None
        self._mesh = None
        self._fluxMatrixParams = None
        self._cluster_seed = 0

    # ------------------------------------------------------------------ init
    def initialize(
        self,
        fileSpecifier,
        refPDBfile,
        modelName,
        basis_pcoord_bounds=None,
        target_pcoord_bounds=None,
        dim_reduce_method="none",
        tau=None,
        pcoord_ndim=1,
        auxpath="coord",
        _suppress_boundary_warning=False,
        use_weights_in_clustering=False,
        processCoordinates=None,
        dedup_coordinates="auto",
    ):
        """Set up the model (reference ``initialize``, ``msm_we.py:143-277``).

        ``dedup_coordinates``: WE trajectories are continuous -- a segment's
        frame-0 coordinates are a copy of its parent's final frame -- so
        parent features can be *gathered* from the previous iteration's child
        features instead of re-read and re-featurized (halving coordinate
        I/O and featurization work; the reference always does both twice).
        ``"auto"`` (default) verifies the invariant on the data (bitwise raw
        continuity + a sampled feature check that also catches
        non-row-independent featurizers) and falls back to the direct path
        on any mismatch; ``True`` forces the gather; ``False`` disables it.
        """
        if dedup_coordinates not in (True, False, "auto"):
            raise ValueError(
                "dedup_coordinates must be True, False, or 'auto', got "
                f"{dedup_coordinates!r}"
            )
        # Normalize np.bool_/1/0 (accepted by the `in` check above) to the
        # literals the featurization dispatch tests against.
        if dedup_coordinates != "auto":
            dedup_coordinates = bool(dedup_coordinates)
        self.dedup_coordinates = dedup_coordinates
        self.modelName = modelName
        if isinstance(fileSpecifier, str):
            fileList = fileSpecifier.split(" ")
            log.warning("HDF5 file paths provided as a string is deprecated; pass a list.")
        else:
            fileList = list(fileSpecifier)
        self.fileList = fileList
        self.n_data_files = len(fileList)
        self.pcoord_ndim = pcoord_ndim
        # Provisional; replaced by the file's actual frames-per-segment on
        # the first load_iter_data (reference ``_data.py:843``).
        self.pcoord_len = 2
        self.auxpath = auxpath

        if basis_pcoord_bounds is not None:
            self.basis_pcoord_bounds = basis_pcoord_bounds
        elif not _suppress_boundary_warning:
            log.warning("No basis coord bounds provided to initialize().")
        if target_pcoord_bounds is not None:
            self.target_pcoord_bounds = target_pcoord_bounds
        elif not _suppress_boundary_warning:
            log.warning("No target coord bounds provided to initialize().")

        if tau is None:
            log.warning("No tau provided, defaulting to 1.")
            tau = 1.0
        self.tau = float(tau)

        self.refPDBfile = refPDBfile
        self.set_topology(refPDBfile)

        if dim_reduce_method is None:
            log.warning("No dimensionality reduction method provided; defaulting to pca.")
            self.dimReduceMethod = "pca"
        else:
            assert dim_reduce_method in SUPPORTED_DIMREDUCE, (
                f"dim_reduce_method must be one of {SUPPORTED_DIMREDUCE}"
            )
            self.dimReduceMethod = dim_reduce_method

        if processCoordinates is not None:
            self.processCoordinates = processCoordinates

        self.use_weights_in_clustering = use_weights_in_clustering

        self._dataset = WEDataset(fileList, pcoord_ndim=pcoord_ndim, auxpath=auxpath)
        # Re-initialization must drop every cache derived from a previous
        # dataset (same invalidation load(h5_paths=...) performs): stale
        # features or cluster banks would silently describe the old data
        self._features = None
        self._raw_bins_cache = None
        self._strat = None
        self._bin_mapper = None
        self._fluxMatrixParams = None
        self.clusters = None
        self.dtrajs = None
        try:
            self.load_iter_data(1)
            # Probe the augmented coordinates too: the flag must reflect
            # auxdata presence, not just seg_index (reference msm_we.py:265-273
            # calls load_iter_coordinates0 here)
            self._dataset.iter_coord_pairs(1)
            self.coordsExist = True
        except KeyError:
            # Only the coords-not-written-yet case is benign (reference
            # msm_we.py:270); anything else should surface loudly
            if not _suppress_boundary_warning:
                log.warning("Model initialized, but coordinates do not exist yet.")
            self.coordsExist = False

    # ------------------------------------------------------- bounds & states
    @property
    def basis_pcoord_bounds(self):
        return self._basis_pcoord_bounds

    @basis_pcoord_bounds.setter
    def basis_pcoord_bounds(self, bounds):
        self._basis_pcoord_bounds = self._check_bounds(bounds)
        self.basis_bin_centers = self._bin_centers_of_bounds(self._basis_pcoord_bounds)
        self._pc_masks_cache = None

    @property
    def target_pcoord_bounds(self):
        return self._target_pcoord_bounds

    @target_pcoord_bounds.setter
    def target_pcoord_bounds(self, bounds):
        self._target_pcoord_bounds = self._check_bounds(bounds)
        self.target_bin_centers = self._bin_centers_of_bounds(self._target_pcoord_bounds)
        self._pc_masks_cache = None

    # Deprecated 1-D aliases (reference msm_we.py:279-298,365-387)
    @property
    def WEbasisp1_bounds(self):
        return self.basis_pcoord_bounds

    @WEbasisp1_bounds.setter
    def WEbasisp1_bounds(self, bounds):
        self.basis_pcoord_bounds = bounds

    @property
    def WEtargetp1_bounds(self):
        return self.target_pcoord_bounds

    @WEtargetp1_bounds.setter
    def WEtargetp1_bounds(self, bounds):
        self.target_pcoord_bounds = bounds

    def _check_bounds(self, bounds):
        bounds = np.array(bounds, dtype=float)
        if bounds.ndim == 1:
            log.warning("1-D boundaries should be [[lower, upper]]; converting.")
            bounds = bounds.reshape(1, 2)
        assert bounds.shape == (self.pcoord_ndim, 2), (
            f"Shape of bounds was {bounds.shape}, should've been "
            f"({self.pcoord_ndim}, 2)"
        )
        assert np.all(bounds[:, 0] < bounds[:, 1]), (
            "A boundary has a lower bound larger than its upper bound"
        )
        return bounds

    @staticmethod
    def _bin_centers_of_bounds(bounds):
        """Per-dim bin center: mean of finite bounds, else the finite one."""
        centers = np.full(len(bounds), np.nan)
        for i, (lo, hi) in enumerate(bounds):
            if np.isfinite(lo) and np.isfinite(hi):
                centers[i] = 0.5 * (lo + hi)
            else:
                centers[i] = lo if np.isfinite(lo) else hi
        return centers

    def _in_bounds(self, pcoords, bounds):
        from .utils import pcoord_in_bounds

        return pcoord_in_bounds(pcoords, bounds[: self.pcoord_ndim])

    def is_WE_basis(self, pcoords):
        """Segments whose pcoords lie inside the basis bounds (open interval,
        reference ``msm_we.py:462-492``)."""
        return self._in_bounds(pcoords, self.basis_pcoord_bounds)

    def is_WE_target(self, pcoords):
        return self._in_bounds(pcoords, self.target_pcoord_bounds)

    def _pc_masks(self):
        """Basis/target membership of every segment's parent/child pcoord,
        cached on the current feature arrays: a full build consults the same
        four boolean masks from clustering, discretization, the flux build,
        and every cleaning pass. Invalidated when the bounds change
        (setters), the features are recomputed, or ``is_WE_basis``/
        ``is_WE_target`` are monkey-patched on the *instance* before the
        first consumer runs (the reference's supported override point)."""
        feats = self._featurize_all()
        cache = getattr(self, "_pc_masks_cache", None)
        if cache is not None and cache[0] is feats:
            return cache[1]
        masks = dict(
            basis_p=np.asarray(self.is_WE_basis(feats["pcoord0"]), dtype=bool),
            basis_c=np.asarray(self.is_WE_basis(feats["pcoord1"]), dtype=bool),
            target_p=np.asarray(self.is_WE_target(feats["pcoord0"]), dtype=bool),
            target_c=np.asarray(self.is_WE_target(feats["pcoord1"]), dtype=bool),
        )
        # Rows inside BOTH regions (overlapping bounds -- rare): the only
        # rows where the flux build's basis-wins override order differs
        # from the predict-time target-wins order baked into the dtrajs.
        # None when absent so consumers can skip the fixup entirely.
        for ov, a, b in (
            ("overlap_p", "basis_p", "target_p"),
            ("overlap_c", "basis_c", "target_c"),
        ):
            o = masks[a] & masks[b]
            masks[ov] = o if o.any() else None
        self._pc_masks_cache = (feats, masks)
        return masks

    # ------------------------------------------------------------- topology
    def set_topology(self, topology):
        """Reference ``set_topology`` (``msm_we.py:1011-1078``); mdtraj is
        optional -- a dict of coords/nAtoms/coord_ndim always works."""
        if isinstance(topology, dict):
            self.reference_coord = topology.get("coords")
            self.nAtoms = topology["nAtoms"]
            self.coord_ndim = topology["coord_ndim"]
            return
        if isinstance(topology, str):
            if topology.endswith("dat"):
                self.reference_coord = np.loadtxt(topology)
                self.nAtoms = 1
                self.coord_ndim = 3
                return
            import mdtraj as md

            if topology.endswith("prmtop"):
                struct = md.load_prmtop(topology)
                self.reference_structure = struct
                self.nAtoms = struct.n_atoms
                self.coord_ndim = 3
                return
            struct = md.load(topology)
            self.reference_structure = struct
            self.reference_coord = np.squeeze(struct._xyz)
            self.nAtoms = struct.topology.n_atoms
            self.coord_ndim = 3
            return
        # mdtraj Trajectory/Topology duck-typing
        if hasattr(topology, "_xyz"):
            self.reference_structure = topology
            self.reference_coord = np.squeeze(topology._xyz)
            self.nAtoms = topology.topology.n_atoms
            self.coord_ndim = 3
            return
        raise NotImplementedError("Unsupported topology")

    def set_basis(self, basis):
        if isinstance(basis, dict):
            self.basis_coords = basis["coords"]
            return
        if isinstance(basis, str):
            if basis.endswith("dat"):
                self.basis_coords = np.loadtxt(basis)
                return
            import mdtraj as md

            self.basis_coords = np.squeeze(md.load(basis)._xyz)
            return
        if hasattr(basis, "_xyz"):
            self.basis_coords = np.squeeze(basis._xyz)
            return
        raise NotImplementedError("Unsupported basis")

    # ----------------------------------------------------------------- data
    def get_iterations(self):
        """Populate maxIter / numSegments (reference ``_data.py:934-993``)."""
        self.numSegments = self._dataset.numSegments
        self.maxIter = self._dataset.maxIter

    def load_iter_data(self, n_iter):
        """Compat: expose the reference's per-iteration attributes."""
        d = self._dataset.iter_data(n_iter)
        if self._dataset.pcoord_len is not None:
            # Read from the file, as the reference does (``_data.py:843``)
            self.pcoord_len = self._dataset.pcoord_len
        self.n_iter = n_iter
        self.westList = d["west_idx"]
        self.segindList = d["seg_idx"]
        self.weightList = d["weights"]
        self.nSeg = d["n_segs"]
        self.pcoord0List = d["pcoord0"]
        self.pcoord1List = d["pcoord1"]
        if not hasattr(self, "seg_weights") or self.seg_weights is None:
            self.seg_weights = {}
        self.seg_weights[n_iter] = d["weights"]

    def get_iter_coordinates(self, iteration):
        """Final-frame coordinates of an iteration's segments (NaN dropped)."""
        self.load_iter_data(iteration)
        return self._dataset.iter_child_coords(iteration)

    @property
    def n_lag(self):
        return self._n_lag

    @n_lag.setter
    def n_lag(self, lag):
        """Any lag >= 0. The reference gates this to 0 (``msm_we.py:353-359``)
        even though it carries (unreachable) lag machinery; here lag > 0 is a
        supported extension (see ``WEDataset.iter_transition_pairs``)."""
        lag = int(lag)
        if lag < 0:
            raise ValueError(f"n_lag must be >= 0, got {lag}")
        if lag > 0:
            log.info(
                f"Using lag n_lag={lag} ({lag + 1} tau transitions); this "
                "extends the reference, which only supports n_lag=0."
            )
        self._n_lag = lag

    def get_transition_data_lag0(self):
        """Populate ``coordPairList``/``transitionWeights``/``departureWeights``
        for the currently loaded iteration (reference ``_data.py:254-320``)."""
        parent, child, weights = self._dataset.iter_coord_pairs(self.n_iter)
        self.coordPairList = np.stack([parent, child], axis=-1)
        self.transitionWeights = weights.copy()
        self.departureWeights = weights.copy()

    def get_seg_histories(self, n_hist):
        """Walk each current segment's ancestry ``n_hist`` iterations back.

        Populates ``seg_histories`` (segment indices; negative once a walker
        was recycled) and ``weight_histories``, as the reference does by
        re-reading seg_index chains (``_data.py:322-421``).
        """
        if n_hist > self.n_iter:
            log.warning(f"Too much history requested; reducing n_hist to {self.n_iter}")
            n_hist = self.n_iter
        self.n_hist = n_hist

        n_seg = self.nSeg
        seg_histories = np.zeros((n_seg, n_hist + 1), dtype=int)
        weight_histories = np.zeros((n_seg, n_hist))

        # Indices are positions in the *concatenated* per-iteration arrays
        # (globalized parent ids), so multi-file datasets walk correctly --
        # the reference instead stores file-local ids plus a westList to
        # re-match (``_data.py:785-795``). Each history step is one gather
        # over all segments (the reference walks one python h5 read per
        # segment per step, ``_data.py:322-421``).
        seg_histories[:, 0] = np.arange(n_seg)
        warped = np.zeros(n_seg, dtype=bool)
        for iH in range(1, n_hist + 1):
            iter_back = self.n_iter - iH + 1
            d = self._dataset.iter_data(iter_back)
            cur = seg_histories[:, iH - 1]
            # Recycled: the ancestry ends permanently here (the reference's
            # 'warped' latch, _data.py:392-398); without it the walk would
            # resume from segment 0's data
            warped |= cur < 0
            active = ~warped
            idx = cur[active]
            seg_histories[active, iH] = d["parent_ids_global"][idx]
            weight_histories[active, iH - 1] = d["weights"][idx]
        self.seg_histories = seg_histories[:, :-1].astype(int)
        self.weight_histories = weight_histories

    def get_traj_coordinates(self, from_iter, traj_length):
        """Reconstruct each current walker's continuous coordinate history.

        Walks ``traj_length`` iterations of ancestry back from ``from_iter``
        and collects each ancestor's final-frame coordinates; histories are
        truncated where a walker was recycled (parent id < 0). Populates
        ``self.trajSet`` with one (n_steps, n_atoms, 3) array per current
        segment (reference ``_data.py:761-806``).
        """
        if traj_length > from_iter:
            traj_length = from_iter - 1
            log.warning(f"Trajectory length too long: set to {traj_length}")
        self.load_iter_data(from_iter)
        self.get_seg_histories(traj_length)

        n_seg = self.nSeg
        # seg_histories[:, h] = segment index h iterations back (<0 = recycled)
        coords_by_iter = {}
        for h in range(traj_length):
            it = from_iter - h
            coords_by_iter[it] = self._dataset._iter_frame_block(it, -1)

        traj_set = []
        for iS in range(n_seg):
            frames = []
            for h in range(traj_length - 1, -1, -1):
                idx = self.seg_histories[iS, h] if h < self.seg_histories.shape[1] else -1
                if idx < 0:
                    frames = []  # recycled: history ends here
                    continue
                frames.append(coords_by_iter[from_iter - h][idx])
            traj_set.append(np.array(frames))
        self.trajSet = traj_set
        return traj_set

    def get_coordSet(self, last_iter, streaming=None, progress_bar=None):
        """Build ``pcoordSet`` (+ ``all_coords`` when not streaming).

        Reference ``_data.py:677-759``; streaming keeps only pcoords.
        """
        if streaming is None:
            streaming = True
        parts = []
        coords_parts = [] if not streaming else None
        for i in range(1, last_iter + 1):
            d = self._dataset.iter_data(i)
            p = d["pcoord1"].copy()
            if not streaming:
                child = self._dataset._iter_frame_block(i, -1)
                bad = np.isnan(child).any(axis=tuple(range(1, child.ndim)))
                p[bad] = np.nan
                coords_parts.append(child)
            parts.append(p)
        self.pcoordSet = np.concatenate(parts, axis=0)
        if not streaming:
            self.all_coords = np.concatenate(coords_parts, axis=0)
        self.first_iter = 1
        self.last_iter = last_iter

    # ------------------------------------------------- dimensionality reduce
    DEVICE_MOMENTS_MIN_DIM = 256
    """Feature dimensionality above which dimReduce accumulates per-batch
    moments on device (f32 matmuls, f64 Chan combine across batches) instead
    of host f64 numpy: the d x d second-moment matmul is the dominant cost of
    a large PCA fit and belongs on the MXU. Below it, host f64 is both exact
    and faster than a device round trip."""

    def dimReduce(
        self,
        first_iter=1,
        first_rough_iter=None,
        last_iter=None,
        rough_stride=10,
        fine_stride=1,
        variance_cutoff=0.95,
        use_weights=True,
        progress_bar=None,
        device_moments=None,
    ):
        """Fit the dimensionality-reduction transform (reference
        ``_dimensionality.py:110-345``).

        ``pca`` uses exact streamed moments (one pass; no rough pass needed --
        the covariance the reference approximates with two iPCA passes is
        computed exactly). ``tica``/``vamp`` fit from (parent, child) pairs
        with WE weights (weights unsupported for vamp, as in the reference).

        ``device_moments``: None (auto -- device when the feature dim is at
        least ``DEVICE_MOMENTS_MIN_DIM``), or True/False to force. Device
        moments run the per-batch second-moment matmuls in f32 on the
        accelerator, combined across batches in f64 (Chan); the covariance
        differs from the exact host path by ~batch-count * f32 eps.
        """
        if last_iter is None:
            last_iter = self.maxIter

        method = self.dimReduceMethod
        if method == "none":
            self.ndim = int(self.coord_ndim * self.nAtoms)
            self.coordinates = IdentityCoordinates()
            return

        def moment_dtype(n_features):
            if device_moments is None:
                use_dev = n_features >= self.DEVICE_MOMENTS_MIN_DIM
            else:
                use_dev = bool(device_moments)
            return np.float32 if use_dev else np.float64

        if method == "pca":
            # Stream one iteration at a time -- raw coordinates never
            # accumulate in host RAM (the accumulator's host f64 path is
            # plain numpy, so ragged per-iteration shapes cost nothing)
            acc = None
            for i in range(first_iter, last_iter, fine_stride):
                c = self._dataset.iter_child_coords(i)
                if not c.shape[0]:
                    continue
                feats = np.asarray(self.processCoordinates(c))
                if acc is None:
                    acc = MomentAccumulator(
                        feats.shape[1], dtype=moment_dtype(feats.shape[1])
                    )
                acc.add(feats)
            if acc is None:
                raise ValueError(
                    f"No usable coordinates in iterations "
                    f"[{first_iter}, {last_iter}) at stride {fine_stride}; "
                    "cannot fit the dimensionality reduction."
                )
            self.coordinates = acc.finalize(variance_cutoff=variance_cutoff)
            self.ndim = self.coordinates.n_components
            return

        if method in ("tica", "vamp", "batch-pca"):
            # Streamed per iteration, as above
            flat_acc = None
            pair_acc = None
            use_w = use_weights and method == "tica"
            for iteration in range(first_iter, last_iter, fine_stride):
                parent, child, weights = self._dataset.iter_coord_pairs(iteration)
                good = np.flatnonzero(
                    ~(
                        np.isnan(parent).any(axis=tuple(range(1, parent.ndim)))
                        | np.isnan(child).any(axis=tuple(range(1, child.ndim)))
                    )
                )
                if len(good) == 0:
                    continue
                f0 = np.asarray(self.processCoordinates(parent[good]))
                f1 = np.asarray(self.processCoordinates(child[good]))
                w = weights[good]

                if method == "batch-pca":
                    if flat_acc is None:
                        flat_acc = MomentAccumulator(
                            f0.shape[1], dtype=moment_dtype(f0.shape[1])
                        )
                    flat_acc.add(f0)
                    flat_acc.add(f1)
                else:
                    if pair_acc is None:
                        # Pair moments are per-batch centered with an f64
                        # Chan-style combine (see PairMomentAccumulator), so
                        # the f32 device path is as safe as the PCA one
                        pair_acc = PairMomentAccumulator(
                            f0.shape[1], dtype=moment_dtype(f0.shape[1])
                        )
                    pair_acc.add(f0, f1, w if use_w else None)

            if flat_acc is None and pair_acc is None:
                raise ValueError(
                    f"No usable coordinate pairs in iterations "
                    f"[{first_iter}, {last_iter}) at stride {fine_stride}; "
                    "cannot fit the dimensionality reduction."
                )
            if method == "batch-pca":
                self.coordinates = flat_acc.finalize(variance_cutoff=1.0)
                self.ndim = self.coordinates.n_components
            else:
                self.coordinates = pair_acc.finalize(
                    method=method, var_cutoff=variance_cutoff
                )
                self.ndim = self.coordinates.output_dimension
            return

        raise NotImplementedError(f"dimReduceMethod {method}")

    def reduceCoordinates(self, coords):
        """processCoordinates then the fitted transform (reference
        ``_dimensionality.py:36-67``)."""
        if self.dimReduceMethod in SUPPORTED_DIMREDUCE:
            return self.coordinates.transform(self.processCoordinates(coords))
        raise RuntimeError("dimReduceMethod undefined in reduceCoordinates")

    # ------------------------------------------------------------- features
    FEATURE_CHUNK = 8192
    """Frames per fixed-shape device batch. Featurization streams chunks of
    exactly this many frames (last chunk zero-padded), so XLA compiles the
    transform once regardless of how segment counts vary per iteration --
    the padded-batch discipline of SURVEY.md P4."""

    class _StreamingReducer:
        """Buffer raw frames and flush fixed-size chunks through a reduce fn.

        Keeps only the small reduced features resident -- raw coordinates
        never accumulate beyond one chunk (the streaming design of SURVEY.md
        P4; for production systems the raw set can be orders of magnitude
        larger than host RAM).
        """

        def __init__(self, reduce_fn, chunk):
            self.reduce_fn = reduce_fn
            self.chunk = chunk
            self.buf = []
            self.buffered = 0
            self.out = []

        def add(self, coords):
            # Drain directly from the incoming block: the previous
            # append-concatenate-split loop re-copied the whole buffered
            # tail once per flushed chunk (~0.5 GB of pure copies per 2M-
            # segment featurization pass). Only the sub-chunk remainder is
            # ever buffered (copied, so the big source block can be freed).
            pos = 0
            n = len(coords)
            if self.buffered:
                take = min(self.chunk - self.buffered, n)
                if self.buffered + take < self.chunk:
                    if take:
                        # Copy: a view would pin the whole incoming block
                        self.buf.append(coords[:take].copy())
                        self.buffered += take
                    return
                self.buf.append(coords[:take])
                self.out.append(
                    np.asarray(self.reduce_fn(np.concatenate(self.buf)))
                )
                self.buf = []
                self.buffered = 0
                pos = take
            while n - pos >= self.chunk:
                self.out.append(
                    np.asarray(self.reduce_fn(coords[pos : pos + self.chunk]))
                )
                pos += self.chunk
            if n - pos:
                self.buf = [coords[pos:].copy()]
                self.buffered = n - pos

        def finish(self):
            if self.buffered:
                block = np.concatenate(self.buf) if len(self.buf) > 1 else self.buf[0]
                if self.out:  # pad to the compiled chunk shape
                    pad = np.zeros(
                        (self.chunk - len(block),) + block.shape[1:], block.dtype
                    )
                    padded = np.concatenate([block, pad])
                    self.out.append(
                        np.asarray(self.reduce_fn(padded))[: len(block)]
                    )
                else:
                    self.out.append(np.asarray(self.reduce_fn(block)))
            self.buf = []
            return (
                np.concatenate(self.out)
                if self.out
                else np.zeros((0, 1), np.float32)
            )

    def _featurize_all(self, force=False):
        """Reduce every iteration's (parent, child) coords to features, once.

        Builds concatenated arrays over iterations 1..maxIter-1 (the
        discretizable range): features, pcoords, weights, per-iteration
        offsets. Raw coordinates stream through fixed-size chunks; NaN
        coordinates are zero-filled (their weight is already 0).

        With ``dedup_coordinates`` (default "auto"), parent features are
        gathered from the previous iteration's child features instead of
        re-read and re-featurized -- see :meth:`_featurize_dedup`.
        """
        if self._features is not None and not force:
            return self._features
        self._raw_bins_cache = None  # bins follow the feature arrays
        self._pc_masks_cache = None  # and so do the basis/target masks

        mode = getattr(self, "dedup_coordinates", "auto")
        use_dedup = mode is True or (
            mode == "auto"
            and self._dataset.check_continuity(last_iter=self.maxIter - 1)
        )
        if mode == "auto" and not use_dedup:
            log.debug(
                "Coordinate continuity does not hold for this dataset; "
                "featurizing parent frames directly."
            )
        if use_dedup:
            feats = self._featurize_dedup(verify=(mode == "auto"))
            if feats is not None:
                self._features = feats
                return feats
            log.warning(
                "Gathered parent features did not bitwise-match directly "
                "featurized samples (non-row-independent featurizer?); "
                "falling back to direct parent featurization."
            )

        red_parent = self._StreamingReducer(self.reduceCoordinates, self.FEATURE_CHUNK)
        red_child = self._StreamingReducer(self.reduceCoordinates, self.FEATURE_CHUNK)
        p0s, p1s, ws, iter_of = [], [], [], []
        offsets = [0]
        for iteration in range(1, self.maxIter):
            parent, child, weights = self._dataset.iter_coord_pairs(iteration)
            d = self._dataset.iter_data(iteration)
            red_parent.add(np.nan_to_num(parent, copy=False))
            red_child.add(np.nan_to_num(child, copy=False))
            p0s.append(d["pcoord0"])
            p1s.append(d["pcoord1"])
            ws.append(weights)
            iter_of.append(np.full(len(weights), iteration))
            offsets.append(offsets[-1] + len(weights))

        self._features = FeatureSet(
            parent=red_parent.finish().astype(np.float32),
            child=red_child.finish().astype(np.float32),
            pcoord0=np.concatenate(p0s),
            pcoord1=np.concatenate(p1s),
            weights=np.concatenate(ws),
            iteration=np.concatenate(iter_of),
            offsets=np.array(offsets),
        )
        return self._features

    def _featurize_dedup(self, verify=True):
        """Featurize with the WE-continuity dedup: child frames only are read
        and reduced; parent features are *gathered* from the previous
        iteration's child features (a segment's frame 0 is a bit-copy of its
        parent's final frame). Direct frame-0 reads remain only for
        iteration 1 and recycled (parent_id < 0) segments.

        Halves coordinate I/O and ``processCoordinates``/transform work vs
        the reference, which reads and featurizes both frames of every
        segment (``_data.py:254-313``). With ``verify``, a sample of gathered
        rows is re-featurized directly from their own frame-0 coords and must
        match bitwise; returns None on mismatch (caller falls back).
        """
        ds = self._dataset
        red_child = self._StreamingReducer(self.reduceCoordinates, self.FEATURE_CHUNK)
        p0s, p1s, ws, iter_of, nan_blocks = [], [], [], [], []
        offsets = [0]
        for iteration in range(1, self.maxIter):
            child = ds._iter_frame_block(iteration, -1)
            if verify and iteration == 1 and len(child) > 1:
                # Pre-flight fail-fast: a featurizer whose per-row output
                # depends on the rest of the batch (e.g. batch-mean
                # centering) breaks the gather. Catch it BEFORE the full
                # dedup pass, not only at the post-hoc sample check --
                # otherwise a doomed pass costs ~1.5x the direct path.
                # Bounded to one chunk: featurizing the whole block would
                # bypass the FEATURE_CHUNK streaming discipline (an extra
                # compile shape + a memory spike on large iterations)
                block = np.nan_to_num(child[: self.FEATURE_CHUNK])
                k = min(8, len(block))
                whole = np.asarray(self.reduceCoordinates(block))
                sub = np.asarray(self.reduceCoordinates(block[:k]))
                if not np.array_equal(whole[:k], sub):
                    return None
            d = ds.iter_data(iteration)
            nan_blocks.append(np.isnan(child).any(axis=tuple(range(1, child.ndim))))
            # In-place NaN fill is safe: the block is a fresh h5 read, and
            # the NaN scan above already ran. Saves a full copy pass over
            # every raw coordinate per build (GBs for real MD data)
            red_child.add(np.nan_to_num(child, copy=False))
            p0s.append(d["pcoord0"])
            p1s.append(d["pcoord1"])
            # No copy needed: np.concatenate below always allocates, so the
            # later in-place zeroing never reaches the cached iter_data array
            ws.append(d["weights"])
            iter_of.append(np.full(d["n_segs"], iteration))
            offsets.append(offsets[-1] + d["n_segs"])

        child_feats = red_child.finish().astype(np.float32)
        offsets = np.array(offsets)
        child_nan = (
            np.concatenate(nan_blocks) if nan_blocks else np.zeros(0, bool)
        )

        # Accumulate one global source-index array, then gather once: 100+
        # small fancy-index copies have poor locality at millions of rows
        src_all = np.full(int(offsets[-1]), -1, np.int64)
        fallback = []  # (iteration, local_rows)
        for iteration in range(1, self.maxIter):
            d = ds.iter_data(iteration)
            base = offsets[iteration - 1]
            if iteration == 1:
                fb_local = np.arange(d["n_segs"])
            else:
                pg = d["parent_ids_global"]
                fb_local = np.flatnonzero(pg < 0)
                ga_local = np.flatnonzero(pg >= 0)
                if len(ga_local):
                    src_all[base + ga_local] = offsets[iteration - 2] + pg[ga_local]
            if len(fb_local):
                fallback.append((iteration, fb_local))

        # Parent features stay a RECIPE (src gather + fallback rows) inside
        # the returned FeatureSet: the full host gather only happens if a
        # host consumer indexes feats["parent"]; the device pipeline gathers
        # on-device from the child upload instead. Only the cheap 1-D NaN
        # propagation is done eagerly here.
        gathered = np.flatnonzero(src_all >= 0)
        parent_nan = np.zeros(len(child_nan), bool)
        if len(gathered):
            parent_nan[gathered] = child_nan[src_all[gathered]]

        fb_rows_all = np.zeros(0, np.int64)
        fb_feats = np.zeros((0, child_feats.shape[1]), np.float32)
        if fallback:
            red_fb = self._StreamingReducer(self.reduceCoordinates, self.FEATURE_CHUNK)
            fb_nan, fb_rows = [], []
            for iteration, fb_local in fallback:
                raw = ds.iter_frame_subset(iteration, fb_local, 0)
                fb_nan.append(np.isnan(raw).any(axis=tuple(range(1, raw.ndim))))
                red_fb.add(np.nan_to_num(raw, copy=False))
                fb_rows.append(offsets[iteration - 1] + fb_local)
            # Iterations ascend and fb_local is sorted within each, so the
            # concatenation is globally sorted (parent_rows searchsorts it)
            fb_rows_all = np.concatenate(fb_rows).astype(np.int64)
            fb_feats = red_fb.finish().astype(np.float32)
            parent_nan[fb_rows_all] = np.concatenate(fb_nan)

        if verify and len(gathered):
            rng = np.random.default_rng(0)
            n_sample = min(256, len(gathered))
            sample = np.sort(rng.choice(gathered, n_sample, replace=False))
            sample_iter = np.searchsorted(offsets, sample, side="right")
            red_v = self._StreamingReducer(self.reduceCoordinates, self.FEATURE_CHUNK)
            for it in np.unique(sample_iter):
                rows_g = sample[sample_iter == it]
                raw = ds.iter_frame_subset(int(it), rows_g - offsets[it - 1], 0)
                red_v.add(np.nan_to_num(raw, copy=False))
            direct = red_v.finish().astype(np.float32)
            if not np.array_equal(direct, child_feats[src_all[sample]]):
                return None

        # The NaN -> weight-0 convention (reference _data.py:303-313), with
        # parent NaN-ness propagated through the gather
        weights = np.concatenate(ws) if ws else np.zeros(0)
        bad = child_nan | parent_nan
        if bad.any():
            iter_all = np.concatenate(iter_of)
            for it in np.unique(iter_all[bad]):
                seg = np.flatnonzero(bad & (iter_all == it)) - offsets[it - 1]
                log.warning(
                    f"Bad coordinates for segments {seg} in iteration {it}, "
                    "setting weights to 0"
                )
            weights[bad] = 0.0

        return FeatureSet(
            dict(
                parent=None,  # lazy: materialized from the recipe on demand
                child=child_feats,
                pcoord0=np.concatenate(p0s),
                pcoord1=np.concatenate(p1s),
                weights=weights,
                iteration=np.concatenate(iter_of),
                offsets=offsets,
            ),
            parent_src=src_all,
            parent_fb_rows=fb_rows_all,
            parent_fb_feats=fb_feats,
        )

    # ------------------------------------------------------------ clustering
    def cluster_coordinates(
        self,
        n_clusters,
        streaming=False,
        first_cluster_iter=None,
        use_ray=False,
        stratified=True,
        iters_to_use=None,
        store_validation_model=False,
        progress_bar=None,
        random_state=None,
        **_cluster_args,
    ):
        """Cluster features (reference ``_clustering.py:142-195``)."""
        log.info(
            "Be aware: Number of cluster centers is an important parameter; "
            "check block-validation results over a range of cluster counts."
        )
        if random_state is not None:
            self._cluster_seed = int(random_state)
        if stratified:
            self.clustering_method = "stratified"
            self.cluster_stratified(
                n_clusters=n_clusters,
                first_cluster_iter=first_cluster_iter,
                iters_to_use=iters_to_use,
                progress_bar=progress_bar,
                **_cluster_args,
            )
        else:
            self.clustering_method = "aggregated"
            self.cluster_aggregated(
                n_clusters=n_clusters,
                first_cluster_iter=first_cluster_iter,
                iters_to_use=iters_to_use,
                **_cluster_args,
            )

        if store_validation_model:
            self.post_cluster_model = deepcopy(self)

    def _resolve_iters(self, iters_to_use, first_cluster_iter):
        if iters_to_use is not None and first_cluster_iter is not None:
            log.error(
                "Conflicting parameters -- iters_to_use OR first_cluster_iter, not both."
            )
        if iters_to_use is None:
            first = first_cluster_iter if first_cluster_iter is not None else 1
            iters_to_use = range(first, self.maxIter)
        return list(iters_to_use)

    def cluster_aggregated(
        self, n_clusters, first_cluster_iter=None, iters_to_use=None, **_cluster_args
    ):
        """Whole-dataset weighted k-means (reference ``cluster_aggregated``,
        ``_clustering.py:197-523``)."""
        iters_to_use = self._resolve_iters(iters_to_use, first_cluster_iter)
        self.n_clusters = n_clusters
        self.first_cluster_iter = iters_to_use[0]

        feats = self._featurize_all()
        # Bad-coordinate segments (weight zeroed by the NaN convention) are
        # excluded from training: their zero-filled features are garbage
        sel = np.isin(feats["iteration"], iters_to_use) & (feats["weights"] > 0)
        X = feats["child"][sel]
        w = (
            feats["weights"][sel]
            if self.use_weights_in_clustering
            else np.ones(int(sel.sum()))
        )
        centers, _ = kmeans_fit(X, w, n_clusters, seed=self._cluster_seed)
        self.clusters = _AggregateClustersShim(centers)
        # Re-clustering a previously stratified model must drop the old
        # stratified bank: the device flux path keys on self._strat and
        # would otherwise assign against the defunct per-bin centers
        self._strat = None
        self._bin_mapper = None

        # Discretize all iterations (children and parents)
        self._discretize_all_aggregated()

    def _discretize_all_aggregated(self):
        feats = self._featurize_all()
        child_idx = self.clusters.predict(feats["child"])
        parent_idx = self.clusters.predict(feats["parent"])
        self._store_dtrajs(parent_idx, child_idx)

    def cluster_stratified(
        self,
        n_clusters,
        streaming=True,
        first_cluster_iter=None,
        use_ray=True,
        bin_iteration=2,
        iters_to_use=None,
        user_bin_mapper=None,
        progress_bar=None,
        defer_discretization=False,
        scan_small_batches=False,
        **_cluster_args,
    ):
        """Per-WE-bin stratified clustering (reference ``cluster_stratified``
        ``_clustering.py:525-746`` and ``do_stratified_clustering`` ``:748-918``).

        Accumulates iterations until every seen WE bin has >= n_clusters
        segments (excluding basis/target segments), fits each bin's model,
        remaps never-filled bins to the nearest filled bin, then discretizes
        everything in one batched call.

        ``defer_discretization=True`` (mesh builds only) skips that final
        discretization: ``dtrajs`` stay ``None`` until the next
        ``get_fluxMatrix`` call materializes them -- at lag 0 on the device
        path as a free byproduct of the combined flux+ids program (one
        dispatch+sync instead of two), otherwise via
        ``launch_discretization``. Don't touch ``dtrajs``-derived state
        (``update_cluster_structures`` etc.) in the deferred window.

        ``scan_small_batches=True`` routes sub-``HOST_BATCH_THRESHOLD``
        no-seeding fill batches through the fused device scan as well
        (one dispatch for the whole fill loop instead of ~one host update
        per iteration). Opt-in because it switches those batches from the
        host-numpy to the device numerics family: centers differ in
        near-tie assignments and f32 rounding, so builds no longer match a
        default (host-family) build bitwise -- both are equally valid
        clusterings. Seeding batches keep the host family either way.
        """
        if user_bin_mapper is not None:
            bin_mapper = user_bin_mapper
        else:
            bin_mapper = self._load_bin_mapper_from_h5(bin_iteration)
        self._bin_mapper = bin_mapper
        self._raw_bins_cache = None

        iters_to_use = self._resolve_iters(iters_to_use, first_cluster_iter)
        feats = self._featurize_all()

        strat = StratifiedKmeans(
            n_bins=bin_mapper.nbins,
            k_per_bin=n_clusters,
            n_features=feats["child"].shape[1],
            seed=self._cluster_seed,
        )

        all_filled = set()

        # Training bins come from *parent* pcoords; basis/target segments
        # are excluded (reference _clustering.py:846-885), as are
        # bad-coordinate segments (weight zeroed by the NaN convention --
        # their features are zero-filled garbage; the reference drops NaN
        # rows from training, _data.py:557-618). One vectorized pass over
        # all rows -- the per-iteration mask+assign loop this replaces was
        # ~0.15 s of a warm 100k clustering stage.
        masks = self._pc_masks()
        keep_all = ~(masks["target_p"] | masks["basis_p"])
        keep_all &= feats["weights"] > 0
        kept_rows_all = np.flatnonzero(keep_all)
        # Slice the cached full parent-bin assignment instead of digitizing
        # the kept rows again (launch_discretization needs the full arrays
        # right after this anyway). Kept rows all have weight > 0, so the
        # nan_to_num inside _raw_we_bins never changes their bin.
        kept_bins_all = self._raw_we_bins()[0][kept_rows_all]
        offsets = feats["offsets"]

        # Pass 1: build the batch plan (accumulate iterations until all seen
        # bins are filled -- bin counts update incrementally with each
        # appended iteration, O(N) total).
        batches = []  # (rows, bins) per batch; bins after any ran-out remap
        delegated = []  # batches that must run through per-batch partial_fit
        idx = 0
        while idx < len(iters_to_use):
            kept_rows = []
            kept_bins = []
            batch_counts = np.zeros(bin_mapper.nbins, dtype=np.int64)
            j = idx
            ran_out = False
            while True:
                if j >= len(iters_to_use):
                    ran_out = True
                    break
                iteration = iters_to_use[j]
                # O(log N) row range from the featurization offsets (a
                # flatnonzero scan here is O(N) per iteration -- it was the
                # dominant cost of million-segment clustering)
                if 1 <= iteration < len(offsets):
                    lo, hi = np.searchsorted(
                        kept_rows_all,
                        (offsets[iteration - 1], offsets[iteration]),
                    )
                else:
                    lo = hi = 0
                rows_it = kept_rows_all[lo:hi]
                bins_it = kept_bins_all[lo:hi]
                kept_rows.append(rows_it)
                kept_bins.append(bins_it)
                if len(bins_it):
                    batch_counts += np.bincount(
                        bins_it, minlength=bin_mapper.nbins
                    )

                seen = batch_counts > 0
                if seen.any() and (batch_counts[seen] >= n_clusters).all():
                    break
                j += 1

            rows = (
                np.concatenate(kept_rows) if kept_rows else np.array([], int)
            )
            if len(rows):
                bins = np.concatenate(kept_bins)
                unique_bins, counts = np.unique(bins, return_counts=True)
                unfilled = unique_bins[counts < n_clusters]
                filled = np.setdiff1d(unique_bins, unfilled)

                remapped = False
                if ran_out and len(unfilled) and len(filled):
                    # Out of data: push unfilled bins' members to nearest filled
                    log.warning(
                        f"Couldn't fill bins {unfilled}; remapping members to "
                        "nearest filled bins for clustering."
                    )
                    for ub in unfilled:
                        nearest = find_nearest_bin(bin_mapper, int(ub), list(filled))
                        bins[bins == ub] = nearest
                    remapped = True
                    unique_bins, counts = np.unique(bins, return_counts=True)

                batches.append((rows, bins, unique_bins, counts))
                delegated.append(remapped)

            idx = j + 1

        self._run_streaming_batches(strat, feats, batches, delegated,
                                    bin_mapper, all_filled, iters_to_use,
                                    scan_small_batches=scan_small_batches)

        # Never-filled bins delegate to the nearest filled bin
        true_unfilled = np.setdiff1d(
            np.arange(bin_mapper.nbins), sorted(all_filled)
        )
        for ub in true_unfilled:
            remap = find_nearest_bin(bin_mapper, int(ub), sorted(all_filled))
            strat.set_remap(int(ub), remap)
            log.debug(f"Remapped {ub} to {remap}")

        self._strat = strat
        if getattr(self, "_mesh", None) is not None:
            strat.use_mesh(self._mesh)
        self.clusters = StratifiedClustersShim(bin_mapper, self, strat)
        # Reference sets the *nominal* total here (``_clustering.py:742``);
        # never-visited clusters are cleaned away in organize_fluxMatrix
        self.n_clusters = n_clusters * bin_mapper.nbins

        if defer_discretization and self._mesh is not None:
            # build_analyze_model's device fast path: the next
            # get_fluxMatrix(0) runs ONE combined device program that emits
            # the flux matrix and these ids together (one dispatch+sync
            # instead of two). Clear any previous clustering's ids -- the
            # lazy-materialization guards key on `_parent_idx is None`, so
            # stale old-numbering ids would otherwise be read as current.
            # Other dtrajs consumers materialize via _ensure_discretized().
            self.dtrajs = None
            self.pair_dtrajs = None
            self._parent_idx = None
            self._child_idx = None
            return
        self.launch_discretization()

    def _run_streaming_batches(self, strat, feats, batches, delegated,
                               bin_mapper, all_filled, iters_to_use,
                               scan_small_batches=False):
        """Execute the streaming-clustering batch plan, fusing runs of
        no-seeding device-path batches into single ``lax.scan`` dispatches.

        Per-batch ``partial_fit`` costs one device round trip each; at a
        hundred iterations through a remote tunnel those enqueues dominate
        the clustering stage. Batches are classified on the host (a bin
        seeds when it is uninitialized and has >= k members in the batch --
        the exact ``partial_fit`` criterion), and maximal runs of >= 2
        consecutive batches that (a) seed nothing, (b) clear
        ``HOST_BATCH_THRESHOLD`` (the device-family cutoff -- host-family
        batches keep their numerics), and (c) weren't ran-out-remapped go
        through :meth:`StratifiedKmeans.minibatch_scan_run`, which is
        bitwise-identical to the per-batch sequence. Everything else
        delegates to ``partial_fit`` unchanged.
        """
        from .ops.stratified import HOST_BATCH_THRESHOLD

        use_weights = self.use_weights_in_clustering
        offsets = feats["offsets"]

        # Scan windows address contiguous row ranges; with a non-ascending
        # iteration list a batch's rows are not contiguous, so keep the
        # per-batch path (user-supplied custom orderings are tiny anyway)
        ascending = len(iters_to_use) <= 1 or bool(
            np.all(np.diff(np.asarray(iters_to_use)) > 0)
        )

        # Classify: simulate the initialized state forward (only delegated
        # batches can seed, so the simulation is exact)
        sim_init = strat.initialized.copy()
        plan = []
        for (rows, bins, ub, cnt), remapped in zip(batches, delegated):
            seeds = (~sim_init[ub]) & (cnt >= strat.k)
            live = int(cnt[sim_init[ub]].sum())
            live_floor = 1 if scan_small_batches else HOST_BATCH_THRESHOLD
            if (
                not ascending
                or remapped
                or seeds.any()
                or live < live_floor
            ):
                plan.append(False)
                sim_init[ub[seeds]] = True
            else:
                plan.append(True)

        scan_ctx = None

        def scan_context():
            # Device-resident arrays for the scan path, built once: the
            # shared feature upload (mesh builds reuse _device_row_feats --
            # the same array the discretization/flux programs read), an
            # int16 effective-bin array (-1 = excluded from training), and
            # optionally the f32 weights
            nonlocal scan_ctx
            if scan_ctx is not None:
                return scan_ctx
            import jax
            import jax.numpy as jnp

            N = int(offsets[-1])
            eff_dt = np.int16 if bin_mapper.nbins < 2**15 else np.int32
            eff = np.full(N, -1, eff_dt)
            for rows, bins, _ub, _cnt in batches:
                eff[rows] = bins
            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                X_dev = self._device_row_feats()[1]
                n_pad = X_dev.shape[0]
                sh = NamedSharding(self._mesh, P("data"))

                def pad_put(a, fill):
                    return jax.device_put(_pad_rows_to(a, n_pad, fill), sh)

                eff_dev = pad_put(eff, -1)
                w_dev = (
                    pad_put(feats["weights"].astype(np.float32), 0.0)
                    if use_weights
                    else None
                )
            else:
                X_dev = jnp.asarray(feats["child"])
                eff_dev = jnp.asarray(eff)
                w_dev = (
                    jnp.asarray(feats["weights"].astype(np.float32))
                    if use_weights
                    else None
                )
            scan_ctx = (X_dev, eff_dev, w_dev)
            return scan_ctx

        i = 0
        while i < len(batches):
            if plan[i]:
                j = i
                while j + 1 < len(batches) and plan[j + 1]:
                    j += 1
                # Default mode only fuses runs of >= 2 (a lone device-family
                # batch costs one dispatch either way); scan_small_batches
                # scans even singletons so every non-seeding batch gets the
                # same (device) numerics family
                if j > i or scan_small_batches:
                    X_dev, eff_dev, w_dev = scan_context()
                    starts = np.array(
                        [batches[b][0][0] for b in range(i, j + 1)], np.int64
                    )
                    lengths = np.array(
                        [
                            batches[b][0][-1] + 1 - batches[b][0][0]
                            for b in range(i, j + 1)
                        ],
                        np.int64,
                    )
                    strat.minibatch_scan_run(
                        X_dev, eff_dev, w_dev, starts, lengths
                    )
                    for b in range(i, j + 1):
                        ub = batches[b][2]
                        all_filled.update(
                            int(x) for x in ub[strat.initialized[ub]]
                        )
                    i = j + 1
                    continue
            rows, bins = batches[i][:2]
            X = feats["child"][rows]
            w = feats["weights"][rows] if use_weights else None
            updated = strat.partial_fit(X, bins, weights=w)
            all_filled.update(updated)
            i += 1

    def _load_bin_mapper_from_h5(self, bin_iteration):
        """Load a WESTPA bin mapper from the h5 (requires westpa); otherwise
        instruct the user to pass ``user_bin_mapper``."""
        try:
            import westpa.tools.binning  # noqa: F401
            import h5py

            with h5py.File(self.fileList[0], "r") as h5:
                mapper, _, _ = westpa.tools.binning.mapper_from_hdf5(
                    h5["bin_topologies"],
                    h5[f"iterations/iter_{bin_iteration:08d}"].attrs["binhash"],
                )
            return mapper
        except Exception as e:
            raise RuntimeError(
                "Could not load a bin mapper from the H5 file (westpa not "
                "installed, or no bin_topologies group). Pass user_bin_mapper= "
                "with a msm_we_tpu.binning.RectilinearBinMapper/VoronoiBinMapper."
            ) from e

    # --------------------------------------------------------- discretization
    def launch_discretization(self, progress_bar=None):
        """Discretize every iteration's parent+child features in one pass.

        Replaces the reference's per-iteration Ray fan-out
        (``launch_ray_discretization``, ``_clustering.py:1144-1242``).
        Parent and child rows go through ONE predict call (2N rows): on a
        remote-tunnel device each predict is a blocking dispatch+download
        round trip, so fusing them halves the discretization latency.
        """
        feats = self._featurize_all()
        strat = self._strat

        parent_bins, child_bins = self._raw_we_bins()
        n = len(parent_bins)

        if self._mesh is not None and strat is not None:
            pidx, cidx = self._sharded_pair_discretize(
                strat, parent_bins, child_bins
            )
            self._store_dtrajs(pidx, cidx)
            return

        masks = self._pc_masks()
        both_idx = strat.predict(
            np.concatenate([feats["parent"], feats["child"]]),
            np.concatenate([parent_bins, child_bins]),
            is_basis=np.concatenate([masks["basis_p"], masks["basis_c"]]),
            is_target=np.concatenate([masks["target_p"], masks["target_c"]]),
        )
        self._store_dtrajs(both_idx[:n], both_idx[n:])

    def _sharded_pair_discretize(self, strat, parent_bins, child_bins):
        """One sharded dispatch assigning parent AND child rows, reading the
        shared device-resident feature arrays (:meth:`_device_row_feats`) --
        the same layout the fused flux step consumes, so features upload
        once per build instead of once per stage. Identical ids to
        ``strat.predict`` (same masked scores, same overrides)."""
        from .parallel.sharded import build_sharded_pair_assign

        feats = self._featurize_all()
        mesh = self._mesh
        N = len(parent_bins)

        pbins = strat.we_remap[parent_bins].astype(np.int32)
        cbins = strat.we_remap[child_bins].astype(np.int32)
        _check_live_centers(strat, pbins, cbins)

        masks = self._pc_masks()
        basis_p = masks["basis_p"]
        basis_c = masks["basis_c"]
        target_p = masks["target_p"]
        target_c = masks["target_c"]

        data_size = mesh.shape["data"]
        model_size = mesh.shape["model"]
        N_pad = -(-N // data_size) * data_size
        K = strat.n_total_clusters
        K_pad = -(-K // model_size) * model_size
        n_states = K + 2

        pad_rows = lambda a, fill: _pad_rows_to(a, N_pad, fill)

        # Dedup fast path: under WE continuity parent row i is a bit-copy of
        # child row src[i] (the recipe _featurize_dedup verified), and when
        # its WE bin and basis/target flags also agree with that child row
        # (pcoord continuity -- checked here, not assumed), its assignment
        # IS the child's: score only the N child rows on device (instead of
        # 2N) and gather parent ids on the host. Disagreeing/fallback rows
        # (iteration 1, recycled parents, any continuity break) go through
        # strat.predict, which matches the device scoring bitwise
        # (tests/test_coverage_round3.py pins the equality). Decided BEFORE
        # fetching the device feature arrays so the fast path never pays
        # the on-device parent gather it would not read.
        src = getattr(feats, "_parent_src", None)
        direct = s = None
        if src is not None:
            s = np.maximum(src, 0)
            agree = (
                (src >= 0)
                & (pbins == cbins[s])
                & (basis_p == basis_c[s])
                & (target_p == target_c[s])
            )
            direct = np.flatnonzero(~agree)
        fast = direct is not None and len(direct) <= max(N // 4, 1)

        fp_dev, fc_dev = self._device_row_feats(need_parent=not fast)
        centersC, center_binC, validC = strat.compact_bank(pad_to=K_pad)

        if fast:
            from .parallel.sharded import build_sharded_single_assign

            assign1 = build_sharded_single_assign(
                mesh, n_states, n_bins=strat.n_bins
            )
            cid = assign1(
                fc_dev, pad_rows(cbins, -1),
                pad_rows(basis_c, False), pad_rows(target_c, False),
                centersC, center_binC, validC,
            )
            cid = np.asarray(cid)[:N].astype(np.int32)
            pid = cid[s]  # fancy indexing: already a fresh array
            if len(direct):
                pid[direct] = strat.predict(
                    _feat_parent_rows(feats, direct),
                    parent_bins[direct],  # raw bins: predict remaps
                    is_basis=basis_p[direct],
                    is_target=target_p[direct],
                )
            return np.ascontiguousarray(pid), cid

        assign = build_sharded_pair_assign(
            mesh, n_states, with_target_p=True,
            n_bins=strat.n_bins,
        )
        both = assign(
            fp_dev, fc_dev,
            pad_rows(pbins, -1), pad_rows(cbins, -1),
            pad_rows(basis_p, False), pad_rows(basis_c, False),
            pad_rows(target_c, False),
            centersC, center_binC, validC,
            pad_rows(target_p, False),
        )
        # ONE device-to-host sync for both id columns (the program stacks
        # them, int16 when ids fit): at ~10 MB/s tunnel bandwidth the two
        # separate int32 downloads were ~180 ms of a 100k discretization
        return _id_columns_to_host(both, N)

    def _invalidate_pcoord_caches(self):
        """Drop the caches derived from the feature pcoord arrays (WE bin
        assignments, basis/target masks). The feature dict is treated as
        immutable by the build pipeline; call this after mutating
        ``_features['pcoord0']``/``'pcoord1'`` in place (tests do)."""
        self._raw_bins_cache = None
        self._pc_masks_cache = None

    def _raw_we_bins(self):
        """Un-remapped WE bin of every segment's parent/child pcoord (cached:
        recomputed bin assignments were a per-cleaning-pass cost)."""
        if getattr(self, "_raw_bins_cache", None) is None:
            feats = self._featurize_all()
            self._raw_bins_cache = (
                self._bin_mapper.assign(np.nan_to_num(feats["pcoord0"])),
                self._bin_mapper.assign(np.nan_to_num(feats["pcoord1"])),
            )
        return self._raw_bins_cache

    def _ensure_discretized(self):
        """Materialize dtrajs if a ``defer_discretization=True`` clustering
        left them pending (every dtrajs consumer calls this; the deferred
        window normally ends inside ``get_fluxMatrix(0)``'s combined
        device program instead)."""
        if self._parent_idx is None and self.clusters is not None:
            self.launch_discretization()

    def _store_dtrajs(self, parent_idx, child_idx):
        feats = self._features
        offsets = feats["offsets"]
        self.dtrajs = [
            child_idx[offsets[i] : offsets[i + 1]] for i in range(len(offsets) - 1)
        ]
        # (n, 2) arrays, not lists of tuples: `list(zip(...))` materializes
        # one Python tuple per segment -- profiled at 35 s of a 74 s
        # 2M-segment build (twice: discretization + cleaning's re-run).
        # Rows still unpack as (parent, child) pairs for reference-style
        # consumers; np.asarray(pair_dtrajs[i]) is now free.
        self.pair_dtrajs = [
            np.stack(
                [parent_idx[offsets[i] : offsets[i + 1]],
                 child_idx[offsets[i] : offsets[i + 1]]],
                axis=1,
            )
            for i in range(len(offsets) - 1)
        ]
        self._parent_idx = parent_idx
        self._child_idx = child_idx

    # ------------------------------------------------------------ flux matrix
    def get_fluxMatrix(
        self,
        n_lag,
        first_iter=1,
        last_iter=None,
        iters_to_use=None,
        use_ray=False,
        result_batch_size=5,
        progress_bar=None,
    ):
        """Weighted flux matrix over iterations (reference ``get_fluxMatrix``,
        ``_fluxmatrix.py:166-345``): one vectorized scatter-add over all
        selected transitions, normalized by the number of iterations used.

        WE weights span many orders of magnitude, so the final (n+2)^2
        accumulation runs in float64 on the host (a trivial bincount); the
        expensive part -- discretization -- already ran on device. With a
        mesh enabled, the fused device path (parallel.sharded: f32 assign +
        f64 scatter + psum) replaces this host accumulation entirely.

        ``n_lag > 0`` builds (n_lag+1)-tau transitions: the start state is the
        *ancestor's* frame-0 assignment ``n_lag`` iterations back (already
        discretized -- lagged starts reuse the parent-feature assignments, no
        new device work), with recycled-within-window lineages departing from
        the basis state. Extends the reference, whose lag machinery is gated
        (``msm_we.py:353-359``).
        """
        self._fluxMatrixParams = [n_lag, first_iter, last_iter, iters_to_use]

        if iters_to_use is None:
            if last_iter is None:
                last_iter = self.maxIter
            iters_to_use = range(max(first_iter + 1, n_lag + 1), last_iter)
        in_range = [i for i in iters_to_use if i - n_lag >= 1 and i < self.maxIter]
        if len(in_range) != len(iters_to_use):
            dropped = sorted(set(iters_to_use) - set(in_range))
            log.warning(
                f"Dropping iterations {dropped} from the flux matrix: outside "
                f"the usable range [{n_lag + 1}, {self.maxIter - 1}] at "
                f"n_lag={n_lag}"
            )
        iters_to_use = in_range
        if not iters_to_use:
            raise ValueError(
                f"No iterations have enough history for n_lag={n_lag} "
                f"(first_iter={first_iter}, last_iter={last_iter})"
            )

        self.n_lag = n_lag
        self.errorWeight = 0.0
        self.errorCount = 0

        feats = self._featurize_all()
        n_states = self.n_clusters + 2

        use_device_flux = (
            n_lag == 0
            and self._mesh is not None
            and self.clusters is not None
            and not getattr(self, "_flux_prefer_host", False)
            and self._device_f64_weights_ok(feats["weights"])
        )
        if use_device_flux and not getattr(self, "_force_device_flux", False):
            # Single-process meshes: the predict ids land on the host either
            # way (deferred discretization runs ONE ids-only sharded
            # program; otherwise they are already stored), and the host f64
            # bincount below then beats the device flux program outright --
            # measured 2 ms vs 60-73 ms at 100k segments (TPU f64 is
            # emulated double-double and the scatter is all adds; see
            # docs/performance.md "Flux accumulation routing"). The fused
            # scatter+psum program (_device_flux_lag0) remains the
            # multi-process path, where each process holds only its own id
            # shard and the in-mesh psum replaces a cross-host gather.
            import jax

            if jax.process_count() == 1:
                self._ensure_discretized()
                use_device_flux = False
        if use_device_flux:
            # Fused shard_map program (discretize -> f64 scatter -> psum)
            # over the mesh. Works for stratified (per-bin bank) and
            # aggregated (single-bin bank) clustering alike.
            self.fluxMatrixRaw = self._device_flux_lag0(iters_to_use) / len(
                iters_to_use
            )
            return

        # Deferred discretization (the device fast path above normally
        # materializes ids as a flux byproduct): any host-path build --
        # lag>0, device fallback, or a user bypassing the mesh -- needs the
        # stored ids, so materialize them now
        self._ensure_discretized()

        if n_lag == 0:
            n_iters_all = len(feats["offsets"]) - 1
            u = np.unique(iters_to_use)
            contiguous = (
                len(u) == len(iters_to_use)  # no duplicates
                and u[-1] - u[0] + 1 == len(u)  # gap-free range
                and u[0] >= 1
                and u[-1] <= n_iters_all
            )
            if contiguous:
                # Feature rows are ordered by iteration, so ANY contiguous
                # iteration range -- the default window range(2, maxIter),
                # every cleaning pass, and explicit first/last selections --
                # is a contiguous row slice: skip the O(N) isin scan and let
                # basic slicing replace the row gathers. (The old predicate
                # demanded ALL iterations starting at 1, which the default
                # window never satisfies, leaving this path dead.)
                offs = feats["offsets"]
                sel = slice(int(offs[u[0] - 1]), int(offs[u[-1]]))
            else:
                # Integer rows, not a boolean mask: 2-D boolean indexing
                # takes a slow numpy path on this host (~2x the int gather
                # at 2M rows)
                sel = np.flatnonzero(np.isin(feats["iteration"], iters_to_use))
            weights = feats["weights"][sel]
            masks = self._pc_masks()
            start_idx = np.asarray(self._parent_idx[sel], dtype=np.int64)
            end_idx = np.asarray(self._child_idx[sel], dtype=np.int64)
            strat = self._strat
            if (
                self.clustering_method == "stratified"
                and strat is not None
                and self.n_clusters == strat.n_total_clusters
            ):
                # Fast path (every cleaning pass): stored stratified dtrajs
                # already carry the predict-time basis/target overrides
                # (target wins overlaps, stratified_clustering.py:159-169)
                # in the CURRENT numbering; the flux build's basis-wins
                # composition (_fluxmatrix.py:134-137) differs only on rows
                # inside BOTH regions. Bitwise-identical to the general
                # chain below, minus ~6 O(N) passes per pass. Pre-cleaning
                # (nominal n_clusters > live total) the stored basis/target
                # ids use the live total, so the general chain re-applies
                # them with the nominal index instead.
                if masks["overlap_p"] is not None:
                    start_idx = start_idx.copy()
                    start_idx[masks["overlap_p"][sel]] = self.n_clusters
                if masks["overlap_c"] is not None:
                    end_idx = end_idx.copy()
                    end_idx[masks["overlap_c"][sel]] = self.n_clusters
            else:
                # General chain: aggregated clustering stores raw
                # (un-overridden) ids, and pre-cleaning stratified ids
                # carry live-total basis/target states -- re-apply the
                # flux-order overrides at the nominal numbering
                # (end-in-target, start-in-target for stratified, then
                # basis unconditionally)
                end_idx = np.where(
                    masks["target_c"][sel], self.n_clusters + 1, end_idx
                )
                if self.clustering_method == "stratified":
                    start_idx = np.where(
                        masks["target_p"][sel], self.n_clusters + 1, start_idx
                    )
                start_idx = np.where(
                    masks["basis_p"][sel], self.n_clusters, start_idx
                )
                end_idx = np.where(
                    masks["basis_c"][sel], self.n_clusters, end_idx
                )
        else:
            offsets = feats["offsets"]
            masks = self._pc_masks()
            starts, ends, ws, b0s, t0s, b1s, t1s, warps = (
                [], [], [], [], [], [], [], []
            )
            for it in iters_to_use:
                anc, warped = self._dataset.ancestor_ids(it, n_lag)
                rows_now = np.arange(offsets[it - 1], offsets[it])
                rows_lag = offsets[it - n_lag - 1] + np.where(warped, 0, anc)
                starts.append(self._parent_idx[rows_lag])
                ends.append(self._child_idx[rows_now])
                # A zeroed ancestor weight marks bad (NaN) augmentation
                # coords at the lagged frame (westh5 convention); those
                # transitions carry no flux at lag L either -- the start
                # assignment would come from zero-filled garbage features
                w_now = feats["weights"][rows_now].copy()
                w_now[(feats["weights"][rows_lag] == 0.0) & ~warped] = 0.0
                ws.append(w_now)
                b0s.append(masks["basis_p"][rows_lag])
                t0s.append(masks["target_p"][rows_lag])
                b1s.append(masks["basis_c"][rows_now])
                t1s.append(masks["target_c"][rows_now])
                warps.append(warped)
            start_idx = np.concatenate(starts).astype(np.int64)
            end_idx = np.concatenate(ends).astype(np.int64)
            weights = np.concatenate(ws)
            warped_all = np.concatenate(warps)
            # Recycled lineages depart from the basis state regardless of
            # the (meaningless) ancestor pcoord gathered at the safe index
            basis_start = np.concatenate(b0s) | warped_all
            target_start = np.concatenate(t0s) & ~warped_all
            basis_end = np.concatenate(b1s)
            target_end = np.concatenate(t1s)

            # Basis/target overrides, reference composition: predict routes
            # target-region rows to the target cluster first
            # (stratified_clustering.py:159-169) -- re-applied here with the
            # *nominal* target index so the numbering agrees with the fused
            # device kernel pre-cleaning -- and the flux build then applies
            # start/end-in-basis unconditionally AFTER end-in-target
            # (_fluxmatrix.py:134-137). So for rows inside BOTH regions
            # (overlapping bounds), basis wins, for parents and children
            # alike. (The lag-0 branches above compose the same order.)
            end_idx = np.where(target_end, self.n_clusters + 1, end_idx)
            if self.clustering_method == "stratified":
                start_idx = np.where(
                    target_start, self.n_clusters + 1, start_idx
                )
            start_idx = np.where(basis_start, self.n_clusters, start_idx)
            end_idx = np.where(basis_end, self.n_clusters, end_idx)

        flat = start_idx * n_states + end_idx
        fm = np.bincount(
            flat, weights=weights, minlength=n_states * n_states
        ).reshape(n_states, n_states)
        self.fluxMatrixRaw = fm / len(iters_to_use)

    def _device_f64_weights_ok(self, weights):
        """True when the mesh's backend can accumulate these WE weights in
        genuine f64. CPU always can. TPU has no native f64: XLA's x64
        rewrite emulates it as a double-double f32 pair, keeping ~49
        mantissa bits but only f32's EXPONENT range, so weights below
        ~1.2e-38 flush to zero in the device scatter (measured on v5e:
        1e250 -> inf, 2.25e-300 -> 0). WE weights legitimately span
        hundreds of orders of magnitude, so such runs take the host f64
        bincount path instead, with a warning."""
        plats = {d.platform for d in self._mesh.devices.flat}
        if plats == {"cpu"}:
            return True
        w = weights[weights != 0]
        if w.size == 0:
            return True
        lo, hi = float(w.min()), float(w.max())
        f32 = np.finfo(np.float32)
        if lo >= float(f32.tiny) and hi <= float(f32.max):
            return True
        log.warning(
            f"WE weights span [{lo:.3g}, {hi:.3g}], outside the f32 exponent "
            f"range that {sorted(plats)} f64 emulation preserves; using the "
            "host f64 flux path for this build (device discretization is "
            "unaffected)."
        )
        return False

    def _device_flux_lag0(self, iters_to_use):
        """Fused mesh-sharded flux matrix: discretize + f64 scatter + psum.

        One shard_map program over the ('data', 'model') mesh -- segments
        data-parallel, the stratified center bank tensor-parallel -- with the
        flux accumulated and psum-reduced in float64 while the distance
        matmuls stay f32 (``jax.enable_x64`` scopes the trace). This is the
        TPU-native replacement for the reference's Ray gather + driver-side
        f64 summation (``_fluxmatrix.py:311-342``), reachable from
        ``build_analyze_model`` via ``enable_mesh``/``device_pipeline``.

        Results match the host bincount path to f64 summation-order (the
        parity test asserts JtargetSS equality through the full build).
        """
        from .parallel.sharded import build_sharded_step
        from .utils import _scoped_x64

        feats = self._featurize_all()
        strat = self._strat
        mesh = self._mesh

        # Iteration selection folds into the weights (w * mask; f64 adds of
        # zero are exact), so the big feature arrays need no sel-gather and
        # the device copies cached by _device_row_feats (shared with the
        # sharded discretization) are reused as-is -- one upload per build
        sel = np.isin(feats["iteration"], list(iters_to_use))
        w = np.where(sel, feats["weights"], 0.0).astype(np.float64)

        masks = self._pc_masks()
        basis_p = masks["basis_p"]
        # Target-region parents route to the target state only for
        # stratified clustering (the reference's predict-time short-circuit;
        # its aggregated path leaves such parents at their raw cluster)
        if strat is not None:
            target_p = masks["target_p"]
        else:
            target_p = np.zeros(len(w), bool)
        basis_c = masks["basis_c"]
        target_c = masks["target_c"]

        n_states = self.n_clusters + 2
        data_size = mesh.shape["data"]
        model_size = mesh.shape["model"]
        N = len(w)

        if strat is not None:
            raw_pbins, raw_cbins = self._raw_we_bins()
            remap = strat.we_remap
            pbins = remap[raw_pbins].astype(np.int32)
            cbins = remap[raw_cbins].astype(np.int32)
            K = strat.n_total_clusters
            n_bins = strat.n_bins
            bank = lambda K_pad: strat.compact_bank(pad_to=K_pad)
        else:
            # Aggregated clustering: one implicit bin holding every center
            centers_all = np.asarray(self.clusters.cluster_centers_, np.float32)
            pbins = np.zeros(N, np.int32)
            cbins = np.zeros(N, np.int32)
            K = len(centers_all)
            n_bins = 1

            def bank(K_pad):
                c = np.zeros((K_pad, centers_all.shape[1]), np.float32)
                cb = np.full(K_pad, -2, np.int32)
                v = np.zeros(K_pad, bool)
                c[:K] = centers_all
                cb[:K] = 0
                v[:K] = True
                return c, cb, v

        N_pad = -(-N // data_size) * data_size
        K_pad = -(-K // model_size) * model_size

        pad_rows = lambda a, fill: _pad_rows_to(a, N_pad, fill)

        # Padded rows carry weight 0 (their scatter adds nothing) and bin -1
        # (matches no center); the compact bank (argmin row == global id,
        # no device gather) pads with invalid rows
        fp_dev, fc_dev = self._device_row_feats()
        centersC, center_binC, validC = bank(K_pad)
        args = (
            fp_dev,
            fc_dev,
            pad_rows(pbins, -1),
            pad_rows(cbins, -1),
            pad_rows(basis_p, False),
            pad_rows(basis_c, False),
            pad_rows(target_c, False),
            pad_rows(w, 0.0),
            centersC,
            center_binC,
            validC,
            pad_rows(target_p, False),
        )

        # build_sharded_step is memoized on (mesh, n_states, ...), so a
        # model-level cache would only risk staleness when enable_mesh()
        # swaps meshes mid-life.
        #
        # Deferred discretization (cluster_stratified(defer_discretization=
        # True)): dtrajs don't exist yet, so run the combined program that
        # emits the packed flux AND the predict-order ids in ONE
        # dispatch+sync -- the two score GEMMs run once for both outputs.
        if self._parent_idx is None and strat is not None:
            from .parallel.sharded import (
                build_sharded_step_packed_with_ids, flux_pack_capacity,
                unpack_packed_flux,
            )

            # Same junk-id guard as _sharded_pair_discretize: this program
            # is about to mint the build's dtrajs
            _check_live_centers(strat, pbins, cbins)
            step = build_sharded_step_packed_with_ids(
                mesh, n_states, strat.n_total_clusters + 2,
                with_target_p=True, n_bins=n_bins,
            )
            with _scoped_x64():
                buf, both = step(*args)
            # One overlapped download: device_get issues async host copies
            # for both outputs before blocking, merging what were two
            # serial ~RTT-bound syncs through the remote tunnel
            import jax

            buf, both = jax.device_get((buf, both))
            self._store_dtrajs(*_id_columns_to_host(both, N))
            fm = unpack_packed_flux(
                np.asarray(buf), n_states, flux_pack_capacity(n_states)
            )
            if fm is not None:
                return fm
            log.debug(
                "Packed flux overflowed its nonzero capacity; re-running "
                "the dense device step."
            )
        # Matrices big enough for the download to matter go through the
        # packed-sparse variant (the dense f64 download is ~80 ms of a warm
        # 100k build on a ~10 MB/s tunnel); an overflowing nonzero count
        # falls back to the dense program.
        elif n_states >= 96:
            from .parallel.sharded import (
                build_sharded_step_packed, flux_pack_capacity,
                unpack_packed_flux,
            )

            step = build_sharded_step_packed(
                mesh, n_states, with_target_p=True, n_bins=n_bins
            )
            with _scoped_x64():
                buf = step(*args)
            fm = unpack_packed_flux(
                np.asarray(buf), n_states, flux_pack_capacity(n_states)
            )
            if fm is not None:
                return fm
            log.debug(
                "Packed flux overflowed its nonzero capacity; re-running "
                "the dense device step."
            )
        step = build_sharded_step(mesh, n_states, with_target_p=True, n_bins=n_bins)
        with _scoped_x64():
            fm = step(*args)
        fm = np.asarray(fm, dtype=np.float64)
        assert fm.shape == (n_states, n_states)
        return fm

    def organize_fluxMatrix(self, use_ray=False, progress_bar=None,
                            incremental=True, max_passes=10, **args):
        """Clean the flux matrix (reference ``organize_fluxMatrix``,
        ``_fluxmatrix.py:347-415``). ``incremental=False`` forces the
        reference-style full re-discretization per pass; ``max_passes``
        bounds the clean-until-fixpoint loop. Unknown kwargs warn instead
        of silently disappearing (the reference swallows **args)."""
        if args:
            log.warning(f"organize_fluxMatrix ignoring unknown options {sorted(args)}")
        if self.clustering_method == "stratified":
            self.organize_stratified(
                incremental=incremental, max_passes=max_passes
            )
        elif self.clustering_method == "aggregated":
            self.organize_aggregated_simple(
                incremental=incremental, max_passes=max_passes
            )
        else:
            raise RuntimeError(
                f"Unrecognized clustering_method ({self.clustering_method})"
            )

    def _organize_flux_cleaning(self, remove_and_rediscretize, max_passes=10,
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

        fmatrix_original = self.fluxMatrixRaw.copy()

        for _pass in range(max_passes):
            fmatrix = self.fluxMatrixRaw.copy()
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

            basis_target = {self.n_clusters, self.n_clusters + 1}
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
            pcoord_sort_indices = self.get_cluster_centers()
            # Kept current for downstream consumers mapping raw (global-id)
            # assignments into the sorted fluxMatrix numbering (e.g. the
            # Aristoffian kh machinery in extended.py)
            self.pcoord_sort_indices = pcoord_sort_indices
            self._flux_prefer_host = host_flux
            try:
                self.get_fluxMatrix(*self._fluxMatrixParams)
            finally:
                self._flux_prefer_host = False
            fluxMatrix = self.fluxMatrixRaw[
                np.ix_(pcoord_sort_indices, pcoord_sort_indices)
            ]
            self.fluxMatrix = fluxMatrix / fluxMatrix.sum()
            # self.fluxMatrixRaw stays at the *new* clustering so the next
            # pass's SCC indices line up with the current global ids

        self.fluxMatrixRaw = fmatrix_original
        self.indBasis = np.array([self.n_clusters])
        self.indTargets = np.array([self.n_clusters + 1])
        self.nBins = self.n_clusters + 2
        self.update_sorted_cluster_centers()

        # Sanity check: everything is connected now
        fcheck = self.fluxMatrix.copy()
        fcheck[-1, -2] = 1.0
        remaining = find_connected_sets(fcheck, directed=True)
        assert len(remaining) == 1, "Still not clean after cleaning!"

    def organize_stratified(self, use_ray=False, progress_bar=None,
                            max_passes=10, incremental=True):
        """Stratified cleaning (reference ``organize_stratified``,
        ``_clustering.py:920-1142``): remove everything outside the largest
        strongly connected set, remap emptied WE bins, re-discretize,
        recompute, sort by mean pcoord, normalize. See
        :meth:`_organize_flux_cleaning` for the shared loop semantics.

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
        strat = self._strat

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

            self.n_clusters = strat.n_total_clusters
            assert self.n_clusters > 1, (
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
                    int(b), find_nearest_bin(self._bin_mapper, int(b), populated)
                )
            if incremental and self._parent_idx is not None:
                self._incremental_rediscretize(
                    strat, old_remap, old_global, old_total
                )
            else:
                self.launch_discretization()

        self._organize_flux_cleaning(
            remove_and_rediscretize, max_passes=max_passes,
            host_flux=incremental,
        )
        self.cluster_mapping = {x: x for x in range(self.n_clusters + 2)}

    def _incremental_rediscretize(self, strat, old_remap, old_global,
                                  old_total):
        """Patch the stored dtrajs after center removal/remap instead of
        re-discretizing every segment (see :meth:`organize_stratified`).

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
        feats = self._featurize_all()
        pbins_raw, cbins_raw = self._raw_we_bins()
        masks = self._pc_masks()
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
                new_idx[sub] = self._assign_rows_subset(
                    strat, rows_of(sub), strat.we_remap[raw_bins[sub]]
                )
            assert (new_idx >= 0).all()
            return new_idx

        # Row-getters instead of full arrays: the parent side reads the few
        # affected rows through the FeatureSet recipe without materializing
        # the (possibly lazy) full parent array
        parent_idx = update(
            self._parent_idx, lambda r: _feat_parent_rows(feats, r),
            pbins_raw, masks["basis_p"], masks["target_p"],
        )
        child_idx = update(
            self._child_idx, lambda r: feats["child"][r], cbins_raw,
            masks["basis_c"], masks["target_c"],
        )
        self._store_dtrajs(parent_idx, child_idx)

    def _assign_rows_subset(self, strat, X, bins_eff):
        """Stratified assignment for a (usually small) row subset, through
        the SAME scoring family the full discretization used: the host
        numpy formula when the original predict ran on host (no mesh and
        under ``HOST_BATCH_THRESHOLD`` rows), the jitted ``masked_assign``
        otherwise. Matching matters for the incremental==full identity: the
        two families' f32 roundings differ on near-ties. Device rows are
        padded to the next power of two so cleaning passes reuse a handful
        of compiled shapes."""
        from .ops.stratified import HOST_BATCH_THRESHOLD, _np_masked_assign

        full_rows = 2 * len(self._parent_idx)
        if self._mesh is None and full_rows < HOST_BATCH_THRESHOLD:
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

    def organize_aggregated_simple(self, max_passes=10, incremental=True):
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

        def remove_and_rediscretize(states_to_remove):
            old_n = self.n_clusters
            keep = np.setdiff1d(np.arange(old_n), states_to_remove)
            relabel = np.full(old_n, -1, np.int64)
            relabel[keep] = np.arange(len(keep))
            self.removed_clusters = states_to_remove
            self.clusters = _AggregateClustersShim(
                self.clusters.cluster_centers_[keep]
            )
            self.n_clusters = len(keep)
            if incremental and self._parent_idx is not None and len(keep) < old_n:
                feats = self._featurize_all()

                def upd(idx, rows_of):
                    new_idx = relabel[idx]
                    aff = np.flatnonzero(new_idx < 0)
                    if len(aff):
                        new_idx[aff] = self.clusters.predict(rows_of(aff))
                    return new_idx

                self._store_dtrajs(
                    upd(self._parent_idx, lambda r: _feat_parent_rows(feats, r)),
                    upd(self._child_idx, lambda r: feats["child"][r]),
                )
            elif incremental and self._parent_idx is not None:
                pass  # nothing removed: ids unchanged
            else:
                self._discretize_all_aggregated()

        self._organize_flux_cleaning(
            remove_and_rediscretize, max_passes=max_passes,
            host_flux=incremental,
        )
        self.removed_clusters = []

    # ------------------------------------------------------- cluster centers
    def get_cluster_centers(self):
        """Mean/min/max child-pcoord per cluster; returns the pcoord-sort
        permutation (reference ``_clustering.py:1528-1599``).

        Basis/target rows get NaN centers, so the stable argsort pins them to
        the last two positions -- the property that makes
        ``indBasis = [n_clusters]`` correct after sorting.
        """
        n = self.n_clusters
        centers = np.full((n + 2, self.pcoord_ndim), np.nan)
        crange = np.full((n + 2, self.pcoord_ndim, 2), np.nan)

        feats = self._featurize_all()
        self._ensure_discretized()
        child_idx = self._child_idx
        p1 = feats["pcoord1"]

        # Grouped mean/min/max in one pass per statistic (bincount for
        # count/sum; a group sort + ufunc.reduceat for min/max -- ufunc.at
        # is an unbuffered scalar loop, ~3 s at 2M rows where the sort-based
        # grouping is ~0.3 s) instead of an O(n_clusters * N) masked python
        # loop -- this runs inside every cleaning pass
        in_range = np.flatnonzero((child_idx >= 0) & (child_idx < n))
        idx = child_idx[in_range]
        vals = p1[in_range]
        good = ~np.isnan(vals)
        counts = np.zeros((n, self.pcoord_ndim))
        sums = np.zeros((n, self.pcoord_ndim))
        mins = np.full((n, self.pcoord_ndim), np.inf)
        maxs = np.full((n, self.pcoord_ndim), -np.inf)
        for dim in range(self.pcoord_ndim):
            g = np.flatnonzero(good[:, dim])
            gi = idx[g]
            gv = vals[g, dim]
            counts[:, dim] = np.bincount(gi, minlength=n)
            sums[:, dim] = np.bincount(gi, weights=gv, minlength=n)
            if len(gi):
                order_g = np.argsort(gi, kind="stable")
                gis = gi[order_g]
                gvs = gv[order_g]
                starts = np.r_[0, np.flatnonzero(np.diff(gis)) + 1]
                present = gis[starts]
                mins[present, dim] = np.minimum.reduceat(gvs, starts)
                maxs[present, dim] = np.maximum.reduceat(gvs, starts)
        populated = counts > 0
        centers[:n][populated] = sums[populated] / counts[populated]
        crange[:n, :, 0][populated] = mins[populated]
        crange[:n, :, 1][populated] = maxs[populated]
        empty = np.flatnonzero(~populated.any(axis=1))
        for cluster in empty:
            log.warning(f"No trajectories in cluster {cluster}!")

        order = np.argsort(centers[:, 0], kind="stable")
        self.targetRMSD_centers = centers[order]
        self.targetRMSD_minmax = crange[order]
        return order

    def update_sorted_cluster_centers(self):
        """Reference ``_clustering.py:1601-1611``."""
        log.info("Sorting bins, assuming that pcoord 0 is meaningful for sorting")
        bin_centers = self.targetRMSD_centers[:, 0].copy()
        bin_centers[self.indTargets] = self.target_bin_centers[0]
        bin_centers[self.indBasis] = self.basis_bin_centers[0]
        self.all_centers = bin_centers
        self.sorted_centers = np.argsort(bin_centers)

    def update_cluster_structures(self, build_pcoord_cache=False):
        """Map each cluster to its member structures, weights, and provenance
        (reference ``_clustering.py:1398-1526``).

        Grouping is one stable argsort + split over the concatenated arrays
        instead of the reference's per-segment python loop -- O(N log N)
        array work, so it stays off the critical path even at millions of
        segments (the restart driver calls this every restart).
        """
        assert self.clusters is not None, "Clusters have not been computed!"
        self._ensure_discretized()

        coords_parts, weights_parts, dtraj_parts = [], [], []
        iter_parts, segidx_parts, westidx_parts, pcoord_parts = [], [], [], []
        for iteration in range(1, self.maxIter - 1):
            d = self._dataset.iter_data(iteration)
            coords_parts.append(self._dataset._iter_frame_block(iteration, -1))
            weights_parts.append(d["weights"])
            dtraj_parts.append(np.asarray(self.dtrajs[iteration - 1]))
            iter_parts.append(np.full(d["n_segs"], iteration))
            segidx_parts.append(d["seg_idx"])
            westidx_parts.append(d["west_idx"])
            if build_pcoord_cache:
                pcoord_parts.append(d["pcoord1"])

        if not dtraj_parts:  # fewer than 3 usable iterations: nothing to map
            self.cluster_structures = {}
            self.cluster_structure_weights = {}
            self.structure_iteration_segments = {}
            self.pcoord_cache = {} if build_pcoord_cache else None
            return

        dtraj = np.concatenate(dtraj_parts)
        order = np.argsort(dtraj, kind="stable")
        sorted_clusters = dtraj[order]
        uniq, starts = np.unique(sorted_clusters, return_index=True)
        bounds = np.append(starts[1:], len(sorted_clusters))

        coords = np.concatenate(coords_parts)[order]
        weights = np.concatenate(weights_parts)[order]
        iters = np.concatenate(iter_parts)[order]
        segidx = np.concatenate(segidx_parts)[order]
        westidx = np.concatenate(westidx_parts)[order]
        pcoords = np.concatenate(pcoord_parts)[order] if build_pcoord_cache else None

        cluster_structures = {}
        cluster_structure_weights = {}
        structure_iteration_segments = {}
        pcoord_cache = {} if build_pcoord_cache else None
        for c, a, b in zip(uniq, starts, bounds):
            c = int(c)
            cluster_structures[c] = list(coords[a:b])
            cluster_structure_weights[c] = list(weights[a:b])
            structure_iteration_segments[c] = [
                [int(it), int(si), self.fileList[int(wi)]]
                for it, si, wi in zip(iters[a:b], segidx[a:b], westidx[a:b])
            ]
            if build_pcoord_cache:
                pcoord_cache[c] = list(pcoords[a:b])

        self.cluster_structures = cluster_structures
        self.cluster_structure_weights = cluster_structure_weights
        self.structure_iteration_segments = structure_iteration_segments
        self.pcoord_cache = pcoord_cache

    # -------------------------------------------------------------- analysis
    def get_Tmatrix(self):
        self.Tmatrix = linalg.tmatrix_from_flux(
            self.fluxMatrix, self.indTargets, self.indBasis, self.nBins
        )

    def get_eqTmatrix(self):
        self.Tmatrix = linalg.equilibrium_tmatrix_from_flux(
            self.fluxMatrix, self.indTargets, self.indBasis
        )

    def get_steady_state(self, flux_fractional_convergence=1e-4, max_iters=10):
        pSS, _flux = linalg.steady_state_refined(
            self.Tmatrix,
            self.indTargets,
            self.indBasis,
            self.nBins,
            self.tau * (self.n_lag + 1),
            flux_fractional_convergence=flux_fractional_convergence,
            max_iters=max_iters,
        )
        self.pSS = pSS

    def get_steady_state_algebraic(self, max_iters=1000, check_negative=True, set=True):
        pSS = linalg.steady_state_algebraic(
            self.Tmatrix, max_iters=max_iters, check_negative=check_negative
        )
        if set:
            self.pSS = pSS
        else:
            return pSS

    def get_steady_state_matrixpowers(self, conv):
        """Matrix-power steady state (reference ``_analysis.py:284-315``)."""
        max_iters = 10000
        Mt = self.Tmatrix.copy()
        dconv = 1.0e100
        N = 1
        pSS = np.mean(Mt, 0)
        pSSp = np.ones_like(pSS)
        while dconv > conv and N < max_iters:
            Mt = self.Tmatrix @ Mt
            N += 1
            if N % 10 == 0:
                pSS = np.mean(Mt, 0)
                pSS = pSS / pSS.sum()
                dconv = np.abs(pSS - pSSp).sum()
                pSSp = pSS.copy()
                self.pSS = pSS.copy()

    def get_steady_state_target_flux(self, pSS=None, _set=True):
        import scipy.sparse as sparse

        from .utils import is_connected

        sparse_mat = sparse.csr_matrix(self.Tmatrix)
        if not is_connected(sparse_mat, self.indBasis, self.indTargets, directed=True):
            log.critical(
                "There is no path from the basis to the target, so no MFPT can "
                "be calculated."
            )
            return -1

        if pSS is None:
            pSS = np.squeeze(np.asarray(self.pSS))
        lagtime = self.tau * (self.n_lag + 1)
        J = linalg.target_flux(
            np.asarray(self.Tmatrix), pSS, self.indTargets, self.nBins, lagtime
        )
        if _set:
            self.lagtime = lagtime
            self.JtargetSS = J
        else:
            return J

    def get_committor(self, conv=1e-5, max_iters=100_000):
        log.info(
            "Note: for steady-state WE data this is a 'pseudocommittor', not a "
            "true committor, as it comes from a one-way ensemble."
        )
        self.q = linalg.committor(
            self.fluxMatrix, self.indTargets, self.indBasis, self.nBins,
            conv=conv, max_iters=max_iters,
        )

    def get_backwards_committor(self, conv, max_iters=100_000):
        self.qm = linalg.backwards_committor(
            self.fluxMatrix, self.indTargets, self.indBasis, self.nBins, conv,
            max_iters=max_iters,
        )
        self.q = self.qm.copy()

    def bootstrap_target_flux(
        self,
        n_boot=200,
        seed=0,
        alpha=0.05,
        block_size=1,
        iters_to_use=None,
        flux_fractional_convergence=1e-4,
        max_iters=10,
        observables=("flux",),
    ):
        """Block-bootstrap confidence interval for ``JtargetSS`` over WE
        iterations (an extension; the reference has only point estimates
        plus block cross-validation).

        WE iterations are the natural resampling unit: each contributes an
        independent per-iteration flux matrix, and the build's estimate is
        their mean. Replicates resample iterations with replacement
        (``block_size > 1`` draws contiguous circular blocks, for runs whose
        iteration-to-iteration fluxes are correlated), rebuild the flux
        matrix, and run the same Tmatrix -> refined-steady-state -> target
        flux chain as the point estimate. Per-iteration matrices are in the
        current (cleaned) cluster numbering, a pure permutation of the
        model's sorted numbering, so replicate fluxes are directly
        comparable to ``self.JtargetSS``.

        Replicates whose resampled matrix disconnects basis from target are
        counted in ``n_failed`` and excluded from the percentiles.

        Returns a dict: ``flux`` (point estimate), ``mean``, ``std``,
        ``ci`` ((lo, hi) percentile interval at ``1 - alpha``),
        ``fluxes`` (per-replicate values, NaN where failed), ``n_failed``.

        ``observables`` may additionally include ``"pss"`` and/or
        ``"committor"``: each surviving replicate's steady-state
        distribution / forward committor is collected and per-state
        percentile bands are added to the result (``pss_mean``/``pss_ci``
        of shapes (n_states,) / (2, n_states), and likewise
        ``committor_mean``/``committor_ci``). The committor adds one
        absorbing-BC power iteration per replicate (reference
        ``_analysis.py:527-606`` semantics via ``ops.linalg.committor``).
        """
        observables = tuple(observables)
        unknown = set(observables) - {"flux", "pss", "committor"}
        if unknown:
            raise ValueError(
                f"Unknown bootstrap observables {sorted(unknown)}; "
                "supported: 'flux', 'pss', 'committor'"
            )
        self._ensure_discretized()
        if iters_to_use is None:
            params = getattr(self, "_fluxMatrixParams", None) or [0, 1, None, None]
            if params[3] is not None:
                iters_to_use = list(params[3])
            else:
                first = params[1] if params[1] is not None else 1
                last = params[2] if params[2] is not None else self.maxIter
                iters_to_use = list(
                    range(max(first + 1, self.n_lag + 1), last)
                )
        iters = [int(i) for i in iters_to_use]
        n_it = len(iters)
        if n_it < 2:
            raise ValueError(
                f"Bootstrap needs at least 2 iterations, got {n_it}"
            )
        if self.n_lag != 0:
            raise NotImplementedError(
                "bootstrap_target_flux currently supports lag-0 models "
                "(per-iteration matrices are lag-0)."
            )
        block_size = int(block_size)
        if not 1 <= block_size <= n_it:
            raise ValueError(f"block_size must be in [1, {n_it}]")

        per_iter = np.stack([self.get_iter_fluxMatrix(i) for i in iters])
        n_states = self.n_clusters + 2
        lagtime = self.tau * (self.n_lag + 1)
        # Per-iteration matrices carry basis/target at the override indices
        ind_basis = np.array([self.n_clusters])
        ind_targets = np.array([self.n_clusters + 1])

        want_pss = "pss" in observables
        want_q = "committor" in observables
        # Per-iteration matrices are in the cleaned-but-unsorted (raw)
        # numbering; the model's pSS/committor are pcoord-sorted. The scalar
        # flux is permutation-invariant (basis/target stay at n, n+1 under
        # the NaN-pinned stable sort), but per-state vectors must be
        # reordered into the model's numbering before percentiles.
        sort_idx = getattr(self, "pcoord_sort_indices", None)
        if sort_idx is not None and len(sort_idx) != n_states:
            # Stale: a re-clustering after the last organize left a sort
            # index for a different state count. Flux is permutation-
            # invariant, but per-state vectors would be mislabeled (or
            # crash), so require a fresh organize for those observables.
            if want_pss or want_q:
                raise ValueError(
                    f"pcoord_sort_indices has length {len(sort_idx)} but the "
                    f"model now has {n_states} states -- re-run "
                    "organize_fluxMatrix before bootstrapping per-state "
                    "observables."
                )
            sort_idx = None
        if sort_idx is None:
            sort_idx = np.arange(n_states)

        def _eval(F):
            T = linalg.tmatrix_from_flux(F, ind_targets, ind_basis, n_states)
            pSS, J = linalg.steady_state_refined(
                T,
                ind_targets,
                ind_basis,
                n_states,
                lagtime,
                flux_fractional_convergence=flux_fractional_convergence,
                max_iters=max_iters,
            )
            q = (
                linalg.committor(F, ind_targets, ind_basis, n_states)[sort_idx]
                if want_q
                else None
            )
            return J, np.ravel(pSS)[sort_idx], q

        rng = np.random.default_rng(seed)
        fluxes = np.full(n_boot, np.nan)
        pss_boot = np.full((n_boot, n_states), np.nan) if want_pss else None
        q_boot = np.full((n_boot, n_states), np.nan) if want_q else None
        n_failed = 0
        n_blocks = -(-n_it // block_size)
        # Degenerate resamples legitimately trigger per-replicate solver
        # retries / zero-flux warnings; hundreds of those drown the log.
        # Silence the package logger for the loop and summarize after.
        import logging as _logging

        prev_level = log.level
        log.setLevel(_logging.CRITICAL)
        try:
            for b in range(n_boot):
                if block_size == 1:
                    picks = rng.integers(0, n_it, n_it)
                else:
                    starts = rng.integers(0, n_it, n_blocks)
                    picks = (
                        starts[:, None] + np.arange(block_size)[None, :]
                    ).reshape(-1)[:n_it] % n_it
                try:
                    J, pSS_b, q_b = _eval(per_iter[picks].mean(axis=0))
                except (ValueError, AssertionError):
                    n_failed += 1
                    continue
                fluxes[b] = J
                if want_pss:
                    pss_boot[b] = pSS_b
                if want_q:
                    q_boot[b] = q_b
        finally:
            log.setLevel(prev_level)
        if n_failed:
            log.warning(
                f"{n_failed}/{n_boot} bootstrap replicates disconnected the "
                "basis from the target and were excluded."
            )

        ok = fluxes[np.isfinite(fluxes)]
        if not len(ok):
            raise RuntimeError(
                "Every bootstrap replicate disconnected basis from target; "
                "the model has too little recycling data for error bars."
            )
        lo, hi = np.percentile(ok, [100 * alpha / 2, 100 * (1 - alpha / 2)])
        point, point_pss, point_q = _eval(per_iter.mean(axis=0))
        result = {
            "flux": float(point),
            "mean": float(ok.mean()),
            "std": float(ok.std(ddof=1)) if len(ok) > 1 else 0.0,
            "ci": (float(lo), float(hi)),
            "alpha": alpha,
            "fluxes": fluxes,
            "n_failed": int(n_failed),
            # Zero-flux replicates are legitimate bootstrap mass (a resample
            # holding no recycling events), surfaced for interpretability
            "n_zero_flux": int((ok == 0.0).sum()),
            "block_size": block_size,
            "n_iterations": n_it,
            # Staleness stamp: consumers (plot_committor) compare this to
            # the model's current sort index -- a same-size re-organize
            # changes state identities without changing n_states
            "sort_indices": np.asarray(sort_idx).copy(),
        }
        pcts = [100 * alpha / 2, 100 * (1 - alpha / 2)]
        for name, boot, pt in (
            ("pss", pss_boot, point_pss),
            ("committor", q_boot, point_q),
        ):
            if boot is None:
                continue
            rows = boot[np.all(np.isfinite(boot), axis=1)]
            result[name] = pt
            result[f"{name}_mean"] = rows.mean(axis=0)
            result[f"{name}_ci"] = np.percentile(rows, pcts, axis=0)
        self.flux_bootstrap = result
        return result

    def get_flux(self):
        """Net flux profile over pcoord-sorted states + overcorrection check
        (reference ``_analysis.py:386-466``)."""
        from scipy.stats import linregress

        centers = self.targetRMSD_centers[:, 0].copy()
        centers[self.indBasis] = self.basis_bin_centers[0]
        centers[self.indTargets] = self.target_bin_centers[0]
        order = np.argsort(centers)

        self.J = linalg.net_flux_profile(self.fluxMatrix, order)

        if self.all_centers is None:
            self.update_sorted_cluster_centers()

        slope, intercept, r_value, p_value, std_err = linregress(
            self.all_centers, self.J / self.tau
        )
        self.fit_parameters = {
            "slope": slope,
            "intercept": intercept,
            "r_value": r_value,
            "p_value": p_value,
            "std_err": std_err,
        }

        target_before_basis = bool(
            np.any(self.target_bin_centers < self.basis_bin_centers)
        )
        self.slope_overcorrected = (slope < 0) if target_before_basis else (slope > 0)
        if self.slope_overcorrected:
            log.warning(
                "Flux profile appears to be overcorrected: flux is higher near "
                "the target than the basis. Restarting may have driven the "
                "system past its true steady state; continue this WE run "
                "without restarting and let it relax."
            )

    def get_flux_committor(self):
        """Net flux profile over committor-sorted states (reference
        ``_analysis.py:468-501``)."""
        order = np.argsort(np.squeeze(1.0 - self.q))
        self.Jq = linalg.net_flux_profile(self.fluxMatrix, order) / self.tau

    def evolve_target_flux(self):
        """Reference ``_analysis.py:503-525``."""
        Mss = self.Tmatrix
        probTransient = self.probTransient
        nT = np.shape(probTransient)[0]
        Jtarget = np.zeros(nT)
        self.lagtime = self.tau * (self.n_lag + 1)
        ind_not_targets = np.setdiff1d(range(self.nBins), self.indTargets)
        JtargetTimes = np.zeros(nT)
        for iT in range(nT):
            Jt = float(
                np.sum(
                    probTransient[iT, ind_not_targets][:, None]
                    * Mss[np.ix_(ind_not_targets, np.asarray(self.indTargets))]
                )
            )
            Jtarget[iT] = Jt
            JtargetTimes[iT] = iT * self.nStore * self.lagtime
        self.Jtarget = Jtarget / self.lagtime
        self.JtargetTimes = JtargetTimes

    def get_implied_timescales(
        self, lags=(0, 1, 2), n_timescales=3, iters_to_use=None,
        drop_basis_target=True,
    ):
        """Implied-timescale lag test over WE lag windows.

        Builds the raw flux matrix at each ``n_lag`` in ``lags`` (the
        effective physical lag of an ``n_lag`` window is ``(n_lag+1)*tau``),
        drops the basis/target recycling states (their artificial recycling
        edge is not part of the physical relaxation spectrum), and converts
        the leading eigenvalue magnitudes of the row-normalized largest
        connected component to timescales. For dynamics that are Markovian
        in the cluster space the curves are flat in lag -- the standard MSM
        validation the reference cannot run (its lag machinery is gated,
        ``msm_we.py:353-359``).

        Returns ``(lag_times, timescales)`` with shapes ``(len(lags),)`` and
        ``(len(lags), n_timescales)``; also stored as
        ``self.implied_timescales``. The model's flux-matrix state is
        saved and restored, so this is safe to call on a built model.
        """
        from .ops.linalg import implied_timescales_from_flux

        fms, lag_times = self._lagged_flux_matrices(
            lags, iters_to_use, drop_basis_target
        )
        self.implied_timescales = implied_timescales_from_flux(
            fms, lag_times, n_timescales=n_timescales
        )
        return lag_times, self.implied_timescales

    def _lagged_flux_matrices(self, lags, iters_to_use, drop_basis_target):
        """Raw flux matrices at each ``n_lag`` in ``lags``, with the model's
        flux-matrix state saved and restored around the rebuilds."""
        saved = (
            getattr(self, "fluxMatrixRaw", None),
            self.n_lag,
            getattr(self, "_fluxMatrixParams", None),
            getattr(self, "errorWeight", None),
            getattr(self, "errorCount", None),
        )
        fms, lag_times = [], []
        try:
            for lag in lags:
                self.get_fluxMatrix(int(lag), iters_to_use=iters_to_use)
                fm = np.asarray(self.fluxMatrixRaw)
                if drop_basis_target:
                    n = self.n_clusters
                    fm = fm[:n, :n]
                fms.append(fm)
                lag_times.append((int(lag) + 1) * self.tau)
        finally:
            (self.fluxMatrixRaw, self.n_lag, self._fluxMatrixParams,
             self.errorWeight, self.errorCount) = saved
        return fms, np.asarray(lag_times, dtype=np.float64)

    def get_ck_test(self, lags=(0, 1, 2, 3), sets=None, iters_to_use=None):
        """Chapman-Kolmogorov test over WE lag windows.

        The base model is the ``lags[0]`` window (physical lag
        ``(lags[0]+1)*tau``); every later window's physical lag must be an
        integer multiple of it (the defaults give factors 1, 2, 3, 4).
        Compares set-residence probabilities of the directly estimated
        lagged models against the base model propagated
        (:func:`~msm_we_tpu.ops.linalg.chapman_kolmogorov_from_flux`);
        coinciding curves indicate Markovian dynamics in the cluster space.
        ``sets=None`` uses the 2-metastable split by the slowest mode's sign
        structure; an integer ``sets=n`` coarse-grains the base model into n
        metastable sets with PCCA+ (:func:`~msm_we_tpu.ops.linalg.pcca_sets`).
        Returns ``(lag_times, sets, predicted, estimated)``;
        stored as ``self.ck_test``. Extends the reference (lag gated off).
        """
        from .ops.linalg import chapman_kolmogorov_from_flux, pcca_sets

        fms, lag_times = self._lagged_flux_matrices(
            lags, iters_to_use, drop_basis_target=True
        )
        if isinstance(sets, bool):
            raise ValueError(
                "sets must be None (slowest-mode split), an integer PCCA+ "
                "set count, or explicit state-index arrays -- not a bool"
            )
        if isinstance(sets, (int, np.integer)):
            sets = pcca_sets(fms[0], int(sets))
        base = lag_times[0]
        factors = lag_times / base
        int_factors = np.rint(factors).astype(int)
        if not np.allclose(factors, int_factors):
            raise ValueError(
                f"CK test needs integer lag multiples of the base window; "
                f"got physical lags {lag_times} (base {base})"
            )
        sets, predicted, estimated = chapman_kolmogorov_from_flux(
            fms, int_factors, sets=sets
        )
        self.ck_test = (lag_times, sets, predicted, estimated)
        return self.ck_test

    # ------------------------------------------------------- block validation
    def do_block_validation(
        self,
        cross_validation_groups,
        cross_validation_blocks,
        use_ray=False,
        progress_bar=None,
    ):
        """Split iterations into blocks/groups and build independent models
        (reference ``msm_we.py:884-1009``)."""
        assert getattr(self, "post_cluster_model", None) is not None, (
            "Perform clustering with cluster_coordinates() before attempting "
            "block validation -- self.post_cluster_model is not set."
        )

        validation_models = [
            deepcopy(self.post_cluster_model) for _ in range(cross_validation_groups)
        ]
        iters_per_block = self.post_cluster_model.maxIter // cross_validation_blocks
        block_iterations = [
            [start, start + iters_per_block]
            for start in range(1, self.post_cluster_model.maxIter, iters_per_block)
        ]
        block_iterations[-1][-1] -= 1
        group_blocks = [
            range(start_idx, cross_validation_blocks, cross_validation_groups)
            for start_idx in range(cross_validation_groups)
        ]

        validation_iterations = []
        for group in range(cross_validation_groups):
            group_iterations = []
            for block in group_blocks[group]:
                group_iterations.extend(range(*block_iterations[block]))
            validation_iterations.append(group_iterations)

            try:
                _model = validation_models[group]
                _model.get_fluxMatrix(0, iters_to_use=validation_iterations[group])
                _model.organize_fluxMatrix()
                _model.get_Tmatrix()
                _model.get_steady_state()
                _model.get_steady_state_target_flux()
            except Exception as e:
                log.error("Error during block validation!")
                log.exception(e)
                raise modelWE.BlockValidationError(e)

        self.validation_iterations = validation_iterations
        self.validation_models = validation_models

    # ------------------------------------------------------------- pipeline
    def build_analyze_model(
        self,
        file_paths,
        ref_struct,
        modelName,
        basis_pcoord_bounds,
        target_pcoord_bounds,
        dimreduce_method,
        tau,
        n_clusters,
        ray_kwargs={},
        max_coord_iter=-1,
        stratified=True,
        streaming=True,
        use_ray=False,
        fluxmatrix_iters=[1, -1],
        fluxmatrix_iters_to_use=None,
        cross_validation_groups=2,
        cross_validation_blocks=4,
        show_live_display=True,
        allow_validation_failure=False,
        step_kwargs={},
        progress_bar=None,
        profile_dir=None,
        device_pipeline=False,
        dedup_coordinates="auto",
    ):
        """One-shot build + analysis (reference ``msm_we.py:588-882``).

        Each stage's wall-clock is recorded in ``self.stage_timings``
        (a :class:`~msm_we_tpu.tracing.StageTimer`); ``show_live_display``
        renders a rich Live step table as stages progress (the reference's
        ``new_table``/``do_step`` display, ``msm_we.py:529-586``); pass
        ``profile_dir`` to additionally capture a JAX profiler trace of the
        whole build.

        ``device_pipeline=True`` enables a device mesh over all visible chips
        (``enable_mesh``): discretization and the flux matrix then run as
        mesh-sharded programs (f32 assignment matmuls, f64 flux scatter +
        psum) with results identical to the host path. The analysis tail
        stays in host float64 (the SURVEY section 7 precision split).
        """
        from .tracing import StageTimer, live_stage_display, profile_trace

        model = self
        if device_pipeline and model._mesh is None:
            model.enable_mesh()
        timer = StageTimer()
        model.stage_timings = timer

        with profile_trace(profile_dir), live_stage_display(
            timer, enabled=show_live_display
        ):
            with timer.stage("Model initialization"):
                model.initialize(
                    file_paths,
                    ref_struct,
                    modelName,
                    basis_pcoord_bounds=basis_pcoord_bounds,
                    target_pcoord_bounds=target_pcoord_bounds,
                    dim_reduce_method=dimreduce_method,
                    tau=tau,
                    **{
                        "dedup_coordinates": dedup_coordinates,
                        **step_kwargs.get("initialize", {}),
                    },
                )
            with timer.stage("Loading iterations"):
                model.get_iterations()
                timer.set_note(f"{model.maxIter} iterations")
            _max_coord_iter = (
                model.maxIter if max_coord_iter == -1 else max_coord_iter
            )
            with timer.stage("Loading coordinates"):
                model.get_coordSet(_max_coord_iter)
            with timer.stage("Dimensionality reduction"):
                model.dimReduce(**step_kwargs.get("dimReduce", {}))
                timer.set_note(f"method={model.dimReduceMethod}, ndim={model.ndim}")
            with timer.stage("Clustering"):
                cluster_kwargs = dict(step_kwargs.get("clustering", {}))
                if device_pipeline and stratified and cross_validation_groups == 0:
                    # The flux stage's combined device program materializes
                    # dtrajs as a byproduct -- skip the standalone
                    # discretization dispatch+sync here. (With validation
                    # on, post_cluster_model must snapshot materialized
                    # dtrajs, so keep the eager path.)
                    cluster_kwargs.setdefault("defer_discretization", True)
                model.cluster_coordinates(
                    n_clusters=n_clusters,
                    streaming=streaming,
                    stratified=stratified,
                    store_validation_model=cross_validation_groups > 0,
                    **cluster_kwargs,
                )
            _fm_iters = list(fluxmatrix_iters)
            if _fm_iters[1] == -1:
                _fm_iters[1] = model.maxIter
            with timer.stage("Flux matrix"):
                model.get_fluxMatrix(
                    0,
                    first_iter=_fm_iters[0],
                    last_iter=_fm_iters[1],
                    iters_to_use=fluxmatrix_iters_to_use,
                    **step_kwargs.get("fluxmatrix", {}),
                )
            original_clusters = model.fluxMatrixRaw.shape[0]
            with timer.stage("Cleaning"):
                model.organize_fluxMatrix(**step_kwargs.get("organize", {}))
                timer.set_note(
                    f"{original_clusters} -> {model.fluxMatrix.shape[0]} clusters"
                )
            with timer.stage("Transition matrix"):
                model.get_Tmatrix()
            with timer.stage("Steady-state distribution"):
                model.get_steady_state()
            with timer.stage("Steady-state target flux"):
                model.get_steady_state_target_flux()
                timer.set_note(f"JtargetSS={model.JtargetSS:.2e}")

            if cross_validation_groups > 0:
                with timer.stage("Cross-validation"):
                    try:
                        model.do_block_validation(
                            cross_validation_groups=cross_validation_groups,
                            cross_validation_blocks=cross_validation_blocks,
                            **step_kwargs.get("block_validation", {}),
                        )
                    except Exception as e:
                        log.error(e)
                        if not allow_validation_failure:
                            raise

        log.info("\n" + timer.report())
        # Release cached read handles: WESTPA reopens the same west.h5
        # read-write after the plugin builds a model, and an in-process 'r'
        # handle makes that reopen fail (HDF5 flag conflict). Later model
        # reads lazily reopen.
        model.close_files()
        return model

    def close_files(self):
        """Close any cached read-only h5 handles (they reopen lazily on the
        next read). Call before another writer opens the same west.h5 files
        in this process -- WESTPA's data manager, augmentation scripts."""
        if self._dataset is not None:
            self._dataset.close()

    # ---------------------------------------------------------------- meshes
    def enable_mesh(self, mesh=None):
        """Run discretization data-parallel over a device mesh.

        With no argument, builds a ('data', 'model') mesh over all visible
        devices (``parallel.make_mesh``). Results are identical to the
        single-device path; segments shard over 'data', the center bank over
        'model' (SURVEY.md P1's TPU-native replacement for Ray fan-out).
        Call after ``cluster_coordinates`` or before -- the mesh attaches to
        the stratified bank when available.
        """
        from .parallel import make_mesh

        self._mesh = mesh if mesh is not None else make_mesh()
        self._dev_feats_cache = None  # device arrays are mesh-specific
        if self._strat is not None:
            self._strat.use_mesh(self._mesh)
        return self._mesh

    def _device_row_feats(self, need_parent=True):
        """Padded, P('data')-sharded device copies of the parent/child
        feature arrays, shared by the sharded discretization and the fused
        flux step (same layout). One upload per featurization: at 2M
        segments the repeated ~475 MB feature upload through a remote
        tunnel was ~3.5 s of the flux stage alone.

        ``need_parent=False`` skips building the parent array (the
        child-only dedup discretization never reads it — at 2M segments
        the on-device parent gather allocates ~N_pad x d of HBM and a
        dispatch for nothing); a later ``need_parent=True`` call fills it
        in from the cached child upload.

        The cache pins the feature dict it was built from; recomputed
        features or a new mesh invalidate it.
        """
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        feats = self._featurize_all()
        mesh = self._mesh
        data_size = mesh.shape["data"]
        N = len(feats["weights"])
        N_pad = -(-N // data_size) * data_size

        cache = getattr(self, "_dev_feats_cache", None)
        if cache is not None and cache[0] is feats and cache[1] == N_pad:
            parent_dev, child_dev = cache[2]
            if parent_dev is not None or not need_parent:
                return cache[2]
        else:
            child_dev = None

        sharding = NamedSharding(mesh, P("data"))

        def pad_put(a):
            out = np.zeros((N_pad, a.shape[1]), np.float32)
            out[:N] = a
            return jax.device_put(out, sharding)

        if child_dev is None:
            child_dev = pad_put(feats["child"])
        if not need_parent:
            parent_dev = None
        elif isinstance(feats, FeatureSet) and feats.parent_is_lazy:
            # Features born on device: parent rows are a device gather of
            # the child upload (bit-copies by WE continuity) — skips the
            # host gather and the redundant parent upload entirely
            parent_dev = _device_parent_from_child(
                child_dev, feats, N_pad, sharding
            )
        else:
            parent_dev = pad_put(feats["parent"])
        pair = (parent_dev, child_dev)
        self._dev_feats_cache = (feats, N_pad, pair)
        return pair

    # ---------------------------------------------------------- checkpointing
    def __getstate__(self):
        # Device meshes and compiled steps are process-local; call
        # enable_mesh() again after load
        state = self.__dict__.copy()
        state["_mesh"] = None
        state["_dev_feats_cache"] = None  # device arrays are process-local
        state["_pc_masks_cache"] = None  # derived; rebuilt on demand
        state.pop("_flux_step_cache", None)  # legacy pickles
        return state

    def __deepcopy__(self, memo):
        # __getstate__ also governs deepcopy, which would silently strip the
        # mesh from validation-model copies; keep the live mesh attached
        import copy as _copy

        mesh = self._mesh
        cls = self.__class__
        new = cls.__new__(cls)
        memo[id(self)] = new
        new.__dict__.update(_copy.deepcopy(self.__getstate__(), memo))
        if mesh is not None:
            new.enable_mesh(mesh)
        return new

    def save(self, path):
        """Pickle the full model (the reference's checkpoint format:
        ``restart_driver.py:1139-1143``, ``run_msmWE_flux.py:148-162``)."""
        import pickle

        with open(path, "wb") as fp:
            pickle.dump(self, fp, protocol=4)
        log.info(f"Model saved to {path}")

    @classmethod
    def load(cls, path, h5_paths=None):
        """Unpickle a model; optionally re-anchor its west.h5 paths.

        ``h5_paths`` replaces ``fileList`` and re-opens the dataset -- the
        moved-data workaround the reference test fixtures perform by rewriting
        pickled absolute paths (``tests/fixtures/hamsms.py:132-148``).
        """
        import pickle

        with open(path, "rb") as fp:
            model = pickle.load(fp)
        if h5_paths is not None:
            model.fileList = list(h5_paths)
            model.n_data_files = len(model.fileList)
            model._dataset = WEDataset(
                model.fileList,
                pcoord_ndim=model.pcoord_ndim,
                auxpath=model.auxpath,
            )
            model._features = None  # cached features refer to the old files
            model._raw_bins_cache = None
        return model

    # -------------------------------------------------------------- plotting
    def plot_flux(self, *args, **kwargs):
        from . import plotting

        return plotting.plot_flux(self, *args, **kwargs)

    def plot_flux_committor(self, *args, **kwargs):
        from . import plotting

        return plotting.plot_flux_committor(self, *args, **kwargs)

    def plot_flux_committor_pcoordcolor(self, *args, **kwargs):
        from . import plotting

        return plotting.plot_flux_committor_pcoordcolor(self, *args, **kwargs)

    def plot_committor(self, *args, **kwargs):
        from . import plotting

        return plotting.plot_committor(self, *args, **kwargs)

    def get_coarse_flux_profile(self, *args, **kwargs):
        from . import plotting

        return plotting.get_coarse_flux_profile(self, *args, **kwargs)

    def plot_coarse_flux_profile(self, *args, **kwargs):
        from . import plotting

        return plotting.plot_coarse_flux_profile(self, *args, **kwargs)

    def draw_basis_target_boundaries(self, ax, pcoord_to_use=0):
        from . import plotting

        return plotting.draw_basis_target_boundaries(self, ax, pcoord_to_use)

    def plot_implied_timescales(self, *args, **kwargs):
        from . import plotting

        return plotting.plot_implied_timescales(self, *args, **kwargs)

    def plot_ck_test(self, *args, **kwargs):
        from . import plotting

        return plotting.plot_ck_test(self, *args, **kwargs)

    @staticmethod
    def print_pseudocommittor_warning():
        log.info(
            "Note: for steady-state WE data this is a 'pseudocommittor', not "
            "a true committor, as it comes from a one-way ensemble."
        )

    # ---------------------------------------------- reference-API compat shims
    @staticmethod
    def find_nearest_bin(bin_mapper, bin_idx, filled_bins):
        """Reference ``_clustering.py:1331-1396``; delegates to binning."""
        return find_nearest_bin(bin_mapper, bin_idx, filled_bins)

    def load_iter_coordinates(self):
        """Set ``cur_iter_coords`` to the current iteration's final-frame
        coordinates (reference ``_data.py:557-618``); NaN rows preserved."""
        self.cur_iter_coords = self._dataset._iter_frame_block(self.n_iter, -1)

    def load_iter_coordinates0(self):
        """Set ``cur_iter_coords`` to the iteration's *initial* coordinates
        (reference ``_data.py:620-645``)."""
        self.cur_iter_coords = self._dataset._iter_frame_block(self.n_iter, 0)

    def get_iter_fluxMatrix(self, n_iter):
        """Single-iteration flux matrix (reference ``_fluxmatrix.py:21-72``)."""
        d = self._dataset.iter_data(n_iter)
        self._ensure_discretized()
        # NaN-zeroed weights from the feature cache (already materialized by
        # the discretization above) -- iter_coord_pairs would re-read BOTH
        # full coordinate frames just to recompute this vector
        feats = self._featurize_all()
        offs = feats["offsets"]
        weights = feats["weights"][offs[n_iter - 1] : offs[n_iter]]
        pairs = np.asarray(self.pair_dtrajs[n_iter - 1])
        start_idx, end_idx = pairs[:, 0].copy(), pairs[:, 1].copy()
        n_states = self.n_clusters + 2
        end_idx = np.where(self.is_WE_target(d["pcoord1"]), self.n_clusters + 1, end_idx)
        if self.clustering_method == "stratified":
            # Same nominal-numbering routing as get_fluxMatrix: stratified
            # predict short-circuits target-region parents to its own
            # target index (n_total_clusters + 1), which pre-cleaning can be
            # a dead regular-cluster slot in the nominal n_clusters + 2
            # numbering -- route them to the nominal target row. Applied
            # BEFORE start-in-basis: with overlapping bounds, basis wins
            # (reference composition, _fluxmatrix.py:134-137)
            start_idx = np.where(
                self.is_WE_target(d["pcoord0"]), self.n_clusters + 1, start_idx
            )
        start_idx = np.where(self.is_WE_basis(d["pcoord0"]), self.n_clusters, start_idx)
        end_idx = np.where(self.is_WE_basis(d["pcoord1"]), self.n_clusters, end_idx)
        flat = start_idx.astype(np.int64) * n_states + end_idx.astype(np.int64)
        return np.bincount(flat, weights=weights, minlength=n_states**2).reshape(
            n_states, n_states
        )

    def get_transition_data(self, n_lag):
        """Populate ``coordPairList``/``transitionWeights``/``departureWeights``
        at lag ``n_lag`` for the currently loaded iteration.

        Start structures come from the segment's ancestor ``n_lag``
        iterations back; recycled lineages substitute ``basis_coords``
        (``set_basis``). Exceeds the reference, whose lag>0 path is gated off
        (``msm_we.py:353-359``) and internally unreachable
        (``_data.py:48-252``).
        """
        if n_lag == 0:
            # Keep n_lag consistent with the data populated: downstream
            # lagtime math (tau * (n_lag + 1)) would otherwise keep a stale
            # lag from an earlier call and silently rescale rates
            self.n_lag = 0
            return self.get_transition_data_lag0()
        tp = self._dataset.iter_transition_pairs(
            self.n_iter, n_lag, basis_coords=self.basis_coords
        )
        self.n_lag = n_lag
        self.coordPairList = np.stack([tp["start"], tp["end"]], axis=-1)
        self.transitionWeights = tp["weights"]
        self.departureWeights = tp["departure_weights"]

    def get_iterations_iters(self, first_iter, last_iter):
        """Segment counts over an iteration range (reference ``_data.py:995-1040``).

        Metadata only: counts come from the scan index, no per-iteration I/O.
        """
        index = self._dataset._iter_index
        self.numSegments = np.array(
            [
                float(sum(n for _f, n in index[i]))
                for i in range(first_iter, last_iter + 1)
                if i in index
            ]
        )
        self.maxIter = last_iter

    def get_coordinates(self, first_iter, last_iter):
        """Reference ``_data.py:647-675`` (it warns 'not tested or supported')."""
        log.warning("This function is not tested or supported, use at your own risk!")
        self.first_iter = first_iter
        self.last_iter = last_iter
        blocks = []
        for i in range(first_iter, last_iter + 1):
            blocks.append(self._dataset._iter_frame_block(i, -1))
        self.all_coords = np.concatenate(blocks)

    def collect_iter_coordinates(self, **kwargs):
        """Augment the model's west.h5 files with segment coordinates.

        Delegates to :func:`msm_we_tpu.scripts.augment_west_h5` (the working
        generalization of the reference's AMBER-specific example,
        ``_data.py:423-529``, which hardcoded ``traj_segs/%06d/%06d`` +
        ``parent.rst7``/``seg.rst7`` — the same defaults used here, but for
        any mdtraj-loadable format). Topology defaults to the model's
        ``refPDBfile``; layout/filenames are overridable via kwargs
        (``seg_dir_format``, ``parent_filename``, ``child_filename``,
        ``auxpath``, ``overwrite``). Unlike the reference, this augments
        every complete iteration, not just ``self.n_iter``.

        Returns the total number of iterations augmented across files.
        """
        from .scripts.collect_coordinates import augment_west_h5

        log.warning(
            "collect_iter_coordinates assumes a WESTPA traj_segs/ directory "
            "layout -- be sure it matches your simulation output "
            "(reference `_data.py:441-444`)."
        )
        import os as _os

        topology = kwargs.pop("topology_path", getattr(self, "refPDBfile", None))
        if isinstance(topology, _os.PathLike):
            topology = _os.fspath(topology)
        if not isinstance(topology, str):
            raise ValueError(
                "collect_iter_coordinates needs a topology file path; the "
                "model was initialized with a non-path topology. Pass "
                "topology_path=..."
            )
        kwargs.setdefault("auxpath", self.auxpath)
        if self._dataset is not None:
            # Release cached read handles before opening in append mode
            self._dataset.close()
        total = 0
        for west_file in self.fileList:
            total += augment_west_h5(west_file, topology, **kwargs)
        return total

    def launch_ray_discretization(self, progress_bar=None):
        """Compat alias: discretization is one batched device call now."""
        return self.launch_discretization(progress_bar=progress_bar)

    def organize_aggregated(self, use_ray=False, **args):
        """The reference's organize_aggregated is deprecated and raises
        (``_fluxmatrix.py:452-454``); this delegates to the working SCC-based
        equivalent."""
        return self.organize_aggregated_simple()

    def check_display_overcorrection_warning(self, ax):
        from . import plotting

        return plotting._check_display_overcorrection_warning(self, ax)

    # ------------------------------------------------------------- misc compat
    @staticmethod
    def check_connect_ray():
        """No-op: Ray is replaced by single-program JAX (SURVEY.md P1)."""
        log.debug("Ray not required: parallelism is provided by JAX sharding.")

    def progress_disable(self):
        pass

    def progress_enable(self):
        pass

    # Manual live-table helpers (reference msm_we.py:529-586). The automated
    # pipeline display in build_analyze_model is driven by StageTimer; these
    # statics reproduce the reference's hand-driven table API for users who
    # compose their own pipelines.
    _TABLE_STEPS = (
        "Ray initialization",
        "Model initialization",
        "Loading iterations",
        "Loading coordinates",
        "Computing dimensionality reduction",
        "Clustering",
        "Flux matrix",
        "Cleaning",
        "Transition matrix",
        "Steady-state distribution",
        "Steady-state target flux",
        "Cross-validation",
    )

    @staticmethod
    def new_table():
        """Build a rich progress table with one row per pipeline step
        (reference ``msm_we.py:561-586``)."""
        from rich.table import Table

        table = Table(title="haMSM Progress")
        for column in ("Status", "Step", "Notes"):
            table.add_column(column)
        for step in modelWE._TABLE_STEPS:
            table.add_row(" [ ]", step, "")
        return table

    @staticmethod
    def set_note(table, row, text):
        """Set the Notes cell of a step row (reference ``msm_we.py:558-560``)."""
        table.columns[2]._cells[row] = text

    @staticmethod
    def do_step(table, row, step, args=(), kwargs=None, in_subprocess=False):
        """Run one pipeline step, updating its table row to running/ok/failed
        (reference ``msm_we.py:529-556``). ``in_subprocess`` is accepted for
        API parity and ignored: the fork-isolation workaround (SURVEY.md P2)
        is unnecessary in this design.
        """
        del in_subprocess
        step_text = table.columns[1]._cells[row]
        status, name = table.columns[0], table.columns[1]
        status._cells[row] = "[bold black][ [bold yellow]* [bold black]]"
        name._cells[row] = f"[bold black]{step_text}"
        try:
            result = step(*args, **(kwargs or {}))
        except Exception as e:
            status._cells[row] = "[bold black] [[bold red]x[bold black]]"
            name._cells[row] = f"[black]{step_text}"
            table.columns[2]._cells[row] = f"{getattr(e, 'message', repr(e))}"
            raise
        status._cells[row] = "[bold black] [[bold green]✓[bold black]]"
        name._cells[row] = f"[black]{step_text}"
        return result


# Module-level alias: the reference defines BlockValidationError at module
# scope (msm_we.py:60-61); keep both import paths working.
BlockValidationError = modelWE.BlockValidationError
