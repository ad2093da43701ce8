"""Differential fuzzing against the reference's own executing code.

Golden tests pin *recorded* reference outputs; these tests go further and run
the reference implementation itself (from the read-only tree at
``/root/reference``) side by side with ours on randomized inputs. Only the
reference's pure-numpy/sklearn modules are exercised -- ``utils``, ``nmm``,
``fpt``, ``ensembles``, ``stratified_clustering`` -- loaded through a
synthetic package so the heavy ``msm_we/__init__`` (mdtraj/ray/westpa) never
runs. Everything is skipped when the reference tree is absent, so the test
suite remains self-contained.

Where our implementation *deliberately* diverges (documented divergences:
``reversible`` honored, NaN flux-split warning, clear connectivity errors),
the comparisons pin the SHARED default behavior.
"""
import importlib
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/msm_we"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


def _stub_module(name, **attrs):
    m = types.ModuleType(name)
    m.__path__ = []
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules under a synthetic package.

    The heavy package ``__init__`` (mdtraj/ray at import) never runs:
    pre-registering the package with ``__path__`` pointing at the reference
    tree makes submodule imports resolve directly. Unavailable third-party
    leaves are stubbed just enough to import -- none of the exercised code
    paths touch them (ray fan-out, westpa runtime, mdtraj IO, deeptime).
    """
    pkg = sys.modules.get("msm_we")
    if pkg is None or getattr(pkg, "__path__", [None])[0] != REF:
        pkg = types.ModuleType("msm_we")
        pkg.__path__ = [REF]
        sys.modules["msm_we"] = pkg
    # Modern scipy dropped sputils.isdense (a deprecation-shim module may
    # still exist, without the symbol); the reference's utils.py imports it
    sput = sys.modules.get("scipy.sparse.sputils")
    if sput is None:
        try:
            import scipy.sparse.sputils as sput  # shim present in some scipys
        except ImportError:
            sput = types.ModuleType("scipy.sparse.sputils")
            sys.modules["scipy.sparse.sputils"] = sput
    if not hasattr(sput, "isdense"):
        sput.isdense = lambda m: isinstance(m, np.ndarray)
    if "mdtraj" not in sys.modules:
        _stub_module("mdtraj", load=lambda *a, **k: None)
    if "ray" not in sys.modules:
        _stub_module(
            "ray",
            remote=lambda f=None, **k: (f if f is not None else (lambda g: g)),
            put=lambda x: x,
            get=lambda x: x,
            init=lambda *a, **k: None,
            is_initialized=lambda: False,
        )
    if "westpa" not in sys.modules:
        # Distinct classes: the reference's find_nearest_bin branches on
        # `type(bin_mapper) is VoronoiBinMapper` etc.
        class _RectMapper:
            def __init__(self, *a, **k):
                pass

        class _VorMapper:
            def __init__(self, *a, **k):
                pass

        class _FuncMapper:
            def __init__(self, *a, **k):
                pass

        west = _stub_module("westpa")
        wa = _stub_module("westpa.analysis")
        wc = _stub_module("westpa.core")
        wb = _stub_module(
            "westpa.core.binning",
            RectilinearBinMapper=_RectMapper,
            VoronoiBinMapper=_VorMapper,
            FuncBinMapper=_FuncMapper,
        )
        west.analysis, west.core, wc.binning = wa, wc, wb
    if "deeptime" not in sys.modules:
        dt = _stub_module("deeptime")
        dt.decomposition = _stub_module(
            "deeptime.decomposition", TICA=object, VAMP=object
        )
    if "pyemma" not in sys.modules:
        _stub_module("pyemma")

    ns = types.SimpleNamespace()
    ns.utils = importlib.import_module("msm_we.utils")
    ns.nmm = importlib.import_module("msm_we.nmm")
    ns.fpt = importlib.import_module("msm_we.fpt")
    ns.ensembles = importlib.import_module("msm_we.ensembles")
    ns.strat = importlib.import_module("msm_we.stratified_clustering")
    ns.msm_we = importlib.import_module("msm_we.msm_we")
    ns.optimization = importlib.import_module("msm_we.optimization")
    return ns


def _random_tmatrix(rng, n):
    T = rng.random((n, n)) + 0.05
    return T / T.sum(axis=1, keepdims=True)


# ---------------------------------------------------------------- utils


def test_utils_differential(ref):
    from msm_we_tpu import utils as ours

    rng = np.random.default_rng(0)
    for n in (3, 6, 11):
        C = rng.random((n, n)) * 10
        np.testing.assert_allclose(
            ours.normalize_markov_matrix(C.copy()),
            ref.utils.normalize_markov_matrix(C.copy()),
            rtol=1e-14,
        )
        np.testing.assert_allclose(
            ours.normalize_markov_matrix(C.copy(), reversible=True),
            ref.utils.normalize_markov_matrix(C.copy(), reversible=True),
            rtol=1e-14,
        )
        T = _random_tmatrix(rng, n)
        np.testing.assert_allclose(
            ours.pops_from_tmatrix(T), ref.utils.pops_from_tmatrix(T), rtol=1e-10
        )
        A, B = [0], [n - 1]
        np.testing.assert_allclose(
            ours.pseudo_nm_tmatrix(T, A, B),
            ref.utils.pseudo_nm_tmatrix(T, A, B),
            rtol=1e-14,
        )
        pnm = ours.pseudo_nm_tmatrix(T, A, B)
        np.testing.assert_allclose(
            ours.pops_from_nm_tmatrix(pnm),
            ref.utils.pops_from_nm_tmatrix(pnm),
            rtol=1e-10,
        )
        cleaned_ours, rm_ours = ours.clean_tmatrix(T.copy())
        cleaned_ref, rm_ref = ref.utils.clean_tmatrix(T.copy())
        np.testing.assert_allclose(cleaned_ours, cleaned_ref, rtol=1e-14)
        assert list(rm_ours) == list(rm_ref)

    seq = list(rng.integers(10, 20, 30))
    m_ours, d_ours = ours.map_to_integers(list(seq), {})
    m_ref, d_ref = ref.utils.map_to_integers(list(seq), {})
    np.testing.assert_array_equal(m_ours, m_ref)
    assert dict(d_ours) == dict(d_ref)

    # weighted_choice consumes the global numpy RNG stream identically
    w = list(rng.random(8))
    np.random.seed(42)
    picks_ref = [ref.utils.weighted_choice(list(range(8)), w) for _ in range(50)]
    np.random.seed(42)
    picks_ours = [ours.weighted_choice(list(range(8)), w) for _ in range(50)]
    assert picks_ours == picks_ref

    # Interval membership over 1-D and 2-D variable sets
    iv_ours = ours.Interval([[0.0, 1.0]], 1)
    iv_ref = ref.utils.Interval([[0.0, 1.0]], 1)
    for x in (-0.5, 0.0, 0.5, 1.0, 1.5):
        assert (x in iv_ours) == (x in iv_ref)


# ---------------------------------------------------------------- nmm


@pytest.mark.parametrize("lag,sliding", [(1, True), (2, True), (3, False)])
def test_nonmarkov_model_differential(ref, lag, sliding):
    from msm_we_tpu.msm.nmm import NonMarkovModel

    rng = np.random.default_rng(lag * 7 + sliding)
    trajs = [rng.integers(0, 5, size=L) for L in (30, 77, 160)]
    kwargs = dict(
        stateA=[0], stateB=[4], lag_time=lag, sliding_window=sliding,
        clean_traj=True,
    )
    m_ref = ref.nmm.NonMarkovModel([t.copy() for t in trajs], **kwargs)
    m_ours = NonMarkovModel([t.copy() for t in trajs], **kwargs)

    np.testing.assert_array_equal(m_ours.nm_cmatrix, m_ref.nm_cmatrix)
    np.testing.assert_array_equal(m_ours.markov_cmatrix, m_ref.markov_cmatrix)
    np.testing.assert_allclose(m_ours.nm_tmatrix, m_ref.nm_tmatrix, rtol=1e-14)
    np.testing.assert_allclose(
        m_ours.markov_tmatrix, m_ref.markov_tmatrix, rtol=1e-14
    )

    f_ref = m_ref.mfpts()
    f_ours = m_ours.mfpts()
    for key in f_ref:
        np.testing.assert_allclose(f_ours[key], f_ref[key], rtol=1e-9)

    np.testing.assert_allclose(m_ours.popA, m_ref.popA, rtol=1e-9)
    np.testing.assert_allclose(m_ours.popB, m_ref.popB, rtol=1e-9)

    np.testing.assert_allclose(m_ours.tmatrixAB(), m_ref.tmatrixAB(), rtol=1e-14)
    np.testing.assert_allclose(m_ours.tmatrixBA(), m_ref.tmatrixBA(), rtol=1e-14)

    np.testing.assert_allclose(
        m_ours.fluxAB_distribution_on_B(),
        m_ref.fluxAB_distribution_on_B(),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        m_ours.fluxBA_distribution_on_A(),
        m_ref.fluxBA_distribution_on_A(),
        rtol=1e-9,
    )

    times = [lag, 2 * lag, 5 * lag]
    for got, want in zip(m_ours.corr_function(times), m_ref.corr_function(times)):
        np.testing.assert_allclose(got, want, rtol=1e-9)

    e_ref = m_ref.empirical_mfpts()
    e_ours = m_ours.empirical_mfpts()
    for key in e_ref:
        np.testing.assert_allclose(e_ours[key], e_ref[key], rtol=1e-9)


@pytest.mark.parametrize("hist", [0, 2, 5])
def test_markov_plus_color_differential(ref, hist):
    from msm_we_tpu.msm.nmm import MarkovPlusColorModel

    rng = np.random.default_rng(hist + 13)
    # Connected trajectories (every state visits A/B eventually) keep the
    # flux split NaN-free; the NaN case is a documented warning divergence
    trajs = [
        np.concatenate([[0], rng.integers(0, 5, size=L), [4]])
        for L in (40, 90)
    ]
    kwargs = dict(stateA=[0], stateB=[4], hist_length=hist, clean_traj=True)
    m_ref = ref.nmm.MarkovPlusColorModel([t.copy() for t in trajs], **kwargs)
    m_ours = MarkovPlusColorModel([t.copy() for t in trajs], **kwargs)

    np.testing.assert_allclose(
        m_ours.markov_tmatrix, m_ref.markov_tmatrix, rtol=1e-12
    )
    # Our flux split is blockwise (count * ratio) vs the reference's
    # per-frame ratio additions: same math, different float addition order
    np.testing.assert_allclose(
        m_ours.nm_tmatrix, m_ref.nm_tmatrix, rtol=1e-9, equal_nan=True
    )


# ---------------------------------------------------------------- fpt


def test_fpt_differential(ref):
    from msm_we_tpu.msm.fpt import DirectFPT, MarkovFPT, MatrixFPT, NonMarkovFPT

    rng = np.random.default_rng(3)
    n = 7
    T = _random_tmatrix(rng, n)
    A, B = [0], [n - 1]

    r = ref.fpt.MarkovFPT.mean_fpts(T, A, B, lag_time=2)
    o = MarkovFPT.mean_fpts(T, A, B, lag_time=2)
    for key in r:
        np.testing.assert_allclose(o[key], r[key], rtol=1e-9)

    pnm = ref.utils.pseudo_nm_tmatrix(T, A, B)
    r = ref.fpt.NonMarkovFPT.mean_fpts(pnm, A, B, lag_time=1)
    o = NonMarkovFPT.mean_fpts(pnm.copy(), A, B, lag_time=1)
    for key in r:
        np.testing.assert_allclose(o[key], r[key], rtol=1e-9)

    np.testing.assert_allclose(
        MatrixFPT.directional_mfpt(T, A, B, [1.0]),
        ref.fpt.MatrixFPT.directional_mfpt(T, A, B, [1.0]),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        MatrixFPT.mfpts_to_target_microstate(T, n - 1),
        ref.fpt.MatrixFPT.mfpts_to_target_microstate(T, n - 1),
        rtol=1e-9,
    )
    m_ours = MatrixFPT.mfpts_matrix(T)
    m_ref = ref.fpt.MatrixFPT.mfpts_matrix(T)
    np.testing.assert_allclose(m_ours, m_ref, rtol=1e-9)
    np.testing.assert_allclose(
        MatrixFPT.min_commute_time(m_ours),
        ref.fpt.MatrixFPT.min_commute_time(m_ref),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        MatrixFPT.max_commute_time(m_ours),
        ref.fpt.MatrixFPT.max_commute_time(m_ref),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        MarkovFPT.markov_commute_time(T, A, B),
        ref.fpt.MarkovFPT.markov_commute_time(T, A, B),
        rtol=1e-9,
    )

    # Full first-passage distribution (linear and log time grids)
    for logscale in (False, True):
        d_ref = ref.fpt.MatrixFPT.fpt_distribution(
            T, A, B, initial_distrib=[1.0], max_n_lags=50, lag_time=1,
            logscale=logscale,
        )
        d_ours = MatrixFPT.fpt_distribution(
            T, A, B, initial_distrib=[1.0], max_n_lags=50, lag_time=1,
            logscale=logscale,
        )
        np.testing.assert_allclose(d_ours, d_ref, rtol=1e-8)

    # Direct (trajectory-counting) FPTs
    trajs = [rng.integers(0, 4, size=400) for _ in range(3)]
    r = ref.fpt.DirectFPT.mean_fpts(
        [t.copy() for t in trajs], stateA=[0], stateB=[3], lag_time=2
    )
    o = DirectFPT.mean_fpts(
        [t.copy() for t in trajs], stateA=[0], stateB=[3], lag_time=2
    )
    for key in r:
        np.testing.assert_allclose(o[key], r[key], rtol=1e-12)


# ---------------------------------------------------------------- ensembles


def test_ensembles_differential(ref):
    from msm_we_tpu.msm.ensembles import DiscretePathEnsemble, PathEnsemble

    rng = np.random.default_rng(9)
    n = 6
    T = _random_tmatrix(rng, n)
    A, B = [0], [n - 1]

    # Path generation consumes the global numpy RNG stream identically
    np.random.seed(7)
    ens_ref = ref.ensembles.DiscretePathEnsemble.from_transition_matrix(
        T, stateA=A, stateB=B, n_paths=25, max_iters=10000
    )
    np.random.seed(7)
    ens_ours = DiscretePathEnsemble.from_transition_matrix(
        T, stateA=A, stateB=B, n_paths=25, max_iters=10000
    )
    assert len(ens_ours.trajectories) == len(ens_ref.trajectories)
    for p_ours, p_ref in zip(ens_ours.trajectories, ens_ref.trajectories):
        np.testing.assert_array_equal(np.asarray(p_ours), np.asarray(p_ref))

    # Fundamental sequences + weights over the generated paths
    fs_ref = ens_ref.weighted_fundamental_sequences(T)
    fs_ours = ens_ours.weighted_fundamental_sequences(T)
    # (sequences, weights/counts) -- compare as aligned sets
    ref_map = {tuple(np.asarray(s).tolist()): w for s, w in zip(*fs_ref[:2])}
    ours_map = {tuple(np.asarray(s).tolist()): w for s, w in zip(*fs_ours[:2])}
    assert ours_map.keys() == ref_map.keys()
    for key in ref_map:
        np.testing.assert_allclose(ours_map[key], ref_map[key], rtol=1e-9)

    # Path extraction from a plain ensemble
    trajs = [rng.integers(0, n, size=300) for _ in range(3)]
    base_ref = ref.ensembles.Ensemble([t.copy() for t in trajs], discrete=True)
    pe_ref = ref.ensembles.PathEnsemble.from_ensemble(
        base_ref, stateA=A, stateB=B, discrete=True
    )
    from msm_we_tpu.msm.ensembles import Ensemble

    base_ours = Ensemble([t.copy() for t in trajs], discrete=True)
    pe_ours = PathEnsemble.from_ensemble(
        base_ours, stateA=A, stateB=B, discrete=True
    )
    assert len(pe_ours.trajectories) == len(pe_ref.trajectories)
    for p_ours, p_ref in zip(pe_ours.trajectories, pe_ref.trajectories):
        np.testing.assert_array_equal(
            np.asarray(p_ours).reshape(-1), np.asarray(p_ref).reshape(-1)
        )


# ------------------------------------------------- stratified clustering


class _MockMapper:
    """Rectilinear 1-D mapper with the WESTPA .assign/.nbins surface."""

    def __init__(self, edges):
        self.edges = np.asarray(edges)
        self.nbins = len(edges) - 1

    def assign(self, pcoords):
        pc = np.asarray(pcoords).reshape(len(pcoords), -1)[:, 0]
        return np.clip(
            np.digitize(pc, self.edges) - 1, 0, self.nbins - 1
        ).astype(int)


class _MockModel:
    """The model surface StratifiedClusters.predict reads."""

    def __init__(self, pcoord0, pcoord1):
        self.pcoord0List = pcoord0
        self.pcoord1List = pcoord1

    @staticmethod
    def is_WE_target(pcoords):
        return np.asarray(pcoords).reshape(len(pcoords), -1)[:, 0] < 1.0

    @staticmethod
    def is_WE_basis(pcoords):
        return np.asarray(pcoords).reshape(len(pcoords), -1)[:, 0] > 9.0


def test_stratified_predict_differential(ref):
    """Same fitted centers in both implementations: assignments, override
    order (target wins), remap handling, consecutive numbering, and the
    recorded target/basis bin sets must all match the reference's per-frame
    sklearn loop."""
    from msm_we_tpu.ops.stratified import StratifiedKmeans

    rng = np.random.default_rng(21)
    n_bins, k, d, N = 5, 3, 4, 400
    mapper = _MockMapper(np.linspace(0, 10, n_bins + 1))

    # Well-separated per-bin clusters: assignment margins >> f32 eps, so the
    # f64 (sklearn) vs f32 (ours) scoring paths cannot flip an argmin
    pc1 = rng.uniform(0, 10, size=(N, 1))
    pc0 = rng.uniform(0, 10, size=(N, 1))
    we_bins1 = mapper.assign(pc1)
    anchors = rng.normal(size=(n_bins, k, d)) * 50
    X = np.empty((N, d), np.float32)
    for i in range(N):
        X[i] = anchors[we_bins1[i], rng.integers(0, k)] + rng.normal(
            scale=0.3, size=d
        )

    model = _MockModel(pc0, pc1)
    sc = ref.strat.StratifiedClusters(mapper, model, k, target_bins=[])
    # Fit each bin's sklearn model on its own members (the reference flow)
    for b in range(n_bins):
        members = X[we_bins1 == b]
        sc.cluster_models[b].fit(np.asarray(members, np.float64))

    # Mirror the fitted bank into our implementation, f32-rounded on BOTH
    # sides so the scoring dtypes agree
    sk = StratifiedKmeans(n_bins=n_bins, k_per_bin=k, n_features=d, seed=0)
    for b in range(n_bins):
        centers32 = sc.cluster_models[b].cluster_centers_.astype(np.float32)
        sc.cluster_models[b].cluster_centers_ = centers32.astype(np.float64)
        rows = slice(b * k, (b + 1) * k)
        sk.centers[rows] = centers32
        sk.valid[rows] = True
        sk.initialized[b] = True
    sk._refresh_ids()

    # A remap, exactly as cleaning would install it
    sc.we_remap[2] = 3
    sk.set_remap(2, 3)

    ref_out = sc.predict(X)
    ours_out = sk.predict(
        X,
        mapper.assign(pc1),
        is_basis=model.is_WE_basis(pc1),
        is_target=model.is_WE_target(pc1),
    )
    np.testing.assert_array_equal(ours_out, ref_out)
    assert sk.basis_cluster_index == sc.n_total_clusters == n_bins * k

    # The toggle protocol (fluxmatrix mode): parent pass uses pcoord0List
    sc.toggle = True
    sc.processing_from = True
    ref_parent = sc.predict(X)
    assert sc.processing_from is False  # toggled
    ours_parent = sk.predict(
        X,
        mapper.assign(pc0),
        is_basis=model.is_WE_basis(pc0),
        is_target=model.is_WE_target(pc0),
    )
    np.testing.assert_array_equal(ours_parent, ref_parent)

    # Recorded target/basis bin sets match (REMAPPED ids, the round-5 fix)
    we1 = mapper.assign(pc1)
    rem = sk.we_remap[we1]
    expect_target = set(rem[model.is_WE_target(pc1)].tolist())
    assert expect_target <= sc.target_bins


# ------------------------------------------------- optimization


def test_optimization_differential(ref):
    from msm_we_tpu import optimization as ours
    from msm_we_tpu.utils import pops_from_tmatrix

    rng = np.random.default_rng(17)
    for n, n_bins in ((6, 3), (12, 5)):
        T = _random_tmatrix(rng, n)
        pi = pops_from_tmatrix(T)
        B = [n - 1]
        d_ref, v_ref = ref.optimization.solve_discrepancy(T, pi, B)
        d_ours, v_ours = ours.solve_discrepancy(T, pi, B)
        np.testing.assert_allclose(
            np.asarray(d_ours).ravel(), np.asarray(d_ref).ravel(), rtol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(v_ours).ravel(), np.asarray(v_ref).ravel(), rtol=1e-8
        )
        bins_ref = ref.optimization.get_uniform_mfpt_bins(
            np.asarray(v_ref).ravel(), np.asarray(d_ref).ravel(), pi, n_bins
        )
        bins_ours = ours.get_uniform_mfpt_bins(
            np.asarray(v_ours).ravel(), np.asarray(d_ours).ravel(), pi, n_bins
        )
        np.testing.assert_array_equal(bins_ours, bins_ref)


# ------------------------------------------------- facade analysis layer


def _raw_ref_model(ref, **attrs):
    """A reference modelWE without __init__ (its ctor needs a WESTPA h5);
    the analysis mixin methods only read the attributes set here."""
    m = object.__new__(ref.msm_we.modelWE)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def test_analysis_layer_differential(ref):
    """Tmatrix building, algebraic + refined steady states, target flux and
    the committor must match the reference facade methods executed on the
    same inputs."""
    from msm_we_tpu.model import modelWE
    from msm_we_tpu.ops import linalg

    rng = np.random.default_rng(23)
    n = 10
    F = rng.random((n, n)) * np.exp(rng.normal(scale=3, size=(n, n)))
    ind_basis, ind_targets = np.array([0]), np.array([n - 1])

    m_ref = _raw_ref_model(
        ref,
        fluxMatrix=F.copy(),
        indBasis=ind_basis,
        indTargets=ind_targets,
        nBins=n,
        tau=1.0,
        n_lag=0,
    )
    ref.msm_we.modelWE.get_Tmatrix(m_ref)

    T_ours = linalg.tmatrix_from_flux(F, ind_targets, ind_basis, n)
    np.testing.assert_allclose(T_ours, m_ref.Tmatrix, rtol=1e-14)

    # Equilibrium variant
    m_eq = _raw_ref_model(
        ref, fluxMatrix=F.copy(), indBasis=ind_basis, indTargets=ind_targets
    )
    ref.msm_we.modelWE.get_eqTmatrix(m_eq)
    np.testing.assert_allclose(
        linalg.equilibrium_tmatrix_from_flux(F, ind_targets, ind_basis),
        m_eq.Tmatrix,
        rtol=1e-14,
    )

    # Algebraic steady state
    ref.msm_we.modelWE.get_steady_state_algebraic(m_ref, set=True)
    np.testing.assert_allclose(
        linalg.steady_state_algebraic(m_ref.Tmatrix), m_ref.pSS, rtol=1e-12
    )

    # Refined (inverse-iteration) steady state + target flux
    ref.msm_we.modelWE.get_steady_state(m_ref)
    pSS_ours, flux_ours = linalg.steady_state_refined(
        m_ref.Tmatrix, ind_targets, ind_basis, n, 1.0
    )
    np.testing.assert_allclose(pSS_ours, m_ref.pSS, rtol=1e-10)
    ref.msm_we.modelWE.get_steady_state_target_flux(m_ref)
    np.testing.assert_allclose(flux_ours, m_ref.JtargetSS, rtol=1e-10)

    # Committor (reference iterates to conv; ours matches with a cap)
    ref.msm_we.modelWE.get_committor(m_ref, conv=1e-7)
    q_ours = linalg.committor(F, ind_targets, ind_basis, n, conv=1e-7)
    np.testing.assert_allclose(q_ours, m_ref.q, rtol=1e-9)


def test_facade_end_to_end_analysis_differential(ref):
    """Our full facade chain (get_Tmatrix -> get_steady_state ->
    get_steady_state_target_flux) on a flux matrix equals the reference
    facade run on the same matrix."""
    from msm_we_tpu.model import modelWE

    rng = np.random.default_rng(31)
    n = 8
    F = rng.random((n, n)) * np.exp(rng.normal(scale=2, size=(n, n)))
    ind_basis, ind_targets = np.array([1]), np.array([n - 2])

    m_ref = _raw_ref_model(
        ref,
        fluxMatrix=F.copy(),
        indBasis=ind_basis,
        indTargets=ind_targets,
        nBins=n,
        tau=2.0,
        n_lag=0,
    )
    ref.msm_we.modelWE.get_Tmatrix(m_ref)
    ref.msm_we.modelWE.get_steady_state(m_ref)
    ref.msm_we.modelWE.get_steady_state_target_flux(m_ref)

    m_ours = modelWE()
    m_ours.fluxMatrix = F.copy()
    m_ours.indBasis = ind_basis
    m_ours.indTargets = ind_targets
    m_ours.nBins = n
    m_ours.tau = 2.0
    m_ours.n_lag = 0
    m_ours.get_Tmatrix()
    m_ours.get_steady_state()
    m_ours.get_steady_state_target_flux()

    np.testing.assert_allclose(m_ours.Tmatrix, m_ref.Tmatrix, rtol=1e-14)
    np.testing.assert_allclose(m_ours.pSS, m_ref.pSS, rtol=1e-10)
    np.testing.assert_allclose(m_ours.JtargetSS, m_ref.JtargetSS, rtol=1e-10)
    assert m_ours.lagtime == m_ref.lagtime


def test_flux_profiles_differential(ref):
    """get_flux (pcoord-ordered net flux + linear fit + overcorrection flag)
    and get_flux_committor (committor-ordered Jq) must match the reference's
    double loops on the same model state."""
    from msm_we_tpu.model import modelWE
    from msm_we_tpu.ops import linalg

    rng = np.random.default_rng(37)
    n = 15
    F = rng.random((n, n)) * np.exp(rng.normal(scale=2, size=(n, n)))
    centers = np.sort(rng.uniform(0, 10, n))[:, None]
    ind_basis, ind_targets = np.array([n - 1]), np.array([0])

    attrs = dict(
        fluxMatrix=F.copy(),
        targetRMSD_centers=centers.copy(),
        indBasis=ind_basis,
        indTargets=ind_targets,
        basis_bin_centers=np.array([9.5]),
        target_bin_centers=np.array([0.5]),
        nBins=n,
        tau=1.0,
        n_lag=0,
        all_centers=None,
    )

    m_ref = _raw_ref_model(ref, **attrs)
    # Avoid the reference's update_sorted_cluster_centers fallback (needs
    # cluster structures): populate all_centers the way it would
    ac = centers[:, 0].copy()
    ac[ind_basis] = 9.5
    ac[ind_targets] = 0.5
    m_ref.all_centers = np.sort(ac)
    ref.msm_we.modelWE.get_flux(m_ref)

    m_ours = modelWE()
    for k, v in attrs.items():
        setattr(m_ours, k, np.copy(v) if isinstance(v, np.ndarray) else v)
    m_ours.all_centers = np.sort(ac)
    m_ours.get_flux()

    np.testing.assert_allclose(m_ours.J, m_ref.J, rtol=1e-10)
    for key in ("slope", "intercept", "r_value", "p_value", "std_err"):
        np.testing.assert_allclose(
            m_ours.fit_parameters[key], m_ref.fit_parameters[key], rtol=1e-9
        )
    assert m_ours.slope_overcorrected == m_ref.slope_overcorrected

    # Committor-ordered flux: reference needs q on the instance
    Tm = linalg.tmatrix_from_flux(F, ind_targets, ind_basis, n)
    m_ref.Tmatrix = Tm
    ref.msm_we.modelWE.get_committor(m_ref, conv=1e-8)
    ref.msm_we.modelWE.get_flux_committor(m_ref)

    m_ours.Tmatrix = Tm.copy()
    m_ours.get_committor(conv=1e-8)
    m_ours.get_flux_committor()
    np.testing.assert_allclose(m_ours.q, m_ref.q, rtol=1e-9)
    np.testing.assert_allclose(m_ours.Jq, m_ref.Jq, rtol=1e-9)


def test_find_connected_sets_differential(ref):
    """The cleaning decision layer: connected-component sets (ordered by
    size) must match the reference on sparse random flux patterns."""
    from msm_we_tpu.utils import find_connected_sets

    rng = np.random.default_rng(41)
    for trial in range(8):
        n = int(rng.integers(5, 30))
        C = (rng.random((n, n)) < 0.12) * rng.random((n, n))
        C[-1, -2] = 1.0  # the recycling edge organize_stratified injects
        sets_ours = find_connected_sets(C, directed=True)
        sets_ref = ref.utils.find_connected_sets(C, directed=True)
        assert len(sets_ours) == len(sets_ref), trial
        for s_ours, s_ref in zip(sets_ours, sets_ref):
            np.testing.assert_array_equal(np.sort(s_ours), np.sort(s_ref))


def test_find_nearest_bin_differential(ref):
    """Empty-bin remap targets: the nearest-populated-bin selection must
    match the reference for both mapper families."""
    import msm_we_tpu.binning as ours_binning

    rng = np.random.default_rng(43)

    # Rectilinear: the reference branch keys on the STUB westpa class, so
    # wear its clothes -- the executed distance/selection math is all real
    RefRect = sys.modules["westpa.core.binning"].RectilinearBinMapper
    RefVor = sys.modules["westpa.core.binning"].VoronoiBinMapper

    edges = np.linspace(0, 10, 9)
    ref_mapper = RefRect()
    ref_mapper.boundaries = [edges]
    ours_mapper = ours_binning.RectilinearBinMapper([edges])

    n_bins = len(edges) - 1
    for _ in range(10):
        filled = np.sort(
            rng.choice(n_bins, size=int(rng.integers(2, n_bins)), replace=False)
        )
        empty = int(rng.integers(0, n_bins))
        got = ours_binning.find_nearest_bin(ours_mapper, empty, list(filled))
        want = ref.msm_we.modelWE.find_nearest_bin(ref_mapper, empty, list(filled))
        assert got == want, (empty, filled)

    # Voronoi
    centers = rng.normal(size=(7, 2)) * 5

    def _dfunc(point, _centers):
        return np.sqrt(np.sum((point - _centers) ** 2, axis=1))

    ref_vmapper = RefVor()
    ref_vmapper.centers = centers
    ref_vmapper.dfunc = _dfunc
    ours_vmapper = ours_binning.VoronoiBinMapper(centers)
    for _ in range(10):
        filled = np.sort(rng.choice(7, size=int(rng.integers(2, 7)), replace=False))
        empty = int(rng.integers(0, 7))
        got = ours_binning.find_nearest_bin(ours_vmapper, empty, list(filled))
        want = ref.msm_we.modelWE.find_nearest_bin(ref_vmapper, empty, list(filled))
        assert got == want, (empty, filled)


def test_iter_flux_matrix_differential(ref, tmp_path):
    """Per-iteration flux matrices from a model built by OUR pipeline must
    equal the reference's build_flux_matrix executed on the same inputs
    (dtrajs, basis/target membership, weights) -- this pins the override
    composition (end-in-target, start-in-basis, end-in-basis) by running the
    reference's code, not a transcription of it."""
    from msm_we_tpu.binning import RectilinearBinMapper
    from msm_we_tpu.data import generate_west_h5
    from msm_we_tpu.model import modelWE

    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=18, n_segments=14, seed=51)
    m = modelWE()
    m.initialize(
        [path],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "dfx",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none",
        tau=1.0,
    )
    m.get_iterations()
    m.dimReduce()
    mapper = RectilinearBinMapper([np.linspace(0, 10, 7)])
    m.cluster_coordinates(n_clusters=2, stratified=True, user_bin_mapper=mapper)
    m.get_fluxMatrix(0)
    m.organize_fluxMatrix()  # post-cleaning: numbering is the live numbering

    feats = m._featurize_all()
    offs = feats["offsets"]
    checked = 0
    for it in range(2, m.maxIter, 3):
        ours = m.get_iter_fluxMatrix(it)

        d = m._dataset.iter_data(it)
        pairs = np.asarray(m.pair_dtrajs[it - 1])
        weights = feats["weights"][offs[it - 1] : offs[it]]
        want = (
            ref.msm_we.modelWE.build_flux_matrix(
                m.n_clusters,
                pairs,
                np.where(m.is_WE_basis(d["pcoord0"])),
                np.where(m.is_WE_basis(d["pcoord1"])),
                np.where(m.is_WE_target(d["pcoord1"])),
                weights.copy(),
            )
            .todense()
            .A
        )
        np.testing.assert_array_equal(ours, want)
        checked += 1
    assert checked >= 4


def test_adaptive_fpt_distribution_differential(ref):
    """The adaptive log-sweep FPT distribution (coarse/fine increment
    switching, absorbing-boundary stripping, renormalization bookkeeping)
    must match the reference's implementation step for step."""
    from msm_we_tpu.msm.fpt import MatrixFPT

    rng = np.random.default_rng(47)
    n = 9
    T = _random_tmatrix(rng, n)
    kwargs = dict(
        initial_states=[0],
        initial_state_probs=[1.0],
        target_states=[n - 1],
        tau=1.0,
        increment=5,
        fine_increment=1.2,
        relevant_thresh=1e-4,
        max_steps=int(2e4),
    )
    out_ref = ref.fpt.MatrixFPT.adaptive_fpt_distribution(T.copy(), **kwargs)
    out_ours = MatrixFPT.adaptive_fpt_distribution(T.copy(), **kwargs)
    assert len(out_ours) == len(out_ref)
    for got, want in zip(out_ours, out_ref):
        np.testing.assert_allclose(
            np.asarray(got, dtype=float),
            np.asarray(want, dtype=float),
            rtol=1e-9,
        )


def test_ensemble_statistics_differential(ref):
    """Ensemble-level empirical MFPTs and the discrete-ensemble generator
    (global-RNG stream) must match the reference."""
    from msm_we_tpu.msm.ensembles import DiscreteEnsemble, Ensemble

    rng = np.random.default_rng(53)
    trajs = [rng.integers(0, 4, size=500) for _ in range(3)]

    e_ref = ref.ensembles.Ensemble([t.copy() for t in trajs], discrete=True)
    e_ours = Ensemble([t.copy() for t in trajs], discrete=True)
    r = e_ref.empirical_mfpts(stateA=[0], stateB=[3])
    o = e_ours.empirical_mfpts(stateA=[0], stateB=[3])
    for key in r:
        np.testing.assert_allclose(o[key], r[key], rtol=1e-12)

    # Generated discrete ensemble: same global RNG stream, identical output
    T = _random_tmatrix(rng, 4)
    np.random.seed(11)
    g_ref = ref.ensembles.DiscreteEnsemble.from_transition_matrix(
        T, sim_length=400
    )
    np.random.seed(11)
    g_ours = DiscreteEnsemble.from_transition_matrix(T, sim_length=400)
    np.testing.assert_array_equal(
        np.asarray(g_ours.trajectories[0]), np.asarray(g_ref.trajectories[0])
    )
