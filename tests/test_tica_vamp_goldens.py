"""Numerical goldens for TICA/VAMP (replacing shape-only coverage).

The reference delegates TICA/VAMP to deeptime
(``_hamsm/_dimensionality.py:288-311``); this package reimplements the
generalized eigenproblem from streamed moments (``ops/pca.py``). Validation
is against three independent anchors:

1. An analytically solvable process: a rotated bank of independent AR(1)
   (discrete OU) components. The true TICA eigenvalues are the AR
   coefficients, the true modes are the mixing rotation's columns, and the
   kinetic-map-scaled projections have variance lambda_i^2.
2. A direct dense computation on the full data via a *different solver
   route* (scipy's generalized symmetric eigensolver / full-matrix SVD),
   which must agree with the streamed whitening route to near machine
   precision.
3. A cross-check against deeptime itself when importable, falling back to
   a from-the-algorithm oracle of deeptime's estimation route
   (``tests/_deeptime_oracle.py``: regularized whitening + Koopman SVD +
   kinetic-map scaling) so the check runs in environments where deeptime
   cannot be installed.
"""
import numpy as np
import pytest
import scipy.linalg

from msm_we_tpu.ops.pca import PairMomentAccumulator


def _rotated_ar1(n_steps, lams, svars, seed, d_extra_rotation=None):
    """Simulate y_t = R x_t where x_i are independent AR(1) with coefficient
    lams[i] and stationary variance svars[i]. Returns (pairs0, pairs1, R)."""
    rng = np.random.default_rng(seed)
    d = len(lams)
    lams = np.asarray(lams)
    svars = np.asarray(svars)
    noise_std = np.sqrt(svars * (1.0 - lams**2))
    x = rng.normal(0, np.sqrt(svars), size=d)  # start in stationarity
    traj = np.empty((n_steps, d))
    for t in range(n_steps):
        x = lams * x + rng.normal(0, noise_std, size=d)
        traj[t] = x
    R = scipy.linalg.qr(rng.normal(size=(d, d)))[0]
    y = traj @ R.T
    return y[:-1], y[1:], R


def _accumulate(X0, Xt, weights=None, chunks=7):
    acc = PairMomentAccumulator(X0.shape[1])
    bounds = np.linspace(0, len(X0), chunks + 1).astype(int)
    for a, b in zip(bounds[:-1], bounds[1:]):
        if b > a:
            acc.add(X0[a:b], Xt[a:b],
                    None if weights is None else weights[a:b])
    return acc


LAMS = np.array([0.9, 0.6, 0.3, 0.05])
SVARS = np.array([2.0, 1.5, 1.0, 0.5])


@pytest.fixture(scope="module")
def ou_pairs():
    return _rotated_ar1(200_000, LAMS, SVARS, seed=42)


def test_tica_recovers_ar1_timescales_and_modes(ou_pairs):
    """TICA eigenvalues must recover the AR(1) coefficients and the
    components must align with the mixing rotation's columns."""
    X0, Xt, R = ou_pairs
    model = _accumulate(X0, Xt).finalize(method="tica", var_cutoff=1.0)

    # Eigenvalues ~ AR coefficients (sampling error ~ 1/sqrt(N))
    np.testing.assert_allclose(model.scales_[: len(LAMS)], LAMS, atol=0.02)

    # Modes ~ rotation columns, up to sign (compare directions)
    for i in range(3):  # the smallest-lambda mode is noise-dominated
        v = model.components_[:, i]
        cos = abs(v @ R[:, i]) / np.linalg.norm(v)
        assert cos > 0.99, f"mode {i} misaligned: |cos|={cos:.4f}"

    # Kinetic-map scaling: projected variance of mode i ~ lambda_i^2
    proj = model.transform(np.concatenate([X0, Xt[-1:]]))
    for i in range(2):
        assert np.var(proj[:, i]) == pytest.approx(LAMS[i] ** 2, rel=0.1)


def test_vamp_recovers_ar1_singular_values(ou_pairs):
    """For this (reversible) process the VAMP singular values equal the AR
    coefficients too; validates the whitened-SVD route numerically."""
    X0, Xt, _R = ou_pairs
    model = _accumulate(X0, Xt).finalize(method="vamp", var_cutoff=1.0)
    np.testing.assert_allclose(model.scales_[: len(LAMS)], LAMS, atol=0.02)


def test_tica_streamed_matches_dense_generalized_eig():
    """The streamed whitening route must equal a direct dense solve of the
    same symmetrized generalized eigenproblem via scipy.linalg.eigh(a, b)."""
    rng = np.random.default_rng(3)
    n, d = 600, 5
    X0 = rng.normal(size=(n, d)) @ rng.normal(size=(d, d))
    Xt = 0.7 * X0 + 0.5 * rng.normal(size=(n, d))
    w = rng.random(n)

    model = _accumulate(X0, Xt, weights=w).finalize(method="tica", var_cutoff=1.0)

    # Dense reference: symmetrized moments centered at the symmetrized mean
    W = w.sum()
    mu0 = (X0 * w[:, None]).sum(0) / W
    mut = (Xt * w[:, None]).sum(0) / W
    mu = 0.5 * (mu0 + mut)
    A0, At = X0 - mu, Xt - mu
    C00s = 0.5 * ((A0 * w[:, None]).T @ A0 + (At * w[:, None]).T @ At) / W
    C0ts = 0.5 * ((A0 * w[:, None]).T @ At + (At * w[:, None]).T @ A0) / W
    evals, evecs = scipy.linalg.eigh(C0ts, C00s)
    order = np.argsort(np.abs(evals))[::-1]
    evals, evecs = evals[order], evecs[:, order]

    k = model.output_dimension
    np.testing.assert_allclose(model.scales_, evals[:k], atol=1e-10)
    # Components match up to sign (both normalized v^T C00s v = 1)
    for i in range(k):
        a, b = model.components_[:, i], evecs[:, i]
        sign = np.sign(a @ b)
        np.testing.assert_allclose(a, sign * b, atol=1e-8)


def test_vamp_streamed_matches_dense_svd():
    rng = np.random.default_rng(4)
    n, d = 500, 4
    X0 = rng.normal(size=(n, d))
    Xt = X0 @ (0.5 * scipy.linalg.qr(rng.normal(size=(d, d)))[0]) + 0.3 * rng.normal(
        size=(n, d)
    )

    model = _accumulate(X0, Xt).finalize(method="vamp", var_cutoff=1.0)

    mu0, mut = X0.mean(0), Xt.mean(0)
    A0, At = X0 - mu0, Xt - mut
    C00 = A0.T @ A0 / n
    C0t = A0.T @ At / n
    Ctt = At.T @ At / n

    def inv_sqrt(C):
        ev, U = np.linalg.eigh(C)
        return U @ np.diag(ev**-0.5) @ U.T

    K = inv_sqrt(C00) @ C0t @ inv_sqrt(Ctt)
    S = np.linalg.svd(K, compute_uv=False)
    np.testing.assert_allclose(model.scales_, S[: model.output_dimension],
                               atol=1e-10)


def test_weighted_tica_equals_row_duplication():
    """An integer weight w on a pair must be exactly equivalent to feeding
    that pair w times -- the ground truth for WE-weighted TICA."""
    rng = np.random.default_rng(7)
    n, d = 200, 3
    X0 = rng.normal(size=(n, d))
    Xt = 0.8 * X0 + 0.2 * rng.normal(size=(n, d))
    w = rng.integers(1, 4, size=n).astype(float)

    weighted = _accumulate(X0, Xt, weights=w).finalize("tica", var_cutoff=1.0)
    rep = np.repeat(np.arange(n), w.astype(int))
    duplicated = _accumulate(X0[rep], Xt[rep]).finalize("tica", var_cutoff=1.0)

    np.testing.assert_allclose(weighted.scales_, duplicated.scales_, atol=1e-12)
    np.testing.assert_allclose(
        np.abs(weighted.components_), np.abs(duplicated.components_), atol=1e-9
    )


def test_model_dimreduce_tica_matches_dense(tmp_path):
    """Model-level check: dimReduce('tica') on a synthetic west.h5 produces
    the same transform as a dense computation from the same (parent, child,
    weight) pairs the dataset yields."""
    from msm_we_tpu.data import generate_west_h5
    from msm_we_tpu.model import modelWE

    path = str(tmp_path / "west.h5")
    generate_west_h5(path, n_iterations=30, n_segments=16, seed=5)
    model = modelWE()
    model.initialize(
        [path],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "synth",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="tica",
        tau=1.0,
    )
    model.get_iterations()
    model.dimReduce()

    # Dense reference from the same pairs
    X0s, Xts, ws = [], [], []
    for it in range(1, model.maxIter):
        parent, child, w = model._dataset.iter_coord_pairs(it)
        good = ~(
            np.isnan(parent).any(axis=(1, 2)) | np.isnan(child).any(axis=(1, 2))
        )
        X0s.append(parent[good].reshape(good.sum(), -1))
        Xts.append(child[good].reshape(good.sum(), -1))
        ws.append(w[good])
    X0 = np.concatenate(X0s)
    Xt = np.concatenate(Xts)
    w = np.concatenate(ws)

    ref = _accumulate(X0, Xt, weights=w, chunks=1).finalize(
        "tica", var_cutoff=0.95
    )
    assert model.ndim == ref.output_dimension
    got = model.reduceCoordinates(
        np.concatenate([model._dataset.iter_child_coords(i) for i in (2, 3)])
    )
    want = ref.transform(
        np.concatenate(
            [
                model._dataset.iter_child_coords(i).reshape(-1, 12)
                for i in (2, 3)
            ]
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_device_pair_moments_match_host_far_from_origin():
    """The f32 device pair-moment path (per-batch centered, f64 Chan-style
    combine) must match the f64 host path even for data with a huge common
    offset -- the case raw f32 sums would cancel catastrophically on."""
    rng = np.random.default_rng(12)
    n, d = 2000, 5
    offset = 1e7  # f32 granularity at 1e7 is ~1.0 -- unit-spread data would
    # be quantized to noise if cast before centering
    X0 = rng.normal(size=(n, d)) + offset
    Xt = 0.7 * (X0 - offset) + 0.5 * rng.normal(size=(n, d)) + offset
    w = rng.random(n)

    host = PairMomentAccumulator(d, dtype=np.float64)
    dev = PairMomentAccumulator(d, dtype=np.float32)
    bounds = np.linspace(0, n, 9).astype(int)
    for a, b in zip(bounds[:-1], bounds[1:]):
        host.add(X0[a:b], Xt[a:b], w[a:b])
        dev.add(X0[a:b], Xt[a:b], w[a:b])

    m_host = host.finalize("tica", var_cutoff=1.0)
    m_dev = dev.finalize("tica", var_cutoff=1.0)
    np.testing.assert_allclose(m_dev.scales_, m_host.scales_, atol=2e-4)

    v_host = host.finalize("vamp", var_cutoff=1.0)
    v_dev = dev.finalize("vamp", var_cutoff=1.0)
    np.testing.assert_allclose(v_dev.scales_, v_host.scales_, atol=2e-4)


def _deeptime_estimators():
    """The real deeptime estimators when importable (takes priority), else
    the faithful local oracle (``tests/_deeptime_oracle.py``) that follows
    deeptime's own numerical route (regularized whitening + Koopman SVD).
    Either way the cross-check RUNS — it never skips."""
    try:
        from deeptime.decomposition import TICA, VAMP

        if TICA is object or VAMP is object:
            # The reference-pickle loaders (tests/ntl9_pickles.py,
            # test_reference_differential.py) stub deeptime into
            # sys.modules for unpickling; that stub is not an estimator
            raise ImportError("deeptime in sys.modules is a test stub")
        return TICA, VAMP, "deeptime"
    except ImportError:
        from _deeptime_oracle import TICA, VAMP

        return TICA, VAMP, "oracle"


def test_tica_cross_check_deeptime(ou_pairs):
    """Seeded cross-check against the library the reference actually calls
    (``_dimensionality.py:288-311``) — or, when deeptime cannot be
    installed, against a from-the-algorithm oracle of its estimation route:
    eigenvalues to rtol 1e-8, projections equal up to per-component sign."""
    TICA, _VAMP, _src = _deeptime_estimators()

    X0, Xt, _R = ou_pairs
    acc = _accumulate(X0, Xt)
    model = acc.finalize(method="tica", var_cutoff=1.0)

    est = TICA(lagtime=1, var_cutoff=None, scaling="kinetic_map")
    dt_model = est.fit((X0, Xt)).fetch_model()

    np.testing.assert_allclose(
        np.sort(np.abs(model.scales_))[::-1],
        np.sort(np.abs(dt_model.singular_values))[::-1][: len(model.scales_)],
        rtol=1e-8,
    )

    ours = model.transform(X0[:500])
    theirs = dt_model.transform(X0[:500])[:, : ours.shape[1]]
    for j in range(ours.shape[1]):
        sign = np.sign(np.dot(ours[:, j], theirs[:, j]) or 1.0)
        # atol 1e-7: streamed (chunked Chan-combine) vs dense f64 moments
        # round differently near zero; observed max abs gap ~3e-8
        np.testing.assert_allclose(ours[:, j], sign * theirs[:, j], rtol=1e-6,
                                   atol=1e-7)


def test_vamp_cross_check_deeptime(ou_pairs):
    _TICA, VAMP, _src = _deeptime_estimators()

    X0, Xt, _R = ou_pairs
    acc = _accumulate(X0, Xt)
    model = acc.finalize(method="vamp", var_cutoff=1.0)

    est = VAMP(lagtime=1, var_cutoff=None, scaling=None)
    dt_model = est.fit((X0, Xt)).fetch_model()

    np.testing.assert_allclose(
        model.scales_,
        dt_model.singular_values[: len(model.scales_)],
        rtol=1e-8,
    )


def test_committed_deeptime_goldens(ou_pairs):
    """Assert against STATIC goldens generated by the actual deeptime
    library (``scripts/gen_deeptime_goldens.py``) when they are committed.

    This environment cannot produce them: it has no network egress and
    ``pip download deeptime`` finds no distribution (attempt recorded in
    PARITY.md), so until someone runs the generator on a deeptime-equipped
    machine this test documents the constraint by skipping with that
    reason. The live cross-check above (deeptime when importable, else the
    from-the-algorithm oracle) always runs regardless."""
    import os

    path = os.path.join(
        os.path.dirname(__file__), "goldens", "deeptime_ar1.npz"
    )
    if not os.path.exists(path):
        pytest.skip(
            "tests/goldens/deeptime_ar1.npz not committed (deeptime is not "
            "installable in this environment -- run "
            "scripts/gen_deeptime_goldens.py on a machine with deeptime)"
        )
    g = np.load(path)
    X0, Xt, _R = ou_pairs
    assert int(g["fixture_seed"]) == 42 and int(g["n_steps"]) == 200_000

    model = _accumulate(X0, Xt).finalize(method="tica", var_cutoff=1.0)
    np.testing.assert_allclose(
        np.sort(np.abs(model.scales_))[::-1],
        np.sort(np.abs(g["tica_singular_values"]))[::-1][: len(model.scales_)],
        rtol=1e-8,
    )
    ours = model.transform(X0[:500])
    theirs = g["tica_projection"][:, : ours.shape[1]]
    for j in range(ours.shape[1]):
        sign = np.sign(np.dot(ours[:, j], theirs[:, j]) or 1.0)
        np.testing.assert_allclose(
            ours[:, j], sign * theirs[:, j], rtol=1e-6, atol=1e-7
        )

    v = _accumulate(X0, Xt).finalize(method="vamp", var_cutoff=1.0)
    np.testing.assert_allclose(
        v.scales_,
        g["vamp_singular_values"][: len(v.scales_)],
        rtol=1e-8,
    )
