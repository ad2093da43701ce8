"""A self-contained oracle reproducing deeptime's TICA/VAMP estimation route.

The reference delegates dimensionality reduction to deeptime
(``/root/reference/msm_we/_hamsm/_dimensionality.py:288-311``:
``TICA(lagtime=1, ...)`` / ``VAMP(lagtime=1, ...)`` fit from (start, end)
timeseries pairs). deeptime cannot be installed in this environment (no
network, pinned env), so the cross-check tests in
``test_tica_vamp_goldens.py`` use this oracle when the real library is
absent — and the real library when it is importable, which takes priority.

This is NOT a re-export of ``msm_we_tpu.ops.pca``: it follows deeptime's
own numerical route, which is structurally different from both the
package's streamed-moment implementation and the dense
``scipy.linalg.eigh(a, b)`` checks elsewhere in the test file:

- covariance estimation over the concatenated (X0, Xt) pair arrays with
  ``remove_data_mean=True`` and (for TICA) ``reversible=True``
  symmetrization, mirroring ``deeptime/covariance/_covariance.py``
  (Covariance with compute_c0t, bessels_correction=False);
- regularized inverse square roots via spectral truncation — deeptime's
  ``spd_inv_split`` (``deeptime/numeric/_utils.py``) keeps eigenpairs with
  eigenvalue > eps relative to the spectral radius and whitens with
  U diag(s^-1/2);
- a singular value decomposition of the whitened Koopman operator
  ``K = C00^{-1/2} C0t Ctt^{-1/2}`` (``deeptime/decomposition/_vamp.py``,
  ``VAMP._decompose``), with TICA the reversible special case where
  Ctt == C00 and the singular values are |eigenvalues|;
- kinetic-map scaling of the instantaneous coefficients
  (singular-value–weighted), matching ``scaling="kinetic_map"``.

So agreement between the package and this oracle exercises exactly the
convention/algorithm surface the reference inherits from deeptime (epsilon
truncation, whitened-SVD ordering, kinetic-map scaling), not merely "two
calls into the same code".
"""
import numpy as np


def _covariances(X0, Xt, reversible):
    """deeptime Covariance(lagtime=1, compute_c0t=True,
    remove_data_mean=True, reversible=reversible, bessels_correction=False)
    over a single pair batch."""
    X0 = np.asarray(X0, np.float64)
    Xt = np.asarray(Xt, np.float64)
    n = len(X0)
    if reversible:
        # Symmetrized estimation: mean over both ends, covariances averaged
        # with their transposes (deeptime _running_moments.py, symmetric
        # moments mode)
        mu = 0.5 * (X0.mean(0) + Xt.mean(0))
        A0, At = X0 - mu, Xt - mu
        C00 = 0.5 * (A0.T @ A0 + At.T @ At) / n
        C0t = 0.5 * (A0.T @ At + At.T @ A0) / n
        Ctt = C00
    else:
        mu0, mut = X0.mean(0), Xt.mean(0)
        A0, At = X0 - mu0, Xt - mut
        C00 = A0.T @ A0 / n
        C0t = A0.T @ At / n
        Ctt = At.T @ At / n
    return C00, C0t, Ctt


def _spd_inv_split(C, epsilon=1e-10):
    """deeptime.numeric.spd_inv_split: W = U_k diag(s_k^-1/2) over the
    eigenpairs whose eigenvalue exceeds ``epsilon`` relative to the
    spectral radius."""
    s, U = np.linalg.eigh(C)
    keep = s > epsilon * abs(s).max()
    s, U = s[keep], U[:, keep]
    # deeptime sorts descending before whitening
    order = np.argsort(s)[::-1]
    s, U = s[order], U[:, order]
    return U @ np.diag(s ** -0.5)


class _OracleModel:
    def __init__(self, mean0, coeffs, singular_values):
        self._mean0 = mean0
        self._coeffs = coeffs
        self.singular_values = singular_values

    def transform(self, X):
        return (np.asarray(X, np.float64) - self._mean0) @ self._coeffs


def estimate(X0, Xt, reversible, scaling=None, epsilon=1e-10):
    """VAMP._decompose: whiten both ends, SVD the Koopman matrix, project
    with the instantaneous (left) coefficients. ``reversible=True`` is the
    TICA route (symmetric covariances)."""
    C00, C0t, Ctt = _covariances(X0, Xt, reversible)
    W0 = _spd_inv_split(C00, epsilon)
    Wt = _spd_inv_split(Ctt, epsilon)
    K = W0.T @ C0t @ Wt
    U, S, Vt = np.linalg.svd(K, full_matrices=False)
    coeffs = W0 @ U
    if scaling == "kinetic_map":
        coeffs = coeffs * S[None, :]
    mean0 = (
        0.5 * (np.mean(X0, 0) + np.mean(Xt, 0)) if reversible else np.mean(X0, 0)
    )
    return _OracleModel(mean0, coeffs, S)


class TICA:
    """Drop-in for ``deeptime.decomposition.TICA(lagtime=1, ...)`` restricted
    to the surface the cross-check tests use (fit on a pair tuple)."""

    def __init__(self, lagtime=1, var_cutoff=None, scaling="kinetic_map",
                 epsilon=1e-10):
        assert lagtime == 1 and var_cutoff is None
        self._scaling = scaling
        self._epsilon = epsilon

    def fit(self, data):
        X0, Xt = data
        self._model = estimate(X0, Xt, reversible=True, scaling=self._scaling,
                               epsilon=self._epsilon)
        return self

    def fetch_model(self):
        return self._model


class VAMP:
    def __init__(self, lagtime=1, var_cutoff=None, scaling=None,
                 epsilon=1e-10):
        assert lagtime == 1 and var_cutoff is None
        self._scaling = scaling
        self._epsilon = epsilon

    def fit(self, data):
        X0, Xt = data
        self._model = estimate(X0, Xt, reversible=False,
                               scaling=self._scaling, epsilon=self._epsilon)
        return self

    def fetch_model(self):
        return self._model
