"""Tests for WE binning/allocation optimization (discrepancy solve is golden-
tested in test_reference_goldens.py; here: bin assignment mechanics and the
optimized mapper)."""
import numpy as np
import pytest

from msm_we_tpu import optimization
from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.model import StratifiedClustersShim
from msm_we_tpu.ops.stratified import StratifiedKmeans


def _toy_discrepancy(n=20, seed=3):
    rng = np.random.default_rng(seed)
    T = rng.random((n, n))
    T /= T.sum(1, keepdims=True)
    # Stationary distribution
    evals, evecs = np.linalg.eig(T.T)
    pi = np.real(evecs[:, np.argmax(np.real(evals))])
    pi = np.abs(pi) / np.abs(pi).sum()
    return T, pi


def test_solve_discrepancy_properties():
    T, pi = _toy_discrepancy()
    disc, var = optimization.solve_discrepancy(T, pi, [T.shape[0] - 1])
    # Orthogonality to pi is the defining normalization
    assert np.isclose(disc @ pi, 0)
    # Poisson equation residual (modulo the pi-projection term)
    lhs = (np.eye(len(T)) - T + np.outer(pi, pi) / (pi @ pi)) @ disc
    b = np.zeros(len(T))
    b[-1] = 1.0
    rhs = b - pi[-1]
    assert np.allclose(lhs, rhs)
    assert (var >= 0).all()


def test_uniform_bins_cover_all():
    T, pi = _toy_discrepancy()
    disc, var = optimization.solve_discrepancy(T, pi, [T.shape[0] - 1])
    bins = optimization.get_uniform_mfpt_bins(var, disc, pi, 6)
    assert len(bins) == len(pi)
    assert bins.min() >= 0 and bins.max() <= 4


def test_clustered_bins_assign_everything():
    T, pi = _toy_discrepancy()
    disc, var = optimization.solve_discrepancy(T, pi, [T.shape[0] - 1])
    bins = optimization.get_clustered_mfpt_bins(var, disc, pi, 7, seed=1)
    assert not np.isnan(bins).any()
    assert len(np.unique(bins)) == 5


@pytest.fixture
def optimized_mapper():
    rng = np.random.default_rng(0)
    base = RectilinearBinMapper([np.linspace(0, 10, 5)])
    sk = StratifiedKmeans(base.nbins, 2, 1, seed=0)
    X = rng.uniform(0.1, 9.9, 400)[:, None].astype(np.float32)
    sk.partial_fit(X, base.assign(X))
    shim = StratifiedClustersShim(base, None, sk)
    micro_map = {i: i % 6 for i in range(sk.n_total_clusters)}
    mapper = optimization.OptimizedBinMapper(
        nbins=8,
        n_original_pcoord_dims=1,
        target_pcoord_bounds=[[0.0, 1.0]],
        basis_pcoord_bounds=[[9.0, 10.0]],
        previous_binmapper=base,
        microstate_mapper=micro_map,
        stratified_clusterer=shim,
    )
    return mapper


def test_optimized_mapper_assign(optimized_mapper):
    rng = np.random.default_rng(1)
    coords = np.concatenate(
        [rng.uniform(1.5, 8, (30, 2)), [[0.5, 0.1]], [[9.5, 7.0]]]
    ).astype(np.float32)
    out = optimized_mapper.assign(coords)
    assert out.shape == (32,)
    assert (out >= 0).all() and (out < 8).all()
    assert out[-2] == 7  # target -> last bin
    assert out[-1] == 6  # basis -> second-to-last bin


def test_optimized_mapper_pickle_roundtrip(optimized_mapper):
    rng = np.random.default_rng(2)
    coords = rng.uniform(1.5, 8, (16, 2)).astype(np.float32)
    ref = optimized_mapper.assign(coords)
    bytestring = optimized_mapper.pickle_and_encode()
    restored = optimization.OptimizedBinMapper(bytestring=bytestring)
    assert np.array_equal(restored.assign(coords), ref)


def test_optimized_mapper_noncontiguous_dict_keys(optimized_mapper):
    """The vectorized microstate lookup must preserve dict membership
    semantics: keys missing from a non-contiguous dict (a cleaned
    microstate) map to -1 and only survive via the basis/target override
    (otherwise the mapper's own assert fires)."""
    rng = np.random.default_rng(4)
    # Remove one mid-range microstate key; route every segment that would
    # land there to the target region instead so the assert stays green
    mm = dict(optimized_mapper.microstate_mapper)
    victim = sorted(mm.keys())[len(mm) // 2]
    del mm[victim]
    optimized_mapper.microstate_mapper = mm

    coords = np.concatenate(
        [rng.uniform(1.5, 8, (50, 2)), [[0.5, 0.1]], [[9.5, 7.0]]]
    ).astype(np.float32)
    # Identify segments that hit the victim microstate and push them into
    # the target region (assignment becomes the target bin, not the lut)
    strat = optimized_mapper.clusterer
    optimized_mapper.clusterer.model.pcoord1List = coords[:, :1]
    micro = strat.predict(coords[:, 1:])
    coords[np.asarray(micro) == victim, 0] = 0.5  # inside target bounds

    out = optimized_mapper.assign(coords)
    assert (out >= 0).all() and (out < 8).all()
    assert out[-2] == 7 and out[-1] == 6


def test_optimized_mapper_output_buffer_contract(optimized_mapper):
    """Reference loop semantics for mismatched output buffers: longer
    buffers fail loudly (no np.empty garbage in the tail), shorter ones
    truncate (reference optimization.py:340-341)."""
    rng = np.random.default_rng(9)
    coords = rng.uniform(1.5, 8, (10, 2)).astype(np.float32)
    with pytest.raises(IndexError):
        optimized_mapper.mapper(coords, np.ones(10, bool), np.empty(12))
    out = optimized_mapper.mapper(coords, np.ones(10, bool), np.empty(7))
    assert len(np.asarray(out)) == 7
