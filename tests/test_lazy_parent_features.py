"""Lazy parent features (FeatureSet recipe): subset access, on-demand host
materialization, and the on-device parent-from-child gather must all be
bitwise-identical to the eager host gather they replace."""
import pickle

import numpy as np
import pytest

from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.model import FeatureSet, modelWE


@pytest.fixture(scope="module")
def h5path(tmp_path_factory):
    path = tmp_path_factory.mktemp("lazyparent") / "west.h5"
    generate_west_h5(str(path), n_iterations=25, n_segments=24, seed=3)
    return str(path)


def _model(path, **kw):
    m = modelWE()
    m.initialize(
        [path],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "t",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="pca",
        tau=1.0,
        **kw,
    )
    m.get_iterations()
    m.dimReduce()
    return m


def _eager_parent(feats):
    """Reference materialization straight from the recipe, independent of
    FeatureSet.parent_rows."""
    child = dict.__getitem__(feats, "child")
    out = child[np.maximum(feats._parent_src, 0)]
    if len(feats._parent_fb_rows):
        out[feats._parent_fb_rows] = feats._parent_fb_feats
    return out


def test_featureset_is_lazy_and_materializes_exactly(h5path):
    m = _model(h5path, dedup_coordinates=True)
    feats = m._featurize_all()
    assert isinstance(feats, FeatureSet)
    assert feats.parent_is_lazy
    # fallback rows must actually occur for this test to cover the scatter
    assert len(feats._parent_fb_rows) > 0

    expected = _eager_parent(feats)
    # Subset access does NOT materialize
    rows = np.unique(
        np.concatenate(
            [feats._parent_fb_rows[:3], np.array([0, 5, len(expected) - 1])]
        )
    )
    got = feats.parent_rows(rows)
    assert feats.parent_is_lazy
    assert np.array_equal(got, expected[rows])
    # Empty subset
    assert feats.parent_rows(np.zeros(0, np.int64)).shape == (0, expected.shape[1])

    # Full indexing materializes once, bitwise-equal
    full = feats["parent"]
    assert not feats.parent_is_lazy
    assert np.array_equal(full, expected)
    assert feats.parent_rows(rows) is not None
    assert np.array_equal(feats.parent_rows(rows), expected[rows])


def test_lazy_parent_matches_direct_featurization(h5path):
    m_lazy = _model(h5path, dedup_coordinates=True)
    m_direct = _model(h5path, dedup_coordinates=False)
    f_lazy = m_lazy._featurize_all()
    f_direct = m_direct._featurize_all()
    assert not f_direct.parent_is_lazy
    assert np.array_equal(f_lazy["parent"], f_direct["parent"])
    assert np.array_equal(f_lazy["child"], f_direct["child"])


@pytest.mark.parametrize("n_devices", [1, 8])
def test_device_parent_gather_matches_host(h5path, n_devices):
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices("cpu")[:n_devices]).reshape(n_devices, 1)
    mesh = Mesh(devs, ("data", "model"))

    m = _model(h5path, dedup_coordinates=True)
    m.enable_mesh(mesh)
    feats = m._featurize_all()
    assert feats.parent_is_lazy
    parent_dev, child_dev = m._device_row_feats()
    assert feats.parent_is_lazy  # the device path must not materialize

    expected = _eager_parent(feats)
    got = np.asarray(parent_dev)[: len(expected)]
    assert np.array_equal(got, expected)
    assert np.array_equal(np.asarray(child_dev)[: len(expected)], feats["child"])


def test_featureset_pickle_roundtrip(h5path):
    m = _model(h5path, dedup_coordinates=True)
    feats = m._featurize_all()
    assert feats.parent_is_lazy
    back = pickle.loads(pickle.dumps(feats))
    assert isinstance(back, FeatureSet)
    assert back.parent_is_lazy
    assert np.array_equal(back["parent"], feats["parent"])
    assert np.array_equal(back["child"], feats["child"])


def test_featureset_dict_protocols_do_not_leak_placeholder(h5path):
    m = _model(h5path, dedup_coordinates=True)
    feats = m._featurize_all()
    assert feats.parent_is_lazy
    expected = _eager_parent(feats)

    # .get must materialize like __getitem__ would; on a fresh lazy set
    m2 = _model(h5path, dedup_coordinates=True)
    f2 = m2._featurize_all()
    got = f2.get("parent")
    assert got is not None and np.array_equal(got, expected)
    assert f2.get("missing", 7) == 7

    # items()/values()/copy() materialize rather than exposing None
    m3 = _model(h5path, dedup_coordinates=True)
    f3 = m3._featurize_all()
    assert not any(v is None for _, v in f3.items())
    m4 = _model(h5path, dedup_coordinates=True)
    f4 = m4._featurize_all()
    cp = f4.copy()
    assert isinstance(cp, FeatureSet)
    assert np.array_equal(cp["parent"], expected)

    # Boolean-mask subset access matches integer indexing
    m5 = _model(h5path, dedup_coordinates=True)
    f5 = m5._featurize_all()
    mask = np.zeros(len(expected), bool)
    mask[[1, 4, int(f5._parent_fb_rows[0])]] = True
    assert f5.parent_is_lazy
    assert np.array_equal(f5.parent_rows(mask), expected[mask])
    assert f5.parent_is_lazy


def test_model_save_load_keeps_recipe_lazy(h5path, tmp_path):
    """model.save() must pickle the recipe, not a materialized parent array,
    and the loaded model must materialize identically on demand."""
    m = _model(h5path, dedup_coordinates=True)
    feats = m._featurize_all()
    assert feats.parent_is_lazy
    expected = _eager_parent(feats)

    path = str(tmp_path / "m.obj")
    m.save(path)
    assert feats.parent_is_lazy  # saving must not materialize

    # Same files: cached features survive the pickle as the lazy recipe
    # (re-anchoring via h5_paths= intentionally drops them instead)
    back = modelWE.load(path)
    bf = back._features
    assert isinstance(bf, FeatureSet) and bf.parent_is_lazy
    assert np.array_equal(bf["parent"], expected)


def test_legacy_plain_dict_features_still_work(h5path):
    from msm_we_tpu.model import _feat_parent_rows

    m = _model(h5path, dedup_coordinates=False)
    feats = m._featurize_all()
    legacy = dict(feats)  # a pre-FeatureSet pickle presents as a plain dict
    rows = np.array([0, 3, 7])
    assert np.array_equal(
        _feat_parent_rows(legacy, rows), feats["parent"][rows]
    )
