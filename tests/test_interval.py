"""Tier-1 tests for half-open Interval membership."""
from msm_we_tpu.utils import Interval


def test_single_1d():
    interval = Interval([1, 2], 1)
    assert 0.5 not in interval
    assert 1.3 in interval


def test_single_1d_nested():
    interval = Interval([[1, 2]], 1)
    assert 0.5 not in interval
    assert 1.3 in interval


def test_union_1d():
    interval = Interval([[1, 2], [3, 4]], 1)
    assert 0.5 not in interval
    assert 1.9 in interval
    assert 3.3 in interval


def test_single_3d():
    interval = Interval([[1, 2], [0, 1], [0.1, 0.2]], 3)
    assert [1.5, 1.5, 0.15] not in interval
    assert [1.5, 0.5, 0.15] in interval


def test_union_3d():
    interval = Interval(
        [[[1, 2], [0, 1], [0.1, 0.2]], [[2, 3], [1, 2], [0.1, 0.2]]], 3
    )
    assert [1.5, 1.5, 0.15] not in interval
    assert [1.5, 0.5, 0.15] in interval
    assert [2.5, 1.5, 0.15] in interval
    assert [2.5, 1.5, 0.3] not in interval
