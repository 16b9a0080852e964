"""Regression tests for the local correctness-harness canonicalizer.

The driver's value hash distinguishes int64 3 from float64 3.0; rounds 1/3/4
shipped an oracle whose windowed SUM(integer) came back float64 (DuckDB
HUGEINT -> pandas float64) while Spark emitted int64, and the old
tuple-compare normalize hid it behind Python's ``3.0 == 3``.  These tests pin
the dtype-tagged behavior so the hazard class can never be reintroduced.
"""

import sys

import pandas as pd
import pytest

sys.path.insert(0, "tools")

from check import CanonicalizerHazard, normalize  # noqa: E402


def test_int64_vs_float64_distinct():
    a = pd.DataFrame({"session_id": pd.Series([3, 4], dtype="int64")})
    b = pd.DataFrame({"session_id": pd.Series([3.0, 4.0], dtype="float64")})
    assert normalize(a) != normalize(b)


def test_float_rounding_to_6_places():
    c = pd.DataFrame({"x": pd.Series([1.5, 2.0000004], dtype="float64")})
    d = pd.DataFrame({"x": pd.Series([1.5000001, 2.0], dtype="float64")})
    assert normalize(c) == normalize(d)


def test_nan_and_none_stable():
    c = pd.DataFrame({"x": pd.Series([float("nan"), 1.0]),
                      "y": pd.Series([None, "a"], dtype=object)})
    assert normalize(c.copy()) == normalize(c.copy())


def test_order_insensitive():
    a = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    b = a.iloc[[2, 0, 1]].reset_index(drop=True)
    assert normalize(a) == normalize(b)


def test_column_order_insensitive():
    a = pd.DataFrame({"x": [1], "y": ["a"]})
    b = pd.DataFrame({"y": ["a"], "x": [1]})
    assert normalize(a) == normalize(b)


def test_timestamp_output_rejected_in_strict_mode():
    t = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01"])})
    with pytest.raises(CanonicalizerHazard):
        normalize(t)


def test_array_cell_rejected_in_strict_mode():
    t = pd.DataFrame({"v": [[1.0, 2.0]]})
    with pytest.raises(CanonicalizerHazard):
        normalize(t)


def test_bool_not_conflated_with_int():
    a = pd.DataFrame({"x": pd.Series([True, False], dtype="bool")})
    b = pd.DataFrame({"x": pd.Series([1, 0], dtype="int64")})
    assert normalize(a) != normalize(b)
