"""The local correctness-gate replica must actually FAIL on defects —
otherwise a green sweep proves nothing. Unit tests for
tools.oracle_check.compare/normalize: each defect class is detected,
and the legitimate tolerances (float rounding to 6 places, row order,
column order, NaN-vs-NaN) do NOT false-positive."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from tools.oracle_check import compare, normalize


def _df(rows, columns):
    return pd.DataFrame(rows, columns=columns)


def test_identical_frames_pass():
    a = _df([[1, "x", 1.5], [2, "y", 2.5]], ["id", "s", "v"])
    assert compare("q", a.copy(), a.copy()) == []


def test_row_order_and_column_order_are_ignored():
    a = _df([[1, "x"], [2, "y"]], ["id", "s"])
    b = _df([["y", 2], ["x", 1]], ["s", "id"])
    assert compare("q", a, b) == []


def test_float_rounding_tolerance_at_6_places():
    a = _df([[1, 0.1234567]], ["id", "v"])
    b = _df([[1, 0.12345674]], ["id", "v"])  # differs past 1e-7
    assert compare("q", a, b) == []
    c = _df([[1, 0.123458]], ["id", "v"])  # differs at 1e-6
    assert compare("q", a, c) != []


def test_row_count_mismatch_detected():
    a = _df([[1], [2]], ["id"])
    b = _df([[1]], ["id"])
    errs = compare("q", a, b)
    assert any("row count" in e for e in errs)


def test_schema_mismatch_detected():
    a = _df([[1]], ["id"])
    b = _df([[1]], ["other"])
    errs = compare("q", a, b)
    assert any("schema" in e for e in errs)


def test_value_mismatch_detected_and_located():
    a = _df([[1, "x"], [2, "y"]], ["id", "s"])
    b = _df([[1, "x"], [2, "z"]], ["id", "s"])
    errs = compare("q", a, b)
    assert errs and "s" in errs[0]


def test_nan_equals_nan_but_not_number():
    a = _df([[1, np.nan]], ["id", "v"])
    b = _df([[1, np.nan]], ["id", "v"])
    assert compare("q", a, b) == []
    c = _df([[1, 0.0]], ["id", "v"])
    assert compare("q", a, c) != []


def test_timestamp_normalization_to_microseconds():
    t = pd.Timestamp("2024-01-01 00:00:07.179575")
    a = _df([[1, t]], ["id", "ts"])
    b = _df([[1, t]], ["id", "ts"])
    assert compare("q", a, b) == []
    c = _df([[1, t + pd.Timedelta(microseconds=1)]], ["id", "ts"])
    assert compare("q", a, c) != []


def test_normalize_sorts_deterministically():
    a = normalize(_df([[2, "b"], [1, "a"]], ["id", "s"]))
    assert list(a["id"]) == [1, 2]
