"""Pins the oracle-compare harness itself: the driver's hash is type-sensitive
(VERDICT r1 — Decimal-vs-double / int-vs-double columns with equal values were
driver failures the old value-only normalization masked), so _norm_cell must
keep type classes distinct while still unifying DATE with midnight TIMESTAMP."""

import datetime
from decimal import Decimal

import pandas as pd

from tests.conftest import _norm_cell


def test_int_vs_float_distinct():
    assert _norm_cell(7) != _norm_cell(7.0)


def test_decimal_vs_float_distinct():
    assert _norm_cell(Decimal("1.50")) != _norm_cell(1.5)


def test_bool_vs_int_distinct():
    assert _norm_cell(True) != _norm_cell(1)


def test_date_and_midnight_timestamp_unify():
    d = datetime.date(1995, 3, 15)
    assert _norm_cell(d) == _norm_cell(pd.Timestamp("1995-03-15 00:00:00"))
    assert _norm_cell(d) == _norm_cell(datetime.datetime(1995, 3, 15))


def test_nan_equals_nan():
    assert _norm_cell(float("nan")) == _norm_cell(float("nan"))


def test_nested_arrays_tagged():
    assert _norm_cell([1, 2]) != _norm_cell([1.0, 2.0])
    assert _norm_cell([1, 2]) == _norm_cell((1, 2))
