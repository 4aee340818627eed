"""Unit tests for name hygiene + type inference.

Modeled on reference:tests/test_helpers.py (20-case series_is_boolean
table at :34-61, clean_name cases at :64-76).
"""

import numpy as np
import pandas as pd
import pytest

from pandabase_spark.names import clean_name, is_clean
from pandabase_spark.types import (
    infer_schema_pandas,
    series_is_boolean,
    check_utc,
)
from pyspark.sql import types as T


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Name", "name"),
        ("  name  ", "name"),
        ("a b", "a_b"),
        ("a(b)", "a_b_"),
        ("a+b-c", "a_b_c"),
        ("a/b*c", "a_b_c"),
        ('a"b;c', "a_b_c"),
        ("a=b&c|d", "a_b_c_d"),
        ("a#b>c<d", "a_b_c_d"),
        ("a^b%c", "a_b_c"),
        ("a{b}", "a_b_"),
        ("a.b,c", "abc"),
    ],
)
def test_clean_name(raw, expected):
    assert clean_name(raw) == expected


@pytest.mark.parametrize("bad", ["1abc", "9", "a@b", "@x", " , "])
def test_clean_name_rejects(bad):
    with pytest.raises(NameError):
        clean_name(bad)


def test_clean_name_digit_check_runs_on_cleaned_form():
    """Pinned divergence (see clean_name docstring): the leading-digit
    check inspects the CLEANED name, so ' 1abc' raises here although
    the reference's raw-first-char check would let it through
    (reference:pandabase/helpers.py:185-196)."""
    with pytest.raises(NameError, match="digit"):
        clean_name(" 1abc")


def test_is_clean():
    assert is_clean("abc_def")
    assert not is_clean("Abc")
    assert not is_clean("a b")


# --- series_is_boolean truth table (reference:tests/test_helpers.py:34-61) ---
@pytest.mark.parametrize(
    "values,expected",
    [
        ([0, 1], True),
        ([0, 1, None], True),
        ([1.0, 0.0], True),
        ([True, False], True),
        ([0, 0], False),           # all-falsy → NOT boolean
        ([1, 1], False),           # all-truthy → NOT boolean
        ([0, 2], False),
        ([0.5, 1], False),
        (["0", "1"], False),       # strings never narrow
        ([None, None], None),      # all-NaN → no type
        ([True, True], False),
        ([-1, 0, 1], False),
    ],
)
def test_series_is_boolean(values, expected):
    assert series_is_boolean(pd.Series(values)) is expected


def test_infer_schema_five_types():
    df = pd.DataFrame(
        {
            "i": [1, 2],
            "f": [0.5, 1.5],
            "s": ["a", "b"],
            "b": [True, False],
            "d": pd.to_datetime(["2021-01-01", "2021-01-02"], utc=True),
            "allnan": [None, None],
            "narrow_bool": [0, 1],
            "zero_int": [0, 0],
        }
    )
    schema, keys = infer_schema_pandas(df, keys=["i"], auto_index=False)
    by_name = {f.name: f for f in schema.fields}
    assert isinstance(by_name["i"].dataType, T.LongType)
    assert by_name["i"].nullable is False
    assert isinstance(by_name["f"].dataType, T.DoubleType)
    assert isinstance(by_name["s"].dataType, T.StringType)
    assert isinstance(by_name["b"].dataType, T.BooleanType)
    assert isinstance(by_name["d"].dataType, T.TimestampType)
    assert "allnan" not in by_name  # all-NaN columns carry no type
    assert isinstance(by_name["narrow_bool"].dataType, T.BooleanType)
    assert isinstance(by_name["zero_int"].dataType, T.DoubleType)  # safety rule


def test_key_never_narrows():
    df = pd.DataFrame({"k": [0, 1], "v": [1.0, 2.0]})
    schema, _ = infer_schema_pandas(df, keys=["k"], auto_index=False)
    assert isinstance(schema["k"].dataType, T.LongType)


def test_utc_enforcement():
    naive = pd.Series(pd.date_range("2021-01-01", periods=3))
    with pytest.raises(ValueError):
        check_utc(naive, "naive")
    eastern = pd.Series(
        pd.date_range("2021-01-01", periods=3, tz="US/Eastern")
    )
    with pytest.raises(ValueError):
        check_utc(eastern, "eastern")
    utc = pd.Series(pd.date_range("2021-01-01", periods=3, tz="UTC"))
    check_utc(utc, "utc")  # no raise


def test_column_cap():
    df = pd.DataFrame({f"c{i}": [1] for i in range(254)})
    with pytest.raises(ValueError):
        infer_schema_pandas(df, keys=["c0"], auto_index=False)
