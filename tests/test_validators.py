"""Validator matrix — parity with reference tests/test_validators.py
(Range :109-150, Length :152-187, Exclude :189-201, Or :203-221,
Regex :223-249, custom validators :29-80, management :82-106)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oblate_spark import Schema, fields
from oblate_spark import validate as V

from .test_primitives import violations_map


def typed_df(spark, ddl, rows):
    return spark.createDataFrame(rows, ddl)


def msgs_for(spark, field, ddl, rows):
    class S(Schema):
        f = field

    df = typed_df(spark, f"row_id string, {ddl}", rows)
    return violations_map(S.validate(df))


def test_range_two_args(spark):
    vm = msgs_for(
        spark,
        fields.Integer(validators=[V.Range(1000, 9999)]),
        "f long",
        [("0", 999), ("1", 1000), ("2", 9999), ("3", 10000)],
    )
    m = "Value must be in range 1000 to 9999 inclusive"
    assert vm == {"0": [("f", m)], "3": [("f", m)]}


def test_range_one_arg(spark):
    vm = msgs_for(
        spark,
        fields.Integer(validators=[V.Range(5)]),
        "f long",
        [("0", 0), ("1", 5), ("2", 6), ("3", -1)],
    )
    m = "Value must be in range 0 to 5 inclusive"
    assert vm == {"2": [("f", m)], "3": [("f", m)]}


def test_range_equal(spark):
    vm = msgs_for(
        spark, fields.Integer(validators=[V.Range(2, 2)]), "f long", [("0", 2), ("1", 3)]
    )
    assert vm == {"1": [("f", "Value must be equal to 2")]}


def test_range_from_standard(spark):
    vm = msgs_for(
        spark,
        fields.Integer(validators=[V.Range.from_standard(range(2, 10))]),
        "f long",
        [("0", 9), ("1", 10)],
    )
    assert vm == {"1": [("f", "Value must be in range 2 to 9 inclusive")]}


def test_length_modes(spark):
    cases = [
        (V.Length(min=5), "Value length must be greater than 5 characters", "abc", "abcdef"),
        (V.Length(max=5), "Value length must be less than 5 characters", "abcdef", "abc"),
        (V.Length(exact=5), "Value length must be exactly 5 characters", "abc", "abcde"),
        (V.Length(min=2, max=4), "Value length must be between 2 to 4 characters", "a", "abc"),
    ]
    for validator, msg, bad, good in cases:
        vm = msgs_for(
            spark,
            fields.String(validators=[validator]),
            "f string",
            [("0", bad), ("1", good)],
        )
        assert vm == {"0": [("f", msg)]}, (validator, vm)


def test_length_on_array(spark):
    vm = msgs_for(
        spark,
        fields.List(str, validators=[V.Length(max=2)]),
        "f array<string>",
        [("0", ["a", "b", "c"]), ("1", ["a"])],
    )
    assert vm == {"0": [("f", "Value length must be less than 2 characters")]}


def test_exclude(spark):
    vm = msgs_for(
        spark, fields.String(validators=[V.Exclude("ex1")]), "f string", [("0", "ex1"), ("1", "x")]
    )
    assert vm == {"0": [("f", "Value cannot be 'ex1'")]}
    vm = msgs_for(
        spark,
        fields.String(validators=[V.Exclude("ex1", "ex2", "ex3")]),
        "f string",
        [("0", "ex2"), ("1", "x")],
    )
    assert vm == {"0": [("f", "Value cannot be one from: 'ex1', 'ex2', 'ex3'")]}


def test_or(spark):
    vm = msgs_for(
        spark,
        fields.Integer(validators=[V.Or(V.Range(1, 3), V.Range(10, 13))]),
        "f long",
        [("0", 2), ("1", 11), ("2", 7)],
    )
    assert vm == {"2": [("f", "All validations failed for the given value")]}


EMAIL = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


def test_regex_modes(spark):
    # match (anchored at start), fullmatch, search — reference :223-249
    vm = msgs_for(
        spark,
        fields.String(validators=[V.Regex(EMAIL)]),
        "f string",
        [("0", "a@b.co"), ("1", "nope")],
    )
    assert vm == {"1": [("f", "Value failed pattern validation")]}

    vm = msgs_for(
        spark,
        fields.String(validators=[V.Regex("b+", search=True)]),
        "f string",
        [("0", "aabba"), ("1", "aaa")],
    )
    assert vm == {"1": [("f", "Value failed pattern validation")]}

    vm = msgs_for(
        spark,
        fields.String(validators=[V.Regex("ab", full_match=True)]),
        "f string",
        [("0", "ab"), ("1", "abc")],
    )
    assert vm == {"1": [("f", "Value failed pattern validation")]}

    # match = anchored prefix: 'abc' matches pattern 'ab'
    vm = msgs_for(
        spark,
        fields.String(validators=[V.Regex("ab")]),
        "f string",
        [("0", "abc"), ("1", "zab")],
    )
    assert vm == {"1": [("f", "Value failed pattern validation")]}


def test_regex_custom_fail_message_with_value(spark):
    vm = msgs_for(
        spark,
        fields.String(validators=[V.Regex("x+", fail_message="bad: {value}")]),
        "f string",
        [("0", "yyy")],
    )
    assert vm == {"0": [("f", "bad: yyy")]}


def test_error_accumulation_no_fail_fast(spark):
    # all validators of a field report (reference oblate/fields/base.py:212-224)
    vm = msgs_for(
        spark,
        fields.Integer(validators=[V.Range(1, 3), V.Exclude(7)]),
        "f long",
        [("0", 7)],
    )
    assert sorted(vm["0"]) == [
        ("f", "Value cannot be 7"),
        ("f", "Value must be in range 1 to 3 inclusive"),
    ]


def test_decorator_validator(spark):
    from oblate_spark import validate as validate_mod

    class S(Schema):
        f = fields.Integer()

        @validate_mod.field("f")
        def check_even(col):
            return col % 2 == 0

    df = typed_df(spark, "row_id string, f long", [("0", 2), ("1", 3)])
    vm = violations_map(S.validate(df))
    assert vm == {"1": [("f", "Validation failed for this field.")]}


def test_raw_vs_nonraw_ordering(spark):
    # raw validators see the pre-cast value; non-raw see the coerced one
    # (reference docs/source/guide/validators.rst:65-104)
    from .test_primitives import staged_df

    raw_seen = V.ExprValidator(
        lambda c: F.when(c != "30", F.lit("raw saw wrong value")), raw=True, returns_message=True
    )
    nonraw_seen = V.ExprValidator(
        lambda c: F.when(c != 30, F.lit("nonraw saw wrong value")), returns_message=True
    )

    class S(Schema):
        f = fields.Integer(strict=False, validators=[raw_seen, nonraw_seen])

    df = staged_df(spark, {"f": ["30"]})
    assert violations_map(S.validate(df, mode="staged")) == {}


def test_nonraw_skipped_on_load_failure(spark):
    from .test_primitives import staged_df

    class S(Schema):
        f = fields.Integer(strict=False, validators=[V.Range(1, 5)])

    df = staged_df(spark, {"f": ["bad"]})
    vm = violations_map(S.validate(df, mode="staged"))
    # only the coercion error; Range must not run on the failed load
    assert vm == {"0": [("f", "Failed to coerce 'bad' to integer")]}


def test_validator_management(spark):
    f = fields.Integer()
    r = V.Range(1, 2)
    f.add_validator(r)
    assert list(f.walk_validators()) == [r]
    f.remove_validator(r)
    assert list(f.walk_validators()) == []
    f.add_validator(V.Range(1, 2, raw=True))
    f.add_validator(V.Range(3, 4))
    f.clear_validators(raw=True)
    assert all(not v.raw for v in f.walk_validators())
    f.clear_validators()
    assert list(f.walk_validators()) == []


def test_pandas_validator(spark):
    def not_palindrome(s):
        return s.map(lambda v: "Validation failed for this field." if v == v[::-1] else None)

    class S(Schema):
        f = fields.String(validators=[V.PandasValidator(not_palindrome)])

    df = typed_df(spark, "row_id string, f string", [("0", "abba"), ("1", "abc")])
    vm = violations_map(S.validate(df))
    assert vm == {"0": [("f", "Validation failed for this field.")]}


def test_wants_context_requires_defaultless_second_param():
    """Regression: a defaulted second parameter or *args signature must
    NOT be treated as a context request — the SchemaContext would land
    in a slot the author meant for their own parameter."""
    from oblate_spark.contexts import wants_context

    assert wants_context(lambda col, ctx: None) is True
    assert wants_context(lambda col, lo=0: None) is False
    assert wants_context(lambda *cols: None) is False
    assert wants_context(lambda col: None) is False
    assert wants_context(lambda col, ctx, extra=1: None) is True


def test_pandas_validator_with_defaulted_extra_param(spark):
    """A validator with its own defaulted parameter must run as a
    one-argument call on both the Column path (pandas_udf wraps it —
    the raw function would fail Spark's type-hint inference) and keep
    its default value."""
    import pandas as pd

    from oblate_spark import Schema, fields
    from oblate_spark import validate as V

    def limit_check(s: pd.Series, limit=5.0) -> pd.Series:
        return s.map(lambda v: "over limit" if v is not None and v > limit else None)

    class S(Schema):
        x = fields.Float(validators=[V.PandasValidator(limit_check)])

    df = spark.createDataFrame([("0", 1.0), ("1", 9.0)], "row_id string, x double")
    res = S.validate(df, row_id="row_id")
    got = {(r["row_id"], r["message"]) for r in res.violations.collect()}
    assert got == {("1", "over limit")}


def test_wants_context_named_defaulted_ctx_opts_in():
    """(col, ctx=None) is a natural context-taking spelling and must
    keep receiving the SchemaContext; only foreign-named defaults
    (col, lo=0) are the author's own parameters."""
    from oblate_spark.contexts import wants_context

    assert wants_context(lambda col, ctx=None: None) is True
    assert wants_context(lambda col, context=None: None) is True
    assert wants_context(lambda col, schema_context=None: None) is True
    assert wants_context(lambda col, lo=0: None) is False


def test_staged_object_with_unpicklable_state_no_ctx_validators(spark):
    """Regression: the nested-object kernel captured the SchemaContext
    unconditionally — unpicklable state (a lock, a session) aborted
    staged runs whose validators never asked for a context."""
    import json as _json
    import threading

    from oblate_spark import Schema, fields

    class Inner(Schema):
        a = fields.Integer()

    class Outer(Schema):
        k = fields.Integer()
        payload = fields.Object(Inner)

    df = spark.createDataFrame(
        [("0", _json.dumps(1), _json.dumps({"a": 2}))],
        "row_id string, k string, payload string",
    )
    res = Outer.validate(
        df, mode="staged", row_id="row_id", state={"lock": threading.Lock()}
    )
    assert res.violations.count() == 0
