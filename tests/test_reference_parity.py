"""Round-2 reference-parity surfaces: format_error customization
(reference tests/test_errors.py:95-116), typed-mode Union/Tuple element
checks (oblate/fields/typings.py:105-147, type_validation.py:298-328),
get_value_for / FieldNotSet / __schema_post_init__
(oblate/schema.py:224,319-383, exceptions.py:45-72), and the pluggable
formatter/rejection-class hooks (oblate/configs.py:113-125)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from oblate_spark import FieldNotSet, Schema, config, fields
from oblate_spark import validate as V
from oblate_spark.compiler import SchemaCompileError


def typed_df(spark, ddl, rows):
    return spark.createDataFrame(rows, ddl)


def staged_df(spark, rows: dict):
    names = list(rows)
    n = len(next(iter(rows.values())))
    data = []
    for i in range(n):
        rec = {"row_id": str(i)}
        for c in names:
            v = rows[c][i]
            rec[c] = None if v == "__MISSING__" else json.dumps(v)
        data.append(rec)
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("row_id", T.StringType())]
        + [T.StructField(c, T.StringType()) for c in names]
    )
    return spark.createDataFrame(data, schema)


def violations_map(result):
    out: dict[str, list] = {}
    for r in result.violations.collect():
        out.setdefault(r["row_id"], []).append((r["field_key"], r["message"]))
    return out


# ---------------------------------------------------------------------------
# format_error (reference tests/test_errors.py:95-116)
# ---------------------------------------------------------------------------


class _CustomInt(fields.Integer):
    """Port of the reference override: static message for the strict
    datatype error, value-templated message for coercion failure."""

    def format_error(self, error_code, context):
        from oblate_spark import ErrorCode

        if error_code == ErrorCode.INTEGER_INVALID_DATATYPE:
            return "Invalid datatype, must be string"
        if error_code == ErrorCode.INTEGER_COERCION_FAILED:
            return F.concat(
                F.lit("Coercion to integer failed for "), context.get_value()
            )
        return None  # everything else falls back to defaults


def test_format_error_override_staged(spark):
    class S(Schema):
        integer = _CustomInt()

    df = staged_df(spark, {"integer": ["invalid", 5]})
    vm = violations_map(S.validate(df, mode="staged"))
    assert vm == {"0": [("integer", "Invalid datatype, must be string")]}


def test_format_error_override_coercion_typed(spark):
    class S(Schema):
        integer = _CustomInt(strict=False)

    df = typed_df(spark, "row_id string, integer string", [("0", "invalid"), ("1", "5")])
    vm = violations_map(S.validate(df))
    # str()-interpolation like the reference f-string (no repr quotes)
    assert vm == {"0": [("integer", "Coercion to integer failed for invalid")]}


def test_format_error_none_falls_back_to_default(spark):
    """Uncustomized codes keep the exact reference default strings."""

    class S(Schema):
        integer = _CustomInt(null_is_missing=True)

    df = typed_df(spark, "row_id string, integer long", [("0", None)])
    vm = violations_map(S.validate(df))
    assert vm == {"0": [("integer", "This field is required.")]}


def test_format_error_constructor_param(spark):
    """Engine extension: pass format_error= without subclassing."""
    from oblate_spark import ErrorCode

    def fmt(code, ctx):
        if code == ErrorCode.NONE_DISALLOWED:
            return "custom none message"
        return None

    class S(Schema):
        v = fields.String(format_error=fmt)

    df = typed_df(spark, "row_id string, v string", [("0", None), ("1", "x")])
    vm = violations_map(S.validate(df))
    assert vm == {"0": [("v", "custom none message")]}


def test_format_error_on_validator_code(spark):
    """Overrides may also rebrand validator messages; the pass/fail
    signal stays the validator's own."""

    def fmt(code, ctx):
        if code == "validate.range":
            return F.concat(F.lit("out of range: "), ctx.get_value())
        return None

    class S(Schema):
        n = fields.Integer(validators=[V.Range(1, 10)], format_error=fmt)

    df = typed_df(spark, "row_id string, n long", [("0", 5), ("1", 99)])
    vm = violations_map(S.validate(df))
    assert vm == {"1": [("n", "out of range: 99")]}


# ---------------------------------------------------------------------------
# typed-mode Union (reference oblate/fields/typings.py:105-147)
# ---------------------------------------------------------------------------


def test_union_typed_conforming_column_passes(spark):
    class S(Schema):
        v = fields.Union(int, str)

    df = typed_df(spark, "row_id string, v long", [("0", 1), ("1", -7)])
    assert violations_map(S.validate(df)) == {}
    df2 = typed_df(spark, "row_id string, v string", [("0", "anything")])
    assert violations_map(S.validate(df2)) == {}


def test_union_typed_incompatible_column_is_compile_error(spark):
    """Regression (round-1 VERDICT): Union(int, str) on a typed column
    previously emitted no check at all — now a double column is rejected
    at plan-compile time."""

    class S(Schema):
        v = fields.Union(int, str)

    df = typed_df(spark, "row_id string, v double", [("0", 1.5)])
    with pytest.raises(SchemaCompileError):
        S.validate(df).violations.collect()


def test_union_typed_string_column_parallel_trycast(spark):
    class S(Schema):
        v = fields.Union(int, float)

    df = typed_df(
        spark, "row_id string, v string", [("0", "5"), ("1", "5.5"), ("2", "abc")]
    )
    vm = violations_map(S.validate(df))
    assert vm == {
        "2": [("v", "Type of 'abc' (str) is not compatible with types (int, float)")]
    }


def test_union_typed_bool_quirk(spark):
    """isinstance(True, int) — a boolean column satisfies an int arm."""

    class S(Schema):
        v = fields.Union(int, str)

    df = typed_df(spark, "row_id string, v boolean", [("0", True)])
    assert violations_map(S.validate(df)) == {}


# ---------------------------------------------------------------------------
# typed-mode Tuple per-index checks (reference type_validation.py:298-328)
# ---------------------------------------------------------------------------


def test_tuple_typed_per_index_elements(spark):
    class S(Schema):
        pair = fields.Tuple(str, int)

    df = typed_df(
        spark,
        "row_id string, pair array<string>",
        [("0", ["a", "1"]), ("1", ["a", "x"]), ("2", ["a"])],
    )
    vm = violations_map(S.validate(df))
    assert vm == {
        "1": [("pair", "Tuple item at index 1: Must be of type int")],
        "2": [("pair", "Tuple length must be 2 (current length: 1)")],
    }


def test_tuple_typed_extra_items_ignored(spark):
    """Reference parity: the fixed-tuple loop never looks past its arms,
    so longer tuples pass (oblate/type_validation.py:313-327)."""

    class S(Schema):
        pair = fields.Tuple(str, str)

    df = typed_df(spark, "row_id string, pair array<string>", [("0", ["a", "b", "c"])])
    assert violations_map(S.validate(df)) == {}


def test_tuple_typed_variadic_elements(spark):
    class S(Schema):
        nums = fields.Tuple(int, ...)

    df = typed_df(
        spark,
        "row_id string, nums array<string>",
        [("0", ["1", "2"]), ("1", ["1", "x", "y"]), ("2", [])],
    )
    vm = violations_map(S.validate(df))
    assert vm == {"1": [("nums", "Tuple item at index 1: Must be of type int")]}


def test_tuple_typed_statically_wrong_element_type(spark):
    class S(Schema):
        pair = fields.Tuple(str, str)

    df = typed_df(spark, "row_id string, pair array<bigint>", [("0", [1, 2])])
    vm = violations_map(S.validate(df))
    msgs = sorted(m for _, m in vm["0"])
    assert msgs == [
        "Tuple item at index 0: Must be of type str",
        "Tuple item at index 1: Must be of type str",
    ]


# ---------------------------------------------------------------------------
# get_value_for / FieldNotSet / post-init / pluggable hooks
# ---------------------------------------------------------------------------


class _Users(Schema):
    id = fields.Integer()
    name = fields.String(data_key="Name")
    nick = fields.String(required=False)


def _users_df(spark):
    return typed_df(
        spark, "row_id string, id long, Name string", [("0", 1, "alice"), ("1", 2, "bob")]
    )


def test_get_value_for(spark):
    res = _Users.validate(_users_df(spark))
    assert res.get_value_for("0", "name") == "alice"
    assert res.get_value_for("1", "Name") == "bob"  # load_key addressing
    assert res.get_value_for("0", "id") == 1
    with pytest.raises(RuntimeError, match="Invalid field name"):
        res.get_value_for("0", "nope")
    with pytest.raises(KeyError):
        res.get_value_for("99", "name")


def test_get_value_for_unset_field(spark):
    res = _Users.validate(_users_df(spark))
    # 'nick' column absent + not required + no default => unset
    with pytest.raises(FieldNotSet, match="has no value set"):
        res.get_value_for("0", "nick")
    assert res.get_value_for("0", "nick", "fallback") == "fallback"
    # FieldNotSet is an AttributeError, like the reference
    assert issubclass(FieldNotSet, AttributeError)


def test_schema_post_init_hook(spark):
    seen = []

    class S(Schema):
        id = fields.Integer()

        @classmethod
        def __schema_post_init__(cls, result):
            seen.append(result)

    res = S.validate(typed_df(spark, "row_id string, id long", [("0", 1)]))
    assert seen == [res]


def test_violation_formatter_pluggable(spark):
    class S(Schema):
        n = fields.Integer(validators=[V.Range(1, 10)])

    df = typed_df(spark, "row_id string, n long", [("0", 99)])
    res = S.validate(df)
    try:
        config.violation_formatter = lambda row: f"[{row['error_code']}] {row['message']}"
        assert res.raw() == {
            "0": {"n": ["[validate.range] Value must be in range 1 to 10 inclusive"]}
        }
    finally:
        config.violation_formatter = None
    assert res.raw() == {"0": {"n": ["Value must be in range 1 to 10 inclusive"]}}


def test_update_rejected_cls_pluggable(spark, tmp_path):
    from oblate_spark.sources.tableio import SnapshotTable
    from oblate_spark.update import UpdateRejected, update

    class MyRejected(UpdateRejected):
        pass

    class S(Schema):
        id = fields.Integer()
        score = fields.Integer(validators=[V.Range(0, 100)])

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(typed_df(spark, "id long, score long", [(1, 5)]))
    bad = typed_df(spark, "id long, score long", [(1, 999)])
    try:
        config.update_rejected_cls = MyRejected
        with pytest.raises(MyRejected):
            update(t, bad, S, key="id")
        config.update_rejected_cls = int  # not a subclass
        with pytest.raises(TypeError, match="must subclass UpdateRejected"):
            update(t, bad, S, key="id")
    finally:
        config.update_rejected_cls = None


# ---------------------------------------------------------------------------
# per-run user state: SchemaContext.state (reference oblate/contexts.py:42-83,
# Schema(data, state=...) — docs/source/guide/contexts.rst, guide/schema.rst)
# ---------------------------------------------------------------------------


def test_schema_context_state_roundtrip(spark):
    """validate(state=...) surfaces the state on result.context, and
    is_initialized flips once the plan is compiled (reference
    SchemaContext.is_initialized semantics)."""

    class S(Schema):
        n = fields.Integer()

    df = typed_df(spark, "row_id string, n long", [("0", 1)])
    res = S.validate(df, state={"key": "value"})
    assert res.context is not None
    assert res.context.state == {"key": "value"}
    assert res.context.schema is S
    assert res.context.config is S.__config__
    assert res.context.is_initialized()
    # default state is None, like the reference
    assert S.validate(df).context.state is None


def test_expr_validator_reads_state(spark):
    """A @validate.field method declaring (col, ctx) receives the active
    run's SchemaContext — the distributed twin of the reference's
    ctx.schema.context.state reads (docs/source/guide/contexts.rst:75)."""

    class S(Schema):
        n = fields.Integer()

        @V.field("n")
        def check_n(col, ctx):
            # the threshold comes from per-run state, not the class
            limit = (ctx.state or {}).get("limit", 0)
            ctx.state["seen_by_validator"] = True
            return col <= limit

    df = typed_df(spark, "row_id string, n long", [("0", 5), ("1", 50)])
    state = {"limit": 10}
    res = S.validate(df, state=state)
    vm = violations_map(res)
    assert "0" not in vm
    assert vm["1"] == [("n", "Validation failed for this field.")]
    # validators may also WRITE state (driver-side, during compile)
    assert state["seen_by_validator"] is True
    # a different run, different state, same class — no cross-run leakage
    vm2 = violations_map(S.validate(df, state={"limit": 100}))
    assert vm2 == {}


def test_pandas_validator_reads_state(spark):
    """PandasValidator with a (series, ctx) signature: the context is
    captured by value into the Arrow kernel closure."""
    import pandas as pd

    def banned_words(s: pd.Series, ctx) -> pd.Series:
        banned = set((ctx.state or {}).get("banned", ()))
        return s.map(
            lambda v: "Value is banned" if v in banned else None
        )

    class S(Schema):
        word = fields.String(validators=[V.PandasValidator(banned_words)])

    df = typed_df(spark, "row_id string, word string", [("0", "ok"), ("1", "bad")])
    vm = violations_map(S.validate(df, state={"banned": ["bad"]}))
    assert "0" not in vm
    assert vm["1"] == [("word", "Value is banned")]


def test_format_error_reads_state(spark):
    """format_error overrides see the run's context via
    ErrorContext.context (reference ErrorContext -> schema.context.state)."""

    class _StatefulInt(fields.Integer):
        def format_error(self, error_code, context):
            from oblate_spark import ErrorCode

            if error_code == ErrorCode.NONE_DISALLOWED and context.context is not None:
                tag = (context.context.state or {}).get("tag", "?")
                return f"[{tag}] no nulls"
            return None

    class S(Schema):
        n = _StatefulInt(none=False)

    df = typed_df(spark, "row_id string, n long", [("0", None)])
    vm = violations_map(S.validate(df, state={"tag": "runA"}))
    assert vm["0"] == [("n", "[runA] no nulls")]
    # ErrorContext.schema backfills from the run context
    res = S.validate(df, state=None)
    assert res.context.schema is S


def test_schema_context_copy_semantics():
    """SchemaContext._copy shallow-copies state and marks the copy
    initialized (reference contexts.py:79-83)."""
    from oblate_spark import SchemaContext

    class S(Schema):
        n = fields.Integer()

    ctx = SchemaContext(S, state={"a": 1})
    assert not ctx.is_initialized()
    dup = ctx._copy(S)
    assert dup.is_initialized()
    assert dup.state == {"a": 1} and dup.state is not ctx.state


def test_union_complex_arms_typed_mode_warns(spark):
    """Typed-mode Union with complex arms emits no runtime check — that
    must be VISIBLE: a UserWarning fires at plan compile (T15 routing),
    suppressible via config.warn_unsupported_types."""
    import warnings
    from typing import List

    class S(Schema):
        v = fields.Union(int, List[int])

    df = typed_df(spark, "row_id string, v long", [("0", 1)])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = S.validate(df)
        res.violations.count()
    msgs = [str(x.message) for x in w if issubclass(x.category, UserWarning)]
    assert any("non-primitive arms" in m for m in msgs)

    try:
        config.warn_unsupported_types = False
        with warnings.catch_warnings(record=True) as w2:
            warnings.simplefilter("always")
            S.validate(df).violations.count()
        assert not [x for x in w2 if "non-primitive arms" in str(x.message)]
    finally:
        config.warn_unsupported_types = True


def test_get_values_for_batched(spark):
    """get_values_for answers N lookups in one job and matches
    get_value_for per id; absent ids are omitted; FieldNotSet/default
    semantics mirror the scalar surface."""

    class S(Schema):
        n = fields.Integer()
        missing = fields.Integer(required=False)

    df = typed_df(spark, "row_id string, n long", [("0", 10), ("1", 20), ("2", 30)])
    res = S.validate(df)
    got = res.get_values_for(["0", "2", "zzz"], "n")
    assert got == {"0": 10, "2": 30}
    assert got["0"] == res.get_value_for("0", "n")
    assert res.get_values_for([], "n") == {}
    with pytest.raises(FieldNotSet):
        res.get_values_for(["0"], "missing")
    assert res.get_values_for(["0", "1"], "missing", default=-1) == {"0": -1, "1": -1}
    with pytest.raises(RuntimeError, match="Invalid field name"):
        res.get_values_for(["0"], "nope")
