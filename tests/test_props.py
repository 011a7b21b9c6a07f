"""Field-prop semantics: nullable / required / default / load_key /
unknown-field / frozen config — parity with reference
tests/test_fields_props.py and tests/test_configs.py."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from oblate_spark import Schema, SchemaConfig, fields

from .test_primitives import staged_df, violations_map


def typed_df(spark, schema_ddl: str, rows: list[tuple]):
    return spark.createDataFrame(rows, schema_ddl)


def test_none_disallowed(spark):
    class S(Schema):
        f = fields.String()

    df = typed_df(spark, "row_id string, f string", [("0", None), ("1", "ok")])
    vm = violations_map(S.validate(df))
    assert vm == {"0": [("f", "This field must not be None.")]}


def test_none_allowed(spark):
    class S(Schema):
        f = fields.String(none=True)

    df = typed_df(spark, "row_id string, f string", [("0", None)])
    assert violations_map(S.validate(df)) == {}


def test_required_missing_column(spark):
    class S(Schema):
        f = fields.String()
        g = fields.String()

    df = typed_df(spark, "row_id string, f string", [("0", "x")])
    vm = violations_map(S.validate(df))
    assert vm == {"0": [("g", "This field is required.")]}


def test_null_is_missing_required(spark):
    class S(Schema):
        f = fields.String(null_is_missing=True)

    df = typed_df(spark, "row_id string, f string", [("0", None), ("1", "v")])
    vm = violations_map(S.validate(df))
    assert vm == {"0": [("f", "This field is required.")]}


def test_default_fill(spark):
    class S(Schema):
        f = fields.String(null_is_missing=True, default="fallback")
        g = fields.Integer(null_is_missing=True, default=F.lit(10) * 2)

    df = typed_df(spark, "row_id string, f string, g long", [("0", None, None), ("1", "v", 5)])
    res = S.validate(df)
    assert violations_map(res) == {}
    out = {r["row_id"]: r for r in res.annotated.select(
        "row_id", res.plan.loaded["f"].alias("f"), res.plan.loaded["g"].alias("g")
    ).collect()}
    assert out["0"]["f"] == "fallback" and out["0"]["g"] == 20
    assert out["1"]["f"] == "v" and out["1"]["g"] == 5


def test_default_fill_on_nonstrict_coercion_path(spark):
    """Regression (round-2 ADVICE): the non-strict string-column
    coercion branch returned early and skipped the default fill."""
    class S(Schema):
        g = fields.Integer(strict=False, null_is_missing=True, default=7)

    df = typed_df(spark, "row_id string, g string", [("0", None), ("1", "5")])
    res = S.validate(df)
    assert violations_map(res) == {}
    out = {r["row_id"]: r["g"] for r in res.annotated.select(
        "row_id", res.plan.loaded["g"].alias("g")
    ).collect()}
    assert out == {"0": 7, "1": 5}


def test_default_missing_column(spark):
    class S(Schema):
        f = fields.String()
        g = fields.Integer(default=99)

    df = typed_df(spark, "row_id string, f string", [("0", "x")])
    res = S.validate(df)
    assert violations_map(res) == {}
    assert res.plan.loaded["g"] is not None


def test_load_key_rename(spark):
    # reference tests/test_fields_props.py:82-96 — data_key decouples
    # attribute name from raw key; violations report the load_key
    class S(Schema):
        id = fields.Integer(data_key="Id")

    df = typed_df(spark, "row_id string, Id long", [("0", None)])
    vm = violations_map(S.validate(df))
    assert vm == {"0": [("Id", "This field must not be None.")]}


def test_unknown_field(spark):
    class S(Schema):
        f = fields.String()

    df = typed_df(spark, "row_id string, f string, zz string", [("0", "a", "b")])
    vm = violations_map(S.validate(df))
    assert vm == {"0": [("zz", "Invalid or unknown field.")]}


def test_ignore_extra(spark):
    class S(Schema):
        __config__ = SchemaConfig(ignore_extra=True)
        f = fields.String()

    df = typed_df(spark, "row_id string, f string, zz string", [("0", "a", "b")])
    assert violations_map(S.validate(df)) == {}


def test_ignore_extra_override_at_validate(spark):
    class S(Schema):
        f = fields.String()

    df = typed_df(spark, "row_id string, f string, zz string", [("0", "a", "b")])
    assert violations_map(S.validate(df, ignore_extra=True)) == {}


def test_inheritance_copies_fields(spark):
    class Base(Schema):
        a = fields.String()

    class Child(Base):
        b = fields.Integer()

    assert set(Child.__fields__) == {"a", "b"}
    assert set(Base.__fields__) == {"a"}
    # mutating child validators must not affect parent (schema.py:140-147)
    from oblate_spark import validate as V

    Child.__fields__["a"].add_validator(V.Length(max=3))
    assert len(list(Base.__fields__["a"].walk_validators())) == 0


def test_dump_include_exclude(spark):
    class S(Schema):
        a = fields.String()
        b = fields.Integer(dump_key="B")

    df = typed_df(spark, "a string, b long", [("x", 1)])
    assert S.dump(df).columns == ["a", "B"]
    assert S.dump(df, include=["a"]).columns == ["a"]
    assert S.dump(df, exclude=["a"]).columns == ["B"]
    import pytest

    with pytest.raises(TypeError):
        S.dump(df, include=["a"], exclude=["b"])


def test_verdicts_shape(spark):
    class S(Schema):
        f = fields.String()

    df = typed_df(spark, "row_id string, f string", [("0", None), ("1", "ok"), ("2", "ok")])
    v = S.validate(df).verdicts()
    row = v.agg(
        F.sum("rows").alias("rows"), F.sum("passed").alias("p"), F.sum("failed").alias("f")
    ).collect()[0]
    assert (row["rows"], row["p"], row["f"]) == (3, 2, 1)
