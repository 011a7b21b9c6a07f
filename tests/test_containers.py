"""Container fields (List/Dict/Set/TypedDict/Tuple) + typing fields
(Literal/Union/TypeExpr) — message parity with reference
tests/test_fields_structs.py, test_fields_typings.py,
test_type_validation.py:40-53."""

from __future__ import annotations

import typing

import pytest

from oblate_spark import Schema, fields

from .test_primitives import staged_df, violations_map


class TD(typing.TypedDict):
    integer: int
    string: str
    maybe: typing.NotRequired[str]


def test_list_element_staged(spark):
    class S(Schema):
        tags = fields.List(str)

    df = staged_df(spark, {"tags": [["a", "b"], ["a", 1], "notalist"]})
    vm = violations_map(S.validate(df, mode="staged"))
    assert vm == {
        "1": [("tags", "Sequence item at index 1: Must be of type str")],
        "2": [("tags", "Must be a valid list")],
    }


def test_dict_entry_staged(spark):
    class S(Schema):
        attrs = fields.Dict(str, int)

    df = staged_df(spark, {"attrs": [{"a": 1}, {"a": "x"}, ["nope"]]})
    vm = violations_map(S.validate(df, mode="staged"))
    assert vm == {
        "1": [("attrs", "Dictionary value for key 'a': Must be of type int")],
        "2": [("attrs", "Must be a valid dictionary")],
    }


def test_typed_dict_staged(spark):
    class S(Schema):
        meta = fields.TypedDict(TD)

    df = staged_df(
        spark,
        {
            "meta": [
                {"integer": 1, "string": "s"},
                {"integer": 1},
                {"integer": 1, "string": "s", "invalid": 2},
                {"integer": "x", "string": "s"},
            ]
        },
    )
    vm = violations_map(S.validate(df, mode="staged"))
    assert vm == {
        "1": [("meta", "Key 'string' is required")],
        "2": [("meta", "Invalid key 'invalid'")],
        "3": [("meta", "Validation failed for 'integer': Must be of type int")],
    }


def test_set_staged(spark):
    class S(Schema):
        items = fields.Set(str)

    df = staged_df(spark, {"items": [["a", "b"], ["a", 3]]})
    vm = violations_map(S.validate(df, mode="staged"))
    assert vm == {"1": [("items", "Set includes an invalid item: Must be of type str")]}


def test_set_distinct_typed(spark):
    class S(Schema):
        items = fields.Set(str)

    df = spark.createDataFrame(
        [("0", ["a", "b"]), ("1", ["a", "a"])], "row_id string, items array<string>"
    )
    vm = violations_map(S.validate(df))
    assert vm == {"1": [("items", "Must be a valid set")]}


def test_tuple_staged(spark):
    class S(Schema):
        pair = fields.Tuple(str, int)

    df = staged_df(spark, {"pair": [["a", 1], ["a"], ["a", "b"]]})
    vm = violations_map(S.validate(df, mode="staged"))
    assert vm == {
        "1": [("pair", "Tuple length must be 2 (current length: 1)")],
        "2": [("pair", "Tuple item at index 1: Must be of type int")],
    }


def test_tuple_typed_length(spark):
    class S(Schema):
        pair = fields.Tuple(str, str)

    df = spark.createDataFrame(
        [("0", ["a", "b"]), ("1", ["a"])], "row_id string, pair array<string>"
    )
    vm = violations_map(S.validate(df))
    assert vm == {"1": [("pair", "Tuple length must be 2 (current length: 1)")]}


def test_literal_staged(spark):
    class S(Schema):
        fmt = fields.Literal("bmp", "png", "ppm")

    df = staged_df(spark, {"fmt": ["png", "gif"]})
    vm = violations_map(S.validate(df, mode="staged"))
    assert vm == {"1": [("fmt", "Value must be one of: 'bmp', 'png', 'ppm'")]}


def test_literal_single_and_mixed(spark):
    class S1(Schema):
        v = fields.Literal("test", 1, 3.14)

    df = staged_df(spark, {"v": ["test", 1, 3.14, "no"]})
    vm = violations_map(S1.validate(df, mode="staged"))
    assert vm == {"3": [("v", "Value must be one of: 'test', 1, 3.14")]}

    class S2(Schema):
        v = fields.Literal(42)

    df = staged_df(spark, {"v": [42, 41]})
    vm = violations_map(S2.validate(df, mode="staged"))
    assert vm == {"1": [("v", "Value must be equal to 42")]}


def test_literal_typed(spark):
    class S(Schema):
        fmt = fields.Literal("bmp", "png", "ppm")

    df = spark.createDataFrame([("0", "png"), ("1", "gif")], "row_id string, fmt string")
    vm = violations_map(S.validate(df))
    assert vm == {"1": [("fmt", "Value must be one of: 'bmp', 'png', 'ppm'")]}


def test_union_staged_primitive(spark):
    class S(Schema):
        v = fields.Union(int, str)

    df = staged_df(spark, {"v": [1, "s", 3.14]})
    vm = violations_map(S.validate(df, mode="staged"))
    assert vm == {
        "2": [("v", "Type of 3.14 (float) is not compatible with types (int, str)")]
    }


def test_union_staged_complex(spark):
    class S(Schema):
        v = fields.Union(typing.List[int], str)

    df = staged_df(spark, {"v": [[1, 2], "s", 3.14]})
    vm = violations_map(S.validate(df, mode="staged"))
    assert len(vm) == 1 and "2" in vm
    assert "is not compatible with types" in vm["2"][0][1]


def test_type_expr_nested(spark):
    class S(Schema):
        v = fields.TypeExpr(typing.List[typing.Dict[str, int]])

    df = staged_df(spark, {"v": [[{"a": 1}], [{"a": "x"}]]})
    vm = violations_map(S.validate(df, mode="staged"))
    assert vm == {
        "1": [
            ("v", "Sequence item at index 0: Dictionary value for key 'a': Must be of type int")
        ]
    }


def test_any_passthrough(spark):
    class S(Schema):
        v = fields.Any_()

    df = staged_df(spark, {"v": [1, "x", [1, 2], {"a": 1}]})
    assert violations_map(S.validate(df, mode="staged")) == {}


def test_validate_types_api():
    from oblate_spark import TypeValidationError, validate_types

    types = {"name": str, "id": typing.Union[int, str]}
    validate_types(types, {"name": "John", "id": 2})  # no error

    with pytest.raises(TypeValidationError) as ei:
        validate_types(types, {"name": 12})
    assert ei.value.errors == {"name": ["Must be of type str"], "id": ["This key is missing."]}

    with pytest.raises(TypeValidationError) as ei:
        validate_types(types, {"name": "x", "id": 1, "zz": 0})
    assert ei.value.errors == {"zz": ["Invalid key"]}

    validate_types(types, {"name": "x", "id": 1, "zz": 0}, ignore_extra=True)
    validate_types(types, {"name": "x"}, ignore_missing=True)
