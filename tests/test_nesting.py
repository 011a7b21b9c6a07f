"""Nested Object fields — parity with reference tests/test_fields_nesting.py,
especially the nested raw() shape (:48-53)."""

from __future__ import annotations

from oblate_spark import Schema, fields
from oblate_spark import validate as V
from oblate_spark.engine import raw_from_violations

from .test_primitives import staged_df, violations_map


class Author(Schema):
    id = fields.Integer(null_is_missing=True)
    name = fields.String(null_is_missing=True)
    rating = fields.Integer(null_is_missing=True, required=False, validators=[V.Range(0, 10)])


class Book(Schema):
    id = fields.Integer()
    title = fields.String()
    author = fields.Object(Author)


BOOK_DDL = (
    "row_id string, id long, title string, "
    "author struct<id:long, name:string, rating:long>"
)


def test_nested_valid_typed(spark):
    df = spark.createDataFrame([("0", 1, "t", (2, "a", 5))], BOOK_DDL)
    assert violations_map(Book.validate(df)) == {}


def test_nested_missing_field_typed(spark):
    df = spark.createDataFrame([("0", 1, "t", (None, "a", 5))], BOOK_DDL)
    vm = violations_map(Book.validate(df))
    assert vm == {"0": [("author.id", "This field is required.")]}


def test_nested_validator_typed(spark):
    df = spark.createDataFrame([("0", 1, "t", (2, "a", 11))], BOOK_DDL)
    vm = violations_map(Book.validate(df))
    assert vm == {"0": [("author.rating", "Value must be in range 0 to 10 inclusive")]}


def test_nested_null_struct(spark):
    df = spark.createDataFrame([("0", 1, "t", None)], BOOK_DDL)
    vm = violations_map(Book.validate(df))
    # parent none-check fires; children suppressed
    assert vm == {"0": [("author", "This field must not be None.")]}


def test_nested_raw_shape(spark):
    # reference tests/test_fields_nesting.py:48-53:
    # raw() == {'author': [{'id': ['This field is required.']}]}
    df = spark.createDataFrame([("0", 1, "t", (None, "a", 5))], BOOK_DDL)
    raw = Book.validate(df).raw()
    assert raw == {"0": {"author": [{"id": ["This field is required."]}]}}


def test_nested_staged_wrong_type(spark):
    df = staged_df(spark, {"id": [1], "title": ["t"], "author": ["not a dict"]})
    vm = violations_map(Book.validate(df, mode="staged"))
    assert vm == {"0": [("author", "Value must be a Author object")]}


def test_nested_staged_inner_errors(spark):
    df = staged_df(
        spark,
        {
            "id": [1],
            "title": ["t"],
            "author": [{"name": "a", "rating": 99, "zz": 1}],
        },
    )
    vm = violations_map(Book.validate(df, mode="staged"))
    got = sorted(vm["0"])
    assert ("author.id", "This field is required.") in got
    assert ("author.rating", "Value must be in range 0 to 10 inclusive") in got
    assert ("author.zz", "Invalid or unknown field.") in got


def test_raw_from_violations_nesting():
    rows = [
        ("0", "author.id", "This field is required."),
        ("0", "author.rating", "Value must be in range 0 to 10 inclusive"),
        ("0", "title", "This field must not be None."),
    ]
    assert raw_from_violations(rows) == {
        "0": {
            "author": [
                {
                    "id": ["This field is required."],
                    "rating": ["Value must be in range 0 to 10 inclusive"],
                }
            ],
            "title": ["This field must not be None."],
        }
    }


def test_double_nested_typed(spark):
    class Inner(Schema):
        x = fields.Integer(null_is_missing=True)

    class Mid(Schema):
        inner = fields.Object(Inner)

    class Outer(Schema):
        mid = fields.Object(Mid)

    ddl = "row_id string, mid struct<inner: struct<x: long>>"
    df = spark.createDataFrame([("0", ((None,),)), ("1", ((3,),))], ddl)
    vm = violations_map(Outer.validate(df))
    assert vm == {"0": [("mid.inner.x", "This field is required.")]}


def test_nested_pandas_validator_reads_state_in_kernel(spark):
    """Regression: a (series, ctx) PandasValidator on a field of a
    NESTED schema runs via py_check inside the Arrow kernel, where the
    driver's ContextVar is unset — the kernel must hand it the
    compile-time context snapshot, not None (which crashed the task)."""
    import pandas as pd

    def banned_names(s: pd.Series, ctx) -> pd.Series:
        banned = set((ctx.state or {}).get("banned", ()))
        return s.map(lambda v: "Name is banned" if v in banned else None)

    class GuardedAuthor(Schema):
        id = fields.Integer(null_is_missing=True)
        name = fields.String(validators=[V.PandasValidator(banned_names)])

    class GuardedBook(Schema):
        id = fields.Integer()
        author = fields.Object(GuardedAuthor)

    df = staged_df(
        spark,
        {
            "id": [1, 2],
            "author": [{"id": 2, "name": "ok"}, {"id": 3, "name": "evil"}],
        },
    )
    vm = violations_map(
        GuardedBook.validate(df, mode="staged", state={"banned": ["evil"]})
    )
    assert "0" not in vm
    assert vm["1"] == [("author.name", "Name is banned")]
