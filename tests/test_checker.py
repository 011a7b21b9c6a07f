"""Regression tests for the local correctness gate's canonicalizer.

Round 4 shipped a dtype-only oracle mismatch (bigint vs string user_id)
because ``tools/check_correctness.py`` stringified cells — string '42'
and bigint 42 hashed identically, so the local gate said "ok" for a
query the driver's type-sensitive hasher failed. These tests pin the
fixed canonicalizer to be at least as strict as the driver's.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tools.check_correctness import (  # noqa: E402
    _DUCK_TYPES,
    _SPARK_TYPES,
    canonical,
    typed_columns,
)


def test_string_int_cells_do_not_collide():
    rows_int = [(42, "a")]
    rows_str = [("42", "a")]
    cols = ["user_id", "tag"]
    assert canonical(rows_int, cols) != canonical(rows_str, cols)


def test_float_int_cells_do_not_collide():
    assert canonical([(1,)], ["x"]) != canonical([(1.0,)], ["x"])


def test_bool_int_cells_do_not_collide():
    assert canonical([(True,)], ["x"]) != canonical([(1,)], ["x"])


def test_identical_typed_rows_still_collide_order_insensitively():
    a = canonical([(1, "x"), (2, "y")], ["n", "s"])
    b = canonical([(2, "y"), (1, "x")], ["n", "s"])
    assert a == b


def test_column_order_is_name_sorted():
    a = canonical([(1, "x")], ["n", "s"])
    b = canonical([("x", 1)], ["s", "n"])
    assert a == b


def test_typed_columns_catch_bigint_vs_varchar():
    spark_side = typed_columns([("user_id", "bigint")], _SPARK_TYPES)
    duck_str = typed_columns([("user_id", "VARCHAR")], _DUCK_TYPES)
    duck_int = typed_columns([("user_id", "BIGINT")], _DUCK_TYPES)
    assert spark_side != duck_str
    assert spark_side == duck_int


def test_typed_columns_normalize_across_engines():
    spark_side = typed_columns(
        [("a", "double"), ("b", "string"), ("c", "int"), ("d", "boolean"),
         ("e", "timestamp"), ("f", "decimal(10,2)"), ("g", "array<string>")],
        _SPARK_TYPES,
    )
    duck_side = typed_columns(
        [("a", "DOUBLE"), ("b", "VARCHAR"), ("c", "INTEGER"), ("d", "BOOLEAN"),
         ("e", "TIMESTAMP"), ("f", "DECIMAL(10,2)"), ("g", "VARCHAR[]")],
        _DUCK_TYPES,
    )
    assert spark_side == duck_side


def test_unknown_selection_fails_not_vacuous():
    """Regression: `check_correctness.py --only foo,bar` used to match
    nothing and print ALL OK — a typo'd selection must exit non-zero,
    never vacuously pass (the local gate may not be weaker than the
    driver's)."""
    import subprocess
    import sys

    p = subprocess.run(
        [sys.executable, "tools/check_correctness.py", "--only", "nope"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert p.returncode != 0
    assert "unknown query name" in (p.stderr + p.stdout)
