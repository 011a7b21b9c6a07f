"""Local twin of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry against its ``oracle_sql()`` twin in
DuckDB at sf0.01 and compare row-count + column names + an
order-insensitive value hash.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canonical(rows, columns) -> str:
    """Order-insensitive canonical form: sort columns by name, TYPE-TAG
    + stringify cells, sort rows. The type tag makes the hash as strict
    as the driver's: string ``'42'`` and bigint ``42`` must NOT collide
    (a dtype-only mismatch shipped in round 4 because the old ``str()``
    canonicalization was blind to it)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append("\x1f".join(_cell(row[i]) for i in order))
    out.sort()
    return "\n".join(out)


def _cell(v) -> str:
    if v is None:
        return "\x00"
    if isinstance(v, float):
        return f"float:{v!r}"
    # bool before int would be redundant — type(True).__name__ == 'bool'
    # already distinguishes it from int in the tag
    return f"{type(v).__name__}:{v}"


# engine type name -> canonical token, so the column-type assertion can
# compare a Spark dtype string against a DuckDB type object
_SPARK_TYPES = {
    "bigint": "int64", "int": "int32", "integer": "int32",
    "smallint": "int16", "tinyint": "int8",
    "double": "float64", "float": "float32",
    "string": "str", "varchar": "str", "boolean": "bool",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    "date": "date", "binary": "bytes",
}
_DUCK_TYPES = {
    "bigint": "int64", "int64": "int64", "long": "int64",
    "integer": "int32", "int32": "int32", "int": "int32",
    "smallint": "int16", "int16": "int16", "tinyint": "int8",
    "double": "float64", "float64": "float64",
    "float": "float32", "real": "float32", "float32": "float32",
    "varchar": "str", "boolean": "bool", "bool": "bool",
    "timestamp": "timestamp",
    "timestamp with time zone": "timestamp",
    "date": "date", "blob": "bytes", "hugeint": "hugeint",
}


def _norm_type(name: str, table: dict) -> str:
    s = str(name).strip().lower()
    if s.startswith("decimal"):
        return "decimal"
    if s.startswith("array") or s.endswith("[]") or s.startswith("list"):
        return "list"
    for prefix in ("struct", "map"):
        if s.startswith(prefix):
            return prefix
    return table.get(s, s)


def typed_columns(cols_types, table: dict) -> list:
    return sorted(
        (c.lower(), _norm_type(t, table)) for c, t in cols_types
    )


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from oblate_spark.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    # a selection that matches nothing must FAIL, not vacuously print
    # ALL OK — a typo'd (or "--only"-prefixed, or comma-joined) name
    # otherwise reports success for a query that never ran. Checked
    # BEFORE the SparkSession boots so the rejection is instant.
    unknown = only - set(qs)
    if unknown:
        raise SystemExit(
            f"unknown query name(s): {sorted(unknown)} — pass bare "
            "space-separated names from queries()"
        )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    # no \r stage-progress bars interleaving with result lines: one
    # greppable `ok|FAIL` line per query on stdout (round-5 verdict #6)
    spark = get_spark(
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stypes = sdf.dtypes
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        spark_s = time.time() - t0

        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check) [{spark_s:.1f}s]")
            continue

        try:
            rel = con.sql(oracles[name])
            ocols = [c for c in rel.columns]
            otypes = list(zip(ocols, rel.types))
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue

        problems = []
        if len(srows) != len(orows):
            problems.append(f"row count {len(srows)} vs {len(orows)}")
        st = typed_columns(stypes, _SPARK_TYPES)
        ot = typed_columns(otypes, _DUCK_TYPES)
        if st != ot:
            problems.append(f"typed columns {st} vs {ot}")
        if not problems:
            cs, co = canonical(srows, scols), canonical(orows, ocols)
            if cs != co:
                problems.append("value hash mismatch")
                for a, b in zip(cs.split("\n"), co.split("\n")):
                    if a != b:
                        problems.append(f"  first diff:\n   spark: {a!r}\n   duck : {b!r}")
                        break
        if problems:
            print(f"FAIL  {name}: {'; '.join(p for p in problems)}")
            failures += 1
        else:
            h = hashlib.md5(canonical(srows, scols).encode()).hexdigest()[:10]
            print(f"ok    {name}: {len(srows)} rows hash={h} [{spark_s:.1f}s]")

    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
