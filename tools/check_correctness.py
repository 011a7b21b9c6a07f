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
    """Order-insensitive canonical form: sort columns by name, stringify
    cells, sort rows."""
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
        return repr(v)
    return str(v)


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from oblate_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
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
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue

        problems = []
        if len(srows) != len(orows):
            problems.append(f"row count {len(srows)} vs {len(orows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            problems.append(f"columns {sorted(scols)} vs {sorted(ocols)}")
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
