"""Local mirror of the driver's correctness gate.

Runs every queries()[name] on Spark and its oracle_sql()[name] on DuckDB over
the same sf dir, normalizes (columns sorted by name, rows sorted, floats
rounded) and compares row counts + values. Usage:

    python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import datetime

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from mcp_synaptic_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except ImportError:
        pass
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    only = set(a for a in args if not a.startswith("/"))

    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            failures.append(name)
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            continue
        if len(sr) != len(orr):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(sr)} oracle={len(orr)}")
            continue
        if sr != orr:
            failures.append(name)
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diffs}")
            continue
        print(f"PASS {name}: rows={len(sr)}")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass" + (f"; FAILED: {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
