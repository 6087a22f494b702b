"""Dump .explain("formatted") for declared queries to plans/r16/ (env-overridable).

Usage:
    python tools/opt_plans.py before [query ...]   # plans/r16/<q>_before.txt
    python tools/opt_plans.py after  [query ...]   # plans/r16/<q>_after.txt

With no query names, dumps every queries() entry. Mirrors bench.py's
environment contract ($SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS via
session.get_spark) and its index pre-build so the probe queries plan against
the same persisted indexes the bench times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from mcp_synaptic_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    assert suffix in ("before", "after"), suffix
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r16"))
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("opt-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    if names:
        qs = {k: qs[k] for k in names}
    # same pre-build as bench.py so index probes plan against real dirs
    entrymod._ivf_index(spark, sf_dir)
    entrymod._ivf_append_index(spark, sf_dir)
    entrymod._mllib_lsh_index(spark, sf_dir)
    entrymod._bm25_index(spark, sf_dir)

    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # plan capture must not abort the sweep
            text = f"EXPLAIN FAILED: {e!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"{name}: {len(text)} bytes")


if __name__ == "__main__":
    main()
