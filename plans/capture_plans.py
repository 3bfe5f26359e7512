#!/usr/bin/env python
"""Capture .explain('formatted') for named queries into plans/r16/.

Usage: python plans/capture_plans.py <suffix> [name ...]
  suffix: 'before' or 'after' (file name suffix)
  names:  query names or prefixes (default: every declared query)

Explain-only — no job runs, so this is safe to run alongside other
work; the captured plan is the pre-execution AQE plan, the same shape
the _before files in this directory hold.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r16")


def main() -> None:
    suffix = sys.argv[1]
    sel = sys.argv[2:]
    from swivel_spark_prep_spark.session import get_session
    from __spark_entry__ import queries

    spark = get_session(
        "plan-capture", master="local[4]", conf={"spark.driver.memory": "8g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qmap = queries()
    names = (
        [n for n in qmap if any(n.startswith(s) for s in sel)]
        if sel
        else [n for n in qmap if n.startswith("Q")]
    )
    from swivel_spark_prep_spark.cache import release_persisted

    for name in sorted(names):
        df = qmap[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        release_persisted()
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
