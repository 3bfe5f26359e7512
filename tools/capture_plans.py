#!/usr/bin/env python
"""Capture .explain("formatted") for a list of queries into a directory.

Usage:
  python tools/capture_plans.py OUTDIR SUFFIX name [name ...]
  PYTHONPATH=/tmp/r16code python tools/capture_plans.py plans/r17 before X169 ...

Writes OUTDIR/<name>_<SUFFIX>.txt. The repo root on sys.path decides
WHICH code version plans — point PYTHONPATH at a git-archive export of
the pre-change tree to capture the "before" side.
"""

from __future__ import annotations

import os
import sys

# respect an explicit PYTHONPATH (before-tree capture); fall back to the
# repo this file sits in
if not os.environ.get("PYTHONPATH"):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from swivel_spark_prep_spark.session import get_session
    from swivel_spark_prep_spark.plans import formatted_plan
    from swivel_spark_prep_spark.cache import release_persisted
    from __spark_entry__ import queries

    spark = get_session(
        "capture-plans", master="local[8]", conf={"spark.driver.memory": "8g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qmap = queries()
    for pat in names:
        matches = [n for n in sorted(qmap) if n.startswith(pat)]
        if not matches:
            print(f"!! no query matches {pat}", file=sys.stderr)
            continue
        for n in matches:
            try:
                df = qmap[n](spark, SF_DIR)
                text = formatted_plan(df)
            except Exception as e:
                text = f"ERROR: {type(e).__name__}: {e}"
            finally:
                release_persisted()
            path = os.path.join(outdir, f"{n}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(text)
            print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
