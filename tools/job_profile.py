#!/usr/bin/env python
"""Per-operator job/stage/task census — the round-17 per-stage breakdown
(round-16 verdict Next #3: "build the per-stage breakdown first").

For every registered query (or a filtered subset) this runs the plan once
to a noop sink under a unique job group and reports:

- n_jobs: Spark jobs the operator submits end-to-end (each job is one
  driver->scheduler round-trip: the per-op scheduling floor multiplies
  with this count, so a mid-band op at 6 jobs pays ~6x the constant of a
  1-job op regardless of data size);
- n_stages / n_tasks: scheduling volume behind those jobs;
- wall_s: single noop-sink wall (indicative only — this tool is for
  STRUCTURE; timing adjudication stays with bench.py).

Driver-side actions embedded in operator construction (bounded_distinct
collects, persist materializations, checkpoint materializations) all
surface as extra jobs here, which is exactly what we want to count.

Usage: python tools/job_profile.py [substr ...]  (env: SPARK_GRAFT_SF_DIR)
Writes tools/job_profile.json {name: {jobs, stages, tasks, wall_s, rows}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ONLY = [a for a in sys.argv[1:] if not a.startswith("-")]


def main() -> None:
    from swivel_spark_prep_spark.session import get_session
    from swivel_spark_prep_spark.cache import release_persisted
    from __spark_entry__ import queries

    spark = get_session(
        "job-profile", master=f"local[{CPUS}]", conf={"spark.driver.memory": "24g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    qmap = queries()
    if ONLY:
        qmap = {k: v for k, v in qmap.items() if any(s in k for s in ONLY)}
    # warm the session so the first profiled op doesn't absorb startup
    next(iter(qmap.values()))(spark, SF_DIR).count()

    out: dict[str, dict] = {}
    for name, fn in sorted(qmap.items()):
        spark.catalog.clearCache()
        group = f"prof-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            err = None
        except Exception as e:  # keep the census going
            wall = time.perf_counter() - t0
            err = f"{type(e).__name__}: {e}"[:120]
        finally:
            sc.setJobGroup(None, None)
        release_persisted()
        jobs = tracker.getJobIdsForGroup(group)
        n_stages = n_tasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        out[name] = {
            "jobs": len(jobs),
            "stages": n_stages,
            "tasks": n_tasks,
            "wall_s": round(wall, 3),
        }
        if err:
            out[name]["err"] = err
        print(
            f"# {name}: jobs={len(jobs)} stages={n_stages} "
            f"tasks={n_tasks} wall={wall:.2f}s",
            file=sys.stderr,
        )

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "job_profile.json")
    with open(path, "w") as fh:
        json.dump({"sf_dir": SF_DIR, "cpus": int(CPUS), "ops": out}, fh, indent=1)
        fh.write("\n")
    tot_jobs = sum(v["jobs"] for v in out.values())
    print(
        json.dumps(
            {
                "n_ops": len(out),
                "total_jobs": tot_jobs,
                "mean_jobs_per_op": round(tot_jobs / max(1, len(out)), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
