"""Noise-free comparison of trussness variants: count Spark jobs, stages
and tasks per variant via job groups (statusTracker). Barrier/stage counts
are load-independent — the clean decision signal on a contended box.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/truss_jobcount.py
"""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llama_spark.entry_queries import load_edges
from llama_spark.operators.truss import trussness
from llama_spark.session import get_spark

_spec = importlib.util.spec_from_file_location(
    "truss_ab2", os.path.join(os.path.dirname(os.path.abspath(__file__)), "truss_ab2.py")
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(app_name="truss_jobcount", cores=cpus, shuffle_partitions=cpus)
    sc = spark.sparkContext
    edges = load_edges(spark, sf_dir)

    variants = {
        "cur": lambda: trussness(edges, rounds=4),
        "v1a": lambda: _mod.trussness_v1(edges, rounds=4),
        "v2w": lambda: _mod.trussness_v2(edges, rounds=4),
        "v2a": lambda: _mod.trussness_v2(edges, rounds=4, h_mode="array"),
        "v3w": lambda: _mod.trussness_v3(edges, rounds=4),
    }
    tracker = sc.statusTracker()
    for name, fn in variants.items():
        sc.setJobGroup(name, name)
        fn().count()
        sc.setJobGroup("other", "other")
        jobs = tracker.getJobIdsForGroup(name)
        n_stages = 0
        n_tasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        print(f"{name}: jobs={len(jobs)} stages={n_stages} tasks={n_tasks}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
