"""A/B: hits_result vs a variant that persists the per-iteration auth
vector (it is referenced by both the hub half-step's broadcast build and
the state materialization — lazy, each reference re-computes the V-row
join). Caching changes no arithmetic; outputs must be bit-identical.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/hits_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from llama_spark.graph import DST, SRC, materialize, nodes_of
from llama_spark.operators.hits import hits
from llama_spark.plans.fixpoint import FixpointResult


def hits_v1(edges: DataFrame, max_iter: int = 8, num_partitions: int | None = None) -> DataFrame:
    spark = edges.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    nodes = nodes_of(edges).repartition(p, "id").persist(StorageLevel.MEMORY_AND_DISK)
    n = nodes.count()
    e = edges.select(SRC, DST).distinct()
    e_src = e.repartition(p, SRC).persist(StorageLevel.MEMORY_AND_DISK)
    e_dst = e.repartition(p, DST).persist(StorageLevel.MEMORY_AND_DISK)
    e_src.count()
    e_dst.count()
    tiny_state = n <= 100_000

    def _hint(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if tiny_state else df.hint("shuffle_hash")

    state = materialize(
        nodes.select("id", F.lit(1.0 / n).alias("auth"), F.lit(1.0 / n).alias("hub"))
    )
    scratch: list[DataFrame] = []
    for _i in range(max_iter):
        a_raw = (
            e_src.join(_hint(state.select(F.col("id").alias(SRC), "hub")), SRC)
            .groupBy(F.col(DST).alias("id"))
            .agg(F.sum("hub").alias("ar"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        a_tot = a_raw.agg(F.sum("ar").alias("at"))
        auth = (
            nodes.join(a_raw, "id", "left")
            .crossJoin(F.broadcast(a_tot))
            .select("id", (F.coalesce("ar", F.lit(0.0)) / F.col("at")).alias("auth"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        h_raw = (
            e_dst.join(_hint(auth.select(F.col("id").alias(DST), "auth")), DST)
            .groupBy(F.col(SRC).alias("id"))
            .agg(F.sum("auth").alias("hr"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        h_tot = h_raw.agg(F.sum("hr").alias("ht"))
        prev = state
        state = materialize(
            auth.join(h_raw, "id", "left")
            .crossJoin(F.broadcast(h_tot))
            .select("id", "auth", (F.coalesce("hr", F.lit(0.0)) / F.col("ht")).alias("hub"))
        )
        prev.unpersist()
        for df in scratch:
            df.unpersist()
        scratch = [a_raw, auth, h_raw]
    for df in scratch:
        df.unpersist()
    e_src.unpersist()
    e_dst.unpersist()
    nodes.unpersist()
    return state


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from llama_spark.entry_queries import load_edges
    from llama_spark.session import get_spark

    spark = get_spark(app_name="hits_ab", cores=cpus, shuffle_partitions=cpus)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    edges = load_edges(spark, sf_dir)

    hits(edges, max_iter=8).count()  # warm-up

    def run(name, fn):
        sc.setJobGroup(name, name)
        t0 = time.time()
        fn().count()
        wall = time.time() - t0
        sc.setJobGroup("o", "o")
        jobs = tracker.getJobIdsForGroup(name)
        ns = nt = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji:
                for s in ji.stageIds:
                    si = tracker.getStageInfo(s)
                    if si:
                        ns += 1
                        nt += si.numTasks
        print(
            f"{name}: jobs={len(jobs)} stages={ns} tasks={nt} sec={wall:.2f} "
            f"load={open('/proc/loadavg').read().split()[0]}",
            flush=True,
        )

    for rep in range(2):
        run(f"cur{rep}", lambda: hits(edges, max_iter=8))
        run(f"v1_{rep}", lambda: hits_v1(edges, max_iter=8))

    da = hits(edges, max_iter=8)
    db = hits_v1(edges, max_iter=8)
    diff = (
        da.select("id", F.col("auth").alias("a1"), F.col("hub").alias("h1"))
        .join(db.select("id", F.col("auth").alias("a2"), F.col("hub").alias("h2")), "id", "full")
        .filter(
            (F.col("a1") != F.col("a2")) | (F.col("h1") != F.col("h2"))
            | F.col("a1").isNull() | F.col("a2").isNull()
        )
        .count()
    )
    print(f"diff_rows={diff}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
