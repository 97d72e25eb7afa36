"""Frozen-state A/B for the coreness delta-filter crossover (round-5 ask).

Whole-run A/B comparisons are unusable on this shared box (r4: 125-vs-340
then 175-vs-258 with order reversed), so this uses the method round 4
settled on: build the h-index iteration to a frozen tail state (small
`changed` set over a huge edge table), then time SINGLE rounds of each
variant — full recompute vs delta-filtered — interleaved N times from the
SAME frozen state, and compare minima. Both variants' output states are
verified identical (count + changed count) every repetition.

The round body mirrors operators/kcore.py::coreness exactly (same joins,
same window, same hints); any drift there invalidates the number, so keep
them in sync.

Usage: python scripts/coreness_ab.py [scale] [reps] [freeze_at]
  scale     R-MAT scale (default 24 → ~134M directed edges before dedup)
  reps      timed repetitions per variant (default 5)
  freeze_at freeze once 0 < changed <= this (default 100_000)

Prints one JSON line; paste the ruling into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    freeze_at = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from llama_spark.session import get_spark
    from llama_spark.sources.pages import rmat_endpoints

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="coreness_ab", cores=cores, shuffle_partitions=cores)

    def gen(it):
        for pdf in it:
            idx = pdf["id"].to_numpy()
            src, dst = rmat_endpoints(idx, scale, seed=42)
            yield pd.DataFrame({"src": src, "dst": dst})

    n_edges = (1 << scale) * 8
    edges = (
        spark.range(0, n_edges, numPartitions=cores * 4)
        .mapInPandas(gen, schema="src long, dst long")
        .filter("src <> dst")
    )
    und = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition(cores, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    m = und.count()
    print(f"# und rows: {m}", file=sys.stderr)

    c = (
        und.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    n = c.count()
    max_deg = int(c.agg(F.max("c")).collect()[0][0] or 0)
    w = Window.partitionBy("id").orderBy(F.desc("value"))

    def round_plan(cur, changed_ids=None):
        joined = cur.hint("shuffle_hash").join(und, cur["id"] == und["src"])
        if changed_ids is not None:
            aff = (
                und.join(
                    F.broadcast(changed_ids.withColumnRenamed("id", "src")),
                    "src",
                    "left_semi",
                )
                .select(F.col("dst").alias("dst"))
                .distinct()
            )
            joined = joined.join(F.broadcast(aff), "dst", "left_semi")
        hi = (
            joined.groupBy(F.col("dst").alias("id"), F.col("c").alias("value"))
            .agg(F.count("*").alias("cnt"))
            .withColumn("cum", F.sum("cnt").over(w))
            .groupBy("id")
            .agg(F.max(F.least(F.col("value"), F.col("cum"))).alias("h"))
        )
        return (
            cur.select("id", F.col("c").alias("c_old"))
            .join(hi, "id", "left")
            .select(
                "id",
                F.coalesce("h", "c_old").cast("long").alias("c"),
                (F.col("h").isNotNull() & (F.col("h") != F.col("c_old"))).alias(
                    "changed"
                ),
            )
        )

    # ---- build phase: full rounds until the tail regime, then freeze ----
    changed_ids = None
    changed = -1
    rounds = 0
    while True:
        new_c = round_plan(c).localCheckpoint(eager=True)
        changed = new_c.filter("changed").count()
        changed_ids = new_c.filter("changed").select("id").localCheckpoint(eager=True)
        c = new_c.select("id", "c").localCheckpoint(eager=True)
        rounds += 1
        print(f"# build round {rounds}: changed={changed}", file=sys.stderr)
        if changed == 0:
            print("# converged before reaching the freeze window", file=sys.stderr)
            break
        if changed <= freeze_at:
            break
    frozen_changed = changed

    # ---- timing phase: interleaved single rounds from the frozen state ----
    runs = {"full": [], "delta": []}
    loads = {"full": [], "delta": []}
    checks = {"full": set(), "delta": set()}
    for rep in range(reps):
        for variant in ("full", "delta"):
            ids = changed_ids if variant == "delta" else None
            spark.sparkContext._jvm.System.gc()
            loads[variant].append(loadavg())
            t0 = time.time()
            out = round_plan(c, ids).localCheckpoint(eager=True)
            runs[variant].append(round(time.time() - t0, 3))
            # identical-output check: the delta round must flip exactly the
            # rows the full round flips (h only moves where a neighbor moved)
            checks[variant].add(
                (out.count(), out.filter("changed").count())
            )

    result = {
        "scale": scale,
        "und_rows": m,
        "n_nodes": n,
        "max_deg": max_deg,
        "build_rounds": rounds,
        "frozen_changed": frozen_changed,
        "reps": reps,
        "runs_full": runs["full"],
        "runs_delta": runs["delta"],
        "loadavg_full": loads["full"],
        "loadavg_delta": loads["delta"],
        "min_full": min(runs["full"]),
        "min_delta": min(runs["delta"]),
        "outputs_identical": checks["full"] == checks["delta"]
        and len(checks["full"]) == 1,
        "guard_would_engage": m >= 5_000_000
        and 0 < frozen_changed <= min(100_000, max(1, n // 4))
        and frozen_changed * max(1, max_deg) <= 4_000_000,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
