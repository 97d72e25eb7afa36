"""Full-query A/B for trussness(rounds=4): current implementation vs a
variant with (a) single-shuffle array h-index and (b) no tri repartition
on the broadcast path. Verifies identical [src,dst,trussness] output.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/truss_ab2.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from llama_spark.entry_queries import load_edges
from llama_spark.graph import DST, SRC
from llama_spark.operators.truss import _canonical, trussness
from llama_spark.session import get_spark


def trussness_v1(
    edges: DataFrame,
    rounds: int | None = None,
    max_iter: int = 50,
    repart_tri: bool = False,
    h_mode: str = "array",
) -> DataFrame:
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    from pyspark.sql import Window

    e = _canonical(edges).repartition(p, SRC).persist(StorageLevel.MEMORY_AND_DISK)
    m_edges = e.count()
    small_t = m_edges <= 2_000_000

    def _side(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small_t else df

    a, b, c = e.alias("a"), e.alias("b"), e.alias("c")
    tri = (
        a.join(b, F.col("a.dst") == F.col("b.src"))
        .join(c, (F.col("c.src") == F.col("a.src")) & (F.col("c.dst") == F.col("b.dst")))
        .select(F.col("a.src").alias("u"), F.col("a.dst").alias("v"), F.col("b.dst").alias("w"))
    )
    if repart_tri or not small_t:
        tri = tri.repartition(p, "u")
    tri = tri.persist(StorageLevel.MEMORY_AND_DISK)
    n_tri = tri.count()

    supp = (
        tri.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias(SRC), F.col("v").alias(DST)),
                    F.struct(F.col("v").alias(SRC), F.col("w").alias(DST)),
                    F.struct(F.col("u").alias(SRC), F.col("w").alias(DST)),
                )
            ).alias("s")
        )
        .select("s.src", "s.dst")
        .groupBy(SRC, DST)
        .agg(F.count("*").alias("t"))
    )
    t = (
        e.join(supp, [SRC, DST], "left")
        .select(SRC, DST, F.coalesce("t", F.lit(0)).cast("long").alias("t"))
        .localCheckpoint(eager=True)
    )
    if n_tri == 0:
        e.unpersist()
        tri.unpersist()
        return t.select(SRC, DST, (F.col("t") + F.lit(2)).alias("trussness"))

    w = Window.partitionBy(SRC, DST).orderBy(F.desc("level"))
    limit = rounds if rounds is not None else max_iter
    prev_cached = None
    for _i in range(limit):
        t1 = t.select(F.col(SRC).alias("u"), F.col(DST).alias("v"), F.col("t").alias("_t1"))
        t2 = t.select(F.col(SRC).alias("v"), F.col(DST).alias("w"), F.col("t").alias("_t2"))
        t3 = t.select(F.col(SRC).alias("u"), F.col(DST).alias("w"), F.col("t").alias("_t3"))
        offers = (
            tri.join(_side(t1), ["u", "v"])
            .join(_side(t2), ["v", "w"])
            .join(_side(t3), ["u", "w"])
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("u").alias(SRC), F.col("v").alias(DST), F.least("_t2", "_t3").alias("level")),
                        F.struct(F.col("v").alias(SRC), F.col("w").alias(DST), F.least("_t1", "_t3").alias("level")),
                        F.struct(F.col("u").alias(SRC), F.col("w").alias(DST), F.least("_t1", "_t2").alias("level")),
                    )
                ).alias("o")
            )
            .select("o.src", "o.dst", "o.level")
        )
        if h_mode == "array":
            hi = (
                offers.groupBy(SRC, DST)
                .agg(F.reverse(F.array_sort(F.collect_list("level"))).alias("ls"))
                .select(
                    SRC,
                    DST,
                    F.aggregate(
                        F.zip_with(
                            "ls",
                            F.sequence(F.lit(1), F.size("ls")).cast("array<long>"),
                            lambda l, i: F.least(l, i),
                        ),
                        F.lit(0).cast("long"),
                        lambda acc, x: F.greatest(acc, x),
                    ).alias("h"),
                )
            )
        else:
            hi = (
                offers.groupBy(SRC, DST, "level")
                .agg(F.count("*").alias("cnt"))
                .withColumn("cum", F.sum("cnt").over(w))
                .groupBy(SRC, DST)
                .agg(F.max(F.least(F.col("level"), F.col("cum"))).alias("h"))
            )
        new_t = (
            t.join(_side(hi), [SRC, DST], "left")
            .select(
                SRC,
                DST,
                F.least(F.col("t"), F.coalesce("h", F.col("t"))).cast("long").alias("t"),
                (F.coalesce("h", F.col("t")) < F.col("t")).alias("_changed"),
            )
        )
        if _i % 4 == 3:
            new_t = new_t.localCheckpoint(eager=True)
            held = None
        else:
            new_t = new_t.persist(StorageLevel.MEMORY_AND_DISK)
            held = new_t
        changed = int(new_t.agg(F.sum(F.col("_changed").cast("long"))).collect()[0][0] or 0)
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = held
        t = new_t.select(SRC, DST, "t")
        if changed == 0:
            break

    e.unpersist()
    tri.unpersist()
    if prev_cached is not None:
        t = t.localCheckpoint(eager=True)
        prev_cached.unpersist()
    return t.select(SRC, DST, (F.col("t") + F.lit(2)).alias("trussness"))


def trussness_v2(
    edges: DataFrame,
    rounds: int | None = None,
    max_iter: int = 50,
    h_mode: str = "window",
) -> DataFrame:
    """Like v1 but the three per-round value-vector joins share ONE
    structurally identical broadcast build side (t scanned bare; the
    rename to _t1/_t2/_t3 happens ABOVE each join) so AQE can reuse the
    broadcast exchange instead of building it three times."""
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    from pyspark.sql import Window

    e = _canonical(edges).repartition(p, SRC).persist(StorageLevel.MEMORY_AND_DISK)
    m_edges = e.count()
    small_t = m_edges <= 2_000_000

    def _side(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small_t else df

    a, b, c = e.alias("a"), e.alias("b"), e.alias("c")
    tri = (
        a.join(b, F.col("a.dst") == F.col("b.src"))
        .join(c, (F.col("c.src") == F.col("a.src")) & (F.col("c.dst") == F.col("b.dst")))
        .select(F.col("a.src").alias("u"), F.col("a.dst").alias("v"), F.col("b.dst").alias("w"))
    )
    if not small_t:
        tri = tri.repartition(p, "u")
    tri = tri.persist(StorageLevel.MEMORY_AND_DISK)
    n_tri = tri.count()

    supp = (
        tri.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias(SRC), F.col("v").alias(DST)),
                    F.struct(F.col("v").alias(SRC), F.col("w").alias(DST)),
                    F.struct(F.col("u").alias(SRC), F.col("w").alias(DST)),
                )
            ).alias("s")
        )
        .select("s.src", "s.dst")
        .groupBy(SRC, DST)
        .agg(F.count("*").alias("t"))
    )
    t = (
        e.join(supp, [SRC, DST], "left")
        .select(SRC, DST, F.coalesce("t", F.lit(0)).cast("long").alias("t"))
        .localCheckpoint(eager=True)
    )
    if n_tri == 0:
        e.unpersist()
        tri.unpersist()
        return t.select(SRC, DST, (F.col("t") + F.lit(2)).alias("trussness"))

    w = Window.partitionBy(SRC, DST).orderBy(F.desc("level"))
    limit = rounds if rounds is not None else max_iter
    prev_cached = None
    for _i in range(limit):
        b1, b2, b3 = t.alias("_s1"), t.alias("_s2"), t.alias("_s3")
        j3 = (
            tri.join(
                _side(b1),
                (F.col("u") == F.col("_s1.src")) & (F.col("v") == F.col("_s1.dst")),
            )
            .select("u", "v", "w", F.col("_s1.t").alias("_t1"))
            .join(
                _side(b2),
                (F.col("v") == F.col("_s2.src")) & (F.col("w") == F.col("_s2.dst")),
            )
            .select("u", "v", "w", "_t1", F.col("_s2.t").alias("_t2"))
            .join(
                _side(b3),
                (F.col("u") == F.col("_s3.src")) & (F.col("w") == F.col("_s3.dst")),
            )
            .select("u", "v", "w", "_t1", "_t2", F.col("_s3.t").alias("_t3"))
        )
        offers = (
            j3.select(
                F.explode(
                    F.array(
                        F.struct(F.col("u").alias(SRC), F.col("v").alias(DST), F.least("_t2", "_t3").alias("level")),
                        F.struct(F.col("v").alias(SRC), F.col("w").alias(DST), F.least("_t1", "_t3").alias("level")),
                        F.struct(F.col("u").alias(SRC), F.col("w").alias(DST), F.least("_t1", "_t2").alias("level")),
                    )
                ).alias("o")
            )
            .select("o.src", "o.dst", "o.level")
        )
        if h_mode == "array":
            hi = (
                offers.groupBy(SRC, DST)
                .agg(F.reverse(F.array_sort(F.collect_list("level"))).alias("ls"))
                .select(
                    SRC,
                    DST,
                    F.aggregate(
                        F.zip_with(
                            "ls",
                            F.sequence(F.lit(1), F.size("ls")).cast("array<long>"),
                            lambda l, i: F.least(l, i),
                        ),
                        F.lit(0).cast("long"),
                        lambda acc, x: F.greatest(acc, x),
                    ).alias("h"),
                )
            )
        else:
            hi = (
                offers.groupBy(SRC, DST, "level")
                .agg(F.count("*").alias("cnt"))
                .withColumn("cum", F.sum("cnt").over(w))
                .groupBy(SRC, DST)
                .agg(F.max(F.least(F.col("level"), F.col("cum"))).alias("h"))
            )
        new_t = (
            t.join(_side(hi), [SRC, DST], "left")
            .select(
                SRC,
                DST,
                F.least(F.col("t"), F.coalesce("h", F.col("t"))).cast("long").alias("t"),
                (F.coalesce("h", F.col("t")) < F.col("t")).alias("_changed"),
            )
        )
        if _i % 4 == 3:
            new_t = new_t.localCheckpoint(eager=True)
            held = None
        else:
            new_t = new_t.persist(StorageLevel.MEMORY_AND_DISK)
            held = new_t
        changed = int(new_t.agg(F.sum(F.col("_changed").cast("long"))).collect()[0][0] or 0)
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = held
        t = new_t.select(SRC, DST, "t")
        if changed == 0:
            break

    e.unpersist()
    tri.unpersist()
    if prev_cached is not None:
        t = t.localCheckpoint(eager=True)
        prev_cached.unpersist()
    return t.select(SRC, DST, (F.col("t") + F.lit(2)).alias("trussness"))


def _tri_sorted_degree(e, p, small_t):
    """Triangle table [u<v<w] enumerated with DEGREE orientation (skew-safe,
    fewer wedges) then re-sorted per triple — identical content to the
    id-oriented enumeration."""
    from llama_spark.operators.triangles import oriented_edges

    o = oriented_edges(e, orient="degree")
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e1.src") == F.col("e3.src")) & (F.col("e2.dst") == F.col("e3.dst")),
            "left_semi",
        )
        .select(
            F.array_sort(
                F.array(F.col("e1.src"), F.col("e1.dst"), F.col("e2.dst"))
            ).alias("tr")
        )
        .select(
            F.col("tr")[0].alias("u"), F.col("tr")[1].alias("v"), F.col("tr")[2].alias("w")
        )
    )
    if not small_t:
        tri = tri.repartition(p, "u")
    return tri


def trussness_v3(edges, rounds=None, max_iter=50, h_mode="window"):
    """v2 (shared broadcast build side) + degree-oriented enumeration."""
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    from pyspark.sql import Window

    e = _canonical(edges).repartition(p, SRC).persist(StorageLevel.MEMORY_AND_DISK)
    m_edges = e.count()
    small_t = m_edges <= 2_000_000

    def _side(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small_t else df

    tri = _tri_sorted_degree(e, p, small_t).persist(StorageLevel.MEMORY_AND_DISK)
    n_tri = tri.count()

    supp = (
        tri.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias(SRC), F.col("v").alias(DST)),
                    F.struct(F.col("v").alias(SRC), F.col("w").alias(DST)),
                    F.struct(F.col("u").alias(SRC), F.col("w").alias(DST)),
                )
            ).alias("s")
        )
        .select("s.src", "s.dst")
        .groupBy(SRC, DST)
        .agg(F.count("*").alias("t"))
    )
    t = (
        e.join(supp, [SRC, DST], "left")
        .select(SRC, DST, F.coalesce("t", F.lit(0)).cast("long").alias("t"))
        .localCheckpoint(eager=True)
    )
    if n_tri == 0:
        e.unpersist()
        tri.unpersist()
        return t.select(SRC, DST, (F.col("t") + F.lit(2)).alias("trussness"))

    w = Window.partitionBy(SRC, DST).orderBy(F.desc("level"))
    limit = rounds if rounds is not None else max_iter
    prev_cached = None
    for _i in range(limit):
        b1, b2, b3 = t.alias("_s1"), t.alias("_s2"), t.alias("_s3")
        j3 = (
            tri.join(
                _side(b1),
                (F.col("u") == F.col("_s1.src")) & (F.col("v") == F.col("_s1.dst")),
            )
            .select("u", "v", "w", F.col("_s1.t").alias("_t1"))
            .join(
                _side(b2),
                (F.col("v") == F.col("_s2.src")) & (F.col("w") == F.col("_s2.dst")),
            )
            .select("u", "v", "w", "_t1", F.col("_s2.t").alias("_t2"))
            .join(
                _side(b3),
                (F.col("u") == F.col("_s3.src")) & (F.col("w") == F.col("_s3.dst")),
            )
            .select("u", "v", "w", "_t1", "_t2", F.col("_s3.t").alias("_t3"))
        )
        offers = (
            j3.select(
                F.explode(
                    F.array(
                        F.struct(F.col("u").alias(SRC), F.col("v").alias(DST), F.least("_t2", "_t3").alias("level")),
                        F.struct(F.col("v").alias(SRC), F.col("w").alias(DST), F.least("_t1", "_t3").alias("level")),
                        F.struct(F.col("u").alias(SRC), F.col("w").alias(DST), F.least("_t1", "_t2").alias("level")),
                    )
                ).alias("o")
            )
            .select("o.src", "o.dst", "o.level")
        )
        if h_mode == "array":
            hi = (
                offers.groupBy(SRC, DST)
                .agg(F.reverse(F.array_sort(F.collect_list("level"))).alias("ls"))
                .select(
                    SRC,
                    DST,
                    F.aggregate(
                        F.zip_with(
                            "ls",
                            F.sequence(F.lit(1), F.size("ls")).cast("array<long>"),
                            lambda l, i: F.least(l, i),
                        ),
                        F.lit(0).cast("long"),
                        lambda acc, x: F.greatest(acc, x),
                    ).alias("h"),
                )
            )
        else:
            hi = (
                offers.groupBy(SRC, DST, "level")
                .agg(F.count("*").alias("cnt"))
                .withColumn("cum", F.sum("cnt").over(w))
                .groupBy(SRC, DST)
                .agg(F.max(F.least(F.col("level"), F.col("cum"))).alias("h"))
            )
        new_t = (
            t.join(_side(hi), [SRC, DST], "left")
            .select(
                SRC,
                DST,
                F.least(F.col("t"), F.coalesce("h", F.col("t"))).cast("long").alias("t"),
                (F.coalesce("h", F.col("t")) < F.col("t")).alias("_changed"),
            )
        )
        if _i % 4 == 3:
            new_t = new_t.localCheckpoint(eager=True)
            held = None
        else:
            new_t = new_t.persist(StorageLevel.MEMORY_AND_DISK)
            held = new_t
        changed = int(new_t.agg(F.sum(F.col("_changed").cast("long"))).collect()[0][0] or 0)
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = held
        t = new_t.select(SRC, DST, "t")
        if changed == 0:
            break

    e.unpersist()
    tri.unpersist()
    if prev_cached is not None:
        t = t.localCheckpoint(eager=True)
        prev_cached.unpersist()
    return t.select(SRC, DST, (F.col("t") + F.lit(2)).alias("trussness"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "one":
        only = sys.argv[2]
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    else:
        reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark(app_name="truss_ab2", cores=cpus, shuffle_partitions=cpus)
    edges = load_edges(spark, sf_dir)

    variants = [
        ("current", lambda: trussness(edges, rounds=4)),
        ("v1_array_norepart", lambda: trussness_v1(edges, rounds=4)),
        ("v1_window_norepart", lambda: trussness_v1(edges, rounds=4, h_mode="window")),
        ("v2_shared_bcast_window", lambda: trussness_v2(edges, rounds=4)),
        ("v2_shared_bcast_array", lambda: trussness_v2(edges, rounds=4, h_mode="array")),
    ]
    if only is not None:
        variants = [v for v in variants if v[0] == only]
    for _ in range(reps):
        for name, fn in variants:
            t0 = time.time()
            n = fn().count()
            print(
                f"{name}: rows={n} sec={time.time()-t0:.2f} "
                f"load={open('/proc/loadavg').read().split()[0]}",
                flush=True,
            )

    if only is not None:
        spark.stop()
        return
    # exact output equality: current vs each variant
    da = trussness(edges, rounds=4)
    for name, fn in [("v1", lambda: trussness_v1(edges, rounds=4)),
                     ("v2", lambda: trussness_v2(edges, rounds=4)),
                     ("v2a", lambda: trussness_v2(edges, rounds=4, h_mode="array"))]:
        db = fn()
        diff = (
            da.withColumnRenamed("trussness", "ta")
            .join(db.withColumnRenamed("trussness", "tb"), [SRC, DST], "full")
            .filter(
                F.col("ta").isNull() | F.col("tb").isNull() | (F.col("ta") != F.col("tb"))
            )
            .count()
        )
        print(f"diff_rows_{name}={diff}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

# single-variant mode: python scripts/truss_ab2.py one <name> <reps>
