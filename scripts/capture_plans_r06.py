"""Capture .explain("formatted") for the operators touched in round 6.

Checkpointed results hide the computation plan (Scan ExistingRDD), so:
- one-shot operators are captured whole with DataFrame.localCheckpoint
  patched to identity (the driver-side logic still runs at sf0.001);
- iterative kernels are captured as ONE STEP of their round plan,
  constructed exactly as the operator's loop builds it (the claims are
  about the per-round join strategy / exchange count, which one step
  shows; loops with observe-probed eager checkpoints cannot run under
  an identity checkpoint at all).

Usage: python scripts/capture_plans_r06.py <suffix>   # before|after
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
    out_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR", "plans/r06")
    os.makedirs(out_dir, exist_ok=True)

    # identity localCheckpoint for the ONE-SHOT captures (instances are
    # pyspark.sql.classic.dataframe.DataFrame — patch the concrete class)
    try:
        import pyspark.sql.classic.dataframe as _cdf

        _real_ckpt = _cdf.DataFrame.localCheckpoint
        _cdf.DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore[assignment]
    except ImportError:
        _real_ckpt = None

    from llama_spark.entry_queries import load_edges
    from llama_spark.session import get_spark

    spark = get_spark(app_name="capture_plans", cores=8, shuffle_partitions=8)
    edges = load_edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()

    def cap(name: str, df: DataFrame, note: str) -> None:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"{out_dir}/{name}_{suffix}_plan.txt", "w") as f:
            f.write(f"# {name} [{suffix}] — {note}\n")
            f.write(f"# captured at {sf_dir}, one-shot ops under identity localCheckpoint\n")
            f.write(buf.getvalue())
        print("captured", name, flush=True)

    # ---- one-shot / fixed-round operators, captured whole ----
    from llama_spark.operators.triangles import burt_constraint

    cap("burt_constraint", burt_constraint(edges),
        "full plan of the id->constraint computation")

    from llama_spark.operators.truss import trussness

    cap("trussness1", trussness(edges, rounds=1),
        "one h-index round over the persisted triangle table "
        "(the bench row runs 4 identical rounds)")

    from llama_spark.operators.spectral import fiedler_vector

    cap("fiedler_iter", fiedler_vector(edges, max_iter=1),
        "one deflated power step (the bench rows run 10/16)")

    from llama_spark.operators.wl import wl_kernel

    b = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    cap("wl_kernel2", wl_kernel(edges, b, rounds=2),
        "per-round histogram joins over the color chain")

    # ---- iterative kernels: one step of the round plan ----
    from llama_spark.graph import drop_self_loops, nodes_of, symmetrize

    p = 8
    n = nodes_of(edges).count()
    tiny = n <= 100_000

    def _hint_cur(df: DataFrame) -> DataFrame:
        # the post-change policy; the pre-change trees ignore this helper
        return F.broadcast(df) if tiny else df.hint("shuffle_hash")

    # sssp / bfs one step, exactly as sssp.step builds it in THIS tree
    import inspect

    from llama_spark.operators import traversal as trav_mod

    rel = edges.select("src", "dst", F.lit(1.0).alias("w")).repartition(p, "src")
    nodes = nodes_of(edges)
    dists = nodes.select(
        "id",
        F.when(F.col("id") == 0, F.lit(0.0)).otherwise(F.lit(None).cast("double")).alias("dist"),
        (F.col("id") == 0).alias("changed"),
    )
    frontier = dists.filter(F.col("changed")).select("id", "dist")
    uses_hint = "_hint(frontier)" in inspect.getsource(trav_mod.sssp)
    fr = _hint_cur(frontier) if uses_hint else frontier
    cand = (
        fr.join(rel, frontier["id"] == rel["src"])
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
    )
    cnd = _hint_cur(cand) if uses_hint else cand
    step_df = dists.join(cnd, "id", "left").select(
        "id", F.coalesce("cand", "dist").alias("dist")
    )
    cap("sssp_step", step_df,
        f"one sssp/bfs relaxation round (hint policy present: {uses_hint})")

    # bfs_forest one step
    from llama_spark.operators import bridges as br_mod

    und = symmetrize(edges).repartition(p, "src")
    state = nodes.select(
        "id", F.col("id").alias("comp"), F.lit(0).cast("long").alias("depth"),
        F.lit(True).alias("changed"),
    )
    f_uses_hint = "_hint(frontier)" in inspect.getsource(br_mod.bfs_forest)
    frontier2 = state.filter(F.col("changed")).select("id", "comp", "depth")
    fr2 = _hint_cur(frontier2) if f_uses_hint else frontier2
    cand2 = (
        fr2.join(und, frontier2["id"] == und["src"])
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min(F.struct(F.col("comp"), (F.col("depth") + 1).alias("depth"))).alias("c"))
    )
    cnd2 = _hint_cur(cand2) if f_uses_hint else cand2
    step2 = state.join(cnd2, "id", "left").select(
        "id",
        F.coalesce(F.col("c.comp"), F.col("comp")).alias("comp"),
        F.coalesce(F.col("c.depth"), F.col("depth")).alias("depth"),
    )
    cap("bfs_forest_step", step2,
        f"one fused CC+BFS forest round (hint policy present: {f_uses_hint})")

    # attack_5pct dominant phase: one hash-min CC round over survivors
    e = drop_self_loops(edges.select("src", "dst")).distinct()
    udeg = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .groupBy("id").agg(F.count("*").alias("ud"))
    )
    removed = (
        nodes.join(udeg, "id", "left")
        .orderBy(F.desc("ud"), F.asc("id")).limit(20).select("id")
    )
    kept = (
        e.join(removed.withColumnRenamed("id", "src"), "src", "left_anti")
        .join(removed.withColumnRenamed("id", "dst"), "dst", "left_anti")
    )
    from llama_spark.operators import percolation as perc_mod

    materialized = "localCheckpoint" in inspect.getsource(perc_mod._survivor_census)
    if materialized and _real_ckpt is not None:
        kept = _real_ckpt(kept, eager=True)
    sund = symmetrize(kept)
    labels = nodes_of(kept).select("id", F.col("id").alias("component"))
    nmin = (
        labels.join(sund, labels["id"] == sund["src"])
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("component").alias("nmin"))
    )
    ccstep = labels.join(nmin, "id", "left").select(
        "id", F.least("component", F.coalesce("nmin", "component")).alias("component")
    )
    cap("attack_cc_step", ccstep,
        "one hash-min CC round over the survivor edge set "
        f"(survivors materialized before CC: {materialized})")

    spark.stop()


if __name__ == "__main__":
    main()
