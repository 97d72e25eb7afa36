"""Bow-tie decomposition of a directed web graph (Broder et al.,
"Graph structure in the Web", WWW 2000) — THE structural census of a
link graph: every node is classified relative to the largest strongly
connected component (the CORE of the bow tie):

    CORE          — member of the largest SCC (ties broken by smallest
                    SCC label, i.e. smallest min-member id),
    IN            — reaches the CORE but is not in it,
    OUT           — reachable from the CORE but not in it,
    TENDRIL       — in the CORE's weakly connected component but in none
                    of the above (Broder's TENDRILS and TUBES folded
                    together — the classes that hang off IN/OUT without
                    touching the CORE),
    DISCONNECTED  — in a different weakly connected component entirely.

Reference parity: the reference engine ships the building blocks
(tarjan_scc benchmark/benchmarks/tarjan_scc.h, bfs_count bfs.h) but not
the composed census; this operator is the composition a web-graph user
runs them for.

Scale shape: because the CORE is strongly connected, reachability
from/to the ENTIRE core equals reachability from/to any single member —
so the expensive-looking "BFS from a giant seed set" collapses to two
single-root BFS waves from the core's canonical (min-id) member: one
over the forward edges, one over the reversed edges. Total cost is one
SCC run + one hash-min CC run + two BFS fixpoints, all existing
skew-audited kernels; the classification itself is three left joins and
a CASE over the V-row label table. No step is new shuffle machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC


def bowtie_decomposition(
    edges: DataFrame,
    max_iter: int = 100,
) -> DataFrame:
    """DataFrame[id, region] — region ∈ {CORE, IN, OUT, TENDRIL,
    DISCONNECTED} relative to the largest SCC (see module docstring)."""
    from .components import connected_components
    from .scc import strongly_connected_components
    from .traversal import bfs_depths

    # WCC depends on nothing else — start it concurrently with the SCC
    # phase itself (plans/overlap.py rationale); the two BFS waves need
    # the SCC core pick first, so they overlap each other once it lands.
    # Every kernel returns a materialized (checkpointed) frame, so the
    # work happens inside the threads and the combining plan below is
    # unchanged.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        wcc_fut = pool.submit(lambda: connected_components(edges))
        scc = strongly_connected_components(edges).persist()
        # largest SCC, ties → smallest label; 1-row driver pick (allowed)
        core_row = (
            scc.groupBy("scc")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("scc"))
            .limit(1)
            .collect()
        )[0]
        core_label = int(core_row["scc"])  # min member id ⇒ a CORE node itself

        rev_edges = edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        fwd_fut = pool.submit(
            lambda: bfs_depths(edges, root=core_label, max_iter=max_iter)
        )
        bwd_fut = pool.submit(
            lambda: bfs_depths(rev_edges, root=core_label, max_iter=max_iter)
        )
        fwd_raw, bwd_raw, wcc = fwd_fut.result(), bwd_fut.result(), wcc_fut.result()
    fwd = fwd_raw.filter(F.col("depth").isNotNull()).select(
        F.col("id"), F.lit(True).alias("_fwd")
    )
    bwd = bwd_raw.filter(F.col("depth").isNotNull()).select(
        F.col("id"), F.lit(True).alias("_bwd")
    )
    core_wcc = wcc.filter(F.col("id") == core_label).select(
        F.col("component").alias("_core_wcc")
    )

    out = (
        scc.join(fwd, "id", "left")
        .join(bwd, "id", "left")
        .join(wcc, "id")
        .crossJoin(F.broadcast(core_wcc))
        .select(
            "id",
            F.when(F.col("scc") == F.lit(core_label), F.lit("CORE"))
            .when(F.col("_bwd"), F.lit("IN"))
            .when(F.col("_fwd"), F.lit("OUT"))
            .when(F.col("component") == F.col("_core_wcc"), F.lit("TENDRIL"))
            .otherwise(F.lit("DISCONNECTED"))
            .alias("region"),
        )
    )
    out = out.localCheckpoint(eager=True)
    scc.unpersist()
    return out


def bowtie_census(edges: DataFrame, max_iter: int = 100) -> DataFrame:
    """DataFrame[region, n_nodes, share] — the headline table from the
    Broder et al. paper (region sizes and fractions), derived from
    :func:`bowtie_decomposition`; share rounded to 6 dp."""
    lab = bowtie_decomposition(edges, max_iter=max_iter)
    tot = lab.count()
    return (
        lab.groupBy("region")
        .agg(F.count("*").alias("n_nodes"))
        .select(
            "region",
            "n_nodes",
            F.round(F.col("n_nodes") / F.lit(float(tot)), 6).alias("share"),
        )
        .orderBy("region")
    )
