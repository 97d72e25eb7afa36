"""Weisfeiler-Lehman color refinement (1-WL) — structural node hashing.

The 1-dimensional Weisfeiler-Lehman algorithm (Weisfeiler & Lehman 1968;
the graph-kernel form of Shervashidze et al., JMLR 2011) iteratively
refines a node coloring: each round, a node's new color is a hash of its
previous color together with the *multiset* of its neighbors' colors.
After r rounds two nodes share a color only if their r-hop unfolding
trees are isomorphic — the standard cheap structural signature for
isomorphism screening, graph-kernel features, and GNN expressiveness
analysis (1-WL is exactly the power of message-passing GNNs,
Xu et al. 2019). On a directed web graph we refine on the in-multiset
and out-multiset separately (strictly more discriminative than the
undirected form and the natural fit for link graphs).

Reference tie-in: consumes only the out-/in-edge iteration surface of
the reference's CSR (llama/ll_mlcsr_graph.h out_iter/in_iter); WL itself
is a beyond-reference structural addition.

Scale design: the textbook WL concatenates each node's SORTED neighbor
color list — a hub-degree single-task sort, the exact skew trap
adjacency_index/graphlet code here avoids. Instead the neighbor multiset
is folded into a commutative integer signature

    (count, Σ h_a(color), Σ h_b(color))  mod nothing — exact BIGINTs,

where h_a/h_b are two independent 32-bit md5 lanes (sums of ≤ 2^31
values of < 2^32 fit BIGINT exactly). Equal multisets give equal
signatures always; unequal multisets collide with probability ~2^-64
per comparison (two independent 32-bit sums), and any collision merely
*coarsens* the refinement — never a wrong split, the safe direction.
Each round is therefore two map-side-combinable groupBys + one join:
hub-safe, shuffle-minimal, and engine-portable (the same md5 lanes
reproduce in any SQL engine — no engine-private hash).

Round-0 color seeds with the (in-degree, out-degree) pair, so round r
captures degree-refined r-hop structure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import DST, SRC, drop_self_loops, nodes_of


def _lane(col: Column, lo: int) -> Column:
    """32-bit integer lane of an md5-hex color: hex digits [lo, lo+8)."""
    return F.conv(F.substring(col, lo, 8), 16, 10).cast("long")


def _color_rounds(edges: DataFrame, rounds: int) -> list[DataFrame]:
    """[colors_0, ..., colors_rounds] — the 1-WL color frame
    DataFrame[id, color] after each refinement round, every frame
    eagerly checkpointed. One incremental chain: round h's colors are
    refined from round h-1's, so materializing all intermediate rounds
    costs exactly ``rounds`` refinement passes (re-running the chain
    from scratch per h, as the kernel formerly did, costs
    rounds·(rounds+1)/2 passes plus a setup per call)."""
    e = drop_self_loops(edges.select(SRC, DST)).dropDuplicates([SRC, DST])
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    nodes = nodes_of(e)

    dout = e.groupBy(F.col(SRC).alias("id")).agg(F.count("*").alias("dout"))
    din = e.groupBy(F.col(DST).alias("id")).agg(F.count("*").alias("din"))
    colors = (
        nodes.join(din, "id", "left")
        .join(dout, "id", "left")
        .select(
            "id",
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit("wl0"),
                    F.coalesce(F.col("din"), F.lit(0)).cast("string"),
                    F.coalesce(F.col("dout"), F.lit(0)).cast("string"),
                )
            ).alias("color"),
        )
    )

    out = [colors.localCheckpoint(eager=True)]
    for _ in range(rounds):
        colors = out[-1]
        h = colors.select(
            "id",
            _lane(F.col("color"), 1).alias("ha"),
            _lane(F.col("color"), 9).alias("hb"),
        )
        # in-multiset signature of v = fold of colors of {u : u -> v}
        insig = (
            e.join(h.withColumnRenamed("id", SRC), SRC)
            .groupBy(F.col(DST).alias("id"))
            .agg(
                F.count("*").alias("ic"),
                F.sum("ha").alias("ia"),
                F.sum("hb").alias("ib"),
            )
        )
        outsig = (
            e.join(h.withColumnRenamed("id", DST), DST)
            .groupBy(F.col(SRC).alias("id"))
            .agg(
                F.count("*").alias("oc"),
                F.sum("ha").alias("oa"),
                F.sum("hb").alias("ob"),
            )
        )
        out.append(
            colors.join(insig, "id", "left")
            .join(outsig, "id", "left")
            .select(
                "id",
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("color"),
                        *[
                            F.coalesce(F.col(x), F.lit(0)).cast("string")
                            for x in ("ic", "ia", "ib", "oc", "oa", "ob")
                        ],
                    )
                ).alias("color"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return out


def wl_colors(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """DataFrame[id, color, class_size] after ``rounds`` of 1-WL.

    ``color`` is a 32-hex md5 string; ``class_size`` the number of nodes
    sharing it. Deterministic, engine-portable (md5 + exact BIGINT
    sums + decimal string casts only).
    """
    colors = _color_rounds(edges, rounds)[-1]
    sizes = colors.groupBy("color").agg(F.count("*").alias("class_size"))
    return colors.join(sizes, "color").select("id", "color", "class_size")


def wl_kernel(
    edges_a: DataFrame, edges_b: DataFrame, rounds: int = 2
) -> DataFrame:
    """Weisfeiler-Lehman subtree kernel → DataFrame[round, k].

    Published frame: Shervashidze, Schweitzer, van Leeuwen, Mehlhorn &
    Borgwardt, "Weisfeiler-Lehman graph kernels" (JMLR 2011) — the
    round-h feature map φ_h(G) is the histogram of WL colors after h
    refinement rounds, and the subtree kernel is

        k(G, G') = Σ_{h=0..R} ⟨ φ_h(G), φ_h(G') ⟩

    Colors here are the structural md5 signatures of ``wl_colors`` —
    id-free, so identical local structure gets identical color in BOTH
    graphs (the cross-graph comparability the kernel needs). Each
    round's inner product is an exact-BIGINT Σ cnt_a·cnt_b over the
    color-histogram equi-join. Returns one row per round h = 0..rounds
    (the caller sums ``k`` for the total kernel value).

    Spark plan: ONE incremental refinement chain per graph
    (``_color_rounds`` — rounds passes instead of rounds·(rounds+1)/2
    chain restarts), the two chains overlapped from driver threads
    (plans/overlap.py — they are independent); per round, two histogram
    groupBys (map-side combined, ≤ #color-classes rows) + one
    broadcast-or-shuffle join on the color key.
    """
    from ..plans.overlap import run_concurrent

    ca, cb = run_concurrent(
        lambda: _color_rounds(edges_a, rounds),
        lambda: _color_rounds(edges_b, rounds),
    )
    out = None
    for h in range(rounds + 1):
        ha = ca[h].groupBy("color").agg(F.count(F.lit(1)).alias("na"))
        hb = cb[h].groupBy("color").agg(F.count(F.lit(1)).alias("nb"))
        k = ha.join(hb, "color").agg(
            F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0))
            .cast("long")
            .alias("k")
        ).select(F.lit(h).cast("long").alias("round"), "k")
        out = k if out is None else out.unionAll(k)
    return out
