"""Local clustering coefficient + neighborhood-overlap link prediction.

Reference context: LLAMA's triangle kernels (benchmark/benchmarks/
triangle_counting.h:155-336) compute the global count; the per-node
clustering coefficient is the standard composition of the same
per-corner triangle credit with the undirected degree
(C(v) = 2·T(v) / d(v)·(d(v)-1)), and neighborhood-overlap scores
(common neighbors / Jaccard / Adamic-Adar / preferential attachment)
are the canonical wedge self-join over the same sorted adjacency the
intersection kernels walk (triangle_counting.h:481-567).

Spark plans — all JVM-side, no UDFs:

* ``local_clustering``: reuses ``triangles_per_node`` (degree-oriented
  wedge join — hubs never enumerate their own D² wedges) + one und
  degree aggregate, left-joined over the node set.
* ``link_prediction_scores``: wedges a–z–b (a<b, a≠b) built from the
  undirected adjacency grouped per *center* z, scored per (a, b) with
  one aggregation, adjacency anti-joined away. A hub center z emits
  O(d(z)²) wedge rows — the documented skew control is ``hub_cap``
  (drop centers with d(z) > cap, exactly the df-cap strategy of the
  n-gram joiner in functions/dedup.py); the oracle gate runs uncapped
  so Spark and DuckDB see identical pair sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import DST, SRC, drop_self_loops, symmetrize, undirected_double
from .triangles import triangles_per_node


def _und_degrees(edges: DataFrame) -> DataFrame:
    """DataFrame[id, deg] — distinct-neighbor (undirected) degree."""
    und = drop_self_loops(undirected_double(edges)).distinct()
    return und.groupBy(F.col(SRC).alias("id")).agg(F.count("*").alias("deg"))


def local_clustering(edges: DataFrame, orient: str = "degree") -> DataFrame:
    """DataFrame[id, triangles, degree, coefficient] for every node.

    coefficient = 2·T(v) / (d(v)·(d(v)-1)), 0.0 where d(v) < 2; rounded
    to 6 dp (cross-engine float-noise policy, see entry_queries module
    docstring).
    """
    deg = _und_degrees(edges)
    tri = triangles_per_node(edges, orient=orient)
    return (
        deg.join(tri, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
            F.col("deg").cast("long").alias("degree"),
            F.round(
                F.when(
                    F.col("deg") >= 2,
                    2.0
                    * F.coalesce(F.col("triangles"), F.lit(0))
                    / (F.col("deg") * (F.col("deg") - F.lit(1))),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("coefficient"),
        )
    )


def link_prediction_scores(
    edges: DataFrame,
    top_k: int | None = None,
    hub_cap: int | None = None,
) -> DataFrame:
    """Score non-adjacent node pairs by neighborhood overlap.

    Returns DataFrame[a, b, common, jaccard, adamic_adar, pref_attach]
    with a < b, (a, b) NOT an edge, common ≥ 1; floats rounded to 6 dp.

    * common        — |Γ(a) ∩ Γ(b)|
    * jaccard       — |Γ(a) ∩ Γ(b)| / |Γ(a) ∪ Γ(b)|
    * adamic_adar   — Σ_{z ∈ Γ(a)∩Γ(b)} 1 / ln d(z)
    * pref_attach   — d(a)·d(b)

    ``top_k`` keeps the k best pairs by (adamic_adar desc, a, b) — a
    deterministic total order. ``hub_cap`` drops wedge *centers* with
    d(z) > cap before the self-join: on a power-law graph the hub
    centers contribute near-zero Adamic-Adar weight (1/ln d) but O(d²)
    wedge rows, so capping trades negligible score mass for the removal
    of the quadratic term — same recall argument as the hot-shingle
    df-cap in ngram_jaccard_pairs. The oracle gate runs uncapped.
    """
    und = (
        drop_self_loops(undirected_double(edges))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = und.groupBy(F.col(SRC).alias("id")).agg(F.count("*").alias("deg"))

    # adjacency annotated with the center's degree (the wedge weight)
    adj = und.join(
        deg.withColumnRenamed("id", SRC).withColumnRenamed("deg", "zdeg"), SRC
    )
    if hub_cap is not None:
        adj = adj.filter(F.col("zdeg") <= hub_cap)

    l, r = adj.alias("l"), adj.alias("r")
    wedges = (
        l.join(r, F.col("l.src") == F.col("r.src"))
        .filter(F.col("l.dst") < F.col("r.dst"))
        .select(
            F.col("l.dst").alias("a"),
            F.col("r.dst").alias("b"),
            F.col("l.zdeg").alias("zdeg"),
        )
    )
    scored = wedges.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("common"),
        F.sum(1.0 / F.log(F.col("zdeg").cast("double"))).alias("aa_raw"),
    )
    # drop pairs that are already edges (link prediction scores candidates)
    non_edges = scored.join(
        und,
        (scored["a"] == und[SRC]) & (scored["b"] == und[DST]),
        "left_anti",
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("db"))
    out = (
        non_edges.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common",
            F.round(
                F.col("common") / (F.col("da") + F.col("db") - F.col("common")), 6
            ).alias("jaccard"),
            F.round(F.col("aa_raw"), 6).alias("adamic_adar"),
            (F.col("da") * F.col("db")).cast("long").alias("pref_attach"),
        )
    )
    if top_k is not None:
        out = out.orderBy(
            F.desc("adamic_adar"), F.asc("a"), F.asc("b")
        ).limit(top_k)
    return out


def cocitation_pairs(
    edges: DataFrame,
    mode: str = "cocitation",
    top_k: int | None = 25,
    hub_cap: int | None = None,
) -> DataFrame:
    """Directed co-citation / bibliographic coupling — the two classic
    web-link-graph projections (Small 1973; Kessler 1963) the reference's
    directed edge lists support but never name:

    * ``mode="cocitation"``: strength(a, b) = #{w : w→a AND w→b} — pages
      CITED TOGETHER (pivot at the citing page w). The bipartite
      projection of the (source × target) incidence onto targets.
    * ``mode="coupling"``: strength(a, b) = #{w : a→w AND b→w} — pages
      CITING the same targets (pivot at the cited page w); the projection
      onto sources.

    Returns DataFrame[a, b, strength] with a < b, ordered (strength desc,
    a, b), ``top_k`` rows (None = all pairs).

    Plan: one self-equi-join of the deduped directed edge table on the
    pivot column with (a < b), then a pair groupBy — exactly the wedge
    join class of ``link_prediction_scores``/``four_cycle_count``, so the
    same skew law applies: a pivot of degree d emits C(d, 2) pair rows.
    ``hub_cap`` drops pivots with out-fan > cap (co-citation by a hub
    directory page carries no signal anyway — the standard df-cap
    argument of functions/dedup.py's n-gram joiner); capped strengths are
    documented lower bounds. The oracle gate runs uncapped. Exact BIGINT
    counts end-to-end; no floats anywhere.
    """
    if mode not in ("cocitation", "coupling"):
        raise ValueError(f"mode must be cocitation|coupling, got {mode!r}")
    pivot, leaf = (SRC, DST) if mode == "cocitation" else (DST, SRC)
    e = (
        drop_self_loops(edges.select(SRC, DST))
        .dropDuplicates([SRC, DST])
        .select(F.col(pivot).alias("_w"), F.col(leaf).alias("_x"))
    )
    if hub_cap is not None:
        fan = e.groupBy("_w").agg(F.count("*").alias("_d"))
        e = e.join(
            fan.filter(F.col("_d") <= hub_cap).select("_w"), "_w", "left_semi"
        )
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(b, (F.col("a._w") == F.col("b._w")) & (F.col("a._x") < F.col("b._x")))
        .groupBy(F.col("a._x").alias("a"), F.col("b._x").alias("b"))
        .agg(F.count("*").cast("long").alias("strength"))
    )
    if top_k is not None:
        pairs = pairs.orderBy(F.desc("strength"), F.asc("a"), F.asc("b")).limit(top_k)
    return pairs


def friend_recommendations(
    edges: DataFrame,
    top_k: int = 2,
    hub_cap: int | None = None,
) -> DataFrame:
    """People-you-may-know — DataFrame[id, candidate, common, rank]: for
    each node, the ``top_k`` NON-neighbors ranked by common UNDIRECTED
    neighbors (count DESC, candidate ASC). The triadic-closure product
    query (Facebook PYMK, LinkedIn "people also viewed"): candidates come
    from the wedge join, existing edges leave via an anti-join — the
    piece that separates this from plain link-prediction scoring.

    Plan: symmetrized wedge self-join pivoting on the middle node (same
    skew law as cocitation: a pivot of degree d emits d(d−1) ordered
    pairs; ``hub_cap`` drops directory-page pivots), a pair groupBy, a
    LEFT ANTI join against the edge set, then a per-node top-k window
    bounded by the node's 2-hop candidate count. Exact integer counts."""
    und = symmetrize(edges)
    if hub_cap is not None:
        deg = und.groupBy(F.col(SRC).alias("_p")).agg(F.count("*").alias("_d"))
        small = deg.filter(F.col("_d") <= hub_cap).select("_p")
        und_piv = und.join(
            small.withColumnRenamed("_p", SRC), SRC, "left_semi"
        )
    else:
        und_piv = und
    a = und_piv.select(F.col(SRC).alias("w"), F.col(DST).alias("id"))
    b = und_piv.select(F.col(SRC).alias("w"), F.col(DST).alias("candidate"))
    pairs = (
        a.join(b, "w")
        .filter(F.col("id") != F.col("candidate"))
        .groupBy("id", "candidate")
        .agg(F.count("*").cast("long").alias("common"))
    )
    non_edges = pairs.join(
        und.select(F.col(SRC).alias("id"), F.col(DST).alias("candidate")),
        ["id", "candidate"],
        "left_anti",
    )
    w = Window.partitionBy("id").orderBy(F.desc("common"), F.asc("candidate"))
    return (
        non_edges.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select("id", "candidate", "common", "rank")
    )


def scan_statistic(edges: DataFrame) -> DataFrame:
    """DataFrame[id, degree, triangles, scan_stat, ego_density] — Priebe's
    scan statistic Γ(v): the edge count of the induced CLOSED 1-hop
    neighborhood, the standard local-anomaly signal for link graphs
    (a node whose neighborhood is abnormally dense ⇒ spam farm / clique).

    Γ(v) = d(v) + T(v): the d(v) spokes plus one edge per triangle at v
    (every neighbor-neighbor edge closes a triangle through v).
    ego_density = Γ(v) / C(d(v)+1, 2), 0.0 for isolated-ish d(v) = 0.

    Reuses the degree-oriented triangle kernel — the hub never enumerates
    its own D² wedges, so the statistic is skew-safe at web scale.
    """
    deg = _und_degrees(edges)
    tri = triangles_per_node(edges, orient="degree")
    t = F.coalesce(F.col("triangles"), F.lit(0))
    gamma = F.col("deg") + t
    possible = (F.col("deg") + F.lit(1)) * F.col("deg") / F.lit(2.0)
    return deg.join(tri, "id", "left").select(
        "id",
        F.col("deg").cast("long").alias("degree"),
        t.cast("long").alias("triangles"),
        gamma.cast("long").alias("scan_stat"),
        F.round(
            F.when(F.col("deg") >= 1, gamma / possible).otherwise(F.lit(0.0)), 6
        ).alias("ego_density"),
    )


def weighted_clustering(
    edges: DataFrame, weight_col: str = "weight"
) -> DataFrame:
    """DataFrame[id, degree, w_clustering] — Onnela et al. (2005) weighted
    local clustering: C_w(v) = (2 / d(v)(d(v)−1)) Σ_{△(v,j,k)}
    (ŵ_vj · ŵ_vk · ŵ_jk)^{1/3}, with ŵ = w / max w over the graph and the
    undirected weight of a pair = max over the two directions (the same
    symmetric-max convention weighted_k_core uses). 0.0 where d(v) < 2;
    rounded 6 dp.

    Plan: one ordered weighted edge set, degree-oriented like the triangle
    kernel (hubs wedge at their low-degree neighbors), closed by an equi-
    join carrying all three pair weights; per-corner cbrt-product credits
    aggregated in a single pass. JVM-only expressions.
    """
    undw = (
        drop_self_loops(
            edges.select(
                F.least(SRC, DST).alias(SRC),
                F.greatest(SRC, DST).alias(DST),
                F.col(weight_col).alias("w"),
            )
        )
        .groupBy(SRC, DST)
        .agg(F.max("w").alias("w"))
    )
    deg = (
        undw.select(F.col(SRC).alias("id"))
        .unionAll(undw.select(F.col(DST).alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    wmax = undw.agg(F.max("w")).collect()[0][0]  # 1-row aggregate
    if wmax is None:
        return deg.select(
            "id",
            F.col("deg").cast("long").alias("degree"),
            F.lit(0.0).alias("w_clustering"),
        )
    # orient low-(deg, id) endpoint first, weight rides along
    da, db = deg.alias("da"), deg.alias("db")
    u = undw.join(da, undw[SRC] == F.col("da.id")).join(
        db, undw[DST] == F.col("db.id")
    )
    lo_first = (F.col("da.deg") < F.col("db.deg")) | (
        (F.col("da.deg") == F.col("db.deg")) & (undw[SRC] < undw[DST])
    )
    e = (
        u.select(
            F.when(lo_first, undw[SRC]).otherwise(undw[DST]).alias(SRC),
            F.when(lo_first, undw[DST]).otherwise(undw[SRC]).alias(DST),
            (undw["w"] / F.lit(float(wmax))).alias("w"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tris = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e1.src") == F.col("e3.src"))
            & (F.col("e2.dst") == F.col("e3.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
            F.cbrt(F.col("e1.w") * F.col("e2.w") * F.col("e3.w")).alias("term"),
        )
    )
    credits = tris.select(
        F.explode(F.array("a", "b", "c")).alias("id"), "term"
    )
    sums = credits.groupBy("id").agg(F.sum("term").alias("s"))
    out = (
        deg.join(sums, "id", "left")
        .select(
            "id",
            F.col("deg").cast("long").alias("degree"),
            F.round(
                F.when(
                    F.col("deg") >= 2,
                    F.lit(2.0)
                    * F.coalesce(F.col("s"), F.lit(0.0))
                    / (F.col("deg") * (F.col("deg") - F.lit(1))),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("w_clustering"),
        )
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    deg.unpersist()
    return out


def orbit_counts(edges: DataFrame) -> DataFrame:
    """3-node graphlet degree vector → DataFrame[id, orbit0..orbit3].

    Published frame: Pržulj, "Biological network comparison using graphlet
    degree distribution" (Bioinformatics 2007) — per-node counts of the
    automorphism orbits of the two 3-node graphlets:

        orbit0  degree (the 2-node graphlet end)
        orbit1  END of an open wedge (v–u–w, w ∉ N(v))
        orbit2  CENTER of an open wedge
        orbit3  triangle corner

    All four are exact BIGINT compositions of the degree table and the
    audited per-corner triangle counts — no new joins beyond one
    neighbor-degree aggregation:

        orbit2 = C(d(v), 2) − t(v)
        orbit1 = Σ_{u∈N(v)} (d(u) − 1) − 2·t(v)

    (each triangle at v closes one wedge centered at v and two wedges
    ending at v). At 100 TB this adds ONE E-row join against the V-row
    degree vector on top of the triangle kernel — the assortativity plan.
    """
    und = symmetrize(edges).persist(StorageLevel.MEMORY_AND_DISK)
    deg = und.groupBy(F.col(SRC).alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    tri = triangles_per_node(edges)
    # Σ_{u ∈ N(v)} (deg(u) − 1), keyed at v
    nsum = (
        und.join(
            deg.select(F.col("id").alias(DST), F.col("deg").alias("du")),
            DST,
        )
        .groupBy(F.col(SRC).alias("id"))
        .agg(F.sum(F.col("du") - 1).alias("s"))
    )
    out = (
        deg.join(tri, "id", "left")
        .join(nsum, "id", "left")
        .select(
            "id",
            F.col("deg").cast("long").alias("orbit0"),
            (
                F.coalesce("s", F.lit(0))
                - 2 * F.coalesce("triangles", F.lit(0))
            ).cast("long").alias("orbit1"),
            (
                F.col("deg") * (F.col("deg") - 1) / 2
                - F.coalesce("triangles", F.lit(0))
            ).cast("long").alias("orbit2"),
            F.coalesce("triangles", F.lit(0)).cast("long").alias("orbit3"),
        )
    )
    und.unpersist()
    return out


def edge_dispersion(edges: DataFrame, max_common: int | None = None) -> DataFrame:
    """Backstrom-Kleinberg dispersion per edge →
    DataFrame[src, dst, n_common, dispersion].

    Published frame: Backstrom & Kleinberg, "Romantic Partnerships and
    the Dispersion of Social Ties" (CSCW 2014) — embeddedness (many
    common neighbors) is the WRONG partner detector; dispersion — common
    neighbors of (u,v) that are themselves far apart — is the right one.
    This is the paper's base instantiation with distance function
    d(s,t) = 1{s,t not directly linked}:

        disp(u,v) = #{ {s,t} ⊆ CN(u,v) : (s,t) ∉ E }
                  = C(|CN(u,v)|, 2) − #{CN pairs that are edges}

    The subtracted term is the per-edge K4 count, so no CN×CN pair set
    is ever materialized: candidates flow cn(u,v,s) ⋈ E(s,t) — the
    degree-bounded triangle-join cost envelope — then a semi-join back
    against cn(u,v,t). Exact BIGINT throughout.

    ``max_common``: on DENSE subgraphs (embeddedness in the hundreds) the
    per-edge CN sets — and the K4 join fed by them — grow as Σ|CN(e)|;
    the production knob is the house cap pattern (hub_cap /
    max_bucket_size precedent): keep only the ``max_common`` smallest
    common-neighbor ids per edge (deterministic truncation, a bounded
    rank window per edge — |CN| ≤ min-degree rows, never a hub sort) and
    compute the dispersion of the truncated ego view. The oracle gate
    runs uncapped; the sf0.1 bench row (``edge_dispersion_sparse``) also
    runs uncapped, on the mod-65536 lineitem projection (65k nodes, mean
    degree ~17 — the operator's web-sparse habitat), so ``max_common``
    is currently exercised only by callers that opt in.
    """
    und = (
        drop_self_loops(edges.select(SRC, DST))
        .select(F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    adj = und.union(und.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))

    # common neighbors of each edge: s ∈ N(u) ∩ N(v), s ∉ {u, v}
    cn = (
        und.join(adj.select(F.col(SRC).alias("src"), F.col(DST).alias("s")), "src")
        .filter(F.col("s") != F.col(DST))
        .join(
            adj.select(F.col(SRC).alias("dst"), F.col(DST).alias("s")),
            ["dst", "s"],
            "left_semi",
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if max_common is not None:
        keep = Window.partitionBy(SRC, DST).orderBy(F.col("s").asc())
        capped = (
            cn.withColumn("rk", F.row_number().over(keep))
            .filter(F.col("rk") <= max_common)
            .drop("rk")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        cn.unpersist()
        cn = capped
    ncn = cn.groupBy(SRC, DST).agg(F.count(F.lit(1)).alias("n_common"))

    # CN pairs that are themselves edges = K4s containing (u, v)
    linked = (
        cn.join(
            und.select(F.col(SRC).alias("s"), F.col(DST).alias("t")), "s"
        )
        .join(
            cn.select(SRC, DST, F.col("s").alias("t")),
            [SRC, DST, "t"],
            "left_semi",
        )
        .groupBy(SRC, DST)
        .agg(F.count(F.lit(1)).alias("k4"))
    )

    out = (
        und.join(ncn, [SRC, DST], "left")
        .join(linked, [SRC, DST], "left")
        .select(
            SRC,
            DST,
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            (
                F.coalesce("n_common", F.lit(0))
                * (F.coalesce("n_common", F.lit(0)) - 1)
                / 2
                - F.coalesce("k4", F.lit(0))
            ).cast("long").alias("dispersion"),
        )
        .localCheckpoint(eager=True)
    )
    und.unpersist()
    cn.unpersist()
    return out
