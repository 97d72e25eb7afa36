"""Full Holland–Leinhardt triad census (16 MAN classes) for a directed
simple graph — the standard social-network / web-graph motif census
("A Method for Detecting Structure in Sociometric Data", AJS 1970;
the per-class labels follow the statnet/igraph convention).

Every unordered node triple falls in exactly one of 16 classes named
M-A-N + orientation: 003, 012, 102, 021D, 021U, 021C, 111D, 111U,
030T, 030C, 201, 120D, 120U, 120C, 210, 300 (counts of Mutual /
Asymmetric / Null dyads, then Down/Up/Cyclic/Transitive orientation).

Scale shape (the classic Batagelj–Mrvar decomposition): only CONNECTED
triads are enumerated —

* path-skeleton triads: one wedge join over the linked-pair adjacency
  (two linked dyads sharing a center, third pair NOT linked), classified
  from the two dyad codes;
* triangle-skeleton triads: the canonical a<b<c linked-triangle join,
  classified from the three dyad codes;

and the three DISCONNECTED classes come from arithmetic, never
enumeration: for each linked dyad, the number of isolated third nodes is
(V−2) − |N(a)∪N(b)∖{a,b}| (inclusion–exclusion with the wedge-count
common-neighbor table), summed per dyad type → 012 / 102; 003 is
C(V,3) minus everything else. Total work is one wedge join + one
triangle join + degree/count aggregates — the same envelope as triangle
counting; nothing ever touches the O(V³) triple space.

Reference parity: the reference ships the wedge/triangle iterators this
builds on (triangle_counting.h common-neighbor iteration); the census is
the composed analysis those iterators exist for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import DST, SRC, drop_self_loops, nodes_of

TRIAD_TYPES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]


def triad_census(edges: DataFrame) -> DataFrame:
    """DataFrame[triad_type, n] — one row per MAN class (all 16, zero
    rows included), n = exact count of unordered node triples of that
    class. Nodes = endpoints of at least one edge (the graph's node
    set); self-loops dropped."""
    spark = edges.sparkSession
    e = drop_self_loops(edges.select(SRC, DST)).distinct()

    # canonical dyad table: pair a<b, fwd = a→b exists, rev = b→a exists
    dy = (
        e.select(
            F.least(SRC, DST).alias("a"),
            F.greatest(SRC, DST).alias("b"),
            (F.col(SRC) < F.col(DST)).alias("f"),
        )
        .groupBy("a", "b")
        .agg(F.max("f").alias("fwd"), F.max(~F.col("f")).alias("rev"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = nodes_of(e).count()

    # doubled adjacency: center m → linked other o with arc flags
    nb = dy.select(
        F.col("a").alias("m"), F.col("b").alias("o"),
        F.col("fwd").alias("mo"), F.col("rev").alias("om"),
    ).unionByName(
        dy.select(
            F.col("b").alias("m"), F.col("a").alias("o"),
            F.col("rev").alias("mo"), F.col("fwd").alias("om"),
        )
    )
    n1, n2 = nb.alias("n1"), nb.alias("n2")
    wedges = (
        n1.join(n2, (F.col("n1.m") == F.col("n2.m")) & (F.col("n1.o") < F.col("n2.o")))
        .select(
            F.col("n1.m").alias("m"),
            F.col("n1.o").alias("x"), F.col("n2.o").alias("y"),
            F.col("n1.mo").alias("mx"), F.col("n1.om").alias("xm"),
            F.col("n2.mo").alias("my"), F.col("n2.om").alias("ym"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # common-neighbor count per linked (x<y) pair — also closes triangles
    common = wedges.groupBy("x", "y").agg(F.count("*").alias("cn"))

    # ---- path-skeleton triads: wedge whose outer pair is NOT linked ----
    paths = wedges.join(
        dy.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
        "left_anti",
    )
    mx_m = F.col("mx") & F.col("xm")
    my_m = F.col("my") & F.col("ym")
    m_cnt = mx_m.cast("int") + my_m.cast("int")
    out_c = F.col("mx").cast("int") + F.col("my").cast("int")
    # with one mutual dyad, the asymmetric arc's direction relative to the
    # center (a mutual-pair member) decides D (into the pair) vs U (out)
    away = F.when(mx_m, F.col("my")).otherwise(F.col("mx"))
    path_type = (
        F.when(m_cnt == 2, F.lit("201"))
        .when(m_cnt == 1, F.when(away, F.lit("111U")).otherwise(F.lit("111D")))
        .when(out_c == 2, F.lit("021D"))
        .when(out_c == 0, F.lit("021U"))
        .otherwise(F.lit("021C"))
    )
    path_counts = paths.select(path_type.alias("triad_type")).groupBy(
        "triad_type"
    ).agg(F.count("*").alias("n"))

    # ---- triangle-skeleton triads: canonical a<b<c linked triangle ----
    ab, bc, ac = dy.alias("ab"), dy.alias("bc"), dy.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.b") == F.col("bc.a"))
        .join(
            ac,
            (F.col("ac.a") == F.col("ab.a")) & (F.col("ac.b") == F.col("bc.b")),
        )
        .select(
            F.col("ab.fwd").alias("abf"), F.col("ab.rev").alias("abr"),
            F.col("bc.fwd").alias("bcf"), F.col("bc.rev").alias("bcr"),
            F.col("ac.fwd").alias("acf"), F.col("ac.rev").alias("acr"),
        )
    )
    m_ab = F.col("abf") & F.col("abr")
    m_bc = F.col("bcf") & F.col("bcr")
    m_ac = F.col("acf") & F.col("acr")
    tm = m_ab.cast("int") + m_bc.cast("int") + m_ac.cast("int")
    # one mutual dyad → third node's arc directions to the pair members
    third_out = (
        F.when(m_ab, F.col("bcr").cast("int") + F.col("acr").cast("int"))  # third=c
        .when(m_bc, F.col("abf").cast("int") + F.col("acf").cast("int"))   # third=a
        .otherwise(F.col("abr").cast("int") + F.col("bcf").cast("int"))    # third=b
    )
    third_in = (
        F.when(m_ab, F.col("bcf").cast("int") + F.col("acf").cast("int"))
        .when(m_bc, F.col("abr").cast("int") + F.col("acr").cast("int"))
        .otherwise(F.col("abf").cast("int") + F.col("bcr").cast("int"))
    )
    # zero mutual dyads → per-node out-degrees inside the triad
    out_a = F.col("abf").cast("int") + F.col("acf").cast("int")
    out_b = F.col("abr").cast("int") + F.col("bcf").cast("int")
    out_c3 = F.col("bcr").cast("int") + F.col("acr").cast("int")
    tri_type = (
        F.when(tm == 3, F.lit("300"))
        .when(tm == 2, F.lit("210"))
        .when(
            tm == 1,
            F.when(third_out == 2, F.lit("120D"))
            .when(third_in == 2, F.lit("120U"))
            .otherwise(F.lit("120C")),
        )
        .otherwise(
            F.when(
                F.greatest(out_a, out_b, out_c3) == 2, F.lit("030T")
            ).otherwise(F.lit("030C"))
        )
    )
    tri_counts = tri.select(tri_type.alias("triad_type")).groupBy(
        "triad_type"
    ).agg(F.count("*").alias("n"))

    # ---- disconnected classes by arithmetic (never enumerated) ----
    udeg = nb.groupBy(F.col("m").alias("id")).agg(F.count("*").alias("ud"))
    dyx = (
        dy.join(udeg.withColumnRenamed("id", "a").withColumnRenamed("ud", "uda"), "a")
        .join(udeg.withColumnRenamed("id", "b").withColumnRenamed("ud", "udb"), "b")
        .join(common.withColumnRenamed("x", "a").withColumnRenamed("y", "b"), ["a", "b"], "left")
        .select(
            (F.col("fwd") & F.col("rev")).alias("is_m"),
            (
                F.lit(n_nodes - 2)
                - (F.col("uda") - 1)
                - (F.col("udb") - 1)
                + F.coalesce("cn", F.lit(0))
            ).alias("iso_third"),
        )
    )
    lone = dyx.agg(
        F.sum(F.when(F.col("is_m"), F.col("iso_third")).otherwise(0)).alias("n102"),
        F.sum(F.when(~F.col("is_m"), F.col("iso_third")).otherwise(0)).alias("n012"),
    ).collect()[0]
    n_102 = int(lone["n102"] or 0)
    n_012 = int(lone["n012"] or 0)

    counts = {
        r["triad_type"]: r["n"]
        for r in path_counts.unionByName(tri_counts).collect()
    }
    counts["102"] = n_102
    counts["012"] = n_012
    total = n_nodes * (n_nodes - 1) * (n_nodes - 2) // 6
    counts["003"] = total - sum(counts.values())

    wedges.unpersist()
    dy.unpersist()
    rows = [(t, int(counts.get(t, 0))) for t in TRIAD_TYPES]
    return spark.createDataFrame(rows, "triad_type string, n long")
