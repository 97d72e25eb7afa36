"""k-core membership (degree peeling) and full coreness (h-index fixpoint).

Beyond the reference's kernel set (same family as label propagation: a
vertex-centric fixpoint the north rule's engine should offer for corpus/
community pruning). Semantics: repeatedly delete nodes whose undirected
degree is < k until none remain; the survivors form the k-core. Output:
DataFrame[id, degree] — each survivor with its degree inside the core.

Spark plan per round (delta iteration on the shrinking edge set):
    deg  = und.groupBy(src).count()                 (map-side combined)
    keep = deg.filter(count >= k)                   (tiny relative to und)
    und  = und ⋉ keep(src) ⋉ keep(dst)              (two semi-joins)
Rounds until no node is removed; each round checkpoints the edge set to
truncate lineage. The edge set only shrinks, so per-round cost is
monotonically non-increasing — the same property LLAMA gets from frontier
shrinkage in its BFS template (ll_bfs_template.h).

``rounds`` forces a fixed number of peels (the SQL-oracle-portable mode,
like BFS_UNROLL); ``rounds=None`` runs to convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, symmetrize


def k_core(
    edges: DataFrame,
    k: int,
    rounds: int | None = None,
    max_iter: int = 100,
) -> DataFrame:
    """DataFrame[id, degree] — nodes of the k-core of the undirected,
    deduped, self-loop-free view of ``edges``, with in-core degrees."""
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = symmetrize(edges).repartition(p, SRC).localCheckpoint(eager=True)
    n_edges = und.count()

    def _keep_hint(df: DataFrame) -> DataFrame:
        # node-keyed keep list: ≤ V ≤ current edge count rows. The bound is
        # re-read from the CURRENT round's n_edges (not frozen at entry) so
        # a graph whose core collapses flips from shuffled-hash joins to
        # broadcast once the surviving edge set is small enough.
        return F.broadcast(df) if n_edges <= 100_000 else df.hint("shuffle_hash")

    limit = rounds if rounds is not None else max_iter
    for _ in range(limit):
        if n_edges == 0:
            break
        # und stays hash-partitioned on src → this groupBy needs no exchange
        deg = und.groupBy(SRC).agg(F.count("*").alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select(SRC)
        pruned = (
            und.join(_keep_hint(keep), SRC, "left_semi")
            .join(_keep_hint(keep.withColumnRenamed(SRC, DST)), DST, "left_semi")
            .localCheckpoint(eager=True)
        )
        m = pruned.count()
        if m == n_edges:
            # fixpoint: further rounds are no-ops in BOTH modes (the SQL
            # oracle's remaining unrolled rounds are no-ops too)
            break
        und, n_edges = pruned, m

    return und.groupBy(F.col(SRC).alias("id")).agg(F.count("*").alias("degree"))


def coreness(
    edges: DataFrame,
    rounds: int | None = None,
    max_iter: int = 100,
) -> DataFrame:
    """DataFrame[id, coreness] — the FULL core decomposition (every node's
    core number), via the h-index fixpoint: c₀(v) = deg(v);
    c_{t+1}(v) = H({c_t(u) : u ∈ N(v)}) where H is the h-index. The
    sequence is monotone non-increasing and converges exactly to the core
    numbers (Lü, Zhou, Zhang, Stanley 2016) — the distributed answer to
    sequential bucket peeling, which has no parallel analog.

    Scale shape per round: neighbor values collapse through a
    (node, value) groupBy BEFORE the per-node window, so a hub's window
    holds at most |distinct coreness values| rows (≤ max core, O(100s) on
    web graphs), never its degree. Two shuffles + one bounded window per
    round; state checkpointed via the usual cadence.

    ``rounds`` forces a fixed round count (SQL-oracle-portable mode, like
    ``k_core``); ``rounds=None`` iterates until no value changes.

    **Delta iteration**: h(v) can only change when some neighbor's value
    changed last round, so after the first full round each round recomputes
    h ONLY for the ``affected`` set (neighbors of changed nodes), coalescing
    everyone else's value from state — the same changed-frontier treatment
    as ``components.py`` / ``traversal.py``. The affected set is derived
    with two broadcast semi-joins against the src-partitioned edge table
    (which therefore streams, never reshuffles); symmetry turns
    "edges INTO affected" into the mirror of "edges FROM affected", keeping
    both semi-joins on the src key. Rounds whose changed set exceeds the
    100k broadcast bound fall back to the full recompute (identical
    semantics — on real graphs the frontier collapses under the bound
    within a few rounds, exactly when the delta pays)."""
    from pyspark.sql import Observation, Window

    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = symmetrize(edges).repartition(p, SRC).localCheckpoint(eager=True)
    c = (
        und.groupBy(F.col(SRC).alias("id"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )

    w = Window.partitionBy("id").orderBy(F.desc("value"))
    limit = rounds if rounds is not None else max_iter
    changed_ids = None  # None → full-recompute round (round 0 / big frontier)
    for _ in range(limit):
        if changed_ids is None:
            sub = und
        else:
            # neighbors of last round's changed nodes; then (by symmetry of
            # und) edges INTO them = mirrored edges FROM them — both joins
            # key on src, so the checkpointed edge table never reshuffles
            aff = (
                und.join(
                    F.broadcast(changed_ids.withColumnRenamed("id", SRC)),
                    SRC,
                    "left_semi",
                )
                .select(F.col(DST).alias(SRC))
                .distinct()
            )
            sub = und.join(F.broadcast(aff), SRC, "left_semi").select(
                F.col(DST).alias(SRC), F.col(SRC).alias(DST)
            )
        hi = (
            c.join(sub, c["id"] == sub[SRC])
            .groupBy(F.col(DST).alias("id"), F.col("c").alias("value"))
            .agg(F.count("*").alias("cnt"))
            .withColumn("cum", F.sum("cnt").over(w))
            .groupBy("id")
            .agg(F.max(F.least(F.col("value"), F.col("cum"))).alias("h"))
        )
        # h is NULL exactly for nodes outside the recompute set (in a full
        # round every node has ≥1 und edge) — they keep their value
        new_c = (
            c.select("id", F.col("c").alias("c_old"))
            .join(hi, "id", "left")
            .select("id", F.coalesce("h", "c_old").cast("long").alias("c"),
                    (F.col("h").isNotNull() & (F.col("h") != F.col("c_old"))).alias("changed"))
        )
        obs = Observation(f"coreness_{_}")
        new_c = new_c.observe(
            obs, F.sum(F.col("changed").cast("long")).alias("n")
        ).localCheckpoint(eager=True)
        changed = int(obs.get["n"] or 0)
        c = new_c.select("id", "c")
        changed_ids = (
            new_c.filter(F.col("changed")).select("id")
            if 0 < changed <= 100_000
            else None
        )
        if changed == 0:
            # fixpoint: remaining rounds are no-ops in BOTH modes (the SQL
            # oracle's remaining unrolled rounds are no-ops too)
            break

    return c.select("id", F.col("c").alias("coreness"))
