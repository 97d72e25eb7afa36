"""k-core decomposition — iterative degree-peeling.

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
