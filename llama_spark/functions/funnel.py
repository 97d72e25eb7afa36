"""Event-stream product analytics: ordered funnels and cohort retention.

The two table-stakes queries every event pipeline runs over a
(user, event_type, ts) stream; both are single-pass, map-side-combinable
aggregations — no iteration, no UDFs, no driver loops.

Determinism contract: time enters every comparison as integer epoch
MICROseconds (``unix_micros`` in Spark, ``epoch_us`` in DuckDB — exact
BIGINTs, no float or timezone arithmetic), so strict-order funnel
comparisons cannot be reordered by sub-second ties the way floored
seconds could.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SECONDS_PER_DAY = 86_400


def _micros(col):
    return F.unix_micros(col.cast("timestamp"))


def funnel_counts(events: DataFrame, steps: list[str]) -> DataFrame:
    """DataFrame[step_no, step, n_users] — strictly-ordered funnel: a user
    counts at step k if there exist events e_1 … e_k with
    type(e_i) = steps[i] and t(e_1) < t(e_2) < … < t(e_k), using each
    user's EARLIEST feasible completion time per step (the standard
    first-touch funnel; earliest-completion is optimal, so this counts
    exactly the users for whom such a chain exists).

    Plan: one filtered min-aggregate per step (k tiny, fixed), each
    joining the previous step's per-user completion time — k shuffles of
    a ≤|users| table, never of the event stream; the event table is
    filtered to the step's type BEFORE the join (predicate pushdown to
    the scan)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = events.select(
        "user_id", "event_type", _micros(F.col("ts")).alias("t")
    )
    prev = (
        ev.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("t").alias("t0"))
    )
    counts = [(1, steps[0], prev)]
    for k, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.filter(F.col("event_type") == step)
            .join(prev.select("user_id", "t0"), "user_id")
            .filter(F.col("t") > F.col("t0"))
            .groupBy("user_id")
            .agg(F.min("t").alias("t0"))
        )
        counts.append((k, step, nxt))
        prev = nxt
    spark = events.sparkSession
    out = None
    for k, step, df in counts:
        row = df.agg(
            F.lit(k).cast("long").alias("step_no"),
            F.lit(step).alias("step"),
            F.count("*").cast("long").alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def daily_retention(events: DataFrame) -> DataFrame:
    """DataFrame[cohort_day, day_offset, n_users, retention] — classic
    triangle retention: users bucketed by the epoch-day of their FIRST
    event; for each cohort and each later day-offset, how many of them
    were active, as a count and a fraction of the cohort (6 dp, computed
    from exact integers).

    Plan: per-user min-day aggregate, one join back onto the per-user
    distinct-day activity table (both ≤ |users|·|days| rows), two count
    aggregates. Cohort sizes come from the offset-0 row of the same
    aggregate — every user is active on their cohort day by definition,
    so no separate size pass is needed."""
    # integer DIV, never float division + cast: a double quotient landing
    # an epsilon under the boundary would floor to a different day than
    # the oracle's BIGINT // — exact integer arithmetic in both engines
    ev = events.select(
        "user_id", _micros(F.col("ts")).alias("_t")
    ).select(
        "user_id",
        F.expr(f"_t DIV {SECONDS_PER_DAY * 1_000_000}").cast("long").alias("day"),
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.distinct()
    grid = (
        active.join(first, "user_id")
        .select(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )
    sizes = grid.filter(F.col("day_offset") == 0).select(
        "cohort_day", F.col("n_users").alias("_size")
    )
    return grid.join(sizes, "cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_users",
        F.round(F.col("n_users") / F.col("_size").cast("double"), 6).alias(
            "retention"
        ),
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition table of the event stream —
    DataFrame[from_type, to_type, n, prob]: for each user's time-ordered
    event sequence, count consecutive (type → next type) pairs; prob is
    row-normalized per from_type (6 dp from exact counts). The behavioral
    model behind session analysis: anomalous mass on an (error → retry)
    cell is the kind of shift this table surfaces.

    Plan: one per-user lead window (a partition is one user's events),
    one (from,to) count aggregate, one per-from total join — nothing
    bigger than the distinct type-pair table after the first aggregate."""
    from pyspark.sql import Window

    ev = events.select(
        "user_id", "event_type", _micros(F.col("ts")).alias("t"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("_t"))
    return pairs.join(tot, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.col("_t").cast("double"), 6).alias("prob"),
    )
