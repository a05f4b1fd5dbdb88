"""Parameterized funnel analysis — ordered step chains over an event
stream, driven by a saved-workload relation instead of hardcoded step
names.

The reference has no event-analytics operators at all; this is part of
the engine's product-analytics extension (funnel/cohort family in
__spark_entry__). The round-6 version hardcoded signup→click→purchase;
here the step list is DATA: a (step, event_type) relation — saved
alongside other workload definitions — parameterizes both the Spark
plan AND the DuckDB oracle text, which is generated from the same
relation so the two can never drift.

Scale shape (unchanged from the audited r6 plan): per-step filtered
min-aggregations chained by per-user joins — shuffles key on user_id,
per-user relations are NOT broadcast (they scale with users; AQE may
still broadcast a genuinely small one at runtime), and the final
counts are single-row aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_STEPS = ["signup", "click", "purchase"]
DEFAULT_WITHIN_S = 72 * 3600


def steps_relation(spark: SparkSession, steps: list[str]) -> DataFrame:
    """The saved-workload relation: (step, event_type), 1-based."""
    return spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step int, event_type string"
    )


def steps_from_relation(steps_df: DataFrame) -> list[str]:
    """Parameter-table read: O(steps) driver rows, the one collect a
    plan-building parameter table legitimately needs."""
    return [r["event_type"] for r in steps_df.orderBy("step").collect()]


def _last_label(steps: list[str], within_s: int | None) -> str:
    if within_s is None:
        return steps[-1]
    return f"{steps[-1]}_{within_s // 3600}h"


def funnel_conversion_steps(
    ev: DataFrame,
    steps_df: DataFrame,
    within_s: int | None = DEFAULT_WITHIN_S,
) -> DataFrame:
    """First-touch funnel for an arbitrary step list: step i is each
    user's EARLIEST steps[i] event at-or-after their step i-1 time;
    the final step is bounded to within_s seconds of step 1 (None =
    unbounded). Returns (step, event_type, n_users, conversion)."""
    from transferdb_spark.functions.canonical import stable_round

    steps = steps_from_relation(steps_df)
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")

    stages: list[DataFrame] = []
    s = (
        ev.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    stages.append(s)
    for i, ev_type in enumerate(steps[1:], start=2):
        prev_t = f"t{i - 1}"
        s = (
            ev.where(F.col("event_type") == ev_type)
            .join(stages[-1].select("user_id", "t1", prev_t) if i > 2
                  else stages[-1], "user_id")
            .where(F.col("ts") >= F.col(prev_t))
            # group by (user_id, t1) only — intermediate step times are
            # functionally dependent on user_id and would just widen
            # the shuffle key
            .groupBy("user_id", "t1")
            .agg(F.min("ts").alias(f"t{i}"))
        )
        if i == len(steps) and within_s is not None:
            s = s.where(
                F.col(f"t{i}").cast("double") - F.col("t1").cast("double")
                <= F.lit(float(within_s))
            )
        stages.append(s)

    labels = steps[:-1] + [_last_label(steps, within_s)]
    counts = [
        st.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(i + 1).alias("step"), F.lit(labels[i]).alias("event_type"), "n"
        )
        for i, st in enumerate(stages)
    ]
    funnel = counts[0]
    for c in counts[1:]:
        funnel = funnel.unionByName(c)
    base = stages[0].agg(F.count(F.lit(1)).alias("base"))
    return (
        funnel.crossJoin(F.broadcast(base))
        .select(
            "step",
            "event_type",
            F.col("n").cast("long").alias("n_users"),
            stable_round(
                F.col("n").cast("double") / F.col("base").cast("double"), 6
            ).alias("conversion"),
        )
        .orderBy("step")
    )


def funnel_sql_from_steps(
    steps: list[str], within_s: int | None = DEFAULT_WITHIN_S
) -> str:
    """The DuckDB oracle, GENERATED from the same step list the Spark
    plan consumes — cross-engine parity by construction."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    ctes = [
        "s1 AS (\n"
        f"  SELECT user_id, MIN(ts) AS t1 FROM events"
        f" WHERE event_type = '{steps[0]}' GROUP BY 1\n)"
    ]
    for i, ev_type in enumerate(steps[1:], start=2):
        prev = i - 1
        having = ""
        if i == len(steps) and within_s is not None:
            having = (
                f"\n  HAVING epoch(MIN(e.ts)) - epoch(t1) <= {float(within_s)}"
            )
        ctes.append(
            f"s{i} AS (\n"
            f"  SELECT e.user_id, s{prev}.t1, MIN(e.ts) AS t{i}\n"
            f"  FROM events e JOIN s{prev} ON e.user_id = s{prev}.user_id\n"
            f"  WHERE e.event_type = '{ev_type}' AND e.ts >= s{prev}.t{prev}\n"
            f"  GROUP BY 1, 2{having}\n)"
        )
    labels = steps[:-1] + [_last_label(steps, within_s)]
    arms = [
        f"  SELECT {i + 1} AS step, '{labels[i]}' AS event_type,"
        f" COUNT(*) AS n FROM s{i + 1}"
        for i in range(len(steps))
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + ",\nfunnel AS (\n"
        + "\n  UNION ALL\n".join(arms)
        + "\n),\nbase AS (SELECT COUNT(*) AS base FROM s1)\n"
        "SELECT step, event_type,\n"
        "       CAST(n AS BIGINT) AS n_users,\n"
        "       (floor(CAST(n AS DOUBLE) / CAST(base AS DOUBLE)"
        " * 1000000.0 + 0.5) / 1000000.0) AS conversion\n"
        "FROM funnel CROSS JOIN base\n"
        "ORDER BY step"
    )


# ---------------------------------------------------------------------------
# cohort retention — the same saved-workload treatment as the funnel:
# (anchor event, week horizon) parameterize both the Spark plan and
# the generated DuckDB oracle.

COHORT_ANCHOR = "signup"
COHORT_MAX_WEEKS = 4


def cohort_retention_params(
    ev: DataFrame, anchor: str = COHORT_ANCHOR, max_weeks: int = COHORT_MAX_WEEKS
) -> DataFrame:
    """Weekly cohort retention for an arbitrary anchor event and week
    horizon: users grouped by first-anchor week, counted by distinct
    activity per later week offset (0..max_weeks). The raw day diff is
    filtered BEFORE floor-dividing so pre-anchor activity can't
    truncate into offset 0 (the advisor's round-6 finding)."""
    from transferdb_spark.functions.canonical import stable_round

    days = max_weeks * 7
    cohort = (
        ev.where(F.col("event_type") == anchor)
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    activity = (
        ev.join(cohort, "user_id")  # per-user: sized by users, not a dim
        .select(
            "user_id",
            "cohort_week",
            F.datediff(
                F.date_trunc("week", F.col("ts")), F.col("cohort_week")
            ).alias("day_diff"),
        )
        .where((F.col("day_diff") >= 0) & (F.col("day_diff") <= days))
        .select(
            "user_id",
            "cohort_week",
            F.floor(F.col("day_diff") / 7).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    sizes = cohort.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("date").cast("string").alias("cohort_week"),
            "week_offset",
            F.col("n_active").cast("long").alias("n_active"),
            stable_round(
                F.col("n_active").cast("double") / F.col("cohort_size").cast("double"),
                6,
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def cohort_sql_from_params(
    anchor: str = COHORT_ANCHOR, max_weeks: int = COHORT_MAX_WEEKS
) -> str:
    """DuckDB oracle generated from the SAME parameters."""
    days = max_weeks * 7
    return f"""
WITH cohort AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events WHERE event_type = '{anchor}' GROUP BY 1
),
activity AS (
  SELECT DISTINCT e.user_id, c.cohort_week,
         CAST(date_diff('day', c.cohort_week, date_trunc('week', e.ts)) // 7 AS INT) AS week_offset
  FROM events e JOIN cohort c ON e.user_id = c.user_id
  WHERE date_diff('day', c.cohort_week, date_trunc('week', e.ts)) BETWEEN 0 AND {days}
),
sizes AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM cohort GROUP BY 1)
SELECT CAST(CAST(a.cohort_week AS DATE) AS VARCHAR) AS cohort_week, week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       (floor(CAST(COUNT(*) AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS retention
FROM activity a JOIN sizes s USING (cohort_week)
GROUP BY a.cohort_week, week_offset, s.cohort_size
ORDER BY cohort_week, week_offset
"""


# ---------------------------------------------------------------------------
# parameterized event-transition matrix — the family's third member
# gets the same saved-workload treatment as the funnel steps and the
# cohort anchor: the event-type WHITELIST is a relation, and the
# DuckDB oracle text is generated from the same list so the two
# engines cannot drift.

# The saved default workload: the fixture's full event alphabet. An
# explicit list (not a "no filter" sentinel) so the whitelist is
# exercised on every run, and adding a new event type to the feed is a
# WORKLOAD decision, not a silent matrix change.
DEFAULT_TRANSITION_TYPES = ["click", "error", "purchase", "signup", "view"]


def transition_types_relation(spark: SparkSession, types: list[str]) -> DataFrame:
    """The saved-workload relation: (event_type) whitelist rows."""
    return spark.createDataFrame([(t,) for t in types], "event_type string")


def types_from_relation(types_df: DataFrame) -> list[str]:
    """Parameter-table read: O(types) driver rows — the one collect a
    plan-building parameter table legitimately needs."""
    return [r["event_type"] for r in types_df.orderBy("event_type").collect()]


def transition_matrix(ev: DataFrame, types_df: DataFrame) -> DataFrame:
    """Markov transition matrix over per-user journeys PROJECTED onto
    the whitelist alphabet: events outside the list are dropped and
    the chain RE-LINKS across them (the standard journey-projection
    semantics — a filtered-out noise event must not break an A->B
    edge). One lead window keyed on user_id, then (src, dst) counts
    and a per-src normalizer. Returns (src, dst, n, prob)."""
    from pyspark.sql.window import Window

    from transferdb_spark.functions.canonical import stable_round

    types = types_from_relation(types_df)
    ev = ev.where(F.col("event_type").isin(types))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = Window.partitionBy("src")
    return (
        pairs.select(
            "src",
            "dst",
            F.col("n").cast("long").alias("n"),
            stable_round(
                F.col("n").cast("double") / F.sum("n").over(totals).cast("double"), 6
            ).alias("prob"),
        )
        .orderBy("src", "dst")
    )


def transitions_sql_from_types(types: list[str]) -> str:
    """The DuckDB oracle, GENERATED from the same whitelist the Spark
    plan consumes — cross-engine parity by construction."""
    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(types))
    return f"""
WITH pairs AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
  WHERE event_type IN ({quoted})),
counts AS (
  SELECT src, dst, COUNT(*) AS n FROM pairs WHERE dst IS NOT NULL GROUP BY 1, 2)
SELECT src, dst, CAST(n AS BIGINT) AS n,
       (floor(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE)
        * 1000000.0 + 0.5) / 1000000.0) AS prob
FROM counts
ORDER BY src, dst
"""


def funnel_step_latency(
    ev: DataFrame,
    steps_df: DataFrame,
    within_s: int | None = DEFAULT_WITHIN_S,
) -> DataFrame:
    """Time-to-convert per funnel step: for every user who reached
    step i, the seconds between their step i-1 and step i first-touch
    times. Returns (step, event_type, n_users, min_s, max_s, avg_s) —
    min/max/avg only, all exact (DECIMAL average, rounded at the
    boundary): interpolated quantiles are engine-dependent, the
    min/max/avg triple is not. Same chained per-user min-aggregation
    shape as funnel_conversion_steps; the latency rollup adds one
    single-row aggregate per step."""
    from transferdb_spark.functions.canonical import stable_round

    steps = steps_from_relation(steps_df)
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")

    stages: list[DataFrame] = []
    s = (
        ev.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    stages.append(s)
    for i, ev_type in enumerate(steps[1:], start=2):
        prev_t = f"t{i - 1}"
        s = (
            ev.where(F.col("event_type") == ev_type)
            .join(stages[-1], "user_id")
            .where(F.col("ts") >= F.col(prev_t))
            .groupBy("user_id", *[f"t{j}" for j in range(1, i)])
            .agg(F.min("ts").alias(f"t{i}"))
        )
        if i == len(steps) and within_s is not None:
            s = s.where(
                F.col(f"t{i}").cast("double") - F.col("t1").cast("double")
                <= F.lit(float(within_s))
            )
        stages.append(s)

    labels = steps[:-1] + [_last_label(steps, within_s)]
    outs = []
    for i in range(2, len(steps) + 1):
        # exact integer epoch-micros difference; seconds only at the
        # output boundary
        lat = stages[i - 1].select(
            (
                F.unix_micros(F.col(f"t{i}")).cast("decimal(28,0)")
                - F.unix_micros(F.col(f"t{i - 1}")).cast("decimal(28,0)")
            ).alias("dus")
        )
        outs.append(
            lat.agg(
                F.count(F.lit(1)).alias("n"),
                F.min("dus").alias("mn"),
                F.max("dus").alias("mx"),
                F.sum("dus").alias("sm"),
            ).select(
                F.lit(i).alias("step"),
                F.lit(labels[i - 1]).alias("event_type"),
                F.col("n").cast("long").alias("n_users"),
                (F.col("mn").cast("double") / 1e6).alias("min_s"),
                (F.col("mx").cast("double") / 1e6).alias("max_s"),
                stable_round(
                    F.col("sm").cast("double")
                    / (F.lit(1e6) * F.col("n").cast("double")),
                    6,
                ).alias("avg_s"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("step")


def funnel_latency_sql_from_steps(
    steps: list[str], within_s: int | None = DEFAULT_WITHIN_S
) -> str:
    """The DuckDB oracle, generated from the same step list; carries
    every intermediate step time through the CTE chain so the latency
    of step i is epoch_us(t_i) - epoch_us(t_{i-1}) exactly."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    ctes = [
        f"s1 AS (\n  SELECT user_id, MIN(ts) AS t1\n"
        f"  FROM events WHERE event_type = '{steps[0]}' GROUP BY 1\n)"
    ]
    for i, ev_type in enumerate(steps[1:], start=2):
        prev = i - 1
        having = ""
        if i == len(steps) and within_s is not None:
            having = f"\n  HAVING epoch(MIN(e.ts)) - epoch(t1) <= {float(within_s)}"
        carried = ", ".join(f"s{prev}.t{j}" for j in range(1, i))
        ctes.append(
            f"s{i} AS (\n"
            f"  SELECT e.user_id, {carried}, MIN(e.ts) AS t{i}\n"
            f"  FROM events e JOIN s{prev} ON e.user_id = s{prev}.user_id\n"
            f"  WHERE e.event_type = '{ev_type}' AND e.ts >= s{prev}.t{prev}\n"
            f"  GROUP BY ALL{having}\n)"
        )
    labels = steps[:-1] + [_last_label(steps, within_s)]
    arms = []
    for i in range(2, len(steps) + 1):
        arms.append(
            f"  SELECT {i} AS step, '{labels[i - 1]}' AS event_type,\n"
            f"         CAST(COUNT(*) AS BIGINT) AS n_users,\n"
            f"         CAST(MIN(epoch_us(t{i}) - epoch_us(t{i - 1})) AS DOUBLE) / 1e6 AS min_s,\n"
            f"         CAST(MAX(epoch_us(t{i}) - epoch_us(t{i - 1})) AS DOUBLE) / 1e6 AS max_s,\n"
            f"         (floor(CAST(SUM(epoch_us(t{i}) - epoch_us(t{i - 1})) AS DOUBLE)"
            f" / (1e6 * COUNT(*)) * 1000000.0 + 0.5) / 1000000.0) AS avg_s\n"
            f"  FROM s{i}"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + ",\nlat AS (\n"
        + "\n  UNION ALL\n".join(arms)
        + "\n)\nSELECT * FROM lat ORDER BY step"
    )
