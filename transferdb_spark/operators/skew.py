"""Skew-handling join operators.

AQE's skew-join splitting (on in every session) handles most skew at
runtime by splitting oversized shuffle partitions. These operators are
the explicit fallbacks for the cases AQE can't fix:

- `salted_join`: a hot build-side key (one key = one partition's worth
  of probe rows) — replicate the build side S ways, scatter the probe
  side with a random salt in [0, S). The shuffle then spreads the hot
  key across S reducers. Use when a single key dominates (power-law
  event streams, NULL-heavy foreign keys).
- `hot_key_split`: hybrid plan — route rows with frequent keys through
  a broadcast join and the long tail through a shuffle join, then
  union. The frequent-key set is discovered with a cheap count and
  must stay broadcastable.

The reference has no analogue (single-process, no shuffles); these
exist purely for the 100 TB posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with build-side replication over `salt` buckets.

    probe rows get a uniform random bucket; build rows are exploded to
    every bucket, so (key, bucket) is a superset join of (key). Output
    columns = probe columns + build columns minus the duplicate key.
    Build-side bytes multiply by `salt` — keep build the smaller side
    and salt only as wide as the skew demands."""
    bucket = F.floor(F.rand(seed=42) * salt).cast("int")
    p = probe.withColumn("__salt", bucket)
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    joined = p.join(b, [on, "__salt"], how)
    return joined.drop("__salt")


def hot_key_split(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    threshold: int = 100_000,
) -> DataFrame:
    """Hybrid join: broadcast the hot keys' build rows, shuffle the rest.

    Keys whose probe-side frequency exceeds `threshold` join via an
    explicit broadcast (no shuffle of their heavy probe rows); the tail
    joins normally. Requires the hot-key build subset to fit in the
    broadcast budget — true by construction when hot keys are few."""
    hot = (
        probe.groupBy(on)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > threshold)
        .select(on)
    )
    hot_rows = probe.join(F.broadcast(hot), on, "left_semi")
    tail_rows = probe.join(F.broadcast(hot), on, "left_anti")
    hot_build = build.join(F.broadcast(hot), on, "left_semi")
    return tail_rows.join(build, on).unionByName(
        hot_rows.join(F.broadcast(hot_build), on)
    )
