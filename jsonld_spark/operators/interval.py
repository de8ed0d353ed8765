"""Temporal interval operators: as-of join and binned range join.

Two operators a transcript/KG pipeline needs constantly (attach the
latest dictionary/profile version to each event; map points into
validity intervals) that Spark has no built-in for:

* ``as_of_join`` — for every left row, the LATEST right row with
  ``right_ts <= left_ts`` per key. NOT implemented as an inequality
  join (which Spark plans as a per-key cross product then filters —
  quadratic on hot keys): both sides are union-tagged and sorted ONCE
  per key, and the match is a running ``last(..., ignorenulls)``
  window — a single shuffle + sort, linear in rows, hub-safe. This is
  the standard distributed as-of shape (the same sort-merge idea
  pandas ``merge_asof`` uses, expressed as a Spark window).
* ``binned_range_join`` — (point, key) x (interval, key) containment.
  A raw ``BETWEEN`` join again degenerates to per-key cross products;
  instead each interval is exploded into the fixed-width time BINS it
  overlaps and the join runs on (key, bin) EQUALITY, then an exact
  containment filter. Candidate fan-out per interval is
  ``len/bin_width + 1`` rows — tunable, never quadratic. (The same
  bucketing pattern as the dedup/ANN candidate generation.)

Both are deterministic and exactly SQL-expressible: DuckDB has a
native ``ASOF JOIN`` — a genuinely independent formulation for the
oracle — and the range oracle is a plain inequality join (fine at
oracle scale, wrong at 100 TB; the binning is the scale path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Attach to each ``left`` row the ``value_cols`` of the latest
    ``right`` row with ``right_ts <= left_ts`` for the same ``key``
    (NULLs when no right row precedes it).

    Ties: a right row AT the left timestamp matches (<=); among right
    rows sharing one timestamp the last in (ts, order of value_cols
    values) wins deterministically — callers wanting a specific
    tiebreak should pre-dedup the right side per (key, ts).

    Plan shape: union-tag -> one window sort per key -> filter left
    rows. One shuffle on ``key``; per-key state is the running last
    value (constant), so a hot key costs a sort, never a join blowup.
    """
    lcols = left.columns
    # the right-side payload rides as ONE struct so the running fill
    # picks a whole matched row atomically — per-column fills would
    # tear rows when a value column is NULL in some right rows (a NULL
    # member would fall through to an OLDER row's value, fabricating a
    # row that never existed; the ASOF oracle returns matched rows
    # as-is, NULLs included)
    r_payload = F.struct(*[F.col(c) for c in value_cols])
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast(
            right.select(r_payload.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            l_tagged.schema["_l"].dataType
        ).alias("_l"),
        r_payload.alias("_r"),
    )
    # right rows sort BEFORE left rows at equal timestamps (_is_left
    # ascending), so a right row at exactly left_ts is visible to the
    # running last() — the <= contract
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tagged.unionByName(r_tagged)
    filled = unioned.select(
        "_is_left",
        "_l",
        F.last(F.col("_r"), ignorenulls=True).over(w).alias("_f"),
    )
    return filled.where(F.col("_is_left") == 1).select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        *[F.col("_f")[c].alias(c) for c in value_cols],
    )


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_col: str,
    end_col: str,
    payload_cols: list[str],
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner-join each point row to every interval row of the same
    ``key`` whose ``[start, end)`` contains ``point_ts``.

    Candidate generation is (key, bin) EQUALITY: intervals explode
    into the bins they overlap (``F.sequence`` over floor-divided
    epochs), points carry their single bin — then the exact
    containment predicate filters. Fan-out per interval row is
    ``ceil(len/bin) + 1``; pick ``bin_seconds`` near the typical
    interval length.

    RESERVED COLUMN NAMES (ADVICE r5): internal working columns
    ``_k``, ``_p``, ``_s``, ``_e``, ``_bin`` are injected via
    ``select('*', ...)`` — a ``points``/``intervals`` frame that
    already contains one of them (or a ``payload_cols`` entry that
    collides with a points column) raises an ambiguous-column
    AnalysisException; rename such columns before calling. The as-of
    join reserves ``_k``, ``_ts``, ``_is_left``, ``_l``, ``_r`` the
    same way.
    """
    p_epoch = F.col(point_ts).cast("timestamp").cast("long")
    s_epoch = F.col(start_col).cast("timestamp").cast("long")
    e_epoch = F.col(end_col).cast("timestamp").cast("long")
    binned_ivals = intervals.select(
        F.col(key).alias("_k"),
        s_epoch.alias("_s"),
        e_epoch.alias("_e"),
        *[F.col(c) for c in payload_cols],
    ).where(F.col("_e") > F.col("_s")).select(
        "*",
        F.explode(
            # end is EXCLUSIVE: an interval ending exactly on a bin
            # boundary does not reach into that bin
            F.sequence(
                F.expr(f"_s div {bin_seconds}"),
                F.expr(f"(_e - 1) div {bin_seconds}"),
            )
        ).alias("_bin"),
    )
    binned_pts = points.select(
        "*",
        F.col(key).alias("_k"),
        p_epoch.alias("_p"),
    ).select("*", F.expr(f"_p div {bin_seconds}").alias("_bin"))
    joined = binned_pts.join(binned_ivals, ["_k", "_bin"]).where(
        (F.col("_p") >= F.col("_s")) & (F.col("_p") < F.col("_e"))
    )
    return joined.select(
        *[F.col(c) for c in points.columns],
        *[F.col(c) for c in payload_cols],
    )


# --- driver-query fixtures over the events table ---------------------------
#
# The events table has no second versioned table to join, so both
# operators run against DETERMINISTIC derived fixtures (same policy as
# the chain/label fixtures): profile "versions" are every K-th event
# of a user (that event's value becomes the profile payload), and
# "maintenance windows" are fixed-length intervals opened at every
# J-th event. Both sides derive from the same parquet, so the oracle
# rebuilds them exactly.

PROFILE_EVERY = 7      # every 7th event of a user bumps their profile
WINDOW_EVERY = 11      # every 11th event opens a window ...
WINDOW_LEN_S = 1800    # ... lasting 30 minutes
RANGE_BIN_S = 600


def _user_event_seq(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return df.withColumn("_seq", F.row_number().over(w))


def profile_versions(spark, sf_dir: str) -> DataFrame:
    """(user_id, ts, version, profile_value): every PROFILE_EVERY-th
    event of a user, in per-user time order."""
    from jsonld_spark.plans.session import read_table

    ev = _user_event_seq(read_table(spark, sf_dir, "events"))
    picked = ev.where(F.col("_seq") % PROFILE_EVERY == 0)
    prof = picked.select(
        "user_id",
        "ts",
        # integer `div`, matching the oracle's `//` (the r4 ADVICE
        # float-division lesson)
        F.expr(f"_seq div {PROFILE_EVERY}").alias("version"),
        F.col("value").alias("profile_value"),
    )
    # as_of_join's contract pushes (key, ts)-dedup onto callers: two
    # picked events of one user at an identical timestamp would leave
    # both the window fill AND the ASOF oracle free to pick either
    # row, making the driver gate nondeterministic. Keep the highest
    # version per (user_id, ts) — tie-free today (verified at every
    # sf), but guaranteed by construction, not by data luck
    wt = Window.partitionBy("user_id", "ts").orderBy(F.desc("version"))
    return (
        prof.withColumn("_rn", F.row_number().over(wt))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def asof_event_profiles(spark, sf_dir: str) -> DataFrame:
    """Every event joined to the user's profile version as of the
    event's timestamp (NULL before the first version)."""
    from jsonld_spark.plans.session import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    prof = profile_versions(spark, sf_dir)
    return as_of_join(
        ev, prof, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["version", "profile_value"],
    )


def asof_event_profiles_sql() -> str:
    """Oracle via DuckDB's native ASOF JOIN — an independent
    implementation of the same semantics (latest right with
    right.ts <= left.ts per key)."""
    return f"""
WITH seq AS (
  SELECT user_id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
  FROM events),
prof0 AS (
  SELECT user_id, ts, CAST(seq // {PROFILE_EVERY} AS BIGINT) AS version,
         value AS profile_value
  FROM seq WHERE seq % {PROFILE_EVERY} = 0),
prof AS (
  SELECT user_id, ts, version, profile_value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts
                                 ORDER BY version DESC) AS rn
    FROM prof0)
  WHERE rn = 1)
SELECT e.event_id, e.user_id, e.ts, p.version, p.profile_value
FROM events e
ASOF LEFT JOIN prof p ON e.user_id = p.user_id AND e.ts >= p.ts"""


def maintenance_windows(spark, sf_dir: str) -> DataFrame:
    """(user_id, win_id, win_start, win_end): a WINDOW_LEN_S interval
    opened at every WINDOW_EVERY-th event of a user."""
    from jsonld_spark.plans.session import read_table

    ev = _user_event_seq(read_table(spark, sf_dir, "events"))
    picked = ev.where(F.col("_seq") % WINDOW_EVERY == 0)
    return picked.select(
        "user_id",
        F.expr(f"_seq div {WINDOW_EVERY}").alias("win_id"),
        F.col("ts").alias("win_start"),
        (F.col("ts").cast("timestamp")
         + F.expr(f"INTERVAL {WINDOW_LEN_S} SECONDS")).alias("win_end"),
    )


def events_in_windows(spark, sf_dir: str) -> DataFrame:
    """(event_id, user_id, win_id): every event inside one of its
    user's maintenance windows (start inclusive, end exclusive) —
    the binned range join end-to-end."""
    from jsonld_spark.plans.session import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    wins = maintenance_windows(spark, sf_dir)
    return binned_range_join(
        ev, wins, key="user_id", point_ts="ts",
        start_col="win_start", end_col="win_end",
        payload_cols=["win_id"], bin_seconds=RANGE_BIN_S,
    ).select("event_id", "user_id", "win_id")


def events_in_windows_sql() -> str:
    """Oracle: plain containment join (exact and fine at oracle scale;
    the Spark side's binning is the 100-TB shape)."""
    return f"""
WITH seq AS (
  SELECT event_id, user_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
  FROM events),
wins AS (
  SELECT user_id, CAST(seq // {WINDOW_EVERY} AS BIGINT) AS win_id,
         ts AS win_start, ts + INTERVAL {WINDOW_LEN_S} SECOND AS win_end
  FROM seq WHERE seq % {WINDOW_EVERY} = 0)
SELECT e.event_id, e.user_id, w.win_id
FROM events e JOIN wins w
  ON e.user_id = w.user_id AND e.ts >= w.win_start AND e.ts < w.win_end"""
