"""Synthetic multi-turn transcript table (BASELINE.json input_hint).

Schema: (conv_id string, turn_idx int, role string, text string,
tool string nullable, ts timestamp).

Derived *deterministically* from the driver-provided ``events`` table
with pure column expressions — no randomness, no UDFs — so the DuckDB
oracle can recompute the identical table in SQL and every downstream
KG query has an exact golden. Mention planting is skewed on purpose:
entity 0 appears in every turn where (event_id + j) % 3 == 0, i.e. in
roughly 44% of turns — the head-entity skew the north_rule requires
the canonicalization joins to survive.

Text template:  "Turn notes: S0[ then S1[ after S2]] done."
with 1 + event_id % 3 mentions; mention j resolves to entity index
0 when (event_id + j) % 3 == 0 else (event_id*7 + j*13) % 24, using
the alias surface when the entity has one and (event_id + j) % 5 == 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsonld_spark.plans.session import read_table
from jsonld_spark.sources import entities as E

ROLES = ["user", "assistant", "system", "tool"]
TOOL_EVENT_TYPES = ["click", "purchase", "signup"]
TEXT_PREFIX = "Turn notes: "
TEXT_SEP = [" then ", " after "]
TEXT_SUFFIX = " done."


def _mention_entity_index(event_id, j: int):
    """Column expr: entity index for mention j of a turn (skewed)."""
    return F.when((event_id + j) % 3 == 0, F.lit(0)).otherwise(
        (event_id * 7 + j * 13) % E.N_ENTITIES
    )


def _mention_surface(event_id, j: int):
    """Column expr: surface form used for mention j."""
    idx = _mention_entity_index(event_id, j)
    surfaces = F.array(*[F.lit(E.primary_surface(i)) for i in range(E.N_ENTITIES)])
    aliases = F.array(*[F.lit(E.alias_surface(i)) for i in range(E.N_ALIASED)])
    use_alias = (idx < E.N_ALIASED) & ((event_id + j) % 5 == 0)
    return F.when(use_alias, F.element_at(aliases, (idx + 1).cast("int"))).otherwise(
        F.element_at(surfaces, (idx + 1).cast("int"))
    )


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> transcripts, fully JVM-side and deterministic."""
    ev = read_table(spark, sf_dir, "events")

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")

    return ev.select(
        _conv_id_expr().alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        _role_expr().alias("role"),
        _text_expr().alias("text"),
        F.when(
            F.col("event_type").isin(TOOL_EVENT_TYPES), F.col("event_type")
        ).alias("tool"),
        F.col("ts"),
    )


def _conv_id_expr():
    """The conversation-id column expression (user_id-derived)."""
    return F.concat(
        F.lit("conv-"), F.lpad(F.col("user_id").cast("string"), 8, "0")
    )


def _role_expr():
    """The role column expression (event_id-derived)."""
    return F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), (F.col("event_id") % 4 + 1).cast("int")
    )


def _text_expr():
    """The turn-text column expression (depends only on event_id)."""
    eid = F.col("event_id")
    n_mentions = (eid % 3 + 1).cast("int")
    s0, s1, s2 = (_mention_surface(eid, j) for j in range(3))
    return F.concat(
        F.lit(TEXT_PREFIX),
        s0,
        F.when(n_mentions > 1, F.concat(F.lit(TEXT_SEP[0]), s1)).otherwise(F.lit("")),
        F.when(n_mentions > 2, F.concat(F.lit(TEXT_SEP[1]), s2)).otherwise(F.lit("")),
        F.lit(TEXT_SUFFIX),
    )


def transcript_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Just the text column, events-derived WITHOUT the row_number
    window: text depends only on event_id, so consumers that need no
    turn ordering (e.g. corpus-level entity facts) skip the window
    shuffle entirely."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(_text_expr().alias("text"))


def transcript_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(conv_id, role, text) — the corpus view for frequency-based
    cleanup operators (boilerplate removal). Like transcript_texts it
    skips the row_number window entirely: none of conv_id / role / text
    needs turn ordering, so at 100 TB this is a pure narrow scan-side
    projection with zero shuffle before the consumer's aggregation."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        _conv_id_expr().alias("conv_id"),
        _role_expr().alias("role"),
        _text_expr().alias("text"),
    )


# The same derivation as a DuckDB SQL fragment (CTE body), kept next to
# the Spark version so they evolve together. `row_number` ordering and
# the modular arithmetic are identical.
def transcripts_sql() -> str:
    surfaces = ", ".join(f"'{E.primary_surface(i)}'" for i in range(E.N_ENTITIES))
    aliases = ", ".join(f"'{E.alias_surface(i)}'" for i in range(E.N_ALIASED))
    mention_exprs = []
    for j in range(3):
        mention_exprs.append(
            f"""
      CASE WHEN (event_id + {j}) % 3 = 0 THEN 0
           ELSE (event_id*7 + {j}*13) % {E.N_ENTITIES} END AS eidx{j},
      CASE WHEN (CASE WHEN (event_id + {j}) % 3 = 0 THEN 0
                      ELSE (event_id*7 + {j}*13) % {E.N_ENTITIES} END) < {E.N_ALIASED}
                AND (event_id + {j}) % 5 = 0
           THEN ([{aliases}])[1 + (CASE WHEN (event_id + {j}) % 3 = 0 THEN 0
                      ELSE (event_id*7 + {j}*13) % {E.N_ENTITIES} END)]
           ELSE ([{surfaces}])[1 + (CASE WHEN (event_id + {j}) % 3 = 0 THEN 0
                      ELSE (event_id*7 + {j}*13) % {E.N_ENTITIES} END)] END AS s{j}"""
        )
    return f"""
  SELECT 'conv-' || lpad(CAST(user_id AS VARCHAR), 8, '0') AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
         (['user','assistant','system','tool'])[1 + event_id % 4] AS role,
         CASE WHEN event_type IN ('click','purchase','signup') THEN event_type END AS tool,
         ts, event_id,
         CAST(1 + event_id % 3 AS INT) AS n_mentions,
         {",".join(mention_exprs)}
  FROM events
"""


def transcripts_text_sql() -> str:
    """SQL expression for the text column given the CTE above."""
    return (
        f"'{TEXT_PREFIX}' || s0 || "
        f"CASE WHEN n_mentions > 1 THEN '{TEXT_SEP[0]}' || s1 ELSE '' END || "
        f"CASE WHEN n_mentions > 2 THEN '{TEXT_SEP[1]}' || s2 ELSE '' END || "
        f"'{TEXT_SUFFIX}'"
    )
