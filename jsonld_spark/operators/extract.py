"""S1: batched mention detection, entity linking, and per-turn JSON-LD
payload assembly — entirely JVM-side column expressions (no Python in
the hot path; SURVEY.md §7.0 stage S1).

Mention detection is a single vectorized ``regexp_extract_all`` against
the alternation of all dictionary surfaces. Entity linking resolves
each surface to the argmax-prior entity; because the canonical-entity
dictionary is small and static it is resolved once on the driver and
shipped as a *literal map expression* (cheaper than a broadcast join:
zero shuffle, zero build side). ``link_mentions_join`` provides the
broadcast-join variant for dynamic dictionaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jsonld_spark.sources import entities as E

TURN_IRI_PREFIX = E.KG + "turn/"
CONV_IRI_PREFIX = E.KG + "conv/"
TOOL_IRI_PREFIX = E.KG + "tool/"

# The static context for per-turn payloads; resolved once on the driver
# and shared with the expansion kernel stage (SURVEY.md §1.3: contexts
# are the schema; executors never process contexts).
PIPELINE_CONTEXT = {
    "@vocab": E.VOCAB,
    "target": {"@type": "@id"},
    "tool": {"@type": "@id"},
    "inConversation": {"@type": "@id"},
    "entities": {"@type": "@id"},
    "score": {"@type": "http://www.w3.org/2001/XMLSchema#double"},
}


def _link_map_expr():
    """Literal MapType column: surface -> struct(entity_id, type_term, prior)."""
    entries = []
    for surface, row in sorted(E.resolved_link_map().items()):
        entries.append(F.lit(surface))
        entries.append(
            F.struct(
                F.lit(row["entity_id"]).alias("entity_id"),
                F.lit(row["type_term"]).alias("type_term"),
                F.lit(float(row["prior"])).alias("prior"),
            )
        )
    return F.create_map(*entries)


def detect_mentions(transcripts: DataFrame) -> DataFrame:
    """transcripts -> one row per detected mention, in text order.

    Output: (conv_id, turn_idx, rank, surface).
    """
    surfaces = F.regexp_extract_all("text", F.lit(E.surface_pattern()), 1)
    return (
        transcripts.select(
            "conv_id",
            "turn_idx",
            F.posexplode(surfaces).alias("rank", "surface"),
        )
    )


def dictionary_df(spark) -> DataFrame:
    """The canonical-entity dictionary as a DataFrame (the dynamic-
    dictionary shape; the static path uses the literal map instead)."""
    rows = [
        (r["entity_id"], r["surface"], r["type_term"], float(r["prior"]))
        for r in E.dictionary_rows()
    ]
    return spark.createDataFrame(
        rows, "entity_id string, surface string, type_term string, prior double"
    )


def resolve_dictionary(dictionary: DataFrame) -> DataFrame:
    """Per-surface argmax-prior resolution (ties -> smallest entity_id),
    the distributed analogue of entities.resolved_link_map()."""
    w = Window.partitionBy("surface").orderBy(F.desc("prior"), F.asc("entity_id"))
    return (
        dictionary.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def link_mentions_join(mentions: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Broadcast-join entity linking with argmax-prior resolution.

    The dictionary (entity_id, surface, type_term, prior) is resolved
    per surface (argmax prior, ties -> smallest entity_id) and then
    broadcast — the big mention side never shuffles.
    """
    return mentions.join(F.broadcast(resolve_dictionary(dictionary)), "surface", "left")


def link_mentions_join_salted(mentions: DataFrame, dictionary: DataFrame,
                              buckets: int = 16) -> DataFrame:
    """Entity linking as a SALTED shuffle join (north_rule): for when
    the dictionary outgrows broadcast AND one surface's reducer
    dominates the stage (spill / straggler). The mention side's surface
    key is head-skewed by design (E0 carries ~44% of mentions,
    sources/transcripts.py); salting spreads each surface over
    ``buckets`` reducers and explodes the dictionary side to match.

    Measured honestly (`bench.py --skew`, BENCH/BASELINE.md): at
    sandbox scale the PLAIN join wins ~2x — clustered identical keys
    compress the shuffle better and a 1.4-5.6M-row hot partition
    neither spills nor dominates on a 128 GiB JVM. Salting is the
    escape hatch for the regime where it does (hot partition >>
    executor memory), so it is opt-in, result-identical to the
    broadcast path (tests + driver oracle kg_mention_links_salted)."""
    from jsonld_spark.operators.canonicalize import salt_join

    # left, like the broadcast path: mentions whose surface is absent
    # from the dictionary must survive (salting is left-join-safe —
    # only the big side is salted, the small side is exploded to match)
    return salt_join(mentions, resolve_dictionary(dictionary), ["surface"],
                     buckets=buckets, how="left")


def with_payload(transcripts: DataFrame) -> DataFrame:
    """Attach turn/conv IRIs and the per-turn JSON-LD document.

    Output: transcripts columns + (turn_iri, jsonld string).
    """
    link = _link_map_expr()
    turn_iri = F.concat(
        F.lit(TURN_IRI_PREFIX), F.col("conv_id"), F.lit("/"), F.col("turn_idx")
    )
    conv_iri = F.concat(F.lit(CONV_IRI_PREFIX), F.col("conv_id"))
    surfaces = F.regexp_extract_all("text", F.lit(E.surface_pattern()), 1)

    mentions = F.transform(
        surfaces,
        lambda s, i: F.struct(
            F.lit("Mention").alias("@type"),
            i.alias("rank"),
            s.alias("surface"),
            F.element_at(link, s)["prior"].alias("score"),
            F.element_at(link, s)["entity_id"].alias("target"),
        ),
    )
    # entity references only (coerced @id strings): corpus-level entity
    # facts (rdf:type / label) are emitted by entity_triples() as a
    # small relational distinct, so the document-kernel output stays
    # unique-by-construction and needs NO global dedup shuffle
    entity_refs = F.transform(surfaces, lambda s: F.element_at(link, s)["entity_id"])

    doc = F.to_json(
        F.struct(
            turn_iri.alias("@id"),
            F.lit("Turn").alias("@type"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("atTime"),
            conv_iri.alias("inConversation"),
            F.col("role").alias("role"),
            F.col("turn_idx").alias("turnIndex"),
            F.col("text").alias("text"),
            F.when(
                F.col("tool").isNotNull(), F.concat(F.lit(TOOL_IRI_PREFIX), F.col("tool"))
            ).alias("tool"),
            mentions.alias("mentions"),
            entity_refs.alias("entities"),
        )
    )
    return transcripts.withColumn("turn_iri", turn_iri).withColumn("jsonld", doc)


RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def entity_triples(transcripts: DataFrame) -> DataFrame:
    """Corpus-level entity facts — (entity, rdf:type, Type) and
    (entity, label, surface) — via mention detection + the broadcast
    link map. Only ``text`` is consumed, so callers can pass a
    window-free text frame (sources/transcripts.transcript_texts) and
    skip the turn-ordering shuffle entirely. The dedup is a
    groupBy(surface) — map-side partial aggregation collapses the
    head-entity skew to one row per surface per map task, so the
    shuffle carries O(distinct surfaces × tasks) rows, not O(mentions)."""
    link = _link_map_expr()
    surfaces = (
        transcripts.select(
            F.explode(
                F.regexp_extract_all("text", F.lit(E.surface_pattern()), 1)
            ).alias("surface")
        )
        .groupBy("surface")
        .agg(F.count("*").alias("_n"))
        .drop("_n")
        .select("surface", F.element_at(link, F.col("surface")).alias("e"))
    )
    null_s = F.lit(None).cast("string")
    typed = F.struct(
        F.col("e")["entity_id"].alias("subject"),
        F.lit(RDF_TYPE).alias("predicate"),
        F.lit("iri").alias("obj_kind"),
        F.concat(F.lit(E.VOCAB), F.col("e")["type_term"]).alias("obj_value"),
        null_s.alias("obj_type"),
        null_s.alias("obj_lang"),
    )
    labeled = F.struct(
        F.col("e")["entity_id"].alias("subject"),
        F.lit(E.VOCAB + "label").alias("predicate"),
        F.lit("literal").alias("obj_kind"),
        F.col("surface").alias("obj_value"),
        F.lit(XSD_STRING).cast("string").alias("obj_type"),
        null_s.alias("obj_lang"),
    )
    # both fact rows per surface in ONE pass (a second consumer of the
    # `surfaces` subtree would recompute the scan + regexp + groupBy)
    return (
        surfaces.select(F.explode(F.array(typed, labeled)).alias("f"))
        .select(null_s.alias("graph"), "f.*")
        .dropDuplicates()
    )
