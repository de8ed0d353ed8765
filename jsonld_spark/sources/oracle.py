"""DuckDB oracle SQL generators for the KG pipeline queries.

The driver compares each Spark query against ANSI SQL run by DuckDB on
the same parquet tables (CORRECTNESS gate). Because the transcripts
table is derived deterministically from ``events`` (sources/
transcripts.py) and the entity dictionary is shared constants
(sources/entities.py), the *entire* pipeline — mention detection,
entity linking, JSON-LD expansion, node-map flattening, toRdf quad
emission, blank-node canonicalization, global dedup — has an exact
SQL golden built here from the same single source of truth.
"""

from __future__ import annotations

from jsonld_spark.sources import entities as E
from jsonld_spark.sources.transcripts import transcripts_sql, transcripts_text_sql

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DOUBLE = "http://www.w3.org/2001/XMLSchema#double"
V = E.VOCAB


def resolved_values_sql() -> str:
    """VALUES table of the *resolved* link map (surface -> winning
    entity), mirroring the literal map the Spark stage uses."""
    parts = []
    for surface, row in sorted(E.resolved_link_map().items()):
        i = int(row["entity_id"].rsplit("E", 1)[1])
        parts.append(
            f"('{surface}', '{row['entity_id']}', '{row['type_term']}', "
            f"'{E.entity_prior_str(i)}')"
        )
    return "(VALUES " + ", ".join(parts) + ") AS lk(surface, entity_id, type_term, prior_str)"


def base_ctes() -> str:
    """Shared CTEs: transcripts -> turns -> linked mentions."""
    return f"""
WITH tr AS ({transcripts_sql()}),
turns AS (
  SELECT conv_id, turn_idx, role, tool, ts, n_mentions, s0, s1, s2,
         {transcripts_text_sql()} AS text,
         '{E.KG}turn/' || conv_id || '/' || turn_idx AS turn_iri,
         '{E.KG}conv/' || conv_id AS conv_iri,
         md5(conv_id || '/' || turn_idx) AS tkey
  FROM tr
),
men AS (
  SELECT turns.*, j,
         CASE j WHEN 0 THEN s0 WHEN 1 THEN s1 ELSE s2 END AS surface,
         '_:h' || tkey || 'n' || j AS bnode
  FROM turns CROSS JOIN (VALUES (0), (1), (2)) AS js(j)
  WHERE j < n_mentions
),
linked AS (
  SELECT men.*, lk.entity_id, lk.type_term, lk.prior_str
  FROM men JOIN {resolved_values_sql()} USING (surface)
)"""


def triples_select() -> str:
    """SELECT producing the canonical deduplicated triple set with the
    exact column names/types of the Spark pipeline output."""
    n = "CAST(NULL AS VARCHAR)"

    def row(subj, pred, kind, val, typ, lang=n):
        return (
            f"SELECT {n} AS graph, {subj} AS subject, {pred} AS predicate, "
            f"{kind} AS obj_kind, {val} AS obj_value, {typ} AS obj_type, {lang} AS obj_lang"
        )

    turn_rows = [
        row("turn_iri", f"'{RDF_TYPE}'", "'iri'", f"'{V}Turn'", n) + " FROM turns",
        row("turn_iri", f"'{V}atTime'", "'literal'",
            "strftime(ts, '%Y-%m-%d %H:%M:%S')", f"'{XSD_STRING}'") + " FROM turns",
        row("turn_iri", f"'{V}inConversation'", "'iri'", "conv_iri", n) + " FROM turns",
        row("turn_iri", f"'{V}role'", "'literal'", "role", f"'{XSD_STRING}'") + " FROM turns",
        row("turn_iri", f"'{V}turnIndex'", "'literal'", "CAST(turn_idx AS VARCHAR)",
            f"'{XSD_INTEGER}'") + " FROM turns",
        row("turn_iri", f"'{V}text'", "'literal'", "text", f"'{XSD_STRING}'") + " FROM turns",
        row("turn_iri", f"'{V}tool'", "'iri'", f"'{E.KG}tool/' || tool", n)
        + " FROM turns WHERE tool IS NOT NULL",
        row("turn_iri", f"'{V}mentions'", "'iri'", "bnode", n) + " FROM men",
    ]
    mention_rows = [
        row("bnode", f"'{RDF_TYPE}'", "'iri'", f"'{V}Mention'", n) + " FROM linked",
        row("bnode", f"'{V}rank'", "'literal'", "CAST(j AS VARCHAR)", f"'{XSD_INTEGER}'")
        + " FROM linked",
        row("bnode", f"'{V}surface'", "'literal'", "surface", f"'{XSD_STRING}'")
        + " FROM linked",
        row("bnode", f"'{V}score'", "'literal'", "prior_str", f"'{XSD_DOUBLE}'")
        + " FROM linked",
        row("bnode", f"'{V}target'", "'iri'", "entity_id", n) + " FROM linked",
    ]
    entity_rows = [
        # node objects under a property also emit the referencing edge
        # (generateNodeMap adds an {"@id"} back-reference, Processor.php:1978-1989)
        row("turn_iri", f"'{V}entities'", "'iri'", "entity_id", n) + " FROM linked",
        row("entity_id", f"'{RDF_TYPE}'", "'iri'", f"'{V}' || type_term", n)
        + " FROM linked",
        row("entity_id", f"'{V}label'", "'literal'", "surface", f"'{XSD_STRING}'")
        + " FROM linked",
    ]
    union = "\nUNION ALL\n".join(turn_rows + mention_rows + entity_rows)
    return f"SELECT DISTINCT * FROM (\n{union}\n)"


def kg_triples_sql() -> str:
    return base_ctes() + "\n" + triples_select()


def kg_entity_mentions_sql() -> str:
    return (
        base_ctes()
        + """
SELECT entity_id, COUNT(*) AS n_mentions, COUNT(DISTINCT conv_id) AS n_convs
FROM linked GROUP BY entity_id"""
    )


def kg_conversation_stats_sql() -> str:
    return (
        base_ctes()
        + """
SELECT conv_id,
       COUNT(*) AS n_turns,
       CAST(SUM(n_mentions) AS BIGINT) AS total_mentions,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM turns GROUP BY conv_id"""
    )


def kg_adjacency_sql() -> str:
    return (
        base_ctes()
        + f"""
, triples AS ({triples_select()})
SELECT subject,
       COUNT(DISTINCT predicate) AS n_predicates,
       COUNT(*) AS n_values
FROM triples GROUP BY subject"""
    )


def kg_adjacency_lists_sql() -> str:
    return (
        base_ctes()
        + f"""
, triples AS ({triples_select()})
SELECT subject,
       string_agg(predicate || '|' || obj_kind || '|' || obj_value || '|' ||
                  coalesce(obj_type, '') || '|' || coalesce(obj_lang, ''),
                  chr(10) ORDER BY predicate || '|' || obj_kind || '|' || obj_value || '|' ||
                  coalesce(obj_type, '') || '|' || coalesce(obj_lang, '')) AS edges,
       COUNT(*) AS n_edges
FROM triples GROUP BY subject"""
    )


def kg_reverse_adjacency_sql() -> str:
    return (
        base_ctes()
        + f"""
, triples AS ({triples_select()})
SELECT obj_value AS node, COUNT(DISTINCT subject) AS n_in_subjects, COUNT(*) AS n_in_edges
FROM triples WHERE obj_kind = 'iri' GROUP BY obj_value"""
    )


def kg_nquads_sql() -> str:
    return (
        base_ctes()
        + f"""
, triples AS ({triples_select()})
SELECT CASE WHEN subject LIKE '_:%' THEN subject ELSE '<' || subject || '>' END
       || ' <' || predicate || '> '
       || CASE WHEN obj_kind = 'iri'
               THEN CASE WHEN obj_value LIKE '_:%' THEN obj_value
                         ELSE '<' || obj_value || '>' END
               ELSE '"' || replace(replace(obj_value, chr(10), '\\n'), '"', '\\"') || '"'
                    || CASE WHEN obj_lang IS NOT NULL THEN '@' || obj_lang
                            WHEN obj_type IS NOT NULL AND obj_type <> '{XSD_STRING}'
                              THEN '^^<' || obj_type || '>'
                            ELSE '' END
          END
       || ' .' AS line
FROM triples"""
    )


def kg_frame_head_mentions_sql() -> str:
    """Oracle for the frame query {@type: Mention, target: E0}."""
    return (
        base_ctes()
        + f"""
SELECT DISTINCT bnode AS subject FROM linked
WHERE entity_id = '{E.KG}entity/E0'"""
    )


def kg_frame_tool_turn_subgraph_sql() -> str:
    """Oracle for frame_subgraph({@type: Turn, tool: exists}, depth=1):
    all triples of tool-bearing turns plus triples of their direct
    objects (mention bnodes and referenced entities)."""
    return (
        base_ctes()
        + f"""
, triples AS ({triples_select()}),
sel AS (SELECT turn_iri FROM turns WHERE tool IS NOT NULL),
subs AS (
  SELECT turn_iri AS s FROM sel
  UNION
  SELECT bnode FROM linked WHERE turn_iri IN (SELECT turn_iri FROM sel)
  UNION
  SELECT entity_id FROM linked WHERE turn_iri IN (SELECT turn_iri FROM sel)
)
SELECT * FROM triples WHERE subject IN (SELECT s FROM subs)"""
    )


def kg_mention_detection_sql() -> str:
    """Oracle for the standalone mention-detection + linking operator."""
    return (
        base_ctes()
        + """
SELECT conv_id, turn_idx, CAST(j AS INT) AS rank, surface, entity_id
FROM linked"""
    )
