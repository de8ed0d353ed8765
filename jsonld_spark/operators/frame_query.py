"""Frame patterns compiled to relational plans on the triple table.

The reference's framing (Processor.php:2558-2768) interprets a frame
as a recursive node-matching program over an in-memory node map. At
scale the same pattern language compiles to native Spark operators on
the (graph, subject, predicate, obj) relation (SURVEY.md §2.3):

  property exists            -> left_semi join on subject
  property must NOT exist [] -> left_anti join on subject
  @type T                    -> semi join on rdf:type triples
  property == value          -> semi join with an object predicate
  subframe (nested pattern)  -> semi join through the edge to subjects
                                matching the subframe (recursed)

``frame_select`` returns the matching subjects; ``frame_subgraph``
additionally pulls every triple of the matched subjects plus their
forward closure to ``depth`` hops — the relational analogue of
@embed subtree embedding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _match_condition(value_spec):
    """Column predicate over (obj_kind, obj_value) for a scalar spec."""
    if isinstance(value_spec, str):
        return F.col("obj_value") == value_spec
    return F.col("obj_value") == F.lit(str(value_spec))


def frame_select(triples: DataFrame, frame: dict) -> DataFrame:
    """Subjects matching the frame pattern. Frame keys:

    * "@type": IRI string — subject must have that rdf:type
    * <predicate>: {}            — property must exist (wildcard)
    * <predicate>: []            — property must NOT exist
    * <predicate>: "value"/num   — some value must equal it
    * <predicate>: {"@frame": {...}} — some object must be a subject
      matching the nested frame (recursive semi-join)
    """
    subjects = triples.select("subject").distinct()
    for prop, spec in frame.items():
        if prop == "@type":
            cond = triples.where(
                (F.col("predicate") == RDF_TYPE) & (F.col("obj_value") == spec)
            )
            subjects = subjects.join(cond.select("subject").distinct(), "subject", "left_semi")
        elif isinstance(spec, list) and len(spec) == 0:
            cond = triples.where(F.col("predicate") == prop)
            subjects = subjects.join(cond.select("subject").distinct(), "subject", "left_anti")
        elif isinstance(spec, dict) and "@frame" in spec:
            inner = frame_select(triples, spec["@frame"]).withColumnRenamed(
                "subject", "obj_value"
            )
            edge = triples.where(
                (F.col("predicate") == prop) & (F.col("obj_kind") == "iri")
            ).join(inner, "obj_value", "left_semi")
            subjects = subjects.join(edge.select("subject").distinct(), "subject", "left_semi")
        elif isinstance(spec, dict) and len(spec) == 0:
            cond = triples.where(F.col("predicate") == prop)
            subjects = subjects.join(cond.select("subject").distinct(), "subject", "left_semi")
        else:
            cond = triples.where((F.col("predicate") == prop) & _match_condition(spec))
            subjects = subjects.join(cond.select("subject").distinct(), "subject", "left_semi")
    return subjects


def frame_subgraph(triples: DataFrame, frame: dict, depth: int = 1) -> DataFrame:
    """All triples of the matched subjects plus their forward closure
    to ``depth`` hops (@embed analogue; each hop is one semi-join)."""
    matched = frame_select(triples, frame)
    frontier = matched
    seen = matched
    for _ in range(depth):
        objs = (
            triples.join(frontier, "subject", "left_semi")
            .where(F.col("obj_kind") == "iri")
            .select(F.col("obj_value").alias("subject"))
            .distinct()
        )
        frontier = objs.join(seen, "subject", "left_anti")
        seen = seen.unionByName(frontier).distinct()
    return triples.join(seen, "subject", "left_semi")
