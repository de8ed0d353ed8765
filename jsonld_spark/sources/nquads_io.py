"""Distributed N-Quads source and sink.

Sink: pure column expressions (operators/kg_pipeline.nquads_lines) +
``write.text`` — stays in whole-stage codegen end to end.

Source: ``spark.read.text`` + the same composed W3C n-quads regex the
kernel parser uses (reference: NQuads.php:77-175), evaluated with
``regexp_extract`` column expressions — a JVM-side line parser with an
error channel for invalid lines (the reference throws on the first bad
line; a 100 TB ingest wants the bad-line channel instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonld_spark.kernel.nquads import IGNORE_REGEX, QUAD_REGEX
from jsonld_spark.kernel.rdf import XSD_STRING
from jsonld_spark.operators.kg_pipeline import nquads_lines

# regexp_extract group indexes follow kernel.nquads.QUAD_REGEX:
# 1 subj-iri, 2 subj-bnode, 3 pred, 4 obj-iri, 5 obj-bnode, 6 literal,
# 7 datatype, 8 language, 9 graph-iri, 10 graph-bnode
_PATTERN = QUAD_REGEX.pattern


def write_nquads(triples: DataFrame, path: str) -> None:
    nquads_lines(triples).write.mode("overwrite").text(path)


def read_nquads(spark: SparkSession, path: str) -> DataFrame:
    """Parse N-Quads text into the canonical quad schema; lines that
    match neither the quad grammar nor blank/comment go to the
    ``_error`` column."""
    lines = spark.read.text(path)

    def grp(i: int):
        return F.regexp_extract("value", _PATTERN, i)

    def nullify(col):
        return F.when(col != "", col)

    matches = lines.withColumn("_is_quad", F.col("value").rlike(_PATTERN)).withColumn(
        "_ignorable", F.col("value").rlike(IGNORE_REGEX.pattern)
    )
    parsed = matches.select(
        F.when(F.col("_is_quad"), F.coalesce(nullify(grp(9)), nullify(grp(10)))).alias("graph"),
        F.when(F.col("_is_quad"), F.coalesce(nullify(grp(1)), nullify(grp(2)))).alias("subject"),
        F.when(F.col("_is_quad"), grp(3)).alias("predicate"),
        F.when(F.col("_is_quad"), F.when(
            (grp(4) != "") | (grp(5) != ""), F.lit("iri")
        ).otherwise(F.lit("literal"))).alias("obj_kind"),
        F.when(F.col("_is_quad"), F.coalesce(
            nullify(grp(4)), nullify(grp(5)),
            _unescape(grp(6)),
        )).alias("obj_value"),
        F.when(F.col("_is_quad") & (grp(5) == "") & (grp(4) == ""),
               F.when(nullify(grp(7)).isNotNull(), grp(7))
               .when(nullify(grp(8)).isNotNull(), F.lit(None).cast("string"))
               .otherwise(F.lit(XSD_STRING))).alias("obj_type"),
        F.when(F.col("_is_quad"), nullify(grp(8))).alias("obj_lang"),
        F.when(~F.col("_is_quad") & ~F.col("_ignorable"), F.col("value")).alias("_error"),
        F.col("_ignorable"),
    )
    return parsed.where(~F.col("_ignorable") | F.col("_error").isNotNull()).drop("_ignorable")


def _unescape(col):
    # reference unescape table (NQuads.php:145-149)
    out = F.regexp_replace(col, r"\\t", "\t")
    out = F.regexp_replace(out, r"\\n", "\n")
    out = F.regexp_replace(out, r"\\r", "\r")
    out = F.regexp_replace(out, r'\\"', '"')
    out = F.regexp_replace(out, r"\\\\", "\\\\")
    return out
