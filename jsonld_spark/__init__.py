"""jsonld_spark — a PySpark-native knowledge-graph construction engine.

Re-creates the query/data-processing capabilities of lanthaler/JsonLD
(a W3C JSON-LD 1.0 processor, reference at /root/reference) as an
idiomatic Spark pipeline: pure-Python JSON-LD kernels (expansion,
node-map flattening, RDF quad emission) are applied as vectorized
pandas/Arrow UDF stages over DataFrames of conversation transcripts,
and everything relational (dedup, joins, canonicalization, windows,
sinks) is expressed with native pyspark.sql so Catalyst/Tungsten/AQE
pick the physical plan.

Layout:
  kernel/     pure-Python JSON-LD 1.0 algorithms (no Spark dependency)
  operators/  Spark DataFrame stages (extraction, pipeline, dedup, ...)
  sources/    synthetic transcript generator, snapshot tables, N-Quads IO
  functions/  reusable column expressions
  plans/      SparkSession builders and plan inspection helpers
  streaming/  incremental/resume execution
"""

__version__ = "0.1.0"
