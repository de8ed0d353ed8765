"""Tier-2: distributed N-Quads sink/source round trip."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from jsonld_spark.operators.kg_pipeline import QUAD_COLUMNS, kg_triples
from jsonld_spark.sources.nquads_io import read_nquads, write_nquads

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not available"
)


def test_nquads_roundtrip(tmp_path, spark):
    tri = kg_triples(spark, SF)
    path = str(tmp_path / "quads.nq")
    write_nquads(tri, path)
    back = read_nquads(spark, path)
    assert back.where(F.col("_error").isNotNull()).count() == 0
    a = {tuple(r) for r in tri.select(*QUAD_COLUMNS).collect()}
    b = {tuple(r) for r in back.select(*QUAD_COLUMNS).collect()}
    assert a == b


def test_nquads_error_channel(tmp_path, spark):
    path = str(tmp_path / "mixed.nq")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.nq"), "w") as fh:
        fh.write('<http://ex.org/s> <http://ex.org/p> "v" .\n')
        fh.write("# comment line\n")
        fh.write("\n")
        fh.write("this is not a quad\n")
        fh.write('<http://ex.org/s> <http://ex.org/p> "tagged"@en <http://ex.org/g> .\n')
    out = read_nquads(spark, path)
    good = out.where(F.col("_error").isNull())
    bad = out.where(F.col("_error").isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert bad.first()["_error"] == "this is not a quad"
    tagged = good.where(F.col("obj_lang") == "en").first()
    assert tagged["graph"] == "http://ex.org/g"
    assert tagged["obj_type"] is None


def test_language_tag_case_asymmetry_bug_compat():
    """The serializer emits language tags verbatim (any case) but the
    parser grammar only admits lowercase tags — NQuads.php:87
    `@([a-z]+(?:-[a-z0-9]+)*)` vs the case-preserving serializer
    (NQuads.php:52). Round-tripping an uppercase tag therefore FAILS
    in the reference, and this kernel mirrors that asymmetry."""
    import pytest

    from jsonld_spark.kernel.exceptions import InvalidQuadError
    from jsonld_spark.kernel.nquads import nquads_parse, nquads_serialize
    from jsonld_spark.kernel.rdf import Quad

    q = Quad(None, "http://e/n", "http://e/p", "literal", "x", None, "FR")
    line = nquads_serialize([q])
    assert line.strip() == '<http://e/n> <http://e/p> "x"@FR .'
    with pytest.raises(InvalidQuadError):
        nquads_parse(line)
    # the lowercase form round-trips
    assert list(nquads_parse(line.replace("@FR", "@fr")))[0].obj_lang == "fr"
