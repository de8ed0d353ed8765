"""Manifest iterator + runner for the W3C-style conformance fixtures.

Mirrors the reference's harness: Test/TestManifestIterator.php:18-120
walks ``*-manifest.jsonld`` files yielding (name, test, options) with a
per-test base IRI (W3CTestSuiteTest.php:92-98); the comparison methods
are golden ksort-normalized JSON equality for expand/flatten/fromRdf
(JsonTestCase.php:29-63) and sorted-line set equality for toRdf
(W3CTestSuiteTest.php:317-322).

Used by tests/test_w3c_suite.py (pytest gate) and tools/w3c_report.py
(COVERAGE.md pass-rate + toRdf precision/recall report).
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

FIXTURE_DIR = os.path.join(REPO_ROOT, "tests", "w3c")
KINDS = ("expand", "compact", "flatten", "toRdf", "fromRdf", "remote", "frame",
         "error")


def iter_manifest(kind: str):
    """Yield test entries from manifest-<kind>.jsonld with a derived
    per-test ``base`` (baseIri + input basename, like the reference)."""
    path = os.path.join(FIXTURE_DIR, f"manifest-{kind}.jsonld")
    with open(path, encoding="utf-8") as fh:
        manifest = json.load(fh)
    for entry in manifest["sequence"]:
        entry = dict(entry)
        entry["base"] = manifest["baseIri"] + os.path.basename(entry["input"])
        yield entry


def _read(rel: str) -> str:
    with open(os.path.join(FIXTURE_DIR, rel), encoding="utf-8") as fh:
        return fh.read()


def _norm_json(value) -> str:
    return json.dumps(value, sort_keys=True, ensure_ascii=False)


def _nq_set(text: str) -> set[str]:
    return {line for line in text.split("\n") if line.strip()}


def run_case(kind: str, entry: dict) -> dict:
    """Run one conformance case through the kernel.

    Returns {"ok": bool, "actual": ..., "expected": ...}; for toRdf the
    actual/expected are quad-line sets (for P/R accounting).
    """
    from jsonld_spark.kernel import api
    from jsonld_spark.kernel.exceptions import JsonLdError
    from jsonld_spark.kernel.nquads import nquads_parse

    doc = _read(entry["input"])
    opts = entry.get("option", {})
    base = entry["base"]

    if kind == "remote":
        from jsonld_spark.sources.loader import CachingLoader

        pinned = {url: json.loads(_read(rel))
                  for url, rel in entry.get("contexts", {}).items()}
        loader = CachingLoader(pinned=pinned, fetchers=())
        if "expectErrorCode" in entry:
            try:
                api.expand(doc, base=base, loader=loader)
            except JsonLdError as exc:
                return {"ok": exc.code == entry["expectErrorCode"],
                        "actual": exc.code, "expected": entry["expectErrorCode"]}
            return {"ok": False, "actual": "(no error)",
                    "expected": entry["expectErrorCode"]}
        actual = api.expand(doc, base=base, loader=loader)
        expected = json.loads(_read(entry["expect"]))
        return {"ok": _norm_json(actual) == _norm_json(expected),
                "actual": actual, "expected": expected}

    if kind == "frame":
        frame_text = _read(entry["frame"])
        if "expectErrorCode" in entry:
            try:
                api.frame(doc, frame_text, base=base)
            except JsonLdError as exc:
                return {"ok": exc.code == entry["expectErrorCode"],
                        "actual": exc.code, "expected": entry["expectErrorCode"]}
            return {"ok": False, "actual": "(no error)",
                    "expected": entry["expectErrorCode"]}
        actual = api.frame(doc, frame_text, base=base)
        expected = json.loads(_read(entry["expect"]))
        return {"ok": _norm_json(actual) == _norm_json(expected),
                "actual": actual, "expected": expected}

    if kind == "error":
        # errors may surface in expand, flatten (node-map generation),
        # or compact — mirroring the official suite, where negative
        # tests exist per API (reference replays them through the same
        # entry points, W3CTestSuiteTest.php:224-244)
        api_kind = entry.get("api", "expand")
        try:
            if api_kind == "flatten":
                api.flatten(doc, base=base)
            elif api_kind == "compact":
                api.compact(doc, context=_read(entry["context"]), base=base)
            else:
                api.expand(doc, base=base)
        except JsonLdError as exc:
            return {"ok": exc.code == entry["expectErrorCode"],
                    "actual": exc.code, "expected": entry["expectErrorCode"]}
        return {"ok": False, "actual": "(no error)",
                "expected": entry["expectErrorCode"]}

    if kind == "toRdf":
        actual = _nq_set(api.to_rdf(
            doc, base=base,
            produce_generalized_rdf=opts.get("produceGeneralizedRdf", False)))
        expected = _nq_set(_read(entry["expect"]))
        return {"ok": actual == expected, "actual": actual, "expected": expected}

    if kind == "fromRdf":
        quads = nquads_parse(doc)
        actual = api.from_rdf(quads,
                              use_native_types=opts.get("useNativeTypes", False),
                              use_rdf_type=opts.get("useRdfType", False))
    elif kind == "compact":
        actual = api.compact(
            doc, context=_read(entry["context"]), base=base,
            compact_arrays=opts.get("compactArrays", True))
    elif kind == "expand":
        actual = api.expand(doc, base=base)
    elif kind == "flatten":
        # flatten(input, context): compacts the flattened array and
        # ALWAYS wraps it under @graph (JsonLD.php:352-367)
        ctx = _read(entry["context"]) if "context" in entry else None
        actual = api.flatten(doc, context=ctx, base=base)
    else:  # pragma: no cover
        raise ValueError(kind)

    expected = json.loads(_read(entry["expect"]))
    return {"ok": _norm_json(actual) == _norm_json(expected),
            "actual": actual, "expected": expected}


def run_all() -> dict:
    """Run every kind; return per-kind results + micro-averaged toRdf
    precision/recall over (test, quad-line) pairs."""
    results: dict = {"kinds": {}, "tordf_pr": None}
    emitted = golden = inter = 0
    for kind in KINDS:
        cases = []
        for entry in iter_manifest(kind):
            try:
                res = run_case(kind, entry)
            except Exception as exc:  # kernel crash = failure, not harness abort
                res = {"ok": False, "actual": f"(exception: {exc})", "expected": "?"}
            cases.append({"id": entry["@id"], "name": entry["name"], "ok": res["ok"],
                          "detail": res})
            if kind == "toRdf" and isinstance(res.get("actual"), set):
                emitted += len(res["actual"])
                golden += len(res["expected"])
                inter += len(res["actual"] & res["expected"])
        results["kinds"][kind] = cases
    precision = inter / emitted if emitted else 1.0
    recall = inter / golden if golden else 1.0
    results["tordf_pr"] = {"precision": precision, "recall": recall,
                           "emitted": emitted, "golden": golden, "matched": inter}
    return results
