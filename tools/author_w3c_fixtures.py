"""Materialize the W3C-style JSON-LD 1.0 conformance fixture set.

The sandbox has no network and no PHP runtime, so the official
json-ld.org test-suite files (reference dev-dep ``json-ld/tests: 1.0``,
/root/reference/composer.json:24) cannot be vendored verbatim and the
reference cannot be executed to produce goldens. This module therefore
AUTHORS an equivalent manifest-driven fixture set from public JSON-LD
1.0 spec knowledge, with every expected output hand-derived from the
reference implementation's source:

* expand semantics  — Processor.php:313-809 (free-floating drop
  :502-509, empty-array preservation :2868-2871, language-map key
  lowercasing :427 — the ONLY strtolower in the codebase, value
  @language preserved verbatim otherwise)
* flatten semantics — Processor.php:1896-2055 + 2088-2119 (bnode
  first-visit counter :2069-2079, @id-only pruning :2969-2972)
* toRdf semantics   — Processor.php:2130-2261 + Value.php:69-112
  (%1.15E + trailing-zero compression; integral floats -> xsd:integer
  unless @type xsd:double) + NQuads.php:25-66 (only \\n and \" are
  escaped — bug-compat lossy escaping; xsd:string suppressed)
* fromRdf semantics — Processor.php:2274-2466
* error taxonomy    — Exception/JsonLdException.php:24-218

Manifest + per-test file layout mirrors the official suite
(TestManifestIterator.php:18-120; per-test base IRI derivation
W3CTestSuiteTest.php:92-98). Run ``python tools/author_w3c_fixtures.py``
to (re)write tests/w3c/**; the generated files are committed so the
suite is plain data at test time.
"""

from __future__ import annotations

import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "w3c")
BASE = "https://w3c.example.org/tests/"
EX = "http://example.com/"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

# --------------------------------------------------------------------------
# expand tests: (name, input, expected) — expected key order is
# insignificant (the harness ksort-normalizes, JsonTestCase.php:29-63);
# ARRAY order is significant.
# --------------------------------------------------------------------------

EXPAND = [
    (
        "term to IRI mapping",
        {"@context": {"name": "http://xmlns.com/foaf/0.1/name"},
         "@id": EX + "p", "name": "Alice"},
        [{"@id": EX + "p",
          "http://xmlns.com/foaf/0.1/name": [{"@value": "Alice"}]}],
    ),
    (
        "@vocab expansion",
        {"@context": {"@vocab": EX + "vocab#"},
         "@id": EX + "p", "name": "Bob", "age": 42},
        [{"@id": EX + "p",
          EX + "vocab#age": [{"@value": 42}],
          EX + "vocab#name": [{"@value": "Bob"}]}],
    ),
    (
        "compact IRI (CURIE) keys and nested node objects",
        {"@context": {"foaf": "http://xmlns.com/foaf/0.1/"},
         "@id": EX + "p", "foaf:name": "C", "foaf:knows": {"foaf:name": "D"}},
        [{"@id": EX + "p",
          "http://xmlns.com/foaf/0.1/knows":
              [{"http://xmlns.com/foaf/0.1/name": [{"@value": "D"}]}],
          "http://xmlns.com/foaf/0.1/name": [{"@value": "C"}]}],
    ),
    (
        "relative IRI resolution against the document base",
        {"@context": {"p": {"@id": EX + "p", "@type": "@id"}},
         "@id": "resolved-id", "p": "relative"},
        [{"@id": BASE + "resolved-id",
          EX + "p": [{"@id": BASE + "relative"}]}],
    ),
    (
        "@type coercion to a datatype IRI",
        {"@context": {"e": EX, "e:date": {"@type": XSD + "dateTime"}},
         "@id": EX + "doc", "e:date": "2011-01-25T00:00:00Z"},
        [{"@id": EX + "doc",
          EX + "date": [{"@value": "2011-01-25T00:00:00Z",
                         "@type": XSD + "dateTime"}]}],
    ),
    (
        "default @language applies to strings only",
        {"@context": {"@language": "en", "label": EX + "label", "e": EX},
         "@id": EX + "n", "label": "hello", "e:num": 42},
        [{"@id": EX + "n",
          EX + "label": [{"@value": "hello", "@language": "en"}],
          EX + "num": [{"@value": 42}]}],
    ),
    (
        "@list container",
        {"@context": {"list": {"@id": EX + "list", "@container": "@list"}},
         "@id": EX + "id", "list": ["a", "b"]},
        [{"@id": EX + "id",
          EX + "list": [{"@list": [{"@value": "a"}, {"@value": "b"}]}]}],
    ),
    (
        "@set elision and null value removal",
        {"@context": {"p": {"@id": EX + "p", "@container": "@set"}},
         "@id": EX + "id", "p": {"@set": ["v", None]}},
        [{"@id": EX + "id", EX + "p": [{"@value": "v"}]}],
    ),
    (
        "@language container map (keys lowercased, document order)",
        {"@context": {"label": {"@id": EX + "label", "@container": "@language"}},
         "@id": EX + "id",
         "label": {"DE": ["Die Königin", "Ihre Majestät"], "en": "The Queen"}},
        [{"@id": EX + "id",
          EX + "label": [{"@value": "Die Königin", "@language": "de"},
                         {"@value": "Ihre Majestät", "@language": "de"},
                         {"@value": "The Queen", "@language": "en"}]}],
    ),
    (
        "@index container map (document order, @index kept)",
        {"@context": {"p": {"@id": EX + "p", "@container": "@index"}},
         "@id": EX + "id", "p": {"A": "a", "B": "b"}},
        [{"@id": EX + "id",
          EX + "p": [{"@value": "a", "@index": "A"},
                     {"@value": "b", "@index": "B"}]}],
    ),
    (
        "@reverse term definition",
        {"@context": {"children": {"@reverse": EX + "parent"}},
         "@id": EX + "parent-node", "children": [{"@id": EX + "c1"}]},
        [{"@id": EX + "parent-node",
          "@reverse": {EX + "parent": [{"@id": EX + "c1"}]}}],
    ),
    (
        "@reverse keyword map",
        {"@id": EX + "n", "@reverse": {EX + "p": {"@id": EX + "s"}}},
        [{"@id": EX + "n", "@reverse": {EX + "p": [{"@id": EX + "s"}]}}],
    ),
    (
        "top-level @graph unwrap",
        {"@context": {"p": EX + "p"},
         "@graph": [{"@id": EX + "a", "p": "1"}, {"@id": EX + "b", "p": "2"}]},
        [{"@id": EX + "a", EX + "p": [{"@value": "1"}]},
         {"@id": EX + "b", EX + "p": [{"@value": "2"}]}],
    ),
    (
        "named graph",
        {"@context": {"p": EX + "p"},
         "@id": EX + "g1", "@graph": [{"@id": EX + "a", "p": "v"}]},
        [{"@id": EX + "g1",
          "@graph": [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}]}],
    ),
    (
        "keyword aliases",
        {"@context": {"id": "@id", "type": "@type", "ex": EX},
         "id": EX + "n", "type": "ex:Type", "ex:p": "v"},
        [{"@id": EX + "n", "@type": [EX + "Type"],
          EX + "p": [{"@value": "v"}]}],
    ),
    (
        "null context resets term definitions and defaults",
        {"@context": [{"@vocab": EX, "@language": "en"}, None],
         "@id": EX + "n", EX + "p": "v"},
        [{"@id": EX + "n", EX + "p": [{"@value": "v"}]}],
    ),
    (
        "free-floating values and @id-only nodes are dropped",
        ["free floating string",
         {"@value": "free floating value"},
         {"@id": EX + "alone"},
         {},
         {"@id": EX + "n", EX + "p": "v"}],
        [{"@id": EX + "n", EX + "p": [{"@value": "v"}]}],
    ),
    (
        "native JSON types preserved; null properties removed",
        {"@context": {"e": EX},
         "@id": EX + "n", "e:int": 42, "e:double": 4.2, "e:bool": True,
         "e:null": None},
        [{"@id": EX + "n",
          EX + "bool": [{"@value": True}],
          EX + "double": [{"@value": 4.2}],
          EX + "int": [{"@value": 42}]}],
    ),
    (
        "@language case preserved verbatim in value objects",
        {"@id": EX + "n", EX + "p": {"@value": "v", "@language": "EN-us"}},
        [{"@id": EX + "n",
          EX + "p": [{"@value": "v", "@language": "EN-us"}]}],
    ),
    (
        "term definitions may chain through other terms",
        {"@context": {"ex": EX, "p": "ex:p", "sub": {"@id": "p"}},
         "@id": EX + "n", "sub": "v"},
        [{"@id": EX + "n", EX + "p": [{"@value": "v"}]}],
    ),
    (
        "@list container with @type @id coercion resolves entries",
        {"@context": {"p": {"@id": EX + "p", "@container": "@list",
                            "@type": "@id"}},
         "@id": EX + "n", "p": [EX + "a", "rel"]},
        [{"@id": EX + "n",
          EX + "p": [{"@list": [{"@id": EX + "a"},
                                {"@id": BASE + "rel"}]}]}],
    ),
    (
        "blank node identifiers pass through unchanged",
        {"@id": "_:b1", "@type": [EX + "T1", EX + "T2"],
         EX + "p": {"@id": "_:b2"}},
        [{"@id": "_:b1", "@type": [EX + "T1", EX + "T2"],
          EX + "p": [{"@id": "_:b2"}]}],
    ),
    (
        "@type values expand vocab-relative (CURIE)",
        {"@context": {"dc": "http://purl.org/dc/terms/"},
         "@id": EX + "n", "@type": "dc:Agent"},
        [{"@id": EX + "n", "@type": ["http://purl.org/dc/terms/Agent"]}],
    ),
    (
        "nested arrays are flattened",
        {"@context": {"p": EX + "p"},
         "@id": EX + "n", "p": [["a", "b"], "c"]},
        [{"@id": EX + "n",
          EX + "p": [{"@value": "a"}, {"@value": "b"}, {"@value": "c"}]}],
    ),
    (
        "terms mapped to null drop their keys",
        {"@context": {"skip": None, "keep": EX + "keep"},
         "@id": EX + "n", "skip": "x", "keep": "y"},
        [{"@id": EX + "n", EX + "keep": [{"@value": "y"}]}],
    ),
    (
        "keys that are relative IRIs are dropped without @vocab",
        {"@id": EX + "n", "relativeprop": "x", EX + "p": "y"},
        [{"@id": EX + "n", EX + "p": [{"@value": "y"}]}],
    ),
    (
        "@index is preserved on node objects",
        {"@id": EX + "n", EX + "p": {"@id": EX + "o", "@index": "idx"}},
        [{"@id": EX + "n", EX + "p": [{"@id": EX + "o", "@index": "idx"}]}],
    ),
    (
        "empty arrays are preserved in expansion",
        {"@id": EX + "n", EX + "p": [], EX + "q": "v"},
        [{"@id": EX + "n", EX + "p": [], EX + "q": [{"@value": "v"}]}],
    ),
    (
        # expansion merges with alwaysArray only (Processor.php:493 — the
        # `true` is $alwaysArray, not $unique); dedup happens later in
        # generateNodeMap (:1977). See the flatten fixture for the dedup.
        "duplicate values are NOT merged during expansion",
        {"@id": EX + "n", EX + "p": ["v", "v", {"@value": "v"}]},
        [{"@id": EX + "n",
          EX + "p": [{"@value": "v"}, {"@value": "v"}, {"@value": "v"}]}],
    ),
    (
        "unlabeled blank nodes never compare equal on merge",
        {"@id": EX + "n",
         EX + "p": [{EX + "q": "v"}, {EX + "q": "v"}]},
        [{"@id": EX + "n",
          EX + "p": [{EX + "q": [{"@value": "v"}]},
                     {EX + "q": [{"@value": "v"}]}]}],
    ),
]

# --------------------------------------------------------------------------
# flatten tests: (name, input, expected) — output array order is the
# ksort order of node ids (Processor.php:2106-2114).
# --------------------------------------------------------------------------

FLATTEN = [
    (
        "nodes merge by @id and sort",
        {"@context": {"p": EX + "p",
                      "knows": {"@id": EX + "knows", "@type": "@id"}},
         "@graph": [{"@id": EX + "b", "knows": EX + "a"},
                    {"@id": EX + "a", "p": "v"}]},
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}]},
         {"@id": EX + "b", EX + "knows": [{"@id": EX + "a"}]}],
    ),
    (
        "blank nodes relabel in first-visit order",
        {EX + "p": {EX + "q": "v"}},
        [{"@id": "_:b0", EX + "p": [{"@id": "_:b1"}]},
         {"@id": "_:b1", EX + "q": [{"@value": "v"}]}],
    ),
    (
        "named graphs nest under their graph-name node",
        {"@id": EX + "g", "@graph": [{"@id": EX + "a", EX + "p": "v"}]},
        [{"@id": EX + "g",
          "@graph": [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}]}],
    ),
    (
        "@id-only nodes are pruned from the output",
        {"@id": EX + "n", EX + "p": {"@id": EX + "only"}},
        [{"@id": EX + "n", EX + "p": [{"@id": EX + "only"}]}],
    ),
    (
        "@reverse edges are redistributed to the pointing node",
        {"@id": EX + "a",
         "@reverse": {EX + "p": {"@id": EX + "b", EX + "q": "v"}}},
        [{"@id": EX + "b", EX + "p": [{"@id": EX + "a"}],
          EX + "q": [{"@value": "v"}]}],
    ),
    (
        "@list values survive the node map",
        {"@id": EX + "n", EX + "p": {"@list": ["a"]}},
        [{"@id": EX + "n", EX + "p": [{"@list": [{"@value": "a"}]}]}],
    ),
    (
        "blank node @type values are relabeled",
        {"@id": EX + "n", "@type": "_:t"},
        [{"@id": EX + "n", "@type": ["_:b0"]}],
    ),
    (
        "duplicate values dedup in the node map",
        {"@id": EX + "n", EX + "p": ["v", "v", {"@value": "v"}]},
        [{"@id": EX + "n", EX + "p": [{"@value": "v"}]}],
    ),
    (
        "split node definitions merge",
        [{"@id": EX + "a", EX + "p": "1"},
         {"@id": EX + "a", EX + "q": "2"}],
        [{"@id": EX + "a", EX + "p": [{"@value": "1"}],
          EX + "q": [{"@value": "2"}]}],
    ),
    (
        "embedded node objects are split out and referenced",
        {"@id": EX + "n",
         EX + "p": [{EX + "q": "v"}, {EX + "q": "v"}]},
        [{"@id": "_:b0", EX + "q": [{"@value": "v"}]},
         {"@id": "_:b1", EX + "q": [{"@value": "v"}]},
         {"@id": EX + "n", EX + "p": [{"@id": "_:b0"}, {"@id": "_:b1"}]}],
    ),
]

# --------------------------------------------------------------------------
# compact tests: (name, input-expanded, context, expected, options) —
# expected includes the re-attached @context (JsonLD.php:277-300).
# --------------------------------------------------------------------------

COMPACT = [
    (
        "term compaction folds single values to scalars",
        [{"@id": EX + "a", EX + "name": [{"@value": "x"}]}],
        {"name": EX + "name"},
        {"@context": {"name": EX + "name"},
         "@id": EX + "a", "name": "x"},
        {},
    ),
    (
        "CURIE compaction applies to keys, @id and @type",
        [{"@id": EX + "a", "@type": [EX + "T"], EX + "p": [{"@value": "v"}]}],
        {"ex": EX},
        {"@context": {"ex": EX},
         "@id": "ex:a", "@type": "ex:T", "ex:p": "v"},
        {},
    ),
    (
        "@type coercion collapses typed values",
        [{"@id": EX + "a",
          EX + "date": [{"@value": "2011-01-25T00:00:00Z",
                         "@type": XSD + "dateTime"}]}],
        {"date": {"@id": EX + "date", "@type": XSD + "dateTime"}},
        {"@context": {"date": {"@id": EX + "date", "@type": XSD + "dateTime"}},
         "@id": EX + "a", "date": "2011-01-25T00:00:00Z"},
        {},
    ),
    (
        "@language container regroups into a language map",
        [{"@id": EX + "a",
          EX + "label": [{"@value": "Die Königin", "@language": "de"},
                         {"@value": "The Queen", "@language": "en"}]}],
        {"label": {"@id": EX + "label", "@container": "@language"}},
        {"@context": {"label": {"@id": EX + "label", "@container": "@language"}},
         "@id": EX + "a",
         "label": {"de": "Die Königin", "en": "The Queen"}},
        {},
    ),
    (
        "@list container collapses the list object",
        [{"@id": EX + "a",
          EX + "list": [{"@list": [{"@value": "a"}, {"@value": "b"}]}]}],
        {"list": {"@id": EX + "list", "@container": "@list"}},
        {"@context": {"list": {"@id": EX + "list", "@container": "@list"}},
         "@id": EX + "a", "list": ["a", "b"]},
        {},
    ),
    (
        "@reverse terms with @type @id compact to strings",
        [{"@id": EX + "p",
          "@reverse": {EX + "parent": [{"@id": EX + "c1"}]}}],
        {"children": {"@reverse": EX + "parent", "@type": "@id"}},
        {"@context": {"children": {"@reverse": EX + "parent", "@type": "@id"}},
         "@id": EX + "p", "children": EX + "c1"},
        {},
    ),
    (
        "multiple top-level nodes wrap in @graph",
        [{"@id": EX + "a", EX + "p": [{"@value": "1"}]},
         {"@id": EX + "b", EX + "p": [{"@value": "2"}]}],
        {"p": EX + "p"},
        {"@context": {"p": EX + "p"},
         "@graph": [{"@id": EX + "a", "p": "1"},
                    {"@id": EX + "b", "p": "2"}]},
        {},
    ),
    (
        "keyword aliases apply on output",
        [{"@id": EX + "a", "@type": [EX + "T"]}],
        {"id": "@id", "type": "@type", "ex": EX},
        {"@context": {"id": "@id", "type": "@type", "ex": EX},
         "id": "ex:a", "type": "ex:T"},
        {},
    ),
    (
        "compactArrays=false keeps arrays and the @graph wrapper",
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}],
        {"p": EX + "p"},
        {"@context": {"p": EX + "p"},
         "@graph": [{"@id": EX + "a", "p": ["v"]}]},
        {"compactArrays": False},
    ),
    (
        "shortest term wins for equal IRIs",
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}],
        {"longname": EX + "p", "q": EX + "p"},
        {"@context": {"longname": EX + "p", "q": EX + "p"},
         "@id": EX + "a", "q": "v"},
        {},
    ),
]

# --------------------------------------------------------------------------
# toRdf tests: (name, input, expected-lines, options) — compared as
# sorted line SETS (W3CTestSuiteTest.php:317-322).
# --------------------------------------------------------------------------

RDF_TYPE_IRI = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"

# --- inverse-context tie-break + slot-claim rules (Processor.php:1820-1878:
# uksort by sortTerms = length-then-strcmp; first sorted term claims each
# slot; reverse terms are EXCLUDED from the iri->term slot :1847) ----------

COMPACT += [
    (
        "equal-length terms tie-break lexicographically",
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}],
        {"tb": EX + "p", "ta": EX + "p"},
        {"@context": {"tb": EX + "p", "ta": EX + "p"},
         "@id": EX + "a", "ta": "v"},
        {},
    ),
    (
        "reverse terms never claim the forward term slot",
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}],
        {"r": {"@reverse": EX + "p"}, "prop": EX + "p"},
        {"@context": {"r": {"@reverse": EX + "p"}, "prop": EX + "p"},
         "@id": EX + "a", "prop": "v"},
        {},
    ),
    (
        "a reverse-only term leaves forward uses on the full IRI",
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}],
        {"r": {"@reverse": EX + "p"}},
        {"@context": {"r": {"@reverse": EX + "p"}},
         "@id": EX + "a", EX + "p": "v"},
        {},
    ),
    (
        "@id-coerced terms still claim the term slot for @type values",
        [{"@id": EX + "a", "@type": [EX + "vocab#Type"]}],
        {"T": {"@id": EX + "vocab#Type", "@type": "@id"}},
        {"@context": {"T": {"@id": EX + "vocab#Type", "@type": "@id"}},
         "@id": EX + "a", "@type": "T"},
        {},
    ),
    (
        "untyped terms implicitly match the context default language",
        [{"@id": EX + "a",
          EX + "p": [{"@value": "hello", "@language": "en"}]}],
        {"@language": "en", "t": EX + "p"},
        {"@context": {"@language": "en", "t": EX + "p"},
         "@id": EX + "a", "t": "hello"},
        {},
    ),
    (
        "values in another language keep the object under the term",
        [{"@id": EX + "a",
          EX + "p": [{"@value": "hallo", "@language": "de"}]}],
        {"@language": "en", "t": EX + "p"},
        {"@context": {"@language": "en", "t": EX + "p"},
         "@id": EX + "a", "t": {"@value": "hallo", "@language": "de"}},
        {},
    ),
    (
        "@index on an uncompactable value survives through its alias",
        [{"@id": EX + "a",
          EX + "p": [{"@value": 5, "@index": "k"}]}],
        {"t": EX + "p", "idx": "@index"},
        {"@context": {"t": EX + "p", "idx": "@index"},
         "@id": EX + "a", "t": {"@value": 5, "idx": "k"}},
        {},
    ),
]

TORDF = [
    (
        "plain string literal (xsd:string suppressed)",
        {"@id": EX + "n", EX + "p": "v"},
        [f'<{EX}n> <{EX}p> "v" .'],
        {},
    ),
    (
        "native integer",
        {"@id": EX + "n", EX + "p": 42},
        [f'<{EX}n> <{EX}p> "42"^^<{XSD}integer> .'],
        {},
    ),
    (
        "canonical double formatting",
        {"@id": EX + "n", EX + "d1": 4.2, EX + "d2": 5.3,
         EX + "d3": 1e24, EX + "d4": 1.0e-7},
        [f'<{EX}n> <{EX}d1> "4.2E0"^^<{XSD}double> .',
         f'<{EX}n> <{EX}d2> "5.3E0"^^<{XSD}double> .',
         f'<{EX}n> <{EX}d3> "1.0E24"^^<{XSD}double> .',
         f'<{EX}n> <{EX}d4> "1.0E-7"^^<{XSD}double> .'],
        {},
    ),
    (
        "integral float becomes xsd:integer",
        {"@id": EX + "n", EX + "p": 4.0},
        [f'<{EX}n> <{EX}p> "4"^^<{XSD}integer> .'],
        {},
    ),
    (
        "booleans",
        {"@id": EX + "n", EX + "t": True, EX + "f": False},
        [f'<{EX}n> <{EX}t> "true"^^<{XSD}boolean> .',
         f'<{EX}n> <{EX}f> "false"^^<{XSD}boolean> .'],
        {},
    ),
    (
        "language-tagged strings keep their tag verbatim",
        {"@id": EX + "n",
         EX + "p": {"@value": "hi", "@language": "en"},
         EX + "q": {"@value": "x", "@language": "EN-us"}},
        [f'<{EX}n> <{EX}p> "hi"@en .',
         f'<{EX}n> <{EX}q> "x"@EN-us .'],
        {},
    ),
    (
        "blank node labels assigned in first-visit sorted order",
        {EX + "p": [{EX + "q": "a"}, {EX + "q": "b"}]},
        [f'_:b0 <{EX}p> _:b1 .',
         f'_:b0 <{EX}p> _:b2 .',
         f'_:b1 <{EX}q> "a" .',
         f'_:b2 <{EX}q> "b" .'],
        {},
    ),
    (
        "@list becomes an rdf:first/rdf:rest chain",
        {"@id": EX + "n", EX + "p": {"@list": ["a", "b"]}},
        [f'<{EX}n> <{EX}p> _:b0 .',
         f'_:b0 <{RDF_FIRST}> "a" .',
         f'_:b0 <{RDF_REST}> _:b1 .',
         f'_:b1 <{RDF_FIRST}> "b" .',
         f'_:b1 <{RDF_REST}> <{RDF_NIL}> .'],
        {},
    ),
    (
        "empty @list is rdf:nil",
        {"@id": EX + "n", EX + "p": {"@list": []}},
        [f'<{EX}n> <{EX}p> <{RDF_NIL}> .'],
        {},
    ),
    (
        "named graphs emit the graph term",
        {"@id": EX + "g", "@graph": [{"@id": EX + "a", EX + "p": "v"}]},
        [f'<{EX}a> <{EX}p> "v" <{EX}g> .'],
        {},
    ),
    (
        "blank node predicates are dropped by default",
        {"@id": EX + "n", "_:p": "v"},
        [],
        {},
    ),
    (
        # blank predicates are relabeled by the node-map counter
        # (Processor.php:2044-2046) before the generalized-RDF gate
        "blank node predicates survive with produceGeneralizedRdf",
        {"@id": EX + "n", "_:p": "v"},
        [f'<{EX}n> _:b0 "v" .'],
        {"produceGeneralizedRdf": True},
    ),
    (
        "@type maps to rdf:type",
        {"@id": EX + "n", "@type": EX + "T"},
        [f'<{EX}n> <{RDF_TYPE_IRI}> <{EX}T> .'],
        {},
    ),
    (
        "integral value with explicit xsd:double type",
        {"@id": EX + "n",
         EX + "p": {"@value": 4, "@type": XSD + "double"}},
        [f'<{EX}n> <{EX}p> "4.0E0"^^<{XSD}double> .'],
        {},
    ),
    (
        # PHP: -0.0 == (int)-0.0 -> sprintf('%d') drops the sign;
        # with an explicit xsd:double type the %1.15E path keeps it
        "negative zero: integer path drops the sign, double keeps it",
        {"@id": EX + "n", EX + "p": -0.0,
         EX + "q": {"@value": -0.0, "@type": XSD + "double"}},
        [f'<{EX}n> <{EX}p> "0"^^<{XSD}integer> .',
         f'<{EX}n> <{EX}q> "-0.0E0"^^<{XSD}double> .'],
        {},
    ),
    (
        "only newline and quote are escaped (bug-compat)",
        {"@id": EX + "n", EX + "p": 'line1\nsay "hi" \\ tab\there'},
        [f'<{EX}n> <{EX}p> "line1\\nsay \\"hi\\" \\ tab\there" .'],
        {},
    ),
    (
        "explicit xsd:string type is suppressed in N-Quads",
        {"@id": EX + "n", EX + "p": {"@value": "v", "@type": XSD + "string"}},
        [f'<{EX}n> <{EX}p> "v" .'],
        {},
    ),
    (
        "@reverse emits the reversed triple",
        {"@id": EX + "a", "@reverse": {EX + "p": {"@id": EX + "b"}}},
        [f'<{EX}b> <{EX}p> <{EX}a> .'],
        {},
    ),
    (
        "kitchen sink: types, lists, graphs, literals",
        {"@context": {"v": EX + "vocab#", "@language": "en"},
         "@id": EX + "doc", "@type": "v:Document",
         "v:title": "The Title",
         "v:rank": 3,
         "v:score": 0.5,
         "v:steps": {"@list": [{"@id": EX + "s1"}, {"@id": EX + "s2"}]}},
        [f'<{EX}doc> <{RDF_TYPE_IRI}> <{EX}vocab#Document> .',
         f'<{EX}doc> <{EX}vocab#rank> "3"^^<{XSD}integer> .',
         f'<{EX}doc> <{EX}vocab#score> "5.0E-1"^^<{XSD}double> .',
         f'<{EX}doc> <{EX}vocab#steps> _:b0 .',
         f'<{EX}doc> <{EX}vocab#title> "The Title"@en .',
         f'_:b0 <{RDF_FIRST}> <{EX}s1> .',
         f'_:b0 <{RDF_REST}> _:b1 .',
         f'_:b1 <{RDF_FIRST}> <{EX}s2> .',
         f'_:b1 <{RDF_REST}> <{RDF_NIL}> .'],
        {},
    ),
]

# --------------------------------------------------------------------------
# fromRdf tests: (name, nquads-lines, expected, options)
# --------------------------------------------------------------------------

# --- Value.php boundary quirks (fromJsonLd :83-112) ------------------------

TORDF += [
    (
        # sprintf('%1.15E', 1e15) = "1.000000000000000E+15" carries 15
        # zeros; the strip regex eats AT MOST 14 ("0{0,14}"), so one
        # survives: "1.0E15" (not "1.E15")
        "zero-strip regex stops at 14 zeros (1e15 boundary)",
        {"@id": EX + "n",
         EX + "p": {"@value": 1000000000000000.0, "@type": XSD + "double"}},
        [f'<{EX}n> <{EX}p> "1.0E15"^^<{XSD}double> .'],
        {},
    ),
    (
        # a non-integral value with an explicit xsd:integer type takes
        # the DOUBLE lexical path (value != (int)value) but keeps the
        # integer datatype - @type gets precedence (bug-compat)
        "non-integral xsd:integer value gets a double lexical",
        {"@id": EX + "n",
         EX + "p": {"@value": 4.5, "@type": XSD + "integer"}},
        [f'<{EX}n> <{EX}p> "4.5E0"^^<{XSD}integer> .'],
        {},
    ),
    (
        # member bnodes relabel during node-map generation (_:b0, _:b1);
        # the chain bnodes continue the same issuer (_:b2, _:b3)
        "blank node members chain through fresh list bnodes",
        {"@id": EX + "a",
         EX + "p": {"@list": [{"@id": "_:m0"}, {"@id": "_:m1"}]}},
        [f'<{EX}a> <{EX}p> _:b2 .',
         f'_:b2 <{RDF_FIRST}> _:b0 .',
         f'_:b2 <{RDF_REST}> _:b3 .',
         f'_:b3 <{RDF_FIRST}> _:b1 .',
         f'_:b3 <{RDF_REST}> <{RDF_NIL}> .'],
        {},
    ),
]

FROMRDF = [
    (
        "plain literal",
        [f'<{EX}a> <{EX}p> "v" .'],
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}],
        {},
    ),
    (
        "rdf:type maps to @type",
        [f'<{EX}a> <{RDF_TYPE_IRI}> <{EX}T> .'],
        [{"@id": EX + "a", "@type": [EX + "T"]}],
        {},
    ),
    (
        "rdf list chains reconstruct to @list",
        [f'<{EX}a> <{EX}p> _:l0 .',
         f'_:l0 <{RDF_FIRST}> "x" .',
         f'_:l0 <{RDF_REST}> _:l1 .',
         f'_:l1 <{RDF_FIRST}> "y" .',
         f'_:l1 <{RDF_REST}> <{RDF_NIL}> .'],
        [{"@id": EX + "a",
          EX + "p": [{"@list": [{"@value": "x"}, {"@value": "y"}]}]}],
        {},
    ),
    (
        "useNativeTypes round-trips typed literals",
        [f'<{EX}a> <{EX}i> "42"^^<{XSD}integer> .',
         f'<{EX}a> <{EX}d> "4.2E0"^^<{XSD}double> .',
         f'<{EX}a> <{EX}b> "true"^^<{XSD}boolean> .'],
        [{"@id": EX + "a",
          EX + "b": [{"@value": True}],
          EX + "d": [{"@value": 4.2}],
          EX + "i": [{"@value": 42}]}],
        {"useNativeTypes": True},
    ),
    (
        "a subject quadded in two graphs stays two node objects",
        # the per-graph node maps never merge a subject across graphs
        [f'<{EX}s> <{EX}p> "in-g1" <{EX}g1> .',
         f'<{EX}s> <{EX}q> "in-g2" <{EX}g2> .'],
        [{"@id": EX + "g1",
          "@graph": [{"@id": EX + "s", EX + "p": [{"@value": "in-g1"}]}]},
         {"@id": EX + "g2",
          "@graph": [{"@id": EX + "s", EX + "q": [{"@value": "in-g2"}]}]}],
        {},
    ),
    (
        "malformed native-typed literals stay typed strings",
        # TypedValue.php:93-115: useNativeTypes converts ONLY the exact
        # lexical forms ('true'/'false'; /^[\+|-]?\d+$/ integers) —
        # anything else falls through and keeps its @type
        [f'<{EX}a> <{EX}b> "TRUE"^^<{XSD}boolean> .',
         f'<{EX}a> <{EX}i> "4a"^^<{XSD}integer> .'],
        [{"@id": EX + "a",
          EX + "b": [{"@type": XSD + "boolean", "@value": "TRUE"}],
          EX + "i": [{"@type": XSD + "integer", "@value": "4a"}]}],
        {"useNativeTypes": True},
    ),
    (
        "named graph quads nest under @graph",
        [f'<{EX}a> <{EX}p> "v" <{EX}g> .'],
        [{"@id": EX + "g",
          "@graph": [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}]}],
        {},
    ),
]

# --------------------------------------------------------------------------
# remote tests: (name, input, contexts{url: doc}, expected-or-error)
# — mirrors the reference's remote group (W3CTestSuiteTest.php:172-198):
# remote contexts resolve through the (pinned) document loader;
# negatives assert the loader error taxonomy.
# --------------------------------------------------------------------------

CTX = "https://ctx.example.org/"

# --- nil-object and cycle edges of the list walk (Processor.php:2395-2462:
# EVERY rdf:nil object value becomes {"@list": []} via the usage rewrite;
# a nil reached through rdf:first "continue"s untouched; no-nil cycles
# never enter createListObjects at all) ------------------------------------

FROMRDF += [
    (
        "rdf:nil as a plain object becomes an empty @list",
        [f'<{EX}a> <{EX}p> <{RDF_NIL}> .'],
        [{"@id": EX + "a", EX + "p": [{"@list": []}]}],
        {},
    ),
    (
        "rdf:rest self-cycle without nil survives as plain nodes",
        [f'_:b0 <{RDF_FIRST}> "x" .',
         f'_:b0 <{RDF_REST}> _:b0 .',
         f'<{EX}s> <{EX}p> _:b0 .'],
        [{"@id": "_:b0",
          RDF_FIRST: [{"@value": "x"}],
          RDF_REST: [{"@id": "_:b0"}]},
         {"@id": EX + "s", EX + "p": [{"@id": "_:b0"}]}],
        {},
    ),
    (
        # the (b0, rdf:first, nil) usage hits the RDF_FIRST "continue"
        # and stays a reference; the (b0, rdf:rest, nil) usage then
        # walks b0 into a one-member list containing that reference
        "a list member that is rdf:nil stays a node reference",
        [f'_:b0 <{RDF_FIRST}> <{RDF_NIL}> .',
         f'_:b0 <{RDF_REST}> <{RDF_NIL}> .',
         f'<{EX}s> <{EX}p> _:b0 .'],
        [{"@id": EX + "s",
          EX + "p": [{"@list": [{"@id": RDF_NIL}]}]}],
        {},
    ),
]

REMOTE = [
    (
        "remote @context URL resolves through the loader",
        {"@context": CTX + "v1.jsonld", "@id": EX + "a", "name": "x"},
        {CTX + "v1.jsonld": {"@context": {"name": EX + "name"}}},
        [{"@id": EX + "a", EX + "name": [{"@value": "x"}]}],
        None,
    ),
    (
        "remote contexts may import other remote contexts",
        {"@context": CTX + "outer.jsonld", "@id": EX + "a", "p": "v"},
        {CTX + "outer.jsonld": {"@context": [CTX + "inner.jsonld",
                                             {"p": EX + "p"}]},
         CTX + "inner.jsonld": {"@context": {"q": EX + "q"}}},
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}],
        None,
    ),
    (
        "array of remote and inline contexts folds left-to-right",
        {"@context": [CTX + "v1.jsonld", {"name": EX + "override"}],
         "@id": EX + "a", "name": "x"},
        {CTX + "v1.jsonld": {"@context": {"name": EX + "name"}}},
        [{"@id": EX + "a", EX + "override": [{"@value": "x"}]}],
        None,
    ),
    (
        "unloadable remote context fails with the spec code",
        {"@context": CTX + "missing.jsonld", "@id": EX + "a"},
        {},
        None,
        "loading remote context failed",
    ),
    (
        "cyclic remote context inclusion is detected",
        {"@context": CTX + "a.jsonld", "@id": EX + "a"},
        {CTX + "a.jsonld": {"@context": CTX + "b.jsonld"},
         CTX + "b.jsonld": {"@context": CTX + "a.jsonld"}},
        None,
        "recursive context inclusion",
    ),
    (
        "remote context document without @context is invalid",
        {"@context": CTX + "bad.jsonld", "@id": EX + "a"},
        {CTX + "bad.jsonld": {"name": "no-context-key"}},
        None,
        "invalid remote context",  # Processor.php:1766
    ),
    (
        "relative remote context URLs resolve against the document base",
        # Processor.php:1739: the relative URL resolves through the
        # ACTIVE @base (the document base at this point)
        {"@context": "relctx.jsonld", "@id": EX + "a", "name": "x"},
        {BASE + "relctx.jsonld": {"@context": {"name": EX + "name"}}},
        [{"@id": EX + "a", EX + "name": [{"@value": "x"}]}],
        None,
    ),
    (
        "nested relative refs resolve against the ORIGINAL base (ISSUE-24)",
        # bug-compat: the reference never switches the base to the
        # remote context's own URL — the TODO at Processor.php:1761
        # ("Use the context's IRI as base IRI ... ISSUE-24") is
        # unimplemented, so a relative ref INSIDE a remote context at
        # https://ctx.example.org/dir/outer.jsonld still resolves
        # against the document base, not the dir/ URL
        {"@context": CTX + "dir/outer.jsonld", "@id": EX + "a", "p": "v"},
        {CTX + "dir/outer.jsonld": {"@context": "inner-i24.jsonld"},
         BASE + "inner-i24.jsonld": {"@context": {"p": EX + "p"}}},
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}],
        None,
    ),
    (
        "repeating one remote context at SIBLING level counts as recursion",
        # bug-compat: $remotectxs accumulates across the foreach over
        # one context array (Processor.php:1741-1747), so the second
        # occurrence of the same URL in ["u", "u"] trips the
        # recursive-inclusion check even though nothing recursed
        {"@context": [CTX + "twice.jsonld", CTX + "twice.jsonld"],
         "@id": EX + "a"},
        {CTX + "twice.jsonld": {"@context": {"p": EX + "p"}}},
        None,
        "recursive context inclusion",
    ),
    (
        "relative remote context with a null base fails",
        # Processor.php:1733-1737: @base null + relative remote URL ->
        # INVALID_BASE_IRI, not a loader error
        {"@context": [{"@base": None}, "relctx2.jsonld"], "@id": EX + "a"},
        {},
        None,
        "invalid base IRI",
    ),
    (
        "a remote context may itself hold a context array",
        {"@context": CTX + "arr.jsonld", "@id": EX + "a",
         "p": "v", "q": "w"},
        {CTX + "arr.jsonld": {"@context": [{"p": EX + "p"},
                                           {"q": EX + "q"}]}},
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}],
          EX + "q": [{"@value": "w"}]}],
        None,
    ),
    (
        "@base inside a remote context is ignored",
        # Processor.php:1543-1545: "@base is ignored in a remote
        # context" — relative IRIs keep resolving against the DOCUMENT
        # base, not the remote context's @base
        {"@context": CTX + "withbase.jsonld", "@id": EX + "n", "p": "rel"},
        {CTX + "withbase.jsonld": {"@context": {
            "@base": "http://other.example/ignored/",
            "p": {"@id": EX + "p", "@type": "@id"}}}},
        [{"@id": EX + "n", EX + "p": [{"@id": BASE + "rel"}]}],
        None,
    ),
]

# --------------------------------------------------------------------------
# negative (error) tests: (name, input, expected error code)
# --------------------------------------------------------------------------

ERRORS = [
    (
        "list of lists",
        {"@id": EX + "n", EX + "p": {"@list": [{"@list": ["a"]}]}},
        "list of lists",
    ),
    (
        "invalid @reverse property value",
        {"@id": EX + "n", "@reverse": {EX + "p": "not-a-node"}},
        "invalid reverse property value",
    ),
    (
        "colliding keywords",
        {"@context": {"id": "@id"}, "@id": EX + "a", "id": EX + "b"},
        "colliding keywords",
    ),
    (
        "cyclic IRI mapping",
        {"@context": {"a": "b:x", "b": "a:x"}, "@id": EX + "n", "a:p": "v"},
        "cyclic IRI mapping",
    ),
    (
        "keyword redefinition",
        {"@context": {"@id": EX}, "@id": EX + "n", EX + "p": "v"},
        "keyword redefinition",
    ),
    # ---- full error taxonomy (VERDICT r2 #1). Every trigger below is
    # derived from the reference's guard conditions:
    # context processing Processor.php:1540-1772, keyword expansion
    # :600-770, value-object validation :480-575, node map :2005.
    (
        "invalid local context (number)",
        {"@context": 42, "@id": EX + "n"},
        "invalid local context",  # Processor.php:1772
    ),
    (
        "invalid base IRI (non-string)",
        {"@context": {"@base": 42}, "@id": "n", EX + "p": "v"},
        "invalid base IRI",  # Processor.php:1548
    ),
    (
        "relative @base with null active base",
        {"@context": [{"@base": None}, {"@base": "rel"}],
         "@id": EX + "n", EX + "p": "v"},
        "invalid base IRI",  # Processor.php:1557
    ),
    (
        "invalid vocab mapping (no colon)",
        {"@context": {"@vocab": "no-colon"}, "@id": EX + "n", EX + "p": "v"},
        "invalid vocab mapping",  # Processor.php:1578 (requires ':')
    ),
    (
        "invalid default language (non-string)",
        {"@context": {"@language": 42}, "@id": EX + "n", EX + "p": "v"},
        "invalid default language",  # Processor.php:1592
    ),
    (
        "invalid term definition (number)",
        {"@context": {"t": 42}, "@id": EX + "n"},
        "invalid term definition",  # Processor.php:1615
    ),
    (
        "invalid reverse property (@reverse with @id)",
        {"@context": {"t": {"@reverse": EX + "p", "@id": EX + "q"}},
         "@id": EX + "n", "t": {"@id": EX + "m"}},
        "invalid reverse property",  # Processor.php:1621
    ),
    (
        "invalid reverse property (@list container)",
        {"@context": {"t": {"@reverse": EX + "p", "@container": "@list"}},
         "@id": EX + "n"},
        "invalid reverse property",  # Processor.php:1631 (@set/@index only)
    ),
    (
        "invalid IRI mapping (@id non-string)",
        {"@context": {"t": {"@id": 42}}, "@id": EX + "n"},
        "invalid IRI mapping",  # Processor.php:1645
    ),
    (
        "invalid IRI mapping (reverse term expands relative)",
        {"@context": {"t": {"@reverse": "no-colon-ref"}}, "@id": EX + "n"},
        "invalid IRI mapping",  # Processor.php:1657
    ),
    (
        "invalid keyword alias (@context)",
        {"@context": {"ctx": {"@id": "@context"}}, "@id": EX + "n"},
        "invalid keyword alias",  # Processor.php:1662
    ),
    (
        "invalid type mapping (non-string)",
        {"@context": {"t": {"@id": EX + "p", "@type": 42}}, "@id": EX + "n"},
        "invalid type mapping",  # Processor.php:1690
    ),
    (
        "invalid type mapping (relative IRI)",
        {"@context": {"t": {"@id": EX + "p", "@type": "no-colon"}},
         "@id": EX + "n"},
        "invalid type mapping",  # Processor.php:1698
    ),
    (
        "invalid type mapping (blank node)",
        {"@context": {"t": {"@id": EX + "p", "@type": "_:b0"}},
         "@id": EX + "n"},
        "invalid type mapping",  # Processor.php:1698 (_: prefix test)
    ),
    (
        "invalid language mapping (non-string, non-null)",
        {"@context": {"t": {"@id": EX + "p", "@language": 42}},
         "@id": EX + "n", "t": "v"},
        "invalid language mapping",  # Processor.php:1708
    ),
    (
        "invalid container mapping",
        {"@context": {"t": {"@id": EX + "p", "@container": "@graph"}},
         "@id": EX + "n"},
        "invalid container mapping",  # Processor.php:1723 (1.0 set)
    ),
    (
        "too many recursions in term definition",
        {"@context": {f"t{i}": f"t{i + 1}:x" for i in range(12)},
         "@id": EX + "n", "t0:p": "v"},
        "unknown",  # Processor.php:853 (CONTEXT_MAX_IRI_RECURSIONS = 10)
    ),
    (
        "invalid @id value (number)",
        {"@id": 42, EX + "p": "v"},
        "invalid @id value",  # Processor.php:608
    ),
    (
        "invalid @index value (number)",
        {"@id": EX + "n", "@index": 42, EX + "p": "v"},
        "invalid @index value",  # Processor.php:685
    ),
    (
        "invalid type value (object)",
        {"@id": EX + "n", "@type": {EX + "p": "v"}},
        "invalid type value",  # Processor.php:640
    ),
    (
        "invalid value object (extra property)",
        {"@id": EX + "n", EX + "p": {"@value": "x", "@id": EX + "y"}},
        "invalid value object",  # Processor.php:554
    ),
    (
        "invalid value object value (object @value)",
        {"@id": EX + "n", EX + "p": {"@value": {"o": 1}}},
        "invalid value object value",  # Processor.php:661
    ),
    (
        "invalid language-tagged string (non-string @language)",
        {"@id": EX + "n", EX + "p": {"@value": "x", "@language": 42}},
        "invalid language-tagged string",  # Processor.php:522
    ),
    (
        "invalid language-tagged value (non-string @value)",
        {"@id": EX + "n", EX + "p": {"@value": 42, "@language": "en"}},
        "invalid language-tagged value",  # Processor.php:530
    ),
    (
        "invalid typed value (blank node @type)",
        {"@id": EX + "n", EX + "p": {"@value": "x", "@type": "_:b0"}},
        "invalid typed value",  # Processor.php:543
    ),
    (
        "invalid set or list object (extra property)",
        {"@id": EX + "n", EX + "p": {"@list": ["a"], EX + "q": "v"}},
        "invalid set or list object",  # Processor.php:572
    ),
    (
        "invalid @reverse value (string)",
        {"@id": EX + "n", "@reverse": "not-an-object"},
        "invalid @reverse value",  # Processor.php:732
    ),
    (
        "invalid reverse property map (keyword key)",
        {"@id": EX + "n", "@reverse": {"@id": EX + "m"}},
        "invalid reverse property map",  # Processor.php:387
    ),
    (
        "invalid language map value (number)",
        {"@context": {"t": {"@id": EX + "p", "@container": "@language"}},
         "@id": EX + "n", "t": {"en": 42}},
        "invalid language map value",  # Processor.php:418
    ),
    (
        "list of lists via @list container term",
        {"@context": {"t": {"@id": EX + "p", "@container": "@list"}},
         "@id": EX + "n", "t": [["a"]]},
        "list of lists",  # Processor.php:1046-1054 (array inside @list)
    ),
    (
        "conflicting indexes",
        [{"@id": EX + "n", "@index": "a", EX + "p": "v"},
         {"@id": EX + "n", "@index": "b", EX + "q": "w"}],
        "conflicting indexes",  # Processor.php:2005 (node map)
        {"api": "flatten"},
    ),
    (
        "compaction to list of lists",
        {"@id": EX + "n", EX + "p": [{"@list": ["a"]}, {"@list": ["b"]}]},
        "compaction to list of lists",  # Processor.php:1072
        {"api": "compact",
         "context": {"t": {"@id": EX + "p", "@container": "@list"}}},
    ),
]


# --------------------------------------------------------------------------
# RFC 3986 §5.4 reference-resolution suite (VERDICT r2 #1: abnormal base
# resolution). Goldens are the RFC's own published resolution examples;
# the reference resolves through the ml/iri library's RFC 3986 resolver
# at the Processor.php:903-905 expandIri call sites. Refs containing a
# colon ("g:h", "http:g") never reach the resolver: JSON-LD expansion
# treats any colon-bearing value without a matching term as an absolute
# IRI and passes it through (Processor.php:895-906) — the strict-parser
# RFC answer either way.
# --------------------------------------------------------------------------

RFC_BASE = "http://a/b/c/d;p?q"
RFC_NORMAL = [
    ("g:h", "g:h"),
    ("g", "http://a/b/c/g"),
    ("./g", "http://a/b/c/g"),
    ("g/", "http://a/b/c/g/"),
    ("/g", "http://a/g"),
    ("//g", "http://g"),
    ("?y", "http://a/b/c/d;p?y"),
    ("g?y", "http://a/b/c/g?y"),
    ("#s", "http://a/b/c/d;p?q#s"),
    ("g#s", "http://a/b/c/g#s"),
    ("g?y#s", "http://a/b/c/g?y#s"),
    (";x", "http://a/b/c/;x"),
    ("g;x", "http://a/b/c/g;x"),
    ("g;x?y#s", "http://a/b/c/g;x?y#s"),
    ("", "http://a/b/c/d;p?q"),
    (".", "http://a/b/c/"),
    ("./", "http://a/b/c/"),
    ("..", "http://a/b/"),
    ("../", "http://a/b/"),
    ("../g", "http://a/b/g"),
    ("../..", "http://a/"),
    ("../../", "http://a/"),
    ("../../g", "http://a/g"),
]
RFC_ABNORMAL = [
    ("../../../g", "http://a/g"),
    ("../../../../g", "http://a/g"),
    ("/./g", "http://a/g"),
    ("/../g", "http://a/g"),
    ("g.", "http://a/b/c/g."),
    (".g", "http://a/b/c/.g"),
    ("g..", "http://a/b/c/g.."),
    ("..g", "http://a/b/c/..g"),
    ("./../g", "http://a/b/g"),
    ("./g/.", "http://a/b/c/g/"),
    ("g/./h", "http://a/b/c/g/h"),
    ("g/../h", "http://a/b/c/h"),
    ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
    ("g;x=1/../y", "http://a/b/c/y"),
    ("g#s/./x", "http://a/b/c/g#s/./x"),
    ("g#s/../x", "http://a/b/c/g#s/../x"),
    ("http:g", "http:g"),
]


def _rfc_case(name, pairs):
    return (
        name,
        {"@context": {"@base": RFC_BASE, "p": {"@id": EX + "p", "@type": "@id"}},
         "@id": EX + "n", "p": [ref for ref, _ in pairs]},
        [{"@id": EX + "n", EX + "p": [{"@id": out} for _, out in pairs]}],
    )


EXPAND += [
    _rfc_case("RFC 3986 5.4.1 normal reference resolution", RFC_NORMAL),
    _rfc_case("RFC 3986 5.4.2 abnormal reference resolution", RFC_ABNORMAL),
    # ---- container + coercion combinations ----
    (
        "@list of @id-coerced CURIEs under @vocab",
        {"@context": {"@vocab": EX + "v#",
                      "foaf": "http://xmlns.com/foaf/0.1/",
                      "t": {"@id": "t", "@container": "@list", "@type": "@id"}},
         "@id": EX + "n", "t": ["foaf:a", "rel", "http://abs.example/x"]},
        [{"@id": EX + "n",
          EX + "v#t": [{"@list": [{"@id": "http://xmlns.com/foaf/0.1/a"},
                                  {"@id": BASE + "rel"},
                                  {"@id": "http://abs.example/x"}]}]}],
    ),
    (
        "term @language with @set container keeps tagged array",
        {"@context": {"t": {"@id": EX + "p", "@language": "EN",
                            "@container": "@set"}},
         "@id": EX + "n", "t": ["a", 5]},
        [{"@id": EX + "n", EX + "p": [{"@value": "a", "@language": "EN"},
                                      {"@value": 5}]}],
    ),
    (
        "@index container mixing node objects and @id-coerced strings",
        {"@context": {"t": {"@id": EX + "p", "@container": "@index",
                            "@type": "@id"}},
         "@id": EX + "n",
         "t": {"k2": "rel", "k1": {"@id": EX + "m", EX + "q": "v"},
               "k0": {"@id": EX + "o", "@index": "explicit"}}},
        # ksort over index keys; existing @index wins (Processor.php:441-446)
        [{"@id": EX + "n",
          EX + "p": [{"@id": EX + "o", "@index": "explicit"},
                     {"@id": EX + "m", "@index": "k1",
                      EX + "q": [{"@value": "v"}]},
                     {"@id": BASE + "rel", "@index": "k2"}]}],
    ),
    (
        "@type @vocab coercion expands values as terms",
        {"@context": {"@vocab": EX + "v#", "other": EX + "o",
                      "t": {"@id": "t", "@type": "@vocab"}},
         "@id": EX + "n", "t": "other"},
        [{"@id": EX + "n", EX + "v#t": [{"@id": EX + "o"}]}],
    ),
    (
        "reverse term inside @reverse map becomes a forward property",
        {"@context": {"children": {"@reverse": EX + "parent"}},
         "@id": EX + "n",
         "@reverse": {"children": {"@id": EX + "m", EX + "q": "v"}}},
        # reverse-of-reverse folds forward (Processor.php:741-747)
        [{"@id": EX + "n",
          EX + "parent": [{"@id": EX + "m", EX + "q": [{"@value": "v"}]}]}],
    ),
    # ---- deep named graphs ----
    (
        "named graphs nest recursively in expansion",
        {"@id": EX + "g1",
         "@graph": [{"@id": EX + "g2",
                     "@graph": [{"@id": EX + "a", EX + "p": "v"}],
                     EX + "q": "w"}]},
        [{"@id": EX + "g1",
          "@graph": [{"@id": EX + "g2",
                      "@graph": [{"@id": EX + "a",
                                  EX + "p": [{"@value": "v"}]}],
                      EX + "q": [{"@value": "w"}]}]}],
    ),
    (
        "@graph without @id keeps the implicit default-graph wrapper node",
        {"@graph": [{"@id": EX + "a", EX + "p": "v"}], EX + "q": "w"},
        [{"@graph": [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}],
          EX + "q": [{"@value": "w"}]}],
    ),
    (
        "empty CURIE suffix expands to the bare prefix IRI",
        {"@context": {"foaf": "http://xmlns.com/foaf/0.1/"},
         "@id": EX + "n", "foaf:": "v"},
        # explode(':', 2) yields suffix "" -> prefix IRI . ""
        # (Processor.php:880-897)
        [{"@id": EX + "n",
          "http://xmlns.com/foaf/0.1/": [{"@value": "v"}]}],
    ),
    (
        "term colliding with a scheme never remaps absolute IRIs",
        {"@context": {"http": EX + "trap#",
                      "p": {"@id": EX + "p", "@type": "@id"}},
         "@id": EX + "n", "p": "http://keep.example/x",
         "http:other": "remapped"},
        # a '//' suffix is protected (Processor.php:883-887); a plain
        # CURIE suffix on the same prefix still remaps
        [{"@id": EX + "n",
          EX + "p": [{"@id": "http://keep.example/x"}],
          EX + "trap#other": [{"@value": "remapped"}]}],
    ),
    (
        "blank-node property keys pass through expansion",
        {"@id": EX + "n", "_:p": "v"},
        # the '_' prefix is reserved (Processor.php:883-887); dropping
        # happens at toRdf, not here
        [{"@id": EX + "n", "_:p": [{"@value": "v"}]}],
    ),
    (
        "term @language null overrides the default language",
        {"@context": {"@language": "en", "t": {"@id": EX + "p",
                                               "@language": None},
                      "u": EX + "q"},
         "@id": EX + "n", "t": "plain", "u": "tagged"},
        [{"@id": EX + "n", EX + "p": [{"@value": "plain"}],
          EX + "q": [{"@value": "tagged", "@language": "en"}]}],
    ),
    (
        "@value null removes the property and the then-empty node",
        {"@id": EX + "n", EX + "p": {"@value": None}},
        [],
    ),
    (
        "@list container wraps a single scalar value",
        {"@context": {"t": {"@id": EX + "p", "@container": "@list"}},
         "@id": EX + "n", "t": "solo"},
        # Processor.php:462-470: a non-@list value under a @list
        # container is wrapped after expansion
        [{"@id": EX + "n", EX + "p": [{"@list": [{"@value": "solo"}]}]}],
    ),
    (
        "a term serves as both a term and a CURIE prefix",
        {"@context": {"t": EX + "x#"},
         "@id": EX + "n", "t": "as-term", "t:suffix": "as-prefix"},
        [{"@id": EX + "n",
          EX + "x#": [{"@value": "as-term"}],
          EX + "x#suffix": [{"@value": "as-prefix"}]}],
    ),
    (
        "@reverse term with @index container",
        # @set/@index are the only containers allowed on reverse terms
        # (Processor.php:1626-1639); items land in the @reverse map
        # with their @index attached
        {"@context": {"children": {"@reverse": EX + "parent",
                                   "@container": "@index"}},
         "@id": EX + "n", "children": {"k": {"@id": EX + "m"}}},
        [{"@id": EX + "n",
          "@reverse": {EX + "parent": [{"@id": EX + "m", "@index": "k"}]}}],
    ),
    (
        "empty-string @id resolves to the base itself",
        # Processor.php:903-905: a colon-free @id resolves against the
        # active base; RFC 3986 §5.3: the empty reference yields the
        # base itself (minus any fragment). Explicit @base: the
        # harness's document base is the input-file URL, so the empty
        # reference would otherwise resolve to the (position-dependent)
        # fixture filename.
        {"@context": {"@base": EX + "doc"}, "@id": "", EX + "p": "v"},
        [{"@id": EX + "doc", EX + "p": [{"@value": "v"}]}],
    ),
    (
        "fragment-only @id attaches to the base",
        {"@context": {"@base": EX + "doc"}, "@id": "#f", EX + "p": "v"},
        [{"@id": EX + "doc#f", EX + "p": [{"@value": "v"}]}],
    ),
    (
        "@type arrays expand each entry vocab-relatively in order",
        # Processor.php:620-637: string @type expands with
        # vocabRelative=true; array entries expand one by one,
        # appended in document order
        {"@context": {"@vocab": EX + "v#", "pfx": EX + "x#"},
         "@id": EX + "n", "@type": ["T", "pfx:U", EX + "w"]},
        [{"@id": EX + "n",
          "@type": [EX + "v#T", EX + "x#U", EX + "w"]}],
    ),
    (
        "null inside a context array resets terms AND restores the original base",
        # Processor.php:1535-1536: a null context resets the active
        # context to array('@base' => $this->baseIri) — the DOCUMENT
        # base, not the @base an earlier array entry set; terms
        # defined before the null are gone (their keys drop as
        # unexpandable)
        {"@context": [{"@base": EX + "alt/", "t": EX + "t"},
                      None,
                      {"p": EX + "p"}],
         "@id": "rel", "p": "v", "t": "w"},
        [{"@id": BASE + "rel", EX + "p": [{"@value": "v"}]}],
    ),
    (
        "@container does not chain through term-to-term aliases",
        # t2's definition is the STRING "t1": its @id chains to t1's
        # IRI (Processor.php:860-872) but @container/@type are NOT
        # copied — only t1 itself is a list term
        {"@context": {"t1": {"@id": EX + "p", "@container": "@list"},
                      "t2": "t1"},
         "@id": EX + "n", "t2": ["a", "b"]},
        [{"@id": EX + "n",
          EX + "p": [{"@value": "a"}, {"@value": "b"}]}],
    ),
]

FLATTEN += [
    (
        "a subject in two named graphs keeps per-graph property sets",
        # generateNodeMap keys nodes per graph (Processor.php:1896-):
        # the same @id in g1 and g2 yields two separate node objects,
        # each under its own graph-name node; it does NOT merge across
        # graphs and does NOT appear in the default graph
        {"@graph": [
            {"@id": EX + "g1",
             "@graph": [{"@id": EX + "s", EX + "p": "in-g1"}]},
            {"@id": EX + "g2",
             "@graph": [{"@id": EX + "s", EX + "q": "in-g2"}]}]},
        [{"@id": EX + "g1",
          "@graph": [{"@id": EX + "s", EX + "p": [{"@value": "in-g1"}]}]},
         {"@id": EX + "g2",
          "@graph": [{"@id": EX + "s", EX + "q": [{"@value": "in-g2"}]}]}],
    ),
    (
        "nested named graphs hoist to top-level graph-name nodes",
        {"@id": EX + "g1",
         "@graph": [{"@id": EX + "g2",
                     "@graph": [{"@id": EX + "a", EX + "p": "v"}],
                     EX + "q": "w"}]},
        # each graph name becomes a default-graph node carrying @graph
        # (Processor.php:2088-2119); g2 is both a node IN graph g1 and
        # a graph name at the top level
        [{"@id": EX + "g1",
          "@graph": [{"@id": EX + "g2", EX + "q": [{"@value": "w"}]}]},
         {"@id": EX + "g2",
          "@graph": [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}]}],
    ),
    (
        "equal duplicate @index values do not conflict",
        [{"@id": EX + "n", "@index": "k", EX + "p": "v"},
         {"@id": EX + "n", "@index": "k", EX + "q": "w"}],
        [{"@id": EX + "n", "@index": "k", EX + "p": [{"@value": "v"}],
          EX + "q": [{"@value": "w"}]}],
    ),
    (
        "@reverse inside a named graph redistributes within that graph",
        {"@id": EX + "g",
         "@graph": [{"@id": EX + "a",
                     "@reverse": {EX + "p": {"@id": EX + "b"}}}]},
        [{"@id": EX + "g",
          "@graph": [{"@id": EX + "b", EX + "p": [{"@id": EX + "a"}]}]}],
    ),
]

TORDF += [
    (
        "nested named graphs quad in the containing graph",
        {"@id": EX + "g1",
         "@graph": [{"@id": EX + "g2",
                     "@graph": [{"@id": EX + "a", EX + "p": "v"}],
                     EX + "q": "w"}]},
        [f'<{EX}g2> <{EX}q> "w" <{EX}g1> .',
         f'<{EX}a> <{EX}p> "v" <{EX}g2> .'],
        {},
    ),
    (
        "blank node graph name",
        {"@graph": [{"@id": EX + "a", EX + "p": "v"}], EX + "q": "w"},
        [f'_:b0 <{EX}q> "w" .',
         f'<{EX}a> <{EX}p> "v" _:b0 .'],
        {},
    ),
    (
        "relative subject without a base emits nothing",
        {"@context": {"@base": None}, "@id": "rel", EX + "p": "v"},
        [],
        {},
    ),
    (
        "native booleans become canonical xsd:boolean literals",
        # Value.php:96-101: is_bool -> 'true'/'false' ^^xsd:boolean
        {"@id": EX + "n", EX + "p": True, EX + "q": False},
        [f'<{EX}n> <{EX}p> "true"^^<{XSD}boolean> .',
         f'<{EX}n> <{EX}q> "false"^^<{XSD}boolean> .'],
        {},
    ),
    (
        "small double keeps the canonical negative exponent",
        # Value.php:85: %1.15E then strip <=14 trailing mantissa zeros
        # and the '+' — PHP does NOT zero-pad exponents (unlike C), so
        # 1e-7 prints 1.000000000000000E-7 and compresses to 1.0E-7
        {"@id": EX + "n", EX + "p": 1e-7},
        [f'<{EX}n> <{EX}p> "1.0E-7"^^<{XSD}double> .'],
        {},
    ),
    (
        "@index emits no quads",
        {"@id": EX + "n", "@index": "idx", EX + "p": {"@value": "v",
                                                      "@index": "vi"}},
        [f'<{EX}n> <{EX}p> "v" .'],
        {},
    ),
    (
        "@reverse inside a named graph reverses within that graph",
        {"@id": EX + "g",
         "@graph": [{"@id": EX + "a",
                     "@reverse": {EX + "p": {"@id": EX + "b"}}}]},
        [f'<{EX}b> <{EX}p> <{EX}a> <{EX}g> .'],
        {},
    ),
    (
        "multiple @type values emit one rdf:type quad each",
        {"@id": EX + "n", "@type": [EX + "A", EX + "B"]},
        [f'<{EX}n> <{RDF}type> <{EX}A> .',
         f'<{EX}n> <{RDF}type> <{EX}B> .'],
        {},
    ),
    (
        "@list inside a named graph chains within that graph",
        {"@context": {"t": {"@id": EX + "p", "@container": "@list"}},
         "@id": EX + "g",
         "@graph": [{"@id": EX + "a", "t": ["x", "y"]}]},
        [f'<{EX}a> <{EX}p> _:b0 <{EX}g> .',
         f'_:b0 <{RDF_FIRST}> "x" <{EX}g> .',
         f'_:b0 <{RDF_REST}> _:b1 <{EX}g> .',
         f'_:b1 <{RDF_FIRST}> "y" <{EX}g> .',
         f'_:b1 <{RDF_REST}> <{RDF_NIL}> <{EX}g> .'],
        {},
    ),
]

FROMRDF += [
    (
        "IRI-identified list chain node is consumed by the walk",
        # the walk starts at ANY rdf:rest->nil usage and only checks
        # bnode-ness after advancing (Processor.php:2396-2466) — the
        # same edge the distributed candidate set must honor
        [f'<{EX}s> <{EX}p> <{EX}n> .',
         f'<{EX}n> <{RDF_FIRST}> "a" .',
         f'<{EX}n> <{RDF_REST}> <{RDF_NIL}> .'],
        [{"@id": EX + "s", EX + "p": [{"@list": [{"@value": "a"}]}]}],
        {},
    ),
    (
        "malformed chain node (extra property) survives as a node",
        # the walk consumes nothing (extra property fails the guard),
        # but the nil-usage head STILL becomes an empty @list
        # (Processor.php:2441-2444 runs unconditionally after the walk)
        [f'<{EX}s> <{EX}p> _:l .',
         f'_:l <{RDF_FIRST}> "a" .',
         f'_:l <{RDF_REST}> <{RDF_NIL}> .',
         f'_:l <{EX}x> "extra" .'],
        [{"@id": "_:l",
          RDF_FIRST: [{"@value": "a"}],
          RDF_REST: [{"@list": []}],
          EX + "x": [{"@value": "extra"}]},
         {"@id": EX + "s", EX + "p": [{"@id": "_:l"}]}],
        {},
    ),
    (
        "blank node graph name nests under @graph",
        [f'<{EX}a> <{EX}p> "v" _:g .'],
        [{"@id": "_:g",
          "@graph": [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}]}],
        {},
    ),
    (
        "chain node with two usages is malformed and survives",
        # the walk requires exactly ONE usage of each chain node
        # (Processor.php:2410: count == 1); the nil head still becomes
        # an empty @list (:2441-2444)
        [f'<{EX}s1> <{EX}p> _:l .',
         f'<{EX}s2> <{EX}p> _:l .',
         f'_:l <{RDF_FIRST}> "a" .',
         f'_:l <{RDF_REST}> <{RDF_NIL}> .'],
        [{"@id": "_:l",
          RDF_FIRST: [{"@value": "a"}],
          RDF_REST: [{"@list": []}]},
         {"@id": EX + "s1", EX + "p": [{"@id": "_:l"}]},
         {"@id": EX + "s2", EX + "p": [{"@id": "_:l"}]}],
        {},
    ),
    (
        "useRdfType keeps rdf:type as a regular property",
        [f'<{EX}a> <{RDF}type> <{EX}T> .'],
        [{"@id": EX + "a", RDF + "type": [{"@id": EX + "T"}]}],
        {"useRdfType": True},
    ),
    (
        "nested list chains: 1.0 walk keeps the inner chain node",
        # walking the outer chain consumes _:outer and rewrites
        # <s> <p> to @list [{@id _:inner}]; the inner chain's own walk
        # ends in the nested-list branch (prop == rdf:first,
        # Processor.php:2427-2439), pops its only item, and leaves
        # _:inner in place with its rdf:rest head rewritten to an
        # empty @list — 1.0 does NOT collapse nested lists
        [f'<{EX}s> <{EX}p> _:outer .',
         f'_:outer <{RDF_FIRST}> _:inner .',
         f'_:outer <{RDF_REST}> <{RDF_NIL}> .',
         f'_:inner <{RDF_FIRST}> "a" .',
         f'_:inner <{RDF_REST}> <{RDF_NIL}> .'],
        [{"@id": "_:inner",
          RDF_FIRST: [{"@value": "a"}],
          RDF_REST: [{"@list": []}]},
         {"@id": EX + "s",
          EX + "p": [{"@list": [{"@id": "_:inner"}]}]}],
        {},
    ),
]

COMPACT += [
    (
        "CURIE beats base-relativization for @id values (bug-compat)",
        # Processor.php:1238-1256: the compact-IRI loop runs BEFORE the
        # 'last resort' base relativization, so with both a matching
        # prefix term and an identical @base, the CURIE wins
        [{"@id": EX + "doc/item", EX + "p": [{"@id": EX + "doc/other"}]}],
        {"d": EX + "doc/", "@base": EX + "doc/",
         "p": {"@id": EX + "p", "@type": "@id"}},
        {"@context": {"d": EX + "doc/", "@base": EX + "doc/",
                      "p": {"@id": EX + "p", "@type": "@id"}},
         "@id": "d:item", "p": "d:other"},
        {},
    ),
    (
        "multiple @type values compact to an array of terms",
        [{"@id": EX + "a", "@type": [EX + "T1", EX + "T2"]}],
        {"T1": EX + "T1", "T2": EX + "T2"},
        {"@context": {"T1": EX + "T1", "T2": EX + "T2"},
         "@id": EX + "a", "@type": ["T1", "T2"]},
        {},
    ),
    (
        "@index container regroups into an index map",
        [{"@id": EX + "n",
          EX + "p": [{"@value": "a", "@index": "k1"},
                     {"@value": "b", "@index": "k2"}]}],
        {"t": {"@id": EX + "p", "@container": "@index"}},
        {"@context": {"t": {"@id": EX + "p", "@container": "@index"}},
         "@id": EX + "n", "t": {"k1": "a", "k2": "b"}},
        None,
    ),
    (
        "@set container keeps single values as arrays",
        [{"@id": EX + "n", EX + "p": [{"@value": "a"}]}],
        {"t": {"@id": EX + "p", "@container": "@set"}},
        {"@context": {"t": {"@id": EX + "p", "@container": "@set"}},
         "@id": EX + "n", "t": ["a"]},
        None,
    ),
    (
        "@list of @id-coerced values compacts back to CURIEs",
        [{"@id": EX + "n",
          EX + "p": [{"@list": [{"@id": "http://xmlns.com/foaf/0.1/a"},
                                {"@id": "http://abs.example/x"}]}]}],
        {"foaf": "http://xmlns.com/foaf/0.1/",
         "t": {"@id": EX + "p", "@container": "@list", "@type": "@id"}},
        {"@context": {"foaf": "http://xmlns.com/foaf/0.1/",
                       "t": {"@id": EX + "p", "@container": "@list", "@type": "@id"}},
         "@id": EX + "n", "t": ["foaf:a", "http://abs.example/x"]},
        None,
    ),
    (
        "@reverse term with @type @id compacts the reverse map away",
        [{"@id": EX + "n",
          "@reverse": {EX + "parent": [{"@id": EX + "m"}]}}],
        {"children": {"@reverse": EX + "parent", "@type": "@id"}},
        {"@context": {"children": {"@reverse": EX + "parent", "@type": "@id"}},
         "@id": EX + "n", "children": EX + "m"},
        None,
    ),
    (
        "named graph compaction keeps the @graph nesting",
        [{"@id": EX + "g",
          "@graph": [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}]}],
        {"t": EX + "p"},
        {"@context": {"t": EX + "p"},
         "@id": EX + "g", "@graph": [{"@id": EX + "a", "t": "v"}]},
        None,
    ),
    (
        "@index survives compaction on node objects",
        [{"@id": EX + "n",
          EX + "p": [{"@id": EX + "m", "@index": "k",
                      EX + "q": [{"@value": "v"}]}]}],
        {"t": EX + "p", "q": EX + "q"},
        {"@context": {"t": EX + "p", "q": EX + "q"},
         "@id": EX + "n", "t": {"@id": EX + "m", "@index": "k", "q": "v"}},
        None,
    ),
]


# --------------------------------------------------------------------------
# Round-4 additions (VERDICT r3 #2): list-of-lists permutations,
# @reverse combos, relative-IRI @base pathologies, multi-graph blank-
# node sharing — the official-suite shapes the authored set did not yet
# model. Goldens hand-derived from the reference source as before.
# --------------------------------------------------------------------------

# --- A. list permutations --------------------------------------------------

EXPAND += [
    (
        "nested array inside explicit @list flattens (array_merge)",
        # expand() merges array items into the parent array
        # (Processor.php:347-348), and the @list keyword's list-of-lists
        # check (:711-714) only fires on surviving @list OBJECTS — so a
        # raw nested array inside an explicit @list silently flattens
        {"@id": EX + "n",
         EX + "p": {"@list": [["a"], "b"]}},
        [{"@id": EX + "n",
          EX + "p": [{"@list": [{"@value": "a"}, {"@value": "b"}]}]}],
    ),
    (
        "null entries inside @list are dropped, empty @list survives",
        {"@id": EX + "n",
         EX + "p": {"@list": ["a", None, "b"]},
         EX + "q": {"@list": [None]}},
        [{"@id": EX + "n",
          EX + "p": [{"@list": [{"@value": "a"}, {"@value": "b"}]}],
          EX + "q": [{"@list": []}]}],
    ),
    (
        "@index rides along on a @list object",
        # the numProps decrement for @index (Processor.php:511-513)
        # happens before the @list extra-property check (:569-574)
        {"@id": EX + "n",
         EX + "p": {"@list": ["a"], "@index": "i0"}},
        [{"@id": EX + "n",
          EX + "p": [{"@index": "i0", "@list": [{"@value": "a"}]}]}],
    ),
    (
        "@set with @index collapses and DROPS the index (bug-compat)",
        # @set optimization replaces the whole object with the array
        # (Processor.php:576-578), discarding the @index sibling
        {"@id": EX + "n",
         EX + "p": {"@set": ["a"], "@index": "i0"}},
        [{"@id": EX + "n", EX + "p": [{"@value": "a"}]}],
    ),
    (
        "top-level @list is ignored and the node free-floats away",
        # @list under a null active property returns without merging
        # (Processor.php:700-702); the remaining @id-only node is then
        # removed as free-floating (:496-503)
        [{"@id": EX + "n", "@list": ["a"]},
         {"@id": EX + "m", EX + "p": "kept"}],
        [{"@id": EX + "m", EX + "p": [{"@value": "kept"}]}],
    ),
]

ERRORS += [
    (
        "list object inside a @list-container term value",
        {"@context": {"t": {"@id": EX + "p", "@container": "@list"}},
         "@id": EX + "n", "t": [{"@list": ["a"]}]},
        "list of lists",  # Processor.php:335-343 (object with @list)
    ),
    (
        "list object inside an explicit @list",
        {"@id": EX + "n", EX + "p": {"@list": [{"@list": ["a"]}]}},
        "list of lists",  # Processor.php:711-714
    ),
    (
        "nested array under a @list-container term",
        {"@context": {"t": {"@id": EX + "p", "@container": "@list"}},
         "@id": EX + "n", "t": [["a"], ["b"]]},
        "list of lists",  # Processor.php:335-343 (item is an array)
    ),
]

TORDF += [
    (
        "@list with @index: index ignored, chain emitted",
        {"@id": EX + "n", EX + "p": {"@list": ["a", "b"], "@index": "i0"}},
        [f'<{EX}n> <{EX}p> _:b0 .',
         f'_:b0 <{RDF}first> "a" .',
         f'_:b0 <{RDF}rest> _:b1 .',
         f'_:b1 <{RDF}first> "b" .',
         f'_:b1 <{RDF}rest> <{RDF}nil> .'],
        {},
    ),
]

# --- B. @reverse combos ----------------------------------------------------

EXPAND += [
    (
        "reverse term collects values under @reverse",
        {"@context": {"children": {"@reverse": EX + "parent"}},
         "@id": EX + "a",
         "children": [{"@id": EX + "b"}, {"@id": EX + "c"}]},
        [{"@id": EX + "a",
          "@reverse": {EX + "parent": [{"@id": EX + "b"},
                                       {"@id": EX + "c"}]}}],
    ),
    (
        "reverse term with @container @set behaves like plain reverse",
        {"@context": {"children": {"@reverse": EX + "parent",
                                   "@container": "@set"}},
         "@id": EX + "a", "children": [{"@id": EX + "b"}]},
        [{"@id": EX + "a",
          "@reverse": {EX + "parent": [{"@id": EX + "b"}]}}],
    ),
    (
        "reverse term with @type @id coerces string values",
        {"@context": {"children": {"@reverse": EX + "parent",
                                   "@type": "@id"}},
         "@id": EX + "a", "children": EX + "b"},
        [{"@id": EX + "a",
          "@reverse": {EX + "parent": [{"@id": EX + "b"}]}}],
    ),
    (
        "@reverse keyword map with term coercion inside",
        {"@context": {"knows": {"@id": EX + "knows", "@type": "@id"}},
         "@id": EX + "a", "@reverse": {"knows": EX + "b"}},
        [{"@id": EX + "a",
          "@reverse": {EX + "knows": [{"@id": EX + "b"}]}}],
    ),
    (
        "reverse term inside @reverse map goes forward again",
        # double reversal: the inner expansion files the value under
        # @reverse, and the @reverse keyword handler merges that back
        # as a FORWARD property (Processor.php:738-746)
        {"@context": {"children": {"@reverse": EX + "p"}},
         "@id": EX + "a", "@reverse": {"children": {"@id": EX + "b"}}},
        [{"@id": EX + "a", EX + "p": [{"@id": EX + "b"}]}],
    ),
]

ERRORS += [
    (
        "term definition with both @reverse and @id",
        {"@context": {"t": {"@reverse": EX + "p", "@id": EX + "q"}},
         "@id": EX + "n", "t": {"@id": EX + "m"}},
        "invalid reverse property",  # Processor.php:1619-1625
    ),
    (
        "reverse term with @list container",
        {"@context": {"t": {"@reverse": EX + "p", "@container": "@list"}},
         "@id": EX + "n", "t": {"@id": EX + "m"}},
        "invalid reverse property",  # Processor.php:1627-1635
    ),
    (
        "literal value under a reverse term",
        {"@context": {"children": {"@reverse": EX + "parent"}},
         "@id": EX + "a", "children": "just a string"},
        "invalid reverse property value",  # Processor.php:480-490
    ),
    (
        "list value under a reverse term",
        {"@context": {"children": {"@reverse": EX + "parent"}},
         "@id": EX + "a", "children": {"@list": [{"@id": EX + "b"}]}},
        "invalid reverse property value",  # Processor.php:480-490
    ),
    (
        "literal value inside an @reverse map",
        {"@id": EX + "a", "@reverse": {EX + "p": "lit"}},
        "invalid reverse property value",  # Processor.php:776-783
    ),
    (
        "keyword redefinition in context",
        {"@context": {"@id": EX + "x"}, "@id": EX + "n"},
        "keyword redefinition",  # Processor.php:1606-1608
    ),
    (
        "reverse term expanding to a relative IRI",
        {"@context": {"t": {"@reverse": "rel"}},
         "@id": EX + "n", "t": {"@id": EX + "m"}},
        "invalid IRI mapping",  # Processor.php:1655-1660
    ),
]

TORDF += [
    (
        "@reverse inverts the emitted triple",
        {"@id": EX + "a", "@reverse": {EX + "p": {"@id": EX + "b"}}},
        [f'<{EX}b> <{EX}p> <{EX}a> .'],
        {},
    ),
]

COMPACT += [
    (
        "@reverse compacts onto a reverse term",
        [{"@id": EX + "a",
          "@reverse": {EX + "p": [{"@id": EX + "b"}]}}],
        {"children": {"@reverse": EX + "p", "@type": "@id"}},
        {"@context": {"children": {"@reverse": EX + "p", "@type": "@id"}},
         "@id": EX + "a", "children": EX + "b"},
        {},
    ),
    (
        "@reverse with no matching reverse term stays under @reverse",
        [{"@id": EX + "a",
          "@reverse": {EX + "p": [{"@id": EX + "b"}]}}],
        {"name": EX + "name"},
        {"@context": {"name": EX + "name"},
         "@id": EX + "a",
         "@reverse": {EX + "p": {"@id": EX + "b"}}},
        {},
    ),
]

FLATTEN += [
    (
        "reverse term values become forward edges on the pointing node",
        # the subject node a ends up @id-only and is pruned
        # (hasNodeProperties filter, Processor.php:2115-2117, 2969-2972)
        {"@context": {"children": {"@reverse": EX + "parent"}},
         "@id": EX + "a", "children": [{"@id": EX + "b"}]},
        [{"@id": EX + "b", EX + "parent": [{"@id": EX + "a"}]}],
    ),
]

# --- C. relative-IRI @base pathologies ------------------------------------

EXPAND += [
    (
        "relative @base resolves against the document base",
        {"@context": {"@base": "sub/dir/",
                      "p": {"@id": EX + "p", "@type": "@id"}},
         "@id": "x", "p": "y"},
        # document base = BASE + input filename; "sub/dir/" replaces
        # the filename segment (RFC 3986 merge), so the result is
        # filename-independent
        [{"@id": BASE + "sub/dir/x",
          EX + "p": [{"@id": BASE + "sub/dir/y"}]}],
    ),
    (
        "empty-string @base resolves to the current base itself",
        {"@context": [{"@base": "http://a/b/c/d"}, {"@base": ""},
                      {"p": {"@id": EX + "p", "@type": "@id"}}],
         "@id": "g", "p": "#s"},
        [{"@id": "http://a/b/c/g",
          EX + "p": [{"@id": "http://a/b/c/d#s"}]}],
    ),
    (
        "chained relative @base compose left to right",
        {"@context": [{"@base": "http://a/b/c/"}, {"@base": "../x/"},
                      {"p": {"@id": EX + "p", "@type": "@id"}}],
         "@id": "g", "p": "../h"},
        [{"@id": "http://a/b/x/g", EX + "p": [{"@id": "http://a/b/h"}]}],
    ),
    (
        "null @base leaves relative @id unresolved in expansion",
        {"@context": {"@base": None, "p": EX + "p"},
         "@id": "stays-relative", "p": "v"},
        [{"@id": "stays-relative", EX + "p": [{"@value": "v"}]}],
    ),
    (
        "fragment-bearing @base: fragment discarded on resolution",
        {"@context": {"@base": "http://a/b#frag",
                      "p": {"@id": EX + "p", "@type": "@id"}},
         "@id": "g", "p": "#s"},
        [{"@id": "http://a/g", EX + "p": [{"@id": "http://a/b#s"}]}],
    ),
    (
        "authority-only @base merges onto a root slash",
        {"@context": {"@base": "http://a",
                      "p": {"@id": EX + "p", "@type": "@id"}},
         "@id": "g", "p": "#s"},
        [{"@id": "http://a/g", EX + "p": [{"@id": "http://a#s"}]}],
    ),
    (
        "query-bearing @base: ?ref replaces query, path ref drops it",
        {"@context": {"@base": "http://a/b?q=1",
                      "p": {"@id": EX + "p", "@type": "@id"}},
         "@id": "?y", "p": "g"},
        [{"@id": "http://a/b?y", EX + "p": [{"@id": "http://a/g"}]}],
    ),
    (
        "opaque (authority-less) urn @base: path ref replaces all",
        # RFC 3986 merge without authority: no "/" in base path means
        # the reference path simply replaces it -> "urn:g"
        {"@context": {"@base": "urn:uuid:1234",
                      "p": {"@id": EX + "p", "@type": "@id"}},
         "@id": "#f", "p": "g"},
        [{"@id": "urn:uuid:1234#f", EX + "p": [{"@id": "urn:g"}]}],
    ),
    (
        "@vocab null resets vocab mapping mid-chain",
        {"@context": [{"@vocab": EX + "v#", "keep": EX + "keep"},
                      {"@vocab": None}],
         "@id": EX + "n", "keep": "yes", "dropped": "no"},
        # "dropped" no longer vocab-maps and is not an IRI -> skipped
        [{"@id": EX + "n", EX + "keep": [{"@value": "yes"}]}],
    ),
    (
        "@vocab '_:' produces blank-node properties",
        {"@context": {"@vocab": "_:"},
         "@id": EX + "n", "name": "x"},
        [{"@id": EX + "n", "_:name": [{"@value": "x"}]}],
    ),
]

ERRORS += [
    (
        "non-string @base",
        {"@context": {"@base": 42}, "@id": EX + "n"},
        "invalid base IRI",  # Processor.php:1546-1551
    ),
    (
        "relative @base over a null base",
        {"@context": [{"@base": None}, {"@base": "rel/"}],
         "@id": EX + "n"},
        "invalid base IRI",  # Processor.php:1553-1560
    ),
    (
        "relative @vocab",
        {"@context": {"@vocab": "rel"}, "@id": EX + "n"},
        "invalid vocab mapping",  # Processor.php:1573-1580
    ),
]

TORDF += [
    (
        "null @base: relative subjects are skipped in quad emission",
        {"@context": {"@base": None},
         "@graph": [{"@id": "relative-subject", EX + "p": "dropped"},
                    {"@id": EX + "kept", EX + "p": "v"}]},
        [f'<{EX}kept> <{EX}p> "v" .'],
        {},
    ),
]

# --- D. multi-graph blank-node sharing ------------------------------------

EXPAND += [
    (
        "@graph alongside properties on the same node",
        {"@id": EX + "g", EX + "p": "v",
         "@graph": [{"@id": EX + "a", EX + "q": "w"}]},
        [{"@id": EX + "g", EX + "p": [{"@value": "v"}],
          "@graph": [{"@id": EX + "a", EX + "q": [{"@value": "w"}]}]}],
    ),
]

FLATTEN += [
    (
        "one blank-node label shared across two named graphs",
        # getBlankNodeId's mapping is document-global, so _:shared maps
        # to the SAME fresh label in both graphs (Processor.php:2069-79)
        {"@graph": [
            {"@id": EX + "g1",
             "@graph": [{"@id": "_:shared", EX + "p": "v1"}]},
            {"@id": EX + "g2",
             "@graph": [{"@id": "_:shared", EX + "q": "v2"}]}]},
        [{"@id": EX + "g1",
          "@graph": [{"@id": "_:b0", EX + "p": [{"@value": "v1"}]}]},
         {"@id": EX + "g2",
          "@graph": [{"@id": "_:b0", EX + "q": [{"@value": "v2"}]}]}],
    ),
    (
        "blank node as graph name",
        {"@graph": [
            {"@id": "_:g", "@graph": [{"@id": EX + "a", EX + "p": "v"}]},
            {"@id": EX + "n", EX + "q": {"@id": "_:g"}}]},
        [{"@id": "_:b0",
          "@graph": [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}]},
         {"@id": EX + "n", EX + "q": [{"@id": "_:b0"}]}],
    ),
    (
        "nested named graphs flatten to sibling graph nodes",
        {"@id": EX + "g1",
         "@graph": [{"@id": EX + "g2",
                     "@graph": [{"@id": EX + "a", EX + "p": "v"}]}]},
        # the g2 reference node inside g1's graph is @id-only and is
        # filtered out (Processor.php:2108-2111) — the EMPTY @graph
        # array on g1 survives (the g1 node then has 2 members)
        [{"@id": EX + "g1", "@graph": []},
         {"@id": EX + "g2",
          "@graph": [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}]}],
    ),
    (
        "same IRI subject kept separate per graph",
        {"@graph": [
            {"@id": EX + "s", EX + "p": "default"},
            {"@id": EX + "g",
             "@graph": [{"@id": EX + "s", EX + "q": "named"}]}]},
        [{"@id": EX + "g",
          "@graph": [{"@id": EX + "s", EX + "q": [{"@value": "named"}]}]},
         {"@id": EX + "s", EX + "p": [{"@value": "default"}]}],
    ),
]

TORDF += [
    (
        "blank label shared across graphs keeps one identity",
        {"@graph": [
            {"@id": EX + "g1",
             "@graph": [{"@id": "_:shared", EX + "p": "v1"}]},
            {"@id": EX + "g2",
             "@graph": [{"@id": "_:shared", EX + "q": "v2"}]}]},
        [f'_:b0 <{EX}p> "v1" <{EX}g1> .',
         f'_:b0 <{EX}q> "v2" <{EX}g2> .'],
        {},
    ),
    (
        "blank node as graph label",
        {"@graph": [
            {"@id": "_:g", "@graph": [{"@id": EX + "a", EX + "p": "v"}]}]},
        [f'<{EX}a> <{EX}p> "v" _:b0 .'],
        {},
    ),
    (
        "bnode object shared between default and named graph",
        {"@graph": [
            {"@id": EX + "a", EX + "p": {"@id": "_:x"}},
            {"@id": EX + "g",
             "@graph": [{"@id": "_:x", EX + "q": "v"}]}]},
        [f'<{EX}a> <{EX}p> _:b0 .',
         f'_:b0 <{EX}q> "v" <{EX}g> .'],
        {},
    ),
    (
        "nested named graphs: inner graph keeps its own name",
        {"@id": EX + "g1",
         "@graph": [{"@id": EX + "g2",
                     "@graph": [{"@id": EX + "a", EX + "p": "v"}]}]},
        [f'<{EX}a> <{EX}p> "v" <{EX}g2> .'],
        {},
    ),
]

FROMRDF += [
    (
        "bnode subject shared across two named graphs",
        [f'_:shared <{EX}p> "v1" <{EX}g1> .',
         f'_:shared <{EX}q> "v2" <{EX}g2> .'],
        [{"@id": EX + "g1",
          "@graph": [{"@id": "_:shared", EX + "p": [{"@value": "v1"}]}]},
         {"@id": EX + "g2",
          "@graph": [{"@id": "_:shared", EX + "q": [{"@value": "v2"}]}]}],
        {},
    ),
    (
        "blank graph label becomes a graph-name node",
        [f'<{EX}a> <{EX}p> "v" _:g .'],
        [{"@id": "_:g",
          "@graph": [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}]}],
        {},
    ),
]

# --- E. container/alias permutations + language-tag case fidelity ---------

EXPAND += [
    (
        "reverse term with @container @index (allowed combo)",
        # index expansion stamps @index on the item (Processor.php:
        # 441-442) before the reverse filing collects it
        {"@context": {"children": {"@reverse": EX + "parent",
                                   "@container": "@index"}},
         "@id": EX + "a", "children": {"k": {"@id": EX + "b"}}},
        [{"@id": EX + "a",
          "@reverse": {EX + "parent": [{"@id": EX + "b",
                                        "@index": "k"}]}}],
    ),
    (
        "index-container item keeps its own @index over the map key",
        # @index is only stamped when ABSENT (Processor.php:441-442)
        {"@context": {"t": {"@id": EX + "p", "@container": "@index"}},
         "@id": EX + "n", "t": {"k1": {"@id": EX + "b", "@index": "own"}}},
        [{"@id": EX + "n",
          EX + "p": [{"@id": EX + "b", "@index": "own"}]}],
    ),
    (
        "index map with array values fans out per entry",
        {"@context": {"t": {"@id": EX + "p", "@container": "@index"}},
         "@id": EX + "n", "t": {"k": ["a", "b"]}},
        [{"@id": EX + "n",
          EX + "p": [{"@value": "a", "@index": "k"},
                     {"@value": "b", "@index": "k"}]}],
    ),
    (
        "language map with array values fans out per entry",
        {"@context": {"t": {"@id": EX + "p", "@container": "@language"}},
         "@id": EX + "n", "t": {"en": ["a", "b"]}},
        [{"@id": EX + "n",
          EX + "p": [{"@value": "a", "@language": "en"},
                     {"@value": "b", "@language": "en"}]}],
    ),
    (
        "value-object @language keeps its case verbatim",
        # only language-MAP keys are lowercased (Processor.php:427 is
        # the single strtolower in the codebase)
        {"@id": EX + "n",
         EX + "p": {"@value": "bonjour", "@language": "FR"}},
        [{"@id": EX + "n",
          EX + "p": [{"@value": "bonjour", "@language": "FR"}]}],
    ),
    (
        "keyword aliases for @id and @type normalize away",
        {"@context": {"ID": "@id", "TYPE": "@type"},
         "ID": EX + "n", "TYPE": EX + "T", EX + "p": "v"},
        [{"@id": EX + "n", "@type": [EX + "T"],
          EX + "p": [{"@value": "v"}]}],
    ),
    (
        "@type array mixes terms, CURIEs and absolute IRIs",
        {"@context": {"@vocab": EX + "v#", "pfx": EX + "px#"},
         "@id": EX + "n",
         "@type": ["Term", "pfx:Sub", "http://other.example/T"]},
        [{"@id": EX + "n",
          "@type": [EX + "v#Term", EX + "px#Sub",
                    "http://other.example/T"]}],
    ),
]

ERRORS += [
    (
        "colliding keywords via an alias",
        {"@context": {"id": "@id"},
         "id": EX + "x", "@id": EX + "y"},
        "colliding keywords",  # Processor.php:380
    ),
    (
        "unsupported container mapping",
        {"@context": {"t": {"@id": EX + "p", "@container": "@type"}},
         "@id": EX + "n", "t": "v"},
        "invalid container mapping",  # Processor.php:1720-1725
    ),
    (
        "non-scalar @value",
        {"@id": EX + "n", EX + "p": {"@value": {"nested": "object"}}},
        "invalid value object value",  # Processor.php:655-665
    ),
]

TORDF += [
    (
        "language tag case preserved through to N-Quads",
        {"@id": EX + "n",
         EX + "p": {"@value": "bonjour", "@language": "FR"}},
        [f'<{EX}n> <{EX}p> "bonjour"@FR .'],
        {},
    ),
]

FROMRDF += [
    (
        "multi-subtag language tag parses and survives fromRdf",
        # NB the PARSER grammar only admits lowercase tags
        # (NQuads.php:87) while the SERIALIZER emits any case verbatim
        # — the asymmetry is pinned in tests/test_nquads_io.py
        [f'<{EX}n> <{EX}p> "bonjour"@fr-x-2abc .'],
        [{"@id": EX + "n",
          EX + "p": [{"@value": "bonjour", "@language": "fr-x-2abc"}]}],
        {},
    ),
]

# --- F. term-language mappings + compaction term selection ----------------

EXPAND += [
    (
        "term @language overrides the default language",
        {"@context": {"@language": "en",
                      "t": {"@id": EX + "p", "@language": "de"},
                      "u": EX + "q"},
         "@id": EX + "n", "t": "x", "u": "y"},
        [{"@id": EX + "n",
          EX + "p": [{"@value": "x", "@language": "de"}],
          EX + "q": [{"@value": "y", "@language": "en"}]}],
    ),
    (
        "term @language null clears the default language",
        # array_key_exists picks up the null mapping
        # (Processor.php:1731-1733); isset() in expandValue then skips
        # tagging (:802-804)
        {"@context": {"@language": "en",
                      "t": {"@id": EX + "p", "@language": None}},
         "@id": EX + "n", "t": "x"},
        [{"@id": EX + "n", EX + "p": [{"@value": "x"}]}],
    ),
    (
        "@type coercion beats term @language (the 'note the else')",
        # language tagging applies only WITHOUT type coercion
        # (Processor.php:1714-1716 elseif; :800-804)
        {"@context": {"@language": "en",
                      "t": {"@id": EX + "p", "@type": EX + "T",
                            "@language": "de"}},
         "@id": EX + "n", "t": "x"},
        [{"@id": EX + "n",
          EX + "p": [{"@value": "x", "@type": EX + "T"}]}],
    ),
    (
        "@list keyword alias",
        {"@context": {"mylist": "@list"},
         "@id": EX + "n", EX + "p": {"mylist": ["a", "b"]}},
        [{"@id": EX + "n",
          EX + "p": [{"@list": [{"@value": "a"}, {"@value": "b"}]}]}],
    ),
    (
        "@set keyword alias collapses",
        {"@context": {"myset": "@set"},
         "@id": EX + "n", EX + "p": {"myset": ["a", "b"]}},
        [{"@id": EX + "n",
          EX + "p": [{"@value": "a"}, {"@value": "b"}]}],
    ),
]

ERRORS += [
    (
        "non-string term @language",
        {"@context": {"t": {"@id": EX + "p", "@language": 42}},
         "@id": EX + "n", "t": "x"},
        "invalid language mapping",  # Processor.php:1706-1712
    ),
]

COMPACT += [
    (
        "language-based term selection",
        [{"@id": EX + "n",
          EX + "p": [{"@value": "hello", "@language": "en"},
                     {"@value": "hallo", "@language": "de"}]}],
        {"t_en": {"@id": EX + "p", "@language": "en"},
         "t_de": {"@id": EX + "p", "@language": "de"}},
        {"@context": {"t_en": {"@id": EX + "p", "@language": "en"},
                      "t_de": {"@id": EX + "p", "@language": "de"}},
         "@id": EX + "n", "t_de": "hallo", "t_en": "hello"},
        {},
    ),
    (
        "type-based term selection strips the datatype",
        [{"@id": EX + "n",
          EX + "p": [{"@value": "2011-01-25T00:00:00Z",
                      "@type": XSD + "dateTime"},
                     {"@value": "plain"}]}],
        {"date": {"@id": EX + "p", "@type": XSD + "dateTime"},
         "other": EX + "p"},
        {"@context": {"date": {"@id": EX + "p", "@type": XSD + "dateTime"},
                      "other": EX + "p"},
         "@id": EX + "n", "date": "2011-01-25T00:00:00Z",
         "other": "plain"},
        {},
    ),
    (
        "term beats CURIE for the same IRI",
        [{"@id": EX + "n",
          "http://xmlns.com/foaf/0.1/name": [{"@value": "Alice"}]}],
        {"name": "http://xmlns.com/foaf/0.1/name",
         "foaf": "http://xmlns.com/foaf/0.1/"},
        {"@context": {"name": "http://xmlns.com/foaf/0.1/name",
                      "foaf": "http://xmlns.com/foaf/0.1/"},
         "@id": EX + "n", "name": "Alice"},
        {},
    ),
    (
        "@set container keeps the array for single values",
        [{"@id": EX + "n", EX + "p": [{"@value": "v"}]}],
        {"t": {"@id": EX + "p", "@container": "@set"}},
        {"@context": {"t": {"@id": EX + "p", "@container": "@set"}},
         "@id": EX + "n", "t": ["v"]},
        {},
    ),
]

TORDF += [
    (
        "@index on a node object is dropped in RDF",
        {"@id": EX + "n",
         EX + "p": {"@id": EX + "m", "@index": "i0", EX + "q": "v"}},
        [f'<{EX}n> <{EX}p> <{EX}m> .',
         f'<{EX}m> <{EX}q> "v" .'],
        {},
    ),
]

# --- G. keyword-aliased terms, emission edge cases, base relativization ---

EXPAND += [
    (
        "term aliased to the @type keyword ignores its other members",
        # a term whose @id expands to a keyword keeps ONLY the alias —
        # coercions etc. are dropped (Processor.php:1673-1678)
        {"@context": {"@vocab": EX + "v#",
                      "kind": {"@id": "@type", "@type": "@id"}},
         "@id": EX + "n", "kind": "T"},
        [{"@id": EX + "n", "@type": [EX + "v#T"]}],
    ),
    (
        "@value with @index keeps both",
        {"@id": EX + "n", EX + "p": {"@value": "x", "@index": "i0"}},
        [{"@id": EX + "n",
          EX + "p": [{"@value": "x", "@index": "i0"}]}],
    ),
    (
        "@type values fall back to base resolution without @vocab",
        # expandIri for @type passes BOTH vocabRelative and relativeIri
        # (Processor.php:636) — with no @vocab the document base wins
        {"@context": {"@base": "http://a/dir/"},
         "@id": EX + "n", "@type": "Rel"},
        [{"@id": EX + "n", "@type": ["http://a/dir/Rel"]}],
    ),
]

ERRORS += [
    (
        "array nested inside a context array",
        {"@context": [[{"@vocab": EX}]], "@id": EX + "n"},
        "invalid local context",  # Processor.php:1729-1731 else branch
    ),
]

TORDF += [
    (
        "relative @type is emitted UNCHECKED (bug-compat)",
        # quad emission validates subject/predicate/object IRIs but the
        # rdf:type OBJECT position constructs the IRI directly with no
        # isAbsolute gate (Processor.php:2161-2166)
        {"@context": {"@base": None},
         "@id": EX + "n", "@type": "relative-type"},
        [f'<{EX}n> <{RDF}type> <relative-type> .'],
        {},
    ),
    (
        "relative object references are skipped (elementToRdf null)",
        # elementToRdf returns null for non-absolute @id
        # (Processor.php:2215-2224) — the triple vanishes while the
        # absolute sibling survives
        {"@context": {"@base": None},
         "@id": EX + "n",
         EX + "p": [{"@id": "relative-target"}, {"@id": EX + "m"}]},
        [f'<{EX}n> <{EX}p> <{EX}m> .'],
        {},
    ),
    (
        "list of @id-coerced IRIs chains IRI rdf:first objects",
        {"@context": {"t": {"@id": EX + "p", "@container": "@list",
                            "@type": "@id"}},
         "@id": EX + "n", "t": [EX + "a", EX + "b"]},
        [f'<{EX}n> <{EX}p> _:b0 .',
         f'_:b0 <{RDF}first> <{EX}a> .',
         f'_:b0 <{RDF}rest> _:b1 .',
         f'_:b1 <{RDF}first> <{EX}b> .',
         f'_:b1 <{RDF}rest> <{RDF}nil> .'],
        {},
    ),
]

FROMRDF += [
    (
        "rdf:nil as a subject keeps its own node",
        # nil's usages drive the list walk, but a nil SUBJECT carrying
        # properties passes the hasNodeProperties filter like any node
        [f'<{RDF}nil> <{EX}p> "v" .',
         f'<{EX}n> <{EX}q> "w" .'],
        # output is subject-ksorted: example.com < www.w3.org
        [{"@id": EX + "n", EX + "q": [{"@value": "w"}]},
         {"@id": RDF + "nil", EX + "p": [{"@value": "v"}]}],
        {},
    ),
    (
        "useNativeTypes converts exponent doubles",
        [f'<{EX}n> <{EX}p> "1.0E24"^^<{XSD}double> .',
         f'<{EX}n> <{EX}q> "5.3E0"^^<{XSD}double> .'],
        [{"@id": EX + "n",
          EX + "p": [{"@value": 1e24}],
          EX + "q": [{"@value": 5.3}]}],
        {"useNativeTypes": True},
    ),
]

COMPACT += [
    (
        "@id values relativize against @base",
        [{"@id": "http://a/dir/x",
          EX + "p": [{"@id": "http://a/dir/sub/y"}]}],
        {"@base": "http://a/dir/", "p": {"@id": EX + "p", "@type": "@id"}},
        {"@context": {"@base": "http://a/dir/",
                      "p": {"@id": EX + "p", "@type": "@id"}},
         "@id": "x", "p": "sub/y"},
        {},
    ),
]

# --- H. set/list interactions, per-graph nil walks, container regrouping --

EXPAND += [
    (
        "@set inside an explicit @list flattens into the list",
        # @set elision replaces the object with its array
        # (Processor.php:576-578), and array items merge into the
        # parent array (:347-348) — no list-of-lists error fires
        # because the surviving items are plain values
        {"@id": EX + "n",
         EX + "p": {"@list": [{"@set": ["a", "b"]}, "c"]}},
        [{"@id": EX + "n",
          EX + "p": [{"@list": [{"@value": "a"}, {"@value": "b"},
                                {"@value": "c"}]}]}],
    ),
    (
        "empty @set collapses to an empty array",
        {"@id": EX + "n", EX + "p": {"@set": []}, EX + "q": "keep"},
        [{"@id": EX + "n", EX + "p": [],
          EX + "q": [{"@value": "keep"}]}],
    ),
]

TORDF += [
    (
        "list chain inside a named graph carries the graph term",
        # listToRdf receives the active graph (Processor.php:2235-2261)
        {"@id": EX + "g",
         "@graph": [{"@id": EX + "n", EX + "p": {"@list": ["a"]}}]},
        [f'<{EX}n> <{EX}p> _:b0 <{EX}g> .',
         f'_:b0 <{RDF}first> "a" <{EX}g> .',
         f'_:b0 <{RDF}rest> <{RDF}nil> <{EX}g> .'],
        {},
    ),
    (
        "typed literals inside a list chain",
        {"@id": EX + "n",
         EX + "p": {"@list": [42, 2.5]}},
        [f'<{EX}n> <{EX}p> _:b0 .',
         f'_:b0 <{RDF}first> "42"^^<{XSD}integer> .',
         f'_:b0 <{RDF}rest> _:b1 .',
         f'_:b1 <{RDF}first> "2.5E0"^^<{XSD}double> .',
         f'_:b1 <{RDF}rest> <{RDF}nil> .'],
        {},
    ),
]

FROMRDF += [
    (
        "independent list chains in two named graphs both reconstruct",
        # rdf:nil usages are tracked PER GRAPH (Processor.php:2337-2341)
        # so each graph's backwards walk consumes its own chain
        [f'<{EX}a> <{EX}p> _:c1 <{EX}g1> .',
         f'_:c1 <{RDF}first> "x" <{EX}g1> .',
         f'_:c1 <{RDF}rest> <{RDF}nil> <{EX}g1> .',
         f'<{EX}b> <{EX}q> _:c2 <{EX}g2> .',
         f'_:c2 <{RDF}first> "y" <{EX}g2> .',
         f'_:c2 <{RDF}rest> <{RDF}nil> <{EX}g2> .'],
        [{"@id": EX + "g1",
          "@graph": [{"@id": EX + "a",
                      EX + "p": [{"@list": [{"@value": "x"}]}]}]},
         {"@id": EX + "g2",
          "@graph": [{"@id": EX + "b",
                      EX + "q": [{"@list": [{"@value": "y"}]}]}]}],
        {},
    ),
    (
        "typed literals in a reconstructed list",
        [f'<{EX}n> <{EX}p> _:c1 .',
         f'_:c1 <{RDF}first> "42"^^<{XSD}integer> .',
         f'_:c1 <{RDF}rest> <{RDF}nil> .'],
        [{"@id": EX + "n",
          EX + "p": [{"@list": [{"@value": "42",
                                 "@type": XSD + "integer"}]}]}],
        {},
    ),
]

COMPACT += [
    (
        "language map regroups multiple values per language",
        [{"@id": EX + "n",
          EX + "p": [{"@value": "a1", "@language": "en"},
                     {"@value": "a2", "@language": "en"},
                     {"@value": "b1", "@language": "de"}]}],
        {"t": {"@id": EX + "p", "@container": "@language"}},
        {"@context": {"t": {"@id": EX + "p", "@container": "@language"}},
         "@id": EX + "n",
         "t": {"de": "b1", "en": ["a1", "a2"]}},
        {},
    ),
    (
        "index map regroups multiple values per index key",
        [{"@id": EX + "n",
          EX + "p": [{"@value": "a1", "@index": "k1"},
                     {"@value": "a2", "@index": "k1"},
                     {"@value": "b1", "@index": "k2"}]}],
        {"t": {"@id": EX + "p", "@container": "@index"}},
        {"@context": {"t": {"@id": EX + "p", "@container": "@index"}},
         "@id": EX + "n",
         "t": {"k1": ["a1", "a2"], "k2": "b1"}},
        {},
    ),
]

# --- I. vocab compaction + keyword-alias chains ---------------------------

EXPAND += [
    (
        "terms chain through to a keyword alias",
        # "a" -> "b" -> "@id": local-context resolution follows the
        # chain (Processor.php:846-872) and the final keyword is stored
        # as an alias (:1673-1678)
        {"@context": {"a": "b", "b": "@id"},
         "a": EX + "x", EX + "p": "v"},
        [{"@id": EX + "x", EX + "p": [{"@value": "v"}]}],
    ),
]

COMPACT += [
    (
        "@vocab compacts property and @type suffixes",
        [{"@id": EX + "n", "@type": [EX + "v#T"],
          EX + "v#name": [{"@value": "x"}]}],
        {"@vocab": EX + "v#"},
        {"@context": {"@vocab": EX + "v#"},
         "@id": EX + "n", "@type": "T", "name": "x"},
        {},
    ),
    (
        "vocab compaction skipped when the suffix is a defined term",
        # the suffix must NOT itself be a term (Processor.php:1229-1233)
        # — "name" maps elsewhere, so the property stays absolute
        [{"@id": EX + "n", EX + "v#name": [{"@value": "x"}]}],
        {"@vocab": EX + "v#", "name": EX + "other"},
        {"@context": {"@vocab": EX + "v#", "name": EX + "other"},
         "@id": EX + "n", EX + "v#name": "x"},
        {},
    ),
]

# --- J. compaction permutations (containers × aliasing × compactArrays),
# per-graph flatten pruning, value-profile term selection (VERDICT r4 #3:
# the official suite weights compaction heavily; compact/flatten were the
# thinnest groups) ------------------------------------------------------

COMPACT += [
    (
        "list object under a plain term emits an aliased @list key",
        # no @list container on the term -> the list survives as an
        # object whose key is compactIri('@list') = the keyword alias
        # (Processor.php:1080-1087)
        [{"@id": EX + "a",
          EX + "p": [{"@list": [{"@value": "x"}, {"@value": "y"}]}]}],
        {"myl": "@list", "p": EX + "p"},
        {"@context": {"myl": "@list", "p": EX + "p"},
         "@id": EX + "a", "p": {"myl": ["x", "y"]}},
        {},
    ),
    (
        "@index survives on a compacted list object",
        # the inner 1-element list compacts to a scalar and is
        # re-wrapped (Processor.php:1062-1066); @index rides along
        [{"@id": EX + "a",
          EX + "p": [{"@list": [{"@value": "x"}], "@index": "k0"}]}],
        {"p": EX + "p"},
        {"@context": {"p": EX + "p"},
         "@id": EX + "a", "p": {"@index": "k0", "@list": ["x"]}},
        {},
    ),
    (
        "compactArrays=false keeps @list-container values as arrays",
        [{"@id": EX + "a", EX + "p": [{"@list": [{"@value": "x"}]}]}],
        {"lst": {"@id": EX + "p", "@container": "@list"}},
        {"@context": {"lst": {"@id": EX + "p", "@container": "@list"}},
         "@graph": [{"@id": EX + "a", "lst": ["x"]}]},
        {"compactArrays": False},
    ),
    (
        "language-map values fold to scalars even with compactArrays=false",
        # map entries merge via mergeIntoProperty WITHOUT the asArray
        # flag (Processor.php:1052) — the option only affects plain
        # properties and the top-level wrapper (bug-compat pin)
        [{"@id": EX + "a",
          EX + "p": [{"@value": "x", "@language": "en"},
                     {"@value": "y", "@language": "de"}]}],
        {"t": {"@id": EX + "p", "@container": "@language"}},
        {"@context": {"t": {"@id": EX + "p", "@container": "@language"}},
         "@graph": [{"@id": EX + "a", "t": {"de": "y", "en": "x"}}]},
        {"compactArrays": False},
    ),
    (
        "index-map values fold to scalars even with compactArrays=false",
        [{"@id": EX + "a",
          EX + "p": [{"@value": "x", "@index": "k1"},
                     {"@value": "y", "@index": "k2"}]}],
        {"t": {"@id": EX + "p", "@container": "@index"}},
        {"@context": {"t": {"@id": EX + "p", "@container": "@index"}},
         "@graph": [{"@id": EX + "a", "t": {"k1": "x", "k2": "y"}}]},
        {"compactArrays": False},
    ),
    (
        "term @language:null captures plain strings under a default language",
        # plain-string profile queries ['@null']['@language']['@null'],
        # which only the null-language term populates
        # (createInverseContext, Processor.php:1861-1867); the untyped
        # term sits in the default-language bucket and takes the tagged
        # value
        [{"@id": EX + "a",
          EX + "p": [{"@value": "plain"},
                     {"@value": "tagged", "@language": "en"}]}],
        {"@language": "en", "p": {"@id": EX + "p", "@language": None},
         "q": EX + "p"},
        {"@context": {"@language": "en",
                      "p": {"@id": EX + "p", "@language": None},
                      "q": EX + "p"},
         "@id": EX + "a", "p": "plain", "q": "tagged"},
        {},
    ),
    (
        "uncompactable value objects use @value/@language aliases",
        [{"@id": EX + "a", EX + "p": [{"@value": "x", "@language": "fr"}]}],
        {"v": "@value", "l": "@language", "p": EX + "p"},
        {"@context": {"v": "@value", "l": "@language", "p": EX + "p"},
         "@id": EX + "a", "p": {"l": "fr", "v": "x"}},
        {},
    ),
    (
        "non-matching typed value keeps the object with a compacted @type",
        [{"@id": EX + "a", EX + "p": [{"@value": "v", "@type": EX + "T"}]}],
        {"ex": EX, "p": EX + "p"},
        {"@context": {"ex": EX, "p": EX + "p"},
         "@id": "ex:a", "p": {"@type": "ex:T", "@value": "v"}},
        {},
    ),
    (
        "@type @vocab coercion compacts @id values through @vocab",
        [{"@id": EX + "a", EX + "p": [{"@id": EX + "v#Thing"}]}],
        {"@vocab": EX + "v#", "p": {"@id": EX + "p", "@type": "@vocab"}},
        {"@context": {"@vocab": EX + "v#",
                      "p": {"@id": EX + "p", "@type": "@vocab"}},
         "@id": EX + "a", "p": "Thing"},
        {},
    ),
    (
        "@reverse term with @set container keeps the array",
        [{"@id": EX + "p1",
          "@reverse": {EX + "parent": [{"@id": EX + "c1"}]}}],
        {"children": {"@reverse": EX + "parent", "@container": "@set"}},
        {"@context": {"children": {"@reverse": EX + "parent",
                                   "@container": "@set"}},
         "@id": EX + "p1", "children": [{"@id": EX + "c1"}]},
        {},
    ),
    (
        "aliased @reverse carries the residual reverse map",
        [{"@id": EX + "p1",
          "@reverse": {EX + "parent": [{"@id": EX + "c1"}]}}],
        {"rev": "@reverse", "ex": EX},
        {"@context": {"rev": "@reverse", "ex": EX},
         "@id": "ex:p1", "rev": {"ex:parent": {"@id": "ex:c1"}}},
        {},
    ),
    (
        "the @graph wrapper takes its keyword alias",
        # JsonLD.php:294-296 looks the wrapper key up in the inverse
        # context
        [{"@id": EX + "a", EX + "p": [{"@value": "1"}]},
         {"@id": EX + "b", EX + "p": [{"@value": "2"}]}],
        {"g": "@graph", "p": EX + "p"},
        {"@context": {"g": "@graph", "p": EX + "p"},
         "g": [{"@id": EX + "a", "p": "1"},
               {"@id": EX + "b", "p": "2"}]},
        {},
    ),
    (
        "empty arrays survive compaction",
        [{"@id": EX + "a", EX + "p": [], EX + "q": [{"@value": "keep"}]}],
        {"p": EX + "p", "q": EX + "q"},
        {"@context": {"p": EX + "p", "q": EX + "q"},
         "@id": EX + "a", "p": [], "q": "keep"},
        {},
    ),
    (
        "items split across terms by value profile (@id vs @vocab)",
        # a term-mapped IRI value prefers the @vocab-coerced term, an
        # unmapped one the @id-coerced term (compactIri preference
        # order, Processor.php:1209-1216) — ONE expanded property
        # splits into two compacted keys
        [{"@id": EX + "a",
          EX + "p": [{"@id": EX + "v#Thing"},
                     {"@id": "http://other.example/x"}]}],
        {"@vocab": EX + "v#",
         "idp": {"@id": EX + "p", "@type": "@id"},
         "vp": {"@id": EX + "p", "@type": "@vocab"},
         "Thing": EX + "v#Thing"},
        {"@context": {"@vocab": EX + "v#",
                      "idp": {"@id": EX + "p", "@type": "@id"},
                      "vp": {"@id": EX + "p", "@type": "@vocab"},
                      "Thing": EX + "v#Thing"},
         "@id": EX + "a", "idp": "http://other.example/x", "vp": "Thing"},
        {},
    ),
    (
        "mixed-profile list still selects the @list-container term",
        # heterogeneous item profiles null the typeLang (getValueProfile,
        # Processor.php:1397-1409); the ['@list']['@null']['@null']
        # bucket still matches, and non-foldable items stay expanded
        [{"@id": EX + "a",
          EX + "p": [{"@list": [{"@value": "x"},
                                {"@value": "y", "@language": "en"}]}]}],
        {"lst": {"@id": EX + "p", "@container": "@list"}},
        {"@context": {"lst": {"@id": EX + "p", "@container": "@list"}},
         "@id": EX + "a",
         "lst": ["x", {"@language": "en", "@value": "y"}]},
        {},
    ),
    (
        "node references group into an index map",
        # compactValue drops the @index consumed as the map key
        # (Processor.php:1148-1150)
        [{"@id": EX + "a", EX + "p": [{"@id": EX + "b", "@index": "k1"}]}],
        {"t": {"@id": EX + "p", "@container": "@index"}},
        {"@context": {"t": {"@id": EX + "p", "@container": "@index"}},
         "@id": EX + "a", "t": {"k1": {"@id": EX + "b"}}},
        {},
    ),
    (
        "indexed values pick the index-map term, plain ones the plain term",
        [{"@id": EX + "a",
          EX + "p": [{"@value": "x", "@index": "k"}, {"@value": "y"}]}],
        {"ix": {"@id": EX + "p", "@container": "@index"}, "pl": EX + "p"},
        {"@context": {"ix": {"@id": EX + "p", "@container": "@index"},
                      "pl": EX + "p"},
         "@id": EX + "a", "ix": {"k": "x"}, "pl": "y"},
        {},
    ),
]

FLATTEN += [
    (
        "reference-only in a named graph is pruned there, kept where propertied",
        # hasNodeProperties runs PER GRAPH (Processor.php:2969-2972)
        {"@graph": [
            {"@id": EX + "x", EX + "p": "v"},
            {"@id": EX + "g",
             "@graph": [{"@id": EX + "y", EX + "q": {"@id": EX + "x"}}]},
        ]},
        [{"@id": EX + "g",
          "@graph": [{"@id": EX + "y", EX + "q": [{"@id": EX + "x"}]}]},
         {"@id": EX + "x", EX + "p": [{"@value": "v"}]}],
    ),
    (
        "list members relabel and their blank nodes flatten out",
        {"@graph": [
            {"@id": EX + "a", EX + "p": {"@list": [{"@id": "_:m"}]}},
            {"@id": "_:m", EX + "q": "v"},
        ]},
        [{"@id": "_:b0", EX + "q": [{"@value": "v"}]},
         {"@id": EX + "a", EX + "p": [{"@list": [{"@id": "_:b0"}]}]}],
    ),
    (
        "embedded node inside a named graph splits out within that graph",
        {"@id": EX + "g",
         "@graph": [{"@id": EX + "a",
                     EX + "p": {"@id": EX + "b", EX + "q": "v"}}]},
        [{"@id": EX + "g",
          "@graph": [{"@id": EX + "a", EX + "p": [{"@id": EX + "b"}]},
                     {"@id": EX + "b", EX + "q": [{"@value": "v"}]}]}],
    ),
    (
        "blank @type values relabel inside a named graph",
        {"@id": EX + "g",
         "@graph": [{"@id": EX + "a", "@type": "_:t"},
                    {"@id": "_:t", EX + "p": "v"}]},
        [{"@id": EX + "g",
          "@graph": [{"@id": "_:b0", EX + "p": [{"@value": "v"}]},
                     {"@id": EX + "a", "@type": ["_:b0"]}]}],
    ),
    (
        "a graph name carrying its own default-graph properties",
        {"@graph": [
            {"@id": EX + "g", EX + "p": "graph-node"},
            {"@id": EX + "g",
             "@graph": [{"@id": EX + "a", EX + "q": "inner"}]},
        ]},
        [{"@id": EX + "g", EX + "p": [{"@value": "graph-node"}],
          "@graph": [{"@id": EX + "a", EX + "q": [{"@value": "inner"}]}]}],
    ),
    (
        "free-floating values vanish in flatten",
        {"@graph": ["free string", {"@value": 42},
                    {"@id": EX + "a", EX + "p": "v"}]},
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}],
    ),
    (
        "reference-only in every graph: node absent everywhere",
        {"@graph": [
            {"@id": EX + "g1",
             "@graph": [{"@id": EX + "a", EX + "p": {"@id": EX + "ref"}}]},
            {"@id": EX + "g2",
             "@graph": [{"@id": EX + "b", EX + "q": {"@id": EX + "ref"}}]},
        ]},
        [{"@id": EX + "g1",
          "@graph": [{"@id": EX + "a", EX + "p": [{"@id": EX + "ref"}]}]},
         {"@id": EX + "g2",
          "@graph": [{"@id": EX + "b", EX + "q": [{"@id": EX + "ref"}]}]}],
    ),
    (
        "@index survives flatten on nodes in a named graph",
        {"@id": EX + "g",
         "@graph": [{"@id": EX + "a", "@index": "k", EX + "p": "v"}]},
        [{"@id": EX + "g",
          "@graph": [{"@id": EX + "a", "@index": "k",
                      EX + "p": [{"@value": "v"}]}]}],
    ),
]

EXPAND += [
    (
        "second context in an array overrides the first's term",
        {"@context": [{"p": EX + "p1"}, {"p": EX + "p2"}],
         "@id": EX + "a", "p": "v"},
        [{"@id": EX + "a", EX + "p2": [{"@value": "v"}]}],
    ),
    (
        "term @language does not tag non-string values",
        {"@context": {"p": {"@id": EX + "p", "@language": "de"}},
         "@id": EX + "a", "p": ["wert", 5]},
        [{"@id": EX + "a",
          EX + "p": [{"@value": "wert", "@language": "de"}, {"@value": 5}]}],
    ),
    (
        "mixed literal and node-object values coexist",
        {"@context": {"p": EX + "p"},
         "@id": EX + "a", "p": ["lit", {"@id": EX + "b"}]},
        [{"@id": EX + "a",
          EX + "p": [{"@value": "lit"}, {"@id": EX + "b"}]}],
    ),
    (
        "term @id defined via a CURIE resolves through the prefix",
        {"@context": {"foaf": "http://xmlns.com/foaf/0.1/",
                      "name": {"@id": "foaf:name"}},
         "@id": EX + "a", "name": "N"},
        [{"@id": EX + "a",
          "http://xmlns.com/foaf/0.1/name": [{"@value": "N"}]}],
    ),
    (
        "@type @id with @set container coerces each entry",
        {"@context": {"p": {"@id": EX + "p", "@type": "@id",
                            "@container": "@set"}},
         "@id": EX + "a", "p": [EX + "c1", EX + "c2"]},
        [{"@id": EX + "a",
          EX + "p": [{"@id": EX + "c1"}, {"@id": EX + "c2"}]}],
    ),
    (
        "aliased @graph unwraps at the top level",
        {"@context": {"g": "@graph"},
         "g": [{"@id": EX + "a", EX + "p": "v"}]},
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}],
    ),
]

TORDF += [
    (
        "language-tagged strings inside a list chain",
        {"@id": EX + "n",
         EX + "p": {"@list": [{"@value": "bonjour", "@language": "fr"}]}},
        [f'<{EX}n> <{EX}p> _:b0 .',
         f'_:b0 <{RDF}first> "bonjour"@fr .',
         f'_:b0 <{RDF}rest> <{RDF}nil> .'],
        {},
    ),
    (
        "reverse + list + literal mix inside one named graph",
        {"@id": EX + "g",
         "@graph": [{"@id": EX + "a",
                     EX + "p": {"@list": [1]},
                     "@reverse": {EX + "r": [{"@id": EX + "b"}]}}]},
        [f'<{EX}a> <{EX}p> _:b0 <{EX}g> .',
         f'_:b0 <{RDF}first> "1"^^<{XSD}integer> <{EX}g> .',
         f'_:b0 <{RDF}rest> <{RDF}nil> <{EX}g> .',
         f'<{EX}b> <{EX}r> <{EX}a> <{EX}g> .'],
        {},
    ),
    (
        "blank node as @type emits an rdf:type bnode object",
        {"@id": EX + "a", "@type": "_:t"},
        [f'<{EX}a> <{RDF_TYPE_IRI}> _:b0 .'],
        {},
    ),
    (
        "typed string with a numeric-looking lexical stays verbatim",
        {"@id": EX + "a",
         EX + "p": {"@value": "5.5", "@type": XSD + "integer"}},
        [f'<{EX}a> <{EX}p> "5.5"^^<{XSD}integer> .'],
        {},
    ),
    (
        "identical literal emitted in both its graphs",
        {"@graph": [
            {"@id": EX + "a", EX + "p": "v"},
            {"@id": EX + "g",
             "@graph": [{"@id": EX + "a", EX + "p": "v"}]},
        ]},
        [f'<{EX}a> <{EX}p> "v" .',
         f'<{EX}a> <{EX}p> "v" <{EX}g> .'],
        {},
    ),
]

FROMRDF += [
    (
        "custom datatypes stay typed values under useNativeTypes",
        [f'<{EX}a> <{EX}p> "x"^^<{EX}dt> .'],
        [{"@id": EX + "a",
          EX + "p": [{"@value": "x", "@type": EX + "dt"}]}],
        {"useNativeTypes": True},
    ),
    (
        "same literal in two graphs appears in both nodes",
        [f'<{EX}a> <{EX}p> "v" .',
         f'<{EX}a> <{EX}p> "v" <{EX}g> .'],
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}]},
         {"@id": EX + "g",
          "@graph": [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}]}],
        {},
    ),
    (
        "double rdf:first makes the chain malformed; both values survive",
        [f'<{EX}a> <{EX}p> _:c .',
         f'_:c <{RDF}first> "x" .',
         f'_:c <{RDF}first> "y" .',
         f'_:c <{RDF}rest> <{RDF}nil> .'],
        [{"@id": "_:c",
          RDF + "first": [{"@value": "x"}, {"@value": "y"}],
          RDF + "rest": [{"@list": []}]},
         {"@id": EX + "a", EX + "p": [{"@id": "_:c"}]}],
        {},
    ),
]


# --- K. fallback term selection, empty-suffix CURIEs, graph-name blank
# nodes, cross-graph reverse, aliased keywords in data position ------------

COMPACT += [
    (
        "plain strings bypass a language-map-only term",
        # a @language-container term registers only under the
        # ['@language'] bucket; plain-string profiles query
        # @set/@null containers, miss, and fall back to CURIE keys
        [{"@id": EX + "a",
          EX + "p": [{"@value": "x"},
                     {"@value": "en-val", "@language": "en"}]}],
        {"t": {"@id": EX + "p", "@container": "@language"}, "ex": EX},
        {"@context": {"t": {"@id": EX + "p", "@container": "@language"},
                      "ex": EX},
         "@id": "ex:a", "ex:p": "x", "t": {"en": "en-val"}},
        {},
    ),
    (
        "non-list values bypass a @list-container-only term",
        [{"@id": EX + "a",
          EX + "p": [{"@list": [{"@value": "a"}]}, {"@value": "v"}]}],
        {"lst": {"@id": EX + "p", "@container": "@list"}, "ex": EX},
        {"@context": {"lst": {"@id": EX + "p", "@container": "@list"},
                      "ex": EX},
         "@id": "ex:a", "ex:p": "v", "lst": ["a"]},
        {},
    ),
    (
        "empty CURIE suffixes are never produced",
        # the prefix IRI itself cannot compact to 'ex:' — the CURIE
        # loop requires a non-empty suffix (Processor.php:1242-1244)
        [{"@id": EX, EX + "p": [{"@value": "v"}]}],
        {"ex": EX},
        {"@context": {"ex": EX},
         "@id": EX, "ex:p": "v"},
        {},
    ),
    (
        "blank node references pass through @id coercion",
        [{"@id": EX + "a", EX + "p": [{"@id": "_:x"}]}],
        {"p": {"@id": EX + "p", "@type": "@id"}},
        {"@context": {"p": {"@id": EX + "p", "@type": "@id"}},
         "@id": EX + "a", "p": "_:x"},
        {},
    ),
    (
        "node @index compacts through its keyword alias",
        [{"@id": EX + "a", "@index": "k", EX + "p": [{"@value": "v"}]}],
        {"idx": "@index", "p": EX + "p"},
        {"@context": {"idx": "@index", "p": EX + "p"},
         "@id": EX + "a", "idx": "k", "p": "v"},
        {},
    ),
    (
        "native values without a matching type bypass the typed term",
        # a term carrying @type registers ONLY under ['@type'][T];
        # native values profile as @language/@null, miss every bucket,
        # and the property key stays the absolute IRI
        [{"@id": EX + "a", EX + "p": [{"@value": 5}, {"@value": True}]}],
        {"p": {"@id": EX + "p", "@type": XSD + "integer"}},
        {"@context": {"p": {"@id": EX + "p", "@type": XSD + "integer"}},
         "@id": EX + "a", EX + "p": [5, True]},
        {},
    ),
    (
        "@type arrays mix term and CURIE compactions",
        [{"@id": EX + "a", "@type": [EX + "T", EX + "U"]}],
        {"T": EX + "T", "ex": EX},
        {"@context": {"T": EX + "T", "ex": EX},
         "@id": "ex:a", "@type": ["T", "ex:U"]},
        {},
    ),
    (
        "multiple values merge into one array under the term",
        [{"@id": EX + "a", EX + "p": [{"@value": "v1"}, {"@value": "v2"}]}],
        {"p": EX + "p"},
        {"@context": {"p": EX + "p"},
         "@id": EX + "a", "p": ["v1", "v2"]},
        {},
    ),
]

FLATTEN += [
    (
        "blank graph names relabel and stay referenceable across graphs",
        {"@graph": [
            {"@id": "_:g1", "@graph": [{"@id": EX + "a", EX + "p": "v1"}]},
            {"@id": "_:g2",
             "@graph": [{"@id": EX + "b", EX + "q": {"@id": "_:g1"}}]},
        ]},
        [{"@id": "_:b0",
          "@graph": [{"@id": EX + "a", EX + "p": [{"@value": "v1"}]}]},
         {"@id": "_:b1",
          "@graph": [{"@id": EX + "b", EX + "q": [{"@id": "_:b0"}]}]}],
    ),
    (
        "reverse edge in a named graph materializes its target there",
        # the forward edge c -> parent -> p1 lives in graph g; p1 is
        # then @id-only IN g and is pruned there, while c gains the
        # property inside g and keeps its default-graph label node
        {"@graph": [
            {"@id": EX + "c", EX + "lbl": "child"},
            {"@id": EX + "g",
             "@graph": [{"@id": EX + "p1",
                         "@reverse": {EX + "parent": [{"@id": EX + "c"}]}}]},
        ]},
        [{"@id": EX + "c", EX + "lbl": [{"@value": "child"}]},
         {"@id": EX + "g",
          "@graph": [{"@id": EX + "c",
                      EX + "parent": [{"@id": EX + "p1"}]}]}],
    ),
    (
        "three nesting levels hoist to three sibling graph nodes",
        {"@id": EX + "g1",
         "@graph": [{"@id": EX + "g2",
                     "@graph": [{"@id": EX + "g3",
                                 "@graph": [{"@id": EX + "a",
                                             EX + "p": "v"}]}]}]},
        [{"@id": EX + "g1", "@graph": []},
         {"@id": EX + "g2", "@graph": []},
         {"@id": EX + "g3",
          "@graph": [{"@id": EX + "a", EX + "p": [{"@value": "v"}]}]}],
    ),
    (
        "top-level @list free-floats away in flatten",
        {"@list": ["x"]},
        [],
    ),
    (
        "keyword-aliased @graph input flattens identically",
        {"@context": {"g": "@graph", "p": EX + "p"},
         "g": [{"@id": EX + "b", "p": "v"},
               {"@id": EX + "a", "p": "w"}]},
        [{"@id": EX + "a", EX + "p": [{"@value": "w"}]},
         {"@id": EX + "b", EX + "p": [{"@value": "v"}]}],
    ),
]

EXPAND += [
    (
        "embedded contexts scope to their subtree",
        {"@context": {"p": EX + "p1"},
         "@id": EX + "a",
         "p": {"@context": {"p": EX + "p2"}, "@id": EX + "b",
               "p": "inner"}},
        [{"@id": EX + "a",
          EX + "p1": [{"@id": EX + "b",
                       EX + "p2": [{"@value": "inner"}]}]}],
    ),
    (
        "aliased @list in data position builds a list object",
        {"@context": {"myl": "@list", "p": EX + "p"},
         "@id": EX + "a", "p": {"myl": ["a", "b"]}},
        [{"@id": EX + "a",
          EX + "p": [{"@list": [{"@value": "a"}, {"@value": "b"}]}]}],
    ),
    (
        "null inside a plain value array is dropped",
        {"@context": {"p": EX + "p"},
         "@id": EX + "a", "p": ["a", None]},
        [{"@id": EX + "a", EX + "p": [{"@value": "a"}]}],
    ),
]

TORDF += [
    (
        "blank subject and blank object relabel independently",
        {"@id": "_:s", EX + "p": {"@id": "_:o"}},
        [f'_:b0 <{EX}p> _:b1 .'],
        {},
    ),
]

FROMRDF += [
    (
        "language-tagged literal inside a named graph",
        [f'<{EX}a> <{EX}p> "bonjour"@fr <{EX}g> .'],
        [{"@id": EX + "g",
          "@graph": [{"@id": EX + "a",
                      EX + "p": [{"@value": "bonjour",
                                  "@language": "fr"}]}]}],
        {},
    ),
]


# --- L. reverse-term competition, @list-index elision, %1.15E rounding,
# aliased value objects in data, dot-segment bases -------------------------

EXPAND += [
    (
        "value object keeps @index alongside @language",
        {"@id": EX + "a",
         EX + "p": {"@value": "x", "@language": "fr", "@index": "k"}},
        [{"@id": EX + "a",
          EX + "p": [{"@value": "x", "@language": "fr", "@index": "k"}]}],
    ),
    (
        "null inside @set leaves an empty array behind",
        {"@context": {"p": {"@id": EX + "p", "@container": "@set"}},
         "@id": EX + "a", "p": {"@set": [None]}, EX + "q": "keep"},
        [{"@id": EX + "a", EX + "p": [],
          EX + "q": [{"@value": "keep"}]}],
    ),
    (
        "aliased @value/@language build a value object from data",
        {"@context": {"v": "@value", "l": "@language", "p": EX + "p"},
         "@id": EX + "a", "p": {"v": "bonjour", "l": "fr"}},
        [{"@id": EX + "a",
          EX + "p": [{"@value": "bonjour", "@language": "fr"}]}],
    ),
    (
        "dot-segment relative @ids resolve per RFC 3986 merge",
        # harness base = baseIri + input basename, so './x' strips the
        # filename segment and '../y' also strips the tests/ segment
        {"@context": {"p": {"@id": EX + "p", "@type": "@id"}},
         "@id": "./x", "p": "../y"},
        [{"@id": BASE + "x",
          EX + "p": [{"@id": "https://w3c.example.org/y"}]}],
    ),
    (
        "absolute-IRI @type values ignore @vocab",
        {"@context": {"@vocab": EX + "v#"},
         "@id": EX + "a", "@type": ["T", "http://other.example/U"]},
        [{"@id": EX + "a",
          "@type": [EX + "v#T", "http://other.example/U"]}],
    ),
]

COMPACT += [
    (
        "compactArrays=false keeps a single @type as an array",
        # the @type fold is guarded by compactArrays
        # (Processor.php:977-979)
        [{"@id": EX + "a", "@type": [EX + "T"]}],
        {"ex": EX},
        {"@context": {"ex": EX},
         "@graph": [{"@id": "ex:a", "@type": ["ex:T"]}]},
        {"compactArrays": False},
    ),
    (
        "reverse-term competition: the @set-container term wins node refs",
        # a node-reference profile queries containers (@set, @set,
        # @null): the @set-container reverse term sits in the ['@set']
        # bucket and is found before the container-less one
        [{"@id": EX + "p1",
          "@reverse": {EX + "parent": [{"@id": EX + "c1"}]}}],
        {"rset": {"@reverse": EX + "parent", "@container": "@set",
                  "@type": "@id"},
         "rplain": {"@reverse": EX + "parent", "@type": "@id"}},
        {"@context": {"rset": {"@reverse": EX + "parent",
                               "@container": "@set", "@type": "@id"},
                      "rplain": {"@reverse": EX + "parent",
                                 "@type": "@id"}},
         "@id": EX + "p1", "rset": [EX + "c1"]},
        {},
    ),
    (
        "@index-bearing values pick the index map over the language map",
        # @index on the value forces profile container '@index'
        # (getValueProfile, Processor.php:1353-1355)
        [{"@id": EX + "a",
          EX + "p": [{"@value": "x", "@language": "en", "@index": "k"},
                     {"@value": "y", "@language": "en"}]}],
        {"ix": {"@id": EX + "p", "@container": "@index"},
         "lm": {"@id": EX + "p", "@container": "@language"}},
        {"@context": {"ix": {"@id": EX + "p", "@container": "@index"},
                      "lm": {"@id": EX + "p", "@container": "@language"}},
         "@id": EX + "a",
         "ix": {"k": {"@language": "en", "@value": "x"}},
         "lm": {"en": "y"}},
        {},
    ),
    (
        "@index on a list object deselects the @list-container term",
        # getValueProfile REPLACES an @list object's profile with its
        # first item's and only restores the '@list' container when
        # the object carries no @index (Processor.php:1386-1396) — so
        # an indexed list never matches the ['@list'] bucket, the key
        # stays the absolute IRI, and the value keeps @list + @index
        # (a DRAFT golden for this case assumed the term would match
        # and drop the index; the kernel disagreed and the PHP trace
        # sided with the kernel)
        [{"@id": EX + "a",
          EX + "p": [{"@list": [{"@value": "x"}], "@index": "k"}]}],
        {"lst": {"@id": EX + "p", "@container": "@list"}},
        {"@context": {"lst": {"@id": EX + "p", "@container": "@list"}},
         "@id": EX + "a",
         EX + "p": {"@index": "k", "@list": ["x"]}},
        {},
    ),
    (
        "embedded node objects compact recursively",
        [{"@id": EX + "a",
          EX + "knows": [{"@id": EX + "b",
                          EX + "knows": [{"@id": EX + "c",
                                          EX + "name": [{"@value": "C"}]}]}]}],
        {"ex": EX, "knows": EX + "knows", "name": EX + "name"},
        {"@context": {"ex": EX, "knows": EX + "knows", "name": EX + "name"},
         "@id": "ex:a",
         "knows": {"@id": "ex:b",
                   "knows": {"@id": "ex:c", "name": "C"}}},
        {},
    ),
    (
        "booleans select the untyped term, not the language-tagged one",
        [{"@id": EX + "a", EX + "p": [{"@value": True}]}],
        {"de": {"@id": EX + "p", "@language": "de"}, "pl": EX + "p"},
        {"@context": {"de": {"@id": EX + "p", "@language": "de"},
                      "pl": EX + "p"},
         "@id": EX + "a", "pl": True},
        {},
    ),
]

FLATTEN += [
    (
        "@reverse onto a blank node relabels the forward edge",
        {"@graph": [
            {"@id": "_:child",
             "@reverse": {EX + "parent": [{"@id": EX + "p1"}]}},
            {"@id": EX + "p1", EX + "name": "P"},
        ]},
        [{"@id": EX + "p1",
          EX + "name": [{"@value": "P"}],
          EX + "parent": [{"@id": "_:b0"}]}],
    ),
    (
        "two embedding levels split into three sibling nodes",
        {"@id": EX + "a",
         EX + "p": {"@id": EX + "b",
                    EX + "q": {"@id": EX + "c", EX + "r": "v"}}},
        [{"@id": EX + "a", EX + "p": [{"@id": EX + "b"}]},
         {"@id": EX + "b", EX + "q": [{"@id": EX + "c"}]},
         {"@id": EX + "c", EX + "r": [{"@value": "v"}]}],
    ),
    (
        "@list values keep IRI references intact through the node map",
        {"@graph": [
            {"@id": EX + "a",
             EX + "p": {"@list": [{"@id": EX + "x"}, {"@id": EX + "y"}]}},
            {"@id": EX + "x", EX + "q": "vx"},
        ]},
        [{"@id": EX + "a",
          EX + "p": [{"@list": [{"@id": EX + "x"}, {"@id": EX + "y"}]}]},
         {"@id": EX + "x", EX + "q": [{"@value": "vx"}]}],
    ),
]

TORDF += [
    (
        "seventeen-digit doubles round at the %1.15E boundary",
        # 0.30000000000000004 needs 17 significant digits; %1.15E
        # prints 16 and rounds, and trailing-zero compression yields
        # plain 3.0E-1 (Value.php:69-112)
        {"@id": EX + "a", EX + "p": 0.30000000000000004},
        [f'<{EX}a> <{EX}p> "3.0E-1"^^<{XSD}double> .'],
        {},
    ),
    (
        "generalized-RDF blank predicates inside a named graph",
        {"@id": EX + "g",
         "@graph": [{"@id": EX + "a", "_:p": "v"}]},
        [f'<{EX}a> _:b0 "v" <{EX}g> .'],
        {"produceGeneralizedRdf": True},
    ),
    (
        "empty-string literals serialize as empty quotes",
        {"@id": EX + "a", EX + "p": ""},
        [f'<{EX}a> <{EX}p> "" .'],
        {},
    ),
]

FROMRDF += [
    (
        "escaped newline and quote round-trip through the parser",
        [f'<{EX}a> <{EX}p> "line1\\nline\\"2" .'],
        [{"@id": EX + "a",
          EX + "p": [{"@value": 'line1\nline"2'}]}],
        {},
    ),
    (
        "xsd:boolean literals convert with useNativeTypes",
        [f'<{EX}a> <{EX}p> "true"^^<{XSD}boolean> .',
         f'<{EX}a> <{EX}q> "false"^^<{XSD}boolean> .'],
        [{"@id": EX + "a",
          EX + "p": [{"@value": True}],
          EX + "q": [{"@value": False}]}],
        {"useNativeTypes": True},
    ),
]


# --- M. language-tag case in term defs, index-map edge shapes, @type
# merging, value-@index erasure in RDF --------------------------------------

EXPAND += [
    (
        "term @language case is preserved verbatim (bug-compat)",
        # the reference's ONLY strtolower is on language-MAP keys
        # (Processor.php:427); a term definition's @language tags
        # values verbatim
        {"@context": {"p": {"@id": EX + "p", "@language": "DE"}},
         "@id": EX + "a", "p": "wert"},
        [{"@id": EX + "a",
          EX + "p": [{"@value": "wert", "@language": "DE"}]}],
    ),
    (
        "default @language case is preserved verbatim (bug-compat)",
        {"@context": {"@language": "EN", "p": EX + "p"},
         "@id": EX + "a", "p": "word"},
        [{"@id": EX + "a",
          EX + "p": [{"@value": "word", "@language": "EN"}]}],
    ),
]

COMPACT += [
    (
        "@index-bearing values bypass a language-map-only term",
        # profile container '@index' never matches the ['@language']
        # bucket; with no other term the key falls back to the
        # absolute IRI and the value keeps @index
        [{"@id": EX + "a",
          EX + "p": [{"@value": "x", "@language": "en", "@index": "k"}]}],
        {"lm": {"@id": EX + "p", "@container": "@language"}},
        {"@context": {"lm": {"@id": EX + "p", "@container": "@language"}},
         "@id": EX + "a",
         EX + "p": {"@index": "k", "@language": "en", "@value": "x"}},
        {},
    ),
    (
        "node objects with properties keep their shape inside an index map",
        # compactValue consumes the @index as the map key
        # (Processor.php:1148-1150); the remaining node object (>1
        # members) compacts recursively
        [{"@id": EX + "a",
          EX + "p": [{"@id": EX + "b", "@index": "k",
                      EX + "q": [{"@value": "v"}]}]}],
        {"ix": {"@id": EX + "p", "@container": "@index"}, "q": EX + "q"},
        {"@context": {"ix": {"@id": EX + "p", "@container": "@index"},
                      "q": EX + "q"},
         "@id": EX + "a",
         "ix": {"k": {"@id": EX + "b", "q": "v"}}},
        {},
    ),
    (
        "typed values pick the exact-@type term over the untyped term",
        [{"@id": EX + "a",
          EX + "p": [{"@value": "v", "@type": EX + "T"}, {"@value": "w"}]}],
        {"tt": {"@id": EX + "p", "@type": EX + "T"}, "pl": EX + "p"},
        {"@context": {"tt": {"@id": EX + "p", "@type": EX + "T"},
                      "pl": EX + "p"},
         "@id": EX + "a", "tt": "v", "pl": "w"},
        {},
    ),
]

FLATTEN += [
    (
        "@type arrays union with first-seen dedup across split nodes",
        {"@graph": [
            {"@id": EX + "a", "@type": [EX + "T1", EX + "T2"]},
            {"@id": EX + "a", "@type": [EX + "T2", EX + "T3"]},
        ]},
        [{"@id": EX + "a",
          "@type": [EX + "T1", EX + "T2", EX + "T3"]}],
    ),
    (
        "equal lexical values with different @index stay distinct",
        # node-map dedup compares WHOLE value objects; a differing
        # @index makes them different values, both kept in order
        {"@id": EX + "a",
         EX + "p": [{"@value": "x", "@index": "k1"},
                    {"@value": "x", "@index": "k2"}]},
        [{"@id": EX + "a",
          EX + "p": [{"@value": "x", "@index": "k1"},
                     {"@value": "x", "@index": "k2"}]}],
    ),
]

TORDF += [
    (
        "value-level @index is erased in RDF, the literal survives",
        {"@id": EX + "a", EX + "p": {"@value": "v", "@index": "k"}},
        [f'<{EX}a> <{EX}p> "v" .'],
        {},
    ),
    (
        "negative non-integral doubles keep the sign in canonical form",
        {"@id": EX + "a", EX + "p": -0.5},
        [f'<{EX}a> <{EX}p> "-5.0E-1"^^<{XSD}double> .'],
        {},
    ),
]

FROMRDF += [
    (
        "PHP native-conversion quirks: pipe signs, trims, saturation",
        # TypedValue.php:105/112 quirks, all bug-compat (see
        # kernel/rdf.py): the regex sign class [\+|-] matches '|' so
        # "|5" passes and intval("|5") = 0; the regex runs on the
        # TRIMMED lexical but intval on the raw (" 5 " -> 5); ".5"
        # fails the double regex (leading digit required) and stays a
        # typed string; out-of-int64 integers saturate at PHP_INT_MAX
        [f'<{EX}a> <{EX}pipe> "|5"^^<{XSD}integer> .',
         f'<{EX}a> <{EX}pad> " 5 "^^<{XSD}integer> .',
         f'<{EX}a> <{EX}dot> ".5"^^<{XSD}double> .',
         f'<{EX}a> <{EX}big> "99999999999999999999"^^<{XSD}integer> .'],
        [{"@id": EX + "a",
          EX + "big": [{"@value": 9223372036854775807}],
          EX + "dot": [{"@value": ".5", "@type": XSD + "double"}],
          EX + "pad": [{"@value": 5}],
          EX + "pipe": [{"@value": 0}]}],
        {"useNativeTypes": True},
    ),
    (
        "IRI-valued list items reconstruct as references",
        [f'<{EX}a> <{EX}p> _:c .',
         f'_:c <{RDF}first> <{EX}x> .',
         f'_:c <{RDF}rest> <{RDF}nil> .'],
        [{"@id": EX + "a",
          EX + "p": [{"@list": [{"@id": EX + "x"}]}]}],
        {},
    ),
]

# --------------------------------------------------------------------------
# frame tests: (name, input, frame, expected) for positive cases,
# (name, input, frame, None, errorCode) for negatives. Semantics mirror
# the reference's OWN framing algorithm (Processor.php:2478-2811 —
# deep value matching + aggressive re-embedding; the reference itself
# skips 11 official framing tests over these deviations,
# Test/W3CTestSuiteTest.php:258-276, so these fixtures pin the
# reference behavior, not the official-suite behavior). Key quirks
# pinned below:
# * frame-mode expansion wraps explicit @value/@language/@index into
#   ARRAYS (Processor.php:666-671, 689-693), which then match via
#   in_array's LOOSE == (Processor.php:2736, pre-PHP-8 semantics:
#   "5" == 5, "abc" == 0) — while raw scalar frame values become
#   {"@value": <scalar>} and match via strict === (Processor.php:2678)
# * @type: [] silently VANISHES in frame expansion ("don't keep empty
#   arrays", Processor.php:650-653)
# * a frame with an @graph property can never match: the named-graph
#   existence probe checks an unprefixed node-map key that never
#   exists (Processor.php:2602-2603, 2613-2639)
# * every node-map node is tried top-level, and shared children
#   re-embed fully under each parent (aggressive re-embedding)
# --------------------------------------------------------------------------

_FEX = {"ex": EX}

# --- flatten(input, context): the compacting API form (JsonLD.php:352-367,
# doCompact alwaysGraph=true — the result ALWAYS wraps under a possibly
# aliased @graph, even for a single node / an empty result) ---------------

FLATTEN += [
    (
        "a single flattened node still wraps in @graph under a context",
        {"@id": EX + "a", "http://xmlns.com/foaf/0.1/name": "Alice"},
        {"@context": {"name": "http://xmlns.com/foaf/0.1/name"},
         "@graph": [{"@id": EX + "a", "name": "Alice"}]},
        {"name": "http://xmlns.com/foaf/0.1/name"},
    ),
    (
        "split-out embedded node compacts its reference via @type @id",
        {"@id": EX + "a",
         EX + "vocab#knows": {"@id": EX + "b", EX + "vocab#name": "Bob"}},
        {"@context": {"knows": {"@id": EX + "vocab#knows", "@type": "@id"},
                      "name": EX + "vocab#name"},
         "@graph": [
             {"@id": EX + "a", "knows": EX + "b"},
             {"@id": EX + "b", "name": "Bob"}]},
        {"knows": {"@id": EX + "vocab#knows", "@type": "@id"},
         "name": EX + "vocab#name"},
    ),
    (
        "relabeled blank node compacts its reference to the new label",
        {"@id": EX + "a", EX + "vocab#knows": {EX + "vocab#name": "Anon"}},
        {"@context": {"knows": {"@id": EX + "vocab#knows", "@type": "@id"},
                      "name": EX + "vocab#name"},
         "@graph": [
             {"@id": "_:b0", "name": "Anon"},
             {"@id": EX + "a", "knows": "_:b0"}]},
        {"knows": {"@id": EX + "vocab#knows", "@type": "@id"},
         "name": EX + "vocab#name"},
    ),
    (
        "named-graph nesting and the wrapper both use the @graph alias",
        {"@id": EX + "G",
         "@graph": [{"@id": EX + "a", EX + "vocab#name": "X"}]},
        {"@context": {"g": "@graph", "name": EX + "vocab#name"},
         "g": [{"@id": EX + "G",
                "g": [{"@id": EX + "a", "name": "X"}]}]},
        {"g": "@graph", "name": EX + "vocab#name"},
    ),
    (
        "an empty flatten result compacts to an empty @graph",
        {"@id": EX + "only"},
        {"@context": {"name": EX + "vocab#name"}, "@graph": []},
        {"name": EX + "vocab#name"},
    ),
    (
        "@list-container term collapses list objects after flatten",
        {"@id": EX + "a", EX + "vocab#seq": {"@list": ["x", "y"]}},
        {"@context": {"seq": {"@id": EX + "vocab#seq",
                              "@container": "@list"}},
         "@graph": [{"@id": EX + "a", "seq": ["x", "y"]}]},
        {"seq": {"@id": EX + "vocab#seq", "@container": "@list"}},
    ),
    (
        "keyword-aliased @id applies to every flattened node",
        [{"@id": EX + "a", EX + "vocab#name": "A"},
         {"@id": EX + "b", EX + "vocab#name": "B"}],
        {"@context": {"id": "@id", "name": EX + "vocab#name"},
         "@graph": [{"id": EX + "a", "name": "A"},
                    {"id": EX + "b", "name": "B"}]},
        {"id": "@id", "name": EX + "vocab#name"},
    ),
    (
        "language map regroups after flatten",
        {"@id": EX + "a",
         EX + "vocab#label": [{"@value": "dog", "@language": "en"},
                              {"@value": "Hund", "@language": "de"}]},
        {"@context": {"label": {"@id": EX + "vocab#label",
                                "@container": "@language"}},
         "@graph": [{"@id": EX + "a",
                     "label": {"de": "Hund", "en": "dog"}}]},
        {"label": {"@id": EX + "vocab#label", "@container": "@language"}},
    ),
]

FRAME = [
    (
        "empty frame embeds every node",
        {"@context": _FEX, "@id": "ex:a",
         "ex:p": {"@id": "ex:b", "ex:q": "vb"}},
        {},
        {"@graph": [
            {"@id": EX + "a",
             EX + "p": {"@id": EX + "b", EX + "q": "vb"}},
            {"@id": EX + "b", EX + "q": "vb"}]},
    ),
    (
        "@type match selects typed nodes",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T", "ex:p": "va"},
            {"@id": "ex:b", "@type": "ex:U", "ex:p": "vb"}]},
        {"@context": _FEX, "@type": "ex:T"},
        {"@context": _FEX,
         "@graph": [{"@id": "ex:a", "@type": "ex:T", "ex:p": "va"}]},
    ),
    (
        "@type alternatives match any listed type",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T"},
            {"@id": "ex:b", "@type": "ex:U"},
            {"@id": "ex:c", "@type": "ex:V"}]},
        {"@context": _FEX, "@type": ["ex:T", "ex:U"]},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T"},
            {"@id": "ex:b", "@type": "ex:U"}]},
    ),
    (
        "@id exact match",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "ex:p": "va"}, {"@id": "ex:b", "ex:p": "vb"}]},
        {"@context": _FEX, "@id": "ex:a"},
        {"@context": _FEX, "@graph": [{"@id": "ex:a", "ex:p": "va"}]},
    ),
    (
        "property presence via a wildcard subframe",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "ex:p": {"@id": "ex:x", "ex:q": "inner"}},
            {"@id": "ex:b", "ex:r": "vb"}]},
        {"@context": _FEX, "ex:p": {}},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a",
             "ex:p": {"@id": "ex:x", "ex:q": "inner"}}]},
    ),
    (
        "[] requires the property to be absent",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "ex:p": "va", "ex:q": "qa"},
            {"@id": "ex:b", "ex:q": "qb"}]},
        {"@context": _FEX, "ex:p": []},
        {"@context": _FEX, "@graph": [{"@id": "ex:b", "ex:q": "qb"}]},
    ),
    (
        "@default fills a missing property",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T", "ex:p": "va"},
            {"@id": "ex:b", "@type": "ex:T"}]},
        {"@context": _FEX, "@type": "ex:T", "ex:p": {"@default": "fallback"}},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T", "ex:p": "va"},
            {"@id": "ex:b", "@type": "ex:T", "ex:p": "fallback"}]},
    ),
    (
        "@default null compacts to a null value",
        {"@context": _FEX, "@graph": [{"@id": "ex:b", "@type": "ex:T"}]},
        {"@context": _FEX, "@type": "ex:T", "ex:p": {"@default": None}},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:b", "@type": "ex:T", "ex:p": None}]},
    ),
    (
        "@embed false keeps references only",
        {"@context": _FEX, "@id": "ex:a", "@type": "ex:T",
         "ex:p": {"@id": "ex:b", "ex:q": "vb"}},
        {"@context": _FEX, "@type": "ex:T", "@embed": False},
        {"@context": _FEX, "@graph": [{"@id": "ex:a"}]},
    ),
    (
        "@explicit keeps only framed properties",
        {"@context": _FEX, "@id": "ex:a", "@type": "ex:T",
         "ex:p": "keep", "ex:q": "drop"},
        {"@context": _FEX, "@type": "ex:T", "ex:p": {}, "@explicit": True},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T", "ex:p": "keep"}]},
    ),
    (
        "@embedChildren false copies references verbatim",
        {"@context": _FEX, "@id": "ex:a", "@type": "ex:T",
         "ex:p": {"@id": "ex:b", "ex:q": "vb"}},
        {"@context": _FEX, "@type": "ex:T", "@embedChildren": False},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T", "ex:p": {"@id": "ex:b"}}]},
    ),
    (
        "nested subframe constrains the child",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "ex:knows": {"@id": "ex:x", "@type": "ex:T"}},
            {"@id": "ex:b", "ex:knows": {"@id": "ex:y", "@type": "ex:U"}}]},
        {"@context": _FEX, "ex:knows": {"@type": "ex:T"}},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a",
             "ex:knows": {"@id": "ex:x", "@type": "ex:T"}}]},
    ),
    (
        "subframe @embed false truncates the child",
        {"@context": _FEX, "@id": "ex:a",
         "ex:knows": {"@id": "ex:x", "@type": "ex:T", "ex:q": "vx"}},
        {"@context": _FEX, "ex:knows": {"@type": "ex:T", "@embed": False}},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "ex:knows": {"@id": "ex:x"}}]},
    ),
    (
        "raw string value matches strictly",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "ex:p": "hit"}, {"@id": "ex:b", "ex:p": "miss"}]},
        {"@context": _FEX, "ex:p": "hit"},
        {"@context": _FEX, "@graph": [{"@id": "ex:a", "ex:p": "hit"}]},
    ),
    (
        "typed value object match",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "ex:p": {"@value": "5", "@type": "ex:num"}},
            {"@id": "ex:b", "ex:p": {"@value": "5", "@type": "ex:other"}}]},
        {"@context": _FEX, "ex:p": {"@value": "5", "@type": "ex:num"}},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a",
             "ex:p": {"@value": "5", "@type": "ex:num"}}]},
    ),
    (
        "language-tagged value match",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "ex:p": {"@value": "chat", "@language": "fr"}},
            {"@id": "ex:b", "ex:p": {"@value": "chat", "@language": "en"}}]},
        {"@context": _FEX, "ex:p": {"@value": "chat", "@language": "fr"}},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a",
             "ex:p": {"@value": "chat", "@language": "fr"}}]},
    ),
    (
        "raw integer matches int strictly, not float",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "ex:p": 5}, {"@id": "ex:b", "ex:p": 5.0}]},
        {"@context": _FEX, "ex:p": 5},
        {"@context": _FEX, "@graph": [{"@id": "ex:a", "ex:p": 5}]},
    ),
    (
        "raw boolean true does not match 1",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "ex:p": True}, {"@id": "ex:b", "ex:p": 1}]},
        {"@context": _FEX, "ex:p": True},
        {"@context": _FEX, "@graph": [{"@id": "ex:a", "ex:p": True}]},
    ),
    (
        "explicit @value matches loosely ('5' matches 5)",
        {"@context": _FEX, "@id": "ex:a", "ex:p": 5},
        {"@context": _FEX, "ex:p": {"@value": "5"}},
        {"@context": _FEX, "@graph": [{"@id": "ex:a", "ex:p": 5}]},
    ),
    (
        "explicit @value 0 matches 'abc' (pre-PHP-8 loose ==)",
        {"@context": _FEX, "@id": "ex:a", "ex:p": "abc"},
        {"@context": _FEX, "ex:p": {"@value": 0}},
        {"@context": _FEX, "@graph": [{"@id": "ex:a", "ex:p": "abc"}]},
    ),
    (
        "explicit @value array lists alternatives",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "ex:p": "a"}, {"@id": "ex:b", "ex:p": "b"},
            {"@id": "ex:c", "ex:p": "c"}]},
        {"@context": _FEX, "ex:p": {"@value": ["a", "b"]}},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "ex:p": "a"}, {"@id": "ex:b", "ex:p": "b"}]},
    ),
    (
        "explicit @language array lists alternatives",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "ex:p": {"@value": "chat", "@language": "fr"}},
            {"@id": "ex:b", "ex:p": {"@value": "chat", "@language": "en"}}]},
        {"@context": _FEX, "ex:p": {"@value": "chat", "@language": ["fr", "de"]}},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a",
             "ex:p": {"@language": "fr", "@value": "chat"}}]},
    ),
    (
        "@type [] vanishes during frame expansion",
        {"@context": _FEX, "@id": "ex:a", "@type": "ex:T", "ex:p": "v"},
        {"@context": _FEX, "@type": [], "ex:p": {}},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T", "ex:p": "v"}]},
    ),
    (
        "mutual references stop at the visited path",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "ex:p": {"@id": "ex:b"}},
            {"@id": "ex:b", "ex:q": {"@id": "ex:a"}}]},
        {},
        {"@graph": [
            {"@id": EX + "a",
             EX + "p": {"@id": EX + "b",
                        EX + "q": {"@id": EX + "a"}}},
            {"@id": EX + "b",
             EX + "q": {"@id": EX + "a",
                        EX + "p": {"@id": EX + "b"}}}]},
    ),
    (
        "shared child re-embeds under every parent",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:P", "ex:p": {"@id": "ex:c"}},
            {"@id": "ex:b", "@type": "ex:P", "ex:p": {"@id": "ex:c"}},
            {"@id": "ex:c", "ex:q": "shared"}]},
        {"@context": _FEX, "@type": "ex:P"},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:P",
             "ex:p": {"@id": "ex:c", "ex:q": "shared"}},
            {"@id": "ex:b", "@type": "ex:P",
             "ex:p": {"@id": "ex:c", "ex:q": "shared"}}]},
    ),
    (
        "a frame with @graph can never match (bug-compat)",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:g", "@graph": [{"@id": "ex:m", "ex:p": "v"}]}]},
        {"@context": _FEX, "@id": "ex:g", "@graph": [{}]},
        {"@context": _FEX, "@graph": []},
    ),
    (
        "no match yields an empty graph",
        {"@context": _FEX, "@id": "ex:a", "@type": "ex:T"},
        {"@context": _FEX, "@type": "ex:Missing"},
        {"@context": _FEX, "@graph": []},
    ),
    (
        "output compacts with the frame's context",
        {"@context": {"p": EX + "p"}, "@id": EX + "a", "p": "v"},
        {"@context": {"prop": EX + "p"}, "prop": {}},
        {"@context": {"prop": EX + "p"},
         "@graph": [{"@id": EX + "a", "prop": "v"}]},
    ),
    (
        "the @graph wrapper takes its keyword alias",
        {"@context": _FEX, "@id": "ex:a", "@type": "ex:T"},
        {"@context": {"ex": EX, "data": "@graph"}, "@type": "ex:T"},
        {"@context": {"ex": EX, "data": "@graph"},
         "data": [{"@id": "ex:a", "@type": "ex:T"}]},
    ),
    (
        "list objects embed through a wildcard",
        {"@context": _FEX, "@id": "ex:a", "@type": "ex:T",
         "ex:p": {"@list": ["x", "y"]}},
        {"@context": _FEX, "@type": "ex:T"},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T",
             "ex:p": {"@list": ["x", "y"]}}]},
    ),
    (
        "@list subframe filters list items",
        {"@context": _FEX, "@id": "ex:a",
         "ex:p": {"@list": ["keep", "drop"]}},
        {"@context": _FEX, "ex:p": {"@list": "keep"}},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "ex:p": {"@list": ["keep"]}}]},
    ),
    (
        "matching works on the merged graph",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:g1", "@graph": [
                {"@id": "ex:a", "@type": "ex:T", "ex:p": "from-g1"}]},
            {"@id": "ex:g2", "@graph": [
                {"@id": "ex:a", "ex:q": "from-g2"}]}]},
        {"@context": _FEX, "@type": "ex:T"},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T",
             "ex:p": "from-g1", "ex:q": "from-g2"}]},
    ),
    (
        "self reference collapses to an id reference",
        {"@context": _FEX, "@id": "ex:a", "ex:p": {"@id": "ex:a"}},
        {},
        {"@graph": [
            {"@id": EX + "a",
             EX + "p": {"@id": EX + "a"}}]},
    ),
    (
        "empty-array property counts as missing for @default",
        {"@context": _FEX, "@graph": [{"@id": "ex:a", "@type": "ex:T"}]},
        {"@context": _FEX, "@type": "ex:T", "ex:p": [{"@default": "dft"}]},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T", "ex:p": "dft"}]},
    ),
    (
        "a @graph-only frame unwraps to its content",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T", "ex:p": "va"},
            {"@id": "ex:b", "@type": "ex:U"}]},
        {"@context": _FEX, "@graph": {"@type": "ex:T"}},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T", "ex:p": "va"}]},
    ),
    (
        "@default coexists with a nested subframe",
        {"@context": _FEX, "@id": "ex:a", "@type": "ex:T",
         "ex:knows": {"@id": "ex:x", "@type": "ex:K"}},
        {"@context": _FEX, "@type": "ex:T",
         "ex:missing": {"@default": "dft"},
         "ex:knows": {"@type": "ex:K"}},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T",
             "ex:knows": {"@id": "ex:x", "@type": "ex:K"},
             "ex:missing": "dft"}]},
    ),
    (
        "a relative frame @id resolves against the base",
        {"@context": _FEX, "@id": "rel", "ex:p": "v"},
        {"@context": _FEX, "@id": "rel"},
        {"@context": _FEX, "@graph": [{"@id": "rel", "ex:p": "v"}]},
    ),
    (
        "list node references embed fully via a wildcard",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T",
             "ex:p": {"@list": [{"@id": "ex:m1"}, {"@id": "ex:m2"}]}},
            {"@id": "ex:m1", "ex:q": "v1"}, {"@id": "ex:m2", "ex:q": "v2"}]},
        {"@context": _FEX, "@type": "ex:T"},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T",
             "ex:p": {"@list": [
                 {"@id": "ex:m1", "ex:q": "v1"},
                 {"@id": "ex:m2", "ex:q": "v2"}]}}]},
    ),
    (
        "a @list subframe constrains list node references",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a",
             "ex:p": {"@list": [{"@id": "ex:m1"}, {"@id": "ex:m2"}]}},
            {"@id": "ex:m1", "@type": "ex:K", "ex:q": "v1"},
            {"@id": "ex:m2", "@type": "ex:L", "ex:q": "v2"}]},
        {"@context": _FEX, "ex:p": {"@list": {"@type": "ex:K"}}},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "ex:p": {"@list": [
                {"@id": "ex:m1", "@type": "ex:K", "ex:q": "v1"}]}}]},
    ),
    (
        "@embedChildren false keeps list references verbatim",
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T",
             "ex:p": {"@list": [{"@id": "ex:m1"}]}},
            {"@id": "ex:m1", "ex:q": "v1"}]},
        {"@context": _FEX, "@type": "ex:T", "@embedChildren": False},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T",
             "ex:p": {"@list": [{"@id": "ex:m1"}]}}]},
    ),
    (
        "embedded blank nodes keep their relabeled ids",
        {"@context": _FEX, "@id": "ex:a", "@type": "ex:T",
         "ex:p": {"ex:q": "anon"}},
        {"@context": _FEX, "@type": "ex:T"},
        {"@context": _FEX, "@graph": [
            {"@id": "ex:a", "@type": "ex:T",
             "ex:p": {"@id": "_:b0", "ex:q": "anon"}}]},
    ),
    # negatives
    (
        "frame must be an object",
        {"@id": EX + "a"},
        ["not-an-object"],
        None,
        "unknown",
    ),
    (
        "two top-level frame objects are invalid",
        {"@context": _FEX, "@id": "ex:a"},
        {"@context": _FEX, "@graph": [{"@type": "ex:T"}, {"@type": "ex:U"}]},
        None,
        "unknown",
    ),
    (
        "@id alternatives are rejected in frame expansion (bug-compat)",
        {"@context": _FEX, "@id": "ex:a"},
        {"@context": _FEX, "@id": ["ex:a", "ex:c"]},
        None,
        "invalid @id value",
    ),
]


# --- top-level framing-option edges (Processor.php:2490-2501 extraction:
# keywords copied AS-IS with no type check; @omitDefault is commented out
# of $framingKeywords :42-44 so it expands away like any non-keyword) -----

FRAME += [
    (
        "unsupported @omitDefault drops in frame expansion",
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}]},
         {"@id": EX + "b", EX + "q": [{"@value": "z"}]}],
        {"@omitDefault": True, EX + "p": {"@default": "d"}},
        {"@graph": [
            {"@id": EX + "a", EX + "p": "v"},
            {"@id": EX + "b", EX + "p": "d", EX + "q": "z"}]},
    ),
    (
        "a top-level @default is extracted and ignored",
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}]},
         {"@id": EX + "b", EX + "q": [{"@value": "z"}]}],
        {"@default": "ignored", EX + "p": {}},
        {"@graph": [{"@id": EX + "a", EX + "p": "v"}]},
    ),
    (
        # strict ===: 'true' !== true, so the wildcard branch treats a
        # string @embed as embed-off ...
        "string @embed is not boolean true: wildcard yields references",
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}]},
         {"@id": EX + "b", EX + "q": [{"@value": "z"}]}],
        {"@embed": "true"},
        {"@graph": [{"@id": EX + "a"}, {"@id": EX + "b"}]},
    ),
    (
        # ... while the filtered branch checks 'false === @embed', so
        # the same string @embed is ALSO not embed-off there (asymmetric
        # bug-compat of the two strict comparisons)
        "string @embed is not boolean false: filtered match embeds",
        [{"@id": EX + "a", EX + "p": [{"@value": "v"}],
          EX + "q": [{"@value": "w"}]}],
        {"@embed": "true", EX + "p": {}},
        {"@graph": [{"@id": EX + "a", EX + "p": "v", EX + "q": "w"}]},
    ),
]


def _write(path: str, text: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(text)


def _json(value) -> str:
    return json.dumps(value, indent=2, ensure_ascii=False, sort_keys=False) + "\n"


def main() -> None:
    manifests = []

    def emit(kind: str, test_type: str, cases, in_ext: str = "jsonld") -> None:
        seq = []
        for i, case in enumerate(cases, start=1):
            name = case[0]
            nid = f"{kind}-{i:04d}"
            entry = {
                "@id": f"#t-{nid}",
                "@type": ["jld:PositiveEvaluationTest", f"jld:{test_type}"],
                "name": name,
                "input": f"{kind}/{nid}-in.{in_ext}",
            }
            if kind == "error":
                extra = case[3] if len(case) > 3 else {}
                api = extra.get("api", "expand")
                entry["@type"] = ["jld:NegativeEvaluationTest",
                                  f"jld:{api.capitalize()}Test"]
                entry["expectErrorCode"] = case[2]
                if api != "expand":
                    entry["api"] = api
                if "context" in extra:
                    entry["context"] = f"{kind}/{nid}-context.jsonld"
                    _write(os.path.join(OUT, f"{kind}/{nid}-context.jsonld"),
                           _json({"@context": extra["context"]}))
                _write(os.path.join(OUT, f"{kind}/{nid}-in.jsonld"), _json(case[1]))
            elif kind == "toRdf":
                entry["expect"] = f"{kind}/{nid}-out.nq"
                if case[3]:
                    entry["option"] = case[3]
                _write(os.path.join(OUT, f"{kind}/{nid}-in.jsonld"), _json(case[1]))
                _write(os.path.join(OUT, f"{kind}/{nid}-out.nq"),
                       "".join(line + "\n" for line in case[2]))
            elif kind == "remote":
                _write(os.path.join(OUT, f"{kind}/{nid}-in.jsonld"), _json(case[1]))
                entry["contexts"] = {}
                for j, (url, doc) in enumerate(sorted(case[2].items())):
                    rel = f"{kind}/{nid}-ctx{j}.jsonld"
                    _write(os.path.join(OUT, rel), _json(doc))
                    entry["contexts"][url] = rel
                if case[4] is not None:
                    entry["@type"] = ["jld:NegativeEvaluationTest", "jld:ExpandTest"]
                    entry["expectErrorCode"] = case[4]
                else:
                    entry["expect"] = f"{kind}/{nid}-out.jsonld"
                    _write(os.path.join(OUT, f"{kind}/{nid}-out.jsonld"), _json(case[3]))
            elif kind == "compact":
                entry["context"] = f"{kind}/{nid}-context.jsonld"
                entry["expect"] = f"{kind}/{nid}-out.jsonld"
                if case[4]:
                    entry["option"] = case[4]
                _write(os.path.join(OUT, f"{kind}/{nid}-in.jsonld"), _json(case[1]))
                _write(os.path.join(OUT, f"{kind}/{nid}-context.jsonld"),
                       _json({"@context": case[2]}))
                _write(os.path.join(OUT, f"{kind}/{nid}-out.jsonld"), _json(case[3]))
            elif kind == "frame":
                entry["frame"] = f"{kind}/{nid}-frame.jsonld"
                _write(os.path.join(OUT, f"{kind}/{nid}-in.jsonld"), _json(case[1]))
                _write(os.path.join(OUT, f"{kind}/{nid}-frame.jsonld"),
                       _json(case[2]))
                if case[3] is None:
                    entry["@type"] = ["jld:NegativeEvaluationTest", "jld:FrameTest"]
                    entry["expectErrorCode"] = case[4]
                else:
                    entry["expect"] = f"{kind}/{nid}-out.jsonld"
                    _write(os.path.join(OUT, f"{kind}/{nid}-out.jsonld"),
                           _json(case[3]))
            elif kind == "fromRdf":
                entry["input"] = f"{kind}/{nid}-in.nq"
                entry["expect"] = f"{kind}/{nid}-out.jsonld"
                if case[3]:
                    entry["option"] = case[3]
                _write(os.path.join(OUT, f"{kind}/{nid}-in.nq"),
                       "".join(line + "\n" for line in case[1]))
                _write(os.path.join(OUT, f"{kind}/{nid}-out.jsonld"), _json(case[2]))
            else:
                entry["expect"] = f"{kind}/{nid}-out.jsonld"
                if kind == "flatten" and len(case) > 3 and case[3] is not None:
                    # flatten(input, context) API form (JsonLD.php:352)
                    entry["context"] = f"{kind}/{nid}-context.jsonld"
                    _write(os.path.join(OUT, f"{kind}/{nid}-context.jsonld"),
                           _json({"@context": case[3]}))
                _write(os.path.join(OUT, f"{kind}/{nid}-in.jsonld"), _json(case[1]))
                _write(os.path.join(OUT, f"{kind}/{nid}-out.jsonld"), _json(case[2]))
            seq.append(entry)
        manifest = {
            "@id": f"manifest-{kind}",
            "name": kind,
            "baseIri": BASE,
            "description": (
                "Hand-authored JSON-LD 1.0 conformance fixtures mirroring the "
                "public json-ld.org test-suite structure; expected outputs "
                "derived from the reference implementation's source "
                "(see tools/author_w3c_fixtures.py)."
            ),
            "sequence": seq,
        }
        _write(os.path.join(OUT, f"manifest-{kind}.jsonld"), _json(manifest))
        manifests.append(f"manifest-{kind}.jsonld")

    emit("expand", "ExpandTest", EXPAND)
    emit("compact", "CompactTest", COMPACT)
    emit("flatten", "FlattenTest", FLATTEN)
    emit("toRdf", "ToRDFTest", TORDF)
    emit("fromRdf", "FromRDFTest", FROMRDF)
    emit("remote", "ExpandTest", REMOTE)
    emit("frame", "FrameTest", FRAME)
    emit("error", "ExpandTest", ERRORS)
    _write(os.path.join(OUT, "manifest.jsonld"),
           _json({"@id": "manifest", "name": "root", "sequence": manifests}))
    total = (len(EXPAND) + len(COMPACT) + len(FLATTEN) + len(TORDF)
             + len(FROMRDF) + len(REMOTE) + len(FRAME) + len(ERRORS))
    print(f"wrote {total} tests under {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
