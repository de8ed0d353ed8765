"""Distributed frame compiler vs the kernel matcher (VERDICT r3 #1).

The compiler (operators/frame_query.py) must agree with the kernel's
``nodeMatchesFrame`` port (kernel/framing.py) on typed-literal,
language-tagged, multi-value, and @default specs. Fixtures keep every
node IRI-identified so matched sets are comparable across the two
representations (triple subjects vs node-map @ids)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonld_spark.kernel.api import expand
from jsonld_spark.kernel.framing import frame_expanded
from jsonld_spark.kernel.rdf import expanded_to_quads
from jsonld_spark.operators.frame_query import (
    frame_project,
    frame_select,
    frame_subgraph,
)

EX = "http://ex.org/"
V = EX + "v#"

QUAD_SCHEMA = (
    "graph string, subject string, predicate string, "
    "obj_kind string, obj_value string, obj_type string, obj_lang string"
)

DOC = {
    "@context": {"@vocab": V, "knows": {"@type": "@id"}},
    "@graph": [
        {"@id": EX + "a", "@type": "Person", "score": 5.3, "n": 5,
         "label": {"@value": "bonjour", "@language": "FR"}, "flag": True,
         "knows": EX + "b"},
        {"@id": EX + "b", "@type": "Person", "score": 5.0, "n": 5,
         "label": {"@value": "hello", "@language": "en"}, "flag": False},
        {"@id": EX + "c", "@type": "Robot", "score": 5.3, "n": 7,
         "label": "plain", "knows": EX + "a"},
        {"@id": EX + "d", "@type": "Person",
         "temp": {"@value": "98.6", "@type": V + "fahrenheit"}},
    ],
}


@pytest.fixture(scope="module")
def triples(spark):
    quads = expanded_to_quads(expand(DOC))
    return spark.createDataFrame([tuple(q) for q in quads], QUAD_SCHEMA).cache()


def _subjects(df):
    return {r["subject"] for r in df.select("subject").collect()}


def _to_kernel_frame(frame: dict) -> dict:
    """Compiler frame -> kernel frame: the {"@frame": X} subframe
    wrapper is compiler syntax; the kernel treats a bare dict
    alternative AS the subframe (Processor.php:2724-2740)."""
    out = {}
    for key, spec in frame.items():
        alts = spec if isinstance(spec, list) else [spec]
        conv = [
            _to_kernel_frame(a["@frame"])
            if isinstance(a, dict) and "@frame" in a
            else a
            for a in alts
        ]
        out[key] = conv if isinstance(spec, list) else conv[0]
    return out


def _kernel_match_ids(frame: dict) -> set:
    """Top-level @ids matched by the kernel on the same document.

    The frame is expanded WITHOUT @vocab: the reference vocab-maps
    "@default" (not in $keywords, Processor.php:34-36 + 901-902) so
    framing keywords only survive frame expansion when no @vocab is
    active — absolute-IRI frame keys keep the two sides comparable
    and let the compiler's frame dict be reused (modulo the subframe
    wrapper translation)."""
    expanded_frame = expand(_to_kernel_frame(frame), frame=True)
    matched = frame_expanded(expand(DOC), expanded_frame)
    return {node["@id"] for node in matched if isinstance(node, dict) and "@id" in node}


# --- typed-value matching: the r3 bug (float spec vs canonical lexical) ---

def test_float_value_matches_canonical_double(triples):
    # 5.3 is stored as "5.3E0"^^xsd:double; the old compiler compared
    # str(5.3) == "5.3" and silently returned no rows
    got = _subjects(frame_select(triples, {V + "score": 5.3}))
    assert got == {EX + "a", EX + "c"}


def test_integral_floats_collapse_to_xsd_integer(triples):
    # toRdf serializes integral numbers as xsd:integer (kernel/rdf.py
    # mirrors PHP's `$value != (int) $value`, Value.php:85): 5 and 5.0
    # are the SAME literal "5"^^xsd:integer at the RDF level, so both
    # spec spellings match — while non-integral 5.3 stays xsd:double
    assert _subjects(frame_select(triples, {V + "n": 5})) == {EX + "a", EX + "b"}
    assert _subjects(frame_select(triples, {V + "n": 5.0})) == {EX + "a", EX + "b"}
    assert _subjects(frame_select(triples, {V + "score": 5.0})) == {EX + "b"}
    assert _subjects(frame_select(triples, {V + "n": 5.3})) == set()


def test_boolean_value(triples):
    assert _subjects(frame_select(triples, {V + "flag": True})) == {EX + "a"}
    assert _subjects(frame_select(triples, {V + "flag": False})) == {EX + "b"}


def test_explicit_datatype_value_object(triples):
    got = _subjects(
        frame_select(
            triples, {V + "temp": {"@value": "98.6", "@type": V + "fahrenheit"}}
        )
    )
    assert got == {EX + "d"}
    # same lexical form, wrong datatype -> no match
    assert (
        _subjects(
            frame_select(triples, {V + "temp": {"@value": "98.6", "@type": V + "c"}})
        )
        == set()
    )


# --- language-tagged matching -------------------------------------------

def test_language_tag_match_is_case_sensitive(triples):
    # the reference lowercases only language-MAP keys (Processor.php:
    # 427); an explicit @language stays verbatim and matches with ===,
    # so the doc's "FR" matches spec "FR" but not "fr"
    got = _subjects(
        frame_select(triples, {V + "label": {"@value": "bonjour", "@language": "FR"}})
    )
    assert got == {EX + "a"}
    assert (
        _subjects(
            frame_select(triples, {V + "label": {"@value": "bonjour", "@language": "fr"}})
        )
        == set()
    )


def test_language_only_partial_spec(triples):
    assert _subjects(frame_select(triples, {V + "label": {"@language": "en"}})) == {
        EX + "b"
    }
    # plain string "plain" is xsd:string, not language-tagged
    assert _subjects(frame_select(triples, {V + "label": {"@language": "xx"}})) == set()


def test_plain_string_matches_string_literal_not_lang(triples):
    assert _subjects(frame_select(triples, {V + "label": "plain"})) == {EX + "c"}
    # "bonjour" exists only as @fr — a plain-string spec must not match it
    assert _subjects(frame_select(triples, {V + "label": "bonjour"})) == set()


# --- multi-value alternatives -------------------------------------------

def test_multi_value_alternatives(triples):
    got = _subjects(
        frame_select(
            triples,
            {V + "label": [{"@language": "FR"}, "plain"]},
        )
    )
    assert got == {EX + "a", EX + "c"}


def test_alternatives_mix_scalars_and_typed(triples):
    got = _subjects(frame_select(triples, {V + "score": [5.0, 5.3]}))
    assert got == {EX + "a", EX + "b", EX + "c"}


# --- @default fills ------------------------------------------------------

def test_default_makes_property_optional(triples):
    got = _subjects(
        frame_select(
            triples, {"@type": V + "Person", V + "score": {"@default": "0"}}
        )
    )
    # d has no score but matches via the default
    assert got == {EX + "a", EX + "b", EX + "d"}


def test_frame_project_fills_default(triples):
    rows = frame_project(
        triples,
        {"@type": V + "Person", V + "score": {"@default": "none"}},
        V + "score",
    ).collect()
    got = {(r["subject"], r["value"]) for r in rows}
    # b's 5.0 is integral -> stored as "5"^^xsd:integer (Value.php:85)
    assert got == {
        (EX + "a", "5.3E0"),
        (EX + "b", "5"),
        (EX + "d", "none"),
    }


# --- kernel-vs-distributed differential ---------------------------------

DIFFERENTIAL_FRAMES = [
    # the SAME frame dict drives both sides (absolute-IRI keys)
    {V + "score": 5.3},
    {V + "n": 5},
    {V + "flag": True},
    {V + "label": {"@value": "bonjour", "@language": "FR"}},
    {V + "temp": {"@value": "98.6", "@type": V + "fahrenheit"}},
    {V + "score": [5.0, 5.3]},
    {"@type": V + "Person", V + "score": {"@default": "0"}},
    {"@type": V + "Person"},
    {V + "label": [{"@language": "FR"}, "plain"]},
    # @value-only specs constrain just the value: the kernel recursion
    # checks only present keys, so "bonjour" matches "bonjour"@FR and
    # "98.6" matches "98.6"^^fahrenheit (r4 review finding)
    {V + "label": {"@value": "bonjour"}},
    {V + "temp": {"@value": "98.6"}},
    # subframe inside an alternatives list (r4 review finding)
    {V + "knows": [{"@frame": {V + "score": 5.0}}]},
    {V + "knows": [{"@frame": {V + "flag": True}}, EX + "a"]},
    # {} wildcard alternative == property exists
    {V + "label": [{}]},
]


def test_type_plus_language_spec_matches_nothing(triples):
    """An RDF literal carries a datatype OR a language tag, never both
    — the spec compiles to a FALSE predicate. (Not in the kernel
    differential: the kernel frame EXPANSION rejects @type+@language
    value objects outright, so the comparison cannot even run.)"""
    got = _subjects(
        frame_select(
            triples,
            {V + "label": {"@value": "plain", "@type": V + "T", "@language": "en"}},
        )
    )
    assert got == set()


@pytest.mark.parametrize("frame", DIFFERENTIAL_FRAMES)
def test_differential_kernel_vs_distributed(triples, frame):
    got = _subjects(frame_select(triples, frame))
    want = _kernel_match_ids(frame)
    assert got == want


# --- regression: invalid specs fail loudly ------------------------------

def test_frame_project_null_default_fills_null(triples):
    """{"@default": null} is valid — the kernel fills the @null marker
    (Processor.php:2650-2652); the columnar fill is a NULL value."""
    rows = frame_project(
        triples,
        {"@type": V + "Person", V + "score": {"@default": None}},
        V + "score",
    ).collect()
    got = {(r["subject"], r["value"]) for r in rows}
    assert got == {
        (EX + "a", "5.3E0"),
        (EX + "b", "5"),
        (EX + "d", None),
    }


def test_unknown_dict_spec_raises(triples):
    with pytest.raises(ValueError):
        frame_select(triples, {V + "score": {"bogus": 1}}).collect()


def test_subgraph_still_works_with_typed_root(triples):
    rows = frame_subgraph(triples, {V + "score": 5.3}, depth=1)
    subs = _subjects(rows)
    # a and c match; a's forward closure adds b (knows), c's adds a
    assert subs == {EX + "a", EX + "b", EX + "c"}


def test_nested_array_alternative_raises(triples):
    """{p: [["x"]]} is an invalid frame — the reference raises 'must
    not be an array of arrays' (Processor.php:2726-2731); compiling to
    match-nothing would hide the malformed frame (ADVICE r4)."""
    with pytest.raises(ValueError, match="array of arrays"):
        frame_select(triples, {V + "score": [[5.3]]})


def test_frame_project_nonstring_default_uses_canonical_lexical(triples):
    """Non-string defaults fill with the canonical RDF lexical form the
    matching side compares against (ADVICE r4): 0.9 -> '9.0E-1', True
    -> 'true' — never Python's str() reprs."""
    rows = frame_project(
        triples,
        {"@type": V + "Person", V + "score": {"@default": 0.9}},
        V + "score",
    ).collect()
    got = {(r["subject"], r["value"]) for r in rows}
    assert got == {(EX + "a", "5.3E0"), (EX + "b", "5"), (EX + "d", "9.0E-1")}
    rows = frame_project(
        triples,
        {"@type": V + "Person", V + "flag": {"@default": True}},
        V + "flag",
    ).collect()
    got = {(r["subject"], r["value"]) for r in rows}
    assert got == {(EX + "a", "true"), (EX + "b", "false"), (EX + "d", "true")}


# --- @embed / @explicit embedding controls (VERDICT r4 #2) ---------------

def test_subgraph_embed_false_returns_references_only(triples):
    """@embed:false — matched nodes come back as references (the
    kernel appends {"@id": id}, Processor.php:2543-2547): the output
    is the matched subject set, no property rows."""
    out = frame_subgraph(triples, {V + "score": 5.3}, embed=False)
    assert out.columns == ["subject"]
    assert _subjects(out) == {EX + "a", EX + "c"}
    # the flag can ride inside the frame itself, like the kernel's
    in_frame = frame_subgraph(triples, {V + "score": 5.3, "@embed": False})
    assert _subjects(in_frame) == {EX + "a", EX + "c"}


def test_subgraph_explicit_prunes_to_frame_predicates(triples):
    """@explicit:true at depth=0 — only frame-named predicates survive
    (addMissingNodeProperties skipped, Processor.php:2780-2811)."""
    out = frame_subgraph(
        triples, {"@type": V + "Person", V + "score": {}}, depth=0, explicit=True
    ).collect()
    got = {(r["subject"], r["predicate"]) for r in out}
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    # a, b have score; d matches only if score exists — it doesn't, so
    # matched = {a, b}; each contributes exactly rdf:type + score rows
    assert got == {
        (EX + "a", rdf_type), (EX + "a", V + "score"),
        (EX + "b", rdf_type), (EX + "b", V + "score"),
    }


def test_subgraph_explicit_closure_follows_only_kept_edges(triples):
    """With depth=1, the closure hops only through frame-named edges:
    framing on `knows` reaches the known node; framing on `score` does
    not follow `knows` even though the matched subject carries it."""
    via_knows = frame_subgraph(
        triples, {"@type": V + "Person", V + "knows": {}}, depth=1, explicit=True
    )
    assert _subjects(via_knows) == {EX + "a", EX + "b"}
    no_follow = frame_subgraph(
        triples, {"@type": V + "Person", V + "score": {}}, depth=1, explicit=True
    )
    assert _subjects(no_follow) == {EX + "a", EX + "b"}  # b matched, not hopped-to


def test_explicit_differential_vs_kernel(triples):
    """Kernel frame with @explicit:true vs the distributed compiler at
    depth=0: the (id, property) sets agree (frames without @default —
    a kernel default fill has no triple to show)."""
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    for frame in [
        {"@type": V + "Person"},
        {V + "score": 5.3},
        {"@type": V + "Person", V + "n": 5},
        {V + "label": [{"@language": "FR"}, "plain"]},
    ]:
        expanded_frame = expand(
            _to_kernel_frame({**frame, "@explicit": True}), frame=True
        )
        matched = frame_expanded(expand(DOC), expanded_frame)
        want = set()
        for node in matched:
            for prop in node:
                if prop == "@id":
                    continue
                want.add((node["@id"], rdf_type if prop == "@type" else prop))
        got = {
            (r["subject"], r["predicate"])
            for r in frame_subgraph(
                triples, frame, depth=0, explicit=True
            ).collect()
        }
        assert got == want, frame


# --- randomized differential fuzz ---------------------------------------

def _random_doc_and_frames(seed: int):
    """Random IRI-identified docs + frames over a small vocab. Value
    pool mixes ints, floats, strings, bools, language-tagged and typed
    values; every node is IRI-identified so matched sets compare."""
    import random

    rng = random.Random(seed)
    props = [V + p for p in "pqr"]
    types = [V + t for t in ("A", "B")]
    values = [5, 7.5, "s1", "s2", True,
              {"@value": "lv", "@language": "en"},
              {"@value": "tv", "@type": V + "T"}]
    nodes = []
    ids = [EX + f"n{i}" for i in range(rng.randint(3, 7))]
    for nid in ids:
        node = {"@id": nid}
        if rng.random() < 0.7:
            node["@type"] = rng.choice(types)
        for p in props:
            if rng.random() < 0.6:
                vals = rng.sample(values, rng.randint(1, 2))
                node[p] = vals if len(vals) > 1 else vals[0]
        if rng.random() < 0.4:
            node[V + "knows"] = {"@id": rng.choice(ids)}
        nodes.append(node)
    doc = {"@context": {"knows": {"@id": V + "knows", "@type": "@id"},
                        "@vocab": V},
           "@graph": nodes}

    frames = []
    for _ in range(4):
        frame = {}
        if rng.random() < 0.5:
            frame["@type"] = rng.choice(types)
        for p in rng.sample(props, rng.randint(1, 2)):
            roll = rng.random()
            if roll < 0.3:
                frame[p] = rng.choice(values)
            elif roll < 0.5:
                frame[p] = {}
            elif roll < 0.65:
                frame[p] = []
            else:
                frame[p] = [rng.choice(values), rng.choice(values)]
        frames.append(frame)
    return doc, frames


def _kernel_ids_for(doc, frame):
    expanded_frame = expand(_to_kernel_frame(frame), frame=True)
    matched = frame_expanded(expand(doc), expanded_frame)
    return {n["@id"] for n in matched if isinstance(n, dict) and "@id" in n}


def test_random_frames_match_kernel(spark):
    """Fuzz: the compiler and the kernel matcher agree on random docs
    and random frames (scalar/typed/lang values, wildcards, absence,
    multi-value alternatives, @type)."""
    checked = 0
    for seed in range(20):
        doc, frames = _random_doc_and_frames(seed)
        quads = expanded_to_quads(expand(doc))
        t = spark.createDataFrame([tuple(q) for q in quads], QUAD_SCHEMA)
        for frame in frames:
            want = _kernel_ids_for(doc, frame)
            got = _subjects(frame_select(t, frame))
            # the triple table only contains SUBJECTS (nodes with at
            # least one outgoing edge); the kernel's node map also
            # holds object-only nodes, which an all-negative/empty
            # frame can match — restrict to comparable ids
            subj_ids = {q.subject for q in quads}
            assert got == (want & subj_ids), (seed, frame)
            checked += 1
    assert checked >= 40


def test_random_frames_embedding_flags_match_kernel(spark):
    """Fuzz over the embedding controls (VERDICT r4 #2): @embed:false
    agrees on the reference set, @explicit:true agrees on the
    (id, property) output shape, against the kernel on random docs."""
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    checked = 0
    for seed in range(10):
        doc, frames = _random_doc_and_frames(seed)
        quads = expanded_to_quads(expand(doc))
        t = spark.createDataFrame([tuple(q) for q in quads], QUAD_SCHEMA)
        subj_ids = {q.subject for q in quads}
        for frame in frames:
            # @embed: false — references only, same match set
            expanded_frame = expand(
                _to_kernel_frame({**frame, "@embed": False}), frame=True
            )
            matched = frame_expanded(expand(doc), expanded_frame)
            want_refs = {
                n["@id"] for n in matched if isinstance(n, dict) and "@id" in n
            }
            out = frame_subgraph(t, frame, embed=False)
            assert out.columns == ["subject"]
            assert _subjects(out) == (want_refs & subj_ids), (seed, frame)

            # @explicit: true — only frame-named properties survive
            expanded_frame = expand(
                _to_kernel_frame({**frame, "@explicit": True}), frame=True
            )
            matched = frame_expanded(expand(doc), expanded_frame)
            want_shape = set()
            for node in matched:
                if not isinstance(node, dict) or node.get("@id") not in subj_ids:
                    continue
                for prop in node:
                    if prop != "@id":
                        want_shape.add(
                            (node["@id"], rdf_type if prop == "@type" else prop)
                        )
            got_shape = {
                (r["subject"], r["predicate"])
                for r in frame_subgraph(t, frame, depth=0, explicit=True).collect()
            }
            assert got_shape == want_shape, (seed, frame)
            checked += 2
    assert checked >= 40


# --- differential over the w3c expand fixtures ---------------------------

def test_w3c_fixture_frames_match_kernel(spark):
    """For every positive expand fixture, derive frames from the
    golden's own content (@type constraints, property value-objects,
    wildcards) and check the distributed compiler against the kernel
    matcher on that document — the conformance corpus doubles as
    framing-differential input (VERDICT r3 #1 DONE criterion)."""
    import json
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    from w3c_harness import FIXTURE_DIR, iter_manifest

    checked = 0
    for entry in iter_manifest("expand"):
        with open(os.path.join(FIXTURE_DIR, entry["expect"]), encoding="utf-8") as fh:
            golden = json.load(fh)
        if not isinstance(golden, list) or not golden:
            continue

        # candidate constraints from the golden itself
        frames = []
        seen_types, seen_props = set(), set()
        for node in golden:
            if not isinstance(node, dict):
                continue
            for t in node.get("@type", []):
                if isinstance(t, str) and t not in seen_types:
                    seen_types.add(t)
                    frames.append({"@type": t})
            for prop, vals in node.items():
                if prop.startswith("@") or not isinstance(vals, list):
                    continue
                if prop not in seen_props:
                    seen_props.add(prop)
                    frames.append({prop: {}})   # wildcard: existence
                for v in vals[:2]:
                    if (
                        isinstance(v, dict)
                        and "@value" in v
                        and not isinstance(v["@value"], (dict, list))
                    ):
                        spec = {k: v[k] for k in ("@value", "@type", "@language")
                                if k in v}
                        frames.append({prop: spec})
        if not frames:
            continue

        quads = expanded_to_quads(golden)
        if not quads:
            continue
        t = spark.createDataFrame([tuple(q) for q in quads], QUAD_SCHEMA)
        subj_iris = {q.subject for q in quads if not q.subject.startswith("_:")}

        for frame in frames[:6]:
            expanded_frame = expand(frame, frame=True)
            matched = frame_expanded([n for n in golden if isinstance(n, dict)],
                                     expanded_frame)
            want = {
                n["@id"] for n in matched
                if isinstance(n, dict) and "@id" in n
                and not n["@id"].startswith("_:")
            }
            got = {
                s for s in _subjects(frame_select(t, frame))
                if not s.startswith("_:")
            }
            assert got & subj_iris == want & subj_iris, (
                entry["name"], frame,
                sorted(got & subj_iris), sorted(want & subj_iris),
            )
            checked += 1
    assert checked >= 100, checked


def test_loose_value_divergence_pinned(triples):
    """Documented deviation (frame_query.py module docstring): the
    kernel's explicit {"@value": ...} specs match via PHP's loose
    in_array ("5" matches 5, Processor.php:666-671 + 2736), while the
    compiled plans keep canonical strict matching — the triple table
    holds post-toRdf canonical literals, where native 5 is already
    "5"^^xsd:integer and the raw-JSON loose coercions have no
    counterpart."""
    # where the two semantics AGREE: an @value-only string spec — the
    # kernel matches int-5 nodes loosely ("5" == 5), the compiler
    # matches the same nodes lexically ("5" is the canonical integer
    # lexical form, matched over any datatype)
    assert _kernel_match_ids({V + "n": {"@value": "5"}}) == {EX + "a", EX + "b"}
    assert _subjects(frame_select(triples, {V + "n": {"@value": "5"}})) == {
        EX + "a", EX + "b"}
    # where they DIVERGE: a numeric spec vs a lexically-different but
    # loosely-equal literal. Node d holds "98.6"^^v:fahrenheit; the
    # kernel's loose in_array coerces the string through its numeric
    # prefix (98.6 == "98.6"), while the compiled plan looks for the
    # canonical double literal 9.86E1^^xsd:double — which no node has
    assert _kernel_match_ids({V + "temp": {"@value": 98.6}}) == {EX + "d"}
    assert _subjects(frame_select(triples, {V + "temp": {"@value": 98.6}})) == set()
    # both sides agree again on the canonical strict spelling
    assert _kernel_match_ids({V + "n": 5}) == {EX + "a", EX + "b"}
    assert _subjects(frame_select(triples, {V + "n": 5})) == {EX + "a", EX + "b"}
