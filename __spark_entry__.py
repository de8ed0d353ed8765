"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG-construction pipeline; ``queries`` maps
every implemented operator (SURVEY.md §2 + the training-data pipeline
ops) to a (spark, sf_dir) callable; ``oracle_sql`` returns the exact
DuckDB SQL golden for each — generated from the same shared constants
the Spark operators use (jsonld_spark/sources/*), so both sides derive
from a single source of truth.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

def _khop_seed() -> str:
    # the head entity (E0 carries ~44% of mentions — the skew case the
    # BFS must survive); built from the shared IRI scheme so a scheme
    # change cannot silently turn the query vacuous (seed-only row on
    # both sides would still MATCH)
    from jsonld_spark.sources.entities import entity_iri

    return entity_iri(0)


KHOP_SEED = _khop_seed()


def _conv_resources_path(triples: "DataFrame") -> "DataFrame":
    """^inConversation / (entities | tool) via the path compiler."""
    from pyspark.sql import functions as F

    from jsonld_spark.operators import paths
    from jsonld_spark.sources.entities import VOCAB

    expr = paths.seq(
        paths.inv(paths.pred(VOCAB + "inConversation")),
        paths.alt(paths.pred(VOCAB + "entities"), paths.pred(VOCAB + "tool")),
    )
    return paths.evaluate(triples, expr).select(
        F.col("src").alias("conv"), F.col("dst").alias("resource")
    )


CHAIN_CELL_PREFIX = "http://kg.example/listcell/"
CHAIN_CLOSURE_HOPS = 5
NEIGHBOR_SAMPLE_K = 8
NEG_K = 4
EGO_K = 2
RDF_TYPE_IRI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# language-tagged label fixture (the kg corpus carries no @language
# literals; same nation-derived pattern as the list-chain fixtures)
NATION_IRI_PREFIX = "http://kg.example/nation/"
LABEL_LANGS = ["fr", "de", "es"]
LABEL_MATCH_LANGS = ["fr", "de"]
FRAME_SCORE = 0.9   # prior of the E4/E9/... entities -> "9.0E-1"^^xsd:double
FRAME_RANK = 1      # second mention slot -> "1"^^xsd:integer
TOOL_DEFAULT = "none"


def _frame_score_prior_str() -> str:
    """Canonical xsd:double lexical form of FRAME_SCORE via the same
    kernel rule the pipeline serializes with (kernel/rdf.py) — the
    oracle and the Spark frame compiler cannot drift apart."""
    from jsonld_spark.kernel.rdf import canonical_double

    return canonical_double(FRAME_SCORE)


REGION_GRAPH_PREFIX = "http://kg.example/graph/region/"
FRAME_GRAPH_REGION = 2


def _lang_label_triples(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Deterministic language-tagged labels: nation k gets
    (nation_iri, vocab#label, n_name@en) plus one extra label
    (lower(n_name)) tagged LABEL_LANGS[k % 3]. Each nation's label
    quads live in the NAMED GRAPH of its region
    (REGION_GRAPH_PREFIX + n_regionkey) — the multi-graph fixture for
    graph-scoped framing."""
    from jsonld_spark.plans.session import read_table
    from jsonld_spark.sources.entities import VOCAB

    nation = read_table(spark, sf_dir, "nation")
    ns = F.lit(None).cast("string")
    langs = F.array(*[F.lit(lang) for lang in LABEL_LANGS])
    gname = F.concat(F.lit(REGION_GRAPH_PREFIX), F.col("n_regionkey"))

    def label_row(value, lang):
        return F.struct(
            gname.alias("graph"),
            F.concat(F.lit(NATION_IRI_PREFIX), F.col("n_nationkey")).alias("subject"),
            F.lit(VOCAB + "label").alias("predicate"),
            F.lit("literal").alias("obj_kind"),
            value.alias("obj_value"),
            ns.alias("obj_type"),
            lang.alias("obj_lang"),
        )

    rows = F.array(
        label_row(F.col("n_name"), F.lit("en")),
        label_row(
            F.lower(F.col("n_name")),
            F.element_at(langs, (F.col("n_nationkey") % len(LABEL_LANGS) + 1).cast("int")),
        ),
    )
    return nation.select(F.explode(rows).alias("t")).select("t.*")


def _frame_lang_labels(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Multi-value language-tag frame over the label fixture:
    label matches ANY of [{"@language": m} for m in LABEL_MATCH_LANGS]."""
    from jsonld_spark.operators.frame_query import frame_select
    from jsonld_spark.sources.entities import VOCAB

    frame = {VOCAB + "label": [{"@language": m} for m in LABEL_MATCH_LANGS]}
    return frame_select(_lang_label_triples(spark, sf_dir), frame)


def _frame_graph_scoped(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """The same language frame scoped to ONE region's named graph —
    graph-scoped framing over the RDF dataset (frame_select_in_graph)."""
    from jsonld_spark.operators.frame_query import frame_select_in_graph
    from jsonld_spark.sources.entities import VOCAB

    frame = {VOCAB + "label": [{"@language": m} for m in LABEL_MATCH_LANGS]}
    return frame_select_in_graph(
        _lang_label_triples(spark, sf_dir),
        frame,
        f"{REGION_GRAPH_PREFIX}{FRAME_GRAPH_REGION}",
    )


def _nonlink_predicates() -> list[str]:
    from jsonld_spark.sources.entities import VOCAB

    return [VOCAB + "mentions", VOCAB + "entities", VOCAB + "target", RDF_TYPE_IRI]


def _nonlink_edges_path(triples: "DataFrame") -> "DataFrame":
    """!(mentions|entities|target|rdf:type) via the path compiler."""
    from jsonld_spark.operators import paths

    return paths.evaluate(triples, paths.nps(_nonlink_predicates()))


def _chain_quads(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """One rdf:rest chain per nation, length 2..8 cells
    (n_nationkey % 7 + 2), last cell -> rdf:nil — the deterministic
    list-chain fixture shared by both closure driver queries."""
    from pyspark.sql import functions as F

    from jsonld_spark.kernel.rdf import RDF_NIL, RDF_REST
    from jsonld_spark.plans.session import read_table

    nation = read_table(spark, sf_dir, "nation")
    cells = nation.select(
        F.col("n_nationkey").alias("k"),
        (F.col("n_nationkey") % 7 + 2).alias("len"),
    ).select("k", "len", F.explode(F.sequence(F.lit(0), F.col("len") - 1)).alias("i"))

    def cell(i):
        return F.concat(F.lit(CHAIN_CELL_PREFIX), F.col("k"), F.lit("/"), i)

    ns = F.lit(None).cast("string")
    return cells.select(
        ns.alias("graph"),
        cell(F.col("i")).alias("subject"),
        F.lit(RDF_REST).alias("predicate"),
        F.lit("iri").alias("obj_kind"),
        F.when(F.col("i") < F.col("len") - 1, cell(F.col("i") + 1))
        .otherwise(F.lit(RDF_NIL))
        .alias("obj_value"),
        ns.alias("obj_type"),
        ns.alias("obj_lang"),
    )


def _chain_closure_path(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """rdf:rest{1,5} over the nation chains: every (cell_i, cell_j)
    with 0 < j - i <= 5 plus (cell_i, nil) where the remaining chain is
    within reach — positional arithmetic the oracle mirrors exactly."""
    from jsonld_spark.kernel.rdf import RDF_REST
    from jsonld_spark.operators import paths

    return paths.evaluate(
        _chain_quads(spark, sf_dir), paths.closure(paths.pred(RDF_REST), CHAIN_CLOSURE_HOPS)
    )


def _chain_closure_all_path(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """rdf:rest+ (UNBOUNDED, closure_all): fixpoint over the same
    chains — every later cell and always nil; the max chain length (8)
    sits far below the round budget, so the fixpoint terminates."""
    from jsonld_spark.kernel.rdf import RDF_REST
    from jsonld_spark.operators import paths

    return paths.evaluate(
        _chain_quads(spark, sf_dir), paths.closure_all(paths.pred(RDF_REST))
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events-derived transcripts -> mention detection ->
    entity linking -> JSON-LD expansion -> node map -> toRdf ->
    canonicalized, deduplicated triple set."""
    from jsonld_spark.operators.kg_pipeline import kg_triples

    return kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry contract (VERDICT r4 #1): exactly 50 entries — the
    driver's correctness window — ordered most-load-bearing first.
    Families of same-shaped evidence queries are consolidated into
    union suites (operators/suites.py) so EVERY entry gets a
    CORRECTNESS row; the underlying operators keep their own outputs
    and pytest coverage."""
    from jsonld_spark.operators import (
        dedup,
        graph,
        jsonld_ops,
        kg_queries,
        multimodal,
        similarity,
        suites,
        text,
    )
    from jsonld_spark.operators.extract import with_payload
    from jsonld_spark.operators.kg_pipeline import kg_triples, nquads_lines
    from jsonld_spark.sources.transcripts import transcripts_from_events

    def _docs(spark, sf):
        return with_payload(transcripts_from_events(spark, sf))

    def _n_turns(spark, sf):
        # parquet-footer count (metadata-only job) sizes the CPU stage
        # without an extra pass over the derived transcript stream —
        # same policy as kg_triples (VERDICT r2 #5)
        from jsonld_spark.plans.session import read_table

        return read_table(spark, sf, "events").count()

    # several queries consume the pipeline output; cache it per
    # (session, sf) so the driver's sweep runs the kernel stage once
    cache: dict = {}

    def cached_triples(spark, sf):
        key = (id(spark), sf)
        if key not in cache:
            cache[key] = kg_triples(spark, sf).cache()
        return cache[key]

    def cached_edges(spark, sf):
        # one shared edge cache for the graph-analytics family — the
        # projection+distinct over the 2M-row triple table is paid once
        key = ("edges", id(spark), sf)
        if key not in cache:
            cache[key] = graph.iri_edges(cached_triples(spark, sf)).cache()
        return cache[key]

    return {
        # --- JSON-LD document transforms (reference API surface).
        # The per-turn payload is built by pure column exprs, so each
        # transform's full JSON output (json.dumps sort_keys form) is
        # reproduced exactly by a DuckDB oracle (sources/oracle.py)
        "jsonld_expand_docs": lambda spark, sf: jsonld_ops.expand_documents(
            _docs(spark, sf), n_rows=_n_turns(spark, sf)),
        "jsonld_compact_docs": lambda spark, sf: jsonld_ops.compact_documents(
            _docs(spark, sf), n_rows=_n_turns(spark, sf)),
        "jsonld_flatten_docs": lambda spark, sf: jsonld_ops.flatten_documents(
            _docs(spark, sf), n_rows=_n_turns(spark, sf)),
        "jsonld_fromrdf_nodes": lambda spark, sf: jsonld_ops.from_rdf_nodes(
            cached_triples(spark, sf), use_native_types=True
        ),
        # the @list chain machinery end-to-end (the kg corpus carries
        # no lists): one deterministic chain per nation, exact oracle
        "jsonld_fromrdf_lists": jsonld_ops.from_rdf_list_nodes,
        # --- KG construction pipeline (the reference's capabilities) ---
        "kg_triples": cached_triples,
        "kg_nquads": lambda spark, sf: nquads_lines(cached_triples(spark, sf)),
        "kg_mention_links": kg_queries.mention_links,
        # the dynamic-dictionary variant: salted shuffle join on the
        # head-skewed surface key (north_rule); same oracle output
        "kg_mention_links_salted": kg_queries.mention_links_salted,
        "kg_entity_mentions": kg_queries.entity_mention_counts,
        "kg_conversation_stats": kg_queries.conversation_stats,
        # error channel: corrupt slices quarantine with spec codes
        "kg_parse_errors": kg_queries.parse_error_report,
        # graph analytics: components over the co-mention graph
        "kg_entity_components": kg_queries.entity_components,
        # graph analytics over the triple graph's IRI edges: degree-
        # oriented triangles, fixed-point integer PageRank (bit-exact
        # across engines), reverse k-hop BFS from the head entity
        "kg_triangle_counts": lambda spark, sf: graph.triangle_counts(
            cached_edges(spark, sf)
        ),
        "kg_pagerank": lambda spark, sf: graph.pagerank_fixedpoint(
            cached_edges(spark, sf),
            iterations=graph.PR_ITERATIONS,
            scale=graph.PR_SCALE,
        ),
        # personalized PageRank over REVERSED edges from the head
        # entity: provenance importance ("what feeds E0, how directly")
        "kg_ppr_provenance": lambda spark, sf: graph.personalized_pagerank_fixedpoint(
            cached_edges(spark, sf),
            spark.createDataFrame([(KHOP_SEED,)], "node string"),
            iterations=graph.PR_ITERATIONS,
            scale=graph.PR_SCALE,
            reverse=True,
        ),
        "kg_khop_reach": lambda spark, sf: graph.khop_distances(
            cached_edges(spark, sf),
            spark.createDataFrame([(KHOP_SEED,)], "node string"),
            k=graph.KHOP_DEFAULT_K,
        ),
        # property-path query surface (SPARQL 1.1 fragment compiled to
        # joins): which entities/tools does each conversation touch —
        # ^inConversation / (entities | tool)
        "kg_path_conv_resources": lambda spark, sf: _conv_resources_path(
            cached_triples(spark, sf)
        ),
        # training-data sampling + corpus statistics over the graph
        "kg_ego_subgraph": lambda spark, sf: graph.ego_subgraph(
            cached_edges(spark, sf),
            spark.createDataFrame([(KHOP_SEED,)], "node string"),
            k=EGO_K,
        ),
        "kg_neighbor_sample": lambda spark, sf: graph.neighbor_sample(
            cached_edges(spark, sf), k=NEIGHBOR_SAMPLE_K
        ),
        # KG-embedding training primitive: deterministic k non-edges
        # per node (md5-bucket candidates, anti-joined, md5-ranked)
        "kg_negative_samples": lambda spark, sf: graph.negative_samples(
            cached_edges(spark, sf), k=NEG_K
        ),
        # degree-WEIGHTED variant: candidate inclusion proportional to
        # degree via bucket replicas — popularity-proportional
        # corruption for TransE-family training (VERDICT r4 #5)
        "kg_negative_samples_degree": lambda spark, sf: graph.negative_samples_degree(
            cached_edges(spark, sf), k=NEG_K
        ),
        "kg_degree_histogram": lambda spark, sf: graph.degree_histogram(
            cached_edges(spark, sf)
        ),
        # bounded closure rdf:rest{1,5} AND true SPARQL p+ (fixpoint
        # with round budget + circuit breaker) over deterministic
        # variable-length list chains, as one union suite (the kg
        # corpus has no multi-hop chains; same nation-derived pattern
        # as jsonld_fromrdf_lists)
        "kg_path_chain_closures": lambda spark, sf: __import__(
            "jsonld_spark.operators.suites", fromlist=["x"]
        ).path_closures_suite(
            _chain_closure_path(spark, sf), _chain_closure_all_path(spark, sf)
        ),
        # negated property set: every structural edge EXCEPT the
        # mention/linking predicates — the turn->conv / turn->tool
        # skeleton falls out of !(mentions|entities|target|rdf:type)
        "kg_path_nonlink_edges": lambda spark, sf: _nonlink_edges_path(
            cached_triples(spark, sf)
        ),
        # forward adjacency counts + materialized adjacency lists +
        # reverse adjacency (the adjacency-table sink shape), one suite
        "kg_adjacency_suite": lambda spark, sf: suites.kg_adjacency_suite(
            spark, sf, triples=cached_triples(spark, sf)
        ),
        # entity-resolution blocking: Jaccard over hub-filtered
        # undirected neighbor sets (non-hub common neighbors carry the
        # signal; candidate fan-out bounded by C(max_deg, 2))
        "kg_neighbor_similarity": lambda spark, sf: graph.neighbor_similarity(
            cached_edges(spark, sf)
        ),
        # frame patterns compiled to semi/anti joins on the triple table
        # (cached input: each frame key is a join branch; production
        # frames run against the materialized snapshot table instead)
        "kg_frame_head_mentions": lambda spark, sf: __import__(
            "jsonld_spark.operators.frame_query", fromlist=["x"]
        ).frame_select(
            cached_triples(spark, sf),
            {"@type": "http://kg.example/vocab#Mention",
             "http://kg.example/vocab#target": "http://kg.example/entity/E0"},
        ),
        "kg_frame_tool_turn_subgraph": lambda spark, sf: __import__(
            "jsonld_spark.operators.frame_query", fromlist=["x"]
        ).frame_subgraph(
            cached_triples(spark, sf),
            {"@type": "http://kg.example/vocab#Turn",
             "http://kg.example/vocab#tool": {}},
            depth=1,
        ),
        # @explicit:true embedding control (VERDICT r4 #2): the same
        # tool-bearing turns, pruned to the frame-named predicates —
        # the kernel-faithful @explicit output at depth=0
        "kg_frame_turn_explicit": lambda spark, sf: __import__(
            "jsonld_spark.operators.frame_query", fromlist=["x"]
        ).frame_subgraph(
            cached_triples(spark, sf),
            {"@type": "http://kg.example/vocab#Turn",
             "http://kg.example/vocab#tool": {}},
            depth=0,
            explicit=True,
        ),
        # typed-value matching (VERDICT r3 #1): the frame's native
        # float/int canonicalize through kernel/rdf literal rules to
        # the stored lexical forms ("9.0E-1"^^xsd:double, "1"^^integer)
        "kg_frame_value_mentions": lambda spark, sf: __import__(
            "jsonld_spark.operators.frame_query", fromlist=["x"]
        ).frame_select(
            cached_triples(spark, sf),
            {"@type": "http://kg.example/vocab#Mention",
             "http://kg.example/vocab#score": FRAME_SCORE,
             "http://kg.example/vocab#rank": FRAME_RANK},
        ),
        # language-tagged + multi-value alternatives over the nation-
        # derived label fixture (no @language literals in the kg
        # corpus), framed over the merged dataset AND graph-scoped to
        # one region's named graph — one union suite
        "kg_frame_lang_graph": lambda spark, sf: suites.frame_lang_suite(
            _frame_lang_labels(spark, sf), _frame_graph_scoped(spark, sf)
        ),
        # @default fill semantics: Turn subjects with tool IRI or the
        # frame's default where the property is absent
        "kg_frame_tool_default": lambda spark, sf: __import__(
            "jsonld_spark.operators.frame_query", fromlist=["x"]
        ).frame_project(
            cached_triples(spark, sf),
            {"@type": "http://kg.example/vocab#Turn",
             "http://kg.example/vocab#tool": {"@default": TOOL_DEFAULT}},
            "http://kg.example/vocab#tool",
        ),
        # --- training-data pipeline: dedup ---
        # exact-hash groups + LSH-pair connected-component canonical
        # assignment (the end-to-end "which docs survive" decision)
        "dedup_cluster_suite": suites.dedup_cluster_suite,
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs,
        "dedup_minhash_lsh": dedup.minhash_lsh_pairs,
        # per-doc simhash values + Manku-blocked near pairs, one suite
        "dedup_simhash_suite": suites.dedup_simhash_suite,
        # --- similarity search: exact brute baseline + IVF as one
        # suite; multi-table LSH keeps its own entry (recall headline)
        "sim_topk_suite": suites.sim_topk_suite,
        "sim_lsh_ann_topk": similarity.lsh_ann_topk,
        # neardup: planted-twin mode — the random corpus has no true
        # near-dups (max cosine 0.48), so the check plants deterministic
        # twins on both sides and asserts the operator finds them
        # (VERDICT r2 #3); contam: exact broadcast eval sweep
        "sim_neardup_suite": suites.sim_neardup_suite,
        # --- text analysis ---
        # token counting + quality scoring, one wide per-doc row
        "text_stats_suite": suites.text_stats_suite,
        # CCNet/C4-style corpus-frequency boilerplate removal over
        # transcript turns (broadcast anti-join; boilerplate table +
        # per-role kept/dropped evidence)
        "text_boilerplate": text.boilerplate_suite,
        # marker-based langid (corpus docs) + Cavnar-Trenkle trigram
        # langid (planted multilingual fixture), one union suite
        "text_langid_suite": suites.text_langid_suite,
        "text_fingerprint": text.fingerprints,
        # mergeable sketches: KMV distinct cardinality (per-source
        # word-3-grams) + count-min frequency estimates (probe tokens)
        # — md5-based, engine-portable, oracle-exact
        "sketch_suite": suites.sketch_suite,
        # --- multimodal plumbing ---
        "mm_payload_features": multimodal.payload_features,
        "mm_decoded_features": lambda spark, sf: multimodal.decode_features(
            multimodal.binary_assets(spark, sf),
            decoder=multimodal.deterministic_fake_decoder,
        ),
        # resize + frame-sampling mapInPandas stages, one union suite
        "mm_transform_suite": suites.mm_transform_suite,
        # --- relational operator anchors: pricing agg / 3-way join
        # top-N / anti-join / window sessionization, one union suite
        "rel_suite": suites.rel_suite,
        # temporal interval joins (round 5): as-of join (union-tag +
        # running-last window, no inequality join) + binned range join
        # ((key, bin)-equality candidates), one union suite
        "rel_interval_suite": suites.rel_interval_suite,
    }


def oracle_sql() -> dict[str, str]:
    from jsonld_spark.operators import (
        dedup,
        graph,
        multimodal,
        similarity,
        suites,
        text,
    )
    from jsonld_spark.kernel.rdf import RDF_NIL
    from jsonld_spark.operators.jsonld_ops import from_rdf_list_nodes_sql
    from jsonld_spark.sources import oracle as O

    return {
        "jsonld_expand_docs": O.jsonld_expand_docs_sql(),
        "jsonld_compact_docs": O.jsonld_compact_docs_sql(),
        "jsonld_flatten_docs": O.jsonld_flatten_docs_sql(),
        "jsonld_fromrdf_nodes": O.jsonld_fromrdf_nodes_sql(),
        "jsonld_fromrdf_lists": from_rdf_list_nodes_sql(),
        "kg_triples": O.kg_triples_sql(),
        "kg_nquads": O.kg_nquads_sql(),
        "kg_mention_links": O.kg_mention_detection_sql(),
        "kg_mention_links_salted": O.kg_mention_detection_sql(),
        "kg_entity_mentions": O.kg_entity_mentions_sql(),
        "kg_conversation_stats": O.kg_conversation_stats_sql(),
        "kg_parse_errors": O.kg_parse_errors_sql(),
        "kg_entity_components": O.kg_entity_components_sql(),
        # constants passed explicitly from operators/graph.py so the
        # Spark side and the oracle cannot drift apart silently
        "kg_triangle_counts": O.kg_triangle_counts_sql(),
        "kg_pagerank": O.kg_pagerank_sql(
            iterations=graph.PR_ITERATIONS, scale=graph.PR_SCALE
        ),
        "kg_khop_reach": O.kg_khop_reach_sql(KHOP_SEED, k=graph.KHOP_DEFAULT_K),
        "kg_ppr_provenance": O.kg_ppr_sql(
            KHOP_SEED, iterations=graph.PR_ITERATIONS, scale=graph.PR_SCALE
        ),
        "kg_path_conv_resources": O.kg_path_conv_resources_sql(),
        "kg_path_chain_closures": suites.path_closures_suite_sql(
            O.kg_path_chain_closure_sql(
                CHAIN_CELL_PREFIX, RDF_NIL, hops=CHAIN_CLOSURE_HOPS
            ),
            O.kg_path_chain_closure_all_sql(CHAIN_CELL_PREFIX, RDF_NIL),
        ),
        "kg_path_nonlink_edges": O.kg_path_nps_sql(_nonlink_predicates()),
        "kg_ego_subgraph": O.kg_ego_subgraph_sql(KHOP_SEED, k=EGO_K),
        "kg_neighbor_sample": O.kg_neighbor_sample_sql(NEIGHBOR_SAMPLE_K),
        "kg_negative_samples": O.kg_negative_samples_sql(
            NEG_K, graph.NEG_PROBES, graph.NEG_BUCKET_CHARS
        ),
        "kg_negative_samples_degree": O.kg_negative_samples_degree_sql(
            NEG_K, graph.NEG_PROBES, graph.NEG_BUCKET_CHARS,
            graph.NEG_DEG_UNIT, graph.NEG_DEG_MAX_REP,
        ),
        "kg_degree_histogram": O.kg_degree_histogram_sql(),
        "kg_adjacency_suite": suites.kg_adjacency_suite_sql(),
        "kg_neighbor_similarity": O.kg_neighbor_similarity_sql(
            graph.NS_MAX_DEG, graph.NS_MIN_COMMON
        ),
        "kg_frame_head_mentions": O.kg_frame_head_mentions_sql(),
        "kg_frame_tool_turn_subgraph": O.kg_frame_tool_turn_subgraph_sql(),
        "kg_frame_turn_explicit": O.kg_frame_turn_explicit_sql(),
        "kg_frame_value_mentions": O.kg_frame_value_mentions_sql(
            _frame_score_prior_str(), FRAME_RANK
        ),
        "kg_frame_lang_graph": suites.frame_lang_suite_sql(
            O.kg_frame_lang_labels_sql(
                NATION_IRI_PREFIX, LABEL_LANGS, LABEL_MATCH_LANGS
            ),
            O.kg_frame_graph_scoped_sql(
                NATION_IRI_PREFIX, LABEL_LANGS, LABEL_MATCH_LANGS,
                FRAME_GRAPH_REGION,
            ),
        ),
        "kg_frame_tool_default": O.kg_frame_tool_default_sql(TOOL_DEFAULT),
        "dedup_cluster_suite": suites.dedup_cluster_suite_sql(),
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs_sql(),
        "dedup_minhash_lsh": dedup.minhash_lsh_pairs_sql(),
        "dedup_simhash_suite": suites.dedup_simhash_suite_sql(),
        "sim_topk_suite": suites.sim_topk_suite_sql(),
        "sim_lsh_ann_topk": similarity.lsh_ann_topk_sql(),
        "sim_neardup_suite": suites.sim_neardup_suite_sql(),
        "text_stats_suite": suites.text_stats_suite_sql(),
        "text_boilerplate": text.boilerplate_suite_sql(),
        "text_langid_suite": suites.text_langid_suite_sql(),
        "text_fingerprint": text.fingerprints_sql(),
        "sketch_suite": suites.sketch_suite_sql(),
        "mm_payload_features": multimodal.payload_features_sql(),
        "mm_decoded_features": multimodal.decoded_features_sql(),
        "mm_transform_suite": suites.mm_transform_suite_sql(),
        "rel_suite": suites.rel_suite_sql(),
        "rel_interval_suite": suites.rel_interval_suite_sql(),
    }
