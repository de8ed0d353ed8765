"""JSON-LD framing: declarative pattern matching + subtree embedding.

Mirrors the reference (Processor.php:2478-2543 ``frame``,
2558-2768 ``nodeMatchesFrame``, 2780-2811 ``addMissingNodeProperties``;
JsonLD.php:509-560 wrapper), including its documented deviations from
the (non-normative) spec algorithm (README.md:11-16 — framing is the
reference's own extension; 11 W3C framing tests are intentionally
skipped, Test/W3CTestSuiteTest.php:258-276).

Spark mapping (SURVEY.md §2.2): frame predicates compile to filters /
semi-joins on the triple table; this module is the per-document kernel
and single-process API.
"""

from __future__ import annotations

import copy

from jsonld_spark.kernel.context import DEFAULT_GRAPH, FRAMING_KEYWORDS, MERGED_GRAPH
from jsonld_spark.kernel.exceptions import JsonLdError
from jsonld_spark.kernel.nodemap import BlankNodeIssuer, generate_node_map
from jsonld_spark.kernel.util import php_ksort_keys, php_loose_equals, scalar_equals


def frame_expanded(expanded: list, frame_list: list) -> list:
    """Frame an expanded document with an expanded frame; returns the
    matched expanded subtrees."""
    if not isinstance(frame_list, list) or len(frame_list) != 1 or not isinstance(
        frame_list[0], dict
    ):
        raise JsonLdError(
            JsonLdError.UNSPECIFIED, "The frame is invalid. It must be a single object."
        )
    frame = dict(frame_list[0])

    options = {"@embed": True, "@embedChildren": True}
    for keyword in FRAMING_KEYWORDS:
        if keyword in frame:
            options[keyword] = frame.pop(keyword)
        elif keyword not in options:
            options[keyword] = False

    graph = MERGED_GRAPH
    if "@graph" in frame:
        graph = DEFAULT_GRAPH

    node_map: dict = {graph: {}}
    generate_node_map(node_map, expanded, BlankNodeIssuer(), graph)

    # sort subjects for deterministic output (Processor.php:2524-2532)
    node_map = {
        g: {k: nodes[k] for k in php_ksort_keys(nodes)} for g, nodes in node_map.items()
    }

    result: list = []
    for node in node_map[graph].values():
        _node_matches_frame(node, frame, options, node_map, graph, result)
    return result


def _node_matches_frame(node, frame, options, node_map, graph, parent, path=()):
    filter_props = dict(frame) if frame is not None else None
    result: dict = {}

    if isinstance(node, dict) and "@id" in node:
        result["@id"] = node["@id"]
        if filter_props is None and node["@id"] in path:
            parent.append(result)
            return True
        path = path + (node["@id"],)

    # {} is a wildcard
    if not filter_props:
        if isinstance(node, dict):
            if options["@embed"] is True or "@id" not in node:
                _add_missing_properties(node, options, node_map, graph, result, path)
            parent.append(result)
        else:
            parent.append(node)
        return True

    for prop, valid_values in filter_props.items():
        if isinstance(valid_values, list) and len(valid_values) == 0:
            # [] means the property must NOT exist. (Bug-compat note:
            # the reference's named-graph existence probe checks an
            # unprefixed node-map key that can never exist,
            # Processor.php:2602-2603, so only the plain property
            # check is effective.)
            if prop in node:
                return False
            continue

        prop_missing = prop not in node or (
            isinstance(node.get(prop), list) and len(node[prop]) == 0
        )
        if prop_missing:
            if prop == "@graph":
                # same bug-compat as above (Processor.php:2613-2639):
                # the graph-exists probe never fires, so a @graph
                # requirement on a node without @graph fails the match
                return False

            if not isinstance(valid_values, list):
                valid_values = [valid_values]
            default_found = False
            for valid_value in valid_values:
                if isinstance(valid_value, dict) and "@default" in valid_value:
                    if valid_value["@default"] is None:
                        result[prop] = {"@null": True}
                    else:
                        dft = valid_value["@default"]
                        result[prop] = dft if isinstance(dft, list) else [dft]
                    default_found = True
                    break
            if default_found:
                continue
            return False  # required property missing, no default

        match = False
        result[prop] = []

        if not isinstance(valid_values, list):
            node_value = node[prop]
            if (isinstance(node_value, str) and node_value == valid_values) or scalar_equals(
                node_value, valid_values
            ):
                result[prop] = node_value
                continue
            return False

        for valid_value in valid_values:
            if isinstance(valid_value, dict):
                # subframe: extract its framing options
                sub_frame = dict(valid_value)
                new_options = dict(options)
                new_options.pop("@default", None)
                for keyword in FRAMING_KEYWORDS:
                    if keyword in sub_frame:
                        new_options[keyword] = sub_frame.pop(keyword)

                node_values = node[prop]
                if not isinstance(node_values, list):
                    node_values = [node_values]
                for value in node_values:
                    if isinstance(value, dict) and "@id" in value:
                        match |= _node_matches_frame(
                            node_map[graph][value["@id"]],
                            sub_frame,
                            new_options,
                            node_map,
                            graph,
                            result[prop],
                            path,
                        )
                    else:
                        match |= _node_matches_frame(
                            value, sub_frame, new_options, node_map, graph,
                            result[prop], path,
                        )
            elif isinstance(valid_value, list):
                raise JsonLdError(
                    JsonLdError.UNSPECIFIED,
                    f'Invalid frame detected. Property "{prop}" must not be an '
                    "array of arrays.",
                )
            else:
                # non-expanded IRIs for @id and @type, plus the
                # array-wrapped @value/@language/@index alternatives a
                # frame-mode expansion produces (Processor.php:666-671,
                # 689-693). PHP uses in_array's DEFAULT loose mode here
                # (Processor.php:2736) so "5" matches 5 — mirrored via
                # php_loose_equals, not Python ==
                node_values = node[prop]
                if not isinstance(node_values, list):
                    node_values = [node_values]
                if any(php_loose_equals(valid_value, nv) for nv in node_values):
                    match = True
                    result[prop] = node[prop]

        if not match:
            return False

    # node matched but should not be embedded: keep the reference only
    if options["@embed"] is False and "@id" in node:
        parent.append({"@id": node["@id"]})
        return True

    if options["@explicit"] is False:
        _add_missing_properties(node, options, node_map, graph, result, path)

    parent.append(result)
    return True


def _add_missing_properties(node, options, node_map, graph, result, path):
    for prop, value in node.items():
        if prop in result:
            continue
        if options["@embedChildren"] is True:
            if not isinstance(value, list):
                result[prop] = copy.deepcopy(value)
                continue
            result[prop] = []
            for item in value:
                if isinstance(item, dict):
                    if "@id" in item:
                        item = node_map[graph][item["@id"]]
                    _node_matches_frame(
                        item, None, options, node_map, graph, result[prop], path
                    )
                else:
                    result[prop].append(item)
        else:
            result[prop] = copy.deepcopy(value)


def frame_document(doc, frame_doc, base=None, loader=None):
    """Full framing entry point: expand input, expand the frame in
    frame mode, match, then compact with the frame's context
    (JsonLD.php:509-560)."""
    from jsonld_spark.kernel.api import _parse_input, expand
    from jsonld_spark.kernel.compaction import compact_document

    expanded = expand(doc, base=base, loader=loader)
    frame_doc = _parse_input(frame_doc)
    if not isinstance(frame_doc, dict):
        raise JsonLdError(
            JsonLdError.UNSPECIFIED, "Invalid frame detected. It must be an object."
        )
    frame_context = frame_doc.get("@context")
    expanded_frame = expand(frame_doc, base=base, frame=True, loader=loader)
    result = frame_expanded(expanded, expanded_frame)
    return compact_document(
        result, frame_context, base=base, always_graph=True, loader=loader
    )
