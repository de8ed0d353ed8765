"""Active-context processing and IRI expansion.

Semantics mirror the reference's context algorithms
(reference: Processor.php:1524-1775 ``processContext``,
Processor.php:829-910 ``expandIri``,
Processor.php:1463-1513 ``getPropertyDefinition``) so that per-document
expansion is result-identical. Contexts are small driver-side dicts;
in the Spark pipeline they are resolved once and broadcast — executors
never perform context processing or I/O (SURVEY.md §1.3).

The active context is a plain dict:
  "@base"     -> str | None           (resolved base IRI)
  "@vocab"    -> str                  (present only when set)
  "@language" -> str | None           (present only when set)
  <term>      -> {"@id": str|None, "@reverse": bool,
                  "@type"?: str, "@language"?: str|None, "@container"?: str}
"""

from __future__ import annotations

from jsonld_spark.kernel.exceptions import JsonLdError
from jsonld_spark.kernel.iri import iri_resolve, is_absolute_iri

# All JSON-LD 1.0 keywords (reference: Processor.php:34-36)
KEYWORDS = (
    "@context", "@id", "@value", "@language", "@type",
    "@container", "@list", "@set", "@graph", "@reverse",
    "@base", "@vocab", "@index", "@null",
)

# Framing keywords survive expansion only in frame mode
# (reference: Processor.php:42-44)
FRAMING_KEYWORDS = ("@explicit", "@default", "@embed", "@embedChildren")

# Maximum recursion depth when resolving a term definition chain
# (reference: Processor.php:29)
CONTEXT_MAX_IRI_RECURSIONS = 10

DEFAULT_GRAPH = "@default"
MERGED_GRAPH = "@merged"


class ActiveContext(dict):
    """Active context dict with a property-definition memo.

    The context is immutable during expansion (process_context builds
    it once on the driver; expand copies on @context), so definitions
    can be cached per property — get_property_definition is the
    hottest call in the expansion kernel (~56 calls/document).
    """

    __slots__ = ("defcache", "propcache")

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.defcache: dict = {}
        # prop -> (expanded property, @container, @reverse) dispatch
        # tuple: the three context lookups the expansion loop performs
        # for every (property, value) pair, precompiled per frozen
        # context (the kernel-CPU item from VERDICT.md round 1)
        self.propcache: dict = {}


def initial_context(base: str | None = None) -> dict:
    return ActiveContext({"@base": base})


def expand_iri(
    value,
    activectx: dict,
    relative: bool = False,
    vocab_relative: bool = False,
    localctx: dict | None = None,
    path: list | None = None,
):
    """Expand a term / compact IRI / relative IRI to an absolute IRI.

    Mirrors reference Processor.php:829-910 including its safety rules:
    the ``_`` prefix is never expanded (blank nodes), and neither is a
    suffix starting with ``//`` (prevents remapping e.g. ``http://``).
    """
    if value is None or value in KEYWORDS:
        return value
    if not isinstance(value, str):
        return value

    if localctx is not None:
        path = list(path or ())
        if value in path:
            raise JsonLdError(
                JsonLdError.CYCLIC_IRI_MAPPING,
                "Cycle in context definition detected: " + " -> ".join(path + [value]),
            )
        path.append(value)
        if len(path) >= CONTEXT_MAX_IRI_RECURSIONS:
            raise JsonLdError(
                JsonLdError.UNSPECIFIED,
                "Too many recursions in term definition: " + " -> ".join(path),
            )
        if value in localctx:
            entry = localctx[value]
            nested = None
            if isinstance(entry, str):
                nested = entry
            elif isinstance(entry, dict) and isinstance(entry.get("@id"), str):
                nested = entry["@id"]
            if nested and path[-1] != nested:
                return expand_iri(nested, activectx, False, True, localctx, path)

    # Terms apply only for vocab-relative IRIs
    if vocab_relative and value in activectx and value not in ("@base", "@vocab", "@language"):
        return activectx[value]["@id"]

    if ":" in value:
        prefix, suffix = value.split(":", 1)
        if prefix == "_" or suffix.startswith("//"):
            return value
        if localctx is not None:
            prefix = expand_iri(prefix, activectx, False, True, localctx, path)
            if ":" in prefix:
                return prefix + suffix
        elif prefix in activectx and prefix not in ("@base", "@vocab", "@language"):
            # PHP string-concatenates a null mapping as "" (Processor.php:898)
            mapped = activectx[prefix]["@id"]
            return ("" if mapped is None else mapped) + suffix
    else:
        if vocab_relative and "@vocab" in activectx:
            return activectx["@vocab"] + value
        if relative and activectx.get("@base") is not None:
            return iri_resolve(activectx["@base"], value)

    return value


def property_dispatch(activectx: dict, prop: str):
    """Precompiled per-property dispatch tuple for the expansion loop:
    ``(expanded property, @container, @reverse)`` — the three context
    lookups expand performs for every (property, value) pair, memoized
    on the frozen ActiveContext."""
    try:
        cache = activectx.propcache
    except AttributeError:
        cache = None
    else:
        hit = cache.get(prop)
        if hit is not None:
            return hit
    exp_property = expand_iri(prop, activectx, False, True)
    definition = get_property_definition(activectx, prop)
    entry = (exp_property, definition["@container"], definition["@reverse"])
    if cache is not None:
        cache[prop] = entry
    return entry


def get_property_definition(activectx: dict, prop, only: str | None = None):
    """Return the effective definition for a property under the active
    context (reference: Processor.php:1463-1513).

    The returned dict is cached on ActiveContext instances — treat it
    as immutable (copy before mutating, as compact.py does)."""
    cache = getattr(activectx, "defcache", None)
    if cache is not None:
        cached = cache.get(prop)
        if cached is not None:
            return cached.get(only) if only is not None else cached
    result = {
        "@reverse": False,
        "@type": None,
        "@language": activectx.get("@language"),
        "@index": None,
        "@container": None,
        "isKeyword": False,
        "compactArrays": True,
    }
    if prop in KEYWORDS:
        result["@type"] = "@id" if prop in ("@id", "@type") else None
        result["@language"] = None
        result["isKeyword"] = True
        result["compactArrays"] = prop not in ("@list", "@graph")
    else:
        definition = activectx.get(prop) if isinstance(prop, str) else None
        if isinstance(definition, dict):
            result["@id"] = definition["@id"]
            result["@reverse"] = definition["@reverse"]
            if definition.get("@type") is not None:
                result["@type"] = definition["@type"]
                result["@language"] = None
            elif "@language" in definition:  # may be explicit None
                result["@language"] = definition["@language"]
            if definition.get("@container") is not None:
                result["@container"] = definition["@container"]
                if definition["@container"] in ("@list", "@set"):
                    result["compactArrays"] = False
    if cache is not None and (prop is None or isinstance(prop, str)):
        cache[prop] = result
    if only is not None:
        return result.get(only)
    return result


def process_context(
    loclctx,
    activectx: dict,
    base_iri: str | None = None,
    remote_contexts: tuple = (),
    loader=None,
) -> None:
    """Fold a local context into ``activectx`` (mutated in place).

    Mirrors reference Processor.php:1524-1775. ``loader`` is an
    optional callable(url) -> parsed JSON for remote contexts; in the
    Spark pipeline remote contexts must be pre-fetched on the driver,
    so executors run with loader=None and remote references raise.
    """
    if not isinstance(loclctx, list):
        loclctx = [loclctx]

    # any mutation invalidates memoized property definitions
    cache = getattr(activectx, "defcache", None)
    if cache is not None:
        cache.clear()
    pcache = getattr(activectx, "propcache", None)
    if pcache is not None:
        pcache.clear()

    for context in loclctx:
        if context is None:
            activectx.clear()
            activectx["@base"] = base_iri
        elif isinstance(context, dict):
            pending = dict(context)  # never mutate caller's context

            if "@base" in pending:
                base_val = pending.pop("@base")
                if remote_contexts:
                    pass  # @base is ignored in remote contexts
                elif base_val is None:
                    activectx["@base"] = None
                elif not isinstance(base_val, str):
                    raise JsonLdError(
                        JsonLdError.INVALID_BASE_IRI,
                        "The value of @base must be an IRI or null.",
                    )
                elif is_absolute_iri(base_val):
                    activectx["@base"] = base_val
                else:
                    if activectx.get("@base") is None:
                        raise JsonLdError(
                            JsonLdError.INVALID_BASE_IRI,
                            "The relative base IRI cannot be resolved to an absolute IRI.",
                        )
                    activectx["@base"] = iri_resolve(activectx["@base"], base_val)

            if "@vocab" in pending:
                vocab = pending.pop("@vocab")
                if vocab is None:
                    activectx.pop("@vocab", None)
                elif not isinstance(vocab, str) or ":" not in vocab:
                    raise JsonLdError(
                        JsonLdError.INVALID_VOCAB_MAPPING,
                        "The value of @vocab must be an absolute IRI or null.",
                    )
                else:
                    activectx["@vocab"] = vocab

            if "@language" in pending:
                language = pending.pop("@language")
                if language is not None and not isinstance(language, str):
                    raise JsonLdError(
                        JsonLdError.INVALID_DEFAULT_LANGUAGE,
                        "The value of @language must be a string.",
                    )
                activectx["@language"] = language

            # Term definitions, in document order; each entry is removed
            # from `pending` as it is processed so that `pending` doubles
            # as the forward-reference local context for expand_iri
            # (mirrors the reference's destructive iteration,
            # Processor.php:1602-1603).
            for key in list(pending.keys()):
                if key not in pending:
                    continue  # consumed via a forward reference
                value = pending.pop(key)
                activectx.pop(key, None)

                if key in KEYWORDS:
                    raise JsonLdError(JsonLdError.KEYWORD_REDEFINITION, key)

                if value is None or isinstance(value, str):
                    value = {"@id": value}
                elif isinstance(value, dict):
                    value = dict(value)
                else:
                    raise JsonLdError(JsonLdError.INVALID_TERM_DEFINITION)

                if "@reverse" in value:
                    if "@id" in value:
                        raise JsonLdError(
                            JsonLdError.INVALID_REVERSE_PROPERTY,
                            "Invalid term definition using both @reverse and @id",
                        )
                    if "@container" in value and value["@container"] not in ("@index", "@set"):
                        raise JsonLdError(
                            JsonLdError.INVALID_REVERSE_PROPERTY,
                            "Reverse terms support only @set- and @index-containers.",
                        )
                    value["@id"] = value.pop("@reverse")
                    is_reverse = True
                else:
                    is_reverse = False

                if "@id" in value:
                    idval = value["@id"]
                    if idval is not None and not isinstance(idval, str):
                        raise JsonLdError(JsonLdError.INVALID_IRI_MAPPING, str(idval))
                    path = [] if key == idval else [key]
                    expanded = expand_iri(idval, activectx, False, True, pending, path)
                    if is_reverse and (not isinstance(expanded, str) or ":" not in expanded):
                        raise JsonLdError(
                            JsonLdError.INVALID_IRI_MAPPING,
                            f'Reverse properties must expand to absolute IRIs, "{key}" '
                            f'expands to "{expanded}".',
                        )
                    if expanded == "@context":
                        raise JsonLdError(
                            JsonLdError.INVALID_KEYWORD_ALIAS,
                            "Aliases for @context are not supported",
                        )
                else:
                    expanded = expand_iri(key, activectx, False, True, pending)

                if expanded is None or expanded in KEYWORDS:
                    # keyword alias or null-mapped term: other members ignored
                    activectx[key] = {"@id": expanded, "@reverse": False}
                    continue
                if ":" not in expanded:
                    raise JsonLdError(
                        JsonLdError.INVALID_IRI_MAPPING,
                        f'Failed to expand "{key}" to an absolute IRI.',
                    )

                definition = {"@id": expanded, "@reverse": is_reverse}

                if value.get("@type") is not None:
                    if not isinstance(value["@type"], str):
                        raise JsonLdError(JsonLdError.INVALID_TYPE_MAPPING)
                    expanded_type = expand_iri(value["@type"], activectx, False, True, pending)
                    if expanded_type not in ("@id", "@vocab") and (
                        not isinstance(expanded_type, str)
                        or ":" not in expanded_type
                        or expanded_type.startswith("_:")
                    ):
                        raise JsonLdError(
                            JsonLdError.INVALID_TYPE_MAPPING,
                            f"Failed to expand {expanded_type} to an absolute IRI.",
                        )
                    definition["@type"] = expanded_type
                elif "@language" in value:
                    lang = value["@language"]
                    if lang is not None and not isinstance(lang, str):
                        raise JsonLdError(
                            JsonLdError.INVALID_LANGUAGE_MAPPING,
                            "The value of @language must be a string or null.",
                        )
                    # language applies only to terms without type coercion
                    definition["@language"] = lang

                if value.get("@container") is not None:
                    if value["@container"] in ("@list", "@set", "@language", "@index"):
                        definition["@container"] = value["@container"]
                    else:
                        raise JsonLdError(
                            JsonLdError.INVALID_CONTAINER_MAPPING,
                            f"A container mapping of {value['@container']} is not supported.",
                        )

                activectx[key] = definition
        elif isinstance(context, str):
            # Remote context: resolve against base, guard recursion,
            # fetch via the supplied loader (driver-side only).
            if is_absolute_iri(context):
                remote_url = context
            elif activectx.get("@base") is None:
                raise JsonLdError(
                    JsonLdError.INVALID_BASE_IRI,
                    "Cannot resolve relative remote context URL (no base): " + context,
                )
            else:
                remote_url = iri_resolve(activectx["@base"], context)
            if remote_url in remote_contexts:
                raise JsonLdError(
                    JsonLdError.RECURSIVE_CONTEXT_INCLUSION,
                    "Recursive inclusion of remote context: " + remote_url,
                )
            # the chain grows for the REST OF THIS INVOCATION too, not
            # just the nested call: PHP appends to $remotectxs inside
            # the foreach (Processor.php:1747), so repeating one URL at
            # SIBLING level in the same context array trips the
            # recursion check — bug-compat (appends inside the nested
            # call do NOT propagate back; PHP passes by value)
            remote_contexts = remote_contexts + (remote_url,)
            if loader is None:
                raise JsonLdError(
                    JsonLdError.LOADING_REMOTE_CONTEXT_FAILED,
                    "No document loader available for remote context " + remote_url
                    + " (remote contexts must be pre-resolved on the driver)",
                )
            try:
                remote_doc = loader(remote_url)
            except JsonLdError:
                raise
            except Exception as exc:  # noqa: BLE001 - map loader errors
                raise JsonLdError(
                    JsonLdError.LOADING_REMOTE_CONTEXT_FAILED,
                    f"Loading {remote_url} failed",
                ) from exc
            if isinstance(remote_doc, dict) and "@context" in remote_doc:
                process_context(
                    remote_doc["@context"],
                    activectx,
                    base_iri,
                    remote_contexts,
                    loader,
                )
            else:
                raise JsonLdError(
                    JsonLdError.INVALID_REMOTE_CONTEXT,
                    f'Remote context "{context}" is invalid.',
                )
        else:
            raise JsonLdError(JsonLdError.INVALID_LOCAL_CONTEXT)

    if cache is not None:
        cache.clear()
