"""Shared helpers for the JSON-LD kernels.

Mirrors the reference's strict-typed deep-equality and merge helpers
(reference: Processor.php:1275-1323 ``subtreeEquals``,
Processor.php:2860-2897 ``mergeIntoProperty``,
Processor.php:2825-2846 ``setProperty``).
"""

from __future__ import annotations

from jsonld_spark.kernel.exceptions import JsonLdError


def is_scalar(value) -> bool:
    """PHP is_scalar: int/float/string/bool (not None, list, dict)."""
    return isinstance(value, (str, int, float, bool))


def scalar_equals(a, b) -> bool:
    """Strict (===) scalar comparison: type AND value must match.

    Python quirks handled: bool is an int subclass, and 1 == 1.0.
    The reference compares with PHP === which distinguishes all of
    int/float/bool/string.
    """
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a is b
    if type(a) is not type(b):
        return False
    return a == b


_PHP_NUMERIC_PREFIX = None  # compiled lazily (regex import kept local)


def _php_number_prefix(s: str) -> float:
    """PHP 5/7 string-to-number conversion used by loose ``==``:
    leading whitespace allowed, then the longest numeric prefix
    (sign, digits, decimal, exponent); no prefix means 0."""
    global _PHP_NUMERIC_PREFIX
    if _PHP_NUMERIC_PREFIX is None:
        import re

        _PHP_NUMERIC_PREFIX = re.compile(
            r"[ \t\n\r\v\f]*([+-]?(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?)"
        )
    m = _PHP_NUMERIC_PREFIX.match(s)
    return float(m.group(1)) if m else 0.0


def _php_is_numeric(s: str) -> bool:
    """PHP 5/7 is_numeric for strings: optional LEADING whitespace,
    full numeric body, no trailing junk (trailing whitespace is junk
    until PHP 8)."""
    import re

    return bool(
        re.fullmatch(
            r"[ \t\n\r\v\f]*[+-]?(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?", s
        )
    )


def _php_bool(v) -> bool:
    """PHP boolean conversion: false for false, 0, 0.0, "", "0", null."""
    if v is None or v is False:
        return False
    if isinstance(v, str):
        return v not in ("", "0")
    if isinstance(v, (int, float)):
        return v != 0
    return True


def php_loose_equals(a, b) -> bool:
    """PHP 5/7 loose (==) scalar comparison, as used by the frame
    matcher's ``in_array($validValue, $nodeValues)``
    (Processor.php:2736 — in_array's default mode is loose).

    Comparison table mirrored (pre-PHP-8 semantics, the reference
    requires php >= 5.3, composer.json:17):

    * bool vs anything: both sides convert to bool
    * null vs string: null becomes "" and strings compare by bytes
    * null vs number/null: bool conversion (null == 0 is true)
    * number vs string: the string converts via its numeric PREFIX
      ("10abc" == 10 and "abc" == 0 are both true pre-PHP-8)
    * string vs string: numeric compare when BOTH are numeric
      ("1e3" == "1000"), byte compare otherwise
    * non-scalars (objects/arrays) never equal a scalar
    """
    if isinstance(a, (dict, list)) or isinstance(b, (dict, list)):
        return False
    if a is None and b is None:
        return True
    if isinstance(a, bool) or isinstance(b, bool):
        return _php_bool(a) == _php_bool(b)
    if a is None:
        return b == "" if isinstance(b, str) else not _php_bool(b)
    if b is None:
        return a == "" if isinstance(a, str) else not _php_bool(a)
    if isinstance(a, str) and isinstance(b, str):
        if _php_is_numeric(a) and _php_is_numeric(b):
            return float(a) == float(b)
        return a == b
    if isinstance(a, str):
        return _php_number_prefix(a) == float(b)
    if isinstance(b, str):
        return float(a) == _php_number_prefix(b)
    return a == b


def subtree_equals(a, b) -> bool:
    """Deep structural equality; unlabeled blank nodes never compare
    equal (they cannot be identified)."""
    if a is None or b is None:
        return a is None and b is None
    if is_scalar(a) or is_scalar(b):
        return scalar_equals(a, b)
    if type(a) is not type(b):
        return False
    if isinstance(a, list):
        if len(a) != len(b):
            return False
        return all(subtree_equals(x, y) for x, y in zip(a, b))
    # dict (node/value object)
    if "@id" not in a and "@value" not in a and "@list" not in a:
        return False  # blank nodes can never match
    if len(a) != len(b):
        return False
    for key, value in a.items():
        if key not in b or not subtree_equals(value, b[key]):
            return False
    return True


def set_property(obj: dict, prop: str, value, error_code: str | None = None) -> None:
    """Set a property, raising if it already holds a different value."""
    if prop in obj and not subtree_equals(obj[prop], value):
        raise JsonLdError(
            error_code or JsonLdError.UNSPECIFIED,
            f'Object already contains a property "{prop}".',
        )
    obj[prop] = value


def merge_into_property(
    obj: dict, prop: str, value, always_array: bool = False, unique: bool = False
) -> None:
    """Merge a value (or each element of a list) into obj[prop]."""
    if value is None:
        return
    if isinstance(value, list):
        # fast path for the common case in expansion: fresh property,
        # non-unique merge of a flat list of dicts/scalars
        if (
            prop not in obj
            and always_array
            and not unique
            and not any(item is None or isinstance(item, list) for item in value)
        ):
            obj[prop] = list(value)
            return
        # empty arrays are preserved in expansion
        if not value and prop not in obj:
            obj[prop] = []
        for item in value:
            merge_into_property(obj, prop, item, always_array, unique)
        return
    if prop in obj:
        existing = obj[prop]
        if not isinstance(existing, list):
            existing = [existing]
            obj[prop] = existing
        if unique:
            for item in existing:
                if subtree_equals(item, value):
                    return
        existing.append(value)
    else:
        obj[prop] = [value] if always_array else value


def php_ksort_keys(d: dict) -> list:
    """Key order used at every deterministic iteration point.

    PHP ``ksort`` with SORT_REGULAR compares numeric strings as
    numbers; JSON-LD property keys are virtually always non-numeric,
    so plain lexicographic order matches. Numeric-string keys (only
    possible inside @index maps) get a numeric-aware order for parity.
    """
    keys = sorted(d)
    # Fast path: keys that cannot be numeric strings (common case) —
    # only re-sort when a key starts with a digit/sign/dot
    for k in keys:
        if k and k[0] in "0123456789+-.":
            break
    else:
        return keys

    def sort_key(k):
        try:
            return (0, float(k), "")
        except (TypeError, ValueError):
            return (1, 0.0, k)

    return sorted(keys, key=sort_key)
