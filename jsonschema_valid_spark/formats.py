"""Format checkers as native Column predicates.

Reference: ``/root/reference/src/format.rs`` (70 LoC of ``FormatChecker``
fns) registered per draft (``schemas.rs:110-129`` d7, ``:179-195`` d6,
``:240-250`` d4). Unknown formats PASS (``validators.rs:624``).

All checkers here are JVM-side ``rlike``/``try_*`` expressions — no Python at
runtime. Two deliberate parity notes (SURVEY.md §2.2):

* ``uri-reference`` / ``uri-template`` are always-true stubs in the reference
  (``format.rs:33-37,67-70``) — we keep the stubs for parity.
* the reference's ``date``/``time`` checkers are broken (chrono ``DateTime``
  parse requires a timezone so every plain date is rejected,
  ``format.rs:55-61``); we implement the spec-correct behavior and record the
  deviation here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from jsonschema_valid_spark.suite.registry import formats_for

_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
IPV4_RE = rf"^{_OCTET}(\.{_OCTET}){{3}}$"

# grouped-hex IPv6 with :: compression (full-form + compressed variants);
# matches what Ipv6Addr::from_str accepts for the common cases
_H = r"[0-9A-Fa-f]{1,4}"
IPV6_RE = (
    rf"^({_H}:){{7}}{_H}$"
    rf"|^({_H}:){{1,7}}:$"
    rf"|^({_H}:){{1,6}}:{_H}$"
    rf"|^({_H}:){{1,5}}(:{_H}){{1,2}}$"
    rf"|^({_H}:){{1,4}}(:{_H}){{1,3}}$"
    rf"|^({_H}:){{1,3}}(:{_H}){{1,4}}$"
    rf"|^({_H}:){{1,2}}(:{_H}){{1,5}}$"
    rf"|^{_H}:(:{_H}){{1,6}}$"
    rf"|^:((:{_H}){{1,7}}|:)$"
)

# RFC-1123 hostname (url::Host::parse acceptance approximation, format.rs:25-27)
HOSTNAME_RE = (
    r"^(?=.{1,253}$)[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
    r"(\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$"
)

# absolute URI: scheme ':' hier-part (Url::parse accepts absolute only,
# format.rs:29-31)
URI_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:[^\s]*$"

# RFC-3339 date-time (chrono DateTime::parse_from_rfc3339, format.rs:47-49)
DATETIME_RE = (
    r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(\.\d+)?"
    r"([Zz]|[+-]\d{2}:\d{2})$"
)

TIME_RE = r"^\d{2}:\d{2}:\d{2}(\.\d+)?$"

JSON_POINTER_RE = r"^(/([^/~]|~[01])*)*$"

# constructs Python `re` accepts but the reference's Rust `regex` crate
# rejects (Regex::new has no lookaround, backreferences, or Python-only
# conditionals/named backrefs) — pre-filtered so the probe matches
# format.rs:51-53 behavior on these families
_RUST_REGEX_UNSUPPORTED = (
    r"\(\?=|\(\?!|\(\?<=|\(\?<!|\\[1-9]|\\k<|\(\?P=|\(\?\("
)


def _rust_compat_translate(v: str):
    """Translate Rust-valid / Python-invalid constructs to Python
    equivalents before the ``re.compile`` probe (ADVICE r3 item 2 — without
    this, patterns the reference's ``Regex::new`` accepts were misclassified
    invalid, and the self-hosted metaschema could reject a `pattern` the
    engine's Java-regex ``rlike`` happily runs):

    * ``\\p{...}`` / ``\\P{...}`` / ``\\pL`` Unicode classes → a benign
      atom (validity approximation: a syntactically well-formed property
      whose NAME is unknown to Rust still passes — documented residual)
    * ``\\z`` end-of-text → Python's ``\\Z``
    * ``(?<name>...)`` named groups → Python's ``(?P<name>...)``
      (lookbehinds ``(?<=`` / ``(?<!`` are pre-filtered before this runs)

    Returns the translated pattern, or None when a ``\\p`` construct is
    malformed (both engines reject those)."""
    import re

    out: list[str] = []
    i, n = 0, len(v)
    while i < n:
        ch = v[i]
        if ch == "\\" and i + 1 < n:
            nxt = v[i + 1]
            if nxt in "pP":
                j = i + 2
                if j < n and v[j] == "{":
                    k = v.find("}", j)
                    if k != -1 and re.fullmatch(
                            r"[A-Za-z0-9_\s=^&:-]+", v[j + 1:k]):
                        out.append(".")
                        i = k + 1
                        continue
                    return None  # malformed \p{…} — invalid in Rust too
                if j < n and v[j].isalpha():
                    out.append(".")
                    i = j + 1
                    continue
                return None
            if nxt == "z":
                out.append(r"\Z")
                i += 2
                continue
            out.append(ch)
            out.append(nxt)
            i += 2
            continue
        out.append(ch)
        i += 1
    return re.sub(r"\(\?<([A-Za-z_][A-Za-z0-9_]*)>", r"(?P<\1>",
                  "".join(out))


def _regex_valid_probe() -> Column:
    """`format: regex` checker: an Arrow-batched pandas UDF probing
    ``re.compile`` per DISTINCT-ish batch value (≙ ``Regex::new(v).is_ok()``,
    ``format.rs:51-53``), with a Rust-compat layer on both sides: a
    pre-filter REJECTS Python-valid constructs Rust lacks (lookaround,
    backreferences, conditionals), and ``_rust_compat_translate`` ACCEPTS
    Rust-valid constructs Python lacks (``\\p{...}`` classes, ``\\z``,
    ``(?<name>)`` groups). Exact on every construct family the two engines
    share plus the translated/filtered families; residual known delta: a
    well-formed ``\\p{...}`` with a property name Rust doesn't recognize
    passes here. This is the one format where no native expression exists;
    the probe is vectorized (one Python call per Arrow batch, a dict-cached
    compile per unique pattern inside it), never row-at-a-time Python — the
    allowance BASELINE.json grants for genuinely non-native semantics."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    unsupported = re.compile(_RUST_REGEX_UNSUPPORTED)

    def regex_ok(s):
        cache: dict[str, bool] = {}

        def ok(v):
            if v is None:
                return None
            hit = cache.get(v)
            if hit is not None:
                return hit
            if unsupported.search(v):
                out = False
            else:
                translated = _rust_compat_translate(v)
                if translated is None:
                    out = False
                else:
                    try:
                        re.compile(translated)
                        out = True
                    except re.error:
                        out = False
            cache[v] = out
            return out

        return s.map(ok)

    # real type objects (not strings): `from __future__ import annotations`
    # would stringify inline hints, which pandas_udf cannot resolve
    regex_ok.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(regex_ok, "boolean")


def format_pred(name: str, col: Column, draft: int) -> Column:
    """Return a boolean Column for ``format: name``; unknown/unregistered
    formats for this draft pass (validators.rs:624)."""
    if name not in formats_for(draft):
        return F.lit(True)
    if name in ("email", "idn-email"):
        # deliberately loose, matching the reference (format.rs:13-15)
        return col.contains("@")
    if name == "ipv4":
        return col.rlike(IPV4_RE)
    if name == "ipv6":
        return col.rlike(IPV6_RE)
    if name == "hostname":
        return col.rlike(HOSTNAME_RE)
    if name in ("uri", "iri"):
        # iri reuses the absolute parser in the reference too (format.rs:39-41)
        return col.rlike(URI_RE)
    if name in ("uri-reference", "uri-template"):
        return F.lit(True)  # reference stubs (format.rs:33-37,67-70)
    if name == "iri-reference":
        # reference quirk: reuses the ABSOLUTE parser (format.rs:43-45)
        return col.rlike(URI_RE)
    if name == "date-time":
        return col.rlike(DATETIME_RE) & F.try_to_timestamp(col).isNotNull()
    if name == "date":
        # spec-correct (deviation: reference's checker rejects all dates,
        # format.rs:55-57)
        return (col.rlike(r"^\d{4}-\d{2}-\d{2}$")
                & F.try_to_timestamp(col, F.lit("yyyy-MM-dd")).isNotNull())
    if name == "time":
        return col.rlike(TIME_RE)
    if name == "json-pointer":
        return col.rlike(JSON_POINTER_RE)
    if name == "regex":
        # exact compile probe (≙ Regex::new(v).is_ok(), format.rs:51-53)
        # via an Arrow-batched pandas UDF — replaced the r2 structural
        # rlike approximation that misclassified e.g. `a{2,1}` as valid
        return _regex_valid_probe()(col)
    return F.lit(True)
