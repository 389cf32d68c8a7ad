"""Per-draft keyword registries.

The reference registers a ``Validator`` fn per keyword per draft in static
dispatch tables (``/root/reference/src/schemas.rs:65-101`` draft7 = 31
keywords, ``:135-169`` draft6 = 30, ``:201-230`` draft4 = 26) and looks the
keyword up per schema node at validation time
(``/root/reference/src/validators.rs:65-79``).

Our engine resolves the registry ONCE at compile time (driver-side): unknown
keywords are ignored exactly like the reference (``validators.rs:75-78``
returns ``no_error`` when lookup fails), and draft differences change which
keywords are recognized (e.g. draft4 has boolean ``exclusiveMinimum``
modifiers instead of standalone numeric keywords — ``validators.rs:416-445``).

Dataset-level extension keywords (prefixed ``x-``) have no reference
counterpart at row scope; they lift the reference's semantics to table scope
per BASELINE.json (null-rate thresholds, uniqueness, referential membership,
distribution drift, stats bounds).
"""

from __future__ import annotations

# Row/value-level keywords shared by every draft (validators.rs:201-230 is the
# draft4 subset; :135-169 adds const/contains/propertyNames/exclusive*;
# :65-101 adds if/then/else).
_DRAFT4_KEYWORDS = frozenset(
    {
        "type",
        "enum",
        "minimum",
        "maximum",
        "multipleOf",
        "minLength",
        "maxLength",
        "pattern",
        "format",
        "items",
        "additionalItems",
        "minItems",
        "maxItems",
        "uniqueItems",
        "properties",
        "patternProperties",
        "additionalProperties",
        "required",
        "minProperties",
        "maxProperties",
        "dependencies",
        "allOf",
        "anyOf",
        "oneOf",
        "not",
        "$ref",
        # draft4 treats exclusiveMinimum/Maximum as boolean *modifiers* of
        # minimum/maximum (validators.rs:416-445,466-495); they are handled
        # inside the minimum/maximum compilers, not registered standalone.
    }
)

_DRAFT6_KEYWORDS = _DRAFT4_KEYWORDS | frozenset(
    {
        "const",
        "contains",
        "propertyNames",
        "exclusiveMinimum",
        "exclusiveMaximum",
    }
)

# draft7 = draft6 + if/then/else (schemas.rs:69 vs :137)
_DRAFT7_KEYWORDS = _DRAFT6_KEYWORDS | frozenset({"if", "then", "else"})

# Dataset-level lifts (BASELINE.json north_star): recognized in every draft.
DATASET_KEYWORDS = frozenset(
    {
        "x-nullRate",       # null fraction threshold (lift of `required`)
        "x-unique",         # cross-row uniqueness (lift of `uniqueItems`)
        "x-referential",    # value ∈ domain table (lift of `enum` at scale)
        "x-drift",          # KS/PSI distribution drift vs baseline histogram
        "x-stats",          # per-partition min/max/avg/stddev bounds
        "x-distinctCount",  # (approx) distinct cardinality bounds
        "x-quantile",       # approx-quantile bounds
        "x-decontamination",  # benchmark n-gram overlap (train/eval hygiene)
        "x-blocklist",      # whole-word safety blocklist (row-scope filter)
        "x-lmScore",        # unigram-LM quality gate (CCNet/KenLM-style filter)
        "x-vector",         # embedding column: width/finite/unit-norm (row-scope)
        "x-tokenShape",     # token-array structure: BOS/EOS/forbidden/pad (row-scope)
        "x-jsonWellFormed", # string column parses as JSON (row-scope)
        "x-nearDup",        # near-duplicate membership (MinHash/SimHash/semantic)
        "x-linkage",        # approximate-identity membership (multi-field record lift)
        "x-partitionComplete",  # declared partitions present (lift of `required`)
        "x-aggConsistency",  # column == child-table aggregate (lift of `const`)
        "x-freshness",      # per-group max-timestamp recency vs declared as-of
        "x-monotonic",      # value monotonic over a declared ordering per group
        "x-noOverlap",      # [start,end) intervals disjoint per group
        "x-session",        # gap-framed session duration/size bounds per group
        "x-eventOrder",     # first(A) must precede first(B) per group (causality)
        "x-correlation",    # Pearson r between two columns within bounds per group
        "x-association",    # Cramér's V between two categorical columns per group
        "x-acyclic",        # parent-pointer chains reach a root within maxDepth
        "x-reciprocal",     # every (a,b) pair occurs reversed (edge/ledger symmetry)
        "x-cohortParity",   # cohort metric within maxGap of a baseline cohort's
        "x-contiguous",     # integer sequence covers [min..max] with no holes per group
        "x-trend",          # OLS slope of value vs an ordering within bounds per group
        "x-seasonality",    # lag-k autocorrelation bounds (rhythm/independence) per group
        "x-distinctRatio",  # distinct/count rate bounds (soft x-unique, like x-nullRate vs required)
        "x-compliance",     # predicate pass-rate bounds (soft x-rowExpr, the error budget)
        "x-funnel",         # step-to-step conversion-rate floors over an ordered chain
        "x-levelShift",     # peak rolling-mean jump per group within a bound
        "x-entropy",        # Shannon-entropy bounds (collapse/uniformity guard)
        "x-outlier",        # per-group z-score envelope (data-aware min/max lift)
        "x-functionalDependency",  # determinant -> dependent tuple (FD, lift of `dependencies`)
        "x-rowCount",       # table/group cardinality bounds (lift of min/maxItems)
        "x-maxFrequency",   # per-value dominance cap (lift of enum to frequency)
        "x-distribution",   # goodness-of-fit vs a closed-form law (baseline-free drift)
        "x-rowExpr",        # escape hatch: arbitrary SQL boolean over the row
        "x-parity",         # per-row equality vs a reference table (BASELINE.json:15)
    }
)

# Per-draft format-checker names (schemas.rs:110-129 draft7 = 15,
# :179-195 draft6 = 12, :240-250 draft4 = 7). Unknown formats PASS
# (validators.rs:624).
DRAFT4_FORMATS = frozenset(
    {"date-time", "email", "hostname", "ipv4", "ipv6", "regex", "uri"}
)
DRAFT6_FORMATS = DRAFT4_FORMATS | frozenset(
    {"json-pointer", "uri-reference", "uri-template", "date", "time"}
)
DRAFT7_FORMATS = DRAFT6_FORMATS | frozenset(
    {"idn-email", "iri", "iri-reference"}
)

_REGISTRY = {
    4: _DRAFT4_KEYWORDS,
    6: _DRAFT6_KEYWORDS,
    7: _DRAFT7_KEYWORDS,
}

_FORMAT_REGISTRY = {
    4: DRAFT4_FORMATS,
    6: DRAFT6_FORMATS,
    7: DRAFT7_FORMATS,
}

DEFAULT_DRAFT = 7  # reference defaults to Draft7 (config.rs:59-61)

# $schema URL sniffing (schemas.rs:255-262 draft_from_url)
_SCHEMA_URLS = {
    "http://json-schema.org/draft-04/schema": 4,
    "http://json-schema.org/draft-06/schema": 6,
    "http://json-schema.org/draft-07/schema": 7,
}


def draft_from_url(url: str) -> int | None:
    """≙ ``schemas.rs:255-262``: strip fragment, look up known URLs."""
    base = url.split("#", 1)[0]
    return _SCHEMA_URLS.get(base)


def resolve_draft(spec: dict) -> int:
    """Explicit ``version`` key > ``$schema`` URL sniff > Draft7 default
    (≙ ``config.rs:55-67`` + ``schemas.rs:265-271``)."""
    if "version" in spec:
        v = spec["version"]
        if v not in _REGISTRY:
            raise ValueError(f"unsupported draft/version: {v!r} (want 4, 6, or 7)")
        return int(v)
    url = spec.get("$schema")
    if isinstance(url, str):
        d = draft_from_url(url)
        if d is not None:
            return d
    return DEFAULT_DRAFT


def keywords_for(draft: int) -> frozenset[str]:
    return _REGISTRY[draft]


def formats_for(draft: int) -> frozenset[str]:
    return _FORMAT_REGISTRY[draft]
