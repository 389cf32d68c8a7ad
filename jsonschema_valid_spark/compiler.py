"""Suite → Spark plan compiler.

The reference walks the schema tree per document at validation time,
dispatching each keyword through a per-draft table
(``/root/reference/src/validators.rs:44-87`` ``descend``). Our compiler does
that walk ONCE on the driver and emits:

* ``RowCheck`` — one boolean ``Column`` predicate per (keyword, column) pair.
  All row checks fuse into a single ``select`` projection → one
  whole-stage-codegen pass over columnar batches (the reference's per-node
  dynamic dispatch, vectorized away).
* ``AggCheck`` — named aggregate expressions + a post-agg verdict expression.
  All agg checks fuse into ONE ``groupBy(partition).agg(...)`` pass
  (BASELINE.json: "single multi-aggregate DataFrame pass").
* ``DatasetCheck`` — checks that need their own shuffle/join topology
  (cross-row uniqueness, referential anti-join, drift, parity); implemented
  in ``operators/``.

Null semantics: JSON Schema keywords skip instances of the wrong type (e.g.
``minimum`` passes for a string — ``validators.rs:451-453``); absence of a
property also skips. We collapse JSON ``null`` / absent property into SQL
``NULL`` (documented deviation, SURVEY.md §7) — every keyword predicate is
null-tolerant (``col IS NULL ⇒ pass``) except ``required``/``x-nullRate``.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_valid_spark.suite import registry
from jsonschema_valid_spark.suite.spec import SuiteBindError, SuiteError


# ---------------------------------------------------------------------------
# Compiled check forms
# ---------------------------------------------------------------------------

@dataclass
class RowCheck:
    check_id: str            # slash-joined schema path (≙ error.rs:29-35 path)
    pred: Column             # True ⇒ row passes this check
    observed: Column         # string-typed witness for the violations DF
    expected: str            # human-readable expectation (≙ error message)
    # instance path incl. array index of the first offending element
    # (≙ error.rs:29-35 instance_context joining indices into the path);
    # None ⇒ the engine fills in the check_id (scalar checks: same path).
    instance_path: Optional[Column] = None
    # compact JSON of the violated schema node, rendered by the driver-side
    # pretty printer (≙ error.rs:47-58 schema_context) — never shipped
    # per-row (the violations DF stays slim at 10^12 rows)
    schema_json: Optional[str] = None


@dataclass
class AggCheck:
    check_id: str
    aggs: dict[str, Column]                      # alias → (unaliased) agg expr
    passed: Callable[[], Column]                 # over F.col(alias) of agg output
    metric: Callable[[], Column]                 # double metric value
    threshold: float


@dataclass
class DatasetCheck:
    check_id: str
    kind: str                # 'unique' | 'referential' | 'drift' | 'parity'
    column: str
    params: dict


@dataclass
class BoundPlan:
    row_checks: list[RowCheck] = field(default_factory=list)
    agg_checks: list[AggCheck] = field(default_factory=list)
    dataset_checks: list[DatasetCheck] = field(default_factory=list)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL = (T.FloatType, T.DoubleType, T.DecimalType)


def _json_type_of(dt: T.DataType) -> str:
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, _INTEGRAL):
        return "integer"
    if isinstance(dt, _FRACTIONAL):
        return "number"
    if isinstance(dt, T.ArrayType):
        return "array"
    if isinstance(dt, (T.StructType, T.MapType)):
        return "object"
    if isinstance(dt, T.NullType):
        return "null"
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "string"  # dates/times exist only as string formats (format.rs:47-61)
    return "string"


def _tolerant(col: Column, core: Column) -> Column:
    """Null-tolerant wrapper: NULL target ⇒ pass; NULL-valued core ⇒ pass
    (a NULL core can only arise from missing operands, i.e. 'keyword does
    not apply' — matching validators.rs type-guard skips)."""
    return F.coalesce(col.isNull() | core, F.lit(True))


def _null_only_tolerant(col: Column, core: Column) -> Column:
    """Tolerance for EQUALITY keywords (const/enum): a NULL target still
    passes (nulls are required/x-nullRate's business), but a NULL core on
    a NON-null target means the comparison itself could not hold (a cast
    mismatch: 'a' == 2) — deep equality FAILS there (util.rs:29-45),
    unlike the bounds keywords where a null core means 'does not apply'.
    (r5 fix: 'a' used to PASS {const: 2} through the blanket coalesce.)"""
    return F.when(col.isNull(), F.lit(True)).otherwise(
        F.coalesce(core, F.lit(False)))


def _lit_of(v: Any) -> Column:
    if isinstance(v, list):
        return F.array(*[_lit_of(x) for x in v])
    return F.lit(v)


def _contains_map(dtype) -> bool:
    """True when a dtype carries a MapType anywhere — maps have no Spark
    ordering, so equality/distinctness must go through a canonical form."""
    if isinstance(dtype, T.MapType):
        return True
    if isinstance(dtype, T.ArrayType):
        return _contains_map(dtype.elementType)
    if isinstance(dtype, T.StructType):
        return any(_contains_map(f.dataType) for f in dtype.fields)
    return False


def _eq_member(col: Column, dtype, x) -> Column:
    """Deep-equality of a column against one enum/const member, dtype-
    aware (util.rs:29-45): numeric-tolerant across int/float (1 == 1.0),
    try_cast for the dynamic string column (never an ANSI runtime cast
    error: `'a' == 2` must be FALSE, not CAST_INVALID_INPUT), and a
    STATIC False for members whose JSON type can never equal the
    column's (a string column never equals `true`). Object members
    compare entry-wise against map columns and field-wise against
    struct columns (Spark's `==` has no map ordering, and a struct's
    absent property is a NULL field under the struct collapse)."""
    import json as _json

    if x is None:
        # JSON null member: deep equality holds exactly when the value IS
        # null (util.rs null arm). Without this arm every branch below
        # returned a static False and a nested null member ({"enum":
        # [[1, null]]}) could never match its instance (ADVICE r5).
        return col.isNull()
    numeric = isinstance(x, (int, float)) and not isinstance(x, bool)
    if isinstance(dtype, T.StringType):
        if numeric:
            return col.try_cast("double") == F.lit(float(x))
        if isinstance(x, (dict, list)):
            # a stringified-JSON cell (MapType value / relaxed source):
            # from_json compacts nested values exactly like separators=(',',':').
            # KNOWN CORNER (ADVICE r5 / SURVEY §7): object members compare in
            # the schema author's key order — an instance object with equal
            # content but different key order does NOT match. Canonicalizing
            # would need from_json on the cell (type-dependent) and would
            # change the oracle convention; declare members in the producer's
            # key order, or use a Map-typed column for order-free equality.
            return col == F.lit(_json.dumps(x, separators=(",", ":")))
        return col == F.lit(x) if isinstance(x, str) else F.lit(False)
    if isinstance(dtype, T.NumericType):
        return (col.cast("double") == F.lit(float(x)) if numeric
                else F.lit(False))
    if isinstance(dtype, T.BooleanType):
        return col == F.lit(x) if isinstance(x, bool) else F.lit(False)
    if isinstance(dtype, T.ArrayType):
        if not isinstance(x, list):
            return F.lit(False)
        # element-wise (never a composite literal: maps/structs have no
        # Spark literal form, and 1 vs 1.0 tolerance applies per element)
        out = F.size(col) == len(x)
        for i, xv in enumerate(x):
            out = out & F.coalesce(
                _eq_member(F.try_element_at(col, F.lit(i + 1)),
                           dtype.elementType, xv),
                F.lit(False))
        return out
    if isinstance(dtype, T.MapType):
        if not isinstance(x, dict):
            return F.lit(False)
        out = F.size(col) == len(x)
        for k, xv in x.items():
            member_eq = F.coalesce(
                _eq_member(F.try_element_at(col, F.lit(k)),
                           dtype.valueType, xv),
                F.lit(False))
            if xv is None:
                # try_element_at is NULL for absent key AND for a
                # present-but-null value; only the latter equals a null
                # member (ADVICE r5)
                member_eq = F.map_contains_key(col, F.lit(k)) & member_eq
            out = out & member_eq
        return out
    if isinstance(dtype, T.StructType):
        if not isinstance(x, dict):
            return F.lit(False)
        names = {f.name for f in dtype.fields}
        if any(k not in names for k in x):
            return F.lit(False)  # instance can never carry that key
        preds = []
        for f in dtype.fields:
            fc = col.getField(f.name)
            if f.name in x:
                preds.append(F.coalesce(
                    _eq_member(fc, f.dataType, x[f.name]), F.lit(False)))
            else:
                preds.append(fc.isNull())  # absent = null (struct collapse)
        out = preds[0] if preds else F.lit(len(x) == 0)
        for p in preds[1:]:
            out = out & p
        return out
    if isinstance(x, (dict, list)):
        # unknown dtype (lambda element) with a composite member: no
        # literal form to compare against — statically unequal, the same
        # convention as the scalar type-mismatch branches above
        return F.lit(False)
    return col == _lit_of(x)  # unknown dtype (lambda element): dynamic


def _path_id(path: tuple) -> str:
    return "/".join(str(p) for p in path) or "<root>"


class _Ctx:
    """Bind context: draft, resolver, $ref cycle stack."""

    def __init__(self, suite):
        self.suite = suite
        self.draft = suite.draft
        self.resolver = suite.resolver
        self.keywords = registry.keywords_for(suite.draft)
        self.ref_stack: list[int] = []   # id()s of in-flight $ref targets (cycle guard)


# ---------------------------------------------------------------------------
# Value-level predicate compilation
# ---------------------------------------------------------------------------

def compile_value_pred(
    spec: Any,
    col: Column,
    dtype: Optional[T.DataType],
    ctx: _Ctx,
    path: tuple = (),
) -> Column:
    """Compile a suite node applied to a single VALUE into one boolean
    ``Column`` (conjunction of all its keyword predicates). This is the
    value-scope analog of ``descend`` (``validators.rs:44-87``)."""
    if spec is True or spec == {}:
        return F.lit(True)
    if spec is False:
        # bool schema false ⇒ fail-all (validators.rs:52-58); stays
        # null-tolerantly strict: even NULL fails `false` in JSON Schema.
        return F.lit(False)
    if not isinstance(spec, dict):
        raise SuiteError(f"bad suite node at {_path_id(path)}")

    # $ref short-circuits every sibling keyword (validators.rs:60-63);
    # resolution joins the ref against the lexical $id scope of THIS node
    # (resolver.rs:96-116 join_url + context.rs scope chain)
    if "$ref" in spec:
        target = ctx.resolver.resolve(spec["$ref"], scope=spec)
        tid = id(target)
        if tid in ctx.ref_stack:
            raise SuiteError(
                f"recursive $ref cycle at {_path_id(path)} — not compilable "
                "(reference TODO resolver.rs:171; we reject at compile time)"
            )
        ctx.ref_stack.append(tid)
        try:
            return compile_value_pred(target, col, dtype, ctx, path + ("$ref",))
        finally:
            ctx.ref_stack.pop()

    preds: list[Column] = []
    for kw in spec:
        if kw not in ctx.keywords:
            continue  # unknown keyword ⇒ no-op (validators.rs:75-78)
        p = _compile_keyword(kw, spec, col, dtype, ctx, path)
        if p is not None:
            preds.append(p)
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def _numeric(col: Column, dtype) -> Column:
    """Cast a string-typed column for numeric keywords (dynamic-typing
    support); numeric columns pass through."""
    if isinstance(dtype, T.StringType):
        return col.try_cast("double")
    return col


#: JSON Schema keywords are TYPE APPLICATORS: a string keyword on a
#: non-string instance validates trivially (validators.rs matches on the
#: instance variant and returns Ok for other variants). Relationally the
#: column dtype IS the instance type, so a keyword whose applicable type
#: can never match the static dtype compiles to INERT (None) — both for
#: spec correctness ("ignores non-strings") and because the blind
#: expression would be an AnalysisException (size() on a string).
#: StringType stays DYNAMIC for numeric keywords (try_cast — relaxed
#: sources carry numbers as strings).
_STRING_KWS = {"minLength", "maxLength", "pattern", "format"}
_ARRAY_KWS = {"items", "additionalItems", "contains", "minItems",
              "maxItems", "uniqueItems"}
_NUMERIC_KWS = {"minimum", "maximum", "exclusiveMinimum",
                "exclusiveMaximum", "multipleOf"}


def _keyword_inert_for_dtype(kw: str, dtype) -> bool:
    if dtype is None:
        return False  # unknown (lambda element) dtype stays dynamic
    if kw in _STRING_KWS:
        return not isinstance(dtype, T.StringType)
    if kw in _ARRAY_KWS:
        return not isinstance(dtype, T.ArrayType)
    if kw in _NUMERIC_KWS:
        return not isinstance(
            dtype, (T.NumericType, T.StringType))
    return False


def _compile_keyword(
    kw: str, spec: dict, col: Column, dtype, ctx: _Ctx, path: tuple
) -> Optional[Column]:
    v = spec[kw]
    if _keyword_inert_for_dtype(kw, dtype):
        return None
    if kw == "type":
        return _type_pred(v, col, dtype)
    if kw == "enum":
        # per-member dtype-aware deep equality (util.rs:39-45)
        members = [x for x in v if x is not None]
        if not members:
            return _null_only_tolerant(col, F.lit(False))
        pred = _eq_member(col, dtype, members[0])
        for x in members[1:]:
            pred = pred | _eq_member(col, dtype, x)
        return _null_only_tolerant(col, pred)
    if kw == "const":
        if v is None:
            # {const: null}: only JSON null validates (util.rs:29-31 Null
            # arm of the deep-equality). `col == lit(None)` would yield SQL
            # NULL and be coalesced to pass for EVERY value — special-case
            # to an explicit null test so non-null values are flagged.
            return col.isNull()
        return _null_only_tolerant(col, _eq_member(col, dtype, v))
    if kw == "minimum":
        c = _numeric(col, dtype)
        if ctx.draft == 4 and spec.get("exclusiveMinimum") is True:
            return _tolerant(col, c > F.lit(v))  # validators.rs:416-445
        return _tolerant(col, c >= F.lit(v))     # validators.rs:447-464
    if kw == "maximum":
        c = _numeric(col, dtype)
        if ctx.draft == 4 and spec.get("exclusiveMaximum") is True:
            return _tolerant(col, c < F.lit(v))  # validators.rs:466-495
        return _tolerant(col, c <= F.lit(v))     # validators.rs:497-514
    if kw == "exclusiveMinimum":
        if ctx.draft == 4:
            return None  # boolean modifier, folded into `minimum`
        return _tolerant(col, _numeric(col, dtype) > F.lit(v))   # validators.rs:378-395
    if kw == "exclusiveMaximum":
        if ctx.draft == 4:
            return None
        return _tolerant(col, _numeric(col, dtype) < F.lit(v))   # validators.rs:397-414
    if kw == "multipleOf":
        # int % for integral/integral, else trunc-division equality
        # (validators.rs:517-542)
        c = _numeric(col, dtype)
        if isinstance(dtype, _INTEGRAL) and isinstance(v, int):
            return _tolerant(col, F.pmod(c, F.lit(v)) == 0)
        q = c / F.lit(float(v))
        return _tolerant(col, q == F.floor(q))
    if kw == "minLength":
        # Unicode char count, not bytes (validators.rs:641) — F.char_length
        # on StringType counts characters, matching chars().count()
        return _tolerant(col, F.char_length(col) >= v)
    if kw == "maxLength":
        return _tolerant(col, F.char_length(col) <= v)           # validators.rs:653-671
    if kw == "pattern":
        # partial match like Rust Regex::find (validators.rs:597-614);
        # rlike is also a partial match
        return _tolerant(col, col.rlike(v))
    if kw == "format":
        from jsonschema_valid_spark.formats import format_pred

        return _tolerant(col, format_pred(v, col, ctx.draft))
    if kw == "items":
        return _items_pred(spec, col, dtype, ctx, path)
    if kw == "additionalItems":
        return _additional_items_pred(spec, col, dtype, ctx, path)
    if kw == "contains":
        el = dtype.elementType if isinstance(dtype, T.ArrayType) else None
        # ≥1 element validates (validators.rs:353-376); F.exists
        # short-circuits per row inside codegen
        return _tolerant(
            col, F.exists(col, lambda x: compile_value_pred(v, x, el, ctx, path + ("contains",)))
        )
    if kw == "minItems":
        return _tolerant(col, F.size(col) >= v)                  # validators.rs:544-561
    if kw == "maxItems":
        return _tolerant(col, F.size(col) <= v)                  # validators.rs:563-580
    if kw == "uniqueItems":
        if v is not True:
            return None
        # intra-array distinctness (validators.rs:582-595 + unique.rs);
        # NB the reference's set-equality is stricter about 1 vs 1.0 than
        # its enum equality (unique.rs:53-57 vs util.rs:39-45) — we use
        # Spark-native equality uniformly (SURVEY.md §7). Map-bearing
        # elements have no Spark ordering (array_distinct refuses), so
        # they canonicalize first: a map element sorts its entries (JSON
        # objects are key-order-insensitive) and serializes; any other
        # map-bearing shape serializes as-is (to_json keeps from_json's
        # document key order — an order-insensitive corner documented in
        # SURVEY.md §7).
        target = col
        if isinstance(dtype, T.ArrayType) and _contains_map(dtype.elementType):
            if isinstance(dtype.elementType, T.MapType):
                def _canon(m):
                    return F.to_json(F.array_sort(F.map_entries(m)))
            else:
                def _canon(m):
                    return F.to_json(m)
            target = F.transform(col, _canon)
        return _tolerant(col, F.size(col) == F.size(F.array_distinct(target)))
    if kw in ("allOf", "anyOf", "oneOf"):
        subs = [
            compile_value_pred(s, col, dtype, ctx, path + (kw, i))
            for i, s in enumerate(v)
        ]
        if kw == "allOf":     # validators.rs:866-893
            out = subs[0]
            for s in subs[1:]:
                out = out & s
            return out
        if kw == "anyOf":     # validators.rs:895-919 (codegen short-circuits)
            out = subs[0]
            for s in subs[1:]:
                out = out | s
            return out
        # oneOf: exactly one (validators.rs:921-975). Null-tolerant like
        # every other keyword (module docstring null-collapse policy): for a
        # NULL value each subschema's tolerant predicate is True, so the sum
        # is N and strict `== 1` would falsely flag every NULL row.
        total = subs[0].cast("int")
        for s in subs[1:]:
            total = total + s.cast("int")
        return _tolerant(col, total == 1)
    if kw == "not":
        inner = compile_value_pred(v, col, dtype, ctx, path + ("not",))
        return _tolerant(col, ~inner)                            # validators.rs:977-992
    if kw == "if":
        # siblings then/else read from parent schema (validators.rs:1050-1078)
        if_p = compile_value_pred(v, col, dtype, ctx, path + ("if",))
        then_p = (
            compile_value_pred(spec["then"], col, dtype, ctx, path + ("then",))
            if isinstance(spec.get("then"), (dict,)) or spec.get("then") in (True, False)
            else F.lit(True)
        )
        else_p = (
            compile_value_pred(spec["else"], col, dtype, ctx, path + ("else",))
            if isinstance(spec.get("else"), (dict,)) or spec.get("else") in (True, False)
            else F.lit(True)
        )
        return F.when(if_p, then_p).otherwise(else_p)
    if kw in ("then", "else"):
        return None  # consumed by `if`
    if kw == "propertyNames":
        if isinstance(dtype, T.MapType):
            el = T.StringType()
            return _tolerant(
                col,
                F.forall(
                    F.map_keys(col),
                    lambda k: compile_value_pred(v, k, el, ctx, path + ("propertyNames",)),
                ),
            )
        if isinstance(dtype, T.StructType):
            # nested struct: field NAMES are static, presence is per-row
            # (absent instance property = null field, the struct-collapse
            # convention `required` uses above) — a statically-bad name
            # only violates when that field is PRESENT
            bad = [f.name for f in dtype.fields
                   if not _eval_name_suite(v, f.name, path)]
            if not bad:
                return None
            out = col.getField(bad[0]).isNull()
            for n in bad[1:]:
                out = out & col.getField(n).isNull()
            return _tolerant(col, out)
        return None  # root/row scope handled at bind time
    if kw in ("minProperties", "maxProperties"):
        if isinstance(dtype, T.MapType):
            n = F.size(F.map_keys(col))
            return _tolerant(col, n >= v if kw == "minProperties" else n <= v)
        if isinstance(dtype, T.StructType):
            # present-property count = non-null fields (struct collapse)
            n = None
            for f in dtype.fields:
                c = F.when(col.getField(f.name).isNotNull(), 1).otherwise(0)
                n = c if n is None else n + c
            if n is None:
                n = F.lit(0)
            return _tolerant(col, n >= v if kw == "minProperties" else n <= v)
        return None
    if kw == "patternProperties" and isinstance(dtype, T.MapType):
        # open-keyed object: entries whose key matches the regex must
        # validate against the subschema (validators.rs:92-124 lifted to
        # MapType; regexes compile once at bind, fixing the reference's
        # per-call recompilation)
        vt = dtype.valueType

        # closure factories, NOT default-arg lambdas: PySpark infers HOF
        # arity from the Python signature, so `lambda e, pat=pat` would be
        # bound as a 2-arg (element, index) lambda
        def mk_entry_pred(sub, pat):
            return lambda e: compile_value_pred(
                sub, e["value"], vt, ctx, path + ("patternProperties", pat))

        def mk_key_match(pat):
            return lambda e: e["key"].rlike(pat)

        preds = []
        for pat, sub in v.items():
            preds.append(
                F.forall(F.filter(F.map_entries(col), mk_key_match(pat)),
                         mk_entry_pred(sub, pat)))
        if not preds:
            return None
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return _tolerant(col, out)
    if kw == "additionalProperties" and isinstance(dtype, T.MapType):
        # keys not declared in `properties` nor matching `patternProperties`
        # must satisfy the schema; `false` forbids them
        # (find_additional_properties, validators.rs:184-210)
        declared = list((spec.get("properties") or {}).keys())
        pats = list((spec.get("patternProperties") or {}).keys())

        def unmatched(k):
            cond = ~k.isin(*declared) if declared else F.lit(True)
            for p in pats:
                cond = cond & ~k.rlike(p)
            return cond

        if v is False:
            return _tolerant(
                col, F.size(F.filter(F.map_keys(col), unmatched)) == 0)
        if v is True or v == {}:
            return None
        vt = dtype.valueType

        def entry_pred(e):
            return (~unmatched(e["key"])) | compile_value_pred(
                v, e["value"], vt, ctx, path + ("additionalProperties",))

        return _tolerant(col, F.forall(F.map_entries(col), entry_pred))
    if kw == "patternProperties" and isinstance(dtype, T.StructType):
        # nested struct: route statically by regex over the KNOWN field
        # names (same re.search partial-match semantics as the root binder),
        # then validate each matching field's value (absent = null field =
        # the sub-pred's own tolerance passes it)
        preds = []
        for pat, sub in v.items():
            rx = re.compile(pat)
            for f in dtype.fields:
                if rx.search(f.name):
                    preds.append(compile_value_pred(
                        sub, col.getField(f.name), f.dataType, ctx,
                        path + ("patternProperties", pat, f.name)))
        if not preds:
            return None
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return _tolerant(col, out)
    if kw == "additionalProperties" and isinstance(dtype, T.StructType):
        # fields not declared in `properties` nor matching any
        # patternProperties regex are "additional"; `false` forbids them
        # (= they must be ABSENT, i.e. null under the struct collapse),
        # a schema validates their values (validators.rs:184-210)
        declared = set((spec.get("properties") or {}).keys())
        pats = [re.compile(p) for p in (spec.get("patternProperties") or {})]
        extras = [f for f in dtype.fields
                  if f.name not in declared
                  and not any(rx.search(f.name) for rx in pats)]
        if not extras or v is True or v == {}:
            return None
        if v is False:
            out = col.getField(extras[0].name).isNull()
            for f in extras[1:]:
                out = out & col.getField(f.name).isNull()
            return _tolerant(col, out)
        preds = [compile_value_pred(v, col.getField(f.name), f.dataType, ctx,
                                    path + ("additionalProperties", f.name))
                 for f in extras]
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return _tolerant(col, out)
    if kw == "properties" and isinstance(dtype, T.MapType):
        vt = dtype.valueType
        preds = []
        for name, sub in v.items():
            preds.append(
                compile_value_pred(sub, F.try_element_at(col, F.lit(name)), vt,
                                   ctx, path + ("properties", name)))
        if not preds:
            return None
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return _tolerant(col, out)
    # properties / patternProperties / additionalProperties / required /
    # dependencies at value scope are object-level — handled by the row
    # binder for the root; nested struct columns route through dot paths.
    if kw == "properties" and isinstance(dtype, T.StructType):
        preds = []
        for name, sub in v.items():
            f = next((f for f in dtype.fields if f.name == name), None)
            if f is None:
                continue
            preds.append(
                compile_value_pred(sub, col.getField(name), f.dataType, ctx,
                                   path + ("properties", name))
            )
        if not preds:
            return None
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return _tolerant(col, out)
    if kw == "required" and isinstance(dtype, T.MapType):
        # MapType keeps the JSON absent-vs-null distinction the struct/row
        # collapse loses: presence = key in map (validators.rs:792-818)
        preds = [F.map_contains_key(col, name) for name in v]
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return _tolerant(col, out)
    if kw == "dependencies" and isinstance(dtype, (T.MapType, T.StructType)):
        # dependencies applies at ANY object depth (validators.rs:673-713);
        # property form: trigger present ⇒ all listed keys present;
        # schema form: trigger present ⇒ the object validates the subschema.
        is_map = isinstance(dtype, T.MapType)
        struct_names = (set() if is_map else {f.name for f in dtype.fields})

        def presence(name: str) -> Column:
            if is_map:
                return F.map_contains_key(col, name)
            if name not in struct_names:
                return F.lit(False)  # struct field absent from schema
            return col.getField(name).isNotNull()

        preds = []
        for trig, dep in v.items():
            trig_present = presence(trig)
            if isinstance(dep, list):
                need = F.lit(True)
                for d in dep:
                    need = need & presence(d)
            else:
                need = compile_value_pred(dep, col, dtype, ctx,
                                          path + ("dependencies", trig))
            preds.append(F.when(trig_present, need).otherwise(F.lit(True)))
        if not preds:
            return None
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return _tolerant(col, out)
    if kw == "required" and isinstance(dtype, T.StructType):
        names = set(f.name for f in dtype.fields)
        preds = []
        for name in v:
            if name not in names:
                preds.append(F.lit(False))
            else:
                preds.append(col.getField(name).isNotNull())
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return _tolerant(col, out)
    return None


def _type_pred(v, col: Column, dtype) -> Column:
    """``type`` keyword (validators.rs:731-767).

    With a bound Spark dtype the check mostly resolves statically:
    * declared type compatible with dtype → pass (``integer`` declared on a
      fractional column adds the zero-fraction check, validators.rs:739-748);
    * StringType column with a declared non-string type → dynamic
      ``try_cast`` check (self-describing data);
    * otherwise → constant fail (every row violates, like the reference).
    """
    names = v if isinstance(v, list) else [v]
    if dtype is None:
        return F.lit(True)  # lambda var of unknown type — let other keywords decide
    jt = _json_type_of(dtype)
    alts = []
    for name in names:
        if name == jt:
            alts.append(F.lit(True))
        elif name == "number" and jt == "integer":
            alts.append(F.lit(True))  # every int is a number (validators.rs:735-738)
        elif name == "integer" and isinstance(dtype, _FRACTIONAL):
            alts.append(col == F.floor(col))  # x.0 counts as integer (:739-748)
        elif name == "null":
            alts.append(col.isNull())
        elif isinstance(dtype, T.StringType):
            if name in ("number",):
                alts.append(col.try_cast("double").isNotNull())
            elif name == "integer":
                alts.append(col.try_cast("long").isNotNull())
            elif name == "boolean":
                alts.append(F.lower(col).isin("true", "false"))
        # else: incompatible — contributes no alternative
    if not alts:
        return F.lit(False)
    out = alts[0]
    for a in alts[1:]:
        out = out | a
    return _tolerant(col, out)


_BOUND_ONLY_KEYS = {"type", "minimum", "maximum",
                    "exclusiveMinimum", "exclusiveMaximum"}


def _items_bounds_rewrite(v, col, dtype, draft) -> Optional[Column]:
    """Optimizer rewrite: a single-schema `items` whose subschema is ONLY
    numeric bounds compiles to ``array_min``/``array_max`` comparisons —
    measured 3-7× faster than a per-element ``forall`` lambda at 136M tokens
    (the HOF's per-element closure dispatch never enters the plan; min/max
    run as tight specialized loops in whole-stage codegen).

    Semantics match the forall form: NULL elements are skipped by
    array_min/max (≙ null-tolerant element preds), empty/NULL arrays pass
    via the outer tolerance."""
    if not isinstance(v, dict) or not v or not set(v) <= _BOUND_ONLY_KEYS:
        return None
    el = dtype.elementType if isinstance(dtype, T.ArrayType) else None
    if el is None or not isinstance(el, _INTEGRAL + _FRACTIONAL):
        return None
    if "type" in v:
        names = v["type"] if isinstance(v["type"], list) else [v["type"]]
        jt = _json_type_of(el)
        # only elide the type check when the element type statically
        # satisfies it (integer-declared float arrays still need forall)
        if not all(n == jt or (n == "number" and jt == "integer") for n in names):
            return None
    mn, mx = F.array_min(col), F.array_max(col)
    preds: list[Column] = []
    if "minimum" in v:
        strict = draft == 4 and v.get("exclusiveMinimum") is True
        preds.append(mn > v["minimum"] if strict else mn >= v["minimum"])
    if "maximum" in v:
        strict = draft == 4 and v.get("exclusiveMaximum") is True
        preds.append(mx < v["maximum"] if strict else mx <= v["maximum"])
    if draft != 4:
        if isinstance(v.get("exclusiveMinimum"), (int, float)) and not isinstance(v.get("exclusiveMinimum"), bool):
            preds.append(mn > v["exclusiveMinimum"])
        if isinstance(v.get("exclusiveMaximum"), (int, float)) and not isinstance(v.get("exclusiveMaximum"), bool):
            preds.append(mx < v["exclusiveMaximum"])
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return _tolerant(col, out)


def _items_pred(spec, col, dtype, ctx, path) -> Optional[Column]:
    v = spec["items"]
    el = dtype.elementType if isinstance(dtype, T.ArrayType) else None
    if not isinstance(v, list):
        fast = _items_bounds_rewrite(v, col, dtype, ctx.draft)
        if fast is not None:
            return fast
    if isinstance(v, list):
        # tuple form: positional subschemas zipped with elements
        # (validators.rs:283-290); try_element_at is 1-based, missing → NULL
        # (plain element_at ERRORS under Spark 4 ANSI mode) → null-tolerant
        # child pred passes (positional schema only applies when the element
        # exists)
        preds = []
        for i, sub in enumerate(v):
            e = F.try_element_at(col, F.lit(i + 1))
            p = compile_value_pred(sub, e, el, ctx, path + ("items", i))
            # a MISSING element (null) passes its positional schema even
            # when the sub-pred is statically false (e.g. a type check
            # against a known-other element dtype) — the schema only
            # applies when the element exists (validators.rs:283-290)
            preds.append(F.when(e.isNull(), F.lit(True))
                         .otherwise(F.coalesce(p, F.lit(True))))
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return _tolerant(col, out)
    # single-schema form: every element validates (validators.rs:262-296);
    # compiles to F.forall — NO Python at runtime, the lambda builds a
    # Catalyst HOF expression evaluated JVM-side
    return _tolerant(
        col, F.forall(col, lambda x: compile_value_pred(v, x, el, ctx, path + ("items",)))
    )


def _items_instance_path(check_id: str, v, col, dtype, ctx, path) -> Optional[Column]:
    """Instance path with the FIRST offending array index rendered, e.g.
    ``properties/tokens/items[3]`` (≙ error.rs:29-35: instance paths include
    array indices). Single-schema `items` only; evaluated lazily inside the
    violation branch, so passing rows never pay for it."""
    if not isinstance(v, dict) or not isinstance(dtype, T.ArrayType):
        return None
    el = dtype.elementType
    bools = F.transform(
        col, lambda x: F.coalesce(
            compile_value_pred(v, x, el, ctx, path + ("items",)), F.lit(True)))
    idx = F.array_position(bools, F.lit(False))  # 1-based; 0 = none failing
    return F.when(
        idx > 0,
        F.concat(F.lit(check_id + "["), (idx - 1).cast("string"), F.lit("]")),
    ).otherwise(F.lit(check_id))


def _additional_items_pred(spec, col, dtype, ctx, path) -> Optional[Column]:
    # only applies when sibling `items` is an array (validators.rs:298-337)
    items = spec.get("items")
    if not isinstance(items, list):
        return None
    n = len(items)
    v = spec["additionalItems"]
    if v is False:
        return _tolerant(col, F.size(col) <= n)
    if v is True or v == {}:
        return None
    el = dtype.elementType if isinstance(dtype, T.ArrayType) else None
    tail = F.slice(col, n + 1, F.greatest(F.size(col) - n, F.lit(0)))
    return _tolerant(
        col,
        F.forall(tail, lambda x: compile_value_pred(v, x, el, ctx,
                                                    path + ("additionalItems",))),
    )


# ---------------------------------------------------------------------------
# Expected-text rendering (per-keyword, for the violations DF)
# ---------------------------------------------------------------------------

def _expected_text(kw: str, v: Any, spec: dict, draft: int) -> str:
    if kw == "minimum" and draft == 4 and spec.get("exclusiveMinimum") is True:
        return f"> {v}"
    if kw == "maximum" and draft == 4 and spec.get("exclusiveMaximum") is True:
        return f"< {v}"
    return {
        "type": f"type {v}",
        "enum": f"one of {v}",
        "const": f"const {v}",
        "minimum": f">= {v}",
        "maximum": f"<= {v}",
        "exclusiveMinimum": f"> {v}",
        "exclusiveMaximum": f"< {v}",
        "multipleOf": f"multiple of {v}",
        "minLength": f"length >= {v}",
        "maxLength": f"length <= {v}",
        "pattern": f"matches /{v}/",
        "format": f"format {v}",
        "items": "all items valid",
        "additionalItems": "additional items valid",
        "contains": "contains a valid item",
        "minItems": f"size >= {v}",
        "maxItems": f"size <= {v}",
        "uniqueItems": "all items unique",
        "allOf": "all subsuites hold",
        "anyOf": "any subsuite holds",
        "oneOf": "exactly one subsuite holds",
        "not": "subsuite fails",
        "if": "conditional suite holds",
        "$ref": "referenced suite holds",
        "propertyNames": "all keys valid",
        "minProperties": f">= {v} keys",
        "maxProperties": f"<= {v} keys",
        "properties": "nested properties valid",
        "required": f"fields present: {v}",
    }.get(kw, kw)


# dataset-scope keywords and structural keywords that do not yield a
# standalone per-keyword row check at column scope
_NON_ROW_KEYWORDS = {"then", "else", "$id", "id", "$schema", "version",
                     "description", "title", "default", "definitions", "$defs"}


# ---------------------------------------------------------------------------
# Root (row-level) binding
# ---------------------------------------------------------------------------

def _eval_name_suite(spec: Any, name: str, path: tuple) -> bool:
    """Pure-Python evaluation of a suite node against a COLUMN NAME
    (propertyNames / patternProperties routing at root scope) — compile-time,
    ≙ validators.rs:126-182 but over df.columns instead of object keys."""
    if spec is True or spec == {}:
        return True
    if spec is False:
        return False
    ok = True
    for kw, v in spec.items():
        if kw == "pattern":
            ok = ok and re.search(v, name) is not None
        elif kw == "minLength":
            ok = ok and len(name) >= v
        elif kw == "maxLength":
            ok = ok and len(name) <= v
        elif kw == "enum":
            ok = ok and name in v
        elif kw == "const":
            ok = ok and name == v
        elif kw == "type":
            names = v if isinstance(v, list) else [v]
            ok = ok and "string" in names
        elif kw == "not":
            ok = ok and not _eval_name_suite(v, name, path + ("not",))
        elif kw == "allOf":
            ok = ok and all(_eval_name_suite(s, name, path + (kw, i))
                            for i, s in enumerate(v))
        elif kw == "anyOf":
            ok = ok and any(_eval_name_suite(s, name, path + (kw, i))
                            for i, s in enumerate(v))
        elif kw == "oneOf":
            ok = ok and sum(
                1 for i, s in enumerate(v)
                if _eval_name_suite(s, name, path + (kw, i))) == 1
    return ok


def bind(suite, df: DataFrame) -> BoundPlan:
    """Bind a validated suite to a DataFrame: the compile stage proper.

    Root scope: the suite's `properties` route to df columns (SURVEY.md §1.2
    — one JSON document ↦ one row). Compile-time structural keywords
    (required-presence, additionalProperties, propertyNames,
    min/maxProperties) are enforced here against ``df.columns`` — failures
    raise :class:`SuiteBindError` before any job launches.
    """
    spec = suite.spec
    ctx = _Ctx(suite)
    plan = BoundPlan()
    # root-level $ref: the whole suite delegates to the target
    # (validators.rs:60-63 applies at the root too); same cycle guard
    seen: set[int] = set()
    while isinstance(spec, dict) and "$ref" in spec:
        if id(spec) in seen:
            raise SuiteError("recursive root $ref cycle — not compilable")
        seen.add(id(spec))
        spec = ctx.resolver.resolve(spec["$ref"], scope=spec)
    if spec is True or spec == {}:
        return plan
    if spec is False:
        plan.row_checks.append(
            RowCheck("<root>", F.lit(False), F.lit("row"), "false suite rejects all")
        )
        return plan

    fields = {f.name: f.dataType for f in df.schema.fields}
    declared = set((spec.get("properties") or {}).keys())

    # --- compile-time structural checks over df.columns -------------------
    if spec.get("additionalProperties") is False:
        # strict-schema mode (validators.rs:212-260 lifted to bind time)
        pat_res = [re.compile(p) for p in (spec.get("patternProperties") or {})]
        extra = [
            c for c in fields
            if c not in declared and not any(r.search(c) for r in pat_res)
        ]
        if extra:
            raise SuiteBindError(f"undeclared columns {sorted(extra)} "
                                 "(additionalProperties: false)")
    if "propertyNames" in spec:
        bad = [c for c in fields if not _eval_name_suite(spec["propertyNames"], c, ())]
        if bad:
            raise SuiteBindError(f"column names {bad} violate propertyNames")
    if "minProperties" in spec and len(fields) < spec["minProperties"]:
        raise SuiteBindError(f"{len(fields)} columns < minProperties {spec['minProperties']}")
    if "maxProperties" in spec and len(fields) > spec["maxProperties"]:
        raise SuiteBindError(f"{len(fields)} columns > maxProperties {spec['maxProperties']}")

    # --- required: presence is compile-time, non-nullness is a row check ---
    for name in spec.get("required", []):
        cid = f"required/{name}"
        if name not in fields:
            plan.row_checks.append(
                RowCheck(cid, F.lit(False), F.lit("<absent column>"),
                         f"column {name} present")
            )
        else:
            plan.row_checks.append(
                RowCheck(cid, F.col(name).isNotNull(), F.lit("NULL"),
                         f"{name} is not null")
            )

    # --- properties → per-column, per-keyword row checks + dataset checks --
    def bind_column_suite(colname: str, sub: Any, base: tuple):
        if colname not in fields:
            return  # absent property ⇒ subschema not applied (JSON Schema)
        dtype = fields[colname]
        col = F.col(colname)
        if sub is False:
            plan.row_checks.append(
                RowCheck(_path_id(base), F.lit(False),
                         col.cast("string"), "false suite rejects all"))
            return
        if sub is True or not isinstance(sub, dict):
            return
        # $ref short-circuits siblings (validators.rs:60-63); same cycle
        # guard as value scope (reference TODO resolver.rs:171)
        if "$ref" in sub:
            target = ctx.resolver.resolve(sub["$ref"], scope=sub)
            tid = id(target)
            if tid in ctx.ref_stack:
                raise SuiteError(
                    f"recursive $ref cycle at {_path_id(base)} — not compilable"
                )
            ctx.ref_stack.append(tid)
            try:
                bind_column_suite(colname, target, base + ("$ref",))
            finally:
                ctx.ref_stack.pop()
            return
        for kw in sub:
            p = base + (kw,)
            if kw in registry.DATASET_KEYWORDS:
                _bind_dataset_keyword(plan, kw, sub[kw], colname, col, dtype,
                                      p, fields=fields)
                continue
            if kw in _NON_ROW_KEYWORDS or kw not in ctx.keywords:
                continue
            pred = _compile_keyword(kw, sub, col, dtype, ctx, base)
            if pred is None:
                continue
            expected = _expected_text(kw, sub[kw], sub, ctx.draft)
            if isinstance(sub.get("description"), str):
                # ≙ error.rs:63-68: the keyword's `description` doc is part
                # of the rendered error context
                expected = f"{sub['description']}: {expected}"
            ipath = None
            if kw == "items":
                ipath = _items_instance_path(_path_id(p), sub[kw], col,
                                             dtype, ctx, base)
            plan.row_checks.append(
                RowCheck(_path_id(p), pred, col.cast("string"), expected,
                         instance_path=ipath,
                         schema_json=json.dumps({kw: sub[kw]}, default=str))
            )

    for colname, sub in (spec.get("properties") or {}).items():
        bind_column_suite(colname, sub, ("properties", colname))

    # patternProperties at root: regex-route to matching columns
    # (validators.rs:92-124, recompile-per-call bug fixed by compiling here)
    for pat, sub in (spec.get("patternProperties") or {}).items():
        r = re.compile(pat)
        for colname in fields:
            if r.search(colname):
                bind_column_suite(colname, sub, ("patternProperties", pat, colname))

    # dependencies at root (validators.rs:673-713)
    for trig, dep in (spec.get("dependencies") or {}).items():
        p = ("dependencies", trig)
        if trig not in fields:
            continue  # trigger absent ⇒ vacuous
        trig_col = F.col(trig)
        if isinstance(dep, list):
            missing = [d for d in dep if d not in fields]
            if missing:
                pred = trig_col.isNull()  # trigger present(non-null) ⇒ fail
            else:
                need = F.lit(True)
                for d in dep:
                    need = need & F.col(d).isNotNull()
                pred = F.when(trig_col.isNotNull(), need).otherwise(F.lit(True))
            plan.row_checks.append(
                RowCheck(_path_id(p), pred, trig_col.cast("string"),
                         f"{trig} ⇒ {dep} present"))
        else:
            sub_pred = _row_pred(dep, fields, ctx, p)
            pred = F.when(trig_col.isNotNull(), sub_pred).otherwise(F.lit(True))
            plan.row_checks.append(
                RowCheck(_path_id(p), pred, trig_col.cast("string"),
                         f"{trig} ⇒ dependent suite holds"))

    # root-level composite-key uniqueness (x-unique: [col, ...])
    if isinstance(spec.get("x-unique"), list):
        keys = spec["x-unique"]
        missing = [k for k in keys if k not in fields]
        if missing:
            raise SuiteBindError(f"x-unique composite key columns missing: {missing}")
        plan.dataset_checks.append(
            DatasetCheck("x-unique", "unique", keys, {}))

    # root-level k-anonymity / l-diversity (x-kAnonymity: the quasi
    # identifier is a column LIST, so the check lives at table scope like
    # composite x-unique — privacy release gate, operators/anonymity.py)
    if isinstance(spec.get("x-kAnonymity"), dict):
        v = spec["x-kAnonymity"]
        missing = [c for c in v["quasi"] if c not in fields]
        if missing:
            raise SuiteBindError(f"x-kAnonymity quasi columns missing: {missing}")
        sens = v.get("sensitive")
        if sens and sens not in fields:
            raise SuiteBindError(f"x-kAnonymity sensitive column missing: {sens}")
        plan.dataset_checks.append(
            DatasetCheck("x-kAnonymity", "k_anonymity",
                         list(v["quasi"]), dict(v)))

    # root-level composite-key referential (x-referential with a
    # "columns" LIST — the FK shape where each component may exist
    # individually but the COMBINATION was never registered; no single
    # host column, so table scope like composite x-unique). The engine's
    # referential branch passes the list through unchanged —
    # referential_violations dispatches on it.
    # root-level composite-determinant FD (x-functionalDependency with a
    # "columns" LIST: "(store, sku) determines price" — neither column
    # alone does; same table-scope rule as composite x-unique)
    fv = spec.get("x-functionalDependency")
    if isinstance(fv, dict) and "columns" in fv:
        missing = [c for c in fv["columns"] if c not in fields]
        if missing:
            raise SuiteBindError(
                f"x-functionalDependency determinant columns missing: "
                f"{missing}")
        # dependents are table columns too — a typo here used to surface
        # only as a runtime AnalysisException deep in the aggregate
        det = fv.get("determines", [])
        missing = [c for c in ([det] if isinstance(det, str) else det)
                   if c not in fields]
        if missing:
            raise SuiteBindError(
                f"x-functionalDependency determines columns missing: "
                f"{missing}")
        plan.dataset_checks.append(
            DatasetCheck("x-functionalDependency", "functional_dependency",
                         list(fv["columns"]), dict(fv)))

    rv = spec.get("x-referential")
    if isinstance(rv, dict) and "columns" in rv:
        missing = [c for c in rv["columns"] if c not in fields]
        if missing:
            raise SuiteBindError(
                f"x-referential key columns missing: {missing}")
        params = dict(rv)
        params["domainColumn"] = params.pop("domainColumns", None)
        plan.dataset_checks.append(
            DatasetCheck("x-referential", "referential",
                         list(rv["columns"]), params))

    # root-level combinators over ROW suites (draft-gated like value scope:
    # e.g. draft6 has no if/then/else — schemas.rs:137 vs :69)
    for kw in ("allOf", "anyOf", "oneOf", "not", "if", "x-rowExpr"):
        if kw not in spec:
            continue
        if kw != "x-rowExpr" and kw not in ctx.keywords:
            continue
        p = (kw,)
        if kw == "x-rowExpr":
            plan.row_checks.append(
                RowCheck(_path_id(p), F.expr(spec[kw]), F.lit("row"),
                         f"row satisfies: {spec[kw]}"))
            continue
        if kw == "not":
            pred = ~_row_pred(spec["not"], fields, ctx, p)
        elif kw == "if":
            ifp = _row_pred(spec["if"], fields, ctx, ("if",))
            thenp = _row_pred(spec["then"], fields, ctx, ("then",)) if "then" in spec else F.lit(True)
            elsep = _row_pred(spec["else"], fields, ctx, ("else",)) if "else" in spec else F.lit(True)
            pred = F.when(ifp, thenp).otherwise(elsep)
        else:
            subs = [_row_pred(s, fields, ctx, p + (i,)) for i, s in enumerate(spec[kw])]
            if kw == "allOf":
                pred = subs[0]
                for s in subs[1:]:
                    pred = pred & s
            elif kw == "anyOf":
                pred = subs[0]
                for s in subs[1:]:
                    pred = pred | s
            else:  # oneOf — null-collapse guard mirroring value scope: when
                # every referenced column is NULL each tolerant sub passes
                # (sum == N) and strict `== 1` would flag the row; skip it.
                pred = subs[0].cast("int")
                for s in subs[1:]:
                    pred = pred + s.cast("int")
                pred = pred == 1
                refs = set()
                for s in spec[kw]:
                    refs |= _referenced_columns(s, fields)
                if refs:
                    all_null = F.lit(True)
                    for c in sorted(refs):
                        all_null = all_null & F.col(c).isNull()
                    pred = F.when(all_null, F.lit(True)).otherwise(pred)
        plan.row_checks.append(
            RowCheck(_path_id(p), pred, F.lit("row"), _expected_text(kw, spec[kw], spec, ctx.draft)))

    return plan


def _referenced_columns(node: Any, fields: dict) -> set[str]:
    """Column names a ROW-scope suite node constrains (pure-Python walk) —
    used to give root combinators the same null-collapse semantics as value
    scope: a row whose referenced columns are ALL NULL skips the combinator
    (absent object properties skip keywords, validators.rs null-type guards)."""
    if not isinstance(node, dict):
        return set()
    out: set[str] = set()
    for name in (node.get("properties") or {}):
        if name in fields:
            out.add(name)
    for name in node.get("required", []):
        if name in fields:
            out.add(name)
    for kw in ("allOf", "anyOf", "oneOf"):
        for sub in node.get(kw) or []:
            out |= _referenced_columns(sub, fields)
    if "not" in node:
        out |= _referenced_columns(node["not"], fields)
    for kw in ("if", "then", "else"):
        if isinstance(node.get(kw), dict):
            out |= _referenced_columns(node[kw], fields)
    return out


def _row_pred(node: Any, fields: dict, ctx: _Ctx, path: tuple) -> Column:
    """Reduce a ROW-scope suite node to a single boolean Column (used by
    root combinators / dependencies / if-then-else)."""
    if node is True or node == {}:
        return F.lit(True)
    if node is False:
        return F.lit(False)
    if "$ref" in node:
        return _row_pred(ctx.resolver.resolve(node["$ref"], scope=node),
                         fields, ctx, path)
    preds = []
    for name, sub in (node.get("properties") or {}).items():
        if name not in fields:
            continue
        preds.append(compile_value_pred(sub, F.col(name), fields[name], ctx,
                                        path + ("properties", name)))
    for name in node.get("required", []):
        preds.append(F.col(name).isNotNull() if name in fields else F.lit(False))
    for kw in ("allOf", "anyOf", "oneOf"):
        if kw in node:
            subs = [_row_pred(s, fields, ctx, path + (kw, i))
                    for i, s in enumerate(node[kw])]
            if kw == "allOf":
                p = subs[0]
                for s in subs[1:]:
                    p = p & s
            elif kw == "anyOf":
                p = subs[0]
                for s in subs[1:]:
                    p = p | s
            else:
                p = subs[0].cast("int")
                for s in subs[1:]:
                    p = p + s.cast("int")
                p = p == 1
                # same all-referenced-null skip as the root-scope oneOf
                refs = set()
                for s in node[kw]:
                    refs |= _referenced_columns(s, fields)
                if refs:
                    all_null = F.lit(True)
                    for c in sorted(refs):
                        all_null = all_null & F.col(c).isNull()
                    p = F.when(all_null, F.lit(True)).otherwise(p)
            preds.append(p)
    if "not" in node:
        preds.append(~_row_pred(node["not"], fields, ctx, path + ("not",)))
    if "if" in node and "if" in ctx.keywords:
        # conditional suites nest inside combinators (validators.rs
        # :1050-1078 reads then/else as siblings of if at ANY depth) — an
        # allOf of if/then branches is the standard dispatch-table shape
        # (the self-hosted metaschema is built from exactly that)
        ifp = _row_pred(node["if"], fields, ctx, path + ("if",))
        thenp = (_row_pred(node["then"], fields, ctx, path + ("then",))
                 if "then" in node else F.lit(True))
        elsep = (_row_pred(node["else"], fields, ctx, path + ("else",))
                 if "else" in node else F.lit(True))
        preds.append(F.when(ifp, thenp).otherwise(elsep))
    if "x-rowExpr" in node:
        preds.append(F.expr(node["x-rowExpr"]))
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


# ---------------------------------------------------------------------------
# Dataset-level keyword binding
# ---------------------------------------------------------------------------

def _bind_dataset_keyword(plan: BoundPlan, kw: str, v, colname: str,
                          col: Column, dtype, path: tuple,
                          fields: dict | None = None) -> None:
    cid = _path_id(path)
    a = f"a{len(plan.agg_checks)}_{colname}"[:48]

    if kw == "x-nullRate":
        # lift of `required` to a fraction threshold (BASELINE.json:6)
        alias = a + "_nullrate"
        tau = float(v.get("max", 1.0))
        plan.agg_checks.append(AggCheck(
            check_id=cid,
            aggs={alias: F.avg(col.isNull().cast("double"))},
            passed=lambda alias=alias, tau=tau: F.coalesce(F.col(alias) <= tau, F.lit(True)),
            metric=lambda alias=alias: F.coalesce(F.col(alias), F.lit(0.0)),
            threshold=tau,
        ))
    elif kw == "x-stats":
        stat_fns = {"min": F.min, "max": F.max, "avg": F.avg,
                    "stddev": F.stddev, "sum": F.sum}
        for stat, bounds in v.items():
            alias = f"{a}_{stat}"
            agg = stat_fns[stat](col).cast("double")
            lo = bounds.get("min")
            hi = bounds.get("max")

            def mk_passed(alias=alias, lo=lo, hi=hi):
                c = F.lit(True)
                if lo is not None:
                    c = c & (F.col(alias) >= lo)
                if hi is not None:
                    c = c & (F.col(alias) <= hi)
                return F.coalesce(c, F.lit(True))  # empty partition ⇒ pass

            plan.agg_checks.append(AggCheck(
                check_id=f"{cid}/{stat}",
                aggs={alias: agg},
                passed=mk_passed,
                metric=lambda alias=alias: F.col(alias),
                threshold=float(hi if hi is not None else (lo if lo is not None else 0.0)),
            ))
    elif kw == "x-distinctCount":
        alias = a + "_distinct"
        agg = (F.approx_count_distinct(col) if v.get("approx")
               else F.countDistinct(col)).cast("double")
        lo, hi = v.get("min"), v.get("max")

        def mk_passed(alias=alias, lo=lo, hi=hi):
            c = F.lit(True)
            if lo is not None:
                c = c & (F.col(alias) >= lo)
            if hi is not None:
                c = c & (F.col(alias) <= hi)
            return F.coalesce(c, F.lit(True))

        plan.agg_checks.append(AggCheck(
            check_id=cid, aggs={alias: agg}, passed=mk_passed,
            metric=lambda alias=alias: F.col(alias),
            threshold=float(hi if hi is not None else (lo or 0.0)),
        ))
    elif kw == "x-quantile" and v.get("backend") == "tdigest":
        # opt-in mergeable t-digest backend (operators/tdigest.py): a
        # dataset check because phase 1 is its own mapInPandas pass over
        # the value column; the default percentile_approx stays the fast
        # path inside the fused aggregate
        plan.dataset_checks.append(
            DatasetCheck(cid, "tdigest_quantile", colname, dict(v)))
    elif kw == "x-quantile":
        alias = a + "_q"
        q = float(v["q"])
        agg = F.percentile_approx(col.cast("double"), q,
                                  int(v.get("accuracy", 10000))).cast("double")
        lo, hi = v.get("min"), v.get("max")

        def mk_passed(alias=alias, lo=lo, hi=hi):
            c = F.lit(True)
            if lo is not None:
                c = c & (F.col(alias) >= lo)
            if hi is not None:
                c = c & (F.col(alias) <= hi)
            return F.coalesce(c, F.lit(True))

        plan.agg_checks.append(AggCheck(
            check_id=cid, aggs={alias: agg}, passed=mk_passed,
            metric=lambda alias=alias: F.col(alias),
            threshold=float(hi if hi is not None else (lo or 0.0)),
        ))
    elif kw == "x-unique":
        if isinstance(v, dict) and "withinSeconds" in v:
            # TIME-SCOPED uniqueness: the value may recur, just not
            # within the declared horizon — exact across arbitrary
            # horizons (no bucket-boundary blindness). MUST dispatch
            # before the exact-unique catch-all below.
            plan.dataset_checks.append(DatasetCheck(
                cid, "unique_within", colname, dict(v)))
        elif isinstance(v, dict) and "index" in v:
            # HISTORICAL uniqueness: the batch-internal exact check PLUS
            # a collision probe against a persisted UniqueIndex of all
            # previously ingested values (operators/unique_index.py) —
            # incremental x-unique across appends, never rescanning
            # history. MUST dispatch before the exact catch-all (which
            # would silently drop the index param — the withinSeconds
            # dispatch-bug shape).
            plan.dataset_checks.append(
                DatasetCheck(cid, "unique", colname, dict(v)))
        elif v is True or (isinstance(v, dict) and not v.get("approx")):
            # {'approx': false} means the EXACT check, same as `true` — a
            # declared uniqueness check must never compile to nothing;
            # an optional `where` narrows the uniqueness domain to the
            # rows it governs ("active rows must be unique")
            params = ({"where": v["where"]}
                      if isinstance(v, dict) and v.get("where") else {})
            plan.dataset_checks.append(
                DatasetCheck(cid, "unique", colname, params))
        elif isinstance(v, dict) and v.get("approx"):
            # HLL++ sketch mode: ONE aggregation pass, no key shuffle
            # (operators/uniqueness.py approx_unique_verdict). Trades proof
            # for speed: duplicates below rsd·n can pass — the 10^12-row
            # fast gate; exact mode remains the proof path.
            params = {"approx": True, "rsd": float(v.get("rsd", 0.01))}
            if v.get("where"):
                params["where"] = v["where"]
            plan.dataset_checks.append(
                DatasetCheck(cid, "unique", colname, params))
    elif kw == "x-referential":
        plan.dataset_checks.append(DatasetCheck(cid, "referential", colname, dict(v)))
    elif kw == "x-rowCount":
        # dataset scope: the lift of minItems/maxItems from one row's
        # array length to table/group cardinality — "did the right
        # AMOUNT of rows arrive" is invisible to every row check
        plan.dataset_checks.append(
            DatasetCheck(cid, "row_count", colname, dict(v)))
    elif kw == "x-maxFrequency":
        # dataset scope: the OTHER lift of enum/x-unique — not "may this
        # value appear" but "how often may it" (count per value vs an
        # absolute cap / share of the table); dominance is a property of
        # the value's whole row set, invisible to every row check
        plan.dataset_checks.append(
            DatasetCheck(cid, "max_frequency", colname, dict(v)))
    elif kw == "x-monotonic":
        # dataset scope: each row is bounded by its PREDECESSOR in a
        # declared ordering — inherently relational (window), unlike the
        # literal bounds of minimum/maximum
        plan.dataset_checks.append(
            DatasetCheck(cid, "monotonic", colname, dict(v)))
    elif kw == "x-noOverlap":
        # dataset scope: the two-column sibling of x-monotonic — interval
        # disjointness is an invariant BETWEEN rows (each interval is
        # individually fine; the failure is the pair)
        plan.dataset_checks.append(
            DatasetCheck(cid, "no_overlap", colname, dict(v)))
    elif kw == "x-levelShift":
        # dataset scope: WHERE did the local mean jump — positional
        # change detection that whole-distribution drift statistics
        # dilute and single-row maxStep cannot see through noise
        plan.dataset_checks.append(
            DatasetCheck(cid, "level_shift", colname, dict(v)))
    elif kw == "x-entropy":
        # dataset scope: a bound on the distribution's own CONCENTRATION
        # — baseline-free collapse/uniformity detection that x-drift
        # (which needs a trusted baseline histogram) and per-value row
        # checks cannot express
        plan.dataset_checks.append(
            DatasetCheck(cid, "entropy", colname, dict(v)))
    elif kw == "x-correlation":
        # dataset scope: a relation BETWEEN columns — every other
        # statistical check treats one column at a time; "these two
        # must track" / "this feature must not correlate with time"
        # is invisible to all of them
        plan.dataset_checks.append(
            DatasetCheck(cid, "correlation", colname, dict(v)))
    elif kw == "x-contiguous":
        # dataset scope: an integer sequence column must cover its
        # observed [min..max] with no holes per group — "number 7 is
        # missing" (partial loads, dropped retries), which x-rowCount
        # (how many), x-monotonic (ordered), x-unique (no repeats)
        # cannot express
        plan.dataset_checks.append(
            DatasetCheck(cid, "contiguous", colname, dict(v)))
    elif kw == "x-association":
        # dataset scope: Cramér's V bounds between two CATEGORICAL
        # columns — the categorical sibling of x-correlation (Pearson r
        # is undefined over unordered labels); "these labels must
        # track" / "this label must not predict that one" (leakage)
        plan.dataset_checks.append(
            DatasetCheck(cid, "association", colname, dict(v)))
    elif kw == "x-cohortParity":
        # dataset scope: every cohort's metric within maxGap of a
        # BASELINE cohort's — the A/B-sanity / split-balance / fairness
        # gate: a RELATIVE gap between sibling populations, immune to
        # the global drift that breaks constant-threshold checks
        plan.dataset_checks.append(
            DatasetCheck(cid, "cohort_parity", colname, dict(v)))
    elif kw == "x-reciprocal":
        # dataset scope: pair SYMMETRY — every observed (a, b) must
        # occur reversed as (b, a) (undirected edges stored directed,
        # double-entry mirrors); the invariant lives between a row and
        # a different row with the key columns swapped, which no
        # membership/uniqueness/dependency keyword can see
        plan.dataset_checks.append(
            DatasetCheck(cid, "reciprocal", colname, dict(v)))
    elif kw == "x-acyclic":
        # dataset scope: parent-pointer ancestry — every node's chain
        # must reach a root within maxDepth steps (no cycles, no
        # over-deep chains); x-referential proves the parent EXISTS,
        # x-functionalDependency that it's UNIQUE — neither walks the
        # chain
        plan.dataset_checks.append(
            DatasetCheck(cid, "acyclic", colname, dict(v)))
    elif kw == "x-funnel":
        # dataset scope: step-to-step conversion-rate floors over an
        # ordered event chain — the product-health contract between
        # row-groups that no row/session check can see
        plan.dataset_checks.append(
            DatasetCheck(cid, "funnel", colname, dict(v)))
    elif kw == "x-compliance":
        # dataset scope: the ERROR-BUDGET form of x-rowExpr — x-rowExpr
        # names every violating row and one bad row fails; this bounds
        # the RATE of rows satisfying a predicate (quality gates over
        # known-imperfect feeds)
        plan.dataset_checks.append(
            DatasetCheck(cid, "compliance", colname, dict(v)))
    elif kw == "x-distinctRatio":
        # dataset scope: distinct/count rate bounds — the SOFT form of
        # x-unique exactly as x-nullRate is the soft form of required
        # (fan-out-join multiplication, id-collapse, broken sessionizer)
        plan.dataset_checks.append(
            DatasetCheck(cid, "distinct_ratio", colname, dict(v)))
    elif kw == "x-trend":
        # dataset scope: a bound on the OLS SLOPE of the column vs an
        # ordering — the directional/rate complement of x-correlation
        # (which bounds unitless tightness-of-tracking, not rate) and
        # x-levelShift (one step, not sustained creep)
        plan.dataset_checks.append(
            DatasetCheck(cid, "trend", colname, dict(v)))
    elif kw == "x-seasonality":
        # dataset scope: lag-k AUTOCORRELATION bounds — the
        # self-dependence member of the statistical family (min =
        # rhythm retention, max = independence/stuck-sensor); order
        # is invisible to every distribution check by construction
        plan.dataset_checks.append(
            DatasetCheck(cid, "seasonality", colname, dict(v)))
    elif kw == "x-eventOrder":
        # dataset scope: causality between the MINIMA of two row
        # subsets of a group ("no purchase before signup") — a relation
        # between two conditional aggregates, invisible to row checks
        # and to x-monotonic's single ordered series
        plan.dataset_checks.append(
            DatasetCheck(cid, "event_order", colname, dict(v)))
    elif kw == "x-session":
        # dataset scope: the subject is a GROUP of rows the engine
        # itself derives (gap-framed sessions over the timestamp
        # column) — bounds on session duration/size that no row check
        # and no fixed-group aggregate can express
        plan.dataset_checks.append(
            DatasetCheck(cid, "session", colname, dict(v)))
    elif kw == "x-outlier":
        # dataset scope: the bound is LEARNED from the group's own
        # mean/stddev — minimum/maximum with a data-aware envelope
        # instead of a literal
        plan.dataset_checks.append(
            DatasetCheck(cid, "outlier", colname, dict(v)))
    elif kw == "x-functionalDependency":
        # dataset scope: the lift of `dependencies` from keys within one
        # row to values ACROSS rows — one determinant value must map to
        # one dependent tuple table-wide
        if fields is not None:
            det = v.get("determines", [])
            missing = [c for c in ([det] if isinstance(det, str) else det)
                       if c not in fields]
            if missing:
                raise SuiteBindError(
                    f"{cid}: x-functionalDependency determines columns "
                    f"missing: {missing}")
        plan.dataset_checks.append(
            DatasetCheck(cid, "functional_dependency", colname, dict(v)))
    elif kw == "x-freshness":
        # dataset scope: staleness is the ABSENCE of recent rows — no
        # row-scope check can see it (the bound is on a per-group
        # aggregate of the timestamp column, not on any single row)
        plan.dataset_checks.append(
            DatasetCheck(cid, "freshness", colname, dict(v)))
    elif kw == "x-aggConsistency":
        # dataset scope: the expected value is an aggregate over ANOTHER
        # table — the lift of `const` from a literal to a per-key child
        # aggregate (orders.o_totalprice vs SUM over lineitem)
        plan.dataset_checks.append(
            DatasetCheck(cid, "agg_consistency", colname, dict(v)))
    elif kw == "x-partitionComplete":
        # dataset scope: a missing partition has NO rows for a row check to
        # see — the lift of `required` from object keys to table partitions
        plan.dataset_checks.append(
            DatasetCheck(cid, "partition_complete", colname, dict(v)))
    elif kw == "x-drift":
        plan.dataset_checks.append(DatasetCheck(cid, "drift", colname, dict(v)))
    elif kw == "x-distribution":
        # baseline-FREE goodness-of-fit: x-drift's statistics with the
        # baseline synthesized from a closed-form law (uniform /
        # exponential / normal) on the driver — hash-gate uniformity,
        # Poisson inter-arrivals, residual normality
        plan.dataset_checks.append(
            DatasetCheck(cid, "distribution", colname, dict(v)))
    elif kw == "x-parity":
        params = dict(v)
        params.setdefault("columns", [colname])
        plan.dataset_checks.append(DatasetCheck(cid, "parity", colname, params))
    elif kw == "x-decontamination":
        plan.dataset_checks.append(
            DatasetCheck(cid, "decontamination", colname, dict(v)))
    elif kw == "x-nearDup":
        # near-duplicate membership as a first-class check (lift of
        # x-unique beyond exact equality): dataset scope because every
        # method needs a candidate join + connected components
        plan.dataset_checks.append(
            DatasetCheck(cid, "neardup", colname, dict(v)))
    elif kw == "x-linkage":
        # the multi-FIELD record lift of x-unique/x-nearDup: "no two rows
        # may describe the same ENTITY" — blocked candidate join + weighted
        # field similarity + connected components, never all-pairs
        plan.dataset_checks.append(
            DatasetCheck(cid, "linkage", colname, dict(v)))
    elif kw == "x-lmScore":
        # unigram-LM quality gate (functions/text.py lm_score_violations):
        # dataset scope because the score joins against a trained vocab
        # dimension (context "@model" or self-trained at vocabSize)
        plan.dataset_checks.append(
            DatasetCheck(cid, "lm_score", colname, dict(v)))
    elif kw == "x-blocklist":
        # ROW-scope safety filter: rides the fused row projection (zero
        # extra scans/shuffles), null-tolerant like every value check
        from jsonschema_valid_spark.functions.text import blocklist_hits

        terms = list(v["terms"])
        max_hits = int(v.get("maxHits", 0))
        hits = blocklist_hits(col, terms)
        plan.row_checks.append(RowCheck(
            cid,
            F.coalesce(hits <= max_hits, F.lit(True)),
            hits.cast("string"),
            f"at most {max_hits} blocklist term(s) of {sorted(terms)}",
        ))
    elif kw == "x-tokenShape":
        # ROW-scope token-array structure: a pre-tokenized training
        # sequence must carry its special tokens where the trainer
        # expects them — BOS prefix, EOS suffix, no forbidden ids,
        # padding only as a trailing run. `items` tuple form can pin a
        # PREFIX but nothing anchored to the END of a variable-length
        # array; this keyword closes that gap. Rides the fused row
        # projection (zero extra scans/shuffles); every predicate is a
        # native Catalyst array expression over ONE cast of the column.
        arr = col.cast("array<bigint>")
        prefix = [int(t) for t in v.get("startsWith", [])]
        suffix = [int(t) for t in v.get("endsWith", [])]
        forbidden = [int(t) for t in v.get("forbidden", [])]
        pad = v.get("pad")
        conds, desc, witness = [], [], []
        if prefix:
            want = F.array(*[F.lit(t).cast("bigint") for t in prefix])
            okp = F.slice(arr, 1, len(prefix)) == want
            conds.append(okp)
            desc.append(f"startsWith={prefix}")
            witness.append(F.when(~okp, F.lit("badPrefix")))
        if suffix:
            k = len(suffix)
            want = F.array(*[F.lit(t).cast("bigint") for t in suffix])
            # clamp start to 1 so short arrays yield a (mismatching)
            # short slice instead of an ANSI slice error
            start = F.greatest(F.size(arr) - F.lit(k - 1), F.lit(1))
            oks = F.slice(arr, start, k) == want
            conds.append(oks)
            desc.append(f"endsWith={suffix}")
            witness.append(F.when(~oks, F.lit("badSuffix")))
        if forbidden:
            bad = F.array(*[F.lit(t).cast("bigint") for t in forbidden])
            hit = F.arrays_overlap(arr, bad)
            first_bad = F.try_element_at(
                F.filter(arr, lambda x: F.array_contains(bad, x)),
                F.lit(1))
            conds.append(~hit)
            desc.append(f"no forbidden {sorted(forbidden)}")
            witness.append(F.when(hit, F.concat(
                F.lit("forbidden="), first_bad.cast("string"))))
        if pad is not None:
            padl = F.lit(int(pad)).cast("bigint")
            pos = F.array_position(arr, padl).cast("int")
            # CaseWhen evaluates lazily: the slice only runs when a pad
            # exists (pos >= 1), so start/length stay ANSI-valid
            tail_ok = F.when(
                pos > 0,
                F.forall(
                    F.slice(arr, pos, F.size(arr) - pos + F.lit(1)),
                    lambda x: x == padl),
            ).otherwise(F.lit(True))
            conds.append(tail_ok)
            desc.append(f"pad {int(pad)} trailing-only")
            witness.append(F.when(~tail_ok, F.lit("interiorPad")))
        pred = conds[0] if conds else F.lit(True)
        for c in conds[1:]:
            pred = pred & c
        plan.row_checks.append(RowCheck(
            cid,
            F.coalesce(pred, F.lit(True)),
            F.concat_ws(",", *witness),
            "tokenShape: " + ", ".join(desc),
        ))
    elif kw == "x-jsonWellFormed":
        # ROW-scope JSON validity of a string metadata column (the
        # `props` shape every event/doc pipeline drags along): a row
        # fails when its non-NULL string does not parse as JSON. Rides
        # the fused row projection via Catalyst's variant parser
        # (try_parse_json — JVM-side, NULL on malformed). Known
        # divergence vs DuckDB's json_valid oracle: non-standard NaN /
        # Infinity literals (DuckDB permissive, Spark strict) — absent
        # from the test corpus, documented here like the format:date
        # checker deviations.
        s = col.cast("string")
        okj = s.isNull() | F.try_parse_json(s).isNotNull()
        plan.row_checks.append(RowCheck(
            cid,
            F.coalesce(okj, F.lit(True)),
            F.substring(s, 1, 40),
            "well-formed JSON",
        ))
    elif kw == "x-vector":
        # ROW-scope embedding-column validation: width, finiteness
        # (NaN/±Inf), unit-L2-norm within tolerance — the checks a
        # training pipeline needs before embeddings feed ANN/dedup
        # (functions/similarity.py assumes finite fixed-width vectors).
        # Rides the fused row projection: all three are native HOF
        # predicates over ONE cast of the array column, zero extra scans.
        vv = col.cast("array<double>")
        dim = v.get("dim")
        finite = bool(v.get("finite", True))
        unit = bool(v.get("unit", False))
        tol = float(v.get("tol", 1e-3))
        nonfinite = F.exists(
            vv, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf"))))
        nrm = F.sqrt(F.aggregate(vv, F.lit(0.0),
                                 lambda acc, x: acc + x * x))
        conds, desc, witness = [], [], []
        if dim is not None:
            conds.append(F.size(vv) == int(dim))
            desc.append(f"dim={int(dim)}")
            witness.append(F.when(F.size(vv) != int(dim),
                                  F.concat(F.lit("dim="),
                                           F.size(vv).cast("string"))))
        if finite:
            conds.append(~nonfinite)
            desc.append("finite")
            witness.append(F.when(nonfinite, F.lit("nonfinite")))
        if unit:
            conds.append(F.abs(nrm - 1.0) <= tol)
            desc.append(f"|l2norm-1|<={tol}")
            # norm witness only for FINITE vectors: NaN float→string
            # rendering differs across engines, and 'nonfinite' already
            # names the root cause on those rows
            witness.append(F.when(
                (~nonfinite) & (F.abs(nrm - 1.0) > tol),
                F.concat(F.lit("norm="), F.round(nrm, 4).cast("string"))))
        pred = conds[0] if conds else F.lit(True)
        for c in conds[1:]:
            pred = pred & c
        plan.row_checks.append(RowCheck(
            cid,
            F.coalesce(pred, F.lit(True)),
            F.concat_ws(",", *witness) if witness else F.lit(""),
            "vector: " + ", ".join(desc),
        ))
