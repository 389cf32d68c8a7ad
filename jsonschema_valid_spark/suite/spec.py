"""CheckSuite spec: validation, ``$ref`` resolution, and the public facade.

Reference lifecycle being mirrored (see SURVEY.md §3):

* ``Config::from_schema`` (``/root/reference/src/config.rs:55-67``) — draft
  resolution + resolver construction → here ``CheckSuite.__init__``.
* ``Config::validate_schema`` (``config.rs:75-90``) — the schema is validated
  against a compiled-in metaschema before use → here ``validate_suite_spec``
  (pure driver-side Python; no Spark job launched for an invalid suite).
* ``Resolver`` (``resolver.rs:32-94``) — one planning walk collecting every
  ``$id``-bearing fragment into a url→fragment map; ``$ref`` resolution joins
  the ref against the ``$id`` scope. The reference leaves infinite-recursion
  detection as a TODO (``resolver.rs:171``); we implement the cycle guard.
"""

from __future__ import annotations

import json
import hashlib
from typing import Any

from jsonschema_valid_spark.suite import registry


class SuiteError(ValueError):
    """The suite spec itself is invalid (≙ schema failing metaschema
    validation, ``config.rs:75-90``)."""


class SuiteBindError(ValueError):
    """The suite is valid but cannot bind to the given DataFrame schema
    (e.g. a declared property column is missing, or a declared JSON type is
    incompatible with the column's Spark type)."""


_JSON_TYPES = {"null", "boolean", "number", "integer", "string", "array", "object"}


# ---------------------------------------------------------------------------
# Suite metaschema validation (driver-side, pure Python)
# ---------------------------------------------------------------------------

def _err(path: tuple, msg: str) -> SuiteError:
    p = "/".join(str(x) for x in path) or "<root>"
    return SuiteError(f"invalid suite at {p}: {msg}")


def _check_number(path, kw, v):
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise _err(path, f"{kw} must be a number, got {type(v).__name__}")


def _check_nonneg_int(path, kw, v):
    if isinstance(v, bool) or not isinstance(v, int) or v < 0:
        raise _err(path, f"{kw} must be a non-negative integer, got {v!r}")


# dataset keywords whose engine execution routes through the `_scoped`
# hook in BOTH run paths (violations + perGroup verdicts) — the only
# ones allowed to carry a `where` subpopulation scope
_WHERE_SCOPED_KEYWORDS = frozenset({
    "x-unique", "x-referential",
    "x-compliance", "x-distinctRatio", "x-trend", "x-seasonality",
    "x-contiguous", "x-association", "x-entropy", "x-reciprocal",
    "x-cohortParity", "x-acyclic", "x-correlation",
    "x-freshness", "x-rowCount",
    "x-decontamination", "x-maxFrequency", "x-monotonic",
    "x-noOverlap", "x-levelShift", "x-funnel", "x-eventOrder",
    "x-session", "x-outlier", "x-functionalDependency", "x-kAnonymity",
    "x-drift", "x-distribution", "x-lmScore", "x-nearDup", "x-linkage",
    "x-quantile",  # tdigest backend only — the fused default cannot scope
})


def validate_suite_spec(spec: Any, draft: int | None = None, path: tuple = ()) -> None:
    """Validate a suite node recursively (≙ metaschema validation,
    ``config.rs:75-90``). Raises :class:`SuiteError` on the first problem —
    matching the reference's peek-first-error contract (``lib.rs:95-101``).

    A suite node is either a ``bool`` (``true`` = accept-all, ``false`` =
    reject-all; ``validators.rs:51-58``) or a dict of keyword→argument.
    Unknown keywords are permitted and ignored (``validators.rs:75-78``).
    """
    if isinstance(spec, bool):
        return
    if not isinstance(spec, dict):
        raise _err(path, f"suite node must be bool or object, got {type(spec).__name__}")
    if draft is None:
        draft = registry.resolve_draft(spec)

    for kw, v in spec.items():
        p = path + (kw,)
        if kw.startswith("x-") and isinstance(v, dict) and "where" in v:
            # central `where` rule: a dataset keyword either supports
            # Deequ-style subpopulation scoping through the engine's
            # _scoped hook, or the key is REFUSED — an accepted-but-
            # ignored scope is the worst outcome (the user believes the
            # check is narrowed when it is not)
            if kw not in _WHERE_SCOPED_KEYWORDS:
                raise _err(p, f"{kw} does not support 'where' scoping "
                              "(supported: "
                              f"{', '.join(sorted(_WHERE_SCOPED_KEYWORDS))})")
            if not (isinstance(v["where"], str) and v["where"]):
                raise _err(p, f"{kw} 'where' must be a non-empty SQL "
                              "boolean string")
            if kw == "x-quantile" and v.get("backend") != "tdigest":
                raise _err(p, "x-quantile 'where' requires the tdigest "
                              "backend — the fused percentile_approx "
                              "path rides the shared aggregate pass and "
                              "cannot scope (an accepted-but-ignored "
                              "scope would be worse than a refusal)")
        if kw == "type":
            names = v if isinstance(v, list) else [v]
            if not names:
                raise _err(p, "type list must be non-empty")
            for n in names:
                if n not in _JSON_TYPES:
                    raise _err(p, f"unknown type {n!r}")
        elif kw == "enum":
            if not isinstance(v, list) or not v:
                raise _err(p, "enum must be a non-empty list")
        elif kw in ("minimum", "maximum", "multipleOf"):
            _check_number(p, kw, v)
            if kw == "multipleOf" and v <= 0:
                raise _err(p, "multipleOf must be > 0")
        elif kw in ("exclusiveMinimum", "exclusiveMaximum"):
            # draft4: boolean modifier sibling of minimum/maximum
            # (validators.rs:416-445); draft6+: standalone number.
            if draft == 4:
                if not isinstance(v, bool):
                    raise _err(p, "draft4 exclusiveMinimum/Maximum must be boolean")
                # NO sibling-bound requirement: in the reference the flag is
                # read BY the minimum/maximum validator (validators.rs:
                # 416-445) and draft4's table registers no standalone
                # exclusive validator (schemas.rs:201-230) — so a lone
                # boolean exclusiveMinimum is simply inert, not an error
                # (r4: was wrongly rejected; VERDICT r3 item 7 edge)
            else:
                _check_number(p, kw, v)
        elif kw in ("minLength", "maxLength", "minItems", "maxItems",
                    "minProperties", "maxProperties"):
            _check_nonneg_int(p, kw, v)
        elif kw == "pattern":
            if not isinstance(v, str):
                raise _err(p, "pattern must be a string")
            # compile-time regex validity check — the analog of the
            # reference's runtime invalid-regex error (validators.rs:609-611),
            # hoisted to the driver so no job launches with a bad pattern.
            import re

            try:
                re.compile(v)
            except re.error as e:
                raise _err(p, f"invalid regex: {e}")
        elif kw == "format":
            if not isinstance(v, str):
                raise _err(p, "format must be a string")
            # unknown formats are allowed and pass (validators.rs:624)
        elif kw == "items":
            if isinstance(v, list):
                for i, sub in enumerate(v):
                    validate_suite_spec(sub, draft, p + (i,))
            else:
                validate_suite_spec(v, draft, p)
        elif kw in ("additionalItems", "additionalProperties", "propertyNames",
                    "contains", "not", "if", "then", "else"):
            validate_suite_spec(v, draft, p)
        elif kw == "uniqueItems":
            if not isinstance(v, bool):
                raise _err(p, "uniqueItems must be boolean")
        elif kw in ("properties", "patternProperties"):
            if not isinstance(v, dict):
                raise _err(p, f"{kw} must be an object")
            for name, sub in v.items():
                validate_suite_spec(sub, draft, p + (name,))
        elif kw == "required":
            if not isinstance(v, list) or not all(isinstance(x, str) for x in v):
                raise _err(p, "required must be a list of strings")
        elif kw == "dependencies":
            if not isinstance(v, dict):
                raise _err(p, "dependencies must be an object")
            for name, dep in v.items():
                if isinstance(dep, list):
                    if not all(isinstance(x, str) for x in dep):
                        raise _err(p + (name,), "property dependency must list strings")
                else:
                    validate_suite_spec(dep, draft, p + (name,))
        elif kw in ("allOf", "anyOf", "oneOf"):
            if not isinstance(v, list) or not v:
                raise _err(p, f"{kw} must be a non-empty list")
            for i, sub in enumerate(v):
                validate_suite_spec(sub, draft, p + (i,))
        elif kw == "$ref":
            if not isinstance(v, str):
                raise _err(p, "$ref must be a string")
        elif kw == "x-nullRate":
            if not isinstance(v, dict) or not ("max" in v or "min" in v):
                raise _err(p, "x-nullRate must be {'max': τ} and/or {'min': τ}")
        elif kw == "x-unique":
            # ("where" value validity is the central rule's job above)
            within_ok = (
                isinstance(v, dict) and "withinSeconds" in v
                and isinstance(v["withinSeconds"], (int, float))
                and not isinstance(v["withinSeconds"], bool)
                and v["withinSeconds"] > 0
                and isinstance(v.get("ts"), str) and v["ts"]
                and ("by" not in v or isinstance(v["by"], str))
                and "approx" not in v and "index" not in v
                and "inline" not in v)
            scoped_exact_ok = (
                isinstance(v, dict) and set(v) == {"where"})
            index_ok = (
                isinstance(v, dict) and isinstance(v.get("index"), str)
                and v["index"].startswith("@")
                and set(v) <= {"index", "where", "inline"}
                and isinstance(v.get("inline", False), bool))
            if not (isinstance(v, bool)
                    or within_ok
                    or scoped_exact_ok
                    or index_ok
                    or (isinstance(v, dict) and "approx" in v
                        and "withinSeconds" not in v
                        and "index" not in v
                        and "inline" not in v)
                    or (isinstance(v, list) and v
                        and all(isinstance(x, str) for x in v))):
                raise _err(p, "x-unique must be boolean (column scope), "
                              "{'approx': true, 'rsd'?: e} (HLL sketch mode), "
                              "{'withinSeconds': W>0, 'ts': col, 'by'?: col} "
                              "(time-scoped), {'where': sql-bool} (scoped "
                              "exact), {'index': '@name', 'inline'?: bool} "
                              "(historical UniqueIndex probe), or a list of "
                              "columns (root scope, composite key); dict "
                              "forms accept 'where'")
        elif kw == "x-referential":
            if not isinstance(v, dict) or "domain" not in v:
                raise _err(p, "x-referential must be {'domain': <table|list>, ...}")
            if "coverageMin" in v:
                cm = v["coverageMin"]
                if (not isinstance(cm, (int, float))
                        or isinstance(cm, bool) or not 0 < cm <= 1):
                    raise _err(p, "x-referential coverageMin must be a "
                                  "number in (0, 1]")
                if (v.get("inline") or v.get("mode", "exact") != "exact"
                        or "columns" in v):
                    raise _err(p, "x-referential coverageMin needs the "
                                  "exact broadcast path on a single column "
                                  "(no inline/bloom/composite — inline "
                                  "rides the row pass and a bloom filter "
                                  "cannot enumerate domain members)")
            if "columns" in v:
                # composite-key form: a column LIST has no host property,
                # so it is root-scope (the composite x-unique rule), and
                # the tuple-blind single-value modes are refused
                if len(p) > 1:
                    raise _err(p, "composite x-referential ('columns') is "
                                  "a root-scope keyword")
                cols = v["columns"]
                dcols = v.get("domainColumns")
                ok = (isinstance(cols, list) and len(cols) >= 2
                      and all(isinstance(c, str) and c for c in cols)
                      and (dcols is None
                           or (isinstance(dcols, list)
                               and len(dcols) == len(cols)
                               and all(isinstance(c, str) and c
                                       for c in dcols)))
                      and "domainColumn" not in v
                      and not v.get("inline")
                      and v.get("mode", "exact") == "exact")
                if not ok:
                    raise _err(p, "composite x-referential must be "
                                  "{'columns': [>=2 cols], 'domain': …, "
                                  "'domainColumns'?: [same arity], "
                                  "'where'?: sql-bool} — exact mode only "
                                  "(bloom/inline carry single values)")
        elif kw == "x-stats":
            if not isinstance(v, dict):
                raise _err(p, "x-stats must be an object of stat→bounds")
            for stat in v:
                if stat not in ("min", "max", "avg", "stddev", "sum"):
                    raise _err(p + (stat,), f"unknown stat {stat!r}")
        elif kw == "x-distinctCount":
            if not isinstance(v, dict):
                raise _err(p, "x-distinctCount must be {'min'|'max': n, 'approx': bool}")
        elif kw == "x-quantile":
            if not isinstance(v, dict) or "q" not in v:
                raise _err(p, "x-quantile must be {'q': p, 'min'|'max': bound}")
            if "backend" in v and v["backend"] != "tdigest":
                raise _err(p, "x-quantile backend must be 'tdigest' "
                              "(omit for the fused percentile_approx path)")
            if "delta" in v and not (isinstance(v["delta"], int)
                                     and not isinstance(v["delta"], bool)
                                     and v["delta"] >= 10):
                raise _err(p, "x-quantile delta must be an int ≥ 10")
        elif kw == "x-drift":
            if not isinstance(v, dict) or "baseline" not in v:
                raise _err(p, "x-drift must be {'baseline': hist, 'psiMax'|'ksMax': τ, ...}")
            if "cells" in v and not isinstance(v["cells"], dict):
                raise _err(p, "x-drift cells must be an object "
                              "({'nCells'?, 'seed'?, 'dim'?, 'centroids'?})")
            if "categorical" in v:
                if not isinstance(v["categorical"], bool):
                    raise _err(p, "x-drift categorical must be a bool")
                if v["categorical"] and ("ksMax" in v or "emdMax" in v):
                    raise _err(p, "x-drift categorical mode: categories "
                                  "are unordered — ksMax/emdMax invalid "
                                  "(use psiMax/chi2Max)")
                if v["categorical"] and "cells" in v:
                    raise _err(p, "x-drift: categorical and cells are "
                                  "mutually exclusive")
            if "edges" in v:
                es = v["edges"]
                ok = (isinstance(es, list) and es
                      and all(isinstance(e, (int, float))
                              and not isinstance(e, bool) for e in es)
                      and all(es[i] < es[i + 1]
                              for i in range(len(es) - 1)))
                if not ok:
                    raise _err(p, "x-drift edges must be a non-empty "
                                  "strictly increasing number list")
                if v.get("categorical") or "cells" in v:
                    raise _err(p, "x-drift: edges is exclusive with "
                                  "categorical/cells")
                if "bucketWidth" in v:
                    raise _err(p, "x-drift: edges replaces bucketWidth")
                if "emdMax" in v:
                    raise _err(p, "x-drift edges mode: bucket widths are "
                                  "irregular — emdMax invalid (use "
                                  "psiMax/ksMax/chi2Max/klMax/jsdMax)")
            if "joint" in v:
                j = v["joint"]

                def _dim_ok(i, d):
                    if not isinstance(d, dict) or set(d) - {"column",
                                                            "bucketWidth"}:
                        return False
                    if "column" in d and not (isinstance(d["column"], str)
                                              and d["column"]):
                        return False
                    if "column" not in d and i > 0:
                        return False
                    if "bucketWidth" in d:
                        w = d["bucketWidth"]
                        if (not isinstance(w, (int, float))
                                or isinstance(w, bool) or w <= 0):
                            return False
                    return True
                if not (isinstance(j, list) and len(j) >= 2
                        and all(_dim_ok(i, d) for i, d in enumerate(j))):
                    raise _err(p, "x-drift joint must be a list of ≥2 dims "
                                  "({'column'?: str, 'bucketWidth'?: num>0};"
                                  " only the first dim may omit column)")
                if (v.get("categorical") or "cells" in v or "edges" in v
                        or "bucketWidth" in v):
                    raise _err(p, "x-drift: joint is exclusive with "
                                  "categorical/cells/edges/bucketWidth")
                if "ksMax" in v or "emdMax" in v:
                    raise _err(p, "x-drift joint mode: composite cells are "
                                  "unordered — ksMax/emdMax invalid (use "
                                  "psiMax/chi2Max/klMax/jsdMax)")
        elif kw == "x-linkage":
            def _lnum(x):
                return (isinstance(x, (int, float))
                        and not isinstance(x, bool))

            def _field_ok(f):
                return (isinstance(f, dict)
                        and isinstance(f.get("column"), str) and f["column"]
                        and f.get("method") in ("exact", "levenshtein",
                                                "jaccard")
                        and ("weight" not in f
                             or (_lnum(f["weight"]) and f["weight"] > 0)))
            blk = v.get("blockOn") if isinstance(v, dict) else None
            blk_ok = (isinstance(blk, str) and blk) or (
                isinstance(blk, list) and blk
                and all(isinstance(x, str) and x for x in blk))
            ok = (isinstance(v, dict)
                  and blk_ok
                  and isinstance(v.get("fields"), list) and v["fields"]
                  and all(_field_ok(f) for f in v["fields"])
                  and _lnum(v.get("threshold"))
                  and 0 < v["threshold"] <= 1
                  and ("maxBlock" not in v
                       or (isinstance(v["maxBlock"], int)
                           and not isinstance(v["maxBlock"], bool)
                           and v["maxBlock"] >= 2))
                  and v.get("onOversize", "error") in ("error", "skip"))
            if not ok:
                raise _err(p, "x-linkage must be {'blockOn': expr | [expr,"
                              " ...], 'fields': [{'column', 'method': "
                              "'exact'|'levenshtein'|'jaccard', "
                              "'weight'?>0}, ...], 'threshold': 0<t<=1, "
                              "'maxBlock'?: int>=2, 'onOversize'?: "
                              "'error'|'skip'}")
        elif kw == "x-distribution":
            def _dnum(x):
                return isinstance(x, (int, float)) \
                    and not isinstance(x, bool)
            fam = v.get("family") if isinstance(v, dict) else None
            fam_req = {"uniform": ("min", "max"),
                       "exponential": ("rate",),
                       "normal": ("mean", "std"),
                       "benford": ()}
            stat_keys = {"psiMax", "ksMax", "chi2Max", "emdMax",
                         "klMax", "jsdMax"}
            ok = (isinstance(v, dict)
                  and fam in fam_req
                  and all(kk in v and _dnum(v[kk]) for kk in fam_req[fam])
                  and any(kk in v for kk in stat_keys)
                  and all(_dnum(v[kk]) for kk in stat_keys if kk in v)
                  and ("bucketWidth" not in v
                       or (fam != "benford"
                           and _dnum(v["bucketWidth"])
                           and v["bucketWidth"] > 0))
                  and ("shift" not in v or _dnum(v["shift"])))
            if not ok:
                raise _err(p, "x-distribution must be {'family': 'uniform'"
                              " (min, max) | 'exponential' (rate, shift?) |"
                              " 'normal' (mean, std) | 'benford' (first "
                              "significant digit; no bucketWidth), "
                              "'bucketWidth'?: n>0, and at least one of "
                              "psiMax/ksMax/chi2Max/emdMax/klMax/jsdMax}")
        elif kw == "x-rowExpr":
            if not isinstance(v, str):
                raise _err(p, "x-rowExpr must be a SQL boolean expression string")
            # parse eagerly so a malformed expression fails suite validation
            # (the analog of the compile-time regex check for `pattern`) —
            # no Spark JOB launches, but expression parsing needs the JVM;
            # skip silently when no session exists yet (bind() will parse).
            try:
                from pyspark.errors import ParseException
                from pyspark.sql import SparkSession

                s = SparkSession.getActiveSession()
                if s is not None and getattr(s, "_jsparkSession", None) is not None:
                    # F.expr() is lazy in Spark 4 — drive the Catalyst
                    # parser directly so the syntax error surfaces here
                    s._jsparkSession.sessionState().sqlParser(
                        ).parseExpression(v)
            except ParseException as e:
                raise _err(p, f"invalid SQL expression: {e}")
            except Exception:
                # environment failures (Spark Connect sessions without a
                # JVM handle, Py4J hiccups) are NOT invalid expressions —
                # skip the eager check; bind() will surface real errors
                pass
        elif kw == "x-parity":
            if not isinstance(v, dict) or "reference" not in v:
                raise _err(p, "x-parity must be {'reference': '@name', 'key': k?, 'mode': 'native'|'arrow'?}")
        elif kw == "x-decontamination":
            ok = (isinstance(v, dict) and "benchmark" in v
                  and v.get("method", "ngram") in ("ngram", "fuzzy",
                                                   "semantic"))
            if not ok:
                raise _err(p, "x-decontamination must be {'benchmark': "
                              "'@name', 'method'?: 'ngram' | 'fuzzy' | "
                              "'semantic', 'n'?: int, 'maxRatio'?: float "
                              "(ngram), 'threshold'?: float, 'numPerm'/"
                              "'bands'/'seed'? (fuzzy), 'dim'/'nCells'/"
                              "'nAssign'/'centroids'? (semantic), "
                              "'benchTextColumn'/'benchVecColumn'?: str}")
        elif kw == "x-blocklist":
            if not (isinstance(v, dict) and isinstance(v.get("terms"), list)
                    and v["terms"]
                    and all(isinstance(t, str) for t in v["terms"])):
                raise _err(p, "x-blocklist must be {'terms': [str, ...], "
                              "'maxHits'?: int}")
        elif kw == "x-lmScore":
            if not (isinstance(v, dict)
                    and isinstance(v.get("minScore"), (int, float))
                    and not isinstance(v.get("minScore"), bool)):
                raise _err(p, "x-lmScore must be {'minScore': number, "
                              "'model'?: '@name', 'vocabSize'?: int, "
                              "'alpha'?: number}")
        elif kw == "x-rowCount":
            def _cnt(x):
                return (isinstance(x, int) and not isinstance(x, bool)
                        and x >= 0)
            ok = (isinstance(v, dict)
                  and set(v) <= {"min", "max", "scope", "verdicts",
                                 "where"}
                  and ("min" in v or "max" in v)
                  and all(_cnt(v[kk]) for kk in ("min", "max") if kk in v)
                  and v.get("scope", "group") in ("group", "table")
                  and ("verdicts" not in v
                       or (v["verdicts"] == "perGroup"
                           and v.get("scope", "group") == "group")))
            if not ok:
                raise _err(p, "x-rowCount must be {'min'?: int>=0, "
                              "'max'?: int>=0, 'scope'?: 'group' | "
                              "'table', 'verdicts'?: 'perGroup' (group "
                              "scope only)} with at least one bound")
        elif kw == "x-maxFrequency":
            def _posint(x):
                return (isinstance(x, int) and not isinstance(x, bool)
                        and x >= 1)
            mf = v.get("maxFraction") if isinstance(v, dict) else None
            ok = (isinstance(v, dict)
                  and set(v) <= {"maxFraction", "maxCount", "mode", "k",
                                 "by", "verdicts", "where"}
                  and ("maxFraction" in v or "maxCount" in v)
                  and ("by" not in v
                       or (isinstance(v["by"], str) and v["by"]
                           and v.get("mode", "exact") == "exact"))
                  and ("verdicts" not in v
                       or (v["verdicts"] == "perGroup" and "by" in v))
                  and (mf is None
                       or (isinstance(mf, (int, float))
                           and not isinstance(mf, bool) and 0 < mf <= 1))
                  and ("maxCount" not in v or _posint(v["maxCount"]))
                  and v.get("mode", "exact") in ("exact", "sketch")
                  and ("k" not in v
                       or (isinstance(v["k"], int)
                           and not isinstance(v["k"], bool) and v["k"] >= 2))
                  # sketch sizing needs a fraction threshold unless the
                  # caller sizes k explicitly (slack = total/(k+1))
                  and (v.get("mode") != "sketch"
                       or "maxFraction" in v or "k" in v))
            if not ok:
                raise _err(p, "x-maxFrequency must be {'maxFraction'?: "
                              "0<f<=1, 'maxCount'?: int>=1, 'mode'?: "
                              "'exact' | 'sketch', 'k'?: int>=2, "
                              "'by'?: col (exact mode only), 'verdicts'?: "
                              "'perGroup' (requires 'by')} with at "
                              "least one bound (sketch mode needs "
                              "maxFraction or an explicit k)")
        elif kw == "x-monotonic":
            def _num(x):
                return isinstance(x, (int, float)) \
                    and not isinstance(x, bool)
            ok = (isinstance(v, dict)
                  and isinstance(v.get("allowGlobal", False), bool)
                  and isinstance(v.get("orderBy"), str) and v["orderBy"]
                  and v.get("direction", "nonDecreasing") in (
                      "nonDecreasing", "increasing",
                      "nonIncreasing", "decreasing")
                  and all(_num(v[kk])
                          for kk in ("maxStep", "minStep") if kk in v)
                  and ("verdicts" not in v
                       or (v["verdicts"] == "perGroup"
                           and isinstance(v.get("by"), str))))
            if not ok:
                raise _err(p, "x-monotonic must be {'orderBy': col, "
                              "'by'?: col, 'direction'?: 'nonDecreasing' | "
                              "'increasing' | 'nonIncreasing' | "
                              "'decreasing', 'maxStep'?: number, "
                              "'minStep'?: number, 'verdicts'?: "
                              "'perGroup' (requires 'by')}")
        elif kw == "x-noOverlap":
            ok = (isinstance(v, dict)
                  and isinstance(v.get("endColumn"), str) and v["endColumn"]
                  and isinstance(v.get("allowTouch", True), bool)
                  and ("by" not in v or isinstance(v["by"], str))
                  and ("verdicts" not in v
                       or (v["verdicts"] == "perGroup"
                           and isinstance(v.get("by"), str))))
            if not ok:
                raise _err(p, "x-noOverlap must be {'endColumn': col, "
                              "'by'?: col, 'allowTouch'?: bool, "
                              "'verdicts'?: 'perGroup' (requires 'by')}")
        elif kw == "x-levelShift":
            def _pnum(x):
                return (isinstance(x, (int, float))
                        and not isinstance(x, bool) and x > 0)
            ok = (isinstance(v, dict)
                  and isinstance(v.get("allowGlobal", False), bool)
                  and isinstance(v.get("orderBy"), str) and v["orderBy"]
                  and _pnum(v.get("maxShift"))
                  and ("by" not in v or isinstance(v["by"], str))
                  and ("window" not in v
                       or (isinstance(v["window"], int)
                           and not isinstance(v["window"], bool)
                           and v["window"] >= 2)))
            if not ok:
                raise _err(p, "x-levelShift must be {'orderBy': col, "
                              "'maxShift': number>0, 'by'?: col, "
                              "'window'?: int>=2}")
        elif kw == "x-correlation":
            def _corr_num(x):
                return (isinstance(x, (int, float))
                        and not isinstance(x, bool)
                        and -1.0 <= x <= 1.0)
            ok = (isinstance(v, dict)
                  and isinstance(v.get("allowGlobal", False), bool)
                  and isinstance(v.get("with"), str) and v["with"]
                  and ("min" in v or "max" in v)
                  and ("min" not in v or _corr_num(v["min"]))
                  and ("max" not in v or _corr_num(v["max"]))
                  and ("by" not in v or isinstance(v["by"], str))
                  and ("lag" not in v
                       or (isinstance(v["lag"], int)
                           and not isinstance(v["lag"], bool)
                           and v["lag"] >= 1
                           and isinstance(v.get("orderBy"), str)
                           and v["orderBy"]))
                  and ("orderBy" not in v or "lag" in v)
                  and ("minCount" not in v
                       or (isinstance(v["minCount"], int)
                           and not isinstance(v["minCount"], bool)
                           and v["minCount"] >= 3)))
            if not ok:
                raise _err(p, "x-correlation must be {'with': col, "
                              "'min'|'max': number in [-1, 1], "
                              "'by'?: col, 'lag'?: int>=1 (requires "
                              "'orderBy': col; orderBy without lag is "
                              "inert and refused), 'minCount'?: int>=3}")
        elif kw == "x-contiguous":
            ok = (isinstance(v, dict)
                  and ("by" not in v or isinstance(v["by"], str))
                  and ("where" not in v
                       or (isinstance(v["where"], str) and v["where"]))
                  and ("maxMissing" not in v
                       or (isinstance(v["maxMissing"], int)
                           and not isinstance(v["maxMissing"], bool)
                           and v["maxMissing"] >= 0))
                  and v.get("report", "summary") in ("summary", "gaps")
                  and (v.get("report", "summary") != "gaps"
                       or (isinstance(v.get("by"), str)
                           and "maxMissing" not in v))
                  and ("verdicts" not in v
                       or (v["verdicts"] == "perGroup"
                           and isinstance(v.get("by"), str)
                           and v.get("report", "summary") == "summary")))
            if not ok:
                raise _err(p, "x-contiguous must be {'by'?: col, "
                              "'maxMissing'?: int>=0 (summary only), "
                              "'report'?: 'summary'|'gaps' (gaps requires "
                              "'by'), 'where'?: sql-bool, 'verdicts'?: "
                              "'perGroup' (requires 'by', summary)}")
        elif kw == "x-association":
            def _v01(x):
                return (isinstance(x, (int, float))
                        and not isinstance(x, bool)
                        and 0.0 <= x <= 1.0)
            ok = (isinstance(v, dict)
                  and isinstance(v.get("allowGlobal", False), bool)
                  and isinstance(v.get("with"), str) and v["with"]
                  and ("min" in v or "max" in v)
                  and ("min" not in v or _v01(v["min"]))
                  and ("max" not in v or _v01(v["max"]))
                  and ("by" not in v or isinstance(v["by"], str))
                  and ("where" not in v
                       or (isinstance(v["where"], str) and v["where"]))
                  and ("minCount" not in v
                       or (isinstance(v["minCount"], int)
                           and not isinstance(v["minCount"], bool)
                           and v["minCount"] >= 3))
                  and ("verdicts" not in v
                       or (v["verdicts"] == "perGroup"
                           and isinstance(v.get("by"), str))))
            if not ok:
                raise _err(p, "x-association must be {'with': col, "
                              "'min'|'max': number in [0, 1], 'by'?: col, "
                              "'where'?: sql-bool, 'minCount'?: int>=3, "
                              "'verdicts'?: 'perGroup' (requires 'by')}")
        elif kw == "x-cohortParity":
            def _gap_ok(x):
                return (isinstance(x, (int, float))
                        and not isinstance(x, bool) and x > 0)
            met = v.get("metric", "mean") if isinstance(v, dict) else None
            ok = (isinstance(v, dict)
                  and isinstance(v.get("cohort"), str) and v["cohort"]
                  and isinstance(v.get("baseline"), str) and v["baseline"]
                  and _gap_ok(v.get("maxGap"))
                  and met in ("mean", "median", "rate")
                  and (met != "rate"
                       or (isinstance(v.get("expr"), str) and v["expr"]))
                  and ("expr" not in v or met == "rate")
                  and ("by" not in v or isinstance(v["by"], str))
                  and ("where" not in v
                       or (isinstance(v["where"], str) and v["where"]))
                  and ("minCount" not in v
                       or (isinstance(v["minCount"], int)
                           and not isinstance(v["minCount"], bool)
                           and v["minCount"] >= 1))
                  and ("verdicts" not in v or v["verdicts"] == "perGroup"))
            if not ok:
                raise _err(p, "x-cohortParity must be {'cohort': col, "
                              "'baseline': value, 'maxGap': number>0, "
                              "'metric'?: 'mean'|'median'|'rate' ('rate' "
                              "requires 'expr': sql-bool), 'by'?: col, "
                              "'where'?: sql-bool, 'minCount'?: int>=1, "
                              "'verdicts'?: 'perGroup'}")
        elif kw == "x-reciprocal":
            def _share_ok(x):
                return (isinstance(x, (int, float))
                        and not isinstance(x, bool) and 0 < x <= 1)
            ok = (isinstance(v, dict)
                  and isinstance(v.get("with"), str) and v["with"]
                  and ("matchCounts" not in v
                       or isinstance(v["matchCounts"], bool))
                  and ("by" not in v or isinstance(v["by"], str))
                  and ("where" not in v
                       or (isinstance(v["where"], str) and v["where"]))
                  and ("minShare" not in v or _share_ok(v["minShare"]))
                  and ("verdicts" not in v
                       or (v["verdicts"] == "perGroup"
                           and isinstance(v.get("by"), str)))
                  and ("minShare" not in v
                       or v.get("verdicts") == "perGroup"))
            if not ok:
                raise _err(p, "x-reciprocal must be {'with': col, "
                              "'matchCounts'?: bool, 'by'?: col, "
                              "'where'?: sql-bool, 'verdicts'?: "
                              "'perGroup' (requires 'by'), 'minShare'?: "
                              "number in (0, 1] (perGroup only)}")
        elif kw == "x-acyclic":
            ok = (isinstance(v, dict)
                  and isinstance(v.get("parent"), str) and v["parent"]
                  and ("maxDepth" not in v
                       or (isinstance(v["maxDepth"], int)
                           and not isinstance(v["maxDepth"], bool)
                           and 1 <= v["maxDepth"] <= 2 ** 20))
                  and ("selfParentIsRoot" not in v
                       or isinstance(v["selfParentIsRoot"], bool))
                  and ("where" not in v
                       or (isinstance(v["where"], str) and v["where"])))
            if not ok:
                raise _err(p, "x-acyclic must be {'parent': col, "
                              "'maxDepth'?: int in [1, 2^20], "
                              "'selfParentIsRoot'?: bool, "
                              "'where'?: sql-bool}")
        elif kw == "x-entropy":
            def _hnum(x, normalized):
                if (not isinstance(x, (int, float))
                        or isinstance(x, bool) or x < 0):
                    return False
                return (x <= 1.0) if normalized else True
            norm = isinstance(v, dict) and v.get("normalized", False) is True
            ok = (isinstance(v, dict)
                  and ("min" in v or "max" in v)
                  and ("min" not in v or _hnum(v["min"], norm))
                  and ("max" not in v or _hnum(v["max"], norm))
                  and ("normalized" not in v
                       or isinstance(v["normalized"], bool))
                  and ("by" not in v or isinstance(v["by"], str))
                  and ("where" not in v
                       or (isinstance(v["where"], str) and v["where"]))
                  and ("minCount" not in v
                       or (isinstance(v["minCount"], int)
                           and not isinstance(v["minCount"], bool)
                           and v["minCount"] >= 1))
                  and ("verdicts" not in v
                       or (v["verdicts"] == "perGroup"
                           and isinstance(v.get("by"), str))))
            if not ok:
                raise _err(p, "x-entropy must be {'min'|'max': bits >= 0 "
                              "(in [0, 1] when normalized), "
                              "'normalized'?: bool, 'by'?: col, "
                              "'where'?: sql-bool, 'minCount'?: int>=1, "
                              "'verdicts'?: 'perGroup' (requires 'by')}")
        elif kw == "x-funnel":
            def _rate01(x):
                return (isinstance(x, (int, float))
                        and not isinstance(x, bool) and 0.0 <= x <= 1.0)
            steps_ok = (isinstance(v, dict)
                        and isinstance(v.get("steps"), list)
                        and len(v.get("steps", [])) >= 2
                        and all(isinstance(st, dict)
                                and isinstance(st.get("name"), str)
                                and st["name"]
                                and isinstance(st.get("when"), str)
                                and st["when"]
                                for st in v.get("steps", [])))
            ok = (steps_ok
                  and isinstance(v.get("key"), str) and v["key"]
                  and isinstance(v.get("ts"), str) and v["ts"]
                  and isinstance(v.get("minRates"), list)
                  and len(v["minRates"]) == len(v["steps"]) - 1
                  and all(_rate01(r) for r in v["minRates"])
                  and ("withinSeconds" not in v
                       or (isinstance(v["withinSeconds"], (int, float))
                           and not isinstance(v["withinSeconds"], bool)
                           and v["withinSeconds"] > 0)))
            if not ok:
                raise _err(p, "x-funnel must be {'key': col, 'ts': col, "
                              "'steps': [{'name', 'when'} x>=2], "
                              "'minRates': [r in [0,1]] x(len(steps)-1), "
                              "'withinSeconds'?: number>0}")
        elif kw == "x-compliance":
            def _rate_num(x):
                return (isinstance(x, (int, float))
                        and not isinstance(x, bool) and 0.0 <= x <= 1.0)
            ok = (isinstance(v, dict)
                  and isinstance(v.get("expr"), str) and v["expr"]
                  and ("where" not in v
                       or (isinstance(v["where"], str) and v["where"]))
                  and ("min" in v or "max" in v)
                  and ("min" not in v or _rate_num(v["min"]))
                  and ("max" not in v or _rate_num(v["max"]))
                  and ("by" not in v or isinstance(v["by"], str))
                  and ("minCount" not in v
                       or (isinstance(v["minCount"], int)
                           and not isinstance(v["minCount"], bool)
                           and v["minCount"] >= 1))
                  and ("verdicts" not in v
                       or (v["verdicts"] == "perGroup"
                           and isinstance(v.get("by"), str))))
            if not ok:
                raise _err(p, "x-compliance must be {'expr': sql-bool, "
                              "'min'|'max': number in [0, 1], 'by'?: col, "
                              "'minCount'?: int>=1, 'verdicts'?: "
                              "'perGroup' (requires 'by')}")
        elif kw == "x-distinctRatio":
            def _ratio_num(x):
                return (isinstance(x, (int, float))
                        and not isinstance(x, bool) and 0.0 <= x <= 1.0)
            ok = (isinstance(v, dict)
                  and ("min" in v or "max" in v)
                  and ("min" not in v or _ratio_num(v["min"]))
                  and ("max" not in v or _ratio_num(v["max"]))
                  and ("by" not in v or isinstance(v["by"], str))
                  and ("where" not in v
                       or (isinstance(v["where"], str) and v["where"]))
                  and isinstance(v.get("approx", False), bool)
                  and ("minCount" not in v
                       or (isinstance(v["minCount"], int)
                           and not isinstance(v["minCount"], bool)
                           and v["minCount"] >= 1))
                  and ("verdicts" not in v
                       or (v["verdicts"] == "perGroup"
                           and isinstance(v.get("by"), str))))
            if not ok:
                raise _err(p, "x-distinctRatio must be {'min'|'max': "
                              "number in [0, 1], 'by'?: col, 'approx'?: "
                              "bool, 'minCount'?: int>=1, 'verdicts'?: "
                              "'perGroup' (requires 'by')}")
        elif kw == "x-trend":
            def _slope_num(x):
                return (isinstance(x, (int, float))
                        and not isinstance(x, bool))
            ok = (isinstance(v, dict)
                  and isinstance(v.get("orderBy"), str) and v["orderBy"]
                  and ("where" not in v
                       or (isinstance(v["where"], str) and v["where"]))
                  and ("min" in v or "max" in v)
                  and ("min" not in v or _slope_num(v["min"]))
                  and ("max" not in v or _slope_num(v["max"]))
                  and ("by" not in v or isinstance(v["by"], str))
                  and ("minCount" not in v
                       or (isinstance(v["minCount"], int)
                           and not isinstance(v["minCount"], bool)
                           and v["minCount"] >= 3))
                  and ("verdicts" not in v
                       or (v["verdicts"] == "perGroup"
                           and isinstance(v.get("by"), str))))
            if not ok:
                raise _err(p, "x-trend must be {'orderBy': col, "
                              "'min'|'max': number, 'by'?: col, "
                              "'minCount'?: int>=3, 'verdicts'?: "
                              "'perGroup' (requires 'by')}")
        elif kw == "x-seasonality":
            def _acf_num(x):
                return (isinstance(x, (int, float))
                        and not isinstance(x, bool) and -1 <= x <= 1)
            ok = (isinstance(v, dict)
                  and isinstance(v.get("allowGlobal", False), bool)
                  and isinstance(v.get("orderBy"), str) and v["orderBy"]
                  and isinstance(v.get("lag"), int)
                  and not isinstance(v["lag"], bool) and v["lag"] >= 1
                  and ("where" not in v
                       or (isinstance(v["where"], str) and v["where"]))
                  and ("min" in v or "max" in v)
                  and ("min" not in v or _acf_num(v["min"]))
                  and ("max" not in v or _acf_num(v["max"]))
                  and ("by" not in v or isinstance(v["by"], str))
                  and ("minCount" not in v
                       or (isinstance(v["minCount"], int)
                           and not isinstance(v["minCount"], bool)
                           and v["minCount"] >= 3))
                  and ("verdicts" not in v
                       or (v["verdicts"] == "perGroup"
                           and isinstance(v.get("by"), str))))
            if not ok:
                raise _err(p, "x-seasonality must be {'orderBy': col, "
                              "'lag': int>=1, 'min'|'max': number in "
                              "[-1, 1], 'by'?: col, 'where'?: sql-bool, "
                              "'minCount'?: int>=3, 'verdicts'?: "
                              "'perGroup' (requires 'by')}")
        elif kw == "x-eventOrder":
            ok = (isinstance(v, dict)
                  and isinstance(v.get("by"), str) and v["by"]
                  and isinstance(v.get("first"), str) and v["first"]
                  and isinstance(v.get("then"), str) and v["then"]
                  and isinstance(v.get("requireFirst", True), bool))
            if not ok:
                raise _err(p, "x-eventOrder must be {'by': col, "
                              "'first': sql-bool, 'then': sql-bool, "
                              "'requireFirst'?: bool}")
        elif kw == "x-session":
            def _num(x):
                return (isinstance(x, (int, float))
                        and not isinstance(x, bool))
            bounds = [k for k in ("maxDurationSeconds", "maxEvents",
                                  "minEvents") if k in (v or {})]
            ok = (isinstance(v, dict)
                  and isinstance(v.get("by"), str) and v["by"]
                  and _num(v.get("gapSeconds"))
                  and v["gapSeconds"] > 0
                  and bounds
                  and ("maxDurationSeconds" not in v
                       or (_num(v["maxDurationSeconds"])
                           and v["maxDurationSeconds"] > 0))
                  and ("maxEvents" not in v
                       or (isinstance(v["maxEvents"], int)
                           and not isinstance(v["maxEvents"], bool)
                           and v["maxEvents"] >= 1))
                  and ("minEvents" not in v
                       or (isinstance(v["minEvents"], int)
                           and not isinstance(v["minEvents"], bool)
                           and v["minEvents"] >= 1)))
            if not ok:
                raise _err(p, "x-session must be {'by': col, "
                              "'gapSeconds': number>0, and >=1 of "
                              "'maxDurationSeconds': number>0, "
                              "'maxEvents': int>=1, 'minEvents': "
                              "int>=1}")
        elif kw == "x-outlier":
            def _pos_num(x):
                return (isinstance(x, (int, float))
                        and not isinstance(x, bool) and x > 0)
            meth = (v or {}).get("method", "zscore") \
                if isinstance(v, dict) else None
            ok = (isinstance(v, dict)
                  and meth in ("zscore", "mad", "iqr")
                  # zscore/mad take the envelope from maxZ; iqr from
                  # iqrK (Tukey fence multiplier) — each required for
                  # its own method so the declared form is explicit
                  and (_pos_num(v.get("iqrK")) if meth == "iqr"
                       else _pos_num(v.get("maxZ")))
                  and ("by" not in v or isinstance(v["by"], str))
                  and ("minCount" not in v
                       or (isinstance(v["minCount"], int)
                           and not isinstance(v["minCount"], bool)
                           and v["minCount"] >= 2)))
            if not ok:
                raise _err(p, "x-outlier must be {'maxZ': number>0 "
                              "(zscore/mad) | 'iqrK': number>0 (iqr), "
                              "'by'?: col, 'method'?: 'zscore' | 'mad' "
                              "| 'iqr', 'minCount'?: int>=2}")
        elif kw == "x-kAnonymity":
            if len(p) > 1:
                # the quasi identifier is a column LIST, so the check has
                # no single host column — property placement would bind
                # to nothing (the compiler reads it at root only)
                raise _err(p, "x-kAnonymity is a root-scope keyword")

            def _floor(x):
                return (isinstance(x, int) and not isinstance(x, bool)
                        and x >= 2)
            def _t_ok(x):
                return (isinstance(x, (int, float))
                        and not isinstance(x, bool) and 0 < x <= 1)
            q = v.get("quasi") if isinstance(v, dict) else None
            sens_ok = (isinstance(v.get("sensitive"), str)
                       and v["sensitive"]) if isinstance(v, dict) else False
            ok = (isinstance(v, dict)
                  and isinstance(q, list) and q
                  and all(isinstance(c, str) and c for c in q)
                  and set(v) <= {"quasi", "k", "l", "t", "ordered",
                                 "sensitive", "where"}
                  and ("k" in v or "l" in v or "t" in v)
                  and ("k" not in v or _floor(v["k"]))
                  and ("l" not in v or (_floor(v["l"]) and sens_ok))
                  and ("t" not in v or (_t_ok(v["t"]) and sens_ok))
                  # ordered only orders the t-closeness EMD — inert alone
                  and ("ordered" not in v
                       or (isinstance(v["ordered"], bool) and "t" in v))
                  # sensitive without l or t is inert — refuse, not ignore
                  and ("sensitive" not in v or "l" in v or "t" in v)
                  # a quasi column's within-cell distribution/diversity
                  # against itself is vacuous by construction
                  and not (sens_ok and isinstance(q, list)
                           and v["sensitive"] in q))
            if not ok:
                raise _err(p, "x-kAnonymity must be {'quasi': [col, ...], "
                              "'k'?: int>=2, 'l'?: int>=2, 't'?: 0<t<=1, "
                              "'ordered'?: bool (with t), 'sensitive': "
                              "col (required with and only with l/t), "
                              "'where'?: sql-bool} with k, l and/or t")
        elif kw == "x-functionalDependency":
            det = v.get("determines") if isinstance(v, dict) else None
            if isinstance(det, str):
                det = [det]
            ok = (isinstance(det, list) and det
                  and all(isinstance(c, str) and c for c in det))
            if ok and "columns" in v:
                # composite determinant: root-scope (a column LIST has
                # no host property — the composite x-unique rule)
                if len(p) > 1:
                    raise _err(p, "composite x-functionalDependency "
                                  "('columns') is a root-scope keyword")
                cols = v["columns"]
                ok = (isinstance(cols, list) and len(cols) >= 2
                      and all(isinstance(c, str) and c for c in cols)
                      and not set(cols) & set(det))
            elif ok and len(p) > 1:
                # property form: the host column trivially determines
                # itself — an overlap is vacuous, refuse not ignore
                ok = p[-2] not in det
            if not ok:
                raise _err(p, "x-functionalDependency must be "
                              "{'determines': col | [col, ...]} (host "
                              "column excluded), or root-scope "
                              "{'columns': [>=2 determinant cols], "
                              "'determines': ...} with disjoint sets")
        elif kw == "x-freshness":
            ok = isinstance(v, dict) and isinstance(v.get("asOf"), str) \
                and isinstance(v.get("maxAgeHours"), (int, float)) \
                and not isinstance(v.get("maxAgeHours"), bool) \
                and ("verdicts" not in v
                     or (v["verdicts"] == "perGroup"
                         and isinstance(v.get("by"), str)))
            if ok:
                try:
                    from datetime import datetime

                    datetime.fromisoformat(v["asOf"])
                except ValueError:
                    ok = False
            if not ok:
                raise _err(p, "x-freshness must be {'asOf': ISO-datetime, "
                              "'maxAgeHours': number, 'by'?: col, "
                              "'maxFutureHours'?: number, 'verdicts'?: "
                              "'perGroup' (requires 'by')} — asOf is a "
                              "DECLARED instant (never the wall clock) so "
                              "runs are reproducible")
        elif kw == "x-aggConsistency":
            ok = (isinstance(v, dict)
                  and all(isinstance(v.get(k), str) and v[k]
                          for k in ("child", "key", "childKey", "childAgg"))
                  and (not isinstance(v.get("child"), str)
                       or v["child"].startswith("@")))
            if not ok:
                raise _err(p, "x-aggConsistency must be {'child': '@name', "
                              "'key': col, 'childKey': col, 'childAgg': "
                              "agg-expr, 'parentExpr'?: expr, 'tol'?: "
                              "number, 'allowParentOnly'?: bool, "
                              "'allowChildOnly'?: bool}")
        elif kw == "x-partitionComplete":
            exp = v.get("expected") if isinstance(v, dict) else None
            ok = (isinstance(exp, list) and exp) or (
                isinstance(exp, str) and exp.startswith("@"))
            if not ok:
                raise _err(p, "x-partitionComplete must be {'expected': "
                              "[values, ...] | '@name', 'minRows'?: int, "
                              "'allowUnexpected'?: bool}")
        elif kw == "x-nearDup":
            if not (isinstance(v, dict)
                    and v.get("method") in ("jaccard", "minhash", "simhash",
                                            "spans", "semantic")):
                raise _err(p, "x-nearDup must be {'method': 'jaccard'|"
                              "'minhash'|'simhash'|'spans'|'semantic', "
                              "...method knobs}")
            mh = v.get("maxHamming", 3)
            if v["method"] == "simhash" and not (
                    isinstance(mh, int) and not isinstance(mh, bool)
                    and 0 <= mh <= 3):
                raise _err(p, "x-nearDup simhash maxHamming must be an int "
                              "in [0, 3] — the 4x16-bit pigeonhole only "
                              "guarantees a shared chunk up to distance 3")
        elif kw == "x-jsonWellFormed":
            if v is not True:
                raise _err(p, "x-jsonWellFormed must be true")
        elif kw == "x-tokenShape":
            def _ids(x):
                return (isinstance(x, list) and x
                        and all(isinstance(t, int)
                                and not isinstance(t, bool) for t in x))
            ok = (isinstance(v, dict) and v
                  and set(v) <= {"startsWith", "endsWith", "forbidden",
                                 "pad"}
                  and all(_ids(v[kk])
                          for kk in ("startsWith", "endsWith", "forbidden")
                          if kk in v)
                  and ("pad" not in v
                       or (isinstance(v["pad"], int)
                           and not isinstance(v["pad"], bool))))
            if not ok:
                raise _err(p, "x-tokenShape must be a non-empty object of "
                              "{'startsWith'?: [int,...], "
                              "'endsWith'?: [int,...], "
                              "'forbidden'?: [int,...], 'pad'?: int}")
        elif kw == "x-vector":
            ok = (isinstance(v, dict) and v
                  and set(v) <= {"dim", "unit", "tol", "finite"}
                  and ("dim" not in v
                       or (isinstance(v["dim"], int)
                           and not isinstance(v["dim"], bool)
                           and v["dim"] > 0))
                  and ("tol" not in v
                       or (isinstance(v["tol"], (int, float))
                           and not isinstance(v["tol"], bool)
                           and v["tol"] > 0)))
            if not ok:
                raise _err(p, "x-vector must be a non-empty object of "
                              "{'dim'?: int>0, 'unit'?: bool, "
                              "'tol'?: number>0, 'finite'?: bool}")
        # unknown keywords: ignored (validators.rs:75-78)


# ---------------------------------------------------------------------------
# $ref resolution (≙ resolver.rs, with the :171 cycle-guard TODO fixed)
# ---------------------------------------------------------------------------

class Resolver:
    """Driver-side resolver with lexical ``$id`` scoping: one walk collecting
    every ``$id``-bearing fragment into an ABSOLUTE-URI map, joining each
    ``$id`` against the base URI in effect at its lexical position
    (≙ ``find_ids`` + ``join_url``, ``resolver.rs:32-74`` and ``:96-116``,
    with the scope chain of ``context.rs:5-28``), then base-relative ``$ref``
    resolution at every ref site.

    * nested ``$id`` values re-scope their subtree: ``{"$id": "http://x/a/",
      "$defs": {"b": {"$id": "b.json", ...}}}`` registers ``http://x/a/b.json``
      and a ``$ref: "b.json"`` anywhere inside the ``a/`` scope finds it;
    * fragment-only ``$id`` values ("#name") register draft7 location-
      independent anchors within their enclosing document;
    * JSON-pointer fragments walk the resolved document, not the root.

    Unlike the reference (TODO at ``resolver.rs:171``), recursive ``$ref``
    cycles are detected and rejected at compile time — a cyclic suite cannot
    compile to a finite Column expression. Remote URLs are never fetched
    (``lib.rs:112`` excludes refRemote.json for the same reason).
    """

    def __init__(self, root: dict):
        from urllib.parse import urldefrag

        self.root = root
        self.ids: dict[str, Any] = {}       # absolute URI (defragged) → node
        self.anchors: dict[str, Any] = {}   # "uri#name" plain anchors → node
        self.base_of: dict[int, str] = {}   # id(node) → base URI in effect
        self.root_base = ""
        if isinstance(root, dict):
            rid = root.get("$id") or root.get("id")
            if isinstance(rid, str):
                self.root_base = urldefrag(rid)[0]
        self._collect(root, self.root_base)

    def _collect(self, node: Any, base: str) -> None:
        from urllib.parse import urldefrag, urljoin

        if isinstance(node, dict):
            nid = node.get("$id") or node.get("id")
            if isinstance(nid, str):
                absolute = urljoin(base, nid) if base else nid
                doc, frag = urldefrag(absolute)
                if frag and not doc:
                    # fragment-only $id: anchor within the enclosing document
                    self.anchors[f"{base}#{frag}"] = node
                else:
                    if doc:
                        self.ids[doc] = node
                        base = doc
                    if frag:
                        self.anchors[f"{doc}#{frag}"] = node
            self.base_of[id(node)] = base
            for v in node.values():
                self._collect(v, base)
        elif isinstance(node, list):
            for v in node:
                self._collect(v, base)

    def _pointer(self, doc: Any, frag: str, ref: str) -> Any:
        from urllib.parse import unquote

        node = doc
        for raw in frag.lstrip("/").split("/"):
            # URI percent-decoding first (the fragment arrives URI-encoded,
            # e.g. %25 ⇒ %), then RFC-6901 escapes (resolver.rs:150-152)
            part = unquote(raw).replace("~1", "/").replace("~0", "~")
            if isinstance(node, dict):
                if part not in node:
                    raise SuiteError(f"unresolvable $ref {ref!r}: missing key {part!r}")
                node = node[part]
            elif isinstance(node, list):
                try:
                    node = node[int(part)]
                except (ValueError, IndexError):
                    raise SuiteError(f"unresolvable $ref {ref!r}: bad index {part!r}")
            else:
                raise SuiteError(f"unresolvable $ref {ref!r}: hit a leaf at {part!r}")
        return node

    def resolve(self, ref: str, scope: Any = None) -> Any:
        """Resolve ``ref`` against the base URI in effect at ``scope`` (the
        suite node containing the ``$ref``; defaults to the root scope) —
        ≙ ``Context::get_resolved_url`` joining the lexical ``$id`` chain."""
        from urllib.parse import urldefrag, urljoin

        base = self.root_base
        if scope is not None:
            base = self.base_of.get(id(scope), self.root_base)
        uri = urljoin(base, ref) if base else ref
        doc_uri, frag = urldefrag(uri)

        if frag and not frag.startswith("/"):
            # plain-name anchor fragment
            anchor = self.anchors.get(f"{doc_uri}#{frag}")
            if anchor is not None:
                return anchor
        if not doc_uri or doc_uri == self.root_base:
            doc = self.root
        elif doc_uri in self.ids:
            doc = self.ids[doc_uri]
        else:
            # ≙ make_error("Unresolvable reference"), validators.rs:1038-1044
            # — but at compile time, before any cluster work.
            raise SuiteError(f"unresolvable $ref {ref!r} (resolved to {uri!r})")
        if not frag:
            return doc
        if frag.startswith("/"):
            return self._pointer(doc, frag, ref)
        raise SuiteError(f"unresolvable $ref {ref!r}: unknown anchor {frag!r}")


# ---------------------------------------------------------------------------
# Facade
# ---------------------------------------------------------------------------

class CheckSuite:
    """A validated, compiled check suite (≙ ``Config``, ``config.rs:12-16``).

    Compilation is driver-side and happens once; running binds the compiled
    checks to a DataFrame and assembles ONE fused job (see ``compiler.py`` /
    ``engine.py``).
    """

    def __init__(self, spec: dict | bool, validate: bool = True):
        self.spec = spec
        self.draft = registry.resolve_draft(spec) if isinstance(spec, dict) else registry.DEFAULT_DRAFT
        if validate:
            validate_suite_spec(spec, self.draft)
        self.resolver = Resolver(spec) if isinstance(spec, dict) else Resolver({})
        # Stable content hash for lineage/checkpointing (suite identity).
        self.suite_hash = hashlib.sha256(
            json.dumps(spec, sort_keys=True, default=str).encode()
        ).hexdigest()[:16]

    def bind(self, df):
        """Compile against a DataFrame schema → BoundPlan (driver-side)."""
        from jsonschema_valid_spark.compiler import bind

        return bind(self, df)

    def run(self, df, key: str = "doc_id", partition_by=None, spark=None,
            context=None, parity_mode: str = "native"):
        """Validate ``df``; returns a :class:`ValidationResult` (lazy)."""
        from jsonschema_valid_spark.engine import run_suite

        return run_suite(self, df, key=key, partition_by=partition_by,
                         spark=spark, context=context, parity_mode=parity_mode)

    def split(self, df, key: str = "doc_id", context=None):
        """(clean, quarantined) partition of ``df`` by the ROW checks —
        see :func:`engine.split_valid`."""
        from jsonschema_valid_spark.engine import split_valid

        return split_valid(self, df, key=key, context=context)
