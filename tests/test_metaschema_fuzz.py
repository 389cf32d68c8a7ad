"""Seeded random-suite fuzz: the hand-rolled walker (validate_suite_spec)
and the engine-hosted metaschema must agree on EVERY generated suite.
All suites are validated in ONE batched engine pass (node rows carry a
suite index prefix), so the whole fuzz costs a single Spark job."""

import random

import pytest

from jsonschema_valid_spark.suite.metaschema import (
    METASCHEMA_SUITE,
    NODE_SCHEMA,
    suite_nodes,
)
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec

_TYPES = ["string", "integer", "number", "array", "object", "boolean", "null"]
_BAD_TYPES = ["str", "int", "float", "decimal", ""]


def _gen_value_schema(rnd: random.Random, depth: int) -> object:
    """Random schema node — a mix of valid and deliberately-broken
    fragments; no x-rowExpr (its eager SQL parse is walker-only)."""
    roll = rnd.random()
    if roll < 0.05:
        return rnd.choice([True, False])
    if roll < 0.08 and depth > 0:
        return rnd.choice([42, "not-a-schema", 3.14])  # broken node
    node: dict = {}
    n_kw = rnd.randint(1, 3)
    for _ in range(n_kw):
        kind = rnd.randrange(12)
        if kind == 0:
            node["type"] = rnd.choice(
                _TYPES + _BAD_TYPES
                + [[rnd.choice(_TYPES + _BAD_TYPES)], [], [1]])
        elif kind == 1:
            node["enum"] = rnd.choice([[1, 2], ["a"], [], "xs", [None]])
        elif kind == 2:
            node["minimum"] = rnd.choice([0, -5, 2.5, "0", True, None])
        elif kind == 3:
            node["multipleOf"] = rnd.choice([2, 0.5, 0, -1, "2"])
        elif kind == 4:
            node["minLength"] = rnd.choice([0, 3, -1, 2.5, "3", False])
        elif kind == 5:
            node["pattern"] = rnd.choice(
                ["^a+$", "[0-9]{2}", "a{2,1}", "(unclosed", "x**", 7])
        elif kind == 6:
            node["required"] = rnd.choice(
                [["a"], [], ["a", "b"], [1], "a", [None]])
        elif kind == 7 and depth > 0:
            node[rnd.choice(["allOf", "anyOf", "oneOf"])] = rnd.choice([
                [_gen_value_schema(rnd, depth - 1)],
                [_gen_value_schema(rnd, depth - 1),
                 _gen_value_schema(rnd, depth - 1)],
                [],
            ])
        elif kind == 8:
            node["x-nullRate"] = rnd.choice(
                [{"max": 0.1}, {"min": 0.0}, {}, {"tau": 1}, [0.1], 0.1])
        elif kind == 9:
            node["x-unique"] = rnd.choice(
                [True, False, {"approx": True}, {"rsd": 0.1}, ["a"], [],
                 [3], "yes"])
        elif kind == 10:
            node["uniqueItems"] = rnd.choice([True, False, "yes", 1])
        else:
            node["x-stats"] = rnd.choice(
                [{"min": {"min": 0}}, {"median": {}}, {}, ["min"], "avg"])
    if depth > 0 and rnd.random() < 0.4:
        node["properties"] = {
            f"c{i}": _gen_value_schema(rnd, depth - 1)
            for i in range(rnd.randint(1, 2))
        }
    if depth > 0 and rnd.random() < 0.15:
        node["items"] = rnd.choice([
            _gen_value_schema(rnd, depth - 1),
            [_gen_value_schema(rnd, depth - 1)],
        ])
    return node


def _walker_ok(spec) -> bool:
    try:
        validate_suite_spec(spec)
        return True
    except SuiteError:
        return False


N_SUITES = 120


def test_walker_and_engine_metaschema_agree_on_fuzz(spark):
    from pyspark.sql import functions as F

    from jsonschema_valid_spark import CheckSuite

    rnd = random.Random(20260816)
    suites = [_gen_value_schema(rnd, depth=2) for _ in range(N_SUITES)]
    walker = [_walker_ok(s) for s in suites]
    # sanity: the generator must produce BOTH populations
    assert 10 < sum(walker) < N_SUITES - 10, sum(walker)

    rows = []
    for i, spec in enumerate(suites):
        for r in suite_nodes(spec):
            rows.append({**r, "node_id": f"s{i:04d}|{r['node_id']}"})
    df = spark.createDataFrame(rows, NODE_SCHEMA)
    res = CheckSuite(METASCHEMA_SUITE).run(df, key="node_id")
    bad_suites = {
        int(r["sid"][1:]) for r in res.violations.select(
            F.split("doc_id", r"\|").getItem(0).alias("sid")).collect()
    }
    engine = [i not in bad_suites for i in range(N_SUITES)]

    disagree = [
        (i, walker[i], engine[i], suites[i])
        for i in range(N_SUITES) if walker[i] != engine[i]
    ]
    assert not disagree, disagree[:5]
