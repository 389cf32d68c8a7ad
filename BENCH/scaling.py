#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in the sandbox, so two parallelism levels stand in
for N vs 4N executors: the IDENTICAL flagship validation job runs at
``local[8]`` and ``local[32]`` on the IDENTICAL materialized input, each in
a fresh JVM (subprocess) so nothing is warm-shared. Writes
``BENCH/BASELINE.md`` with throughput at both levels + scaling efficiency
   eff = (thru_32 / thru_8) / (32 / 8)     (acceptance: ≥ 0.8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "2000000"))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from bench import make_spark, run_bench
spark = make_spark({cpus})
out = run_bench(spark, {rows})
print("RESULT::" + json.dumps(out))
spark.stop()
"""


def run_at(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    code = CHILD.format(repo=REPO, cpus=cpus, rows=ROWS)
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=1800, env=env)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::"):])
    raise RuntimeError(f"no result at local[{cpus}]:\n{proc.stderr[-2000:]}")


def main() -> None:
    # materialize input once so both runs scan identical bytes
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", f"{REPO}/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    spark = bench.make_spark(8)
    path = bench.materialize_input(spark, ROWS)
    n_rows = spark.read.parquet(path).count()
    spark.stop()

    r8 = run_at(8)
    r32 = run_at(32)
    thru8 = n_rows / r8["queries"]["flagship_full"]
    thru32 = n_rows / r32["queries"]["flagship_full"]
    eff = (thru32 / thru8) / (32 / 8)

    md = f"""# BENCH/BASELINE — two-cluster-size scaling evidence

Generated {datetime.now(timezone.utc).isoformat(timespec='seconds')} on the
32-core sandbox. The IDENTICAL flagship validation job (full check suite:
row invariants, token range, enum, null-rate, stats, salted uniqueness,
broadcast referential) ran at two parallelism levels in fresh JVMs over the
IDENTICAL materialized parquet input ({n_rows:,} rows) — the sandbox
stand-in for N vs 4N executors (BASELINE.json:14; no real cluster here).

| config | wall (s) | throughput (seq/s) |
|---|---|---|
| `local[8]`  (N)  | {r8['queries']['flagship_full']:.2f} | {thru8:,.0f} |
| `local[32]` (4N) | {r32['queries']['flagship_full']:.2f} | {thru32:,.0f} |

**Scaling efficiency** = (thru_4N / thru_N) / 4 = **{eff:.3f}**
(acceptance ≥ 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

Component timings (seconds):

| component | local[8] | local[32] |
|---|---|---|
""" + "\n".join(
        f"| {k} | {r8['queries'][k]:.2f} | {r32['queries'][k]:.2f} |"
        for k in r8["queries"]
    ) + f"""

Configs: AQE on, `spark.sql.shuffle.partitions` = max(cpus, 8), parquet scan
of the deterministic generated sequences table (seed-free integer
arithmetic; see `jsonschema_valid_spark/sources/sequences.py`).
Violations found (identical at both levels): {r8['violations']:,} vs
{r32['violations']:,}.
"""
    with open(f"{HERE}/BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps({"thru8": round(thru8, 1), "thru32": round(thru32, 1),
                      "efficiency": round(eff, 3), "rows": n_rows}))


if __name__ == "__main__":
    main()
