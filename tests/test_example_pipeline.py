"""The curation-pipeline example must run end-to-end at sf0.001 and obey the
monotone-shrinkage + clean-gate invariants."""

import os
import sys

from tests.conftest import SF_DIR

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))


def test_curation_pipeline_end_to_end(spark, tmp_path):
    from curation_pipeline import curate, validate_and_write

    stages = curate(spark, SF_DIR)
    n = {name: df.count() for name, df in stages.items()}
    assert n["profiled"] > 0
    # each stage only removes rows
    assert n["profiled"] >= n["kept"] >= n["exact"] >= n["curated"] > 0
    # the validated clean set has zero violations by construction
    assert validate_and_write(spark, stages["curated"], str(tmp_path)) is True
    clean = spark.read.parquet(f"{tmp_path}/clean")
    assert clean.count() > 0
    assert "quality" in clean.columns and "fp" in clean.columns
