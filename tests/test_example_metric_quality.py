"""e2e: the metric-quality pipeline example composes the wave-17..25
operators and every derived count is stable."""

from examples.metric_quality_pipeline import run_pipeline

from tests.conftest import SF_DIR


def test_metric_quality_pipeline(spark, tmp_path):
    out = run_pipeline(spark, SF_DIR, work_dir=str(tmp_path))
    # gate: the per-type slopes/rates and funnel floors trip exactly the
    # oracled families (engine_trend/compliance/funnel_violations)
    assert out["gate_violations"] > 0
    assert out["gate_checks_tripped"] == [
        "x-compliance", "x-funnel", "x-trend"]
    # TPC-H prices are range-capped: Benford decisively rejects
    assert out["benford_passed"] is False
    # every key%11 twin collapsed into its source entity
    assert (out["records_in"] - out["golden_records"]
            == out["merged_entities"])
    assert out["merged_entities"] > 0
    # z-order: the 2-D box probe prunes files
    assert 0 < out["zorder_box_files"] < out["zorder_files"]
    # verify_content: exactly the appended partition was invalidated and
    # the late violating row surfaced
    assert out["partitions_invalidated"] == ["click"]
    assert out["late_violations"] == 1
    assert out["partitions_validated"] >= 5
