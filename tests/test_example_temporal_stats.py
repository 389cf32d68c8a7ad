"""e2e: the temporal-statistics pipeline example (discover -> bootstrap
-> gate -> symmetry) over sf0.001."""

from examples.temporal_statistics_pipeline import run_pipeline

from tests.conftest import SF_DIR


def test_temporal_statistics_pipeline(spark):
    out = run_pipeline(spark, SF_DIR)
    # every healthy event type names the seeded period
    assert out["period"] == 5
    assert set(out["discovered"].values()) == {5}
    # the learned floor is meaningfully tight, not vacuous
    assert 0.5 < out["floor"] < 1.0
    # the gate trips EXACTLY the aperiodic arm, on both temporal checks
    assert ("x-seasonality", "error") in out["gate_tripped"]
    assert ("x-correlation", "error") in out["gate_tripped"]
    assert all(doc == "error" or kw == "x-trend"
               for kw, doc in out["gate_tripped"])
    # seeded defectors surface as one-way transfer cells
    assert out["one_way_cells"] > 0
