"""e2e: the product-analytics pipeline example composes gate -> enrich
-> frame -> measure over the real sf0.001 events feed."""

from examples.product_analytics_pipeline import run_pipeline


def test_product_analytics_pipeline(spark):
    out = run_pipeline(spark, "/root/testdata/sf0.001")
    # the gate finds real violations in the raw feed (5 causality
    # breaks + loose-IQR outliers), enumerated not silently dropped
    assert out["violations"] > 0 and not out["gate_ok"]
    # every event row survives the as-of join (left join), and most
    # users have a purchase history to match against
    assert out["asof_matched"] > 0
    assert out["attributed_clicks"] == 13          # oracled count
    assert out["sessions"] == 691                  # oracled count
    assert out["funnel"] == {"signup": 15, "view": 8, "purchase": 1}
    assert out["retention_cells"] == 5
