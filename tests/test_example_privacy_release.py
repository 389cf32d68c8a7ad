"""e2e: the privacy-release example (learn floors -> gate -> suppress ->
re-check skew) returns the derived facts at sf0.001."""

from examples.privacy_release_pipeline import run_pipeline

SF = "/root/testdata/sf0.001"


def test_privacy_release_pipeline(spark):
    out = run_pipeline(spark, SF)
    assert out["learned_node"] == {
        "quasi": ["user_id", "event_type"], "k": 3}
    # the gutted cell trips the learned floor and only it
    assert out["kl_violation_cells"] == ["3/view"]
    # the skew gate flags the four naturally-skewed users (the oracled
    # engine_t_closeness_violations witness set)
    assert out["skew_users"] == ["1", "3", "4", "9"]
    # repair: exactly the sliver suppressed, split exact, released clean
    assert out["suppressed_rows"] == 2
    assert out["split_exact"] is True
    assert out["post_kl_violations"] == 0
    # suppression of 2 rows does not repair distributional skew — the
    # re-check still flags the same users (t-repair is generalization)
    assert out["post_skew_users"] == 4
