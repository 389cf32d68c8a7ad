"""e2e: the sequence-integrity example composes the pipeline-integrity
keyword family (tokenShape + monotonic + rowCount + freshness, perGroup
verdicts, exemplar capping) over the sf0.001 tables."""

from tests.conftest import SF_DIR


def test_sequence_integrity_pipeline(spark):
    from examples.sequence_integrity_pipeline import run_pipeline

    out = run_pipeline(spark, SF_DIR)
    # framed tokens: structure holds except the generator's -5 corruption
    # (did%101) -> tokenShape fails; the +2 framing keeps x-rowExpr green
    # except on the n_tok-drift rows (did%97)
    assert out["shape_ok"] is False
    assert 1 <= out["shape_exemplars"] <= 10  # <=5 per failing check

    fc = out["feed_checks"]
    assert set(fc) == {"x-monotonic", "x-rowCount", "x-freshness"}
    # perGroup enumeration: monotonic+rowCount verdicts per user (15 at
    # sf0.001), freshness per event_type (5)
    assert fc["x-monotonic"]["groups"] == 15
    assert fc["x-rowCount"]["groups"] == 15
    assert fc["x-freshness"]["groups"] == 5
    # the synthetic feed's value is time-independent: every user breaks
    # monotonicity; per-user volumes sit inside [40, 100] so rowCount is
    # all green
    assert fc["x-monotonic"]["failed"] == 15
    assert fc["x-rowCount"]["failed"] == 0
    assert out["feed_exemplars"] >= 1
