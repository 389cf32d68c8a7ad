"""e2e: the incremental-ingest example (states + unique index + retry
no-ops) returns the derived facts at sf0.001."""

from examples.incremental_ingest_pipeline import run_pipeline

SF = "/root/testdata/sf0.001"


def test_incremental_ingest_pipeline(spark, tmp_path):
    out = run_pipeline(spark, SF, str(tmp_path))
    assert out["day1_ok"] is True
    assert out["replays_caught"] is True
    assert out["n_replays"] > 0
    assert out["states_match_full_rescan"] is True
    assert out["partitions_tracked"] == ["d1", "d2"]
    # day 2 genuinely-new ids were inserted; the retry inserted nothing
    assert out["index_inserted"] > 0
    assert out["index_retry_inserted"] == 0
    # the near-copy of an ingested doc was caught by the NearDupIndex
    # probe (and the novel doc was not); the retry inserted nothing
    assert out["neardup_caught"] is True
    assert out["neardup_index_inserted"] == 2
    assert out["neardup_index_retry_inserted"] == 0
