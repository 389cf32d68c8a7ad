"""Round-4 fixes: ADVICE r3 items (checkpoint manifest concurrency +
orphan cleanup, regex-probe Rust-compat translation, blocklist
longest-match-first) and VERDICT r3 items (trained IVF/PQ codebooks with a
recall bound, the composed exact re-rank stage, mix_to_budget null-stratum
knob)."""

import threading

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# ADVICE 1+4: SnapshotManifestCommit under concurrency + orphan expiry
# ---------------------------------------------------------------------------

def test_snapshot_commit_concurrent_partitions(spark, tmp_path):
    """Two threads committing DIFFERENT partitions concurrently must both
    end up referenced in the manifest (the unlocked read-modify-replace
    could drop one — ADVICE r3 item 1)."""
    from jsonschema_valid_spark.checkpoint import SnapshotManifestCommit

    proto = SnapshotManifestCommit(str(tmp_path / "snap"))
    parts = [f"p{i}" for i in range(8)]
    dfs = {p: spark.createDataFrame([(p, i) for i in range(5)],
                                    "part string, v long") for p in parts}
    # pre-materialize the writes' plans; then race the commits
    barrier = threading.Barrier(len(parts))
    errors = []

    def commit(p):
        try:
            barrier.wait(timeout=60)
            proto.commit(dfs[p], "verdicts", p)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=commit, args=(p,)) for p in parts]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors
    manifest = proto._read_manifest("verdicts")
    assert sorted(manifest) == sorted(parts), manifest
    # every referenced partition is readable with its own rows
    for p in parts:
        got = proto.read_partition(spark, "verdicts", p).collect()
        assert len(got) == 5 and got[0]["part"] == p


def test_snapshot_recommit_expires_superseded_dir(spark, tmp_path):
    """Re-committing a partition repoints the manifest AND deletes the
    superseded data directory (ADVICE r3 item 4: retried partitions leaked
    one orphaned parquet dir per retry)."""
    import os

    from jsonschema_valid_spark.checkpoint import SnapshotManifestCommit

    proto = SnapshotManifestCommit(str(tmp_path / "snap"))
    df1 = spark.createDataFrame([(1,)], "v long")
    df2 = spark.createDataFrame([(2,)], "v long")
    proto.commit(df1, "verdicts", "p0")
    first_dir = proto._read_manifest("verdicts")["p0"]
    proto.commit(df2, "verdicts", "p0")
    second_dir = proto._read_manifest("verdicts")["p0"]
    assert first_dir != second_dir
    assert not os.path.exists(first_dir)
    assert [r["v"] for r in
            proto.read_partition(spark, "verdicts", "p0").collect()] == [2]


# ---------------------------------------------------------------------------
# ADVICE 2: format:regex Rust-compat translation
# ---------------------------------------------------------------------------

def test_rust_compat_translate_units():
    from jsonschema_valid_spark.formats import _rust_compat_translate as tr

    assert tr(r"\p{L}+") == ".+"
    assert tr(r"[\p{Greek}x]") == "[.x]"
    assert tr(r"\pL\d") == r".\d"
    assert tr(r"foo\z") == r"foo\Z"
    assert tr(r"(?<name>a)b") == r"(?P<name>a)b"
    assert tr(r"\\p{L}") == r"\\p{L}"      # escaped backslash: untouched
    assert tr(r"\p{") is None              # malformed
    assert tr(r"plain[a-z]{2,3}") == r"plain[a-z]{2,3}"


@pytest.mark.parametrize("pattern,valid", [
    (r"\p{L}+", True),          # Rust-valid Unicode class (Python rejects raw)
    (r"foo\z", True),           # Rust end-of-text anchor
    (r"(?<name>a)b", True),     # Rust named group spelling
    (r"(?=look)ahead", False),  # lookaround: Rust rejects
    (r"(a)\1", False),          # backreference: Rust rejects
    (r"(?P=name)", False),      # Python named backref: Rust rejects
    (r"a{2,1}", False),         # reversed interval: both reject
    (r"(unclosed", False),
])
def test_format_regex_probe_rust_compat(spark, pattern, valid):
    """The format:regex probe must classify Rust-valid/Python-invalid
    constructs as VALID (ADVICE r3 item 2 — previously \\p{...}, \\z and
    (?<name>) were misclassified invalid) while still rejecting the
    constructs Rust's Regex::new lacks (format.rs:51-53)."""
    from jsonschema_valid_spark import CheckSuite

    df = spark.createDataFrame([(1, pattern)], "id long, pat string")
    res = CheckSuite({"properties": {"pat": {"format": "regex"}}}).run(
        df, key="id")
    n_viol = res.violations.count()
    assert (n_viol == 0) == valid, (pattern, n_viol)


# ---------------------------------------------------------------------------
# ADVICE 3: blocklist longest-match-first
# ---------------------------------------------------------------------------

def test_blocklist_phrase_beats_prefix_word(spark):
    """A term that is a leading-word prefix of a phrase term must not mask
    the phrase (ADVICE r3 item 3): on 'a b a' with terms ['a', 'a b'] the
    alphabetical alternation counted only {'a'}; longest-first counts both."""
    from jsonschema_valid_spark.functions.text import blocklist_hits

    df = spark.createDataFrame([(1, "a b a"), (2, "b a"), (3, "c")],
                               "id long, text string")
    got = {r["id"]: r["n"] for r in df.select(
        "id", blocklist_hits(F.col("text"), ["a", "a b"]).alias("n")
    ).collect()}
    assert got == {1: 2, 2: 1, 3: 0}, got


# ---------------------------------------------------------------------------
# VERDICT 6: mix_to_budget null_stratum knob
# ---------------------------------------------------------------------------

@pytest.fixture()
def null_mix_df(spark):
    rows = ([(i, "en", 10) for i in range(100)]
            + [(1000 + i, None, 10) for i in range(100)])
    return spark.createDataFrame(rows, "doc_id long, src string, w long")


def test_mix_to_budget_null_drop_default(null_mix_df):
    from jsonschema_valid_spark.functions.sampling import mix_to_budget

    out = mix_to_budget(null_mix_df, "doc_id", "src", "w",
                        budget_per_stratum=500.0, seed=1).collect()
    assert all(r["src"] is not None for r in out)
    # en: 1000 weight → rate 0.5 expected; Bernoulli so just sanity-bound
    assert 20 <= len(out) <= 80


def test_mix_to_budget_null_keep_budgets_null_stratum(null_mix_df):
    from jsonschema_valid_spark.functions.sampling import mix_to_budget

    out = mix_to_budget(null_mix_df, "doc_id", "src", "w",
                        budget_per_stratum=500.0, seed=1,
                        null_stratum="keep").collect()
    nulls = [r for r in out if r["src"] is None]
    # NULL stratum has weight 1000 → rate 0.5; Bernoulli bounds
    assert 20 <= len(nulls) <= 80


def test_mix_to_budget_null_explicit_rate(null_mix_df):
    from jsonschema_valid_spark.functions.sampling import mix_to_budget

    out = mix_to_budget(null_mix_df, "doc_id", "src", "w",
                        budget_per_stratum=500.0, seed=1,
                        null_stratum=1.0).collect()
    nulls = [r for r in out if r["src"] is None]
    assert len(nulls) == 100  # rate 1.0 keeps every NULL row

    with pytest.raises(ValueError):
        mix_to_budget(null_mix_df, "doc_id", "src", "w",
                      budget_per_stratum=500.0, null_stratum="bogus")


def test_mix_to_budget_default_matches_r3_oracle(null_mix_df):
    """The default ('drop') must stay bit-identical to the r3 behavior the
    sample_mix_budget driver oracle replays."""
    from jsonschema_valid_spark.functions.sampling import (
        mix_to_budget,
        stratified_sample,
    )

    got = {r["doc_id"] for r in mix_to_budget(
        null_mix_df, "doc_id", "src", "w", budget_per_stratum=500.0,
        seed=1).collect()}
    expected = {r["doc_id"] for r in stratified_sample(
        null_mix_df, "doc_id", "src", rates={"en": 0.5}, default_rate=0.0,
        seed=1).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# VERDICT 2: trained codebooks/centroids beat the seeded ones
# ---------------------------------------------------------------------------

def test_trained_pq_codebooks_beat_seeded_recall(spark):
    """K-means-trained PQ codebooks must give ADC candidate recall ≥ the
    seeded-Gaussian ones at the same (m, n_codes, R) — the 'Done' bound of
    VERDICT r3 item 2. Measured on the embeddings fixture: trained ≈ 9/10
    vs seeded ≈ 6/10 at R=64."""
    from jsonschema_valid_spark.functions.similarity import (
        brute_force_topk,
        pq_topk,
        train_pq_codebooks,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).first()["embedding"]]
    true10 = {r["vec_id"] for r in
              brute_force_topk(emb, "vec_id", "embedding", q, k=10).collect()}

    def recall(books):
        cand = {r["vec_id"] for r in
                pq_topk(emb, "vec_id", "embedding", q, k=64, m=8,
                        n_codes=16, books=books).collect()}
        return len(cand & true10) / len(true10)

    trained = train_pq_codebooks(emb, "embedding", dim=64, m=8, n_codes=16,
                                 iters=5)
    r_trained = recall(trained)
    r_seeded = recall(None)  # pq_topk falls back to seeded codebooks
    assert r_trained >= r_seeded, (r_trained, r_seeded)
    assert r_trained >= 0.8, r_trained


def test_trained_ivf_centroids_beat_seeded_recall(spark):
    """Trained coarse centroids must keep top-k recall ≥ seeded at equal
    n_probe (cells follow the data instead of random directions)."""
    from jsonschema_valid_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).first()["embedding"]]
    true10 = {r["vec_id"] for r in
              brute_force_topk(emb, "vec_id", "embedding", q, k=10).collect()}

    def recall(cents):
        got = {r["vec_id"] for r in
               ivf_topk(emb, "vec_id", "embedding", q, k=10, n_cells=16,
                        n_probe=4, centroids=cents).collect()}
        return len(got & true10) / len(true10)

    trained = train_ivf_centroids(emb, "embedding", dim=64, n_cells=16,
                                  iters=5)
    assert recall(trained) >= recall(None)


def test_trained_codebooks_deterministic(spark):
    """Training twice on the same input yields IDENTICAL codebooks (the
    property the driver-vs-mirror replay of ivf_pq_rerank_topk rests on:
    hash-seeded init + rounded centroids)."""
    from jsonschema_valid_spark.functions.similarity import train_pq_codebooks

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    b1 = train_pq_codebooks(emb, "embedding", dim=64, m=4, n_codes=8, iters=3)
    b2 = train_pq_codebooks(emb.repartition(7), "embedding", dim=64, m=4,
                            n_codes=8, iters=3)
    assert b1 == b2


# ---------------------------------------------------------------------------
# VERDICT 3: the composed re-rank equals brute force
# ---------------------------------------------------------------------------

def test_ivf_pq_rerank_equals_brute_force(spark):
    from jsonschema_valid_spark.functions.similarity import (
        brute_force_topk,
        ivf_pq_rerank_topk,
        train_pq_codebooks,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).first()["embedding"]]
    books = train_pq_codebooks(emb, "embedding", dim=64, m=8, n_codes=16,
                               iters=5)
    got = [(r["vec_id"], r["cos"]) for r in
           ivf_pq_rerank_topk(emb, "vec_id", "embedding", q, k=10,
                              rerank=256, books=books).collect()]
    want = [(r["vec_id"], round(r["cos"], 6)) for r in
            brute_force_topk(emb, "vec_id", "embedding", q, k=10)
            .select("vec_id", F.round("cos", 6).alias("cos")).collect()]
    assert got == want


# ---------------------------------------------------------------------------
# VERDICT 8: embedding width from schema metadata
# ---------------------------------------------------------------------------

def test_neardup_dim_from_schema_metadata(spark):
    from jsonschema_valid_spark.functions.similarity import (
        cosine_neardup_pairs,
        embedding_dim,
        with_embedding_dim,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert embedding_dim(emb, "embedding") is None
    with pytest.raises(ValueError, match="dim is required"):
        cosine_neardup_pairs(emb, "vec_id", "embedding",
                             threshold=0.45, bits=4, tables=4)

    stamped = with_embedding_dim(emb, "embedding", 64)
    assert embedding_dim(stamped, "embedding") == 64
    a = cosine_neardup_pairs(stamped, "vec_id", "embedding",
                             threshold=0.45, bits=4, tables=4)
    b = cosine_neardup_pairs(emb, "vec_id", "embedding", dim=64,
                             threshold=0.45, bits=4, tables=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_embedding_dim_survives_parquet_roundtrip(spark, tmp_path):
    from jsonschema_valid_spark.functions.similarity import (
        embedding_dim,
        with_embedding_dim,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(10)
    p = str(tmp_path / "stamped")
    with_embedding_dim(emb, "embedding", 64).write.parquet(p)
    back = spark.read.parquet(p)
    assert embedding_dim(back, "embedding") == 64


def test_trained_index_roundtrip_matches_inline(spark, tmp_path):
    """write_ivf_pq_index with TRAINED quantizers serves the same answers
    as the inline trained pipeline — training changes the constants, not
    the layout contract."""
    from jsonschema_valid_spark.functions.similarity import (
        ivf_pq_rerank_topk,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from jsonschema_valid_spark.sources.ann_index import (
        ivf_pq_rerank_from_index,
        write_ivf_pq_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).first()["embedding"]]
    cents = train_ivf_centroids(emb, "embedding", dim=64, n_cells=8, iters=3)
    books = train_pq_codebooks(emb, "embedding", dim=64, m=8, n_codes=16,
                               iters=3)
    path = str(tmp_path / "trained_index")
    write_ivf_pq_index(emb, path, "vec_id", "embedding", dim=64, n_cells=8,
                       centroids=cents, books=books)
    served = [tuple(r) for r in ivf_pq_rerank_from_index(
        spark, path, "vec_id", "embedding", q, k=10, n_cells=8, n_probe=8,
        rerank=256, centroids=cents, books=books).collect()]
    inline = [tuple(r) for r in ivf_pq_rerank_topk(
        emb, "vec_id", "embedding", q, k=10, rerank=256,
        books=books).collect()]
    assert served == inline


# ---------------------------------------------------------------------------
# x-lmScore declarative keyword
# ---------------------------------------------------------------------------

def test_x_lmscore_keyword_matches_function(spark):
    """The declarative x-lmScore gate must flag exactly the documents the
    unigram_logprob_scores function scores below the threshold, and carry
    the score as `observed`; a context-supplied reference model must be
    honored."""
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.functions.text import (
        unigram_logprob_scores,
        unigram_model,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tau = -3.43
    res = CheckSuite({"properties": {"text": {
        "x-lmScore": {"minScore": tau, "vocabSize": 200}}}}).run(
        docs, key="doc_id")
    got = {(r["doc_id"], float(r["observed"])) for r in
           res.violations.collect()}
    scores = unigram_logprob_scores(docs, "doc_id", "text", vocab_size=200)
    want = {(str(r["doc_id"]), r["lm_score"]) for r in
            scores.where(F.col("lm_score") < tau).collect()}
    assert got == want and got  # non-vacuous
    verd = {r["check_id"]: r for r in res.verdicts.collect()}
    v = verd["properties/text/x-lmScore"]
    assert v["passed"] is False and v["metric_value"] == len(got)

    # context-supplied reference model (the CCNet shape): train on the
    # high-quality half, score everything against it
    ref_model = unigram_model(docs.where(F.col("doc_id") % 2 == 0), "text",
                              vocab_size=200)
    res2 = CheckSuite({"properties": {"text": {
        "x-lmScore": {"minScore": tau, "model": "@ref"}}}}).run(
        docs, key="doc_id", context={"ref": ref_model})
    want2 = unigram_logprob_scores(docs, "doc_id", "text", model=ref_model
                                   ).where(F.col("lm_score") < tau).count()
    assert res2.violations.count() == want2


def test_x_lmscore_spec_validation(spark):
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.suite.spec import SuiteError

    with pytest.raises(SuiteError):
        CheckSuite({"properties": {"text": {"x-lmScore": {}}}})
    with pytest.raises(SuiteError):
        CheckSuite({"properties": {"text": {"x-lmScore": {"minScore": "x"}}}})
    CheckSuite({"properties": {"text": {
        "x-lmScore": {"minScore": -4.0, "vocabSize": 100, "alpha": 0.5}}}})


def test_snapshot_vacuum_orphans(spark, tmp_path):
    """vacuum(): crash-orphaned staging dirs (staged, never published)
    are expired; published snapshots and fresh in-flight stages are
    untouched."""
    import os

    from jsonschema_valid_spark.checkpoint import SnapshotManifestCommit

    proto = SnapshotManifestCommit(str(tmp_path))
    df = spark.range(5).selectExpr("id AS doc_id")
    # published partition
    proto.commit(df, "violations", "p0")
    # crash between stage and publish: orphaned dir
    orphan = proto.stage(df, "violations", "p1")
    assert os.path.isdir(orphan)

    # age guard: a fresh unreferenced dir survives a conservative vacuum
    assert proto.vacuum("violations", min_age_seconds=3600) == []
    assert os.path.isdir(orphan)

    removed = proto.vacuum("violations", min_age_seconds=0)
    assert removed == [orphan]
    assert not os.path.isdir(orphan)
    # the published snapshot still reads back
    assert proto.read_partition(spark, "violations", "p0").count() == 5
    # idempotent; unknown kind is a no-op
    assert proto.vacuum("violations", min_age_seconds=0) == []
    assert proto.vacuum("nope") == []
