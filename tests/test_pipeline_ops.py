"""Tests for training-data pipeline operators: text analysis, dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search,
multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


# -- text -------------------------------------------------------------------

def test_text_profile(spark, docs):
    from jsonschema_valid_spark.functions.text import text_profile

    prof = text_profile(docs).cache()
    rows = prof.collect()
    assert all(0 <= r["punct_ratio"] <= 1 for r in rows)
    assert all(0 <= r["quality"] <= 1 for r in rows)
    assert all(r["n_words"] >= 1 for r in rows)
    assert all(r["n_subtokens"] >= r["n_words"] for r in rows)
    # corpus is English-ish word soup (median stopword ratio ~0.06) →
    # the heuristic should label a solid majority 'en'
    en = prof.where(F.col("lang_pred") == "en").count()
    assert en > 0.7 * prof.count()
    # fingerprint is deterministic and text-stable
    again = text_profile(docs).select("doc_id", "fp")
    j = prof.select("doc_id", F.col("fp").alias("fp1")).join(again, "doc_id")
    assert j.where(F.col("fp") != F.col("fp1")).count() == 0


def test_fingerprint_order_sensitive(spark):
    from jsonschema_valid_spark.functions.text import fingerprint

    df = spark.createDataFrame(
        [("a", "the quick brown fox"), ("b", "fox brown quick the"),
         ("c", "the quick brown fox")], "id string, t string")
    rows = {r["id"]: r["f"] for r in
            df.select("id", fingerprint(F.col("t")).alias("f")).collect()}
    assert rows["a"] == rows["c"]
    assert rows["a"] != rows["b"]


# -- dedup ------------------------------------------------------------------

def test_exact_dedup(spark):
    from jsonschema_valid_spark.functions.dedup import dedup_exact, exact_duplicates

    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa"), (5, "ccc")],
        "id long, t string")
    dropped = exact_duplicates(df, "id", "t")
    assert sorted(r["id"] for r in dropped.collect()) == [3, 4]
    kept = dedup_exact(df, "id", "t")
    assert sorted(r["id"] for r in kept.collect()) == [1, 2, 5]


@pytest.fixture(scope="module")
def neardup_corpus(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight").split()
    rows = []
    for i in range(30):
        words = list(base)
        if i % 3 == 1:
            words[5] = f"mut{i}"          # near-dup of base (1 word changed)
        elif i % 3 == 2:
            words = [f"w{i}_{j}" for j in range(20)]  # unrelated
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(rows, "id long, t string").cache()


def test_jaccard_pairs(neardup_corpus):
    from jsonschema_valid_spark.functions.dedup import jaccard_pairs

    pairs = jaccard_pairs(neardup_corpus, "id", "t", n=3, threshold=0.5)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    # identical copies (i%3==0) must all pair up; unrelated must not
    identical = [i for i in range(30) if i % 3 == 0]
    for i in identical:
        for j in identical:
            if i < j:
                assert (i, j) in got
    unrelated = [i for i in range(30) if i % 3 == 2]
    assert not any((a in unrelated or b in unrelated) for a, b in got)


def test_minhash_lsh_finds_identicals(neardup_corpus):
    from jsonschema_valid_spark.functions.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(neardup_corpus, "id", "t",
                              num_perm=64, bands=16, threshold=0.9)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    identical = [i for i in range(30) if i % 3 == 0]
    for i in identical:
        for j in identical:
            if i < j:
                assert (i, j) in got, f"missing identical pair ({i},{j})"
    # verified Jaccard filters out unrelated docs even if bucketed together
    unrelated = [i for i in range(30) if i % 3 == 2]
    assert not any((a in unrelated or b in unrelated) for a, b in got)


def test_simhash_near_dups(neardup_corpus):
    from jsonschema_valid_spark.functions.dedup import simhash_pairs, simhash64

    # identical docs: hamming 0 → always found
    pairs = simhash_pairs(neardup_corpus, "id", "t", max_hamming=3)
    got = {(r["a"], r["b"]): r["hamming"] for r in pairs.collect()}
    identical = [i for i in range(30) if i % 3 == 0]
    for i in identical:
        for j in identical:
            if i < j:
                assert got.get((i, j)) == 0
    # signature determinism
    s = neardup_corpus.select(simhash64(F.col("t")).alias("s")).collect()
    s2 = neardup_corpus.select(simhash64(F.col("t")).alias("s")).collect()
    assert [r["s"] for r in s] == [r["s"] for r in s2]


# -- similarity -------------------------------------------------------------

def test_brute_force_topk_matches_python(spark, emb):
    import math

    from jsonschema_valid_spark.functions.similarity import brute_force_topk

    q = emb.where(F.col("vec_id") == 0).first()["embedding"]
    got = brute_force_topk(emb, "vec_id", "embedding", list(q), k=5).collect()

    # python oracle
    rows = emb.select("vec_id", "embedding").collect()
    qn = math.sqrt(sum(x * x for x in q))

    def cos(v):
        num = sum(a * b for a, b in zip(q, v))
        return num / (qn * math.sqrt(sum(x * x for x in v)))

    expect = sorted(((cos(r["embedding"]), -r["vec_id"], r["vec_id"])
                     for r in rows), reverse=True)[:5]
    assert [r["vec_id"] for r in got] == [e[2] for e in expect]
    assert got[0]["vec_id"] == 0 and abs(got[0]["cos"] - 1.0) < 1e-9


def test_lsh_topk_contains_self(spark, emb):
    from jsonschema_valid_spark.functions.similarity import lsh_topk

    q = emb.where(F.col("vec_id") == 0).first()["embedding"]
    got = lsh_topk(emb, "vec_id", "embedding", list(q), k=5, bits=8).collect()
    assert got and got[0]["vec_id"] == 0  # self lands in its own bucket


def test_cosine_neardup_pairs(spark):
    from jsonschema_valid_spark.functions.similarity import cosine_neardup_pairs

    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.999, 0.04, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]), (3, [1.0, 0.001, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    got = {(r["a"], r["b"]) for r in
           cosine_neardup_pairs(df, "id", "v", threshold=0.99, bits=8,
                                dim=4).collect()}
    assert (0, 3) in got
    assert not any(2 in p for p in got)


# -- multimodal -------------------------------------------------------------

def test_multimodal_decode_plumbing(spark):
    from jsonschema_valid_spark.functions.multimodal import (
        decode_features, frame_sample, synth_media_table)

    media = synth_media_table(spark, 24)
    feats = decode_features(media, feat_dim=8).collect()
    assert len(feats) == 24
    assert all(len(r["features"]) == 8 for r in feats)
    assert all(r["n_bytes"] > 0 for r in feats)
    # determinism
    again = decode_features(synth_media_table(spark, 24), feat_dim=8).collect()
    assert sorted(map(repr, feats)) == sorted(map(repr, again))

    frames = frame_sample(media, every_n=2).collect()
    assert frames and all(r["frame_idx"] % 2 == 0 for r in frames)
    vids = {r["media_id"] for r in media.where("media_type='video'").collect()}
    assert {r["media_id"] for r in frames} == vids


def test_multimodal_stub_raises_without_fake(spark, monkeypatch):
    from jsonschema_valid_spark.functions import multimodal

    monkeypatch.setenv("SPARK_GRAFT_FAKE_DECODE", "0")
    media = multimodal.synth_media_table(spark, 4)
    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        multimodal.decode_features(media).collect()


def test_connected_components_chain_and_islands(spark):
    """Chain (worst case for naive min-propagation), a separate triangle,
    and an isolated pair — large-star/small-star must label every node with
    its component minimum."""
    from jsonschema_valid_spark.functions.dedup import connected_components

    edges = (
        # chain 1-2-3-4-5-6-7-8 (diameter 7)
        [(i, i + 1) for i in range(1, 8)]
        # triangle 20-21-22
        + [(20, 21), (21, 22), (20, 22)]
        # pair 30-31 (listed big-first: orientation must not matter)
        + [(31, 30)]
    )
    pairs = spark.createDataFrame(edges, "a: long, b: long")
    got = {r["id"]: r["cluster_id"]
           for r in connected_components(pairs, "a", "b").collect()}
    want = {i: 1 for i in range(1, 9)}
    want.update({20: 20, 21: 20, 22: 20, 30: 30, 31: 30})
    assert got == want


def test_connected_components_empty_and_string_keys(spark):
    from jsonschema_valid_spark.functions.dedup import connected_components

    empty = spark.createDataFrame([], "a: string, b: string")
    assert connected_components(empty, "a", "b").count() == 0

    pairs = spark.createDataFrame(
        [("doc-9", "doc-2"), ("doc-2", "doc-5")], "a: string, b: string")
    got = {r["id"]: r["cluster_id"]
           for r in connected_components(pairs, "a", "b").collect()}
    assert got == {"doc-9": "doc-2", "doc-2": "doc-2", "doc-5": "doc-2"}


def test_neardup_survivors(spark):
    """One survivor (min key) per component; untouched rows survive as
    singleton clusters; the survivor table partitions the corpus."""
    from jsonschema_valid_spark.functions.dedup import neardup_survivors

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id: long, text: string")
    pairs = spark.createDataFrame(
        [(1, 4), (4, 7), (2, 3)], "a: long, b: long")
    out = neardup_survivors(docs, "doc_id", pairs, "a", "b").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 10
    assert [by_id[i]["cluster_id"] for i in range(10)] == [
        0, 1, 2, 2, 1, 5, 6, 1, 8, 9]
    survivors = {i for i in range(10) if by_id[i]["is_survivor"]}
    assert survivors == {0, 1, 2, 5, 6, 8, 9}


def test_hash_sample_deterministic_and_nested(spark):
    from jsonschema_valid_spark.functions.sampling import hash_sample

    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s10 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect()}
    s10b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect()}
    s30 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect()}
    assert s10 == s10b                      # deterministic
    assert s10 <= s30                       # threshold gate => nested
    assert 0.05 < len(s10) / 2000 < 0.15    # near the nominal rate
    other_seed = {r["doc_id"]
                  for r in hash_sample(docs, "doc_id", 0.1, seed=9).collect()}
    assert other_seed != s10                # seed changes the sample


def test_stratified_sample_rates_and_portability(spark):
    from jsonschema_valid_spark.functions.sampling import stratified_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)],
        "doc_id: long, lang: string")
    out = stratified_sample(docs, "doc_id", "lang",
                            rates={"en": 0.4}, default_rate=0.05)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 300 < counts.get("en", 0) < 500
    assert counts.get("fr", 0) < 120
    # zero-shuffle plan: a pure filter over the scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_train_holdout_split_partitions(spark):
    from jsonschema_valid_spark.functions.sampling import train_holdout_split

    docs = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    train, hold = train_holdout_split(docs, "doc_id", 0.2)
    t = {r["doc_id"] for r in train.collect()}
    h = {r["doc_id"] for r in hold.collect()}
    assert t | h == set(range(1000)) and not (t & h)


def test_contamination_and_decontaminate(spark):
    from jsonschema_valid_spark.functions.decontamination import (
        contamination,
        decontaminate,
    )

    bench = spark.createDataFrame(
        [("the secret benchmark answer is forty two exactly",)], "text: string")
    docs = spark.createDataFrame(
        [(1, "a clean document about spark joins and shuffles here"),
         (2, "leaked: the secret benchmark answer is forty two exactly wow"),
         (3, "another clean one with plenty of ordinary words inside")],
        "doc_id: long, text: string")
    rep = {r["doc_id"]: r for r in
           contamination(docs, bench, "doc_id", "text", n=5).collect()}
    assert set(rep) == {2}
    assert rep[2]["n_contaminated"] >= 3       # the leaked 8-word span
    clean = decontaminate(docs, bench, "doc_id", "text", n=5)
    assert {r["doc_id"] for r in clean.collect()} == {1, 3}


def test_repetition_metrics(spark):
    from jsonschema_valid_spark.functions.text import repetition_metrics

    docs = spark.createDataFrame(
        [(1, "spam spam spam spam"),
         (2, "all four words differ")],
        "doc_id: long, text: string")
    out = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    # doc 1: words 4 occurrences/1 distinct = 0.75 dup; bigrams 3/1 ≈ 0.6667
    assert out[1]["dup_word_ratio"] == 0.75
    assert abs(out[1]["dup_bigram_ratio"] - 2 / 3) < 1e-6
    assert out[2]["dup_word_ratio"] == 0.0
    assert out[2]["dup_bigram_ratio"] == 0.0


def test_pq_topk_self_match_and_rerank_window(spark, emb):
    """PQ ADC ranking: the query's own (quantized) row scores highest, and
    an exact-rerank window of 50 recovers most of the exact top-10 — the
    honest recall level for UNTRAINED seeded codebooks on near-random
    vectors (production swaps in per-subspace k-means; topology
    identical)."""
    from jsonschema_valid_spark.functions.similarity import pq_topk

    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    top50 = pq_topk(emb, "vec_id", "embedding", q, k=50)
    ids = [r["vec_id"] for r in top50.collect()]
    assert ids[0] == 0  # self-match survives quantization

    from jsonschema_valid_spark.functions.similarity import brute_force_topk
    exact10 = {r["vec_id"] for r in
               brute_force_topk(emb, "vec_id", "embedding", q, k=10).collect()}
    assert len(exact10 & set(ids)) >= 5


def test_pq_encode_deterministic_and_bounded(spark, emb):
    from jsonschema_valid_spark.functions.similarity import (
        pq_codebooks,
        pq_encode,
    )

    books = pq_codebooks(64, m=8, k=16, seed=13)
    enc = emb.select(
        "vec_id", pq_encode(F.col("embedding").cast("array<double>"),
                            books).alias("codes"))
    rows = {r["vec_id"]: list(r["codes"]) for r in enc.collect()}
    rows2 = {r["vec_id"]: list(r["codes"]) for r in enc.collect()}
    assert rows == rows2
    assert all(len(c) == 8 and all(1 <= x <= 16 for x in c)
               for c in rows.values())


def test_pack_sequences_layout(spark):
    from jsonschema_valid_spark.functions.packing import (
        pack_sequences,
        packing_stats,
    )

    rows = [("a", f"d{i}", n) for i, n in enumerate([300, 300, 200, 100, 700])]
    df = spark.createDataFrame(rows, "src: string, doc_id: string, n_tok: int")
    packed = {r["doc_id"]: r for r in
              pack_sequences(df, "doc_id", "n_tok", 512,
                             partition_col="src").collect()}
    # order: 700(d4), 300(d0), 300(d1), 200(d2), 100(d3) — starts 0,700,1000,1300,1500
    assert (packed["d4"]["bin_id"], packed["d4"]["bin_offset"]) == (0, 0)
    assert packed["d4"]["oversize"] is True
    assert (packed["d0"]["bin_id"], packed["d0"]["bin_offset"]) == (1, 188)
    assert (packed["d1"]["bin_id"], packed["d1"]["bin_offset"]) == (1, 488)
    assert (packed["d2"]["bin_id"], packed["d2"]["bin_offset"]) == (2, 276)
    assert (packed["d3"]["bin_id"], packed["d3"]["bin_offset"]) == (2, 476)
    stats = packing_stats(
        pack_sequences(df, "doc_id", "n_tok", 512, partition_col="src"),
        "n_tok", partition_col="src").collect()[0]
    assert stats["total_tokens"] == 1600 and stats["oversize_seqs"] == 1


def test_pack_sequences_partitions_independent(spark):
    """Each partition packs from offset 0 — partitions never share bins."""
    from jsonschema_valid_spark.functions.packing import pack_sequences

    df = spark.createDataFrame(
        [("a", "x", 100), ("b", "y", 100)],
        "src: string, doc_id: string, n_tok: int")
    packed = {r["doc_id"]: r for r in
              pack_sequences(df, "doc_id", "n_tok", 512,
                             partition_col="src").collect()}
    assert packed["x"]["bin_id"] == 0 and packed["x"]["bin_offset"] == 0
    assert packed["y"]["bin_id"] == 0 and packed["y"]["bin_offset"] == 0


def test_mix_to_budget(spark):
    from jsonschema_valid_spark.functions.sampling import mix_to_budget

    rows = ([("big", f"b{i}", 10) for i in range(1000)]     # 10k weight
            + [("small", f"s{i}", 10) for i in range(40)])  # 400 weight
    df = spark.createDataFrame(rows, "src: string, doc_id: string, w: int")
    out = mix_to_budget(df, "doc_id", "src", "w", budget_per_stratum=500.0)
    got = {r["src"]: r["n"] for r in
           out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert got.get("small") == 40            # under budget: rate 1, keep all
    assert 20 < got.get("big", 0) < 90       # ~5% of 1000 (Bernoulli spread)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        mix_to_budget(df, "doc_id", "doc_id", "w", 500.0, max_strata=10)


def test_top_ngrams(spark):
    from jsonschema_valid_spark.functions.text import top_ngrams

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "a dog ran")],
        "doc_id: long, text: string")
    top = [(r["gram"], r["doc_freq"]) for r in
           top_ngrams(docs, "text", n=2, k=3).collect()]
    assert top[0] == ("the cat", 2)
    assert all(f == 1 for _, f in top[1:])


def test_int8_quantization_roundtrip(spark, emb):
    from jsonschema_valid_spark.functions.similarity import (
        cosine,
        dequantize_int8,
        quantize_int8,
    )

    v = F.col("embedding").cast("array<double>")
    qs = quantize_int8(F.col("embedding"))
    dq = dequantize_int8(qs)
    rep = emb.select(
        qs["scale"].alias("scale"),
        F.array_max(F.zip_with(v, dq, lambda a, b: F.abs(a - b))).alias("err"),
        cosine(v, dq).alias("cos"),
        F.array_max(F.transform(qs["q"], lambda c: F.abs(c.cast("int"))))
        .alias("qmax"),
    ).collect()
    for r in rep:
        assert r["err"] <= r["scale"] / 2 + 1e-12   # round() error bound
        assert r["cos"] > 0.999                      # near-lossless direction
        assert r["qmax"] <= 127


def test_int8_quantization_zero_vector(spark):
    from jsonschema_valid_spark.functions.similarity import (
        dequantize_int8,
        quantize_int8,
    )

    df = spark.createDataFrame([([0.0] * 4,)], "v: array<float>")
    row = df.select(quantize_int8(F.col("v")).alias("qs")).select(
        F.col("qs.scale"), F.col("qs.q"),
        dequantize_int8(F.col("qs")).alias("dq")).first()
    assert row["scale"] == 0.0
    assert list(row["q"]) == [0, 0, 0, 0]
    assert list(row["dq"]) == [0.0, 0.0, 0.0, 0.0]


def test_blocklist_whole_word_semantics(spark):
    from jsonschema_valid_spark.functions.text import (
        blocklist_filter,
        blocklist_hits,
    )

    df = spark.createDataFrame(
        [(1, "the spark table scan"),      # both terms
         (2, "clean words only here"),     # none
         (3, "SPARK and scan twice spark"),  # case-insensitive, distinct=2
         (4, "sparkle scanner")],          # substrings do NOT match
        "doc_id: long, text: string")
    hits = {r["doc_id"]: r["h"] for r in df.select(
        "doc_id",
        blocklist_hits(F.col("text"), ["spark", "scan"]).alias("h")).collect()}
    assert hits == {1: 2, 2: 0, 3: 2, 4: 0}
    kept = {r["doc_id"]
            for r in blocklist_filter(df, "text", ["spark", "scan"]).collect()}
    assert kept == {2, 4}
    # regex metacharacters in terms are escaped, empty list is a no-op
    assert df.select(blocklist_hits(F.col("text"), ["a.c"]).alias("h")) \
        .agg(F.sum("h")).first()[0] == 0
    assert blocklist_filter(df, "text", []).count() == 4


def test_pii_scan(spark):
    from jsonschema_valid_spark.functions.text import pii_scan

    df = spark.createDataFrame(
        [(1, "contact me at jane.doe@example.com or +1 (555) 123-4567"),
         (2, "served from 192.168.0.1 see https://example.com/x?y=1"),
         (3, "no personal data in this row at all")],
        "doc_id: long, text: string")
    rows = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert rows[1]["pii_email"] == 1 and rows[1]["pii_phone"] >= 1
    assert rows[2]["pii_ipv4"] == 1 and rows[2]["pii_url"] == 1
    assert rows[3]["pii_total"] == 0
    assert rows[1]["pii_total"] >= 2


def test_deterministic_shuffle_stable_and_complete(spark):
    from jsonschema_valid_spark.functions.sampling import (
        deterministic_shuffle,
    )

    df = spark.createDataFrame([(f"d{i}",) for i in range(200)],
                               "doc_id: string")
    a = [r["doc_id"] for r in
         deterministic_shuffle(df, "doc_id", seed=7).collect()]
    b = [r["doc_id"] for r in
         deterministic_shuffle(df.repartition(13), "doc_id",
                               seed=7).collect()]
    c = [r["doc_id"] for r in
         deterministic_shuffle(df, "doc_id", seed=8).collect()]
    assert a == b                      # partitioning-invariant
    assert sorted(a) == sorted(c)      # permutation, nothing lost
    assert a != c                      # seed changes the order
    assert a != sorted(a)              # actually shuffled


def test_token_histogram_counts(spark):
    from jsonschema_valid_spark.functions.text import token_histogram

    df = spark.createDataFrame(
        [([1, 2, 2],), ([2, 3],), ([],)], "tokens: array<int>")
    rows = {r["token"]: r["count"]
            for r in token_histogram(df, "tokens").collect()}
    assert rows == {1: 1, 2: 3, 3: 1}
    top = token_histogram(df, "tokens", top_n=1).collect()
    assert [(r["token"], r["count"]) for r in top] == [(2, 3)]


def test_fixed_k_per_group(spark):
    from jsonschema_valid_spark.functions.sampling import fixed_k_per_group
    from jsonschema_valid_spark.sources.sequences import load_sequences
    from tests.conftest import SF_DIR as _SF

    seq = load_sequences(spark, _SF).where("source IS NOT NULL")
    out = fixed_k_per_group(seq, "doc_id", "source", k=5, seed=3).cache()
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    avail = {r["source"]: r["n"] for r in
             seq.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for src, n in per.items():
        assert n == min(5, avail[src])
    # partitioning-invariant: same keys out after a repartition
    out2 = fixed_k_per_group(seq.repartition(13), "doc_id", "source",
                             k=5, seed=3)
    a = sorted((r["source"], r["doc_id"]) for r in out.collect())
    b = sorted((r["source"], r["doc_id"]) for r in out2.collect())
    assert a == b
    # different seed -> (almost surely) different selection
    out3 = fixed_k_per_group(seq, "doc_id", "source", k=5, seed=4)
    c = sorted((r["source"], r["doc_id"]) for r in out3.collect())
    assert c != a
    import pytest as _pt
    with _pt.raises(ValueError, match="k must"):
        fixed_k_per_group(seq, "doc_id", "source", k=0)


# ------------------------------------------------------- weighted sampling

def test_weighted_sample_proportionality_and_determinism(spark):
    from jsonschema_valid_spark.functions.sampling import weighted_sample

    df = spark.range(20000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, 1.0).otherwise(10.0).alias("w"))
    out = weighted_sample(df, key="id", weight="w", rate=0.05, seed=1)
    light = out.where(F.col("w") == 1.0).count()
    heavy = out.where(F.col("w") == 10.0).count()
    # P=0.05 vs P=0.5: the heavy class must be sampled ~10x as often
    assert light and 7 * light < heavy < 13 * light
    # deterministic: identical draw on rerun
    again = weighted_sample(df, key="id", weight="w", rate=0.05, seed=1)
    assert sorted(r.id for r in out.collect()) \
        == sorted(r.id for r in again.collect())
    # different seed -> different draw
    other = weighted_sample(df, key="id", weight="w", rate=0.05, seed=2)
    assert sorted(r.id for r in other.collect()) \
        != sorted(r.id for r in out.collect())
    # zero/NULL weights never selected
    nw = df.withColumn("w", F.when(F.col("id") < 10000, None)
                       .otherwise(F.lit(0.0)))
    assert weighted_sample(nw, key="id", weight="w", rate=10.0).count() == 0


def test_weighted_sample_zero_shuffle_plan(spark):
    from jsonschema_valid_spark.functions.sampling import weighted_sample

    df = spark.range(100).select(F.col("id"), F.lit(2.0).alias("w"))
    out = weighted_sample(df, key="id", weight="w", rate=0.1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_weighted_k_per_group_exact_k_and_bias(spark):
    from jsonschema_valid_spark.functions.sampling import (
        weighted_k_per_group,
    )

    df = spark.range(4000).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("g"),
        # 5 coprime to 4: every group gets its share of heavy rows
        F.when(F.col("id") % 5 == 0, 50.0).otherwise(1.0).alias("w"))
    out = weighted_k_per_group(df, key="id", group="g", weight="w",
                               k=25, seed=7)
    per = {r.g: r.cnt for r in
           out.groupBy("g").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert per == {"0": 25, "1": 25, "2": 25, "3": 25}  # exact k
    # the 10% heavy rows (w=50) must dominate the winners
    heavy_frac = out.where(F.col("w") == 50.0).count() / 100.0
    assert heavy_frac > 0.5
    # partitioning-invariant: same winners from a different layout
    re = weighted_k_per_group(df.repartition(17), key="id", group="g",
                              weight="w", k=25, seed=7)
    assert sorted(r.id for r in re.collect()) \
        == sorted(r.id for r in out.collect())


# ------------------------------------------------------------- salted join

def test_salted_join_equals_plain_join(spark):
    from jsonschema_valid_spark.operators.skew import salted_join

    # hot key: 80% of left rows share key 0; right has NULL keys too
    left = spark.range(1000).select(
        F.when(F.col("id") % 5 != 0, 0).otherwise(F.col("id"))
        .alias("k"), F.col("id").alias("lv"))
    right = spark.createDataFrame(
        [(0, "hot"), (5, "a"), (10, "b"), (None, "nullkey")],
        "k: long, rv: string")
    got = salted_join(left, right, on="k", how="inner", salt=4)
    plain = left.join(right, "k", "inner")
    assert sorted((r.k, r.lv, r.rv) for r in got.collect()) \
        == sorted((r.k, r.lv, r.rv) for r in plain.collect())
    # NULL keys never match (plain-join semantics)
    lnull = left.withColumn("k", F.when(F.col("lv") == 1, None)
                            .otherwise(F.col("k")))
    gn = salted_join(lnull, right, on="k", how="inner", salt=4)
    assert gn.where(F.col("k").isNull()).count() == 0

    # left join keeps unmatched left rows exactly once (not per replica)
    gl = salted_join(left, right, on="k", how="left", salt=4)
    assert gl.count() == 1000
    assert (gl.where(F.col("rv").isNull()).count()
            == left.join(right, "k", "left_anti").count())

    with pytest.raises(ValueError):
        salted_join(left, right, on="k", how="full")


def test_salted_join_spreads_hot_key(spark):
    from jsonschema_valid_spark.operators.skew import salted_join

    left = spark.range(1000).select(F.lit(0).alias("k"),
                                    F.col("id").alias("lv"))
    right = spark.createDataFrame([(0, "x")], "k: long, rv: string")
    j = salted_join(left, right, on="k", salt=8)
    # the join key really includes the salt: all 8 sub-keys carry rows
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    assert j.count() == 1000


# ---------------------------------------------------------------- chunking

def test_chunk_sequences_coverage_and_overlap(spark):
    from jsonschema_valid_spark.functions.packing import chunk_sequences

    rows = [
        (1, list(range(10))),   # n == max_len: one chunk
        (2, list(range(25))),   # 10/stride 5: chunks at 0,5,10,15
        (3, list(range(3))),    # shorter than max_len: one chunk
        (4, []),                # empty: no chunks
        (5, None),              # NULL: no chunks
    ]
    df = spark.createDataFrame(rows, "id: long, toks: array<int>")
    out = chunk_sequences(df, key="id", tokens_col="toks",
                          max_len=10, stride=5)
    got = {(r.id, r.chunk_idx): r.chunk_tokens for r in out.collect()}
    assert {k[0] for k in got} == {1, 2, 3}
    assert got[(1, 0)] == list(range(10))
    assert got[(3, 0)] == [0, 1, 2]
    # doc 2: starts 0,5,10,15 — overlapping, last is the 10-token tail
    assert [got[(2, i)] for i in range(4)] == [
        list(range(0, 10)), list(range(5, 15)),
        list(range(10, 20)), list(range(15, 25))]
    # every token covered: union of chunks == original set
    assert sorted({t for i in range(4) for t in got[(2, i)]}) \
        == list(range(25))


def test_chunk_sequences_disjoint_and_min_tail(spark):
    from jsonschema_valid_spark.functions.packing import chunk_sequences

    df = spark.createDataFrame([(1, list(range(21)))],
                               "id: long, toks: array<int>")
    # disjoint (stride == max_len): 10+10+1, the 1-token tail kept
    out = chunk_sequences(df, key="id", tokens_col="toks", max_len=10)
    assert [r.chunk_len for r in
            out.orderBy("chunk_idx").collect()] == [10, 10, 1]
    # min_tail=5 drops the 1-token tail
    trimmed = chunk_sequences(df, key="id", tokens_col="toks",
                              max_len=10, min_tail=5)
    assert [r.chunk_len for r in
            trimmed.orderBy("chunk_idx").collect()] == [10, 10]
    # a short sequence's ONLY chunk survives min_tail
    short = chunk_sequences(
        spark.createDataFrame([(1, [7, 8])], "id: long, toks: array<int>"),
        key="id", tokens_col="toks", max_len=10, min_tail=5)
    assert short.count() == 1

    with pytest.raises(ValueError):
        chunk_sequences(df, key="id", tokens_col="toks", max_len=10,
                        stride=11)


def test_chunk_sequences_no_shuffle(spark):
    from jsonschema_valid_spark.functions.packing import chunk_sequences

    df = spark.range(100).select(
        F.col("id"), F.sequence(F.lit(0), (F.col("id") % 50).cast("int"))
        .alias("toks"))
    out = chunk_sequences(df, key="id", tokens_col="toks", max_len=8,
                          stride=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_leakage_safe_split_invariants(spark):
    """(1) disjoint + exhaustive; (2) no near-dup cluster straddles the
    cut (the leakage channel it exists to close); (3) a row in no pair
    splits exactly as train_holdout_split would place its own id as
    cluster; (4) deterministic across reruns."""
    from jsonschema_valid_spark.functions.dedup import jaccard_pairs
    from jsonschema_valid_spark.functions.sampling import (
        leakage_safe_split,
        train_holdout_split,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.2)
    train, hold = leakage_safe_split(docs, "doc_id", pairs,
                                     holdout_rate=0.3, seed=9)
    t_ids = {r["doc_id"] for r in train.select("doc_id").collect()}
    h_ids = {r["doc_id"] for r in hold.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert t_ids | h_ids == all_ids
    assert not (t_ids & h_ids)
    assert t_ids and h_ids  # 30% cut on this fixture hits both sides

    # no cluster straddles: both endpoints of every pair share a side
    for r in pairs.collect():
        assert (r["a"] in t_ids) == (r["b"] in t_ids), (r["a"], r["b"])

    # singletons (rows in no pair) match the per-row split exactly
    paired = {r["a"] for r in pairs.collect()} | {
        r["b"] for r in pairs.collect()}
    pt, ph = train_holdout_split(docs, "doc_id", holdout_rate=0.3, seed=9)
    pt_ids = {r["doc_id"] for r in pt.select("doc_id").collect()}
    for did in all_ids - paired:
        assert (did in t_ids) == (did in pt_ids), did

    # deterministic rerun
    t2, _ = leakage_safe_split(docs, "doc_id", pairs, holdout_rate=0.3,
                               seed=9)
    assert {r["doc_id"] for r in t2.select("doc_id").collect()} == t_ids
