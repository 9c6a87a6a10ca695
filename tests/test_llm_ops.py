"""Property tests for the probabilistic LLM operators (the ones the
SQL oracle can't express): LSH recall vs exact baselines, SimHash
structure, multimodal batch semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_end_data_pipeline__spark.operators import dedup, multimodal, similarity
from end_end_data_pipeline__spark.sources import lake
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return lake.load_table(spark, "documents", SF_SMOKE).cache()


@pytest.fixture(scope="module")
def emb(spark):
    return lake.load_table(spark, "embeddings", SF_SMOKE).cache()


def test_minhash_lsh_recall_vs_exact(spark, docs):
    """Every exact-jaccard pair ≥ 0.7 must be found by the banded LSH
    (32/8 S-curve ⇒ ~99.9% collision at j=0.7; the fixture is fixed, so
    this is deterministic)."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.7).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", verify_threshold=0.7
        ).collect()
    }
    assert exact, "fixture should contain high-jaccard pairs"
    missed = exact - lsh
    assert not missed, f"LSH missed high-similarity pairs: {missed}"
    # precision is exact by construction (verified candidates)
    assert lsh <= exact


def test_minhash_lsh_precision_threshold(spark, docs):
    out = dedup.minhash_lsh_pairs(docs, "text", "doc_id", verify_threshold=0.5)
    assert out.filter(F.col("jaccard") < 0.5).count() == 0


def test_simhash_identical_texts_equal_sigs(spark):
    df = spark.createDataFrame(
        [(1, "spark window agg join"), (2, "spark window agg join"),
         (3, "completely different words entirely")],
        "doc_id long, text string",
    )
    sigs = {r["doc"]: r["simhash"] for r in dedup.simhash(df, "text", "doc_id").collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]
    pairs = dedup.simhash_neardup_pairs(df, "text", "doc_id", max_hamming=3).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 2)}


def test_ann_lsh_recall_at_10(spark, emb):
    """Multi-probe sign-LSH must recover a solid share of the true
    top-10 (fixed data + fixed hyperplanes ⇒ deterministic)."""
    probes = emb.filter(F.col("vec_id") < 5)
    truth = similarity.brute_force_topk(emb, probes, k=10).collect()
    approx = similarity.lsh_topk(emb, probes, k=10).collect()
    t = {(r["probe_id"], r["neighbor_id"]) for r in truth}
    a = {(r["probe_id"], r["neighbor_id"]) for r in approx}
    recall = len(t & a) / len(t)
    assert recall >= 0.8, f"recall@10 {recall:.2f}"


def test_neardup_pairs_find_injected_duplicates(spark, emb):
    base = emb.select("vec_id", similarity.as_double("embedding").alias("e"))
    inj = base.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(F.col("e"), lambda x, i: F.when(i == 0, x + 0.05).otherwise(x)).alias("e"),
    )
    corpus = base.unionByName(inj)
    found = similarity.cosine_neardup_pairs(
        corpus, "e", "vec_id", threshold=0.99
    ).collect()
    expected = {(r["vec_id"], r["vec_id"] + 100000) for r in inj.select(
        (F.col("vec_id") - 100000).alias("vec_id")).collect()}
    got = {(r["doc_a"], r["doc_b"]) for r in found}
    assert expected <= got, f"missed {expected - got}"


def test_multimodal_batch_shapes(spark, docs):
    media = multimodal.attach_media(docs, F.encode(F.col("text"), "utf-8"), "image", "raw")
    feats = multimodal.extract_features(media, "media", "doc_id", dims=8)
    row = feats.first()
    assert len(row["feature"]) == 8
    assert abs(sum(row["feature"]) - 1.0) < 1e-6  # L1-normalized
    assert feats.count() == docs.count()
    # metadata struct carries byte length
    m = media.select("media_meta.n_bytes", F.length("text").alias("n")).first()
    assert m["n_bytes"] == m["n"]


def test_multimodal_real_decoder_is_stubbed(spark, docs):
    media = multimodal.attach_media(docs, F.encode(F.col("text"), "utf-8"), "image", "raw")
    with pytest.raises(NotImplementedError):
        multimodal.extract_features(media, "media", "doc_id", decoder="image")
