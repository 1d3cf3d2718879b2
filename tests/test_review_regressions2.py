"""Regressions from the round-4 deep review of relational.py/pipeline.py."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_stratified_sample_rate_one_keeps_all(spark):
    """rate >= 1.0 keeps EVERY doc of the stratum (the old 5-char '10000'
    threshold compared lexicographically below most 4-hex prefixes and
    silently dropped ~15/16 of the stratum)."""
    from voyagr_spark.relational import documents, stratified_sample

    lang = documents(spark, SF).select("lang").first()["lang"]
    total = documents(spark, SF).filter(F.col("lang") == lang).count()
    kept = stratified_sample(spark, SF, rates={lang: 1.0}).count()
    assert kept == total and total > 0
    # and rate 0.5 keeps roughly half (binomial tolerance), not 1/32
    half = stratified_sample(spark, SF, rates={lang: 0.5}).count()
    assert 0.25 * total < half < 0.75 * total


def test_collate_leaves_stopwords_alone(spark, built_index, corpus_pdf):
    """A stop-filtered word is not misspelled — the collator must pass it
    through instead of substituting an arbitrary dictionary term."""
    from voyagr_spark.relational import collate_spelling

    src = spark.createDataFrame(corpus_pdf)
    row = collate_spelling(built_index, src, "the file").collect()[0]
    assert row["collation"] == "the file"


def test_facet_query_duplicate_terms(spark):
    """Two facet names over the same term each get their own (equal)
    count — create_map would raise Duplicate map key here."""
    from voyagr_spark.relational import facet_query

    term = "fast"
    out = {r["facet"]: r["n"]
           for r in facet_query(spark, SF, {"a": term, "b": term}).collect()}
    assert set(out) == {"a", "b"} and out["a"] == out["b"] > 0


def test_simhash_radius_vs_bands_guard(spark):
    from voyagr_spark.pipeline import SIMHASH_BANDS, simhash_near_dup_pairs

    sigs = spark.createDataFrame([(0, 5), (1, 7)], "doc_id long, simhash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dup_pairs(sigs, max_hamming=SIMHASH_BANDS)


def test_free_text_suggest_unigram_trailing_space(spark):
    """grams=1 with a trailing-space key has no predictable order — an
    empty frame, not IndexError."""
    from voyagr_spark.relational import free_text_suggest

    out = free_text_suggest(spark, SF, "fast ", 10, grams=1)
    assert out.collect() == []


def test_pack_sequences_deterministic_ranges(spark):
    """pack ids are a pure function of the corpus (no partition-id
    dependence): two independent evaluations agree exactly."""
    from voyagr_spark.relational import pack_sequences

    a = sorted(map(tuple, pack_sequences(spark, SF, 512).collect()))
    b = sorted(map(tuple, pack_sequences(spark, SF, 512).collect()))
    assert a == b and a
