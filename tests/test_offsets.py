"""Stored token offsets (..._AND_OFFSETS analog, IndexOptions.java:36-53).

The Spark-native re-expression stores ONE offsets record per doc on its
kind=doc row (per-position char spans, pre-stop ordinals) instead of
interleaving offsets with positions in the postings
(Lucene50PostingsWriter.java:253-301) — positions ARE pre-stop ordinals,
so offset_of[position] recovers exactly the interleaved form's data.
Opt-in at build time (index_offsets=True), mirroring Lucene's per-field
IndexOptions choice.
"""

import re

import numpy as np
import pytest


@pytest.fixture(scope="module")
def offsets_index(spark, corpus_pdf, tmp_path_factory):
    from voyagr_spark.indexer import build_index

    d = tmp_path_factory.mktemp("index_offs")
    docs = spark.createDataFrame(corpus_pdf).repartition(4)
    return build_index(spark, docs, str(d), num_segments=4,
                       index_offsets=True)


def test_codec_roundtrip():
    from voyagr_spark.codec import decode_doc_offsets, encode_doc_offsets

    rng = np.random.default_rng(5)
    counts = np.array([3, 0, 9, 1])
    starts, ends = [], []
    for c in counts:
        s = np.sort(rng.choice(500, size=c, replace=False))
        starts.append(s)
        ends.append(s + rng.integers(1, 6, size=c))
    flat_s, flat_e = np.concatenate(starts), np.concatenate(ends)
    blobs = encode_doc_offsets(flat_s, flat_e, counts)
    assert blobs[1] is None
    k = 0
    for i, c in enumerate(counts):
        if c == 0:
            continue
        ds, de = decode_doc_offsets(blobs[i])
        assert np.array_equal(ds, flat_s[k:k + c])
        assert np.array_equal(de, flat_e[k:k + c])
        k += c


def test_analysis_offsets_match_regex_spans():
    import pandas as pd

    from voyagr_spark.analysis import TOKEN_PATTERN, analyze_flat_codes

    texts = pd.Series([
        "Hello world_ FOO.bar 12,345 the quick",
        "", "one", "don't stop class:method a,b",
        "café non ascii doc",  # regex-fallback doc: no offsets
    ])
    *_, (st, en, cnt) = analyze_flat_codes(texts, want_offsets=True)
    assert cnt[4] == 0  # slow-path doc reports offsets unavailable
    rx = re.compile(TOKEN_PATTERN)
    b = np.concatenate(([0], np.cumsum(cnt)))
    for i, t in enumerate(texts):
        if cnt[i] == 0:
            continue
        spans = [(m.start(), m.end()) for m in rx.finditer(t.lower())]
        got = list(zip(st[b[i]:b[i + 1]].tolist(), en[b[i]:b[i + 1]].tolist()))
        assert got == spans, i


def test_indexed_offsets_decode_to_token_spans(offsets_index, corpus_pdf):
    from voyagr_spark.analysis import TOKEN_PATTERN
    from voyagr_spark.codec import decode_doc_offsets

    assert offsets_index.meta["offsets"] is True
    rows = (
        offsets_index.docstats()
        .select("doc_id", "repo", "path", "commit", "off_blob")
        .limit(20)
        .collect()
    )
    rx = re.compile(TOKEN_PATTERN)
    by_key = corpus_pdf.set_index(["repo", "path", "commit"])["content"]
    checked = 0
    for r in rows:
        blob = r["off_blob"]
        assert blob is not None  # synthetic corpus is pure-ASCII fast path
        st, en = decode_doc_offsets(bytes(blob))
        text = by_key.loc[(r["repo"], r["path"], r["commit"])]
        spans = [(m.start(), m.end()) for m in rx.finditer(text.lower())]
        assert list(zip(st.tolist(), en.tolist())) == spans
        checked += 1
    assert checked == 20


def test_default_build_stores_no_offsets(built_index):
    row = built_index.docstats().select("off_blob").limit(1).collect()[0]
    assert row["off_blob"] is None
    assert not built_index.meta.get("offsets")


def test_highlight_offsets_wraps_index_derived_spans(
    spark, offsets_index, corpus_pdf
):
    from voyagr_spark.highlight import highlight, highlight_offsets
    from voyagr_spark.search import search

    source = spark.createDataFrame(corpus_pdf)
    res = search(offsets_index, "file", k=5)
    got = {
        r["doc_id"]: r["fragment"]
        for r in highlight_offsets(
            offsets_index, res, source, "file", fragment_size=80
        ).collect()
    }
    assert len(got) == 5
    # every wrapped span is exactly a query-term token
    for frag in got.values():
        hits = re.findall(r"<em>(.*?)</em>", frag)
        assert hits and all(h.lower() == "file" for h in hits)
    # parity with the re-analysis highlighter on the same results
    want = {
        r["doc_id"]: r["fragment"]
        for r in highlight(
            offsets_index, res, source, "file", fragment_size=80
        ).collect()
    }
    assert got == want


def test_highlight_offsets_refuses_offsetless_index(
    spark, built_index, corpus_pdf
):
    from voyagr_spark.highlight import highlight_offsets
    from voyagr_spark.search import search

    source = spark.createDataFrame(corpus_pdf)
    res = search(built_index, "file", k=3)
    with pytest.raises(ValueError, match="index_offsets"):
        highlight_offsets(built_index, res, source, "file")


def test_append_preserves_offsets(spark, offsets_index, corpus_pdf):
    from voyagr_spark.codec import decode_doc_offsets
    from voyagr_spark.streaming import append_batch

    batch = spark.createDataFrame(
        [("zrepo", "zpath", "zc", "en", "file file batch zz")],
        "repo string, path string, commit string, lang string, content string",
    )
    append_batch(offsets_index, batch, num_partitions=1)
    offsets_index.reload_meta()
    row = (
        offsets_index.docstats()
        .filter("repo = 'zrepo'")
        .select("off_blob")
        .collect()[0]
    )
    st, en = decode_doc_offsets(bytes(row["off_blob"]))
    assert st.tolist() == [0, 5, 10, 16]
    assert en.tolist() == [4, 9, 15, 18]


def test_offsets_codec_hypothesis_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from voyagr_spark.codec import decode_doc_offsets, encode_doc_offsets

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.tuples(st.integers(0, 10), st.integers(1, 8)),
                min_size=0, max_size=30,
            ),
            min_size=1, max_size=6,
        )
    )
    def roundtrip(doc_gaps):
        starts_l, ends_l, counts = [], [], []
        for gaps in doc_gaps:
            pos = 0
            s, e = [], []
            for gap, length in gaps:
                pos += gap
                s.append(pos)
                pos += length
                e.append(pos)
            starts_l.append(np.asarray(s, dtype=np.int64))
            ends_l.append(np.asarray(e, dtype=np.int64))
            counts.append(len(s))
        flat_s = np.concatenate(starts_l) if starts_l else np.zeros(0)
        flat_e = np.concatenate(ends_l) if ends_l else np.zeros(0)
        blobs = encode_doc_offsets(flat_s, flat_e, np.asarray(counts))
        k = 0
        for i, c in enumerate(counts):
            if c == 0:
                assert blobs[i] is None
                continue
            ds, de = decode_doc_offsets(blobs[i])
            assert np.array_equal(ds, flat_s[k:k + c])
            assert np.array_equal(de, flat_e[k:k + c])
            k += c

    roundtrip()
