"""Content-extraction handler analog (solr/contrib/extraction)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.extraction import extract, extract_text_bytes, sniff_type


def test_sniff_magic_bytes():
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from test_pipeline import _make_wav, _make_ppm

    assert sniff_type(_make_wav()) == "audio/x-wav"
    assert sniff_type(_make_ppm()) == "image/x-portable-pixmap"
    assert sniff_type(b"\x89PNG\r\n\x1a\nrest") == "image/png"
    assert sniff_type(b"plain old text\n") == "text/plain"
    assert sniff_type(b"\x00\x01\x02binary") == "application/octet-stream"
    assert sniff_type("unicode text é".encode()) == "text/plain"


def test_printable_run_extraction():
    b = b"\x01\x02head\x00body of text\xff\x00tail\x07ok"
    # runs >= 4 printable chars: 'head', 'body of text', 'tail' ('ok' is 2)
    assert extract_text_bytes(b) == "head body of text tail"
    assert extract_text_bytes(b, min_run=2) == "head body of text tail ok"
    assert extract_text_bytes(b"abc") == ""


def test_extract_dataframe(spark):
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "abc"), (2, "hello world")],
        "doc_id long, text string",
    )
    binmade = docs.select(
        "doc_id",
        F.concat(
            F.lit(b"\x89PNG\r\n\x1a\n"),
            F.encode("text", "utf-8"),
            F.lit(b"\x00zz"),
        ).alias("data"),
    )
    out = {r.doc_id: r for r in extract(
        binmade, literals={"source": "upload"},
        fmap={"text": "content"}).collect()}
    assert out[0].content == "the quick brown fox"
    assert out[1].content == ""          # 3 printable chars < min_run
    assert out[0].content_type == "image/png"
    assert out[0].source == "upload"
    assert out[0].stream_size == 8 + len("the quick brown fox") + 3
    assert out[2].content == "hello world"


def test_fmap_rejects_unknown_field(spark):
    docs = spark.createDataFrame([(0, b"x")], "doc_id long, data binary")
    with pytest.raises(ValueError, match="not an extracted field"):
        extract(docs, fmap={"nope": "x"})


def test_extracted_text_feeds_index(spark, tmp_path):
    """ExtractingDocumentLoader end-to-end: binary -> text -> index."""
    import pyspark.sql.functions as F

    from voyagr_spark.indexer import build_index
    from voyagr_spark.search import search

    docs = spark.createDataFrame(
        [("p0", "wombat burrows at night"), ("p1", "quolls hunt wombat kits")],
        "path string, text string",
    )
    binmade = docs.select(
        "path", F.encode("text", "utf-8").alias("data"))
    extracted = extract(
        binmade, id_cols=("path",),
        literals={"repo": "uploads", "commit": "c0", "lang": "en"},
        fmap={"text": "content"},
    )
    idx = build_index(
        spark,
        extracted.select("repo", "path", "commit", "lang", "content"),
        str(tmp_path / "exidx"), num_segments=1,
    )
    hits = search(idx, "wombat", k=5).collect()
    assert {r.doc_id for r in hits} == {0, 1}
