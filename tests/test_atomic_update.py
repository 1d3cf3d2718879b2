"""Atomic updates: AtomicUpdateDocumentMerger semantics + the end-to-end
RTG fetch -> merge -> upsert path (solr/core/src/java/org/apache/solr/
update/processor/AtomicUpdateDocumentMerger.java)."""

import shutil

import pytest

from voyagr_spark.solr_api import atomic_merge, atomic_update


# ---- merge unit semantics (reference cases) --------------------------------

def test_plain_value_is_set():
    out = atomic_merge({"lang": "go"}, {"lang": "java", "x": 1})
    assert out == {"lang": "go", "x": 1}


def test_set_add_remove():
    doc = {"tags": "a"}
    out = atomic_merge({"tags": {"add": "b"}}, doc)
    assert out["tags"] == ["a", "b"]          # scalar becomes list on add
    out = atomic_merge({"tags": {"add": ["c", "d"]}}, out)
    assert out["tags"] == ["a", "b", "c", "d"]
    out = atomic_merge({"tags": {"remove": ["b", "zz"]}}, out)
    assert out["tags"] == ["a", "c", "d"]     # missing removals ignored
    out = atomic_merge({"tags": {"set": "solo"}}, out)
    assert out["tags"] == "solo"


def test_remove_regex_full_match_only():
    doc = {"tags": ["alpha", "beta", "alphabet"]}
    # Matcher.matches is a FULL match: 'alpha' drops, 'alphabet' stays
    out = atomic_merge({"tags": {"removeregex": "alph."}}, doc)
    assert out["tags"] == ["beta", "alphabet"]


def test_inc_semantics():
    # absent field: inc sets (reference :136-139)
    assert atomic_merge({"n": {"inc": 5}}, {})["n"] == 5
    # result type follows the OLD value's type (:142-151)
    assert atomic_merge({"n": {"inc": 5}}, {"n": 2})["n"] == 7
    got = atomic_merge({"n": {"inc": 1}}, {"n": 2.5})["n"]
    assert got == 3.5 and isinstance(got, float)
    # string old value parses via the int branch
    assert atomic_merge({"n": {"inc": 3}}, {"n": "4"})["n"] == 7


def test_unknown_op_warned_and_ignored():
    with pytest.warns(UserWarning, match="Unknown operation"):
        out = atomic_merge({"lang": {"frobnicate": 1}}, {"lang": "java"})
    assert out["lang"] == "java"


def test_id_field_update_raises():
    with pytest.raises(ValueError, match="id field"):
        atomic_merge({"repo": {"set": "other"}}, {"repo": "r"})
    with pytest.raises(ValueError, match="id field"):
        atomic_merge({"path": "p2"}, {"path": "p"})


# ---- end-to-end: fetch -> merge -> upsert -> rank shift --------------------

@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    from voyagr_spark.corpus import generate_corpus
    from voyagr_spark.indexer import build_index

    pdf = generate_corpus(60, seed=11)
    d = tmp_path_factory.mktemp("atomic_idx")
    source = spark.createDataFrame(pdf)
    idx = build_index(spark, source, str(d), num_segments=2)
    yield idx, source, pdf
    shutil.rmtree(d, ignore_errors=True)


def test_atomic_update_end_to_end(spark, small_index):
    from voyagr_spark.search import search

    idx, source, pdf = small_index
    row = pdf.sort_values(["repo", "path", "commit"]).iloc[0]
    key = {"repo": row["repo"], "path": row["path"], "commit": row["commit"]}
    merged = atomic_update(
        idx, source, key,
        {"content": {"set": row["content"] + " zzatomic zzatomic"}},
    )
    assert merged["content"].endswith("zzatomic zzatomic")
    assert merged["repo"] == key["repo"]
    idx.reload_meta()
    hits = search(idx, "zzatomic", k=5).collect()
    # exactly the updated doc matches, at its re-appended id
    assert [r["doc_id"] for r in hits] == [60]
    # the old doc id is tombstoned: a content term of doc 0 now matches
    # only where other docs carry it
    assert 0 not in {r["doc_id"]
                     for r in search(idx, "zzatomic", k=100).collect()}


def test_atomic_update_missing_doc_starts_fresh(spark, small_index):
    idx, source, _ = small_index
    key = {"repo": "new-repo", "path": "new/path", "commit": "c0"}
    merged = atomic_update(
        idx, source, key,
        {"content": {"set": "fresh zzfresh doc"}, "lang": "en"},
    )
    assert merged["content"] == "fresh zzfresh doc" and merged["lang"] == "en"
    idx.reload_meta()
    from voyagr_spark.search import search

    assert len(search(idx, "zzfresh", k=5).collect()) == 1


def test_atomic_update_multivalue_result_rejected(spark, small_index):
    idx, source, pdf = small_index
    row = pdf.sort_values(["repo", "path", "commit"]).iloc[1]
    key = {"repo": row["repo"], "path": row["path"], "commit": row["commit"]}
    with pytest.raises(ValueError, match="single-valued"):
        atomic_update(idx, source, key, {"lang": {"add": "second"}})
