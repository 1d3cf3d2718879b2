"""CLI smoke: build + search + count through the spark-submit entry point."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_cli(*args):
    out = subprocess.run(
        [sys.executable, str(REPO / "voyagr_spark" / "cli.py"), *args],
        capture_output=True, text=True, cwd=REPO, timeout=420,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root",
             "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", ""),
             "PYSPARK_PYTHON": sys.executable,
             "PYSPARK_DRIVER_PYTHON": sys.executable,
             "PYTHONPATH": str(REPO)},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]


def test_cli_build_search_count(tmp_path, corpus_pdf):
    src = tmp_path / "docs.parquet"
    corpus_pdf.to_parquet(src)
    idx = tmp_path / "idx"
    built = run_cli("build", "--input", str(src), "--index", str(idx),
                    "--partitions", "2")
    assert built[0]["max_doc"] == len(corpus_pdf)
    hits = run_cli("search", "--index", str(idx), "--query", "file AND handle",
                   "--k", "5")
    assert 0 < len(hits) <= 5
    assert all("doc_id" in h and "score" in h for h in hits)
    cnt = run_cli("count", "--index", str(idx), "--query", "file")
    assert cnt[0]["count"] > 0
    # surround syntax (span near) and classic similarity flags
    srd = run_cli("search", "--index", str(idx), "--syntax", "surround",
                  "--query", "parse w query", "--k", "5")
    assert srd and all("doc_id" in h for h in srd)
    cls = run_cli("search", "--index", str(idx), "--similarity", "classic",
                  "--query", "file", "--k", "5")
    bm = run_cli("search", "--index", str(idx), "--query", "file", "--k", "5")
    assert cls and [h["score"] for h in cls] != [h["score"] for h in bm]
    # resume is a no-op on a completed index
    again = run_cli("build", "--input", str(src), "--index", str(idx),
                    "--partitions", "2", "--resume")
    assert again[0]["max_doc"] == len(corpus_pdf)


def test_cli_select_suggest_batch_explain(tmp_path, corpus_pdf):
    src = tmp_path / "docs.parquet"
    corpus_pdf.to_parquet(src)
    idx = tmp_path / "idx2"
    run_cli("build", "--input", str(src), "--index", str(idx),
            "--partitions", "2")
    sel = run_cli("select", "--index", str(idx), "--query", "file",
                  "--fq", "doclen:[1 TO 10000]", "--rows", "5")
    assert 0 < len(sel) <= 5 and all("repo" in r for r in sel)
    sug = run_cli("suggest", "--index", str(idx), "--term", "fil",
                  "--max-edits", "1")
    assert any(r["term"] == "file" for r in sug)
    bat = run_cli("batch", "--index", str(idx), "--queries",
                  '{"a": "file", "b": "file AND handle"}', "--k", "3")
    assert {r["query_id"] for r in bat} == {"a", "b"}
    doc = sel[0]["doc_id"]
    ex = run_cli("explain", "--index", str(idx), "--query", "file",
                 "--doc", str(doc))
    assert ex[0]["match"] is True and ex[0]["value"] > 0
    chk = run_cli("check", "--index", str(idx))
    assert chk[0] == {"clean": True, "violations": {}}
