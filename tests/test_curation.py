"""Gopher A1.1 (lined) / A1.2 curation rules: planted-doc value checks
against local pure-Python recomputes, and the zero-shuffle plan property."""

import math
from collections import Counter

import pytest

from voyagr_spark import curation as CU

SF = "/root/testdata/sf0.001"


def r4(x):
    return math.floor(x * 10000 + 0.5) / 10000.0


def py_repetition(text):
    """Independent recompute of the A1.2 signals (hash-free, Counter-based
    — deliberately a different shape than the Spark run-length fold)."""
    toks = text.split()
    lines = text.split("\n")
    wchars = sum(len(w) for w in toks)
    lc = Counter(lines)
    dup_lines = [l for l in lines if lc[l] >= 2]
    dlf = len(dup_lines) / len(lines)
    dlcf = sum(len(l) for l in dup_lines) / sum(len(l) for l in lines)

    def top_frac(n):
        if len(toks) < n:
            return 0.0
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        # tie-break: smallest gram among max counts
        mx = max(c.values())
        bestg = min(g for g, k in c.items() if k == mx)
        return r4(c[bestg] * len(bestg.replace(" ", "")) / wchars)

    def dup5_frac(n=5):
        if len(toks) < n:
            return 0.0
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        covered = set()
        for s, g in enumerate(grams):
            if c[g] >= 2:
                covered.update(range(s, s + n))
        return r4(sum(len(toks[p]) for p in covered) / wchars)

    return {
        "dup_line_frac": r4(dlf),
        "dup_line_char_frac": r4(dlcf),
        "top_2gram_char_frac": top_frac(2),
        "top_3gram_char_frac": top_frac(3),
        "top_4gram_char_frac": top_frac(4),
        "dup_5gram_char_frac": dup5_frac(),
    }


PLANTED = [
    # boilerplate: one line repeated 3x + a loud repeated 5-gram
    (0, "alpha beta gamma\nalpha beta gamma\nalpha beta gamma\n"
        "one two three four five six one two three four five seven"),
    # clean doc, no repeats at all — long enough that no single n-gram
    # covers a threshold-sized share of the characters
    (1, " ".join(f"word{i:02d}" for i in range(48))),
    # dominated by one 2-gram
    (2, "ab cd ab cd ab cd ab cd xy"),
    # shorter than 5 tokens: 5-gram signal must be exactly 0.0
    (3, "tiny doc here"),
]


@pytest.fixture(scope="module")
def planted_rows(spark):
    df = spark.createDataFrame(PLANTED, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict() for r in CU.gopher_repetition(df).collect()}


def test_repetition_matches_local_recompute(planted_rows):
    for doc_id, text in PLANTED:
        want = py_repetition(text)
        got = planted_rows[doc_id]
        for k, v in want.items():
            assert got[k] == pytest.approx(v, abs=1e-12), (doc_id, k, got[k], v)


def test_repetition_keep_flag(planted_rows):
    # doc 0 trips dup-line and dup-5-gram; doc 2 trips top-2-gram; doc 3 is
    # short enough that its (unique) top 2-gram alone covers > 20% of the
    # chars — the Gopher rules assume long docs, shortness itself trips them
    assert planted_rows[0]["keep"] == 0
    assert planted_rows[1]["keep"] == 1
    assert planted_rows[2]["keep"] == 0
    assert planted_rows[3]["keep"] == 0


def test_short_doc_gram_signals_zero(planted_rows):
    # 3 tokens: no 4- or 5-grams exist -> exactly 0.0; 2-grams do exist
    assert planted_rows[3]["dup_5gram_char_frac"] == 0.0
    assert planted_rows[3]["top_4gram_char_frac"] == 0.0
    assert planted_rows[3]["top_2gram_char_frac"] > 0.0


def test_repetition_randomized_differential(spark):
    """60 random docs (seeded) with planted line repeats, gram repeats, and
    skewed token-length mixes vs the independent Counter-based recompute."""
    import random

    rng = random.Random(20260820)
    vocab = [f"w{i}" for i in range(12)] + ["longishword", "x", "yz"]
    docs = []
    for i in range(60):
        n = rng.randint(1, 40)
        toks = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.5 and n >= 10:
            # plant a repeated 5-gram at two random offsets
            g = toks[:5]
            at = rng.randint(5, n - 5)
            toks[at : at + 5] = g
        width = rng.choice([2, 3, 4])
        lines = [
            " ".join(toks[j : j + width]) for j in range(0, len(toks), width)
        ]
        if rng.random() < 0.5 and len(lines) >= 2:
            lines.append(lines[0])  # plant a duplicate line
        docs.append((i, "\n".join(lines)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in CU.gopher_repetition(df).collect()}
    for doc_id, text in docs:
        want = py_repetition(text)
        for k, v in want.items():
            assert got[doc_id][k] == pytest.approx(v, abs=1e-12), (
                doc_id, k, got[doc_id][k], v, text)


def test_quality_bullet_and_ellipsis_lines(spark):
    df = spark.createDataFrame(
        [
            # 2 of 4 lines bulleted, 1 of 4 ends with ellipsis
            (0, "- the cat sat\nplain line here\n- another bullet line\n"
                "trailing thought ..."),
        ],
        ["doc_id", "text"],
    )
    row = CU.gopher_quality(
        df, min_words=1, required_words=("the",), min_required=1
    ).collect()[0]
    assert row["frac_bullet_lines"] == pytest.approx(0.5)
    assert row["frac_ellipsis_lines"] == pytest.approx(0.25)
    # the '...' token also counts toward the symbol ratio
    assert row["symbol_ratio"] > 0.0


def test_quality_required_words_and_keep(spark):
    good = " ".join(["the part of and that have with be to"] * 6)  # 54 words
    bad = " ".join(["zz yy xx ww vv uu tt ss rr"] * 6)
    df = spark.createDataFrame([(0, good), (1, bad)], ["doc_id", "text"])
    rows = {r["doc_id"]: r.asDict() for r in CU.gopher_quality(df).collect()}
    assert rows[0]["n_required_words"] >= 2 and rows[0]["keep"] == 1
    assert rows[1]["n_required_words"] == 0 and rows[1]["keep"] == 0


def test_gate_surfaces_zero_shuffle(spark):
    """Both gate surfaces must stay single-scan: no Exchange in the plan
    (the orderBy sort is fine — it's the gate's presentation order)."""
    lined3 = CU.lined_documents(spark, SF, line_tokens=3, bullets=False)
    plan = CU.gopher_repetition(lined3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    lined6 = CU.lined_documents(spark, SF, line_tokens=6, bullets=True)
    plan = CU.gopher_quality(lined6)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
