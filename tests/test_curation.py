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


# ---------------------------------------------------------------------------
# C4 filters (Raffel et al. 2020 section 2.2)
# ---------------------------------------------------------------------------

C4_DOCS = [
    # 6 kept sentence lines -> keep
    (0, "one two three here now.\n" * 5 + "final line stands alone!"),
    # enough sentences but a curly bracket -> page drop
    (1, "one two three here now.\n" * 5 + "code { block }."),
    # lorem ipsum (case-insensitive) -> page drop
    (2, "one two three here now.\n" * 5 + "LoReM IpSuM filler."),
    # javascript line dropped at line level; still 5 sentences -> keep
    (3, "one two three here now.\n" * 5 + "enable javascript to view."),
    # only 4 sentences survive -> drop (min_sentences=5)
    (4, "one two three here now.\n" * 4 + "no terminal punct here"),
    # short line (2 words) dropped; bad word page-drops
    (5, "one two three here now.\n" * 5 + "ok.\nbadword appears today."),
]


def py_c4(text, bad_words=("badword",), min_wpl=3, min_sent=5):
    import hashlib
    import re

    lines = text.split("\n")
    kept = [
        l
        for l in lines
        if re.search(r'[.!?"]$', l)
        and len(l.split(" ")) >= min_wpl
        and not re.search(r"(?i)\bjavascript\b", l)
    ]
    clean = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", clean))
    has_curly = "{" in text
    has_lorem = "lorem ipsum" in text.lower()
    has_bad = bool(
        bad_words
        and re.search(
            r"(?i)\b(" + "|".join(map(re.escape, bad_words)) + r")\b", text
        )
    )
    return {
        "n_lines": len(lines),
        "n_kept_lines": len(kept),
        "n_sentences": n_sent,
        "clean_nchars": len(clean),
        "clean_md5": hashlib.md5(clean.encode()).hexdigest(),
        "has_curly": int(has_curly),
        "has_lorem": int(has_lorem),
        "has_badword": int(has_bad),
        "keep": int(
            n_sent >= min_sent and not has_curly and not has_lorem and not has_bad
        ),
    }


def test_c4_planted_rules(spark):
    df = spark.createDataFrame(C4_DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in CU.c4_filters(df, bad_words=("badword",)).collect()
    }
    for doc_id, text in C4_DOCS:
        want = py_c4(text)
        row = {k: got[doc_id][k] for k in want}
        assert row == want, (doc_id, row, want)
    # the rule-by-rule outcomes the corpus was planted for
    assert got[0]["keep"] == 1
    assert got[1]["keep"] == 0 and got[1]["has_curly"] == 1
    assert got[2]["keep"] == 0 and got[2]["has_lorem"] == 1
    assert got[3]["keep"] == 1 and got[3]["n_kept_lines"] == 5
    assert got[4]["keep"] == 0 and got[4]["n_sentences"] == 4
    assert got[5]["keep"] == 0 and got[5]["has_badword"] == 1
    # short "ok." line (< 3 words) was dropped at line level; the badword
    # line itself is a kept sentence line (the drop is page-level)
    assert got[5]["n_lines"] == 7 and got[5]["n_kept_lines"] == 6


def test_c4_randomized_differential(spark):
    import random

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "javascript", "badword", "{x}"]
    sufs = [".", "?", "!", '"', "", " ..."]
    docs = []
    for d in range(60):
        lines = []
        for _ in range(rng.randrange(1, 12)):
            words = [rng.choice(vocab) for _ in range(rng.randrange(1, 7))]
            lines.append(" ".join(words) + rng.choice(sufs))
        if rng.random() < 0.2:
            lines.append("lorem ipsum dolor.")
        docs.append((d, "\n".join(lines)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in CU.c4_filters(df, bad_words=("badword",)).collect()
    }
    for d, text in docs:
        want = py_c4(text)
        row = {k: got[d][k] for k in want}
        assert row == want, (d, row, want)


def test_c4_no_bad_words_param(spark):
    df = spark.createDataFrame(C4_DOCS[-1:], ["doc_id", "text"])
    row = CU.c4_filters(df).collect()[0]
    assert row["has_badword"] == 0 and row["keep"] == 1


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

def py_pii(text):
    import hashlib
    import re

    e, i, p = CU.EMAIL_RE, CU.IPV4_RE, CU.PHONE_RE
    red = re.sub(e, "|||EMAIL_ADDRESS|||", text)
    red = re.sub(i, "|||IP_ADDRESS|||", red)
    red = re.sub(p, "|||PHONE_NUMBER|||", red)
    return {
        "n_emails": len(re.findall(e, text)),
        "n_ips": len(re.findall(i, text)),
        "n_phones": len(re.findall(p, text)),
        "redacted_nchars": len(red),
        "redacted_md5": hashlib.md5(red.encode()).hexdigest(),
    }


def test_pii_planted(spark):
    docs = [
        (0, "write to a.user+tag@sub.example.co.uk or admin@x.io today"),
        (1, "server at 10.0.3.25 then 192.168.1.1, call 555-0199"),
        (2, "no pii here at all"),
        (3, "v1.2.3.4 is a version but 1.2.3.4 alone is an ip"),
        (4, "email-ish @ not an email; 555-12345 has five digits"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in CU.pii_redact(df).collect()}
    for d, text in docs:
        want = py_pii(text)
        row = {k: got[d][k] for k in want}
        assert row == want, (d, row, want)
    assert got[0]["n_emails"] == 2
    assert got[1]["n_ips"] == 2 and got[1]["n_phones"] == 1
    assert got[2]["redacted_md5"] == py_pii("no pii here at all")["redacted_md5"]


def test_c4_pii_gate_surfaces_zero_shuffle(spark):
    for surface in (CU.c4_filters_table, CU.pii_redact_table):
        df = surface(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # one sort for the gate's presentation order is fine; no join /
        # aggregate exchange may appear
        assert "hashpartitioning" not in plan, (surface.__name__, plan)
