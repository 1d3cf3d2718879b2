"""BPE tokenizer: merge learning, rank-greedy application, and the
distributed token-count surface.  Differentials run against an INDEPENDENT
transcription of the original regex-based apply from Sennrich et al. 2016
(the `re.sub`-per-merge formulation), not the engine's span-merge loop."""

import random
import re

import pytest

from voyagr_spark.bpe import END, bpe_apply, bpe_learn


# the paper's running example (Sennrich et al. 2016, figure 1 vocabulary)
PAPER_VOCAB = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_paper_example_first_merges():
    merges = bpe_learn(PAPER_VOCAB, 5)
    # counts: ('e','s') 9, ('es','t') 9, ('est','</w>') 9 dominate, then
    # 'low'-family pairs at 7; ties break to the lexicographically
    # smallest pair, so the es-chain runs first
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    assert merges[3] == ("l", "o")
    assert merges[4] == ("lo", "w")


def test_apply_matches_training_segmentation():
    """Applying the learned ranks reproduces the training-time vocabulary
    segmentation for every training word (the standard BPE property)."""
    merges = bpe_learn(PAPER_VOCAB, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    # recompute training segmentations by replaying merges on the vocab
    vocab = {tuple(w) + (END,): c for w, c in PAPER_VOCAB.items()}
    for a, b in merges:
        new = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[tuple(out)] = c
        vocab = new
    train_seg = {"".join(s).replace(END, ""): list(s) for s in vocab}
    for w in PAPER_VOCAB:
        assert bpe_apply(w, ranks) == train_seg[w], w


def _regex_apply(word: str, merges) -> list[str]:
    """Independent transcription of the ORIGINAL apply: one `re.sub` per
    merge in merge order over the space-joined symbol string (the paper's
    released learn_bpe.py formulation)."""
    s = " ".join(list(word) + [END])
    for a, b in merges:
        pat = re.compile(
            r"(?<!\S)" + re.escape(a) + r" " + re.escape(b) + r"(?!\S)"
        )
        s = pat.sub(a + b, s)
    return s.split(" ")


@pytest.mark.parametrize("seed", range(5))
def test_rank_greedy_equals_sequential_regex_apply(seed):
    """The engine's rank-greedy merge loop must equal the original
    sequential per-merge regex substitution on random corpora."""
    rng = random.Random(seed)
    alpha = "abcde"
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
        for _ in range(60)
    ]
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + rng.randint(1, 5)
    merges = bpe_learn(counts, 25)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in list(counts) + ["zzz", "abcdeabcde", "a"]:
        assert bpe_apply(w, ranks) == _regex_apply(w, merges), w


def test_roundtrip_and_oov():
    merges = bpe_learn(PAPER_VOCAB, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["lowest", "wider", "newer", "xyzzy", "l"]:
        sub = bpe_apply(w, ranks)
        assert "".join(sub) == w + END, w


def test_token_counts_spark_matches_python(spark, tmp_path_factory):
    import pandas as pd

    from voyagr_spark.bpe import bpe_token_counts, bpe_train

    texts = [
        "low lower newest widest low newest",
        "newest newest low",
        "unseen tokens here",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(3),
            "text": texts,
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
        }
    )
    d = tmp_path_factory.mktemp("bpe")
    spark.createDataFrame(pdf).write.parquet(str(d / "documents.parquet"))

    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe"])
        for r in bpe_token_counts(spark, str(d), 10).collect()
    }
    merges = bpe_train(spark, str(d), 10)
    ranks = {p: i for i, p in enumerate(merges)}
    for i, t in enumerate(texts):
        ws = [w for w in t.lower().split(" ") if w]
        expect = (len(ws), sum(len(bpe_apply(w, ranks)) for w in ws))
        assert got[i] == expect, i
