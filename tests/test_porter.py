"""Porter stemmer (PorterStemmer.java analog): official-output goldens,
algorithm properties, end-to-end stemming analyzer."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from voyagr_spark.porter import stem

# Official Porter outputs (voc.txt/output.txt pairs for the classic
# examples; note agreed->agre and conflated->conflat are the FINAL
# outputs — the paper's table shows step-1b intermediates).
GOLDENS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat", "feed": "feed", "agreed": "agre",
    "plastered": "plaster", "bled": "bled", "motoring": "motor",
    "sing": "sing", "conflated": "conflat", "troubled": "troubl",
    "sized": "size", "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologi": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    # bli->ble and logi->log revised rows (the reference carries both)
    "conformabli": "conform", "archaeologi": "archaeolog",
}


@pytest.mark.parametrize("word,want", sorted(GOLDENS.items()))
def test_goldens(word, want):
    assert stem(word) == want


def test_short_words_untouched():
    for w in ["a", "is", "be", "s", ""]:
        assert stem(w) == w


def test_idempotent_on_common_stems():
    # stemming a stem is stable for these (not universal, but holds here)
    for w in ["run", "file", "merge", "batch", "index"]:
        assert stem(stem(w)) == stem(w)


def test_stemming_analyzer_end_to_end(spark, tmp_path):
    """Index built with a stemming chain: 'running'/'runs'/'run' collapse
    to one term; meta round-trips the chain; queries analyze identically."""
    import pandas as pd

    from voyagr_spark.analysis import Analyzer
    from voyagr_spark.indexer import Index, build_index
    from voyagr_spark.search import search

    an = Analyzer(stem="porter")
    assert not an.is_standard
    assert Analyzer.from_dict(an.to_dict()).stem == "porter"

    docs = pd.DataFrame({
        "repo": ["r"] * 3,
        "path": [f"p{i}" for i in range(3)],
        "commit": ["c"] * 3,
        "lang": ["en"] * 3,
        "content": [
            "running the tests", "he runs tests", "a run of tests",
        ],
    })
    d = tmp_path / "stem_idx"
    idx = build_index(spark, spark.createDataFrame(docs), str(d),
                      num_segments=1, analyzer=an)
    # all three docs carry the stem 'run'; the query analyzes through the
    # persisted chain, so 'running' finds every variant
    got = search(Index(spark, str(d)), "running", k=10).collect()
    assert len(got) == 3
    got2 = search(Index(spark, str(d)), "runs", k=10).collect()
    assert {r["doc_id"] for r in got2} == {r["doc_id"] for r in got}


def test_flat_and_text_paths_agree(spark):
    import pandas as pd

    from voyagr_spark.analysis import Analyzer

    an = Analyzer(stem="porter")
    texts = pd.Series([
        "relational databases are conditional", "the operator operated",
        "", "hopefulness and goodness",
    ])
    terms, pos, docidx, doclens = an.analyze_flat(texts)
    per_doc = [[] for _ in texts]
    for t, d in zip(terms, docidx):
        per_doc[d].append(t)
    for i, txt in enumerate(texts):
        want, _ = an.analyze_text(txt)
        assert per_doc[i] == want, i
