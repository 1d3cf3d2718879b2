"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Generates the exact input_hint shape `(repo, path, commit, lang, content)`:

* one "giant" repo holds ~30% of files (exercises salted/range repartitioning)
* identifiers drawn from a 5,000-token vocabulary with Zipf(s=1.1) frequency
  (stopword-like hot terms)
* literal English stopwords inside comment lines
* planted phrases: contiguous ("parse query tree"), the same words scattered
  (phrase must reject), and one spanning a removed stopword
  ("call the function" — position-hole semantics, SURVEY §2.2 A7)
* a few tokens longer than 255 chars (max-token-length chunking, A3)

All randomness from one seeded numpy Generator — same seed, same corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = ["python", "java", "js", "go", "c"]
LANG_EXT = {"python": "py", "java": "java", "js": "js", "go": "go", "c": "c"}
LANG_W = np.array([0.35, 0.25, 0.2, 0.1, 0.1])

PHRASE_CONTIG = "parse query tree"
PHRASE_SCATTERED_WORDS = ("parse", "tree", "query")  # non-adjacent plant
PHRASE_STOP_HOLE = "call the function"  # 'the' removed at index time

VOCAB_SIZE = 5000
ZIPF_S = 1.1


def _vocab(n: int = VOCAB_SIZE) -> np.ndarray:
    base = [
        "open", "file", "handle", "parse", "query", "tree", "call", "function",
        "index", "merge", "segment", "score", "token", "stream", "buffer",
        "spark", "shuffle", "partition", "column", "vector",
    ]
    gen = [f"ident{i:04d}" for i in range(n - len(base))]
    return np.array(base + gen, dtype=object)


def _zipf_probs(n: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    w = ranks ** (-s)
    return w / w.sum()


def generate_corpus(
    num_docs: int, seed: int = 42, idx_offset: int = 0
) -> pd.DataFrame:
    """Build the corpus as a pandas frame (small scales: tests + bench).

    `idx_offset` shifts the per-doc file index so distributed generation
    (corpus_spark: one block per partition) produces globally unique
    (repo, path) keys; the default 0 keeps this function byte-identical to
    the original fixtures."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    probs = _zipf_probs(vocab.size)

    # repo assignment: ~30% of files in the giant repo, rest spread
    giant = rng.random(num_docs) < 0.30
    small_repo_ids = rng.integers(1, max(2, num_docs // 50), size=num_docs)
    repos = np.where(
        giant,
        "org0/repo0",
        np.char.add(
            np.char.add("org", (small_repo_ids // 50).astype(str)),
            np.char.add("/repo", small_repo_ids.astype(str)),
        ),
    ).astype(object)

    langs = rng.choice(np.array(LANGS, dtype=object), size=num_docs, p=LANG_W)
    paths = np.array(
        [
            f"src/module_{rng.integers(0, 40)}/file_{i + idx_offset}.{LANG_EXT[l]}"
            for i, l in enumerate(langs)
        ],
        dtype=object,
    )
    commits = np.array(
        [
            hashlib.sha1(f"{seed}:{r}:{p}".encode()).hexdigest()
            for r, p in zip(repos, paths)
        ],
        dtype=object,
    )

    # content: 20..400 body tokens per doc, all sampled in one shot
    lens = rng.integers(20, 401, size=num_docs)
    total = int(lens.sum())
    flat = rng.choice(vocab, size=total, p=probs)
    offsets = np.concatenate(([0], np.cumsum(lens)))

    comment_pool = [
        "// the quick result is not in the cache",
        "# this is a comment and it will be removed by these filters",
        "/* if there was an error then call into the handler */",
    ]
    overlong = "x" * 300  # chunks into 255 + 45 at analysis time

    contents = []
    for i in range(num_docs):
        toks = list(flat[offsets[i]: offsets[i + 1]])
        # every doc gets one stopword-rich comment line
        toks.insert(int(rng.integers(0, len(toks))), comment_pool[i % 3])
        r = rng.random()
        if r < 0.08:
            toks.append(PHRASE_CONTIG)
        elif r < 0.14:
            # scattered variant: same words, non-adjacent
            toks.insert(0, PHRASE_SCATTERED_WORDS[0])
            toks.insert(len(toks) // 2, PHRASE_SCATTERED_WORDS[1])
            toks.append(PHRASE_SCATTERED_WORDS[2])
        if rng.random() < 0.06:
            toks.append(PHRASE_STOP_HOLE)
        if rng.random() < 0.01:
            toks.append(overlong)
        contents.append(" ".join(toks))

    df = pd.DataFrame(
        {
            "repo": repos,
            "path": paths,
            "commit": commits,
            "lang": langs.astype(object),
            "content": contents,
        }
    )
    # input is an unordered table; shuffle so doc_id assignment is exercised
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def corpus_spark(spark, num_docs: int, seed: int = 42, partitions: int = 8):
    """Corpus as a Spark DataFrame, generated INSIDE tasks.

    The driver ships only (pid, start, n) triples; each task generates its
    block with a pid-derived seed — no driver-side materialization, no
    multi-MB task closures, generation parallel across the cluster.  Output
    is deterministic for fixed (num_docs, seed, partitions)."""
    import pyarrow as pa

    base = num_docs // partitions
    rem = num_docs % partitions
    meta, start = [], 0
    for i in range(partitions):
        n = base + (1 if i < rem else 0)
        meta.append((i, start, n))
        start += n
    df = spark.createDataFrame(meta, "pid int, start long, n long").repartition(
        partitions, "pid"
    )
    schema = "repo string, path string, commit string, lang string, content string"

    def gen(batches):
        for b in batches:
            pdf = b.to_pandas()
            for _, row in pdf.iterrows():
                if int(row["n"]) == 0:
                    continue
                block = generate_corpus(
                    int(row["n"]),
                    seed=seed + 1_000_003 * int(row["pid"]),
                    idx_offset=int(row["start"]),
                )
                yield pa.RecordBatch.from_pandas(block, preserve_index=False)

    return df.mapInArrow(gen, schema)
