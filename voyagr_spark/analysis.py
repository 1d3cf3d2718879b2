"""StandardAnalyzer-equivalent analysis chain, vectorized for Arrow batches.

Reference semantics (cited into /root/reference):

* Chain = StandardTokenizer -> StandardFilter(no-op) -> LowerCaseFilter ->
  StopFilter; `lucene/analysis/common/src/java/org/apache/lucene/analysis/
  standard/StandardAnalyzer.java:84-97`.
* Tokenizer = UAX#29 word break, Unicode 6.3 (`StandardTokenizerImpl.jflex:41`).
  For the ASCII/Latin envelope of a source-code corpus the reachable grammar is:
    - ALetter run:   [A-Za-z] (plus general Unicode letters)
    - Numeric run:   [0-9]
    - ExtendNumLet:  `_` (U+005F and other Pc connectors) joins everything and
      may lead/trail a token (WB13a/WB13b)
    - between two letter runs:  MidLetter | MidNumLet | SingleQuote
      = `:`(MidLetter in Unicode 6.3) `.`(MidNumLet) `'`(SingleQuote) (WB6/WB7)
    - between two numeric runs: MidNum | MidNumLet | SingleQuote
      = `,` `;` `.` `'` (WB11/WB12)
    - letter run and numeric run concatenate freely (WB9/WB10)
  Grammar transcription from `StandardTokenizerImpl.jflex:122-164`.
* Max token length: DEFAULT_MAX_TOKEN_LENGTH=255 (`StandardAnalyzer.java:39`).
  The scanner buffer (`%buffer 255`, `StandardTokenizerImpl.jflex:48`) never
  grows (`StandardTokenizerImpl.java:505-535` zzRefill has no reallocation), so
  a run longer than 255 chars is *split* into <=255-char maximal-munch chunks,
  each emitted as a normal token.  (The `yylength() <= maxTokenLength` discard
  at `StandardTokenizer.java:156` only fires when maxTokenLength < buffer.)
* Stop words: the 33-word English set, applied after lowercasing
  (`analysis/core/StopAnalyzer.java:42-48`).
* Position semantics: removed tokens leave *holes* — the filter adds
  skippedPositions to the next surviving token's increment
  (`analysis/util/FilteringTokenFilter.java:49-59`); document length for norms
  counts only surviving tokens (`index/DefaultIndexingChain.java:636`
  `invertState.length++` runs post-filter).

The exported primitives operate on pandas Series (one call per Arrow batch);
no per-row Python UDFs are used anywhere in the engine.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# StopAnalyzer.ENGLISH_STOP_WORDS_SET (StopAnalyzer.java:42-48)
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.java:39

# ASCII/Latin UAX#29 (Unicode 6.3) word token, transcribed from
# StandardTokenizerImpl.jflex:122-164.  `\W\d_` complement gives Unicode
# letters; good beyond ASCII for the corpus envelope (no Extend/Format chars).
_LET = r"[^\W\d_]"
_NUM = r"\d"
# MidLetter ∪ MidNumLet ∪ Single_Quote between letters: `:`(6.3) `·` `.` `'` `’`
_MID_LET = "[:.·'’․]"
# MidNum ∪ MidNumLet ∪ Single_Quote between digits: `,` `;` `.` `'` `’`
_MID_NUM = "[,;.'’․٬]"
# ExtendNumLet = \p{Pc} (list from TestStandardAnalyzer.java:39)
_EXT = "[_‿⁀⁔︳︴﹍-﹏＿]"

_LET_CHAIN = f"{_LET}+(?:{_MID_LET}{_LET}+)*"
_NUM_CHAIN = f"{_NUM}+(?:{_MID_NUM}{_NUM}+)*"
_BODY = f"(?:{_LET_CHAIN}|{_NUM_CHAIN})+"
TOKEN_PATTERN = f"{_EXT}*{_BODY}(?:{_EXT}+{_BODY})*{_EXT}*"
_TOKEN_RE = re.compile(TOKEN_PATTERN)


def _chunk_overlong(tokens: list[str]) -> list[str]:
    """Split tokens > MAX_TOKEN_LENGTH into <=255-char maximal-munch chunks.

    Mirrors the fixed 255-char scanner buffer: the scanner emits the longest
    match that fits in the window, then rescans from the cut point
    (StandardTokenizerImpl.java:505-535; StandardTokenizer.java:145-166).
    """
    out: list[str] = []
    for tok in tokens:
        if len(tok) <= MAX_TOKEN_LENGTH:
            out.append(tok)
            continue
        rest = tok
        while rest:
            m = _TOKEN_RE.match(rest[:MAX_TOKEN_LENGTH])
            if m is None:  # window starts on a medial separator: skip one char
                rest = rest[1:]
                continue
            out.append(m.group(0))
            rest = rest[m.end():]
    return out


# any token > 255 chars must sit inside a >255-char run of token-ish chars;
# this superset pre-check on the raw text is one C regex pass per doc and
# routes only matching (rare) docs through the per-token chunk fixup
_OVERLONG_HINT = re.compile(r"[0-9A-Za-z_.:'’]{256}")


def tokenize_series(texts: pd.Series) -> pd.Series:
    """StandardTokenizer over a batch: Series[str] -> Series[list[str]].

    Raw tokens in document order, original case, overlong runs chunked.
    """
    texts = texts.fillna("")
    toks = texts.str.findall(_TOKEN_RE)
    needs_fix = texts.str.contains(_OVERLONG_HINT, regex=True)
    if needs_fix.any():
        toks = toks.copy()
        toks[needs_fix] = toks[needs_fix].map(_chunk_overlong)
    return toks


def analyze_tokens(raw_tokens: list[str]) -> tuple[list[str], list[int]]:
    """LowerCase + Stop filters over one doc's raw tokens.

    Returns (surviving terms, their pre-stop positions).  Positions are the
    0-based ordinals of tokens *before* stopword removal, so removed stopwords
    leave holes (FilteringTokenFilter.java:49-59) — load-bearing for phrase
    queries across stopwords.
    """
    terms: list[str] = []
    positions: list[int] = []
    for pos, tok in enumerate(raw_tokens):
        low = tok.lower()
        if low in ENGLISH_STOP_WORDS:
            continue
        terms.append(low)
        positions.append(pos)
    return terms, positions


def analyze_series(texts: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Full chain over a batch -> (Series[list[str]], Series[list[int]])."""
    toks = tokenize_series(texts)
    pairs = toks.map(analyze_tokens)
    terms = pairs.map(lambda p: p[0])
    positions = pairs.map(lambda p: p[1])
    return terms, positions


def analyze_text(text: str) -> tuple[list[str], list[int]]:
    """Single-string convenience wrapper (tests, oracle, query parsing)."""
    return analyze_tokens(_chunk_overlong(_TOKEN_RE.findall(text or "")))


def analyze_flat(
    texts: pd.Series,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Whole-batch analysis chain producing flat arrays (the invert hot path).

    Returns (flat_terms object[], flat_pos int64[], flat_docidx int64[],
    doclens int64[]) where positions are pre-stop ordinals and doclens count
    surviving tokens — identical semantics to analyze_series, but lowercase
    and stop filtering run vectorized over the flattened token stream instead
    of per document.
    """
    from itertools import chain

    # lowercase the whole text first (C-speed on long strings); UAX#29 word
    # boundaries are case-invariant for the ASCII/Latin corpus envelope, so
    # tokenize(lower(text)) == [lower(tok) for tok in tokenize(text)]
    toks = tokenize_series(texts.fillna("").str.lower())
    raw_lens = toks.map(len).to_numpy(dtype=np.int64)
    total = int(raw_lens.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return np.zeros(0, dtype=object), z, z, np.zeros(len(texts), dtype=np.int64)
    low = pd.Series(
        np.fromiter(chain.from_iterable(toks), dtype=object, count=total),
        dtype=object,
    )
    keep = ~low.isin(ENGLISH_STOP_WORDS)
    doc_starts = np.concatenate(([0], np.cumsum(raw_lens)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(doc_starts, raw_lens)
    docidx = np.repeat(np.arange(len(texts), dtype=np.int64), raw_lens)
    keep_np = keep.to_numpy()
    doclens = np.zeros(len(texts), dtype=np.int64)
    np.add.at(doclens, docidx[keep_np], 1)
    return (
        low.to_numpy()[keep_np],
        pos[keep_np],
        docidx[keep_np],
        doclens,
    )


def doc_lengths(terms: pd.Series) -> np.ndarray:
    """Field length for norms = surviving token count (post-stop).

    DefaultIndexingChain.java:636 counts post-filter tokens;
    discountOverlaps=true with no overlap tokens in this chain.
    """
    return terms.map(len).to_numpy(dtype=np.int64)


# ---------------------------------------------------------------------------
# pluggable analyzer (Analyzer.createComponents analog, StandardAnalyzer.java:84)
# ---------------------------------------------------------------------------

from dataclasses import dataclass, field  # noqa: E402
from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=32)
def _compiled(pattern: str) -> re.Pattern:
    return re.compile(pattern)


@dataclass(frozen=True)
class Analyzer:
    """Configurable analysis chain: tokenizer regex -> [lowercase] ->
    [stop filter], with pre-stop positions (A7 holes preserved).

    The default instance IS the StandardAnalyzer-equivalent chain and
    delegates to the vectorized module fast paths (bit-identical to the
    module-level functions).  Custom instances (per-field/per-corpus
    tokenizers, the §2.8 "custom analyzers" surface) run a generic
    vectorized path: same semantics, same Series-in/arrays-out shape.
    """

    token_pattern: str = TOKEN_PATTERN
    lowercase: bool = True
    stopwords: frozenset = field(default=ENGLISH_STOP_WORDS)
    max_token_length: int = MAX_TOKEN_LENGTH

    @property
    def is_standard(self) -> bool:
        return (
            self.token_pattern == TOKEN_PATTERN
            and self.lowercase
            and self.stopwords == ENGLISH_STOP_WORDS
            and self.max_token_length == MAX_TOKEN_LENGTH
        )

    # -- serialization (stored in index meta so queries analyze identically)
    def to_dict(self) -> dict:
        return {
            "token_pattern": self.token_pattern,
            "lowercase": self.lowercase,
            "stopwords": sorted(self.stopwords),
            "max_token_length": self.max_token_length,
        }

    @staticmethod
    def from_dict(d: dict | None) -> "Analyzer":
        if not d:
            return STANDARD_ANALYZER
        return Analyzer(
            token_pattern=d["token_pattern"],
            lowercase=bool(d["lowercase"]),
            stopwords=frozenset(d["stopwords"]),
            max_token_length=int(d["max_token_length"]),
        )

    # -- single string (query parsing, tests, oracle)
    def analyze_text(self, text: str) -> tuple[list[str], list[int]]:
        if self.is_standard:
            return analyze_text(text)
        toks = self._chunk(_compiled(self.token_pattern).findall(text or ""))
        terms, positions = [], []
        for pos, tok in enumerate(toks):
            t = tok.lower() if self.lowercase else tok
            if t in self.stopwords:
                continue
            terms.append(t)
            positions.append(pos)
        return terms, positions

    def _chunk(self, tokens: list[str]) -> list[str]:
        mx = self.max_token_length
        if not mx or all(len(t) <= mx for t in tokens):
            return tokens
        pat = _compiled(self.token_pattern)
        out: list[str] = []
        for tok in tokens:
            if len(tok) <= mx:
                out.append(tok)
                continue
            rest = tok
            while rest:
                m = pat.match(rest[:mx])
                if m is None:
                    rest = rest[1:]
                    continue
                out.append(m.group(0))
                rest = rest[m.end():]
        return out

    # -- whole batch -> flat arrays (the invert hot path)
    def analyze_flat(
        self, texts: pd.Series
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        if self.is_standard:
            return analyze_flat(texts)
        from itertools import chain as _chain

        pat = _compiled(self.token_pattern)
        toks = texts.fillna("").str.findall(pat)
        mx = self.max_token_length
        if mx:
            toks = toks.map(self._chunk)
        raw_lens = toks.map(len).to_numpy(dtype=np.int64)
        total = int(raw_lens.sum())
        if total == 0:
            z = np.zeros(0, dtype=np.int64)
            return (np.zeros(0, dtype=object), z, z,
                    np.zeros(len(texts), dtype=np.int64))
        flat = pd.Series(
            np.fromiter(_chain.from_iterable(toks), dtype=object, count=total),
            dtype=object,
        )
        if self.lowercase:
            flat = flat.str.lower()
        keep = (
            ~flat.isin(self.stopwords) if self.stopwords
            else pd.Series(True, index=flat.index)
        )
        doc_starts = np.concatenate(([0], np.cumsum(raw_lens)[:-1]))
        pos = np.arange(total, dtype=np.int64) - np.repeat(doc_starts, raw_lens)
        docidx = np.repeat(np.arange(len(texts), dtype=np.int64), raw_lens)
        keep_np = keep.to_numpy()
        doclens = np.zeros(len(texts), dtype=np.int64)
        np.add.at(doclens, docidx[keep_np], 1)
        return flat.to_numpy()[keep_np], pos[keep_np], docidx[keep_np], doclens


STANDARD_ANALYZER = Analyzer()
