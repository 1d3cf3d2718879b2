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
# (includes the MidNum `,;` and the non-ASCII mid/connector chars so a
# >255-char numeric chain like `1,1,…` is routed too — the oracle's
# analyze_text always chunks, so the batch path must catch the same docs)
_OVERLONG_HINT = re.compile(r"[0-9A-Za-z_.,;:'’․٬·‿⁀⁔︳︴﹍-﹏＿]{256}")


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


# ---------------------------------------------------------------------------
# ASCII byte-class tokenizer kernel (the invert hot path, object-string free)
# ---------------------------------------------------------------------------
#
# The UAX#29 subset grammar in TOKEN_PATTERN is, for ASCII input, exactly
# expressible as a per-byte membership rule over character classes:
#   * core chars (letter / digit / `_`) are always inside a token;
#   * a MidLetter char (`:` `.` `'`) is inside iff both neighbours are letters;
#   * a MidNum char (`,` `;` `.` `'`) is inside iff both neighbours are digits;
#   * maximal runs of inside-chars are the tokens, except pure-`_` runs
#     (TOKEN_PATTERN requires at least one letter/digit BODY).
# Equivalence with the regex for every ASCII string is property-tested in
# tests/test_tokenizer_kernel.py.  Docs containing non-ASCII bytes or a
# >255-char run take the regex path (rare for a source-code corpus), so the
# kernel is a pure fast path: bit-identical output, no new semantics.
#
# Everything below is whole-buffer numpy over one concatenated byte buffer —
# no Python string objects exist until the (small) sorted term dictionary is
# materialized.  Tokens are built as ONE boolean-mask gather into an Arrow
# large_utf8 array, then dictionary-encoded C-side; stopword filtering tests
# the (few-thousand-entry) dictionary instead of the token stream.

_LET, _DIG, _EXTC, _MIDL, _MIDN = 1, 2, 4, 8, 16
_CLS_LUT = np.zeros(256, dtype=np.uint8)
for _c in range(ord("a"), ord("z") + 1):
    _CLS_LUT[_c] |= _LET
for _c in range(ord("A"), ord("Z") + 1):
    _CLS_LUT[_c] |= _LET
for _c in range(ord("0"), ord("9") + 1):
    _CLS_LUT[_c] |= _DIG
_CLS_LUT[ord("_")] |= _EXTC
for _ch in ":.'":
    _CLS_LUT[ord(_ch)] |= _MIDL
for _ch in ",;.'":
    _CLS_LUT[ord(_ch)] |= _MIDN


def _kernel_tokenize(arr: "np.ndarray", doc_off: np.ndarray, lens: np.ndarray):
    """Run the byte-class kernel over one concatenated uint8 buffer.

    Returns (k_starts, k_len, k_doc, doc_slow) where the k_* arrays describe
    the kept (has-body) token runs of docs NOT routed to the regex fallback,
    and doc_slow marks docs needing the fallback (non-ASCII or overlong run).
    """
    cls = _CLS_LUT[arr]
    is_let = (cls & _LET) != 0
    is_dig = (cls & _DIG) != 0
    in_tok = (cls & (_LET | _DIG | _EXTC)) != 0
    # mid chars join iff both neighbours are same-kind (doc separators are
    # class 0, so runs can never span documents)
    midl = (cls & _MIDL) != 0
    midn = (cls & _MIDN) != 0
    in_tok[1:-1] |= (midl[1:-1] & is_let[:-2] & is_let[2:]) | (
        midn[1:-1] & is_dig[:-2] & is_dig[2:]
    )

    starts_mask = in_tok.copy()
    starts_mask[1:] &= ~in_tok[:-1]
    run_starts = np.flatnonzero(starts_mask)
    ends_mask = in_tok.copy()
    ends_mask[:-1] &= ~in_tok[1:]
    run_ends = np.flatnonzero(ends_mask) + 1
    run_len = run_ends - run_starts

    # has_body: at least one letter/digit in the run.  A body-less run is
    # necessarily pure `_` (mid chars imply letter/digit neighbours in-run),
    # so only runs that START with `_` are candidates — usually none/few,
    # each checked with one slice; the full prefix-sum is the dense fallback.
    has_body = np.ones(run_len.size, dtype=bool)
    cand = np.flatnonzero(arr[run_starts] == ord("_"))
    if cand.size > 4096:
        body_cum = np.zeros(arr.size + 1, dtype=np.int32)
        np.cumsum(is_let | is_dig, dtype=np.int32, out=body_cum[1:])
        has_body = body_cum[run_ends] > body_cum[run_starts]
    else:
        for i in cand:
            s = run_starts[i]
            if not (arr[s:s + run_len[i]] != ord("_")).any():
                has_body[i] = False

    run_doc = np.searchsorted(doc_off, run_starts, side="right") - 1

    # fallback routing: any non-ASCII byte, or any >255-char run
    doc_slow = np.zeros(doc_off.size, dtype=bool)
    if (arr > 0x7F).any():
        na_cum = np.zeros(arr.size + 1, dtype=np.int32)
        np.cumsum(arr >= 0x80, dtype=np.int32, out=na_cum[1:])
        doc_end = doc_off + lens
        doc_slow = na_cum[doc_end] > na_cum[doc_off]
    overlong = run_len > MAX_TOKEN_LENGTH
    if overlong.any():
        doc_slow[run_doc[overlong]] = True

    if has_body.all() and not doc_slow.any():
        # common case: every run is a token — reuse in_tok as the char mask
        return run_starts, run_len, run_doc, doc_slow, in_tok
    keep_run = has_body & ~doc_slow[run_doc]
    return (run_starts[keep_run], run_len[keep_run], run_doc[keep_run],
            doc_slow, None)


def _segment_ordinals(seg_ids: np.ndarray) -> np.ndarray:
    """0-based ordinal within each run of equal consecutive seg_ids."""
    n = seg_ids.size
    pos = np.arange(n, dtype=np.int64)
    if n == 0:
        return pos
    first = np.empty(n, dtype=bool)
    first[0] = True
    np.not_equal(seg_ids[1:], seg_ids[:-1], out=first[1:])
    starts = np.flatnonzero(first)
    return pos - np.repeat(pos[starts], np.diff(np.concatenate((starts, [n]))))


def analyze_flat_codes(
    texts: pd.Series, want_offsets: bool = False,
):
    """Standard-chain batch analysis -> dictionary-coded flat arrays.

    Returns (codes int64[], uniques object[], positions int64[],
    docidx int64[], doclens int64[]) with `uniques` sorted ascending and
    `codes` indexing into it — semantically `pd.factorize(flat_terms,
    sort=True)` over analyze_flat's term stream, except that `uniques` may
    contain entries (stopwords / fallback-only terms) not referenced by any
    surviving code.  Positions are pre-stop ordinals; doclens count
    survivors; ordering is (docidx asc, position asc) — identical to
    analyze_flat.

    With want_offsets=True a sixth element (starts, ends, counts) is
    appended: per-token character offsets PRE-stop (counts[i] = doc i's
    pre-stop token count, indexable by position ordinal — the
    IndexOptions ..._AND_OFFSETS analog).  Offsets come from the byte-class
    kernel, so they cover fast-path (ASCII, <=255-char-token) docs only;
    regex-fallback docs report counts=0 (offsets unavailable, callers fall
    back to re-analysis).  Lowercasing is 1:1 for ASCII, so offsets into
    the lowered text equal offsets into the original.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(texts)
    z = np.zeros(0, dtype=np.int64)
    if n == 0:
        base = (z, np.zeros(0, dtype=object), z, z, np.zeros(0, dtype=np.int64))
        return base + ((z, z, z),) if want_offsets else base

    low = texts.fillna("").str.lower()
    enc = low.str.encode("utf-8")
    lens = enc.str.len().to_numpy(dtype=np.int64)
    big = b"\x00".join(enc.tolist()) + b"\x00"
    arr = np.frombuffer(big, dtype=np.uint8)
    doc_off = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=doc_off[1:])

    k_starts, k_len, k_doc, doc_slow, char_mask = _kernel_tokenize(
        arr, doc_off, lens)
    nk = k_starts.size

    # pre-stop positions: ordinal of the token run within its doc
    pos = _segment_ordinals(k_doc)

    char_offsets = None
    if want_offsets:
        # per-token char offsets, pre-stop, fast-path docs only (kernel runs
        # for slow docs are already excluded, so their counts land at 0)
        o_starts = k_starts - doc_off[k_doc]
        char_offsets = (o_starts, o_starts + k_len,
                        np.bincount(k_doc, minlength=n).astype(np.int64))

    # ONE gather builds the token bytes; offsets = cumsum of run lengths
    if char_mask is None:
        # runs are maximal so starts and ends never collide: plain assignment
        char_keep = np.zeros(arr.size + 1, dtype=np.int8)
        char_keep[k_starts] = 1
        char_keep[k_starts + k_len] = -1
        char_mask = np.cumsum(char_keep[:-1], dtype=np.int8).view(bool)
    data = arr[char_mask]
    offs = np.zeros(nk + 1, dtype=np.int64)
    np.cumsum(k_len, out=offs[1:])
    tokens = pa.Array.from_buffers(
        pa.large_utf8(), nk, [None, pa.py_buffer(offs), pa.py_buffer(data)]
    )

    denc = pc.dictionary_encode(tokens)
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = denc.dictionary
    stop_code = np.asarray(
        pc.is_in(
            uniq,
            value_set=pa.array(sorted(ENGLISH_STOP_WORDS), type=pa.large_utf8()),
        ).to_numpy(zero_copy_only=False),
        dtype=bool,
    )
    keep_tok = ~stop_code[codes] if nk else np.zeros(0, dtype=bool)

    # remap first-occurrence dictionary codes to sorted-rank codes
    # (Arrow sorts utf8 by bytes == code-point order == Python str order)
    sort_idx = pc.sort_indices(uniq).to_numpy(zero_copy_only=False).astype(np.int64)
    rank = np.empty_like(sort_idx)
    rank[sort_idx] = np.arange(sort_idx.size)
    uniques = uniq.take(pa.array(sort_idx)).to_numpy(zero_copy_only=False)

    f_codes = rank[codes[keep_tok]]
    f_pos = pos[keep_tok]
    f_doc = k_doc[keep_tok]
    doclens = np.bincount(f_doc, minlength=n).astype(np.int64)

    if not doc_slow.any():
        base = (f_codes, uniques, f_pos, f_doc, doclens)
        return base + (char_offsets,) if want_offsets else base

    # regex fallback for non-ASCII / overlong docs, merged back in doc order
    slow_idx = np.flatnonzero(doc_slow)
    s_terms, s_pos, s_local, s_doclens = analyze_flat(
        texts.iloc[slow_idx].reset_index(drop=True)
    )
    s_codes_local, s_uniq = pd.factorize(s_terms, sort=True)
    all_uniq = np.array(sorted(set(uniques) | set(s_uniq)), dtype=object)
    f_codes = np.searchsorted(all_uniq, uniques)[f_codes] if f_codes.size else f_codes
    s_codes = (
        np.searchsorted(all_uniq, s_uniq)[s_codes_local]
        if s_codes_local.size else s_codes_local.astype(np.int64)
    )
    s_docg = slow_idx[s_local]
    doclens[slow_idx] = s_doclens
    # each doc's tokens live wholly in one half and are pos-ascending there:
    # scatter both halves straight to their doc-major output slots (cheaper
    # than a stable sort of the concatenated stream)
    out_start = np.zeros(n, dtype=np.int64)
    np.cumsum(doclens[:-1], out=out_start[1:])
    total = int(doclens.sum())
    tgt_f = out_start[f_doc] + _segment_ordinals(f_doc)
    tgt_s = out_start[s_docg] + _segment_ordinals(s_docg)
    m_codes = np.empty(total, dtype=np.int64)
    m_pos = np.empty(total, dtype=np.int64)
    m_doc = np.empty(total, dtype=np.int64)
    m_codes[tgt_f], m_codes[tgt_s] = f_codes, s_codes
    m_pos[tgt_f], m_pos[tgt_s] = f_pos, s_pos
    m_doc[tgt_f], m_doc[tgt_s] = f_doc, s_docg
    base = (m_codes, all_uniq, m_pos, m_doc, doclens)
    return base + (char_offsets,) if want_offsets else base


def doc_lengths(terms: pd.Series) -> np.ndarray:
    """Field length for norms = surviving token count (post-stop).

    DefaultIndexingChain.java:636 counts post-filter tokens;
    discountOverlaps=true with no overlap tokens in this chain.
    """
    return terms.map(len).to_numpy(dtype=np.int64)


# ---------------------------------------------------------------------------
# pluggable analyzer (Analyzer.createComponents analog, StandardAnalyzer.java:84)
# ---------------------------------------------------------------------------

from dataclasses import dataclass, field, replace  # noqa: E402
from functools import lru_cache  # noqa: E402

# ---------------------------------------------------------------------------
# HTMLStripCharFilter analog (analysis/common/src/java/org/apache/lucene/
# analysis/charfilter/HTMLStripCharFilter.jflex).  Reference semantics kept:
# INLINE elements (the InlineElment list, .jflex:113-139) strip to NOTHING
# ("one<span>two</span>three" -> "onetwothree", testInlineTagsNoSpace);
# every other tag — including <script>/<style> blocks with their content —
# replaces with '\n' (BLOCK_LEVEL_*_TAG_REPLACEMENT, .jflex:145-146);
# comments, <!...> bang tags and <?...> processing instructions vanish;
# character entities decode (HTMLCharacterEntities.jflex), with the
# reference's own nbsp -> ' ' mapping (:124) rather than U+00A0.
# Documented divergences: regex passes instead of the jflex state machine
# (no CDATA passthrough, no escapedTags config); the entity table is the
# HTML5 set (a superset of the reference's ~250 names).
# ---------------------------------------------------------------------------

_HTML_INLINE_NAMES = (
    "a|abbr|acronym|b|basefont|bdo|big|cite|code|dfn|em|font|i|img|input|"
    "kbd|label|q|s|samp|select|small|span|strike|strong|sub|sup|textarea|"
    "tt|u|var"
)
_HTML_BLOCK_OPEN = re.compile(r"<(script|style)\b[^>]*>", re.I)


def _strip_script_blocks(text: str) -> str:
    """Remove <script>/<style> elements with their content -> '\\n'.

    A scanner, not a regex: script comments NEST in the reference grammar
    (testScriptQuotes — '<!--' inside an open comment deepens it, each '-->'
    closes one level, and '</script>' inside an open comment is content),
    which a regex cannot count."""
    out = []
    i, L = 0, len(text)
    while True:
        m = _HTML_BLOCK_OPEN.search(text, i)
        if not m:
            out.append(text[i:])
            break
        out.append(text[i:m.start()])
        out.append("\n")
        closer = re.compile(rf"</{m.group(1)}\s*>", re.I)
        j, depth = m.end(), 0
        while j < L:
            if depth == 0:
                no = text.find("<!--", j)
                mc = closer.search(text, j)
                if mc is None and no == -1:
                    j = L
                elif mc is not None and (no == -1 or mc.start() < no):
                    j = mc.end()
                    break
                else:
                    j, depth = no + 4, 1
            else:
                no = text.find("<!--", j)
                nc = text.find("-->", j)
                if nc == -1:
                    j = L
                elif no != -1 and no < nc:
                    j, depth = no + 4, depth + 1
                else:
                    j, depth = nc + 3, depth - 1
        i = j
        if i >= L:
            break
    return "".join(out)


_HTML_PASSES: list[tuple[re.Pattern, str]] = [
    (re.compile(r"<!--.*?(?:-->|$)", re.S), ""),
    (re.compile(r"<!(?!--)[^>]*>"), ""),
    (re.compile(r"<\?[^>]*>"), ""),
    (re.compile(rf"</?(?:{_HTML_INLINE_NAMES})(?:[\s/][^>]*)?>", re.I), ""),
    (re.compile(r"</?[a-zA-Z][^>]*>"), "\n"),
]


def strip_html(text: str) -> str:
    """Strip HTML markup from one string (char-filter semantics above)."""
    import html as _html

    if not text or "<" not in text and "&" not in text:
        return text or ""
    if "<" in text:
        text = _strip_script_blocks(text)
    for pat, repl in _HTML_PASSES:
        text = pat.sub(repl, text)
    if "&" in text:
        text = _html.unescape(text).replace("\xa0", " ")
    return text


def strip_html_series(texts: pd.Series) -> pd.Series:
    """Vectorized strip_html over a batch: one pandas regex pass per rule;
    entity decode only touches the rows still holding '&'."""
    import html as _html

    out = texts.fillna("")
    mask = out.str.contains("<", regex=False) | out.str.contains(
        "&", regex=False
    )
    if not mask.any():
        return out
    sub = out[mask]
    smask = sub.str.contains("<", regex=False)
    if smask.any():
        sub.loc[smask] = sub[smask].map(_strip_script_blocks)
    for pat, repl in _HTML_PASSES:
        sub = sub.str.replace(pat, repl, regex=True)
    emask = sub.str.contains("&", regex=False)
    if emask.any():
        sub.loc[emask] = sub[emask].map(
            lambda t: _html.unescape(t).replace("\xa0", " ")
        )
    out = out.copy()
    out[mask] = sub
    return out


@lru_cache(maxsize=32)
def _compiled(pattern: str) -> re.Pattern:
    return re.compile(pattern)


# ASCIIFoldingFilter (analysis/miscellaneous/ASCIIFoldingFilter.java:142-170
# foldToASCII): Unicode Latin characters fold to their nearest ASCII
# equivalent; unmapped characters pass through unchanged.  The reference is
# a 1,243-case explicit switch; this re-expression covers the same rule as
# NFKD-decompose + strip-combining-marks (which reproduces every accent row
# plus the circled/fullwidth compatibility forms) with an explicit table for
# the non-decomposable letters the switch special-cases.
_FOLD_SPECIAL = {
    "ß": "ss", "ẞ": "SS", "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "TH", "ħ": "h", "Ħ": "H", "ı": "i", "ł": "l",
    "Ł": "L", "ŋ": "n", "Ŋ": "N", "ə": "a", "Ə": "A", "ƒ": "f",
    "Ɓ": "B", "ɓ": "b", "Ɖ": "D", "ɖ": "d", "Ŧ": "T", "ŧ": "t",
}


def fold_to_ascii(s: str) -> str:
    """Fold one term to ASCII (ASCIIFoldingFilter.foldToASCII semantics).

    Called at vocabulary rate (per unique term, not per token): the batch
    path factorizes first, so scalar cost here never touches the stream."""
    if s.isascii():
        return s
    import unicodedata

    out = []
    for ch in s:
        if ord(ch) < 128:
            out.append(ch)
            continue
        sp = _FOLD_SPECIAL.get(ch)
        if sp is not None:
            out.append(sp)
            continue
        d = unicodedata.normalize("NFKD", ch)
        a = "".join(c for c in d if not unicodedata.combining(c))
        out.append(a if (a and a.isascii()) else ch)
    return "".join(out)


# -- ReversedWildcardFilter (solr/analysis/ReversedWildcardFilterFactory) ----

#: ReverseStringFilter.START_OF_HEADING_MARKER (ReverseStringFilter.java:43).
#: Sorts below every real token (the tokenizer never emits control chars),
#: so reversed twins occupy a disjoint leading slice of the term dictionary.
REVERSE_MARKER = "\u0001"


def should_reverse(
    token: str,
    *,
    max_pos_asterisk: int = 2,
    max_pos_question: int = 1,
    min_trailing: int = 2,
    max_fraction_asterisk: float = 0.0,
) -> bool:
    """Decide whether a wildcard query pattern should run against the
    reversed twins instead of the original terms.

    Faithful transcription of ReversedWildcardFilterFactory.shouldReverse
    (solr/core/src/java/org/apache/solr/analysis/
    ReversedWildcardFilterFactory.java:100-134) with the factory's default
    parameters (:75-81): reverse when the wildcard sits near the front
    (`*` before position 2, `?` before position 1) and at least
    ``min_trailing`` chars trail the LAST wildcard."""
    pos_q = token.find("?")
    pos_a = token.find("*")
    if pos_q == -1 and pos_a == -1:
        return False
    last_pos = max(token.rfind("?"), token.rfind("*"))
    if pos_q != -1:
        pos = min(pos_q, pos_a) if pos_a != -1 else pos_q
    else:
        pos = pos_a
    if len(token) - last_pos < min_trailing:
        return False
    if pos_q != -1 and pos_q < max_pos_question:
        return True
    if pos_a != -1 and pos_a < max_pos_asterisk:
        return True
    return (
        max_fraction_asterisk > 0.0
        and pos < len(token) * max_fraction_asterisk
    )


# -- WordDelimiterFilter (analysis/miscellaneous/WordDelimiterFilter.java) ---

# Default factory config (WordDelimiterFilterFactory.java defaults):
# generateWordParts=1, generateNumberParts=1, splitOnCaseChange=1,
# splitOnNumerics=1, stemEnglishPossessive=1, catenate*/preserveOriginal=0.
# Split rules (WordDelimiterFilter.java:50-75 javadoc + WordDelimiterIterator
# .java:115-200): intra-word delimiters (non-alphanumerics) split and drop;
# lower->UPPER case transitions split; an UPPER run followed by lower splits
# before the last upper (acronym rule, WordDelimiterIterator.isBreak); letter
# <-> digit transitions split; trailing "'s" is removed per subword.
#
# Re-expressed as a boundary-insertion regex chain deliberately written in
# the RE2-safe subset (no lookaround, no backreference matching), so the
# DuckDB gate oracle runs the IDENTICAL replacements — parity by
# construction.  Character classes are ASCII (the reference's default
# 256-entry table classifies Latin-1; non-ASCII here falls to
# SUBWORD_DELIM — documented divergence, the corpus envelope is ASCII).
_WDF_POSSESSIVE = (r"['’][sS]($|[^A-Za-z0-9])", r"\1")
_WDF_BOUNDARIES = (
    (r"([a-z])([A-Z])", r"\1 \2"),          # case transition
    (r"([A-Z])([A-Z][a-z])", r"\1 \2"),     # acronym run before a word
    (r"([A-Za-z])([0-9])", r"\1 \2"),       # letter -> digit
    (r"([0-9])([A-Za-z])", r"\1 \2"),       # digit -> letter
    (r"[^A-Za-z0-9]+", " "),                 # delimiters split and drop
)
_WDF_RULES = tuple(
    (re.compile(p), r) for p, r in (_WDF_POSSESSIVE,) + _WDF_BOUNDARIES
)


def word_delimiter_parts(token: str) -> list[str]:
    """Split one token into its WordDelimiterFilter subwords (default
    config).  "Wi-Fi" -> [Wi, Fi]; "PowerShot" -> [Power, Shot]; "SD500" ->
    [SD, 500]; "O'Neil's" -> [O, Neil]; "//hello---there, 'dude'" ->
    [hello, there, dude] (WordDelimiterFilter.java:50-66 javadoc goldens).

    Called at vocabulary rate (the batch path memoizes per unique token).
    Each subword takes one position (posinc 1 per part, the
    combinations=0 default), so callers re-ordinal the expanded stream."""
    s = token
    for pat, rep in _WDF_RULES:
        s = pat.sub(rep, s)
    return s.split()


def _token_type(t: str) -> str:
    """StandardTokenizer type assignment, ASCII subset: '<NUM>' when the
    token is digits only, else '<ALPHANUM>' (the two types the UAX#29
    subset grammar produces on this corpus)."""
    return "<NUM>" if t and t.isdigit() else "<ALPHANUM>"


def _common_grams_index(
    terms: list[str], positions: list[int], common: frozenset
) -> tuple[list[str], list[int]]:
    """CommonGramsFilter (index side, CommonGramsFilter.java:102-128
    goldens in CommonGramsFilterTest.testCommonGramsFilter): the token
    stream unchanged, PLUS a '_'-joined gram for every adjacent pair
    where either member is common — the gram rides at the LEFT word's
    position as a posinc-0 overlap (gramToken() sets posInc 0, :177).
    Assumes a hole-free stream (enforced: stopwords must be empty)."""
    out_t: list[str] = []
    out_p: list[int] = []
    n = len(terms)
    for i in range(n):
        out_t.append(terms[i])
        out_p.append(positions[i])
        if i + 1 < n and (terms[i] in common or terms[i + 1] in common):
            out_t.append(terms[i] + "_" + terms[i + 1])
            out_p.append(positions[i])
    return out_t, out_p


def _common_grams_query(
    terms: list[str], positions: list[int], common: frozenset
) -> tuple[list[str], list[int]]:
    """CommonGramsQueryFilter (CommonGramsQueryFilter.java:83-115,
    goldens in testQueryFilter): output bigrams whenever possible —
    a unigram is dropped when the gram starting at it exists, and the
    FINAL unigram is also dropped when the gram ENDING at it exists
    (the exhaustion branch: previousType == GRAM_TYPE).  Grams keep the
    left word's ordinal, so phrase deltas line up with the index form."""
    n = len(terms)
    gram_next = [
        i < n - 1 and (terms[i] in common or terms[i + 1] in common)
        for i in range(n)
    ]
    out_t: list[str] = []
    out_p: list[int] = []
    for i in range(n):
        last_covered = i == n - 1 and n >= 2 and gram_next[n - 2]
        if not gram_next[i] and not last_covered:
            out_t.append(terms[i])
            out_p.append(positions[i])
        if gram_next[i]:
            out_t.append(terms[i] + "_" + terms[i + 1])
            out_p.append(positions[i])
    return out_t, out_p


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
    #: None or "porter" — PorterStemFilter analog, applied AFTER the stop
    #: filter (the EnglishAnalyzer chain order); stems only the factorized
    #: unique terms per batch, so the cost is vocabulary-sized
    stem: str | None = None
    #: ASCIIFoldingFilter analog (fold_to_ascii above), applied after
    #: lowercasing and BEFORE the stop filter so accented stopword forms
    #: ('thé') are removed like their ASCII spellings
    fold_ascii: bool = False
    #: HTMLStripCharFilter analog (strip_html above) — a CHAR filter, so it
    #: runs before the tokenizer, on indexing and query text alike
    strip_html: bool = False
    #: SynonymFilter analog (analysis/synonym/SynonymFilter.java:48-79):
    #: term -> extra terms injected at the SAME position (posinc 0) after
    #: stop+stem.  Stored canonically as tuple((term, (syn, ...)), ...);
    #: a dict passed in is normalized.  Injected tokens are position
    #: overlaps, so discountOverlaps=true keeps them out of the norm
    #: length (BM25Similarity.java:111) while their postings are real.
    synonyms: tuple | None = None
    #: ShingleFilter analog (analysis/shingle/ShingleFilter.java, default
    #: config: min=max=2, outputUnigrams, separator " ", filler "_").
    #: Interior position holes insert min(gap, maxShingleSize-1) = 1 filler
    #: (ShingleFilter.java:399); trailing holes insert one filler from the
    #: end position increment (:419); all-filler shingles are never emitted
    #: (:314-337).  Shingles/filler-heads are position overlaps, so
    #: discountOverlaps-style doclen = distinct emitted positions.
    shingle: bool = False
    #: ReversedWildcardFilter analog (solr/analysis/
    #: ReversedWildcardFilterFactory.java, withOriginal=true): every token
    #: ALSO indexes as marker + reversed form at the same position
    #: (posinc-0 overlap — doclen unchanged), turning leading-wildcard
    #: queries into bounded prefix range scans (search.rewrite applies the
    #: reference shouldReverse heuristics).  Marker =
    #: ReverseStringFilter.START_OF_HEADING_MARKER '\\u0001'.
    reverse_wildcards: bool = False
    #: WordDelimiterFilter analog (word_delimiter_parts above), default
    #: factory config: every tokenizer token splits into its subwords, each
    #: taking one position (combinations=0 — the expanded stream re-ordinals).
    #: Pair with a whitespace tokenizer (token_pattern=r"\S+") as the
    #: reference recommends (WordDelimiterFilter.java:100-104: "used after a
    #: tokenizer that does not [remove intra-word delimiters]").
    word_delimiter: bool = False
    #: NGramTokenFilter analog (analysis/ngram/NGramTokenFilter.java):
    #: (minGram, maxGram) — every token expands to ALL its n-grams (per
    #: start position, sizes ascending — incrementToken:120-135), all at
    #: the source token's position (first gram carries the posinc, rest 0,
    #: so doclen counts the source token once); tokens shorter than
    #: minGram are REMOVED (the CodepointCountFilter wrap, :74), leaving a
    #: position hole and shrinking the norm length.  INDEX-side only
    #: (query_form strips it — the reference schema idiom pairs an
    #: n-gram index analyzer with a plain query analyzer).
    ngram: tuple | None = None
    #: EdgeNGramTokenFilter analog (analysis/ngram/EdgeNGramTokenFilter
    #: .java:82-118): front-anchored grams only, sizes min..min(max, len);
    #: shorter-than-minGram tokens are skipped with their position
    #: increments accumulated (savePosIncr, :94).  INDEX-side only.
    edge_ngram: tuple | None = None
    #: LengthFilter analog (analysis/miscellaneous/LengthFilter.java:40-60):
    #: (min, max) — tokens outside the length band drop like stopwords
    #: (FilteringTokenFilter keeps position increments, so holes remain);
    #: applied at the stop-filter stage, before stemming/grams.
    length_filter: tuple | None = None
    #: PhoneticFilter analog (lucene/analysis/phonetic/PhoneticFilter
    #: .java:55-98) with the commons-codec Soundex encoder (phonetic.py).
    #: None or "soundex"; applied after stop/length/stem.  With
    #: phonetic_inject=True the code joins the token as a posinc-0
    #: same-position twin (doclen unchanged, discountOverlaps); with
    #: False the code REPLACES the token.  Letterless tokens (empty
    #: code) always pass through unchanged, as the reference filter does.
    phonetic: str | None = None
    phonetic_inject: bool = True
    #: TrimFilter analog (analysis/miscellaneous/TrimFilter.java:48-78):
    #: strip leading/trailing whitespace from each token — a no-op under
    #: whitespace-splitting tokenizers, meaningful with keyword/pattern
    #: tokenizers; an all-whitespace token becomes the EMPTY token and is
    #: kept, as the reference filter keeps it (pair with length_filter to
    #: drop).  Runs right after the tokenizer.
    trim: bool = False
    #: LimitTokenCountFilter analog (miscellaneous/LimitTokenCountFilter
    #: .java:50-72): only the first N tokenizer tokens pass (the indexing
    #: truncation guard); positions/doclen shrink accordingly.  Runs right
    #: after the tokenizer, before every other filter.
    limit_tokens: int | None = None
    #: PatternReplaceFilter analog (analysis/pattern/PatternReplaceFilter
    #: .java:44-72): regex substitution inside each token —
    #: (pattern, replacement, replace_all); an emptied token is kept,
    #: like the reference (javadoc: pair with LengthFilter to drop).
    #: Runs after lowercase/fold, before the stop stage, vocabulary-rate.
    #: Python `re` syntax (documented divergence from java.util.regex for
    #: exotic constructs; the shared subset is identical).
    pattern_replace: tuple | None = None
    #: KeepWordFilter analog (miscellaneous/KeepWordFilter.java:33-47):
    #: the inverse stop filter — only listed words survive, dropped
    #: tokens leave position holes (FilteringTokenFilter semantics).
    keep_words: frozenset | tuple | None = None
    #: TypeTokenFilter analog (analysis/core/TypeTokenFilter.java:28-60,
    #: stop-types mode): drop tokens whose type is listed.  The UAX#29
    #: subset grammar yields two types on this corpus — '<NUM>' (digits
    #: only) and '<ALPHANUM>' (everything else); classification follows
    #: StandardTokenizer's type assignment for ASCII input.
    stop_types: tuple | None = None
    #: SetKeywordMarkerFilter analog (analysis/miscellaneous/
    #: SetKeywordMarkerFilter.java:28-49 + KeywordMarkerFilter): listed
    #: terms are marked keywords and the stemmer leaves them untouched
    #: (PorterStemFilter honors KeywordAttribute, PorterStemFilter.java).
    keyword_marker: tuple | None = None
    #: TruncateTokenFilter analog (analysis/miscellaneous/
    #: TruncateTokenFilter.java:34-48): tokens truncate to the prefix of
    #: length n; shorter tokens pass unchanged.  Runs with
    #: pattern_replace, after lowercase/fold and BEFORE the stop stage.
    truncate: int | None = None
    #: RemoveDuplicatesTokenFilter analog (analysis/miscellaneous/
    #: RemoveDuplicatesTokenFilter.java:34-66): a token is dropped iff it
    #: has the same term text as an already-emitted token AT THE SAME
    #: position (posinc 0) — the synonym/phonetic de-dup; runs LAST.
    remove_duplicates: bool = False
    #: CommonGramsFilter analog (analysis/commongrams/CommonGramsFilter
    #: .java:102-183): for every adjacent token pair where EITHER member
    #: is a common word, a '_'-joined gram is ALSO indexed as a posinc-0
    #: overlap at the LEFT word's position (posLen 2; doclen discounts
    #: overlaps).  Replaces the stop filter — the Solr schema idiom keeps
    #: common words as unigrams too — so requires stopwords=frozenset().
    #: query_form() switches to the CommonGramsQueryFilter semantics
    #: (CommonGramsQueryFilter.java:83-115): output bigrams whenever
    #: possible, a unigram only when it is not a member of one — a phrase
    #: like "the batch" answers from ONE gram posting list instead of
    #: intersecting a stopword-hot list.
    common_grams: tuple | None = None
    #: internal — the query-side CommonGramsQueryFilter form; set by
    #: query_form(), never persisted (index meta stores the index chain)
    common_grams_query: bool = False
    #: DelimitedPayloadTokenFilter analog (lucene/analysis/common .../
    #: payloads/DelimitedPayloadTokenFilter.java:64-77 + FloatEncoder): a
    #: token of form `text<delim>payload` splits at the FIRST delimiter;
    #: the remainder parses as a float32 payload (parse failure raises,
    #: the FloatEncoder NumberFormatException).  Tokens without the
    #: delimiter carry NO payload (NaN in the stored stream).  Runs right
    #: after the tokenizer, BEFORE lowercase/stop — the reference chain
    #: order (whitespace tokenizer -> DPTF -> lowercase -> stop).
    #: Index-side only; query_form strips it.
    payload_delim: str | None = None

    def __post_init__(self):
        if isinstance(self.synonyms, dict):
            object.__setattr__(
                self, "synonyms",
                tuple(sorted((k, tuple(v)) for k, v in self.synonyms.items())),
            )
        if self.shingle and self.synonyms:
            raise ValueError(
                "shingle + synonyms in one chain is not supported"
            )
        if self.ngram is not None and self.edge_ngram is not None:
            raise ValueError("ngram and edge_ngram are mutually exclusive")
        if self.payload_delim is not None and (
            self.synonyms or self.shingle or self.ngram or self.edge_ngram
            or self.word_delimiter or self.reverse_wildcards or self.phonetic
        ):
            raise ValueError(
                "payload_delim does not compose with token-expanding "
                "filters (synonyms/shingle/grams/word_delimiter/"
                "reverse_wildcards/phonetic) — pair it with a whitespace "
                "tokenizer, lowercase, stop, length and stem only"
            )
        if self.keep_words is not None:
            object.__setattr__(
                self, "keep_words", tuple(sorted(set(self.keep_words))))
        if self.keyword_marker is not None:
            object.__setattr__(
                self, "keyword_marker",
                tuple(sorted(set(self.keyword_marker))))
        if self.truncate is not None and self.truncate < 1:
            raise ValueError("truncate must be >= 1")
        if self.stop_types is not None:
            bad = set(self.stop_types) - {"<NUM>", "<ALPHANUM>"}
            if bad:
                raise ValueError(f"unknown token types {sorted(bad)!r}")
            object.__setattr__(
                self, "stop_types", tuple(sorted(set(self.stop_types))))
        if self.limit_tokens is not None and self.limit_tokens < 1:
            raise ValueError("limit_tokens must be >= 1")
        if self.pattern_replace is not None:
            pr = tuple(self.pattern_replace)
            if len(pr) == 2:
                pr = (*pr, True)
            if len(pr) != 3:
                raise ValueError(
                    "pattern_replace = (pattern, replacement[, all])")
            re.compile(pr[0])  # fail fast on a bad pattern
            object.__setattr__(
                self, "pattern_replace", (pr[0], pr[1], bool(pr[2])))
        if self.common_grams is not None:
            object.__setattr__(
                self, "common_grams",
                tuple(sorted(set(self.common_grams))))
            if self.stopwords:
                raise ValueError(
                    "common_grams REPLACES the stop filter (the Solr "
                    "schema idiom keeps common words as unigrams): pass "
                    "stopwords=frozenset()"
                )
            if (self.synonyms or self.shingle or self.ngram
                    or self.edge_ngram or self.word_delimiter
                    or self.reverse_wildcards or self.phonetic
                    or self.payload_delim or self.stem
                    or self.length_filter or self.keep_words
                    or self.stop_types):
                raise ValueError(
                    "common_grams composes with tokenizer/lowercase/"
                    "fold_ascii/strip_html/trim/limit_tokens only "
                    "(hole-punching filters break its adjacency)"
                )
        if self.length_filter is not None:
            lmn, lmx = self.length_filter
            if lmn < 0:
                raise ValueError(
                    "minimum length must be greater than or equal to zero")
            if lmn > lmx:
                raise ValueError(
                    "maximum length must not be greater than minimum length")
            object.__setattr__(self, "length_filter", (int(lmn), int(lmx)))
        grams = self.ngram or self.edge_ngram
        if grams is not None:
            mn, mx = grams
            if mn < 1:
                raise ValueError("minGram must be greater than zero")
            if mn > mx:
                raise ValueError("minGram must not be greater than maxGram")
            if self.shingle or self.synonyms or self.reverse_wildcards:
                raise ValueError(
                    "ngram filters do not compose with shingle/synonyms/"
                    "reversed-wildcard chains")
            object.__setattr__(
                self, "ngram" if self.ngram else "edge_ngram",
                (int(mn), int(mx)))
        if self.phonetic is not None:
            if self.phonetic != "soundex":
                raise ValueError(
                    f"unknown phonetic encoder {self.phonetic!r}")
            if self.shingle or self.ngram or self.edge_ngram:
                raise ValueError(
                    "phonetic does not compose with shingle/ngram chains")

    def query_form(self) -> "Analyzer":
        """The chain as applied to QUERY text: identical, minus the
        reversed-twin injection.  Solr puts ReversedWildcardFilter in the
        *index* analyzer only (ReversedWildcardFilterFactory.java:50-59
        schema example) — query terms/phrases must analyze to the original
        tokens; only the wildcard rewrite targets the twins."""
        out = self
        if out.reverse_wildcards:
            out = replace(out, reverse_wildcards=False)
        if out.ngram is not None or out.edge_ngram is not None:
            # n-gram filters live in the INDEX analyzer only (the Solr
            # schema idiom for partial/autocomplete matching): query
            # tokens search as typed against the gram dictionary
            out = replace(out, ngram=None, edge_ngram=None)
        if out.payload_delim is not None:
            # payloads annotate INDEX tokens; query text is plain terms
            out = replace(out, payload_delim=None)
        if out.common_grams is not None and not out.common_grams_query:
            # query side runs the CommonGramsQueryFilter variant
            out = replace(out, common_grams_query=True)
        return out

    @property
    def is_standard(self) -> bool:
        return (
            self.token_pattern == TOKEN_PATTERN
            and self.lowercase
            and self.stopwords == ENGLISH_STOP_WORDS
            and self.max_token_length == MAX_TOKEN_LENGTH
            and self.stem is None
            and not self.fold_ascii
            and not self.synonyms
            and not self.strip_html
            and not self.shingle
            and not self.reverse_wildcards
            and not self.word_delimiter
            and self.ngram is None
            and self.edge_ngram is None
            and self.length_filter is None
            and self.phonetic is None
            and self.payload_delim is None
            and self.common_grams is None
            and not self.trim
            and self.limit_tokens is None
            and self.pattern_replace is None
            and self.keep_words is None
            and self.stop_types is None
            and self.keyword_marker is None
            and self.truncate is None
            and not self.remove_duplicates
        )

    # -- serialization (stored in index meta so queries analyze identically)
    def to_dict(self) -> dict:
        return {
            "token_pattern": self.token_pattern,
            "lowercase": self.lowercase,
            "stopwords": sorted(self.stopwords),
            "max_token_length": self.max_token_length,
            "stem": self.stem,
            "fold_ascii": self.fold_ascii,
            "strip_html": self.strip_html,
            "synonyms": (
                [[k, list(v)] for k, v in self.synonyms]
                if self.synonyms else None
            ),
            "shingle": self.shingle,
            "reverse_wildcards": self.reverse_wildcards,
            "word_delimiter": self.word_delimiter,
            "ngram": list(self.ngram) if self.ngram else None,
            "edge_ngram": list(self.edge_ngram) if self.edge_ngram else None,
            "length_filter": (list(self.length_filter)
                              if self.length_filter else None),
            "phonetic": self.phonetic,
            "phonetic_inject": self.phonetic_inject,
            "payload_delim": self.payload_delim,
            "common_grams": (list(self.common_grams)
                             if self.common_grams else None),
            "trim": self.trim,
            "limit_tokens": self.limit_tokens,
            "pattern_replace": (list(self.pattern_replace)
                                if self.pattern_replace else None),
            "keep_words": (list(self.keep_words)
                           if self.keep_words else None),
            "stop_types": (list(self.stop_types)
                           if self.stop_types else None),
            "keyword_marker": (list(self.keyword_marker)
                               if self.keyword_marker else None),
            "truncate": self.truncate,
            "remove_duplicates": self.remove_duplicates,
        }

    @staticmethod
    def from_dict(d: dict | None) -> "Analyzer":
        if not d:
            return STANDARD_ANALYZER
        syn = d.get("synonyms")
        return Analyzer(
            token_pattern=d["token_pattern"],
            lowercase=bool(d["lowercase"]),
            stopwords=frozenset(d["stopwords"]),
            max_token_length=int(d["max_token_length"]),
            stem=d.get("stem"),  # absent in pre-stemmer metas
            fold_ascii=bool(d.get("fold_ascii", False)),
            strip_html=bool(d.get("strip_html", False)),
            synonyms=(
                tuple((k, tuple(v)) for k, v in syn) if syn else None
            ),
            shingle=bool(d.get("shingle", False)),
            reverse_wildcards=bool(d.get("reverse_wildcards", False)),
            word_delimiter=bool(d.get("word_delimiter", False)),
            ngram=tuple(d["ngram"]) if d.get("ngram") else None,
            edge_ngram=(tuple(d["edge_ngram"])
                        if d.get("edge_ngram") else None),
            length_filter=(tuple(d["length_filter"])
                           if d.get("length_filter") else None),
            phonetic=d.get("phonetic"),
            phonetic_inject=bool(d.get("phonetic_inject", True)),
            payload_delim=d.get("payload_delim"),
            common_grams=(tuple(d["common_grams"])
                          if d.get("common_grams") else None),
            trim=bool(d.get("trim", False)),
            limit_tokens=d.get("limit_tokens"),
            pattern_replace=(tuple(d["pattern_replace"])
                             if d.get("pattern_replace") else None),
            keep_words=(tuple(d["keep_words"])
                        if d.get("keep_words") else None),
            stop_types=(tuple(d["stop_types"])
                        if d.get("stop_types") else None),
            keyword_marker=(tuple(d["keyword_marker"])
                            if d.get("keyword_marker") else None),
            truncate=d.get("truncate"),
            remove_duplicates=bool(d.get("remove_duplicates", False)),
        )

    # -- single string (query parsing, tests, oracle)
    def analyze_text(self, text: str) -> tuple[list[str], list[int]]:
        if self.is_standard and not self.common_grams_query:
            return analyze_text(text)
        if self.strip_html:
            text = strip_html(text or "")
        toks = self._chunk(_compiled(self.token_pattern).findall(text or ""))
        if self.limit_tokens is not None:
            toks = toks[: self.limit_tokens]
        if self.trim:
            toks = [t.strip() for t in toks]
        if self.payload_delim is not None:
            # strip the payload annotation — term/position semantics only
            # (the per-token payload stream lives on the batch path)
            toks = [t.split(self.payload_delim, 1)[0] for t in toks]
        if self.word_delimiter:
            # combinations=0: each part takes one position, the expanded
            # stream re-ordinals (WordDelimiterFilter.java:69-71 golden)
            toks = [p for t in toks for p in word_delimiter_parts(t)]
        terms, positions = [], []
        lf = self.length_filter
        pr = self.pattern_replace
        pr_pat = re.compile(pr[0]) if pr is not None else None
        kw = frozenset(self.keep_words) if self.keep_words else None
        st = self.stop_types
        for pos, tok in enumerate(toks):
            t = tok.lower() if self.lowercase else tok
            if self.fold_ascii:
                t = fold_to_ascii(t)
            if pr_pat is not None:
                t = pr_pat.sub(pr[1], t, count=0 if pr[2] else 1)
            if self.truncate is not None:
                t = t[: self.truncate]
            if t in self.stopwords:
                continue
            if kw is not None and t not in kw:
                continue  # KeepWordFilter drop: position hole remains
            if st is not None and _token_type(t) in st:
                continue  # TypeTokenFilter drop: position hole remains
            if lf is not None and not (lf[0] <= len(t) <= lf[1]):
                continue  # LengthFilter drop: position hole remains
            terms.append(t)
            positions.append(pos)
        if self.common_grams is not None:
            common = frozenset(self.common_grams)
            if self.common_grams_query:
                terms, positions = _common_grams_query(
                    terms, positions, common)
            else:
                terms, positions = _common_grams_index(
                    terms, positions, common)
        if self.stem == "porter":
            from .porter import stem as _pstem

            kwm = frozenset(self.keyword_marker or ())
            terms = [t if t in kwm else _pstem(t) for t in terms]
        if self.phonetic:
            from .phonetic import soundex as _sdx

            t2, p2 = [], []
            for t, p in zip(terms, positions):
                code = _sdx(t)
                if not code or code == t:
                    t2.append(t)
                    p2.append(p)
                elif self.phonetic_inject:
                    # code first, original restored at posinc 0
                    # (PhoneticFilter.java:84-96)
                    t2.extend((code, t))
                    p2.extend((p, p))
                else:
                    t2.append(code)
                    p2.append(p)
            terms, positions = t2, p2
        if self.ngram or self.edge_ngram:
            mn, mx = self.ngram or self.edge_ngram
            edge = self.edge_ngram is not None
            t2, p2 = [], []
            for t, p in zip(terms, positions):
                for g in _token_grams(t, mn, mx, edge):
                    t2.append(g)  # all grams share the source position
                    p2.append(p)
            terms, positions = t2, p2
        if self.shingle:
            terms, positions = _shingle_stream(terms, positions, len(toks))
        if self.reverse_wildcards:
            t2, p2 = [], []
            for t, p in zip(terms, positions):
                t2.append(t)
                p2.append(p)
                t2.append(REVERSE_MARKER + t[::-1])  # posinc-0 twin
                p2.append(p)
            terms, positions = t2, p2
        if self.synonyms:
            smap = dict(self.synonyms)
            t2, p2 = [], []
            for t, p in zip(terms, positions):
                t2.append(t)
                p2.append(p)
                for s in smap.get(t, ()):
                    t2.append(s)  # injected at the same position (posinc 0)
                    p2.append(p)
            terms, positions = t2, p2
        if self.remove_duplicates:
            seen: set = set()
            t2, p2 = [], []
            for t, p in zip(terms, positions):
                if (p, t) in seen:
                    continue
                seen.add((p, t))
                t2.append(t)
                p2.append(p)
            terms, positions = t2, p2
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
        self, texts: pd.Series, want_payloads: bool = False
    ) -> tuple:
        """4-tuple (terms, pos, docidx, doclens); with want_payloads=True
        (requires payload_delim) a 5th float32 array rides along — one
        payload per emitted token, NaN where the token carried none."""
        if self.is_standard:
            return analyze_flat(texts)
        from itertools import chain as _chain

        if self.strip_html:
            texts = strip_html_series(texts)
        pat = _compiled(self.token_pattern)
        toks = texts.fillna("").str.findall(pat)
        mx = self.max_token_length
        if mx:
            toks = toks.map(self._chunk)
        if self.limit_tokens is not None:
            lim = self.limit_tokens
            toks = toks.map(lambda lst: lst[:lim])
        if self.word_delimiter:
            # memoized per unique raw token — vocabulary-rate scalar cost,
            # same discipline as the stemmer/folder below
            memo: dict = {}

            def _expand(lst: list) -> list:
                out = []
                for t in lst:
                    parts = memo.get(t)
                    if parts is None:
                        parts = memo[t] = word_delimiter_parts(t)
                    out.extend(parts)
                return out

            toks = toks.map(_expand)
        raw_lens = toks.map(len).to_numpy(dtype=np.int64)
        total = int(raw_lens.sum())
        if total == 0:
            z = np.zeros(0, dtype=np.int64)
            empty = (np.zeros(0, dtype=object), z, z,
                     np.zeros(len(texts), dtype=np.int64))
            return empty + (np.zeros(0, dtype=np.float32),) if want_payloads \
                else empty
        flat = pd.Series(
            np.fromiter(_chain.from_iterable(toks), dtype=object, count=total),
            dtype=object,
        )
        pay_flat = None
        if self.payload_delim is not None:
            # DelimitedPayloadTokenFilter: split at the FIRST delimiter,
            # parse the remainder as float32 (FloatEncoder — parse failure
            # raises, the NumberFormatException analog); runs right after
            # the tokenizer, before lowercase/stop
            split = flat.str.split(self.payload_delim, n=1)
            has = (split.str.len() > 1).to_numpy()
            pay_flat = np.full(total, np.nan, dtype=np.float32)
            if has.any():
                pay_flat[has] = (
                    pd.to_numeric(split[has].str[1], errors="raise")
                    .to_numpy(dtype=np.float32)
                )
            flat = split.str[0]
        if self.trim:
            flat = flat.str.strip()
        if self.lowercase:
            flat = flat.str.lower()
        if self.fold_ascii:
            # fold the batch VOCABULARY once, map back by code (same
            # vocabulary-rate discipline as the stemmer below)
            codes, uniq = pd.factorize(flat)
            folded = np.array([fold_to_ascii(u) for u in uniq], dtype=object)
            flat = pd.Series(folded[codes], dtype=object)
        if self.pattern_replace is not None:
            # substitute the batch VOCABULARY once, map back by code —
            # the stemmer's vocabulary-rate discipline
            p, rrepl, rall = self.pattern_replace
            rx = re.compile(p)
            codes, uniq = pd.factorize(flat)
            rep = np.array(
                [rx.sub(rrepl, u, count=0 if rall else 1) for u in uniq],
                dtype=object)
            flat = pd.Series(rep[codes], dtype=object)
        if self.truncate is not None:
            flat = flat.str.slice(0, self.truncate)
        keep = (
            ~flat.isin(self.stopwords) if self.stopwords
            else pd.Series(True, index=flat.index)
        )
        if self.keep_words is not None:
            keep &= flat.isin(frozenset(self.keep_words))
        if self.stop_types is not None:
            is_num = flat.str.fullmatch(r"[0-9]+").fillna(False)
            if "<NUM>" in self.stop_types:
                keep &= ~is_num
            if "<ALPHANUM>" in self.stop_types:
                keep &= is_num
        if self.length_filter is not None:
            lens = flat.str.len()
            keep &= (lens >= self.length_filter[0]) & (
                lens <= self.length_filter[1])
        doc_starts = np.concatenate(([0], np.cumsum(raw_lens)[:-1]))
        pos = np.arange(total, dtype=np.int64) - np.repeat(doc_starts, raw_lens)
        docidx = np.repeat(np.arange(len(texts), dtype=np.int64), raw_lens)
        keep_np = keep.to_numpy()
        doclens = np.zeros(len(texts), dtype=np.int64)
        np.add.at(doclens, docidx[keep_np], 1)
        out_terms = flat.to_numpy()[keep_np]
        out_pos, out_doc = pos[keep_np], docidx[keep_np]
        if self.common_grams is not None and out_terms.size > 1:
            # CommonGramsFilter, vectorized: the flat stream is doc-major
            # position-ascending and hole-free (stopwords are required
            # empty), so adjacency = consecutive entries in one doc; the
            # grams ride at the left word's position as posinc-0 overlaps
            # — doclens unchanged (discountOverlaps)
            cset = frozenset(self.common_grams)
            nxt = (out_doc[1:] == out_doc[:-1]) & \
                  (out_pos[1:] == out_pos[:-1] + 1)
            is_c = pd.Series(out_terms).isin(cset).to_numpy()
            make = nxt & (is_c[:-1] | is_c[1:])
            if make.any():
                left = np.flatnonzero(make)
                grams = (
                    pd.Series(out_terms[left]).astype(str)
                    .str.cat(pd.Series(out_terms[left + 1]).astype(str),
                             sep="_")
                    .to_numpy(dtype=object)
                )
                out_terms = np.concatenate((out_terms, grams))
                out_pos = np.concatenate((out_pos, out_pos[left]))
                out_doc = np.concatenate((out_doc, out_doc[left]))
                order = np.lexsort((out_pos, out_doc))
                out_terms = out_terms[order]
                out_pos, out_doc = out_pos[order], out_doc[order]
        if self.stem == "porter":
            # stem the batch VOCABULARY once, map back by code — keeps the
            # scalar stemmer off the token-stream hot path
            from .porter import stem as _pstem

            kwm = frozenset(self.keyword_marker or ())
            codes, uniq = pd.factorize(out_terms)
            stemmed = np.array(
                [u if u in kwm else _pstem(u) for u in uniq], dtype=object)
            out_terms = stemmed[codes]
        if self.phonetic and out_terms.size:
            # encode the batch VOCABULARY once, map back by code — the
            # stemmer's vocabulary-rate discipline.  Letterless/identical
            # codes pass the token through untouched.
            from .phonetic import soundex as _sdx

            codes, uniq = pd.factorize(out_terms)
            enc = np.array([_sdx(u) for u in uniq], dtype=object)
            applies = np.array(
                [bool(e) and e != u for e, u in zip(enc, uniq)])
            tok_applies = applies[codes]
            if self.phonetic_inject:
                if tok_applies.any():
                    # posinc-0 twins: doclens unchanged (discountOverlaps)
                    out_terms = np.concatenate(
                        (out_terms, enc[codes][tok_applies]))
                    out_pos = np.concatenate(
                        (out_pos, out_pos[tok_applies]))
                    out_doc = np.concatenate(
                        (out_doc, out_doc[tok_applies]))
                    order = np.lexsort((out_pos, out_doc))
                    out_terms = out_terms[order]
                    out_pos, out_doc = out_pos[order], out_doc[order]
            else:
                repl = np.where(applies, enc, uniq)
                out_terms = repl[codes]
        if (self.ngram or self.edge_ngram) and out_terms.size:
            # vocabulary-rate gram computation (factorize once, expand per
            # unique), token-rate numpy repeats for positions/doc ids;
            # dropped short tokens shrink the norm length like the
            # reference's CodepointCountFilter removal
            mn, mx = self.ngram or self.edge_ngram
            edge = self.edge_ngram is not None
            codes, uniq = pd.factorize(out_terms)
            per_uniq = [
                np.asarray(_token_grams(u, mn, mx, edge), dtype=object)
                for u in uniq
            ]
            counts = np.array([g.size for g in per_uniq], dtype=np.int64)
            tok_counts = counts[codes]
            dropped = tok_counts == 0
            if dropped.any():
                np.add.at(doclens, out_doc[dropped], -1)
            out_pos = np.repeat(out_pos, tok_counts)
            out_doc = np.repeat(out_doc, tok_counts)
            if int(tok_counts.sum()):
                out_terms = np.concatenate(
                    [per_uniq[c] for c in codes if per_uniq[c].size])
            else:
                out_terms = np.zeros(0, dtype=object)
        if self.shingle and out_terms.size:
            out_terms, out_pos, out_doc, doclens = _shingle_flat(
                out_terms, out_pos, out_doc, raw_lens, len(texts)
            )
        if self.reverse_wildcards and out_terms.size:
            # reverse the batch VOCABULARY once, map back by code (the
            # stemmer's vocabulary-rate discipline); twins are posinc-0
            # overlaps so doclens are unchanged
            codes, uniq = pd.factorize(out_terms)
            rev = np.array(
                [REVERSE_MARKER + u[::-1] for u in uniq], dtype=object
            )
            out_terms = np.concatenate((out_terms, rev[codes]))
            out_pos = np.concatenate((out_pos, out_pos))
            out_doc = np.concatenate((out_doc, out_doc))
            order = np.lexsort((out_pos, out_doc))
            out_terms = out_terms[order]
            out_pos, out_doc = out_pos[order], out_doc[order]
        if self.synonyms:
            extra_t, extra_p, extra_d = [], [], []
            for k, syns in self.synonyms:
                m = out_terms == k
                nsrc = int(m.sum())
                if nsrc == 0:
                    continue
                for s in syns:
                    extra_t.append(np.full(nsrc, s, dtype=object))
                    extra_p.append(out_pos[m])
                    extra_d.append(out_doc[m])
            if extra_t:
                out_terms = np.concatenate([out_terms] + extra_t)
                out_pos = np.concatenate([out_pos] + extra_p)
                out_doc = np.concatenate([out_doc] + extra_d)
                # restore the (doc asc, pos asc) stream contract the invert
                # kernel's single stable term-sort relies on
                order = np.lexsort((out_pos, out_doc))
                out_terms = out_terms[order]
                out_pos, out_doc = out_pos[order], out_doc[order]
            # doclens unchanged: injected tokens are posinc-0 overlaps and
            # discountOverlaps=true excludes overlaps from the norm length
        if self.remove_duplicates and out_terms.size:
            # keep-first over (doc, pos, term) — posinc-0 duplicates only
            dup = pd.DataFrame(
                {"d": out_doc, "p": out_pos, "t": out_terms}
            ).duplicated().to_numpy()
            if dup.any():
                out_terms = out_terms[~dup]
                out_pos, out_doc = out_pos[~dup], out_doc[~dup]
        if want_payloads:
            if self.payload_delim is None:
                raise ValueError("want_payloads requires payload_delim")
            # __post_init__ forbids token-expanding filters with payloads,
            # so the post-keep stream is 1:1 with the tokenizer stream
            return out_terms, out_pos, out_doc, doclens, pay_flat[keep_np]
        return out_terms, out_pos, out_doc, doclens

    # -- whole batch -> dictionary-coded flat arrays (invert fast path)
    def analyze_flat_codes(self, texts: pd.Series, want_offsets: bool = False,
                           want_payloads: bool = False):
        if self.is_standard:
            return analyze_flat_codes(texts, want_offsets=want_offsets)
        if want_payloads:
            terms, pos, docidx, doclens, pay = self.analyze_flat(
                texts, want_payloads=True)
        else:
            terms, pos, docidx, doclens = self.analyze_flat(texts)
        codes, uniques = pd.factorize(terms, sort=True)
        base = (codes.astype(np.int64), np.asarray(uniques, dtype=object),
                pos, docidx, doclens)
        if want_payloads:
            base = base + (pay,)
        if not want_offsets:
            return base
        # custom chains run the generic (span-free) path: offsets
        # unavailable, every doc reports count 0 (callers re-analyze)
        z = np.zeros(0, dtype=np.int64)
        return base + ((z, z, np.zeros(len(texts), dtype=np.int64)),)


def _token_grams(t: str, mn: int, mx: int, edge: bool) -> list[str]:
    """All grams of one token in the reference's emission order: edge =
    front-anchored sizes mn..min(mx, len) (EdgeNGramTokenFilter.java:98-
    112); full = per start position, sizes ascending
    (NGramTokenFilter.java:120-135).  Empty when len(t) < mn (the
    CodepointCountFilter drop)."""
    L = len(t)
    if L < mn:
        return []
    if edge:
        return [t[:g] for g in range(mn, min(mx, L) + 1)]
    return [t[s:s + g] for s in range(0, L - mn + 1)
            for g in range(mn, min(mx, L - s) + 1)]


STANDARD_ANALYZER = Analyzer()


# -- ShingleFilter (default config) ------------------------------------------

def _shingle_stream(
    terms: list[str], positions: list[int], n_pre: int
) -> tuple[list[str], list[int]]:
    """Default-config ShingleFilter over one doc's analyzed (term, pre-stop
    position) stream: bigrams + unigrams, separator " ", filler "_".

    Reference `analysis/shingle/ShingleFilter.java`: interior holes insert
    min(gap, maxShingleSize-1) = 1 filler (:396-399), exhaustion inserts
    min(endPosInc, maxShingleSize-1) = 1 trailing filler (:417-419), fillers
    are never emitted as unigrams, all-filler shingles are skipped
    (:314-337; impossible at maxShingleSize=2 with 1-filler holes).  A
    shingle is emitted at its window head's position: after the head's
    unigram (overlap) for real heads, first-at-position for filler heads.
    """
    if not terms:
        return terms, positions
    st: list[str] = []
    sp: list[int] = []
    sreal: list[bool] = []
    prev = None
    for t, p in zip(terms, positions):
        if prev is not None and p - prev > 1:
            st.append("_")
            sp.append(prev + 1)
            sreal.append(False)
        st.append(t)
        sp.append(p)
        sreal.append(True)
        prev = p
    if n_pre - 1 > prev:
        st.append("_")
        sp.append(prev + 1)
        sreal.append(False)
    out_t: list[str] = []
    out_p: list[int] = []
    for i in range(len(st)):
        if sreal[i]:
            out_t.append(st[i])
            out_p.append(sp[i])
        if i + 1 < len(st):
            out_t.append(st[i] + " " + st[i + 1])
            out_p.append(sp[i])
    return out_t, out_p


def _shingle_flat(
    out_terms: np.ndarray, out_pos: np.ndarray, out_doc: np.ndarray,
    raw_lens: np.ndarray, n_docs: int,
):
    """Vectorized _shingle_stream over the whole batch's flat (doc asc,
    pos asc) stream; returns the widened stream plus recomputed doclens
    (= distinct emitted positions per doc — the discountOverlaps norm)."""
    n = out_terms.size
    same = np.empty(n, dtype=bool)
    same[0] = False
    np.equal(out_doc[1:], out_doc[:-1], out=same[1:])
    prev_pos = np.empty(n, dtype=np.int64)
    prev_pos[0] = 0
    prev_pos[1:] = out_pos[:-1]
    hole = same & (out_pos - prev_pos > 1)
    fill_pos = [prev_pos[hole] + 1]
    fill_doc = [out_doc[hole]]
    is_last = np.empty(n, dtype=bool)
    is_last[-1] = True
    np.not_equal(out_doc[1:], out_doc[:-1], out=is_last[:-1])
    trail = is_last & (raw_lens[out_doc] - 1 > out_pos)
    fill_pos.append(out_pos[trail] + 1)
    fill_doc.append(out_doc[trail])
    fp = np.concatenate(fill_pos)
    fd = np.concatenate(fill_doc)
    st = np.concatenate((out_terms, np.full(fp.size, "_", dtype=object)))
    sp = np.concatenate((out_pos, fp))
    sd = np.concatenate((out_doc, fd))
    sreal = np.concatenate(
        (np.ones(n, dtype=bool), np.zeros(fp.size, dtype=bool))
    )
    order = np.lexsort((sp, sd))
    st, sp, sd, sreal = st[order], sp[order], sd[order], sreal[order]
    pair = np.empty(st.size, dtype=bool)
    pair[-1] = False
    np.equal(sd[1:], sd[:-1], out=pair[:-1])
    i = np.flatnonzero(pair)
    sh_terms = st[i] + " " + st[i + 1]
    new_t = np.concatenate((st[sreal], sh_terms))
    new_p = np.concatenate((sp[sreal], sp[i]))
    new_d = np.concatenate((sd[sreal], sd[i]))
    order = np.lexsort((new_p, new_d))
    new_t, new_p, new_d = new_t[order], new_p[order], new_d[order]
    first = np.empty(new_t.size, dtype=bool)
    if new_t.size:
        first[0] = True
        first[1:] = (new_d[1:] != new_d[:-1]) | (new_p[1:] != new_p[:-1])
    doclens = np.zeros(n_docs, dtype=np.int64)
    np.add.at(doclens, new_d[first], 1)
    return new_t, new_p, new_d, doclens
