"""Phonetic token matching, Spark-first (reference module
`lucene/analysis/phonetic`).

Reference semantics re-expressed (not ported):

* `PhoneticFilter.java:55-98` — each token is encoded; when the code is
  non-empty and differs from the token, either the token is REPLACED by
  the code (``inject=false``) or the code is emitted as a same-position
  synonym (``inject=true``: the code first with the original position
  increment, then the original restored at increment 0 — one position,
  two tokens, exactly the SynonymFilter overlap shape the norm already
  discounts).
* `PhoneticFilterFactory.java` — the encoder slot is an Apache
  commons-codec language encoder; the Soundex implementation here is
  clean-room from the published commons-codec semantics
  (``org.apache.commons.codec.language.Soundex``): US English mapping
  ``01230120022455012623010202``, 4-character zero-padded codes, and the
  commons register rules — vowels reset the duplicate-suppression
  register, H/W reset it too but additionally suppress a following
  consonant whose code matches across the H/W gap (or whose
  second-predecessor is itself H/W).

The encoder is deliberately a pure character-scan state machine so the
DuckDB gate oracle can reproduce it EXACTLY as a recursive CTE over the
distinct vocabulary (one state row per (term, position)) — no
approximate regex formulation; `tests/test_phonetic.py` carries the
published commons-codec goldens plus a randomized Python-vs-SQL
differential sweep.
"""

from __future__ import annotations

import re

__all__ = ["soundex", "SOUNDEX_MAPPING"]

#: commons-codec US_ENGLISH_MAPPING_STRING (A..Z)
SOUNDEX_MAPPING = "01230120022455012623010202"

_CLEAN_RE = re.compile(r"[^A-Z]")


def _map(ch: str) -> str:
    return SOUNDEX_MAPPING[ord(ch) - 65]


def soundex(term: str) -> str:
    """Soundex.soundex(String): 4-char code, '' for letterless input.

    The commons-codec scan: the first cleaned letter passes through
    verbatim and seeds the register; each further letter's code is
    emitted when it is neither a vowel code ('0') nor equal to the
    register, and the register takes every scanned letter's code —
    except that a letter at position >= 3 whose predecessor is H or W is
    skipped entirely (no emit, no register update) when the letter two
    back is also H/W or maps to the same code
    (Soundex.getMappingCode)."""
    s = _CLEAN_RE.sub("", term.upper())
    if not s:
        return ""
    out = [s[0]]
    last = _map(s[0])
    i = 1
    while i < len(s) and len(out) < 4:
        ch = s[i]
        mapped = _map(ch)
        if i > 1 and s[i - 1] in "HW" and mapped != "0":
            pre = s[i - 2]
            if pre in "HW" or _map(pre) == mapped:
                i += 1
                continue
        if mapped != "0" and mapped != last:
            out.append(mapped)
        last = mapped
        i += 1
    return "".join(out) + "0" * (4 - len(out))


def soundex_sql(term_table: str, term_col: str = "term") -> str:
    """The EXACT commons scan as DuckDB SQL: a recursive CTE advancing
    one character per step with (emitted-prefix, register) state, run at
    vocabulary rate over ``SELECT DISTINCT {term_col} FROM {term_table}``.
    Yields relation ``sdx({term_col}, code)`` where code='' for
    letterless terms — the same contract as :func:`soundex`."""
    m = SOUNDEX_MAPPING
    return f"""
sdx_voc AS (SELECT DISTINCT {term_col} AS term FROM {term_table}),
sdx_cl AS (
  SELECT term, regexp_replace(upper(term), '[^A-Z]', '', 'g') AS s
  FROM sdx_voc
),
sdx_step AS (
  SELECT term, s, 2 AS i, substr(s, 1, 1) AS acc,
         translate(substr(s, 1, 1),
                   'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{m}') AS reg
  FROM sdx_cl WHERE s <> ''
  UNION ALL
  SELECT term, s, i + 1,
         CASE WHEN skip THEN acc
              WHEN mc <> '0' AND mc <> reg AND length(acc) < 4
                THEN acc || mc
              ELSE acc END,
         CASE WHEN skip THEN reg ELSE mc END
  FROM (
    SELECT term, s, i, acc, reg,
           translate(substr(s, i, 1),
                     'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{m}') AS mc,
           (i > 2 AND substr(s, i - 1, 1) IN ('H', 'W')
            AND translate(substr(s, i, 1),
                          'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{m}') <> '0'
            AND (substr(s, i - 2, 1) IN ('H', 'W')
                 OR translate(substr(s, i - 2, 1),
                              'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{m}')
                    = translate(substr(s, i, 1),
                                'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{m}'))
           ) AS skip
    FROM sdx_step WHERE i <= length(s)
  )
),
sdx AS (
  SELECT v.term,
         CASE WHEN f.acc IS NULL THEN ''
              ELSE f.acc || repeat('0', 4 - length(f.acc)) END AS code
  FROM sdx_voc v
  LEFT JOIN (
    SELECT term, acc FROM sdx_step st
    WHERE i = length(s) + 1
  ) f ON f.term = v.term
)"""


# sdx_step is RECURSIVE — callers splice this after a WITH RECURSIVE head.
