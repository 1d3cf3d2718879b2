"""Porter stemming (reference `lucene/analysis/common/.../en/
PorterStemmer.java`, PorterStemFilter.java) — M.F. Porter's 1980
suffix-stripping algorithm, re-implemented in Python from the published
definition (with the same two post-paper revisions the reference carries:
`bli -> ble` and `logi -> log` in the double-suffix table, and the
length-<=2 early exit).

The stemmer is a per-WORD scalar function; the analysis chain keeps it
off the hot path by stemming only the factorized UNIQUE terms of each
Arrow batch (vocabulary-sized work, not token-stream-sized — see
Analyzer.analyze_flat).
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = "aeiou"


def _cons(b: str, i: int) -> bool:
    c = b[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _cons(b, i - 1)
    return True


def _m(b: str, j: int) -> int:
    """Measure of b[0..j]: the m in [C](VC)^m[V]."""
    n = 0
    i = 0
    while True:
        if i > j:
            return n
        if not _cons(b, i):
            break
        i += 1
    i += 1
    while True:
        while True:
            if i > j:
                return n
            if _cons(b, i):
                break
            i += 1
        i += 1
        n += 1
        while True:
            if i > j:
                return n
            if not _cons(b, i):
                break
            i += 1
        i += 1


def _vowel_in_stem(b: str, j: int) -> bool:
    return any(not _cons(b, i) for i in range(j + 1))


def _doublec(b: str, k: int) -> bool:
    return k >= 1 and b[k] == b[k - 1] and _cons(b, k)


def _cvc(b: str, i: int) -> bool:
    """consonant-vowel-consonant ending at i, last consonant not w/x/y
    (the 'add an e' / 'keep the e' condition)."""
    if i < 2 or not _cons(b, i) or _cons(b, i - 1) or not _cons(b, i - 2):
        return False
    return b[i] not in "wxy"


def _ends(b: str, s: str) -> bool:
    return b.endswith(s)


def _stem_m(b: str, s: str) -> int:
    """Measure of the stem left after removing suffix s."""
    return _m(b, len(b) - len(s) - 1)


# step 2 (paper) / step3 (reference numbering): double suffix -> single,
# requires m > 0 on the stem.  Includes the reference's revised rows.
_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"), ("logi", "log"),
]

# step 3 (paper): -ic-, -ful, -ness etc., m > 0 on the stem.
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

# step 4 (paper): strip in context m > 1; "ion" needs s/t before it.
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


@lru_cache(maxsize=65536)
def stem(word: str) -> str:
    """Stem one lowercase word (words of length <= 2 are untouched, as in
    the reference's k > k0+1 guard)."""
    b = word
    if len(b) <= 2:
        return b

    # -- step 1a: plurals
    if b.endswith("sses"):
        b = b[:-2]
    elif b.endswith("ies"):
        b = b[:-2]  # ies -> i
    elif b.endswith("s") and not b.endswith("ss"):
        b = b[:-1]

    # -- step 1b: -eed / -ed / -ing
    if b.endswith("eed"):
        if _stem_m(b, "eed") > 0:
            b = b[:-1]  # eed -> ee
    else:
        stripped = None
        for suf in ("ed", "ing"):
            if b.endswith(suf) and _vowel_in_stem(b, len(b) - len(suf) - 1):
                stripped = b[: -len(suf)]
                break
        if stripped is not None:
            b = stripped
            if b.endswith(("at", "bl", "iz")):
                b += "e"
            elif _doublec(b, len(b) - 1) and b[-1] not in "lsz":
                b = b[:-1]
            elif _m(b, len(b) - 1) == 1 and _cvc(b, len(b) - 1):
                b += "e"

    # -- step 1c: terminal y -> i when the stem has a vowel
    if b.endswith("y") and _vowel_in_stem(b, len(b) - 2):
        b = b[:-1] + "i"

    # -- step 2: double suffixes (m > 0)
    for suf, rep in _STEP2:
        if b.endswith(suf):
            if _stem_m(b, suf) > 0:
                b = b[: -len(suf)] + rep
            break

    # -- step 3 (m > 0)
    for suf, rep in _STEP3:
        if b.endswith(suf):
            if _stem_m(b, suf) > 0:
                b = b[: -len(suf)] + rep
            break

    # -- step 4: strip residual suffix when m > 1
    for suf in _STEP4:
        if b.endswith(suf):
            if suf == "ion" and not (
                len(b) > len(suf) and b[-len(suf) - 1] in "st"
            ):
                continue  # -ion needs s/t before it; try no other suffix
            if _stem_m(b, suf) > 1:
                b = b[: -len(suf)]
            break

    # -- step 5a: remove final -e
    if b.endswith("e"):
        a = _m(b, len(b) - 2)
        if a > 1 or (a == 1 and not _cvc(b, len(b) - 2)):
            b = b[:-1]

    # -- step 5b: -ll -> -l when m > 1
    if b.endswith("l") and _doublec(b, len(b) - 1) and _m(b, len(b) - 1) > 1:
        b = b[:-1]

    return b
