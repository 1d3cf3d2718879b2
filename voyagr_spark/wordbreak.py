"""WordBreakSpellChecker — split/combine spelling suggestions.

Spark-first re-expression of
`/root/reference/lucene/suggest/src/java/org/apache/lucene/search/spell/
WordBreakSpellChecker.java`:

* `suggest_word_breaks` (:94-132, generateBreakUpSuggestions :258-306):
  recursively split a term at every codepoint boundary; a split survives
  when BOTH sides reach `min_suggestion_frequency` docs; recursion extends
  the right side while `number_breaks <= max_changes`, bounded by
  `max_evaluations` loop iterations exactly like the reference counter.
  Score of every word in a suggestion = number of breaks (newSuggestion
  :318-331); results order by fewest breaks, then max (or summed)
  constituent frequency descending (LengthThenMaxFreqComparator :446-458 /
  LengthThenSumFreqComparator :460-472).
* `suggest_word_combinations` (:163-254): adjacent runs of up to
  `max_changes + 1` query terms concatenate into one candidate; kept when
  the combined term's df clears the mode gate (NOT_IN_INDEX: at least one
  constituent absent, :225-227; MORE_POPULAR: combined df >= max
  constituent df, :223-224) and `min_suggestion_frequency`; score = number
  of combinations; ordered by fewest combinations then combined df desc
  (CombinationsThenFreqComparator :474-487).  `SEPARATOR_TERM` ("") blocks
  combining across it (:185-187, :202-204).

The reference issues one `IndexReader.docFreq` per candidate (an in-process
dictionary probe).  Distributed, a per-candidate job would be a driver loop,
so ALL candidate dfs batch into ONE `term_dfs` lookup up front (breaks: the
substring closure reachable within max_changes splits, O(len^2) strings
bounded by the term length; combinations: the adjacent-run concatenations)
— an IN-list term-dictionary scan with parquet pushdown, after which the
reference algorithm runs verbatim against the prefetched map.

Documented divergence: the reference's priority queue leaves EXACT ties
(same break count AND same frequency) in unspecified heap order; we break
such ties by suggestion text ascending, deterministically.
"""

from __future__ import annotations

SUGGEST_WHEN_NOT_IN_INDEX = "not_in_index"  # SuggestMode.java
SUGGEST_MORE_POPULAR = "more_popular"
SUGGEST_ALWAYS = "always"

SEPARATOR_TERM = ""  # WordBreakSpellChecker.SEPARATOR_TERM (:44)


def _break_candidate_terms(
    term: str, min_len: int, max_changes: int, max_evaluations: int
) -> list[str]:
    """All substrings the break recursion can possibly probe: left pieces
    and suffixes reachable within max_changes splits.  Level-by-level
    closure, superset of what the bounded recursion touches (prefetching
    extras is harmless; missing one would mean a per-candidate job)."""
    need: set[str] = {term}
    frontier = [term]
    for _ in range(max_changes):
        nxt = []
        for t in frontier:
            n = len(t)
            if n < min_len * 2:
                continue
            for i in range(min_len, n - min_len + 1):
                left, right = t[:i], t[i:]
                if left not in need:
                    need.add(left)
                if right not in need:
                    need.add(right)
                    nxt.append(right)
        frontier = nxt
        if len(need) > 50 * max_evaluations:  # runaway guard, never hit in
            break                             # practice (maxEvaluations=1000)
    return sorted(need)


def suggest_word_breaks(
    index,
    term: str,
    max_suggestions: int = 20,
    suggest_mode: str = SUGGEST_WHEN_NOT_IN_INDEX,
    sort_method: str = "max",  # NUM_CHANGES_THEN_MAX_FREQUENCY default (:100)
    min_suggestion_frequency: int = 1,
    min_break_word_length: int = 1,
    max_changes: int = 1,
    max_evaluations: int = 1000,
) -> list[list[dict]]:
    """suggestWordBreaks: each suggestion is the list of words the term
    breaks into, as dicts {string, freq, score} (score = break count)."""
    min_len = max(1, min_break_word_length)
    dfs = index.term_dfs(
        _break_candidate_terms(term, min_len, max_changes, max_evaluations)
    )
    orig_freq = dfs.get(term, 0)
    if orig_freq > 0 and suggest_mode == SUGGEST_WHEN_NOT_IN_INDEX:
        return []
    use_min = min_suggestion_frequency
    if suggest_mode == SUGGEST_MORE_POPULAR:
        use_min = 1 if orig_freq == 0 else orig_freq

    suggestions: list[list[dict]] = []

    def recurse(text: str, number_breaks: int, prefix: list[dict],
                total_evaluations: int) -> int:
        # generateBreakUpSuggestions (:258-306) with dfs prefetched.  The
        # evaluation counter replicates the reference's BY-VALUE semantics
        # exactly (totalEvaluations is an int parameter; a parent adds only
        # its child's direct loop count, :292-297) — a global counter would
        # cap deep recursions earlier than the reference does.
        n = len(text)
        if n < min_len * 2:
            return 0
        this_time = 0
        for i in range(min_len, n - min_len + 1):
            left, right = text[:i], text[i:]
            left_freq = dfs.get(left, 0)
            if left_freq >= use_min:
                right_freq = dfs.get(right, 0)
                if right_freq >= use_min:
                    score = len(prefix) + 1
                    words = (
                        [{**w, "score": score} for w in prefix]
                        + [{"string": left, "freq": left_freq, "score": score},
                           {"string": right, "freq": right_freq, "score": score}]
                    )
                    suggestions.append(words)
                if number_breaks + 1 <= max_changes:
                    total_evaluations += recurse(
                        right, number_breaks + 1,
                        prefix + [{"string": left, "freq": left_freq,
                                   "score": 1}],
                        total_evaluations,
                    )
            this_time += 1
            total_evaluations += 1
            if total_evaluations >= max_evaluations:
                break
        return this_time

    recurse(term, 1, [], 0)

    def freq_key(words: list[dict]) -> int:
        freqs = [w["freq"] for w in words]
        return max(freqs) if sort_method == "max" else sum(freqs)

    suggestions.sort(
        key=lambda ws: (len(ws), -freq_key(ws),
                        " ".join(w["string"] for w in ws))
    )
    return suggestions[:max_suggestions]


def suggest_word_combinations(
    index,
    terms: list[str],
    max_suggestions: int = 20,
    suggest_mode: str = SUGGEST_WHEN_NOT_IN_INDEX,
    min_suggestion_frequency: int = 1,
    max_combine_word_length: int = 20,
    max_changes: int = 1,
    max_evaluations: int = 1000,
) -> list[dict]:
    """suggestWordCombinations: each suggestion is
    {string, freq, score, orig_indexes} (score = combinations made)."""
    n = len(terms)
    candidates: set[str] = set(t for t in terms if t != SEPARATOR_TERM)
    for i in range(n - 1):
        if terms[i] == SEPARATOR_TERM or len(terms[i]) > max_combine_word_length:
            continue
        combined = terms[i]
        for j in range(i + 1, min(n, i + max_changes + 1)):
            if terms[j] == SEPARATOR_TERM:
                break
            combined += terms[j]
            if len(combined) > max_combine_word_length:
                break
            candidates.add(combined)
    dfs = index.term_dfs(sorted(candidates))

    orig_freqs = (None if suggest_mode == SUGGEST_ALWAYS
                  else [dfs.get(t, 0) for t in terms])
    out: list[dict] = []
    evaluations = 0
    for i in range(n - 1):
        if terms[i] == SEPARATOR_TERM:
            continue
        if len(terms[i]) > max_combine_word_length:
            continue
        max_freq = orig_freqs[i] if orig_freqs is not None else 0
        min_freq = orig_freqs[i] if orig_freqs is not None else (1 << 31) - 1
        combined = terms[i]
        for j in range(i + 1, n):
            if j - i > max_changes:
                break
            if terms[j] == SEPARATOR_TERM:
                break
            combined += terms[j]
            if len(combined) > max_combine_word_length:
                break
            if orig_freqs is not None:
                max_freq = max(max_freq, orig_freqs[j])
                min_freq = min(min_freq, orig_freqs[j])
            combined_freq = dfs.get(combined, 0)
            if suggest_mode != SUGGEST_MORE_POPULAR or combined_freq >= max_freq:
                if suggest_mode != SUGGEST_WHEN_NOT_IN_INDEX or min_freq == 0:
                    if combined_freq >= min_suggestion_frequency:
                        out.append({
                            "string": combined,
                            "freq": combined_freq,
                            "score": j - i,
                            "orig_indexes": list(range(i, j + 1)),
                        })
            evaluations += 1
            # reference quirk kept verbatim (:246-249): the == test only
            # short-circuits the inner loop the moment the cap is HIT; later
            # runs keep evaluating (the counter never equals the cap again)
            if evaluations == max_evaluations:
                break
    out.sort(key=lambda s: (s["score"], -s["freq"], s["string"]))
    return out[:max_suggestions]
