"""SimpleQueryParser: the never-throws human query syntax.

Re-expresses lucene/queryparser/src/java/org/apache/lucene/queryparser/
simple/SimpleQueryParser.java (same state machine, same operator set):

  ``+`` AND, ``|`` OR, leading ``-`` NOT, ``"..."`` phrase (``~N`` near),
  trailing ``*`` prefix, ``term~N`` fuzzy, ``( )`` precedence, ``\\``
  escapes.  Any syntax error is decoded as best-effort text, never an
  exception (SimpleQueryParser.java:36-46) — the exact opposite contract
  of the classic parser (parser.py), which raises loudly.

Faithful state-machine details (file:line into the reference):

* operator chars apply to the NEXT token; a second op before a token is
  ignored; an op with no previous token is ignored (:170-191)
* ``-`` counts negations so ``--a`` double-negates (:192-199); the
  negated branch becomes BooleanQuery[(MUST_NOT, q), (SHOULD, MatchAll)]
  (buildQueryTree :423-429) — MatchAllDocs is carried here as an
  unbounded ConstScoreMulti (every posting term), equivalent on any doc
  with at least one indexed token
* an unmatched ``(`` or ``"`` is extraneous and re-read as text
  (:258-262, :321-324); a stray ``)`` is skipped (:164-166)
* ``()``/``""`` reset the pending operator (:263-269, :325-332)
* operator changes start a new parent node wrapping the old top with the
  CURRENT occur (buildQueryTree :440-453) — giving the documented
  right-to-left evaluation ``a | b + c`` == ``(a | b) + c``
* fuzziness/slop parse: digits until a token boundary, unparseable -> 0,
  negative -> 0 (:463-497); fuzzy edits capped at 2
  (LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE, :389-392); ``~0`` on
  a term is a plain term (:393)
* prefix ``*`` must be the last unescaped char of the token (:373-378);
  prefix/fuzzy text bypasses the analyzer exactly like the reference
  (newPrefixQuery/newFuzzyQuery build on the raw token)

Multi-token text becomes a BooleanQuery with the default operator's
occur per analyzed term (QueryBuilder.createBooleanQuery semantics —
NOT the classic parser's implicit phrase), stopword holes preserved for
phrases.
"""

from __future__ import annotations

from dataclasses import replace

from .analysis import analyze_text
from .parser import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    ConstScoreMulti,
    FuzzyQuery,
    MatchNoDocsQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)

# feature flags (SimpleQueryParser.java:103-125); -1 = everything
AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9
ALL_OPERATORS = -1

_WS = {" ", "\t", "\n", "\r"}


class _State:
    __slots__ = ("data", "index", "length", "top", "prev_op", "cur_op", "neg")

    def __init__(self, data: str, start: int, end: int):
        self.data = data
        self.index = start
        self.length = end
        self.top = None
        self.prev_op = None
        self.cur_op = None
        self.neg = 0


class SimpleParser:
    def __init__(self, default_operator: str = SHOULD,
                 flags: int = ALL_OPERATORS, analyzer=None):
        if default_operator not in (SHOULD, MUST):
            raise ValueError("default operator must be SHOULD or MUST")
        self.default_operator = default_operator
        self.flags = flags
        if analyzer is not None:
            analyzer = analyzer.query_form()  # index-only filters stripped
        self.analyzer = analyzer

    # -- public ------------------------------------------------------------

    def parse(self, text: str):
        st = _State(text, 0, len(text))
        self._parse_sub(st)
        if st.top is None:
            return MatchNoDocsQuery("empty simple query")
        return st.top

    # -- state machine (parseSubQuery :158-218) ------------------------------

    def _has(self, flag: int) -> bool:
        return (self.flags & flag) != 0

    def _parse_sub(self, st: _State) -> None:
        while st.index < st.length:
            c = st.data[st.index]
            if c == "(" and self._has(PRECEDENCE_OPERATORS):
                self._consume_subquery(st)
            elif c == ")" and self._has(PRECEDENCE_OPERATORS):
                st.index += 1  # extraneous, ignored
            elif c == '"' and self._has(PHRASE_OPERATOR):
                self._consume_phrase(st)
            elif c == "+" and self._has(AND_OPERATOR):
                if st.cur_op is None and st.top is not None:
                    st.cur_op = MUST
                st.index += 1
            elif c == "|" and self._has(OR_OPERATOR):
                if st.cur_op is None and st.top is not None:
                    st.cur_op = SHOULD
                st.index += 1
            elif c == "-" and self._has(NOT_OPERATOR):
                st.neg += 1
                st.index += 1
                continue  # keep the negation across the next dispatch
            elif c in _WS and self._has(WHITESPACE_OPERATOR):
                st.index += 1
            else:
                self._consume_token(st)
            st.neg = 0

    def _consume_subquery(self, st: _State) -> None:
        start = st.index + 1
        st.index = start
        depth = 1
        escaped = False
        while st.index < st.length:
            if not escaped:
                c = st.data[st.index]
                if c == "\\" and self._has(ESCAPE_OPERATOR):
                    escaped = True
                    st.index += 1
                    continue
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break
            escaped = False
            st.index += 1
        if st.index == st.length:
            st.index = start  # no closing paren: '(' extraneous
        elif st.index == start:
            st.cur_op = None  # '()' resets the pending operator
            st.index += 1
        else:
            sub = _State(st.data, start, st.index)
            sub_parser = SimpleParser(self.default_operator, self.flags,
                                      self.analyzer)
            sub_parser._parse_sub(sub)
            self._build(st, sub.top)
            st.index += 1

    def _consume_phrase(self, st: _State) -> None:
        start = st.index + 1
        st.index = start
        buf: list[str] = []
        escaped = False
        has_slop = False
        while st.index < st.length:
            if not escaped:
                c = st.data[st.index]
                if c == "\\" and self._has(ESCAPE_OPERATOR):
                    escaped = True
                    st.index += 1
                    continue
                if c == '"':
                    if (
                        st.index + 1 < st.length
                        and st.data[st.index + 1] == "~"
                        and self._has(NEAR_OPERATOR)
                    ):
                        st.index += 1
                        if st.index + 1 < st.length:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(st.data[st.index])
            st.index += 1
        if st.index == st.length:
            st.index = start  # no closing quote: '"' extraneous
        elif not buf:
            st.cur_op = None  # '""' resets the pending operator
            st.index += 1
        else:
            slop = self._parse_fuzziness(st) if has_slop else 0
            self._build(st, self._phrase_query("".join(buf), slop))
            st.index += 1

    def _consume_token(self, st: _State) -> None:
        buf: list[str] = []
        escaped = False
        prefix = False
        fuzzy = False
        while st.index < st.length:
            if not escaped:
                c = st.data[st.index]
                if c == "\\" and self._has(ESCAPE_OPERATOR):
                    escaped = True
                    prefix = False
                    st.index += 1
                    continue
                if self._token_finished(st):
                    break
                if buf and c == "~" and self._has(FUZZY_OPERATOR):
                    fuzzy = True
                    break
                prefix = bool(buf) and c == "*" and self._has(PREFIX_OPERATOR)
            escaped = False
            buf.append(st.data[st.index])
            st.index += 1
        if not buf:
            return
        token = "".join(buf)
        if fuzzy:
            edits = min(self._parse_fuzziness(st), 2)
            branch = (
                self._default_query(token)
                if edits == 0
                else FuzzyQuery(token, max_edits=edits)
            )
        elif prefix:
            branch = PrefixQuery(token[:-1])
        else:
            branch = self._default_query(token)
        self._build(st, branch)

    def _token_finished(self, st: _State) -> bool:
        c = st.data[st.index]
        return (
            (c == '"' and self._has(PHRASE_OPERATOR))
            or (c == "|" and self._has(OR_OPERATOR))
            or (c == "+" and self._has(AND_OPERATOR))
            or (c == "(" and self._has(PRECEDENCE_OPERATORS))
            or (c == ")" and self._has(PRECEDENCE_OPERATORS))
            or (c in _WS and self._has(WHITESPACE_OPERATOR))
        )

    def _parse_fuzziness(self, st: _State) -> int:
        if st.index >= st.length or st.data[st.index] != "~":
            return 0
        digits: list[str] = []
        while st.index < st.length:
            st.index += 1
            if st.index < st.length:
                if self._token_finished(st):
                    break
                digits.append(st.data[st.index])
        try:
            f = int("".join(digits))
        except ValueError:
            return 0
        return max(f, 0)

    # -- query factories (:520-585) ------------------------------------------

    def _analyze(self, text: str):
        if self.analyzer is not None:
            return self.analyzer.analyze_text(text)
        return analyze_text(text)

    def _default_query(self, text: str):
        """createBooleanQuery semantics: each analyzed term gets the
        default operator's occur; 0 terms -> null branch, 1 -> TermQuery."""
        terms, _ = self._analyze(text)
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(terms[0])
        return BooleanQuery(
            tuple((self.default_operator, TermQuery(t)) for t in terms)
        )

    def _phrase_query(self, text: str, slop: int):
        terms, pos = self._analyze(text)
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(terms[0])
        base = pos[0]
        return PhraseQuery(tuple(terms), tuple(p - base for p in pos), slop)

    # -- tree assembly (buildQueryTree :420-461) -------------------------------

    def _build(self, st: _State, branch) -> None:
        if branch is None:
            return  # null branch leaves cur_op pending, as the reference does
        if st.neg % 2 == 1:
            branch = BooleanQuery(
                ((MUST_NOT, branch), (SHOULD, ConstScoreMulti()))
            )
        if st.top is None:
            st.top = branch
        else:
            if st.cur_op is None:
                st.cur_op = self.default_operator
            if st.prev_op != st.cur_op:
                st.top = BooleanQuery(((st.cur_op, st.top),))
            st.top = replace(
                st.top, clauses=st.top.clauses + ((st.cur_op, branch),)
            )
            st.prev_op = st.cur_op
        st.cur_op = None


def parse_simple(text: str, default_operator: str = SHOULD,
                 flags: int = ALL_OPERATORS, analyzer=None):
    """Parse the SimpleQueryParser surface; NEVER raises on user input."""
    return SimpleParser(default_operator, flags, analyzer).parse(text)
