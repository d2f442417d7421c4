"""Lucene RegExp automaton operators: ``~`` complement, ``&``
intersection, ``<n-m>`` numeric interval, ``#`` empty language (r10).

The r9 translator (``mql/search._lucene_regex_source``) maps the
structurally shared Lucene-RegExp core to Python ``re`` and raised
loudly on the four automaton-algebra operators — they have no
backtracking-regex equivalent. This module closes that gap the way
Lucene itself evaluates them (``org.apache.lucene.util.automaton
.RegExp`` — public Apache-licensed design, re-implemented from the
documented grammar, no code copied): parse the full grammar, build a
character-range NFA, determinize by subset construction over split
code-point ranges, take complements against a completed DFA and
intersections as DFA products, and match terms by running the DFA —
linear in the term length, no backtracking.

Pinned contract (matches the r9 ``re`` path wherever both apply, by
property test):

- whole-term match (Lucene regexes are implicitly anchored);
- ``.`` matches EVERY character (the re path compiles DOTALL);
- ``^`` ``$`` are literal characters (Lucene has no anchors); the
  quoted-string ``"..."`` simpleexp holds its characters verbatim to
  the closing quote, repetition applying to the whole string (r11 —
  closes the last documented dialect deviation; escape ``\\"`` for a
  literal quote character);
- ``(?`` raises (Python group extensions are not Lucene syntax);
- ``<n-m>`` accepts any number of leading zeros (Lucene's
  ``makeDecimalInterval`` with ``digits=0``);
- grammar precedence per the Lucene javadoc: union ``|`` lowest, then
  intersection ``&``, then concatenation, then postfix repetition
  (``? * + {n,m}``), with complement ``~`` binding tighter than
  repetition (``~a*`` is ``(~a)*``).

Determinization is worst-case exponential, so construction carries a
hard state cap and raises loudly instead of hanging on adversarial
patterns — the engine's bounded-or-loud stance.
"""

from __future__ import annotations

from bisect import bisect_right

_MAX_CP = 0x10FFFF
_STATE_CAP = 10_000


class LuceneRegexError(ValueError):
    pass


# ---------------------------------------------------------------------------
# parser — recursive descent over the documented grammar


class _Parser:
    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0
        self.n = len(pattern)

    def error(self, msg):
        raise LuceneRegexError(
            f"$search regex: {msg} at index {self.i} in {self.p!r}")

    def peek(self):
        return self.p[self.i] if self.i < self.n else None

    def parse(self):
        node = self.union()
        if self.i < self.n:
            self.error(f"unexpected {self.p[self.i]!r}")
        return node

    def union(self):
        parts = [self.inter()]
        while self.peek() == "|":
            self.i += 1
            parts.append(self.inter())
        return parts[0] if len(parts) == 1 else ("union", parts)

    def inter(self):
        parts = [self.concat()]
        while self.peek() == "&":
            self.i += 1
            parts.append(self.concat())
        return parts[0] if len(parts) == 1 else ("inter", parts)

    def concat(self):
        parts = []
        while self.i < self.n and self.peek() not in "|&)":
            parts.append(self.repeat())
        if not parts:
            return ("eps",)
        return parts[0] if len(parts) == 1 else ("concat", parts)

    def repeat(self):
        node = self.comp()
        while self.i < self.n and self.peek() in "?*+{":
            c = self.peek()
            if c == "?":
                node, self.i = ("repeat", node, 0, 1), self.i + 1
            elif c == "*":
                node, self.i = ("repeat", node, 0, None), self.i + 1
            elif c == "+":
                node, self.i = ("repeat", node, 1, None), self.i + 1
            else:
                node = ("repeat", node, *self._braces())
        return node

    def _braces(self):
        import re as _re

        m = _re.match(r"\{(\d+)(,(\d*))?\}", self.p[self.i:])
        if not m:
            self.error("bad repetition")
        self.i += m.end()
        lo = int(m.group(1))
        if m.group(2) is None:
            return lo, lo
        hi = int(m.group(3)) if m.group(3) else None
        if hi is not None and hi < lo:
            self.error(f"bad repetition bounds {{{lo},{hi}}}")
        return lo, hi

    def comp(self):
        if self.peek() == "~":
            self.i += 1
            return ("comp", self.comp())
        return self.simple()

    def simple(self):
        c = self.peek()
        if c is None:
            self.error("unexpected end of pattern")
        if c == "\\":
            if self.i + 1 >= self.n:
                raise LuceneRegexError("$search regex: trailing backslash")
            self.i += 2
            return ("char", ord(self.p[self.i - 1]))
        if c == "[":
            return self._char_class()
        if c == '"':
            # Lucene quoted string (r11): literal characters until the
            # closing quote (no escapes inside, per RegExp.java); the
            # whole string is one simpleexp, so repetition applies to
            # it as a unit
            j = self.p.find('"', self.i + 1)
            if j < 0:
                self.error("unterminated quoted string")
            chars = [("char", ord(ch)) for ch in self.p[self.i + 1:j]]
            self.i = j + 1
            if not chars:
                return ("eps",)
            return chars[0] if len(chars) == 1 else ("concat", chars)
        if c == ".":
            self.i += 1
            return ("class", [(0, _MAX_CP)])
        if c == "@":
            self.i += 1
            return ("repeat", ("class", [(0, _MAX_CP)]), 0, None)
        if c == "#":
            self.i += 1
            return ("nothing",)
        if c == "<":
            return self._interval()
        if c == "(":
            if self.i + 1 < self.n and self.p[self.i + 1] == "?":
                self.error("'(?' is not Lucene RegExp syntax (Python "
                           "group extensions are unsupported)")
            self.i += 1
            if self.peek() == ")":
                self.i += 1
                return ("eps",)
            node = self.union()
            if self.peek() != ")":
                self.error("unbalanced parenthesis")
            self.i += 1
            return node
        if c in "?*+{":
            self.error(f"repetition {c!r} with nothing to repeat")
        if c in ")|&":
            self.error(f"unexpected {c!r}")
        self.i += 1
        return ("char", ord(c))

    def _char_class(self):
        self.i += 1  # consume '['
        negated = False
        if self.peek() == "^":
            negated = True
            self.i += 1
        ranges: list[tuple[int, int]] = []
        first = True
        while True:
            c = self.peek()
            if c is None:
                raise LuceneRegexError(
                    f"$search regex: unterminated class in {self.p!r}")
            if c == "]" and not first:
                self.i += 1
                break
            first = False
            if c == "\\":
                if self.i + 1 >= self.n:
                    raise LuceneRegexError(
                        "$search regex: trailing backslash")
                lo = ord(self.p[self.i + 1])
                self.i += 2
            else:
                lo = ord(c)
                self.i += 1
            if self.peek() == "-" and self.i + 1 < self.n \
                    and self.p[self.i + 1] != "]":
                self.i += 1
                c2 = self.peek()
                if c2 == "\\":
                    if self.i + 1 >= self.n:
                        raise LuceneRegexError(
                            "$search regex: trailing backslash")
                    hi = ord(self.p[self.i + 1])
                    self.i += 2
                else:
                    hi = ord(c2)
                    self.i += 1
                if hi < lo:
                    self.error(f"bad class range {chr(lo)}-{chr(hi)}")
                ranges.append((lo, hi))
            else:
                ranges.append((lo, lo))
        ranges = _norm_ranges(ranges)
        if negated:
            ranges = _negate_ranges(ranges)
        return ("class", ranges)

    def _interval(self):
        import re as _re

        m = _re.match(r"<(\d+)-(\d+)>", self.p[self.i:])
        if not m:
            self.error("bad numeric interval (expected <n-m>)")
        self.i += m.end()
        lo, hi = int(m.group(1)), int(m.group(2))
        if hi < lo:
            lo, hi = hi, lo  # Lucene normalizes reversed bounds
        return ("interval", lo, hi)


def _norm_ranges(ranges):
    if not ranges:
        return []
    ranges = sorted(ranges)
    out = [list(ranges[0])]
    for lo, hi in ranges[1:]:
        if lo <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return [tuple(r) for r in out]


def _negate_ranges(ranges):
    out, prev = [], 0
    for lo, hi in ranges:
        if lo > prev:
            out.append((prev, lo - 1))
        prev = hi + 1
    if prev <= _MAX_CP:
        out.append((prev, _MAX_CP))
    return out


# ---------------------------------------------------------------------------
# NFA construction (fragments with range-labelled edges + epsilons)


class _Builder:
    def __init__(self, cap=_STATE_CAP):
        self.trans: list[list] = []   # state -> [(lo, hi, dst)]
        self.eps: list[list] = []     # state -> [dst]
        self.cap = cap

    def state(self):
        if len(self.trans) >= self.cap:
            raise LuceneRegexError(
                f"$search regex: pattern too complex (> {self.cap} "
                "automaton states)")
        self.trans.append([])
        self.eps.append([])
        return len(self.trans) - 1

    def build(self, node):
        """Returns a fragment ``(start, accept)`` for ``node``.
        Sub-languages under complement/intersection compile to their own
        DFAs and re-embed as NFA fragments."""
        kind = node[0]
        if kind == "char":
            s, a = self.state(), self.state()
            self.trans[s].append((node[1], node[1], a))
            return s, a
        if kind == "class":
            s, a = self.state(), self.state()
            for lo, hi in node[1]:
                self.trans[s].append((lo, hi, a))
            return s, a
        if kind == "eps":
            s = self.state()
            return s, s
        if kind == "nothing":
            s, a = self.state(), self.state()  # no path: empty language
            return s, a
        if kind == "concat":
            frags = [self.build(ch) for ch in node[1]]
            for (_, a1), (s2, _) in zip(frags, frags[1:]):
                self.eps[a1].append(s2)
            return frags[0][0], frags[-1][1]
        if kind == "union":
            s, a = self.state(), self.state()
            for ch in node[1]:
                cs, ca = self.build(ch)
                self.eps[s].append(cs)
                self.eps[ca].append(a)
            return s, a
        if kind == "repeat":
            _, ch, lo, hi = node
            if hi is not None and hi > 1000:
                raise LuceneRegexError(
                    "$search regex: repetition bound > 1000 unsupported")
            s = self.state()
            cur = s
            for _ in range(lo):
                cs, ca = self.build(ch)
                self.eps[cur].append(cs)
                cur = ca
            if hi is None:  # star tail
                cs, ca = self.build(ch)
                self.eps[cur].append(cs)
                self.eps[ca].append(cur)
                return s, cur
            a = self.state()
            self.eps[cur].append(a)
            for _ in range(hi - lo):
                cs, ca = self.build(ch)
                self.eps[cur].append(cs)
                cur = ca
                self.eps[cur].append(a)
            return s, a
        if kind == "interval":
            return self.build(_interval_node(node[1], node[2]))
        if kind == "inter":
            dfas = [_determinize(*_sub_nfa(self, ch)) for ch in node[1]]
            prod = dfas[0]
            for d in dfas[1:]:
                prod = _product(prod, d, self.cap)
            return self._embed(prod)
        if kind == "comp":
            dfa = _determinize(*_sub_nfa(self, node[1]))
            return self._embed(_complement(dfa, self.cap))
        raise LuceneRegexError(f"$search regex: internal node {kind!r}")

    def _embed(self, dfa):
        """Re-embed a DFA ``(trans, accepts, start)`` as an NFA fragment
        with a single epsilon-reachable accept."""
        trans, accepts, start = dfa
        base = len(self.trans)
        for st_trans in trans:
            s = self.state()
            self.trans[s] = [(lo, hi, base + dst) for lo, hi, dst in st_trans]
        a = self.state()
        for acc in accepts:
            self.eps[base + acc].append(a)
        return base + start, a


def _sub_nfa(builder, node):
    """Build ``node`` in a FRESH builder (complement/intersection need a
    self-contained automaton) sharing the parent's state budget."""
    b = _Builder(cap=builder.cap)
    s, a = b.build(node)
    return b, s, a


def _interval_node(lo: int, hi: int):
    """AST for ``<lo-hi>``: ``0*`` then a no-leading-zero representation
    of a number in [lo, hi] (Lucene makeDecimalInterval, digits=0 —
    any number of leading zeros accepted)."""
    alts = []
    slo, shi = str(lo), str(hi)
    for d in range(len(slo), len(shi) + 1):
        dlo = max(lo, 10 ** (d - 1) if d > 1 else 0)
        dhi = min(hi, 10 ** d - 1)
        if dlo > dhi:
            continue
        alts.append(_digit_range_node(str(dlo).zfill(d), str(dhi).zfill(d)))
    body = alts[0] if len(alts) == 1 else ("union", alts)
    zeros = ("repeat", ("char", ord("0")), 0, None)
    return ("concat", [zeros, body])


def _digit_range_node(lo: str, hi: str):
    """AST matching exactly-``len(lo)``-digit strings numerically in
    ``[lo, hi]`` (equal lengths; leading digit may be 0 only when the
    bound strings carry it, which the caller prevents for d > 1)."""
    if lo == hi:
        return ("concat", [("char", ord(c)) for c in lo]) \
            if len(lo) > 1 else ("char", ord(lo))
    # digit-DP: first position where bounds diverge splits into
    # lo-tight / middle / hi-tight branches
    i = 0
    while lo[i] == hi[i]:
        i += 1
    prefix = [("char", ord(c)) for c in lo[:i]]
    d_lo, d_hi = int(lo[i]), int(hi[i])
    rest = len(lo) - i - 1
    any_digit = ("class", [(ord("0"), ord("9"))])
    branches = []
    # lo-tight: lo[i] then suffix >= lo[i+1:]
    branches.append(("concat", [("char", ord(lo[i])),
                                _suffix_ge(lo[i + 1:])] if rest else
                    [("char", ord(lo[i]))]))
    # middle digits: anything
    if d_hi - d_lo >= 2:
        mid = ("class", [(ord(str(d_lo + 1)), ord(str(d_hi - 1)))])
        branches.append(("concat", [mid] + [any_digit] * rest)
                        if rest else mid)
    # hi-tight: hi[i] then suffix <= hi[i+1:]
    branches.append(("concat", [("char", ord(hi[i])),
                                _suffix_le(hi[i + 1:])] if rest else
                    [("char", ord(hi[i]))]))
    node = ("union", branches)
    return ("concat", prefix + [node]) if prefix else node


def _suffix_ge(s: str):
    """AST for ``len(s)``-digit strings >= s."""
    if not s:
        return ("eps",)
    alts = []
    for i, c in enumerate(s):
        if c != "9":
            gt = ("class", [(ord(c) + 1, ord("9"))])
            tail = [("class", [(ord("0"), ord("9"))])] * (len(s) - i - 1)
            head = [("char", ord(x)) for x in s[:i]]
            alts.append(("concat", head + [gt] + tail)
                        if head or tail else gt)
    exact = ("concat", [("char", ord(c)) for c in s]) \
        if len(s) > 1 else ("char", ord(s))
    alts.append(exact)
    return alts[0] if len(alts) == 1 else ("union", alts)


def _suffix_le(s: str):
    """AST for ``len(s)``-digit strings <= s."""
    if not s:
        return ("eps",)
    alts = []
    for i, c in enumerate(s):
        if c != "0":
            lt = ("class", [(ord("0"), ord(c) - 1)])
            tail = [("class", [(ord("0"), ord("9"))])] * (len(s) - i - 1)
            head = [("char", ord(x)) for x in s[:i]]
            alts.append(("concat", head + [lt] + tail)
                        if head or tail else lt)
    exact = ("concat", [("char", ord(c)) for c in s]) \
        if len(s) > 1 else ("char", ord(s))
    alts.append(exact)
    return alts[0] if len(alts) == 1 else ("union", alts)


# ---------------------------------------------------------------------------
# subset construction / product / complement over code-point ranges


def _eps_closure(eps, states):
    out = set(states)
    stack = list(states)
    while stack:
        for d in eps[stack.pop()]:
            if d not in out:
                out.add(d)
                stack.append(d)
    return out


def _determinize(builder, start, accept, cap=_STATE_CAP):
    """Subset construction; returns ``(trans, accepts, start)`` with
    ``trans[state] = sorted [(lo, hi, dst)]`` (disjoint ranges)."""
    trans, eps = builder.trans, builder.eps
    init = frozenset(_eps_closure(eps, {start}))
    ids = {init: 0}
    out_trans = [[]]
    accepts = set()
    if accept in init:
        accepts.add(0)
    work = [init]
    while work:
        cur = work.pop()
        cid = ids[cur]
        edges = [e for s in cur for e in trans[s]]
        if not edges:
            continue
        points = sorted({lo for lo, _, _ in edges}
                        | {hi + 1 for _, hi, _ in edges})
        merged = []
        for j, b in enumerate(points):
            if b > _MAX_CP:
                continue
            end = (points[j + 1] - 1) if j + 1 < len(points) else _MAX_CP
            tgt = {d for lo, hi, d in edges if lo <= b and hi >= b}
            if not tgt:
                continue
            nxt = frozenset(_eps_closure(eps, tgt))
            if nxt not in ids:
                if len(ids) >= cap:
                    raise LuceneRegexError(
                        f"$search regex: pattern too complex (> {cap} "
                        "DFA states)")
                ids[nxt] = len(ids)
                out_trans.append([])
                if accept in nxt:
                    accepts.add(ids[nxt])
                work.append(nxt)
            dst = ids[nxt]
            if merged and merged[-1][2] == dst and merged[-1][1] + 1 == b:
                merged[-1] = (merged[-1][0], end, dst)
            else:
                merged.append((b, end, dst))
        out_trans[cid] = merged
    return out_trans, accepts, 0


def _complete(dfa, cap):
    """Totalize the transition function with a dead sink state."""
    trans, accepts, start = dfa
    trans = [list(t) for t in trans]
    sink = len(trans)
    need_sink = False
    for s in range(len(trans)):
        cur, prev = [], 0
        for lo, hi, d in sorted(trans[s]):
            if lo > prev:
                cur.append((prev, lo - 1, sink))
                need_sink = True
            cur.append((lo, hi, d))
            prev = hi + 1
        if prev <= _MAX_CP:
            cur.append((prev, _MAX_CP, sink))
            need_sink = True
        trans[s] = cur
    if need_sink:
        if len(trans) >= cap:
            raise LuceneRegexError(
                f"$search regex: pattern too complex (> {cap} DFA states)")
        trans.append([(0, _MAX_CP, sink)])
    return trans, accepts, start


def _complement(dfa, cap):
    trans, accepts, start = _complete(dfa, cap)
    return trans, set(range(len(trans))) - accepts, start


def _product(a, b, cap):
    """Intersection DFA of two DFAs."""
    at, aacc, astart = a
    bt, bacc, bstart = b
    ids = {(astart, bstart): 0}
    out = [[]]
    accepts = set()
    if astart in aacc and bstart in bacc:
        accepts.add(0)
    work = [(astart, bstart)]
    while work:
        sa, sb = pair = work.pop()
        cid = ids[pair]
        merged = []
        for lo1, hi1, d1 in at[sa]:
            for lo2, hi2, d2 in bt[sb]:
                lo, hi = max(lo1, lo2), min(hi1, hi2)
                if lo > hi:
                    continue
                nxt = (d1, d2)
                if nxt not in ids:
                    if len(ids) >= cap:
                        raise LuceneRegexError(
                            f"$search regex: pattern too complex (> "
                            f"{cap} DFA states)")
                    ids[nxt] = len(ids)
                    out.append([])
                    if d1 in aacc and d2 in bacc:
                        accepts.add(ids[nxt])
                    work.append(nxt)
                merged.append((lo, hi, ids[nxt]))
        out[cid] = sorted(merged)
    return out, accepts, 0


# ---------------------------------------------------------------------------
# public surface


class LuceneRegex:
    """Compiled Lucene-RegExp DFA exposing the slice of the ``re``
    pattern API the $search evaluators use (``fullmatch`` truthiness,
    ``pattern``). Plain lists/sets inside — pickles into Arrow-kernel
    closures like a compiled ``re`` does."""

    __slots__ = ("pattern", "_starts", "_ends", "_dsts", "_accepts",
                 "_start")

    def __init__(self, pattern: str, cap: int = _STATE_CAP):
        self.pattern = pattern
        node = _Parser(pattern).parse()
        b = _Builder(cap=cap)
        s, a = b.build(node)
        trans, accepts, start = _determinize(b, s, a, cap=cap)
        # bisect-friendly per-state layout
        self._starts = [[lo for lo, _, _ in t] for t in trans]
        self._ends = [[hi for _, hi, _ in t] for t in trans]
        self._dsts = [[d for _, _, d in t] for t in trans]
        self._accepts = accepts
        self._start = start

    def fullmatch(self, s: str):
        st = self._start
        for ch in s:
            cp = ord(ch)
            starts = self._starts[st]
            k = bisect_right(starts, cp) - 1
            if k < 0 or self._ends[st][k] < cp:
                return None
            st = self._dsts[st][k]
        return self if st in self._accepts else None


_AUTOMATON_OPS = frozenset("~&#<")


def needs_automaton(pattern: str) -> bool:
    """True when ``pattern`` uses an automaton-algebra operator outside
    escapes and character classes — the cheap ``re`` path handles
    everything else."""
    i, n, in_class = 0, len(pattern), False
    while i < n:
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            in_class = c != "]"
        elif c == "[":
            in_class = True
        elif c in _AUTOMATON_OPS:
            return True
        i += 1
    return False
