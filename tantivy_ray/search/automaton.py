"""Automaton × sorted-term-dict intersection.

The reference expands fuzzy/regex queries by intersecting a Levenshtein
DFA (levenshtein_automata crate; src/query/fuzzy_query.rs:1-123) or a
regex automaton (tantivy-fst; src/query/regex_query.rs:57) with the FST
term dictionary, visiting only term-dict ranges whose prefix keeps the
automaton alive.  Here the term dictionary is a SORTED Arrow string
array, which is an implicit trie: all terms sharing a prefix are a
contiguous range, and each child subtree is discovered with one binary
search.  ``intersect_sorted_terms`` walks that implicit trie, stepping a
lazily-determinized automaton per character, and prunes dead subtrees —
probes are O(live-trie-nodes x log V), sub-linear in vocabulary size
(vs the round-1 full-vocab Python scan).

Automaton protocol (duck-typed):
    start() -> state            initial DFA state (hashable, not None)
    step(state, ch) -> state    next state, or None when dead
    is_match(state) -> bool     string spelled so far is accepted
    matches_all(state) -> bool  every extension is accepted (sticky)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

__all__ = [
    "LevenshteinAutomaton",
    "RegexAutomaton",
    "UnsupportedRegex",
    "intersect_sorted_terms",
]

_MATCH_ALL = "__MATCH_ALL__"   # sentinel sticky-accept state (prefix mode)


# ---------------------------------------------------------------------------
# Levenshtein (Damerau optional) lazy DFA
# ---------------------------------------------------------------------------

class LevenshteinAutomaton:
    """Lazy-determinized Levenshtein automaton for edit distance <= k.

    NFA states are ``(i, e)`` = *matched query[:i] with e edits*, plus
    restricted-transposition states ``('t', i, e)`` = *consumed
    query[i+1], now expecting query[i]*.  Subset construction is
    memoized per (state, char-class); characters outside the query
    alphabet share one "other" class, so the transition table stays
    O(|state-space| x (|query|+1)) regardless of vocabulary alphabet.

    ``prefix=True`` gives the reference's prefix-fuzzy semantics
    (fuzzy_query.rs FuzzyTermQuery::new_prefix): a term matches when ANY
    of its prefixes is within distance k of the query; accept is sticky.
    """

    def __init__(self, query: str, k: int, transposition: bool = False,
                 prefix: bool = False):
        self.q = query
        self.k = int(k)
        self.transposition = transposition
        self.prefix = prefix
        self._alphabet = frozenset(query)
        self._cache: dict = {}
        start: object = frozenset([(0, 0)])
        if prefix and self._accepts(start):
            start = _MATCH_ALL
        self._start = start

    # --- protocol ---
    def start(self):
        return self._start

    def step(self, state, ch: str):
        if state == _MATCH_ALL:
            return _MATCH_ALL
        key = (state, ch if ch in self._alphabet else None)
        hit = self._cache.get(key, False)
        if hit is not False:
            return hit
        q, n, k = self.q, len(self.q), self.k
        nxt = []
        for s in state:
            if s[0] == "t":
                _, i, e = s
                if ch == q[i]:
                    nxt.append((i + 2, e))
                continue
            i, e = s
            if i < n and q[i] == ch:
                nxt.append((i + 1, e))
            if e < k:
                nxt.append((i, e + 1))            # insertion
                if i < n:
                    nxt.append((i + 1, e + 1))    # substitution
                # delete d query chars, then match ch (Schulz-Mihov
                # elementary transitions; deletion must pair with a
                # consuming move or subsumption pruning is unsound)
                for d in range(1, k - e + 1):
                    if i + d < n and q[i + d] == ch:
                        nxt.append((i + d + 1, e + d))
                if (self.transposition and i + 1 < n and ch == q[i + 1]
                        and ch != q[i]):
                    nxt.append(("t", i, e + 1))
        out = self._prune(nxt) if nxt else None
        if out is not None and self.prefix and self._accepts(out):
            out = _MATCH_ALL
        self._cache[key] = out
        return out

    def is_match(self, state) -> bool:
        if state == _MATCH_ALL:
            return True
        return self._accepts(state)

    def matches_all(self, state) -> bool:
        return state == _MATCH_ALL

    # --- internals ---
    def _accepts(self, state) -> bool:
        n, k = len(self.q), self.k
        return any(s[0] != "t" and n - s[0] <= k - s[1] for s in state)

    def _prune(self, states) -> frozenset:
        """Subsumption pruning: (j, f) subsumes (i, e) when f < e and
        |i - j| <= e - f (then L(i,e) ⊆ L(j,f)); keeps DFA states small."""
        out = set(states)
        plain = [s for s in out if s[0] != "t"]
        pruned = set()
        for s in out:
            if s[0] == "t":
                pruned.add(s)
                continue
            i, e = s
            if any(f < e and abs(i - j) <= e - f for (j, f) in plain):
                continue
            pruned.add(s)
        return frozenset(pruned)


# ---------------------------------------------------------------------------
# Regex → Thompson NFA → lazy DFA
# ---------------------------------------------------------------------------

class UnsupportedRegex(Exception):
    """Pattern uses syntax outside the compiled subset; caller should
    fall back to a scan with python `re` (semantics source of truth)."""


_META = set(".*+?()[]|{}\\^$")
_MAX_REPEAT = 64


class RegexAutomaton:
    """Compiles a practical regex subset to an NFA and determinizes it
    lazily.  Supported: literals, escapes of metachars, ``.`` (any char
    but newline, like python re), classes ``[a-z0-9_]`` / ``[^...]``,
    predefined classes ``\\d \\w \\s \\D \\W \\S`` (both top-level and
    inside ``[...]``, python-`re` Unicode semantics: ``Py_UNICODE_ISDIGIT``
    / ``isalnum()+'_'`` / ``isspace()``), leading inline flags ``(?i)`` /
    ``(?s)``, groups, alternation, ``* + ? {m} {m,n} {m,}``.  Anything
    else (backrefs, lookaround, other flags) raises UnsupportedRegex.
    Matching is fullmatch, mirroring python ``re.fullmatch`` used by the
    fallback scan path.  (The reference's regex automaton supports these
    classes too — src/query/regex_query.rs:57 via tantivy-fst/regex-syntax.)
    """

    def __init__(self, pattern: str):
        self.pattern = pattern
        self.ignorecase = False
        self.dotall = False
        # leading inline flags group: (?i) (?s) (?is)
        while self.pattern.startswith("(?") and len(self.pattern) > 2 \
                and self.pattern[2] not in ":P=!<":
            end = self.pattern.find(")")
            if end < 0:
                raise UnsupportedRegex("unclosed flags group")
            flags = self.pattern[2:end]
            if not flags or not set(flags) <= {"i", "s"}:
                raise UnsupportedRegex(f"flags (?{flags})")
            self.ignorecase |= "i" in flags
            self.dotall |= "s" in flags
            self.pattern = self.pattern[end + 1:]
        # NFA: states are ints; edges[s] = list[(pred, dst)];
        # eps[s] = list[dst].  pred: ('ch', c) | ('any',) | ('cls', ranges, neg)
        self.edges: List[list] = []
        self.eps: List[list] = []
        self._pos = 0
        start, accept = self._parse_alt()
        if self._pos != len(self.pattern):
            raise UnsupportedRegex(f"trailing input at {self._pos}")
        self.nfa_start, self.nfa_accept = start, accept
        self._cache: dict = {}
        self._start = self._closure(frozenset([start]))

    # --- protocol ---
    def start(self):
        return self._start

    def step(self, state, ch: str):
        key = (state, ch)
        hit = self._cache.get(key, False)
        if hit is not False:
            return hit
        nxt = set()
        for s in state:
            for pred, dst in self.edges[s]:
                if self._pred_match(pred, ch):
                    nxt.add(dst)
        out = self._closure(frozenset(nxt)) if nxt else None
        self._cache[key] = out
        return out

    def is_match(self, state) -> bool:
        return self.nfa_accept in state

    def matches_all(self, state) -> bool:
        return False

    # --- NFA helpers ---
    def _new_state(self) -> int:
        self.edges.append([])
        self.eps.append([])
        return len(self.edges) - 1

    def _closure(self, states: frozenset) -> frozenset:
        seen = set(states)
        stack = list(states)
        while stack:
            s = stack.pop()
            for d in self.eps[s]:
                if d not in seen:
                    seen.add(d)
                    stack.append(d)
        return frozenset(seen)

    @staticmethod
    def _cat_match(cat: str, ch: str) -> bool:
        """Predefined-class membership with python-re Unicode semantics:
        \\d == Py_UNICODE_ISDIGIT == str.isdigit; \\w == isalnum or '_';
        \\s == isspace (CPython sre CATEGORY_UNI_* definitions)."""
        base = cat.lower()
        if base == "d":
            hit = ch.isdigit()
        elif base == "s":
            hit = ch.isspace()
        else:  # w
            hit = ch.isalnum() or ch == "_"
        return hit != cat.isupper()

    def _pred_match(self, pred, ch: str) -> bool:
        kind = pred[0]
        if kind == "ch":
            if self.ignorecase:
                # full casefold, not lower(): re.IGNORECASE folds 'ſ'→'s'
                # and 'K' (U+212A)→'k'; lower() misses the first
                return ch.casefold() == pred[1].casefold()
            return ch == pred[1]
        if kind == "any":
            return self.dotall or ch != "\n"
        if kind == "cat":
            return self._cat_match(pred[1], ch)
        ranges, neg = pred[1], pred[2]
        cats = pred[3] if len(pred) > 3 else ()

        def inside(x: str) -> bool:
            o = ord(x)
            if any(a <= o <= b for a, b in ranges):
                return True
            return any(self._cat_match(c, x) for c in cats)

        hit = inside(ch)
        if self.ignorecase and not hit:
            for v in (ch.lower(), ch.upper(), ch.casefold()):
                # len guard: some case mappings expand ('İ'.lower() is 2 chars)
                if v != ch and len(v) == 1 and inside(v):
                    hit = True
                    break
        return hit != neg

    # --- recursive-descent parser (frag = (start, accept)) ---
    def _peek(self) -> Optional[str]:
        return self.pattern[self._pos] if self._pos < len(self.pattern) else None

    def _parse_alt(self) -> Tuple[int, int]:
        frags = [self._parse_concat()]
        while self._peek() == "|":
            self._pos += 1
            frags.append(self._parse_concat())
        if len(frags) == 1:
            return frags[0]
        s, a = self._new_state(), self._new_state()
        for fs, fa in frags:
            self.eps[s].append(fs)
            self.eps[fa].append(a)
        return s, a

    def _parse_concat(self) -> Tuple[int, int]:
        frags = []
        while True:
            c = self._peek()
            if c is None or c in "|)":
                break
            frags.append(self._parse_repeat())
        if not frags:
            s = self._new_state()
            return s, s
        start, acc = frags[0]
        for fs, fa in frags[1:]:
            self.eps[acc].append(fs)
            acc = fa
        return start, acc

    def _parse_repeat(self) -> Tuple[int, int]:
        frag = self._parse_atom()
        c = self._peek()
        if c == "*":
            self._pos += 1
            return self._repeat(frag, 0, None)
        if c == "+":
            self._pos += 1
            return self._repeat(frag, 1, None)
        if c == "?":
            self._pos += 1
            return self._repeat(frag, 0, 1)
        if c == "{":
            end = self.pattern.find("}", self._pos)
            if end < 0:
                raise UnsupportedRegex("unclosed {")
            body = self.pattern[self._pos + 1:end]
            self._pos = end + 1
            parts = body.split(",")
            try:
                if len(parts) == 1:
                    m = n = int(parts[0])
                elif len(parts) == 2:
                    m = int(parts[0]) if parts[0] else 0
                    n = int(parts[1]) if parts[1] else None
                else:
                    raise ValueError
            except ValueError:
                raise UnsupportedRegex(f"bad repeat {{{body}}}")
            if m > _MAX_REPEAT or (n is not None and n > _MAX_REPEAT):
                raise UnsupportedRegex("repeat bound too large")
            return self._repeat(frag, m, n)
        return frag

    def _repeat(self, frag, m: int, n: Optional[int]) -> Tuple[int, int]:
        """Duplicate the sub-NFA: m mandatory copies, then (n-m) optional
        or a star loop when unbounded.  The first copy reuses `frag`; a
        copy is made by re-parsing is avoided via structural clone."""
        start = self._new_state()
        acc = start
        used = False

        def copy():
            nonlocal used
            if used:
                return self._clone(frag)
            used = True
            return frag

        for _ in range(m):
            fs, fa = copy()
            self.eps[acc].append(fs)
            acc = fa
        if n is None:  # unbounded tail: star over one more copy
            fs, fa = copy()
            loop_in = self._new_state()
            loop_out = self._new_state()
            self.eps[acc].append(loop_in)
            self.eps[loop_in].append(fs)
            self.eps[fa].append(loop_in)   # repeat
            self.eps[loop_in].append(loop_out)
            return start, loop_out
        for _ in range(n - m):
            fs, fa = copy()
            nxt = self._new_state()
            self.eps[acc].append(fs)
            self.eps[fa].append(nxt)
            self.eps[acc].append(nxt)      # skip this optional copy
            acc = nxt
        return start, acc

    def _clone(self, frag: Tuple[int, int]) -> Tuple[int, int]:
        """Structural copy of the sub-NFA reachable from frag[0]."""
        fs, fa = frag
        mapping = {}
        stack = [fs]
        mapping[fs] = self._new_state()
        while stack:
            s = stack.pop()
            for pred, dst in list(self.edges[s]):
                if dst not in mapping:
                    mapping[dst] = self._new_state()
                    stack.append(dst)
                self.edges[mapping[s]].append((pred, mapping[dst]))
            for dst in list(self.eps[s]):
                if dst not in mapping:
                    mapping[dst] = self._new_state()
                    stack.append(dst)
                self.eps[mapping[s]].append(mapping[dst])
        if fa not in mapping:          # accept unreachable (empty frag)
            mapping[fa] = self._new_state()
        return mapping[fs], mapping[fa]

    def _parse_atom(self) -> Tuple[int, int]:
        c = self._peek()
        if c is None:
            raise UnsupportedRegex("unexpected end")
        if c == "(":
            self._pos += 1
            if self._peek() == "?":
                # only non-capturing (?:...) is supported
                if self.pattern[self._pos:self._pos + 2] == "?:":
                    self._pos += 2
                else:
                    raise UnsupportedRegex("(?...) extension")
            frag = self._parse_alt()
            if self._peek() != ")":
                raise UnsupportedRegex("unclosed group")
            self._pos += 1
            return frag
        if c == "[":
            return self._edge_frag(self._parse_class())
        if c == ".":
            self._pos += 1
            return self._edge_frag(("any",))
        if c == "\\":
            self._pos += 1
            e = self._peek()
            if e is None:
                raise UnsupportedRegex("trailing backslash")
            if e in _META or not e.isalnum():
                self._pos += 1
                return self._edge_frag(("ch", e))
            simple = {"n": "\n", "t": "\t", "r": "\r"}
            if e in simple:
                self._pos += 1
                return self._edge_frag(("ch", simple[e]))
            if e in "dwsDWS":
                self._pos += 1
                return self._edge_frag(("cat", e))
            raise UnsupportedRegex(f"escape \\{e}")
        if c in "*+?{":
            raise UnsupportedRegex(f"dangling quantifier {c!r}")
        if c in "^$":
            raise UnsupportedRegex("anchors")
        self._pos += 1
        return self._edge_frag(("ch", c))

    def _parse_class(self) -> tuple:
        assert self.pattern[self._pos] == "["
        self._pos += 1
        neg = False
        if self._peek() == "^":
            neg = True
            self._pos += 1
        ranges: List[Tuple[int, int]] = []
        cats: List[str] = []
        first = True
        while True:
            c = self._peek()
            if c is None:
                raise UnsupportedRegex("unclosed class")
            if c == "]" and not first:
                self._pos += 1
                break
            first = False
            if c == "\\":
                self._pos += 1
                c = self._peek()
                if c is None:
                    raise UnsupportedRegex("trailing backslash in class")
                if c in ("n", "t", "r"):
                    c = {"n": "\n", "t": "\t", "r": "\r"}[c]
                elif c in "dwsDWS":  # predefined class inside [...]
                    self._pos += 1
                    if self._peek() == "-" and \
                            self.pattern[self._pos + 1:self._pos + 2] \
                            not in ("]", ""):
                        # re rejects ranges starting at a class escape
                        raise UnsupportedRegex("bad character range")
                    cats.append(c)
                    continue
                elif c.isalnum():   # \b, \x41, ... -> fall back to re
                    raise UnsupportedRegex(f"class escape \\{c}")
            self._pos += 1
            if self._peek() == "-" and self.pattern[self._pos + 1:self._pos + 2] not in ("]", ""):
                self._pos += 1
                hi = self._peek()
                if hi == "\\":
                    raise UnsupportedRegex("escaped range bound")
                self._pos += 1
                ranges.append((ord(c), ord(hi)))
            else:
                ranges.append((ord(c), ord(c)))
        return ("cls", tuple(ranges), neg, tuple(cats))

    def _edge_frag(self, pred) -> Tuple[int, int]:
        s, a = self._new_state(), self._new_state()
        self.edges[s].append((pred, a))
        return s, a


# ---------------------------------------------------------------------------
# Intersection with the sorted term dictionary
# ---------------------------------------------------------------------------

_MAX_CP = 0x10FFFF


def intersect_sorted_terms(terms_arr, automaton, probe_counter=None
                           ) -> List[int]:
    """Term ordinals (ascending) of terms accepted by ``automaton``.

    ``terms_arr`` is the segment's sorted Arrow string array (an implicit
    trie).  Each trie node costs one scalar read for its first term plus
    one binary search per child; subtrees whose prefix kills the
    automaton are never read.  ``probe_counter`` (a 1-element list)
    counts term-dict scalar reads so tests can assert sub-linearity."""
    n = len(terms_arr)
    if n == 0:
        return []
    out: List[int] = []
    read_cache: dict = {}

    def read(i: int) -> str:
        v = read_cache.get(i)
        if v is None:
            v = terms_arr[i].as_py()
            read_cache[i] = v
            if probe_counter is not None:
                probe_counter[0] += 1
        return v

    def bisect_left(key: str, lo: int, hi: int) -> int:
        while lo < hi:
            mid = (lo + hi) // 2
            if read(mid) < key:
                lo = mid + 1
            else:
                hi = mid
        return lo

    def visit(lo: int, hi: int, prefix: str, state) -> None:
        if automaton.matches_all(state):
            out.extend(range(lo, hi))
            return
        depth = len(prefix)
        first = read(lo)
        if len(first) == depth:        # the prefix itself is a term
            if automaton.is_match(state):
                out.append(lo)
            lo += 1
        while lo < hi:
            c = read(lo)[depth]
            if ord(c) >= _MAX_CP:
                nxt = hi
            else:
                nxt = bisect_left(prefix + chr(ord(c) + 1), lo, hi)
            ns = automaton.step(state, c)
            if ns is not None:
                visit(lo, nxt, prefix + c, ns)
            lo = nxt

    start = automaton.start()
    if start is not None:
        visit(0, n, "", start)
    return out
