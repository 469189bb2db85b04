"""ECMAScript ↔ Python regex dialect delta corpus (SURVEY.md §2.3,
VERDICT round-1 missing #3).

The reference compiles patterns with C++ std::regex in its DEFAULT
ECMAScript grammar (FilterData.cpp:161-238); this engine standardizes on
Python `re`. This file is the documented divergence corpus: for every
construct class it pins the Python behavior the engine ships, and notes
the ECMAScript behavior in comments so a user porting reference
workspaces knows exactly which patterns change meaning.

Legend per entry: (pattern, input, python_spans) with an ECMA note.
Pure documentation-by-test — no Spark session.
"""

from __future__ import annotations

import re

import pytest

from txtlogparser_spark.config import ConfigError, FilterSpec, WorkspaceConfig
from txtlogparser_spark.functions.regex_dialect import (
    EcmaRegexError,
    compile_ecma,
    ecma_to_python,
)


def spans(pattern: str, text: str, flags: int = 0):
    return [(m.start(), m.end()) for m in re.compile(pattern, flags).finditer(text)]


class TestAgreeingCore:
    """Constructs with IDENTICAL semantics in both dialects — the safe
    workspace-portable subset (covers every pattern the reference's own
    test corpus uses)."""

    @pytest.mark.parametrize(
        "pattern,text,want",
        [
            ("b(ig|atch)", "a big batch", [(2, 5), (6, 11)]),   # alternation
            ("[a-f0-9]+", "zz af09 q", [(3, 7)]),               # classes/ranges
            ("colou?r", "color colour", [(0, 5), (6, 12)]),     # ? quantifier
            ("a{2,3}", "aaaa", [(0, 3)]),                        # bounded repeat
            (r"\d+\.\d+", "pi=3.14", [(3, 7)]),                  # \d + escaped dot
            (r"\bword\b", "a word, wordy", [(2, 6)]),            # word boundary
            (r"(?:non)+", "nonnon", [(0, 6)]),                   # non-capturing
            ("^start", "start here", [(0, 5)]),                  # anchors
            (r"\s+", "a \t b", [(1, 4)]),                        # whitespace class
        ],
    )
    def test_identical_semantics(self, pattern, text, want):
        assert spans(pattern, text) == want


class TestDivergences:
    """Patterns whose meaning DIFFERS between the dialects. The engine
    ships the asserted Python semantics."""

    def test_lookbehind(self):
        # ECMAScript std::regex (pre-C++23) REJECTS lookbehind with
        # regex_error — the reference's catch logs it and the filter
        # matches nothing. Python supports fixed-width lookbehind, so the
        # same workspace MATCHES here.
        assert spans(r"(?<=\$)\d+", "cost $42", ) == [(6, 8)]

    def test_octal_vs_backref(self):
        # ECMAScript: \1 with no group 1 is a backref error (or octal in
        # some impls). Python: error too — but \0 handling differs:
        # Python treats \0 as NUL; ECMAScript treats it as NUL as well —
        # while \12 in Python is backref-12-or-error vs octal in ECMA.
        with pytest.raises(re.error):
            re.compile(r"(a)\2")  # both dialects reject a forward/overflow backref

    def test_named_group_syntax(self):
        # Python: (?P<name>...); ECMAScript std::regex does NOT support
        # named groups at all (C++ flavor) — the pattern below is a
        # regex_error there (→ filter matches nothing under the
        # match_nothing compat mode), but matches in Python.
        assert spans(r"(?P<n>\d+)", "x12") == [(1, 3)]

    def test_ecma_named_group_syntax_rejected_by_python(self):
        # The ECMAScript-2018 browser syntax (?<n>...) is invalid in
        # Python `re` — loading such a workspace needs the compat flag.
        with pytest.raises(re.error):
            re.compile(r"(?<n>\d+)")
        ws = WorkspaceConfig(
            filters=[FilterSpec(201, 0, r"(?<n>\d+)", regex=True)]
        )
        with pytest.raises(ConfigError):
            ws.validate()
        ws.validate(invalid_regex="match_nothing")  # compat path loads it
        assert ws.filters[0].compiled().search("x12") is None

    def test_unicode_word_class(self):
        # Python3 \w is Unicode-aware by default; ECMAScript std::regex
        # \w is [A-Za-z0-9_] under the default locale. 'héllo' diverges:
        assert spans(r"\w+", "héllo") == [(0, 5)]  # Python: one token
        # ECMA would split at 'é' → [(0,1),(2,5)]. ASCII-only inputs (the
        # reference's log domain) are unaffected; re.ASCII restores the
        # ECMA behavior when byte-parity matters:
        assert spans(r"\w+", "héllo", re.ASCII) == [(0, 1), (2, 5)]

    def test_dollar_before_trailing_newline(self):
        # Python '$' also matches BEFORE a trailing '\n'; ECMAScript '$'
        # (without multiline) matches only at end of input. The engine's
        # load scrub strips the trailing newline, so pipeline inputs
        # never exercise the divergence — pinned here for raw use.
        assert re.search("x$", "x\n") is not None  # Python: matches
        assert re.search("x$", "x\nq") is None     # both: no match

    def test_possessive_and_atomic(self):
        # Python 3.11+ reads a*+ as a POSSESSIVE quantifier (no
        # backtracking); libstdc++ std::regex instead accepts it as a
        # backtracking repeat of the quantified atom — (?:a*)+ — probed
        # with tools/ecma_probe.cpp. Engine (python dialect) behavior:
        assert spans(r"a*+b", "aab") == [(0, 3)]
        assert spans(r"a*+a", "aaa") == []  # possessive: never gives back


class TestEcmaEmulation:
    """Opt-in reference-dialect emulation (functions/regex_dialect.py,
    dialect='ecmascript' in MatcherSpec/make_span_extractor). Each entry
    mirrors a TestDivergences case and asserts the EMULATED behavior now
    matches the reference's std::regex, closing VERDICT r2 missing #3."""

    def espans(self, pattern: str, text: str, icase: bool = False):
        return [
            (m.start(), m.end())
            for m in compile_ecma(pattern, ignore_case=icase).finditer(text)
        ]

    @pytest.mark.parametrize(
        "pattern,text,want",
        TestAgreeingCore.test_identical_semantics.pytestmark[0].args[1],
    )
    def test_agreeing_core_unchanged(self, pattern, text, want):
        # The safe portable subset translates to itself (modulo anchors)
        # and keeps identical spans on the reference's ASCII log domain.
        assert self.espans(pattern, text) == want

    @pytest.mark.parametrize(
        "pattern",
        [
            r"(?<=\$)\d+",   # lookbehind (pre-C++23 regex_error)
            r"(?<!x)y",      # negative lookbehind
            r"(?P<n>\d+)",   # Python named group
            r"(?<n>\d+)",    # ECMA-2018 named group (not in C++ flavor)
            r"(?>ab)",       # atomic group
            r"(?(1)a|b)",    # conditional
            r"(?i)abc",      # inline flags
            "a\\",           # trailing backslash
            "[ab",           # unterminated class
            r"(a)\2",        # overflow backref (error_backref)
            r"\1",           # backref with no groups
            r"[\1]",         # in-class backref (Python: silent OCTAL!)
            r"[\B]",         # in-class \B [libstdc++]
            r"(?=a)*",       # quantified assertion (Python: silent!)
            r"(?=a)?",       # quantified assertion (Python: silent!)
            r"^*",           # quantified anchor
            r"$+",           # quantified anchor
            r"\b{2}",        # quantified word boundary
            r"{2}",          # quantifier with no atom (Python: literal!)
            r"a{,5}",        # invalid brace range (Python: literal!)
            r"a{}",          # invalid brace range (Python: literal!)
            r"a{x}",         # invalid brace range (Python: literal!)
            r"a{2,1}",       # reversed brace range
            r"a{2",          # unterminated brace range (Python: literal!)
            r"\c",           # trailing \c (error_escape)
            "(",             # unbalanced parens (error_paren)
            ")",
        ],
    )
    def test_reference_rejects(self, pattern):
        # std::regex throws regex_error at construction for all of these
        # (each probed with tools/ecma_probe.cpp against GCC 12
        # libstdc++). The entries marked "Python: silent/literal" are the
        # dangerous ones — Python `re` ACCEPTS them with a different
        # meaning, so without the emulation the filter would match spans
        # where the reference claims none.
        with pytest.raises((EcmaRegexError, re.error)):
            compile_ecma(pattern)

    def test_stacked_quantifiers_backtrack(self):
        # libstdc++ ACCEPTS a*+ / a++ / a{m,n}+ / a** as a quantifier
        # applied to the quantified atom WITH normal backtracking
        # (probed: 'a*+ab' matches "aaab" whole). Python ≥3.11 reads the
        # same spelling as a POSSESSIVE quantifier that never gives
        # back. The translator restores the reference meaning by
        # wrapping non-capturingly.
        assert ecma_to_python(r"a*+") == "(?:a*)+"
        assert ecma_to_python(r"a**") == "(?:a*)*"
        assert self.espans(r"a*+ab", "aaab") == [(0, 4)]
        assert self.espans(r"a*+a", "aaa") == [(0, 3)]
        assert spans(r"a*+a", "aaa") == []  # Python possessive: no match
        assert self.espans(r"a++b", "aaab") == [(0, 4)]
        assert self.espans(r"a{1,2}+", "aaa") == [(0, 3)]
        assert self.espans(r"(a)*+", "aa")[0] == (0, 2)
        # lazy markers are part of ONE quantifier, not stacking:
        assert self.espans(r"a*?", "aaa")[0] == (0, 0)
        # ...but a second '?' after a lazy quantifier stacks: (?:a*?)?
        assert self.espans(r"a*??", "aaa")[0] == (0, 0)

    def test_non_boundary_empty(self):
        # ECMA \B holds wherever BOTH neighbors agree — including both
        # string edges of the empty string (probed: std::regex \B
        # matches "" at 0). Python's \B deliberately never matches ""
        # — the emulation expands \B to the ECMA lookaround definition.
        assert re.search(r"\B", "", re.ASCII) is None  # Python policy
        assert compile_ecma(r"\B").search("").span() == (0, 0)
        assert compile_ecma(r"\B").search("ab").span() == (1, 1)
        assert compile_ecma(r"\B").search(" a").span() == (0, 0)

    def test_hex_escape_is_one_atom(self):
        # \x41{2}+ must quantify the WHOLE hex escape — the stacked-
        # quantifier wrap once split it into \x4 + (?:1{2})+ (caught by
        # the libstdc++ differential fuzz, test_ecma_differential.py)
        assert ecma_to_python(r"\x41{2}+") == r"(?:\x41{2})+"
        assert self.espans(r"\x41{2}+", "AAAA") == [(0, 4)]
        assert ecma_to_python(r"A{2}") == r"A{2}"

    def test_octal_nul_arbitration(self):
        # ECMA DecimalEscape: \0 is NUL and following digits stay
        # LITERAL (\012 = NUL '1' '2'); Python reads octal (\012 =
        # '\n'). Probed: std::regex '\012' matches NUL+"12", not "\n".
        assert ecma_to_python(r"\0") == r"\x00"
        assert self.espans("\\012", "\x0012") == [(0, 3)]
        assert self.espans("\\012", "\n12") == []
        assert spans(r"\012", "\n12") == [(0, 1)]  # Python: octal newline
        # in-class: \0 is the NUL member, digits are literal members
        assert self.espans(r"[\012]+", "\x0012x") == [(0, 3)]

    def test_stacked_quantifier_via_matcher(self):
        # Same workspace, opposite outcomes per dialect: Python reads
        # a*+a possessively (never matches), std::regex backtracks.
        spec = FilterSpec(302, 0, r"a*+a", regex=True)
        assert spec.compiled().search("aaa") is None
        assert spec.compiled(dialect="ecmascript").search("aaa").span() == (0, 3)

    def test_rejected_pattern_claims_nothing_via_matcher(self):
        # MatcherSpec reproduces the reference's catch-and-log: a pattern
        # std::regex rejects compiles to a never-matching matcher
        # (FilterData.cpp:234-237) even though Python `re` accepts it.
        spec = FilterSpec(301, 0, r"(?<=\$)\d+", regex=True)
        assert spec.compiled().search("cost $42")  # python dialect: hits
        assert spec.compiled(dialect="ecmascript").search("cost $42") is None
        with pytest.raises(ConfigError):
            spec.validate(dialect="ecmascript")  # strict load rejects it

    def test_ascii_word_class(self):
        # Emulated \w is byte-wise [A-Za-z0-9_] like the "C"-locale
        # std::regex — 'héllo' splits at the non-ASCII byte.
        assert self.espans(r"\w+", "héllo") == [(0, 1), (2, 5)]
        assert self.espans(r"\bword\b", "a word, wordy") == [(2, 6)]

    def test_dollar_is_end_of_input(self):
        # ECMA '$' (no multiline) anchors at true end of input only.
        assert compile_ecma("x$").search("x\n") is None
        assert compile_ecma("x$").search("x") is not None
        assert ecma_to_python("abc$") == r"abc\Z"

    def test_empty_character_classes(self):
        # ECMA: [] never matches; [^] matches any char incl. newline.
        # Python would parse the ']' as a literal member instead.
        assert self.espans("a[]b", "a]b") == []
        assert self.espans("a[^]b", "a\nb") == [(0, 3)]

    def test_brace_ranges_strict(self):
        # [libstdc++] a '{' after an atom MUST open a valid range —
        # a{,5} / a{} / a{x} are regex_error (probed), NOT Annex-B
        # literals as Python reads them; a lone '}' IS a literal in
        # both. Valid quantifier shapes pass through.
        with pytest.raises(EcmaRegexError):
            compile_ecma("a{,5}")
        assert self.espans("a{2,3}", "aaaa") == [(0, 3)]  # real quantifier kept
        assert self.espans("a{2,}", "aaaa") == [(0, 4)]
        assert self.espans("x{0}", "y") == [(0, 0), (1, 1)]
        assert self.espans("a}b", "xa}b") == [(1, 4)]  # lone '}' literal

    def test_identity_escapes(self):
        # \<letter> outside the shared special set is an identity escape
        # (literal letter) in std::regex, but a Python anchor (\A \Z \z)
        # or a hard "bad escape" error (\G \q \E \p) — emulated to the
        # literal, in and out of classes.
        assert self.espans(r"x\Z", "xZ") == [(0, 2)]
        assert self.espans(r"\Ax", "Ax") == [(0, 2)]
        assert self.espans(r"\q+", "qqx") == [(0, 2)]
        assert self.espans(r"[\Z\q]+", "Zq!") == [(0, 2)]
        with pytest.raises(re.error):
            re.compile(r"\q")  # Python rejects what std::regex accepts

    def test_control_escape(self):
        # [libstdc++] GCC's std::regex does NOT implement ECMA control
        # escapes: \cX matches the LITERAL character X (probed: \cA
        # matches 'A' not \x01, \c8 matches '8', case-sensitively).
        # Python has no \c at all ("bad escape").
        assert ecma_to_python(r"\cA") == "A"
        assert compile_ecma(r"\cA").search("x\x01y") is None
        assert self.espans(r"\cA", "baAc") == [(2, 3)]
        assert self.espans(r"\c8", "c*8") == [(2, 3)]
        assert self.espans(r"[\cA]+", "cAAa") == [(1, 3)]
        with pytest.raises(EcmaRegexError):
            compile_ecma("\\c")  # trailing \c: error_escape

    def test_icase_is_bytewise(self):
        # icase folding under re.ASCII stays byte-wise like the "C"
        # locale: 'K' matches 'k' but not the Kelvin sign 'K'.
        assert self.espans("k", "K", icase=True) == [(0, 1)]
        assert self.espans("k", "K", icase=True) == []


# ---------------------------------------------------------------------------
# Property tests: the translator over random regex ASTs (hypothesis).
# Mirrors the word-locality gate's fail-closed property
# (test_token_spans.py): future grammar corners the scanner does not know
# must surface as a counterexample here, not as a silent meaning change.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

# Constructs whose meaning is IDENTICAL in both dialects (no divergence
# corpus entry): on these, translation must be a semantic no-op.
_AGREE_ATOMS = [
    "a", "b", "Q", "1", "_", ".", r"\d", r"\D", r"\w", r"\W", r"\s",
    r"\S", r"\b", "^", r"\x41", r"\.", r"\\", r"\t", r"\n",
    "[ab]", "[^a]", "[a-c]", "[a1_]", r"[\d]", r"[^\w]",
    # NOT here: \B — Python's \B never matches the empty string while
    # ECMA's does (both edges non-word) — see test_non_boundary_empty
]
# Atoms that DIVERGE or REJECT (each backed by a corpus entry above):
# bare $, empty classes, identity escapes, control escapes (rewritten);
# invalid brace shapes ('{x', '{,5}') now raise EcmaRegexError
# [libstdc++]. The translator must stay TOTAL over these: translate,
# raise EcmaRegexError, or fail with an error BOTH grammars share.
_ECMA_ATOMS = _AGREE_ATOMS + [
    "$", "[]", "[^]", "}", r"\Z", r"\A", r"\q", r"\E", r"\cA", r"\cz",
    r"[\Z]", "{x", "{,5}", r"\0", r"\012", r"\B",
]
_QUANTS = ["", "*", "+", "?", "{1,2}", "{2}", "*?", "+?", "??"]


def _ecma_ast(atoms, depth: int):
    atom = st.sampled_from(atoms)
    if depth <= 0:
        return atom
    sub = _ecma_ast(atoms, depth - 1)
    piece = st.builds(
        lambda e, q: e + q, st.one_of(atom, sub), st.sampled_from(_QUANTS)
    )
    return st.one_of(
        atom,
        st.builds(lambda a, b: a + b, piece, piece),          # concat
        st.builds(lambda a, b: f"(?:{a}|{b})", sub, sub),     # alternation
        st.builds(lambda e: f"({e})", sub),                   # group
        st.builds(lambda e: f"(?={e})", sub),                 # lookahead
        st.builds(lambda e: f"(?!{e})", sub),                 # negative look
    )


class TestTranslatorProperties:
    @settings(max_examples=300, deadline=None)
    @given(pat=_ecma_ast(_AGREE_ATOMS, 2), data=st.data())
    def test_agreeing_ast_translation_is_semantic_noop(self, pat, data):
        # Quantifying a quantifier/anchor can error in either dialect —
        # the corpus pins those; here only co-valid patterns are in scope
        try:
            base = re.compile(pat, re.ASCII)
        except re.error:
            return
        try:
            trans = ecma_to_python(pat)
            emu = compile_ecma(pat)
        except EcmaRegexError:
            # translator may reject what Python accepts (quantified
            # assertions, invalid brace ranges) — never the other way:
            # that is pinned by test_reference_rejects
            return
        if "(?:" in trans and "(?:" not in pat:
            # stacked-quantifier wrap: the SAME spelling means possessive
            # in Python but a backtracking repeat in std::regex — a
            # documented divergence (test_stacked_quantifiers_backtrack),
            # so span equality with the raw-Python compile cannot hold
            return
        text = data.draw(
            st.text(alphabet="abQ1_ .\t\nxZ", min_size=0, max_size=12)
        )
        assert [m.span() for m in emu.finditer(text)] == [
            m.span() for m in base.finditer(text)
        ], f"translated={ecma_to_python(pat)!r}"

    @settings(max_examples=300, deadline=None)
    @given(pat=_ecma_ast(_ECMA_ATOMS, 2))
    def test_translator_total_over_valid_ecma(self, pat):
        # Over the whole valid-ECMA atom space the translator either
        # raises EcmaRegexError (a documented reject), compiles, or fails
        # with an error BOTH grammars share (quantified assertion →
        # "nothing to repeat", etc.). What must never escape is a
        # Python-ONLY reject of an ECMA-valid form — "bad escape" is
        # exactly that signature (untranslated identity/control escape).
        try:
            compile_ecma(pat)
        except EcmaRegexError:
            pass
        except re.error as e:
            assert "bad escape" not in str(e), ecma_to_python(pat)


class TestRealisticLogPatterns:
    """Operational log-analysis patterns through the full ECMA path.

    The reference ships NO default filter patterns — the only built-in
    pattern transformation is the whole-word '\\b' wrap
    (FilterData.cpp:167, SearchData.cpp:171), covered above. This class
    pins the patterns real log workspaces use (timestamps, IPs, levels,
    hex addresses, UUIDs, HTTP codes, k=v pairs): each must translate
    losslessly (agreeing subset) and match byte-identically to plain
    Python `re` under re.ASCII, i.e. a reference user can paste these
    into this engine unchanged.
    """

    CASES = [
        # (pattern, text, expected spans)
        (r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}",
         "at 2026-08-19 21:30:05 started", [(3, 22)]),
        (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
         "src=10.0.42.7 dst=192.168.1.200", [(4, 13), (18, 31)]),
        (r"(ERROR|WARN|FATAL)", "INFO ok WARN slow ERROR bad",
         [(8, 12), (18, 23)]),
        (r"0x[0-9a-fA-F]+", "ptr=0xDEADbeef end", [(4, 14)]),
        (r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
         "id 0f8fad5b-d9cb-469f-a165-70867728950e!", [(3, 39)]),
        (r" [45]\d{2} ", "GET /x HTTP/1.1 503 12ms", [(15, 20)]),
        (r"\w+=\S+", "retry count=3 host=db-1:5432", [(6, 13), (14, 28)]),
        (r"at \w+\.\w+\(\w+\.java:\d+\)",
         "\tat com.Foo(Foo.java:42)", [(1, 24)]),
        (r"latency_ms=\d+(\.\d+)?", "latency_ms=12.75 ok", [(0, 16)]),
        (r"\[(?:[^\]]+)\]", "[pool-1] msg [q=2]", [(0, 8), (13, 18)]),
    ]

    @pytest.mark.parametrize("pattern,text,want", CASES)
    def test_portable_unchanged(self, pattern, text, want):
        got = [
            (m.start(), m.end())
            for m in compile_ecma(pattern).finditer(text)
        ]
        assert got == want
        # lossless agreement with plain Python re under re.ASCII — the
        # translator must not perturb the agreeing subset
        assert got == spans(pattern, text, re.ASCII)

    def test_icase_level_filter(self):
        pat = compile_ecma(r"\berror\b", ignore_case=True)
        text = "Error: ERROR in errors"
        assert [(m.start(), m.end()) for m in pat.finditer(text)] == [
            (0, 5), (7, 12),
        ]
