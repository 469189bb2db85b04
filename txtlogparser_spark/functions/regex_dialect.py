r"""ECMAScript std::regex dialect emulation (opt-in).

The reference compiles filter/search patterns with C++ std::regex in its
DEFAULT ECMAScript grammar (reference/src/core/FilterData.cpp:161-238).
This engine standardizes on Python `re` (documented policy, SURVEY.md
§2.3); tests/test_regex_dialect.py is the pinned divergence corpus. This
module closes the remaining portability gap: `ecma_to_python` translates
an ECMAScript-grammar pattern into an equivalent Python pattern —
rejecting exactly the constructs std::regex rejects (so a reference
workspace whose filter "matches nothing" due to regex_error behaves
identically here) and rewriting the constructs whose meaning differs.

Semantics are pinned EMPIRICALLY against GCC 12 libstdc++ — the
reference's Linux toolchain (CMakeLists.txt gcc_64 Qt path), and the
platform a Spark engine runs on — via tools/ecma_probe.cpp (compiles
each pattern exactly as FilterData.cpp:171-175 does and reports compile
result + first match). Where libstdc++ deviates from strict ECMA-262v3
the libstdc++ behavior wins; deviations are flagged [libstdc++] below.
Other stdlibs (MSVC, libc++) differ on some corners; the corpus
documents each pinned case so a port to those toolchains knows where to
re-probe.

Emulated deltas (each corresponds to a corpus entry):

  reject (std::regex regex_error → filter claims no spans):
    - lookbehind (?<= (?<!            pre-C++23 ECMAScript has none
    - named groups (?P<n> / (?<n> / (?P=n)   no named groups in the C++ flavor
    - atomic groups (?> and conditionals (?(
    - inline flags (?i) etc.          not in the ECMAScript grammar
    - overflow backreference \N with N > capture-group count
                                      (error_backref; Python also errors
                                      but raising here is deterministic)
    - in-class \1..\9                 class DecimalEscape backref — error
                                      in std::regex; Python silently
                                      reads an OCTAL char (divergence!)
    - in-class \B                     rejected [libstdc++]; Python also
                                      errors ("bad escape")
    - invalid brace range: a{ a{} a{x} a{,5} a{2,1} — error_badbrace;
                                      Python treats non-quantifier braces
                                      as LITERALS (divergence!). NOTE
                                      strict Annex B would be literal
                                      too; libstdc++ rejects [libstdc++]
    - quantifier with nothing to repeat, incl. quantified assertions:
      ^* $* \b* (?=a)* (?=a)? {2}     error_badrepeat; Python silently
                                      QUANTIFIES lookaheads (divergence!)
  rewrite:
    - stacked quantifiers a*+ a++ a?+ a{m,n}+ a** → (?:a*)+ etc.
                                      std::regex ACCEPTS these as
                                      quantifier-of-quantified-atom with
                                      normal backtracking (empirically
                                      a*+ab matches "aaab"); Python ≥3.11
                                      reads POSSESSIVE quantifiers
                                      (a*+a never matches "aaa") — the
                                      non-capturing wrap restores the
                                      backtracking meaning
    - \0 → \x00                       DecimalEscape 0 is NUL and the
                                      digits after it stay LITERAL in
                                      ECMA (\012 = NUL,'1','2'); Python
                                      would read octal (\012 = '\n')
    - unescaped $ outside classes → \Z   ECMA '$' (no multiline) matches only
                                          at end of input; Python '$' also
                                          matches before a trailing '\n'
    - [] → [^\s\S] (never matches), [^] → [\s\S] (matches anything)
                                          ECMA allows empty classes; Python
                                          treats a leading ']' as a literal
    - lone '}' → escaped              literal in both; escaped so Python
                                          ≥3.12 cannot reinterpret
    - identity escapes \A \Z \z \G \q \E \p … → bare letter
                                          std::regex: literal letter;
                                          Python: anchor or "bad escape"
    - \cX → literal X [libstdc++]     GCC's std::regex does not implement
                                          ECMA control escapes: \cA
                                          matches 'A' (not \x01), \c8
                                          matches '8' — probed, not spec
  flags:
    - compile with re.ASCII              std::regex classifies \w \b \d \s
                                          (and icase folding) byte-wise in the
                                          "C" locale; Python3 defaults Unicode
"""

from __future__ import annotations

import re

__all__ = ["EcmaRegexError", "ecma_to_python", "compile_ecma"]


class EcmaRegexError(ValueError):
    """Pattern is invalid under the ECMAScript std::regex grammar.

    Corresponds to std::regex_error at construction — the reference
    catches it and the matcher emits no spans (FilterData.cpp:234-237).
    """


# {m} / {m,} / {m,n} — the only brace shapes std::regex accepts
_BRACE_RE = re.compile(r"\{(\d+)(?:,(\d*))?\}")
_QUANT_CHARS = frozenset("*+?")
# escapes with IDENTICAL meaning in both dialects (under re.ASCII),
# copied through verbatim; b B c and digits are handled specially
_SHARED_ESCAPES = frozenset("dDsSwWfnrtvxu")


def _count_capture_groups(pattern: str) -> int:
    """Number of capturing groups, per the ECMA read ('(' not '(?')."""
    n_groups = 0
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            i += 1
            continue
        if c == "[":
            if pattern.startswith("[]", i):
                i += 2
            elif pattern.startswith("[^]", i):
                i += 3
            else:
                in_class = True
                i += 1
            continue
        if c == "(" and not pattern.startswith("(?", i):
            n_groups += 1
        i += 1
    return n_groups


def ecma_to_python(pattern: str) -> str:
    """Translate an ECMAScript-grammar pattern to Python `re` syntax.

    Raises EcmaRegexError for constructs std::regex's ECMAScript grammar
    rejects (pinned against GCC 12 libstdc++ — see module docstring).
    The result is meant to be compiled with re.ASCII (see compile_ecma)
    so \\w/\\b/\\d/\\s and icase folding match the reference's
    "C"-locale byte semantics.
    """
    n_groups = _count_capture_groups(pattern)
    out: list[str] = []
    i, n = 0, len(pattern)
    in_class = False
    class_open = 0  # out-index of the '[' of the open class
    # out-index where the last quantifiable atom begins; None when the
    # previous token was an assertion / '|' / group-open / start
    atom_start: int | None = None
    quantified = False  # last atom already carries >=1 quantifier
    # open groups: (out-index of '(', kind) kind in {'cap','noncap','look'}
    paren_stack: list[tuple[int, str]] = []

    def _apply_quantifier(token: str, pos: int) -> None:
        nonlocal quantified
        if atom_start is None:
            raise EcmaRegexError(
                f"quantifier '{token}' at pos {pos} has nothing to repeat "
                "(assertions are not quantifiable — std::regex "
                "error_badrepeat)"
            )
        if quantified:
            # X*+ / X** / X{m,n}? … — std::regex quantifies the already-
            # quantified atom WITH backtracking; Python would read a
            # possessive quantifier. Wrap the atom non-capturingly.
            out[atom_start:] = ["(?:", *out[atom_start:], ")"]
        out.append(token)
        quantified = True

    while i < n:
        c = pattern[i]
        if c == "\\":
            if i + 1 >= n:
                raise EcmaRegexError("trailing backslash")
            nxt = pattern[i + 1]
            if nxt == "c":
                # [libstdc++] \cX is the LITERAL character X (GCC does
                # not implement ECMA control escapes — probed: \cA
                # matches 'A', \c8 matches '8'); bare trailing \c errors
                if i + 2 >= n:
                    raise EcmaRegexError(
                        "'\\c' at end of pattern (std::regex error_escape)"
                    )
                if not in_class:
                    atom_start, quantified = len(out), False
                out.append(re.escape(pattern[i + 2]))
                i += 3
                continue
            if nxt == "0":
                # DecimalEscape 0 = NUL; digits AFTER it stay literal in
                # ECMA (\012 = NUL '1' '2') while Python would read
                # octal (\012 = '\n') — normalize to \x00
                if not in_class:
                    atom_start, quantified = len(out), False
                out.append(r"\x00")
                i += 2
                continue
            if nxt.isdigit():
                j = i + 1
                while j < n and pattern[j].isdigit():
                    j += 1
                ref = int(pattern[i + 1 : j])
                if in_class:
                    # class DecimalEscape backref: regex_error (Python
                    # would silently read an octal character instead)
                    raise EcmaRegexError(
                        f"backreference \\{ref} inside a character class "
                        f"(pos {i}) is a std::regex error"
                    )
                if ref > n_groups:
                    raise EcmaRegexError(
                        f"backreference \\{ref} exceeds the capture-group "
                        f"count {n_groups} (std::regex error_backref)"
                    )
                atom_start, quantified = len(out), False
                out.append("\\" + str(ref))
                i = j
                continue
            if nxt in ("b", "B"):
                if in_class:
                    if nxt == "B":
                        # [libstdc++] [\B] is rejected (Python also
                        # errors — raising keeps the reject deterministic)
                        raise EcmaRegexError(
                            f"'\\B' inside a character class (pos {i}) is "
                            "a std::regex error"
                        )
                    out.append(r"\b")  # backspace member in BOTH dialects
                    i += 2
                    continue
                # word-boundary assertions — not quantifiable. ECMA \B
                # holds wherever both neighbors agree (both word or both
                # NON-word, including both string edges of ""), while
                # Python's \B deliberately never matches when neither
                # side is a word char at the string edge — expand \B to
                # the ECMA definition via lookarounds
                if nxt == "B":
                    out.append(r"(?:(?<=\w)(?=\w)|(?<!\w)(?!\w))")
                else:
                    out.append(r"\b")
                i += 2
                atom_start, quantified = None, False
                continue
            if nxt in ("x", "u"):
                # fixed-width hex escapes are ONE atom — consume the
                # digits with the escape so quantifier-wrapping cannot
                # split them (\x41{2}+ must wrap (?:\x41{2}), not
                # (?:1{2})). Bad/short digits error in BOTH dialects;
                # copying the bare prefix lets Python report it.
                width = 2 if nxt == "x" else 4
                digits = pattern[i + 2 : i + 2 + width]
                if len(digits) == width and all(
                    d in "0123456789abcdefABCDEF" for d in digits
                ):
                    if not in_class:
                        atom_start, quantified = len(out), False
                    out.append(pattern[i : i + 2 + width])
                    i += 2 + width
                else:
                    if not in_class:
                        atom_start, quantified = len(out), False
                    out.append(pattern[i : i + 2])
                    i += 2
                continue
            if nxt.isascii() and nxt.isalpha() and nxt not in _SHARED_ESCAPES:
                # Identity escapes: std::regex treats \<letter> outside
                # its special set as the literal letter (\A \Z \z \G \q
                # \E \p …), while Python `re` either anchors (\A \Z) or
                # raises "bad escape" — emit the bare letter. Inside a
                # class the same applies ([\Z] is literal Z in ECMA, an
                # error in Python).
                if not in_class:
                    atom_start, quantified = len(out), False
                out.append(nxt)
            else:
                # shared escapes (\d \x41 ሴ \n …) and escaped
                # punctuation (\. \\ \] \{ …) — identical in both; bad
                # hex/unicode digits error in BOTH dialects at compile
                if not in_class:
                    atom_start, quantified = len(out), False
                out.append(pattern[i : i + 2])
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
                out.append(c)
                i += 1
                # the whole class is one quantifiable atom
                atom_start, quantified = class_open, False
                continue
            out.append(c)
            i += 1
            continue
        if c == "[":
            # ECMA allows empty classes: [] never matches, [^] matches
            # any char (incl. newline). Python would instead read the
            # ']' as a literal member, silently changing the meaning.
            if pattern.startswith("[]", i):
                atom_start, quantified = len(out), False
                out.append(r"[^\s\S]")
                i += 2
            elif pattern.startswith("[^]", i):
                atom_start, quantified = len(out), False
                out.append(r"[\s\S]")
                i += 3
            else:
                # NOTE: a ']' directly after '[' or '[^' cannot reach
                # here — those shapes are the empty-class forms consumed
                # by the startswith branches above; everything else in
                # the class (including a leading '^') copies through the
                # in_class loop verbatim, identical in both dialects
                in_class = True
                class_open = len(out)
                out.append(c)
                i += 1
            continue
        if c == "$":
            out.append(r"\Z")
            i += 1
            atom_start, quantified = None, False
            continue
        if c == "^":
            out.append(c)
            i += 1
            atom_start, quantified = None, False
            continue
        if c == "(":
            if pattern.startswith("(?", i):
                ext = pattern[i + 2 : i + 3]
                if ext == ":" or ext in ("=", "!"):
                    kind = "noncap" if ext == ":" else "look"
                    paren_stack.append((len(out), kind))
                    out.append(pattern[i : i + 3])
                    i += 3
                    atom_start, quantified = None, False
                    continue
                # (?< — lookbehind or ECMA-2018 named group: both are
                # regex_error in std::regex. (?P — Python-only. (?> (?(
                # (?i) etc. — not in the grammar.
                raise EcmaRegexError(
                    f"'(?{ext}' is not in the ECMAScript std::regex grammar "
                    f"(pos {i})"
                )
            paren_stack.append((len(out), "cap"))
            out.append(c)
            i += 1
            atom_start, quantified = None, False
            continue
        if c == ")":
            if not paren_stack:
                raise EcmaRegexError(
                    f"unbalanced ')' at pos {i} (std::regex error_paren)"
                )
            open_idx, kind = paren_stack.pop()
            out.append(c)
            i += 1
            if kind == "look":
                # lookaheads are assertions: (?=a)* is error_badrepeat
                atom_start, quantified = None, False
            else:
                atom_start, quantified = open_idx, False
            continue
        if c in _QUANT_CHARS:
            _apply_quantifier(c, i)
            i += 1
            # X*? / X+? / X?? are lazy in BOTH dialects — consume the
            # lazy marker as part of this quantifier so it is not read
            # as a second (stacked) quantifier
            if i < n and pattern[i] == "?":
                out.append("?")
                i += 1
            continue
        if c == "{":
            m = _BRACE_RE.match(pattern, i)
            if not m:
                # a '{' that does not open a valid range is regex_error
                # [libstdc++] (strict Annex B would read a literal; GCC
                # rejects — probed: a{ a{} a{x} a{,5} all error)
                raise EcmaRegexError(
                    f"invalid brace range at pos {i} "
                    "(std::regex error_badbrace)"
                )
            lo, hi = int(m.group(1)), m.group(2)
            if hi:  # '{m,n}' with explicit n — '' means open-ended {m,}
                if lo > int(hi):
                    raise EcmaRegexError(
                        f"reversed brace range at pos {i} "
                        "(std::regex error_badbrace)"
                    )
            _apply_quantifier(m.group(0), i)
            i = m.end()
            if i < n and pattern[i] == "?":  # lazy bounded repeat
                out.append("?")
                i += 1
            continue
        if c == "}":
            # lone '}' is a literal in both dialects; escape it so
            # Python ≥3.12 cannot reinterpret adjacent digits
            atom_start, quantified = len(out), False
            out.append(r"\}")
            i += 1
            continue
        if c == "|":
            out.append(c)
            i += 1
            atom_start, quantified = None, False
            continue
        atom_start, quantified = len(out), False
        out.append(c)
        i += 1
    if in_class:
        raise EcmaRegexError("unterminated character class")
    if paren_stack:
        raise EcmaRegexError("unbalanced '(' (std::regex error_paren)")
    return "".join(out)


def compile_ecma(pattern: str, ignore_case: bool = False) -> re.Pattern:
    """Compile an ECMAScript-grammar pattern with reference semantics.

    re.ASCII pins \\w/\\b/\\d/\\s and case folding to the byte-wise "C"
    locale the reference's std::regex uses. Raises EcmaRegexError (or
    re.error for errors common to both dialects, e.g. bad \\x digits) —
    callers emulating the reference's catch-and-log compile '(?!)'
    instead (config.MatcherSpec.compiled).
    """
    translated = ecma_to_python(pattern)
    flags = re.ASCII | (re.IGNORECASE if ignore_case else 0)
    return re.compile(translated, flags)
