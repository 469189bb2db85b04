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

Emulated deltas (each corresponds to a corpus entry):

  reject (std::regex regex_error → filter claims no spans):
    - lookbehind (?<= (?<!            pre-C++23 ECMAScript has none
    - named groups (?P<n> / (?<n> / (?P=n)   no named groups in the C++ flavor
    - atomic groups (?> and conditionals (?(
    - inline flags (?i) etc.          not in the ECMAScript grammar
    - possessive quantifiers *+ ++ ?+ {m,n}+  (quantifier-on-quantifier error)
  rewrite:
    - unescaped $ outside classes → \\Z   ECMA '$' (no multiline) matches only
                                          at end of input; Python '$' also
                                          matches before a trailing '\\n'
    - [] → [^\s\S] (never matches), [^] → [\s\S] (matches anything)
                                          ECMA allows empty classes; Python
                                          treats a leading ']' as a literal
    - non-quantifier '{' / '}' escaped    ECMA Annex B literal braces; Python
                                          ≥3.12 reads '{,n}' as '{0,n}'
    - identity escapes \A \Z \z \G \q \E \p … → bare letter
                                          std::regex: literal letter;
                                          Python: anchor or "bad escape"
    - \cX → \xHH                          ECMA control escape; Python has
                                          no \c and errors
  flags:
    - compile with re.ASCII              std::regex classifies \\w \\b \\d \\s
                                          (and icase folding) byte-wise in the
                                          "C" locale; Python3 defaults Unicode

Not emulated (documented in the corpus, both dialects error or the
construct is out of the reference's workspace domain): octal-escape vs
overflow-backref arbitration for \\NN with NN beyond the group count.
"""

from __future__ import annotations

import re

__all__ = ["EcmaRegexError", "ecma_to_python", "compile_ecma"]


class EcmaRegexError(ValueError):
    """Pattern is invalid under the ECMAScript std::regex grammar.

    Corresponds to std::regex_error at construction — the reference
    catches it and the matcher emits no spans (FilterData.cpp:234-237).
    """


_QUANT_BRACE = re.compile(r"\{\d+(?:,\d*)?\}")
_QUANT_CHARS = frozenset("*+?")


def ecma_to_python(pattern: str) -> str:
    """Translate an ECMAScript-grammar pattern to Python `re` syntax.

    Raises EcmaRegexError for constructs std::regex's ECMAScript grammar
    rejects. The result is meant to be compiled with re.ASCII (see
    compile_ecma) so \\w/\\b/\\d/\\s and icase folding match the
    reference's "C"-locale byte semantics.
    """
    out: list[str] = []
    i, n = 0, len(pattern)
    in_class = False
    prev_was_quant = False  # previous atom emitted was a quantifier
    while i < n:
        c = pattern[i]
        if c == "\\":
            if i + 1 >= n:
                raise EcmaRegexError("trailing backslash")
            nxt = pattern[i + 1]
            if nxt == "c" and i + 2 < n and pattern[i + 2].isascii() and pattern[i + 2].isalpha():
                # ControlEscape \cX → the control character (ECMA);
                # Python has no \c and errors — emit it as \xHH
                out.append("\\x%02x" % (ord(pattern[i + 2].upper()) % 32))
                i += 3
                prev_was_quant = False
                continue
            if (
                nxt.isascii()
                and nxt.isalpha()
                and nxt not in "bBdDsSwWfnrtvxuc"
            ):
                # Identity escapes: std::regex treats \<letter> outside
                # its special set as the literal letter (\A \Z \z \G \q
                # \E \p …), while Python `re` either anchors (\A \Z) or
                # raises "bad escape" — emit the bare letter. Inside a
                # class the same applies ([\Z] is literal Z in ECMA, an
                # error in Python).
                out.append(nxt)
            else:
                out.append(pattern[i : i + 2])
            i += 2
            prev_was_quant = False
            continue
        if in_class:
            if c == "]":
                in_class = False
            out.append(c)
            i += 1
            continue
        if c == "[":
            # ECMA allows empty classes: [] never matches, [^] matches
            # any char (incl. newline). Python would instead read the
            # ']' as a literal member, silently changing the meaning.
            if pattern.startswith("[]", i):
                out.append(r"[^\s\S]")
                i += 2
            elif pattern.startswith("[^]", i):
                out.append(r"[\s\S]")
                i += 3
            else:
                # NOTE: a ']' directly after '[' or '[^' cannot reach
                # here — those shapes are the empty-class forms consumed
                # by the startswith branches above; everything else in
                # the class (including a leading '^') copies through the
                # in_class loop verbatim, identical in both dialects
                in_class = True
                out.append(c)
                i += 1
            prev_was_quant = False
            continue
        if c == "$":
            out.append(r"\Z")
            i += 1
            prev_was_quant = False
            continue
        if c == "(":
            if pattern.startswith("(?", i):
                ext = pattern[i + 2 : i + 3]
                if ext == ":" or ext in ("=", "!"):
                    out.append(pattern[i : i + 3])
                    i += 3
                    prev_was_quant = False
                    continue
                # (?< — lookbehind or ECMA-2018 named group: both are
                # regex_error in std::regex. (?P — Python-only. (?> (?(
                # (?i) etc. — not in the grammar.
                raise EcmaRegexError(
                    f"'(?{ext}' is not in the ECMAScript std::regex grammar "
                    f"(pos {i})"
                )
            out.append(c)
            i += 1
            prev_was_quant = False
            continue
        if c in _QUANT_CHARS:
            if prev_was_quant and c != "?":
                # X*+ / X++ / X{m,n}+ — possessive in Python ≥3.11,
                # quantifier-on-quantifier regex_error in ECMAScript
                raise EcmaRegexError(
                    f"possessive/stacked quantifier at pos {i} "
                    "(regex_error in ECMAScript std::regex)"
                )
            out.append(c)
            i += 1
            # X*? / X+? / X?? are lazy in BOTH dialects — consume the
            # lazy marker so it is not itself flagged as stacked
            if i < n and pattern[i] == "?":
                out.append("?")
                i += 1
            prev_was_quant = True
            continue
        if c == "{":
            m = _QUANT_BRACE.match(pattern, i)
            if m:
                if prev_was_quant:
                    raise EcmaRegexError(
                        f"stacked quantifier at pos {i} "
                        "(regex_error in ECMAScript std::regex)"
                    )
                out.append(m.group(0))
                i = m.end()
                if i < n and pattern[i] == "?":  # lazy bounded repeat
                    out.append("?")
                    i += 1
                prev_was_quant = True
                continue
            # Not a quantifier: ECMA Annex B literal '{'. Escape it so
            # Python ≥3.12 cannot reinterpret shapes like '{,5}' as a
            # {0,5} quantifier.
            out.append(r"\{")
            i += 1
            prev_was_quant = False
            continue
        if c == "}":
            out.append(r"\}")
            i += 1
            prev_was_quant = False
            continue
        out.append(c)
        i += 1
        prev_was_quant = False
    if in_class:
        raise EcmaRegexError("unterminated character class")
    return "".join(out)


def compile_ecma(pattern: str, ignore_case: bool = False) -> re.Pattern:
    """Compile an ECMAScript-grammar pattern with reference semantics.

    re.ASCII pins \\w/\\b/\\d/\\s and case folding to the byte-wise "C"
    locale the reference's std::regex uses. Raises EcmaRegexError (or
    re.error for errors common to both dialects, e.g. overflow
    backrefs) — callers emulating the reference's catch-and-log compile
    '(?!)' instead (config.MatcherSpec.compiled).
    """
    translated = ecma_to_python(pattern)
    flags = re.ASCII | (re.IGNORECASE if ignore_case else 0)
    return re.compile(translated, flags)
