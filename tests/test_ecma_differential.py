"""Differential fuzz: compile_ecma vs the REAL std::regex (libstdc++).

tools/ecma_probe.cpp constructs each pattern exactly as the reference
does (std::regex(pattern, std::regex::ECMAScript) — FilterData.cpp:
171-175) and reports regex_error vs first-match span. This test
generates a deterministic corpus of composed patterns, runs both
engines on identical ASCII subjects, and requires agreement on

  1. accept/reject status (reject on the Python side = EcmaRegexError
     from the translator OR re.error from the compile — the reference's
     catch treats every construction failure as claims-nothing), and
  2. the FIRST match span when both accept (regex_search vs re.search;
     ECMAScript and Python are both leftmost-first, so first-match
     parity is exact, while finditer advancement over empty matches is
     iteration policy, not grammar).

Env-gated: skipped when no C++ compiler is present. Pure subprocess +
re — no Spark session. The hand-pinned corpus (test_regex_dialect.py)
documents each divergence class; this file is the breadth check that no
UNDOCUMENTED divergence class exists in the composed-pattern space.
"""

from __future__ import annotations

import random
import re
import shutil
import subprocess
from pathlib import Path

import pytest

from txtlogparser_spark.functions.regex_dialect import (
    EcmaRegexError,
    compile_ecma,
)

REPO = Path(__file__).resolve().parent.parent
PROBE_SRC = REPO / "tools" / "ecma_probe.cpp"

# Token pool: weighted toward valid fragments so composition yields a
# healthy accept/reject mix (~60/40 observed). Every divergence class
# from the corpus is represented.
TOKENS = [
    "a", "b", "A", "1", "_", ".", " ",
    r"\d", r"\w", r"\s", r"\b", r"\B",
    "^", "$", "|",
    "(", ")", "(?:", "(?=", "(?!",
    "[ab]", "[^a]", "[a-c]", "[]", "[^]", "[\\d]", "[\\0]", "[\\Z]",
    "*", "+", "?", "{2}", "{1,2}", "{2,}", "*?", "+?",
    "{", "}", "{,3}", "{x}",
    r"\0", r"\1", r"\2", r"\012",
    r"\cA", r"\c8", r"\q", r"\Z", r"\A", r"\x41", r"\n", r"\.",
    r"\*", "(a)", "(ab)", "a*+", "a++",
]

SUBJECTS = [
    "aaab aA1_ .x",
    "a12\x0012 {x} }",
    "AbA \x01\n qZ8",
    "cAAa c*8 {,3}",
    "",
]


@pytest.fixture(scope="module")
def probe(tmp_path_factory):
    cxx = shutil.which("g++") or shutil.which("c++")
    if cxx is None:
        pytest.skip("no C++ compiler in environment")
    exe = tmp_path_factory.mktemp("ecma") / "probe"
    subprocess.run(
        [cxx, "-O0", "-std=c++17", "-o", str(exe), str(PROBE_SRC)],
        check=True,
        capture_output=True,
    )
    return exe


def _gen_patterns(n: int, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    pats = []
    for _ in range(n):
        k = rng.randint(1, 6)
        pats.append("".join(rng.choice(TOKENS) for _ in range(k)))
    # the probe protocol is line-based; newlines can't occur (no token
    # contains one) but keep the guard explicit for future edits
    return [p for p in pats if "\n" not in p and p]


def _cpp_results(probe_exe, patterns: list[str], subject: str, icase=False):
    """status+span per pattern from the real std::regex."""
    argv = [str(probe_exe), subject.encode().hex()]
    if icase:
        argv.append("icase")
    out = subprocess.run(
        argv,
        input="\n".join(patterns) + "\n",
        capture_output=True,
        text=True,
        check=True,
        timeout=120,
    ).stdout.splitlines()
    assert len(out) == len(patterns)
    res = []
    for line in out:
        status, detail, _pat = line.split("\t", 2)
        if status == "ERR":
            res.append(("reject", None))
        elif detail == "nomatch":
            res.append(("accept", None))
        else:  # match@P:lenL
            pos, ln = detail[6:].split(":len")
            res.append(("accept", (int(pos), int(pos) + int(ln))))
    return res


def _py_result(pattern: str, subject: str, icase=False):
    try:
        rx = compile_ecma(pattern, ignore_case=icase)
    except (EcmaRegexError, re.error):
        return ("reject", None)
    m = rx.search(subject)
    return ("accept", m.span() if m else None)


@pytest.mark.parametrize("icase", [False, True])
def test_differential_against_libstdcxx(probe, icase):
    patterns = _gen_patterns(3000)
    mismatches = []
    for subject in SUBJECTS:
        cpp = _cpp_results(probe, patterns, subject, icase=icase)
        for pat, want in zip(patterns, cpp):
            got = _py_result(pat, subject, icase=icase)
            if got != want:
                mismatches.append((pat, subject, want, got))
    assert not mismatches, (
        f"{len(mismatches)} divergences from libstdc++ std::regex "
        f"(icase={icase}); first 10: {mismatches[:10]}"
    )


def test_corpus_cases_against_libstdcxx(probe):
    """The hand-pinned corpus entries, re-verified against the real
    engine on every run (guards both the translator AND the corpus
    comments from drifting out of truth)."""
    cases = [
        "a*+ab", "a++b", "a{1,2}+", "a**", "(a)*+", "a*??",
        "\\012", "\\0", "\\08", "[\\012]", "[\\0]",
        "\\cA", "\\c8", "[\\cA]",
        "a{2,3}", "a{2,}", "x{0}", "a}b", "}",
        "[]a", "[^]", "[\\Z\\q]+", "\\q+", "x\\Z", "\\Ax",
        "(a)\\1", "(a|b)+", "(?:non)+", "[a-f0-9]+", "colou?r",
    ]
    subjects = ["aaab", "\x0012 a{x}", "cAAa Zq! x", "color colour 8"]
    for subject in subjects:
        cpp = _cpp_results(probe, cases, subject)
        for pat, want in zip(cases, cpp):
            got = _py_result(pat, subject)
            assert got == want, (pat, subject, want, got)
