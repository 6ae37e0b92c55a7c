"""Regex dialect unification: the three execution backends (Java rlike,
Python re, RE2/pyarrow) must agree with each other AND with ECMA-262
semantics for every supported `pattern` construct; reference-divergent
constructs are rejected at schema-compile time (the reference compiles
patterns to libfsm DFAs — src/ast.h:21-25 — which cannot express
backreferences/lookaround/word boundaries either)."""

import json

import pyarrow as pa
import pyarrow.compute as pc
import pytest
from pyspark.sql import functions as F

from jvst_spark.spec.redialect import (
    UnsupportedPattern,
    compile_python,
    translate,
)
from jvst_spark.spec.translate import SchemaError

# (pattern, text, expected ECMA-262 search verdict)
AGREEMENT_CASES = [
    # \d is ASCII in ECMA; Python re alone would match unicode digits
    (r"\d", "42", True),
    (r"\d", "٣٤", False),  # arabic-indic digits
    (r"\D", "7", False),
    (r"\D", "x7", True),
    # \w is ASCII
    (r"\w+", "abc_9", True),
    (r"^\w+$", "café", False),
    # \s is the ECMA whitespace set incl. NBSP; Java raw \s is ASCII
    (r"\s", " ", True),
    (r"^x\s$", "x\u2009", True),
    (r"\S", " \t", False),
    (r"[\s]", "\u3000", True),
    (r"[\d]", "5", True),
    (r"[\da-f]", "e", True),
    # $ is absolute end in ECMA; Python/Java raw $ match before \n
    (r"a$", "a\n", False),
    (r"a$", "a", True),
    (r"^b", "a\nb", False),
    # . excludes \n \r U+2028 U+2029 (ECMA); Python raw . allows \r
    (r"a.b", "axb", True),
    (r"a.b", "a\nb", False),
    (r"a.b", "a\rb", False),
    (r"a.b", "a\u2028b", False),
    (r"a.b", "a\x85b", True),  # NEL is NOT an ECMA line terminator
    # dangling brace is a literal in ECMA; Java raw would throw
    (r"a{", "za{x", True),
    (r"a{2}", "aa", True),
    (r"a{2,}", "a", False),
    (r"a{2,3}?", "aaa", True),
    # class quirks: [ and & are literals inside an ECMA class; Java raw
    # would nest/intersect
    (r"[a[]", "[", True),
    (r"[a&b]", "&", True),
    (r"[a&b]", "c", False),
    # escapes
    (r"a\.b", "a.b", True),
    (r"a\.b", "axb", False),
    (r"\x41", "A", True),
    (r"é", "café", True),
    (r"[\b]", "\x08", True),  # backspace inside a class
    (r"\0", "a\x00b", True),
    # groups / alternation / lazy
    (r"(?:ab)+c", "ababc", True),
    (r"(?<g>ab)+", "abab", True),
    (r"a|b{2}", "bb", True),
    (r"a+?", "aa", True),
    # anchors inside alternation
    (r"^a|b$", "xb", True),
    (r"^a|b$", "xb\n", False),
    # unicode literal passthrough
    (r"^[а-я]+$", "дом", True),
    # shorthand expansions must not glue onto a neighboring '-'
    (r"[\w-.]", "-", True),
    (r"[\w-.]", ",", False),
    (r"[a-\d]", "-", True),
    (r"[a-\d]", "5", True),
    (r"[a-\d]", "b", False),
    (r"[--0]", ".", True),  # genuine range '-'..'0'
    (r"[--0]", "a", False),
    (r"[a-z-x]", "-", True),
    # surrogate pair = one astral code point on every engine
    ("\\uD83D\\uDE00", "x\U0001F600y", True),
    ("\\uD83D\\uDE00", "xy", False),
    # named group with '_' (Java would reject the name; rendered (?:)
    (r"(?<my_name>ab)+", "abab", True),
]

REJECTED = [
    r"(?=x)", r"(?!x)", r"(?<=x)y", r"(?<!x)y",  # lookaround
    r"(a)\1",  # backreference
    r"\k<g>",  # named backref
    r"a\b", r"\Bx",  # word boundaries
    r"\p{L}", r"\P{N}",  # property escapes
    r"\cJ",  # control escape
    r"[a-z",  # unterminated class
    r"a**", r"a*+", r"*a", r"+",  # bad quantifiers
    r"(?i)x",  # inline flags (not ECMA)
    r"(a", r"a)",  # unbalanced groups
    r"[]a]", r"[^]",  # leading-] / empty-class divergence
    r"\q",  # unknown escape
    r"a{3,1}",  # reversed bounds
    "a\\",  # trailing backslash
    r"[\D]",  # negated shorthand inside class
    r"[z-a]",  # reversed class range
    "\\uD83Dx", "\\uDE00",  # lone surrogates
]


class TestEcmaAgreement:
    def test_python_engine_matches_ecma(self):
        for pat, text, want in AGREEMENT_CASES:
            got = compile_python(pat).search(text) is not None
            assert got == want, (pat, text, want)

    def test_re2_engine_matches_ecma(self):
        for pat, text, want in AGREEMENT_CASES:
            r = translate(pat, "re2")
            got = pc.match_substring_regex(
                pa.array([text], type=pa.string()), r
            )[0].as_py()
            assert got == want, (pat, r, text, want)

    def test_java_engine_matches_ecma(self, spark):
        rows = [(i, t) for i, (_, t, _) in enumerate(AGREEMENT_CASES)]
        df = spark.createDataFrame(rows, "id int, t string")
        sel = [
            F.coalesce(
                F.col("t").rlike(translate(p, "java")), F.lit(False)
            ).alias(f"m{i}")
            for i, (p, _, _) in enumerate(AGREEMENT_CASES)
        ]
        got = {
            r["id"]: r for r in df.select("id", *sel).collect()
        }
        for i, (pat, text, want) in enumerate(AGREEMENT_CASES):
            assert got[i][f"m{i}"] == want, (pat, text, want)


class TestRejection:
    @pytest.mark.parametrize("pat", REJECTED)
    def test_rejected_at_translate(self, pat):
        with pytest.raises(UnsupportedPattern):
            translate(pat, "java")

    def test_rejected_at_schema_compile(self):
        from jvst_spark.compiler.plan import compile_schema

        with pytest.raises(SchemaError, match="unsupported regex"):
            compile_schema({"type": "string", "pattern": r"(?=x)"})
        with pytest.raises(SchemaError, match="unsupported regex"):
            compile_schema(
                {"patternProperties": {r"(a)\1": {"type": "string"}}}
            )


class TestFuzzPythonVsRe2:
    """Property fuzz: random patterns from the SUPPORTED construct
    grammar, random probe strings (including delimiter/unicode
    hostiles) — the Python and RE2 renderings must agree on every
    (pattern, probe)."""

    def test_fuzz(self):
        from hypothesis import given, settings, strategies as st

        atom = st.one_of(
            st.sampled_from(
                ["a", "b", "7", ".", r"\d", r"\w", r"\s", r"\D", r"\W",
                 r"\S", "[ab0-9]", "[^xy]", r"[\da-f]", r"\.", r"\[",
                 "é", r"\x41", r"é"]
            ),
        )
        quant = st.sampled_from(["", "*", "+", "?", "{2}", "{1,3}", "*?"])
        piece = st.tuples(atom, quant).map(lambda t: t[0] + t[1])
        seq = st.lists(piece, min_size=1, max_size=4).map("".join)
        pattern = st.one_of(
            seq,
            st.tuples(seq, seq).map(lambda t: f"{t[0]}|{t[1]}"),
            seq.map(lambda s: f"^{s}$"),
            seq.map(lambda s: f"(?:{s})+"),
        )
        probe = st.text(
            alphabet="ab7xyé .,\n\r\t[]{}\\d-", max_size=8
        )

        @settings(max_examples=400, deadline=None)
        @given(pat=pattern, text=probe)
        def check(pat, text):
            py = compile_python(pat).search(text) is not None
            r2 = pc.match_substring_regex(
                pa.array([text], type=pa.string()), translate(pat, "re2")
            )[0].as_py()
            assert py == r2, (pat, text)

        check()


class TestBackendParityOnConformancePatterns:
    """Every pattern in the conformance corpus renders and the three
    engines agree on a hostile probe set of strings."""

    PROBES = [
        "", "a", "ab", "foo", "element7", "item12", "bar",
        "a\n", "\na", "x7", "42", "٣", "café",
        "дом", "a b", "the quick brown fox", "a{",
        "[", "]", "a.b", "a\u2028b", "AAA", "aaa",
    ]

    def _corpus_patterns(self):
        import glob
        import os

        pats = set()
        fixture_dir = os.path.join(
            os.path.dirname(__file__), "fixtures", "conformance"
        )

        def walk(s):
            if isinstance(s, dict):
                if "pattern" in s and isinstance(s["pattern"], str):
                    pats.add(s["pattern"])
                for k, v in s.items():
                    if k == "patternProperties" and isinstance(v, dict):
                        pats.update(v.keys())
                    walk(v)
            elif isinstance(s, list):
                for v in s:
                    walk(v)

        for path in glob.glob(os.path.join(fixture_dir, "*.json")):
            with open(path) as f:
                walk(json.load(f))
        return sorted(pats)

    def test_python_vs_re2_on_corpus(self):
        pats = self._corpus_patterns()
        assert pats
        for pat in pats:
            py = compile_python(pat)
            r2 = translate(pat, "re2")
            for probe in self.PROBES:
                a = py.search(probe) is not None
                b = pc.match_substring_regex(
                    pa.array([probe], type=pa.string()), r2
                )[0].as_py()
                assert a == b, (pat, probe)

    def test_python_vs_java_on_corpus(self, spark):
        pats = self._corpus_patterns()
        df = spark.createDataFrame(
            [(p,) for p in self.PROBES], "t string"
        )
        for pat in pats:
            py = compile_python(pat)
            jv = translate(pat, "java")
            got = [
                (r["t"], r["m"])
                for r in df.select(
                    "t",
                    F.coalesce(F.col("t").rlike(jv), F.lit(False)).alias("m"),
                ).collect()
            ]
            for probe, m in got:
                assert m == (py.search(probe) is not None), (pat, probe)
