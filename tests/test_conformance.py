"""Conformance: (schema, document, expected-verdict) triplets through the
compiled Python evaluator.

Mirrors the reference's end-to-end runner semantics
(tests/jvst/runtests.sh:33-97: compile schema, run document, compare
verdict against the _valid/_invalid filename suffix). Corpus =
vendored custom suites (103 docs) + hand-written draft-6 families.
The Spark-side batched run of the SAME corpus lives in
test_spark_validation.py.
"""

import pytest

from jvst_spark.compiler.plan import compile_schema
from jvst_spark.compiler.pyeval import compile_explain, compile_python
from tests.conftest import CONFORMANCE_CASES


@pytest.mark.parametrize(
    "suite,schema,desc,doc,expected",
    CONFORMANCE_CASES,
    ids=[f"{s}::{d}" for s, _, d, _, _ in CONFORMANCE_CASES],
)
def test_conformance_pyeval(suite, schema, desc, doc, expected):
    spec = compile_schema(schema)
    validator = compile_python(spec.root, spec.defs)
    assert validator(doc) == expected, f"{suite} :: {desc}"


@pytest.mark.parametrize(
    "suite,schema,desc,doc,expected",
    CONFORMANCE_CASES,
    ids=[f"{s}::{d}" for s, _, d, _, _ in CONFORMANCE_CASES],
)
def test_conformance_explain_agrees(suite, schema, desc, doc, expected):
    """explain() must agree with the fast verdict: empty <=> valid."""
    spec = compile_schema(schema)
    explainer = compile_explain(spec.root, spec.defs)
    violations = explainer(doc)
    assert (len(violations) == 0) == expected, f"{suite} :: {desc} -> {violations}"
    for code, path in violations:
        assert isinstance(code, int) and code > 0
        assert path.startswith("$")
