"""Canonical-serialization (UEM) equivalence tests.

FIXTURES.md §4 table, derived from the reference's Unique Evaluation
Machine semantics (src/validate_uniq.c:219-355,
tests/unit/test_uniq.c:19-111): type-tagged bytes, sorted object keys,
order-preserving arrays, numbers as doubles.
"""

import pytest

from jvst_spark.compiler.pyeval import compile_python
from jvst_spark.spec.nodes import ArrUnique, canonicalize

UEM_CASES = [
    ([1, 2, 3], True, "distinct ints"),
    ([1, 1.0], False, "numbers are doubles; 1 == 1.0"),
    ([{"a": 1, "b": 2}, {"b": 2, "a": 1}], False, "object keys sorted"),
    ([[1, 2], [2, 1]], True, "array order preserved"),
    (["a", "a "], True, "length-aware string compare"),
    ([True, 1], True, "type tag differs: bool vs number"),
    ([[], {}], True, "type tag differs: array vs object"),
    ([{"a": [1]}, {"a": [1]}], False, "nested canonicalization"),
    ([None, False], True, "null vs false"),
    # the reference memcpy's raw double bytes (number_entry,
    # src/validate_uniq.c:158-178): -0.0 and 0.0 differ bitwise
    ([0, -0.0], True, "0 vs -0.0 distinct bit patterns"),
]


@pytest.mark.parametrize(
    "arr,unique,why", UEM_CASES, ids=[c[2] for c in UEM_CASES]
)
def test_uem_uniqueness(arr, unique, why):
    v = compile_python(ArrUnique())
    assert v(arr) == unique, why


def test_canonical_tags_disjoint():
    vals = [None, True, False, 0, 1, "", "1", [], {}, [1], {"a": 1}]
    canons = [canonicalize(v) for v in vals]
    assert len(set(canons)) == len(vals)


def test_canonical_number_unification():
    assert canonicalize(1) == canonicalize(1.0)
    assert canonicalize({"a": 1}) == canonicalize({"a": 1.0})
    assert canonicalize([2]) == canonicalize([2.0])
