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
    # injectivity under delimiter-bearing content (round-2 fix): the
    # reference memcmps length-prefixed buffers (validate_uniq.c:83-87)
    # and cannot be confused by strings containing the serializer's own
    # delimiters
    ([["x,s:y"], ["x", "y"]], True, "comma/tag injection in nested strings"),
    ([{"x": "y=s:z"}, {"x=s:y": "z"}], True, "key containing '=' delimiter"),
    ([{"a,s1:b": 1}, {"a": 1, "s1:b": 1}], True, "key containing ','"),
    (["s1:x", "s4:s1:x"], True, "string that looks like a tagged string"),
    ([[1, "2"], [1, 2]], True, "string digits vs number"),
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


def test_canonical_huge_int_no_crash():
    """ints beyond double range collapse to +/-inf (the reference's
    doubles) instead of raising OverflowError inside the UDF."""
    assert canonicalize(10**400) == canonicalize(float("inf"))
    assert canonicalize(-(10**400)) == canonicalize(float("-inf"))
    assert canonicalize(10**400) != canonicalize(-(10**400))


def _uem_equal(a, b) -> bool:
    """Reference-independent UEM equality (numbers as doubles with
    -0.0/0.0 distinct, sorted keys, ordered arrays) used to check that
    canonicalize is injective up to this relation."""
    import math
    import struct

    ta, tb = type(a) is bool, type(b) is bool
    if ta or tb:
        return ta and tb and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        try:
            da = float(a)
        except OverflowError:
            da = math.inf if a > 0 else -math.inf
        try:
            db = float(b)
        except OverflowError:
            db = math.inf if b > 0 else -math.inf
        return struct.pack("d", da) == struct.pack("d", db)
    if type(a) is not type(b):
        return False
    if isinstance(a, list):
        return len(a) == len(b) and all(
            _uem_equal(x, y) for x, y in zip(a, b)
        )
    if isinstance(a, dict):
        if sorted(a) != sorted(b):
            return False
        return all(_uem_equal(a[k], b[k]) for k in a)
    return a == b


def test_canonical_injective_property():
    from hypothesis import given, settings, strategies as st

    hostile = st.text(
        alphabet="ab,=:sn[]{}0123456789.", max_size=8
    )
    scalar = st.one_of(
        st.none(), st.booleans(),
        st.integers(-5, 5), st.floats(-5, 5, allow_nan=False), hostile,
    )
    value = st.recursive(
        scalar,
        lambda inner: st.one_of(
            st.lists(inner, max_size=3),
            st.dictionaries(hostile, inner, max_size=3),
        ),
        max_leaves=8,
    )

    @settings(max_examples=500, deadline=None)
    @given(a=value, b=value)
    def check(a, b):
        assert (canonicalize(a) == canonicalize(b)) == _uem_equal(a, b), (a, b)

    check()
