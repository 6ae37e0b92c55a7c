"""Property-based compiler-stage equivalence.

The reference tests each compiler stage against golden trees
(tests/unit/test_constraints.c); goldens catch regressions but not
semantic drift. These properties assert the stronger invariant: for
random schemas and random documents, every stage preserves verdicts —
    eval(translate(s)) == eval(simplify(translate(s)))
                       == eval(canonify(translate(s)))
(the reference has no property-based layer — SURVEY.md §5 point 4;
this is our addition.)
"""

from hypothesis import given, settings, strategies as st

from jvst_spark.compiler.pyeval import compile_explain, compile_python
from jvst_spark.spec.canonify import canonify
from jvst_spark.spec.simplify import simplify
from jvst_spark.spec.translate import translate_with_defs

# ---- random JSON documents ----

json_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-100, max_value=100),
    st.floats(min_value=-100, max_value=100, allow_nan=False),
    # alphabet includes the canonical serializer's own delimiters so the
    # equivalence properties exercise injectivity (round-2 fix)
    st.text(alphabet="abcxyz0123456789,=:s[]{}.", max_size=8),
)

json_value = st.recursive(
    json_scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(
            st.text(alphabet="abkxy,=:", min_size=1, max_size=3), inner, max_size=4
        ),
    ),
    max_leaves=12,
)

# ---- random schemas from the draft-6 keyword grammar ----

_types = st.sampled_from(
    ["null", "boolean", "integer", "number", "string", "array", "object"]
)


def _schema(depth: int) -> st.SearchStrategy:
    base = st.fixed_dictionaries(
        {},
        optional={
            "type": st.one_of(_types, st.lists(_types, min_size=1, max_size=3)),
            "minimum": st.integers(-50, 50),
            "maximum": st.integers(-50, 50),
            "exclusiveMinimum": st.integers(-50, 50),
            "exclusiveMaximum": st.integers(-50, 50),
            "multipleOf": st.sampled_from([0.5, 1, 2, 3, 0.1]),
            "minLength": st.integers(0, 5),
            "maxLength": st.integers(0, 8),
            "pattern": st.sampled_from(["^a", "x$", "[0-9]+", "a.c"]),
            "minItems": st.integers(0, 3),
            "maxItems": st.integers(0, 5),
            "uniqueItems": st.booleans(),
            "minProperties": st.integers(0, 3),
            "maxProperties": st.integers(0, 4),
            "required": st.lists(
                st.sampled_from(["a", "b", "k"]), max_size=2
            ),
            "enum": st.lists(json_scalar, min_size=1, max_size=4),
        },
    )
    if depth <= 0:
        return st.one_of(st.booleans(), base)

    sub = _schema(depth - 1)
    rich = st.fixed_dictionaries(
        {},
        optional={
            "type": st.one_of(_types, st.lists(_types, min_size=1, max_size=3)),
            "items": st.one_of(sub, st.lists(sub, min_size=1, max_size=2)),
            "additionalItems": sub,
            "contains": sub,
            "properties": st.dictionaries(
                st.sampled_from(["a", "b", "k"]), sub, max_size=2
            ),
            "patternProperties": st.dictionaries(
                st.sampled_from(["^a", "b$"]), sub, max_size=1
            ),
            "additionalProperties": sub,
            "propertyNames": st.fixed_dictionaries(
                {}, optional={"maxLength": st.integers(0, 4),
                              "pattern": st.sampled_from(["^a", "b"])}
            ),
            "dependencies": st.dictionaries(
                st.sampled_from(["a", "b"]),
                st.one_of(st.lists(st.sampled_from(["a", "k"]), max_size=2), sub),
                max_size=1,
            ),
            "allOf": st.lists(sub, min_size=1, max_size=3),
            "anyOf": st.lists(sub, min_size=1, max_size=3),
            "oneOf": st.lists(sub, min_size=1, max_size=3),
            "not": sub,
            "minimum": st.integers(-50, 50),
            "maximum": st.integers(-50, 50),
            "minLength": st.integers(0, 5),
            "required": st.lists(st.sampled_from(["a", "b"]), max_size=2),
        },
    )
    return st.one_of(st.booleans(), base, rich)


schemas = _schema(2)


@settings(max_examples=300, deadline=None)
@given(schema=schemas, doc=json_value)
def test_stage_equivalence(schema, doc):
    root, defs = translate_with_defs(schema)
    v0 = compile_python(root, defs)(doc)
    s = simplify(root)
    sdefs = {u: simplify(n) for u, n in defs.items()}
    v1 = compile_python(s, sdefs)(doc)
    c = canonify(root)
    cdefs = {u: canonify(n) for u, n in defs.items()}
    v2 = compile_python(c, cdefs)(doc)
    assert v0 == v1 == v2, (schema, doc, v0, v1, v2)


@settings(max_examples=200, deadline=None)
@given(schema=schemas, doc=json_value)
def test_explain_agrees_with_verdict(schema, doc):
    root, defs = translate_with_defs(schema)
    c = canonify(root)
    cdefs = {u: canonify(n) for u, n in defs.items()}
    ok = compile_python(c, cdefs)(doc)
    violations = compile_explain(c, cdefs)(doc)
    assert (len(violations) == 0) == ok


@settings(max_examples=200, deadline=None)
@given(schema=schemas)
def test_canonify_idempotent(schema):
    root, _ = translate_with_defs(schema)
    c = canonify(root)
    assert canonify(c) == c
