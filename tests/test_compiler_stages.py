"""Golden-tree tests for translate/simplify/canonify.

The analogue of the reference's test_constraints.c (golden cnode trees
per compiler stage, tests/unit/test_constraints.c:104-174), with the
node constructors playing the role of its newcnode_* DSL
(tests/unit/validate_testing.c).
"""

import pytest

from jvst_spark import errors as E
from jvst_spark.spec.canonify import canonify
from jvst_spark.spec.nodes import (
    And,
    ArrContains,
    ArrItems,
    ArrUnique,
    EnumMatch,
    Invalid,
    ItemRange,
    Not,
    NumInteger,
    NumMultipleOf,
    NumRange,
    ObjPropSet,
    ObjRequired,
    Or,
    PropRange,
    StrLength,
    StrMatch,
    Switch,
    Valid,
    Xor,
)
from jvst_spark.spec.simplify import simplify
from jvst_spark.spec.translate import SchemaError, translate, translate_with_defs


def sw(**arms):
    return Switch.of(**arms)


class TestTranslate:
    def test_empty_schema_is_valid(self):
        assert translate({}) == Valid()
        assert translate(True) == Valid()

    def test_false_schema_is_invalid(self):
        assert translate(False) == Invalid()

    def test_type_number(self):
        assert translate({"type": "number"}) == sw(number=Valid())

    def test_type_union(self):
        assert translate({"type": ["object", "string"]}) == sw(
            object=Valid(), string=Valid()
        )

    def test_type_integer(self):
        assert translate({"type": "integer"}) == sw(number=NumInteger())

    def test_number_range(self):
        got = translate({"type": "number", "minimum": 1, "maximum": 5})
        assert got == sw(number=NumRange(1.0, 5.0, False, False))

    def test_exclusive_bounds(self):
        got = translate({"exclusiveMinimum": 2})
        # untyped: range applies in the number arm, other arms stay valid
        expect = Switch.of(
            null=Valid(), boolean=Valid(),
            number=NumRange(2.0, None, True, False),
            string=Valid(), array=Valid(), object=Valid(),
        )
        assert got == expect

    def test_multiple_of(self):
        got = translate({"type": "number", "multipleOf": 2})
        assert got == sw(number=NumMultipleOf(2.0))

    def test_string_constraints(self):
        got = translate(
            {"type": "string", "minLength": 2, "maxLength": 5, "pattern": "a"}
        )
        assert got == sw(string=And((StrLength(2, 5), StrMatch("a"))))

    def test_required(self):
        got = translate({"type": "object", "required": ["b", "a", "b"]})
        assert got == sw(object=ObjRequired(("a", "b")))

    def test_dependencies_property_form_desugar(self):
        # jvst desugars to OR(REQUIRED{K,D}, NOT-REQUIRED{K})
        # (src/validate_constraints.c:1556-1593)
        got = translate({"type": "object", "dependencies": {"bar": ["foo"]}})
        assert got == sw(
            object=Or(
                (ObjRequired(("bar", "foo")), Not(ObjRequired(("bar",))))
            )
        )

    def test_items_single_form_stored_as_additional(self):
        got = translate({"type": "array", "items": {"type": "number"}})
        assert got == sw(array=ArrItems((), sw(number=Valid())))

    def test_items_positional(self):
        got = translate({"type": "array", "items": [{"type": "number"}],
                         "additionalItems": False})
        assert got == sw(array=ArrItems((sw(number=Valid()),), Invalid()))

    def test_contains_unique_ranges(self):
        got = translate(
            {"type": "array", "contains": {"type": "number"},
             "minItems": 1, "maxItems": 9, "uniqueItems": True}
        )
        assert got == sw(
            array=And(
                (ArrItems((), Valid()),) * 0
                + (
                    ArrContains(sw(number=Valid())),
                    ItemRange(1, 9),
                    ArrUnique(),
                )
            )
        )

    def test_enum_dedupes_on_canonical_form(self):
        got = translate({"enum": [1, 1.0, "x"]})
        assert isinstance(got, EnumMatch)
        assert got.canon_values == ("n:1.0", "s1:x")

    def test_const(self):
        got = translate({"const": {"b": 2, "a": 1}})
        assert got == EnumMatch(
            ("o{s1:a=n:1.0,s1:b=n:2.0}",), ('{"b": 2, "a": 1}',)
        )

    def test_combinators(self):
        got = translate({"anyOf": [{"type": "string"}, {"type": "number"}]})
        assert got == Or((sw(string=Valid()), sw(number=Valid())))
        got = translate({"oneOf": [True, False]})
        assert got == Xor((Valid(), Invalid()))
        got = translate({"not": {"type": "null"}})
        assert got == Not(sw(null=Valid()))

    def test_ref_inlined_when_acyclic(self):
        got = translate(
            {"definitions": {"p": {"type": "number"}},
             "$ref": "#/definitions/p"}
        )
        assert got == sw(number=Valid())

    def test_ref_cycle_collected_as_def(self):
        root, defs = translate_with_defs(
            {"definitions": {"t": {"properties": {"n": {"$ref": "#/definitions/t"}}}},
             "$ref": "#/definitions/t"}
        )
        assert "#/definitions/t" in defs

    def test_bad_schema_raises(self):
        with pytest.raises(SchemaError):
            translate({"type": "frobnicate"})
        with pytest.raises(SchemaError):
            translate({"multipleOf": 0})
        with pytest.raises(SchemaError):
            translate({"$ref": "http://elsewhere/schema"})

    def test_count_keywords_reject_negatives(self):
        """The reference's parser rejects negative counts for every
        count keyword ('expected > 0', parser.act <set-min-items> etc.)
        and truncates fractional values through a C integer cast."""
        for kw in ("minLength", "maxLength", "minItems", "maxItems",
                   "minProperties", "maxProperties"):
            with pytest.raises(SchemaError):
                translate({kw: -1})
            with pytest.raises(SchemaError):
                translate({kw: True})  # grammar takes a :number token
            translate({kw: 0})       # zero is fine
            translate({kw: 2.5})     # truncates like (ast_count)n

    def test_keyword_value_types_enforced(self):
        """The reference's typed grammar (parser.act) takes :number /
        :string / :bool tokens per keyword — coercion is a parse
        error, not a conversion."""
        for sch in (
            {"minimum": True}, {"exclusiveMinimum": True},
            {"multipleOf": "2"}, {"pattern": 5},
            {"uniqueItems": "yes"}, {"properties": []},
            {"patternProperties": 3},
        ):
            with pytest.raises(SchemaError):
                translate(sch)
        # valid shapes still compile
        translate({"minimum": 5, "pattern": "^a", "uniqueItems": False,
                   "properties": {}})
        for sch in (
            {"dependencies": {"a": [1]}}, {"additionalItems": []},
            {"definitions": 5}, {"items": {}, "additionalItems": 3},
        ):
            with pytest.raises(SchemaError):
                translate(sch)
        translate({"dependencies": {"a": ["b"]}})
        translate({"items": [{}], "additionalItems": False})

    def test_required_entries_must_be_strings(self):
        # <add-required-property> takes a :string token
        with pytest.raises(SchemaError):
            translate({"required": [1]})
        with pytest.raises(SchemaError):
            translate({"required": ["ok", None]})


class TestSimplify:
    def test_and_short_circuit(self):
        assert simplify(And((Valid(), Valid()))) == Valid()
        assert simplify(And((Valid(), Invalid(3)))) == Invalid(3)
        assert simplify(And((StrMatch("a"), Valid()))) == StrMatch("a")

    def test_or_short_circuit(self):
        assert simplify(Or((Invalid(), Valid()))) == Valid()
        assert simplify(Or((Invalid(), StrMatch("a")))) == StrMatch("a")

    def test_flatten_nested(self):
        got = simplify(And((And((StrMatch("a"), StrMatch("b"))), StrMatch("c"))))
        assert got == And((StrMatch("a"), StrMatch("b"), StrMatch("c")))

    def test_dedupe(self):
        assert simplify(And((StrMatch("a"), StrMatch("a")))) == StrMatch("a")

    def test_switch_merge_under_and(self):
        # AND'd switches merge arm-wise
        # (cnode_simplify_andor_switches, src/validate_constraints.c:2182)
        a = Switch.of(string=StrLength(5, None))
        b = Switch.of(string=StrLength(0, 16))
        assert simplify(And((a, b))) == Switch.of(string=StrLength(5, 16))

    def test_switch_merge_under_or(self):
        a = Switch.of(string=Valid())
        b = Switch.of(number=Valid())
        assert simplify(Or((a, b))) == Switch.of(string=Valid(), number=Valid())

    def test_num_range_intersection(self):
        got = simplify(And((NumRange(1, None), NumRange(None, 5), NumRange(2, 7))))
        assert got == NumRange(2.0, 5.0, False, False)

    def test_empty_range_is_invalid(self):
        assert simplify(And((NumRange(5, None), NumRange(None, 1)))) == Invalid(
            E.INVALID_NUMBER
        )
        assert simplify(StrLength(5, 2)) == Invalid(E.INVALID_STRING)

    def test_or_range_coalesce(self):
        got = simplify(Or((NumRange(0, 5), NumRange(3, 9))))
        assert got == NumRange(0.0, 9.0, False, False)
        got = simplify(Or((NumRange(None, 0), NumRange(0, None))))
        assert got == Valid()

    def test_required_union(self):
        got = simplify(And((ObjRequired(("a", "b")), ObjRequired(("b", "c")))))
        assert got == ObjRequired(("a", "b", "c"))

    def test_unique_dedup(self):
        assert simplify(And((ArrUnique(), ArrUnique()))) == ArrUnique()

    def test_items_merge_positionwise(self):
        # cnode_simplify_and_items (src/validate_constraints.c:4034-4197):
        # the FIXTURES.md allOf/1 shape
        a = ArrItems((StrLength(6, None),), Valid())
        b = ArrItems((StrLength(0, 12), NumRange(None, 100)), Valid())
        got = simplify(And((a, b)))
        assert got == ArrItems(
            (StrLength(6, 12), NumRange(None, 100.0, False, False)), Valid()
        )

    def test_propset_merge(self):
        a = ObjPropSet((("x", StrMatch("a")),), (), Valid())
        b = ObjPropSet((("x", StrLength(1, None)), ("y", Valid())), (), Invalid())
        got = simplify(And((a, b)))
        assert got == ObjPropSet(
            (
                ("x", And((StrLength(1, None), StrMatch("a")))),
                ("y", Valid()),
            ),
            (),
            Invalid(),
        )

    def test_not_pushdown(self):
        assert simplify(Not(Valid())) == Invalid(E.INVALID_SPLIT_CONDITION)
        assert simplify(Not(Invalid())) == Valid()
        assert simplify(Not(Not(StrMatch("a")))) == StrMatch("a")
        got = simplify(Not(Switch.of(string=Valid())))
        inv = Invalid(E.INVALID_SPLIT_CONDITION)
        assert got == Switch(
            (("null", Valid()), ("boolean", Valid()), ("number", Valid()),
             ("string", inv), ("array", Valid()), ("object", Valid()))
        )

    def test_xor_degenerate(self):
        assert simplify(Xor((Invalid(), StrMatch("a")))) == StrMatch("a")
        assert simplify(Xor((Valid(), Valid()))) == Invalid(
            E.INVALID_SPLIT_CONDITION
        )
        got = simplify(Xor((Valid(), StrMatch("a"))))
        assert got == Not(StrMatch("a"))

    def test_enum_set_algebra(self):
        a = EnumMatch(("n:1.0", "s:x"), ("1", '"x"'))
        b = EnumMatch(("s:x", "s:y"), ('"x"', '"y"'))
        assert simplify(And((a, b))) == EnumMatch(("s:x",), ('"x"',))
        assert simplify(Or((a, b))) == EnumMatch(
            ("n:1.0", "s:x", "s:y"), ("1", '"x"', '"y"')
        )
        assert simplify(And((a, EnumMatch(("s:z",), ('"z"',))))) == Invalid(
            E.INVALID_MATCH_CASE
        )


class TestCanonify:
    def test_deterministic_order(self):
        a = And((StrMatch("b"), StrLength(1, None), StrMatch("a")))
        got = canonify(a)
        assert got == And((StrLength(1, None), StrMatch("a"), StrMatch("b")))

    def test_canonify_is_idempotent(self):
        schemas = [
            {"allOf": [{"type": "string", "minLength": 5},
                       {"type": "string", "maxLength": 16},
                       {"type": "string", "pattern": ".*foo.*"}]},
            {"type": ["object", "string"], "required": ["a"], "minLength": 2},
            {"oneOf": [{"type": "integer"}, {"minimum": 2}]},
        ]
        for s in schemas:
            c1 = canonify(translate(s))
            assert canonify(c1) == c1

    def test_fixture_allof_merges_to_single_switch(self):
        # FIXTURES.md representative schema: three string switches fuse
        got = canonify(
            translate(
                {"allOf": [
                    {"type": "string", "minLength": 5},
                    {"type": "string", "maxLength": 16},
                    {"type": "string", "pattern": ".*foo.*"},
                ]}
            )
        )
        assert got == Switch.of(
            string=And((StrLength(5, 16), StrMatch(".*foo.*")))
        )


class TestAdversarialRefGraphs:
    """Round-4 (review finding): diamond-shaped ref DAGs — each def
    referencing the previous twice — must compile in bounded time.
    translate memoizes ref-target translation and keeps LARGE targets
    as named defs instead of inlining (every engine walks trees per
    path, so unbounded inlining is exponential); pyeval compiles defs
    once via memoized closures, and the variant fast path's own
    inlining budget falls back honestly."""

    def _diamond(self, depth, via):
        schema = {"definitions": {}, "$ref": f"#/definitions/d{depth-1}"}
        for i in range(1, depth):
            prev = f"#/definitions/d{i-1}"
            if via == "allOf":
                schema["definitions"][f"d{i}"] = {
                    "allOf": [{"$ref": prev}, {"$ref": prev}]
                }
            else:
                schema["definitions"][f"d{i}"] = {
                    "properties": {"l": {"$ref": prev}, "r": {"$ref": prev}}
                }
        schema["definitions"]["d0"] = {"type": "integer"}
        return schema

    @pytest.mark.parametrize("via", ["allOf", "props"])
    def test_diamond_refs_compile_in_bounded_time(self, via):
        import time

        from jvst_spark.compiler.plan import compile_schema
        from jvst_spark.compiler.pyeval import compile_python

        t0 = time.perf_counter()
        spec = compile_schema(self._diamond(24, via))
        pyv = compile_python(spec.root, spec.defs)
        took = time.perf_counter() - t0
        assert took < 10, f"{via} diamond took {took:.1f}s"
        # semantics survive the def-cut
        if via == "allOf":
            # the conjunction collapses to d0: type integer
            assert pyv(3) and not pyv("x")
        else:
            # a deep all-l chain ends at d0; non-integer leaf invalid
            doc = cur = {}
            for _ in range(22):
                cur["l"] = {}
                cur = cur["l"]
            cur["l"] = "not an int"
            assert not pyv(doc)
            cur["l"] = 3
            assert pyv(doc)

    def test_large_ref_targets_become_defs_not_inlined(self):
        from jvst_spark.compiler.plan import compile_schema

        spec = compile_schema(self._diamond(20, "props"))
        assert spec.defs, "large shared targets should stay as named defs"
