"""Arrow-kernel backend: parity with the Column path and pyeval."""

import pyarrow as pa
import pytest
from pyspark.sql.types import StructType

from jvst_spark.compiler.arrow_backend import (
    Unsupported,
    _Compiler,
    arrow_verdicts,
    supports,
)
from jvst_spark.compiler.plan import ValidationPlan, compile_schema
from jvst_spark.compiler.pyeval import compile_python
from jvst_spark.io.spans import FLAGSHIP_SPEC, spans_from_documents
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def spans_df(spark):
    return spans_from_documents(spark, SF_DIR).cache()


class TestArrowFlagship:
    def test_supports_flagship(self, spans_df):
        plan = ValidationPlan(compile_schema(FLAGSHIP_SPEC))
        rt = StructType([spans_df.schema[c] for c in spans_df.columns])
        assert supports(plan.spec.root, rt, plan.spec.defs)

    def test_verdict_parity_with_column_path(self, spark, spans_df):
        plan = ValidationPlan(compile_schema(FLAGSHIP_SPEC))
        av = {r["doc_id"]: r["valid"] for r in arrow_verdicts(plan, spans_df).collect()}
        cv = {
            r["doc_id"]: r["valid"]
            for r in plan.apply_typed(spans_df).verdicts().collect()
        }
        assert av == cv and len(av) == 500


class TestArrowKernelsDirect:
    """Evaluate kernels directly on pyarrow arrays vs pyeval (no Spark
    round-trip) — fast, covers edge semantics."""

    def check(self, schema, dtype, values, py_values=None):
        from pyspark.sql.types import _parse_datatype_string

        spec = compile_schema(schema)
        dt = _parse_datatype_string(dtype)
        comp = _Compiler(spec.defs)
        ev = comp.compile(spec.root, dt)
        arr = pa.array(values)
        got = list(ev(arr))
        pyv = compile_python(spec.root, spec.defs)
        expect = [pyv(v) for v in (py_values or values)]
        assert got == expect, (schema, values, got, expect)

    def test_num_range(self):
        self.check({"minimum": 2, "exclusiveMaximum": 5}, "double",
                   [1.0, 2.0, 4.9, 5.0, None])

    def test_integer_predicate(self):
        self.check({"type": "integer"}, "double",
                   [1.0, 1.5, -3.0, float("inf"), None])

    def test_multiple_of_division_semantics(self):
        self.check({"multipleOf": 0.01}, "double", [0.07, 0.05, 1.0])

    def test_pattern_and_length(self):
        self.check({"type": "string", "pattern": "^a", "minLength": 2},
                   "string", ["ab", "a", "ba", None])

    def test_enum_scalar(self):
        self.check({"enum": [1, "x", True]}, "string", ["x", "y", None])
        self.check({"enum": [1, "x"]}, "double", [1.0, 2.0])

    def test_struct_required_and_props(self):
        schema = {"type": "object", "required": ["a"],
                  "properties": {"a": {"type": "integer", "minimum": 0},
                                 "b": {"type": "string"}}}
        vals = [{"a": 1, "b": "x"}, {"a": -1, "b": "x"}, {"b": "x"},
                {"a": 3, "b": None}]
        py = [{"a": 1, "b": "x"}, {"a": -1, "b": "x"}, {"b": "x"},
              {"a": 3}]  # null field = absent
        self.check(schema, "struct<a:bigint,b:string>", vals, py)

    def test_array_items_contains_range(self):
        schema = {"type": "array", "items": {"minimum": 0},
                  "contains": {"minimum": 10}, "minItems": 1}
        self.check(schema, "array<double>",
                   [[1.0, 12.0], [1.0, 2.0], [], [-1.0, 20.0], [15.0]])

    def test_combinators(self):
        self.check({"oneOf": [{"minimum": 5}, {"multipleOf": 2}]}, "double",
                   [7.0, 4.0, 8.0, 3.0])
        self.check({"not": {"minimum": 3}}, "double", [1.0, 5.0])

    def test_unsupported_fallback_reported(self):
        from pyspark.sql.types import _parse_datatype_string

        spec = compile_schema({"uniqueItems": True})
        assert not supports(
            spec.root, _parse_datatype_string("array<bigint>"), spec.defs
        )
