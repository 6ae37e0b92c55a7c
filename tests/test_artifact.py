"""Compiled-plan artifact round-trip (jvst_vm_read/writefile analogue)."""

import json

import pytest
from hypothesis import given, settings

from jvst_spark.compiler import artifact
from jvst_spark.compiler.plan import compile_schema
from jvst_spark.compiler.pyeval import compile_python
from jvst_spark.io.spans import FLAGSHIP_SPEC
from tests.test_property import json_value, schemas


def test_flagship_roundtrip(tmp_path):
    spec = compile_schema(FLAGSHIP_SPEC)
    p = str(tmp_path / "plan.json")
    artifact.save(spec, p)
    loaded = artifact.load(p)
    assert loaded.root == spec.root
    assert loaded.defs == spec.defs


def test_artifact_is_json():
    spec = compile_schema({"type": "integer", "minimum": 0})
    d = json.loads(artifact.dumps(spec))
    assert d["format"] == artifact.FORMAT_VERSION


def test_version_gate():
    with pytest.raises(ValueError):
        artifact.loads('{"format": 99}')


@settings(max_examples=150, deadline=None)
@given(schema=schemas, doc=json_value)
def test_roundtrip_preserves_semantics(schema, doc):
    spec = compile_schema(schema)
    loaded = artifact.loads(artifact.dumps(spec))
    assert loaded.root == spec.root
    a = compile_python(spec.root, spec.defs)(doc)
    b = compile_python(loaded.root, loaded.defs)(doc)
    assert a == b
