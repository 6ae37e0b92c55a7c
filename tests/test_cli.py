"""CLI parity with the reference's entry points (src/main.c:165-421):
verdict-as-exit-code, compile-to-artifact."""

import json
import subprocess
import sys


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "jvst_spark", *args],
        capture_output=True, text=True, cwd="/root/repo",
    )


def test_validate_exit_codes(tmp_path):
    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps({"type": "integer", "minimum": 0}))
    good = tmp_path / "good.json"
    good.write_text("3")
    bad = tmp_path / "bad.json"
    bad.write_text("-1")

    assert run_cli("validate", str(schema), str(good)).returncode == 0
    r = run_cli("validate", str(schema), str(bad))
    assert r.returncode == 1
    assert "number not valid" in r.stderr
    # any invalid doc fails the batch (runtests.sh exit semantics)
    assert run_cli("validate", str(schema), str(good), str(bad)).returncode == 1


def test_invalid_json_document(tmp_path):
    schema = tmp_path / "schema.json"
    schema.write_text("true")
    broken = tmp_path / "broken.json"
    broken.write_text("{nope")
    r = run_cli("validate", str(schema), str(broken))
    assert r.returncode == 1
    assert "encountered invalid JSON" in r.stderr


def test_compile_artifact_roundtrip(tmp_path):
    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps({"type": "string", "minLength": 2}))
    plan = tmp_path / "plan.json"
    assert run_cli("compile", str(schema), "-o", str(plan)).returncode == 0
    doc = tmp_path / "doc.json"
    doc.write_text('"ab"')
    # validate straight from the compiled artifact
    assert run_cli("validate", str(plan), str(doc)).returncode == 0
    short = tmp_path / "short.json"
    short.write_text('"a"')
    assert run_cli("validate", str(plan), str(short)).returncode == 1


def test_compile_verbose_prints_dag(tmp_path):
    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps({"type": "number"}))
    r = run_cli("compile", str(schema), "-v")
    assert r.returncode == 0
    assert "SWITCH" in r.stdout


def test_compile_dump_prints_all_stages(tmp_path):
    """Stage-dump parity with the reference's -d debug paths
    (src/main.c:292-350): one labeled tree per compile stage."""
    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps(
        {"type": "object", "required": ["a"],
         "properties": {"a": {"type": "integer", "minimum": 0}},
         "additionalProperties": False}
    ))
    r = run_cli("compile", str(schema), "--dump")
    assert r.returncode == 0
    for stage in ("translated", "simplified", "canonified"):
        assert f"stage: {stage}" in r.stdout
    assert "OBJ_REQUIRED ['a']" in r.stdout
    assert "NUM_INTEGER" in r.stdout
    assert "INVALID" in r.stdout  # additionalProperties: false


def test_validate_max_ref_depth_cut(tmp_path):
    """--max-ref-depth applies the bounded-$ref cut: a chain deeper
    than the bound fails with INVALID_UNEXPECTED_TOKEN at the cut
    path; within the bound it validates as true recursion would."""
    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps({
        "definitions": {"node": {"anyOf": [
            {"type": "null"},
            {"type": "object",
             "properties": {"next": {"$ref": "#/definitions/node"}}},
        ]}},
        "$ref": "#/definitions/node",
    }))
    shallow = tmp_path / "shallow.json"
    shallow.write_text('{"next": {"next": null}}')
    deep = tmp_path / "deep.json"
    deep.write_text('{"next": ' * 8 + "null" + "}" * 8)

    # unbounded: both valid (true recursion)
    assert run_cli("validate", str(schema), str(shallow),
                   str(deep)).returncode == 0
    # bounded at 4: shallow ok, deep cut
    assert run_cli("validate", str(schema), "--max-ref-depth", "4",
                   str(shallow)).returncode == 0
    r = run_cli("validate", str(schema), "--max-ref-depth", "4",
                str(deep))
    assert r.returncode == 1
    assert "$.next.next.next.next" in r.stderr


def test_flag_errors_exit_2_not_traceback(tmp_path):
    """Review finding: a missing/non-int --max-ref-depth value, a
    duplicated flag, a dangling -o, and an unreadable document must
    print a usage/IO error and exit 2 — never an unhandled
    traceback."""
    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps({"type": "integer"}))
    doc = tmp_path / "doc.json"
    doc.write_text("3")

    r = run_cli("validate", str(schema), "--max-ref-depth")
    assert r.returncode == 2 and "usage:" in r.stderr
    r = run_cli("validate", str(schema), "--max-ref-depth", "nope", str(doc))
    assert r.returncode == 2 and "usage:" in r.stderr
    # duplicated flag: both consumed, last wins, doc still validates
    assert run_cli(
        "validate", str(schema), "--max-ref-depth", "3",
        "--max-ref-depth", "4", str(doc),
    ).returncode == 0
    r = run_cli("compile", str(schema), "-o")
    assert r.returncode == 2 and "usage:" in r.stderr
    r = run_cli("validate", str(schema), str(tmp_path / "missing.json"))
    assert r.returncode == 2 and "missing.json" in r.stderr
    assert "Traceback" not in r.stderr


def test_base_uri_and_registry(tmp_path):
    # the reference's -b (src/main.c:184-187): a RELATIVE $ref resolves
    # against the supplied retrieval URI and lands in the registry
    remote = tmp_path / "remote.json"
    remote.write_text(json.dumps({"type": "integer"}))
    reg = tmp_path / "registry.json"
    reg.write_text(json.dumps(
        {"http://example.com/remote.json": str(remote)}
    ))
    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps({"$ref": "remote.json"}))
    good = tmp_path / "good.json"
    good.write_text("3")
    bad = tmp_path / "bad.json"
    bad.write_text('"not an int"')

    args = ("-b", "http://example.com/schema.json",
            "--registry", str(reg))
    assert run_cli("validate", *args, str(schema),
                   str(good)).returncode == 0
    assert run_cli("validate", *args, str(schema),
                   str(bad)).returncode == 1
    # without -b the relative ref is unresolvable: CLI error, not a
    # verdict
    r = run_cli("validate", "--registry", str(reg), str(schema),
                str(good))
    assert r.returncode == 2
    assert "schema error" in r.stderr and "Traceback" not in r.stderr

    # compile accepts the same flags and writes a runnable artifact
    out = tmp_path / "plan.json"
    assert run_cli("compile", *args, str(schema), "-o",
                   str(out)).returncode == 0
    assert run_cli("validate", str(out), str(good)).returncode == 0
    assert run_cli("validate", str(out), str(bad)).returncode == 1


def test_base_uri_missing_value_exits_2(tmp_path):
    schema = tmp_path / "schema.json"
    schema.write_text("{}")
    r = run_cli("validate", str(schema), "-b")
    assert r.returncode == 2 and "usage" in r.stderr


def test_both_base_uri_spellings_consumed(tmp_path):
    # both -b and --base-uri given: --base-uri wins and the leftover
    # -b tokens must not be misread as positional document paths
    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps({"type": "integer"}))
    good = tmp_path / "good.json"
    good.write_text("3")
    r = run_cli("validate", "--base-uri", "http://a/", "-b", "http://b/",
                str(schema), str(good))
    assert r.returncode == 0, r.stderr


def test_dump_honors_registry_and_base(tmp_path):
    remote = tmp_path / "remote.json"
    remote.write_text(json.dumps({"type": "integer"}))
    reg = tmp_path / "registry.json"
    reg.write_text(json.dumps(
        {"http://example.com/remote.json": str(remote)}
    ))
    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps({"$ref": "remote.json"}))
    r = run_cli("compile", "--dump", "-b", "http://example.com/s.json",
                "--registry", str(reg), str(schema))
    assert r.returncode == 0, r.stderr
    assert "stage: canonified" in r.stdout
    # without the flags the ref is unresolvable: clean error, exit 2
    r2 = run_cli("compile", "--dump", str(schema))
    assert r2.returncode == 2
    assert "schema error" in r2.stderr and "Traceback" not in r2.stderr


def test_artifact_warns_on_resolution_flags(tmp_path):
    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps({"type": "integer"}))
    out = tmp_path / "plan.json"
    assert run_cli("compile", str(schema), "-o", str(out)).returncode == 0
    good = tmp_path / "good.json"
    good.write_text("3")
    r = run_cli("validate", "-b", "http://h/", str(out), str(good))
    assert r.returncode == 0
    assert "no effect on a compiled artifact" in r.stderr
