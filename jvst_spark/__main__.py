"""CLI entry point mirroring the reference's (src/main.c:165-421):

    python -m jvst_spark compile <schema.json> [-o plan.json]
        jvst -c: compile the schema through all stages, write the plan
        artifact (or print the canonical DAG with -v).

    python -m jvst_spark validate <schema.json|plan.json> <doc.json>...
        jvst -c -r: compile + run documents. Exit code 0 if ALL
        documents valid, 1 otherwise (the reference's verdict-as-exit-
        code sink, src/main.c:413-417). Violations print to stderr as
        code\\tpath\\tmessage.

Both commands accept:
    -b/--base-uri URI    the schema document's retrieval URI (the
                         reference's -b, src/main.c:184-187); relative
                         $id/$ref resolve against it
    --registry map.json  {absolute URI: local schema path} supplying
                         cross-document $ref targets (loaded locally —
                         the engine never fetches)

Single-document runs use the compiled-Python evaluator directly (no
Spark session — the per-document path is pure Python, exactly as the
reference runs one VM per document). Table-scale validation goes
through scripts/submit_job.py instead.
"""

from __future__ import annotations

import json
import sys


def _load_registry(registry_path: str):
    """{absolute URI: schema-file path} — loaded here, locally; the
    engine itself never fetches (the reference resolves only what its
    id table indexed, src/idtbl.h:11-89)."""
    if not registry_path:
        return None
    with open(registry_path) as f:
        mapping = json.load(f)
    registry = {}
    for uri, spath in mapping.items():
        with open(spath) as f:
            registry[uri] = json.load(f)
    return registry


def _load_spec(path: str, base_uri: str = "", registry_path: str = ""):
    from jvst_spark.compiler import artifact
    from jvst_spark.compiler.plan import compile_schema

    registry = _load_registry(registry_path)
    with open(path) as f:
        text = f.read()
    d = json.loads(text)
    if isinstance(d, dict) and d.get("format") == artifact.FORMAT_VERSION:
        if base_uri or registry_path:
            # an artifact is already fully resolved — silently
            # dropping the flags would run under different resolution
            # semantics than the user asked for
            print(
                "warning: -b/--base-uri/--registry have no effect on a "
                "compiled artifact (resolution happened at compile "
                "time)",
                file=sys.stderr,
            )
        return artifact.loads(text)
    return compile_schema(d, registry, base_uri)


def _take_opt(argv, flag, usage):
    """Consume every occurrence of a valued flag (last wins); exits
    via (None, True) on a missing value."""
    val = ""
    while flag in argv:
        i = argv.index(flag)
        if i + 1 >= len(argv):
            print(usage, file=sys.stderr)
            return None, True
        val = argv[i + 1]
        del argv[i : i + 2]
    return val, False


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 2
    cmd = argv.pop(0)
    usage_common = (
        f"usage: {cmd} <schema.json> [-b/--base-uri URI] "
        "[--registry map.json] ..."
    )
    # -b: the document's retrieval URI (reference src/main.c:184-187);
    # --registry: {absolute URI: local schema path} for cross-doc $ref
    # consume BOTH spellings unconditionally (leftover '-b URI' tokens
    # would otherwise be misread as positional paths); --base-uri wins
    # when both are given
    long_uri, err = _take_opt(argv, "--base-uri", usage_common)
    if err:
        return 2
    short_uri, err = _take_opt(argv, "-b", usage_common)
    if err:
        return 2
    base_uri = long_uri or short_uri
    registry_path, err = _take_opt(argv, "--registry", usage_common)
    if err:
        return 2

    if cmd == "compile":
        verbose = "-v" in argv and (argv.remove("-v") or True)
        dump = "--dump" in argv and (argv.remove("--dump") or True)
        out = None
        if "-o" in argv:
            i = argv.index("-o")
            if i + 1 >= len(argv):
                print("usage: compile <schema.json> [-o plan.json] [-v] "
                      "[--dump]", file=sys.stderr)
                return 2
            out = argv[i + 1]
            del argv[i : i + 2]
        if len(argv) != 1:
            print("usage: compile <schema.json> [-o plan.json] [-v] "
                  "[--dump]", file=sys.stderr)
            return 2
        if dump:
            # per-stage tree dump (jvst's -d debug paths,
            # src/main.c:292-350): translated / simplified / canonified
            from jvst_spark.spec.dump import dump_stages

            try:
                registry = _load_registry(registry_path)
                with open(argv[0]) as f:
                    print(dump_stages(json.load(f), registry, base_uri))
            except Exception as exc:
                print(f"schema error: {exc}", file=sys.stderr)
                return 2
            return 0
        try:
            spec = _load_spec(argv[0], base_uri, registry_path)
        except Exception as exc:  # malformed schema/registry: CLI
            # error with the reason, never a traceback (reference
            # prints the parse error and exits, src/main.c:252-262)
            print(f"schema error: {exc}", file=sys.stderr)
            return 2
        if verbose:
            from jvst_spark.spec.dump import pretty

            print(pretty(spec.root))
            for uri, node in sorted(spec.defs.items()):
                print(f"-- def {uri}:")
                print(pretty(node))
        if out:
            from jvst_spark.compiler import artifact

            artifact.save(spec, out)
        return 0

    if cmd == "validate":
        usage = ("usage: validate <schema.json> [--max-ref-depth N] "
                 "<doc.json>...")
        max_ref_depth = None
        # while-loop so a duplicated flag is consumed, not silently
        # left in argv as a bogus document path; a missing or non-int
        # value prints usage + exit 2, never a traceback
        while "--max-ref-depth" in argv:
            i = argv.index("--max-ref-depth")
            try:
                max_ref_depth = int(argv[i + 1])
            except (IndexError, ValueError):
                print(usage, file=sys.stderr)
                return 2
            del argv[i : i + 2]
        if len(argv) < 2:
            print(usage, file=sys.stderr)
            return 2
        from jvst_spark.compiler.pyeval import compile_explain
        from jvst_spark import errors as E

        try:
            spec = _load_spec(argv[0], base_uri, registry_path)
        except Exception as exc:
            print(f"schema error: {exc}", file=sys.stderr)
            return 2
        # --max-ref-depth: the engine's bounded-$ref cut (the (D+1)-th
        # re-entry evaluates as INVALID_UNEXPECTED_TOKEN), same
        # semantics as apply_json(max_ref_depth=...)
        explainer = compile_explain(spec.root, spec.defs, max_ref_depth)
        all_valid = True
        for doc_path in argv[1:]:
            try:
                with open(doc_path) as f:
                    doc = json.load(f)
            except OSError as exc:
                # an unreadable document is a CLI error (exit 2, like
                # the reference's file_main error path), not a verdict
                print(f"{doc_path}: {exc}", file=sys.stderr)
                return 2
            except ValueError:
                print(f"{doc_path}:\t{E.INVALID_JSON:#06x}\t$\t"
                      f"{E.invalid_msg(E.INVALID_JSON)}", file=sys.stderr)
                all_valid = False
                continue
            violations = explainer(doc)
            if violations:
                all_valid = False
                for code, path in violations:
                    print(
                        f"{doc_path}:\t{code:#06x}\t{path}\t"
                        f"{E.invalid_msg(code)}",
                        file=sys.stderr,
                    )
        return 0 if all_valid else 1

    print(f"unknown command: {cmd}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
