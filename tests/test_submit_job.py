"""End-to-end test for the spark-submit production entry
(scripts/submit_job.py): full run writes verdicts + manifests and
prints the summary; a re-run resumes (all buckets skipped) — the north
rule's checkpoint/resume contract at the CLI surface."""

import importlib.util
import json
import os
import sys

import pytest

from tests.conftest import SF_DIR


def _load_submit_module():
    path = os.path.join(
        os.path.dirname(__file__), "..", "scripts", "submit_job.py"
    )
    spec = importlib.util.spec_from_file_location("submit_job", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_submit_end_to_end_and_resume(spark, tmp_path, monkeypatch, capsys):
    from jvst_spark.io.spans import spans_from_documents

    inp = str(tmp_path / "spans.parquet")
    spans_from_documents(spark, SF_DIR).write.parquet(inp)
    out = str(tmp_path / "out")

    sj = _load_submit_module()
    # keep the shared test session alive across main()'s spark.stop()
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    def run():
        monkeypatch.setattr(
            sys, "argv",
            ["submit_job.py", "--input", inp, "--out", out, "--buckets", "4"],
        )
        sj.main()
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    s1 = run()
    assert s1["buckets_computed"] == 4 and s1["buckets_skipped"] == 0
    assert s1["totals"]["n_docs"] == 500
    assert 0 < s1["totals"]["n_valid"] < 500
    assert s1["totals"]["n_violations"] > 0
    # verdict parquet written per bucket
    verd = spark.read.parquet(os.path.join(out, "verdicts"))
    assert verd.count() == 500

    # resume: nothing recomputed, totals identical (read from manifests)
    s2 = run()
    assert s2["buckets_computed"] == 0 and s2["buckets_skipped"] == 4
    assert s2["totals"] == s1["totals"]
