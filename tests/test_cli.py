"""spark-submit entry point (corhist_spark.cli): argument wiring,
constraint JSONL parsing, and the full-pipeline invocation end-to-end
on a tiny corpus."""

from __future__ import annotations

import json


def test_cli_main_runs_full_pipeline(spark, corpus, sdf, tmp_path, capsys, monkeypatch):
    from corhist_spark import cli

    # the CLI builds its own session; make it reuse the test session
    # instead of fighting over the JVM
    monkeypatch.setattr(cli, "get_spark", lambda *a, **k: spark)

    paths = {}
    for name, key in [
        ("documents", "documents"),
        ("edits", "edits"),
        ("revisions", "revisions"),
        ("sameas", "sameas_edges"),
    ]:
        p = str(tmp_path / name)
        sdf[key].write.parquet(p)
        paths[name] = p
    cons_path = tmp_path / "constraints.jsonl"
    with open(cons_path, "w") as f:
        for row in corpus["constraints"].to_dict("records"):
            f.write(json.dumps(row) + "\n")

    cli.main(
        [
            "--warehouse", str(tmp_path / "wh"),
            "--documents", paths["documents"],
            "--edits", paths["edits"],
            "--revisions", paths["revisions"],
            "--sameas", paths["sameas"],
            "--constraints", str(cons_path),
            "--run-id", "cli-test",
        ]
    )
    out = capsys.readouterr().out
    # every pipeline stage reports a row count, and corrections exist
    # on the seeded corpus
    assert "corrections:" in out
    n = int([l for l in out.splitlines() if l.startswith("corrections:")][0].split()[1])
    assert n > 0
    # resumable: warehouse tables landed on disk
    assert (tmp_path / "wh").exists()


def test_spark_submit_py_files_deployment():
    """The north rule's deployment clause, for real: zip the package,
    spark-submit the full pipeline from a NEUTRAL cwd (repo absent
    from sys.path), and require the per-table row counts — driver
    imports and executor-side pandas-UDF unpickling must both resolve
    corhist_spark from the --py-files zip (tools/submit_smoke.sh)."""
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_SMOKE_CPUS"] = "4"
    p = subprocess.run(
        ["sh", os.path.join(repo, "tools", "submit_smoke.sh")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
    assert "submit smoke OK" in p.stdout
    assert "corrections: " in p.stdout
