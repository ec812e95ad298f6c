"""CLI surface: the link-batch subcommand must honor its flags (--tau)
and fail loudly — not print stale state — on an empty batch."""

from __future__ import annotations

import hashlib
import json
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import cli
from blink_spark.fixtures import ensure_fixture


def _write_batch(pdf, path):
    pdf.to_parquet(path, index=False)
    return str(path)


def test_link_batch_two_batches(spark, tmp_path, capsys):
    pdf = pd.read_parquet(ensure_fixture(0.001))
    b1 = _write_batch(pdf.iloc[:150], tmp_path / "b1.parquet")
    b2 = _write_batch(pdf.iloc[150:300], tmp_path / "b2.parquet")
    sd = str(tmp_path / "state")

    assert cli.main(["link-batch", "--source", b1, "--state-dir", sd]) == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["version"] == 1 and out1["total_files"] == 150

    assert cli.main(["link-batch", "--source", b2, "--state-dir", sd]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["version"] == 2
    assert out2["batch_rows"] == 150
    assert out2["total_files"] == 300


def test_link_batch_honors_tau(spark, tmp_path, capsys):
    """--tau above 1.0 disables score edges entirely, so clusters ==
    distinct contents (only the sha edges link); the default tau merges
    near-dups into strictly fewer clusters."""
    pdf = pd.read_parquet(ensure_fixture(0.001)).iloc[:200]
    src = _write_batch(pdf, tmp_path / "b.parquet")
    n_distinct_content = pdf["content"].map(
        lambda s: hashlib.sha256(s.encode()).hexdigest()
    ).nunique()

    sd_hi = str(tmp_path / "state_hi")
    assert cli.main(
        ["link-batch", "--source", src, "--state-dir", sd_hi, "--tau", "1.1"]
    ) == 0
    hi = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert hi["clusters"] == n_distinct_content

    sd_def = str(tmp_path / "state_def")
    assert cli.main(["link-batch", "--source", src, "--state-dir", sd_def]) == 0
    default = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert default["clusters"] < hi["clusters"]


def test_link_batch_empty_batch_fails_loudly(spark, tmp_path, capsys):
    pdf = pd.read_parquet(ensure_fixture(0.001)).iloc[:0]
    src = _write_batch(pdf, tmp_path / "empty.parquet")
    sd = str(tmp_path / "state")
    rc = cli.main(["link-batch", "--source", src, "--state-dir", sd])
    captured = capsys.readouterr()
    assert rc == 2
    assert "empty" in captured.err
    assert captured.out.strip() == ""  # no stale stats printed


def test_spark_submit_py_files_runs_pipeline(tmp_path):
    """North-rule launch path: `spark-submit --py-files <pkg.zip>
    blink_spark/cli.py run ...` must execute the full pipeline in a
    SEPARATE driver JVM with the package shipped via the zip (no repo
    sys.path tricks) and report F1=1.0 + an intact sha invariant."""
    import shutil
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    submit = shutil.which("spark-submit")
    if submit is None:
        import pytest

        pytest.skip("spark-submit not on PATH")
    # the session factory (re)builds the zip on import
    from blink_spark import session

    zip_path = session._package_zip()
    src = ensure_fixture(0.001)
    out = subprocess.run(
        [
            submit, "--master", "local[4]", "--py-files", zip_path,
            os.path.join(repo, "blink_spark", "cli.py"),
            "run", "--source", src, "--out", str(tmp_path / "ck"),
        ],
        capture_output=True, text=True, timeout=540, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["metrics"]["f1"] == 1.0
    assert rep["metrics"]["sha_invariant_violations"] == 0
    assert rep["rows"] == 601
