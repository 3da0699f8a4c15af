"""The spark-submit --py-files deployment path: package the engine, run
the replay job through a REAL spark-submit (local master), verify the
converged table — i.e., the exact launch shape the north rule requires
on a cluster, minus the cluster."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pandas as pd

from etl_spark.cdc import ChangelogSpec, generate_changelog, write_changelog
from etl_spark.cdc.changelog import expected_final_state
from etl_spark.lake import LakeTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_replay(spark, tmp_path):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    assert os.path.exists(spark_submit), "spark-submit not found"

    # package the engine (no repo on the job's PYTHONPATH — the zip must
    # carry everything)
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"),
         str(tmp_path / "etl_spark.zip")],
        check=True, capture_output=True, text=True, cwd=str(tmp_path),
    ).stdout.strip()
    assert os.path.exists(zip_path)

    spec = ChangelogSpec(n_conversations=40, churn=1.5, n_partitions=2)
    pdf = generate_changelog(spec)
    wal = str(tmp_path / "wal")
    write_changelog(pdf, wal, spec)

    env = {**os.environ, "PYTHONPATH": ""}
    out = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "replay_job.py"),
         wal, str(tmp_path / "table"), str(tmp_path / "state"),
         "--create", "--buckets", "4"],
        check=True, capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=300,
    )
    assert "REPLAY_DONE" in out.stdout
    got = (
        LakeTable.load(spark, str(tmp_path / "table")).read()
        .orderBy("conv_id", "turn_idx").toPandas()
    )
    exp = expected_final_state(pdf)
    m = exp["text"].notna()
    exp = exp.copy()
    exp.loc[m, "text"] = (
        exp.loc[m, "text"].str.replace(r"\s+", " ", regex=True).str.strip()
    )
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text"]].reset_index(drop=True),
        exp[["conv_id", "turn_idx", "text"]].reset_index(drop=True),
        check_dtype=False,
    )
    # resumability through the same deployment path: second submit = no-op
    out2 = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "replay_job.py"),
         wal, str(tmp_path / "table"), str(tmp_path / "state"), "--create"],
        check=True, capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=300,
    )
    assert "REPLAY_DONE batches=0" in out2.stdout


def test_spark_submit_multi_executor_local_cluster(spark, tmp_path):
    """GENUINE multi-executor execution: local-cluster[2,2,1024] runs two
    separate executor JVMs with real serialization boundaries — closures,
    Arrow mapInPandas, and the lake-table write path all cross process
    lines, exactly as on a real cluster (with shared storage standing in
    for the distributed FS)."""
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"),
         str(tmp_path / "etl_spark.zip")],
        check=True, capture_output=True, text=True, cwd=str(tmp_path),
    ).stdout.strip()
    spec = ChangelogSpec(n_conversations=40, churn=1.5, n_partitions=2)
    pdf = generate_changelog(spec)
    wal = str(tmp_path / "wal")
    write_changelog(pdf, wal, spec)
    env = {**os.environ, "PYTHONPATH": ""}
    out = subprocess.run(
        [spark_submit, "--master", "local-cluster[2,2,1024]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "replay_job.py"),
         wal, str(tmp_path / "table"), str(tmp_path / "state"),
         "--create", "--buckets", "4"],
        check=True, capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=300,
    )
    assert "REPLAY_DONE" in out.stdout
    got = (
        LakeTable.load(spark, str(tmp_path / "table")).read()
        .orderBy("conv_id", "turn_idx").toPandas()
    )
    exp = expected_final_state(pdf).copy()
    m = exp["text"].notna()
    exp.loc[m, "text"] = (
        exp.loc[m, "text"].str.replace(r"\s+", " ", regex=True).str.strip()
    )
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text"]].reset_index(drop=True),
        exp[["conv_id", "turn_idx", "text"]].reset_index(drop=True),
        check_dtype=False,
    )


def test_spark_submit_codecs_cross_jvm(tmp_path):
    """The factory-built PNG/WAV codecs and semantic_dedup's nested
    closures must pickle BY VALUE into executors that are separate JVM
    processes holding only the --py-files zip — the deployment regime
    where a by-reference pickle would die with ModuleNotFoundError."""
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"),
         str(tmp_path / "etl_spark.zip")],
        check=True, capture_output=True, text=True, cwd=str(tmp_path),
    ).stdout.strip()
    env = {**os.environ, "PYTHONPATH": ""}
    out = subprocess.run(
        [spark_submit, "--master", "local-cluster[2,2,1024]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "codec_job.py")],
        check=True, capture_output=True, text=True, cwd=str(tmp_path),
        env=env, timeout=300,
    )
    assert "CODEC_JOB_OK" in out.stdout, out.stdout[-2000:]
