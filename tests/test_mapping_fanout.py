"""Wildcard/concat source resolution, fan-out streaming, retry wrapper."""

from __future__ import annotations

import os

import pytest

from etl_spark.cdc.changelog import (
    ChangelogSpec,
    TRANSCRIPTS_SCHEMA,
    generate_changelog,
    write_changelog,
)
from etl_spark.lake import LakeTable
from etl_spark.operators import field_map
from etl_spark.streaming.stream import CdcStream, retry_with_backoff


def test_field_map_wildcard_and_concat(spark):
    df = spark.createDataFrame(
        [("alice", "smith", "b1")], ["first_name", "last_name", "badge"]
    )
    out = field_map(
        df,
        {
            "surname": "*_name",          # wildcard: first match wins
            "full": "first_name+last_name",
            "tag": "badge",
            "missing": "no_such_*",       # unresolvable wildcard -> NULL-ish lit
        },
    ).first()
    assert out["surname"] == "alice"  # first matching column in order
    assert out["full"] == "alicesmith"
    assert out["tag"] == "b1"


def test_retry_with_backoff_retries_then_raises():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert retry_with_backoff(flaky, attempts=3, base_delay=0.001) == "ok"

    def always_fails():
        raise RuntimeError("permanent")

    with pytest.raises(RuntimeError, match="permanent"):
        retry_with_backoff(always_fails, attempts=2, base_delay=0.001)


def test_fanout_applies_to_all_destinations(spark, tmp_path):
    spec = ChangelogSpec(n_conversations=30, seed=5)
    pdf = generate_changelog(spec)
    wal = str(tmp_path / "wal")
    write_changelog(pdf, wal, spec)

    def mk(name):
        return LakeTable.create(
            spark, str(tmp_path / name), TRANSCRIPTS_SCHEMA,
            key=["conv_id", "turn_idx"], n_buckets=4,
        )

    primary, mirror = mk("primary"), mk("mirror")
    CdcStream(
        spark, wal, primary, str(tmp_path / "state"), extra_tables=[mirror]
    ).run_to_completion()
    a = primary.read().orderBy("conv_id", "turn_idx").toPandas()
    b = mirror.read().orderBy("conv_id", "turn_idx").toPandas()
    assert len(a) > 0
    assert a.equals(b)
