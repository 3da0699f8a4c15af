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


def test_field_map_dotted_struct_paths(spark):
    df = spark.createDataFrame(
        [(1, ("x", 2.5, (7,)))],
        "id long, a struct<b:string, c:double, d:struct<e:long>>",
    )
    out = field_map(
        df,
        {
            "i": "id",
            "b": "a.b",           # one-level struct path
            "e": "a.d.e",         # two-level struct path
            "bad": "a.nope",      # unresolvable path -> literal (warned)
            "bodyb": "body.id",   # body.x namespace -> column
        },
    ).first()
    assert out["i"] == 1
    assert out["b"] == "x"
    assert out["e"] == 7
    assert out["bad"] == "a.nope"
    assert out["bodyb"] == 1


def test_field_map_context_namespaces(spark):
    df = spark.createDataFrame([(1, "t")], ["id", "param"])
    ctx = {
        "param": {"tenant": "acme", "user_code": "u9"},
        "query": {"page": 3},
        "consts": {"version": "v2"},
        "enums": {"status": {"A": "active"}},
        "request_id": "r-77",
    }
    out = field_map(
        df,
        {
            "t": "param.tenant",        # namespace beats the 'param' column
            "wild": "param.*_code",     # *_suffix wildcard inside namespace
            "pg": "query.page",
            "ver": "consts.version",
            "st": "enums.status.A",
            "rid": "header.request_id",  # header. prefix strip
            "rid2": "request_id",        # bare header-data key (after columns)
            "expr": "eval.{{id + 1}}",
        },
        context=ctx,
    ).first()
    assert out["t"] == "acme"
    assert out["wild"] == "u9"
    assert out["pg"] == 3
    assert out["ver"] == "v2"
    assert out["st"] == "active"
    assert out["rid"] == "r-77"
    assert out["rid2"] == "r-77"
    assert out["expr"] == 2


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


def test_fanout_watermark_guards_stale_redelivery(spark, tmp_path):
    """An at-least-once producer re-emits ALREADY-APPLIED events (same
    old LSNs) in a new WAL segment. The primary's per-partition watermark
    filters them; each extra destination must filter through its OWN
    watermark store too — without it the unguarded merge would overwrite
    the mirrors' newer state with the stale payloads."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_spark.cdc.changelog import expected_final_state

    spec = ChangelogSpec(n_conversations=30, seed=7, churn=2.0)
    pdf = generate_changelog(spec)
    wal = str(tmp_path / "wal")
    write_changelog(pdf, wal, spec)

    def mk(name):
        return LakeTable.create(
            spark, str(tmp_path / name), TRANSCRIPTS_SCHEMA,
            key=["conv_id", "turn_idx"], n_buckets=4,
        )

    primary, mirror = mk("primary"), mk("mirror")
    state = str(tmp_path / "state")
    CdcStream(
        spark, wal, primary, state, extra_tables=[mirror]
    ).run_to_completion()

    # redeliver each key's FIRST event verbatim — old ts AND old lsn, so
    # only the watermark (not the commit log) can reject it
    stale = (
        pdf.sort_values("_seq").groupby(["conv_id", "turn_idx"]).head(1).copy()
    )
    stale["text"] = "STALE " + stale["text"].fillna("")
    for p, part in stale.groupby("source_partition", sort=True):
        cols = ["op", "lsn", "ts", "conv_id", "turn_idx", "role", "text"]
        t = pa.Table.from_pandas(part[cols], preserve_index=False).cast(
            pa.schema(
                [
                    ("op", pa.string()), ("lsn", pa.int64()),
                    ("ts", pa.timestamp("us")), ("conv_id", pa.string()),
                    ("turn_idx", pa.int32()), ("role", pa.string()),
                    ("text", pa.string()),
                ]
            )
        )
        pq.write_table(
            t, os.path.join(wal, f"source_partition={int(p)}", "seg-99999.parquet")
        )
    CdcStream(
        spark, wal, primary, state, extra_tables=[mirror]
    ).run_to_completion()

    exp = expected_final_state(pdf)
    for tbl in (primary, mirror):
        got = (
            tbl.read().orderBy("conv_id", "turn_idx")
            .toPandas()[["conv_id", "turn_idx", "role", "text"]]
            .reset_index(drop=True)
        )
        assert not got["text"].fillna("").str.startswith("STALE").any()
        pd.testing.assert_frame_equal(
            got, exp[["conv_id", "turn_idx", "role", "text"]].reset_index(drop=True)
        )
