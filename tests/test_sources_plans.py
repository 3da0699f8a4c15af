"""Tests for file sources/sinks and the config-driven pipeline."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_spark.plans import MigrationConfig, build_table_frame, load_config, run_migration
from etl_spark.sources import (
    read_csv_source,
    read_json_source,
    write_csv_sink,
    write_json_sink,
)


@pytest.fixture()
def people_csv(tmp_path, spark):
    p = tmp_path / "in"
    p.mkdir()
    (p / "input.csv").write_text(
        "Name,Age,City\nalice,34,berlin\nbob,17,paris\ncara,51,lima\n"
    )
    return str(p)


def test_csv_source_lowercases_and_infers(spark, people_csv):
    df = read_csv_source(spark, people_csv)
    assert df.columns == ["name", "age", "city"]
    assert df.filter(F.col("age") > 18).count() == 2


def test_csv_sink_sorted_header_roundtrip(spark, people_csv, tmp_path):
    df = read_csv_source(spark, people_csv).select("city", "name", "age")
    out = str(tmp_path / "out_csv")
    write_csv_sink(df, out, mode="overwrite", single_file=True)
    back = read_csv_source(spark, out)
    assert back.columns == ["age", "city", "name"]  # sorted header contract
    assert back.count() == 3


def test_json_sink_roundtrip(spark, people_csv, tmp_path):
    df = read_csv_source(spark, people_csv)
    out = str(tmp_path / "out_json")
    write_json_sink(df, out, mode="overwrite")
    back = read_json_source(spark, out)
    assert back.count() == 3
    assert {r["name"] for r in back.collect()} == {"alice", "bob", "cara"}


def test_config_mapping_with_template(spark, people_csv):
    cfg = MigrationConfig.from_dict(
        {
            "tables": [
                {
                    "old_name": "people",
                    "new_name": "users",
                    "mapping": {
                        "full_name": "name",
                        "age_years": "age",
                        "status": "{{age > 18 ? 'ADULT' : 'MINOR'}}",
                    },
                }
            ]
        }
    )
    src = read_csv_source(spark, people_csv)
    df = build_table_frame(spark, cfg.tables[0], src)
    rows = {r["full_name"]: r["status"] for r in df.collect()}
    assert rows == {"alice": "ADULT", "bob": "MINOR", "cara": "ADULT"}


def test_config_query_and_kv_and_literal(spark, people_csv, tmp_path):
    conf_path = tmp_path / "migration.json"
    conf_path.write_text(
        json.dumps(
            {
                "skip_tables": ["ignored"],
                "tables": [
                    {
                        "old_name": "people",
                        "new_name": "adults",
                        "query": "SELECT name, age FROM people WHERE age >= 18",
                        "truncate": True,
                    },
                    {
                        "old_name": "people",
                        "new_name": "people_kv",
                        "key_value": True,
                        "include_fields": ["name"],
                        "exclude_fields": ["city"],
                        "type_field": "value_type",
                    },
                    {
                        "old_name": "nil",
                        "new_name": "settings",
                        "mapping": {"key": "{{'default_theme'}}", "value": "{{'dark'}}"},
                    },
                ],
            }
        )
    )
    config = load_config(str(conf_path))
    assert config.skip_tables == ["ignored"]
    src = read_csv_source(spark, people_csv)
    tables = run_migration(
        spark, config, {"people": src}, str(tmp_path / "lake")
    )
    assert tables["adults"].read().count() == 2
    kv = tables["people_kv"].read()
    assert set(kv.columns) == {"name", "key", "value", "value_type"}
    assert kv.filter("key = 'city'").count() == 0
    assert kv.filter("key = 'age'").count() == 3
    settings = tables["settings"].read().collect()
    assert len(settings) == 1 and settings[0]["value"] == "dark"


def test_update_query_raises(spark):
    cfg = MigrationConfig.from_dict(
        {"tables": [{"new_name": "x", "update_query": "UPDATE t SET a=1"}]}
    )
    with pytest.raises(NotImplementedError):
        build_table_frame(spark, cfg.tables[0], None)
