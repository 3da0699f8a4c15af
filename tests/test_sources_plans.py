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


def test_update_query_parse():
    from etl_spark.plans.config import parse_update_query

    t, sets, where = parse_update_query(
        "UPDATE user_settings SET company_id = coalesce(company_id, 7), "
        "note = concat(a, ',', b) WHERE key = 'user_organization'"
    )
    assert t == "user_settings"
    assert sets == {
        "company_id": "coalesce(company_id, 7)",
        "note": "concat(a, ',', b)",  # comma inside call survives the split
    }
    assert where == "key = 'user_organization'"
    t2, sets2, where2 = parse_update_query("UPDATE t SET a = 1")
    assert (t2, sets2, where2) == ("t", {"a": "1"}, None)
    with pytest.raises(ValueError):
        parse_update_query("DELETE FROM t")


def test_update_query_config_mutates_lake_table(spark, tmp_path):
    """K10 behavior: an update_query TableConfig rewrites matched rows of
    the destination lake table in place (bucket-pruned copy-on-write)."""
    from etl_spark.lake import LakeTable

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", -5.0), (3, "c", -1.0)], ["id", "tag", "bal"]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t"), df.schema, key=["id"], n_buckets=4
    )
    table.append(df)
    cfg = MigrationConfig.from_dict(
        {
            "tables": [
                {
                    "new_name": "t",
                    "update_query": (
                        "UPDATE t SET bal = 0.0, tag = upper(tag) WHERE bal < 0"
                    ),
                }
            ]
        }
    )
    run_migration(spark, cfg, {}, str(tmp_path))
    got = {r["id"]: (r["tag"], r["bal"]) for r in table.read().collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 0.0), 3: ("C", 0.0)}
    snap, stats = table.update({"bal": "bal + 1"})  # no WHERE -> all rows
    assert stats["rows_updated"] == 3


def test_build_frame_for_update_query_raises(spark):
    cfg = MigrationConfig.from_dict(
        {"tables": [{"new_name": "x", "update_query": "UPDATE t SET a=1"}]}
    )
    with pytest.raises(NotImplementedError):
        build_table_frame(spark, cfg.tables[0], None)


def test_multi_file_config_indirection(tmp_path):
    """files: fan-out (/root/reference/cmd/main.go:38-67): a file-of-files
    config loads each sub-config (joined with `path`) and concatenates
    table lists in order."""
    import json

    sub = tmp_path / "confs"
    sub.mkdir()
    (sub / "a.json").write_text(json.dumps(
        {"tables": [{"old_name": "x", "new_name": "x2"}], "skip_tables": ["s1"]}
    ))
    (sub / "b.json").write_text(json.dumps(
        {"tables": [{"old_name": "y", "new_name": "y2"},
                    {"old_name": "z", "new_name": "z2"}]}
    ))
    main = tmp_path / "main.json"
    main.write_text(json.dumps({"files": ["a.json", "b.json"], "path": str(sub)}))
    cfg = load_config(str(main))
    assert [t.new_name for t in cfg.tables] == ["x2", "y2", "z2"]
    assert cfg.skip_tables == ["s1"]
    # relative to the config file's dir when `path` is absent
    main2 = sub / "main2.json"
    main2.write_text(json.dumps({"files": ["a.json"]}))
    assert [t.new_name for t in load_config(str(main2)).tables] == ["x2"]


def test_console_sink_shows_rows(spark, capfd):
    from etl_spark.sources import console_sink

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    n = console_sink(df, n=10, verbose=True)
    out, _ = capfd.readouterr()
    assert n == 2
    assert "id" in out and "a" in out  # show() table reached stdout


def test_http_json_source_loopback(spark):
    """S6: drive the HTTP source against an in-process loopback server (no
    external network needed) — JSON array fetch, key lowercasing, schema
    pass-through."""
    import http.server
    import threading

    payload = b'[{"ID": 1, "Name": "a"}, {"ID": 2, "Name": "b"}]'

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from etl_spark.sources import http_json_source

        url = f"http://127.0.0.1:{srv.server_address[1]}/dim.json"
        df = http_json_source(spark, url)
        rows = {r["id"]: r["name"] for r in df.collect()}
        assert rows == {1: "a", 2: "b"}
        assert set(df.columns) == {"id", "name"}
    finally:
        srv.shutdown()


def test_fetch_urls_distributed_loopback(spark):
    """S6 scale variant: mapInPandas URL-list fetch against a loopback
    server — bodies land as binary, per-row failures (404, refused
    connection) become status/error columns and never fail the stage.
    The loopback handler is threaded: executor tasks fetch concurrently."""
    import http.server
    import socketserver
    import threading

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.startswith("/doc/"):
                body = f"content of {self.path}".encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def log_message(self, *a):
            pass

    class Srv(socketserver.ThreadingMixIn, http.server.HTTPServer):
        daemon_threads = True

    srv = Srv(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from etl_spark.sources.http import fetch_urls

        port = srv.server_address[1]
        rows = [(i, f"http://127.0.0.1:{port}/doc/{i}") for i in range(20)]
        rows.append((98, f"http://127.0.0.1:{port}/missing"))
        rows.append((99, "http://127.0.0.1:1/refused"))  # connection refused
        df = spark.createDataFrame(rows, ["id", "url"])
        got = {r["id"]: r for r in fetch_urls(df, "url", timeout=5.0).collect()}
        assert len(got) == 22
        for i in range(20):
            assert got[i]["status"] == 200 and got[i]["error"] is None
            assert bytes(got[i]["body"]) == f"content of /doc/{i}".encode()
        assert got[98]["status"] == 404 and got[98]["body"] is None
        assert got[99]["status"] is None and got[99]["error"]
    finally:
        srv.shutdown()


def test_update_sequence_resync(spark, tmp_path):
    """K11: `update_sequence: true` persists MAX(key)+1 as the table's
    next-id counter (reference setval(seq, MAX(pk)+1),
    migrate.go:177-210)."""
    from etl_spark.lake import LakeTable

    src = spark.createDataFrame([(5, "a"), (11, "b")], ["id", "v"])
    src.createOrReplaceTempView("src")
    cfg = MigrationConfig.from_dict(
        {
            "tables": [
                {
                    "old_name": "src",
                    "new_name": "dst",
                    "query": "SELECT * FROM src",
                    "update_sequence": True,
                }
            ]
        }
    )
    tables = run_migration(spark, cfg, {"src": src}, str(tmp_path), keys={"dst": ["id"]})
    assert tables["dst"].next_id() == 12
    t = LakeTable.load(spark, str(tmp_path / "dst"))
    assert t.next_id() == 12
    # resync after more data advances the counter
    t.append(spark.createDataFrame([(40, "c")], ["id", "v"]))
    assert t.resync_sequence() == 41


def test_reference_yaml_shaped_config(spark, people_csv, tmp_path):
    """A config in the reference's own field vocabulary
    (/root/reference/examples/users.yaml: migrate / truncate_destination /
    batch_size / skip_store_error / update_sequence / {{...}} templates)
    loads and runs: aliases map, unknown knobs don't crash, migrate:false
    skips, templates evaluate."""
    cfg = MigrationConfig.from_dict(
        {
            "tables": [
                {
                    "old_name": "people",
                    "new_name": "users",
                    "migrate": True,
                    "clone_source": False,
                    "batch_size": 1000,
                    "update_sequence": False,
                    "skip_store_error": True,
                    "truncate_destination": True,
                    "mapping": {
                        "user_id": "age",
                        "full_name": "name",
                        "status": "{{age == 34 ? 'ACTIVE' : 'INACTIVE'}}",
                        "created_at": "{{now()}}",
                    },
                },
                {
                    "old_name": "people",
                    "new_name": "ignored_table",
                    "migrate": False,
                    "mapping": {"x": "name"},
                },
            ]
        }
    )
    assert cfg.tables[0].truncate is True  # alias mapped
    src = read_csv_source(spark, people_csv)
    tables = run_migration(
        spark, cfg, {"people": src}, str(tmp_path), keys={"users": ["user_id"]}
    )
    assert "ignored_table" not in tables   # migrate: false skipped
    rows = {r["full_name"]: r["status"] for r in tables["users"].read().collect()}
    assert rows == {"alice": "ACTIVE", "bob": "INACTIVE", "cara": "INACTIVE"}


def test_yaml_config_loads(tmp_path):
    """YAML config files load when pyyaml is present (the reference's
    native config format)."""
    y = tmp_path / "m.yaml"
    y.write_text(
        "tables:\n"
        "  - old_name: people\n"
        "    new_name: users\n"
        "    truncate_destination: true\n"
        "    mapping:\n"
        "      uid: age\n"
        "skip_tables: [old_stuff]\n"
    )
    cfg = load_config(str(y))
    assert cfg.tables[0].new_name == "users"
    assert cfg.tables[0].truncate is True
    assert cfg.skip_tables == ["old_stuff"]


def test_multiple_mapping_merges_shared_mapping(spark):
    """When a config has BOTH multiple_mapping and mapping, every output
    row is the multi entry MERGED with the shared mapping, mapping winning
    on conflicts (/root/reference/migrate/migrate.go:106-118; the
    examples/memberships.yaml user_settings shape)."""
    src = spark.createDataFrame(
        [(1, "7", "9")], ["user_id", "company_id", "service_id"]
    )
    cfg = MigrationConfig.from_dict(
        {
            "tables": [
                {
                    "old_name": "s",
                    "new_name": "user_settings",
                    "key_value_table": False,   # alias accepted
                    "multiple_mapping": [
                        {"key": "{{'default_company'}}", "value": "company_id",
                         "value_type": "{{'int'}}"},
                        {"key": "{{'default_service'}}", "value": "service_id",
                         "value_type": "{{'int'}}"},
                    ],
                    "mapping": {"user_id": "user_id", "status": "{{'ACTIVE'}}"},
                }
            ]
        }
    )
    df = build_table_frame(spark, cfg.tables[0], src)
    rows = {r["key"]: (r["value"], r["user_id"], r["status"], r["value_type"])
            for r in df.collect()}
    assert rows == {
        "default_company": ("7", 1, "ACTIVE", "int"),
        "default_service": ("9", 1, "ACTIVE", "int"),
    }


def test_update_parser_quoted_where(spark):
    """WHERE/SET keywords inside string literals must not confuse the
    parser (quote/paren-aware top-level scan, not a regex split)."""
    from etl_spark.plans.config import parse_update_query

    t, sets, where = parse_update_query(
        "UPDATE t SET a = 'x WHERE y', b = 2 WHERE c = 'SET'"
    )
    assert sets == {"a": "'x WHERE y'", "b": "2"}
    assert where == "c = 'SET'"
