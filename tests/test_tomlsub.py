"""TOML operator (operators/tomlsub.py, stdlib tomllib + JSON dialect)."""

import json

import pytest

from geist_spark.operators.tomlsub import toml_parse, toml_records


def test_surface_and_dialect():
    t = (
        "[package]\n"
        'name = "demo"\n'
        "n = 1_000\n"
        "hex = 0xFF\n"
        "arr = [1, 2, \"three\"]\n"
        "inline = { a = 1, b = false }\n"
        "date = 2026-01-02T03:04:05Z\n"
        "local = 2026-01-02\n"
        "[[bin]]\npath = \"a\"\n"
        "[[bin]]\npath = \"b\"\n"
        "[deps.sub]\nx = true\n"
    )
    got = toml_parse(t)
    assert got["package"]["n"] == 1000 and got["package"]["hex"] == 255
    assert got["package"]["date"] == "2026-01-02T03:04:05+00:00"
    assert got["package"]["local"] == "2026-01-02"
    assert got["bin"] == [{"path": "a"}, {"path": "b"}]
    assert got["deps"]["sub"]["x"] is True


def test_malformed_typed():
    for bad in ("broken = ", "[t]\n[t]\n", 'a = "unterminated'):
        with pytest.raises(ValueError, match="malformed TOML"):
            toml_parse(bad)


def test_spark_surface(spark):
    rows = toml_records(
        spark.createDataFrame(
            [(1, 'a = 1\nb = ["x"]\n'), (2, None)],
            "file_id long, text string",
        )
    ).collect()
    assert len(rows) == 1
    assert json.loads(rows[0]["record_json"]) == {"a": 1, "b": ["x"]}
