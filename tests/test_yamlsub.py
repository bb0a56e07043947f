"""YAML safe-subset parser (operators/yamlsub.py)."""

import json

import pytest

from geist_spark.operators.yamlsub import yaml_parse, yaml_records


def test_full_surface():
    y = (
        "# comment\n"
        "name: build-42\n"
        "version: 1.2\n"
        "enabled: true\n"
        "thresholds:\n  low: 10\n  high: 20\n"
        'tags: [a, b, "c d"]\n'
        "flowmap: {x: 1, y: two}\n"
        "steps:\n"
        "  - run: make test\n    timeout: 30\n"
        "  - run: make lint\n"
        "matrix:\n  - 1\n  - 2\n"
        "note: 'it''s quoted'\n"
        "script: |\n  line one\n  line two\n"
        "folded: >\n  fold these\n  words\n"
        "nothing:\n"
    )
    assert yaml_parse(y) == {
        "name": "build-42", "version": 1.2, "enabled": True,
        "thresholds": {"low": 10, "high": 20},
        "tags": ["a", "b", "c d"], "flowmap": {"x": 1, "y": "two"},
        "steps": [{"run": "make test", "timeout": 30},
                  {"run": "make lint"}],
        "matrix": [1, 2], "note": "it's quoted",
        "script": "line one\nline two\n",
        "folded": "fold these words\n", "nothing": None,
    }


def test_document_markers_and_scalar_doc():
    assert yaml_parse("---\na: 1\n...\n") == {"a": 1}
    assert yaml_parse("just a scalar\n") == "just a scalar"
    assert yaml_parse("") is None


def test_capability_limits():
    for bad in ("a: &x 1", "a: *x", "a: !!int 3", "<<: *base",
                "---\na: 1\n---\nb: 2", "a:\n\tb: 1"):
        with pytest.raises(NotImplementedError):
            yaml_parse(bad)


def test_malformed():
    for bad in ("a: 'unterminated", 'a: "bad \\q escape"', "a: [1,2",
                "a: 1\na: 2", "a: 1\n  b: orphan", "{weird}: 1"):
        with pytest.raises((ValueError, NotImplementedError)):
            yaml_parse(bad)
    with pytest.raises(ValueError, match="budget"):
        yaml_parse("\n".join(f"k{i}: 1" for i in range(50)),
                   max_elements=10)


def test_block_scalar_chomping():
    assert yaml_parse("s: |-\n  a\n  b\n")["s"] == "a\nb"
    assert yaml_parse("s: |\n  a\n\n  b\n")["s"] == "a\n\nb\n"


def test_spark_surface(spark):
    rows = yaml_records(
        spark.createDataFrame(
            [(1, "a: 1\nb: [x, y]\n"), (2, None)],
            "file_id long, text string",
        )
    ).collect()
    assert len(rows) == 1
    assert json.loads(rows[0]["record_json"]) == {"a": 1, "b": ["x", "y"]}
