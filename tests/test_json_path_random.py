"""Randomized parity test for the gjson-compatible path resolver.

A seeded generator builds nested JSON docs and plain dotted paths; the
expected value comes from an independent pure-Python resolver encoding
the contract (missing -> NULL, scalar -> JSON literal text, object/
array -> compact JSON text, json_str: missing/null -> ''). All cases
evaluate in ONE Spark job (one column per path over all docs)."""

import json
import random
import string

from pyspark.sql import functions as F

from geist_spark.functions.json_path import json_col, json_str

KEYS = ["a", "b", "cc", "d1", "Ee", "f_f", "g"]


def gen_value(rng, depth):
    roll = rng.random()
    if depth > 0 and roll < 0.35:
        return {
            k: gen_value(rng, depth - 1)
            for k in rng.sample(KEYS, rng.randint(1, 4))
        }
    if depth > 0 and roll < 0.45:
        return [gen_value(rng, 0) for _ in range(rng.randint(0, 3))]
    return rng.choice(
        [
            None,
            True,
            False,
            rng.randint(-10**9, 10**9),
            round(rng.uniform(-1000, 1000), 3),
            "".join(rng.choices(string.printable[:80], k=rng.randint(0, 12))),
            "",
        ]
    )


def resolve(doc, path):
    """Independent reference resolver for plain dotted paths."""
    node = doc
    for seg in path.split("."):
        if not isinstance(node, dict) or seg not in node:
            return None
        node = node[seg]
    if node is None:
        return None
    if isinstance(node, bool):
        return "true" if node else "false"
    if isinstance(node, (dict, list)):
        return json.dumps(node, separators=(",", ":"), ensure_ascii=False)
    if isinstance(node, (int, float)):
        return json.dumps(node)
    return str(node)


def test_json_path_randomized_parity(spark):
    rng = random.Random(1234)
    docs = [
        {k: gen_value(rng, 2) for k in rng.sample(KEYS, rng.randint(2, 5))}
        for _ in range(120)
    ]
    paths = ["a", "b", "cc.d1", "Ee.f_f", "a.b.cc", "g", "missing", "d1.missing"]

    df = spark.createDataFrame(
        [(json.dumps(d, ensure_ascii=False),) for d in docs], "value string"
    )
    cols = []
    for i, p in enumerate(paths):
        cols.append(json_col("value", p).alias(f"c{i}"))
        cols.append(json_str("value", p).alias(f"s{i}"))
    rows = df.select(*cols).collect()

    mismatches = []
    for doc, row in zip(docs, rows):
        for i, p in enumerate(paths):
            want = resolve(doc, p)
            got = row[f"c{i}"]
            if got != want:
                mismatches.append((p, doc, want, got))
            want_s = "" if want is None else want
            if row[f"s{i}"] != want_s:
                mismatches.append((p + "[str]", doc, want_s, row[f"s{i}"]))
    assert not mismatches, mismatches[:5]
