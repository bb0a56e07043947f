"""Data-quality constraint suite (operators/quality.py)."""

import pytest
from pyspark.sql import functions as F

from geist_spark.operators.quality import Check, validate


@pytest.fixture(scope="module")
def table(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, 100),
            (2, "b", -5.0, 100),   # non_negative violation
            (2, "a", 20.0, None),  # dup id, null fk
            (None, "z", 30.0, 999),  # null id, bad status, orphan fk
        ],
        "id long, status string, price double, fk long",
    )


@pytest.fixture(scope="module")
def parent(spark):
    return spark.createDataFrame([(100,), (200,)], "pk long")


def _report(df, checks):
    return {
        (r["constraint"], r["violations"], r["total"], r["passed"])
        for r in validate(df, checks).collect()
    }


def test_row_local_and_unique_counts(table):
    got = _report(
        table,
        [
            Check("not_null", "id"),
            Check("unique", "id"),
            Check("accepted_values", "status", values=("a", "b")),
            Check("non_negative", "price"),
            Check("in_range", "price", lo=0, hi=25),
        ],
    )
    assert ("not_null(id)", 1, 4, False) in got
    # dups: ids (1,2,2,null) -> 3 non-null, 2 distinct -> 1 dup + 1 null = 2
    assert ("unique(id)", 2, 4, False) in got
    assert ("accepted_values(status)", 1, 4, False) in got
    assert ("non_negative(price)", 1, 4, False) in got
    # in_range [0,25]: -5 and 30 out -> 2 violations
    assert ("in_range(price)", 2, 4, False) in got


def test_ref_integrity_counts_only_nonnull_fks(table, parent):
    got = _report(
        table, [Check("ref_integrity", "fk", parent=parent, parent_col="pk")]
    )
    # 3 non-null fks, one (999) orphaned
    assert got == {("ref_integrity(fk)", 1, 3, False)}


def test_min_pass_fraction_threshold(table):
    rows = validate(
        table,
        [
            Check("not_null", "id", min_pass_fraction=0.75),
            Check("not_null", "id", min_pass_fraction=0.9),
        ],
    ).collect()
    # identical data fraction (3/4 non-null), two thresholds: 0.75
    # passes at >=0.75 and fails at >=0.9
    assert all(r["violations"] == 1 and r["total"] == 4 for r in rows)
    assert sorted(r["passed"] for r in rows) == [False, True]


def test_all_green_suite(table, parent):
    rows = validate(
        table.filter(F.col("id") == 1),
        [
            Check("not_null", "id"),
            Check("unique", "id"),
            Check("ref_integrity", "fk", parent=parent, parent_col="pk"),
        ],
    ).collect()
    assert all(r["passed"] for r in rows)
    assert all(r["violations"] == 0 for r in rows)


def test_unknown_kind_rejected(table):
    with pytest.raises(ValueError, match="unknown check kinds"):
        validate(table, [Check("bogus", "id")])


def test_single_scan_plan(table, parent):
    """The whole suite (incl. RI) must compile to one aggregation over
    one scan — no per-check jobs."""
    df = validate(
        table,
        [
            Check("not_null", "id"),
            Check("unique", "id"),
            Check("ref_integrity", "fk", parent=parent, parent_col="pk"),
        ],
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # one aggregate over the child table; the parent appears only as
    # the broadcast side of the left join
    assert plan.count("Aggregate") <= 3  # partial/final pairs collapse later
    assert "Join LeftOuter" in plan


def test_json_key_census_counts_and_fracs(spark):
    from geist_spark.operators.quality import json_key_census

    rows = [
        ('{"a": 1, "b": 2}',),
        ('{"a": 3}',),
        ('{"c": null}',),  # null-valued key still present in the JSON
        ('{}',),
    ]
    df = spark.createDataFrame(rows, "payload string")
    out = {r.key: r for r in json_key_census(df).collect()}
    assert out["a"].n_events == 2 and out["a"].frac == 0.5
    assert out["b"].n_events == 1 and out["b"].frac == 0.25
    assert out["c"].n_events == 1  # presence, not non-null-ness
    assert set(out) == {"a", "b", "c"}
