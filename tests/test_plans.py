"""Physical-plan regression tests: the scale properties SCALE.md
claims (broadcast dims, pushdown, zero-shuffle transforms, no
cartesian products) asserted on the actual executed plans, so a
refactor that silently degrades a plan fails CI — not just the
one-off plan_audit tool run."""

import pytest

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    df.collect()  # populate AQE's final plan
    return df._jdf.queryExecution().executedPlan().toString()


def simple_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def q(spark):
    import __spark_entry__ as e

    return {name: fn for name, fn in e.queries().items()}


def test_revenue_by_nation_broadcasts_every_dim(spark, q):
    p = plan_of(q["q_revenue_by_nation"](spark, SF))
    assert "CartesianProduct" not in p
    # region, nation, supplier, customer all ride broadcast joins
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p


def test_disjunctive_revenue_pushes_quantity_and_broadcasts_part(spark, q):
    df = q["q_disjunctive_revenue"](spark, SF)
    p = simple_plan(df)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    # the derived l_quantity bound reaches the parquet scan
    scan = p[p.index("FileScan") :]
    assert "l_quantity" in scan.split("ReadSchema")[0]


def test_transform_family_is_zero_shuffle(spark, q):
    p = simple_plan(q["g_timeconv"](spark, SF))
    assert "Exchange" not in p  # map-only: parse -> convert -> project


def test_minhash_never_plans_cartesian_or_bnlj(spark, q):
    p = simple_plan(q["d_minhash_pairs"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_asof_join_is_single_key_shuffle_not_range_join(spark, q):
    p = simple_plan(q["q_asof_join"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_volume_shipping_prunes_fact_below_joins(spark, q):
    p = simple_plan(q["q_volume_shipping"](spark, SF))
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 4  # supp/cust/nation dims
