"""SCD Type-2 build + point-in-time join (operators/scd.py).

Contract points the oracle gate can't isolate: version collapsing on
unchanged attributes, keep-last at equal timestamps, boundary inclusivity
(fact AT eff_from gets the NEW version), and null attribution before the
first version.
"""

from pyspark.sql import functions as F

from backtest_crew_datalake_spark.operators.scd import pit_join, scd2_build


def _dim(spark):
    rows = [
        # user 1: silver -> silver (collapse) -> gold
        (1, 100, 1, "silver"),
        (1, 200, 2, "silver"),
        (1, 300, 3, "gold"),
        # user 2: two updates at the SAME ts — higher order_col wins
        (2, 100, 10, "bronze"),
        (2, 100, 11, "silver"),
    ]
    return spark.createDataFrame(
        rows, "user_id int, ts bigint, event_id int, tier string"
    )


def test_scd2_build_versions(spark):
    dim = scd2_build(_dim(spark), key=["user_id"], attrs=["tier"],
                     order_col="event_id")
    got = sorted(
        ((r.user_id, r.eff_from), (r.tier, r.eff_to, r.is_current))
        for r in dim.collect()
    )
    assert got == [
        ((1, 100), ("silver", 300, False)),   # ts=200 collapsed into this
        ((1, 300), ("gold", None, True)),
        ((2, 100), ("silver", None, True)),   # keep-last at equal ts
    ]


def test_pit_join_boundaries(spark):
    dim = scd2_build(_dim(spark), key=["user_id"], attrs=["tier"],
                     order_col="event_id")
    facts = spark.createDataFrame(
        [(1, 50), (1, 100), (1, 299), (1, 300), (1, 999),
         (2, 100), (3, 100)],
        "user_id int, ts bigint",
    )
    out = pit_join(facts, dim, key=["user_id"])
    got = {(r.user_id, r.ts): r.tier for r in out.collect()}
    assert out.count() == facts.count()  # as-of contract: len(left) rows
    assert got == {
        (1, 50): None,          # before first version
        (1, 100): "silver",     # AT eff_from -> new version
        (1, 299): "silver",
        (1, 300): "gold",       # boundary: eff_to exclusive / eff_from incl.
        (1, 999): "gold",       # open tail
        (2, 100): "silver",
        (3, 100): None,         # key never versioned
    }


def test_scd2_null_attr_transitions(spark):
    rows = [(1, 100, 1, None), (1, 200, 2, None), (1, 300, 3, "a"),
            (1, 400, 4, None)]
    df = spark.createDataFrame(
        rows, "user_id int, ts bigint, event_id int, tier string"
    )
    dim = scd2_build(df, key=["user_id"], attrs=["tier"],
                     order_col="event_id")
    got = sorted((r.eff_from, r.tier) for r in dim.collect())
    # null==null collapses; null->a and a->null are real transitions
    assert got == [(100, None), (300, "a"), (400, None)]


def test_scd2_single_shuffle_plan(spark):
    """All three windows + the change filter ride ONE Exchange on the key."""
    dim = scd2_build(_dim(spark), key=["user_id"], attrs=["tier"],
                     order_col="event_id")
    plan = dim._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan
