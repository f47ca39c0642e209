"""Continuous hierarchical rollup: hourly + daily state maintained per epoch,
coarse recompute only for affected buckets, replay-safe."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from storm_spark.plans import ContinuousRollup
from storm_spark.state import ParquetMapState
from storm_spark.state.base import StateType

HOUR = 3600
DAY = 24 * HOUR


@pytest.fixture()
def rollup(spark, tmp_path):
    def factory(name, key_schema, value_field, value_type):
        return ParquetMapState(
            spark, str(tmp_path / name), key_schema, value_field, value_type,
            StateType.OPAQUE, num_buckets=4,
        )

    return ContinuousRollup(
        spark,
        factory,
        keys=["k"],
        ts_col="ts_epoch",
        value_expr=F.col("v"),
        fine_bucket=lambda ts: (ts / HOUR).cast("long") * HOUR,
        coarse_bucket_of_fine=lambda fb: (fb / DAY).cast("long") * DAY,
        value_type="bigint",
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "ts_epoch bigint, k string, v bigint")


def test_rollup_two_epochs(spark, rollup):
    # epoch 1: two hours of day 0
    rollup.process_epoch(
        _batch(spark, [(10 * HOUR, "a", 5), (10 * HOUR + 60, "a", 3), (11 * HOUR, "a", 2)]),
        txid=1,
    )
    fine = {(r.fine_bucket, r.k): r.value for r in rollup.fine().collect()}
    assert fine == {(10 * HOUR, "a"): 8, (11 * HOUR, "a"): 2}
    coarse = {(r.coarse_bucket, r.k): r.value for r in rollup.coarse().collect()}
    assert coarse == {(0, "a"): 10}

    # epoch 2: more in hour 10, plus day 1 and key b
    rollup.process_epoch(
        _batch(spark, [(10 * HOUR, "a", 1), (DAY + HOUR, "a", 7), (HOUR, "b", 4)]),
        txid=2,
    )
    fine = {(r.fine_bucket, r.k): r.value for r in rollup.fine().collect()}
    assert fine[(10 * HOUR, "a")] == 9
    assert fine[(DAY + HOUR, "a")] == 7
    coarse = {(r.coarse_bucket, r.k): r.value for r in rollup.coarse().collect()}
    assert coarse == {(0, "a"): 11, (DAY, "a"): 7, (0, "b"): 4}


def test_rollup_replay_with_changed_batch_is_idempotent(spark, rollup):
    rollup.process_epoch(_batch(spark, [(10 * HOUR, "a", 5)]), txid=1)
    rollup.process_epoch(_batch(spark, [(10 * HOUR, "a", 2)]), txid=2)
    assert {r.value for r in rollup.coarse().collect()} == {7}
    # replay txid 2 with DIFFERENT content: fine recomputes from prev,
    # coarse recomputes from fine -> converges to the last replay
    rollup.process_epoch(_batch(spark, [(10 * HOUR, "a", 10), (11 * HOUR, "a", 1)]), txid=2)
    fine = {(r.fine_bucket, r.k): r.value for r in rollup.fine().collect()}
    assert fine == {(10 * HOUR, "a"): 15, (11 * HOUR, "a"): 1}
    coarse = {(r.coarse_bucket, r.k): r.value for r in rollup.coarse().collect()}
    assert coarse == {(0, "a"): 16}
