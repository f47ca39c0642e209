"""_events must normalize every ts physical type the testdata has shipped:
TIMESTAMP(NANOS) (read as bigint under the legacy conf), timestamp[us]
(read as TIMESTAMP_NTZ), and plain TIMESTAMP — the r3 bench/correctness
outage was exactly a new physical type reaching a TZ-strict expression."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize("unit", ["ns", "us", "ms"])
def test_events_normalizes_all_ts_physical_types(spark, tmp_path, unit):
    from storm_spark.queries import _events

    sf_dir = tmp_path / unit
    os.makedirs(sf_dir)
    ts = [
        dt.datetime(2024, 1, 1, 10, 0, 0),
        dt.datetime(2024, 1, 1, 10, 20, 0),
        dt.datetime(2024, 1, 1, 11, 30, 0),
    ]
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(ts, pa.timestamp(unit)),
            "user_id": pa.array([7, 7, 7], pa.int64()),
        }
    )
    pq.write_table(table, str(sf_dir / "events.parquet"))

    e = _events(spark, str(sf_dir))
    # normalized to session-TZ TIMESTAMP: TZ-strict expressions resolve
    assert dict(e.dtypes)["ts"] == "timestamp"
    rows = (
        e.select("event_id", F.unix_micros(F.col("ts")).alias("us"))
        .orderBy("event_id")
        .collect()
    )
    # values preserved exactly (session TZ pinned UTC)
    epoch = dt.datetime(1970, 1, 1)
    expect = [int((t - epoch).total_seconds() * 1_000_000) for t in ts]
    assert [r.us for r in rows] == expect


def test_sessionize_gap_semantics(spark, tmp_path):
    """30-min-gap sessionization on a synthetic events table: 10:00+10:20
    are one session, 11:30 starts a second."""
    from storm_spark.queries import q_sessionize

    sf_dir = tmp_path / "sess"
    os.makedirs(sf_dir)
    ts = [
        dt.datetime(2024, 1, 1, 10, 0, 0),
        dt.datetime(2024, 1, 1, 10, 20, 0),
        dt.datetime(2024, 1, 1, 11, 30, 0),
        dt.datetime(2024, 1, 2, 9, 0, 0),
    ]
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([7, 7, 7, 8], pa.int64()),
        }
    )
    pq.write_table(table, str(sf_dir / "events.parquet"))
    got = {r.user_id: r.n_sessions for r in q_sessionize(spark, str(sf_dir)).collect()}
    assert got == {7: 2, 8: 1}
