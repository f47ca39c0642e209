from pyspark.sql import Observation
from pyspark.sql import functions as F

from storm_spark.metrics import CombinedMetric, CountMetric, MeanMetric, observe


def test_batch_observed_metrics(spark):
    df = spark.createDataFrame([(1.0,), (3.0,), (5.0,)], "v double")
    obs = Observation("m")
    out = observe(
        df,
        obs,
        CountMetric("n"),
        MeanMetric("v", "avg_v"),
        CombinedMetric(F.max("v"), "max_v"),
    )
    assert out.count() == 3
    got = obs.get
    assert got["n"] == 3 and got["avg_v"] == 3.0 and got["max_v"] == 5.0
