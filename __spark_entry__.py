"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pricing-summary query at sf0.001;
``queries``/``oracle_sql`` expose the full operator catalog from
``storm_spark/queries.py`` (one entry per implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# python-path operations (pandas UDFs, custom aggregators) unpickle by
# reference on executor workers — they need the repo on PYTHONPATH
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_REPO] + [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from storm_spark.queries import entry as _entry

    return _entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from storm_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from storm_spark.queries import ORACLES

    return dict(ORACLES)
