"""storm_spark — a PySpark-native analytics engine with the query surface of
nathanmarz/storm (Trident).

The reference's Trident API (``storm/trident/Stream.java``) is re-expressed as
a thin fluent layer that *compiles to Spark DataFrame plans*: Catalyst is the
planner, Structured Streaming the micro-batch runtime, and keyed parquet
tables the exactly-once state layer.

Public surface::

    from storm_spark import Topology, Fields, LocalCluster
    from storm_spark.operations import Count, Sum, MapGet, FilterNull, Split
    from storm_spark.state import MemoryMapState, ParquetMapState
"""

from storm_spark.fields import Fields
from storm_spark.serialization import decode_object, encode_object, register_encoder
from storm_spark.session import get_spark
from storm_spark.stream import Stream, GroupedStream
from storm_spark.topology import Topology, LocalCluster, FeederSource, TridentState
from storm_spark.builder import TopologyBuilder, BasicBolt

__all__ = [
    "Fields",
    "get_spark",
    "Stream",
    "GroupedStream",
    "Topology",
    "LocalCluster",
    "FeederSource",
    "TridentState",
    "TopologyBuilder",
    "BasicBolt",
    "register_encoder",
    "encode_object",
    "decode_object",
]

__version__ = "0.1.0"
