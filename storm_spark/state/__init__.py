from storm_spark.state.base import State, StateType
from storm_spark.state.cached import CachedMap
from storm_spark.state.memory import LRUMemoryMapState, MemoryMapState
from storm_spark.state.opaque import OpaqueValue, TransactionalValue
from storm_spark.state.parquet_state import ParquetMapState

__all__ = [
    "State",
    "StateType",
    "MemoryMapState",
    "LRUMemoryMapState",
    "CachedMap",
    "ParquetMapState",
    "OpaqueValue",
    "TransactionalValue",
]
