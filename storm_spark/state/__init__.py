from storm_spark.state.base import State, StateType
from storm_spark.state.memory import MemoryMapState
from storm_spark.state.opaque import OpaqueValue, TransactionalValue
from storm_spark.state.parquet_state import ParquetMapState

__all__ = [
    "State",
    "StateType",
    "MemoryMapState",
    "ParquetMapState",
    "OpaqueValue",
    "TransactionalValue",
]
