from storm_spark.streaming.driver import StreamingTopologyRunner, run_stream_to_state

__all__ = ["StreamingTopologyRunner", "run_stream_to_state"]
