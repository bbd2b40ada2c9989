from lakehouse_plumber_spark.streaming.stateful import sessionize_stateful, state_parallelism

__all__ = ["sessionize_stateful", "state_parallelism"]
