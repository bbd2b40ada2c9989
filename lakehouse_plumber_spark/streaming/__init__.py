from lakehouse_plumber_spark.streaming.stateful import sessionize_stateful

__all__ = ["sessionize_stateful"]
