from maggma_spark.streaming.windows import (
    session_windows,
    sliding_windows,
    tumbling_windows,
)

__all__ = ["tumbling_windows", "sliding_windows", "session_windows"]
