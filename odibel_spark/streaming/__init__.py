from odibel_spark.streaming.windows import windowed_event_counts  # noqa: F401
from odibel_spark.streaming.stateful import running_turn_state  # noqa: F401
