from odibel_spark.cdc.datagen import WalConfig, gen_events, write_wal_files  # noqa: F401
from odibel_spark.cdc.replay import (  # noqa: F401
    EVENT_OPS,
    current_state,
    last_writer_wins,
    split_dead_letters,
)
