from odibel_spark.cdc.datagen import WalConfig, gen_events, write_wal_files  # noqa: F401
from odibel_spark.cdc.replay import (  # noqa: F401
    EVENT_OPS,
    current_state,
    last_writer_wins,
    split_dead_letters,
)
from odibel_spark.cdc.evolution import (  # noqa: F401
    discover_wal_schema,
    normalize_batch,
    normalize_role,
    normalize_tool,
)
from odibel_spark.cdc.pipeline import PipelineConfig, TranscriptCdcPipeline  # noqa: F401
