from deepdoctection_spark.streaming.extract_stream import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    stream_dedup_turns,
    stream_extract,
    stream_reassemble,
    stream_transcripts,
)
from deepdoctection_spark.streaming.ingest_neardup import (  # noqa: F401
    NearDupIngest,
    read_verdicts,
)
