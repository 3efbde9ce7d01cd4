from kgspark.streaming.incremental import ingest_pages  # noqa: F401
from kgspark.streaming.stream import stream_ingest  # noqa: F401
