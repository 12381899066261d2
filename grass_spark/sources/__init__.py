"""Source/sink connectors for the engine's corpus tables."""

from grass_spark.sources.documents import (  # noqa: F401
    DOCUMENT_SCHEMA,
    read_documents,
    stream_documents,
    write_documents,
)
