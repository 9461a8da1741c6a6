from associationabacminer_spark.sources.tables import load_table, load_tables, register_views
from associationabacminer_spark.sources.transcripts import (
    generate_transcripts,
    transcripts_pdf,
    TRANSCRIPT_SCHEMA,
)

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "generate_transcripts",
    "transcripts_pdf",
    "TRANSCRIPT_SCHEMA",
]
