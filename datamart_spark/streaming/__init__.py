from .ingest import incremental_ingest  # noqa: F401
