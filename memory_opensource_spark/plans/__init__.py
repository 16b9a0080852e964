from . import enrich, ingest, search  # noqa: F401
