from . import ingest, search  # noqa: F401
