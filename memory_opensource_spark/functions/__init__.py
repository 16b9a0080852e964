from . import decay, ids, text, vector  # noqa: F401
