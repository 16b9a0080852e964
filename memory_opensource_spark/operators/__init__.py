from . import dedup, graph, predicate, ranking, similarity, windows  # noqa: F401
