from . import dedup, graph, predicate, ranking, rerank, similarity, windows  # noqa: F401
