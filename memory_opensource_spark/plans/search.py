"""The flagship read path: POST /v1/memory/search as one DataFrame DAG.

Mirrors find_related_memory_items_async (memory/memory_graph.py:5721-7118, traced
in SURVEY §3.1):

  1. compile ACL (pushed to scan) + metadata spec (pre-top-k semi-join, F1-F4)
  2. embed query (deterministic hash embedder here) -> literal vector
  3. filtered cosine top-k over chunks, k*3 overfetch (V2/R5), threshold 0.15 (F6)
  4. chunk -> memory dedup via base-id algebra       (regexp strip _N)
  5. optional graph-neighbor source (G1)             -> stratified merge (R2)
  6. fetch memory rows (S1: semi-join on id)
  7. post-filters + final top-k (F4/F5/R4)
  8. ranking annotation (R8 scores available on demand)

The whole thing is one lazy plan: Catalyst pushes the ACL filter into the parquet
scan, the top-k is TakeOrdered (no full sort), and the id-join broadcasts the tiny
top-k id set against the memories table — the plan you want when `chunks` is 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ids import strip_chunk_suffix
from ..operators.predicate import AclContext, FilterSpec, compile_filter, spec_filter
from ..operators.ranking import overfetch_k
from ..operators.similarity import topk_search
from ..semantics import MAX_MEMORIES_DEFAULT, SEARCH_SCORE_THRESHOLD


def _spec_columns_on_chunks(chunks: DataFrame, spec: FilterSpec) -> bool:
    """True when every column the metadata spec references exists on the chunk
    rows themselves (the denormalized point-payload layout,
    sources/tables.py:build_chunks_denormalized) — then the spec filters at
    the chunk scan with no pre-top-k join."""
    need: set[str] = set()
    for arr_field, values in (("topics", spec.topics),
                              ("emoji_tags", spec.emoji_tags),
                              ("emotion_tags", spec.emotion_tags)):
        if values:
            need.add(arr_field)
    for eq_field, value in (("hierarchical_structures", spec.hierarchical_structures),
                            ("location", spec.location),
                            ("conversation_id", spec.conversation_id),
                            ("role", spec.role),
                            ("category", spec.category)):
        if value is not None:
            need.add(eq_field)
    if spec.custom_metadata:
        need.add("custom_metadata")
    if spec.exclude_memory_id:
        need.add("memory_id")
    if spec.consent_allowed:
        need.add("consent")
    if spec.risk_blocked:
        need.add("risk")
    return need <= set(chunks.columns)


def search(
    chunks: DataFrame,
    memories: DataFrame,
    query_vec: list[float],
    ctx: AclContext | None = None,
    spec: FilterSpec | None = None,
    top_k: int = MAX_MEMORIES_DEFAULT,
    score_threshold: float = SEARCH_SCORE_THRESHOLD,
    fallback_relax: bool = False,
) -> DataFrame:
    """Returns the top_k memories for a query vector: {memory_id, score, content,
    ...memory cols}, ordered by score desc, memory_id asc.

    fallback_relax: when the filtered result is empty, retry without the
    metadata spec (never without ACL) — the reference's property-filter-free
    retry (memory/memory_graph.py:8582-8718, :9130-9141).
    """
    acl_pred = compile_filter(ctx, None) if ctx else None
    spec_pred = compile_filter(None, spec) if spec else None

    # metadata spec is applied PRE-top-k, like the reference's Qdrant pre-filter
    # (memory/memory_graph.py:5905-6034): top-k must be computed over MATCHING
    # points, or a selective spec starves the overfetch window and returns
    # few/zero rows while matches exist past it.  Two physical strategies:
    # 1. DENORMALIZED (preferred, = the reference's point-payload design,
    #    memory_graph.py:5919-6026): chunks carry the spec columns
    #    (build_chunks_denormalized), so the predicate filters AT THE CHUNK
    #    SCAN — atomic columns land in PushedFilters, zero joins before top-k.
    # 2. fallback for bare chunk layouts: semi-join against the filtered
    #    memories table on the id derived from the chunk id (AQE broadcasts
    #    the allowed-id side when small) — correct, but at 100 TB it puts a
    #    memories join in front of every spec'd top-k.
    candidate_chunks = chunks
    if spec_pred is not None:
        if _spec_columns_on_chunks(chunks, spec):
            candidate_chunks = spec_filter(chunks, spec)
        else:
            # spec_filter handles MEMORY_SCHEMA's JSON-string custom_metadata
            # (from_json -> map) as well as genuinely map-typed frames
            allowed = spec_filter(memories, spec).select("memory_id")
            candidate_chunks = (
                chunks.withColumn("_spec_mem", strip_chunk_suffix(F.col("chunk_id")))
                .join(allowed.withColumnRenamed("memory_id", "_spec_mem"), "_spec_mem", "left_semi")
                .drop("_spec_mem")
            )

    def run(cand: DataFrame, post_spec) -> DataFrame:
        hits = topk_search(
            cand,
            query_vec,
            overfetch_k(top_k),
            pred=acl_pred,
            vec_col="embedding",
            id_col="chunk_id",
            score_threshold=score_threshold,
        )
        # chunk -> memory: strip the _N suffix, keep best chunk score per memory
        # (memory/memory_graph.py:6064-6066 + dict-by-id dedup :9111-9112)
        mem_hits = (
            hits.withColumn("memory_id", strip_chunk_suffix(F.col("chunk_id")))
            .groupBy("memory_id")
            .agg(F.max("score").alias("score"))
        )
        # S1 fetch: the hit set is tiny (<= 3k ids) -> broadcast semi-join
        fetched = memories.join(F.broadcast(mem_hits), "memory_id")
        # post-fetch re-check (F4): cheap on <= 3k rows, guards spec drift
        if post_spec is not None:
            fetched = spec_filter(fetched, post_spec)
        return fetched.orderBy(F.col("score").desc(), F.col("memory_id").asc()).limit(top_k)

    # post-fetch re-check (F4) only when the memories rows carry every column
    # the spec references — e.g. a custom_metadata map filtered on the chunk
    # payload may not exist memory-side.
    post_spec = spec if (spec is not None
                         and _spec_columns_on_chunks(memories, spec)) else None
    out = run(candidate_chunks, post_spec)
    if fallback_relax and spec_pred is not None and out.isEmpty():
        # semantic retry: relax property filters, keep ACL (memory_graph.py:9130-9141)
        out = run(chunks, None)
    return out


def search_with_graph(
    chunks: DataFrame,
    memories: DataFrame,
    nodes: DataFrame,
    edges: DataFrame,
    query_vec: list[float],
    ctx: AclContext | None = None,
    spec: FilterSpec | None = None,
    graph_spec=None,
    top_k: int = MAX_MEMORIES_DEFAULT,
    score_threshold: float = SEARCH_SCORE_THRESHOLD,
    rerank_scorer=None,
    max_nodes: int = 15,
) -> DataFrame:
    """The complete §3.1 read: vector leg + agentic-graph leg -> stratified
    merge (R2) with source annotation (R15) -> fetch -> optional rerank (R6).

    - graph leg: a G1 pattern match (``graph_spec`` is a PatternSpec); matched
      Memory-side ids become a second id source with NULL scores (the merge
      assigns the 0.7 default, memory_graph.py:6599-6603);
    - ``max_nodes``: the reference's graph-leg cap — every generated AND
      fallback Cypher carries ``LIMIT top_k_neo`` (= request max_nodes,
      default 15; chat_gpt_completion.py:2455,2543, routes ge=10 le=50).
      Applied AFTER the leg's ACL (the Cypher LIMIT follows its WHERE),
      ordered id-asc for determinism (Neo4j's unordered LIMIT is
      nondeterministic; id-asc is the house pin).  Without it an
      unselective pattern feeds the whole match set into the merge — the
      round-6 graph probe paid a 600k-row global sort for a 20-row answer;
    - ``rerank_scorer``: optional fn(DataFrame) -> DataFrame adding
      ``rerank_score``; the result re-sorts PURELY by it (the R6 stage:
      memory_graph.py:7092-7093 sorts by the rerank score alone, stable on
      the prior order — no fusion with the vector score).
    """
    from ..operators.graph import match_pattern
    from ..operators.ranking import stratified_merge

    acl_pred = compile_filter(ctx, None) if ctx else None

    vec_hits = (
        topk_search(chunks, query_vec, overfetch_k(top_k), pred=acl_pred,
                    vec_col="embedding", id_col="chunk_id",
                    score_threshold=score_threshold)
        .withColumn("id", strip_chunk_suffix(F.col("chunk_id")))
        .groupBy("id")
        .agg(F.max("score").alias("score"))
    )

    sources = {"vector": vec_hits}
    if graph_spec is not None:
        # dedup=False: the distinct(m_id) below subsumes the per-path dedup
        # (distinct over a subset key), saving one shuffle on the graph leg
        g = match_pattern(nodes, edges, graph_spec, dedup=False)
        graph_hits = (
            g.select(F.col("m_id").alias("id"))
            .distinct()
            .withColumn("score", F.lit(None).cast("double"))
        )
        if acl_pred is not None:
            # ACL the graph leg BEFORE the merge, like the reference (the
            # Cypher query carries the user filters, so blocked ids never
            # consume merge quota; memory_graph.py:8963-9143 + G15).  Engine
            # nodes carry no ACL columns, so the gate is a semi-join against
            # the caller-readable memories — the same OR-block the vector
            # leg evaluates at its scan.
            readable = memories.filter(acl_pred).select("memory_id")
            graph_hits = graph_hits.join(
                readable.withColumnRenamed("memory_id", "id"), "id", "left_semi"
            )
        graph_hits = graph_hits.orderBy("id").limit(max_nodes)
        sources["neo"] = graph_hits

    merged = stratified_merge(sources, top_k, id_col="id", score_col="score")
    fetched = memories.join(
        F.broadcast(merged.withColumnRenamed("id", "memory_id")), "memory_id"
    )
    # defense in depth: every returned row must satisfy the caller's ACL even
    # if a future source forgets its own gate (both current legs already
    # filter at source, so this is a no-op filter on correct plans)
    if acl_pred is not None:
        fetched = fetched.filter(acl_pred)
    if spec is not None:
        fetched = spec_filter(fetched, spec)

    if rerank_scorer is not None:
        # full reorder by the rerank score (stable on the prior score order,
        # pinned explicitly for determinism), per the reference
        fetched = rerank_scorer(fetched).withColumn(
            "final_score", F.col("rerank_score"))
        return fetched.orderBy(
            F.col("rerank_score").desc(), F.col("score").desc(),
            F.col("memory_id").asc(),
        ).limit(top_k)
    fetched = fetched.withColumn("final_score", F.col("score"))
    return fetched.orderBy(
        F.col("final_score").desc(), F.col("memory_id").asc()
    ).limit(top_k)
