"""Semantic constants of the reference engine, in one place.

Every threshold / weight / quirk the reference hard-codes is a named constant here,
with a citation into /root/reference (file:line).  Operators import from this module
only — no literal thresholds anywhere else — so semantic fidelity is auditable.
"""

# --- similarity thresholds (cosine) -------------------------------------------------
# ANN search results are cut at this score (memory/memory_graph.py:8156).
SEARCH_SCORE_THRESHOLD = 0.15
# Ingest near-duplicate: score > 0.97 -> reuse existing memory id
# (memory/memory_graph.py:14421; call site :2206-2217).
INGEST_DEDUP_THRESHOLD = 0.97
# Batch duplicate sweep: pairs with score > 0.95 are duplicates
# (memory/memory_graph.py:10378, identify_duplicates :10333-10390).
DUPLICATE_SWEEP_THRESHOLD = 0.95
# Entity resolution by unique ids / by content: score >= 0.95
# (memory/memory_graph.py:10992, :11557-11638).
ENTITY_RESOLUTION_THRESHOLD = 0.95
# Semantic node lookup default threshold (memory/memory_graph.py:3054).
SEMANTIC_MATCH_THRESHOLD = 0.85

# --- search shape -------------------------------------------------------------------
# Over-fetch factor: vector_top_k = top_k * 3 to compensate chunk->memory dedup
# (memory/memory_graph.py:6102-6104, 6247-6249).
VECTOR_OVERFETCH_FACTOR = 3
# Duplicate sweep kNN width (memory/memory_graph.py:10333-10390: 20-NN per memory).
DUPLICATE_SWEEP_KNN = 20
# API caps (routers/v1/memory_routes_v1.py:2309-2310).
MAX_MEMORIES_DEFAULT, MAX_MEMORIES_MIN, MAX_MEMORIES_MAX = 20, 10, 50
MAX_NODES_DEFAULT, MAX_NODES_MIN, MAX_NODES_MAX = 15, 10, 50
# Stratified merge: per-source quota floor and graph-source default score
# (memory/memory_graph.py:6579-6596, :6599-6603).
STRATIFIED_QUOTA_FLOOR = 5
NEO_DEFAULT_SCORE = 0.7

# --- chunking / embedding -----------------------------------------------------------
# TokenTextSplitter chunk_size=2048, overlap=0 (models/embedding_model.py:784-789).
CHUNK_SIZE_TOKENS = 2048
CHUNK_OVERLAP_TOKENS = 0
# Embedding dims: 1024 local / 2560 cloud / 384 property collection
# (memory/memory_graph.py:1114-1118, :1213).  Fixtures use 64.
EMBEDDING_DIM_LOCAL = 1024
EMBEDDING_DIM_PROPERTY = 384
EMBEDDING_DIM_FIXTURE = 64

# --- ranking formulas (services/memory_management.py) -------------------------------
# R8 tier-1 ranked memories (:4044-4047, :4133-4138):
#   score_cache = 0.5*log1p(cache_hit_total) + 0.3*cache_hit_ema_30d
#                 + 0.2*(cache_cw / max(ema, 1))
#   score_cite  = 0.4*log1p(cit_total) + 0.3*cit_ema + 0.3*(cit_cw / max(ema, 1))
#   final       = has_cite ? 0.7*cite + 0.3*cache : cache
TIER1_CACHE_WEIGHTS = (0.5, 0.3, 0.2)
TIER1_CITE_WEIGHTS = (0.4, 0.3, 0.3)
TIER1_FUSE_CITE, TIER1_FUSE_CACHE = 0.7, 0.3
# R9 time-decay EMA (:3177-3190): decayed = prev * 0.5 ** (delta_days / half_life).
EMA_HALF_LIFE_DAYS = 30.0
# R10 fused confidence (:3266-3289):
#   c = clip01(sim) * conf * exp(-latency_ms/500) * (tier/2) * engagement
#       * min(tokens/512, 1)
FUSED_LATENCY_SCALE_MS = 500.0
FUSED_TIER_DIVISOR = 2.0
FUSED_TOKEN_CAP = 512.0
# R11 retrieval-count window cap (services/memory_management.py:3675-3784).
RETRIEVAL_COUNT_LIMIT = 500
# Relevance fn (memory/memory_item_relevance.py:20-27).
RELEVANCE_COSINE_WEIGHT, RELEVANCE_TOPIC_WEIGHT = 0.7, 0.3
# R14 related-memory content trim (memory/memory_graph.py:5175-5212).
RELATED_CONTENT_TRIM_CHARS = 600

# --- misc ---------------------------------------------------------------------------
# int8 quantization: per-vector max-abs scaling scale=127/max_abs, clamp [-128,127]
# (services/memory_management.py:3957-4025 uses dynamic scaling, not a fixed clip).
INT8_SCALE = 127
# Batch limits (config/opensource.yaml `batch_processing`).
BATCH_MAX, BATCH_WORKFLOW_THRESHOLD, BATCH_CONCURRENCY = 1000, 100, 100
# G2 bounded variable-length path (api_handlers/chat_gpt_completion.py:2464-2553).
PATH_MIN_HOPS, PATH_MAX_HOPS = 1, 2

# --- dedup / text-analysis (beyond-reference, north-star ops) -----------------------
MINHASH_NUM_HASHES = 16
MINHASH_BANDS = 4          # 4 bands x 4 rows
SHINGLE_SIZE = 3           # word 3-grams
SIMHASH_BITS = 64
NEAR_DUP_JACCARD = 0.8
