"""End-to-end streaming ingest (ST1): documents arrive as a file stream,
foreachBatch drives the §3.2 ingest pipeline into engine tables."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.plans import ingest as ingest_plan


def test_foreach_batch_ingest_end_to_end(spark):
    d = tempfile.mkdtemp()
    state = {"chunks": None, "reused_total": 0, "batches": 0}
    try:
        b0 = spark.createDataFrame(
            [("m1", "alpha beta gamma delta"), ("m2", "epsilon zeta eta theta")],
            "memory_id string, content string",
        )
        b0.coalesce(1).write.parquet(f"{d}/in/b0")

        def sink(batch_df, batch_id):
            existing = state["chunks"]
            if existing is None:
                existing = spark.createDataFrame(
                    [], "chunk_id string, embedding array<double>"
                )
            out = ingest_plan.ingest(batch_df, existing, dim=16)
            new_chunks = out["chunks"].select("chunk_id", "embedding").localCheckpoint(eager=True)
            reused = out["reused"].count()
            state["reused_total"] += reused
            state["chunks"] = (
                new_chunks if state["chunks"] is None
                else state["chunks"].unionByName(new_chunks)
            )
            state["batches"] += 1

        def run():
            stream = spark.readStream.schema("memory_id string, content string").option(
                "maxFilesPerTrigger", "1"
            ).parquet(f"{d}/in/*")
            q = (
                stream.writeStream.foreachBatch(sink)
                .option("checkpointLocation", f"{d}/ckpt")
                .trigger(availableNow=True).start()
            )
            q.awaitTermination(120)

        run()
        assert state["batches"] == 1
        assert state["chunks"].count() == 2
        assert state["reused_total"] == 0

        # batch 2: one exact duplicate of m1 (must be reused, not re-ingested),
        # one genuinely new doc
        b1 = spark.createDataFrame(
            [("m3", "alpha beta gamma delta"), ("m4", "iota kappa lambda mu")],
            "memory_id string, content string",
        )
        b1.coalesce(1).write.parquet(f"{d}/in/b1")
        run()
        assert state["reused_total"] == 1
        ids = {r.chunk_id for r in state["chunks"].collect()}
        assert ids == {"m1_0", "m2_0", "m4_0"}  # m3 deduped away
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_ann_index_maintenance(spark):
    """ST1 + ANN maintenance: each micro-batch's freshly-embedded chunks are
    appended into the persisted IVF layout (assignment against the stored
    centroids — no retrain per batch), so arrivals become ANN-searchable at
    batch granularity.  The steady-state serving loop at scale: stream ->
    ingest -> append_to_index, with periodic build_ivf_index rebuilds for
    centroid drift."""
    import os

    from memory_opensource_spark.sources import ann_index

    d = tempfile.mkdtemp()
    try:
        seed = spark.createDataFrame(
            [(f"s{i}", f"w{i} w{(i*3) % 7} w{(i*5) % 11} common") for i in range(12)],
            "memory_id string, content string",
        )
        seeded = ingest_plan.hash_embed(ingest_plan.chunk_text(seed), dim=16)
        idx = f"{d}/ivf"
        ann_index.build_ivf_index(
            seeded.select("chunk_id", "embedding"), idx, n_centroids=4)
        base_n = spark.read.parquet(idx).count()

        for b, rows in enumerate([
            [("m1", "alpha beta gamma"), ("m2", "delta epsilon zeta")],
            [("m3", "eta theta iota")],
        ]):
            spark.createDataFrame(
                rows, "memory_id string, content string"
            ).coalesce(1).write.parquet(f"{d}/in/b{b}")

        appended = {"n": 0, "batches": 0}

        def sink(batch_df, batch_id):
            embedded = ingest_plan.hash_embed(
                ingest_plan.chunk_text(batch_df), dim=16)
            appended["n"] += ann_index.append_to_index(
                embedded.select("chunk_id", "embedding"), idx)
            appended["batches"] += 1

        stream = (spark.readStream
                  .schema("memory_id string, content string")
                  .option("maxFilesPerTrigger", "1").parquet(f"{d}/in/*"))
        q = (stream.writeStream.foreachBatch(sink)
             .option("checkpointLocation", f"{d}/ckpt")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

        assert appended["batches"] == 2 and appended["n"] == 3
        assert spark.read.parquet(idx).count() == base_n + 3

        # a streamed-in chunk is ANN-reachable through the normal query path
        probe_vec = [float(x) for x in ingest_plan.hash_embed(
            ingest_plan.chunk_text(spark.createDataFrame(
                [("q", "alpha beta gamma")], "memory_id string, content string")),
            dim=16).first().embedding]
        hits = ann_index.ann_query(spark, idx, probe_vec, k=3, nprobe=4,
                                   id_col="chunk_id").collect()
        assert hits and hits[0].chunk_id == "m1_0"
    finally:
        shutil.rmtree(d, ignore_errors=True)
