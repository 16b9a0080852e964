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
