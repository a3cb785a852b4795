"""Batch-replay driver rows for the streaming twins (VERDICT r10 #3).

The 17 streaming modules carry pytest agreement contracts but had zero
driver visibility in rounds 1-10: their semantics were never checked
against a DuckDB oracle. Two of them have EXACT batch semantics whose
final output is batching-invariant, so a full replay of the static
corpus through the real Structured Streaming query produces a result a
SQL oracle can recompute:

* k-anonymity gate (:mod:`.kanon`): the released SET is exactly "every
  row whose level-1 QI group total reaches k" — independent of how the
  stream was micro-batched (a group flushes the moment its running
  count crosses k, and later members pass through; under-k groups
  never emit). ``released_at_n`` IS batch-dependent, so the replay row
  projects it away.
* sentence scrub (:mod:`.sentences`): within one watermark horizon the
  admitted sentence KEY set equals the batch keep-first scrub's
  distinct case-folded sentence set (the surviving (doc_id, sent_idx)
  position is arbitrary intra-batch, so the replay row emits the md5
  key only — one row per admitted sentence, which also pins the
  exactly-once admission: a double emission would change the row
  count).

Each replay builds a throwaway durable BasenineDB, ingests the corpus
table as JSON documents through the real INSERT path, runs the real
streaming query to exhaustion (``processAllAvailable``), and returns
the batching-invariant projection. Driver-side work is bounded: the
corpus rows pass through ``insert_json``'s distributed ingest; only
the JSON lines are collected once (the same bounded shape every wire
test uses).
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.db import BasenineDB
from ..sources.tables import load_table


def kanon_replay(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """Replay the events table through the ONLINE k-anonymity gate and
    return the released rows' (event_id, qi_type, qi_hour, qi_band) —
    the batching-invariant projection. Oracle: rows whose level-1 QI
    group (sentinel-coalesced, exactly :mod:`.kanon`'s derivation)
    holds at least ``k`` rows."""
    from .kanon import k_anonymity_stream

    tmp = tempfile.mkdtemp(prefix="bn_kanon_replay_")
    qname = f"kanon_replay_{uuid.uuid4().hex[:12]}"
    try:
        db = BasenineDB(spark, path=f"{tmp}/store")
        ev = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_id").isNotNull())
            .select(
                F.to_json(
                    F.struct(
                        F.col("event_id"),
                        F.col("event_type"),
                        F.col("ts_ms"),
                        F.col("value"),
                    )
                ).alias("j")
            )
            .orderBy("j")
        )
        db.insert_json([r["j"] for r in ev.collect()])
        sq = k_anonymity_stream(
            db, k=k, query_name=qname, checkpoint=f"{tmp}/ckpt"
        )
        try:
            sq.processAllAvailable()
        finally:
            sq.stop()
        # memory-sink table: in-memory after stop, safe past tmp cleanup
        return spark.sql(
            f"""
            SELECT CAST(event_id AS BIGINT) AS event_id,
                   qi_type,
                   CAST(qi_hour AS BIGINT) AS qi_hour,
                   CAST(qi_band AS BIGINT) AS qi_band
            FROM {qname} ORDER BY event_id
            """
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def sentence_scrub_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the documents table through the ONLINE keep-first
    sentence scrub and return one md5(lower(sentence)) key per
    admitted sentence. Oracle: DISTINCT keys of the batch sentence
    split (the stream admits each key exactly once within the horizon
    — a double emission would change the row count)."""
    from .sentences import sentence_scrub_stream

    tmp = tempfile.mkdtemp(prefix="bn_sentscrub_replay_")
    qname = f"sentscrub_replay_{uuid.uuid4().hex[:12]}"
    try:
        db = BasenineDB(spark, path=f"{tmp}/store")
        docs = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
            .select(
                F.to_json(
                    F.struct(F.col("doc_id"), F.col("text"))
                ).alias("j")
            )
            .orderBy("j")
        )
        db.insert_json([r["j"] for r in docs.collect()])
        sq = sentence_scrub_stream(
            db,
            horizon_seconds=86_400,  # covers any replay wall-clock
            query_name=qname,
            checkpoint=f"{tmp}/ckpt",
        )
        try:
            sq.processAllAvailable()
        finally:
            sq.stop()
        return spark.sql(
            f"""
            SELECT md5(lower(sentence)) AS sent_key
            FROM {qname} ORDER BY sent_key
            """
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
