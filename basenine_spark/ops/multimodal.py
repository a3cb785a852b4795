"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this container,
so the *decode* step is stubbed (deterministic fake features, or
``NotImplementedError`` in "real" mode) — but the Spark-side plumbing is
real and tested: binary columns, typed metadata structs, Arrow-batched
``mapInPandas`` decoder signatures, and JVM-side frame sampling via
``substring`` over binary.

Scale notes: payloads stay opaque bytes end-to-end (no driver collect);
decode is a map-only ``mapInPandas`` — embarrassingly parallel, batch
size bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``; frame
sampling is a generated-column explode, no Python in the loop.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

FRAME_BYTES = 100  # stub "frame" size for the video-style chunker


def attach_payload(docs: DataFrame) -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata, the
    shape a real multimodal table would have: (id, payload binary,
    media_type string, meta struct<n_bytes bigint>). Here the payload is
    the UTF-8 encoding of the text column (a deterministic stand-in for
    image/audio bytes)."""
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.struct(F.octet_length(F.col("text")).cast("bigint").alias("n_bytes")).alias("meta"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection over the payload table: byte length and
    stub frame count (ceil(n_bytes / FRAME_BYTES)) — all JVM-side."""
    t = attach_payload(load_table(spark, sf_dir, "documents"))
    n_bytes = F.col("meta.n_bytes")
    n_frames = F.ceil(n_bytes.cast("double") / F.lit(float(FRAME_BYTES))).cast("bigint")
    return t.select("doc_id", n_bytes.alias("n_bytes"), n_frames.alias("n_frames"))


def frame_sample(docs_with_payload: DataFrame, frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """Video-style frame sampling without Python: slice the binary
    payload into fixed-size chunks via ``substring`` over a generated
    index sequence, then explode. (doc_id, frame_idx, frame binary)."""
    n_frames = F.ceil(
        F.octet_length("payload").cast("double") / F.lit(float(frame_bytes))
    ).cast("int")
    return (
        docs_with_payload.withColumn("n_frames", n_frames)
        .filter(F.col("n_frames") > 0)
        .select(
            "doc_id",
            F.explode(F.expr(
                f"transform(sequence(0, n_frames - 1), "
                f"i -> struct(i as frame_idx, substring(payload, i * {frame_bytes} + 1, {frame_bytes}) as frame))"
            )).alias("f"),
        )
        .select("doc_id", F.col("f.frame_idx").alias("frame_idx"), F.col("f.frame").alias("frame"))
    )


def decode_features(
    docs_with_payload: DataFrame, mode: str = "stub"
) -> DataFrame:
    """Arrow-batched decoder: payload → feature row.

    ``mode="stub"`` emits deterministic fake features (length + a stable
    checksum of the bytes) so the distributed plumbing — schema, batch
    shape, partition parallelism — is fully exercised. ``mode="real"``
    raises ``NotImplementedError``: plug a real image/audio decoder into
    ``_decode_one`` when the libraries exist.
    """
    schema = "doc_id bigint, n_bytes bigint, checksum bigint, feature array<double>"

    def _decode_one(payload: bytes) -> tuple[int, list[float]]:
        if mode == "real":
            raise NotImplementedError(
                "real media decode requires image/audio libraries not present "
                "in this container — stub mode exercises the full Spark path"
            )
        import zlib

        crc = zlib.crc32(payload)
        # deterministic fake 4-dim feature derived from the bytes
        feat = [
            float(len(payload)),
            float(crc & 0xFFFF),
            float((crc >> 16) & 0xFFFF),
            float(payload[0]) if payload else 0.0,
        ]
        return crc, feat

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "checksum": [], "feature": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                crc, feat = _decode_one(data)
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(data))
                out["checksum"].append(crc)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return docs_with_payload.select("doc_id", "payload").mapInPandas(run, schema=schema)


def byte_histogram_features(docs_with_payload: DataFrame) -> DataFrame:
    """REAL (non-stub) feature extraction over binary payloads: 16-bin
    byte histogram + Shannon entropy per document, computed with numpy
    over Arrow batches (``mapInPandas``).

    This is the feature family that needs no media codec — byte
    distributions and entropy are what corpus-level corruption / format
    drift monitors actually run on mixed binary columns. Map-only,
    embarrassingly parallel; the histogram is 16 doubles per row
    regardless of payload size.
    """
    schema = "doc_id bigint, entropy double, hist array<double>"

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "entropy": [], "hist": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = np.frombuffer(
                    bytes(payload) if payload is not None else b"", dtype=np.uint8
                )
                if data.size:
                    counts = np.bincount(data >> 4, minlength=16).astype(
                        np.float64
                    )
                    p = counts / counts.sum()
                    nz = p[p > 0]
                    entropy = float(-(nz * np.log2(nz)).sum())
                    hist = list(np.round(p, 6))
                else:
                    entropy, hist = 0.0, [0.0] * 16
                out["doc_id"].append(doc_id)
                out["entropy"].append(round(entropy, 6))
                out["hist"].append(hist)
            yield pd.DataFrame(out)

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        run, schema=schema
    )


def resize_payload(
    docs_with_payload: DataFrame, factor: int = 4, mode: str = "decimate"
) -> DataFrame:
    """"Resize" for binary payloads: keep every ``factor``-th byte
    (numpy slice over Arrow batches) — the raw-bytes analog of
    image/audio downsampling, real and testable without codecs.

    ``mode="image"`` raises ``NotImplementedError``: a real deployment
    plugs ``cv2.resize``/``PIL`` into the same ``mapInPandas``
    signature — schema, batching, and parallelism are identical, only
    the per-payload function changes.  The check runs driver-side,
    before any plan is built, so the unsupported mode fails immediately
    instead of surfacing as an executor task failure (or not at all on
    an empty input).
    """
    if mode == "image":
        raise NotImplementedError(
            "image resize requires codec libraries not present in this "
            "container — decimate mode exercises the same Spark path"
        )
    if mode != "decimate":
        raise ValueError(f"unknown resize mode: {mode!r}")
    schema = "doc_id bigint, payload binary, n_bytes bigint"

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "payload": [], "n_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = np.frombuffer(
                    bytes(payload) if payload is not None else b"", dtype=np.uint8
                )
                small = data[::factor].tobytes()
                out["doc_id"].append(doc_id)
                out["payload"].append(small)
                out["n_bytes"].append(len(small))
            yield pd.DataFrame(out)

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        run, schema=schema
    )
