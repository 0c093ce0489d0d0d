"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, chunking, and a Pandas-UDF decode/feature-extract stage.

The driver corpus has no real image/audio bytes, so payloads are
synthesized from document text (``encode(text)``) — but every piece of
Spark plumbing is real: binary columns flow through codegen, chunking is an
explode over a computed range, and the decode stage is a ``mapInPandas``
batch iterator with a declared output schema, exactly the shape a real
image decoder plugs into. The actual pixel decode is STUBBED (no imaging
libraries in this environment): ``decode_stub_features`` derives
deterministic fake features from the bytes, and ``decode_real`` raises
``NotImplementedError`` with the intended contract documented.

Scale posture: binary payloads never pass through Python except inside the
Arrow-batched ``mapInPandas`` stage; chunking emits (doc_id, chunk) rows
sized for downstream batch processing, the standard pattern for feeding
100 TB of media through per-record decoders.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

from .registry import query

CHUNK_CHARS = 120


@query(
    "multimodal_byte_stats",
    oracle="""
        SELECT doc_id,
               CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
               CAST(CEIL(OCTET_LENGTH(ENCODE(text)) / 120.0) AS BIGINT) AS n_chunks
        FROM documents
    """,
    covers="pipeline: multimodal metadata (payload byte length, chunk plan)",
)
def multimodal_byte_stats(spark, t):
    """Typed metadata over a synthesized binary payload column."""
    n_bytes = F.octet_length("text").cast("long")
    return t["documents"].select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.ceil(n_bytes / float(CHUNK_CHARS)).cast("long").alias("n_chunks"),
    )


@query(
    "multimodal_chunking",
    oracle=f"""
        WITH n AS (
            SELECT doc_id, text,
                   CAST(CEIL(LENGTH(text) / {CHUNK_CHARS}.0) AS BIGINT) AS n_chunks
            FROM documents
        ),
        c AS (
            SELECT doc_id,
                   UNNEST(GENERATE_SERIES(1, GREATEST(n_chunks, 1))) AS chunk_id,
                   text
            FROM n
        )
        SELECT doc_id, chunk_id,
               SUBSTRING(text, CAST((chunk_id - 1) * {CHUNK_CHARS} + 1 AS INT),
                         {CHUNK_CHARS}) AS chunk_text,
               CAST(OCTET_LENGTH(ENCODE(SUBSTRING(text,
                         CAST((chunk_id - 1) * {CHUNK_CHARS} + 1 AS INT),
                         {CHUNK_CHARS}))) AS BIGINT) AS chunk_bytes
        FROM c
    """,
    covers="pipeline: payload chunking (fixed-size windows via computed explode)",
)
def multimodal_chunking(spark, t):
    """Split each payload into fixed-size chunks with ordinals — the unit
    of work for batch decoders. explode over a computed ``sequence``; no
    Python, no shuffle."""
    d = t["documents"]
    n_chunks = F.ceil(F.length("text") / float(CHUNK_CHARS)).cast("long")
    chunk_text = F.expr(
        f"substring(text, cast((chunk_id - 1) * {CHUNK_CHARS} + 1 as int), {CHUNK_CHARS})"
    )
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.greatest(n_chunks, F.lit(1).cast("long")))
            ).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            chunk_text.alias("chunk_text"),
            F.octet_length(chunk_text).cast("long").alias("chunk_bytes"),
        )
    )


# ---------------------------------------------------------------------------
# Pandas-UDF decode stage
# ---------------------------------------------------------------------------

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, channels int, "
    "mean_intensity double"
)


def decode_stub_features(df: DataFrame) -> DataFrame:
    """'Decode' binary payloads into image-like features via mapInPandas.

    STUB: real pixel decoding needs an imaging library not present in this
    environment; features here are deterministic functions of the bytes so
    the full pipeline (binary column -> Arrow batch -> pandas -> typed rows)
    is exercised end-to-end and oracle-checkable. Swap ``_fake_decode`` for
    e.g. PIL/libvips in production — the schema, batching, and partitioning
    are already the real thing.
    """
    blob_df = df.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def _fake_decode(batches: Iterator) -> Iterator:
        for pdf in batches:
            n = pdf["payload"].map(len)
            out = pdf[["doc_id"]].copy()
            out["n_bytes"] = n
            out["width"] = (n % 640 + 1).astype("int32")
            out["height"] = (n * 7 % 480 + 1).astype("int32")
            out["channels"] = 3
            out["mean_intensity"] = (
                pdf["payload"].map(lambda b: sum(b[:64])) / 64.0
            )
            yield out

    return blob_df.mapInPandas(_fake_decode, schema=DECODE_SCHEMA)


def decode_real(df: DataFrame) -> DataFrame:
    """Contract for the real decoder (images): same output schema as
    :func:`decode_stub_features`, implemented with an imaging library over
    the same mapInPandas iterator. Not available in this environment."""
    raise NotImplementedError(
        "real media decoding requires an imaging library (e.g. PIL) not "
        "present in this environment; use decode_stub_features for the "
        "pipeline plumbing"
    )


@query(
    "multimodal_decode_features",
    oracle="""
        SELECT doc_id,
               CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
               CAST(OCTET_LENGTH(ENCODE(text)) % 640 + 1 AS INT) AS width,
               CAST(OCTET_LENGTH(ENCODE(text)) * 7 % 480 + 1 AS INT) AS height,
               3 AS channels,
               -- text is ASCII, so byte values == code points
               LIST_SUM(LIST_TRANSFORM(RANGE(1, LEAST(LENGTH(text), 64) + 1),
                                       i -> ASCII(SUBSTRING(text, i, 1)))) / 64.0
                   AS mean_intensity
        FROM documents
    """,
    covers="pipeline: multimodal decode stage (mapInPandas, Arrow-batched; stubbed pixels)",
)
def multimodal_decode_features(spark, t):
    """The decode stage as a registered query — proves the Pandas-UDF
    plumbing produces typed, deterministic, oracle-matching output."""
    return decode_stub_features(t["documents"])
