"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, chunking, and a Pandas-UDF decode/feature-extract stage.

The driver corpus has no real image/audio bytes, so payloads are
synthesized from document text (``encode(text)``) — but every piece of
Spark plumbing is real: binary columns flow through codegen, chunking is an
explode over a computed range, and the decode stage is a ``mapInPandas``
batch iterator with a declared output schema, exactly the shape a real
image decoder plugs into. Decoding comes in two tiers:
``decode_stub_features`` derives deterministic fake features from raw
bytes (any payload), and ``decode_real`` is a REAL decoder for binary PPM
(P6) — netpbm header grammar plus raster statistics in pure numpy, no
imaging library needed — verified end-to-end by
``multimodal_decode_ppm_real`` over JVM-synthesized P6 images. Compressed
codecs (JPEG/PNG) still need a library absent from this environment; they
replace the parse function, nothing else.

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
    """INTERNAL FALLBACK, not a registered query (r07 verdict: no registry
    entry may return fabricated features now that :func:`decode_real`
    exists): deterministic byte-derived pseudo-features for payloads in
    formats this environment has no codec for (JPEG/PNG/WebP need a
    library that is not installed). Callers route decodable formats
    (PNM P5/P6) through :func:`decode_real` and may route the rest here
    EXPLICITLY — the stub never sits on a correctness-checked path. The
    Arrow plumbing (binary column -> Arrow batch -> pandas -> typed rows)
    is identical to the real decoder's, so swapping in PIL/libvips
    changes only the per-row kernel.
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


def _make_ppm_kernel():
    """Build the PNM parser and its mapInPandas kernel as LOCAL closures:
    cloudpickle serializes local functions by value, so Python workers
    never need this package importable on their own sys.path (the
    streaming/stateful.py pattern — a module-level function pickles as a
    module reference and raises ModuleNotFoundError on any worker whose
    PYTHONPATH lacks the repo)."""

    def parse_pnm(buf: bytes) -> tuple:
        """Parse one binary netpbm image — P5 (grayscale, 1 byte/px) or
        P6 (RGB, 3 bytes/px), dispatched on the magic — into
        (width, height, channels, mean raster byte). Header grammar per
        the netpbm spec: magic, then three decimal fields (width, height,
        maxval) separated by whitespace runs with ``#``-to-end-of-line
        comments allowed BETWEEN fields, then exactly ONE whitespace byte
        before the raster (the spec allows no comment there — a
        non-whitespace byte after maxval is rejected loudly rather than
        misread as raster)."""
        magic = buf[:2]
        if magic == b"P6":
            channels = 3
        elif magic == b"P5":
            channels = 1
        else:
            raise ValueError(f"not a P5/P6 PNM payload (magic {magic!r})")
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(buf) and buf[pos : pos + 1].isspace():
                pos += 1
            if buf[pos : pos + 1] == b"#":
                while pos < len(buf) and buf[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(buf) and buf[pos : pos + 1].isdigit():
                pos += 1
            if start == pos:
                raise ValueError("malformed PPM header")
            fields.append(int(buf[start:pos]))
        if not buf[pos : pos + 1].isspace():
            raise ValueError("malformed PPM header: no whitespace after maxval")
        pos += 1  # the single whitespace byte after maxval
        width, height, maxval = fields
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        if width < 1 or height < 1:
            raise ValueError(f"zero-dimension image ({width}x{height})")
        n = width * height * channels
        raster = buf[pos : pos + n]
        if len(raster) != n:
            raise ValueError(f"truncated raster: {len(raster)} of {n} bytes")
        if len(buf) != pos + n:
            raise ValueError(
                f"{len(buf) - pos - n} trailing bytes after the raster"
            )
        import numpy as np

        px = np.frombuffer(raster, dtype=np.uint8)
        return width, height, channels, float(int(px.sum(dtype=np.int64))) / n

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                w, h, ch, mean = parse_pnm(buf)
                rows.append((doc_id, len(buf), w, h, ch, mean))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "width", "height", "channels",
                    "mean_intensity",
                ],
            )

    return parse_pnm, decode


_parse_pnm, _PPM_DECODE_KERNEL = _make_ppm_kernel()


def decode_real(df: DataFrame) -> DataFrame:
    """REAL image decode over a binary payload column — pure-numpy parsing
    of binary netpbm images, dispatched on the magic bytes (P5 grayscale /
    P6 RGB), so the decode stage needs no imaging library at all. Output
    schema is :data:`DECODE_SCHEMA` (mean_intensity is the true mean over
    every pixel byte of the raster; channels reports the decoded format).
    Compressed formats (JPEG/PNG/WebP) still require a codec library not
    present in this environment — route those payloads through
    :func:`decode_stub_features` explicitly, or plug a codec into this
    same iterator by extending :func:`_parse_pnm`.

    Per-image Python is inherent to decoding (a PIL/libvips call is
    per-image too); the batch loop stays Arrow-fed and the per-image heavy
    part (the raster reduction) is one vectorized numpy sum.
    """
    return df.mapInPandas(_PPM_DECODE_KERNEL, schema=DECODE_SCHEMA)


#: Synthesized-PPM geometry: width varies per document (4..16), height is
#: fixed — variable dimensions make the oracle check prove the header is
#: actually parsed, not assumed.
PPM_HEIGHT = 8


def ppm_payload() -> F.Column:
    """A valid binary-PPM (P6) payload whose raster bytes are the leading
    ``width * height * 3`` characters of the document text (space-padded)
    — built entirely JVM-side with no Python in the synthesis path.

    Dimensions and slicing are all in CHARACTERS (``length``/``substring``
    /``rpad``) so the Spark construction and the oracle's reconstruction
    agree by definition; the corpus is ASCII so characters encode 1:1 to
    raster bytes. A non-ASCII document would encode to MORE than
    ``w*h*3`` bytes — the decoder's exact-length check rejects that
    payload loudly (trailing-bytes error) instead of mis-decoding."""
    w = (F.length("text") % 13 + 4).cast("int")
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(f" {PPM_HEIGHT}\n255\n")
    )
    raster = F.expr(
        "rpad(substring(text, 1, (length(text) % 13 + 4) * "
        f"{PPM_HEIGHT * 3}), (length(text) % 13 + 4) * "
        f"{PPM_HEIGHT * 3}, ' ')"
    )
    return F.concat(F.encode(header, "UTF-8"), F.encode(raster, "UTF-8"))


@query(
    "multimodal_decode_ppm_real",
    oracle=f"""
        WITH g AS (
            SELECT doc_id,
                   LENGTH(text) % 13 + 4 AS w,
                   RPAD(SUBSTRING(text, 1,
                            (LENGTH(text) % 13 + 4) * {PPM_HEIGHT * 3}),
                        CAST((LENGTH(text) % 13 + 4)
                             * {PPM_HEIGHT * 3} AS INT),
                        ' ') AS px
            FROM documents
        )
        SELECT doc_id,
               CAST(LENGTH('P6' || CHR(10) || w || ' {PPM_HEIGHT}' || CHR(10)
                           || '255' || CHR(10)) + w * {PPM_HEIGHT * 3} AS BIGINT)
                   AS n_bytes,
               CAST(w AS INT) AS width,
               {PPM_HEIGHT} AS height,
               3 AS channels,
               LIST_SUM(LIST_TRANSFORM(RANGE(1, w * {PPM_HEIGHT * 3} + 1),
                                       i -> ASCII(SUBSTRING(px, i, 1))))
                   / CAST(w * {PPM_HEIGHT * 3} AS DOUBLE) AS mean_intensity
        FROM g
    """,
    covers="pipeline: REAL multimodal decode (binary PPM P6 parsed with "
    "numpy in the Arrow-batched decode stage; true raster statistics)",
)
def multimodal_decode_ppm_real(spark, t):
    """End-to-end REAL decode: synthesize a valid P6 image per document
    JVM-side (:func:`ppm_payload`), parse it for real in the decode stage
    (:func:`decode_real` — header grammar + raster reduction, pure numpy),
    and verify true per-image statistics against the oracle's independent
    reconstruction. Variable widths prove the header is parsed, not
    assumed."""
    return decode_real(
        t["documents"].select("doc_id", ppm_payload().alias("payload"))
    )


def pnm_payload() -> F.Column:
    """A mixed-format binary-PNM payload: even doc_ids carry P6 (RGB),
    odd doc_ids carry P5 (grayscale) — same width formula as
    :func:`ppm_payload`, raster chars scaled by the channel count. Built
    JVM-side; ASCII text encodes 1:1 to raster bytes (non-ASCII is
    rejected by the decoder's exact-length check, as for P6)."""
    w = (F.length("text") % 13 + 4).cast("int")
    ch_sql = "(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END)"
    magic = F.when(F.col("doc_id") % 2 == 0, F.lit("P6")).otherwise(F.lit("P5"))
    header = F.concat(
        magic, F.lit("\n"), w.cast("string"), F.lit(f" {PPM_HEIGHT}\n255\n")
    )
    nchars = f"(length(text) % 13 + 4) * {PPM_HEIGHT} * {ch_sql}"
    raster = F.expr(f"rpad(substring(text, 1, {nchars}), {nchars}, ' ')")
    return F.concat(F.encode(header, "UTF-8"), F.encode(raster, "UTF-8"))


@query(
    "multimodal_decode_pnm_dispatch",
    oracle=f"""
        WITH g AS (
            SELECT doc_id,
                   LENGTH(text) % 13 + 4 AS w,
                   CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS ch,
                   text
            FROM documents
        ), p AS (
            SELECT doc_id, w, ch,
                   RPAD(SUBSTRING(text, 1, w * {PPM_HEIGHT} * ch),
                        CAST(w * {PPM_HEIGHT} * ch AS INT), ' ') AS px
            FROM g
        )
        SELECT doc_id,
               CAST(LENGTH('P6' || CHR(10) || w || ' {PPM_HEIGHT}' || CHR(10)
                           || '255' || CHR(10)) + w * {PPM_HEIGHT} * ch
                    AS BIGINT) AS n_bytes,
               CAST(w AS INT) AS width,
               {PPM_HEIGHT} AS height,
               CAST(ch AS INT) AS channels,
               LIST_SUM(LIST_TRANSFORM(RANGE(1, w * {PPM_HEIGHT} * ch + 1),
                                       i -> ASCII(SUBSTRING(px, i, 1))))
                   / CAST(w * {PPM_HEIGHT} * ch AS DOUBLE) AS mean_intensity
        FROM p
    """,
    covers="pipeline: multimodal decode stage with FORMAT DISPATCH — a "
    "mixed P5(grayscale)/P6(RGB) corpus decoded for real by magic-byte "
    "routing in one Arrow-batched kernel (replaces the retired "
    "fabricated-feature stub entry, r07 verdict item 3)",
)
def multimodal_decode_pnm_dispatch(spark, t):
    """Format-dispatched REAL decode: a corpus mixing two binary image
    formats (P5 grayscale for odd doc_ids, P6 RGB for even) goes through
    ONE decode stage that routes on magic bytes — the shape of a
    production multimodal ingest, where a single binary column carries
    heterogeneous formats. Channels (1 vs 3) and true raster means are
    verified against the oracle's independent per-format reconstruction.

    The P6 magic in the oracle's n_bytes expression is length-equivalent
    for P5 ('P5'/'P6' are both 2 chars), so one expression serves both.
    """
    return decode_real(
        t["documents"].select("doc_id", pnm_payload().alias("payload"))
    )


RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, out_width int, out_height int, "
    "scale double"
)

TARGET_EDGE = 224


def resize_stub(decoded: DataFrame) -> DataFrame:
    """Resize planning stage over decoded frames (mapInPandas): compute the
    aspect-preserving fit into TARGET_EDGE^2 and the scale factor.

    STUB at the pixel level (no imaging library), real at the plumbing
    level: the stage consumes the decode stage's Arrow batches, does
    vectorized per-batch arithmetic in pandas, and emits a typed schema —
    swap the arithmetic for actual resampling in production.
    """

    def _resize(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = pdf[["doc_id", "width", "height"]].copy()
            long_edge = out[["width", "height"]].max(axis=1)
            scale = TARGET_EDGE / long_edge
            out["out_width"] = (out["width"] * scale).round().astype("int32").clip(lower=1)
            out["out_height"] = (out["height"] * scale).round().astype("int32").clip(lower=1)
            out["scale"] = scale
            yield out[["doc_id", "width", "height", "out_width", "out_height", "scale"]]

    return decoded.mapInPandas(_resize, schema=RESIZE_SCHEMA)


@query(
    "multimodal_resize_plan",
    oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   CAST(LENGTH(text) % 13 + 4 AS INT) AS width,
                   CAST({PPM_HEIGHT} AS INT) AS height
            FROM documents
        )
        SELECT doc_id, width, height,
               CAST(GREATEST(ROUND(width * ({TARGET_EDGE}.0
                                            / GREATEST(width, height))), 1)
                    AS INT) AS out_width,
               CAST(GREATEST(ROUND(height * ({TARGET_EDGE}.0
                                             / GREATEST(width, height))), 1)
                    AS INT) AS out_height,
               {TARGET_EDGE}.0 / GREATEST(width, height) AS scale
        FROM d
    """,
    covers="pipeline: multimodal resize stage (chained mapInPandas over "
    "REAL decoded dimensions, aspect-preserving)",
)
def multimodal_resize_plan(spark, t):
    """Decode -> resize as two chained Arrow-batched stages (the schema
    handoff between Pandas-UDF stages is the part worth proving). Since
    r08 the upstream stage is the REAL P6 decoder over JVM-synthesized
    payloads — the resize plan operates on genuinely parsed dimensions,
    not byte-derived pseudo-dims (r07 verdict item 3). No rounding-mode
    hazard in the oracle compare: with height fixed at {PPM_HEIGHT} and
    width in 4..16, no scaled edge lands on a .5 (pandas rounds
    half-even, SQL half-away — they'd diverge exactly there)."""
    return resize_stub(
        decode_real(
            t["documents"].select("doc_id", ppm_payload().alias("payload"))
        )
    )


FRAME_BYTES = 256
SAMPLE_EVERY = 4


@query(
    "multimodal_frame_sample",
    oracle=f"""
        WITH v AS (
            SELECT doc_id,
                   CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
                   GREATEST(CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) // {FRAME_BYTES}, 1)
                       AS n_frames
            FROM documents
        ),
        f AS (
            SELECT doc_id, n_frames,
                   UNNEST(GENERATE_SERIES(0, CAST(n_frames - 1 AS BIGINT), {SAMPLE_EVERY}))
                       AS frame_idx
            FROM v
        )
        SELECT doc_id, n_frames, frame_idx,
               frame_idx * {FRAME_BYTES} AS byte_offset
        FROM f
    """,
    covers="pipeline: multimodal frame sampling (every k-th frame via stepped sequence)",
)
def multimodal_frame_sample(spark, t):
    """Video-style frame sampling plan: treat the payload as fixed-size
    frames, keep every SAMPLE_EVERY-th index with its byte offset — the
    row set a real frame decoder consumes. Stepped ``sequence`` + explode;
    no Python, no shuffle."""
    d = t["documents"]
    n_bytes = F.octet_length("text").cast("long")
    n_frames = F.greatest(n_bytes / F.lit(FRAME_BYTES), F.lit(1)).cast("long")
    return (
        d.select(
            "doc_id",
            n_frames.alias("n_frames"),
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    (n_frames - 1),
                    F.lit(SAMPLE_EVERY).cast("long"),
                )
            ).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "n_frames",
            "frame_idx",
            (F.col("frame_idx") * FRAME_BYTES).alias("byte_offset"),
        )
    )


# ---------------------------------------------------------------------------
# Audio: real WAV/PCM decode (second modality, same discipline as PNM)
# ---------------------------------------------------------------------------

WAV_RATE = 8000
#: Samples per synthesized clip cap — keeps payloads bounded per doc.
WAV_MAX_SAMPLES = 200

AUDIO_SCHEMA = (
    "doc_id bigint, n_bytes bigint, sample_rate int, channels int, "
    "n_samples bigint, mean_amplitude double"
)


def _make_wav_kernel():
    """WAV parser + mapInPandas kernel as LOCAL closures (pickled by
    value — the PPM kernel's worker-import discipline)."""

    def parse_wav(buf: bytes) -> tuple:
        """Parse one RIFF/WAVE file containing 16-bit mono/stereo PCM:
        (sample_rate, channels, n_samples, mean |amplitude|). Walks the
        chunk list per the RIFF spec (chunks are (id, LE32 size, body,
        pad-to-even)), so fmt/data order and extra chunks are handled;
        truncation, non-PCM formats, and size-field lies are rejected
        loudly rather than mis-read."""
        import struct

        if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
            raise ValueError(f"not a RIFF/WAVE payload ({buf[:4]!r})")
        (riff_size,) = struct.unpack_from("<I", buf, 4)
        if riff_size != len(buf) - 8:
            raise ValueError(
                f"RIFF size field {riff_size} != actual {len(buf) - 8}"
            )
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            (csz,) = struct.unpack_from("<I", buf, pos + 4)
            body = buf[pos + 8 : pos + 8 + csz]
            if len(body) != csz:
                raise ValueError(f"truncated chunk {cid!r}: {len(body)}/{csz}")
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            pos += 8 + csz + (csz & 1)  # chunks are padded to even
        if fmt is None or data is None:
            raise ValueError("missing fmt or data chunk")
        audio_fmt, channels, rate, _brate, _align, bits = struct.unpack_from(
            "<HHIIHH", fmt, 0
        )
        if audio_fmt != 1 or bits != 16:
            raise ValueError(f"unsupported format (fmt={audio_fmt}, bits={bits})")
        if len(data) % (2 * channels):
            raise ValueError("data chunk not sample-aligned")
        import numpy as np

        samples = np.frombuffer(data, dtype="<i2")
        n = len(samples) // channels
        if n < 1:
            raise ValueError("empty data chunk")
        mean_abs = float(int(np.abs(samples.astype(np.int64)).sum())) / len(samples)
        return rate, channels, n, mean_abs

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                rate, ch, n, mean_abs = parse_wav(buf)
                rows.append((doc_id, len(buf), rate, ch, n, mean_abs))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "sample_rate", "channels",
                    "n_samples", "mean_amplitude",
                ],
            )

    return parse_wav, decode


_parse_wav, _WAV_DECODE_KERNEL = _make_wav_kernel()


def decode_wav_real(df: DataFrame) -> DataFrame:
    """REAL audio decode over a binary payload column — RIFF chunk walk +
    16-bit PCM raster statistics in pure numpy (struct/npfrombuffer), no
    audio library. Compressed codecs (MP3/Opus) plug in by extending
    :func:`_parse_wav` or routing to :func:`decode_stub_features`."""
    return df.mapInPandas(_WAV_DECODE_KERNEL, schema=AUDIO_SCHEMA)


def _le_hex(col: F.Column, n_bytes: int) -> F.Column:
    """Little-endian hex encoding of an integer column, ``n_bytes`` wide —
    the JVM-side building block for binary container synthesis (there is
    no to-binary-LE builtin; hex + one final unhex is)."""
    parts = [
        F.lpad(F.hex(F.shiftright(col.cast("long"), 8 * i) % 256), 2, "0")
        for i in range(n_bytes)
    ]
    return F.concat(*parts)


def wav_payload() -> F.Column:
    """A valid 16-bit mono PCM WAV per document, built entirely JVM-side:
    samples are the document's leading character codes modulo 256 (capped
    at WAV_MAX_SAMPLES, space-padded to at least one sample like the
    PNM/Y4M builders — empty text would otherwise emit an empty data
    chunk the parser loudly rejects, and codepoints > 255 would silently
    truncate through lpad(hex(..), 2)), so the oracle can reconstruct
    every statistic from the text. The whole container is assembled as
    hex and un-hexed once."""
    n_sql = f"GREATEST(LEAST(length(text), {WAV_MAX_SAMPLES}), 1)"
    n = F.expr(n_sql).cast("long")
    data_sz = n * 2
    riff_sz = data_sz + 36
    sample_hex = F.expr(
        f"array_join(transform("
        f"split(rpad(substring(text, 1, {WAV_MAX_SAMPLES}), {n_sql}, ' '), ''),"
        " c -> concat(lpad(hex(pmod(ascii(c), 256)), 2, '0'), '00')), '')"
    )
    hdr = F.concat(
        F.lit("52494646"),                    # 'RIFF'
        _le_hex(riff_sz, 4),
        F.lit("57415645666D742010000000"),    # 'WAVE' 'fmt ' LE32(16)
        F.lit("0100"), F.lit("0100"),         # PCM, 1 channel
        _le_hex(F.lit(WAV_RATE), 4),
        _le_hex(F.lit(WAV_RATE * 2), 4),      # byte rate
        F.lit("0200"), F.lit("1000"),         # block align 2, 16 bits
        F.lit("64617461"),                    # 'data'
        _le_hex(data_sz, 4),
        sample_hex,
    )
    return F.unhex(hdr)


@query(
    "multimodal_decode_wav_real",
    oracle=f"""
        WITH g AS (
            SELECT doc_id,
                   GREATEST(LEAST(LENGTH(text), {WAV_MAX_SAMPLES}), 1) AS n,
                   RPAD(SUBSTRING(text, 1, {WAV_MAX_SAMPLES}),
                        CAST(GREATEST(LEAST(LENGTH(text),
                                            {WAV_MAX_SAMPLES}), 1) AS INT),
                        ' ') AS px
            FROM documents
        )
        SELECT doc_id,
               CAST(44 + n * 2 AS BIGINT) AS n_bytes,
               {WAV_RATE} AS sample_rate,
               1 AS channels,
               CAST(n AS BIGINT) AS n_samples,
               LIST_SUM(LIST_TRANSFORM(RANGE(1, n + 1),
                                       i -> ASCII(SUBSTRING(px, i, 1)) % 256))
                   / CAST(n AS DOUBLE) AS mean_amplitude
        FROM g
    """,
    covers="pipeline: REAL audio decode — RIFF/WAVE chunk walk + 16-bit "
    "PCM statistics in pure numpy over the Arrow-batched decode stage "
    "(second modality beside the PNM image decoder)",
)
def multimodal_decode_wav_real(spark, t):
    """End-to-end REAL audio decode: synthesize a valid mono 16-bit PCM
    WAV per document JVM-side (:func:`wav_payload` — RIFF container
    assembled as hex, one unhex), walk its chunk list and reduce the PCM
    raster for real in the decode stage (:func:`decode_wav_real`), and
    verify true per-clip statistics (sample count, mean |amplitude|)
    against the oracle's reconstruction from the same text. ASCII codes
    are non-negative, so mean |amplitude| equals the plain mean the SQL
    computes; the sum is exact integer, one double division on both
    engines."""
    return decode_wav_real(
        t["documents"].select("doc_id", wav_payload().alias("payload"))
    )


# ---------------------------------------------------------------------------
# Video: real Y4M (YUV4MPEG2) decode — the third modality
# ---------------------------------------------------------------------------

Y4M_W = 4
Y4M_H = 4
#: 4:2:0 frame size: Y (w*h) + U + V (w/2 * h/2 each).
Y4M_FRAME_BYTES = Y4M_W * Y4M_H * 3 // 2
Y4M_MAX_FRAMES = 8
#: Frame-sampling stride for the statistics (every 2nd frame).
Y4M_SAMPLE_EVERY = 2

VIDEO_SCHEMA = (
    "doc_id bigint, width int, height int, n_frames bigint, "
    "n_sampled bigint, mean_sampled_luma double"
)


def _make_y4m_kernel():
    """Y4M parser + mapInPandas kernel as LOCAL closures (pickled by
    value — the PNM/WAV kernels' worker-import discipline)."""

    def parse_y4m(buf: bytes) -> tuple:
        """Parse one YUV4MPEG2 stream (C420 only): stream header
        'YUV4MPEG2 <params>\\n' with W/H/C parameters, then per frame
        'FRAME<params>\\n' + w*h*3/2 raster bytes. Returns
        (width, height, n_frames, n_sampled, mean luma over every
        Y4M_SAMPLE_EVERY-th frame) — the frame-sampling reduction a
        video ingest runs. Truncation, unknown colourspaces, and junk
        between frames are rejected loudly."""
        import numpy as np

        nl = buf.find(b"\n")
        if not buf.startswith(b"YUV4MPEG2 ") or nl < 0:
            raise ValueError(f"not a YUV4MPEG2 stream ({buf[:9]!r})")
        width = height = None
        c420 = True
        for tok in buf[10:nl].split(b" "):
            if tok[:1] == b"W":
                width = int(tok[1:])
            elif tok[:1] == b"H":
                height = int(tok[1:])
            elif tok[:1] == b"C":
                c420 = tok[1:].startswith(b"420")
        if not width or not height:
            raise ValueError("stream header missing W or H")
        if not c420:
            raise ValueError("only C420 is supported")
        if width % 2 or height % 2:
            raise ValueError(f"odd C420 dimensions ({width}x{height})")
        fsz = width * height * 3 // 2
        ysz = width * height
        pos, lumas = nl + 1, []
        while pos < len(buf):
            if buf[pos : pos + 5] != b"FRAME":
                raise ValueError(f"junk at frame boundary (offset {pos})")
            fnl = buf.find(b"\n", pos)
            if fnl < 0:
                raise ValueError("unterminated FRAME header")
            frame = buf[fnl + 1 : fnl + 1 + fsz]
            if len(frame) != fsz:
                raise ValueError(f"truncated frame: {len(frame)}/{fsz} bytes")
            lumas.append(np.frombuffer(frame[:ysz], dtype=np.uint8))
            pos = fnl + 1 + fsz
        if not lumas:
            raise ValueError("stream contains no frames")
        sampled = lumas[::Y4M_SAMPLE_EVERY]
        total = sum(int(arr.sum(dtype=np.int64)) for arr in sampled)
        return (
            width, height, len(lumas), len(sampled),
            float(total) / (len(sampled) * ysz),
        )

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, nf, ns, mean = parse_y4m(bytes(payload))
                rows.append((doc_id, w, h, nf, ns, mean))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_frames", "n_sampled",
                    "mean_sampled_luma",
                ],
            )

    return parse_y4m, decode


_parse_y4m, _Y4M_DECODE_KERNEL = _make_y4m_kernel()


def decode_y4m_real(df: DataFrame) -> DataFrame:
    """REAL video decode over a binary payload column — YUV4MPEG2 stream +
    frame headers parsed in pure numpy/bytes, with every-Nth frame-sampled
    luma statistics (the sampling reduction a 100 TB video ingest runs
    before feature extraction). Compressed codecs (H.264 et al.) need a
    library absent here; they extend :func:`_parse_y4m` or route to
    :func:`decode_stub_features`."""
    return df.mapInPandas(_Y4M_DECODE_KERNEL, schema=VIDEO_SCHEMA)


def y4m_payload() -> F.Column:
    """A valid C420 YUV4MPEG2 clip per document, built JVM-side: frame
    count scales with document length (capped at Y4M_MAX_FRAMES), raster
    bytes are the document's leading characters space-padded — so the
    oracle can reconstruct every sampled-luma statistic from the text."""
    # ONE SQL fragment for the frame count, interpolated everywhere it
    # is needed (an unused Column twin of this expression drifted from
    # the strings in the first cut — r08 review finding).
    nf = f"GREATEST(LEAST(length(text) DIV {Y4M_FRAME_BYTES}, {Y4M_MAX_FRAMES}), 1)"
    total = f"({nf} * {Y4M_FRAME_BYTES})"
    body = F.expr(
        f"aggregate(sequence(0, {nf} - 1), '', "
        "(acc, i) -> concat(acc, 'FRAME\\n', "
        f"substring(rpad(substring(text, 1, {total}), {total}, ' '), "
        f"i * {Y4M_FRAME_BYTES} + 1, {Y4M_FRAME_BYTES})))"
    )
    header = F.lit(f"YUV4MPEG2 W{Y4M_W} H{Y4M_H} F25:1 Ip A1:1 C420\n")
    return F.encode(F.concat(header, body), "UTF-8")


@query(
    "multimodal_decode_y4m_real",
    oracle=f"""
        WITH g AS (
            SELECT doc_id,
                   GREATEST(LEAST(LENGTH(text) // {Y4M_FRAME_BYTES},
                                  {Y4M_MAX_FRAMES}), 1) AS nf,
                   text
            FROM documents
        ),
        p AS (
            SELECT doc_id, nf,
                   RPAD(SUBSTRING(text, 1, nf * {Y4M_FRAME_BYTES}),
                        CAST(nf * {Y4M_FRAME_BYTES} AS INT), ' ') AS px,
                   (nf + {Y4M_SAMPLE_EVERY - 1}) // {Y4M_SAMPLE_EVERY} AS ns
            FROM g
        )
        SELECT doc_id,
               {Y4M_W} AS width, {Y4M_H} AS height,
               CAST(nf AS BIGINT) AS n_frames,
               CAST(ns AS BIGINT) AS n_sampled,
               LIST_SUM(LIST_TRANSFORM(
                   LIST_FILTER(RANGE(0, nf * {Y4M_FRAME_BYTES}),
                       i -> (i % {Y4M_FRAME_BYTES}) < {Y4M_W * Y4M_H}
                            AND ((i // {Y4M_FRAME_BYTES})
                                 % {Y4M_SAMPLE_EVERY}) = 0),
                   i -> ASCII(SUBSTRING(px, CAST(i + 1 AS INT), 1))))
                   / CAST(ns * {Y4M_W * Y4M_H} AS DOUBLE)
                   AS mean_sampled_luma
        FROM p
    """,
    covers="pipeline: REAL video decode + frame sampling — YUV4MPEG2 "
    "stream/frame headers parsed for real, every-2nd-frame luma "
    "statistics (third modality beside the PNM image and WAV audio "
    "decoders)",
)
def multimodal_decode_y4m_real(spark, t):
    """End-to-end REAL video decode: synthesize a valid C420 YUV4MPEG2
    clip per document JVM-side (frame count scales with the text,
    raster = leading characters), parse stream + frame headers for real
    in the Arrow-batched decode stage, and frame-sample every 2nd frame's
    luma plane — verifying true per-clip statistics (frame counts AND the
    sampled mean) against the oracle's index-arithmetic reconstruction.
    The luma positions the oracle sums are exactly the bytes the decoder
    reads: stream offset i is sampled luma iff i %% frame_size < w*h and
    its frame ordinal is even."""
    return decode_y4m_real(
        t["documents"].select("doc_id", y4m_payload().alias("payload"))
    )


# ---------------------------------------------------------------------------
# Tri-modal dispatch: one binary column, one kernel, three real decoders
# ---------------------------------------------------------------------------

MODAL_SCHEMA = (
    "doc_id bigint, modality string, n_bytes bigint, d1 int, d2 int, "
    "n_units bigint, mean_signal double"
)


def _make_modal_dispatch_kernel():
    """One kernel that sniffs magic bytes and routes to the REAL parser
    for each modality — image (PNM), audio (WAV), video (Y4M) — emitting
    a unified stats row. The per-format parsers are obtained as fresh
    LOCAL closures from their factories at build time, so the whole
    dispatch pickles by value (no module import on workers)."""
    parse_pnm, _ = _make_ppm_kernel()
    parse_wav, _ = _make_wav_kernel()
    parse_y4m, _ = _make_y4m_kernel()

    def dispatch(buf: bytes) -> tuple:
        if buf[:2] in (b"P5", b"P6"):
            w, h, ch, mean = parse_pnm(buf)
            return ("image", w, h, w * h * ch, mean)
        if buf[:4] == b"RIFF":
            rate, ch, n, mean = parse_wav(buf)
            return ("audio", rate, ch, n * ch, mean)
        if buf[:9] == b"YUV4MPEG2":
            w, h, _nf, ns, mean = parse_y4m(buf)
            return ("video", w, h, ns * w * h, mean)
        raise ValueError(f"no decoder for magic {buf[:9]!r}")

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                modality, d1, d2, n_units, mean = dispatch(buf)
                rows.append((doc_id, modality, len(buf), d1, d2, n_units, mean))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "modality", "n_bytes", "d1", "d2",
                    "n_units", "mean_signal",
                ],
            )

    return dispatch, decode


_modal_dispatch, _MODAL_DISPATCH_KERNEL = _make_modal_dispatch_kernel()


def decode_any_modality(df: DataFrame) -> DataFrame:
    """The production multimodal-ingest shape: ONE binary column carrying
    heterogeneous modalities, ONE Arrow-batched decode stage routing on
    magic bytes to the real per-format parsers. Unknown formats raise
    loudly; a deployment tolerating them routes those payloads through
    :func:`decode_stub_features` explicitly before this stage."""
    return df.mapInPandas(_MODAL_DISPATCH_KERNEL, schema=MODAL_SCHEMA)


@query(
    "multimodal_decode_any",
    oracle=f"""
        WITH img AS (
            SELECT doc_id,
                   LENGTH(text) % 13 + 4 AS w,
                   RPAD(SUBSTRING(text, 1,
                            (LENGTH(text) % 13 + 4) * {PPM_HEIGHT * 3}),
                        CAST((LENGTH(text) % 13 + 4)
                             * {PPM_HEIGHT * 3} AS INT), ' ') AS px
            FROM documents WHERE doc_id % 3 = 0
        ),
        img_rows AS (
            SELECT doc_id, 'image' AS modality,
                   CAST(LENGTH('P6' || CHR(10) || w || ' {PPM_HEIGHT}'
                               || CHR(10) || '255' || CHR(10))
                        + w * {PPM_HEIGHT * 3} AS BIGINT) AS n_bytes,
                   CAST(w AS INT) AS d1, {PPM_HEIGHT} AS d2,
                   CAST(w * {PPM_HEIGHT * 3} AS BIGINT) AS n_units,
                   LIST_SUM(LIST_TRANSFORM(RANGE(1, w * {PPM_HEIGHT * 3} + 1),
                                           i -> ASCII(SUBSTRING(px, i, 1))))
                       / CAST(w * {PPM_HEIGHT * 3} AS DOUBLE) AS mean_signal
            FROM img
        ),
        aud AS (
            SELECT doc_id,
                   GREATEST(LEAST(LENGTH(text), {WAV_MAX_SAMPLES}), 1) AS n,
                   RPAD(SUBSTRING(text, 1, {WAV_MAX_SAMPLES}),
                        CAST(GREATEST(LEAST(LENGTH(text),
                                            {WAV_MAX_SAMPLES}), 1) AS INT),
                        ' ') AS px
            FROM documents WHERE doc_id % 3 = 1
        ),
        aud_rows AS (
            SELECT doc_id, 'audio' AS modality,
                   CAST(44 + n * 2 AS BIGINT) AS n_bytes,
                   {WAV_RATE} AS d1, 1 AS d2,
                   CAST(n AS BIGINT) AS n_units,
                   LIST_SUM(LIST_TRANSFORM(RANGE(1, n + 1),
                                           i -> ASCII(SUBSTRING(px, i, 1)) % 256))
                       / CAST(n AS DOUBLE) AS mean_signal
            FROM aud
        ),
        vid AS (
            SELECT doc_id,
                   GREATEST(LEAST(LENGTH(text) // {Y4M_FRAME_BYTES},
                                  {Y4M_MAX_FRAMES}), 1) AS nf,
                   text
            FROM documents WHERE doc_id % 3 = 2
        ),
        vid_p AS (
            SELECT doc_id, nf,
                   RPAD(SUBSTRING(text, 1, nf * {Y4M_FRAME_BYTES}),
                        CAST(nf * {Y4M_FRAME_BYTES} AS INT), ' ') AS px,
                   (nf + {Y4M_SAMPLE_EVERY - 1}) // {Y4M_SAMPLE_EVERY} AS ns
            FROM vid
        ),
        vid_rows AS (
            SELECT doc_id, 'video' AS modality,
                   CAST(LENGTH('YUV4MPEG2 W{Y4M_W} H{Y4M_H} F25:1 Ip A1:1 C420')
                        + 1 + nf * (6 + {Y4M_FRAME_BYTES}) AS BIGINT) AS n_bytes,
                   {Y4M_W} AS d1, {Y4M_H} AS d2,
                   CAST(ns * {Y4M_W * Y4M_H} AS BIGINT) AS n_units,
                   LIST_SUM(LIST_TRANSFORM(
                       LIST_FILTER(RANGE(0, nf * {Y4M_FRAME_BYTES}),
                           i -> (i % {Y4M_FRAME_BYTES}) < {Y4M_W * Y4M_H}
                                AND ((i // {Y4M_FRAME_BYTES})
                                     % {Y4M_SAMPLE_EVERY}) = 0),
                       i -> ASCII(SUBSTRING(px, CAST(i + 1 AS INT), 1))))
                       / CAST(ns * {Y4M_W * Y4M_H} AS DOUBLE) AS mean_signal
            FROM vid_p
        )
        SELECT * FROM img_rows
        UNION ALL SELECT * FROM aud_rows
        UNION ALL SELECT * FROM vid_rows
    """,
    covers="pipeline: tri-modal ingest — ONE binary column carrying "
    "image/audio/video payloads, ONE Arrow-batched decode stage routing "
    "on magic bytes to the three REAL parsers (the production "
    "heterogeneous-media ingest shape)",
)
def multimodal_decode_any(spark, t):
    """Heterogeneous-media ingest, end to end: each document synthesizes
    a different REAL modality by doc_id % 3 (P6 image / PCM WAV / C420
    Y4M — all JVM-side), and a single decode stage sniffs the magic and
    routes to the real parser, emitting unified (modality, dims, units,
    mean-signal) stats. The oracle reconstructs all three modalities'
    statistics independently and the driver hash-checks the union — so
    the dispatch, every container grammar, and every raster reduction
    are value-verified in one entry."""
    payload = (
        F.when(F.col("doc_id") % 3 == 0, ppm_payload())
        .when(F.col("doc_id") % 3 == 1, wav_payload())
        .otherwise(y4m_payload())
    )
    return decode_any_modality(
        t["documents"].select("doc_id", payload.alias("payload"))
    )
