"""Similarity-search semantics: exact top-k ordering, bucketed-ANN
containment, and the decode-stub multimodal plumbing."""

from __future__ import annotations

from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.registry import (
    queries,
)
from conftest import SF_ORACLE


def test_bruteforce_topk_sorted_and_sane(spark):
    rows = queries()["similarity_bruteforce_topk"](spark, SF_ORACLE).collect()
    assert len(rows) == 10
    sims = [r.cos_sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)


def test_topk_per_query_shape(spark):
    rows = queries()["similarity_topk_per_query"](spark, SF_ORACLE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    assert all(len(v) == 5 for v in by_q.values())
    assert all(r.vec_id != r.q_id for r in rows)


def test_bucketed_ann_candidates_within_probe_radius(spark):
    """Multi-probe bucketed ANN may lose recall vs brute force, but every
    returned candidate must come from a probed bucket — i.e. its sign
    bucket is within hamming distance 1 of the query's (containment)."""
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.similarity import (
        lsh_num_bits,
        sign_bucket_col,
    )
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
        register_views,
    )

    emb = register_views(spark, SF_ORACLE)["embeddings"]
    nbits = lsh_num_bits(emb.count())
    buckets = {
        r.vec_id: r.bucket
        for r in emb.select("vec_id", sign_bucket_col(nbits).alias("bucket")).collect()
    }
    rows = queries()["similarity_bucketed_ann"](spark, SF_ORACLE).collect()
    assert rows
    assert all(
        bin(buckets[r.q_id] ^ buckets[r.cand_id]).count("1") <= 1 for r in rows
    )


def test_multimodal_decode_dispatch_routes_formats(spark):
    """The dispatch entry decodes a mixed P5/P6 corpus: odd doc_ids come
    back grayscale (1 channel), even RGB (3), deterministically."""
    q = queries()["multimodal_decode_pnm_dispatch"]
    r1 = sorted(tuple(r) for r in q(spark, SF_ORACLE).collect())
    r2 = sorted(tuple(r) for r in q(spark, SF_ORACLE).collect())
    assert r1 == r2
    assert all(r[4] == (3 if r[0] % 2 == 0 else 1) for r in r1)
    assert all(r[2] >= 1 and r[3] >= 1 for r in r1)


def test_decode_stub_is_not_registered():
    """r07 verdict item 3: no registry entry may return fabricated
    features — the stub survives only as an explicit internal fallback."""
    assert "multimodal_decode_features" not in queries()
    assert not any("stub" in name for name in queries())


def test_ppm_parser_header_grammar():
    """The real decoder handles the full netpbm header grammar — magic
    dispatch (P5/P6), comments, multi-digit dims, arbitrary whitespace —
    and rejects malformed payloads loudly rather than mis-decoding."""
    import pytest

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.multimodal import (
        _parse_pnm,
    )

    raster = bytes(range(2 * 3 * 3))  # 2x3 RGB, bytes 0..17
    w, h, ch, mean = _parse_pnm(b"P6\n2 3\n255\n" + raster)
    assert (w, h, ch) == (2, 3, 3) and mean == sum(range(18)) / 18
    # Comments and whitespace runs anywhere whitespace is allowed.
    w, h, ch, mean2 = _parse_pnm(
        b"P6 # comment\n # more\n 2\t\n3 # dims done\n255 " + raster
    )
    assert (w, h, ch, mean2) == (2, 3, 3, mean)
    big = b"P6\n12 10\n255\n" + bytes(360)
    assert _parse_pnm(big)[:2] == (12, 10)
    # P5 grayscale: 1 byte per pixel, channels=1.
    gray = bytes(range(6))
    assert _parse_pnm(b"P5\n2 3\n255\n" + gray) == (2, 3, 1, sum(range(6)) / 6)
    with pytest.raises(ValueError, match="not a P5/P6"):
        _parse_pnm(b"P4\n2 3\n" + raster)
    with pytest.raises(ValueError, match="truncated"):
        _parse_pnm(b"P6\n2 3\n255\n" + raster[:-1])
    with pytest.raises(ValueError, match="truncated"):
        _parse_pnm(b"P5\n2 3\n255\n" + gray[:-1])
    with pytest.raises(ValueError, match="16-bit"):
        _parse_pnm(b"P6\n2 3\n65535\n" + raster * 2)
    # The spec allows NO comment between maxval and the raster — reject
    # rather than silently reading comment bytes as pixels (review r07).
    with pytest.raises(ValueError, match="whitespace after maxval"):
        _parse_pnm(b"P6\n2 3\n255#c\n" + raster)
    with pytest.raises(ValueError, match="zero-dimension"):
        _parse_pnm(b"P6\n0 3\n255\n")
    with pytest.raises(ValueError, match="trailing bytes"):
        _parse_pnm(b"P6\n2 3\n255\n" + raster + b"\n")
    with pytest.raises(ValueError, match="trailing bytes"):
        _parse_pnm(b"P5\n2 3\n255\n" + gray + b"\n")


def test_multimodal_decode_real_roundtrip(spark):
    """JVM-synthesized P6 payloads decode to the text-derived raster
    statistics — the decode stage parses real bytes, end to end."""
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.multimodal import (
        PPM_HEIGHT,
        decode_real,
        ppm_payload,
    )
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
        register_views,
    )

    docs = register_views(spark, SF_ORACLE)["documents"]
    got = {
        r["doc_id"]: r
        for r in decode_real(
            docs.select("doc_id", ppm_payload().alias("payload"))
        ).collect()
    }
    for row in docs.select("doc_id", "text").limit(20).collect():
        w = len(row["text"]) % 13 + 4
        n = w * PPM_HEIGHT * 3
        body = row["text"][:n].ljust(n).encode()
        r = got[row["doc_id"]]
        assert (r["width"], r["height"], r["channels"]) == (w, PPM_HEIGHT, 3)
        assert r["mean_intensity"] == sum(body) / n


def test_ivf_recall_vs_exact(spark):
    """IVF with nprobe=2 over 20 cells scans 10% of the corpus per query;
    picking cells at random would recover ~10% of the exact top-3. The
    routing must beat that by 3x (measured 0.43 on this corpus — uniform
    random embeddings are near-orthogonal, the adversarial case for IVF;
    clustered real-world embeddings route far better)."""
    from pyspark.sql import Window, functions as F

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.similarity import (
        cosine_expr,
    )
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
        register_views,
    )

    ivf = {
        (r.q_id, r.cand_id)
        for r in queries()["similarity_ivf_ann"](spark, SF_ORACLE).collect()
    }
    e = register_views(spark, SF_ORACLE)["embeddings"]
    q = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "cand_id")
    exact = {
        (r.q_id, r.cand_id)
        for r in (
            e.crossJoin(F.broadcast(q))
            .where(F.col("vec_id") != F.col("q_id"))
            .select(
                "q_id",
                F.col("vec_id").alias("cand_id"),
                cosine_expr("embedding", "q_emb").alias("cos_sim"),
            )
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
        ).collect()
    }
    assert len(exact) == 30
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.3, f"IVF recall {recall:.2f}"


def test_lsh_bits_scale_with_corpus():
    """The asymptotic property VERDICT r02 asked for: bucket count tracks
    corpus size (expected occupancy ~TARGET_BUCKET_ROWS), clamped to the
    dim-bounded bit budget."""
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.similarity import (
        lsh_num_bits,
    )

    assert lsh_num_bits(500) == 4          # sf0.01 corpus
    assert lsh_num_bits(2_000) == 6        # sf0.1 corpus
    assert lsh_num_bits(50_000) == 11
    assert lsh_num_bits(1_000_000) == 15
    assert lsh_num_bits(10**9) == 24       # clamped at the bit budget
    # occupancy ~constant: N / 2^B within [TARGET/2, 2*TARGET] mid-range
    for n in (10_000, 100_000, 1_000_000):
        b = lsh_num_bits(n)
        assert 16 <= n / (1 << b) <= 64


def _planted_neardup_frame(spark, n_base=400, dim=64, noise=0.11, seed=7):
    """n_base seeded gaussian vectors + one perturbed copy each; the copy
    sits at cosine ~0.965-0.985 from its base — a planted near-dup pair."""
    import numpy as np

    rng = np.random.RandomState(seed)
    base = rng.normal(size=(n_base, dim))
    dup = base + noise * rng.normal(size=(n_base, dim))
    rows = []
    for i in range(n_base):
        rows.append((i, [float(x) for x in base[i]]))
        rows.append((n_base + i, [float(x) for x in dup[i]]))
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        [(i, n_base + i) for i in range(n_base)],
    )


def test_multiprobe_recall_on_planted_neardups_b12(spark):
    """The VERDICT r02 'done' gate: at B >= 12 bits, multi-probe candidate
    generation must recover >= 0.9 of planted near-dup pairs (cosine
    ~0.97). Top-k recall on the ISOTROPIC test corpus is not a meaningful
    gate (top-1 cosine there is ~0.4 — chance-level for any LSH family);
    recall is defined against pairs that are actually near."""
    import pyspark.sql.functions as F

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.similarity import (
        multiprobe_buckets,
        sign_bucket_col,
    )

    df, pairs = _planted_neardup_frame(spark)
    nbits = 12
    b = df.select("vec_id", sign_bucket_col(nbits).alias("bucket"))
    probes = multiprobe_buckets(
        b.select(F.col("vec_id").alias("a_id"), "bucket"), nbits, radius=2
    )
    cand = (
        probes.join(
            b.select(F.col("vec_id").alias("c_id"), "bucket"), "bucket"
        )
        .where(F.col("a_id") < F.col("c_id"))
        .select("a_id", "c_id")
        .distinct()
    )
    found = {(r.a_id, r.c_id) for r in cand.collect()}
    recall = sum(1 for p in pairs if p in found) / len(pairs)
    assert recall >= 0.9, f"flip-2 multi-probe recall {recall:.3f} < 0.9 at B={nbits}"


def test_flip1_probe_recall_exceeds_home_bucket_alone(spark):
    """Radius-1 probing (what the registered operators use) must strictly
    dominate home-bucket-only candidate generation on planted near-dups."""
    import pyspark.sql.functions as F

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.similarity import (
        multiprobe_buckets,
        sign_bucket_col,
    )

    df, pairs = _planted_neardup_frame(spark)
    nbits = 12
    b = df.select("vec_id", sign_bucket_col(nbits).alias("bucket"))

    def recall_at(radius):
        a = b.select(F.col("vec_id").alias("a_id"), "bucket")
        if radius:
            a = multiprobe_buckets(a, nbits, radius=radius)
        found = {
            (r.a_id, r.c_id)
            for r in a.join(
                b.select(F.col("vec_id").alias("c_id"), "bucket"), "bucket"
            )
            .where(F.col("a_id") < F.col("c_id"))
            .select("a_id", "c_id")
            .distinct()
            .collect()
        }
        return sum(1 for p in pairs if p in found) / len(pairs)

    r0, r1 = recall_at(0), recall_at(1)
    assert r1 > r0
    assert r1 >= 0.75  # flip-1: the registered operators' working point


def test_ppm_parser_roundtrip_fuzz():
    """Property: any (magic, w, h, raster) synthesized per the P5/P6
    grammar — with random comment/whitespace noise in the header — parses
    back to exactly (w, h, channels, mean(raster)). Deterministic seed,
    no Spark."""
    import random

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.multimodal import (
        _parse_pnm,
    )

    rng = random.Random(20260815)
    for _ in range(200):
        magic, nch = rng.choice([(b"P6", 3), (b"P5", 1)])
        w, h = rng.randint(1, 40), rng.randint(1, 40)
        raster = bytes(rng.randrange(256) for _ in range(w * h * nch))
        ws = lambda: rng.choice([b" ", b"\n", b"\t", b" \n ", b"#junk 1 2\n"])
        header = magic + ws() + str(w).encode() + ws() + str(h).encode()
        header += ws() + b"255\n"
        got_w, got_h, got_ch, mean = _parse_pnm(header + raster)
        assert (got_w, got_h, got_ch) == (w, h, nch)
        assert mean == sum(raster) / (w * h * nch)


def test_decode_stub_fallback_is_deterministic(spark):
    """The unregistered stub fallback (for formats with no codec in this
    environment) still produces typed, deterministic output through the
    same Arrow plumbing as the real decoder."""
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.multimodal import (
        decode_stub_features,
    )
    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.sources.catalog import (
        register_views,
    )

    docs = register_views(spark, SF_ORACLE)["documents"].limit(50)
    r1 = sorted(tuple(r) for r in decode_stub_features(docs).collect())
    r2 = sorted(tuple(r) for r in decode_stub_features(docs).collect())
    assert r1 == r2 and len(r1) == 50
    assert all(r[2] >= 1 and r[3] >= 1 and r[4] == 3 for r in r1)


def test_wav_parser_chunk_walk_grammar():
    """The RIFF parser walks the chunk list per spec (LE sizes, pad-to-even,
    chunk order free, unknown chunks skipped) and rejects malformed
    containers loudly rather than mis-reading."""
    import struct

    import pytest

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.multimodal import (
        _parse_wav,
    )

    def wav(chunks: list[tuple[bytes, bytes]]) -> bytes:
        body = b"WAVE"
        for cid, payload in chunks:
            body += cid + struct.pack("<I", len(payload)) + payload
            if len(payload) % 2:
                body += b"\x00"
        return b"RIFF" + struct.pack("<I", len(body)) + body

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = struct.pack("<4h", 10, -20, 30, -40)
    rate, ch, n, mean = _parse_wav(wav([(b"fmt ", fmt), (b"data", data)]))
    assert (rate, ch, n) == (8000, 1, 4) and mean == (10 + 20 + 30 + 40) / 4
    # chunk order is free; unknown odd-size chunks are skipped with padding
    assert _parse_wav(
        wav([(b"LIST", b"junk!"), (b"data", data), (b"fmt ", fmt)])
    ) == (8000, 1, 4, mean)
    # stereo: n_samples is per channel, mean over all interleaved samples
    fmt2 = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    assert _parse_wav(wav([(b"fmt ", fmt2), (b"data", data)]))[:3] == (8000, 2, 2)
    with pytest.raises(ValueError, match="not a RIFF"):
        _parse_wav(b"RIFX" + bytes(40))
    bad = bytearray(wav([(b"fmt ", fmt), (b"data", data)]))
    bad[4] ^= 0xFF
    with pytest.raises(ValueError, match="size field"):
        _parse_wav(bytes(bad))
    # a chunk whose declared size exceeds its bytes (RIFF size consistent,
    # so the container-level check passes and the chunk walk must catch it)
    lying = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data) + 4) + data
    )
    with pytest.raises(ValueError, match="truncated chunk"):
        _parse_wav(b"RIFF" + struct.pack("<I", len(lying)) + lying)
    with pytest.raises(ValueError, match="missing fmt or data"):
        _parse_wav(wav([(b"fmt ", fmt)]))
    mp3ish = struct.pack("<HHIIHH", 85, 1, 8000, 16000, 2, 16)
    with pytest.raises(ValueError, match="unsupported format"):
        _parse_wav(wav([(b"fmt ", mp3ish), (b"data", data)]))
    with pytest.raises(ValueError, match="not sample-aligned"):
        _parse_wav(wav([(b"fmt ", fmt), (b"data", data + b"\x01")]))
    with pytest.raises(ValueError, match="empty data"):
        _parse_wav(wav([(b"fmt ", fmt), (b"data", b"")]))


def test_wav_parser_roundtrip_fuzz():
    """Property: any (rate, channels, samples) packed per the RIFF grammar
    — with random unknown chunks interleaved — parses back exactly.
    Deterministic seed, no Spark."""
    import random
    import struct

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.multimodal import (
        _parse_wav,
    )

    rng = random.Random(20260815)
    for _ in range(200):
        rate = rng.choice([8000, 16000, 44100])
        ch = rng.choice([1, 2])
        n = rng.randint(1, 50)
        samples = [rng.randint(-32768, 32767) for _ in range(n * ch)]
        fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * 2 * ch, 2 * ch, 16)
        data = struct.pack(f"<{len(samples)}h", *samples)
        chunks = [(b"fmt ", fmt), (b"data", data)]
        for _ in range(rng.randint(0, 2)):
            junk = bytes(rng.randrange(256) for _ in range(rng.randint(0, 9)))
            chunks.insert(rng.randint(0, len(chunks)), (b"JUNK", junk))
        body = b"WAVE"
        for cid, payload in chunks:
            body += cid + struct.pack("<I", len(payload)) + payload
            if len(payload) % 2:
                body += b"\x00"
        buf = b"RIFF" + struct.pack("<I", len(body)) + body
        got = _parse_wav(buf)
        assert got == (
            rate, ch, n, sum(abs(s) for s in samples) / len(samples)
        )


def test_y4m_parser_grammar():
    """Stream/frame header grammar: parameters in any order, per-frame
    params tolerated, every malformation rejected loudly."""
    import pytest

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.multimodal import (
        _parse_y4m,
    )

    f = bytes(range(24))  # one 4x4 C420 frame (16 luma + 8 chroma)
    hdr = b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\n"
    w, h, nf, ns, mean = _parse_y4m(hdr + b"FRAME\n" + f)
    assert (w, h, nf, ns) == (4, 4, 1, 1) and mean == sum(range(16)) / 16
    # three frames -> frames 0 and 2 sampled; per-frame params tolerated
    buf = hdr + b"FRAME\n" + f + b"FRAME Xfoo\n" + f + b"FRAME\n" + f
    assert _parse_y4m(buf)[2:4] == (3, 2)
    # param order free; C420mpeg2 counts as 420
    assert _parse_y4m(
        b"YUV4MPEG2 C420mpeg2 H4 W4\nFRAME\n" + f
    )[:2] == (4, 4)
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        _parse_y4m(b"YUV4MPEG1 W4 H4\nFRAME\n" + f)
    with pytest.raises(ValueError, match="missing W or H"):
        _parse_y4m(b"YUV4MPEG2 W4\nFRAME\n" + f)
    with pytest.raises(ValueError, match="only C420"):
        _parse_y4m(b"YUV4MPEG2 W4 H4 C444\nFRAME\n" + bytes(48))
    with pytest.raises(ValueError, match="odd C420"):
        _parse_y4m(b"YUV4MPEG2 W3 H4 C420\nFRAME\n" + f)
    with pytest.raises(ValueError, match="junk at frame boundary"):
        _parse_y4m(hdr + b"FRAME\n" + f + b"garbage")
    with pytest.raises(ValueError, match="truncated frame"):
        _parse_y4m(hdr + b"FRAME\n" + f[:-1])
    with pytest.raises(ValueError, match="no frames"):
        _parse_y4m(hdr)
    with pytest.raises(ValueError, match="unterminated FRAME"):
        _parse_y4m(hdr + b"FRAME")


def test_y4m_parser_roundtrip_fuzz():
    """Property: any (even dims, frame count, raster) packed per the Y4M
    grammar parses back to exact sampled-luma statistics. Deterministic
    seed, no Spark."""
    import random

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.multimodal import (
        Y4M_SAMPLE_EVERY,
        _parse_y4m,
    )

    rng = random.Random(20260815)
    for _ in range(200):
        w, h = rng.choice([2, 4, 6, 8]), rng.choice([2, 4, 6])
        nf = rng.randint(1, 6)
        fsz, ysz = w * h * 3 // 2, w * h
        frames = [
            bytes(rng.randrange(256) for _ in range(fsz)) for _ in range(nf)
        ]
        buf = f"YUV4MPEG2 W{w} H{h} F30:1 C420\n".encode()
        for fr in frames:
            buf += b"FRAME\n" + fr
        got = _parse_y4m(buf)
        sampled = frames[::Y4M_SAMPLE_EVERY]
        want_mean = sum(sum(fr[:ysz]) for fr in sampled) / (len(sampled) * ysz)
        assert got == (w, h, nf, len(sampled), want_mean)


def test_modal_dispatch_routes_all_three(spark):
    """The tri-modal entry must emit exactly one modality per doc_id % 3
    class, with positive unit counts, and reject unknown magic loudly."""
    import pytest

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.multimodal import (
        _modal_dispatch,
    )

    rows = queries()["multimodal_decode_any"](spark, SF_ORACLE).collect()
    assert len(rows) == 500
    want = {0: "image", 1: "audio", 2: "video"}
    assert all(r.modality == want[r.doc_id % 3] for r in rows)
    assert all(r.n_units > 0 and r.n_bytes > 0 for r in rows)
    with pytest.raises(ValueError, match="no decoder for magic"):
        _modal_dispatch(b"\x89PNG\r\n\x1a\n....")
