"""End-to-end training-data curation pipeline over the documents corpus.

Single flagship entry composing the engine's pipeline primitives in the
order a pre-training data pipeline runs them — holdout split, language
filter, quality filter, exact-after-normalize dedup, benchmark
decontamination — and reporting the attrition funnel (docs and tokens
surviving each stage), the number a data card publishes per stage.

Every stage reuses the exact semantics (and exactness arguments) of its
standalone entry: `text_quality_score`'s length/digit heuristics,
`dedup_normalized_groups`' canonical fingerprint with keep-lowest-id
policy, and `text_decontaminate`'s hashed-5-gram overlap against the
doc_id % 25 holdout. The language stage keys on the corpus's `lang` tag
(the upstream lang-ID output a pipeline consumes) rather than re-running
`text_lang_id`'s marker voting: the synthetic corpus's word-salad text
carries English markers in every labeled language, so the heuristic
predicts 'en' universally and a marker-based stage would be a
pass-through here. Reference parity: the reference
engine has no multi-stage pipeline — this is north-star expansion
composing operators the reference's single-table NL queries motivate
(ref core/ai_query_generator.py builds single SELECTs only).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..functions.text import (
    SQL_NORMALIZED_TEXT,
    SQL_QUALITY_SCORE,
    normalized_text,
    quality_score_col,
    token_count,
    words_col,
)
from .registry import query
from .text_analysis import DECONTAM_EVAL_STRIDE, DECONTAM_NGRAM

#: Minimum composite quality score a document must reach (the
#: `text_quality_score` formula: length saturation + digit-density
#: penalty, each weighted 0.5). 0.8 keeps documents of >= ~30 words
#: (unless digit-heavy) — the short-document floor a pre-training
#: pipeline applies.
QUALITY_FLOOR = 0.8

_STAGES = ["raw", "holdout_split", "lang_en", "quality", "dedup", "decontam"]


@query(
    "pipeline_curation_funnel",
    oracle=f"""
        WITH corpus AS (
            SELECT doc_id, lang, text FROM documents
            UNION ALL
            SELECT -doc_id - 1 AS doc_id, lang, text FROM documents
            WHERE doc_id % 7 = 0
        ),
        flags AS (
            SELECT doc_id,
                   STRING_SPLIT(text, ' ') AS ws,
                   CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
                   (doc_id % {DECONTAM_EVAL_STRIDE} = 0) AS is_eval,
                   (lang = 'en') AS lang_ok,
                   {SQL_QUALITY_SCORE.format(t='text')}
                       >= {QUALITY_FLOOR} AS q_ok,
                   MD5({SQL_NORMALIZED_TEXT.format(t='text')}) AS fp
            FROM corpus
        ),
        s3 AS (SELECT * FROM flags WHERE NOT is_eval AND lang_ok AND q_ok),
        s4 AS (
            SELECT * FROM (
                SELECT s3.*, MIN(doc_id) OVER (PARTITION BY fp) AS keep FROM s3
            ) WHERE doc_id = keep
        ),
        ev AS (
            SELECT DISTINCT ARRAY_TO_STRING(ws[i:i+{DECONTAM_NGRAM - 1}], ' ') AS sh
            FROM (SELECT ws, UNNEST(GENERATE_SERIES(1, LEN(ws) - {DECONTAM_NGRAM - 1}))
                      AS i
                  FROM flags WHERE is_eval AND LEN(ws) >= {DECONTAM_NGRAM})
        ),
        hits AS (
            SELECT DISTINCT s.doc_id
            FROM (SELECT doc_id,
                         ARRAY_TO_STRING(ws[i:i+{DECONTAM_NGRAM - 1}], ' ') AS sh
                  FROM (SELECT doc_id, ws,
                               UNNEST(GENERATE_SERIES(1, LEN(ws) - {DECONTAM_NGRAM - 1}))
                                   AS i
                        FROM s4 WHERE LEN(ws) >= {DECONTAM_NGRAM})) s
            JOIN ev USING (sh)
        ),
        s5 AS (SELECT * FROM s4
               WHERE doc_id NOT IN (SELECT doc_id FROM hits))
        SELECT CAST(stage_ord AS BIGINT) AS stage_ord, stage, n_docs, n_tokens
        FROM (
            SELECT 0 AS stage_ord, 'raw' AS stage, COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM flags
            UNION ALL SELECT 1, 'holdout_split', COUNT(*),
                   CAST(SUM(n_tokens) AS BIGINT) FROM flags WHERE NOT is_eval
            UNION ALL SELECT 2, 'lang_en', COUNT(*),
                   CAST(SUM(n_tokens) AS BIGINT)
                   FROM flags WHERE NOT is_eval AND lang_ok
            UNION ALL SELECT 3, 'quality', COUNT(*),
                   CAST(SUM(n_tokens) AS BIGINT) FROM s3
            UNION ALL SELECT 4, 'dedup', COUNT(*),
                   CAST(SUM(n_tokens) AS BIGINT) FROM s4
            UNION ALL SELECT 5, 'decontam', COUNT(*),
                   CAST(SUM(n_tokens) AS BIGINT) FROM s5
        ) ORDER BY stage_ord
    """,
    covers="pipeline: end-to-end curation funnel (holdout split -> lang "
    "filter -> quality filter -> normalized exact dedup keep-one -> "
    "decontamination), per-stage doc/token attrition",
)
def pipeline_curation_funnel(spark, t):
    """Curation funnel: documents and tokens surviving each pipeline stage.

    Corpus: documents plus re-keyed copies of the doc_id % 7 == 0 slice
    (doc_id -> -doc_id - 1, unique and disjoint from the non-negative
    originals) — the `dedup_exact` re-injection idiom, here with fresh ids
    so the keep-one-per-fingerprint stage has real attrition to report
    (keep-lowest-id makes the negative copy the kept representative).

    Scale shape, stage by stage (the exchange count is fixed regardless
    of corpus size):

    - stages 0-3 (raw / holdout / language / quality) are per-row
      predicates folded into ONE conditional aggregation over a single
      corpus scan — no shuffle carries document bodies, the stack()
      reshape runs on one 8-column row;
    - stage 4 (dedup) is the one fingerprint exchange: a window
      min(doc_id) per md5(normalized text) over quality survivors. In
      the stage-4 rollup branch column pruning cuts it to
      (doc_id, n_tokens, fp); the contamination branch's evaluation of
      the same window must carry the word arrays through the exchange
      (they are stage 5's shingle source) — the funnel's one
      corpus-sized shuffle. (Shuffling only keep-ids and re-joining
      flags for the arrays would avoid it at the price of two more
      corpus-grain exchanges plus a rescan — strictly worse.);
    - stage 5 (decontam) hashes each survivor's 5-gram shingles straight
      from the word array (xxhash64, no shingle string ever built — the
      `text_decontaminate` kernel and its collision argument, p ~ 2^-64
      per eval/train pair; the oracle's string shingles stay
      byte-identical at every test SF) and anti-joins against the
      BROADCAST eval-slice shingle set — eval sets are MBs at any corpus
      size, so the corpus side stays a scan.

    Plan note: the one shared-and-expensive subtree (the fingerprint
    window over quality survivors) is evaluated twice — the stage-4
    rollup and the contamination probe — because Spark re-derives rather
    than materializes shared branches; stage 5 is computed by exact
    integer SUBTRACTION from those two aggregates (see the inline note),
    which is what keeps it at two evaluations instead of three plus an
    anti-join. IN-WINDOW materialization of the shared subtree is
    legitimate optimization (unlike cross-run caching) and was MEASURED
    in r15 (tools/funnel_ckpt_ab_r15.py, sf30 interleaved min-of-4,
    outputs identical): eager localCheckpoint of the full flags
    projection 8.13 s, of the post-window survivors 8.86 s, shipped
    materialization-free form 7.84 s — materializing the word arrays
    costs more than the re-derivation it saves (the basket_lift_rules
    r14 lesson repeating), so the lazy form stands on the numbers. A
    deployment that runs the funnel REPEATEDLY amortizes a persisted
    flags projection across runs — that cross-run form is the one the
    bench must not time.

    Output is six (stage, n_docs, n_tokens) rows — the data-card funnel.
    """
    d = t["documents"]
    # Re-injection via a per-row id-array explode, NOT a unionAll of a
    # second filtered read: a union branch doubles the documents scan in
    # EVERY consumer of the flags subtree (this plan derives five), while
    # the explode replicates the row after one scan.
    ids = F.when(
        F.col("doc_id") % 7 == 0,
        F.array(F.col("doc_id"), -F.col("doc_id") - 1),
    ).otherwise(F.array(F.col("doc_id")))
    corpus = d.select(F.explode(ids).alias("doc_id"), "lang", "text")
    lang_ok = F.col("lang") == "en"
    n_tokens = F.size(words_col()).cast("long")
    q_ok = quality_score_col() >= QUALITY_FLOOR
    flags = corpus.select(
        "doc_id",
        words_col().alias("ws"),
        n_tokens.alias("n_tokens"),
        (F.col("doc_id") % DECONTAM_EVAL_STRIDE == 0).alias("is_eval"),
        lang_ok.alias("lang_ok"),
        q_ok.alias("q_ok"),
        F.md5(normalized_text()).alias("fp"),
    )

    train = ~F.col("is_eval")
    conds = [
        F.lit(True),
        train,
        train & F.col("lang_ok"),
        train & F.col("lang_ok") & F.col("q_ok"),
    ]
    aggs = []
    for i, c in enumerate(conds):
        aggs.append(F.sum(F.when(c, 1).otherwise(0)).alias(f"d{i}"))
        aggs.append(
            F.sum(F.when(c, F.col("n_tokens")).otherwise(0)).alias(f"t{i}")
        )
    stack_args = ", ".join(
        f"{i}L, '{_STAGES[i]}', d{i}, t{i}" for i in range(4)
    )
    funnel03 = flags.agg(*aggs).selectExpr(
        f"stack(4, {stack_args}) AS (stage_ord, stage, n_docs, n_tokens)"
    )

    s3 = flags.where(train & F.col("lang_ok") & F.col("q_ok"))
    keep = F.min("doc_id").over(Window.partitionBy("fp"))
    s4 = (
        s3.withColumn("keep", keep)
        .where(F.col("doc_id") == F.col("keep"))
        .drop("keep")
    )

    n = DECONTAM_NGRAM
    hash_args = ", ".join(f"try_element_at(ws, i + {k})" for k in range(n))
    distinct_hashes = F.expr(
        f"array_distinct(transform(sequence(1, size(ws) - {n - 1}),"
        f" i -> xxhash64({hash_args})))"
    )
    eval_sh = (
        flags.where("is_eval")
        .where(F.size("ws") >= n)
        .select(F.explode(distinct_hashes).alias("sh"))
        .distinct()
    )
    # Stage 5 by SUBTRACTION, not anti-join: the decontam survivors are
    # s4 minus the contaminated docs, so their (count, token) stats are
    # exact integer differences of two aggregates — computing them that
    # way consumes the expensive fingerprint-window subtree twice (the
    # stage-4 rollup and the contamination probe) instead of three times
    # (+ an anti-join re-derivation of the whole chain; measured 18 -> 10
    # parquet scans in the executed sf0.1 plan).
    stage4 = s4.agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )
    contam = (
        s4.where(F.size("ws") >= n)
        .select("doc_id", "n_tokens", F.explode(distinct_hashes).alias("sh"))
        .join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.max("n_tokens").alias("nt"))
        .agg(
            F.count("*").alias("c_docs"),
            F.coalesce(F.sum("nt"), F.lit(0).cast("long")).alias("c_tokens"),
        )
    )
    rows45 = stage4.crossJoin(contam).selectExpr(
        "stack(2, 4L, 'dedup', n_docs, n_tokens,"
        " 5L, 'decontam', n_docs - c_docs, n_tokens - c_tokens)"
        " AS (stage_ord, stage, n_docs, n_tokens)"
    )

    return funnel03.unionAll(rows45).orderBy("stage_ord")


@query(
    "pipeline_datacard_manifest",
    oracle=f"""
        WITH m AS (
            SELECT source, lang,
                   CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
                   {SQL_QUALITY_SCORE.format(t='text')} AS q,
                   MD5({SQL_NORMALIZED_TEXT.format(t='text')}) AS fp
            FROM documents
        )
        SELECT source, lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(CAST(ROUND(q * 1000000) AS BIGINT)) AS BIGINT)
                   AS quality_micro_sum,
               CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique_fp
        FROM m GROUP BY source, lang
    """,
    covers="pipeline: training-data MANIFEST / datacard rollup — per "
    "(source, lang): docs, tokens, exact quality mass, normalized-"
    "fingerprint uniqueness (the audit table a corpus release ships with)",
)
def pipeline_datacard_manifest(spark, t):
    """The per-(source, language) datacard a training-corpus release
    ships: document and token counts, the exact quality mass (micro-unit
    integer sum — a mean is one division away and the integer form is
    order-independent, the repo's standard float discipline), and
    normalized-fingerprint uniqueness (distinct canonical-form hashes:
    n_docs - n_unique_fp is the stratum's internal duplicate count).

    One scan, one (source, lang) exchange; COUNT(DISTINCT fp) expands to
    a two-phase aggregate whose first phase dedups (source, lang, fp)
    partials map-side. Source x lang cardinality is bounded (thousands),
    so the output is a dimension-sized audit table at any corpus size.
    Quality rides the shared kernel (functions/text.py), fingerprints
    the shared normalizer — the manifest can never drift from what the
    curation operators actually computed."""
    q_micro = F.round(quality_score_col() * 1_000_000).cast("long")
    return (
        t["documents"]
        .select(
            "source",
            "lang",
            token_count().alias("n_tokens"),
            q_micro.alias("q_micro"),
            F.md5(normalized_text()).alias("fp"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("q_micro").alias("quality_micro_sum"),
            F.countDistinct("fp").alias("n_unique_fp"),
        )
    )
