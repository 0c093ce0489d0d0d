#!/usr/bin/env python
"""Does text_pii_scrub's structured-regex scan actually scale across
executor threads? (VERDICT r04 #4.)

Round 3 measured Java-regex CHAR-CLASS replaceAll anti-scaling on
local[32] (negative speedup vs local[1] — the reason functions/text.py
normalizes with translate). text_pii_scrub reintroduced regexp_replace
on full documents with STRUCTURED patterns (email/phone: literal-anchored,
bounded repetition) on the argument that those fail fast per position.
This microbench settles the claim with numbers: the operator's exact
kernel (inject + 2x regexp_count + 2x regexp_replace + md5, imported
from the operator module so it cannot drift) over the sf documents
table, single-task (coalesce(1) — split-size confs cannot produce a
true single-core run; see the round-5 BASELINE.md correction) vs
all-core, plus the DuckDB oracle kernel at threads=1/N for the
cross-engine view. Healthy scaling ~= cores/2 or better; round 3's
anti-scaling failure mode shows up as a speedup near or below 1.

Usage: python tools/pii_microbench.py [sf_dir]   (default sf0.1)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _best(fn, n=3) -> float:
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    path = os.path.join(sf_dir, "documents.parquet")
    # re-chunked layouts store each table as a DIRECTORY of part files;
    # DuckDB needs the glob form, Spark reads the directory natively.
    duck_path = os.path.join(path, "*.parquet") if os.path.isdir(path) else path
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32)))

    from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.text_analysis import (
        PII_EMAIL_RE,
        PII_PHONE_RE,
    )

    import duckdb

    duck_sql = f"""
        WITH corpus AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' contact user' || doc_id || '@example.com'
                           ELSE '' END
                   || CASE WHEN doc_id % 5 = 0
                           THEN ' call +1-555-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                           ELSE '' END AS text
            FROM read_parquet('{duck_path}')
        )
        SELECT SUM(LEN(REGEXP_EXTRACT_ALL(text, '{PII_EMAIL_RE}'))),
               SUM(LEN(REGEXP_EXTRACT_ALL(text, '{PII_PHONE_RE}'))),
               MAX(MD5(REGEXP_REPLACE(REGEXP_REPLACE(text, '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
                                      '{PII_PHONE_RE}', '[PHONE]', 'g')))
        FROM corpus
    """
    duck: dict[str, float] = {}
    for threads, tag in ((1, "t1"), (cpus, f"t{cpus}")):
        con = duckdb.connect()
        con.execute(f"PRAGMA threads={threads}")
        con.execute(duck_sql)  # warm
        duck[tag] = _best(lambda: con.execute(duck_sql).fetchall())
        con.close()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    nbytes = os.path.getsize(path) if os.path.isfile(path) else sum(
        os.path.getsize(os.path.join(path, g)) for g in os.listdir(path)
    )
    par_split = min(max(nbytes // (2 * cpus), 256 * 1024), 128 * 1024 * 1024)

    def kernel(single_task: bool, guarded: bool = False):
        # Built FRESH per timed pass: re-collecting the same DataFrame
        # object is served by a result-reuse path in tens of ms (measured
        # 0.05 s vs 1.3 s for an identical fresh plan) and would fake the
        # scaling numbers. bench.py constructs each pass's DataFrame anew
        # for the same reason.
        #
        # Single-task mode is coalesce(1): split-size confs cannot collapse
        # a DIRECTORY of files to one task (maxPartitionBytes is re-split
        # by bytesPerCore; a huge openCostInBytes forces one file PER
        # partition) — coalesce merges the file partitions without a
        # shuffle and the whole scan+regex pipeline runs on one core.
        d = spark.read.parquet(path)
        if single_task:
            d = d.coalesce(1)
        # Injection + guard/regex expressions IMPORTED from the operator
        # module — the tool times text_pii_scrub's exact kernel by
        # construction, so an operator edit can never leave this
        # microbench silently measuring a stale copy.
        from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.operators.text_analysis import (  # noqa: E501
            pii_injected_text,
            pii_scrub_exprs,
        )

        injected = pii_injected_text()
        ne, np_, scrubbed = pii_scrub_exprs(F.col("t2"), guarded=guarded)
        return (
            d.select("doc_id", injected.alias("t2"))
            .select(
                ne.alias("n_emails"),
                np_.alias("n_phones"),
                F.md5(scrubbed).alias("fp"),
            )
            .agg(F.sum("n_emails"), F.sum("n_phones"), F.max("fp"))
        )

    sp: dict[str, float] = {}
    n_parts: dict[str, int] = {}
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(par_split))
    for single, tag in ((True, "t1"), (False, f"t{cpus}")):
        base = spark.read.parquet(path)
        n_parts[tag] = (base.coalesce(1) if single else base).rdd.getNumPartitions()
        for guarded, gtag in ((False, "plain"), (True, "guarded")):
            kernel(single, guarded).collect()  # warm (codegen + page cache)
            sp[f"{tag}_{gtag}"] = _best(
                lambda s=single, g=guarded: kernel(s, g).collect(),
                n=2 if single else 3,
            )

    tN = f"t{cpus}"
    out = {
        "metric": "pii_regex_microbench",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "duckdb": {k: round(v, 4) for k, v in duck.items()},
        "spark": {k: round(v, 4) for k, v in sp.items()},
        "spark_scan_partitions": n_parts,
        "spark_core_scaling_plain": round(sp["t1_plain"] / sp[f"{tN}_plain"], 2),
        "spark_core_scaling_guarded": round(
            sp["t1_guarded"] / sp[f"{tN}_guarded"], 2
        ),
        "guard_speedup_t1": round(sp["t1_plain"] / sp["t1_guarded"], 2),
        "duckdb_core_scaling": round(duck["t1"] / duck[tN], 2),
        "allcore_ratio_spark_vs_duckdb": round(
            sp[f"{tN}_guarded"] / duck[tN], 2
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
