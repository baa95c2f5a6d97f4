#!/usr/bin/env python
"""At-scale throughput proof for the two span-tool-shaped operators the
baseline quantifies (BASELINE.md):

- ``oa_flag``   vs span-oa-filter: 2.5M rec/min = ~41.7K rec/s (Go,
  single node; reference workflows/ai.py:778)
- ``licensing`` vs span-tag: ~20K rec/s with 22 ISILs and ~30 holdings
  files of 10-50K entries (reference sources/amsl.py:919-922)

The sf0.1 bench numbers are overhead-dominated (150K records finish in
under a second), so this harness synthesizes an sf1+-equivalent
intermediate-schema corpus (default 10M records, ~REAL workload shape:
1-2 ISSNs per record, 22-ISIL filter config, 30 KBART files x ~30K
rows, 50K-entry OA ISSN list) ONCE into a local parquet dir, then
times the operators end-to-end (parquet scan -> operator -> noop sink)
and reports records/second.

    python scale_bench.py                 # 10M records, local[$CPUS]
    SCALE_RECORDS=2000000 python scale_bench.py

Prints ONE JSON line:
    {"metric": "records_per_second", "oa_flag": N, "licensing_tag": N,
     "records": R, ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from siskin_spark.session import get_spark  # noqa: E402

CORPUS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scale_corpus")

N_ISSN_POOL = 200_000
N_OA_ISSNS = 50_000
N_HOLDINGS_FILES = 30
HOLDINGS_ROWS_PER_FILE = 30_000
N_ISILS = 22
N_SOURCES = 40
N_COLLECTIONS = 400


def _issn(col):
    """Deterministic ISSN-shaped string from an int column."""
    return F.concat(
        F.lpad((col % 10_000).cast("string"), 4, "0"),
        F.lit("-"),
        F.lpad(((col / 10_000).cast("long") % 1_000).cast("string"), 3, "0"),
        F.lit("X"),
    )


def build_corpus(spark, n_records: int) -> None:
    """Synthesize the IS-shaped corpus once (records + holdings), so
    timed runs scan parquet exactly like the production pipeline."""
    recs = (
        spark.range(n_records)
        .select(
            F.concat(F.lit("ai-x-"), F.col("id").cast("string")).alias("finc_id"),
            (F.col("id") % N_SOURCES).cast("string").alias("finc_source_id"),
            F.array(
                F.concat(F.lit("Coll "), (F.col("id") % N_COLLECTIONS).cast("string"))
            ).alias("finc_mega_collection"),
            F.array(F.lit("Topic"), F.lit("Other")).alias("subjects"),
            F.array(_issn(F.col("id") % N_ISSN_POOL)).alias("rft_issn"),
            F.when(
                F.col("id") % 2 == 0,
                F.array(_issn((F.col("id") * 7 + 13) % N_ISSN_POOL)),
            ).alias("rft_eissn"),
            F.timestamp_seconds(
                F.lit(631_152_000) + (F.col("id") % 1_000_000_000)
            ).alias("x_date"),  # 1990..~2021
            ((F.col("id") % 50) + 1).cast("string").alias("rft_volume"),
            ((F.col("id") % 12) + 1).cast("string").alias("rft_issue"),
            F.array(F.lit("x")).alias("x_labels"),
        )
    )
    recs.write.mode("overwrite").parquet(os.path.join(CORPUS, "records"))

    n_hold = N_HOLDINGS_FILES * HOLDINGS_ROWS_PER_FILE
    holdings = spark.range(n_hold).select(
        F.concat(
            F.lit("file:kbart_"), (F.col("id") % N_HOLDINGS_FILES).cast("string")
        ).alias("file_uri"),
        F.concat(F.lit("Title "), F.col("id").cast("string")).alias(
            "publication_title"
        ),
        # holdings cover a contiguous band of the ISSN pool so a
        # realistic fraction of records hits the KBART join
        _issn(F.col("id") % (N_ISSN_POOL // 2)).alias("print_identifier"),
        F.when(F.col("id") % 3 == 0, _issn((F.col("id") + 1) % (N_ISSN_POOL // 2)))
        .alias("online_identifier"),
        F.date_add(F.lit("1950-01-01").cast("date"), (F.col("id") % 20_000).cast("int"))
        .alias("date_first_issue_online"),
        F.when(
            F.col("id") % 4 != 0,
            F.date_add(
                F.lit("1990-01-01").cast("date"), (F.col("id") % 12_000).cast("int")
            ),
        ).alias("date_last_issue_online"),
        F.when(F.col("id") % 5 == 0, F.lit("R1Y"))
        .when(F.col("id") % 11 == 0, F.lit("P3Y"))
        .alias("embargo_info"),
        F.when(F.col("id") % 7 == 0, (F.col("id") % 30).cast("int")).alias(
            "num_first_vol_online"
        ),
        F.lit(None).cast("int").alias("num_first_issue_online"),
        F.when(F.col("id") % 9 == 0, (F.col("id") % 60 + 10).cast("int")).alias(
            "num_last_vol_online"
        ),
        F.lit(None).cast("int").alias("num_last_issue_online"),
    )
    holdings.write.mode("overwrite").parquet(os.path.join(CORPUS, "holdings"))

    # D1 snapshot corpus: an append-only feed of record VERSIONS, ~3
    # versions per DOI (reference: span-crossref-snapshot compacts
    # 600M-1B feed rows to 130-157M keys; BASELINE.md:15 = 28K docs/s)
    n_keys = max(n_records // 3, 1)
    versions = spark.range(n_records).select(
        F.concat(F.lit("10.1000/d"), (F.col("id") % n_keys).cast("string")).alias(
            "doi"
        ),
        F.col("id").alias("vid"),
        F.timestamp_seconds(F.lit(1_500_000_000) + (F.col("id") / n_keys).cast("long"))
        .alias("indexed_ts"),
        F.concat(F.lit("Title v"), (F.col("id") % 7).cast("string")).alias("title"),
        (F.col("id") % 20_000).cast("string").alias("member"),
    )
    versions.write.mode("overwrite").parquet(os.path.join(CORPUS, "versions"))

    # near-dup corpus: 1/10th of n_records documents, ~40 words each,
    # with a planted ~3% near-duplicate tail (same word stream, one
    # token perturbed) so LSH banding has real work to do
    n_docs = max(n_records // 10, 1)
    base = spark.range(n_docs).select(
        F.col("id"),
        # ~3% of docs (id % 33 == 0) share a text seed with a sibling
        # (id - id%10 -> seed family, perturbed by id%10 below)
        F.when(F.col("id") % 33 == 0, F.col("id") - (F.col("id") % 10))
        .otherwise(F.col("id"))
        .alias("seed"),
    )
    # modulus must exceed the seed space: with a small modulus, seeds a
    # multiple of it apart generate IDENTICAL word streams and the
    # corpus silently becomes ~half duplicates
    words = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit(f"w{j}_"),
                ((F.col("seed") * (j + 7)) % 2_147_483_647).cast("string"),
            )
            for j in range(40)
        ],
    )
    docs = base.select(
        F.col("id").alias("doc_id"),
        F.concat(
            words, F.lit(" tail"), (F.col("id") % 10).cast("string")
        ).alias("text"),
    )
    docs.write.mode("overwrite").parquet(os.path.join(CORPUS, "docs"))


def filter_config() -> dict:
    """22-ISIL config in the reference's styles (amsl.py:880-886):
    source+collection conjunctions, ISSN-list branches, and
    holdings-file leaves spread over the 30 KBART files."""
    cfg: dict = {}
    for i in range(N_ISILS):
        isil = f"DE-{i:02d}"
        sids = [str((i * 3 + k) % N_SOURCES) for k in range(3)]
        colls = [f"Coll {(i * 17 + k) % N_COLLECTIONS}" for k in range(8)]
        if i % 3 == 0:
            cfg[isil] = {"and": [{"source": sids}, {"collection": colls}]}
        elif i % 3 == 1:
            issns = [
                f"{(i * 997 + k * 13) % 10_000:04d}-{(i + k) % 1_000:03d}X"
                for k in range(2_000)
            ]
            cfg[isil] = {
                "or": [
                    {"and": [{"source": sids}, {"collection": colls}]},
                    {"and": [{"source": sids}, {"issn": {"list": issns}}]},
                ]
            }
        else:
            files = [
                f"file:kbart_{(i + k) % N_HOLDINGS_FILES}" for k in range(1 + i % 3)
            ]
            cfg[isil] = {
                "and": [{"source": sids}, {"holdings": {"files": files}}]
            }
    return cfg


def main() -> None:
    import datetime

    n_records = int(os.environ.get("SCALE_RECORDS", 10_000_000))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("siskin-scale-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    marker = os.path.join(CORPUS, f".built3_{n_records}")
    if not os.path.exists(marker):
        shutil.rmtree(CORPUS, ignore_errors=True)
        build_corpus(spark, n_records)
        open(marker, "w").close()

    from siskin_spark.operators.licensing import apply_oa_flag, attach_labels

    records = spark.read.parquet(os.path.join(CORPUS, "records"))
    holdings = spark.read.parquet(os.path.join(CORPUS, "holdings"))

    oa_issns = spark.range(N_OA_ISSNS).select(_issn(F.col("id") * 3).alias("issn"))
    free_colls = [f"Coll {k}" for k in range(0, N_COLLECTIONS, 20)]

    def timed(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results: dict[str, float] = {}

    oa = lambda: apply_oa_flag(  # noqa: E731
        records,
        oa_issns=oa_issns,
        free_collections=free_colls,
        oa_source_ids=["5", "17"],
        excluded_source_ids=["39"],
    )
    timed(oa())  # warm-up: scan cache, codegen, broadcast
    results["oa_flag_s"] = min(timed(oa()) for _ in range(2))

    lic = lambda: attach_labels(  # noqa: E731
        records,
        filter_config(),
        holdings=holdings,
        now=datetime.date(2026, 8, 13),
    )
    timed(lic())
    results["licensing_tag_s"] = min(timed(lic()) for _ in range(2))

    from siskin_spark.operators.dedup import snapshot_latest

    versions = spark.read.parquet(os.path.join(CORPUS, "versions"))
    snap = lambda: snapshot_latest(  # noqa: E731
        versions, ["doi"], ["indexed_ts", "vid"]
    )
    timed(snap())
    results["snapshot_s"] = min(timed(snap()) for _ in range(2))

    from siskin_spark.operators.neardup import (
        exact_jaccard,
        lsh_candidates,
        shingle_table,
    )

    docs = spark.read.parquet(os.path.join(CORPUS, "docs"))
    n_docs = docs.count()

    def neardup():
        sh = shingle_table(docs)
        cands = lsh_candidates(docs, shingles=sh)
        return exact_jaccard(cands, sh).filter(F.col("jaccard") >= 0.8)

    timed(neardup())
    results["neardup_s"] = min(timed(neardup()) for _ in range(2))
    n_pairs = neardup().count()

    out = {
        "metric": "records_per_second",
        "records": n_records,
        "cpus": cpus,
        "oa_flag_s": round(results["oa_flag_s"], 2),
        "oa_flag_rps": round(n_records / results["oa_flag_s"]),
        "oa_flag_baseline_rps": 41_700,
        "licensing_tag_s": round(results["licensing_tag_s"], 2),
        "licensing_tag_rps": round(n_records / results["licensing_tag_s"]),
        "licensing_tag_baseline_rps": 20_000,
        "snapshot_s": round(results["snapshot_s"], 2),
        "snapshot_rps": round(n_records / results["snapshot_s"]),
        "snapshot_keys": n_records // 3,
        "snapshot_baseline_rps": 28_000,
        "neardup_s": round(results["neardup_s"], 2),
        "neardup_docs": n_docs,
        "neardup_dps": round(n_docs / results["neardup_s"]),
        "neardup_verified_pairs": n_pairs,
        "n_isils": N_ISILS,
        "n_holdings_rows": N_HOLDINGS_FILES * HOLDINGS_ROWS_PER_FILE,
        "n_oa_issns": N_OA_ISSNS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
