"""Tests: pipeline runner memoization, streaming availableNow ingest,
mapping-spec normalizer, bucketed-stage co-location, watermarked
append-mode streaming. (Multimodal and memo tests live in
test_multimodal.py / test_memo.py.)"""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from siskin_spark.operators.normalize import apply_mapping
from siskin_spark.plans.pipeline import Pipeline, snap_date
from siskin_spark.streaming.incremental import ingest_available_now, windowed_counts


def test_pipeline_memoization(tmp_path, spark, sf_dir):
    calls = {"raw": 0, "agg": 0}
    pipe = Pipeline(base=str(tmp_path))

    @pipe.stage("raw")
    def raw(spark_, inputs, params):
        calls["raw"] += 1
        return spark_.read.parquet(os.path.join(sf_dir, "nation.parquet"))

    @pipe.stage("agg", requires=("raw",))
    def agg(spark_, inputs, params):
        calls["agg"] += 1
        return inputs["raw"].groupBy("n_regionkey").count()

    d = datetime.date(2026, 8, 13)
    out1 = pipe.run(spark, "agg", date=d)
    assert out1.count() == 5
    pipe.run(spark, "agg", date=d)  # second run: all cache hits
    assert calls == {"raw": 1, "agg": 1}
    assert pipe.deps("agg") == ["raw", "agg"]
    assert pipe.status({}, d) == {"raw": True, "agg": True}


def test_snap_date():
    d = datetime.date(2026, 8, 13)  # a Thursday
    assert snap_date(d, "weekly") == datetime.date(2026, 8, 10)
    assert snap_date(d, "monthly") == datetime.date(2026, 8, 1)
    assert snap_date(d, "daily") == d


def test_streaming_available_now(tmp_path, spark):
    src = tmp_path / "src"
    src.mkdir()
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    (src / "a.json").write_text("\n".join(json.dumps({"id": i, "v": f"x{i}"}) for i in range(5)))
    dst, ckpt = str(tmp_path / "bronze"), str(tmp_path / "ckpt")
    ingest_available_now(spark, str(src), dst, ckpt, schema)
    assert spark.read.parquet(dst).count() == 5
    # incremental: only the new file is processed on the next run
    (src / "b.json").write_text(json.dumps({"id": 99, "v": "new"}))
    ingest_available_now(spark, str(src), dst, ckpt, schema)
    got = spark.read.parquet(dst)
    assert got.count() == 6
    assert got.filter("id = 99").count() == 1


def test_windowed_counts_batch(spark, sf_dir):
    from siskin_spark.sources.readers import read_table

    ev = read_table(spark, sf_dir, "events")
    out = windowed_counts(ev)
    row = out.orderBy("window_start", "event_type").first()
    assert row["n"] > 0 and row["sum_value"] is not None


def test_mapping_normalizer(spark):
    raw = spark.createDataFrame(
        [("r1", "OLC-MUSIC", "Some Title", "2001", "A, B, C", ["1111-2222", "3333-4444"])],
        "rid string, fmt string, title string, year string, authors_csv string, issns array<string>",
    )
    spec = {
        "finc_id": {"finc_id": {"source_id": "68", "record_col": "rid"}},
        "finc_format": {
            "map": {"from": "fmt", "table": {"OLC-MUSIC": "Article"}, "default": "Unknown"}
        },
        "rft_atitle": {"col": "title"},
        "rft_date": {"regex": {"from": "year", "pattern": r"(\d{4})"}},
        "x_date": {"date_synth": {"from": "year"}},
        "authors_list": {"split": {"from": "authors_csv", "sep": ","}},
        "first_issn": {"first": {"from": "issns"}},
        "finc_mega_collection": {"const_array": ["OLC SSG Musik"]},
    }
    out = apply_mapping(raw, spec).first()
    assert out["finc_id"] == "ai-68-cjE"  # b64("r1") == "cjE="; padding stripped
    assert out["finc_format"] == "Article"
    assert out["x_date"] == datetime.datetime(2001, 1, 1)
    assert out["authors_list"] == ["A", "B", "C"]
    assert out["first_issn"] == "1111-2222"


def test_bucketed_stages_join_without_exchange(tmp_path, spark, sf_dir):
    """Two stages bucketed on the same key must sort-merge join with
    ZERO Exchange operators — the co-location contract that lets the
    doi-keyed production chain shuffle the corpus once, not per stage.
    Also pins session recovery: dropping the catalog entry and
    re-reading re-registers the bucket spec from disk."""
    pipe = Pipeline(base=str(tmp_path))

    @pipe.stage("cust", bucket_by=("c_custkey",), n_buckets=4)
    def cust(spark_, inputs, params):
        return spark_.read.parquet(os.path.join(sf_dir, "customer.parquet"))

    @pipe.stage("ords", bucket_by=("c_custkey",), n_buckets=4)
    def ords(spark_, inputs, params):
        return spark_.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
        )

    d = datetime.date(2026, 8, 13)
    left = pipe.run(spark, "cust", date=d)
    right = pipe.run(spark, "ords", date=d)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = left.join(right, on="c_custkey").select("c_custkey", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        n = joined.count()
        assert n > 0

        # session-recovery path: drop the catalog entries, re-read via
        # the pipeline — bucket spec must be re-attached from disk
        for t in list(spark.catalog.listTables()):
            spark.sql(f"DROP TABLE IF EXISTS `{t.name}`")
        left2 = pipe.read(spark, "cust", date=d)
        right2 = pipe.read(spark, "ords", date=d)
        joined2 = left2.join(right2, on="c_custkey").select("c_custkey", "o_orderkey")
        plan2 = joined2._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan2, plan2
        assert joined2.count() == n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_windowed_counts_streaming_append(tmp_path, spark):
    """The watermark + append-mode path a streaming run exercises:
    availableNow over a file source, windows emit once the watermark
    passes them, and the streamed result matches the batch result of
    the same aggregation (late-data semantics aside, a bounded replay
    has none)."""
    import datetime

    src = tmp_path / "sev"
    src.mkdir()
    rows = [
        {"ts": f"2024-01-01T{h:02d}:10:00", "event_type": f"e{h % 2}",
         "value": float(h)}
        for h in range(6)
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    stream = spark.readStream.schema(schema).json(str(src))
    out = windowed_counts(stream, window="1 hour", watermark="30 minutes")
    dst, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        out.writeStream.format("parquet")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(dst)
    # append mode only emits windows the watermark has passed: the last
    # window (max ts) is still open when the bounded stream ends
    streamed = {(r["window_start"].isoformat(), r["event_type"]): (r["n"], r["sum_value"])
                for r in got.collect()}
    batch = spark.createDataFrame(
        [
            (datetime.datetime.fromisoformat(r["ts"]), r["event_type"], r["value"])
            for r in rows
        ],
        schema,
    )
    want_all = {(r["window_start"].isoformat(), r["event_type"]): (r["n"], r["sum_value"])
                for r in windowed_counts(batch, window="1 hour").collect()}
    # watermark at stream end = max event time - 30 min = 04:40; append
    # mode emits exactly the windows that END at or before it (hours
    # 00-03), leaving the 04:00 and 05:00 windows unemitted
    watermark = datetime.datetime(2024, 1, 1, 4, 40)
    want = {
        k: v
        for k, v in want_all.items()
        if datetime.datetime.fromisoformat(k[0]) + datetime.timedelta(hours=1)
        <= watermark
    }
    assert streamed == want and len(streamed) == 4


def test_streaming_curation_marks(tmp_path, spark):
    """The row-local curation surface (deterministic sample marks, PII
    scrub, quality fractions) is stateless, so it composes directly
    onto a stream — same verdicts the batch path gives, exactly-once
    per file via availableNow."""
    import json as _json

    from siskin_spark.functions.text import dup_line_fraction, scrub_pii
    from siskin_spark.operators.curation import sample_mark

    src = tmp_path / "cur_src"
    src.mkdir()
    rows = [
        {"doc_id": i, "text": f"doc {i} mail u{i}@ex.org body words here"}
        for i in range(20)
    ]
    (src / "a.json").write_text("\n".join(_json.dumps(r) for r in rows))
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    out, ckpt = str(tmp_path / "cur_out"), str(tmp_path / "cur_ckpt")
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        stream.select(
            "doc_id",
            sample_mark(F.col("doc_id"), 0.5).alias("keep"),
            scrub_pii("text").alias("clean"),
            dup_line_fraction("text", sep=" ").alias("dup_frac"),
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["doc_id"]: r.asDict() for r in spark.read.parquet(out).collect()}
    assert len(got) == 20
    assert all("@" not in r["clean"] and "<EMAIL>" in r["clean"] for r in got.values())
    # stream verdicts == batch verdicts (engine-stable sampling)
    batch = {
        r["doc_id"]: r["keep"]
        for r in spark.read.json(str(src), schema=schema)
        .select("doc_id", sample_mark(F.col("doc_id"), 0.5).alias("keep"))
        .collect()
    }
    assert {k: v["keep"] for k, v in got.items()} == batch


def test_streaming_r9_marks(tmp_path, spark):
    """r9 verdict #6: the newer stateless curation marks — the URL
    dedup key (canonical_url), the CCNet bucket mark (thresholds
    PRE-COMPUTED batch-side, riding the streaming plan as literals —
    a stream cannot aggregate percentiles statelessly), and the
    OOV-rate gate — ride the availableNow mirror like the other
    marks: stream verdicts equal batch verdicts row-for-row."""
    import json as _json

    from siskin_spark.functions.text import canonical_url
    from siskin_spark.operators.curation import (
        oov_fraction,
        quality_bucket_mark,
        quality_bucket_thresholds,
        split_label,
        unigram_logprob_mark,
        unigram_logprob_table,
    )

    lp6, oov = unigram_logprob_table([("tok", 90), ("zz", 10)])

    src = tmp_path / "m_src"
    src.mkdir()
    rows = [
        {
            "doc_id": i,
            "url": f"HTTPS://www.Ex{i % 3}.com:443/p?b={i}&utm_source=x&a=1",
            "text": " ".join("tok" for _ in range(i + 1)) + " zz",
        }
        for i in range(20)
    ]
    (src / "a.json").write_text("\n".join(_json.dumps(r) for r in rows))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("url", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    batch_df = spark.read.json(str(src), schema=schema)
    th = quality_bucket_thresholds(
        batch_df.select(F.size(F.split("text", " ")).alias("nt")),
        "nt",
        snap_integral=True,
    )

    def marks(df):
        return df.select(
            "doc_id",
            canonical_url("url").alias("url_key"),
            quality_bucket_mark(F.size(F.split("text", " ")), th).alias(
                "len_bucket"
            ),
            oov_fraction(["tok"]).alias("oov"),
            split_label(
                F.col("doc_id"), {"train": 0.8, "val": 0.2}, seed=5
            ).alias("split"),
            unigram_logprob_mark(
                F.filter(F.split("text", " "), lambda t: F.length(t) > 0),
                lp6,
                oov,
            ).alias("uni_lp"),
        )

    out, ckpt = str(tmp_path / "m_out"), str(tmp_path / "m_ckpt")
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        marks(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["doc_id"]: r.asDict() for r in spark.read.parquet(out).collect()}
    want = {r["doc_id"]: r.asDict() for r in marks(batch_df).collect()}
    assert got == want and len(got) == 20
    # the marks did real work: params sorted+stripped, buckets split,
    # oov reflects the one non-vocab token per doc
    assert got[0]["url_key"] == "ex0.com/p?a=1&b=0"
    assert {v["len_bucket"] for v in got.values()} == {"head", "middle", "tail"}
    assert abs(got[19]["oov"] - 1 / 21) < 1e-12
    assert {v["split"] for v in got.values()} == {"train", "val"}
    # doc 0 is 'tok zz' — both in-vocab: the exact fixed-point mean
    assert got[0]["uni_lp"] == float(lp6["tok"] + lp6["zz"]) / 2 / 1e6
