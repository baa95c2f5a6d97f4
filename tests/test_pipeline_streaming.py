"""Tests: pipeline runner memoization, streaming availableNow ingest,
multimodal mapInPandas plumbing, mapping-spec normalizer."""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from siskin_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image_stub,
    extract_features,
    frame_sample_stub,
    resize_stub,
)
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


def test_multimodal_features(spark):
    rows = [
        (1, "image", b"\x89PNGfakebytes", "image/png", {}),
        (2, "audio", b"RIFFfakewav", "audio/wav", {}),
        (3, "video", b"\x00\x00ftypmp4fake", "video/mp4", {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media).collect()
    assert len(feats) == 3
    f1 = next(r for r in feats if r["media_id"] == 1)
    assert 64 <= f1["width"] <= 255 and len(f1["feature"]) == 8
    # determinism: same bytes -> same feature vector
    again = next(r for r in extract_features(media).collect() if r["media_id"] == 1)
    assert again["feature"] == f1["feature"]
    # resize/frame-sample plumbing
    resized = resize_stub(media, 224, 224).first()
    assert resized["meta"]["resize_w"] == "224"
    frames = frame_sample_stub(media).collect()
    assert all(r["kind"] == "video" for r in frames) and len(frames) >= 1
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"x")


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
