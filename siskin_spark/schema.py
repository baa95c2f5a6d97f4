"""Canonical intermediate-schema StructType and field-name bijection
(SURVEY.md §1).

The reference's wire format is one JSON object per line with dotted
field names (``finc.id``, ``rft.atitle``, ``x.labels``); the engine
normalizes them to underscore names with a documented bijection
(dots -> underscores on the known-field list only, so round-tripping is
exact). Persisted as Parquet(zstd) instead of ndjson+zstd.

Field surface per reference conversions.py:310-335,477-511,542-572 and
openurl.py:64-162; see FIXTURES.md §1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

AUTHOR_TYPE = T.StructType(
    [
        T.StructField("rft_au", T.StringType()),
        T.StructField("rft_aufirst", T.StringType()),
        T.StructField("rft_aulast", T.StringType()),
        T.StructField("rft_auinit", T.StringType()),
        T.StructField("rft_aucorp", T.StringType()),
        T.StructField("rft_ausuffix", T.StringType()),
    ]
)

_S = T.StringType()
_AS = T.ArrayType(T.StringType())

INTERMEDIATE_SCHEMA = T.StructType(
    [
        T.StructField("finc_id", _S),
        T.StructField("finc_record_id", _S),
        T.StructField("finc_source_id", _S),
        T.StructField("finc_mega_collection", _AS),
        T.StructField("finc_format", _S),
        T.StructField("rft_atitle", _S),
        T.StructField("rft_jtitle", _S),
        T.StructField("rft_btitle", _S),
        T.StructField("rft_stitle", _S),
        T.StructField("rft_date", _S),
        T.StructField("x_date", T.TimestampType()),
        T.StructField("rft_volume", _S),
        T.StructField("rft_issue", _S),
        T.StructField("rft_pages", _S),
        T.StructField("rft_spage", _S),
        T.StructField("rft_epage", _S),
        T.StructField("rft_tpages", _S),
        T.StructField("rft_genre", _S),
        T.StructField("rft_series", _S),
        T.StructField("rft_edition", _S),
        T.StructField("rft_artnum", _S),
        T.StructField("rft_issn", _AS),
        T.StructField("rft_eissn", _AS),
        T.StructField("rft_isbn", _AS),
        T.StructField("rft_pub", _AS),
        T.StructField("rft_place", _AS),
        T.StructField("authors", T.ArrayType(AUTHOR_TYPE)),
        T.StructField("doi", _S),
        T.StructField("url", _AS),
        T.StructField("abstract", _S),
        T.StructField("languages", _AS),
        T.StructField("subjects", _AS),
        T.StructField("x_labels", _AS),
        T.StructField("x_oa", T.BooleanType()),
        T.StructField("x_fulltext", _S),
        T.StructField("x_subtitle", _S),
        T.StructField("version", _S),
    ]
)

# wire-name bijection: dotted JSON keys <-> underscore column names
WIRE_TO_COL = {
    f.name.replace("finc_", "finc.", 1)
    .replace("rft_", "rft.", 1)
    .replace("x_", "x.", 1): f.name
    for f in INTERMEDIATE_SCHEMA.fields
    if f.name != "authors" and f.name != "doi" and f.name != "url"
    and f.name not in ("abstract", "languages", "subjects", "version")
}
WIRE_TO_COL.update(
    {n: n for n in ("authors", "doi", "url", "abstract", "languages", "subjects", "version")}
)
COL_TO_WIRE = {v: k for k, v in WIRE_TO_COL.items()}

#: zstd ndjson artifact spellings the wire reader must route to the
#: executor-side decompress path: this writer's parts (.json.zst), the
#: reference's single-file artifacts (date-*.ndj.zst), and the long
#: spelling — anything else zstd'd would hit spark.read.json raw
_ZST_NDJSON_SUFFIXES = (".json.zst", ".ndj.zst", ".ndjson.zst")


def issns_all(df_or_none=None) -> F.Column:
    """Union of print + e-ISSNs as one array (null-safe) — the join key
    shape used by holdings evaluation (reference: jstor.py:628-640)."""
    return F.array_union(
        F.coalesce(F.col("rft_issn"), F.array().cast("array<string>")),
        F.coalesce(F.col("rft_eissn"), F.array().cast("array<string>")),
    )


def read_is_ndjson(spark, path: str) -> DataFrame:
    """Read wire-format ndjson (dotted keys) into the canonical frame.

    ``.json.zst`` parts (the reference's wire format; written by
    :func:`write_is_ndjson`) are decompressed EXECUTOR-side via
    pyarrow inside a mapInPandas — Hadoop's ZStandardCodec needs
    libhadoop, which pure-Java deployments (and this container) lack,
    so the zst path never touches the Hadoop codec chain. Other
    compressions (gzip etc.) go through the normal json reader.

    Part listing goes through the Hadoop FileSystem API, so any URI
    scheme Spark can read (file://, hdfs://, s3a://) takes the
    executor-side zst path — a driver-local ``glob`` would silently
    miss remote stores and fall back onto the Hadoop codec chain this
    function exists to avoid. A directory holding BOTH zst and plain/
    gzip parts (e.g. appended by a legacy writer) reads both sides and
    unions them; only committer metadata (``_SUCCESS``, dotfiles) and
    in-flight/orphaned writer temp files (``*._tmp-*``, plus the
    current dot-prefixed naming) are skipped.

    A DIRECT path to one zstd ndjson file — the reference's wire
    artifacts are single compressed files named ``date-*.ndj.zst``
    (alongside this writer's ``.json.zst`` and the ``.ndjson.zst``
    spelling) — or a glob of them routes straight to the executor-side
    zst reader; it must never fall through to ``spark.read.json`` over
    raw compressed bytes, which yields corrupt rows."""
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(path)
    fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
    is_dir = fs.isDirectory(hp)

    def _wire_cols(frame: DataFrame) -> DataFrame:
        return frame.select(
            *[F.col(f"`{w}`").alias(c) for w, c in WIRE_TO_COL.items()]
        )

    if not is_dir:
        # single file or glob: route by suffix — Hadoop globbing works
        # through the binaryFile source, so both cases share one load
        if not path.endswith(_ZST_NDJSON_SUFFIXES):
            return _wire_cols(spark.read.schema(_wire_schema()).json(path))
        zst_src: str | list[str] = path
        other_parts: list[str] = []
    else:
        names = [s.getPath().getName() for s in fs.listStatus(hp) if s.isFile()]
        # skip committer metadata + writer temp files: current tmp names
        # are dot-prefixed (caught by the dotfile filter); "._tmp-" also
        # catches orphans from the pre-dot-prefix writer, which would
        # otherwise be misread as legacy plain-JSON parts
        data = [
            n
            for n in names
            if not n.startswith(("_", ".")) and "._tmp-" not in n
        ]
        zst_parts = [n for n in data if n.endswith(_ZST_NDJSON_SUFFIXES)]
        other_parts = [
            f"{path}/{n}" for n in data if not n.endswith(_ZST_NDJSON_SUFFIXES)
        ]
        if not zst_parts:
            # the explicit-list read keeps the orphan/dotfile filter in
            # force — json(path) would relist the directory and ingest
            # pre-dot-prefix tmp orphans as plain JSON
            if other_parts:
                return _wire_cols(
                    spark.read.schema(_wire_schema()).json(other_parts)
                )
            return _wire_cols(spark.createDataFrame([], _wire_schema()))
        zst_src = [f"{path}/{n}" for n in zst_parts]

    from collections.abc import Iterator

    import pandas as pd

    blobs = spark.read.format("binaryFile").load(zst_src)

    def lines(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pyarrow as pa

        for pdf in batches:
            out: list[str] = []
            for blob in pdf["content"]:
                with pa.input_stream(
                    pa.BufferReader(pa.py_buffer(bytes(blob))),
                    compression="zstd",
                ) as f:
                    # split on '\n' ONLY: str.splitlines also breaks on
                    # U+2028/U+2029/U+0085, which are legal UNESCAPED
                    # inside JSON strings (Jackson only escapes < 0x20)
                    # and would cut a record in two
                    for ln in f.read().decode("utf-8").split("\n"):
                        if ln:
                            out.append(ln)
            yield pd.DataFrame({"value": out})

    parsed = _wire_cols(
        blobs.select("content")
        .mapInPandas(lines, "value string")
        .select(F.from_json("value", _wire_schema()).alias("_r"))
        .select("_r.*")
    )
    if other_parts:
        legacy = _wire_cols(
            spark.read.schema(_wire_schema()).json(other_parts)
        )
        parsed = parsed.unionByName(legacy)
    return parsed


def write_is_ndjson(df: DataFrame, path: str, compression: str = "zstd") -> None:
    """Write the canonical frame back to wire-format ndjson.

    Default codec is zstd — the reference's wire format is
    zstd-compressed ndjson (``... | zstd -T0 -c``, e.g.
    sources/ijoc.py:94-97, workflows/ai.py). Hadoop's own zstd codec
    needs native libhadoop (absent in pure-Java deployments), so the
    zstd path compresses EXECUTOR-side with pyarrow: JSON encoding
    stays JVM-side (``toJSON``), each partition streams through one
    zstd frame to an atomically-renamed part file, and a ``_SUCCESS``
    marker publishes the directory — same layout and crash-safety
    contract as a Hadoop committer, one partition's rows in memory at
    a time, no driver collect. Assumes a filesystem all executors and
    the driver share (true for any file sink). Standard codecs
    (``gzip`` for legacy .gz consumers, etc.) use the built-in sink.
    """
    out = df.select(
        *[F.col(c).alias(w) for c, w in COL_TO_WIRE.items() if c in df.columns]
    )
    if compression != "zstd":
        out.write.mode("overwrite").json(path, compression=compression)
        return

    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    if _os.path.exists(path):
        _shutil.rmtree(path)
    _os.makedirs(path)
    token = _uuid.uuid4().hex[:12]

    def _write(idx: int, it):
        import os
        import pyarrow as pa
        from pyspark import TaskContext

        name = f"part-{idx:05d}-{token}.json.zst"
        part = os.path.join(path, name)
        # per-ATTEMPT tmp name: with speculative execution (or a zombie
        # task racing its stage-retry replacement) two attempts of the
        # same partition run concurrently — a shared tmp file would
        # interleave their frames and the atomic rename would publish
        # corrupt bytes. Each attempt writes its own tmp; os.replace is
        # atomic, so the last complete attempt wins intact. The tmp
        # BASENAME is dot-prefixed so a failed/killed attempt's orphan
        # is invisible to read_is_ndjson's dotfile filter (a
        # "part-*._tmp-*" orphan would read as a legacy plain-JSON
        # part and inject corrupt rows into a _SUCCESS-marked dir).
        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
        tmp = os.path.join(path, f".{name}._tmp-{attempt}")
        with pa.output_stream(tmp, compression="zstd") as f:
            for line in it:
                f.write(line.encode("utf-8"))
                f.write(b"\n")
        os.replace(tmp, part)
        return iter(())

    out.toJSON().mapPartitionsWithIndex(_write).count()  # run the job
    # sweep orphaned tmp files from failed/speculative attempts before
    # publishing, so the committed dir holds only parts + _SUCCESS
    for n in _os.listdir(path):
        if n.startswith(".") and "._tmp-" in n:
            try:
                _os.remove(_os.path.join(path, n))
            except OSError:
                pass
    open(_os.path.join(path, "_SUCCESS"), "w").close()


def _wire_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField(COL_TO_WIRE[f.name], f.dataType)
            for f in INTERMEDIATE_SCHEMA.fields
        ]
    )
