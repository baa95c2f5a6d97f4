"""Vector similarity search over embedding columns (array<float>)
(SURVEY.md §7.5: brute-force cosine top-k baseline + LSH/IVF-bucketed
scale path).

Numeric design: elements are cast float->double (exact), then dot
products fold left-to-right — both Spark's ``aggregate`` and DuckDB's
list reductions accumulate sequentially, so results are bit-identical
and oracle-checkable without tolerances.

Scale path: at 100 TB the index side is bucketed (sign-LSH or IVF via
k-means centroids) and the probe side broadcasts; a probe only scans
its bucket. Brute force remains the recall oracle on samples.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _parallel(df: DataFrame, key: str) -> DataFrame:
    """Vector scoring is CPU-bound (sequential-fold dot products); a
    small parquet input arrives as one split and would pin the whole
    scan side to one core. Repartition up to core count; no-op at real
    scale where the scan already yields enough splits.

    The small/large decision uses Catalyst's optimized-plan size
    estimate — a driver-only lookup. (``df.rdd.getNumPartitions()``
    would answer exactly, but under AQE converting to an RDD
    materializes upstream shuffle stages: a hidden 1-2 s job per
    call.) If the estimate is at least cores x maxPartitionBytes the
    scan already splits to core count and the shuffle is skipped;
    below that a repartition of so little data costs microseconds."""
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    m = re.fullmatch(r"(\d+)\s*([kmg]?)b?", raw.strip().lower())
    max_split = int(m.group(1)) * units.get(m.group(2), 1) if m else 128 << 20
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if size < cores * max_split:
        return df.repartition(cores, F.col(key))
    return df


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _cosine_prenormed(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with norms precomputed once per row instead of once per
    pair: a pair costs one fold (the dot) instead of three. Same fold
    order and operations as :func:`cosine`, so results are
    bit-identical — the oracle contract is unchanged."""
    return dot(a, b) / (na * nb)


def brute_force_topk(
    probes: DataFrame,
    index: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe vector.

    Plan: broadcast the (small) probe set against the index — a map-side
    nested loop, no shuffle of the index — then a per-probe top-k window.
    Ties broken by neighbor id for determinism.
    Returns (probe_id, neighbor_id, cos_sim, rank); self-matches excluded.
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("_pv"),
        norm(F.col(vec_col)).alias("_pn"),
    )
    i = _parallel(index, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_iv"),
        norm(F.col(vec_col)).alias("_in"),
    )
    scored = broadcast(p).crossJoin(i).filter(
        F.col("probe_id") != F.col("neighbor_id")
    ).select(
        "probe_id",
        "neighbor_id",
        _cosine_prenormed(
            F.col("_pv"), F.col("_iv"), F.col("_pn"), F.col("_in")
        ).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sign_bucket(vec: Column, dims: int = 6) -> Column:
    """Crude-but-deterministic LSH bucket: sign bits of the first
    ``dims`` components packed into an integer (2^dims buckets).
    A stand-in for random-hyperplane LSH that any SQL engine can
    recompute; swap hyperplanes in via :func:`hyperplane_bucket`."""
    bit = lambda j: F.when(F.element_at(vec, j + 1) > 0, F.lit(1 << j)).otherwise(F.lit(0))  # noqa: E731
    out = bit(0)
    for j in range(1, dims):
        out = out + bit(j)
    return out


def hyperplane_bucket(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane LSH bucket with deterministic pseudo-random
    ±1 hyperplanes: plane i, component d has weight +1 when
    (i*31 + d*17) % 2 == 0 else -1. Bucket = packed sign bits of the
    projections."""
    out = F.lit(0)
    for i in range(n_planes):
        weights = [1 if (i * 31 + d * 17) % 2 == 0 else -1 for d in range(dim)]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(w)) for w in weights]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out


def ivf_assign(
    index: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (IVF cell) by cosine.

    ``centroids`` is (cid, cv) — small (k-means fit on a sample at
    scale), so it broadcasts; the index never shuffles for assignment.
    Ties broken by cid. Returns the index columns plus ``cid``.

    Argmax via ``max_by`` (hash aggregate with map-side partials)
    rather than a row_number window — no per-partition sort, and the
    shuffle carries one pre-reduced row per vector.
    """
    cols = index.columns
    normed_centroids = centroids.withColumn("_cn", norm(F.col("cv")))
    scored = (
        _parallel(index, id_col)
        .withColumn("_vn", norm(F.col(vec_col)))
        .crossJoin(broadcast(normed_centroids))
        .withColumn(
            "_csim",
            _cosine_prenormed(
                F.col(vec_col), F.col("cv"), F.col("_vn"), F.col("_cn")
            ),
        )
    )
    winner = F.max_by(
        F.struct(*[F.col(c) for c in cols], F.col("cid")),
        F.struct(F.col("_csim"), (-F.col("cid")).alias("_nc")),
    ).alias("_w")
    out = scored.groupBy(id_col).agg(winner)
    return out.select(*[F.col(f"_w.{c}").alias(c) for c in [*cols, "cid"]])


def ivf_topk(
    probes: DataFrame,
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Per-probe top-k within the probe's IVF cell (nprobe=1): one
    equi-join on cid replaces the cross join — the 100 TB path, since
    each probe scans ~1/n_cells of the index. Returns
    (probe_id, neighbor_id, cos_sim, rank); self-matches excluded."""
    from pyspark.sql import Window

    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("_pv"),
        norm(F.col(vec_col)).alias("_pn"),
        "cid",
    )
    i = _parallel(assigned, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_iv"),
        norm(F.col(vec_col)).alias("_in"),
        "cid",
    )
    scored = (
        broadcast(p)
        .join(i, on="cid")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            _cosine_prenormed(
                F.col("_pv"), F.col("_iv"), F.col("_pn"), F.col("_in")
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def bucketed_ann_topk(
    probes: DataFrame,
    index: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dims: int = 6,
) -> DataFrame:
    """Approximate top-k: probes only scan their sign-LSH bucket.
    One equi-join on bucket id instead of a cross join — the 100 TB
    path (bucket the index once, reuse across query batches)."""
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("_pv"),
        norm(F.col(vec_col)).alias("_pn"),
        sign_bucket(F.col(vec_col), dims).alias("_bucket"),
    )
    i = _parallel(index, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_iv"),
        norm(F.col(vec_col)).alias("_in"),
        sign_bucket(F.col(vec_col), dims).alias("_bucket"),
    )
    scored = broadcast(p).join(i, on="_bucket").filter(
        F.col("probe_id") != F.col("neighbor_id")
    ).select(
        "probe_id",
        "neighbor_id",
        _cosine_prenormed(
            F.col("_pv"), F.col("_iv"), F.col("_pn"), F.col("_in")
        ).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
