"""siskin_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the siskin article-index ETL
(reference: /root/reference, studied in SURVEY.md).

Layers (SURVEY.md §7.1):

- :mod:`siskin_spark.schema`    — canonical intermediate-schema StructType,
  field-name bijection, deterministic id builder.
- :mod:`siskin_spark.sources`   — readers/writers (parquet, ndjson, TSV/KBART,
  AMSL config) expressed via ``spark.read`` so Catalyst sees pushdown.
- :mod:`siskin_spark.operators` — pure ``DataFrame -> DataFrame`` operators:
  dedup (window snapshot, groupcover), joins (semi/anti/interval), licensing
  filter-tree compiler, aggregations, per-record transforms.
- :mod:`siskin_spark.functions` — scalar/column function surface: text
  analysis, similarity (minhash/simhash/cosine), quality scoring.
- :mod:`siskin_spark.plans`     — memoized incremental-batch pipeline runner
  (the Luigi-equivalent stage layer).
- :mod:`siskin_spark.streaming` — Structured Streaming tail for the
  harvest->bronze path (optional executor; semantics stay batch).

Everything here derives from public knowledge (Apache Spark APIs and the
public reference repo); it is a Spark-first re-expression, not a port.
"""

__version__ = "0.4.0"
