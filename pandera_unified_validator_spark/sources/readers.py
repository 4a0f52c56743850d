"""Source connectors (SURVEY.md §2.1 S1-S7) as thin, validation-aware
wrappers over Spark's native readers.

The reference's chunked readers (``core/streaming.py:146-327``) exist to
bound memory in a single process; Spark partitions make that free, so the
value-add here is (a) parse-error rows surfaced as first-class violations
(S2's ``__parse_error__`` rows, reference ``core/streaming.py:208``), and
(b) Pydantic-style type strictness (U4: ``"oops"`` is not an int) via
read-as-string + cast-null detection, which the one-pass validator then
reports like any other check.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.compiler import schema_struct, spark_type
from ..plans.schema import ValidationSchema

__all__ = [
    "CORRUPT_COL",
    "read_csv",
    "read_jsonl",
    "read_parquet",
    "read_orc",
    "read_text_corpus",
    "read_jdbc",
    "from_records",
    "with_cast_violations",
]

CORRUPT_COL = "__parse_error__"  # matches the reference's marker row key
# NOTE: Spark rejects plans whose referenced columns are ONLY the corrupt
# column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — always
# project at least one data column alongside it, as the validator does.


def read_csv(
    spark: SparkSession,
    path: str,
    schema: ValidationSchema | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    """S1/S7. With a schema: typed permissive read; malformed rows keep their
    raw text in ``__parse_error__`` (a not-null check on it = parse validation)."""
    reader = spark.read.option("header", header).option("mode", "PERMISSIVE")
    if schema is not None:
        struct = schema_struct(schema).add(CORRUPT_COL, "string")
        reader = reader.schema(struct).option("columnNameOfCorruptRecord", CORRUPT_COL)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: ValidationSchema | None = None,
    **options,
) -> DataFrame:
    """S2. JSON-lines with parse errors as rows (reference buffered
    json.loads line-by-line and emitted ``{"__parse_error__": line}``)."""
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        struct = schema_struct(schema).add(CORRUPT_COL, "string")
        reader = reader.schema(struct).option("columnNameOfCorruptRecord", CORRUPT_COL)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str, columns: Sequence[str] | None = None) -> DataFrame:
    """S3. Row groups ≈ input splits; column pruning reaches the scan when
    ``columns`` is given (or via downstream select — Catalyst prunes)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_orc(spark: SparkSession, path: str, columns: Sequence[str] | None = None) -> DataFrame:
    """ORC scan (native Spark source, same split/pruning/pushdown behavior
    as parquet — stripes ≈ input splits). Included so ORC-resident corpora
    feed the engine without a conversion hop."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def read_text_corpus(
    spark: SparkSession,
    path: str,
    whole_files: bool = True,
) -> DataFrame:
    """Raw text-file corpus ingestion → (doc_id, text).

    ``whole_files=True`` (the corpus case): one document per file,
    ``doc_id`` = the file path (stable, unique, resumable — the same key
    the lineage/partition-group loop uses). ``whole_files=False``: one row
    per line with ``doc_id = path#<line-fingerprint>`` — NOT unique when a
    file repeats a line verbatim (by design: identical lines ARE exact
    duplicates; run ``dedup_exact`` next). Either way the result plugs
    straight into the text/dedup/sampling operators."""
    reader = spark.read.format("text")
    if whole_files:
        reader = reader.option("wholetext", True)
    df = reader.load(path).select(
        F.input_file_name().alias("__path"), F.col("value").alias("text")
    )
    if whole_files:
        return df.select(F.col("__path").alias("doc_id"), "text")
    return df.select(
        F.concat_ws("#", F.col("__path"), F.xxhash64("text").cast("string")).alias(
            "doc_id"
        ),
        "text",
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: Mapping[str, str] | None = None,
) -> DataFrame:
    """S5. The reference drained a DB cursor single-threaded
    (``core/streaming.py:284-327``); Spark's JDBC source range-partitions the
    scan across executors when given a numeric partition column + bounds."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound if lower_bound is not None else 0)
            .option("upperBound", upper_bound if upper_bound is not None else 1 << 31)
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def from_records(
    spark: SparkSession,
    data,
    schema: ValidationSchema | None = None,
) -> DataFrame:
    """S6 payload coercion: dict → 1-row frame, list-of-dicts → frame,
    pandas passthrough (reference ``core/validator.py:169-176``)."""
    if isinstance(data, dict):
        data = [data]
    if schema is not None:
        return spark.createDataFrame(data, schema_struct(schema))
    return spark.createDataFrame(data)


def with_cast_violations(df: DataFrame, schema: ValidationSchema) -> tuple[DataFrame, list[str]]:
    """U4 type strictness: cast each declared column to its declared type;
    a non-null raw value that casts to NULL is a type violation. Returns the
    casted frame plus the names of injected ``<col>__cast`` flag columns
    (TRUE = ok) to fold into validation via custom SQL checks."""
    out = df
    flags: list[str] = []
    for spec in schema.columns.values():
        if spec.name not in df.columns or spec.dtype.startswith("array"):
            continue
        t = spark_type(spec.dtype).simpleString()
        raw = F.col(spec.name)
        # try_cast, not cast: ANSI mode (Spark 4 default) makes a failed cast
        # throw; the Pydantic-strict semantic we want is "unparseable → NULL →
        # flagged violation", never a job abort.
        casted = raw.try_cast(t)
        flag = f"{spec.name}__cast_ok"
        out = out.withColumn(flag, raw.isNull() | casted.isNotNull()).withColumn(
            spec.name, casted
        )
        flags.append(flag)
    return out, flags
