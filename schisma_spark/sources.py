"""Source/sink seam (SURVEY §2.B E1/E2).

The design target is an Iceberg table (BASELINE.json input_hint); this
sandbox ships no iceberg-spark-runtime jar, so the seam defaults to Parquet
and switches to Iceberg when a catalog is configured. All engine code goes
through ``read_table``/``write_table`` so the swap is one config, not a
refactor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: B018
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, ref: str, fmt: str = "auto") -> DataFrame:
    """``ref`` is a path (parquet) or a catalog table name (iceberg).
    fmt: auto | parquet | iceberg."""
    if fmt == "iceberg" or (fmt == "auto" and "/" not in ref):
        if fmt == "iceberg" and not _has_iceberg(spark):
            raise RuntimeError("iceberg runtime not on classpath")
        if _has_iceberg(spark) and "/" not in ref:
            return spark.read.format("iceberg").load(ref)
        if "/" not in ref:
            return spark.table(ref)
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, fmt: str = "auto",
                mode: str = "append", partition_by: list[str] | None = None):
    if fmt == "iceberg" and "/" not in ref:
        w = df.writeTo(ref)
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ref)
