"""Stage-table catalog: Iceberg when configured, parquet directories
otherwise (K1 — the reference's SQLite row sink, database.py:167-180,
becomes table appends here).

One switch point for the whole pipeline: ``resolve_catalog`` returns an
Iceberg-backed catalog iff a Spark catalog with the Iceberg implementation is
configured on the session (e.g. ``spark.sql.catalog.kg=
org.apache.iceberg.spark.SparkCatalog``), else the parquet-directory layout
used in this sandbox.  Both expose the same three calls, so
``plans.pipeline`` runs unchanged under either; Iceberg additionally gives
snapshot isolation and row-level MERGE for the mutate operators.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class ParquetCatalog:
    """Directory-per-table parquet layout (sandbox default)."""

    def __init__(self, base_dir: str):
        self.base_dir = base_dir

    def path(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def write(self, df: DataFrame, table: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).parquet(self.path(table))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def exists(self, table: str) -> bool:
        return os.path.exists(self.path(table))


class IcebergCatalog:
    """Iceberg tables under ``<catalog>.<namespace>`` via the DataFrameV2
    writer — append is a snapshot commit; resume reads the current snapshot.
    """

    def __init__(self, catalog: str, namespace: str = "kg"):
        self.catalog = catalog
        self.namespace = namespace

    def _ident(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def write(self, df: DataFrame, table: str, mode: str = "overwrite") -> None:
        writer = df.writeTo(self._ident(table))
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.table(self._ident(table))

    def exists(self, table: str) -> bool:
        spark = SparkSession.getActiveSession()
        return spark.catalog.tableExists(self._ident(table))


def iceberg_catalog_name(spark: SparkSession) -> str | None:
    """The first configured Spark catalog whose implementation is Iceberg's
    SparkCatalog, or None (runtime jar absent / not configured)."""
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:
        return None
    for k, v in confs:
        if (k.startswith("spark.sql.catalog.") and k.count(".") == 3
                and "iceberg" in v.lower()):
            return k.rsplit(".", 1)[1]
    return None


def resolve_catalog(spark: SparkSession, base_dir: str):
    name = iceberg_catalog_name(spark)
    if name is not None:
        return IcebergCatalog(name)
    return ParquetCatalog(base_dir)
