"""SparkSession factory with engine defaults.

Local testing runs ``local[N]``; the confs are chosen so the same code
is correct on a multi-executor cluster (AQE on, Arrow on, shuffle
partitions sized by caller).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dexspark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("DEXSPARK_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalesce of shuffle partitions + skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for all pandas interchange (mapInPandas validators).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Deterministic timestamps across JVM/pandas/DuckDB comparisons.
        .config("spark.sql.session.timeZone", "UTC")
        # Python DataSource filter pushdown (dexspark.pyds zone-map
        # file pruning; Spark 4.1 gates pushFilters behind this conf).
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("DEXSPARK_DRIVER_MEM", "24g"))
    )
    # Shuffle/spill scratch on tmpfs when available: this sandbox's
    # buffered disk writes cap at ~90MB/s, which would put a serial
    # floor under every shuffle. On a real cluster this is local NVMe.
    local_dir = os.environ.get("DEXSPARK_LOCAL_DIR") or (
        "/dev/shm/dexspark-scratch" if os.path.isdir("/dev/shm") else None
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
