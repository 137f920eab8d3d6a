"""SparkSession construction with scale-oriented defaults.

All sessions in this repo come through :func:`get_spark` so tests, the
entry-point contract, and the bench harness agree on Arrow, AQE, and
timezone settings.  At 100 TB these same knobs apply; only
``shuffle.partitions`` (driven by AQE coalescing anyway) and executor
topology change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size for the scoring UDFs: large enough to amortize the
# JVM<->Python crossing, small enough that a batch of pairs x embedding
# matrices fits comfortably in the Python worker.
ARROW_BATCH = 10_000


def get_spark(
    master: str | None = None,
    app_name: str = "nilinker_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard conf.

    - AQE on (runtime coalescing + skew-join splitting; the pipeline also
      salts hot blocking keys explicitly — AQE is the backstop, not the plan).
    - Arrow on for every pandas UDF / mapInPandas crossing.
    - Session timezone pinned to UTC so parquet timestamps round-trip
      identically between Spark and the DuckDB oracle.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    if shuffle_partitions is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.locality.wait", "0")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH))
        # binary html column must never be scanned unless selected; parquet
        # column pruning handles that, this just keeps scan tasks right-sized.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
