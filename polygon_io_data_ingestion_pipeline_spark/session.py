"""SparkSession construction and runtime configuration.

The same confs are applied both when we own the session (``get_spark``)
and when a host hands us one (``apply_runtime_confs``): determinism
(UTC session time zone), the nanosecond-parquet compatibility switch the
driver-generated ``events`` table needs, and scale-oriented defaults
(AQE, partition coalescing) that hold from local[32] up to a real
cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe (and required) to set at runtime on any session.
RUNTIME_CONFS: dict[str, str] = {
    # Deterministic wall-clock semantics: all timestamp rendering /
    # NTZ casts are anchored to UTC regardless of host machine tz.
    "spark.sql.session.timeZone": "UTC",
    # The synthetic events table stores TIMESTAMP(NANOS); Spark has no
    # nanosecond timestamp, so read them as raw int64 nanos and convert
    # explicitly (sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Runtime re-planning: coalesce tiny shuffle partitions, split skewed
    # ones. Essential at 100 TB, harmless at sf0.001.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Cached frames freeze their output partitioning by default, which
    # blocks AQE from coalescing the tiny post-shuffle partitions of
    # everything computed downstream of a .persist() — measured 1.7x
    # slowdown on the factor pipeline. Letting AQE re-plan cached
    # output keeps persist() composable with adaptive execution.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally provided session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Static conf on this build — leave whatever the host chose.
            pass
    return spark


def get_spark(
    app_name: str = "polygon-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 32 to match
    the driver environment); shuffle partitions default to the same so a
    local run resembles one executor-wave of a cluster run.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or cpus
    # The sandbox resolver is a blackhole (TEST-NET nameserver): any DNS
    # miss stalls for the full resolver timeout, which showed up as
    # 5s-300s query stalls. Pin every address to loopback so the JVM
    # never consults DNS.
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    os.environ.setdefault("SPARK_LOCAL_HOSTNAME", "localhost")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.driver.bindAddress", "127.0.0.1")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # Whole-stage codegen emits one class per plan fragment; a long
        # session compiles hundreds. Two JIT pathologies follow: (a) the
        # default ~240 MB code cache fills and starts flushing hot code,
        # and (b) C2 compile storms leave fresh codegen running
        # interpreted (~50x slow) for seconds at a time — observed as
        # 4-14 s single-task stalls that added 40-80 s to a 5 s query.
        # C1-only compilation (TieredStopAtLevel=1) compiles ~100x
        # faster at ~2x lower peak code quality: the right trade for a
        # short-lived local session running many distinct plans. A
        # long-lived cluster executor re-running few hot plans should
        # keep full tiered compilation instead.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing "
            "-XX:TieredStopAtLevel=1",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
