"""SparkSession factory.

Replaces the reference's three redundant handles (``SparkContext`` +
``SQLContext`` + ``SparkSession``, LogisticRegression.py:42-44) with one
properly configured session.

Scale notes (100 TB design point):
  * AQE on: runtime partition coalescing, skew-join splitting, and
    shuffle-join → broadcast-join conversion replace hand-tuning.
  * ``spark.sql.shuffle.partitions`` defaults to 2× local cores for test
    runs; on a real cluster this should be ~2-3× total executor cores —
    AQE coalesces down, so oversizing is the safe direction.
  * Arrow on: every pandas_udf / toPandas hop is Arrow-batched.
  * Session timezone pinned to UTC so epoch/window bucketing is
    reproducible across engines (DuckDB oracle parity).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "nlp-with-pyspark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Any already-active session is reused (configs are cluster-level and
    the driver/test harness may own the session lifecycle).
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    master = master or os.environ.get("SPARK_MASTER", f"local[{DEFAULT_SHUFFLE_PARTITIONS}]")
    nshuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    # deployment-tuning seam: `SPARK_GRAFT_CONF="k=v;k2=v2"` lays extra
    # Spark confs under (below `extra_conf`, above the engine defaults)
    # without code changes — the knob a cluster deployment uses to set
    # shuffle/broadcast/codec values for its hardware, and what the
    # optimization-round A/B harness drives (guide §9: configs are
    # cluster-level; the engine ships scale-safe defaults, not pins)
    env_conf: dict[str, str] = {}
    for pair in os.environ.get("SPARK_GRAFT_CONF", "").split(";"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            env_conf[k.strip()] = v.strip()

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as long nanos (exact) and convert in
        # sources.io — see read_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # 128 MiB input splits: good balance of parallelism vs task overhead
        # for parquet scans; at 100 TB this yields ~800k tasks, fine for a
        # 1000-executor cluster with AQE coalescing downstream.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in {**env_conf, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
