"""SparkSession construction tuned for this engine.

Local-mode testing uses local[N]; the configs below are chosen so the same
logical plans scale to a multi-executor cluster: AQE on (runtime re-plan +
skew-join handling), shuffle partitions sized to cores locally (set it to
2-3x total cores on a real cluster), Arrow enabled for the few Pandas-UDF
operators, UTC timezone pinned so timestamps compare bit-identical against
the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _default_heap() -> str:
    """min(48g, half of physical RAM), floor 2g; 16g if /proc is absent."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gb = int(line.split()[1]) // (1024 * 1024)
                    return f"{max(2, min(48, total_gb // 2))}g"
    except OSError:
        pass
    return "16g"


def get_spark(
    app_name: str = "duckpgq_extension_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode = one JVM doing executor work for N cores: size the heap
        # like N executors' worth, capped at half the host's physical RAM so
        # a library import can never provoke the OOM killer on small boxes.
        # localCheckpoint blocks from the iterative kernels live in storage
        # memory until the Python-side DataFrame is GC'd, so a too-small
        # heap turns long query sequences into GC thrash (measured: same
        # bench run varies 55 s -> 196 s at 16g on a 128 GiB host).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM") or _default_heap())
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # testdata events.ts is parquet TIMESTAMP(NANOS); read as long and
        # convert in sources.tables.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Catalyst's Union constraint rewrite hits "key not found" on the
        # iterative BFS plan shape (join -> project -> anti-join -> union);
        # constraint propagation buys little here since every filter is
        # explicit, so trade it for analyzer robustness
        .config("spark.sql.constraintPropagation.enabled", "false")
        # Broadcast-join pipelines have NO shuffle, so their parallelism is
        # exactly the parquet split count.  The default 128 MB
        # maxPartitionBytes turns a single ~30 MB local file into ONE task —
        # match_triangle at the 10x tier ran 8.5 s nearly serial vs 2.6 s
        # with 4 MB splits (measured, r6).  4 MB is strictly a
        # LOCAL-small-file setting: this builder hardwires local[N]
        # masters, so it is safe to default here, but a cluster session
        # (cluster users build their own SparkSession, or override via
        # SPARK_GRAFT_MAX_PARTITION_BYTES) must keep Spark's 128 MB —
        # 4 MB splits over TB-scale tables would explode task counts.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024)),
        )
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        # the iterative kernels localCheckpoint once per level/round; those
        # blocks are only released after the JVM garbage-collects the RDD
        # handle (ContextCleaner is weak-ref driven), and with a big heap a
        # full GC may not happen for ages — dead checkpoint blocks then fill
        # the storage pool and evict live ones (measured: queries late in a
        # long session degrade 3-5x).  The stock knob for exactly this is
        # periodic cleaner GC; default 30min, far too lazy for an engine
        # that runs many iterative queries per session.
        .config("spark.cleaner.periodicGC.interval", "1min")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    try:
        # getOrCreate can attach to a PRE-EXISTING session whose master is a
        # real cluster (yarn/k8s/standalone) — our builder's local[N] master
        # is then ignored but runtime SQL confs like maxPartitionBytes still
        # land.  Never let the local-small-file 4 MB split size leak onto a
        # cluster: restore Spark's default there unless the user explicitly
        # overrode it.
        if (
            "SPARK_GRAFT_MAX_PARTITION_BYTES" not in os.environ
            and not spark.conf.get("spark.master", "local").startswith("local")
        ):
            spark.conf.set(
                "spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024)
            )
    except Exception:  # noqa: BLE001 - conf introspection must never fail import
        pass
    try:
        spark.sparkContext.setLogLevel("WARN")
    except Exception:  # noqa: BLE001 - Spark Connect: no sparkContext;
        pass  # log level is a server-side concern there
    return spark
