"""SparkSession factory with the engine's pinned configuration.

Design notes (SURVEY.md §4.2): every optimization the reference hand-rolls
either falls out of Catalyst for free (predicate pushdown, partial
aggregation, broadcast-join selection, AQE skew splitting, whole-stage
codegen) or lives inside our pandas-UDF kernels — no custom Catalyst rules.
We pin:

- AQE on (runtime partition coalescing + skew-join splitting is the built-in
  backstop behind our explicit salting, operators/skew.py);
- Arrow execution on (every Python crossing is an Arrow batch, never a row);
- UTC session timezone (duckdb oracle comparison — duckdb timestamps are
  UTC-naive);
- shuffle partitions sized to cores for local mode (the 200 default
  over-parallelizes sandbox scale; on a real cluster this is set per-job to
  ~2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "cc3d-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's pinned confs.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the same entry points serve pytest, the driver harness, and the
    two-parallelism-level scaling bench (local[8] vs local[32]).
    """
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master.startswith("local-cluster") and "SPARK_HOME" not in os.environ:
        # local-cluster (separate executor JVMs + real netty shuffle — the
        # multi-executor scaling-evidence mode, VERDICT r2 #3) launches
        # workers via the Spark scripts, which need SPARK_HOME; the pip
        # install ships them inside the package dir
        import pyspark

        os.environ["SPARK_HOME"] = os.path.dirname(pyspark.__file__)
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    executor_java_opts = os.environ.get("SPARK_GRAFT_EXECUTOR_JAVA_OPTS", "")
    if master.startswith("local-cluster["):
        # Each executor JVM sizes its GC/netty/codegen thread pools from
        # Runtime.availableProcessors() — the WHOLE box's core count, not
        # the [W,cores,mem] slice it was granted. With 8 executors on a
        # 32-core box that is 8 machine-sized pool sets (run queues >32,
        # 23-57% system time during shuffle, BENCH.md §2). A real cluster
        # node's JVM sees only its own cores; ActiveProcessorCount restores
        # that regime (measured: CC 160M-edge median superstep 41.5s →
        # 23.2s at 8 executors).
        cores = master.split("[", 1)[1].split(",")[1].strip()
        if cores.isdigit():
            executor_java_opts = (
                f"{executor_java_opts} -XX:ActiveProcessorCount={cores}".strip()
            )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # numeric kernel batches (edge blocks through mapInPandas) amortize
        # per-batch overhead much better than the 10k default; capped at 64k
        # so wide binary rows (html payloads ~1KB) stay ~64MB per batch
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        # Iterative kernels re-read small checkpoint tables many times; keep
        # the broadcast threshold at default 10MB so vertex-side dims of the
        # sandbox scale broadcast automatically.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # local-cluster workers advertise capacity (the [W,c,mem] triple) but
        # executors still launch at the 1g DEFAULT heap unless this is set —
        # ignored by plain local mode (driver == executor there)
        .config(
            "spark.executor.memory",
            os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "7g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if executor_java_opts:
        builder = builder.config(
            "spark.executor.extraJavaOptions", executor_java_opts
        )
    # forensics hook: SPARK_GRAFT_EVENTLOG_DIR=<dir> turns on event logging
    # (scripts/analyze_eventlog.py reads the result) — used to de-confound
    # scaling pairs (spill / GC / skew per stage), off by default
    eventlog_dir = os.environ.get("SPARK_GRAFT_EVENTLOG_DIR")
    if eventlog_dir:
        os.makedirs(eventlog_dir, exist_ok=True)
        builder = builder.config("spark.eventLog.enabled", "true").config(
            "spark.eventLog.dir", f"file://{eventlog_dir}"
        )
    # experiment hook: SPARK_GRAFT_EXTRA_CONF="k1=v1;k2=v2" injects confs
    # through subprocess boundaries (bench_scaling.py sides) without code
    # edits — used for A/B-ing e.g. shuffle compression codecs on a pair
    env_extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if env_extra:
        for item in env_extra.split(";"):
            if "=" in item:
                k, _, v = item.partition("=")
                builder = builder.config(k.strip(), v.strip())
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if master.startswith("local-cluster"):
        # executor JVMs spawn FRESH python workers that don't inherit the
        # driver's sys.path — ship the package the same way a real cluster
        # run does (spark-submit --py-files, north rule): addPyFile the
        # engine zip so every worker can unpickle the pandas-UDF kernels
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
        try:
            from make_pyfiles import build  # type: ignore

            spark.sparkContext.addPyFile(build())
        finally:
            sys.path.pop(0)
    return spark


def stop_spark() -> None:
    """Stop the active session (used by the scaling bench to switch masters)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
