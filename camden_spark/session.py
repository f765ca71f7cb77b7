"""SparkSession factory with the engine's scale-oriented defaults.

Replaces the reference's ThreadingMode knob (reference src/cli.rs:14-18) with
Spark parallelism config.  Defaults are tuned for the sandbox (single-JVM
local[N]); on a real cluster the same code runs under spark-submit with
executor-level parallelism — nothing here is local-mode-specific except the
master URL, which is injectable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "camden_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS (driver contract) or 32.
    Key scale settings:

    * AQE on (runtime shuffle-partition coalescing + skew-join splitting —
      the automatic half of our band-skew story; the explicit half is
      mega-band capping in operators/lsh.py)
    * Arrow enabled with bounded batch size so pandas-UDF batches over long
      documents have bounded memory
    * UTC session timezone so timestamp semantics match the DuckDB oracle
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores * 2, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 512 (was 2048): a pandas-UDF stage streams Arrow batches BOTH ways
        # over one loopback socket, and the task thread multiplexes write-
        # input/read-output.  When a single batch direction exceeds the
        # socket buffers (2048 rows × ~1.6 KB text in / ~1 KB signature out
        # ≈ 3-4 MB vs ~4 MB auto-tuned buffers), both windows can fill and
        # progress degrades to TCP persist-timer probes — observed as
        # multi-minute single-task stalls (thread dump: JVM in
        # PythonRunner.ReaderInputStream epoll, worker in tcp_sendmsg
        # sk_stream_wait_memory, 4.2 MB stuck in each Send-Q).  512-row
        # batches keep any burst ≲1 MB so the multiplexer always drains.
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "512"),
        )
        # the sig_backend="jvm" signature stage is ONE HashAggregate with 193
        # output fields (128 MinHash min-slots + 64 SimHash bit sums +
        # count); the default maxFields=100 silently knocks it out of
        # whole-stage codegen.  512 restores codegen for wide aggregates
        # (Spark splits the generated code into sub-64KB methods, so the
        # ceiling is safe).  Measured effect on that stage is small — its
        # cost lives in the interpreted-HOF shingle Generate, which no
        # codegen setting reaches — but interpreted wide aggregates burn
        # memory bandwidth this box shares across cores, so keep it on.
        .config("spark.sql.codegen.maxFields", "512")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # split input scans finely enough that a single-file corpus still
        # fans out across all cores (sized for text-heavy rows)
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    )
    # profiling hook: SPARK_GRAFT_EVENTLOG_DIR=<dir> writes Spark event logs
    # there (stage/task timelines) — used by tools/stage_profile.py to find
    # under-parallelized stages; zero overhead when unset
    ev_dir = os.environ.get("SPARK_GRAFT_EVENTLOG_DIR")
    if ev_dir:
        os.makedirs(ev_dir, exist_ok=True)
        builder = builder.config("spark.eventLog.enabled", "true").config(
            "spark.eventLog.dir", ev_dir
        )
    # generic conf passthrough for benchmarking/ops: semicolon-separated
    # key=value pairs (env names cannot carry spark.* dots)
    extra_env = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in filter(None, (p.strip() for p in extra_env.split(";"))):
        k, _, v = pair.partition("=")
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def warm_python_workers(spark: SparkSession, cores: int | None = None) -> None:
    """Pre-fork one Python UDF worker per core and pre-import numpy/pandas.

    The first Arrow-UDF stage otherwise pays a simultaneous-import storm
    (N workers x `import numpy, pandas`), which lands in whatever stage runs
    first and distorts scaling.  One tiny job moves that cost to session
    startup — the executor-provisioning phase on a real cluster.
    """
    import pyspark.sql.functions as F

    cores = cores or spark.sparkContext.defaultParallelism

    @F.pandas_udf("long")
    def _warm(s):  # noqa: ANN001 - pandas_udf signature
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        return s

    spark.range(0, cores * 2, 1, cores * 2).select(_warm("id")).count()
