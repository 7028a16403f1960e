"""SparkSession factory with the engine's standard configuration.

Local-mode defaults sized for the sandbox (local[32], single JVM);
on a real cluster the same settings apply except master/memory come
from spark-submit. AQE is on so skewed shuffles re-plan at runtime.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship the newsleak_spark package to Python workers (the
    ``spark-submit --py-files`` analog, applied programmatically).

    Closures for applyInPandas / pandas UDFs reference module-level
    functions pickled BY REFERENCE — workers must be able to
    ``import newsleak_spark`` even when the driver process was started
    from an arbitrary cwd. Idempotent per SparkContext.
    """
    sc = spark.sparkContext
    if getattr(sc, "_newsleak_pyfile_added", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join("/tmp", f"newsleak_spark_pkg_{os.getpid()}.zip")
    tmp = zpath + ".tmp"
    with zipfile.ZipFile(tmp, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    sc._newsleak_pyfile_added = True


def get_spark(
    app_name: str = "newsleak_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    executors: int | None = None,
    executor_cores: int = 4,
    executor_mem_mb: int = 4096,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` → local[*]. ``shuffle_partitions`` defaults to the
    core count (local mode); on a cluster it should be ~2-3x total
    executor cores — pass it explicitly there.

    ``executors=N`` → ``local-cluster[N,executor_cores,executor_mem_mb]``:
    REAL separate executor JVMs (own heap, shuffle served over the
    loopback), the faithful sandbox proxy for an N-executor cluster —
    used by the N vs 4N scaling evidence (bench.py --scaling).
    """
    if executors is not None:
        import pyspark

        os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
        master = f"local-cluster[{executors},{executor_cores},{executor_mem_mb}]"
        default_parts = executors * executor_cores * 2
        extra_conf = {
            # worker grants executor_mem_mb; ask for (almost) all of it —
            # the 1g default heap OOM-loops the encode stage
            "spark.executor.memory": f"{max(executor_mem_mb - 512, 1024)}m",
            **(extra_conf or {}),
        }
    elif cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        default_parts = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        default_parts = cores
    parts = shuffle_partitions or default_parts

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # finer scan splits: intermediate checkpoints are small relative
        # to their per-row compute (tokenize/encode UDFs), so default
        # 128MB splits under-parallelize the rebuild stages
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # ship the package BEFORE any UDF is created: a pandas UDF captures
    # the python-includes list at creation time, so an addPyFile that
    # happens later never reaches real (non-forked) executors
    ensure_workers_can_import(spark)
    return spark
