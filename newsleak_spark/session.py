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
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` → local[*]. ``shuffle_partitions`` defaults to the
    core count (local mode); on a cluster it should be ~2-3x total
    executor cores — pass it explicitly there.
    """
    if cores is None:
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
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
