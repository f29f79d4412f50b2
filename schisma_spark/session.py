"""SparkSession factory with the engine's scale-oriented defaults.

Sized for the sandbox (local[N], 128 GiB) but every knob is the one you'd
set on a real 1000-executor cluster too: AQE with skew-join splitting
(BASELINE.json:14), partial-aggregation pushdown, capped Arrow batches for
fat binary rows (SURVEY §4.3.5), and shuffle partitions scaled to cores.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Zip the schisma_spark package for --py-files shipping (the
    north-rule deployment mode); lets executor Python workers import the
    package regardless of driver cwd. Rebuilt whenever ANY package source
    is newer than the cached zip — an existence-only cache shipped a
    stale zip that predated newer modules (r5: a spark-submit run of the
    curation job failed importing functions.curate from a zip built
    before that module existed)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "schisma_spark_pyfiles.zip")

    def _stale() -> bool:
        if not os.path.exists(out):
            return True
        zt = os.path.getmtime(out)
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py") and \
                        os.path.getmtime(os.path.join(root, f)) > zt:
                    return True
        return False

    if _stale():
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            "schisma_spark",
                            os.path.relpath(full, pkg_dir),
                        )
                        z.write(full, rel)
        os.replace(tmp, out)
    return out


def build_session(
    app: str = "schisma-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 2048,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    n_threads = int(master[6:-1]) if master.startswith("local[") and master[6:-1].isdigit() else cpus
    shuffle_partitions = shuffle_partitions or max(2 * n_threads, 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(arrow_batch_rows),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.submit.pyFiles", package_zip())
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    return s
