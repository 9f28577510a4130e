"""SparkSession factory with the engine's scale-oriented defaults.

The reference runs a fixed 8-process pool on one machine
(east_asia.py:287,308-314); here Spark's scheduler owns parallelism and
these conf defaults are chosen to survive a 1000-executor / 100 TB
deployment:

- AQE on (runtime re-plan: coalesce post-shuffle partitions, skew-join
  splitting, dynamic broadcast) — replaces hand-tuned batch sizes.
- Arrow on — every geometry kernel is a vectorized pandas UDF over WKB
  bytes; Arrow batch transfer is the difference between 10× and 1000×
  slower than JVM expressions.
- Session timezone pinned to UTC so timestamp semantics match the
  ANSI-SQL oracle regardless of host zone.
- shuffle.partitions default sized for local test runs; cluster deploys
  override via spark-submit conf (AQE coalescing makes the exact number
  less critical).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Keep Arrow batches big enough to amortize Python round-trips for
    # the WKB kernels but small enough to bound executor memory.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # Parquet scans: pushdown + vectorized reader are on by default in
    # Spark 4.x; pinned here so a misconfigured cluster can't regress.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # The reference writes ZSTD everywhere (east_asia.py:79-82).
    "spark.sql.parquet.compression.codec": "zstd",
}


def get_spark(
    app_name: str = "gis-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    durable_catalog: bool = False,
    warehouse_dir: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default *)
    when no cluster master is configured — tests and bench run local
    mode; a real deployment passes its own master / uses spark-submit.

    ``durable_catalog=True`` enables Hive support (embedded Derby
    metastore) so managed tables SURVIVE across processes — required
    by the CLI, whose append rungs (append-flags, append-bm25-index,
    build-dedup-snapshot --increment) must see the tables a PREVIOUS
    invocation wrote; with the default in-memory catalog a fresh
    process would silently rebuild the artifact from the base corpus,
    destroying every previously appended increment while reporting
    success (r16 review finding). Engine/test sessions keep the
    in-memory catalog (tables are per-session scratch there, and Derby
    allows only one process per metastore directory).

    ``warehouse_dir`` (ADVICE r16) anchors BOTH the Derby metastore
    and the table warehouse under an explicit directory instead of the
    process working directory — without it, invoking the CLI from a
    different cwd silently gets a fresh empty catalog and rebuilds
    base-only artifacts, the same silent-divergence class
    durable_catalog exists to prevent. Durability is then keyed to the
    chosen directory (the CLI's --warehouse flag), not the shell's
    cwd. Derby remains SINGLE-WRITER: one CLI invocation at a time per
    warehouse directory (concurrent invocations fail on the Derby
    lock)."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    if durable_catalog:
        builder = builder.enableHiveSupport()
    conf = dict(ENGINE_CONF)
    if durable_catalog and warehouse_dir:
        wd = os.path.abspath(warehouse_dir)
        os.makedirs(wd, exist_ok=True)
        conf["spark.sql.warehouse.dir"] = os.path.join(
            wd, "spark-warehouse"
        )
        db = os.path.join(wd, "metastore_db")
        conf["spark.hadoop.javax.jdo.option.ConnectionURL"] = (
            f"jdbc:derby:;databaseName={db};create=true"
        )
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    elif "spark.sql.shuffle.partitions" not in conf:
        conf["spark.sql.shuffle.partitions"] = "32"
    conf.setdefault("spark.sql.shuffle.partitions", "32")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
