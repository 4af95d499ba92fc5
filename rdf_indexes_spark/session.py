"""SparkSession factory tuned for this engine.

Local mode for tests/bench; the same confs are what we'd submit with
``spark-submit --py-files`` on a real cluster (AQE, Arrow, UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    app_name: str = "rdf_indexes_spark",
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build a SparkSession.

    cores: local[N] thread count (default: $SPARK_GRAFT_CPUS or '*').
    shuffle_partitions: defaults to max(cores, 8) — at cluster scale this
    would be sized to ~2-3x total executor cores / target partition bytes.
    master: full master string override, e.g. "local-cluster[4,4,8192]"
    for N separate executor JVMs × cores × MB — the in-sandbox stand-in
    for a real N-executor cluster (separate heaps/GC/python-worker pools,
    real serialized shuffle), used by the scaling bench.
    """
    if master is not None:
        n = cores or (os.cpu_count() or 8)
        if master.startswith("local-cluster") and not (extra_conf or {}).get(
            "spark.executor.memory"
        ):
            # the [N,C,M] M is the WORKER's capacity; executor heap is
            # spark.executor.memory (default 1g — OOM-kills executors on
            # real corpora). Claim most of the worker's grant.
            mem_mb = master.split(",")[-1].rstrip("]")
            try:
                heap = max(1024, int(mem_mb) - 1024)
                extra_conf = {**(extra_conf or {}), "spark.executor.memory": f"{heap}m"}
                # Fix Xms to Xmx and pre-touch the whole heap at executor
                # LAUNCH: on virtualized hosts, first-touch page faults
                # from many concurrent JVMs serialize in the hypervisor
                # (measured on this box: 32 procs touching fresh pages get
                # 15 GB/s aggregate vs 84 GB/s for 8 — while STEADY-STATE
                # bandwidth scales fine). A growing heap faults fresh
                # pages mid-job, exactly in the widest stages; pre-touch
                # moves all of it to startup (~1s per 7g executor,
                # parallel across executors). Same flags are standard
                # practice on real clusters for latency-sensitive jobs.
                _pt = "-Xms{}m -XX:+AlwaysPreTouch".format(heap)
                _user = extra_conf.get("spark.executor.extraJavaOptions", "")
                if "AlwaysPreTouch" not in _user:
                    extra_conf["spark.executor.extraJavaOptions"] = (_pt + " " + _user).strip()
            except ValueError:
                pass
    elif cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(n, 8)

    # shuffle/spill scratch on tmpfs when available: on this host the
    # ext4 virtio disk adds ~250ms latency to EVERY shuffle task (fetch
    # of freshly written shuffle files), which serializes tiny stages at
    # high core counts. On a real cluster this is the "local NVMe for
    # spark.local.dir" standard practice.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if not local_dir and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
        os.makedirs(local_dir, exist_ok=True)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.local.dir", local_dir or "/tmp")
        # AQE is OFF by default here: this engine handles skew explicitly
        # (hub salting, two-level aggs, range partitioning with sampled
        # bounds), and AQE's per-stage re-planning adds 2-10x latency to
        # the many-small-stage jobs of the KG pipeline (measured: 403s vs
        # 38s for the 100k-turn pipeline). On a real cluster with opaque
        # inputs, enable it per-job via extra_conf
        # {"spark.sql.adaptive.enabled": "true"} — every operator here is
        # AQE-compatible.
        .config("spark.sql.adaptive.enabled", os.environ.get("SPARK_GRAFT_AQE", "false"))
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the pipeline leans on localCheckpoint caches, whose partitions
        # carry PROCESS_LOCAL preferences; the default 3s locality wait
        # turns any cache imbalance into idle executors at stage
        # boundaries — a pure serial-floor tax in a many-stage pipeline.
        # Schedule immediately instead (cache misses refetch over netty,
        # cheap on both this host and any rack-local cluster).
        .config("spark.locality.wait", "0ms")
        # finer input splits (default 128m): scan+UDF stages get enough
        # tasks to fill wide clusters and smooth task-time skew; at real
        # scale the file count dominates and this is a no-op.
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size tunes the JVM<->python pipeline overlap in the
        # mapInPandas/mapInArrow stages: interleaved A/B at 8 executors on
        # the 16M-turn corpus measured the extract stage at 7.0s with 10k
        # batches vs 9.1s with 50k (min of 3, interleaved same-window) —
        # smaller batches keep both sides of the pipe busy and cap the
        # per-batch resident footprint; 10k rows x ~50-char turns is still
        # far above per-batch numpy/Arrow fixed costs for every vectorized
        # operator here.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # committer v2: tasks move their output into place at task commit
        # instead of a serial driver-side rename loop at job commit — the
        # standard choice for many-file writes on slow/remote storage.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.enabled", "false")
        # local mode: the driver JVM hosts all executor threads, so heap
        # must be sized for cores × per-task working set — an undersized
        # heap starves the unified memory region and every concurrent task
        # spills (measured 5x task-time inflation at local[32] with 8g).
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
