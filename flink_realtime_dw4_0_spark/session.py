"""SparkSession factory.

Parity target: the reference's per-app environment block
(``BaseAPP.java:26-73`` / ``BaseSQLAPP.java:21-58``): parallelism,
checkpointing, state backend. In Spark those collapse into session confs +
per-query ``checkpointLocation``; everything else (codegen, AQE, shuffle
sizing) is engine-level tuning the reference delegated to Flink.

Scale notes (100 TB design):
  * AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
    and dynamic broadcast conversion replace hand-tuned parallelism
    (reference pins parallelism=4, ``DimAPP.java:44``).
  * ``spark.sql.shuffle.partitions`` here is a local-mode default; on a
    real cluster set it ~2-3x total cores, or leave AQE to coalesce from a
    high initial value.
  * Arrow enabled for every pandas-UDF exchange (dedup/similarity ops).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# The reference hardcodes UTC+8 for all datetime string conversion
# (DateFormatUtil.java:30).  The *pipelines* use Asia/Shanghai; the
# testdata harness uses UTC so wall-clock values match the timezone-naive
# parquet timestamps that DuckDB (the oracle) reads.
REFERENCE_TZ = "Asia/Shanghai"
HARNESS_TZ = "UTC"

# Spark 4.x's transformWithStateInPandas talks to its state server over a
# protobuf protocol (pyspark/sql/streaming/proto), which needs the PUBLIC
# `protobuf` runtime at import time in every python worker.  This sandbox
# has no pip, but ships a vanilla protobuf wheel inside the cloud-sdk's
# bundled platform dir; if `google.protobuf` is not importable, splice
# that copy onto sys.path AND PYTHONPATH (workers are forked by the JVM
# and inherit the env, so this must run BEFORE the session launches).
# Pure environment shim — no cloud service is referenced or used; on a
# normally-provisioned cluster (pip install protobuf) this is a no-op.
_PROTOBUF_FALLBACKS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]
# the shim dir exposes ONLY google/protobuf via symlink — never the
# other packages bundled next to it (appengine/auth/oauth2/pyglib),
# which would otherwise ride along on sys.path + worker PYTHONPATH and
# could shadow same-named modules in every python worker
# per-user path: a fixed shared /tmp name would let another local user
# pre-create the dir with arbitrary code that every python worker imports
_PROTOBUF_SHIM = os.path.join(
    os.environ.get("TMPDIR", "/tmp"),
    f"sparkdw-protobuf-shim-{os.getuid()}",
)


def _protobuf_shim_dir(src_root: str) -> str | None:
    """Build (idempotently) a dir containing nothing but a
    ``google/protobuf`` symlink into ``src_root``.  Returns the shim
    path, or None when the filesystem refuses (read-only tmp) OR when a
    pre-existing entry is anything but a symlink resolving to the
    expected source — the caller then skips that fallback rather than
    splice an untrusted dir onto every worker's PYTHONPATH."""
    src = os.path.join(src_root, "google", "protobuf")
    g = os.path.join(_PROTOBUF_SHIM, "google")
    link = os.path.join(g, "protobuf")
    try:
        os.makedirs(g, exist_ok=True)
        if os.path.islink(link):
            if os.path.realpath(link) != os.path.realpath(src):
                os.remove(link)
                os.symlink(src, link)
        elif os.path.exists(link):
            # a real dir/file someone else planted — refuse to use it
            return None
        else:
            os.symlink(src, link)
        return _PROTOBUF_SHIM
    except OSError:
        return None


def ensure_protobuf() -> bool:
    """Make `google.protobuf` importable for this process and its python
    workers if a local copy exists; returns availability."""
    import importlib.util
    import sys

    def _has() -> bool:
        try:  # find_spec raises when the parent 'google' pkg is absent
            return importlib.util.find_spec("google.protobuf") is not None
        except ModuleNotFoundError:
            return False

    if _has():
        return True
    for p in _PROTOBUF_FALLBACKS:
        if not os.path.isdir(os.path.join(p, "google", "protobuf")):
            continue
        shim = _protobuf_shim_dir(p)
        if shim is None:
            continue
        if shim not in sys.path:
            sys.path.append(shim)
        env = os.environ.get("PYTHONPATH", "")
        if shim not in env.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                f"{env}{os.pathsep}{shim}" if env else shim
            )
        # a partially-imported namespace package (a failed earlier
        # `import google.x`) would shadow the new path
        sys.modules.pop("google", None)
        # the bundled runtime (6.32.0-dev) is one minor behind the
        # gencode pyspark ships (6.33); protobuf's own sanctioned
        # escape hatch bypasses the strict-ordering guard — the wire
        # protocol is unchanged at this delta, and on a pip-installed
        # current runtime none of this triggers.  Set HERE, at splice
        # time, by necessity: python workers inherit the JVM's env,
        # captured at JVM launch — deferring this to the
        # transformWithStateInPandas call site would be too late for
        # the workers that actually import the generated protos.  It
        # is only ever set when this fallback runtime is spliced.
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        return _has()
    return False


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


# Worker-math thread-cap bookkeeping: vars get_spark caps to "1" via
# setdefault, and the subset that an ambient environment had already set
# to something else (so the cap did NOT take effect this process).
_BLAS_CAP_VARS = ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                  "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS")
_BLAS_CAP_PRESET: set[str] = set()


# Stateful families whose DEFAULT impl flipped from 'apply' to 'auto'
# (evidence-gated, BENCH_TWS_FLIP.json) — a silent breaking change for
# existing checkpoints that relied on the old default: restarting such
# a checkpoint under a different resolved physical operator fails on
# operator/state mismatch.  warn_default_flip emits ONE process-wide
# warning per family the first time 'auto' resolves to something other
# than the pre-flip default, so upgraders hit the README "Upgrade
# notes" pointer before the restart error does.
_FLIP_WARNED: set[str] = set()


def warn_default_flip(family: str, resolved: str,
                      prior_default: str = "apply") -> None:
    """One-time-per-family upgrade warning when an ``impl='auto'``
    default resolves to a different stateful physical operator than the
    release that introduced the family defaulted to (see README
    "Upgrade notes").  Checkpoints are bound to the operator that wrote
    them; callers restarting an existing checkpointLocation must pin
    ``impl`` explicitly."""
    if resolved == prior_default or family in _FLIP_WARNED:
        return
    _FLIP_WARNED.add(family)
    import warnings

    warnings.warn(
        f"{family}: the default impl now resolves to {resolved!r} "
        f"(previously {prior_default!r}).  An existing checkpoint "
        f"written under the old default cannot restart on the new "
        f"operator (state-store mismatch) — pin impl={prior_default!r} "
        f"to keep draining it, or restart from a fresh "
        f"checkpointLocation.  See README 'Upgrade notes'.",
        stacklevel=3,
    )


def get_spark(
    app_name: str = "flink_realtime_dw4_0_spark",
    master: str | None = None,
    tz: str = HARNESS_TZ,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Works on ``local[N]`` for tests and unchanged on a real cluster
    (master then comes from spark-submit, not from here).
    """
    cpus = default_parallelism()
    ensure_protobuf()  # before JVM launch: workers inherit PYTHONPATH
    # One BLAS thread per python worker (unless the caller overrides):
    # Spark supplies the parallelism as TASKS, and numpy's default of
    # one OpenBLAS/MKL pool per process sized to ALL cores means N
    # concurrent pandas-UDF tasks spawn N*cores threads — measured at
    # the r11 sf10 ladder as 25 workers x 32 threads = ~800 runnable
    # threads, 79% kernel time, and a PQ-encode stage 10x slower than
    # its arithmetic.  Same rule a real cluster uses: executor cores
    # are divided between tasks, so per-task math must be
    # single-threaded.  Must happen BEFORE the JVM launches — python
    # workers are forked by the JVM and inherit its env snapshot.
    for var in _BLAS_CAP_VARS:
        if var in os.environ and os.environ[var] != "1":
            # caller/ambient override wins (setdefault semantics), but
            # record it so tests can tell "cap applied" from "cap
            # defeated by the environment" (r11 ADVICE: presence alone
            # let an ambient OMP_NUM_THREADS=32 pass the pin test)
            _BLAS_CAP_PRESET.add(var)
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.appName(app_name)
        # --- core engine tuning -------------------------------------------
        # local mode runs driver+executors in ONE JVM whose default heap is
        # 1g — far too small for 32 threads + broadcast builds (observed
        # broadcast OOM on the 8x stress corpus).  Only effective at JVM
        # launch; on a real cluster spark-submit owns this.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # --- semantics ----------------------------------------------------
        .config("spark.sql.session.timeZone", tz)
        # DuckDB-written testdata stores events.ts as INT64 TIMESTAMP(NANOS)
        # which vanilla Spark refuses; read as long and convert explicitly
        # (see sources/files.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # streaming state: RocksDB scales past heap (reference uses a heap
        # HashMap backend, BaseAPP.java:42 — fine at parallelism 4, not at
        # 1000 executors).
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.sql.streaming.statefulOperator.allowMultiple", "true")
        # managed tables (bucketed layouts) live outside the source tree
        .config("spark.sql.warehouse.dir", os.environ.get(
            "SPARK_GRAFT_WAREHOUSE", "/tmp/sparkdw-warehouse"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER_SET"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
