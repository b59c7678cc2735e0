"""Session management: SparkSession factory + a name->DataFrame catalog.

The reference keeps named tables in a global environment and supports
in-place mutation by quoted name (``(set 'employees …)``, ``update {from:
'employees}`` — ref core/binary.c:317, core/update.c:938). In Spark the
analog is a driver-side catalog mapping names to (immutable) DataFrames with
replace-on-write; no Catalyst involvement is needed (SURVEY §4 item 5).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


#: event-time columns canonicalized to i64-ns at load (TESTDATA: events.ts).
#: Date-valued timestamps (l_shipdate, o_orderdate) stay temporal — they are
#: compared/bucketed as calendar dates, not event-time arithmetic operands.
NS_SHADOW_COLS = ("ts",)


def normalize_ns(df: DataFrame, cols=NS_SHADOW_COLS) -> DataFrame:
    """Canonicalize event-time columns to the engine's i64 epoch-ns shape.

    SURVEY §1.2's "LongType ns shadow" strategy: the reference's timestamps
    are i64 nanos (ref core/ops.h:273-276); parquet in the wild carries
    TIMESTAMP(µs) (the driver fixture does, all SFs — r3's gate regression
    was exactly this dtype drift). Rewriting Timestamp(NTZ) event-time
    columns to ``unix_micros*1000`` longs right after the scan gives the
    temporal operators one canonical dtype; it is a pure projection
    (column pruning and parquet predicate pushdown on other columns are
    unaffected, and Catalyst folds it into the scan's project). NTZ
    wall-clock is read as a UTC instant — the engine pins the session
    timezone to UTC, so this matches DuckDB's timezone-less epoch_ns().
    The operators also dispatch on dtype themselves (functions/kdb.to_ns),
    so non-normalized timestamp inputs still work — this just keeps one
    canonical shape inside the engine.
    """
    reps = {
        f.name: F.unix_micros(F.col(f.name).cast("timestamp")) * F.lit(1000)
        for f in df.schema.fields
        if f.name in cols
        and isinstance(f.dataType, (TimestampType, TimestampNTZType))
    }
    return df.withColumns(reps) if reps else df


def get_spark(app_name: str = "rayforce_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Create (or get) a SparkSession tuned for this engine.

    Local mode honours $SPARK_GRAFT_CPUS; on a real cluster the master and
    memory come from spark-submit and these configs remain sensible: AQE on
    (runtime re-plan, skew-join splitting, partition coalescing), Arrow on
    (vectorized Python interchange), UTC session timezone (oracle parity).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # vectorized two-level aggregate hash map: row-batch probing for
        # codegen'd partial aggregation (off by default upstream; measured
        # neutral-to-better on the H2O group-by shapes here)
        .config("spark.sql.codegen.aggregate.map.vectorized.enable", "true")
        # prefer shuffled-HASH join over sort-merge when the planner's
        # size guard allows building a per-task map (canBuildLocalHashMap:
        # side estimate < autoBroadcastJoinThreshold * shuffle.partitions,
        # so the cap scales with the cluster). The reference's joins ARE
        # hash-index joins (ref core/index.c:2886); skipping both sorts
        # measured -30%/-40% on the 1e7x1e7 H2O inner/left joins
        # (BASELINE_CMP). Oversized sides still plan SMJ; AQE skew
        # splitting applies first.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # first-level fast-map capacity 2^18 (default 2^16): 100k-group
        # partial aggs otherwise overflow to the BytesToBytesMap fallback
        # for most rows — measured ~45% faster on 100k-group H2O shapes
        # (gq3 799->411ms, gq6 682->352, gq5 637->335; 2^20 regresses from
        # cache footprint). Memory cost is bounded: partial-only, per-task,
        # and the map spills/falls back as usual when heap is tight.
        .config("spark.sql.codegen.aggregate.fastHashMap.capacityBit", "18")
        # ns-precision timestamps (the reference's i64 nanos,
        # ref core/ops.h:273-276) surface as LongType nanos — SURVEY §1.2's
        # "LongType shadow column" strategy.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


class Session:
    """Engine session: SparkSession + named-table catalog.

    ``set``/``get`` mirror the reference's global bindings
    (ref core/binary.c:317, core/unary.c:48); tables mutated "in place" by
    the mutation verbs (insert/upsert/update with a named target) are
    replaced in the catalog — DataFrames themselves stay immutable.
    """

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()
        self._catalog: dict[str, DataFrame] = {}

    @classmethod
    def connect(cls, url: str) -> "Session":
        """Open a session against a REMOTE engine — the reference's
        ``(hopen "host:port")`` client handle (ref core/ipc.c:226,
        core/io.c:144-197), re-expressed over Spark Connect.

        ``url`` is a Spark Connect endpoint (``sc://host:port``); a bare
        ``host:port`` is promoted to ``sc://host:port`` to keep the
        reference's spelling working. Every Session verb (set/get/query
        helpers) then runs against the remote cluster — the Connect
        DataFrame API is plan-compatible with the classic one, so the
        operator layer needs no changes.

        Requires the ``grpcio``/``pyspark[connect]`` extra at runtime;
        raises ImportError with the install hint when absent (this
        container ships without it — the shim is import-gated, not
        stubbed).
        """
        hint = (
            "Session.connect requires Spark Connect's client deps "
            "(pip install 'pyspark[connect]')"
        )
        try:
            import grpc  # noqa: F401
        except ImportError as e:
            raise ImportError(hint) from e
        if "://" not in url:
            url = f"sc://{url}"
        try:
            remote = SparkSession.builder.remote(url).getOrCreate()
        except ImportError as e:
            # grpc alone isn't enough (grpcio-status, googleapis protos,
            # pandas/pyarrow are also required) — keep the install hint
            raise ImportError(hint) from e
        except RuntimeError as e:
            raise RuntimeError(
                f"{e} — note a classic (non-Connect) SparkSession already "
                "active in this process prevents builder.remote(); stop it "
                "with SparkSession.getActiveSession().stop() first, or "
                "connect from a fresh process"
            ) from e
        return cls(remote)

    # -- catalog -----------------------------------------------------------
    def set(self, name: str, df: DataFrame) -> DataFrame:
        self._catalog[name] = df
        df.createOrReplaceTempView(name)
        return df

    def get(self, name: str) -> DataFrame:
        if name in self._catalog:
            return self._catalog[name]
        return self.spark.table(name)

    def drop(self, name: str) -> None:
        self._catalog.pop(name, None)
        self.spark.catalog.dropTempView(name)

    def tables(self) -> list[str]:
        return sorted(self._catalog)

    # -- testdata convenience ---------------------------------------------
    def load_dir(self, sf_dir: str, tables: list[str] | None = None) -> dict[str, DataFrame]:
        """Load the driver's parquet tables from an sf directory."""
        out = {}
        for t in tables or TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                out[t] = self.set(t, normalize_ns(self.spark.read.parquet(path)))
        return out


def load_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> dict[str, DataFrame]:
    """Functional form of Session.load_dir for driver entry points.

    Sets the nanos-as-long conf on the given session (runtime-settable), so
    externally created sessions can read TIMESTAMP(NANOS) parquet too;
    TIMESTAMP(µs) columns (what the fixture carries) are normalized to the
    same i64-ns shadow by :func:`normalize_ns` — both parquet temporal
    encodings land on one canonical dtype.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ wall-clock -> instant goes through the session tz; pin UTC so
    # externally created sessions agree with DuckDB's epoch_us()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # engine confs a plain (driver-created) session lacks, all
    # runtime-settable: the 200-partition default is pure task overhead
    # at local gate scale. Only replace the STOCK default — a cluster
    # (or user) that configured shuffle.partitions deliberately keeps
    # its value (checked via the launch SparkConf, not the value: a
    # deliberate "200" must survive — r8 ADVICE); AQE coalescing keeps
    # post-shuffle partitions data-sized
    explicitly_set = spark.sparkContext.getConf().contains(
        "spark.sql.shuffle.partitions")
    if (not explicitly_set
            and spark.conf.get("spark.sql.shuffle.partitions",
                               "200") == "200"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
        spark.conf.set("spark.sql.shuffle.partitions",
                       cpus if cpus.isdigit() else "32")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    out = {}
    for t in tables or TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            out[t] = normalize_ns(spark.read.parquet(path))
    return out
