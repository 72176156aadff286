"""Upsert / changelog sink emulation (SURVEY §2.2 K3).

Parity: Flink's upsert-kafka sink (SQLUtil.java:55-63) consumes a retract
stream and emits keyed records + null-value tombstones for retractions —
required downstream of streaming left joins (DwdTradeOrderDetail.java:54-58).

Spark-native design (SURVEY §7.3): outer-join results converge through a
keyed last-write-wins MERGE per micro-batch.  The intermediate retract
*sequence* differs from Flink (no eager null-padded emissions); the final
relation is identical — which is what the batch oracle checks and what any
downstream table consumer observes.

Storage: a keyed parquet table with read-merge-overwrite, crash-safe via
versioned directories + an atomically-flipped CURRENT pointer (the same
snapshot-pointer idea Delta/Iceberg use).  On a production cluster this
becomes Delta/Iceberg ``MERGE INTO`` with the same keys — the calling
convention is identical, and per-batch work stays proportional to the
touched partitions.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class KeyedTable:
    """A primary-keyed table with MERGE semantics over parquet.

    upsert(batch)  — last-write-wins by key (ordered by `version_col`)
    delete(keys)   — tombstone application (type='delete' rows, K4)
    """

    def __init__(
        self,
        path: str,
        keys: list[str],
        version_col: str | None = None,
        keep_versions: int = 1,
    ):
        self.path = path
        self.keys = keys
        self.version_col = version_col
        if keep_versions < 1:
            raise ValueError(f"keep_versions must be >= 1, got {keep_versions}")
        self.keep_versions = keep_versions

    def _current_file(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def _history_file(self) -> str:
        return os.path.join(self.path, "HISTORY")

    def _history(self) -> list[str]:
        """COMMITTED version names, oldest first, that still exist on
        disk.  HISTORY is appended only after the CURRENT flip, so an
        uncommitted (crash-orphaned) version dir never appears here; if a
        crash lost the append for the committed CURRENT itself, it is
        self-healed to the tail."""
        f = self._history_file()
        names: list[str] = []
        if os.path.exists(f):
            with open(f) as fh:
                names = [ln.strip() for ln in fh if ln.strip()]
        cur = None
        if os.path.exists(self._current_file()):
            with open(self._current_file()) as fh:
                cur = fh.read().strip()
        if cur and cur not in names:
            names.append(cur)
        return [v for v in names if os.path.exists(os.path.join(self.path, v))]

    def _current_dir(self) -> str | None:
        f = self._current_file()
        if not os.path.exists(f):
            return None
        with open(f) as fh:
            v = fh.read().strip()
        d = os.path.join(self.path, v)
        return d if os.path.exists(d) else None

    def exists(self, spark: SparkSession) -> bool:
        return self._current_dir() is not None

    def read(self, spark: SparkSession) -> DataFrame | None:
        d = self._current_dir()
        return spark.read.parquet(d) if d is not None else None

    def read_version(self, spark: SparkSession, steps_back: int = 0) -> DataFrame | None:
        """Time-travel read: the snapshot `steps_back` merges ago
        (0 = current).  Requires `keep_versions > steps_back` — older
        snapshots are GC'd.  This is the Delta/Iceberg `VERSION AS OF`
        shape on the same snapshot-pointer layout; on a cluster the
        KeyedTable maps onto those formats and this call maps onto their
        time travel."""
        hist = self._history()
        if steps_back < 0 or steps_back >= len(hist):
            return None
        return spark.read.parquet(os.path.join(self.path, hist[-1 - steps_back]))

    def history(self) -> list[str]:
        """Retained snapshot names, oldest first (audit surface)."""
        return self._history()

    def changes(self, spark: SparkSession, steps_back: int = 1) -> DataFrame | None:
        """Change data feed between the snapshot ``steps_back`` merges ago
        and CURRENT — the Delta/Iceberg `table_changes` surface on the
        same snapshot layout.  Rows carry a `_change_type` column:
        'insert', 'delete', 'update_preimage', 'update_postimage'
        (post/pre pairs for keys whose non-key payload changed).

        One full-outer join on the primary key between two snapshot
        reads; payload equality compares an md5 of the non-key struct, so
        the diff never widens beyond key + one hash column per side until
        the final projection.  Requires `keep_versions > steps_back`."""
        old = self.read_version(spark, steps_back)
        new = self.read_version(spark, 0)
        if old is None or new is None:
            return None
        val_cols = [c for c in new.columns if c not in self.keys]
        if not val_cols:  # keys-only table: membership diff, no updates
            o_k, n_k = old.select(*self.keys), new.select(*self.keys)
            return (
                n_k.exceptAll(o_k)
                .withColumn("_change_type", F.lit("insert"))
                .unionByName(
                    o_k.exceptAll(n_k).withColumn("_change_type", F.lit("delete"))
                )
            )
        sig = F.md5(F.to_json(F.struct(*val_cols)))
        old_s = old.select(*self.keys, sig.alias("__sig_o"), F.struct(*val_cols).alias("__row_o"))
        new_s = new.select(*self.keys, sig.alias("__sig_n"), F.struct(*val_cols).alias("__row_n"))
        j = old_s.join(new_s, self.keys, "full_outer")
        ins = j.filter(F.col("__sig_o").isNull()).select(
            *self.keys, F.col("__row_n").alias("__row"), F.lit("insert").alias("_change_type")
        )
        dele = j.filter(F.col("__sig_n").isNull()).select(
            *self.keys, F.col("__row_o").alias("__row"), F.lit("delete").alias("_change_type")
        )
        upd = j.filter(
            F.col("__sig_o").isNotNull()
            & F.col("__sig_n").isNotNull()
            & (F.col("__sig_o") != F.col("__sig_n"))
        )
        pre = upd.select(
            *self.keys, F.col("__row_o").alias("__row"),
            F.lit("update_preimage").alias("_change_type"),
        )
        post = upd.select(
            *self.keys, F.col("__row_n").alias("__row"),
            F.lit("update_postimage").alias("_change_type"),
        )
        out = ins.unionByName(dele).unionByName(pre).unionByName(post)
        return out.select(
            *self.keys,
            *[F.col(f"__row.{c}").alias(c) for c in val_cols],
            "_change_type",
        )

    def _overwrite(self, df: DataFrame) -> None:
        """Crash-safe overwrite: write a fresh version dir, flip the
        CURRENT pointer atomically (tmp file + os.replace), then GC stale
        versions.  There is never a window with the table absent — a crash
        leaves either the old or the new version current.  (The previous
        rmtree-then-rename swap had a no-table window: a foreachBatch
        replay landing in it would silently rebuild the table from the
        replayed batch alone, losing all previously merged keys.)"""
        os.makedirs(self.path, exist_ok=True)
        v = f"v_{uuid.uuid4().hex[:12]}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, v))
        tmp = f"{self._current_file()}.tmp_{v}"
        with open(tmp, "w") as fh:
            fh.write(v)
        # commit order: flip CURRENT first, append HISTORY after — a crash
        # in between leaves a committed version that _history self-heals,
        # never a phantom uncommitted snapshot in the time-travel chain
        os.replace(tmp, self._current_file())
        with open(self._history_file(), "a") as fh:
            fh.write(v + "\n")
        retained_list = self._history()[-self.keep_versions:]
        retained = set(retained_list) | {v}
        for d in os.listdir(self.path):
            if d.startswith("v_") and d not in retained:
                shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        # compact HISTORY to the retained tail so per-merge metadata cost
        # stays O(keep_versions), not O(total merges ever)
        tmp_h = f"{self._history_file()}.tmp_{v}"
        with open(tmp_h, "w") as fh:
            fh.write("".join(n + "\n" for n in retained_list))
        os.replace(tmp_h, self._history_file())

    def replace(self, df: DataFrame) -> None:
        """Full-snapshot overwrite for callers that have ALREADY computed
        the complete next state (e.g. a register-sketch merge that read +
        combined the previous snapshot itself) — skips merge()'s second
        state read and its guaranteed-empty anti-join.  Same crash-safe
        versioned commit as merge."""
        self._overwrite(df)

    def merge(self, spark: SparkSession, batch: DataFrame, deletes: DataFrame | None = None) -> None:
        """MERGE: upsert `batch` rows by key (latest version wins within the
        batch), then remove keys present in `deletes`."""
        w_cols = [F.col(k) for k in self.keys]
        if self.version_col:
            # deterministic tiebreak: equal versions (e.g. Maxwell second-
            # granularity ts) fall back to comparing the remaining columns,
            # so the winner is stable run-to-run instead of partition-order
            rest = [
                c
                for c, dt in batch.dtypes
                if c not in self.keys and c != self.version_col and "map<" not in dt
            ]
            order = [F.col(self.version_col).desc()] + (
                [F.struct(*[F.col(c) for c in rest]).desc()] if rest else []
            )
            batch = (
                batch.withColumn(
                    "__rn",
                    F.row_number().over(Window.partitionBy(*w_cols).orderBy(*order)),
                )
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            batch = batch.dropDuplicates(self.keys)
        current = self.read(spark)
        if current is not None:
            keep = current.join(batch.select(*self.keys), on=self.keys, how="left_anti")
            merged = keep.unionByName(batch, allowMissingColumns=True)
        else:
            merged = batch
        if deletes is not None:
            merged = merged.join(deletes.select(*self.keys).distinct(), on=self.keys, how="left_anti")
        self._overwrite(merged)


def upsert_kafka_records(df: DataFrame, keys: list[str], tombstone_when=None) -> DataFrame:
    """Render a changelog batch as upsert-kafka wire records:
    key = JSON of PK columns, value = JSON of the row (NULL for tombstones)
    — exactly the contract the reference's upsert-kafka DDL declares
    (SQLUtil.java:55-63, PK at DwdTradeOrderDetail.java:86)."""
    key = F.to_json(F.struct(*[F.col(k) for k in keys]))
    value = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    if tombstone_when is not None:
        value = F.when(tombstone_when, F.lit(None).cast("string")).otherwise(value)
    return df.select(key.alias("key"), value.alias("value"))
