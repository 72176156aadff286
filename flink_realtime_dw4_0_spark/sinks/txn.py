"""Cross-table atomic publish for KeyedTables — the warehouse-level
commit the reference's per-sink transactions approximate: one DWS
micro-batch updates several serving tables, and a crash between their
individual commits must not leave a reader seeing table A's new batch
next to table B's old one.

Two-phase with ROLL-FORWARD recovery (the same intent-journal shape as
a filesystem redo log or Iceberg's multi-table catalog commit):

  1. PREPARE — every table's next snapshot is written as an UNCOMMITTED
     version dir + manifest (``KeyedTable.prepare``): full data on disk,
     CURRENT untouched, invisible to readers and to ``_history`` (which
     only trusts HISTORY + CURRENT).
  2. INTENT — one journal file listing (table path, version) pairs is
     written and fsync-renamed into place.  This is the commit point.
  3. FLIP — each table's CURRENT pointer flips to its prepared version
     (the same atomic tmp+rename every normal merge uses).
  4. CLEAN — the journal is removed.

Crash before INTENT: no journal → nothing flips; orphan version dirs
are GC'd by each table's next commit.  Crash after INTENT: the journal
survives, and ``recover()`` (called by ``publish_all`` and safe to call
at every pipeline start) re-applies the remaining flips — readers see
either no table flipped or, after recovery, all of them.  Flink's
equivalent is the checkpoint-coordinated two-phase-commit sink
(TwoPhaseCommitSinkFunction); Spark-side this is the batch-boundary
restatement of the same idea.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .upsert import CommitConflictError, KeyedTable


def _flip(table_path: str, version: str) -> None:
    # optimistic-concurrency check: a staged manifest records the
    # snapshot version it was computed against — if CURRENT moved since
    # (e.g. a normal commit interleaved between staging and the intent
    # journal), flipping would drop the interleaved writer's buckets.
    man_p = KeyedTable.manifest_path_of(table_path, version)
    if os.path.exists(man_p):
        with open(man_p) as fh:
            man = json.load(fh)
        if "base" in man:
            cur = KeyedTable.current_pointer_of(table_path)
            if cur != man["base"]:
                raise CommitConflictError(
                    f"table {table_path}: staged version {version!r} was "
                    f"computed against snapshot {man['base']!r} but CURRENT "
                    f"is now {cur!r} — the publish lost the race; restage "
                    "against the new snapshot"
                )
    cur = os.path.join(table_path, "CURRENT")
    tmp = f"{cur}.tmp_txn_{version}"
    with open(tmp, "w") as fh:
        fh.write(version)
    os.replace(tmp, cur)
    with open(os.path.join(table_path, "HISTORY"), "a") as fh:
        fh.write(version + "\n")
    # the version is committed (manifest-referenced) now — drop the
    # staging sentinel that protected it from GC before the flip
    sentinel = os.path.join(table_path, version, "_STAGED")
    if os.path.exists(sentinel):
        os.remove(sentinel)


class TableTxn:
    """Atomic all-or-nothing publish across multiple KeyedTables rooted
    under one warehouse directory (where the journal lives)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _journal(self) -> str:
        return os.path.join(self.root, "TXN_INTENT")

    def recover(self) -> bool:
        """Roll forward an interrupted publish.  Returns True if a
        journal was found and completed."""
        j = self._journal()
        if not os.path.exists(j):
            return False
        with open(j) as fh:
            entries = json.load(fh)
        for e in entries:
            cur = KeyedTable.current_pointer_of(e["path"])
            if cur == e["version"]:
                continue  # this flip already happened
            if not os.path.exists(os.path.join(e["path"], e["version"])):
                # The staged version dir is gone and CURRENT never flipped
                # to it: the flip can neither be verified nor re-applied.
                # Deleting the journal here would silently convert a
                # partially applied publish into "success" — keep the
                # journal (so every later publish keeps failing loud) and
                # surface the broken entry to the operator instead.
                raise RuntimeError(
                    "TableTxn.recover: journaled version "
                    f"{e['version']!r} for table {e['path']!r} is missing "
                    "and CURRENT does not point at it; cross-table "
                    "atomicity cannot be restored automatically. The "
                    "intent journal was left in place."
                )
            _flip(e["path"], e["version"])
        os.remove(j)
        return True

    def publish_all(
        self, updates: dict[KeyedTable, DataFrame], spark: SparkSession | None = None
    ) -> None:
        """MERGE every table's batch and commit all results atomically.

        Each table's merge result is computed with the NORMAL merge
        logic but staged uncommitted (``prepare_merge``); the intent
        journal then makes the set of flips all-or-nothing under
        roll-forward recovery."""
        self.recover()  # never stack a new txn on an unfinished one
        prepared: list[tuple[str, str]] = []
        for table, batch in updates.items():
            sp = spark or batch.sparkSession
            version = table.prepare_merge(sp, batch)
            prepared.append({"path": table.path, "version": version})
        # conflict check BEFORE the commit point: once the journal lands,
        # recovery must always be able to roll forward, so a publish that
        # lost a race to an interleaved commit aborts HERE (staged dirs
        # age out via their _STAGED sentinels) instead of journaling a
        # flip that would drop the winner's buckets.
        for table, e in zip(updates, prepared):
            man = table._load_manifest(e["version"])
            if man is not None and "base" in man and (
                table._current_version() != man["base"]
            ):
                raise CommitConflictError(
                    f"table {table.path}: snapshot {man['base']!r} was "
                    "superseded while the publish was staging — re-read "
                    "and retry the whole publish"
                )
        tmp = self._journal() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(prepared, fh)
        os.replace(tmp, self._journal())  # commit point
        for e in prepared:
            _flip(e["path"], e["version"])
        os.remove(self._journal())
