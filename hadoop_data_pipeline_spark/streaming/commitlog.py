"""Manifest-last atomic commit across the multi-directory state a
streaming sink mutates per micro-batch — the upgrade from the sinks'
previous honest at-least-once concession to EXACTLY-ONCE clean-zone
rows across crashes.

The problem: one micro-batch appends to several plain parquet
directories (clean zone, band index, digest store). Each append is
atomic on its own, but a crash BETWEEN appends leaves the stores
mutually inconsistent, and the streaming engine's replay of the
uncommitted batch then re-appends rows that already landed — the
duplication `StreamingDedupSink`'s module doc used to concede.

The protocol (same family as the repo's 2-phase-commit
`sources/pydatasource.py` writer, applied across N directories):

1. ``begin(batch_id)`` — snapshot the file listing of every store
   into ``pending-{batch_id}.json`` (written tmp-then-rename, so the
   intent record itself is atomic). Nothing has been mutated yet.
2. the sink runs its appends — any number, any order;
3. ``commit(batch_id)`` — write the ``commit-{batch_id}.json``
   marker (again tmp-then-rename: the RENAME is the commit point),
   then drop the pending record.

Crash anywhere before the marker rename: ``recover()`` (run before
the next tick's first batch) finds a pending record without its
marker and deletes every file that is not in the snapshot — the
stores roll back to their exact pre-batch state, and the engine's
replay recomputes the batch against clean state. Crash AFTER the
marker but before the engine's own checkpoint commit: the replayed
batch sees ``is_committed(batch_id)`` and becomes a no-op instead of
a double append. Every window is covered; clean-zone rows are
exactly-once.

Assumptions, stated plainly:

* single writer — the sink is the only process mutating the stores
  while a batch is in flight (rollback deletes files the snapshot
  does not list; an external writer racing a crashed batch would
  lose its files). This is the same discipline the reference's
  pending-file ledger (`jobs/incremental_pipeline.py`) imposes.
* stores are append-only during a batch (parquet ``mode="append"``
  creates new uniquely-named part files and never rewrites old ones
  — rollback-by-listing-diff is lossless). The one ``overwrite`` in
  the sink family fires only on an EMPTY store (bucketed-table
  bootstrap), where there is nothing to lose.
* readers that list a store directory mid-batch can observe not-yet-
  committed part files; exactly-once here is the pipeline's own
  ingest guarantee. Snapshot isolation for concurrent readers is a
  transactional table format's job, not a plain directory's.

At 100 TB the snapshot is one recursive listing per store per batch
— a driver-side metadata operation (no data read), linear in file
count; compacted stores keep it small, and a transactional format
replaces this module wholesale (the sink seam is unchanged).
"""

from __future__ import annotations

import json
import os


class BatchCommitLog:
    """Two-phase, manifest-last commit over named store directories.

    ``stores`` maps a stable name to a directory path. The log itself
    lives in ``log_dir`` (conventionally ``{checkpoint}/commitlog``),
    beside the engine's checkpoint so the pair travels together.
    """

    #: commit markers older than (latest - KEEP) are pruned at commit
    #: time; the engine only ever replays the LAST uncommitted batch,
    #: so a short tail is ample.
    KEEP = 16

    def __init__(self, log_dir: str, stores: dict[str, str]):
        self.log_dir = log_dir.rstrip("/")
        self.stores = dict(stores)
        os.makedirs(self.log_dir, exist_ok=True)

    # -- paths ----------------------------------------------------------

    def _pending_path(self, batch_id: int) -> str:
        return os.path.join(self.log_dir, f"pending-{batch_id}.json")

    def _commit_path(self, batch_id: int) -> str:
        return os.path.join(self.log_dir, f"commit-{batch_id}.json")

    @staticmethod
    def _files(root: str) -> list[str]:
        """Relative paths of every file under ``root`` (the snapshot
        unit). Metadata-only; never opens a file."""
        out: list[str] = []
        if not os.path.isdir(root):
            return out
        for r, _dirs, files in os.walk(root):
            for f in files:
                out.append(os.path.relpath(os.path.join(r, f), root))
        return sorted(out)

    @staticmethod
    def _write_atomic(path: str, payload: dict) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(payload, fh)
        os.replace(tmp, path)  # POSIX rename — the atomicity point

    # -- protocol ---------------------------------------------------------

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._commit_path(batch_id))

    def begin(self, batch_id: int) -> None:
        """Record the pre-batch snapshot of every store. Call before
        the first state append of the batch (reads are fine earlier)."""
        snap = {name: self._files(path) for name, path in self.stores.items()}
        self._write_atomic(
            self._pending_path(batch_id),
            {"batch_id": batch_id, "snapshot": snap},
        )

    def commit(self, batch_id: int) -> None:
        """The commit point: rename the marker into place, then drop
        the pending record and prune old markers."""
        self._write_atomic(self._commit_path(batch_id), {"batch_id": batch_id})
        try:
            os.remove(self._pending_path(batch_id))
        except FileNotFoundError:
            pass
        self._prune(batch_id)

    def _prune(self, latest: int) -> None:
        for fn in os.listdir(self.log_dir):
            if fn.startswith("commit-") and fn.endswith(".json"):
                try:
                    bid = int(fn[len("commit-"):-len(".json")])
                except ValueError:
                    continue
                if bid < latest - self.KEEP:
                    try:
                        os.remove(os.path.join(self.log_dir, fn))
                    except FileNotFoundError:
                        pass

    def recover(self) -> dict[str, list[str]]:
        """Roll back any batch that began but never committed: delete
        every store file absent from its pending snapshot. Run before
        the first batch of a tick (the engine replays the rolled-back
        batch from its own checkpoint). Returns {store: [deleted
        relative paths]} for observability; empty when clean."""
        rolled: dict[str, list[str]] = {}
        for fn in sorted(os.listdir(self.log_dir)):
            if not (fn.startswith("pending-") and fn.endswith(".json")):
                continue
            pending = os.path.join(self.log_dir, fn)
            try:
                record = json.load(open(pending, encoding="utf-8"))
            except (json.JSONDecodeError, OSError):
                # a torn write never reaches this name (rename-atomic),
                # so an unreadable record is real corruption; without
                # its snapshot the rollback set is unknowable — refuse
                # to guess, surface it.
                raise RuntimeError(
                    f"unreadable commit-log pending record: {pending}"
                )
            batch_id = record["batch_id"]
            if self.is_committed(batch_id):
                # crash between marker rename and pending removal —
                # the batch IS committed; just finish the cleanup.
                os.remove(pending)
                continue
            snapshot = record["snapshot"]
            for name, path in self.stores.items():
                keep = set(snapshot.get(name, []))
                for rel in self._files(path):
                    if rel not in keep:
                        os.remove(os.path.join(path, rel))
                        rolled.setdefault(name, []).append(rel)
            os.remove(pending)
        return rolled
