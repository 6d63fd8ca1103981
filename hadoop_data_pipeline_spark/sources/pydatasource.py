"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API).

The reference ingests line-delimited JSON exports by globbing files and
parsing driver-side; this is the Spark-4-native version of that seam: a
registered DataSource whose reader PLANS one input partition per file,
so a 10k-file export parses on 10k tasks instead of the driver — the
extension point to use when an ingest format has no built-in reader
(proprietary exports, REST-paginated dumps, message-pack logs, ...).

Scale notes:

* ``partitions()`` runs on the driver and must stay metadata-only —
  here it lists files (one ``InputPartition`` each); rows never touch
  the driver.
* ``read(partition)`` executes on executors; it yields plain tuples in
  schema order, which Spark converts without an Arrow round-trip.
* Schema is declared up front (schema-first, matching the engine's CSV
  readers) — no inference pass over the data.
* This is Python-worker execution — the right trade for LOW-VOLUME
  bespoke formats; bulk columnar data still belongs in parquet scans.
"""

from __future__ import annotations

import glob
import json
import os
import re
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

#: Declared schema of the demo feed: (id bigint, name string, score double).
JSONL_SCHEMA = "id bigint, name string, score double"


class _JsonlPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlFilesDataSource(DataSource):
    """``spark.read.format("jsonl_files").option("path", glob)`` after
    ``register_python_sources(spark)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_files"

    def schema(self) -> str:
        return JSONL_SCHEMA

    def reader(self, schema) -> "JsonlFilesReader":
        return JsonlFilesReader(self.options)

    def writer(self, schema, overwrite: bool) -> "JsonlFilesWriter":
        return JsonlFilesWriter(self.options, schema, overwrite)


class JsonlFilesReader(DataSourceReader):
    def __init__(self, options):
        self._pattern = options.get("path")
        if not self._pattern:
            raise ValueError("jsonl_files requires the 'path' option")

    def partitions(self):  # driver-side: metadata only
        paths = sorted(glob.glob(self._pattern))
        if not paths and os.path.isdir(self._pattern):
            paths = sorted(
                glob.glob(os.path.join(self._pattern, "*.jsonl"))
            )
        return [_JsonlPartition(p) for p in paths]

    def read(self, partition: _JsonlPartition):  # executor-side
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                yield (
                    int(rec["id"]),
                    str(rec.get("name", "")),
                    float(rec.get("score", 0.0)),
                )


class _JsonlCommit(WriterCommitMessage):
    """Per-task commit message: the temp file this task produced and
    how many rows it holds."""

    def __init__(self, tmp_name: str, n_rows: int):
        self.tmp_name = tmp_name
        self.n_rows = n_rows


class JsonlFilesWriter(DataSourceWriter):
    """Sink side of the seam, with the full two-phase commit protocol
    the atomic-swap writer (`atomic.py`) implements for parquet
    partitions — here at the task level:

    * ``write`` (executors): each task streams its rows to a
      ``.tmp-<uuid>`` file and returns a commit message naming it.
      A retried/zombie task leaves only an orphaned temp file — it can
      never corrupt committed output because nothing is visible until:
    * ``commit`` (driver, once, only if EVERY task succeeded): temp
      files are renamed to fresh ``part-NNNNN.jsonl`` names (numbering
      continues past existing parts in BOTH append and overwrite mode —
      committed bytes are never touched before the manifest swap), then
      ``_MANIFEST.json`` is swapped in
      atomically (temp + rename), and only then does overwrite mode
      delete de-listed old parts — a reader that requires the
      manifest sees the old complete state or the new one, never a
      torn middle.
    * ``abort``: temp files are deleted; committed data untouched.

    Scale shape: rows stream through executors (the driver handles
    only commit messages — bytes never visit it), one rename per task
    at commit — O(tasks) metadata ops, same as the FS swap in
    `atomic.py:37-116` (reference `jobs/utils/retry.py:63-127`).
    """

    def __init__(self, options, schema, overwrite: bool):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("jsonl_files requires the 'path' option")
        self._cols = schema.fieldNames()
        self._overwrite = overwrite

    @staticmethod
    def _json_default(v):
        """JSON coercions for Spark row types with no native JSON
        form: Decimal -> float, datetime/date -> ISO, bytes -> hex."""
        import datetime
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        raise TypeError(f"not JSON-serializable: {type(v).__name__}")

    def write(self, iterator) -> _JsonlCommit:  # executor-side
        os.makedirs(self._dir, exist_ok=True)
        tmp_name = f".tmp-{uuid.uuid4().hex}"
        n = 0
        with open(
            os.path.join(self._dir, tmp_name), "w", encoding="utf-8"
        ) as fh:
            for row in iterator:
                fh.write(
                    json.dumps(
                        dict(zip(self._cols, row)),
                        sort_keys=True,
                        default=self._json_default,
                    )
                )
                fh.write("\n")
                n += 1
        return _JsonlCommit(tmp_name, n)

    def commit(self, messages) -> None:  # driver-side, all tasks ok
        """Crash-safe commit order: (1) rename temps to UNIQUE final
        names — numbering continues after the highest existing part in
        every mode so committed data is never clobbered; (2) swap the
        manifest in atomically (temp + ``os.replace``) listing the
        surviving file set; (3) only then delete parts the new
        manifest no longer references (overwrite mode). A crash at
        any point leaves a manifest whose files all exist: before the
        swap readers see the OLD complete state, after it the NEW."""
        manifest_path = os.path.join(self._dir, "_MANIFEST.json")
        existing = sorted(
            os.path.basename(p)
            for p in glob.glob(os.path.join(self._dir, "part-*.jsonl"))
        )
        # Fresh names ALWAYS — overwrite mode included.  Renaming a temp
        # onto an existing committed part name would tear the old state
        # if we crashed before the manifest swap; numbering past the
        # highest existing index means committed bytes are never touched
        # until step (3).  Indices are parsed with a regex (not a fixed
        # slice) so 6-digit parts past part-99999 keep monotonic names.
        def _part_index(name: str) -> int:
            m = re.match(r"part-(\d+)\.jsonl$", name)
            return int(m.group(1)) if m else -1

        start = (
            0 if not existing else 1 + max(_part_index(n) for n in existing)
        )
        manifest = []
        if not self._overwrite and os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                manifest = json.load(fh)["files"]
        for i, msg in enumerate(messages):
            final = f"part-{start + i:05d}.jsonl"
            os.replace(
                os.path.join(self._dir, msg.tmp_name),
                os.path.join(self._dir, final),
            )
            manifest.append({"file": final, "rows": msg.n_rows})
        tmp_manifest = manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp_manifest, "w") as fh:
            json.dump(
                {"files": manifest, "n_rows": sum(m["rows"] for m in manifest)},
                fh,
            )
        os.replace(tmp_manifest, manifest_path)
        if self._overwrite:
            keep = {m["file"] for m in manifest}
            for name in existing:
                if name not in keep:
                    os.remove(os.path.join(self._dir, name))

    def abort(self, messages) -> None:  # driver-side, something failed
        for msg in messages:
            if msg is None:
                continue
            try:
                os.remove(os.path.join(self._dir, msg.tmp_name))
            except FileNotFoundError:
                pass


def register_python_sources(spark) -> None:
    """Register all custom Python data sources on the session."""
    spark.dataSource.register(JsonlFilesDataSource)
