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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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


def register_python_sources(spark) -> None:
    """Register all custom Python data sources on the session."""
    spark.dataSource.register(JsonlFilesDataSource)
