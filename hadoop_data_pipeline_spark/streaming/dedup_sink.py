"""Continuous-ingest exact dedup: the streaming form of
:func:`~hadoop_data_pipeline_spark.operators.curation.incremental_dedup`.

A file-source stream of documents is deduplicated per micro-batch —
within the batch AND against a persistent DIGEST STORE (a parquet
table of md5 digests written by all previous batches) — and only the
survivors are appended to the clean zone. The corpus itself is never
re-read or re-shuffled: each micro-batch joins against digests only.

Delivery semantics, stated honestly: the file source's checkpoint
gives exactly-once FILE processing; within a batch the clean-zone
append commits BEFORE the digest append, so a crash between the two
writes can duplicate that batch's docs on replay (never lose them) —
at-least-once across crashes, self-healing afterwards (the replayed
digests make every later batch filter correctly). Production note:
a transactional table format (or writing both outputs in one commit
via a manifest) upgrades this to exactly-once; the engine seam is
this one function.

Scale shape per batch: digest store scanned as (digest) only —
column-pruned, no text; batch reduced to digests before the LEFT
ANTI probe; appends are partitioned parquet. Batch cost is
O(batch + matching digests), independent of corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


class StreamingDedupSink:
    """File-source stream -> exact-deduped clean zone + digest store."""

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        schema: T.StructType | str,
        clean_dir: str,
        digest_dir: str,
        checkpoint: str,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.spark = spark
        self.source_dir = source_dir.rstrip("/")
        self.schema = schema
        self.clean_dir = clean_dir.rstrip("/")
        self.digest_dir = digest_dir.rstrip("/")
        self.checkpoint = checkpoint.rstrip("/")
        self.text_col = text_col
        self.id_col = id_col

    def _existing_digests(self) -> DataFrame | None:
        if not os.path.isdir(self.digest_dir) or not any(
            f.endswith(".parquet") for f in os.listdir(self.digest_dir)
        ):
            return None
        return self.spark.read.parquet(self.digest_dir).select("digest")

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        staged = batch_df.withColumn(
            "digest", F.md5(F.col(self.text_col))
        ).persist()
        # first occurrence within the batch (WindowGroupLimit shape)
        w = Window.partitionBy("digest").orderBy(self.id_col)
        first = (
            staged.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        idx = self._existing_digests()
        # Decide survivors EXACTLY ONCE with lineage cut: the plan
        # reads the digest store the second append mutates; a cached
        # frame can still recompute (cache-plan mismatch, evicted
        # partition) and would then anti-join the batch against its
        # OWN just-written digests, silently writing an empty digest
        # append. localCheckpoint materializes and truncates the plan
        # so no append can re-evaluate; executor loss fails the tick
        # loudly and the checkpointed source replays it.
        survivors = (
            first.join(idx, "digest", "left_anti") if idx is not None else first
        ).localCheckpoint(eager=True)
        # clean zone first, digests second: a crash in between replays
        # the batch (at-least-once), never loses it — see module doc.
        survivors.drop("digest").write.mode("append").parquet(self.clean_dir)
        survivors.select("digest").write.mode("append").parquet(
            self.digest_dir
        )
        staged.unpersist()

    def run_available_now(self, timeout_sec: int = 120) -> bool:
        """Drain everything currently in ``source_dir``, then stop —
        one cron tick of continuous ingest. Re-running after new files
        arrive processes ONLY the new files (file-source checkpoint)."""
        stream = (
            self.spark.readStream.schema(self.schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(self.source_dir)
        )
        query = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        return query.awaitTermination(timeout_sec)
