"""Scale-stress the STREAMING prep path (VERDICT r6 item 5): drive
``StreamingPrepSink`` over a K-fold key-shifted documents corpus in
several AvailableNow ticks, then assert the clean zone equals an
ITERATIVE BATCH reference computed over the same chunks with the
non-streaming operators and in-memory state.

What this proves that the functional tests cannot: the streaming
machinery itself — file-source checkpoint incrementality, the
manifest-last commit log, parquet state-store persistence and
re-reads across ticks — at a corpus size (8x sf0.1 by default) where
partial-commit or re-evaluation bugs would corrupt thousands of rows,
not three. The reference loop shares the operator kernels (gate,
``first_per_digest``, ``incremental_near_dup_against_index``) but
NONE of the streaming plumbing: state lives in unioned in-memory
frames, chunks are plain DataFrames. Equality therefore isolates the
plumbing as the thing under test.

CRASH INJECTION (VERDICT r8 item 4): by default the sweep now KILLS
the writer mid-batch at one tick — the digest-store append (the LAST
of the three appends) raises after the clean zone and band index have
already landed, the exact partial-commit window the manifest-last
commit log exists for. The tick is then replayed: recover() must roll
the stores back to the pre-batch snapshot (reclaiming the crashed
writer's own lease), and the engine recomputes the batch. Survivor
equality with the crash-free iterative batch reference then proves
exactly-once AT SCALE, not just on the three-row unit fixtures.

Usage: python tools/stress_stream.py [copies] [ticks] [sf_dir] [crash_tick]
``crash_tick`` is 0-based (default 1, i.e. the second tick); pass -1
to disable injection and run the crash-free sweep.
Writes scratch under /tmp/spark_graft_stress_stream (re-created each
run), never under /root/testdata.
"""

from __future__ import annotations

import shutil
import sys
import time

ROOT = "/tmp/spark_graft_stress_stream"
KEY_STRIDE = 10_000_000


def main() -> int:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    crash_tick = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from hadoop_data_pipeline_spark.operators import dedup
    from hadoop_data_pipeline_spark.session import get_session
    from hadoop_data_pipeline_spark.sources.readers import load_table
    from hadoop_data_pipeline_spark.streaming.dedup_sink import (
        first_per_digest,
    )
    from hadoop_data_pipeline_spark.streaming.prep_sink import (
        StreamingPrepSink,
    )

    spark = get_session("stress_stream")
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(ROOT, ignore_errors=True)
    t0 = time.time()

    # K key-shifted copies (identical texts -> cross-copy exact dups;
    # each copy carries the fixture's planted near-dup families).
    base = load_table(spark, sf_dir, "documents")
    parts = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * KEY_STRIDE))
        for i in range(copies)
    ]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    corpus = corpus.select("doc_id", "text", "lang")
    n_total = corpus.count()

    # contiguous ascending id chunks — ingest order == id order, so
    # first-occurrence survivorship is deterministic on both sides.
    ids = corpus.select("doc_id").orderBy("doc_id")
    bounds = [
        r.doc_id
        for r in ids.selectExpr(
            f"ntile({ticks}) OVER (ORDER BY doc_id) AS t", "doc_id"
        )
        .groupBy("t")
        .agg(F.max("doc_id").alias("doc_id"))
        .orderBy("t")
        .collect()
    ]
    lo = None
    chunks = []
    for hi in bounds:
        cond = (F.col("doc_id") <= hi) & (
            (F.col("doc_id") > lo) if lo is not None else F.lit(True)
        )
        chunks.append(corpus.where(cond))
        lo = hi
    print(
        f"corpus: {n_total} docs x {ticks} ticks "
        f"(build {time.time() - t0:.1f}s)",
        flush=True,
    )

    # --- the sink under test ------------------------------------------
    sink = StreamingPrepSink(
        spark,
        f"{ROOT}/src",
        "doc_id bigint, text string, lang string",
        f"{ROOT}/clean",
        f"{ROOT}/digests",
        f"{ROOT}/index",
        f"{ROOT}/ckpt",
        min_quality=0.5,
        langs=("en", "de"),
        threshold=0.5,
    )
    from pyspark.sql.readwriter import DataFrameWriter

    real_parquet = DataFrameWriter.parquet
    armed = {"on": False}

    def flaky_parquet(self, path, *args, **kwargs):
        # dies on the LAST of the sink's three appends: clean zone and
        # band index are already on disk — the widest partial commit.
        if armed["on"] and path == f"{ROOT}/digests":
            raise RuntimeError("injected crash before digest append")
        return real_parquet(self, path, *args, **kwargs)

    DataFrameWriter.parquet = flaky_parquet
    fired = False
    try:
        for i, chunk in enumerate(chunks):
            t1 = time.time()
            chunk.write.mode("append").parquet(f"{ROOT}/src")
            if i == crash_tick:
                armed["on"] = True
                crashed = False
                try:
                    sink.run_available_now(timeout_sec=1800)
                except Exception as exc:  # StreamingQueryException wrapper
                    assert "injected crash" in str(exc), exc
                    crashed = True
                assert crashed, (
                    "injected crash did not fire — sweep is not "
                    "exercising the partial-commit window"
                )
                fired = True
                armed["on"] = False
                print(
                    f"tick {i}: CRASHED mid-batch as injected "
                    f"({time.time() - t1:.1f}s); replaying",
                    flush=True,
                )
                t1 = time.time()
                # replay: recover() rolls back, the engine recomputes
                # the uncommitted batch from its own checkpoint.
            assert sink.run_available_now(timeout_sec=1800), (
                f"tick {i} timed out"
            )
            print(f"tick {i}: {time.time() - t1:.1f}s", flush=True)
        # a crash_tick outside [0, ticks) would silently run a
        # crash-free sweep while claiming injection — refuse.
        assert crash_tick < 0 or fired, (
            f"crash_tick={crash_tick} never fired over {ticks} ticks; "
            f"pass -1 to run the crash-free sweep explicitly"
        )
    finally:
        DataFrameWriter.parquet = real_parquet
    stream_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{ROOT}/clean")
        .select("doc_id")
        .collect()
    }

    # --- iterative batch reference (no streaming plumbing) -------------
    t1 = time.time()
    ref_clean = None  # (doc_id, text) of admitted docs
    ref_digests = None
    ref_index = None  # (doc_id, band_id, band_key)
    id_ddl = "bigint"
    empty_clean = spark.createDataFrame(
        [], f"doc_id {id_ddl}, text string"
    )
    empty_index = spark.createDataFrame(
        [], f"doc_id {id_ddl}, band_id int, band_key string"
    )
    for chunk in chunks:
        gated = sink.gate(chunk)
        first = first_per_digest(gated, "text", "doc_id")
        exact = (
            first
            if ref_digests is None
            else first.join(ref_digests, "digest", "left_anti")
        )
        surv_ids = dedup.incremental_near_dup_against_index(
            exact.drop("digest"),
            ref_clean if ref_clean is not None else empty_clean,
            ref_index if ref_index is not None else empty_index,
            "text",
            "doc_id",
            0.5,
        )
        # decide once — the reference state is plain frames, so an
        # eager checkpoint suffices (no store mutation to race).
        surv = exact.join(surv_ids, "doc_id").localCheckpoint(eager=True)
        bands = dedup._banded(
            dedup._minhash_sig(
                dedup.staged_shingle_hashes(surv, "text", "doc_id"),
                "doc_id",
            ),
            "doc_id",
        )
        new_clean = surv.select("doc_id", "text")
        new_digests = surv.select("digest")
        ref_clean = (
            new_clean
            if ref_clean is None
            else ref_clean.unionByName(new_clean)
        )
        ref_digests = (
            new_digests
            if ref_digests is None
            else ref_digests.unionByName(new_digests)
        )
        ref_index = (
            bands if ref_index is None else ref_index.unionByName(bands)
        )
        # keep the union lineage flat across ticks
        ref_clean = ref_clean.localCheckpoint(eager=True)
        ref_digests = ref_digests.localCheckpoint(eager=True)
        ref_index = ref_index.localCheckpoint(eager=True)
    ref_ids = {r.doc_id for r in ref_clean.select("doc_id").collect()}
    print(f"reference loop: {time.time() - t1:.1f}s", flush=True)

    only_stream = sorted(stream_ids - ref_ids)[:10]
    only_ref = sorted(ref_ids - stream_ids)[:10]
    ok = stream_ids == ref_ids
    print(
        f"survivors: stream={len(stream_ids)} ref={len(ref_ids)} "
        f"admitted {len(stream_ids)}/{n_total} "
        f"({'MATCH' if ok else f'MISMATCH +{only_stream} -{only_ref}'}) "
        f"total {time.time() - t0:.1f}s"
    )
    shutil.rmtree(ROOT, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
