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
       python tools/stress_stream.py --media [copies] [ticks] [sf_dir] [crash_tick]
``crash_tick`` is 0-based (default 1, i.e. the second tick); pass -1
to disable injection and run the crash-free sweep.
``--media`` runs the SAME protocol over ``StreamingMediaSink`` (r14
verdict stretch #8): per-frame dHash signatures, shared-scene dedup
against the persisted band index, decimation of survivors — crash
injected between the clean-zone and index appends, replay compared
against an iterative batch reference built from the operator kernels
with in-memory state (no streaming plumbing).
Writes scratch under /tmp/spark_graft_stress_stream (re-created each
run), never under /root/testdata.
"""

from __future__ import annotations

import shutil
import sys
import time

ROOT = "/tmp/spark_graft_stress_stream"
KEY_STRIDE = 10_000_000


def _chunked_corpus(spark, sf_dir: str, copies: int, ticks: int,
                    cols: list[str]):
    """K key-shifted copies split into ``ticks`` contiguous ascending
    id chunks (ingest order == id order, so first-occurrence
    survivorship is deterministic on both sides)."""
    from pyspark.sql import functions as F

    from hadoop_data_pipeline_spark.sources.readers import load_table

    base = load_table(spark, sf_dir, "documents")
    parts = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * KEY_STRIDE))
        for i in range(copies)
    ]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    corpus = corpus.select(*cols)
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
    return corpus, chunks


def media_main(copies: int, ticks: int, sf_dir: str, crash_tick: int) -> int:
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from hadoop_data_pipeline_spark.operators import multimodal as mm
    from hadoop_data_pipeline_spark.session import get_session
    from hadoop_data_pipeline_spark.streaming.media_sink import (
        StreamingMediaSink,
    )

    spark = get_session("stress_stream_media")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(ROOT, ignore_errors=True)
    t0 = time.time()
    corpus, chunks = _chunked_corpus(
        spark, sf_dir, copies, ticks, ["doc_id", "text"]
    )
    n_total = corpus.count()
    print(
        f"media corpus: {n_total} docs x {ticks} ticks "
        f"(build {time.time() - t0:.1f}s)",
        flush=True,
    )

    sink = StreamingMediaSink(
        spark,
        f"{ROOT}/src",
        "doc_id bigint, text string",
        f"{ROOT}/clean",
        f"{ROOT}/index",
        f"{ROOT}/ckpt",
    )
    # crash between the clean-zone and index appends — the media
    # sink's partial-commit window.
    real_write = mm.write_signature_band_index
    armed = {"on": False}

    def flaky_write(*args, **kwargs):
        if armed["on"]:
            raise RuntimeError("injected crash before index append")
        return real_write(*args, **kwargs)

    mm.write_signature_band_index = flaky_write
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
                except Exception as exc:  # noqa: BLE001
                    assert "injected crash" in str(exc), exc
                    crashed = True
                assert crashed, "injected crash did not fire"
                fired = True
                armed["on"] = False
                print(
                    f"tick {i}: CRASHED mid-batch as injected "
                    f"({time.time() - t1:.1f}s); replaying",
                    flush=True,
                )
                t1 = time.time()
            assert sink.run_available_now(timeout_sec=1800), (
                f"tick {i} timed out"
            )
            print(f"tick {i}: {time.time() - t1:.1f}s", flush=True)
        assert crash_tick < 0 or fired, (
            f"crash_tick={crash_tick} never fired over {ticks} ticks"
        )
    finally:
        mm.write_signature_band_index = real_write
    clean = spark.read.parquet(f"{ROOT}/clean")
    stream_ids = {r.doc_id for r in clean.select("doc_id").collect()}
    n_bad_dec = clean.where("dec_md5 IS NULL OR n_frames <> 2").count()

    # --- iterative batch reference (operator kernels, no streaming
    # plumbing; the sink's admission convention: drop on pair to an
    # admitted clip or to a lower-id same-chunk member) ---------------
    t1 = time.time()
    ref_index = None
    ref_ids: set[int] = set()
    for chunk in chunks:
        sig = mm.video_frame_dhashes_from_text(chunk)
        bands = mm.band_subset_rows(
            sig, "dhash", 2, 4, ["doc_id", "frame_idx"]
        )
        within = mm.video_scene_near_dup_pairs(
            sig, 2, 4, 3
        ).select(F.col("id_b").alias("doc_id"))
        if ref_index is not None:
            cross = mm._probe_signature_bands(
                bands, ref_index, "dhash", 2, "doc_id", "frame_idx", 3
            ).select(F.col("id_new").alias("doc_id"))
            dropped = cross.unionByName(within).distinct()
        else:
            dropped = within.distinct()
        surv_sig = sig.join(dropped, "doc_id", "left_anti").localCheckpoint(
            eager=True
        )
        ref_ids |= {
            r.doc_id for r in surv_sig.select("doc_id").distinct().collect()
        }
        new_bands = mm.band_subset_rows(
            surv_sig, "dhash", 2, 4, ["doc_id", "frame_idx"]
        )
        ref_index = (
            new_bands
            if ref_index is None
            else ref_index.unionByName(new_bands)
        ).localCheckpoint(eager=True)
    print(f"reference loop: {time.time() - t1:.1f}s", flush=True)

    only_stream = sorted(stream_ids - ref_ids)[:10]
    only_ref = sorted(ref_ids - stream_ids)[:10]
    ok = stream_ids == ref_ids and n_bad_dec == 0
    print(
        f"media survivors: stream={len(stream_ids)} ref={len(ref_ids)} "
        f"admitted {len(stream_ids)}/{n_total} bad_decimate={n_bad_dec} "
        f"({'MATCH' if ok else f'MISMATCH +{only_stream} -{only_ref}'}) "
        f"total {time.time() - t0:.1f}s"
    )
    shutil.rmtree(ROOT, ignore_errors=True)
    return 0 if ok else 1


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    copies = int(args[0]) if len(args) > 0 else 8
    ticks = int(args[1]) if len(args) > 1 else 4
    sf_dir = args[2] if len(args) > 2 else "/root/testdata/sf0.1"
    crash_tick = int(args[3]) if len(args) > 3 else 1
    if "--media" in sys.argv[1:]:
        return media_main(copies, ticks, sf_dir, crash_tick)
    sys.argv = [sys.argv[0], *args]  # the text path reads positionals

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
