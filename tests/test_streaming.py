"""Structured Streaming tests: batch/streaming equivalence for every
windowed aggregation, plus a watermark late-data drop demonstration
over a two-chunk out-of-order replay."""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

from ceneton_database_tools_spark.catalog import load_table
from ceneton_database_tools_spark.streaming.events import (
    events_stream,
    run_stream_to_batch,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_stream_equals_batch(spark, sf_smoke):
    stream_agg = (
        events_stream(spark, sf_smoke)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )
    got = run_stream_to_batch(stream_agg).select(
        F.col("window.start").alias("w"), "event_type", "n", "s"
    )
    want = (
        load_table(spark, sf_smoke, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .select(F.col("window.start").alias("w"), "event_type", "n", "s")
    )
    assert _rows(got, "w", "event_type", "n", "s") == _rows(want, "w", "event_type", "n", "s")


def test_session_window_stream_equals_batch(spark, sf_smoke):
    def agg(df):
        return df.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
            F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s")
        )

    got = run_stream_to_batch(
        agg(events_stream(spark, sf_smoke).withWatermark("ts", "1 hour"))
    ).select(
        "user_id", F.col("session_window.start").alias("st"), "n", "s"
    )
    want = agg(load_table(spark, sf_smoke, "events")).select(
        "user_id", F.col("session_window.start").alias("st"), "n", "s"
    )
    assert _rows(got, "user_id", "st", "n", "s") == _rows(want, "user_id", "st", "n", "s")


def test_watermark_drops_late_data(spark, tmp_path):
    """Two checkpointed availableNow runs in append mode: run 1
    finalizes the hour-0 window and persists a watermark past it; run 2
    restores that watermark and must drop the late hour-0 event on
    input while accepting the fresh one."""
    import datetime as dt

    indir, ckpt, outdir = (str(tmp_path / d) for d in ("in", "ckpt", "out"))
    os.makedirs(indir)
    base = 1_700_000_000 - (1_700_000_000 % 3600)  # hour-aligned epoch

    def ts(sec):
        return dt.datetime.fromtimestamp(base + sec, dt.timezone.utc).replace(tzinfo=None)

    schema = "event_id long, ts timestamp, user_id long, value double"

    def write_chunk(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(indir)

    def run():
        sdf = (
            spark.readStream.schema(schema)
            .parquet(indir)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.sum("value").alias("s"))
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: hour-0 and hour-6 events → watermark persists at hour 5,
    # hour-0 window finalizes with only the on-time 1.0
    write_chunk([(1, ts(0), 1, 1.0), (2, ts(6 * 3600), 1, 2.0)])
    run()
    # run 2: a LATE hour-0 event (100.0, below the restored watermark)
    # plus a fresh hour-7 event
    write_chunk([(3, ts(60), 1, 100.0), (4, ts(7 * 3600), 1, 4.0)])
    run()

    emitted = [(r["window"].start, r["s"]) for r in spark.read.parquet(outdir).collect()]
    # hour-0 emitted exactly once, without the late 100.0
    assert emitted.count((ts(0), 1.0)) == 1
    assert all(s != 100.0 and s != 101.0 for _, s in emitted)


def test_registered_streaming_queries_run(spark, sf_smoke):
    from ceneton_database_tools_spark import operators as ops

    for name in (
        "streaming_tumbling_window",
        "streaming_sliding_window",
        "streaming_session_window",
    ):
        df = ops.QUERIES[name].fn(spark, sf_smoke)
        assert df.count() > 0


def test_foreachbatch_exactly_once_sink(spark, sf_smoke, tmp_path):
    """foreachBatch + epoch-id-keyed idempotent writes: the pattern for
    exactly-once delivery to sinks without native streaming support.
    Each epoch writes to its own directory; a retried epoch overwrites
    rather than duplicates."""
    out = str(tmp_path / "epochs")

    def write_epoch(batch_df, epoch_id):
        # idempotent: keyed by epoch id, overwrite on retry
        batch_df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

    sdf = (
        events_stream(spark, sf_smoke)
        .withWatermark("ts", "1 hour")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    q = (
        sdf.writeStream.outputMode("complete")
        .foreachBatch(write_epoch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.event_type: r.n for r in spark.read.parquet(out).collect()}
    want = {
        r.event_type: r.n
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


# r15 slow tier: multi-batch eviction variant; watermark late-drop stays
# always-on (test_watermark_drops_late_data) and the multibatch replay query
# stays always-on in oracle AND perturbed parity
@pytest.mark.slow
def test_multibatch_replay_evicts_state_and_drops_late(spark, tmp_path):
    """Watermark semantics ACROSS micro-batch boundaries on the replay
    harness itself: run 2 restores the checkpointed watermark, drops a
    late event below it (numRowsDroppedByWatermark), and evicts the
    state of windows it finalizes (numRowsRemoved) — the single-pass
    availableNow harness never exercises either."""
    import datetime as dt

    from ceneton_database_tools_spark.streaming.events import run_replay_pass

    indir, ckpt, outdir = (str(tmp_path / d) for d in ("in", "ckpt", "out"))
    os.makedirs(indir)
    base = 1_700_000_000 - (1_700_000_000 % 3600)

    def ts(sec):
        return dt.datetime.fromtimestamp(base + sec, dt.timezone.utc).replace(tzinfo=None)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def drop_chunk(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(tmp_path / name))
        for j, f in enumerate(sorted(os.listdir(tmp_path / name))):
            if f.endswith(".parquet"):
                os.rename(tmp_path / name / f, os.path.join(indir, f"{name}_{j}.parquet"))

    def counters(q):
        dropped = removed = 0
        for p in q.recentProgress:
            for so in p["stateOperators"]:
                dropped += so["numRowsDroppedByWatermark"]
                removed += so["numRowsRemoved"]
        return dropped, removed

    sch = spark.createDataFrame([], schema).schema
    # run 1: hour-0 and hour-3 events -> watermark lands at hour 2;
    # hour-0 finalizes and its state evicts within run 1
    drop_chunk("c0", [(1, ts(0), 1, "a", 1.0), (2, ts(3 * 3600), 1, "a", 2.0)])
    q1 = run_replay_pass(spark, sch, indir, ckpt, outdir)
    d1, r1 = counters(q1)
    assert r1 >= 1  # hour-0 window emitted + evicted
    # run 2: a LATE hour-0 event (beneath the RESTORED watermark) plus
    # an hour-6 event that pushes the watermark past hour 3
    drop_chunk("c1", [(3, ts(60), 1, "a", 100.0), (4, ts(6 * 3600), 1, "a", 4.0)])
    q2 = run_replay_pass(spark, sch, indir, ckpt, outdir)
    d2, r2 = counters(q2)
    assert d2 >= 1, "late event must be dropped by the restored watermark"
    assert r2 >= 1, "hour-3 window state must evict in run 2"

    rows = [
        (r["window"].start, r["sum_value"])
        for r in spark.read.parquet(outdir).collect()
    ]
    # hour-0 emitted exactly once, WITHOUT the late 100.0
    assert rows.count((ts(0), 1.0)) == 1
    assert all(s not in (100.0, 101.0) for _, s in rows)
    assert (ts(3 * 3600), 2.0) in rows


def test_dedup_cdf_replay_after_checkpoint_loss(spark, sf_smoke, tmp_path):
    """Exactly-once for the CDF-driven incremental dedup pipeline
    (VERDICT r12 #1): after a CHECKPOINT LOSS the change feed re-sends
    every already-processed insert and a restarted driver starts from
    fresh state — the replayed micro-batch recomputes its decisions and
    signatures but every append is skipped by the (app_id, batchId)
    txns watermark, so the decisions table and both signature-index
    tables end byte-identical: same row counts, same versions, and no
    document decided twice (duplicate index rows would silently widen
    every future candidate set)."""
    from ceneton_database_tools_spark.operators.dedup import (
        TWIN_OFFSET,
        _near_corpus_tokens,
    )
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable
    from ceneton_database_tools_spark.sources.txn_stream import (
        register_txn_source,
    )
    from ceneton_database_tools_spark.streaming.events import (
        dedup_cdf_batch_fn,
    )

    register_txn_source(spark)
    # small slice with guaranteed cross-batch dups: base docs in commit
    # 1, their drop-first-token twins in commit 2
    corpus = _near_corpus_tokens(spark, sf_smoke).where(
        (F.col("doc_id") < 120)
        | (
            (F.col("doc_id") >= TWIN_OFFSET)
            & (F.col("doc_id") < TWIN_OFFSET + 120)
        )
    )
    landing = TxnTable(str(tmp_path / "docs"))
    idx_docs = TxnTable(str(tmp_path / "idx_docs"))
    idx_bands = TxnTable(str(tmp_path / "idx_bands"))
    decisions = TxnTable(str(tmp_path / "decisions"))

    def _drain(ck: str, state: dict) -> None:
        apply_fn = dedup_cdf_batch_fn(idx_docs, idx_bands, decisions, state)
        sdf = (
            spark.readStream.format("txntable")
            .option("readchangefeed", "true")
            .load(landing.path)
        )
        q = (
            sdf.writeStream.foreachBatch(apply_fn)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()

    ck1 = str(tmp_path / "ck1")
    state = {"max_indexed": None, "batches": 0, "cross_matches": 0}
    landing.write(corpus.where(F.col("doc_id") < TWIN_OFFSET), mode="overwrite")
    _drain(ck1, state)
    landing.write(corpus.where(F.col("doc_id") >= TWIN_OFFSET), mode="append")
    _drain(ck1, state)
    assert state["batches"] == 2
    assert state["cross_matches"] > 0, "twins must match across batches"

    n_corpus = corpus.count()
    before = (
        decisions.count(),
        idx_docs.count(),
        idx_bands.count(),
        decisions.latest_version(),
        idx_docs.latest_version(),
        idx_bands.latest_version(),
    )
    assert before[0] == n_corpus

    # checkpoint LOSS: a fresh checkpoint replays the ENTIRE feed from
    # version 0; a restarted driver passes fresh self-check state
    _drain(
        str(tmp_path / "ck2"),
        {"max_indexed": None, "batches": 0, "cross_matches": 0},
    )
    after = (
        decisions.count(),
        idx_docs.count(),
        idx_bands.count(),
        decisions.latest_version(),
        idx_docs.latest_version(),
        idx_bands.latest_version(),
    )
    assert after == before, f"replay mutated the tables: {before} -> {after}"
    assert (
        decisions.read(spark)
        .groupBy("doc_id")
        .count()
        .where("count > 1")
        .count()
        == 0
    ), "a document was decided twice"


# r15 slow tier: re-batching variant; checkpoint-loss replay stays
# always-on (test_dedup_cdf_replay_after_checkpoint_loss)
@pytest.mark.slow
def test_dedup_cdf_replay_with_finer_batching(spark, sf_smoke, tmp_path):
    """VERDICT r13 #3 — the re-batching boundary, pinned: the ORIGINAL
    run drains the whole two-commit feed in ONE micro-batch; the
    fresh-checkpoint replay re-slices it FINER with
    maxversionspertrigger=1 (one commit per batch). Under the old
    (app_id, batchId) keying the second replay batch carried
    already-committed rows under a higher batchId and re-appended
    them; keying on the batch's max source commit_version (plus the
    watermark pre-filter) lands zero duplicates whatever the slicing.
    A third pass replays COARSER again over a now-partial overlap
    surface (same single batch straddling both committed versions) —
    the pre-filter must make it a no-op too."""
    from ceneton_database_tools_spark.operators.dedup import (
        TWIN_OFFSET,
        _near_corpus_tokens,
    )
    from ceneton_database_tools_spark.sinks.txnlog import TxnTable
    from ceneton_database_tools_spark.sources.txn_stream import (
        register_txn_source,
    )
    from ceneton_database_tools_spark.streaming.events import (
        dedup_cdf_batch_fn,
    )

    register_txn_source(spark)
    corpus = _near_corpus_tokens(spark, sf_smoke).where(
        (F.col("doc_id") < 80)
        | (
            (F.col("doc_id") >= TWIN_OFFSET)
            & (F.col("doc_id") < TWIN_OFFSET + 80)
        )
    )
    landing = TxnTable(str(tmp_path / "docs"))
    idx_docs = TxnTable(str(tmp_path / "idx_docs"))
    idx_bands = TxnTable(str(tmp_path / "idx_bands"))
    decisions = TxnTable(str(tmp_path / "decisions"))

    def _drain(ck: str, state: dict, max_versions: str | None) -> None:
        apply_fn = dedup_cdf_batch_fn(idx_docs, idx_bands, decisions, state)
        reader = (
            spark.readStream.format("txntable")
            .option("readchangefeed", "true")
        )
        if max_versions is not None:
            reader = reader.option("maxversionspertrigger", max_versions)
        q = (
            reader.load(landing.path)
            .writeStream.foreachBatch(apply_fn)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()

    # both commits land BEFORE the first drain: the original run
    # processes versions 0 and 1 in one micro-batch (coarse)
    landing.write(corpus.where(F.col("doc_id") < TWIN_OFFSET), mode="overwrite")
    landing.write(corpus.where(F.col("doc_id") >= TWIN_OFFSET), mode="append")
    state = {"max_indexed": None, "batches": 0, "cross_matches": 0}
    _drain(str(tmp_path / "ck1"), state, None)
    assert state["batches"] == 1, "original run must be ONE coarse batch"

    n_corpus = corpus.count()
    before = (
        decisions.count(),
        idx_docs.count(),
        idx_bands.count(),
        decisions.latest_version(),
        idx_docs.latest_version(),
        idx_bands.latest_version(),
    )
    assert before[0] == n_corpus
    # the recorded watermark is the SOURCE version, not a batch id
    assert decisions.txn_watermark("dedup_cdf_decisions") == 1

    # checkpoint loss + FINER replay: one source version per batch
    _drain(
        str(tmp_path / "ck2"),
        {"max_indexed": None, "batches": 0, "cross_matches": 0},
        "1",
    )
    mid = (
        decisions.count(),
        idx_docs.count(),
        idx_bands.count(),
        decisions.latest_version(),
        idx_docs.latest_version(),
        idx_bands.latest_version(),
    )
    assert mid == before, f"finer replay mutated the tables: {before} -> {mid}"

    # checkpoint loss + COARSE replay again (batch straddles both
    # committed versions): the watermark pre-filter empties it
    _drain(
        str(tmp_path / "ck3"),
        {"max_indexed": None, "batches": 0, "cross_matches": 0},
        None,
    )
    after = (
        decisions.count(),
        idx_docs.count(),
        idx_bands.count(),
        decisions.latest_version(),
        idx_docs.latest_version(),
        idx_bands.latest_version(),
    )
    assert after == before, f"coarse replay mutated the tables: {before} -> {after}"
    assert (
        decisions.read(spark)
        .groupBy("doc_id")
        .count()
        .where("count > 1")
        .count()
        == 0
    ), "a document was decided twice"
