"""Streaming extraction (exactly-once incremental) + multimodal plumbing."""

import pytest

from pyspark.sql import functions as F

from extract_ocr_spark.datagen import synthetic_documents_df
from extract_ocr_spark.multimodal import (
    decode_media,
    extract_features,
    media_table_from_documents,
)
from extract_ocr_spark.streaming import stream_extract

SF_DIR = "/root/testdata/sf0.001"


def test_stream_extract_incremental(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    docs = synthetic_documents_df(spark, 40, seed=42, partitions=2)
    docs.filter(F.col("doc_id") < "doc-0000000020").write.mode(
        "append").parquet(in_dir)

    q = stream_extract(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(out_dir)
    n1 = first.count()
    assert n1 == 20

    # new files arrive; restart picks up ONLY the new ones (checkpoint)
    docs.filter(F.col("doc_id") >= "doc-0000000020").write.mode(
        "append").parquet(in_dir)
    q2 = stream_extract(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    final = spark.read.parquet(out_dir)
    assert final.count() == 40
    assert final.select("doc_id").distinct().count() == 40

    # batch/stream parity: same kernel → same span sequences
    batch = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                      for s in r["out_spans"]]
        for r in __import__("extract_ocr_spark.pipeline", fromlist=["extract_df"])
        .extract_df(docs).collect()
    }
    stream = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                      for s in r["out_spans"]]
        for r in final.collect()
    }
    assert batch == stream


def test_decode_media_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "image/png")
    a = decode_media(b"xx", "image/png", fake=True)
    assert a == decode_media(b"xx", "image/png", fake=True)
    assert len(a) == 16  # md5-based deterministic fake decode


def test_media_features_plumbing(spark):
    media = media_table_from_documents(spark, SF_DIR)
    rows = media.limit(3).collect()
    for r in rows:
        assert r["media_ref"] and len(r["media_ref"]) == 16
        assert isinstance(r["payload"], (bytes, bytearray))
        assert r["meta"]["n_bytes"] == len(r["payload"])
        assert 1 <= r["meta"]["width"] <= 1920

    feats = extract_features(media, fake_decode=True)
    got = feats.collect()
    assert len(got) == media.count()
    for r in got[:5]:
        assert len(r["features"]) == 8
    # determinism across runs
    again = {r["media_ref"]: r["features"] for r in extract_features(
        media, fake_decode=True).collect()}
    for r in got:
        assert again[r["media_ref"]] == r["features"]


def test_resize_media_plumbing(spark):
    from extract_ocr_spark.multimodal import media_table_from_documents, resize_media

    media = media_table_from_documents(spark, SF_DIR).limit(20)
    out = resize_media(media, out_w=16, out_h=8).collect()
    assert len(out) == 20
    for r in out:
        assert len(r["pixels"]) == 16 * 8
        assert (r["out_width"], r["out_height"]) == (16, 8)
        assert 1 <= r["width"] <= 1920
    # deterministic across runs
    again = {r["media_ref"]: bytes(r["pixels"])
             for r in resize_media(media, out_w=16, out_h=8).collect()}
    for r in out:
        assert again[r["media_ref"]] == bytes(r["pixels"])


def test_frame_sample_plumbing(spark):
    from extract_ocr_spark.multimodal import frame_sample, media_table_from_documents

    media = media_table_from_documents(spark, SF_DIR).limit(10)
    out = frame_sample(media, every_n=2, max_frames=3).collect()
    assert out, "expected sampled frames"
    by_ref = {}
    for r in out:
        by_ref.setdefault(r["media_ref"], []).append(r["frame_idx"])
        assert len(r["frame"]) == 16  # md5-based fake decode
    for idxs in by_ref.values():
        assert len(idxs) <= 3
        assert idxs == sorted(idxs)
        assert all(i % 2 == 0 for i in idxs)
    # distinct frames from the same media differ (per-frame decode salt)
    multi = [(ref, idxs) for ref, idxs in by_ref.items() if len(idxs) >= 2]
    if multi:
        ref = multi[0][0]
        frames = [bytes(r["frame"]) for r in out if r["media_ref"] == ref]
        assert len(set(frames)) == len(frames)


def test_stream_dedup_extract(spark, tmp_path):
    """Streaming content dedup: duplicate payloads arriving in the stream
    collapse to one row (batch parity: dedup_exact_norm keeps one per
    normalized sha)."""
    import pandas as pd  # noqa: F401

    from extract_ocr_spark.schemas import DOCUMENTS_SCHEMA
    from extract_ocr_spark.streaming import stream_dedup_extract

    src = tmp_path / "stream_in"
    rows = []
    for i in range(12):
        text = f"payload {i % 4}"  # 4 distinct contents, 3 arrivals each
        rows.append((f"doc-{i}", [{"kind": "text", "text": text,
                                   "media_ref": None, "offset": 0}]))
    spark.createDataFrame(rows, DOCUMENTS_SCHEMA) \
        .coalesce(1).write.mode("overwrite").parquet(str(src))

    out = tmp_path / "stream_out"
    ckpt = tmp_path / "ckpt"
    q = (
        stream_dedup_extract(spark, str(src))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out))
    assert got.count() == 4  # one survivor per distinct content
    assert got.select("content_sha").distinct().count() == 4


def test_stream_extract_with_lineage_commits(spark, tmp_path):
    """Streaming extraction through the batch commit protocol: per-epoch
    output + lineage + metrics + _COMMITTED markers, resume from the
    checkpoint processes only new files, and the committed readers see
    exactly one processed event per doc."""
    from extract_ocr_spark.pipeline import ExtractionRun
    from extract_ocr_spark.streaming import stream_extract_with_lineage

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    docs = synthetic_documents_df(spark, 40, seed=42, partitions=2)
    docs.filter(F.col("doc_id") < "doc-0000000020").write.mode(
        "append").parquet(in_dir)

    q, run1 = stream_extract_with_lineage(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    assert run1.extracted().count() == 20
    # every epoch dir that exists carries a marker
    keys = run1._committed_keys()
    assert keys and all(k.endswith(run1.run_id) for k in keys)
    lin = run1.lineage()
    assert lin.filter(F.col("event_kind") == "processed").count() == 20

    # new files arrive; a fresh run (new run_id, same checkpoint)
    # processes ONLY the new ones and commits under its own markers
    docs.filter(F.col("doc_id") >= "doc-0000000020").write.mode(
        "append").parquet(in_dir)
    q2, run2 = stream_extract_with_lineage(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    assert run2.extracted().count() == 40
    assert run2.extracted().select("doc_id").distinct().count() == 40
    lin2 = run2.lineage().filter(F.col("event_kind") == "processed")
    assert lin2.count() == 40
    assert lin2.select("doc_id").distinct().count() == 40
    # metrics across both runs cover every doc exactly once
    metrics = spark.read.parquet(f"{out_dir}/metrics")
    assert metrics.agg(F.sum("docs")).first()[0] == 40


def test_epoch_committer_skips_replayed_committed_epoch(spark, tmp_path):
    """A restarted stream replays the last epoch under a NEW run_id when
    the sink committed but the offset checkpoint didn't — the committer
    must detect the existing marker and no-op, keeping exactly one
    lineage event per doc."""
    from extract_ocr_spark.pipeline import ExtractionRun
    from extract_ocr_spark.streaming import make_epoch_committer

    docs = synthetic_documents_df(spark, 8, seed=42, partitions=1)
    out = str(tmp_path / "replay")
    ckpt = str(tmp_path / "ckpt")  # SAME checkpoint across the restart

    run1 = ExtractionRun(spark, out, run_id="epoch-r1")
    make_epoch_committer(run1, ckpt)(docs, 0)
    # crash-before-checkpoint: a fresh process replays epoch 0
    run2 = ExtractionRun(spark, out, run_id="epoch-r2")
    make_epoch_committer(run2, ckpt)(docs, 0)

    assert run2._committed_keys() == ["0:epoch-r1"]  # no second marker
    lin = run2.lineage().filter(F.col("event_kind") == "processed")
    assert lin.count() == 8
    assert run2.extracted().count() == 8
    # and a genuinely new epoch still commits under run2
    make_epoch_committer(run2, ckpt)(docs.limit(0), 1)
    assert sorted(run2._committed_keys()) == ["0:epoch-r1", "1:epoch-r2"]


def test_epoch_committer_fresh_checkpoint_commits_new_data(spark, tmp_path):
    """Epoch ids restart at 0 with a FRESH checkpoint: reusing an output
    directory after losing the checkpoint must not silently drop the new
    stream's epoch 0. The committer keys replay detection on the stream
    identity in the checkpoint, and for foreign markers guards per-doc
    via a lineage anti-join — old docs stay single-counted, new docs
    commit."""
    from extract_ocr_spark.pipeline import ExtractionRun
    from extract_ocr_spark.streaming import make_epoch_committer

    all_docs = synthetic_documents_df(spark, 12, seed=42, partitions=1)
    first = all_docs.filter(F.col("doc_id") < F.lit("doc-0000000008"))
    out = str(tmp_path / "reused")

    run1 = ExtractionRun(spark, out, run_id="old-run")
    make_epoch_committer(run1, str(tmp_path / "ckpt1"))(first, 0)
    assert run1.extracted().count() == 8

    # checkpoint lost → new stream, fresh checkpoint, epoch ids restart;
    # epoch 0 carries 8 already-committed docs + 4 genuinely new ones
    run2 = ExtractionRun(spark, out, run_id="new-run")
    make_epoch_committer(run2, str(tmp_path / "ckpt2"))(all_docs, 0)

    lin = run2.lineage().filter(F.col("event_kind") == "processed")
    assert lin.count() == 12  # every doc exactly once
    assert lin.select("doc_id").distinct().count() == 12
    assert run2.extracted().count() == 12
    assert sorted(run2._committed_keys()) == ["0:new-run", "0:old-run"]

    # replay of the same epoch under the SAME new checkpoint no-ops
    run3 = ExtractionRun(spark, out, run_id="replay-run")
    make_epoch_committer(run3, str(tmp_path / "ckpt2"))(all_docs, 0)
    assert run3.lineage().filter(
        F.col("event_kind") == "processed").count() == 12
    assert "0:replay-run" not in run3._committed_keys()


def test_epoch_committer_regrouped_epochs_no_double_commit(spark, tmp_path):
    """A fresh checkpoint may regroup already-committed input into a NEW
    epoch id whose batch dir is pristine — the committer must still guard
    per-doc (foreign committed history anywhere in the output flips it
    into anti-join mode for its lifetime), so old docs never get a second
    lineage event even outside an epoch-id collision."""
    from extract_ocr_spark.pipeline import ExtractionRun
    from extract_ocr_spark.streaming import make_epoch_committer

    docs = synthetic_documents_df(spark, 8, seed=42, partitions=1)
    out = str(tmp_path / "regroup")

    run1 = ExtractionRun(spark, out, run_id="old-run")
    make_epoch_committer(run1, str(tmp_path / "ckpt1"))(docs, 0)

    # new stream, fresh checkpoint: the SAME docs arrive as epoch 3
    run2 = ExtractionRun(spark, out, run_id="new-run")
    make_epoch_committer(run2, str(tmp_path / "ckpt2"))(docs, 3)

    lin = run2.lineage().filter(F.col("event_kind") == "processed")
    assert lin.count() == 8  # one event per doc, not two
    assert run2.extracted().count() == 8
    assert run2._committed_keys() == ["0:old-run"]  # empty epoch 3 skipped


def test_stream_enrich_matches_batch_join(spark, tmp_path):
    """Stream-static join parity: the streamed enrichment over two file
    landings equals the batch join row-for-row (the static side is
    bounded and broadcast; the stream never shuffles)."""
    from extract_ocr_spark.streaming import stream_enrich

    in_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    dim = (events.groupBy("user_id")
           .agg(F.count("*").alias("user_events"))
           .withColumn("tier", (F.col("user_events") % 3).cast("long")))
    dim_path = str(tmp_path / "dim")
    dim.write.parquet(dim_path)
    dim_static = spark.read.parquet(dim_path)

    for pred in (F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1):
        events.filter(pred).write.mode("append").parquet(in_dir)
        q = (stream_enrich(spark, in_dir, dim_static)
             .writeStream.format("parquet").option("path", out_dir)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    got = sorted(
        (r["event_id"], r["user_id"], r["user_events"], r["tier"])
        for r in spark.read.parquet(out_dir).collect())
    want = sorted(
        (r["event_id"], r["user_id"], r["user_events"], r["tier"])
        for r in events.join(dim_static, "user_id").collect())
    assert got == want and len(got) == events.count()


def test_stream_touch_pairs_matches_batch_interval_join(spark, tmp_path):
    """Stream-stream interval join parity: the watermarked purchase ⋈
    prior-touch join over two file landings (split so half of every
    user's events arrive in each landing, forcing cross-landing matches
    through the checkpointed join state) equals the batch interval join
    pair-for-pair."""
    from extract_ocr_spark.operators.temporal import (ATTR_TOUCH_TYPES,
                                                      ATTR_WINDOW_US)
    from extract_ocr_spark.streaming import stream_touch_pairs

    in_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")

    for pred in (F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1):
        events.filter(pred).write.mode("append").parquet(in_dir)
        q = (stream_touch_pairs(spark, in_dir, delay="3650 days")
             .writeStream.format("parquet").option("path", out_dir)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    got = sorted(
        (r["pid"], r["tid"], r["ch"], r["user_id"], r["cents"])
        for r in spark.read.parquet(out_dir).collect())

    p = (events.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("pid"), "user_id",
                 F.col("ts").alias("tp"),
                 F.round(F.col("value") * 100).cast("long").alias("cents")))
    t = (events.filter(F.col("event_type").isin(*ATTR_TOUCH_TYPES))
         .select(F.col("user_id").alias("t_user"),
                 F.col("event_type").alias("ch"),
                 F.col("event_id").alias("tid"),
                 F.col("ts").alias("tt")))
    lookback = F.expr(f"INTERVAL {ATTR_WINDOW_US} MICROSECOND")
    cond = ((F.col("user_id") == F.col("t_user"))
            & (F.col("tt") <= F.col("tp"))
            & (F.col("tt") >= F.col("tp") - lookback)
            & ((F.col("tt") < F.col("tp"))
               | (F.col("tid") < F.col("pid"))))
    want = sorted(
        (r["pid"], r["tid"], r["ch"], r["user_id"], r["cents"])
        for r in p.join(t, cond)
                  .select("pid", "tid", "ch", "user_id", "cents").collect())

    assert len(got) == len(want) > 0
    assert got == want
