package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.Events.Ev

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("batch and streaming tumbling aggregations agree") {
    implicit val sq = spark.sqlContext
    val evs = Seq(
      Ev(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 00:20:00"), 2, "click", 2.0),
      Ev(3, ts("2024-01-01 00:40:00"), 1, "view", 3.0),
      Ev(4, ts("2024-01-01 01:10:00"), 2, "click", 4.0))
    val batch = Events.tumblingCounts(evs.toDF(), "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(batch((ts("2024-01-01 00:00:00"), "click")) === ((2L, 3.0)))
    assert(batch((ts("2024-01-01 01:00:00"), "click")) === ((1L, 4.0)))

    val mem = MemoryStream[Ev]
    val q = Events.streamingTumblingCounts(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("tumbling_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_stream")
        .collect().map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4))).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("watermark drops events later than the allowed delay (append mode)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Events.streamingTumblingCounts(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("wm_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // window [00:00, 01:00) gets 2 events
      mem.addData(Ev(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0))
      mem.addData(Ev(2, ts("2024-01-01 00:50:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // advance watermark far past the window end -> window finalizes
      mem.addData(Ev(3, ts("2024-01-01 03:00:00"), 1, "view", 1.0))
      q.processAllAvailable()
      val afterClose = spark.table("wm_stream")
        .filter($"window_start" === ts("2024-01-01 00:00:00"))
        .collect()
      assert(afterClose.length === 1 && afterClose.head.getLong(3) === 2L)
      // a straggler for the closed window must be DROPPED, not re-emitted
      mem.addData(Ev(4, ts("2024-01-01 00:30:00"), 1, "click", 9.0))
      q.processAllAvailable()
      val afterLate = spark.table("wm_stream")
        .filter($"window_start" === ts("2024-01-01 00:00:00"))
        .collect()
      assert(afterLate.length === 1 && afterLate.head.getLong(3) === 2L)
    } finally q.stop()
  }

  test("streaming dedup drops re-deliveries of the same event id") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Events.streamingDedup(mem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      val e = Ev(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0)
      mem.addData(e, e.copy(value = 99.0)) // same id+ts, different payload
      mem.addData(e)                       // re-delivered in a later batch
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() === 1)
    } finally q.stop()
  }

  test("dedup-within-watermark drops restamped redeliveries too") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Events.streamingDedupWithinWatermark(mem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_wm_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      val e = Ev(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0)
      mem.addData(e)
      q.processAllAvailable()
      // at-least-once redelivery with a NEW timestamp: plain
      // dropDuplicates("event_id","ts") would keep it; within-watermark
      // dedup by id drops it
      mem.addData(e.copy(ts = ts("2024-01-01 00:12:00"), value = 99.0))
      q.processAllAvailable()
      assert(spark.table("dedup_wm_stream").count() === 1)
      val kept = spark.table("dedup_wm_stream").collect().head
      assert(kept.getDouble(4) === 1.0) // the first delivery won
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps running per-user totals across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Events.runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("running_totals")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(Ev(1, ts("2024-01-01 00:00:01"), 7, "click", 1.5))
      q.processAllAvailable()
      mem.addData(Ev(2, ts("2024-01-01 00:00:02"), 7, "view", 2.5))
      q.processAllAvailable()
      val last = spark.table("running_totals")
        .filter($"user_id" === 7).orderBy($"n_events".desc).collect().head
      assert(last.getLong(1) === 2L && last.getDouble(2) === 4.0)
    } finally q.stop()
  }

  test("file-source streaming: a parquet directory drives the same tumbling agg") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString + "/events"
    val evs = Seq(
      Ev(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 00:20:00"), 2, "click", 2.0),
      Ev(3, ts("2024-01-01 01:10:00"), 1, "view", 3.0))
    val batchDF = evs.toDF()
    batchDF.write.parquet(dir)
    val expected = Events.tumblingCounts(batchDF, "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4))).toMap

    val stream = spark.readStream.schema(batchDF.schema).parquet(dir)
    val q = Events.streamingTumblingCounts(stream, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("file_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_stream")
        .collect().map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4))).toMap
      assert(got === expected)
    } finally q.stop()
  }

  test("streaming session windows close after watermark passes gap") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Events.sessionCounts(
        mem.toDF().withWatermark("ts", "10 minutes"), gap = "30 minutes")
      .writeStream.format("memory").queryName("session_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Ev(1, ts("2024-01-01 00:00:00"), 7, "a", 1.0),
        Ev(2, ts("2024-01-01 00:10:00"), 7, "a", 2.0)) // same session
      q.processAllAvailable()
      // watermark far past session end (00:40) -> session emits
      mem.addData(Ev(3, ts("2024-01-01 02:00:00"), 8, "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("session_stream")
        .filter($"user_id" === 7).collect()
      assert(rows.length === 1)
      assert(rows.head.getTimestamp(0) === ts("2024-01-01 00:00:00"))
      assert(rows.head.getTimestamp(1) === ts("2024-01-01 00:40:00")) // last+gap
      assert(rows.head.getLong(3) === 2L)
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the bound only") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val views = MemoryStream[Ev]
    val q = Events.streamStreamJoin(clicks.toDF(), views.toDF(),
        delay = "10 minutes", within = "5 minutes")
      .writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(Ev(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0))
      views.addData(
        Ev(10, ts("2024-01-01 00:03:00"), 7, "view", 1.0),  // within 5m -> joins
        Ev(11, ts("2024-01-01 00:09:00"), 7, "view", 1.0),  // outside -> no
        Ev(12, ts("2024-01-01 00:03:30"), 8, "view", 1.0))  // other user -> no
      q.processAllAvailable()
      val rows = spark.table("ssj").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(rows === Set((1L, 10L)))
    } finally q.stop()
  }

  test("session windows: gap splits sessions, end = last + gap") {
    val evs = Seq(
      Ev(1, ts("2024-01-01 00:00:00"), 1, "a", 1.0),
      Ev(2, ts("2024-01-01 00:30:00"), 1, "a", 1.0), // same session (30m gap)
      Ev(3, ts("2024-01-01 02:00:00"), 1, "a", 1.0), // 90m gap -> new session
      Ev(4, ts("2024-01-01 00:15:00"), 2, "a", 1.0)).toDF()
    val out = Events.sessionCounts(evs, "1 hour")
      .collect().map(r => (r.getLong(2), r.getTimestamp(0)) -> (r.getTimestamp(1), r.getLong(3))).toMap
    assert(out((1L, ts("2024-01-01 00:00:00"))) === ((ts("2024-01-01 01:30:00"), 2L)))
    assert(out((1L, ts("2024-01-01 02:00:00"))) === ((ts("2024-01-01 03:00:00"), 1L)))
    assert(out((2L, ts("2024-01-01 00:15:00"))) === ((ts("2024-01-01 01:15:00"), 1L)))
  }

  test("resampleFfill materializes gap bins and carries values forward") {
    val df = Seq(
      Ev(1, ts("2024-01-01 00:10:00"), 1, "click", 10.0),
      Ev(2, ts("2024-01-01 00:20:00"), 1, "click", 20.0),
      // 01:00 and 02:00 are gaps for click
      Ev(3, ts("2024-01-01 03:30:00"), 1, "click", 40.0),
      Ev(4, ts("2024-01-01 02:15:00"), 1, "view", 7.0)
    ).toDF()
    val r = graft.streaming.Events
      .resampleFfill(df, "ts", "event_type", "value", 3600L)
      .collect().map(x => (x.getString(0), x.getTimestamp(1)) ->
        (x.getLong(2), Option(x.get(3)).map(_.asInstanceOf[Double]))).toMap
    // spine covers global [00:00, 03:00] for BOTH keys
    assert(r.size === 8)
    assert(r(("click", ts("2024-01-01 00:00:00"))) === ((2L, Some(15.0))))
    assert(r(("click", ts("2024-01-01 01:00:00"))) === ((0L, Some(15.0)))) // ffill
    assert(r(("click", ts("2024-01-01 02:00:00"))) === ((0L, Some(15.0)))) // ffill
    assert(r(("click", ts("2024-01-01 03:00:00"))) === ((1L, Some(40.0))))
    // view: nothing observed before 02:00 -> leading bins stay null
    assert(r(("view", ts("2024-01-01 00:00:00"))) === ((0L, None)))
    assert(r(("view", ts("2024-01-01 02:00:00"))) === ((1L, Some(7.0))))
    assert(r(("view", ts("2024-01-01 03:00:00"))) === ((0L, Some(7.0))))
  }

  test("parquet sink: checkpointed restart appends without duplicating rows") {
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("sink").toString
    val out = s"$base/data"
    val ckpt = s"$base/ckpt"
    val mem = MemoryStream[Ev]
    val q1 = graft.streaming.Events.streamToParquet(mem.toDF(), out, ckpt)
    mem.addData(Ev(1, ts("2024-01-01 00:00:01"), 1, "click", 1.0))
    mem.addData(Ev(2, ts("2024-01-01 00:00:02"), 1, "view", 2.0))
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(out).count() === 2)
    // restart the SAME source from the SAME checkpoint with NEW data:
    // the committed batch must not re-apply (ids 1,2 appear once) AND
    // the new batch must land (id 3) — a sink that blindly replayed
    // batch 0, or a restart that processed nothing, both fail this
    mem.addData(Ev(3, ts("2024-01-01 00:00:03"), 2, "click", 3.0))
    val q2 = graft.streaming.Events.streamToParquet(mem.toDF(), out, ckpt)
    q2.processAllAvailable()
    q2.stop()
    val ids = spark.read.parquet(out).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("Trigger.AvailableNow drains, STOPS, and a restart picks up only new input") {
    val base = java.nio.file.Files.createTempDirectory("avnow").toString
    val in = s"$base/in"
    val out = s"$base/data"
    val ckpt = s"$base/ckpt"
    val cfg = Events.StreamConfig(trigger = Some(
      org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    Seq(Ev(1, ts("2024-01-01 00:00:01"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 00:00:02"), 1, "view", 2.0))
      .toDF().write.parquet(in)
    val schema = spark.read.parquet(in).schema
    val q1 = Events.streamToParquet(
      spark.readStream.schema(schema).parquet(in), out, ckpt, cfg)
    // AvailableNow terminates ON ITS OWN once the backlog drains — no
    // stop() call; a hang here means the trigger didn't wire through
    assert(q1.awaitTermination(60000), "AvailableNow query must self-terminate")
    assert(spark.read.parquet(out).count() === 2)
    // new input lands AFTER the first drain; the checkpoint restart
    // must process exactly the delta (no replay of 1,2 / no miss of 3)
    Seq(Ev(3, ts("2024-01-01 00:00:03"), 2, "click", 3.0))
      .toDF().write.mode("append").parquet(in)
    val q2 = Events.streamToParquet(
      spark.readStream.schema(schema).parquet(in), out, ckpt, cfg)
    assert(q2.awaitTermination(60000), "restarted drain must self-terminate")
    val ids = spark.read.parquet(out).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("RocksDB state store runs the watermarked dedup (off-heap state path)") {
    implicit val sq = spark.sqlContext
    Events.withRocksDbStateStore(spark)
    try {
      val mem = MemoryStream[Ev]
      val q = Events.streamingDedup(mem.toDF(), "10 minutes")
        .writeStream.format("memory").queryName("rocksdb_dedup")
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData(Ev(1, ts("2024-01-01 00:00:01"), 1, "click", 1.0))
        mem.addData(Ev(1, ts("2024-01-01 00:00:01"), 1, "click", 1.0)) // redelivery
        mem.addData(Ev(2, ts("2024-01-01 00:00:02"), 1, "view", 2.0))
        q.processAllAvailable()
        // the dedup semantics must hold with state in RocksDB, and the
        // query must actually have used the provider (conf is live)
        assert(spark.table("rocksdb_dedup").count() === 2)
        assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
          .contains("RocksDBStateStoreProvider"))
      } finally q.stop()
    } finally Events.withRocksDbStateStore(spark, enabled = false)
  }

  test("foreachBatch incremental dedup: catalog state carries across batches") {
    // The streaming-ingest shape for exact dedup at scale: each
    // micro-batch dedups against the accumulated digest catalog, then
    // appends its own surviving digests to the catalog.
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    var catalog = Seq.empty[String].toDF("digest")
    val survived = scala.collection.mutable.ArrayBuffer[Long]()
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val surv = graft.ext.Dedup
          .incrementalSurvivors(batch, catalog, "doc_id", "text")
        survived ++= surv.collect().map(_.getLong(0))
        catalog = catalog
          .union(graft.ext.Dedup.digestCatalog(
            batch.join(surv, Seq("doc_id"), "left_semi"), "text"))
          .distinct().localCheckpoint()
      }
      .start()
    mem.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
    q.processAllAvailable()
    mem.addData((4L, "beta"), (5L, "gamma"), (6L, "gamma"))
    q.processAllAvailable()
    q.stop()
    assert(survived.toSet === Set(1L, 2L, 5L))
  }

  test("foreachBatch incremental MINHASH dedup: signature catalog across batches") {
    // The near-dup analog of the exact-dedup ingest: each micro-batch
    // probes the accumulated SIGNATURE catalog (q89's operator), then
    // appends its own signatures — near-dups of docs from EARLIER
    // batches are caught without re-pairing the catalog against itself.
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    var catalog = Seq.empty[(Long, Seq[Long])].toDF("id", "sig")
    val pairsSeen = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val sigs = graft.ext.Dedup.minhashSignatures(
          batch, "doc_id", "text", ngram = 2, numHashes = 32)
        val found = graft.ext.Dedup.incrementalMinhashPairs(
          sigs, catalog, tau = 0.7, bands = 8)
        pairsSeen ++= found.collect().map(r => (r.getLong(0), r.getLong(1)))
        catalog = catalog.union(sigs).localCheckpoint()
      }
      .start()
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    mem.addData((1L, a), (2L, "totally different words here entirely now"))
    q.processAllAvailable()
    mem.addData((3L, a)) // near-dup of batch-1's doc 1
    q.processAllAvailable()
    q.stop()
    assert(pairsSeen.contains((1L, 3L)),
      s"cross-batch near-dup must be caught, got $pairsSeen")
    assert(!pairsSeen.exists { case (x, y) => x == 2L || y == 2L })
  }

  test("foreachBatch streaming curation: decontaminate each batch vs a static benchmark") {
    // The ingest-time hygiene shape: every arriving micro-batch is
    // scrubbed against the (static, driver-loaded) eval benchmark
    // BEFORE it lands — the same decontaminate operator as q86, with
    // the benchmark digests broadcast once per batch and the batch
    // never shuffling. Contaminated docs must never reach the sink.
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val landed = scala.collection.mutable.ArrayBuffer[Long]()
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val clean = graft.ext.Dedup.decontaminate(
          batch, bench, "doc_id", "text", ngram = 5, minOverlap = 1L)
        landed ++= clean.collect().map(_.getLong(0))
        ()
      }
      .start()
    mem.addData(
      (1L, "prefix then the quick brown fox jumps over the lazy dog suffix"),
      (2L, "an entirely benign document about something else"))
    q.processAllAvailable()
    mem.addData(
      (3L, "late leakage: the quick brown fox jumps over the lazy dog"),
      (4L, "another clean one arriving in the second batch"))
    q.processAllAvailable()
    q.stop()
    assert(landed.toSet === Set(2L, 4L),
      s"contaminated docs 1 and 3 must be filtered at ingest, got $landed")
  }

  test("streamingDecontaminate: packaged ingest scrub; batch replay never double-lands") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("decontam_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("decontam_ckpt").toString
    val q = Events.streamingDecontaminate(
      mem.toDF().toDF("doc_id", "text"), bench, "doc_id", "text",
      out, ckpt, ngram = 5, minOverlap = 1L)
    mem.addData(
      (1L, "prefix then the quick brown fox jumps over the lazy dog suffix"),
      (2L, "an entirely benign document about something else"))
    q.processAllAvailable()
    mem.addData(
      (3L, "late leakage: the quick brown fox jumps over the lazy dog"),
      (4L, "another clean one arriving in the second batch"))
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.parquet(out)
    assert(landed.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(2L, 4L), "contaminated docs must never land")
    // the restart contract, exercised directly: a crash between write
    // and checkpoint commit makes foreachBatch REPLAY the batch with
    // the SAME batchId — the writer must overwrite, not append
    val catalog = graft.ext.Dedup.benchmarkDigests(bench, "doc_id", "text", 5)
    val writer = Events.decontaminateBatchWriter(
      catalog, "doc_id", "text", out, 1L)
    val batch1 = Seq(
      (3L, "late leakage: the quick brown fox jumps over the lazy dog"),
      (4L, "another clean one arriving in the second batch"))
      .toDF("doc_id", "text")
    writer(batch1, 1L)
    val after = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(after === Seq(2L, 4L), s"replay must not double-land: $after")
  }

  test("streamingSemanticDecontaminate: stateless scrub lands the batch twin's docs; replay idempotent") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    // bench row ~ [1, 0, 0]; tau 0.9
    val bids = Array(100L)
    val bvecs = Array(Array(1.0, 0.05, 0.0))
    val out = java.nio.file.Files.createTempDirectory("semdecon_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("semdecon_ckpt").toString
    val q = Events.streamingSemanticDecontaminate(
      mem.toDF().toDF("vec_id", "embedding"), bids, bvecs,
      "vec_id", "embedding", tau = 0.9, out, ckpt)
    mem.addData(
      (1L, Seq(0.98f, 0.06f, 0.0f)),   // contaminated
      (2L, Seq(0.0f, 1.0f, 0.0f)))     // clean
    q.processAllAvailable()
    mem.addData(
      (3L, Seq(1.0f, 0.0f, 0.0f)),     // contaminated, second batch
      (4L, Seq(0.0f, 0.0f, 0.0f)),     // zero norm: unscorable, KEPT
      (5L, null.asInstanceOf[Seq[Float]])) // null vector: KEPT
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.parquet(out)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(landed === Set(2L, 4L, 5L),
      "contaminated drop; unscorable rows survive (no evidence)")
    // replay with the same batchId must overwrite, never append
    val writer = Events.semanticDecontaminateBatchWriter(
      bids, bvecs, "vec_id", "embedding", 0.9, out)
    writer(Seq((3L, Seq(1.0f, 0.0f, 0.0f)), (4L, Seq(0.0f, 0.0f, 0.0f)),
      (5L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"), 1L)
    val after = spark.read.parquet(out)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(after === Seq(2L, 4L, 5L), s"replay must not double-land: $after")
    // the batch twin lands exactly the same survivors
    val twin = graft.ext.Dedup.semanticDecontaminate(
      Seq((1L, Seq(0.98f, 0.06f, 0.0f)), (2L, Seq(0.0f, 1.0f, 0.0f)),
        (3L, Seq(1.0f, 0.0f, 0.0f)), (4L, Seq(0.0f, 0.0f, 0.0f)),
        (5L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"),
      "vec_id", "embedding", bids, bvecs, 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(twin === landed, "stream ≡ batch")
  }

  test("streamingNearDupDedup: packaged landing-zone near-dup drop, " +
      "replay idempotent, batch-equivalent to the q89 operator") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = java.nio.file.Files.createTempDirectory("neardup_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("neardup_ckpt").toString
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "one two three four five six seven eight nine ten"
    val q = Events.streamingNearDupDedup(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", out, ckpt,
      ngram = 2, numHashes = 32, tau = 0.7, bands = 8)
    val b1 = Seq((1L, a), (2L, "totally different words here entirely now"))
    val b2 = Seq(
      (3L, a),            // near-dup of batch-1's doc 1 → dropped
      (4L, b), (5L, b),   // within-batch pair → smaller id survives
      (6L, "yet another unique document body"))
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.parquet(out)
    assert(landed.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 4L, 6L),
      "cross-batch and in-batch near-dups must never land")
    // batch-equivalence vs the q89 operator, staged identically: the
    // packaging must add NOTHING beyond incrementalMinhashPairs
    def sigsOf(rows: Seq[(Long, String)]) =
      graft.ext.Dedup.minhashSignatures(rows.toDF("doc_id", "text"),
        "doc_id", "text", 2, 32)
    val pairs2 = graft.ext.Dedup.incrementalMinhashPairs(
        sigsOf(b2), sigsOf(b1), tau = 0.7, bands = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs2.toSet === Set((1L, 3L), (4L, 5L)),
      s"q89-operator pairs drive exactly the streamed drops: $pairs2")
    // replay contract, exercised directly: same batchId twice → each
    // survivor lands ONCE and the catalog does not double-register
    val state = new Events.NearDupState(Some(
      sigsOf(b1 ++ Seq((4L, b), (6L, "yet another unique document body")))))
    val writer = Events.nearDupBatchWriter(state, "doc_id", "text", out,
      ngram = 2, numHashes = 32, tau = 0.7, bands = 8,
      maxBucketSize = Some(1000))
    writer(b2.toDF("doc_id", "text"), 1L)
    val catSize = state.loop.current.count()
    writer(b2.toDF("doc_id", "text"), 1L)
    assert(state.loop.current.count() === catSize,
      "replaying a batch must not double-register catalog signatures")
    state.release()
    val after = spark.read.parquet(s"$out/batch_id=1")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(after === Seq(4L, 6L), s"replay must not double-land: $after")
  }

  test("nearDupBatchWriter retention: the catalog is bounded to the " +
      "horizon, aged-out near-dups re-admit by design, replay stays " +
      "idempotent") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("neardup_ret").toString
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val state = new Events.NearDupState(None)
    val writer = Events.nearDupBatchWriter(state, "doc_id", "text", out,
      ngram = 2, numHashes = 32, tau = 0.7, bands = 8,
      maxBucketSize = Some(1000), retainBatches = Some(2L))
    writer(Seq((1L, a)).toDF("doc_id", "text"), 0L)
    // within the 2-batch horizon: a near-dup of batch-0's doc drops
    writer(Seq((11L, a),
      (12L, "twelve carries an unrelated body of words"))
      .toDF("doc_id", "text"), 1L)
    assert(spark.read.parquet(s"$out/batch_id=1")
      .select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(12L),
      "a near-dup inside the horizon must still drop")
    writer(Seq((13L, "thirteen is another unique document entirely"))
      .toDF("doc_id", "text"), 2L)
    // past the horizon (doc 1 registered at batch 0, horizon 2): the
    // same text RE-ADMITS — the documented retention trade
    writer(Seq((21L, a)).toDF("doc_id", "text"), 3L)
    assert(spark.read.parquet(s"$out/batch_id=3")
      .select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(21L),
      "an aged-out near-dup must re-admit (bounded-state semantics)")
    // the catalog holds ONLY the horizon's signatures
    val ids = state.loop.current.select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(13L, 21L),
      s"catalog must age out batch-0/1 signatures, got $ids")
    // replay of the live batch: no double-register, no double-land
    val n = state.loop.current.count()
    writer(Seq((21L, a)).toDF("doc_id", "text"), 3L)
    assert(state.loop.current.count() === n,
      "replaying a batch under retention must not change the catalog")
    assert(spark.read.parquet(s"$out/batch_id=3")
      .select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(21L))
    state.release()
  }

  test("streamingDecontaminateBloom: bloom-gated scrub lands exactly the exact path's docs") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("bloomdec_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bloomdec_ckpt").toString
    val q = Events.streamingDecontaminateBloom(
      mem.toDF().toDF("doc_id", "text"), bench, "doc_id", "text",
      out, ckpt, ngram = 5, minOverlap = 1L, fpp = 0.01)
    mem.addData(
      (1L, "prefix then the quick brown fox jumps over the lazy dog suffix"),
      (2L, "an entirely benign document about something else"))
    q.processAllAvailable()
    mem.addData(
      (3L, "late leakage: the quick brown fox jumps over the lazy dog"),
      (4L, "another clean one arriving in the second batch"))
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.parquet(out)
    assert(landed.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(2L, 4L),
      "bloom gate + exact confirm must land exactly the clean docs")
    // replay idempotency holds for the bloom writer too
    val catalog = graft.ext.Dedup.benchmarkDigests(bench, "doc_id", "text", 5)
    val bf = graft.ext.Dedup.digestBloom(catalog, fpp = 0.01)
    val writer = Events.decontaminateBloomBatchWriter(
      catalog, bf, "doc_id", "text", out, 1L)
    val batch1 = Seq(
      (3L, "late leakage: the quick brown fox jumps over the lazy dog"),
      (4L, "another clean one arriving in the second batch"))
      .toDF("doc_id", "text")
    writer(batch1, 1L)
    val after = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(after === Seq(2L, 4L), s"replay must not double-land: $after")
  }

  test("stateless text gates run UNCHANGED on a stream (batch/stream reuse)") {
    // qualityScore / charEntropy are pure projections, so the same
    // operator that curates a batch corpus filters a live ingest stream
    // — no rewrite, no special streaming variant. This is the point of
    // keeping the gates map-side: Structured Streaming accepts any
    // stateless plan as-is.
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val gated = graft.ext.TextAnalysis
      .qualityScore(mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .filter($"n_tokens" >= 3)
    val q = gated.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("gated_docs").start()
    mem.addData(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "no"),
      (3L, "a b c d e f g"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("gated_docs").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L))
  }
}
