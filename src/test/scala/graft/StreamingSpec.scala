package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams
import graft.ext.Similarity

// Top-level: Catalyst's deserializer codegen cannot instantiate a
// spec-inner case class through a streaming plan's re-analysis.
case class Doc(doc_id: Long, ts: Timestamp, text: String, source: String)
case class EvJ(event_id: Long, ts: Timestamp, user_id: Long,
               event_type: String, value: Double)
case class VecRow(vec_id: Long, embedding: Seq[Float], label: Int)
case class PointEv(id: Long, px: Double, py: Double)
case class MmdPair(j: Long, xa: Seq[Long], ya: Seq[Long],
                   xb: Seq[Long], yb: Seq[Long])

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)

  private def runToMemory(name: String, df: org.apache.spark.sql.DataFrame,
                          mode: OutputMode): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }

  test("tumbling windowed counts over a memory stream") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(
      Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(10), 1, "click", 2.0),
      Ev(3, ts(70), 2, "view", 3.0))
    runToMemory("tumb", Streams.tumblingCounts(stream.toDF(), "1 hour"), OutputMode.Complete())
    val out = spark.table("tumb").orderBy("win_start", "event_type").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2) // two clicks in hour 1
    assert(out(1).getAs[Double]("total_value") == 3.0)
  }

  test("session windows with 30-minute gap") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(
      Ev(1, ts(0), 1, "a", 1.0), Ev(2, ts(10), 1, "a", 1.0), // session 1
      Ev(3, ts(60), 1, "a", 1.0),                            // session 2
      Ev(4, ts(5), 2, "a", 9.0))
    runToMemory("sess", Streams.sessionAggs(stream.toDF()), OutputMode.Complete())
    val out = spark.table("sess").orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(1).getAs[Long]("n_events") == 1)
    assert(out(2).getAs[Double]("total_value") == 9.0)
  }

  test("streaming dedup within watermark drops repeated event ids") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(
      Ev(1, ts(0), 1, "a", 1.0), Ev(1, ts(1), 1, "a", 1.0), // dup id
      Ev(2, ts(2), 1, "a", 1.0))
    runToMemory("dedup", Streams.dedupStream(stream.toDF()), OutputMode.Append())
    assert(spark.table("dedup").count() == 2)
  }

  test("mapGroupsWithState running totals") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Streams.UserEvent]
    stream.addData(
      Streams.UserEvent(1, 10.0), Streams.UserEvent(1, 5.0),
      Streams.UserEvent(2, 1.0))
    // idleTimeout = None: processing-time timers fire on wall-clock,
    // which processAllAvailable can never deterministically drain.
    runToMemory("run",
      Streams.runningUserTotals(stream.toDS(), idleTimeout = None).toDF(),
      OutputMode.Update())
    val out = spark.table("run").orderBy("user_id").collect()
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(0).getAs[Double]("total_value") == 15.0)
    assert(out(1).getAs[Double]("total_value") == 1.0)
  }

  test("session_window aggs agree with the batch lag/cumsum sessionization") {
    val batch = graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
    val native = Streams.sessionAggs(batch)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lagBased = graft.queries.EventQueries
      .queries("q23_session_windows")(spark, "/root/testdata/sf0.001")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == lagBased) // same per-user session counts
  }

  test("streaming plans are the same shapes as the batch event queries") {
    // The batch events table runs through the same transforms.
    val batch = graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
    val out = Streams.tumblingCounts(batch)
    assert(out.count() > 0)
  }

  test("streaming doc-prep agrees with batch DocPrep under arrival-ordered ids") {
    implicit val sc = spark.sqlContext
    val profiles = Seq("de" -> Seq("key", "merge", "batch"),
                       "zh" -> Seq("scan", "hash", "part"))
    val stop = Seq("a", "the")
    val docs = Seq(
      Doc(1, ts(0), "dup text body", "web"),
      Doc(2, ts(1), "dup text body", "cc"),        // dup content, arrives later
      Doc(3, ts(2), "scan hash part wins", "web"), // zh
      Doc(4, ts(3), "the the the a a", "web"))     // quality 0.025 -> filtered
    val stream = MemoryStream[Doc]
    // The duplicate goes in a LATER micro-batch than the original:
    // within one batch Spark's dropDuplicates keeps an arbitrary
    // task's row; across batches the earlier batch's state always
    // wins, which is the deterministic case the operator documents.
    val q = Streams.docPrepStream(stream.toDF(), "text", stop, profiles,
        minQuality = 0.3, keepLangs = Seq("de", "zh"))
      .writeStream.format("memory").queryName("docprep")
      .outputMode(OutputMode.Append()).start()
    stream.addData(docs(0), docs(2), docs(3))
    q.processAllAvailable()
    stream.addData(docs(1))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("docprep")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = graft.ext.DocPrep.prepare(
        docs.toDF().drop("ts"), "doc_id", "text", stop, profiles,
        minQuality = 0.3, keepLangs = Seq("de", "zh"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // keep-first-arrived == keep-lowest-id when ids are arrival-ordered
    assert(streamed == batch && streamed == Set(1L, 3L))
  }

  test("chunking is streaming-compatible and agrees with batch per micro-batch") {
    implicit val sc = spark.sqlContext
    // chunkDocuments is stateless map-side fan-out (split/sequence/
    // explode/slice), so it runs unchanged on a stream — the shape a
    // live ingest uses to chunk documents as they arrive
    val docs = Seq(
      Doc(1, ts(0), "a b c d e f g h i j", "web"),
      Doc(2, ts(1), "a b c", "cc"))
    val stream = MemoryStream[Doc]
    val q = graft.ext.Chunking.chunkDocuments(stream.toDF(), col("text"),
        maxTokens = 4, overlap = 1)
      .select("doc_id", "chunk_id", "chunk_text", "chunk_tokens")
      .writeStream.format("memory").queryName("chunks")
      .outputMode(OutputMode.Append()).start()
    stream.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("chunks").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3))).toSet
    val batch = graft.ext.Chunking.chunkDocuments(
        docs.toDF().drop("ts"), col("text"), 4, 1)
      .select("doc_id", "chunk_id", "chunk_text", "chunk_tokens").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3))).toSet
    assert(streamed == batch)
    assert(streamed == Set(
      (1L, 0, "a b c d", 4), (1L, 1, "d e f g", 4), (1L, 2, "g h i j", 4),
      (2L, 0, "a b c", 3)))
  }

  test("content-defined chunking is streaming-compatible and agrees with batch") {
    implicit val sc = spark.sqlContext
    // the CDC kernel is a stateless per-document mapPartitions, so it
    // runs unchanged on a stream — the live-ingest shape that chunks
    // and content-hashes documents as they arrive (q251's batch
    // ledger is the downstream aggregate)
    val docs = Seq(
      Doc(1, ts(0), "the quick brown fox jumps over the lazy dog " * 8, "web"),
      Doc(2, ts(1), "tiny", "cc"))
    val stream = MemoryStream[Doc]
    val q = graft.ext.Chunking.contentDefinedChunks(
        stream.toDF(), "text", Seq("doc_id"))
      .writeStream.format("memory").queryName("cdcchunks")
      .outputMode(OutputMode.Append()).start()
    stream.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cdcchunks").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val batch = graft.ext.Chunking.contentDefinedChunks(
        docs.toDF().select("doc_id", "text"), "text", Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    // chunks rebuild both documents
    assert(streamed.toSeq.sortBy(t => (t._1, t._2)).groupBy(_._1)
      .map { case (id, cs) => id -> cs.map(_._3).mkString("") } ==
      docs.map(d => d.doc_id -> d.text).toMap)
  }

  test("incremental near-dup dedups each micro-batch against growing signature state") {
    implicit val sc = spark.sqlContext
    // the crawl-increment shape: each micro-batch is a delta shard,
    // foreachBatch runs the batch operator against the current corpus
    // state, and the survivors' signatures append to the state for
    // the NEXT micro-batch — so a later re-crawl of a survivor drops
    val corpus = Seq((100L, "a b c d e f g h i j")).toDF("doc_id", "text")
    var state = graft.ext.Dedup.withSimHash64(corpus, "text")
      .select("simhash").as[String].collect().toVector
    val survived = scala.collection.mutable.ArrayBuffer[Long]()
    val stream = MemoryStream[Doc]
    val q = stream.toDF().writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val out = graft.ext.Dedup.nearDupAgainstCorpus(
            batch.drop("ts"), "doc_id", "text", state.toDF("simhash"))
          .select("doc_id", "simhash").collect()
        survived ++= out.map(_.getLong(0))
        state = state ++ out.map(_.getString(1))
        // release THIS batch's staged delta — a long-running ingest
        // would otherwise accumulate persisted blocks per micro-batch
        graft.ops.Staging.releaseAll()
        ()
    }.start()
    stream.addData(
      Doc(1, ts(0), "a b c d e f g h i j", "cc"),   // corpus dup -> drops
      Doc(2, ts(1), "m n o p q r s t u v", "web"))  // novel -> survives
    q.processAllAvailable()
    stream.addData(
      Doc(3, ts(2), "m n o p q r s t u v", "cc"))   // re-crawl of 2 -> drops
    q.processAllAvailable()
    q.stop()
    assert(survived.toSeq == Seq(2L))
    assert(state.length == 2) // corpus + doc 2's signature
    graft.ops.Staging.releaseAll()
  }

  test("a frozen cross-entropy model scores micro-batches identically to batch") {
    implicit val sc = spark.sqlContext
    // fit ONCE on a reference corpus; per-batch refitting would
    // silently change the measure between micro-batches
    val ref = Seq((100L, "the cat sat on the mat"),
                  (101L, "the dog sat on the rug")).toDF("doc_id", "text")
    val model = graft.ext.Dsir.fitCrossEntropyModel(ref, "doc_id", "text")
    val scored = scala.collection.mutable.Map[Long, Double]()
    val stream = MemoryStream[Doc]
    val q = stream.toDF().writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ext.Dsir.scoreCrossEntropy(batch.drop("ts"), "doc_id", "text", model)
          .select("doc_id", "xent").collect()
          .foreach(r => scored(r.getLong(0)) = r.getDouble(1))
        ()
    }.start()
    stream.addData(Doc(1, ts(0), "the cat sat on the rug", "web"))
    q.processAllAvailable()
    stream.addData(Doc(2, ts(1), "zq xv qj wk", "cc"))
    q.processAllAvailable()
    q.stop()
    // batch scoring under the same frozen model gives the same numbers
    val batchScores = graft.ext.Dsir.scoreCrossEntropy(
        Seq((1L, "the cat sat on the rug"), (2L, "zq xv qj wk"))
          .toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    assert(scored.toMap == batchScores)
    // boilerplate close to the reference scores lower than rare text
    assert(scored(1L) < scored(2L))
    graft.ops.Staging.releaseAll()
  }

  test("exact streaming doc-prep keeps lowest id under shuffled within-batch arrival") {
    implicit val sc = spark.sqlContext
    val profiles = Seq("de" -> Seq("key", "merge", "batch"),
                       "zh" -> Seq("scan", "hash", "part"))
    val stop = Seq("a", "the")
    // ids deliberately NOT arrival-ordered: the higher-id duplicate
    // (5) arrives before the lower-id original (2) in the SAME
    // micro-batch — the case docPrepStream documents as
    // task-order-dependent and docPrepStreamExact pins.
    val batch1 = Seq(
      Doc(5, ts(0), "dup text body", "cc"),
      Doc(2, ts(1), "dup text body", "web"),
      Doc(3, ts(2), "scan hash part wins", "web"), // zh
      Doc(4, ts(3), "the the the a a", "web"))     // low quality -> filtered
    val lateDup = Doc(9, ts(4), "dup text body", "cc") // later micro-batch
    val stream = MemoryStream[Doc]
    val q = Streams.docPrepStreamExact(stream.toDF(), "text", stop, profiles,
        minQuality = 0.3, keepLangs = Seq("de", "zh"))
      .writeStream.format("memory").queryName("docprep_exact")
      .outputMode(OutputMode.Append()).start()
    stream.addData(batch1: _*)
    q.processAllAvailable()
    stream.addData(lateDup)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("docprep_exact")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaBatch = graft.ext.DocPrep.prepare(
        (batch1 :+ lateDup).toDF().drop("ts"), "doc_id", "text", stop, profiles,
        minQuality = 0.3, keepLangs = Seq("de", "zh"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == viaBatch && streamed == Set(2L, 3L),
      s"exact variant must keep the lowest id regardless of within-batch order; got $streamed")
  }

  test("incremental funnel state matches batch Funnel.steps under in-order arrival") {
    implicit val sc = spark.sqlContext
    // live-funnel shape: state holds each user's earliest completion
    // time per step; each micro-batch advances the steps IN ORDER so
    // a step can qualify against a previous step completed in the
    // SAME batch. Correct under per-user event-time-ordered arrival
    // (the ingestion norm); out-of-order arrival would need
    // retraction, which min-time funnels cannot express.
    val steps = Seq("view", "click", "purchase")
    // state(i): user -> earliest completion ts of step i
    val state = Array.fill(steps.length)(
      scala.collection.mutable.Map[Long, Timestamp]())
    val stream = MemoryStream[Ev]
    val q = stream.toDF().writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val evs = batch.select("user_id", "event_type", "ts").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
          .sortBy(e => (e._3.getTime, e._1))
        steps.zipWithIndex.foreach { case (st, i) =>
          evs.filter(_._2 == st).foreach { case (u, _, t) =>
            val qualifies = i == 0 ||
              state(i - 1).get(u).exists(p => t.after(p))
            if (qualifies && state(i).get(u).forall(t.before))
              state(i)(u) = t
          }
        }
        ()
    }.start()
    // user 1 completes the funnel ACROSS batches; user 2's click
    // arrives before any view, user 3 ties (not strictly after)
    stream.addData(Ev(1, ts(0), 1, "view", 0), Ev(2, ts(1), 2, "click", 0),
                   Ev(3, ts(2), 3, "view", 0))
    q.processAllAvailable()
    stream.addData(Ev(4, ts(5), 1, "click", 0), Ev(5, ts(6), 1, "purchase", 0),
                   Ev(6, ts(7), 2, "view", 0), Ev(7, ts(2), 3, "click", 0))
    q.processAllAvailable()
    q.stop()
    val batchAll = Seq(
      (1L, "view", ts(0)), (2L, "click", ts(1)), (3L, "view", ts(2)),
      (1L, "click", ts(5)), (1L, "purchase", ts(6)), (2L, "view", ts(7)),
      (3L, "click", ts(2))
    ).toDF("user_id", "event_type", "ts")
      .withColumn("event_id", col("user_id")) // unused tiebreak
    val viaBatch = graft.ext.Funnel.steps(batchAll, "user_id", "event_type",
        "ts", steps)
      .orderBy("step_idx").collect().map(_.getLong(2)).toSeq
    val viaStream = state.map(_.size.toLong).toSeq
    assert(viaStream == viaBatch && viaStream == Seq(3L, 1L, 1L),
      s"stream $viaStream vs batch $viaBatch")
    graft.ops.Staging.releaseAll()
  }

  test("stream-stream attribution join matches the batch interval join") {
    implicit val sc = spark.sqlContext
    val views = MemoryStream[EvJ]
    val clicks = MemoryStream[EvJ]
    val joined = Streams.attributionJoin(views.toDF(), clicks.toDF(),
      horizon = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    views.addData(
      EvJ(1, ts(0), 1, "view", 0.0),   // clicked at +10 -> pairs
      EvJ(2, ts(5), 2, "view", 0.0),   // clicked at +50 -> outside horizon
      EvJ(3, ts(20), 1, "view", 0.0))  // second view also pairs with c10
    clicks.addData(
      EvJ(10, ts(25), 1, "click", 5.0),
      EvJ(11, ts(55), 2, "click", 7.0),
      EvJ(12, ts(100), 3, "click", 9.0)) // no view at all
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attrib")
      .select("view_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == Set((1L, 10L), (3L, 10L)))
    // batch twin: identical plan semantics on static frames
    val vb = Seq(EvJ(1, ts(0), 1, "view", 0.0), EvJ(2, ts(5), 2, "view", 0.0),
      EvJ(3, ts(20), 1, "view", 0.0)).toDF()
    val cb = Seq(EvJ(10, ts(25), 1, "click", 5.0), EvJ(11, ts(55), 2, "click", 7.0),
      EvJ(12, ts(100), 3, "click", 9.0)).toDF()
    val batch = Streams.attributionJoin(vb, cb, horizon = "30 minutes")
      .select("view_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("stream-static enrichment join: each micro-batch joins the broadcast dimension") {
    implicit val sc = spark.sqlContext
    // the standard enrichment shape: an unbounded fact stream joined
    // to a small static dimension — Spark re-plans the static side
    // per micro-batch, no state store involved (unlike stream-stream)
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val stream = MemoryStream[EvJ]
    val q = stream.toDF()
      .join(broadcast(dim), Seq("user_id"), "left")
      .select("event_id", "user_id", "tier")
      .writeStream.format("memory").queryName("enrich")
      .outputMode(OutputMode.Append()).start()
    stream.addData(EvJ(10, ts(0), 1, "a", 1.0), EvJ(11, ts(1), 3, "a", 1.0))
    q.processAllAvailable()
    stream.addData(EvJ(12, ts(2), 2, "a", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("enrich").orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(2)))).toSeq
    assert(out == Seq((10L, Some("gold")), (11L, None), (12L, Some("basic"))))
  }

  test("expectations maintain incrementally over a stream; equals batch") {
    implicit val sc = spark.sqlContext
    // the whole suite is one additive global aggregate, so (like the
    // CMS/HLL counters) Kernels.expectations runs UNCHANGED on a
    // stream in Complete mode — the ingest-quality-gate shape: rates
    // update every micro-batch without a rescan
    val stream = MemoryStream[(Long, Double)]
    val rules = Seq(
      "id_positive" -> (col("_1") > 0),
      "value_nonneg" -> (col("_2") >= 0))
    val q = graft.ops.Kernels.expectations(stream.toDF(), rules)
      .writeStream.format("memory").queryName("expectations_stream")
      .outputMode(OutputMode.Complete()).start()
    stream.addData((1L, 2.0), (-1L, 3.0))
    q.processAllAvailable()
    stream.addData((2L, -5.0), (3L, 0.0)) // second micro-batch merges in
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("expectations_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = graft.ops.Kernels.expectations(
        Seq((1L, 2.0), (-1L, 3.0), (2L, -5.0), (3L, 0.0)).toDF(), rules)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch && streamed.size == 2)
    assert(streamed.contains(("id_positive", 4L, 1L, 0.25)))
  }

  test("CMS counters maintain incrementally over a stream and equal the batch sketch") {
    implicit val sc = spark.sqlContext
    // counters are ADDITIVE, so Spark's incremental stateful
    // aggregation IS the sketch merge: the q104 operator runs
    // unchanged on a stream — the live-corpus frequency monitor shape
    val stream = MemoryStream[String]
    val q = graft.ext.Sketches.cmsCounters(stream.toDF().toDF("tok"), "tok",
        depth = 2, hexChars = 2)
      .writeStream.format("memory").queryName("cms")
      .outputMode(OutputMode.Complete()).start()
    stream.addData("a", "b", "a", "c")
    q.processAllAvailable()
    stream.addData("a", "d", "e", "b") // second micro-batch merges in
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cms").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.ext.Sketches.cmsCounters(
        Seq("a", "b", "a", "c", "a", "d", "e", "b").toDF("tok"), "tok", 2, 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("HLL registers maintain over a stream; estimate-on-read equals batch") {
    implicit val sc = spark.sqlContext
    // register maintenance (group, bucket) -> max(rank) is ONE
    // stateful aggregation, so it streams; the estimate is the cheap
    // read-side fold over the bounded register table. Max never
    // retracts, so late/duplicate data only ever raises registers —
    // exactly HLL's insensitivity-to-duplicates property.
    val stream = MemoryStream[String]
    val regs = graft.ext.Sketches.hllRegisters(
      stream.toDF().select(lit("g").as("grp"), col("value").as("v")), "grp", "v")
    val q = regs.writeStream.format("memory").queryName("hllregs")
      .outputMode(OutputMode.Complete()).start()
    val values = (1 to 300).map(i => s"value_$i")
    stream.addData(values.take(150): _*)
    q.processAllAvailable()
    stream.addData(values.drop(150) ++ values.take(40): _*) // dups re-arrive
    q.processAllAvailable()
    q.stop()
    val streamedRegs = spark.table("hllregs").collect()
      .map(r => (r.getString(1), r.getInt(2))).toMap
    val batchRegs = graft.ext.Sketches.hllDistinct(
        values.map(v => ("g", v)).toDF("grp", "v"), "grp", "v")
    // same registers => bit-identical estimate; compare via the batch
    // estimator over the reconstructed register table
    val streamedEst = {
      val m = 256
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val s = streamedRegs.values.map(r => 1.0 / math.pow(2.0, r)).sum +
        (m - streamedRegs.size) * 1.0
      val raw = alpha * m * m / s
      val v = m - streamedRegs.size
      if (v > 0 && raw <= 2.5 * m) m * math.log(m.toDouble / v) else raw
    }
    val batchEst = batchRegs.head().getAs[Double]("hll_distinct")
    // identical registers; the scalar fold re-orders the double sum,
    // so allow summation-order noise (never more than ~1e-13 here)
    assert(math.abs(streamedEst - batchEst) < 1e-6,
      s"stream $streamedEst vs batch $batchEst")
  }

  test("streaming CDC latest-per-key state merges identically to batch applyChangelog") {
    implicit val sc = spark.sqlContext
    import graft.streaming.Streams.Change
    val base = Seq((1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0))
      .toDF("k", "name", "bal")
    val b1 = Seq(Change(2L, 100L, 1L, "U", 21.0), Change(9L, 120L, 1L, "U", 99.0))
    val b2 = Seq(Change(2L, 200L, 2L, "U", 22.0), Change(3L, 150L, 1L, "D", 0.0))
    val b3 = Seq(Change(2L, 50L, 1L, "U", 20.5)) // late arrival: must NOT win
    val stream = MemoryStream[Change]
    val q = graft.streaming.Streams.cdcLatestChanges(stream.toDS())
      .writeStream.format("memory").queryName("cdcstate")
      .outputMode(OutputMode.Update()).start()
    Seq(b1, b2, b3).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // final state = the max-(ts, seq) emit per key (every emit is the
    // running latest, so the max emit IS the final state)
    val finalState = spark.table("cdcstate").as[Change].collect()
      .groupBy(_.k).values.map(_.maxBy(c => (c.ts, c.seq))).toSeq.toDS()
    def merge(ch: org.apache.spark.sql.DataFrame) =
      graft.ext.Cdc.applyChangelog(base, ch, "k", "k_", "ts", "seq", "op", "D",
          Seq("v" -> "bal"))
        .orderBy("k").collect().map(r =>
          (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSeq
    val streamMerged = merge(finalState.toDF()
      .withColumnRenamed("k", "k_"))
    val batchMerged = merge((b1 ++ b2 ++ b3).toDS().toDF()
      .withColumnRenamed("k", "k_"))
    assert(streamMerged == batchMerged)
    assert(streamMerged.map(_._1) == Seq(1L, 2L, 9L)) // 3 deleted, 9 inserted
    assert(streamMerged(1)._3 == 22.0) // late ts=50 did not override ts=200
  }

  test("streaming CDC: duplicate batch delivery is absorbed — upsert sink stays exactly-once") {
    // The production exactly-once contract (r12 verdict #6): Spark
    // redelivers a micro-batch after failure (at-least-once), and the
    // sink must make the replay a no-op. For the CDC twin that holds
    // STRUCTURALLY: latest-wins state is an idempotent merge (maxBy
    // (ts, seq) over a superset that already includes the batch
    // re-emits the SAME record), so a foreachBatch MERGE/upsert-by-key
    // sink converges to the identical table whether a batch arrives
    // once or twice. Pin it by delivering b2 twice and diffing the
    // upsert-sink state against the single-delivery run.
    implicit val sc = spark.sqlContext
    import graft.streaming.Streams.Change
    val b1 = Seq(Change(2L, 100L, 1L, "U", 21.0), Change(9L, 120L, 1L, "U", 99.0))
    val b2 = Seq(Change(2L, 200L, 2L, "U", 22.0), Change(3L, 150L, 1L, "D", 0.0))
    def run(batches: Seq[Seq[Change]], name: String): Map[Long, Change] = {
      val stream = MemoryStream[Change]
      // the foreachBatch upsert sink: latest emit per key overwrites
      val sink = scala.collection.mutable.Map[Long, Change]()
      val q = graft.streaming.Streams.cdcLatestChanges(stream.toDS())
        .writeStream.outputMode(OutputMode.Update())
        .foreachBatch { (out: org.apache.spark.sql.Dataset[Change], _: Long) =>
          out.collect().foreach(c => sink(c.k) = c); ()
        }.queryName(name).start()
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      q.stop()
      sink.toMap
    }
    val once = run(Seq(b1, b2), "cdc_once")
    val replayed = run(Seq(b1, b2, b2), "cdc_replayed") // b2 delivered twice
    assert(replayed == once)
    assert(once(2L).v == 22.0 && once(3L).op == "D" && once(9L).v == 99.0)
  }

  test("stream-static overlap join emits the batch pair set, stateless, under batch splits") {
    implicit val sc = spark.sqlContext
    val rnd = new scala.util.Random(41)
    val intervals = (1 to 90).map { i =>
      val s = rnd.nextInt(5000).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(700)) }
    val windows = (1 to 12).map { j =>
      val s = rnd.nextInt(5000).toLong
      (s"w$j", s, s + 1 + rnd.nextInt(1500)) }.toDF("wk", "ws", "we")
    val expected = graft.ops.IntervalJoin.overlapJoin(
        intervals.toDF("ik", "is", "ie"), "is", "ie",
        windows, "ws", "we", bucketWidth = 256L)
      .select("ik", "wk").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val stream = MemoryStream[(Long, Long, Long)]
    val q = graft.streaming.Streams.overlapJoinStream(
        stream.toDF().toDF("ik", "is", "ie"), "is", "ie",
        windows, "ws", "we", bucketWidth = 256L)
      .writeStream.format("memory").queryName("overlaps")
      .outputMode(OutputMode.Append()).start()
    // arbitrary uneven batch splits
    intervals.grouped(37).foreach { b =>
      stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.table("overlaps").select("ik", "wk").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == got.distinct.length, "stream emitted a dup pair")
    assert(got.toSet == expected)
    assert(expected.nonEmpty)
  }

  test("streaming clamped balance equals the batch kernel under in-order arrival") {
    implicit val sc = spark.sqlContext
    import graft.streaming.Streams.SeqEvent
    val all = (1 to 60).map(i =>
      SeqEvent((i % 5).toLong, i.toLong, if (i % 3 == 0) -4.5 else 2.0))
    val stream = MemoryStream[SeqEvent]
    val q = graft.streaming.Streams.clampedBalanceStream(stream.toDS())
      .writeStream.format("memory").queryName("clampbal")
      .outputMode(OutputMode.Update()).start()
    all.grouped(23).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // final state per key = the emit with the max n_events
    val streamed = spark.table("clampbal")
      .as[graft.streaming.Streams.Balance].collect()
      .groupBy(_.k).values.map(_.maxBy(_.n_events))
      .map(b => (b.k, b.balance, b.n_events, b.n_clamps)).toSeq.sortBy(_._1)
    val batch = graft.ops.Kernels.clampedRunningSum(
        all.toDF(), "k", Seq("seq"), "v")
      .groupBy("k")
      .agg(max(struct($"seq", $"balance")).getField("balance").as("bal"),
           count(lit(1)).as("n"),
           sum($"clamped".cast("long")).as("cl"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(streamed == batch)
  }

  test("holtStream ≡ batch holtLinear under arbitrary micro-batch splits") {
    implicit val sc = spark.sqlContext
    import graft.streaming.Streams.SeriesPoint
    val all = (1 to 48).map(i =>
      SeriesPoint(s"s${i % 4}", i.toLong, (i % 9) * 1.5 + (i % 5)))
    val stream = MemoryStream[SeriesPoint]
    val q = graft.streaming.Streams.holtStream(stream.toDS(), 0.5, 0.5)
      .writeStream.format("memory").queryName("holtstate")
      .outputMode(OutputMode.Update()).start()
    all.grouped(17).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("holtstate")
      .as[graft.streaming.Streams.HoltState].collect()
      .groupBy(_.k).values.map(_.maxBy(_.n_points))
      .map(s => (s.k, s.level, s.trend, s.n_points)).toSeq.sortBy(_._1)
    val batch = graft.ops.Kernels.holtLinear(
        all.toDF(), "k", Seq("seq"), "y", 0.5, 0.5)
      .groupBy("k")
      .agg(max(struct($"seq", $"level", $"trend")).as("last"),
           count(lit(1)).as("n"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getStruct(1).getDouble(1),
                 r.getStruct(1).getDouble(2), r.getLong(2)))
      .toSeq
    assert(streamed == batch)
  }

  test("crostonStream ≡ batch crostonForecast under micro-batch splits (incl. zero-run splits)") {
    implicit val sc = spark.sqlContext
    import graft.streaming.Streams.SeriesPoint
    // intermittent series: demand only when i % 3 == 0, so batch
    // boundaries land inside zero runs and between demands; s3 never
    // demands (the seen=false ≡ batch-NULL face)
    val all = (1 to 48).map(i =>
      SeriesPoint(s"s${i % 4}",
        i.toLong, if (i % 3 == 0 && i % 4 != 3) (i % 9) * 1.5 + 1 else 0.0))
    val stream = MemoryStream[SeriesPoint]
    val q = graft.streaming.Streams.crostonStream(stream.toDS(), 0.1)
      .writeStream.format("memory").queryName("crostate")
      .outputMode(OutputMode.Update()).start()
    all.grouped(13).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("crostate")
      .as[graft.streaming.Streams.CrostonState].collect()
      .groupBy(_.k).values.map(_.maxBy(_.n_points))
      .map(s => (s.k, s.seen,
        if (s.seen) (s.demand_level, s.interval_level, s.forecast) else null))
      .toSeq.sortBy(_._1)
    val batch = graft.ops.Kernels.crostonForecast(
        all.toDF(), "k", Seq("seq"), "y", 0.1)
      .groupBy("k")
      .agg(max(struct($"seq", $"demand_level", $"interval_level",
        $"forecast")).as("last"))
      .orderBy("k").collect()
      .map { r =>
        val st = r.getStruct(1)
        (r.getString(0), !st.isNullAt(1),
          if (st.isNullAt(1)) null
          else (st.getDouble(1), st.getDouble(2), st.getDouble(3)))
      }.toSeq
    assert(streamed == batch)
  }

  test("cooldownStream ≡ batch cooldownFilter; bursts stay suppressed across batch splits") {
    implicit val sc = spark.sqlContext
    import graft.streaming.Streams.ThrottleEvent
    // key a's burst (0, 5 | 9, 12) is split ACROSS micro-batches: the
    // carried last-emit (0) must keep 9 suppressed and admit 12 —
    // the per-batch-window formulation would wrongly re-emit 9
    val all = Seq(
      ThrottleEvent("a", 1, 0L), ThrottleEvent("a", 2, 5L),
      ThrottleEvent("b", 3, 100L),
      ThrottleEvent("a", 4, 9L), ThrottleEvent("a", 5, 12L),
      ThrottleEvent("b", 6, 105L), ThrottleEvent("a", 7, 30L))
    val stream = MemoryStream[ThrottleEvent]
    val q = graft.streaming.Streams.cooldownStream(stream.toDS(), 10L)
      .writeStream.format("memory").queryName("cooldown")
      .outputMode(OutputMode.Append()).start()
    all.grouped(3).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("cooldown").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(3)).toMap
    val batch = graft.ops.Kernels.cooldownFilter(
        all.map(e => (e.k, e.seq, e.t)).toDF("k", "seq", "t"),
        "k", Seq("t", "seq"), "t", 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(3))
      .toMap
    assert(streamed == batch)
    assert(!streamed(("a", 4L)), "9 must stay suppressed across the split")
    assert(streamed(("a", 5L)), "12 must emit (10 past the last EMITTED 0)")
  }

  test("cappedSessionStream ≡ batch cappedSessionize; span cap fires across batch splits") {
    implicit val sc = spark.sqlContext
    import graft.streaming.Streams.SessEvent
    // key a drips sub-gap events 0,8,16,24,32 with gap=10, cap=20: the
    // cap must split at 24 (span 24 > 20 from start 0) even though the
    // session's START lives in an EARLIER micro-batch — per-batch
    // windows can't see it. A >gap idle then starts a third session.
    val all = Seq(
      SessEvent("a", 1, 0L), SessEvent("a", 2, 8L),
      SessEvent("b", 3, 100L),
      SessEvent("a", 4, 16L), SessEvent("a", 5, 24L),
      SessEvent("a", 6, 32L), SessEvent("b", 7, 105L),
      SessEvent("a", 8, 60L))
    val stream = MemoryStream[SessEvent]
    val q = graft.streaming.Streams.cappedSessionStream(stream.toDS(), 10L, 20L)
      .writeStream.format("memory").queryName("cappedsess")
      .outputMode(OutputMode.Append()).start()
    all.grouped(3).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("cappedsess").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val batch = graft.ops.Kernels.cappedSessionize(
        all.map(e => (e.k, e.seq, e.t)).toDF("k", "seq", "t"),
        "k", Seq("t", "seq"), "t", 10L, 20L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .toMap
    assert(streamed == batch)
    assert(streamed(("a", 4L)) == 0L, "16 joins the session started at 0")
    assert(streamed(("a", 5L)) == 24L,
      "24 must start a new session (span cap), despite the sub-gap step")
    assert(streamed(("a", 6L)) == 24L, "32 joins the capped session")
    assert(streamed(("a", 8L)) == 60L, "idle gap starts the third session")
  }

  test("proximityAlertStream ≡ batch gridProximityJoin (stream-static join, stateless)") {
    implicit val sc = spark.sqlContext
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id",
        element_at($"embedding", 1).cast("double").as("px"),
        element_at($"embedding", 2).cast("double").as("py"))
    val ref = emb.filter(pmod($"vec_id", lit(2)) === 0)
    val probePts = emb.filter(pmod($"vec_id", lit(2)) =!= 0)
      .collect().map(r => PointEv(r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val stream = MemoryStream[PointEv]
    val q = graft.streaming.Streams.proximityAlertStream(
        stream.toDF().withColumnRenamed("id", "vec_id"), "vec_id",
        ref, "vec_id", "px", "py", radius = 0.02)
      .writeStream.format("memory").queryName("proxalerts")
      .outputMode(OutputMode.Append()).start()
    val (b1, b2) = probePts.splitAt(probePts.length / 2)
    stream.addData(b1.toIndexedSeq); q.processAllAvailable()
    stream.addData(b2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = rows(spark.table("proxalerts"))
    val batch = rows(graft.ext.Spatial.gridProximityJoin(
      emb.filter(pmod($"vec_id", lit(2)) =!= 0), "vec_id",
      ref, "vec_id", "px", "py", radius = 0.02))
    assert(streamed == batch, "stream-static proximity must equal batch")
    assert(streamed.nonEmpty, "fixture should produce at least one pair")
  }

  test("nearDupIngestStream ≡ sequential batch fold; re-crawl drops; replayed batch is a no-op") {
    implicit val sc = spark.sqlContext
    val stateDir = java.nio.file.Files.createTempDirectory("ndstate").toString
    // seed: the frozen corpus's signatures (8 B of state per doc)
    val corpus = Seq((100L, "a b c d e f g h i j")).toDF("doc_id", "text")
    graft.ext.Dedup.withSimHash64(corpus, "text").select("simhash")
      .write.parquet(s"$stateDir/sigs")
    val shard1 = Seq(
      Doc(1, ts(0), "a b c d e f g h i j", "cc"),   // corpus dup -> drops
      Doc(2, ts(1), "m n o p q r s t u v", "web"))  // novel -> survives
    val shard2 = Seq(
      Doc(3, ts(2), "m n o p q r s t u v", "cc"),   // re-crawl of 2 -> drops
      Doc(4, ts(3), "zz yy xx ww vv uu tt", "web")) // novel -> survives
    val stream = MemoryStream[Doc]
    val q = Streams.nearDupIngestStream(stream.toDF(), stateDir,
      "doc_id", "text")
    stream.addData(shard1); q.processAllAvailable()
    stream.addData(shard2); q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(s"$stateDir/docs")
      .select("doc_id", "simhash").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // the sequential batch fold of the same shards, state threaded
    // by hand through the batch operator
    var state = graft.ext.Dedup.withSimHash64(corpus, "text")
      .select("simhash").as[String].collect().toVector
    val folded = scala.collection.mutable.Set[(Long, String)]()
    for (shard <- Seq(shard1, shard2)) {
      val out = graft.ext.Dedup.nearDupAgainstCorpus(
          shard.toDF(), "doc_id", "text", state.toDF("simhash"))
        .select("doc_id", "simhash").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      graft.ops.Staging.releaseAll()
      folded ++= out
      state = state ++ out.map(_._2)
    }
    assert(streamed == folded.toSet, "stream-fed state must equal the batch fold")
    assert(streamed.map(_._1) == Set(2L, 4L))
    assert(spark.read.parquet(s"$stateDir/sigs").count() == 3L,
      "corpus + 2 survivor signatures")
    // replay safety: a re-delivered batch id under the same query id
    // is a no-op (marker pre-written = crashed-after-append state)
    val stream2 = MemoryStream[Doc]
    val q2 = Streams.nearDupIngestStream(stream2.toDF(), stateDir,
      "doc_id", "text")
    val m2 = new org.apache.hadoop.fs.Path(
      s"$stateDir/_stream_commits/${q2.id}/0")
    val fs2 = m2.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs2.create(m2, true).close()
    stream2.addData(Seq(Doc(5, ts(4), "brand new novel text here", "web")))
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(s"$stateDir/docs").count() == 2L,
      "replayed batch id under the same query id must be a no-op")
    // a FRESH query (new id, batchId restarts at 0) is not swallowed
    // by the old markers, and its survivors gate future re-crawls
    val stream3 = MemoryStream[Doc]
    val q3 = Streams.nearDupIngestStream(stream3.toDF(), stateDir,
      "doc_id", "text")
    stream3.addData(Seq(Doc(6, ts(5), "brand new novel text here", "web")))
    q3.processAllAvailable()
    stream3.addData(Seq(Doc(7, ts(6), "brand new novel text here", "cc")))
    q3.processAllAvailable()
    q3.stop()
    assert(spark.read.parquet(s"$stateDir/docs").select("doc_id")
      .as[Long].collect().toSet == Set(2L, 4L, 6L))
    graft.ops.Staging.releaseAll()
  }

  test("annAppendStream: stream-appended labeled quantized index ≡ batch append; replayed batch is a no-op") {
    implicit val sc = spark.sqlContext
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val half1 = emb.filter(pmod($"vec_id", lit(2)) === 0)
    val half2rows = emb.filter(pmod($"vec_id", lit(2)) =!= 0)
      .collect().map(r => VecRow(r.getLong(0),
        r.getSeq[Float](r.fieldIndex("embedding")), r.getInt(2)))
    // same labeled QUANTIZED base index saved twice: one copy fed by
    // the stream, one by the batch operator with the same rows
    val idx = graft.ext.IvfIndex.buildLabeled(half1, "vec_id", "embedding",
      "label", nCentroids = 8, kmeansSweeps = 2)
    val streamDir = java.nio.file.Files.createTempDirectory("ivfstr").toString
    val batchDir = java.nio.file.Files.createTempDirectory("ivfbat").toString
    idx.saveQuantized(streamDir)
    idx.saveQuantized(batchDir)
    // two micro-batches through the streaming twin
    val (b1, b2) = half2rows.splitAt(half2rows.length / 2)
    val stream = MemoryStream[VecRow]
    val q = Streams.annAppendStream(stream.toDF(), streamDir,
      "vec_id", "embedding", labelCol = Some("label"))
    stream.addData(b1.toIndexedSeq); q.processAllAvailable()
    stream.addData(b2.toIndexedSeq); q.processAllAvailable()
    q.stop()
    // one batch append of the same rows
    graft.ext.IvfIndex.append(spark, batchDir,
      half2rows.toIndexedSeq.toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", labelCol = Some("label"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val qs = emb.filter($"vec_id" < 5)
    val viaStream = graft.ext.IvfIndex.load(spark, streamDir)
      .searchFilteredQuantized(qs, emb, "vec_id", "embedding", "label",
        k = 3, nProbe = 8)
    val viaBatch = graft.ext.IvfIndex.load(spark, batchDir)
      .searchFilteredQuantized(qs, emb, "vec_id", "embedding", "label",
        k = 3, nProbe = 8)
    assert(rows(viaStream) == rows(viaBatch),
      "stream-appended index must search identically to batch-appended")
    // and at exhaustive probes + corpus-sized rerank the quantized
    // tier reduces to the exact filtered tier over the FULL corpus
    // (delta fully visible, nothing duplicated)
    assert(rows(graft.ext.IvfIndex.load(spark, streamDir)
        .searchFilteredQuantized(qs, emb, "vec_id", "embedding", "label",
          k = 3, nProbe = 8, rerankFactor = 1000)) ==
      rows(Similarity.filteredTopK(emb, qs, "vec_id", "embedding", "label", k = 3)))
    // marker namespacing: a SECOND query (fresh checkpoint, fresh
    // query id) also restarts at batchId 0 — its first batch must
    // APPEND, not be swallowed by the first query's batch-0 marker
    // (markers are _stream_commits/<queryId>/<batchId>)
    val before = spark.read.parquet(s"$streamDir/corpus").count()
    val stream2 = MemoryStream[VecRow]
    val q2 = Streams.annAppendStream(stream2.toDF(), streamDir,
      "vec_id", "embedding", labelCol = Some("label"))
    stream2.addData(b1.toIndexedSeq)
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(s"$streamDir/corpus").count() ==
      before + b1.length,
      "a fresh query's batch 0 must not collide with old markers")
    // replay safety: re-delivering a batchId already committed by the
    // SAME query id is a no-op. Simulate recovery re-delivery by
    // pre-writing this query's batch-0 marker before any data flows
    // (query id is stable across checkpoint restarts, so this is the
    // exact state a crashed-after-append run leaves behind).
    val afterQ2 = spark.read.parquet(s"$streamDir/corpus").count()
    val stream3 = MemoryStream[VecRow]
    val q3 = Streams.annAppendStream(stream3.toDF(), streamDir,
      "vec_id", "embedding", labelCol = Some("label"))
    val m3 = new org.apache.hadoop.fs.Path(
      s"$streamDir/_stream_commits/${q3.id}/0")
    val fs3 = m3.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs3.create(m3, true).close()
    stream3.addData(b1.toIndexedSeq)
    q3.processAllAvailable()
    q3.stop()
    assert(spark.read.parquet(s"$streamDir/corpus").count() == afterQ2,
      "replayed batch id under the same query id must be a no-op")
  }

  test("calibrationCensusStream: running census ≡ batch at every prefix") {
    implicit val sc = spark.sqlContext
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "source").collect().toSeq
      .map(r => Doc(r.getLong(0), ts(0), r.getString(1), r.getString(2)))
    val (b1, rest) = docs.splitAt(docs.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    // the batch plan is the SAME transform applied to a batch frame —
    // the twin claim is census(stream prefix) == census(batch prefix)
    def censusOf(rows: Seq[Doc]) =
      Streams.calibrationCensusStream(rows.toDF(), "text")
        .orderBy("bin").collect().toSeq.map(_.toSeq)
    val stream = MemoryStream[Doc]
    val q = Streams.calibrationCensusStream(stream.toDF(), "text")
      .writeStream.format("memory").queryName("calib_census")
      .outputMode(OutputMode.Complete()).start()
    stream.addData(b1: _*)
    q.processAllAvailable()
    assert(spark.table("calib_census").orderBy("bin")
      .collect().toSeq.map(_.toSeq) == censusOf(b1),
      "mid-stream census must equal the batch census over the prefix")
    stream.addData(b2: _*)
    q.processAllAvailable()
    stream.addData(b3: _*)
    q.processAllAvailable()
    q.stop()
    assert(spark.table("calib_census").orderBy("bin")
      .collect().toSeq.map(_.toSeq) == censusOf(docs),
      "final census must equal the batch census over all documents")
  }

  test("mmdDriftStream: running linear-MMD census ≡ batch at every prefix") {
    implicit val sc = spark.sqlContext
    // paired lattice samples off the real embeddings table — the
    // q377 quantization (floor(x * 2^20)), consecutive-id pairing
    val emb = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), expr("transform(embedding, x -> " +
        "CAST(floor(CAST(x AS DOUBLE) * CAST(1048576 AS DOUBLE)) " +
        "AS BIGINT))").as("qv"))
      .orderBy("vec_id").collect()
      .map(r => r.getSeq[Long](1).toSeq)
    val pairs = emb.grouped(4).filter(_.length == 4).zipWithIndex
      .map { case (g, j) => MmdPair(j.toLong, g(0), g(1), g(2), g(3)) }
      .toSeq
    val (b1, rest) = pairs.splitAt(pairs.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    def censusOf(rows: Seq[MmdPair]) =
      Streams.mmdDriftStream(rows.toDF()).collect().toSeq.map(_.toSeq)
    val stream = MemoryStream[MmdPair]
    val q = Streams.mmdDriftStream(stream.toDF())
      .writeStream.format("memory").queryName("mmd_census")
      .outputMode(OutputMode.Complete()).start()
    stream.addData(b1: _*)
    q.processAllAvailable()
    assert(spark.table("mmd_census").collect().toSeq.map(_.toSeq)
      == censusOf(b1),
      "mid-stream census must equal the batch census over the prefix")
    stream.addData(b2: _*)
    q.processAllAvailable()
    assert(spark.table("mmd_census").collect().toSeq.map(_.toSeq)
      == censusOf(b1 ++ b2))
    stream.addData(b3: _*)
    q.processAllAvailable()
    q.stop()
    assert(spark.table("mmd_census").collect().toSeq.map(_.toSeq)
      == censusOf(pairs),
      "final census must equal the batch census over all pairs")
  }
}
