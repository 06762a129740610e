package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GenStore, InvertedIndex, Merge}
import graft.streaming.{CdcSync, EventStreams}

/** CDC → derived-store sync (round 15): the retrieval index tracks a
  * mutating corpus through the CDC store's delta log — upserts are
  * scoped-delete + re-admit ([[InvertedIndex.admitReplaceBatch]]'s
  * shape), deletes are scoped takedowns, the change feed is
  * [[EventStreams.cdcChangesBetween]]'s exact replay fold, and the
  * watermark-last discipline plus the hwm mask give crash-replay
  * exactly-once without a transaction log.
  */
class CdcSyncSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one-job signed-count equality (Checks.multisetEq) instead of the
  // two-job exceptAll pair: same decision, half the jobs per gate
  private def setEq(a: DataFrame, b: DataFrame): Boolean =
    graft.operators.Checks.multisetEq(a, b)

  private val prep: DataFrame => DataFrame =
    df => df.select(col("doc_id"), split(col("text"), " ").as("tk"))

  /** Tiny deterministic corpus: 20 docs over a 6-word vocabulary. */
  private def corpus0: DataFrame = {
    val words = Seq("alpha", "beta", "gamma", "delta", "omega", "sigma")
    (0L until 20L).map { i =>
      val toks = (0 until (3 + (i % 4)).toInt)
        .map(j => words(((i + j) % words.size).toInt))
      (i, toks.mkString(" "), 0L)
    }.toDF("doc_id", "text", "seq")
  }

  /** The index a one-shot build over `docs` produces, as comparable
    * surfaces: term lookup, BM25 top-10, phrase hits. */
  private def surfaces(root: String): (Seq[Row3], Seq[(Long, Double)]) = {
    val terms = Seq("alpha", "gamma", "zulu")
    val look = InvertedIndex.lookupCurrent(spark, root, terms)
      .select(col("tok"), col("n_docs"),
        array_join(transform(col("postings"), _.cast("string")), ",")
          .as("ids"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    val bm = InvertedIndex.bm25SearchCurrent(spark, root, terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    (look, bm)
  }
  private type Row3 = (String, Long, String)

  private def freshStoreFor(docs: DataFrame, tag: String): String = {
    val root = Files.createTempDirectory(s"graft-sync-$tag").toString + "/idx"
    InvertedIndex.initStore(root)
    InvertedIndex.admitBatch(spark, prep(docs), "doc_id", "tk", 7L,
      batchId = 0L, root = root)
    root
  }

  test("sync lifecycle: bootstrap, then update/insert/delete ticks equal a fresh build of the mutated corpus") {
    val base = Files.createTempDirectory("graft-sync-life").toString
    val (cdc, root) = (s"$base/cdc", s"$base/idx")
    EventStreams.initCdcState(corpus0, cdc)
    assert(CdcSync.syncIndexFromCdc(spark, cdc, root, "doc_id", "tk", 7L,
      prep) === 0L)
    // v1: updates (tokens change, dl grows); v2: inserts + deletes
    EventStreams.publishCdcBatch(spark, cdc,
      corpus0.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), concat(col("text"), lit(" zulu zulu")).as("text"),
          lit(1L).as("seq"), lit("U").as("op")),
      Seq("doc_id"), "seq", "op")
    EventStreams.publishCdcBatch(spark, cdc,
      corpus0.filter(col("doc_id") % 5 === 2)
        .select((col("doc_id") + 100L).as("doc_id"),
          concat(lit("zulu "), col("text")).as("text"),
          lit(1L).as("seq"), lit("I").as("op"))
        .unionByName(corpus0.filter(col("doc_id") % 5 === 3)
          .select(col("doc_id"), col("text"), lit(1L).as("seq"),
            lit("D").as("op"))),
      Seq("doc_id"), "seq", "op")
    // one tick covers the two-delta window
    assert(CdcSync.syncIndexFromCdc(spark, cdc, root, "doc_id", "tk", 7L,
      prep) === 2L)
    val fresh = freshStoreFor(
      EventStreams.currentCdcSnapshot(spark, cdc), "life-fresh")
    assert(surfaces(root) === surfaces(fresh),
      "synced store diverges from a fresh build of the mutated corpus")
    // second tick with nothing new is a no-op
    assert(CdcSync.syncIndexFromCdc(spark, cdc, root, "doc_id", "tk", 7L,
      prep) === 2L)
    // compaction folds the upsert history physically: same surfaces,
    // no pending deletes, each live doc exactly once in doclens
    InvertedIndex.compactStore(spark, root, InvertedIndex.currentGen(root))
    assert(surfaces(root) === surfaces(fresh),
      "post-compaction surfaces diverge")
    val gen = InvertedIndex.genDir(root, InvertedIndex.currentGen(root))
    assert(!Files.exists(Paths.get(gen, "deletes")),
      "compaction left pending deletes")
    val dups = spark.read.parquet(s"$gen/doclens")
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(dups === 0L, "a doc survives in more than one physical copy")
  }

  test("cdcChangesBetween: applying the feed to the fromV snapshot lands exactly at toV (duplicates, stale seqs, delete-then-reinsert)") {
    val dir = Files.createTempDirectory("graft-sync-feed").toString + "/cdc"
    val v0 = Seq((1L, "one", 10L), (2L, "two", 10L), (3L, "three", 10L),
      (4L, "four", 10L)).toDF("key", "text", "seq")
    EventStreams.initCdcState(v0, dir)
    // v1: key1 twice in one batch (survivor = max (seq,op,payload));
    //     key2 STALE (seq below base -> must drop); key3 deleted;
    //     key6 inserted
    EventStreams.publishCdcBatch(spark, dir, Seq(
      (1L, "one-a", 11L, "U"), (1L, "one-b", 12L, "U"),
      (2L, "two-stale", 5L, "U"), (3L, "gone", 11L, "D"),
      (6L, "six", 1L, "I")).toDF("key", "text", "seq", "op"),
      Seq("key"), "seq", "op")
    // v2: key3 re-inserted with a LOWER seq than its old row (applies
    //     because the delete tombstoned it); key4 updated then deleted
    EventStreams.publishCdcBatch(spark, dir, Seq(
      (3L, "three-back", 2L, "I"),
      (4L, "four-b", 11L, "U"), (4L, "bye", 12L, "D"))
      .toDF("key", "text", "seq", "op"),
      Seq("key"), "seq", "op")
    val feed = EventStreams.cdcChangesBetween(spark, dir, 0L, 2L, Seq("key"))
    val landed = Merge.applyChanges(
      EventStreams.cdcSnapshotAt(spark, dir, 0L), feed, Seq("key"),
      "seq", "op")
    assert(setEq(landed, EventStreams.cdcSnapshotAt(spark, dir, 2L)),
      "replaying the change feed does not land at the target version")
    val ops = feed.select("key", "op").as[(Long, String)].collect().toMap
    assert(ops === Map(1L -> "U", 3L -> "U", 4L -> "D", 6L -> "I"),
      s"feed ops wrong: $ops")
  }

  test("cdcChangesBetween: a mid-chain fromV folds the below-window deltas for the guard (no state-wide resolve) and still lands exactly") {
    val dir = Files.createTempDirectory("graft-sync-mid").toString + "/cdc"
    EventStreams.initCdcState(Seq((1L, "one", 10L), (2L, "two", 10L),
      (3L, "three", 10L)).toDF("key", "text", "seq"), dir)
    def pub(rows: Seq[(Long, String, Long, String)]): Long =
      EventStreams.publishCdcBatch(spark, dir,
        rows.toDF("key", "text", "seq", "op"), Seq("key"), "seq", "op",
        maxDeltas = Int.MaxValue, maxDeltaFraction = 1e18)
    // below the window: key1 advanced to seq 20, key2 DELETED, key4 born
    pub(Seq((1L, "one-b", 20L, "U"), (2L, "bye", 11L, "D")))
    pub(Seq((4L, "four", 1L, "I")))
    // the window (2, 4]: key1 gets a STALE change (seq 15 < 20 at v2 —
    // must drop); key2 gets a stale-SEQ change that APPLIES because the
    // delete tombstoned it at v1; key3 a plain fresh update; key4 a
    // delete of the chain-born key
    pub(Seq((1L, "one-stale", 15L, "U"), (2L, "two-back", 3L, "U")))
    pub(Seq((3L, "three-b", 11L, "U"), (4L, "gone", 2L, "D")))
    val feed = EventStreams.cdcChangesBetween(spark, dir, 2L, 4L, Seq("key"))
    val landed = Merge.applyChanges(
      EventStreams.cdcSnapshotAt(spark, dir, 2L), feed, Seq("key"),
      "seq", "op")
    assert(setEq(landed, EventStreams.cdcSnapshotAt(spark, dir, 4L)),
      "mid-chain feed does not land at the target version")
    val ops = feed.select("key", "op").as[(Long, String)].collect().toMap
    assert(ops === Map(2L -> "I", 3L -> "U", 4L -> "D"),
      s"feed ops wrong (stale key1 must be absent): $ops")
  }

  test("cdcChangesBetween: a checkpoint inside the window falls back to the snapshot diff and still lands exactly") {
    val dir = Files.createTempDirectory("graft-sync-ckpt").toString + "/cdc"
    EventStreams.initCdcState(
      Seq((1L, "one", 0L), (2L, "two", 0L)).toDF("key", "text", "seq"), dir)
    // maxDeltas=1: v1 delta, v2 checkpoint (folds its own batch), v3 delta
    def pub(rows: Seq[(Long, String, Long, String)]): Long =
      EventStreams.publishCdcBatch(spark, dir,
        rows.toDF("key", "text", "seq", "op"), Seq("key"), "seq", "op",
        maxDeltas = 1, maxDeltaFraction = 1e9)
    pub(Seq((1L, "one-b", 1L, "U")))
    pub(Seq((3L, "three", 1L, "I")))
    pub(Seq((2L, "gone", 1L, "D")))
    assert(EventStreams.isCdcDelta(dir, 1L) && !EventStreams.isCdcDelta(dir, 2L))
    val feed = EventStreams.cdcChangesBetween(spark, dir, 0L, 3L, Seq("key"))
    val landed = Merge.applyChanges(
      EventStreams.cdcSnapshotAt(spark, dir, 0L), feed, Seq("key"),
      "seq", "op")
    assert(setEq(landed, EventStreams.cdcSnapshotAt(spark, dir, 3L)))
  }

  test("crash replay self-heals: an orphan tick (admitted, unwatermarked) is masked by the retry's wider window") {
    val base = Files.createTempDirectory("graft-sync-crash").toString
    val (cdc, root) = (s"$base/cdc", s"$base/idx")
    EventStreams.initCdcState(corpus0, cdc)
    CdcSync.syncIndexFromCdc(spark, cdc, root, "doc_id", "tk", 7L, prep)
    EventStreams.publishCdcBatch(spark, cdc,
      corpus0.filter(col("doc_id") < 6)
        .select(col("doc_id"), lit("zulu omega").as("text"),
          lit(1L).as("seq"), lit("U").as("op")),
      Seq("doc_id"), "seq", "op")
    // simulate the crashed tick: admissions for v1 land, watermark does NOT
    val changes = EventStreams.cdcChangesBetween(spark, cdc, 0L, 1L,
      Seq("doc_id"))
    InvertedIndex.admitScopedDeleteBatch(spark, changes.select("doc_id"),
      "doc_id", batchId = 1L, root = root)
    InvertedIndex.admitBatch(spark,
      prep(changes.filter(col("op") =!= "D").drop("op")),
      "doc_id", "tk", 7L, batchId = 1L, root = root)
    // the CDC store moves on before the retry
    EventStreams.publishCdcBatch(spark, cdc,
      corpus0.filter(col("doc_id") === 3L)
        .select(col("doc_id"), lit("sigma sigma").as("text"),
          lit(2L).as("seq"), lit("U").as("op")),
      Seq("doc_id"), "seq", "op")
    // retry tick: window (0, 2] nests the orphan's (0, 1] — its scoped
    // delete at hwm=1 masks every copy the orphan admitted
    assert(CdcSync.syncIndexFromCdc(spark, cdc, root, "doc_id", "tk", 7L,
      prep) === 2L)
    val fresh = freshStoreFor(
      EventStreams.currentCdcSnapshot(spark, cdc), "crash-fresh")
    assert(surfaces(root) === surfaces(fresh),
      "orphaned tick leaked into serving after the retry")
  }

  test("a vacuumed watermark refuses the incremental tick (resync into a fresh root)") {
    val base = Files.createTempDirectory("graft-sync-vac").toString
    val (cdc, root) = (s"$base/cdc", s"$base/idx")
    EventStreams.initCdcState(corpus0, cdc)
    CdcSync.syncIndexFromCdc(spark, cdc, root, "doc_id", "tk", 7L, prep)
    (1 to 3).foreach { i =>
      EventStreams.publishCdcBatch(spark, cdc,
        corpus0.filter(col("doc_id") === i.toLong)
          .select(col("doc_id"), lit("zulu").as("text"),
            lit(i.toLong).as("seq"), lit("U").as("op")),
        Seq("doc_id"), "seq", "op", maxDeltas = 0)
    }
    EventStreams.vacuumCdc(spark, cdc, keepLast = 2)
    val e = intercept[IllegalArgumentException] {
      CdcSync.syncIndexFromCdc(spark, cdc, root, "doc_id", "tk", 7L, prep)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("federation fence: a source with pending SCOPED deletes refuses to merge; compactFirst cures it") {
    val base = Files.createTempDirectory("graft-sync-merge").toString
    val (a, b, m1, m2) = (s"$base/a", s"$base/b", s"$base/m1", s"$base/m2")
    Seq(a, b).zipWithIndex.foreach { case (r, i) =>
      InvertedIndex.initStore(r)
      InvertedIndex.admitBatch(spark,
        prep(corpus0.filter(col("doc_id") % 2 === i.toLong)),
        "doc_id", "tk", 7L, batchId = 0L, root = r)
    }
    // an upsert leaves a pending scoped delete under a
    InvertedIndex.admitReplaceBatch(spark,
      prep(corpus0.filter(col("doc_id") === 0L)
        .withColumn("text", lit("zulu beta"))),
      "doc_id", "tk", 7L, batchId = 1L, root = a)
    val e = intercept[IllegalStateException] {
      InvertedIndex.mergeStores(spark, Seq(a, b), m1)
    }
    assert(e.getMessage.contains("SCOPED"))
    assert(InvertedIndex.mergeStores(spark, Seq(a, b), m2,
      compactFirst = true) === 1L)
    val merged = InvertedIndex.lookupCurrent(spark, m2, Seq("zulu"))
      .select(explode(col("postings")).as("doc_id"))
    assert(merged.as[Long].collect().toSeq === Seq(0L),
      "the upserted doc's new version must be the one that merges")
  }

  test("vector sync: bootstrap fits once, a U/I/D tick serves exactly the mutated embedding set, compaction folds it") {
    val base = Files.createTempDirectory("graft-sync-vec").toString
    val (cdc, root, twin) = (s"$base/cdc", s"$base/vec", s"$base/twin")
    def emb(i: Long, bump: Double = 0.0): Seq[Double] =
      (0 until 8).map(j => ((i * 7 + j * 3) % 13).toDouble + 1.0)
        .updated(0, ((i * 7) % 13).toDouble + 1.0 + bump)
    val v0 = (0L until 30L).map(i => (i, emb(i), 0L))
      .toDF("doc_id", "emb", "seq")
    EventStreams.initCdcState(v0, cdc)
    val vprep: DataFrame => DataFrame = _.select(col("doc_id"), col("emb"))
    assert(CdcSync.syncVectorsFromCdc(spark, cdc, root, "doc_id", "emb",
      vprep, nlist = 4, kmeansIters = 4, m = 4, kcode = 4, pqIters = 4) === 0L)
    // v1: updates re-embed (big shift), inserts, deletes — one batch
    val changes =
      (0L until 30L by 5L).map(i => (i, emb(i, 10.0), 1L, "U")) ++
      (100L until 104L).map(i => (i, emb(i), 1L, "I")) ++
      (3L until 30L by 5L).map(i => (i, emb(i), 1L, "D"))
    EventStreams.publishCdcBatch(spark, cdc,
      changes.toDF("doc_id", "emb", "seq", "op"), Seq("doc_id"), "seq", "op")
    assert(CdcSync.syncVectorsFromCdc(spark, cdc, root, "doc_id", "emb",
      vprep, nlist = 4, kmeansIters = 4, m = 4, kcode = 4, pqIters = 4) === 1L)
    // exact-extraction gate: the synced store's recoverable vectors ==
    // a twin store (same artifact) admitted the mutated corpus once
    val gen = graft.operators.VectorStore.currentGen(root)
    val (cents, books) = graft.operators.VectorStore.loadGenIndex(spark, root, gen)
    graft.operators.VectorStore.init(spark, twin, cents, books)
    graft.operators.VectorStore.admit(spark, twin,
      vprep(EventStreams.currentCdcSnapshot(spark, cdc)), "doc_id", "emb",
      batchId = 0L)
    def vecs(r: String) = graft.operators.VectorStore
      .vectors(spark, r, "doc_id", "emb")
    assert(setEq(vecs(root), vecs(twin)),
      "synced vector store diverges from the mutated corpus")
    // compaction folds the upsert history physically
    graft.operators.VectorStore.compactGen(spark, root, gen)
    assert(setEq(vecs(root), vecs(twin)), "post-compaction divergence")
    val g2 = graft.operators.VectorStore.currentGen(root)
    assert(!Files.exists(Paths.get(s"$root/gen=$g2/deletes")),
      "compaction left pending deletes")
  }

  test("vector sync ticks survive a mid-life refit: batch ids and scoped masks stay valid across the generation roll") {
    val base = Files.createTempDirectory("graft-sync-refit").toString
    val (cdc, root, twin) = (s"$base/cdc", s"$base/vec", s"$base/twin")
    def emb(i: Long): Seq[Double] =
      (0 until 8).map(j => ((i * 7 + j * 3) % 13).toDouble + 1.0)
    EventStreams.initCdcState(
      (0L until 30L).map(i => (i, emb(i), 0L)).toDF("doc_id", "emb", "seq"),
      cdc)
    val vprep: DataFrame => DataFrame = _.select(col("doc_id"), col("emb"))
    def tick() = CdcSync.syncVectorsFromCdc(spark, cdc, root, "doc_id",
      "emb", vprep, nlist = 4, kmeansIters = 4, m = 4, kcode = 4,
      pqIters = 4)
    tick()
    // tick 1: re-embed a third of the corpus (scoped delete pending)
    EventStreams.publishCdcBatch(spark, cdc,
      (0L until 30L by 3L).map(i => (i, emb(i).reverse, 1L, "U"))
        .toDF("doc_id", "emb", "seq", "op"), Seq("doc_id"), "seq", "op")
    tick()
    // a refit rolls the generation MID-LIFE: migration re-encodes every
    // batch under its OWN id and carries the pending scoped delete —
    // both id spaces survive, so the mask stays valid in gen 2
    val g2 = graft.operators.VectorStore.refit(spark, root,
      expectedGen = graft.operators.VectorStore.currentGen(root),
      nlist = 4, kmeansIters = 4, m = 4, kcode = 4, pqIters = 4)
    assert(g2 === 2L)
    // tick 2 continues against the refit generation
    EventStreams.publishCdcBatch(spark, cdc,
      ((30L until 34L).map(i => (i, emb(i), 1L, "I")) ++
        Seq((1L, emb(1L), 1L, "D"))).toDF("doc_id", "emb", "seq", "op"),
      Seq("doc_id"), "seq", "op")
    tick()
    val gen = graft.operators.VectorStore.currentGen(root)
    val (cents, books) =
      graft.operators.VectorStore.loadGenIndex(spark, root, gen)
    graft.operators.VectorStore.init(spark, twin, cents, books)
    graft.operators.VectorStore.admit(spark, twin,
      vprep(EventStreams.currentCdcSnapshot(spark, cdc)), "doc_id", "emb",
      batchId = 0L)
    def vecs(r: String) = graft.operators.VectorStore
      .vectors(spark, r, "doc_id", "emb")
    assert(setEq(vecs(root), vecs(twin)),
      "sync across a refit diverges from the mutated corpus")
  }

  test("rebind: a freshly merged store continues ticking above its sealed id spaces; a bound store refuses") {
    val base = Files.createTempDirectory("graft-sync-rebind").toString
    val (cdcA, cdcB, idxA, idxB) =
      (s"$base/cdcA", s"$base/cdcB", s"$base/idxA", s"$base/idxB")
    val (mcdc, midx) = (s"$base/mcdc", s"$base/midx")
    EventStreams.initCdcState(
      corpus0.filter(col("doc_id") % 2 === 0), cdcA)
    EventStreams.initCdcState(
      corpus0.filter(col("doc_id") % 2 === 1), cdcB)
    def tick(cdc: String, root: String) =
      CdcSync.syncIndexFromCdc(spark, cdc, root, "doc_id", "tk", 7L, prep)
    tick(cdcA, idxA); tick(cdcB, idxB)
    // A takes an upsert tick (pending scoped delete at merge time)
    EventStreams.publishCdcBatch(spark, cdcA,
      corpus0.filter(col("doc_id") === 0L)
        .select(col("doc_id"), lit("zulu zulu").as("text"),
          lit(1L).as("seq"), lit("U").as("op")),
      Seq("doc_id"), "seq", "op")
    tick(cdcA, idxA)
    EventStreams.checkpointCdc(spark, cdcA)
    EventStreams.checkpointCdc(spark, cdcB)
    EventStreams.mergeCdcStores(spark, Seq(cdcA, cdcB), mcdc,
      verifyKeyCols = Seq("doc_id"))
    InvertedIndex.mergeStores(spark, Seq(idxA, idxB), midx,
      compactFirst = true)
    CdcSync.rebind(mcdc, midx, 0L)
    // a bound store refuses a second rebind
    val e = intercept[IllegalArgumentException] {
      CdcSync.rebind(mcdc, midx, 0L)
    }
    assert(e.getMessage.contains("already bound"))
    // post-merge ticks admit above the sealed spaces and serve right
    EventStreams.publishCdcBatch(spark, mcdc,
      corpus0.filter(col("doc_id") === 1L)
        .select(col("doc_id"), lit("zulu omega").as("text"),
          lit(1L).as("seq"), lit("U").as("op")),
      Seq("doc_id"), "seq", "op")
    assert(tick(mcdc, midx) === 1L)
    val fresh = freshStoreFor(
      EventStreams.currentCdcSnapshot(spark, mcdc), "rebind-fresh")
    assert(surfaces(midx) === surfaces(fresh),
      "rebind-continued store diverges from a fresh build")
  }

  test("streaming sink: publish+sync+maintain per micro-batch, restart-stable across a stop/start") {
    val base = Files.createTempDirectory("graft-sync-stream").toString
    val (cdc, root, feed) = (s"$base/cdc", s"$base/idx", s"$base/feed")
    EventStreams.initCdcState(corpus0, cdc)
    val b1 = corpus0.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" zulu")).as("text"),
        lit(1L).as("seq"), lit("U").as("op"))
    val b2 = corpus0.filter(col("doc_id") % 4 === 1)
      .select(col("doc_id"), col("text"), lit(1L).as("seq"),
        lit("D").as("op"))
    def start() = CdcSync.cdcIngestSyncing(
      spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1)
        .parquet(feed),
      cdc, root, "doc_id", "tk", 7L, prep, s"$base/_cp",
      maxFragments = 2, maxPendingFraction = 0.01)
    b1.coalesce(1).write.mode("append").parquet(feed)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // the stream stops; more changes land; a NEW query resumes from the
    // same checkpoint — the watermark-last tick discipline must make
    // the restart seamless (no duplicates, no gaps)
    b2.coalesce(1).write.mode("append").parquet(feed)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(CdcSync.appliedState(root).exists(_._1 ==
      EventStreams.currentCdcVersion(cdc)), "watermark not at current")
    val fresh = freshStoreFor(
      EventStreams.currentCdcSnapshot(spark, cdc), "stream-fresh")
    assert(surfaces(root) === surfaces(fresh),
      "restarted streaming sync diverges from a fresh build")
    assert(InvertedIndex.currentGen(root) > 1L,
      "in-stream maintenance never fired")
  }

  test("a scoped delete straggling into a compaction window is refused, never mis-carried") {
    val root = Files.createTempDirectory("graft-sync-strag").toString + "/idx"
    InvertedIndex.initStore(root)
    InvertedIndex.admitBatch(spark, prep(corpus0), "doc_id", "tk", 7L,
      batchId = 0L, root = root)
    val e = intercept[IllegalStateException] {
      InvertedIndex.compactStoreHooked(spark, root, 1L, () =>
        InvertedIndex.admitDeleteBatchAt(spark, Seq(2L).toDF("doc_id"),
          "doc_id", batchId = 1L, root = root, gen = 1L, hwm = 0L))
    }
    assert(e.getMessage.contains("scoped"))
  }
}
