package graft.operators

import org.apache.spark.sql.SparkSession

/** The shared generational-store primitives of the admission-store
  * family: an atomic `_CURRENT` generation pointer, per-generation
  * directories, batch-fragment listing, and the `_COMPACTED`
  * high-water seal. [[InvertedIndex]] (postings/doclens/stats) and
  * [[SketchStore]] (per-key HLL rows) compact through this;
  * [[VectorStore]] predates it with the same discipline (its
  * generations also hold an index artifact, so its pointer logic stays
  * local).
  *
  * Layout under one root:
  * {{{
  *   root/_CURRENT            # current generation number (text)
  *   root/gen=G/...           # one generation's store (layout is the
  *                            #   owner's; fragments are batch_id=N)
  *   root/gen=G/_COMPACTED    # max batch id sealed by the compaction
  *                            #   that produced this generation
  * }}}
  *
  * Pointer discipline: tmp-write + ATOMIC_MOVE — readers see the old
  * generation or the new one, never a torn pointer. A generation
  * directory above the pointer is unpublished work (crashed or
  * in-flight compaction) that no reader may observe.
  */
object GenStore {

  private def pointerPath(root: String) =
    java.nio.file.Paths.get(root, "_CURRENT")

  def writePointer(root: String, gen: Long): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val tmp = java.nio.file.Paths.get(root, "_CURRENT.tmp")
    java.nio.file.Files.write(tmp, gen.toString.getBytes)
    java.nio.file.Files.move(tmp, pointerPath(root),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Create the store (generation 1, empty). Idempotent. */
  def init(root: String): Unit = writePointer(root, 1L)

  /** Cold-start init: create generation 1 only if no pointer exists —
    * the restart-safe form (a plain [[init]] would resurrect a
    * compacted-away generation for readers).
    */
  def initIfAbsent(root: String): Unit =
    if (!java.nio.file.Files.exists(pointerPath(root))) init(root)

  /** The generation readers currently see. */
  def currentGen(root: String): Long =
    new String(java.nio.file.Files.readAllBytes(pointerPath(root))).trim.toLong

  /** One generation's directory. */
  def genDir(root: String, gen: Long): String = s"$root/gen=$gen"

  /** Batch ids of the fragments under `dir`, ascending. */
  def listBatchIds(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong).sorted
  }

  /** The compacted high-water mark of a generation: the max source
    * batch id its producing compaction sealed, or -1 for a
    * never-compacted generation (every admitted id is above it).
    * Batch ids at or below the seal are INSIDE the compacted fragment
    * — replaying them must be refused (the LSM rule: merged segments
    * seal their WAL).
    */
  def compactedHwm(root: String, gen: Long): Long = {
    val m = java.nio.file.Paths.get(genDir(root, gen), "_COMPACTED")
    if (!java.nio.file.Files.exists(m)) -1L
    else new String(java.nio.file.Files.readAllBytes(m)).trim.toLong
  }

  /** Seal a generation's compaction barrier. Written BEFORE the
    * pointer moves, so a reader that sees the generation also sees its
    * retry fence.
    */
  def seal(root: String, gen: Long, hwm: Long): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get(genDir(root, gen), "_COMPACTED"),
      hwm.toString.getBytes)

  /** FEDERATION MERGE for FLAT-fragment stores (fragments directly
    * under the generation directory; an optional `deletes/` table
    * beside them) — the shared machinery behind [[KeySetStore
    * .mergeStores]] and the mergeable-family wrappers (sketch /
    * frequency / quantile, whose reads union fragments by algebra, so
    * a merge IS just the fragments side by side): copy each source's
    * current-generation fragments under fresh sequential ids (one
    * narrow read→write per fragment, no shuffle), carry delete
    * fragments, seal the occupied ids. Caller contract: compatible
    * fragment schemas (same key columns / sketch parameters — the
    * algebra's own merge precondition) and a fresh `dstRoot`.
    */
  private[graft] def mergeFlatStores(spark: SparkSession,
      srcRoots: Seq[String], dstRoot: String): Long = {
    require(srcRoots.size >= 2, "mergeStores needs at least two sources")
    initIfAbsent(dstRoot)
    require(currentGen(dstRoot) == 1L &&
      listBatchIds(spark, genDir(dstRoot, 1L)).isEmpty,
      s"merge target $dstRoot must be a fresh store root")
    val dst = genDir(dstRoot, 1L)
    var next = 0L
    var delNext = 0L
    srcRoots.foreach { src =>
      val sdir = genDir(src, currentGen(src))
      listBatchIds(spark, sdir).foreach { i =>
        spark.read.parquet(s"$sdir/batch_id=$i")
          .write.mode("overwrite").parquet(s"$dst/batch_id=$next")
        next += 1
      }
      listBatchIds(spark, s"$sdir/deletes").foreach { i =>
        spark.read.parquet(s"$sdir/deletes/batch_id=$i")
          .write.mode("overwrite").parquet(s"$dst/deletes/batch_id=$delNext")
        delNext += 1
      }
    }
    seal(dstRoot, 1L, next - 1)
    1L
  }

  /** Published generations still on disk, ascending (tombstoned
    * `.deleted` directories and unpublished generations excluded).
    */
  def listGenerations(root: String): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val cur = currentGen(root)
    scala.util.Using.resource(
        java.nio.file.Files.list(java.nio.file.Paths.get(root))) { st =>
      st.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.matches("gen=\\d+") => s.drop(4).toLong }
        .filter(_ <= cur).toSeq.sorted
    }
  }

  /** Retention for superseded generations: tombstone-renamed before
    * deletion ([[graft.streaming.EventStreams.tombstoneDelete]]), so a
    * crash mid-vacuum or a racing reader can never observe a partial
    * generation that still resolves. Returns the dropped generations.
    */
  def vacuum(root: String, keepLast: Int): Seq[Long] =
    vacuumExcept(root, keepLast, Set.empty)

  /** [[vacuum]] with an exclusion set: generations in `keep` survive
    * even when older than the retention window — the enforcement hook
    * for cross-store pins ([[Manifest.vacuumStore]] passes the
    * generations that retained manifest versions still pin, turning
    * [[Manifest.retainedPins]] from an advisory audit into an invariant
    * the vacuum cannot violate).
    */
  def vacuumExcept(root: String, keepLast: Int,
      keep: Set[Long]): Seq[Long] = {
    require(keepLast >= 1, "keepLast must retain at least the current generation")
    graft.streaming.EventStreams.sweepTombstones(java.nio.file.Paths.get(root))
    val drop = listGenerations(root).dropRight(keepLast).filterNot(keep)
    drop.foreach(g => graft.streaming.EventStreams.tombstoneDelete(
      java.nio.file.Paths.get(genDir(root, g))))
    drop
  }

  /** Assemble one maintenance-status row — the shared shape of the
    * family's `maintenanceStatus` dashboards (store-specific only in
    * how data/pending cardinalities are counted).
    */
  private[graft] def statusRow(spark: SparkSession, gen: Long,
      fragments: Long, dataRows: Long, pendingRows: Long,
      needs: Boolean): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq((gen, fragments, dataRows, pendingRows,
      if (dataRows == 0) (if (pendingRows > 0) 1.0 else 0.0)
      else pendingRows.toDouble / dataRows,
      needs))
      .toDF("generation", "fragments", "data_rows", "pending_rows",
        "pending_fraction", "needs_compaction")
  }

  /** Total row count under `dirs`, read from parquet FOOTERS only —
    * no Spark job, no data pages, just one footer read per file. This
    * is the cost model the `needsCompaction` policy predicates are
    * held to: deciding WHETHER to compact must stay a metadata read a
    * maintenance loop can afford every batch, or nobody runs it and
    * pending-delete windows grow unbounded. Missing directories count
    * zero (the common no-deletes case costs one existence check).
    */
  def footerRowCount(spark: SparkSession, dirs: Seq[String]): Long = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val conf = spark.sessionState.newHadoopConf()
    val all = dirs.flatMap { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Nil
      else {
        def files(path: org.apache.hadoop.fs.Path):
            Seq[org.apache.hadoop.fs.FileStatus] = {
          val ls = fs.listStatus(path).toSeq
          ls.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")) ++
            ls.filter(_.isDirectory).flatMap(s => files(s.getPath))
        }
        files(p)
      }
    }
    // footer reads are independent metadata fetches — run them on the
    // driver's thread pool (no Spark job, no executor involvement, no
    // scheduler latency): a store's file count is bounded by the
    // compaction policy itself, so this is dozens of footers, not
    // thousands
    Await.result(Future.sequence(all.map(s => Future {
      scala.util.Using.resource(
          org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile
              .fromStatus(s, conf))) { r =>
        r.getRecordCount
      }
    })), Duration.Inf).sum
  }
}
