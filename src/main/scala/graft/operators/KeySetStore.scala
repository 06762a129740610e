package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generational DISTINCT-KEY-SET store — the [[GenStore]] discipline
  * (q143 postings / q148 sketches / q149 frequencies / q150 coded
  * vectors) for the dedup admission family, whose persisted state is a
  * set of keys: the span-dedup gram store (distinct gram hashes,
  * [[Dedup.appendGramStore]]) and the MinHash signature store (distinct
  * (band, bucket) rows, [[Dedup.appendMinHashStore]]). Schema-generic:
  * a fragment holds whatever key columns the owner admits.
  *
  * Why compaction matters MORE here than for the other stores: the
  * state is a set, so fragments across crawl batches overlap — an exact
  * reclone admitted in every batch writes its keys every time. The
  * per-batch fragments are each internally distinct but not mutually,
  * so compaction (union all fragments, distinct ONCE, one sealed
  * fragment) is genuine data reduction, not just file-count reduction —
  * and every post-compaction semi-join probes a smaller store. Reads
  * stay correct against any fragmentation because a LEFT-SEMI join is
  * multiset-insensitive: duplicate keys across fragments change
  * nothing, which is also why the compacted store serves BIT-IDENTICAL
  * admission decisions (the gate q151 states).
  *
  * Lifecycle contract (shared with the family): CAS compaction on
  * `expectedGen` (retry no-ops), `_COMPACTED` seal refuses replays of
  * merged batch ids (a per-batch overwrite would silently drop every
  * OTHER batch's keys that were merged into the fragment), post-write
  * pointer re-check fences an admit racing a compaction, straggler
  * sweep re-lists around the pointer move.
  */
object KeySetStore {

  /** Create the generational store if no pointer exists. Idempotent
    * and restart-safe ([[GenStore.initIfAbsent]]): a no-op on an
    * advanced store, never a pointer rewind.
    */
  def init(root: String): Unit = GenStore.initIfAbsent(root)

  /** Fragments of the current generation. */
  def fragmentCount(spark: SparkSession, root: String): Long =
    GenStore.listBatchIds(spark,
      GenStore.genDir(root, GenStore.currentGen(root))).size.toLong

  /** Admit one batch's key rows (made distinct here) under the CURRENT
    * generation, with the family's sealed-id and pointer-recheck fences
    * plus the post-write quiesce re-check
    * ([[GenStore.requireStillNotQuiesced]] — an admission completing
    * inside a live merge's copy-to-seal gap must fail loudly, never be
    * silently absent from the merged store). Idempotent per batch id
    * (mode overwrite).
    */
  def admitBatch(keys: DataFrame, batchId: Long, root: String): Unit =
    admitBatchHooked(keys, batchId, root, () => ())

  /** [[admitBatch]] with a hook between the write and the post-write
    * fences — the quiesce-TOCTOU race-test seam: a quiesce landing
    * inside the hook (i.e. while the write was in flight) must make
    * THIS admission throw, so its caller re-admits at the successor.
    */
  private[graft] def admitBatchHooked(keys: DataFrame, batchId: Long,
      root: String, midHook: () => Unit): Unit = {
    GenStore.requireNotQuiesced(root)
    val gen = GenStore.currentGen(root)
    val hwm = GenStore.compactedHwm(root, gen)
    require(batchId > hwm,
      s"batch_id=$batchId is at or below gen=$gen's compacted high-water " +
        s"mark $hwm: compaction sealed it; replays of compacted batches are " +
        "refused (a per-batch overwrite would drop the other merged batches' keys)")
    keys.distinct().write.mode("overwrite")
      .parquet(s"${GenStore.genDir(root, gen)}/batch_id=$batchId")
    midHook()
    GenStore.requireStillNotQuiesced(root, s"admit of batch_id=$batchId")
    val now = GenStore.currentGen(root)
    if (now != gen) throw new IllegalStateException(
      s"admit of batch_id=$batchId raced a compaction: wrote under gen=$gen " +
        s"but _CURRENT is now gen=$now — re-admit under the current generation")
  }

  // ---------------------------------------------------------------------
  // DELETION/TAKEDOWN — the q161 LSM delete-marker discipline
  // (InvertedIndex / VectorStore), restated for a store WITHOUT row
  // attribution: fragments hold bare keys, so a delete is a KEY-SET
  // subtraction, not a per-document purge. Taking down a document means
  // deleting the keys DERIVED FROM IT ([[Dedup.deleteMinHashBatch]]);
  // if a surviving near-clone contributed the same (band, bucket), that
  // shared key is forgotten too — the surviving doc stays in the
  // corpus, but future dedup against it through those bands weakens.
  // That trade is inherent to set-state (the alternative, attributing
  // every key to its admitting doc ids, forfeits the cross-batch
  // distinct that makes this store KB-sized at 100 TB) and is exactly
  // what takedown needs: a RE-CRAWL of removed content must be
  // re-admittable, which ghost signatures would block forever.
  // Contract: reads equal a store rebuilt from (admitted keys) EXCEPT
  // (deleted keys); the next compaction applies the subtraction
  // physically and the new generation carries no pending set.
  // ---------------------------------------------------------------------

  /** Admit one batch of keys to DELETE under the current generation's
    * `deletes/batch_id=N` (same schema as the data fragments). Replays
    * are semantic no-ops whether or not a compaction already applied
    * them — subtracting an absent key removes nothing — so there is no
    * compaction seal on delete ids, only the family's pointer re-check
    * plus the merge-renumbered-id fence ([[GenStore.deletesHwm]]).
    */
  def admitDeleteBatch(keys: DataFrame, batchId: Long, root: String): Unit = {
    GenStore.requireNotQuiesced(root)
    val gen = GenStore.currentGen(root)
    val dhwm = GenStore.deletesHwm(root, gen)
    require(batchId > dhwm,
      s"delete batch_id=$batchId is at or below gen=$gen's delete-id " +
        s"high-water mark $dhwm: a federation merge renumbered carried " +
        "delete fragments into that id space — admitting under one of " +
        "those ids would clobber a pending takedown; use a fresh id above " +
        "the mark")
    keys.distinct().write.mode("overwrite")
      .parquet(s"${GenStore.genDir(root, gen)}/deletes/batch_id=$batchId")
    GenStore.requireStillNotQuiesced(root, s"delete batch_id=$batchId")
    val now = GenStore.currentGen(root)
    if (now != gen) throw new IllegalStateException(
      s"delete batch_id=$batchId raced a compaction: wrote under gen=$gen " +
        s"but _CURRENT is now gen=$now — re-admit under the current generation")
  }

  /** Pending delete keys of one generation directory, or None when no
    * deletes were ever admitted (the zero-cost common case — read plans
    * are untouched).
    */
  private def pendingDeletes(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/deletes")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    // BROADCAST by construction — O(dead docs' keys); the distinct
    // defeats size estimation and an unhinted anti-join would reshuffle
    // the whole key-set scan (see InvertedIndex.pendingDeletes). The
    // needsCompaction policy keeps the set fraction-bounded.
    else Some(broadcast(
      spark.read.parquet(s"$dir/deletes").drop("batch_id").distinct()))
  }

  /** The key set through the pointer — every key column of every
    * fragment of the current generation. A multiset until compacted;
    * callers semi-join against it, so overlap across fragments is
    * harmless. Pending deletes are subtracted by ONE anti-join on the
    * key columns (index-sized rows, never a corpus); with none pending
    * the plan is the bare fragment scan.
    */
  def keysCurrent(spark: SparkSession, root: String): DataFrame =
    keysAt(spark, root, GenStore.currentGen(root))

  /** [[keysCurrent]] at a PINNED generation (manifest reads, q152/q168):
    * generations are immutable, so the same pin always serves the same
    * key set — including its own pending deletes, which belong to the
    * generation that admitted them.
    */
  def keysAt(spark: SparkSession, root: String, gen: Long): DataFrame = {
    val dir = GenStore.genDir(root, gen)
    val ids = GenStore.listBatchIds(spark, dir)
    require(ids.nonEmpty, s"no fragments under $dir")
    keysOf(spark, dir, ids)
  }

  private def keysOf(spark: SparkSession, dir: String,
      ids: Seq[Long]): DataFrame = {
    val df = spark.read.parquet(ids.map(i => s"$dir/batch_id=$i"): _*)
    pendingDeletes(spark, dir) match {
      case None => df
      case Some(del) => df.join(del, df.columns.toSeq, "left_anti")
    }
  }

  /** [[keysCurrent]] MINUS one fragment — the checkpoint-replay probe
    * (streaming curation, [[graft.streaming.EventStreams
    * .curationIngestCompacting]]): a replayed micro-batch must decide
    * admission against everything admitted BEFORE it, never against the
    * keys its own crashed first attempt already landed under
    * `batch_id=excludeBatchId` (probing those would reject every doc as
    * its own clone and overwrite the fragment with an empty set). None
    * when no OTHER fragments exist — the caller admits everything, the
    * same answer an empty store gives. Fragments the replayed id was
    * compacted into are unreachable here by construction: the sealed
    * high-water mark refuses such replays before any probe runs.
    */
  def keysCurrentExcluding(spark: SparkSession, root: String,
      excludeBatchId: Long): Option[DataFrame] = {
    val dir = GenStore.genDir(root, GenStore.currentGen(root))
    val ids = GenStore.listBatchIds(spark, dir).filterNot(_ == excludeBatchId)
    if (ids.isEmpty) None else Some(keysOf(spark, dir, ids))
  }

  /** COMPACT the current generation: union every fragment, distinct
    * ONCE, subtract the pending delete set, one sealed `batch_id=<hwm>`
    * fragment under `gen=G+1` behind the atomic pointer — the new
    * generation holds no trace of the deleted keys and no pending set,
    * bit-identical to a store rebuilt from the surviving keys. CAS on
    * `expectedGen`; straggler sweep as the family
    * ([[VectorStore.compactGen]]), covering DELETE fragments too (a
    * delete admitted after the listing rides through pending).
    */
  def compactStore(spark: SparkSession, root: String,
      expectedGen: Long): Long =
    compactStoreHooked(spark, root, expectedGen, () => ())

  /** FEDERATION MERGE for the dedup memory — K crawl partitions build
    * signature stores independently, then merge into one memory
    * ([[InvertedIndex.mergeStores]]'s pattern): data fragments copy
    * under fresh sequential ids, pending delete fragments ride along,
    * occupied ids seal. Key multisets union — exactly what the
    * LEFT-SEMI probe semantics want (overlap across builders is
    * harmless, the next compaction distincts it away). Caller
    * contract: same key schema across sources; fresh `dstRoot`.
    *
    * `compactFirst` folds each source before the copy (the
    * compact-before-quiesce economics, [[InvertedIndex.mergeStores]]) —
    * for THIS family the fold also DISTINCTs each source's key multiset
    * and applies its pending deletes, so the copy moves near-minimal
    * bytes. Legal on quiesced sources (the fence guards admission
    * fronts only).
    */
  def mergeStores(spark: SparkSession, srcRoots: Seq[String],
      dstRoot: String, compactFirst: Boolean = false): Long = {
    if (compactFirst) srcRoots.foreach { src =>
      val g = GenStore.currentGen(src)
      val sdir = GenStore.genDir(src, g)
      if (GenStore.listBatchIds(spark, sdir).size > 1 ||
        GenStore.listBatchIds(spark, s"$sdir/deletes").nonEmpty)
        compactStore(spark, src, g)
    }
    GenStore.mergeFlatStores(spark, srcRoots, dstRoot)
  }

  /** AGE-OUT RETENTION for the dedup memory — forget signatures older
    * than the watermark so stale content can re-enter the corpus (the
    * re-crawl policy: a page deduped against a 2-year-old snapshot of
    * itself should be admitted when it returns changed). Compacts the
    * current generation keeping ONLY fragments with `batch_id >=
    * minRetainedBatch`; expired ids stay sealed (replays refused),
    * re-ingestion is a new admission. Same fragment-granularity
    * contract as [[InvertedIndex.expireBatches]]: a merged fragment
    * expires with its NEWEST input — compact within retention windows
    * or expire before compacting.
    */
  def expireBatches(spark: SparkSession, root: String, expectedGen: Long,
      minRetainedBatch: Long): Long =
    compactStoreHooked(spark, root, expectedGen, () => (),
      _ >= minRetainedBatch)

  /** [[compactStore]] with a hook run between the fragment/delete
    * listing and the merge — the family's race-test seam: work
    * admitted inside the window must ride through the sweep (data
    * fragments unmerged, delete fragments still pending), never vanish.
    */
  private[graft] def compactStoreHooked(spark: SparkSession, root: String,
      expectedGen: Long, midHook: () => Unit,
      retain: Long => Boolean = _ => true): Long = {
    val cur = GenStore.currentGen(root)
    if (cur != expectedGen) return cur
    val ng = cur + 1
    val src = GenStore.genDir(root, cur)
    val dst = GenStore.genDir(root, ng)
    val allIds = GenStore.listBatchIds(spark, src)
    require(allIds.nonEmpty, s"nothing to compact under $src")
    val ids = allIds.filter(retain)
    require(ids.nonEmpty,
      "retention would empty the store — at least one fragment must " +
        "survive; to drop everything, initialize a fresh root instead")
    // seal at the FULL listing's hwm: expired ids must refuse replay
    val hwm = allIds.max
    val delIds = GenStore.listBatchIds(spark, s"$src/deletes")
    midHook()
    // merge the LISTED fragments explicitly (parquet listing is lazy):
    // a directory-wide read could fold a straggler admitted after the
    // listing into the merge and the sweep both — harmless HERE (the
    // key set is distinct, reads are semi-joins), but the family keeps
    // one discipline so the lossy stores can't inherit the wrong shape
    val merged = spark.read.parquet(ids.map(i => s"$src/batch_id=$i"): _*).distinct()
    val survivors =
      if (delIds.isEmpty) merged
      else merged.join(
        broadcast( // O(dead docs' keys) — see pendingDeletes
          spark.read.parquet(delIds.map(i => s"$src/deletes/batch_id=$i"): _*)
            .distinct()),
        merged.columns.toSeq, "left_anti")
    survivors.write.mode("overwrite").parquet(s"$dst/batch_id=$hwm")
    // the LISTED delete set, re-applied to swept data stragglers below:
    // a delete fragment captured in delIds can target keys of a data
    // batch admitted AFTER the fragment listing (delete lands, listing
    // runs, data batch admits inside the window) — the merge applied it
    // only to the listed fragments, and it is NOT carried pending (the
    // new generation must not re-subtract it from genuinely-later
    // re-admissions), so the swept copy must subtract it here or the
    // takedown silently vanishes. This matches read semantics exactly:
    // pre-compaction, [[keysAt]] applied the pending set to EVERY
    // fragment of the generation, stragglers included.
    lazy val listedDel: Option[DataFrame] =
      if (delIds.isEmpty) None
      else Some(spark.read
        .parquet(delIds.map(i => s"$src/deletes/batch_id=$i"): _*).distinct())
    def sweep(): Unit = {
      // subtract the FULL listing (an expired fragment is not a
      // straggler) and retain-filter what remains
      (GenStore.listBatchIds(spark, src).toSet -- allIds)
        .filter(retain).toSeq.sorted.foreach { i =>
        val raw = spark.read.parquet(s"$src/batch_id=$i")
        listedDel.map(d =>
            raw.join(broadcast(d), raw.columns.toSeq, "left_anti"))
          .getOrElse(raw)
          .write.mode("overwrite").parquet(s"$dst/batch_id=$i")
      }
      (GenStore.listBatchIds(spark, s"$src/deletes").toSet -- delIds).toSeq.sorted
        .foreach { i =>
          spark.read.parquet(s"$src/deletes/batch_id=$i")
            .write.mode("overwrite").parquet(s"$dst/deletes/batch_id=$i")
        }
    }
    sweep()
    GenStore.seal(root, ng, hwm)
    GenStore.writePointer(root, ng)
    sweep()
    ng
  }

  /** The continuous-compaction policy ([[InvertedIndex
    * .compactIfFragmented]]'s shape): compact once `maxFragments`
    * accumulate. Returns the new generation when it fired.
    */
  def compactIfFragmented(spark: SparkSession, root: String,
      maxFragments: Int): Option[Long] = {
    require(maxFragments >= 2, "maxFragments < 2 would compact every batch")
    if (fragmentCount(spark, root) < maxFragments) None
    else Some(compactStore(spark, root, GenStore.currentGen(root)))
  }

  /** Retention for superseded generations ([[GenStore.vacuum]]). */
  def vacuum(root: String, keepLast: Int): Seq[Long] =
    GenStore.vacuum(root, keepLast)

  /** The COMPACTION-POLICY predicate — [[VectorStore.needsRefit]]'s
    * twin for layout, closing the loop [[compactIfFragmented]] only
    * half-closed: true when the fragment count reached `maxFragments`
    * (read amplification) OR the pending-delete rows grew past
    * `maxPendingFraction` of the data rows (every read pays that
    * anti-join until a compaction folds it away — the takedown serving
    * window, bounded by CONTRACT once this predicate drives the
    * maintenance loop instead of operator diligence). Footer-metadata
    * reads only ([[GenStore.footerRowCount]]): no Spark job, so a
    * maintenance tick can evaluate it every batch. A store with
    * pending deletes but no data rows compacts (the fraction is
    * +infinity there).
    */
  def needsCompaction(spark: SparkSession, root: String,
      maxFragments: Int = 16, maxPendingFraction: Double = 0.05): Boolean = {
    require(maxFragments >= 2, "maxFragments < 2 would compact every batch")
    require(maxPendingFraction > 0, "maxPendingFraction must be positive")
    val gen = GenStore.currentGen(root)
    val dir = GenStore.genDir(root, gen)
    val ids = GenStore.listBatchIds(spark, dir)
    if (ids.isEmpty) false // nothing to compact (deletes alone can wait)
    else if (ids.size >= maxFragments) true
    else {
      val pending = GenStore.footerRowCount(spark, Seq(s"$dir/deletes"))
      pending > 0 && {
        val data = GenStore.footerRowCount(spark,
          ids.map(i => s"$dir/batch_id=$i"))
        pending.toDouble >= maxPendingFraction * data
      }
    }
  }

  /** Run [[compactStore]] when [[needsCompaction]] says so — the
    * maintenance-loop form that subsumes [[compactIfFragmented]] (same
    * fragment-count leg) and additionally bounds the pending-delete
    * window. Returns the new generation when it fired.
    */
  def compactIfNeeded(spark: SparkSession, root: String,
      maxFragments: Int = 16, maxPendingFraction: Double = 0.05):
      Option[Long] =
    if (!needsCompaction(spark, root, maxFragments, maxPendingFraction)) None
    else Some(compactStore(spark, root, GenStore.currentGen(root)))

  /** The operational dashboard row the maintenance loop reads: one row
    * of (generation, fragments, data_rows, pending_rows,
    * pending_fraction, needs_compaction) for the current generation —
    * the exact inputs [[needsCompaction]] evaluates, exposed so a
    * scheduler (or a human) can see WHY a tick will or won't fire.
    * Same footer-count cost model; no Spark job behind the frame.
    */
  def maintenanceStatus(spark: SparkSession, root: String,
      maxFragments: Int = 16, maxPendingFraction: Double = 0.05): DataFrame = {
    val gen = GenStore.currentGen(root)
    val dir = GenStore.genDir(root, gen)
    val ids = GenStore.listBatchIds(spark, dir)
    val data = GenStore.footerRowCount(spark, ids.map(i => s"$dir/batch_id=$i"))
    val pending = GenStore.footerRowCount(spark, Seq(s"$dir/deletes"))
    GenStore.statusRow(spark, gen, ids.size.toLong, data, pending,
      needsCompaction(spark, root, maxFragments, maxPendingFraction))
  }
}
