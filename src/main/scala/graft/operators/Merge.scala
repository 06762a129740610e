package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-table maintenance: MERGE/upsert and CDC change application
  * over plain parquet directories — the operations a continuously
  * re-crawled training corpus needs between full rebuilds, expressed so
  * the BASE (the 100 TB side) is never shuffled.
  *
  * The reference engine is write-once/read-many with no update surface
  * (its own scope list, /root/reference/README.md:127-138); these are
  * north-star extensions in the spirit of SQL MERGE, built from
  * declarative joins so Catalyst picks broadcast plans when the
  * change set is small (the overwhelmingly common case).
  */
object Merge {

  private def requireDisjointKeys(df: DataFrame, keyCols: Seq[String], what: String): Unit =
    require(keyCols.nonEmpty && keyCols.forall(df.columns.contains),
      s"$what must contain every key column ${keyCols.mkString("(", ", ", ")")}")

  /** SQL `MERGE ... WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN
    * INSERT` for snapshot rewrites: every key present in `updates`
    * takes the update row; all other base rows pass through.
    *
    * Scale shape: `updates` is deduplicated on the key (latest writer
    * wins is the caller's contract — pass a pre-deduplicated frame or
    * use [[applyChanges]] for seq-ordered feeds), then the base side is
    * ONE left-anti hash join on the key — broadcastable when updates
    * are small, so the 100 TB base never shuffles — plus a union.
    */
  def upsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame = {
    requireDisjointKeys(base, keyCols, "base")
    requireDisjointKeys(updates, keyCols, "updates")
    require(base.columns.toSeq == updates.columns.toSeq,
      s"schema mismatch: base ${base.columns.mkString(",")} vs updates ${updates.columns.mkString(",")}")
    base.join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(updates)
  }

  /** Apply a CDC change feed to a snapshot: `changes` carries the full
    * row plus an operation column (`I`/`U`/`D`) and a monotonically
    * increasing sequence column; for each key only the HIGHEST-seq
    * change applies (ties broken by the full row tuple, so the result
    * is a deterministic function of the data under any partitioning —
    * the [[Dedup.exact]] survivor rule). A final `D` deletes the key;
    * `I`/`U` replace (or insert) the row.
    *
    * Shuffle budget: one map-side-combined groupBy over the (small)
    * change feed + one anti join against its keys — the base scans
    * narrow and never shuffles when the feed broadcasts.
    */
  def applyChanges(
      base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    requireDisjointKeys(base, keyCols, "base")
    requireDisjointKeys(changes, keyCols, "changes")
    val payload = base.columns.toSeq
    require(payload.forall(changes.columns.contains),
      s"changes must carry every base column; missing " +
        payload.filterNot(changes.columns.contains).mkString(", "))
    // latest change per key: max_by over (seq, op, payload-tuple) — the
    // deterministic-under-ties survivor pattern. opCol is part of the
    // order key: without it, two changes identical in (key, seq,
    // payload) but differing in op ('U' vs 'D') would pick a
    // partition-order-dependent winner
    val orderKey = struct(col(seqCol) +: col(opCol) +:
      payload.filterNot(keyCols.contains).map(col): _*)
    val latest = changes.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(col(opCol) +: payload.filterNot(keyCols.contains).map(col): _*),
        orderKey).as("__c"))
      .select(keyCols.map(col) :+ col("__c.*"): _*)
    val upserts = latest.filter(col(opCol) =!= "D").select(payload.map(col): _*)
    base.join(latest.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(upserts)
  }

  /** [[applyChanges]] with a stale-change guard for INCREMENTAL feeds:
    * the snapshot carries `seqCol` as part of its payload, and any change
    * whose seq is at-or-below the snapshot's for the key is dropped
    * before applying. Replaying a micro-batch (at-least-once delivery)
    * or receiving upserts out of order across batches then converges to
    * the same snapshot — idempotent-by-seq, which is the property a
    * file-based streaming sink needs for exactly-once SEMANTICS without
    * transactional storage. Caveat (standard CDC): a delete drops the
    * key's seq memory, so a stale pre-delete upsert arriving AFTER the
    * delete would resurrect the row — feeds with deletes must arrive
    * key-ordered (or keep tombstones; out of scope here, disclosed).
    *
    * Same shuffle shape as [[applyChanges]] plus one broadcastable join
    * of the change feed against the snapshot's (key, seq) projection —
    * the base is scanned narrow for that projection and still never
    * shuffles.
    */
  def cdcApply(
      snapshot: DataFrame, changes: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    require(snapshot.columns.contains(seqCol),
      s"snapshot must carry $seqCol for the stale-change guard")
    val baseSeq = snapshot.select(
      keyCols.map(col) :+ col(seqCol).as("__base_seq"): _*)
    val fresh = changes.join(baseSeq, keyCols, "left")
      .filter(col("__base_seq").isNull || col(seqCol) > col("__base_seq"))
      .drop("__base_seq")
    applyChanges(snapshot, fresh, keyCols, seqCol, opCol)
  }

  /** [[cdcApply]] as ONE full-outer join — identical per-key semantics
    * (latest change wins iff its seq strictly exceeds the snapshot's;
    * final D removes; absent keys insert unless D; equal-or-lower seqs
    * drop; a post-delete stale upsert still resurrects, the documented
    * [[cdcApply]] caveat, because the key is then absent from the
    * snapshot), proven equal because "guard then latest" equals "latest
    * then guard": the latest change is seq-maximal, so it passes the
    * strict-seq guard iff ANY change does, and when it passes it IS the
    * latest passing change.
    *
    * Why a second formulation exists: [[cdcApply]] references the
    * snapshot TWICE (the guard's (key, seq) projection and the
    * anti-join base), so an N-deep CHAINED replay — the delta-log read
    * path, [[graft.streaming.EventStreams.cdcSnapshotAt]] — builds a
    * plan whose level-k lineage is referenced 2^(N-k) times: measured
    * 31 s for a 4-delta chain over 1M rows. This form references the
    * snapshot ONCE per level, so the chain plans N co-partitioned
    * joins above a single state shuffle — linear, and each level's
    * hash partitioning on the key is reused by the next. For ONE
    * application with a small change batch, [[cdcApply]]'s broadcast
    * shape is still better (the snapshot never shuffles); the replay
    * path picks per chain length.
    */
  def cdcApplyJoined(
      snapshot: DataFrame, changes: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    require(snapshot.columns.contains(seqCol),
      s"snapshot must carry $seqCol for the stale-change guard")
    val payload = snapshot.columns.toSeq
    require(payload.forall(changes.columns.contains),
      s"changes must carry every base column; missing " +
        payload.filterNot(changes.columns.contains).mkString(", "))
    val nonKey = payload.filterNot(keyCols.contains)
    // latest change per key — the applyChanges survivor rule verbatim
    val orderKey = struct(col(seqCol) +: col(opCol) +: nonKey.map(col): _*)
    val latest = changes.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(col(opCol) +: nonKey.map(col): _*), orderKey)
        .as("__c"))
    val snap = snapshot.select(keyCols.map(col) :+
      struct(nonKey.map(col): _*).as("__s"): _*)
    val cPayload = struct(nonKey.map(f => col(s"__c.$f")): _*)
    val cApplies = col(s"__c.$opCol") =!= "D"
    snap.join(latest, keyCols, "full_outer")
      .withColumn("__pick",
        when(col("__c").isNull, col("__s"))                   // no change
          .when(col("__s").isNull,                            // new key
            when(cApplies, cPayload))                         //   unless D
          .when(col(s"__c.$seqCol") > col(s"__s.$seqCol"),    // fresh change
            when(cApplies, cPayload))                         //   D removes
          .otherwise(col("__s")))                             // stale: keep
      .filter(col("__pick").isNotNull)
      // original snapshot column ORDER (cdcApply preserves it too)
      .select(payload.map(f =>
        if (keyCols.contains(f)) col(f)
        else col(s"__pick.$f").as(f)): _*)
  }
}
