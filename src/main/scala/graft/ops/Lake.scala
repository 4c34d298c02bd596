package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lake-maintenance MERGE: the copy-on-write upsert every CDC-fed 100 TB
  * table needs (the lakehouse `MERGE INTO … WHEN MATCHED UPDATE WHEN NOT
  * MATCHED INSERT` semantic, composed from Spark relational primitives —
  * no table-format dependency).
  *
  * Semantics: rows of `updates` win on key collision; base rows with no
  * matching update pass through; update rows with no base match are
  * inserts. Exactly `base ANTI JOIN updates ON keys UNION ALL updates`.
  *
  * Scale design: the anti join shuffles on the merge key — or, when the
  * update batch is small (the nightly-CDC norm: |updates| ≪ |base|), AQE
  * plans it as a broadcast-anti with NO shuffle of the base at all; we
  * deliberately do not force `broadcast()` so a backfill-sized update
  * batch degrades to a shuffle join instead of an executor OOM. A
  * production copy-on-write would first semi-join updates against the
  * base's partition values and rewrite only touched partitions; the merge
  * algebra per touched partition is exactly this function.
  */
object Lake {

  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one merge key")
    // unionByName after aligning column sets: updates must carry the full
    // schema (a partial-column update is the caller's responsibility to
    // complete — SQL MERGE has the base row in scope, a distributed merge
    // does not without paying the join anyway).
    // names AND types: unionByName would silently WIDEN a type mismatch
    // (INT base ∪ BIGINT updates → BIGINT), and in a copy-on-write loop
    // that drifts the persisted table's schema — the failure MERGE INTO's
    // schema enforcement exists to prevent
    def sig(df: DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
    require(sig(base) == sig(updates),
      s"upsert schemas differ: base ${sig(base).mkString(",")} vs " +
        s"updates ${sig(updates).mkString(",")}")
    base.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)
  }

  /** Slowly-changing-dimension TYPE-2 merge — the dimension-table
    * counterpart of [[upsert]]: instead of overwriting, history is kept
    * as versioned rows. `current` carries `fromCol`/`toCol` (NULL toCol =
    * the open row); applying `updates` at `version`:
    *   - an update whose values EQUAL the open row's is a no-op (no
    *     spurious version churn — the equality test is a struct compare
    *     over all non-key columns, null-safe);
    *   - a changed key CLOSES the open row (`toCol` = version) and
    *     INSERTS the new values as the open row (`fromCol` = version);
    *   - a new key inserts its first open row;
    *   - untouched keys and already-closed history pass through verbatim.
    * Scale design: one key-shuffled full-outer join between the OPEN
    * subset and the update batch decides every case; closed history —
    * the bulk of a long-lived dimension — is never joined, only unioned
    * back. With a CDC-sized batch AQE broadcasts the update side.
    *
    * Contract: `updates` carries AT MOST ONE row per key (the standard
    * compacted-CDC shape — a batch with several versions of one key has
    * no defined order here; compact to last-per-key upstream first), and
    * `current` has at most one OPEN row per key (which this function
    * preserves, so the invariant holds across repeated applications).
    */
  def scd2Merge(current: DataFrame, updates: DataFrame, keys: Seq[String],
      fromCol: String, toCol: String, version: Long): DataFrame = {
    require(keys.nonEmpty, "scd2Merge needs at least one key")
    val valueCols = current.columns.toSeq
      .filterNot(c => keys.contains(c) || c == fromCol || c == toCol)
    require(updates.columns.toSet == (keys ++ valueCols).toSet,
      s"updates must carry exactly keys+values: ${(keys ++ valueCols).sorted}")
    // presence markers, NOT value-null probes: an update legitimately
    // setting every value NULL is still an update, and a full-outer join
    // leaves the absent side's columns null — only a column that cannot
    // be null when the side is present can detect presence.
    val open = current.filter(col(toCol).isNull)
      .withColumn("__o_present", lit(true))
    val closed = current.filter(col(toCol).isNotNull)
    val u = updates.select(
      keys.map(col) ++ valueCols.map(c => col(c).as(s"__u_$c")) :+
        lit(true).as("__u_present"): _*)
    val j = open.join(u, keys, "full_outer")
    val hasUpdate = col("__u_present").isNotNull
    val openExisted = col("__o_present").isNotNull
    // null-safe struct compare: a value column going NULL is a change
    val same = struct(valueCols.map(col): _*) <=>
      struct(valueCols.map(c => col(s"__u_$c")): _*)
    val keep = j.filter(openExisted && (!hasUpdate || same)) // untouched / no-op
      .select(current.columns.map(col): _*)
    val closedNow = j.filter(openExisted && hasUpdate && !same)
      .select(keys.map(col) ++ valueCols.map(col) ++
        Seq(col(fromCol), lit(version).as(toCol)): _*)
    val inserted = j.filter(!openExisted || (hasUpdate && !same))
      .select(keys.map(col) ++ valueCols.map(c => col(s"__u_$c").as(c)) ++
        Seq(lit(version).as(fromCol), lit(null).cast("long").as(toCol)): _*)
    closed.unionByName(keep).unionByName(closedNow).unionByName(inserted)
  }
}
