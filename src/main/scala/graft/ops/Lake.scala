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
}
