package graft

import org.apache.spark.sql.Row

/** Independent naive reference fold — the replay-equivalence oracle.
  *
  * Sequential scala-collections fold of the full event log sorted by the
  * total order (commit_lsn, seq); per-column set-if-non-null (carry-forward),
  * row-level op from every event, tombstones excluded from the final state.
  * Deliberately has NOTHING in common with the engine's distributed
  * implementation (different algorithm, different code path) so agreement is
  * meaningful.
  */
object TestOracle {

  case class KeyState(op: String, lsn: Long, seq: Int, cols: Map[String, Any])

  /** rows: flat change events with fields repo, path, op, commit_lsn, seq +
    * payload columns (by name). Missing payload columns in a row's schema are
    * treated as never-set. */
  def fold(rows: Seq[Row], payloadCols: Seq[String]): Map[(String, String), KeyState] = {
    val sorted = rows.sortBy(r =>
      (r.getLong(r.fieldIndex("commit_lsn")), r.getInt(r.fieldIndex("seq"))))
    var state = Map.empty[(String, String), KeyState]
    for (r <- sorted) {
      val key = (r.getString(r.fieldIndex("repo")), r.getString(r.fieldIndex("path")))
      val prev = state.getOrElse(key, KeyState(null, -1L, -1, Map.empty))
      val fields = r.schema.fieldNames.toSet
      val newCols = payloadCols.foldLeft(prev.cols) { (acc, c) =>
        if (fields.contains(c) && !r.isNullAt(r.fieldIndex(c))) acc.updated(c, r.get(r.fieldIndex(c)))
        else acc
      }
      state = state.updated(key, KeyState(
        r.getString(r.fieldIndex("op")),
        r.getLong(r.fieldIndex("commit_lsn")),
        r.getInt(r.fieldIndex("seq")),
        newCols))
    }
    state
  }

  /** Final visible state: tombstoned keys removed. */
  def finalState(rows: Seq[Row], payloadCols: Seq[String]): Map[(String, String), KeyState] =
    fold(rows, payloadCols).filter(_._2.op != "D")

  def sha256Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
