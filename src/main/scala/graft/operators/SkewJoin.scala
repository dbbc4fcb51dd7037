package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join on a key where one value holds a large share of the
  * rows puts that whole share in one reduce partition — the classic
  * straggler at 100 TB. AQE's skew-join split handles sort-merge cases
  * automatically; this operator is the explicit, always-available
  * fallback that works for any join the optimizer picks:
  *
  *  - probe (large) side: each row gets a deterministic salt in
  *    [0, saltFactor) hashed from the whole row, splitting every hot key
  *    into saltFactor sub-keys;
  *  - build (small) side: replicated saltFactor times, one copy per
  *    salt value (size × saltFactor — keep the build side the smaller
  *    one);
  *  - join on (key, salt): identical result set to the unsalted join,
  *    but the hot key's rows spread over saltFactor partitions.
  */
object SkewJoin {

  /** Inner equi-join of `large ⋈ small` on `key`, salted `saltFactor`
    * ways. Result is row-identical to `large.join(small, key)` — any
    * salt assignment yields the same result set, so the salt need not be
    * deterministic. It is derived from the row's position
    * (monotonically_increasing_id), not its content: content-hash salts
    * would send byte-identical duplicate rows (common in log data) to
    * the same partition, re-creating the exact straggler being fixed. */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int = 8): DataFrame = {
    val saltCol = "__graft_salt"
    require(!large.columns.contains(saltCol) && !small.columns.contains(saltCol),
      s"input already has a $saltCol column")
    val salted = large.withColumn(
      saltCol,
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val replicated = small.withColumn(
      saltCol, explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }
}
