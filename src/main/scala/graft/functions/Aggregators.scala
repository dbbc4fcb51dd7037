package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.2 UDF inventory): a composite-metric
  * Aggregator in the spirit of the reference dashboard's SGA-style
  * derived metrics (reference README.md:5 compares players/teams on
  * xG/xGOT/SGA composites; here the same shape over lineitem revenue).
  *
  * The buffer accumulates revenue in integer micro-units (round(rev *
  * 1e6)) so merges are exact and associative — the same order-independence
  * convention as [[graft.Conventions.moneySum]] — making the aggregator
  * safe under any partial-aggregation/merge order Spark chooses.
  */
object Aggregators {

  case class RevenueIn(l_extendedprice: Double, l_discount: Double)
  case class RevenueBuf(sumMicros: Long, maxMicros: Long, n: Long)
  case class RevenueStats(avg_rev: Double, max_rev: Double, n: Long)

  /** Composite revenue statistics: exact average/max of
    * extendedprice*(1-discount) plus the row count, in one pass. */
  val revenueStats: Aggregator[RevenueIn, RevenueBuf, RevenueStats] =
    new Aggregator[RevenueIn, RevenueBuf, RevenueStats] {
      private def micros(in: RevenueIn): Long =
        math.round(in.l_extendedprice * (1d - in.l_discount) * 1e6)

      def zero: RevenueBuf = RevenueBuf(0L, Long.MinValue, 0L)

      def reduce(b: RevenueBuf, in: RevenueIn): RevenueBuf = {
        val m = micros(in)
        RevenueBuf(b.sumMicros + m, math.max(b.maxMicros, m), b.n + 1)
      }

      def merge(a: RevenueBuf, b: RevenueBuf): RevenueBuf =
        RevenueBuf(
          a.sumMicros + b.sumMicros,
          math.max(a.maxMicros, b.maxMicros),
          a.n + b.n)

      def finish(b: RevenueBuf): RevenueStats = {
        def r4(x: Double): Double =
          BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        RevenueStats(
          avg_rev = if (b.n == 0) 0d else r4(b.sumMicros.toDouble / 1e6 / b.n),
          max_rev = if (b.n == 0) 0d else r4(b.maxMicros.toDouble / 1e6),
          n = b.n)
      }

      def bufferEncoder: Encoder[RevenueBuf] = Encoders.product[RevenueBuf]
      def outputEncoder: Encoder[RevenueStats] = Encoders.product[RevenueStats]
    }
}
