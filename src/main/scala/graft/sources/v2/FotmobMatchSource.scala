package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.{ArrayType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.fidelity.FotmobPipeline

/** Custom DataSourceV2 batch source: the reference's match-ingestion
  * stage (`fotmob-dag.py:25-44` — enumerate rounds, fetch one JSON doc
  * per match) modeled as a pluggable Spark source.
  *
  *   spark.read.format("graft.sources.v2.FotmobMatchSource")
  *     .option("matches", 380).option("partitions", 8).load()
  *
  * The S1 "round listing" becomes partition planning (each
  * InputPartition owns a contiguous match-id range — the unit a real
  * connector would fetch per task), and the S3 "per-match fetch"
  * becomes the partition reader. Rows are generated deterministically
  * from the match index (a seeded stand-in for the HTTP fetch, which is
  * orchestration, not query processing), so reads are reproducible and
  * the source composes with [[FotmobPipeline]] end-to-end.
  *
  * Pushdown (the part that matters at fetch scale):
  *
  *  - `SupportsPushDownRequiredColumns` — the scan serializes only the
  *    projected (possibly nested-pruned) sub-schema, so a query that
  *    reads `matchId` alone never materializes the shot array. The
  *    analog of fetching a lighter API payload per match.
  *  - `SupportsPushDownFilters` — `matchId = 'm7'` / `matchId IN (…)`
  *    predicates prune partition PLANNING: only the named matches are
  *    ever generated (the reference's scrape fetches only the requested
  *    rounds, `fotmob-dag.py:25-37` — same idea, applied at the
  *    source). Handled filters stay in the residual set too, so Spark
  *    re-applies them and correctness never rests on the prune.
  *
  * Scale shape: partitions are independent and sized by option, so a
  * 1000-executor cluster fans the fetch out with no driver-side loop;
  * schema is declared (never inferred) so planning needs zero data
  * access.
  */
class FotmobMatchSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FotmobPipeline.matchDocSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // properties arrive with the user's original key casing; honor
    // Spark's case-insensitive option contract
    val opts = new CaseInsensitiveStringMap(properties)
    new FotmobMatchTable(
      opts.getOrDefault("matches", "100").toInt,
      opts.getOrDefault("partitions", "4").toInt)
  }
}

private class FotmobMatchTable(matches: Int, partitions: Int)
    extends Table with SupportsRead {
  require(matches > 0, s"option 'matches' must be positive, got $matches")
  require(partitions > 0, s"option 'partitions' must be positive, got $partitions")

  override def name(): String = s"fotmob_matches($matches)"
  override def schema(): StructType = FotmobPipeline.matchDocSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FotmobScanBuilder(matches, partitions)
}

private class FotmobScanBuilder(matches: Int, partitions: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = FotmobPipeline.matchDocSchema
  private var pushed: Array[Filter] = Array.empty
  // None = no pushed match-id predicate (scan everything)
  private var allowed: Option[Set[Int]] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark hands the pruned read schema (nested struct fields included
    // when nested-schema pruning applies); emit exactly this
    required = requiredSchema

  /** matchId values are "m<index>"; a parseable in-range value maps to
    * its match index, anything else matches nothing. */
  private def idx(v: Any): Option[Int] = v match {
    case s: String if s.length > 1 && s.charAt(0) == 'm' =>
      s.drop(1).toIntOption.filter(i => i >= 0 && i < matches)
    case _ => None
  }

  private def matchIdSet(f: Filter): Option[Set[Int]] = f match {
    case EqualTo("matchId", v) => Some(idx(v).toSet)
    case In("matchId", vs) => Some(vs.flatMap(idx).toSet)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val handled = filters.filter(f => matchIdSet(f).isDefined)
    val sets = handled.flatMap(matchIdSet)
    allowed = if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
    pushed = handled
    // every filter stays residual: Spark re-evaluates post-scan, so the
    // prune is purely a partition-planning optimization
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new FotmobScan(matches, partitions, required, allowed)
}

private class FotmobScan(
    matches: Int,
    partitions: Int,
    schema: StructType,
    allowed: Option[Set[Int]]) extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = {
    val sel = allowed.map(a => s", matchIds=${a.size}").getOrElse("")
    s"fotmob_matches(matches=$matches$sel, readFields=${schema.fieldNames.mkString(",")})"
  }

  override def planInputPartitions(): Array[InputPartition] = allowed match {
    case None =>
      // Range is a compact Seq — partition payload stays O(1) however
      // large the match count
      val per = math.max(1, (matches + partitions - 1) / partitions)
      (0 until matches by per)
        .map(s => MatchPart(s until math.min(s + per, matches), schema))
        .toArray
    case Some(ids) if ids.isEmpty => Array.empty
    case Some(ids) =>
      // pushed point/in-list lookups: plan only the named matches
      val sorted = ids.toSeq.sorted
      val per = math.max(1, (sorted.length + partitions - 1) / partitions)
      sorted.grouped(per).map(g => MatchPart(g, schema)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MatchReaderFactory
}

private case class MatchPart(ids: Seq[Int], schema: StructType)
    extends InputPartition

private class MatchReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new MatchReader(p.asInstanceOf[MatchPart])
}

private class MatchReader(part: MatchPart)
    extends PartitionReader[InternalRow] {

  private val serializer =
    ExpressionEncoder(part.schema).createSerializer()
  private val it = part.ids.iterator
  private var current: InternalRow = _

  override def next(): Boolean =
    if (it.hasNext) {
      val full = MatchGen.matchDoc(it.next())
      current = serializer(
        MatchGen.project(full, FotmobPipeline.matchDocSchema, part.schema))
        .copy()
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Deterministic match-document generator — the seeded stand-in for the
  * per-match HTTP fetch. */
private object MatchGen {
  private val teams = Vector(
    "Arsenal", "Chelsea", "Tottenham", "Liverpool", "Everton", "Fulham",
    "Brentford", "Burnley", "Wolves", "Newcastle")
  private val eventTypes = Vector("Goal", "AttemptSaved", "Miss")
  private val shotTypes = Vector("RightFoot", "LeftFoot", "Header")
  private val situations = Vector("RegularPlay", "SetPiece", "FromCorner")
  private val players = Vector(
    "Son", "Saka", "Palmer", "Salah", "Isak", "Gordon", "Mbeumo", "Wilson")

  private def team(idx: Int): Row =
    Row(teams(idx), 100L + idx)

  /** Recursive projection of a full generated Row onto a pruned
    * sub-schema (struct fields by name, array-of-struct element-wise) —
    * the generated data is always full, the SERIALIZED row is exactly
    * the scan's readSchema. */
  def project(row: Row, full: StructType, target: StructType): Row =
    if (target == full) row
    else Row.fromSeq(target.fields.toSeq.map { f =>
      val i = full.fieldIndex(f.name)
      (row.get(i), full(i).dataType, f.dataType) match {
        case (null, _, _) => null
        case (r: Row, fs: StructType, ts: StructType) => project(r, fs, ts)
        case (xs: Seq[_], ArrayType(fs: StructType, _), ArrayType(ts: StructType, _)) =>
          xs.map {
            case null => null
            case e: Row => project(e, fs, ts)
          }
        case (v, _, _) => v
      }
    })

  def matchDoc(i: Int): Row = {
    val home = i % teams.size
    val awayRaw = (i * 7 + 3) % teams.size
    val away = if (awayRaw == home) (home + 1) % teams.size else awayRaw
    val nShots = 2 + (i % 3)
    val shots = (0 until nShots).map { j =>
      val k = i * 31 + j * 17
      val blocked = (i + j) % 5 == 0
      Row(
        i.toLong * 10 + j,                       // id
        eventTypes((i + j) % eventTypes.size),   // eventType
        players(k % players.size),               // playerName
        shotTypes(j % shotTypes.size),           // shotType
        situations(k % situations.size),         // situation
        100L + (if (j % 2 == 0) home else away), // teamId
        80.0 + (k % 200) / 10.0,                 // x
        20.0 + (k % 400) / 10.0,                 // y
        blocked,                                 // isBlocked
        if (blocked) 90.0 + (k % 50) / 10.0 else null, // blockedX
        if (blocked) 30.0 + (k % 80) / 10.0 else null, // blockedY
        35.0 + (k % 100) / 10.0,                 // goalCrossedY
        (k % 30) / 10.0,                         // goalCrossedZ
        (k % 100) / 100.0,                       // expectedGoals
        if ((i + j) % 4 == 0) null else (k % 90) / 100.0) // xGOT
    }
    Row(
      s"m$i",
      Row(team(home), team(away)),
      Row(Row(shots)))
  }
}
