package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
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
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = FotmobPipeline.matchDocSchema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val per = math.max(1, (matches + partitions - 1) / partitions)
        (0 until matches by per)
          .map(start => MatchRange(start, math.min(start + per, matches)))
          .toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        new MatchReaderFactory
    }
}

private case class MatchRange(start: Int, end: Int) extends InputPartition

private class MatchReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new MatchReader(p.asInstanceOf[MatchRange])
}

private class MatchReader(range: MatchRange)
    extends PartitionReader[InternalRow] {

  private val serializer =
    ExpressionEncoder(FotmobPipeline.matchDocSchema).createSerializer()
  private var i = range.start - 1

  override def next(): Boolean = { i += 1; i < range.end }
  override def get(): InternalRow = serializer(MatchGen.matchDoc(i)).copy()
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
