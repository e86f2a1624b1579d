package graft.sources

import java.util.concurrent.atomic.LongAdder

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for a directory of recorded HTML pages — the
  * fixture-backed stand-in for the reference's browser page source
  * (`scraper/async_scraper.py:38-184`) expressed as a first-class Spark
  * table: `spark.read.format("graft-html").load(dir)` with schema
  * `(path, name, length, html)`.
  *
  * The point of doing this as DSv2 rather than a `wholeTextFiles` RDD
  * wrapper is SOURCE-SIDE work elimination, the same property SURVEY §4
  * credits to the reference's URL-compiled search filters (P7,
  * `construct_url.py:16-40`):
  *
  *  - '''Filter pushdown''' ([[SupportsPushDownFilters]]): predicates on
  *    file METADATA (`name`, `path`, `length`) are evaluated during
  *    planning against the directory listing — a filtered-out page is
  *    never opened, never read, never shipped. Equality, prefix, suffix,
  *    contains, comparisons, IN, AND/OR/NOT are all consumed; anything
  *    else (incl. any predicate on `html`) stays residual for Spark.
  *  - '''Column pruning''' ([[SupportsPushDownRequiredColumns]]): when
  *    the query doesn't project `html`, readers emit metadata rows
  *    without opening files at all — a path/name/length-only query over
  *    a TB-sized fixture archive is a directory listing, not a scan.
  *
  * Partition planning bin-packs files into ≤ [[HtmlDirectorySource.FilesPerPartition]]-file
  * chunks so a million-page archive parallelizes without a
  * task-per-file explosion; each task opens only its own files
  * (executor memory is bounded by one page at a time per reader).
  *
  * Contract notes: `path` is the absolute filesystem path (matching
  * DuckDB's `read_text()` filename column, which q76's oracle relies
  * on); `html` is the file decoded as UTF-8; only `*.html` files in the
  * top-level directory are listed (no recursion — fixture dirs are
  * flat). Local-filesystem paths only, by design: fixtures live with
  * the repo; the parquet/JSON sources remain the cluster-scale path.
  */
class HtmlDirectorySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-html"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HtmlDirectorySource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val dir = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-html needs a directory: spark.read.format(\"graft-html\").load(dir)"))
    new HtmlDirectoryTable(dir)
  }
}

object HtmlDirectorySource {
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("html", StringType, nullable = true)))

  /** Bin-packing width for input partitions. */
  val FilesPerPartition = 64

  /** Test observability hook: bytes of file content actually read by
    * readers in THIS JVM (local-mode tests assert column pruning by
    * watching it stay at zero). Not part of the API surface. */
  val bytesReadForTest = new LongAdder
}

private[sources] class HtmlDirectoryTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft-html `$dir`"
  override def schema(): StructType = HtmlDirectorySource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HtmlScanBuilder(dir)
}

private[sources] class HtmlScanBuilder(dir: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = HtmlDirectorySource.Schema

  /** A filter is consumable iff it only references metadata columns and
    * is made of shapes we can evaluate on (path, name, length) during
    * planning. Consumed filters are NOT re-evaluated by Spark (we
    * return only the residual), so consumability must be exact. */
  private def consumable(f: Filter): Boolean = f match {
    case EqualTo(a, _) => meta(a)
    case EqualNullSafe(a, _) => meta(a)
    case In(a, _) => meta(a)
    case StringStartsWith(a, _) => meta(a)
    case StringEndsWith(a, _) => meta(a)
    case StringContains(a, _) => meta(a)
    case GreaterThan(a, _) => meta(a)
    case GreaterThanOrEqual(a, _) => meta(a)
    case LessThan(a, _) => meta(a)
    case LessThanOrEqual(a, _) => meta(a)
    case IsNull(a) => meta(a)
    case IsNotNull(a) => meta(a)
    case And(l, r) => consumable(l) && consumable(r)
    case Or(l, r) => consumable(l) && consumable(r)
    case Not(c) => consumable(c)
    case _ => false
  }
  private def meta(attr: String): Boolean =
    attr == "path" || attr == "name" || attr == "length"

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (take, residual) = filters.partition(consumable)
    pushed = take
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new HtmlScan(dir, pushed, required)
}

private[sources] class HtmlScan(dir: String, pushed: Array[Filter],
    required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-html $dir, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  /** Planning-time evaluation of a pushed filter against one file's
    * metadata — the DSv2 analog of compiling search filters into the
    * request URL: rejected files never become work. */
  private def eval(f: Filter, path: String, name: String, length: Long): Boolean = {
    def v(attr: String): Any = attr match {
      case "path" => path
      case "name" => name
      case "length" => length
    }
    def cmp(attr: String, x: Any): Int = (v(attr), x) match {
      case (a: String, b: String) => a.compareTo(b)
      case (a: Long, b: Number) => java.lang.Long.compare(a, b.longValue())
      case (a, b) => throw new IllegalArgumentException(s"can't compare $a to $b")
    }
    f match {
      case EqualTo(a, x) => v(a) == x || cmp(a, x) == 0
      case EqualNullSafe(a, x) => x != null && cmp(a, x) == 0
      case In(a, xs) => xs.exists(x => x != null && cmp(a, x) == 0)
      case StringStartsWith(a, p) => v(a).asInstanceOf[String].startsWith(p)
      case StringEndsWith(a, s) => v(a).asInstanceOf[String].endsWith(s)
      case StringContains(a, s) => v(a).asInstanceOf[String].contains(s)
      case GreaterThan(a, x) => cmp(a, x) > 0
      case GreaterThanOrEqual(a, x) => cmp(a, x) >= 0
      case LessThan(a, x) => cmp(a, x) < 0
      case LessThanOrEqual(a, x) => cmp(a, x) <= 0
      case IsNull(_) => false // metadata columns are never null
      case IsNotNull(_) => true
      case And(l, r) => eval(l, path, name, length) && eval(r, path, name, length)
      case Or(l, r) => eval(l, path, name, length) || eval(r, path, name, length)
      case Not(c) => !eval(c, path, name, length)
      case other => throw new IllegalStateException(
        s"non-consumable filter reached eval: $other")
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".html"))
      .sortBy(_.getName)
      .map(f => (f.getAbsolutePath, f.getName, f.length()))
      .filter { case (p, n, l) => pushed.forall(eval(_, p, n, l)) }
    files.grouped(HtmlDirectorySource.FilesPerPartition)
      .map(g => HtmlFilesPartition(g.toArray): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HtmlReaderFactory(required.fieldNames)
}

private[sources] case class HtmlFilesPartition(
    files: Array[(String, String, Long)]) extends InputPartition

private[sources] class HtmlReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val files = partition.asInstanceOf[HtmlFilesPartition].files
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < files.length }
      override def get(): InternalRow = {
        val (path, name, length) = files(i)
        val values = columns.map {
          case "path" => UTF8String.fromString(path)
          case "name" => UTF8String.fromString(name)
          case "length" => java.lang.Long.valueOf(length)
          case "html" =>
            // content is only touched when the html column survives
            // pruning — this branch is the ONLY file read in the source
            val bytes = java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(path))
            HtmlDirectorySource.bytesReadForTest.add(bytes.length.toLong)
            UTF8String.fromBytes(bytes)
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
