package graft.sources

import graft.core.Forest
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** DataSource V2 reader for ENAMEX corpora (S1 as a first-class Spark
  * source): `spark.read.format("enamex").load(path)` yields
  * `(sentence string, tokens array<string>,
  *   spans array<struct<neType,begin,end,depth>>)`.
  *
  * Scale properties: files are split into byte ranges (one input
  * partition per range, standard newline-aligned splitting), so a single
  * large corpus file still parallelizes across executors; column pruning
  * is pushed into the reader — `select("sentence")` never parses tags
  * into span structs.
  *
  * Format per /root/reference/README.md:33-50; parsing shared with
  * graft.core.Forest.
  */
class EnamexDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "enamex"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EnamexSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new EnamexTable(properties.asScala.toMap)
}

object EnamexSource {
  val spanType: StructType = StructType(Seq(
    StructField("neType", StringType), StructField("begin", IntegerType),
    StructField("end", IntegerType), StructField("depth", IntegerType)))

  val fullSchema: StructType = StructType(Seq(
    StructField("sentence", StringType),
    StructField("tokens", ArrayType(StringType)),
    StructField("spans", ArrayType(spanType))))

  /** Resolve a path argument: a file is itself; a directory contributes
    * its regular files; a missing path is an error (not an empty scan).
    */
  def resolve(paths: Seq[String]): Seq[String] = paths.flatMap { p =>
    val f = new java.io.File(p)
    require(f.exists(), s"enamex: path does not exist: $p")
    if (f.isDirectory)
      f.listFiles().filter(_.isFile).map(_.getPath).sorted.toSeq
    else Seq(p)
  }

  /** Newline-aligned byte-range splits of the input files. */
  def splits(paths: Seq[String], targetBytes: Long): Seq[EnamexSplit] =
    resolve(paths).flatMap { p =>
      val len = new java.io.File(p).length()
      if (len == 0) Nil
      else {
        val n = math.max(1L, (len + targetBytes - 1) / targetBytes)
        (0L until n).map { i =>
          EnamexSplit(p, i * targetBytes, math.min(len, (i + 1) * targetBytes))
        }
      }
    }
}

final case class EnamexSplit(path: String, start: Long, end: Long)
    extends InputPartition

private class EnamexTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"enamex(${props.getOrElse("path", "?")})"
  override def schema(): StructType = EnamexSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EnamexScanBuilder(
      Seq(Option(options.get("path")).getOrElse(
        props.getOrElse("path", sys.error("enamex: no path option")))))
}

private class EnamexScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = EnamexSource.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new EnamexScan(paths, required)
}

private class EnamexScan(paths: Seq[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    EnamexSource.splits(paths, targetBytes = 16L * 1024 * 1024)
      .map(s => s: InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new EnamexReaderFactory(required)
}

private class EnamexReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new EnamexReader(partition.asInstanceOf[EnamexSplit], required)
}

/** Byte-position-accurate line reader with standard split semantics: a
  * line belongs to the split containing its first byte (boundary lines
  * starting exactly at `end` are read here AND discarded by the next
  * split, which always drops its first line when start > 0).
  */
private final class ByteLines(path: String, start: Long, end: Long) {
  private val in = new java.io.FileInputStream(path)
  private var skipped = 0L
  while (skipped < start) {
    val s = in.skip(start - skipped)
    require(s > 0, s"enamex: cannot seek to $start in $path")
    skipped += s
  }
  private val bis = new java.io.BufferedInputStream(in, 1 << 16)
  private var filePos = start
  private val lineBuf = new java.io.ByteArrayOutputStream(256)

  private def readLineRaw(): String = {
    lineBuf.reset()
    var b = bis.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { lineBuf.write(b); filePos += 1; b = bis.read() }
    if (b == '\n') filePos += 1
    val s = new String(lineBuf.toByteArray, "UTF-8")
    if (s.endsWith("\r")) s.dropRight(1) else s
  }

  if (start > 0) readLineRaw() // partial (or boundary) first line

  /** Next line whose first byte is <= end, else null. */
  def next(): String = if (filePos > end) null else readLineRaw()
  def close(): Unit = bis.close()
}

private class EnamexReader(split: EnamexSplit, required: StructType)
    extends PartitionReader[InternalRow] {

  private val lines = new ByteLines(split.path, split.start, split.end)
  private var current: InternalRow = _

  override def next(): Boolean = {
    var row: InternalRow = null
    var line = lines.next()
    while (row == null && line != null) {
      if (line.nonEmpty) row = parse(line)
      else line = lines.next()
    }
    current = row
    row != null
  }

  private def parse(line: String): InternalRow = {
    val forest = Forest.parseEnamex(line)
    val (toks, spans) = Forest.toSpans(forest)
    val values = required.fieldNames.map {
      case "sentence" => UTF8String.fromString(toks.mkString(" "))
      case "tokens" =>
        new GenericArrayData(toks.map(t => UTF8String.fromString(t)).toArray[Any])
      case "spans" =>
        new GenericArrayData(spans.map { sp =>
          InternalRow(UTF8String.fromString(sp.neType),
            sp.begin, sp.end, sp.depth)
        }.toArray[Any])
    }
    InternalRow.fromSeq(values.toSeq)
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
