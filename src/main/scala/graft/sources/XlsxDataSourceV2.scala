package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the XLSX source — `spark.read
  * .format("graft-xlsx").load(dir)` — the connector-shaped face of
  * [[XlsxSource.parseRows]] (reference S1, `exo_1.py:17-38`).
  *
  * Why a V2 connector and not the convenience reader: this is the
  * Spark-idiomatic integration point for a corpus of many workbooks —
  * the catalog sees a real table (schema inferred once from one
  * workbook header), each workbook becomes one InputPartition (files
  * parse in parallel on executors, never on the driver), and COLUMN
  * PRUNING actually reaches the parser: `SupportsPushDownRequiredColumns`
  * hands the scan the required schema, and each reader materializes only
  * those cells as Spark rows. Fields resolve BY NAME against each
  * workbook's own header, so workbooks with shifted/extra columns read
  * correctly (missing columns are null) — per-file schema drift is data,
  * not an error, matching the reference's tolerant ingest.
  *
  * Options: `sheet` (1-based worksheet index, default 1). The path may
  * be a single .xlsx file or a directory (its *.xlsx children, sorted).
  * All columns are StringType — the faithful schema for the reference's
  * all-text export contract (typed casts happen downstream).
  */
class XlsxDataSourceV2 extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-xlsx"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = XlsxDataSourceV2.resolveFiles(options)
    require(files.nonEmpty, "graft-xlsx: no .xlsx files at the given path")
    val sheet = options.getInt("sheet", 1)
    val (header, _) = XlsxSource.parseRows(
      XlsxDataSourceV2.readBytes(files.head, XlsxDataSourceV2.sessionConf()),
      sheet)
    StructType(header.map(h => StructField(h, StringType)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new XlsxTable(schema, new CaseInsensitiveStringMap(properties))
}

private[sources] object XlsxDataSourceV2 {

  /** The active session's Hadoop configuration (fs.defaultFS, s3a
    * credentials, …) — a bare `new Configuration()` would silently drop
    * every `spark.hadoop.*` setting, so any filesystem needing config
    * would fail. Driver-side only; executors receive it serialized via
    * [[SerializableHadoopConf]]. */
  def sessionConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Path option → concrete .xlsx file list (a file, or a directory's
    * *.xlsx children sorted for deterministic partition order). */
  def resolveFiles(options: CaseInsensitiveStringMap): Seq[String] = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-xlsx: .load(path) is required (a .xlsx file or a directory)"))
    val p = new Path(path)
    val fs = p.getFileSystem(sessionConf())
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(".xlsx")
          && !s.getPath.getName.startsWith(".")) // crashed writers' temps
        .map(_.getPath.toString).sorted
    else Seq(st.getPath.toString)
  }

  def readBytes(path: String, conf: Configuration): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try in.readAllBytes() finally in.close()
  }
}

/** Hadoop `Configuration` is not `Serializable`; this wrapper ships the
  * driver's session conf to executor-side readers/writers via Hadoop's
  * own `write`/`readFields` wire format (the same trick Spark's internal
  * `SerializableConfiguration` uses — that class is private[spark]). */
private[sources] class SerializableHadoopConf(
    @transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[sources] class XlsxTable(tableSchema: StructType,
                                 options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String =
    s"graft-xlsx(${Option(options.get("path")).getOrElse("?")})"

  override def schema(): StructType = tableSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(tableSchema, o)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-xlsx: .save(path) required"))
    new XlsxWriteBuilder(info.schema(), path)
  }
}

/** Write half of the connector — `df.write.format("graft-xlsx")
  * .mode("append"|"overwrite").save(dir)`. Each input partition becomes
  * ONE workbook (`part-NNNNN-<uuid>.xlsx`, header row included), the
  * shape the read side already treats as a table — so a distributed
  * write round-trips through the same connector. All columns must be
  * StringType (the all-text export contract; cast upstream).
  *
  * Commit protocol: tasks write `.tmp-` files; the driver's commit
  * renames them into place (and, for truncate/overwrite, deletes the
  * previously-live workbooks first); abort deletes the temps — no
  * torn-output window beyond the rename batch, same rename-based
  * contract as the engine's other sinks. */
private[sources] class XlsxWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder with SupportsTruncate {

  private var truncateFirst = false

  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = {
    schema.fields.foreach(f => require(f.dataType == StringType,
      s"graft-xlsx writes text workbooks: column '${f.name}' is " +
        s"${f.dataType.simpleString}, cast it to string upstream"))
    // capture the SESSION conf here (driver-side, once) so executors and
    // the commit phase see the same filesystem settings the user set
    new XlsxWrite(schema, path, truncateFirst,
      new SerializableHadoopConf(XlsxDataSourceV2.sessionConf()))
  }
}

private[sources] class XlsxWrite(schema: StructType, path: String,
                                 truncateFirst: Boolean,
                                 conf: SerializableHadoopConf) extends Write {
  override def toBatch: BatchWrite =
    new XlsxBatchWrite(schema, path, truncateFirst, conf)
}

private[sources] case class XlsxCommitMessage(tmp: String, fin: String)
    extends WriterCommitMessage

private[sources] class XlsxBatchWrite(schema: StructType, path: String,
                                      truncateFirst: Boolean,
                                      conf: SerializableHadoopConf)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    new XlsxWriterFactory(schema.fieldNames.toSeq, path, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    fs.mkdirs(new Path(path))
    val msgs = messages
      .collect { case m: XlsxCommitMessage => m }.filter(_.tmp.nonEmpty)
    // Publish the staged workbooks FIRST, then sweep the previous
    // generation: a concurrent reader in the commit window sees old∪new
    // (an append-like anomaly) — never an empty/partial table, which is
    // what sweep-then-publish exposed. Atomic truncate needs a manifest
    // (TxLog); a directory-of-files table can only order the renames.
    val published = msgs.map(_.fin.split('/').last).toSet
    msgs.foreach { m =>
      require(fs.rename(new Path(m.tmp), new Path(m.fin)),
        s"graft-xlsx: failed to publish ${m.fin}")
    }
    if (truncateFirst) {
      // staged temps are dot-prefixed, so this sweeps only LIVE workbooks
      fs.listStatus(new Path(path)).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && n.toLowerCase.endsWith(".xlsx") &&
            !n.startsWith(".") && !published.contains(n))
          fs.delete(st.getPath, false)
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    messages.collect { case m: XlsxCommitMessage if m.tmp.nonEmpty =>
      fs.delete(new Path(m.tmp), false)
    }
  }
}

private[sources] class XlsxWriterFactory(fieldNames: Seq[String], path: String,
                                         conf: SerializableHadoopConf)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new XlsxDataWriter(fieldNames, path, partitionId, taskId, conf)
}

/** Buffers one partition's rows (a workbook is dimension-sized by
  * contract) and emits a single workbook on commit. Empty partitions
  * emit nothing. */
private[sources] class XlsxDataWriter(fieldNames: Seq[String], path: String,
                                      partitionId: Int, taskId: Long,
                                      conf: SerializableHadoopConf)
    extends DataWriter[InternalRow] {

  private val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]

  override def write(row: InternalRow): Unit =
    buf += fieldNames.indices.map(i =>
      if (row.isNullAt(i)) null else row.getUTF8String(i).toString)

  override def commit(): WriterCommitMessage = {
    if (buf.isEmpty) return XlsxCommitMessage("", "")
    val base = f"part-$partitionId%05d-$taskId.xlsx"
    val tmp = new Path(path, s".tmp-$base")
    val fs = tmp.getFileSystem(conf.value)
    fs.mkdirs(new Path(path))
    val out = fs.create(tmp, true)
    try out.write(XlsxSource.writeBytes(fieldNames, buf.iterator))
    finally out.close()
    XlsxCommitMessage(tmp.toString, new Path(path, base).toString)
  }

  override def abort(): Unit = ()

  override def close(): Unit = buf.clear()
}

private[sources] class XlsxScanBuilder(fullSchema: StructType,
                                       options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new XlsxScan(required,
    XlsxDataSourceV2.resolveFiles(options), options.getInt("sheet", 1),
    new SerializableHadoopConf(XlsxDataSourceV2.sessionConf()))
}

private[sources] class XlsxScan(required: StructType, files: Seq[String],
                                sheet: Int, conf: SerializableHadoopConf)
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-xlsx ${files.size} file(s), columns " +
      required.fieldNames.mkString("[", ",", "]")

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => XlsxInputPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new XlsxReaderFactory(required, sheet, conf)
}

private[sources] case class XlsxInputPartition(path: String)
    extends InputPartition

private[sources] class XlsxReaderFactory(required: StructType, sheet: Int,
                                         conf: SerializableHadoopConf)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new XlsxPartitionReader(p.asInstanceOf[XlsxInputPartition].path,
      required, sheet, conf)
}

/** One workbook → rows of the REQUIRED columns only, resolved by name
  * against this workbook's own header. */
private[sources] class XlsxPartitionReader(path: String,
                                           required: StructType, sheet: Int,
                                           conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private lazy val rows: Iterator[InternalRow] = {
    val (header, data) =
      XlsxSource.parseRows(XlsxDataSourceV2.readBytes(path, conf.value), sheet)
    val idx = required.fieldNames.map(header.indexOf)
    data.iterator.map { r =>
      InternalRow.fromSeq(idx.toSeq.map { i =>
        if (i < 0 || i >= r.size || r(i) == null) null
        else UTF8String.fromString(r(i))
      })
    }
  }

  private var cur: InternalRow = _

  override def next(): Boolean =
    if (rows.hasNext) { cur = rows.next(); true } else false

  override def get(): InternalRow = cur

  override def close(): Unit = ()
}
