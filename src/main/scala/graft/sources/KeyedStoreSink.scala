package graft.sources

import java.util

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 WRITE connector — the structural twin of the
  * reference's Cassandra sink (SURVEY §0 [PUBLIC]; connector jar absent
  * offline), demonstrating the exactly-once batch commit protocol a
  * store connector rides on:
  *
  *  - `WriteBuilder` → `BatchWrite` → per-partition `DataWriter`s
  *  - each task BUFFERS its keyed upserts and ships them as its
  *    `WriterCommitMessage` — nothing becomes visible at task level
  *  - the driver's `commit()` applies all messages ATOMICALLY with
  *    keyed last-write-wins by (version, payload) — Spark's task-commit
  *    protocol already guarantees one surviving message per partition
  *    under retries/speculation, so re-executed tasks cannot double-
  *    apply (the idempotence [[KeyedUpsertSink]] provides relationally,
  *    here at the protocol layer)
  *  - `abort()` drops every buffered message — no partial visibility
  *
  * The "store" is an in-JVM keyed map (per table-name option), which on
  * local[n] is exactly where a Cassandra session handle would sit; the
  * protocol code is what transfers. Row shape is fixed (key BIGINT,
  * version BIGINT, payload STRING) — a real connector maps the schema.
  */
class KeyedStoreSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyedStore.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KeyedStoreTable(
      Option(properties.get("table")).getOrElse("default"))
}

/** The in-JVM keyed store: table → key → (version, payload). */
object KeyedStore {
  import org.apache.spark.sql.types._
  val Schema: StructType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  private val tables =
    mutable.Map.empty[String, mutable.Map[Long, (Long, String)]]
  val commits = new java.util.concurrent.atomic.AtomicInteger(0)

  def snapshot(table: String): Map[Long, (Long, String)] = synchronized {
    tables.getOrElse(table, mutable.Map.empty).toMap
  }
  def clear(table: String): Unit = synchronized { tables.remove(table) }

  private[sources] def applyAll(table: String,
      rows: Seq[(Long, Long, String)]): Unit = synchronized {
    val t = tables.getOrElseUpdate(table, mutable.Map.empty)
    rows.foreach { case (k, v, p) =>
      t.get(k) match {
        // keyed last-write-wins: higher version replaces; equal version
        // takes the lexicographically larger payload (total order, so
        // the merged result is independent of message application order)
        case Some((v0, p0)) if v0 > v || (v0 == v && p0 >= p) =>
        case _ => t(k) = (v, p)
      }
    }
    commits.incrementAndGet()
  }
}

private[sources] class KeyedStoreTable(tableName: String)
  extends Table with SupportsWrite {
  override def name(): String = s"keyed_store:$tableName"
  override def schema(): StructType = KeyedStore.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new KeyedStoreBatchWrite(tableName)
      }
    }
}

private[sources] case class UpsertBatch(rows: Seq[(Long, Long, String)])
  extends WriterCommitMessage

private[sources] class KeyedStoreBatchWrite(tableName: String)
  extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new KeyedStoreWriterFactory
  // driver-side atomic apply: messages arrive deduplicated by Spark's
  // task-commit protocol (one per partition, retries discarded)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    KeyedStore.applyAll(tableName,
      messages.toSeq.flatMap(_.asInstanceOf[UpsertBatch].rows))
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class KeyedStoreWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = mutable.ArrayBuffer.empty[(Long, Long, String)]
      override def write(r: InternalRow): Unit =
        buf += ((r.getLong(0), r.getLong(1), r.getUTF8String(2).toString))
      override def commit(): WriterCommitMessage = UpsertBatch(buf.toSeq)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
