package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A [[FileIndex]] built entirely from a table manifest's committed
  * `(path, size)` list — the Delta/Iceberg planning model: NO filesystem
  * listing and NO per-file stat calls at plan time, so plan cost is
  * independent of segment count and storage latency.
  *
  * Why not `spark.read.parquet(file1, ..., fileN)`: with more than
  * `spark.sql.sources.parallelPartitionDiscovery.threshold` (default 32)
  * explicit paths, `InMemoryFileIndex` launches a distributed LISTING JOB
  * to stat the named files before the real scan can even be planned — a
  * whole extra Spark job per query on a table whose file set the manifest
  * already knows exactly (measured: the 80-file bucketed point-get table
  * nearly doubled its latency on it). At the 100 TB target the same trip
  * is thousands of object-store HEAD requests per query.
  *
  * Partition values (`lg=`, `bucket=`) are parsed from the relative paths
  * once at construction; [[listFiles]] evaluates Catalyst partition
  * filters against them, so static partition pruning (point gets pruning
  * to one `bucket=` dir, scans to their locality groups) behaves exactly
  * as with a directory-listed read.
  *
  * Lives in the `org.apache.spark.sql` namespace because the pieces a
  * file-backed relation is assembled from ([[HadoopFsRelation]],
  * `baseRelationToDataFrame`) are `private[sql]`-adjacent ScalaSig
  * surfaces in Spark 4 (see [[GraftColumn]] for the pattern rationale).
  */
final class ManifestFileIndex(
    basePath: String,
    files: Seq[(String, Long)], // (absolute path, size in bytes)
    override val partitionSchema: StructType)
    extends FileIndex {

  override val rootPaths: Seq[HPath] = Seq(new HPath(basePath))

  /** One value per partition-schema field, parsed from `name=value` path
    * segments (our ids are plain identifiers / ints — never escaped). */
  private def partitionValues(abs: String): Seq[Any] = {
    val segs = abs.split('/')
    partitionSchema.fields.toSeq.map { f =>
      val seg = segs.find(_.startsWith(f.name + "="))
        .getOrElse(throw new IllegalStateException(
          s"segment ${f.name}= missing in $abs"))
      val v = seg.substring(f.name.length + 1)
      f.dataType match {
        case StringType  => UTF8String.fromString(v)
        case IntegerType => v.toInt
        case LongType    => v.toLong
        case other =>
          throw new IllegalStateException(s"unsupported partition type $other")
      }
    }
  }

  private val partitions: Seq[PartitionDirectory] =
    files.groupBy { case (p, _) => partitionValues(p) }.toSeq
      .map { case (vals, fs) =>
        PartitionDirectory(InternalRow.fromSeq(vals),
          fs.map { case (p, len) =>
            new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, new HPath(p))
          }.toArray)
      }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    if (partitionFilters.isEmpty || partitionSchema.isEmpty) partitions
    else {
      // same binding InMemoryFileIndex uses for its pruning, interpreted:
      // the handful of partition rows never justifies codegen
      val bound = Predicate.createInterpreted(
        partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = partitionSchema.fieldIndex(a.name)
            BoundReference(i, partitionSchema(i).dataType, nullable = true)
        })
      partitions.filter(p => bound.eval(p.values))
    }

  override def inputFiles: Array[String] = files.map(_._1).toArray
  override def refresh(): Unit = ()
  override val sizeInBytes: Long = files.map(_._2).sum
}

object ManifestFileIndex {

  /** DataFrame over exactly `files`, with `partitionSchema` columns
    * appended after `dataSchema` (the same shape `spark.read.parquet`
    * with a `basePath` produces). */
  def frame(spark: SparkSession, basePath: String,
      files: Seq[(String, Long)], partitionSchema: StructType,
      dataSchema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rel = HadoopFsRelation(
      location = new ManifestFileIndex(basePath, files, partitionSchema),
      partitionSchema = partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(cs)
    cs.baseRelationToDataFrame(rel)
  }
}
