package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Parquet with field-id resolution FORCED ON for this relation only — the
  * read path of id-tracked versioned tables (metadata-only RENAME COLUMN:
  * old files keep the old physical name, the stamped `parquet.field.id`
  * matches the manifest's column id).
  *
  * Why a subclass: Spark honors `spark.sql.parquet.fieldId.read.enabled`
  * ONLY from the session conf — per-relation reader options never reach the
  * task-side hadoop conf under the exact-cased key ParquetReadSupport looks
  * up — and flipping the shared session conf from inside a read is a
  * lasting side effect on unrelated parquet scans (user schemas carrying
  * field-id metadata against id-less files would start erroring). Forcing
  * the flag into THIS relation's hadoop conf at reader-build time scopes it
  * to exactly the files whose ids we stamped ourselves. Same move as
  * Delta's DeltaParquetFileFormat (its column-mapping read path).
  * Registered by class name via `DataFrameReader.format`, so everything
  * else — vectorization, filter pushdown, `_metadata.row_index` — is
  * inherited untouched. */
final class GraftParquetFileFormat extends ParquetFileFormat {
  override def shortName(): String = "graft-parquet-by-id"

  override def toString: String = "GraftParquetByFieldId"

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    hadoopConf.setBoolean("spark.sql.parquet.fieldId.read.enabled", true)
    super.buildReaderWithPartitionValues(sparkSession, dataSchema,
      partitionSchema, requiredSchema, filters, options, hadoopConf)
  }
}
