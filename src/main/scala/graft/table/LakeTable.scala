package graft.table

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.Serialization

/** One committed snapshot of a [[LakeTable]].
  *
  * @param version        monotonically increasing snapshot id
  * @param batchId        streaming micro-batch id that produced it (-1 for batch jobs)
  * @param txidWatermark  highest change-event _txid applied so far — the
  *                       exactly-once high-watermark (reference analogue:
  *                       _etag state extraction for snapshot diffing,
  *                       /root/reference/lib/backup_state.js:135-143)
  * @param schemaJson     table schema (Spark DataType JSON) as of this commit —
  *                       schema evolution = new commit with a wider schema
  * @param buckets        bucket id -> data directory (relative to table root)
  *                       holding that bucket's current rows; untouched buckets
  *                       carry forward across commits so MERGE only rewrites
  *                       affected buckets (partition-pruned upsert)
  * @param rowCounts      bucket id -> row count (lineage/metrics)
  * @param metrics        free-form counters for the commit (applied/deleted/...)
  */
case class Commit(
    version: Long,
    batchId: Long,
    txidWatermark: Long,
    schemaJson: String,
    buckets: Map[String, String],
    rowCounts: Map[String, Long],
    metrics: Map[String, Long]) {
  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
}

/** An Iceberg-*semantics* table over plain Parquet + a JSON commit log.
  *
  * No Iceberg/Delta jars exist in this sandbox, so the transactional
  * behaviors the north rule needs are implemented directly:
  *   - snapshot isolation: readers pin the latest commit file; data files
  *     are immutable; a commit is a single atomic rename;
  *   - atomic commits: write `_commits/.tmp-*` then ATOMIC_MOVE to
  *     `_commits/%012d.json` (fails if a concurrent writer won);
  *   - schema evolution: every commit records its schema; readers apply
  *     the latest schema over all live files (older files lack new
  *     columns → read as null);
  *   - exactly-once: `txidWatermark` + `batchId` let a replayed batch
  *     detect it was already applied and no-op;
  *   - layout: rows hash-bucketed by conv_id into `numBuckets` buckets,
  *     so an upsert touches only the buckets its keys hash to, and a
  *     point lookup prunes to one bucket.
  *
  * At 100 TB the same design holds: buckets are the unit of rewrite and
  * pruning (set numBuckets ~ cluster parallelism × small factor), the
  * commit log stays tiny (one JSON per commit, O(numBuckets) entries).
  */
class LakeTable(val location: String, val numBuckets: Int = 64) {
  private implicit val fmts: Formats = DefaultFormats
  private val root: Path = Paths.get(location)
  private val commitsDir: Path = root.resolve("_commits")

  def bucketCol(conv: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(conv), lit(numBuckets.toLong)).cast("int")

  def currentCommit(): Option[Commit] = {
    if (!Files.isDirectory(commitsDir)) return None
    val latest = Files.list(commitsDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .toSeq.sortBy(_.getFileName.toString).lastOption
    latest.map(p => Serialization.read[Commit](Files.readString(p)))
  }

  def txidWatermark: Long = currentCommit().map(_.txidWatermark).getOrElse(0L)

  /** Read the live rows of the latest snapshot (tombstones filtered). */
  def read(spark: SparkSession): DataFrame = {
    val raw = readRaw(spark)
    if (raw.columns.contains("_deleted"))
      raw.where(!coalesce(col("_deleted"), lit(false))).drop("_deleted")
    else raw
  }

  /** Read the latest snapshot INCLUDING delete tombstones (the merge
    * path needs them for the per-key version gate). */
  def readRaw(spark: SparkSession): DataFrame = currentCommit() match {
    case None => spark.emptyDataFrame
    case Some(c) => readCommit(spark, c, c.buckets.keys.map(_.toInt).toSeq)
  }

  /** Snapshot read pruned to the given buckets (MERGE reads only the
    * buckets the incoming keys hash to); tombstones included. */
  def readBuckets(spark: SparkSession, buckets: Seq[Int]): DataFrame =
    currentCommit() match {
      case None => spark.emptyDataFrame
      case Some(c) => readCommit(spark, c, buckets)
    }

  /** All commits in version order (the commit log is tiny: one small
    * JSON per commit). */
  def commitLog(): Seq[Commit] = {
    if (!Files.isDirectory(commitsDir)) return Seq.empty
    val files = {
      val s = Files.list(commitsDir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.getFileName.toString.endsWith(".json"))
          .toSeq.sortBy(_.getFileName.toString)
      } finally s.close()
    }
    files.map(p => Serialization.read[Commit](Files.readString(p)))
  }

  private def readCommit(spark: SparkSession, c: Commit, buckets: Seq[Int]): DataFrame = {
    val live = buckets.flatMap(b => c.buckets.get(b.toString))
    if (live.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], c.schema)
    // Each bucket dir was written by exactly one commit (path encodes the
    // version), under that commit's schema. Schema evolution may PROMOTE
    // column types (int→double→string), which parquet cannot coerce at
    // scan time — so read every file group under its writer's schema and
    // cast up to the latest (reader-side promotion, SURVEY.md §7 hard
    // part (c)). Single-schema tables take the single-scan fast path.
    val byVersion = live.groupBy(rel => rel.split("/")(1)) // data/cVVV/_bucket=N
    val schemas = commitLog().map(cm => f"c${cm.version}%012d" -> cm.schema).toMap
    val latest = c.schema
    def castUp(df: DataFrame): DataFrame =
      df.select(latest.fields.map { f =>
        if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
    val distinctSchemas = byVersion.keys.flatMap(schemas.get).map(_.json).toSet
    // fast path (one scan) only when nothing needs reader-side promotion;
    // add-only evolution is fine here (missing columns read as null)
    val addOnly = distinctSchemas.forall { sj =>
      val s = DataType.fromJson(sj).asInstanceOf[StructType]
      s.fields.forall(f => latest.find(_.name == f.name)
        .exists(_.dataType == f.dataType))
    }
    if (addOnly)
      spark.read.schema(latest).parquet(live.map(r => root.resolve(r).toString): _*)
    else byVersion.toSeq.sortBy(_._1).map { case (ver, rels) =>
      val writerSchema = schemas.getOrElse(ver, latest)
      castUp(spark.read.schema(writerSchema)
        .parquet(rels.map(r => root.resolve(r).toString): _*))
    }.reduce(_ unionByName _)
  }

  def nextVersion: Long = currentCommit().map(_.version + 1).getOrElse(1L)

  /** Atomically publish a new snapshot. `rewritten` are the buckets this
    * commit touched: Some(relativeDir) replaces the bucket's data, None
    * removes the bucket entirely (every row deleted). All other buckets
    * carry forward from the previous commit. */
  def commit(
      schema: StructType,
      rewritten: Map[Int, Option[String]],
      newRowCounts: Map[Int, Long],
      txidWatermark: Long,
      batchId: Long,
      metrics: Map[String, Long]): Commit = {
    Files.createDirectories(commitsDir)
    val prev = currentCommit()
    val version = prev.map(_.version + 1).getOrElse(1L)
    val carried = prev.map(_.buckets).getOrElse(Map.empty)
    val carriedCounts = prev.map(_.rowCounts).getOrElse(Map.empty)
    val dropped = rewritten.collect { case (k, None) => k.toString }.toSet
    val c = Commit(
      version, batchId, txidWatermark, schema.json,
      (carried -- dropped) ++ rewritten.collect { case (k, Some(v)) => k.toString -> v },
      (carriedCounts -- dropped) ++ newRowCounts.map { case (k, v) => k.toString -> v },
      metrics)
    val tmp = Files.createTempFile(commitsDir, ".tmp-", ".json")
    Files.writeString(tmp, Serialization.write(c))
    val target = commitsDir.resolve(f"$version%012d.json")
    // ATOMIC_MOVE: exactly one writer wins a version; a loser throws and
    // the caller re-reads the log and retries (single-writer here).
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    c
  }

  /** Compact the table: rewrite every live bucket, dropping delete
    * tombstones whose _txid < `tombstoneHorizon`. A tombstone guards
    * against resurrection by stale (lower-txid) updates, so it may only
    * be dropped once no event older than it can still arrive — the
    * caller supplies that lateness bound (e.g. watermark − maxLag).
    * Also merges the per-commit small files of each bucket into one
    * rewrite, bounding read amplification after many commits. */
  def compact(spark: SparkSession, tombstoneHorizon: Long): Option[Commit] =
    currentCommit().map { c =>
      val keep = readRaw(spark).where(
        !coalesce(col("_deleted"), lit(false)) || col("_txid") >= tombstoneHorizon)
      val version = c.version + 1
      val rel = f"data/c$version%012d"
      keep.withColumn("_bucket", bucketCol(col("conv_id")))
        .repartition(col("_bucket"))
        .write.mode("overwrite").partitionBy("_bucket")
        .parquet(root.resolve(rel).toString)
      val dirs = {
        val s = Files.list(root.resolve(rel))
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString)
            .filter(_.startsWith("_bucket=")).toList
        } finally s.close()
      }
      val rewritten: Map[Int, Option[String]] =
        c.buckets.keys.map(_.toInt).map { b =>
          b -> (if (dirs.contains(s"_bucket=$b")) Some(s"$rel/_bucket=$b") else None)
        }.toMap
      commit(c.schema, rewritten, Map.empty, c.txidWatermark, -1L,
        Map("compaction" -> 1L, "tombstoneHorizon" -> tombstoneHorizon))
    }

  /** True if a streaming micro-batch with this id was already committed
    * (crash-replay idempotence check). */
  def hasBatch(batchId: Long): Boolean = {
    if (!Files.isDirectory(commitsDir) || batchId < 0) return false
    Files.list(commitsDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .exists(p => Serialization.read[Commit](Files.readString(p)).batchId == batchId)
  }
}
