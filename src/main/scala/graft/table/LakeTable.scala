package graft.table

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}
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
  * @param buckets        bucket id -> BASE data directory (relative to table
  *                       root) holding that bucket's current rows; untouched
  *                       buckets carry forward across commits so MERGE only
  *                       rewrites affected buckets (partition-pruned upsert)
  * @param rowCounts      bucket id -> physical row count INCLUDING that
  *                       bucket's delta rows (lineage; a key superseded by a
  *                       delta counts once per physical row until the fold)
  * @param metrics        free-form counters for the commit (applied/deleted/...)
  * @param queryId        stream identity that produced the batch (sink-side
  *                       exactly-once is scoped (queryId, batchId))
  * @param deltas         MERGE-ON-READ delta dirs PER BUCKET: bucket id ->
  *                       the stack of small parquet dirs (each
  *                       `data/cVVVd/_bucket=B`) appended since that
  *                       bucket's last fold. Per-bucket tracking makes the
  *                       three costly operations proportional to the HOT
  *                       data, not the table: reads prune delta paths by
  *                       bucket, depth is tracked per bucket, and a fold
  *                       rewrites only the buckets at the depth cap —
  *                       Iceberg MoR semantics with bucket-granular
  *                       maintenance. Readers resolve base ∪ deltas per key
  *                       by max _txid; a fold / compaction clears the
  *                       folded buckets' stacks
  * @param deltaRowCounts bucket id -> physical row count of each dir in
  *                       that bucket's delta stack (parallel to `deltas`;
  *                       empty for pre-upgrade commits). Lets the apply
  *                       decide CONSOLIDATE (merge the stack into one
  *                       delta, base untouched) vs FOLD (rewrite the
  *                       base) from commit metadata alone
  * @param renames        retired column name -> CURRENT name, flattened
  *                       across chained renames (a→b then b→c stores
  *                       a→c and b→c). Written by
  *                       [[LakeTable.renameColumn]] — a metadata-only
  *                       schema update, Iceberg ALTER TABLE RENAME
  *                       COLUMN semantics: no data file is rewritten;
  *                       readers map each pre-rename dir's columns onto
  *                       the current names at scan time, and the apply
  *                       path maps late producers still emitting a
  *                       retired key onto its current column
  */
case class Commit(
    version: Long,
    batchId: Long,
    txidWatermark: Long,
    schemaJson: String,
    buckets: Map[String, String],
    rowCounts: Map[String, Long],
    metrics: Map[String, Long],
    queryId: String = "",
    deltas: Map[String, Seq[String]] = Map.empty,
    deltaRowCounts: Map[String, Seq[Long]] = Map.empty,
    renames: Map[String, String] = Map.empty) {
  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]

  /** All delta dirs currently stacked on the table. */
  def deltaFiles: Seq[String] = deltas.values.flatten.toSeq.distinct

  /** Deepest per-bucket delta stack (read-amplification gauge). */
  def deltaDepth: Int = deltas.values.foldLeft(0)((m, s) => math.max(m, s.size))

  def deltaDepthOf(bucket: Int): Int =
    deltas.get(bucket.toString).map(_.size).getOrElse(0)

  /** Physical rows in the bucket's delta stack, if counts are tracked
    * for every dir in it (None for stacks predating count tracking —
    * callers must fall back to a full fold). */
  def deltaRowsOf(bucket: Int): Option[Long] = {
    val stack = deltas.getOrElse(bucket.toString, Nil)
    val counts = deltaRowCounts.getOrElse(bucket.toString, Nil)
    if (counts.size == stack.size) Some(counts.sum) else None
  }

  /** Physical rows in the bucket's BASE files (rowCounts minus the
    * tracked delta rows). */
  def baseRowsOf(bucket: Int): Option[Long] =
    rowCounts.get(bucket.toString).flatMap(total =>
      deltaRowsOf(bucket).map(d => math.max(0L, total - d)))
}

/** Rollup of the commit log up to (and including) one version: the
  * state a reader needs without the per-commit history — written by
  * [[LakeTable.checkpointLog]], after which the subsumed commit JSONs
  * are deleted. At 10^10 events a tail produces ~10^5 micro-batch
  * commits; without truncation the log directory's listing alone
  * becomes the per-batch bottleneck (O(commits) per batch, O(commits²)
  * per stream).
  *
  * @param commit            table state as of the checkpoint
  * @param schemasByVersion  "cVVVVV" -> writer schema JSON for every
  *                          data dir the checkpointed commit still
  *                          references (reader-side type promotion
  *                          needs the WRITER's schema per dir)
  * @param maxBatchIdByQuery newest batchId committed per stream
  *                          identity — batch ids are monotonic per
  *                          queryId, so idempotence after truncation
  *                          is `batchId <= max` */
private[table] case class LogCheckpoint(
    commit: Commit,
    schemasByVersion: Map[String, String],
    maxBatchIdByQuery: Map[String, Long])

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

  /** The bucket count the table's data is ACTUALLY laid out with: the
    * count persisted in the retained commit log when one exists, the
    * constructor's `numBuckets` only for a fresh table. Every commit
    * carries the layout count forward in its metrics, so re-opening an
    * existing table with a mismatched constructor value cannot split a
    * key's history across two hash spaces (the write path would
    * otherwise route updates for a key to a different bucket than its
    * stored row and the merge gate would never see them). */
  def effectiveNumBuckets: Int = {
    val commits = cachedCommits()
    commits.reverseIterator
      .flatMap(_.metrics.get(LakeTable.NumBucketsKey)).nextOption()
      .map(_.toInt).getOrElse {
        // pre-metric table (written before the layout key was
        // persisted): the constructor has to be trusted, but a
        // PROVABLY wrong value is refused — a stored bucket id at or
        // above the claimed count can only come from a larger hash
        // space. (A too-large claim over a small-id population is not
        // detectable; the first commit through this code pins the
        // count and ends the exposure.)
        commits.lastOption.foreach { c =>
          val maxId = (c.buckets.keySet ++ c.deltas.keySet).map(_.toInt)
            .maxOption.getOrElse(-1)
          require(maxId < numBuckets,
            s"table at $location holds bucket $maxId but this handle " +
              s"claims numBuckets=$numBuckets — existing table opened " +
              "with a wrong bucket count")
        }
        numBuckets
      }
  }

  def bucketCol(conv: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    LakeTable.bucketColFor(conv, effectiveNumBuckets)

  /** Cached parse of the commit log (checkpoint rollup + commits after
    * it). The cache is keyed on the set of commit FILENAMES (a cheap
    * directory listing), so external writers are still picked up, but
    * the JSON bodies are deserialized at most once per new commit —
    * without this, a long stream's per-batch idempotence check
    * (hasBatch) re-parses every commit every batch, O(commits²) over
    * the stream's lifetime. */
  @volatile private var commitCache:
    (Seq[String], (Option[(LogCheckpoint, Long)], Seq[Commit])) =
    (Seq.empty, (None, Seq.empty))

  private def listLogFiles(): Seq[Path] = {
    if (!Files.isDirectory(commitsDir)) return Seq.empty
    val s = Files.list(commitsDir)
    try s.iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        // ".tmp-*" are in-flight atomic-publish temps — never parse them
        n.endsWith(".json") && !n.startsWith(".")
      }
      .toSeq.sortBy(_.getFileName.toString)
    finally s.close()
  }

  /** (newest checkpoint with its version, commits strictly after it). */
  private def cachedState(): (Option[(LogCheckpoint, Long)], Seq[Commit]) = {
    val files = listLogFiles()
    val names = files.map(_.getFileName.toString)
    val cached = commitCache
    if (cached._1 == names) cached._2
    else {
      val (ckptFiles, commitFiles) =
        files.partition(_.getFileName.toString.endsWith(".ckpt.json"))
      val ckpt = ckptFiles.lastOption.map { p =>
        val parsed = Serialization.read[LogCheckpoint](Files.readString(p))
        (parsed, parsed.commit.version)
      }
      val horizon = ckpt.map(_._2).getOrElse(0L)
      val parsed = commitFiles
        .map { p =>
          val body = Files.readString(p)
          // pre-bucket-partitioned commits stored un-bucketed delta dirs
          // under `deltaFiles`; silently ignoring them would DROP their
          // rows from every read and let vacuum delete them — refuse
          // loudly instead (fold/compact with the writing version first)
          if (body.contains("\"deltaFiles\"")) {
            val legacy = org.json4s.jackson.JsonMethods.parse(body) \ "deltaFiles"
            legacy match {
              case org.json4s.JArray(xs) if xs.nonEmpty =>
                throw new UnsupportedOperationException(
                  s"commit ${p.getFileName} carries pre-upgrade un-bucketed " +
                    "delta dirs (deltaFiles) this version cannot read; " +
                    "compact the table with the version that wrote it " +
                    "before upgrading")
              case _ =>
            }
          }
          Serialization.read[Commit](body)
        }
        .filter(_.version > horizon)
      val state = (ckpt, parsed)
      commitCache = (names, state)
      state
    }
  }

  private def cachedCommits(): Seq[Commit] = {
    val (ckpt, later) = cachedState()
    ckpt.map(_._1.commit).toSeq ++ later
  }

  def currentCommit(): Option[Commit] = cachedCommits().lastOption

  /** Number of files currently in the commit log (checkpoint trigger
    * gauge for long-lived streams). */
  def commitLogSize: Int = listLogFiles().size

  /** Roll the commit log up into one checkpoint file and delete the
    * subsumed per-commit JSONs. History BEFORE the checkpoint is no
    * longer readable (the same trade [[vacuum]] makes for data dirs);
    * the current snapshot, per-dir writer schemas, and per-stream batch
    * idempotence all survive. Keeps the log directory O(commits since
    * last checkpoint) instead of O(stream lifetime). */
  def checkpointLog(): Unit = {
    val (prevCkpt, later) = cachedState()
    val current = currentCommit().getOrElse(return)
    val live: Set[String] = (current.buckets.values ++ current.deltas.values.flatten)
      .map(rel => rel.split("/")(1).stripSuffix("d")).toSet
    val schemas = schemasByVersion().filter { case (v, _) => live.contains(v) }
    val maxBatch: Map[String, Long] = {
      val base = prevCkpt.map(_._1.maxBatchIdByQuery).getOrElse(Map.empty)
      later.filter(_.batchId >= 0).foldLeft(base) { (m, c) =>
        m.updated(c.queryId, math.max(c.batchId, m.getOrElse(c.queryId, -1L)))
      }
    }
    val ckpt = LogCheckpoint(current, schemas, maxBatch)
    val tmp = Files.createTempFile(commitsDir, ".tmp-", ".ckpt")
    Files.writeString(tmp, Serialization.write(ckpt))
    Files.move(tmp, commitsDir.resolve(f"${current.version}%012d.ckpt.json"),
      StandardCopyOption.ATOMIC_MOVE)
    // delete subsumed files: all plain commits ≤ version, older ckpts
    listLogFiles().foreach { p =>
      val name = p.getFileName.toString
      val isCkpt = name.endsWith(".ckpt.json")
      val ver = name.stripSuffix(if (isCkpt) ".ckpt.json" else ".json").toLongOption
      val subsumed = ver.exists(v =>
        (isCkpt && v < current.version) || (!isCkpt && v <= current.version))
      if (subsumed) Files.deleteIfExists(p)
    }
  }

  /** Writer schema per data-dir version key ("cVVVVV"): reader-side
    * type promotion casts each file group up from the schema it was
    * WRITTEN under. Sourced from the checkpoint rollup plus every
    * commit after it. */
  private def schemasByVersion(): Map[String, String] = {
    val (ckpt, later) = cachedState()
    ckpt.map(_._1.schemasByVersion).getOrElse(Map.empty) ++
      later.map(cm => f"c${cm.version}%012d" -> cm.schemaJson)
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
    // every LIVE bucket from the commit itself (base keys ∪ delta keys —
    // deltas may hold buckets with no base yet), so full-table reads are
    // independent of the constructor's numBuckets (a reader — e.g. the
    // SQL facade — need not know the writer's bucket count)
    case Some(c) => readCommit(spark, c,
      (c.buckets.keySet ++ c.deltas.keySet).toSeq.map(_.toInt).sorted)
  }

  /** Snapshot read pruned to the given buckets (MERGE reads only the
    * buckets the incoming keys hash to); tombstones included.
    * `resolve = false` skips the merge-on-read per-key resolution and
    * returns every physical row (base + all deltas) — for consumers
    * that aggregate per key themselves (e.g. the apply gate's
    * max-txid, which would otherwise pay a full window shuffle per
    * micro-batch just to read back a handful of keys). */
  def readBuckets(spark: SparkSession, buckets: Seq[Int],
      resolve: Boolean = true): DataFrame =
    currentCommit() match {
      case None => spark.emptyDataFrame
      case Some(c) => readCommit(spark, c, buckets, resolve)
    }

  /** The physical rows of ONLY the given buckets' delta stacks (no base
    * files, no per-key resolution) — the input to a two-level stack
    * consolidation, which re-resolves and rewrites them as one dir. */
  def readDeltaStacks(spark: SparkSession, buckets: Seq[Int]): DataFrame =
    currentCommit() match {
      case None => spark.emptyDataFrame
      case Some(c) => readCommit(spark, c, buckets, resolve = false,
        includeBase = false)
    }

  /** All RETAINED commits in version order: one small JSON per commit,
    * plus the rollup commit if [[checkpointLog]] has truncated older
    * history. */
  def commitLog(): Seq[Commit] = cachedCommits()

  /** Time travel (Iceberg `VERSION AS OF` semantics): the table's live
    * rows as of a past commit, so a downstream job can pin a
    * REPRODUCIBLE snapshot while the streaming tail keeps committing.
    * Valid for versions still in the retained commit log whose data
    * dirs have not been garbage-collected — [[checkpointLog]] (history
    * rollup) and [[vacuum]] (data-dir GC) both shrink the travelable
    * window, the standard lakehouse retention trade; refusal is an
    * explicit error, never a silently partial read. */
  def readVersion(spark: SparkSession, version: Long): DataFrame = {
    val c = commitLog().find(_.version == version).getOrElse(
      throw new IllegalArgumentException(
        s"version $version is not in the retained commit log at $location " +
          "(never existed, or rolled up by checkpointLog)"))
    val gone = (c.buckets.values ++ c.deltaFiles)
      .filterNot(rel => Files.exists(root.resolve(rel))).toSeq.distinct
    if (gone.nonEmpty) throw new IllegalArgumentException(
      s"version $version references vacuumed data (${gone.take(4).mkString(", ")}" +
        s"${if (gone.size > 4) ", …" else ""}) — outside the retention window")
    val raw = readCommit(spark, c,
      (c.buckets.keySet ++ c.deltas.keySet).toSeq.map(_.toInt).sorted)
    if (raw.columns.contains("_deleted"))
      raw.where(!coalesce(col("_deleted"), lit(false))).drop("_deleted")
    else raw
  }

  /** The newest retained version whose txid high-watermark is ≤ `txid`
    * — time travel by changelog position instead of version number
    * (`readVersion(versionAt(tx).get)` = "the table as of event tx"). */
  def versionAt(txid: Long): Option[Long] =
    commitLog().takeWhile(_.txidWatermark <= txid).lastOption.map(_.version)

  /** Incremental changelog read — the table as a CHANGE PRODUCER
    * (Delta CDF / Iceberg `create_changelog_view` semantics, the
    * reverse direction of the ingest path): the net row-level changes
    * between snapshot `fromVersion` (exclusive) and `toVersion`
    * (inclusive), as the target schema plus a `_change_type` column
    * (`insert` | `update` | `delete`). Inserts and updates carry the
    * post-image; a delete carries the pre-image, both projected onto
    * `toVersion`'s schema and column names — a declared rename inside
    * the range surfaces every change under the CURRENT names. A key
    * both created and deleted inside the range nets out to nothing
    * (this is the net-changes form — one row per changed key, not the
    * Delta pre/post pair). Reference analogue: the `_etag`-keyed
    * snapshot diff the shell pipeline re-derives from full dumps,
    * /root/reference/manta/dc_diff.sh — here it is a metadata-pruned
    * lake read instead of a full re-scan.
    *
    * Scale shape: the range's commits are diffed METADATA-first —
    * only buckets whose base dir or delta stack changed across the
    * range are scanned and per-key resolved at the two endpoint
    * versions, so cost is O(churned buckets' data), never O(table).
    * Maintenance commits (consolidate / fold / compact / rename /
    * vacuum rewrites) change bucket metadata without logical content;
    * their buckets are read but contribute no rows — the per-key
    * null-safe (_txid, _etag) equality filter drops them.
    *
    * `fromVersion` 0 means "before the first commit": every live row
    * at `toVersion` is an `insert` (bootstrap feed for a new
    * downstream consumer). Only the two ENDPOINT versions must still
    * be in the retained commit log with un-vacuumed data — data dirs
    * are version-stamped (`data/cVVV[d]`) and bucket pointers only
    * move forward, so equal pointers at both endpoints prove the
    * bucket was untouched by every commit in between; intermediate
    * commit JSONs are never consulted. Refusal is an explicit error,
    * never a silently partial changelog. A consumer that must
    * out-live [[checkpointLog]] rollups keeps its own copy of the
    * from-endpoint `Commit` and calls the Commit-based overload
    * directly (what [[graft.cdc.CdcOut]] does). */
  def changesBetween(spark: SparkSession, fromVersion: Long,
      toVersion: Long): DataFrame = {
    val (from, to) = resolveEndpoints(fromVersion, toVersion)
    changesBetween(spark, from, to)
  }

  /** [[changesBetween]] by version in the Delta-CDF image-pair form
    * (see the Commit-based overload's `imagePairs` doc). */
  def changesBetween(spark: SparkSession, fromVersion: Long,
      toVersion: Long, imagePairs: Boolean): DataFrame = {
    val (from, to) = resolveEndpoints(fromVersion, toVersion)
    changesBetween(spark, from, to, imagePairs)
  }

  private def resolveEndpoints(fromVersion: Long,
      toVersion: Long): (Option[Commit], Commit) = {
    require(fromVersion >= 0 && fromVersion < toVersion,
      s"need 0 <= fromVersion < toVersion, got $fromVersion..$toVersion")
    val byVer = commitLog().map(c => c.version -> c).toMap
    def lookup(v: Long): Commit = byVer.getOrElse(v,
      throw new IllegalArgumentException(
        s"version $v is not in the retained commit log at $location " +
          "(never existed, or rolled up by checkpointLog) — changelog " +
          "endpoint unavailable"))
    (if (fromVersion == 0) None else Some(lookup(fromVersion)),
      lookup(toVersion))
  }

  /** [[changesBetween]] with caller-held endpoint commits — `from`
    * None means "before the first commit" (bootstrap). The commits
    * must be genuine past commits of THIS table (a consumer's saved
    * watermark, a [[commitLog]] entry); only their data dirs still
    * have to exist, so a lagging consumer survives commit-log
    * rollups as long as its pull cadence beats [[vacuum]]'s data
    * retention window.
    *
    * `imagePairs` selects the Delta-CDF full form: an updated key
    * emits TWO rows, `update_preimage` (the from-endpoint values) and
    * `update_postimage` (the to-endpoint values), instead of the net
    * form's single `update` post-image row — what an auditing or
    * incremental-aggregation consumer needs to SUBTRACT the old
    * contribution before adding the new. Inserts and deletes are
    * unchanged. Same single diff join either way — the pair form just
    * explodes each update match into both sides. */
  def changesBetween(spark: SparkSession, from: Option[Commit],
      to: Commit, imagePairs: Boolean = false): DataFrame = {
    from.foreach(f => require(f.version < to.version,
      s"need from.version < to.version, got ${f.version}..${to.version}"))
    // metadata diff at the ENDPOINTS: a bucket is TOUCHED iff its base
    // dir or delta stack differs between the two commits (pointers are
    // version-stamped and monotonic — they cannot differ mid-range and
    // return)
    val (fb, fd) = from.map(c => (c.buckets, c.deltas))
      .getOrElse((Map.empty[String, String], Map.empty[String, Seq[String]]))
    val touched: Seq[Int] =
      (fb.keySet ++ to.buckets.keySet ++ fd.keySet ++ to.deltas.keySet)
        .filter(b => fb.get(b) != to.buckets.get(b) ||
          fd.getOrElse(b, Nil) != to.deltas.getOrElse(b, Nil))
        .toSeq.map(_.toInt).sorted
    val outFields = to.schema.fields.filterNot(_.name == "_deleted").toSeq
    val outSchema = StructType(outFields :+
      StructField("_change_type", org.apache.spark.sql.types.StringType))
    def emptyOut = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    if (touched.isEmpty) return emptyOut
    // retention check scoped to the dirs this diff will actually read
    Seq(Some(to), from).flatten.foreach { c =>
      val rels = touched.flatMap(b => c.buckets.get(b.toString)) ++
        touched.flatMap(b => c.deltas.getOrElse(b.toString, Nil))
      val gone = rels.distinct.filterNot(rel => Files.exists(root.resolve(rel)))
      if (gone.nonEmpty) throw new IllegalArgumentException(
        s"version ${c.version} references vacuumed data " +
          s"(${gone.take(4).mkString(", ")}${if (gone.size > 4) ", …" else ""}) " +
          "— changelog range outside the retention window")
    }
    // both endpoint states on toVersion's column names and types: map
    // names the TO-version has since retired onto their current names
    // (readCommit already applied each endpoint's OWN rename registry),
    // drop tombstoned rows, then cast up
    def liveAs(df: DataFrame): DataFrame = {
      val renamed = to.renames.foldLeft(df) { case (d, (oldName, curName)) =>
        if (d.columns.contains(oldName) && !d.columns.contains(curName))
          d.withColumnRenamed(oldName, curName)
        else d
      }
      val live =
        if (renamed.columns.contains("_deleted"))
          renamed.where(!coalesce(col("_deleted"), lit(false)))
        else renamed
      live.select(outFields.map { f =>
        if (live.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    }
    val post = liveAs(readCommit(spark, to, touched))
    val pre = from.map(c => liveAs(readCommit(spark, c, touched)))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(outFields)))
    // churn-sized full-outer diff on the merge keys; version identity is
    // the null-safe (_txid, _etag) pair, so maintenance-only rewrites
    // (same logical rows, new files) compare equal and emit nothing.
    // `_change_type` is RESERVED (Delta CDF convention) — a payload
    // column by that name would silently shadow the classification
    val keys = graft.model.Model.MergeKeys
    val nonKey = outFields.map(_.name).filterNot(keys.contains)
    require(!nonKey.contains("_change_type"),
      s"payload column _change_type at $location conflicts with the " +
        "changelog's reserved classification column — rename it first")
    // each side packed into ONE struct column, so arbitrary payload
    // column names (the novel-key absorber admits anything, including
    // names like `present`) cannot collide with the join's bookkeeping:
    // the only top-level aux names are __n/__o, and tag() projects
    // nothing else, while the merge keys are structural and fixed
    def tag(df: DataFrame, p: String) = df.select(
      keys.map(col) :+ struct(nonKey.map(col): _*).as(s"__$p"): _*)
    val j = tag(post, "n").join(tag(pre, "o"), keys.toSeq, "full_outer")
    val unchanged = col("__n").isNotNull && col("__o").isNotNull &&
      (col("__n").getField("_txid") <=> col("__o").getField("_txid")) &&
      (col("__n").getField("_etag") <=> col("__o").getField("_etag"))
    if (!imagePairs) {
      val changeType = when(col("__o").isNull, lit("insert"))
        .when(col("__n").isNull, lit("delete"))
        .otherwise(lit("update"))
      j.where(!unchanged).select(
        (keys.map(col) ++ nonKey.map(c =>
          when(col("__n").isNull, col("__o").getField(c))
            .otherwise(col("__n").getField(c)).as(c))) :+
          changeType.as("_change_type"): _*)
    } else {
      // full form: one join, each update match exploded into its
      // pre- and post-image rows
      def img(side: String, ct: String) = struct(
        nonKey.map(c => col(s"__$side").getField(c).as(c)) :+
          lit(ct).as("_change_type"): _*)
      val images = when(col("__o").isNull, array(img("n", "insert")))
        .when(col("__n").isNull, array(img("o", "delete")))
        .otherwise(array(
          img("o", "update_preimage"), img("n", "update_postimage")))
      j.where(!unchanged)
        .select(keys.map(col) :+ explode(images).as("__img"): _*)
        .select(keys.map(col) ++ (nonKey :+ "_change_type").map(c =>
          col("__img").getField(c).as(c)): _*)
    }
  }


  /** Build `f`'s scans with file listing kept ON THE DRIVER: the
    * engine's data dirs are a manifest-known layout (one `_bucket=N`
    * dir per bucket, written by this table's own commits), so Spark's
    * distributed listing job — launched whenever a read spans more
    * than `parallelPartitionDiscovery.threshold` (default 32) paths —
    * is pure overhead: ~0.1-0.6 s of job scheduling PER READ, growing
    * with delta-stack depth (measured 0.7 s/batch of the steady-state
    * CDC floor at depth 5), to list dirs the driver can stat in
    * microseconds. Iceberg/Delta avoid the same cost by carrying file
    * manifests; until commits track file names, driver-side listing
    * of O(buckets × depth) dirs is the equivalent. Conf is restored
    * after the scans are built (listing happens eagerly at
    * `spark.read`); the engine's single-writer-per-session model (see
    * commit()) makes the temporary session flip safe. */
  private def withDriverListing[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "8192")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def readCommit(spark: SparkSession, c: Commit, buckets: Seq[Int],
      resolve: Boolean = true, includeBase: Boolean = true): DataFrame =
    withDriverListing(spark) {
      readCommitInner(spark, c, buckets, resolve, includeBase)
    }

  private def readCommitInner(spark: SparkSession, c: Commit, buckets: Seq[Int],
      resolve: Boolean, includeBase: Boolean): DataFrame = {
    val base =
      if (includeBase) buckets.flatMap(b => c.buckets.get(b.toString)) else Nil
    // delta dirs are bucket-partitioned, so pruning is PATH selection —
    // no per-row filter, and buckets without deltas skip resolve cost
    val deltaRels = buckets.flatMap(b => c.deltas.getOrElse(b.toString, Nil))
    if (base.isEmpty && deltaRels.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], c.schema)
    // Each data dir was written by exactly one commit (path encodes the
    // version), under that commit's schema. Schema evolution may PROMOTE
    // column types (int→double→string), which parquet cannot coerce at
    // scan time — so read every file group under its writer's schema and
    // cast up to the latest (reader-side promotion, SURVEY.md §7 hard
    // part (c)). Single-schema groups take the single-scan fast path.
    val schemas: Map[String, StructType] = schemasByVersion().map {
      case (v, j) => v -> DataType.fromJson(j).asInstanceOf[StructType]
    }
    val latest = c.schema
    // declared renames (metadata-only — data files keep the retired
    // name): map each pre-rename dir's columns onto the current names
    // before the cast-up projection. Stored dirs hold at most ONE of
    // {retired, current} (the apply path folds late old-key producers
    // into the current column before writing), so a plain rename
    // suffices — no per-row coalesce on the read path.
    def applyRenames(df: DataFrame): DataFrame =
      c.renames.foldLeft(df) { case (d, (oldName, curName)) =>
        if (d.columns.contains(oldName) && !d.columns.contains(curName))
          d.withColumnRenamed(oldName, curName)
        else d
      }
    def castUp(df: DataFrame): DataFrame =
      df.select(latest.fields.map { f =>
        if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
    def readGroup(rels: Seq[String]): Option[DataFrame] = {
      if (rels.isEmpty) return None
      // data/cVVV[/...] for bases, data/cVVVd[/...] for delta dirs —
      // both were written under commit VVV's schema
      val byVersion = rels.groupBy(rel => rel.split("/")(1).stripSuffix("d"))
      val distinctSchemas = byVersion.keys.flatMap(schemas.get).map(_.json).toSet
      // fast path (one scan) only when EVERY dir's writer schema is
      // known and nothing needs reader-side promotion; add-only
      // evolution is fine (missing columns → null) but a dir written
      // under a since-retired column name is not — a single
      // latest-schema scan would read the renamed column as all-null
      // instead of mapping the retired name onto it
      val addOnly = byVersion.keys.forall(schemas.contains) &&
        distinctSchemas.forall { sj =>
          val s = DataType.fromJson(sj).asInstanceOf[StructType]
          s.fields.forall(f => !c.renames.contains(f.name) &&
            latest.find(_.name == f.name).exists(_.dataType == f.dataType))
        }
      Some(
        if (addOnly)
          spark.read.schema(latest).parquet(rels.map(r => root.resolve(r).toString): _*)
        else byVersion.toSeq.sortBy(_._1).map { case (ver, grp) =>
          val paths = grp.map(r => root.resolve(r).toString)
          val scan = schemas.get(ver) match {
            case Some(ws) => spark.read.schema(ws).parquet(paths: _*)
            // a dir whose writer schema was pruned from the retained
            // log (a lagging consumer's endpoint commit after
            // checkpointLog rolled history up): the parquet footers
            // carry the written schema exactly, so infer from them and
            // promote/rename as usual — never scan old files under the
            // latest schema, which would crash on promoted types or
            // read renamed columns as all-null
            case None => spark.read.parquet(paths: _*)
          }
          castUp(applyRenames(scan))
        }.reduce(_ unionByName _))
    }
    val baseDf = readGroup(base)
    val deltaDf = readGroup(deltaRels.distinct)
    val combined = (baseDf, deltaDf) match {
      case (Some(b), Some(d)) => b.unionByName(d)
      case (Some(b), None) => b
      case (None, Some(d)) => d
      case (None, None) => return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], c.schema)
    }
    // MERGE-ON-READ resolve: a key may appear in the base and in any
    // number of delta files — the highest _txid wins (etag tiebreak for
    // duplicated txids). Skipped entirely when no deltas exist. A
    // max_by instead of a row_number window, and the ONE hash shuffle
    // is keyed by (BUCKET, SALT) — both functions of the merge keys,
    // appended as extra grouping columns: same shuffle volume (map-side
    // combine almost never fired on the key-hashed form — base and
    // delta rows of a key colocate per scan split only rarely), but
    // the resolved rows come out CLUSTERED BY BUCKET, so a fold can
    // stream them straight to its bucket-partitioned writer with no
    // further exchange and ≤ SaltBuckets files per bucket. The salt
    // keeps the aggregation's parallelism at numBuckets × SaltBuckets
    // (not numBuckets) and spreads a hot bucket's resolve across
    // SaltBuckets reducers instead of funneling it through one.
    // A bucket with NO base and at most ONE delta dir cannot hold a
    // duplicated key (each delta dir is one batch's per-key-unique
    // winners; a consolidated dir is per-key resolved) — so a freshly
    // bootstrapped delta-only table skips the resolve shuffle outright.
    val resolveFree = base.isEmpty && buckets.forall(b =>
      c.deltas.getOrElse(b.toString, Nil).size <= 1)
    if (deltaDf.isEmpty || !resolve || resolveFree) combined
    else {
      val keys = graft.model.Model.MergeKeys
      val allCols = combined.columns.toSeq
      val p = spark.sessionState.conf.numShufflePartitions
      val salt = pmod(xxhash64(col("conv_id"), col("turn_idx")),
        lit(LakeTable.SaltBuckets.toLong))
      combined.withColumn("__bkt", bucketCol(col("conv_id")))
        .withColumn("__slt", salt)
        .repartition(p, col("__bkt"), col("__slt"))
        .groupBy((Seq(col("__bkt"), col("__slt")) ++ keys.map(col)): _*)
        .agg(max_by(struct(allCols.map(col): _*),
          struct(col("_txid"), coalesce(col("_etag"), lit("")))).as("__m"))
        .select(col("__m.*"))
    }
  }

  def nextVersion: Long = currentCommit().map(_.version + 1).getOrElse(1L)

  /** Atomically publish a new snapshot. `rewritten` are the buckets this
    * commit REWROTE: Some(relativeDir) replaces the bucket's BASE data,
    * None removes the bucket entirely (every row deleted). A rewritten
    * bucket's delta stack is cleared — the rewrite read base ∪ deltas
    * resolved, so its new base subsumes them. All other buckets (bases
    * AND delta stacks) carry forward. `deltaAdds` appends one
    * (deltaDir, rowCount) per bucket to the delta stacks; `deltaReplaces`
    * REPLACES a bucket's whole stack with one consolidated dir (the
    * two-level merge: the stack was resolved into a single delta, base
    * untouched). A single commit may fold some buckets, consolidate
    * others, and delta the rest (the steady-state mixed apply),
    * atomically. */
  def commit(
      schema: StructType,
      rewritten: Map[Int, Option[String]],
      newRowCounts: Map[Int, Long],
      txidWatermark: Long,
      batchId: Long,
      metrics: Map[String, Long],
      queryId: String = "",
      deltaAdds: Map[Int, (String, Long)] = Map.empty,
      deltaReplaces: Map[Int, (String, Long)] = Map.empty): Commit = {
    // OPTIMISTIC CONCURRENCY (Iceberg-style): losing the ATOMIC_MOVE
    // race re-reads the log and, if every interleaved commit touched a
    // DISJOINT set of buckets, rebuilds this commit against the new
    // head and re-publishes — disjoint-bucket writes compose because
    // each commit carries every other bucket forward untouched. An
    // overlapping bucket is a TRUE conflict (our data files were
    // derived from a stale read of it) and raises
    // ConcurrentModificationException: the caller must redo its work
    // against the new snapshot (a crash-replayed stream batch does
    // this for free via checkpoint replay). Writers of the same kind
    // racing on the same version also race on the data-dir NAME
    // (data/cV vs cVd separates fold/compaction from delta commits,
    // but two delta writers share cVd) — the supported topology is one
    // streaming tail plus maintenance jobs, which never collide there.
    // intra-JVM: one attempt at a time per table handle (the base
    // version bookkeeping is per-instance); cross-process concurrency
    // is what the ATOMIC_MOVE + retry protocol arbitrates
    this.synchronized {
    var attempt = 0
    while (true) {
      try return commitOnce(schema, rewritten, newRowCounts, txidWatermark,
        batchId, metrics, queryId, deltaAdds, deltaReplaces)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempt += 1
          if (attempt > 5) throw new java.util.ConcurrentModificationException(
            s"lost the commit race $attempt times at $location — livelock?")
          // an interleaved RENAME commit conflicts with every writer:
          // this attempt's data files and `schema` were derived under
          // the pre-rename names, and re-publishing them would revert
          // the schema while the rename map still points at it — the
          // caller must redo the apply against the renamed snapshot
          // (which folds its batch onto the current names)
          if (currentCommit().exists(_.renames != attemptBaseRenames))
            throw new java.util.ConcurrentModificationException(
              s"concurrent column rename at $location — redo the apply " +
                "against the renamed snapshot")
          val mine: Set[Int] = rewritten.keySet ++ deltaAdds.keySet ++
            deltaReplaces.keySet ++ newRowCounts.keySet
          val theirs = modifiedBucketsSince(attemptBaseVersion)
          val overlap = mine intersect theirs
          if (overlap.nonEmpty) throw new java.util.ConcurrentModificationException(
            s"concurrent commit modified buckets ${overlap.toSeq.sorted.take(8)
              .mkString(",")} at $location — redo the apply against the new snapshot")
      }
    }
    throw new IllegalStateException("unreachable")
    }
  }

  /** Version this attempt's state was read from (conflict-window lower
    * bound for the optimistic retry). */
  @volatile private var attemptBaseVersion: Long = 0L

  /** Rename map at the attempt's base version — an interleaved commit
    * that CHANGED it (a renameColumn) is a true conflict for any data
    * writer (see commit()'s retry handler). */
  @volatile private var attemptBaseRenames: Map[String, String] = Map.empty

  /** Test-only race injection: runs after an attempt reads the log but
    * before it publishes, so a spec can land a competing commit in the
    * window deterministically (cleared after first use). */
  private[graft] var testBeforePublish: () => Unit = () => ()

  /** Buckets modified by any commit with version > `sinceVersion`:
    * the union, over each such commit, of keys whose base dir, delta
    * stack, or row count differs from its predecessor's. Commits no
    * longer in the retained log (checkpoint-truncated) are treated as
    * modifying everything — refusal is the safe answer. */
  private def modifiedBucketsSince(sinceVersion: Long): Set[Int] = {
    val log = cachedCommits()
    if (log.isEmpty) return Set.empty
    if (log.head.version > sinceVersion + 1)
      return (log.last.buckets.keySet ++ log.last.deltas.keySet).map(_.toInt)
    // log.head's own predecessor (version == sinceVersion) is never in
    // the retained log, so sliding(2) can't see head's changes. When the
    // head itself is inside the conflict window — two writers racing on
    // an empty table, or the attempt's base rolled into a checkpoint at
    // base+1 — count everything the head carries as modified (it has no
    // visible predecessor to diff against; refusal is the safe answer).
    val headOwn: Set[Int] =
      if (log.head.version == sinceVersion + 1)
        (log.head.buckets.keySet ++ log.head.deltas.keySet).map(_.toInt)
      else Set.empty
    headOwn ++ log.sliding(2).collect {
      case Seq(a, b) if b.version > sinceVersion =>
        val keys = a.buckets.keySet ++ b.buckets.keySet ++
          a.deltas.keySet ++ b.deltas.keySet
        keys.filter(k => a.buckets.get(k) != b.buckets.get(k) ||
          a.deltas.get(k) != b.deltas.get(k) ||
          a.rowCounts.get(k) != b.rowCounts.get(k)).map(_.toInt)
    }.flatten.toSet
  }

  private def commitOnce(
      schema: StructType,
      rewritten: Map[Int, Option[String]],
      newRowCounts: Map[Int, Long],
      txidWatermark: Long,
      batchId: Long,
      metrics: Map[String, Long],
      queryId: String,
      deltaAdds: Map[Int, (String, Long)],
      deltaReplaces: Map[Int, (String, Long)]): Commit = {
    val prev = currentCommit()
    attemptBaseVersion = prev.map(_.version).getOrElse(0L)
    attemptBaseRenames = prev.map(_.renames).getOrElse(Map.empty)
    val carried = prev.map(_.buckets).getOrElse(Map.empty)
    val carriedCounts = prev.map(_.rowCounts).getOrElse(Map.empty)
    val carriedDeltas = prev.map(_.deltas).getOrElse(Map.empty)
    val carriedDeltaCounts = prev.map(_.deltaRowCounts).getOrElse(Map.empty)
    val dropped = rewritten.collect { case (k, None) => k.toString }.toSet
    val clearedKeys = rewritten.keys.map(_.toString).toSet
    val newDeltas = deltaAdds.foldLeft(
      (carriedDeltas -- clearedKeys) ++
        deltaReplaces.map { case (b, (dir, _)) => b.toString -> Seq(dir) }) {
      case (m, (b, (dir, _))) => m.updated(b.toString, m.getOrElse(b.toString, Nil) :+ dir)
    }
    val newDeltaCounts = deltaAdds.foldLeft(
      (carriedDeltaCounts -- clearedKeys) ++
        deltaReplaces.map { case (b, (_, n)) => b.toString -> Seq(n) }) {
      case (m, (b, (_, n))) => m.updated(b.toString, m.getOrElse(b.toString, Nil) :+ n)
    }
    val rewrittenCounts = (carriedCounts -- dropped) ++
      newRowCounts.map { case (k, v) => k.toString -> v }
    // consolidation collapses duplicate keys: the bucket's physical
    // count is its base plus the consolidated dir's rows. A bucket
    // whose PREVIOUS stack has untracked row counts (deltaRowsOf =
    // None — pre-count-tracking commits) is refused here: subtracting
    // 0 for the old stack would permanently inflate the bucket's
    // lineage and skew later baseRowsOf/foldRatio decisions. CdcApply
    // never routes such buckets to consolidation (they fold), so this
    // guards only direct commit() API callers.
    val consolidatedCounts = deltaReplaces.foldLeft(rewrittenCounts) {
      case (m, (b, (_, n))) =>
        // deltaRowsOf is Some(0) for an absent stack, None ONLY for a
        // non-empty untracked one — so the orElse is always a refusal
        val oldStack = prev.flatMap(_.deltaRowsOf(b)).getOrElse(
          throw new IllegalArgumentException(
            s"deltaReplaces for bucket $b: previous stack has untracked " +
              "row counts (pre-upgrade commit) — fold the bucket instead"))
        m.updated(b.toString, math.max(0L, m.getOrElse(b.toString, 0L) - oldStack) + n)
    }
    // delta rows join the bucket's physical row count (lineage stays
    // live for delta commits, not just rewrites)
    val counts = deltaAdds.foldLeft(consolidatedCounts) {
      case (m, (b, (_, n))) => m.updated(b.toString, m.getOrElse(b.toString, 0L) + n)
    }
    // running tombstone counter: maintenance triggers read it from the
    // LATEST commit alone, so checkpointLog()'s history truncation
    // cannot under-count slow-but-steady delete accumulation
    val delSince =
      if (metrics.contains("compaction")) 0L
      else prev.flatMap(_.metrics.get("deletesSinceCompaction")).getOrElse(0L) +
        metrics.getOrElse("deletes", 0L)
    val hook = testBeforePublish
    testBeforePublish = () => ()
    hook()
    publish(Commit(
      prev.map(_.version + 1).getOrElse(1L), batchId, txidWatermark, schema.json,
      (carried -- dropped) ++ rewritten.collect { case (k, Some(v)) => k.toString -> v },
      counts, metrics + ("deletesSinceCompaction" -> delSince) +
        // persist the layout's bucket count forward; a caller-supplied
        // value wins (only rebucket passes one — it IS the layout change)
        (LakeTable.NumBucketsKey -> metrics.getOrElse(
          LakeTable.NumBucketsKey, effectiveNumBuckets.toLong)),
      queryId, newDeltas, newDeltaCounts,
      prev.map(_.renames).getOrElse(Map.empty)))
  }

  /** Atomically publish a pure MERGE-ON-READ delta commit: per-bucket
    * delta dirs appended to their stacks; every base carries forward
    * untouched. Steady-state CDC applies land here — O(batch) write, no
    * table rewrite (reference contrast: the dump pipeline rewrites
    * everything every cycle, manta/dc_inputs_4.sh). */
  def commitDelta(
      schema: StructType,
      deltaAdds: Map[Int, (String, Long)],
      txidWatermark: Long,
      batchId: Long,
      metrics: Map[String, Long],
      queryId: String = ""): Commit =
    commit(schema, Map.empty, Map.empty, txidWatermark, batchId, metrics,
      queryId, deltaAdds)

  /** Rename a payload column — Iceberg ALTER TABLE RENAME COLUMN
    * semantics (north rule: "renamed transcript fields like tool"): a
    * METADATA-ONLY commit that swaps the name in the table schema and
    * records retired→current in [[Commit.renames]]. No data file is
    * rewritten; readers map pre-rename dirs onto the current name at
    * scan time, and [[graft.cdc.CdcApply.applyBatch]] folds events from
    * late producers still emitting the retired key into the current
    * column (so the retired name can never re-enter the schema through
    * the novel-key absorber). Chained renames stay flattened: after
    * a→b then b→c the map holds a→c and b→c, so a dir of ANY vintage
    * resolves in one hop. Merge keys and CDC envelope columns are
    * structural and refuse to rename. Concurrency: publishes through
    * the same one-winner link(2) protocol as data commits; on a lost
    * race it rebuilds against the new head (touches no buckets, so
    * there is no true-conflict case). */
  def renameColumn(oldName: String, newName: String): Commit = {
    val structural = graft.model.Model.MergeKeys.toSet ++
      Set("_txid", "_etag", "_deleted", "_bucket")
    require(oldName != newName, s"rename $oldName -> itself")
    require(!structural(oldName) && !structural(newName),
      s"cannot rename structural column ($oldName -> $newName)")
    this.synchronized {
      var attempt = 0
      while (true) {
        val prev = currentCommit().getOrElse(throw new IllegalArgumentException(
          s"rename $oldName -> $newName: table at $location has no commits"))
        val schema = prev.schema
        require(schema.fieldNames.contains(oldName),
          s"rename source $oldName not in schema ${schema.fieldNames.mkString(",")}")
        require(!schema.fieldNames.contains(newName),
          s"rename target $newName already in schema")
        val renamed = StructType(schema.fields.map(f =>
          if (f.name == oldName) f.copy(name = newName) else f))
        val flattened = prev.renames.map { case (k, v) =>
          k -> (if (v == oldName) newName else v)
        } + (oldName -> newName)
        try return publish(prev.copy(
          version = prev.version + 1, batchId = -1L, queryId = "",
          schemaJson = renamed.json,
          metrics = Map("rename" -> 1L) ++
            prev.metrics.get("deletesSinceCompaction")
              .map("deletesSinceCompaction" -> _) ++
            prev.metrics.get(LakeTable.NumBucketsKey)
              .map(LakeTable.NumBucketsKey -> _),
          renames = flattened))
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            attempt += 1
            if (attempt > 5) throw new java.util.ConcurrentModificationException(
              s"rename $oldName -> $newName lost the commit race $attempt times")
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  private def publish(c: Commit): Commit = {
    Files.createDirectories(commitsDir)
    val tmp = Files.createTempFile(commitsDir, ".tmp-", ".json")
    Files.writeString(tmp, Serialization.write(c))
    val target = commitsDir.resolve(f"${c.version}%012d.json")
    // hard-link, not rename: POSIX rename(2) — what ATOMIC_MOVE maps
    // to — silently REPLACES an existing target, so a lost race would
    // clobber the winner's commit instead of throwing. link(2) fails
    // with EEXIST atomically, guaranteeing exactly one writer wins a
    // version; the loser's FileAlreadyExistsException drives commit()'s
    // optimistic retry (rebuild against the new head if buckets are
    // disjoint, refuse on true conflicts).
    try {
      Files.createLink(target, tmp)
      Files.deleteIfExists(tmp)
    } catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); throw e
    }
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
      val (rel, dirs, counts) =
        writeBase(keep, c.version + 1, bucketCol(col("conv_id")))
      // every bucket with a base or a delta stack is folded into the new
      // base; rewriting them clears their delta stacks in commit().
      // `counts` are the fresh post-compaction row counts: the
      // tombstones just dropped must leave the per-bucket lineage too
      val liveBuckets = c.buckets.keySet.map(_.toInt) ++ c.deltas.keySet.map(_.toInt)
      val rewritten: Map[Int, Option[String]] =
        liveBuckets.map { b =>
          b -> (if (dirs.contains(s"_bucket=$b")) Some(s"$rel/_bucket=$b") else None)
        }.toMap
      commit(c.schema, rewritten, counts, c.txidWatermark, -1L,
        Map("compaction" -> 1L, "tombstoneHorizon" -> tombstoneHorizon))
    }

  /** Rewrite `df` as a fresh bucket-partitioned base under
    * `data/c<version>`, files sorted by (bucket, conv_id, turn_idx) for
    * row-group min/max skipping on later gate reads — the one write
    * shape shared by compaction and rebucketing. Returns the dir's
    * relative path, its `_bucket=` subdir names, and per-bucket counts. */
  private def writeBase(df: DataFrame, version: Long,
      bucket: org.apache.spark.sql.Column):
      (String, Set[String], Map[Int, Long]) = {
    val rel = f"data/c$version%012d"
    df.withColumn("_bucket", bucket)
      .repartition(col("_bucket"))
      .sortWithinPartitions("_bucket", "conv_id", "turn_idx")
      .write.mode("overwrite").partitionBy("_bucket")
      .parquet(root.resolve(rel).toString)
    val s = Files.list(root.resolve(rel))
    val dirs = try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("_bucket=")).toSet
    finally s.close()
    (rel, dirs, LakeTable.footerRowCounts(root.resolve(rel)))
  }

  /** Re-hash the table to a new bucket count — the maintenance op for
    * a table that has outgrown (or over-provisioned) its layout: at
    * 100 TB a hot table's per-bucket files eventually dwarf the
    * original count's parallelism, and the fix must not depend on
    * every writer being reconfigured in lockstep. One atomic commit
    * rewrites the resolved snapshot (tombstones carried over, so
    * resurrection safety and later horizon compaction are unchanged)
    * under the new hash space, clears every delta stack into it, and
    * persists the new count as table metadata — subsequent writers and
    * appliers pick it up via [[effectiveNumBuckets]] no matter what
    * their constructors say. The analogue of Iceberg partition-spec
    * evolution, by full rewrite (the layout is a hash space — old and
    * new specs cannot coexist file-by-file).
    *
    * Concurrency: publishes through the optimistic one-winner
    * protocol, and since it touches EVERY bucket, any interleaved data
    * commit is a true conflict (`ConcurrentModificationException`) —
    * run it in a maintenance window or catch-and-retry around the
    * streaming tail. */
  def rebucket(spark: SparkSession, newNumBuckets: Int): Commit = {
    require(newNumBuckets > 0, s"newNumBuckets must be positive: $newNumBuckets")
    val c = currentCommit().getOrElse(throw new IllegalArgumentException(
      s"rebucket: table at $location has no commits"))
    val oldN = effectiveNumBuckets
    require(newNumBuckets != oldN,
      s"table at $location is already laid out with $oldN buckets")
    val (rel, dirs, counts) = writeBase(readRaw(spark), c.version + 1,
      LakeTable.bucketColFor(col("conv_id"), newNumBuckets))
    val allBuckets = c.buckets.keySet.map(_.toInt) ++
      c.deltas.keySet.map(_.toInt) ++ (0 until newNumBuckets)
    val rewritten: Map[Int, Option[String]] = allBuckets.map { b =>
      b -> (if (dirs.contains(s"_bucket=$b")) Some(s"$rel/_bucket=$b") else None)
    }.toMap
    commit(c.schema, rewritten, counts, c.txidWatermark, -1L,
      Map("rebucket" -> 1L, LakeTable.NumBucketsKey -> newNumBuckets.toLong))
  }

  /** Garbage-collect data dirs no snapshot in the retention window
    * references (storage would otherwise grow without bound: every
    * rewrite strands its predecessors' files). Keeps every dir
    * referenced by the newest `retainCommits` commits — readers pinned
    * to those snapshots stay consistent; older snapshots become
    * unreadable, which is the Iceberg/Delta `expire_snapshots`/VACUUM
    * trade. vacuum itself never deletes commit JSONs — but
    * [[checkpointLog]] may later roll subsumed commits into a
    * checkpoint and delete their JSONs, retaining only the schemas of
    * data dirs still live at checkpoint time (full schema history does
    * NOT survive a checkpointed log). Dirs newer than the latest
    * commit (an in-flight writer's output) are left alone. Returns the
    * deleted dir names. */
  def vacuum(retainCommits: Int = 2): Seq[String] = {
    val log = cachedCommits()
    if (log.isEmpty) return Nil
    val latest = log.last.version
    val referenced: Set[String] = log.takeRight(math.max(1, retainCommits))
      .flatMap(c => (c.buckets.values ++ c.deltas.values.flatten)
        .map(rel => rel.split("/")(1))).toSet
    val dataDir = root.resolve("data")
    if (!Files.isDirectory(dataDir)) return Nil
    val s = Files.list(dataDir)
    val candidates = try s.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith("c")).toList
    finally s.close()
    val deletable = candidates.filter { name =>
      !referenced.contains(name) &&
        name.stripPrefix("c").stripSuffix("d").toLongOption.exists(_ <= latest)
    }
    deletable.foreach(name =>
      LakeTable.deleteRecursively(dataDir.resolve(name)))
    deletable.sorted
  }

  /** True if a streaming micro-batch with this id was already committed
    * BY THE SAME STREAM (crash-replay idempotence check). Scoped by
    * (queryId, batchId) like Delta's txnAppId/txnVersion: Spark batch
    * ids restart at 0 per checkpoint, so a bare-batchId check would
    * silently drop the first batches of any new checkpoint pointed at
    * an existing table. */
  def hasBatch(batchId: Long, queryId: String = ""): Boolean = {
    if (batchId < 0) return false
    val (ckpt, later) = cachedState()
    later.exists(c => c.batchId == batchId && c.queryId == queryId) ||
      ckpt.exists { case (lc, _) =>
        lc.commit.batchId == batchId && lc.commit.queryId == queryId ||
          // pre-checkpoint history is truncated; batch ids are monotonic
          // per stream, so anything ≤ the stream's recorded max was seen
          lc.maxBatchIdByQuery.get(queryId).exists(batchId <= _)
      }
  }
}

object LakeTable {
  /** Within-bucket salt width shared by the resolve's shuffle and the
    * merge paths (CdcApply.SaltBuckets aliases this): a bucket's rows
    * spread over this many reducers, so hot buckets don't serialize a
    * stage and per-bucket output file counts stay bounded. */
  val SaltBuckets = 8

  /** Commit-metrics key persisting the table's physical bucket count
    * (see [[LakeTable.effectiveNumBuckets]]). */
  val NumBucketsKey = "numBuckets"

  /** The layout hash: conv → bucket id in a given hash space. */
  def bucketColFor(conv: org.apache.spark.sql.Column,
      n: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(conv), lit(n.toLong)).cast("int")

  /** Depth-first recursive delete; silent no-op on a missing path —
    * the one shared implementation for every crash-retry/GC cleanup. */
  private[graft] def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (!Files.exists(p)) return
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder[Path]())
      .iterator().asScala.foreach(Files.deleteIfExists(_))
    finally walk.close()
  }

  /** The parquet part files under `path` (itself, if it IS a parquet
    * file) — the shared listing for every driver-side footer walk. */
  private[graft] def parquetParts(path: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    if (Files.isRegularFile(path)) return Seq(path)
    if (!Files.isDirectory(path)) return Nil
    val s = Files.list(path)
    try s.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toList
    finally s.close()
  }

  /** Open each part's footer and fold `f` over the readers — the one
    * shared open/close loop behind the row-count / column-bytes /
    * column-stats helpers. */
  private[graft] def withFooters[T](path: Path)(
      f: org.apache.parquet.hadoop.ParquetFileReader => T): Seq[T] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    parquetParts(path).map { p =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toUri), conf)
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try f(rd) finally rd.close()
    }
  }

  /** Footer row count of the part-*.parquet files DIRECTLY under
    * `dir` (no `_bucket=` partitioning) — the fallback truth source for
    * flat writes like [[graft.cdc.CdcOut]]'s pull dirs when the write
    * job's Observation metric was elided by a statically-empty plan.
    * Driver-side metadata only, no Spark job. */
  def flatFooterRowCount(dir: Path): Long =
    withFooters(dir)(_.getRecordCount).sum

  /** Max of a LONG column across `path`'s footer statistics — None when
    * the path has no parts or any chunk lacks usable stats (the caller
    * must then fall back to a real scan). Driver-side metadata only. */
  def footerLongMax(path: Path, column: String): Option[Long] = {
    import scala.jdk.CollectionConverters._
    val maxes = withFooters(path) { rd =>
      rd.getFooter.getBlocks.asScala
        .flatMap(_.getColumns.asScala)
        .filter(_.getPath.toDotString == column)
        .map { c =>
          val st = c.getStatistics
          if (st == null || !st.hasNonNullValue) None
          else st.genericGetMax match {
            case l: java.lang.Long => Some(l.longValue())
            case _ => None
          }
        }.toList
    }.flatten
    if (maxes.isEmpty || maxes.contains(None)) None
    else Some(maxes.flatten.max)
  }

  /** Per-bucket row counts from the parquet footers under a commit's
    * data dir (driver-side metadata only; footer reads are O(KB) each,
    * parallelized). Layout: `<dir>/_bucket=N/part-*.parquet`. */
  def footerRowCounts(outDir: Path): Map[Int, Long] = {
    import scala.jdk.CollectionConverters._
    if (!Files.isDirectory(outDir)) return Map.empty
    val conf = new org.apache.hadoop.conf.Configuration()
    val s = Files.list(outDir)
    val bucketDirs = try s.iterator().asScala
      .filter(_.getFileName.toString.startsWith("_bucket=")).toList
    finally s.close()
    if (bucketDirs.isEmpty) return Map.empty
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    // pool bounded by the work: this is a driver-side metadata read and
    // must not become a driver bottleneck pattern if numBuckets grows
    // with cluster size — O(KB) per footer, ≤16 threads, no Spark job
    val pool = Executors.newFixedThreadPool(math.min(16, bucketDirs.length))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = bucketDirs.map { dir =>
        Future {
          val bucket = dir.getFileName.toString.stripPrefix("_bucket=").toInt
          val fs = Files.list(dir)
          val parts = try fs.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet")).toList
          finally fs.close()
          val n = parts.map { f =>
            val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f.toUri), conf)
            val rd = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try rd.getRecordCount finally rd.close()
          }.sum
          bucket -> n
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf).toMap
    } finally pool.shutdown()
  }
}
