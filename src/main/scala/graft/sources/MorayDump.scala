package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader for the Moray bucket-dump streaming-JSON format — the
  * reference's universal input (header detection
  * /root/reference/lib/moraydump_reorg.js:316-351, the same parser
  * cloned into all six CLIs, e.g. lib/json2pgtypes.js:979-998):
  *
  * {{{
  * {"name":"wf_jobs","keys":["_id","_key","_etag","_mtime","_value"]}
  * {"entry":["17","0aa9...","54CF80C5","1394567890123","{\"exec\":...}"]}
  * }}}
  *
  * One header line declares the positional column list; every entry
  * line is an array of values in that order. The reference replicates
  * the header into every shard so each is self-describing
  * (manta/dc_inputs.sh:49-60) — here that becomes: headers are
  * self-identifying lines, collected once at PLAN time (one tiny
  * driver-side job over a `keys`-only projection), then applied as a
  * positional projection over the entries. No line ordering is assumed,
  * so Spark's arbitrary file splitting/parallelism just works.
  *
  * All values surface as strings (the dump is a text encoding; the
  * type machine — graft.types — is the component that decides real
  * types, exactly as in the reference where json2pgtypes runs over the
  * reorg output).
  */
object MorayDump {

  private val lineSchema = StructType(Seq(
    StructField("name", StringType),
    StructField("keys", ArrayType(StringType)),
    StructField("entry", ArrayType(StringType))))

  /** Distinct headers present under `path` (normally exactly one; a
    * multi-table dump dir yields one per bucket). */
  def headers(spark: SparkSession, path: String): Seq[(String, Seq[String])] = {
    val parsed = spark.read.option("recursiveFileLookup", "true").text(path)
      .select(from_json(col("value"), lineSchema).as("r"))
    parsed.where(col("r.keys").isNotNull)
      .select(col("r.name"), col("r.keys")).distinct()
      .collect()
      .map(r => (r.getString(0), r.getSeq[String](1)))
      .toSeq.sortBy(_._1)
  }

  /** Header discovery WITHOUT a data pre-scan: the reference replicates
    * the header as LINE 1 of every shard (manta/dc_inputs.sh:49-60), so
    * discovery is one buffered open + one line read per shard —
    * O(files) driver-side metadata work, the same order as Spark's own
    * file listing, instead of a full Spark pass over every byte. Files
    * whose first line is not a header (e.g. split continuation shards)
    * simply contribute no mapping. */
  private def stripScheme(uri: String): String =
    "/" + uri.replaceFirst("^[a-zA-Z0-9.+-]+:/+", "").stripPrefix("/")

  /** Returns (file-uri -> header) for every file whose FIRST line is a
    * header, plus the total candidate file count — the fast path is
    * authoritative only when it explained every file (a partial result
    * would silently misattribute the unexplained files' entries). */
  private def firstLineHeaders(
      path: String): (Map[String, (String, Seq[String])], Int) = {
    import scala.jdk.CollectionConverters._
    import java.nio.file.{Files, Paths}
    val root = Paths.get(path)
    val files =
      if (Files.isDirectory(root)) {
        val s = Files.walk(root)
        try s.iterator().asScala.filter(Files.isRegularFile(_))
          .filterNot { p =>
            val n = p.getFileName.toString
            n.startsWith("_") || n.startsWith(".")
          }.toList
        finally s.close()
      } else if (Files.isRegularFile(root)) List(root) else Nil
    val found = files.flatMap { f =>
      val line =
        try {
          val r = Files.newBufferedReader(f)
          try Option(r.readLine()) finally r.close()
        } catch { case _: Throwable => None }
      line.filter(l => l.contains("\"keys\"") && l.trim.startsWith("{")).flatMap { l =>
        try {
          val json = org.json4s.jackson.JsonMethods.parse(l)
          (json \ "name", json \ "keys") match {
            case (org.json4s.JString(n), org.json4s.JArray(ks))
                if ks.forall(_.isInstanceOf[org.json4s.JString]) =>
              Some(f.toUri.toString ->
                ((n, ks.collect { case org.json4s.JString(k) => k })))
            case _ => None
          }
        } catch { case _: Throwable => None }
      }
    }.toMap
    (found, files.size)
  }

  /** Read one bucket's dump into a DataFrame with the header's columns
    * (positional resolution, reference lib/moraydump_reorg.js:327-351,
    * 399-409). Entry lines don't name their table — attribution is by
    * FILE: every shard carries its own header, discovered from each
    * file's first line (driver-side, no data pre-scan; a dump whose
    * headers sit mid-file — e.g. concatenated shards — falls back to
    * one distributed header scan). The entry read is then a SINGLE
    * Spark scan, pruned to the chosen bucket's files only when the dir
    * actually holds multiple buckets. */
  def readDump(
      spark: SparkSession, path: String,
      bucket: Option[String] = None): DataFrame = {
    val byFile: Map[String, (String, Seq[String])] = {
      // the line-1 fast path stands only when it explained EVERY file:
      // a subset (e.g. concatenated shards with mid-file headers) must
      // fall back to the distributed header scan, or the unexplained
      // files' entries would be misattributed to the wrong header
      val (fast, totalFiles) = firstLineHeaders(path)
      if (fast.nonEmpty && fast.size == totalFiles) fast
      else spark.read.option("recursiveFileLookup", "true").text(path)
        .select(from_json(col("value"), lineSchema).as("r"),
          col("_metadata.file_path").as("_f"))
        .where(col("r.keys").isNotNull)
        .select(col("r.name"), col("r.keys"), col("_f")).collect()
        .map(r => r.getString(2) -> ((r.getString(0), r.getSeq[String](1)))).toMap
    }
    require(byFile.nonEmpty, s"no dump header found under $path")
    val chosen = byFile.filter { case (_, (n, _)) => bucket.forall(_ == n) }
    require(chosen.nonEmpty, s"no dump header under $path" +
      bucket.map(b => s" for bucket $b").getOrElse(""))
    val headerSet = chosen.values.toSeq.distinct
    require(headerSet.size == 1,
      s"conflicting dump headers under $path: " +
        headerSet.map(_._1).mkString(",") + " — pass bucket=Some(name)")
    val (name, keys) = headerSet.head
    val singleBucket = byFile.values.toSeq.distinct.size == 1
    val raw =
      if (singleBucket)
        spark.read.option("recursiveFileLookup", "true").text(path)
          .select(from_json(col("value"), lineSchema).as("r"))
      else {
        // scheme rendering differs between nio URIs ("file:///x") and
        // Spark's file_path ("file:/x") — compare scheme-less paths
        val chosenPaths = chosen.keys.map(stripScheme).toSeq
        spark.read.option("recursiveFileLookup", "true").text(path)
          .select(from_json(col("value"), lineSchema).as("r"),
            regexp_replace(col("_metadata.file_path"),
              "^[a-zA-Z0-9.+-]+:/+", "/").as("_f"))
          .where(col("_f").isin(chosenPaths: _*))
      }
    val entries = raw.where(col("r.entry").isNotNull)
      .select(col("r.entry").as("entry"))
    entries.select(keys.zipWithIndex.map { case (k, i) =>
      col("entry").getItem(i).as(k)
    }: _*).withColumn("_table", lit(name))
  }

  /** Inverse writer (reference wrap/emit shape,
    * lib/wrap_values.js:51-88): render a DataFrame as dump lines —
    * one header line plus one `{"entry":[...]}` line per row, every
    * value string-encoded. Used to synthesize fixtures and to
    * round-trip-test the reader. */
  def dumpLines(df: DataFrame, name: String): DataFrame = {
    val keys = df.columns.toSeq
    val header = df.sparkSession.range(1).select(
      concat(lit(s"""{"name":"$name","keys":["""),
        lit(keys.map(k => "\"" + k + "\"").mkString(",")),
        lit("]}")).as("value"))
    val entries = df.select(to_json(struct(
      array(keys.map(k => col(k).cast("string")): _*).as("entry"))).as("value"))
    header.unionAll(entries)
  }
}
