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

  /** Read one bucket's dump into a DataFrame with the header's columns
    * (positional resolution, reference lib/moraydump_reorg.js:327-351,
    * 399-409). Entry lines don't name their table — attribution is by
    * FILE: every shard carries its own header (the reference replicates
    * it, manta/dc_inputs.sh:49-60), so a multi-bucket dir is resolved by
    * reading each header's `_metadata.file_path` and pruning the entry
    * scan to the chosen bucket's files. Single-bucket dirs (the normal
    * case) skip the file filter entirely. */
  def readDump(
      spark: SparkSession, path: String,
      bucket: Option[String] = None): DataFrame = {
    def raw = spark.read.option("recursiveFileLookup", "true").text(path)
      .select(from_json(col("value"), lineSchema).as("r"),
        col("_metadata.file_path").as("_f"))
    val headerRows = raw.where(col("r.keys").isNotNull)
      .select(col("r.name"), col("r.keys"), col("_f")).collect()
    require(headerRows.nonEmpty, s"no dump header found under $path")
    val byFile: Map[String, (String, Seq[String])] = headerRows
      .map(r => r.getString(2) -> ((r.getString(0), r.getSeq[String](1)))).toMap
    val chosen = byFile.filter { case (_, (n, _)) => bucket.forall(_ == n) }
    require(chosen.nonEmpty, s"no dump header under $path" +
      bucket.map(b => s" for bucket $b").getOrElse(""))
    val headerSet = chosen.values.toSeq.distinct
    require(headerSet.size == 1,
      s"conflicting dump headers under $path: " +
        headerSet.map(_._1).mkString(",") + " — pass bucket=Some(name)")
    val (name, keys) = headerSet.head
    val singleBucket = byFile.values.toSeq.distinct.size == 1
    val entries = raw
      .where(col("r.entry").isNotNull &&
        (if (singleBucket) lit(true) else col("_f").isin(chosen.keys.toSeq: _*)))
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
