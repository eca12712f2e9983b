package graft.engine

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-partition checkpointing with lineage + row-count metrics and mid-job
  * resume (north rule; SURVEY.md §7.5).
  *
  * A checkpointed stage splits the input into `parts` stable hash buckets of
  * `doc_id`; each bucket's output lands under `<root>/<job>/part=<p>/` with
  * a JSON manifest recording the lineage key (input fingerprint + predicate
  * hash), rows in/out, and wall time. Re-running the same job resumes: a
  * bucket whose manifest matches the lineage key is skipped and its
  * committed output is reused; only missing/invalid buckets recompute. The
  * manifest chain doubles as the bench's row-count evidence.
  *
  * Scale notes: buckets are processed as independent Spark jobs, so a
  * preempted cluster loses at most one bucket of work; bucket count is the
  * resume granularity, not the parallelism (each bucket job still fans out
  * to all executors). Manifests are tiny JSON files next to the data, like
  * a minimal Iceberg-style snapshot layout.
  */
object Checkpoint {

  final case class Manifest(job: String, part: Int, lineage: String,
                            rowsIn: Long, rowsOut: Long, wallMs: Long)

  private def manifestPath(root: String, job: String, p: Int): Path =
    Paths.get(root, job, f"part=$p%05d", "_manifest.json")

  private def dataPath(root: String, job: String, p: Int): String =
    f"$root/$job/part=$p%05d/data"

  private def writeManifest(m: Manifest, root: String): Unit = {
    val p = manifestPath(root, m.job, m.part)
    Files.createDirectories(p.getParent)
    Files.writeString(p,
      s"""{"job":"${m.job}","part":${m.part},"lineage":"${m.lineage}",
         |"rows_in":${m.rowsIn},"rows_out":${m.rowsOut},"wall_ms":${m.wallMs}}"""
        .stripMargin.replace("\n", ""))
  }

  def readManifest(root: String, job: String, p: Int): Option[Manifest] = {
    val path = manifestPath(root, job, p)
    if (!Files.exists(path)) None
    else {
      val s = Files.readString(path)
      def field(k: String): String =
        s.split("\"" + k + "\":")(1).split("[,}]")(0).replaceAll("\"", "")
      Some(Manifest(job, field("part").toInt, field("lineage"),
        field("rows_in").toLong, field("rows_out").toLong, field("wall_ms").toLong))
    }
  }

  /** Lineage key: identifies (input snapshot, predicate, partitioning). */
  def lineageKey(inputFingerprint: String, predicate: String, parts: Int): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(s"$inputFingerprint|$predicate|$parts".getBytes("UTF-8"))
    md.digest().take(12).map(b => f"$b%02x").mkString
  }

  /** Runs (or resumes) a checkpointed OFL filter over the docs table.
    * Returns the complete filtered result read from committed outputs, plus
    * the manifests. `maxPartsThisRun` caps how many buckets are computed in
    * this invocation (simulates preemption; the next call resumes). */
  def filterJob(spark: SparkSession, docs: DataFrame, expression: String,
                root: String, job: String, parts: Int = 8,
                inputFingerprint: String = "",
                maxPartsThisRun: Int = Int.MaxValue,
                idLoader: graft.compile.Compiler.IdListLoader =
                  graft.compile.Compiler.noFiles): (DataFrame, Seq[Manifest]) = {
    require(parts >= 1, s"parts must be >= 1, got $parts")
    val ast = graft.ofl.Parser.parse(expression)
    // the expression text names id-list FILES; their CONTENTS are part of
    // the lineage — otherwise editing the file and resuming would silently
    // reuse stale committed parts
    def listFiles(x: Any): Seq[String] = x match {
      case graft.ofl.InIntList(_, _, _, Some(f)) => Seq(f)
      case p: Product => p.productIterator.flatMap(listFiles).toSeq
      case i: Iterable[_] => i.flatMap(listFiles).toSeq
      case _ => Seq.empty
    }
    val fileFp = listFiles(ast).distinct.sorted.map { f =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      idLoader(f).toSeq.sorted.foreach(v => md.update(v.toString.getBytes))
      f + "=" + md.digest().take(8).map(b => f"$b%02x").mkString
    }.mkString(",")
    val lineage = lineageKey(s"$inputFingerprint|$fileFp", expression, parts)
    val pred = graft.compile.Compiler.compileEffective(ast, idLoader)
    val view = graft.model.OsmView.derive(docs)
      .withColumn("__part", pmod(xxhash64(col("doc_id")), lit(parts)))

    var computed = 0
    val manifests = (0 until parts).map { p =>
      readManifest(root, job, p) match {
        case Some(m) if m.lineage == lineage => m // committed: skip
        case _ if computed >= maxPartsThisRun =>
          Manifest(job, p, "PENDING", -1, -1, -1)
        case _ =>
          val t0 = System.nanoTime()
          val bucket = view.filter(col("__part") === p).drop("__part").cache()
          val rowsIn = bucket.count()
          val out = bucket.filter(pred)
            .select("doc_id", "spans", "type", "seq")
          out.write.mode("overwrite").parquet(dataPath(root, job, p))
          val rowsOut = spark.read.parquet(dataPath(root, job, p)).count()
          bucket.unpersist()
          val m = Manifest(job, p, lineage, rowsIn, rowsOut,
            (System.nanoTime() - t0) / 1000000)
          writeManifest(m, root)
          computed += 1
          m
      }
    }

    val done = manifests.filter(_.lineage == lineage)
    val result =
      if (done.isEmpty) spark.emptyDataFrame
      else done.map(m => spark.read.parquet(dataPath(root, job, m.part)))
        .reduce(_ unionByName _)
    (result, manifests)
  }
}
