package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.compile.Compiler
import graft.model.OsmView
import graft.ofl.{EntityBits, Expr, OflTypeException, Parser, Pretty}

/** Hot tag keys materialized as top-level view columns (`t_<key>`, first
  * matching value, null when the key is absent) so equality/regex/has-key
  * filters on them reach the parquet scan as pushed predicates. The `tags`
  * array cannot benefit from row-group statistics — a `highway == x` filter
  * over 100 TB otherwise decodes every tags array; with the projection,
  * min/max + null-count stats skip row groups where the key never occurs.
  *
  * The key list is DERIVED FROM THE DATA at [[FilterEngine.materializeView]]
  * time (top-N by key frequency — a corpus whose hot keys differ from OSM's
  * gets ITS hot keys projected, not a stale static list), and each hot
  * column carries its source key in column METADATA (`graft_hot_key`) —
  * persisted in the parquet footer's Spark schema, so [[forSchema]] reads
  * the mapping back from the view itself with no side file to lose or
  * drift. [[fallbackKeys]] only serves views written before metadata
  * tagging existed. */
object HotTags {
  /** Legacy static list — matched against bare `t_<key>` columns of views
    * materialized before the metadata-tagged layout. */
  val fallbackKeys: Seq[String] = Seq("highway", "building", "landuse",
    "amenity", "natural", "oneway", "name", "type", "addr:street",
    "addr:housenumber")

  /** Metadata key carrying the source tag key on a hot view column. */
  val MetaKey = "graft_hot_key"

  def colName(key: String): String = "t_" + key.replaceAll("[^A-Za-z0-9]", "_")

  /** The materialization expression — EXACTLY the compiler's cold-path
    * `tagValue` (first match, null when absent), so hot and cold reads are
    * equal by construction. The never-null-tag-VALUE invariant the hot
    * compile shape relies on (IsNotNull ⟺ key present) is enforced where
    * the view is built: [[FilterEngine.materializeView]] drops null-valued
    * tags from the array before any projection is derived. */
  def projection(key: String): Column =
    get(filter(col("tags"), t => t.getField("key") === key), lit(0))
      .getField("value")

  /** Top-`n` tag keys by frequency in `view` (count desc, key asc for
    * determinism), deduped on the sanitized column name (two keys that
    * sanitize identically keep the more frequent one) — the derivation
    * [[FilterEngine.materializeView]] projects. One aggregation job over
    * the tags column; at 100 TB you'd run it on a row sample, which only
    * has to get the top-N SET right, not exact counts. */
  def deriveKeys(view: DataFrame, n: Int = 10): Seq[String] = {
    // explode KEYS only (not the (key, value) structs): the shuffle ships
    // one short string per tag, and map-side partial aggregation collapses
    // it to (distinct keys × partitions) rows before the exchange
    val top = view
      .select(explode(transform(col("tags"), t => t.getField("key"))).as("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key")).limit(n * 2)
      .collect().map(_.getString(0))
    top.foldLeft(Vector.empty[String]) { (acc, k) =>
      if (acc.size < n && !acc.exists(colName(_) == colName(k))) acc :+ k
      else acc
    }
  }

  /** key → column map read back from the view's schema: metadata-tagged
    * columns are authoritative; a view with no tagged columns (pre-metadata
    * layout) falls back to matching [[fallbackKeys]] against `t_<key>`
    * column names; views with neither compile cold-path. */
  def forSchema(schema: org.apache.spark.sql.types.StructType): Map[String, String] = {
    val tagged = schema.fields.iterator
      .filter(f => f.metadata.contains(MetaKey))
      .map(f => f.metadata.getString(MetaKey) -> f.name).toMap
    if (tagged.nonEmpty) tagged
    else {
      val present = schema.fieldNames.toSet
      fallbackKeys.iterator.map(k => k -> colName(k))
        .filter(kv => present(kv._2)).toMap
    }
  }
}

/** The query lifecycle (SURVEY.md §3): parse → analyze (entity bits +
  * never-match abort) → compile → Catalyst. The reference's single-threaded
  * scan loop (main.cpp:182-199) becomes a declarative
  * `docs.filter(predicate)`; everything downstream (partition pruning,
  * vectorized parquet scan, whole-stage codegen, task parallelism) is stock
  * Catalyst/Tungsten.
  */
object FilterEngine {

  final case class Query(source: String, ast: Expr) {
    def entities: Int = EntityBits.entities(ast)
    def neverMatches: Boolean = entities == EntityBits.Nothing

    /** `-v` output: golden tree + entity mask line (main.cpp:118-134). */
    def explain: String =
      Pretty.print(ast) + "entities:" +
        EntityBits.names(entities).map(" " + _).mkString + "\n"
  }

  /** Parse + analyze — the `-n` dry-run surface (main.cpp:136-139).
    * `sugar` opts into the v2 extended syntax (see [[Parser.parse]]);
    * default off preserves reference grammar parity. */
  def parse(expression: String, sugar: Boolean = false): Query =
    Query(expression, Parser.parse(expression, sugar))

  /** Read a JSON-lines docs stream — the shape `-o - `/`-f json` emits
    * (docs-contract columns; extra top-level fields in the lines are
    * ignored by the schema-directed reader, so a previous filter's typed
    * view columns round-trip harmlessly). This is the stdin half of the
    * reference's shell-pipeline defaults (main.cpp:57-61): with Main's
    * `-` input, `graft -e … -o - IN | graft -e … -` composes two filters
    * the way two osmium-filter processes compose over OSM byte streams. */
  def readDocsJson(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(org.apache.spark.sql.Encoders.product[graft.model.OsmDocRow].schema)
      .json(path)

  /** Single-pass filter (reference R1): selects matching rows of the docs
    * table, never rewriting `spans` (span-sequence invariant is structural).
    * Returns the full docs shape plus the typed view columns. */
  def filter(docs: DataFrame, expression: String,
             idLoader: Compiler.IdListLoader = Compiler.noFiles,
             sugar: Boolean = false): DataFrame = {
    val q = parse(expression, sugar)
    if (q.neverMatches)
      throw new OflTypeException("Filter expression can never match") // main.cpp:114-117
    // pruned decode: the predicate pays one codegen'd spans pass per field it
    // references instead of the full HOF derivation (~40× on BENCH_r01)
    OsmView.derivePruned(docs).filter(Compiler.compileEffective(q.ast, idLoader))
  }

  /** `--complete-ways` two-pass semi-join (reference main.cpp:143-180):
    * pass 1 collects (type, positive_id) of every match plus node ids of all
    * node-refs of matching ways — note `positive_id()`/`positive_ref()`:
    * membership is on |id| (main.cpp:151-155); pass 2 rescans everything
    * unrestricted and emits objects whose (type, |id|) is in the set.
    *
    * Spark-first shape: the per-type IdSetDense bitset becomes a left-semi
    * join on (type, abs(id)); with AQE on, Spark broadcasts the id side at
    * runtime when it is small (the common case) and falls back to a shuffled
    * hash join when a non-selective filter makes it huge — exactly the
    * size-adaptive behavior the bitset hand-codes. Catalyst reuses the scan
    * of `docs` across the two logical passes (ReusedExchange). */
  def completeWays(docs: DataFrame, expression: String,
                   idLoader: Compiler.IdListLoader = Compiler.noFiles,
                   sugar: Boolean = false): DataFrame = {
    val matched = filter(docs, expression, idLoader, sugar)
    // one scan for BOTH id families (round 6): the object's own (type, |id|)
    // and, for ways, every node-ref — previously two branches that each
    // re-scanned and re-decoded pass 1; the concat+explode emits the same
    // distinct set from a single pass
    val wantedStruct = "array<struct<type:string,pid:bigint>>"
    val wanted = matched.select(explode(concat(
        array(struct(col("type").as("type"), abs(col("id")).as("pid"))),
        when(col("type") === "way",
          transform(col("nds"),
            n => struct(lit("node").as("type"), abs(n).as("pid"))))
          .otherwise(array().cast(wantedStruct)))).as("w"))
      .select(col("w.type").as("type"), col("w.pid").as("pid"))
      .distinct()
    // pass 2 is also pruned-decode: the semi-join touches only (type, id), so
    // the rescan decodes two fields per row; consumers that then select more
    // columns pay only the passes for the columns they actually read
    OsmView.derivePruned(docs)
      .withColumn("pid", abs(col("id")))
      .join(wanted, Seq("type", "pid"), "left_semi")
      .drop("pid")
  }

  /** Write surviving rows in input order (reference preserves input order
    * byte-exactly; Spark output order is nondeterministic without an
    * explicit sort — SURVEY.md §7.4 #4). The docs-contract columns only.
    * `format` is the Spark-world analog of the reference's `-f` output
    * format switch (main.cpp:59-61,88-90): parquet (default), json, or csv
    * (csv cannot carry nested arrays, so `spans` is JSON-encoded there). */
  def writeOrdered(filtered: DataFrame, outPath: String,
                   format: String = "parquet"): Unit = {
    val ordered = filtered.select("doc_id", "spans", "type", "seq")
      .orderBy("seq")
    format match {
      case "parquet" => ordered.write.mode("overwrite").parquet(outPath)
      case "json"    => ordered.write.mode("overwrite").json(outPath)
      case "csv" =>
        ordered.withColumn("spans", to_json(col("spans")))
          .write.mode("overwrite").option("header", "true").csv(outPath)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported output format '$other' (parquet|json|csv)")
    }
  }

  /** Materializes the typed OSM view as a type-partitioned columnar
    * projection. The spans→view derivation is ~12 higher-order-function
    * passes per row (CodegenFallback — correct but interpreter-bound); at
    * scale you pay it ONCE here, and every subsequent filter reads plain
    * typed columns with vectorized scans, predicate pushdown, and partition
    * pruning. This is the Iceberg-style "derived projection" layout the
    * engine assumes for repeated querying of a 100 TB docs table.
    * [[HotTags]] keys are additionally projected as pushdown-eligible
    * top-level columns. */
  def materializeView(docs: DataFrame, path: String, hotKeyCount: Int = 10): Unit = {
    val base = OsmView.deriveFast(docs) // single-pass decode: 1.8× the HOF derivation
      // enforce the never-null-tag-VALUE invariant the hot compile shape
      // depends on (t_<key>.isNotNull ⟺ key present): a source that carries
      // null tag values must not silently diverge hot vs cold. The OUTER
      // coalesce enforces the never-null-tags-ARRAY invariant on top: a
      // null array makes exists() three-valued (NULL, not false), which
      // would break HotTagRewrite's null-exactness under Not — the view
      // guarantees exists over tags is two-valued, where the rule needs it
      .withColumn("tags", coalesce(
        org.apache.spark.sql.functions.filter(col("tags"),
          t => t.getField("value").isNotNull),
        array().cast("array<struct<key:string,value:string>>")))
    // hot keys come from THIS corpus's key-frequency stats (one extra
    // aggregation pass at build time), tagged into column metadata so
    // HotTags.forSchema reads the mapping back from the written view. The
    // scan decodes ONLY the tags field (single-field codegen'd pass via
    // derivePruned), not the full 14-field derivation — at 24M rows the
    // full-decode + struct-explode variant ran the 8 GB driver out of
    // execution memory; this shape is a key-only explode over one pass
    val tagsOnly = OsmView.derivePruned(docs).select("tags")
      .withColumn("tags", org.apache.spark.sql.functions.filter(col("tags"),
        t => t.getField("value").isNotNull))
    val keys = HotTags.deriveKeys(tagsOnly, hotKeyCount)
    val hotCols = keys.map { k =>
      val m = new org.apache.spark.sql.types.MetadataBuilder()
        .putString(HotTags.MetaKey, k).build()
      HotTags.projection(k).as(HotTags.colName(k), m)
    }
    base.select(col("*") +: hotCols: _*)
      .write.mode("overwrite").partitionBy("type").parquet(path)
  }

  /** Scale path for huge id-list files: `ATTR in (<'file')` compiled as an
    * InSet probe replicates the whole set into every task (exactly like the
    * reference's in-memory IdSetDense, hpp:1549-1559 — and with the same
    * memory ceiling). Above `semiJoinThreshold` ids, a top-level conjunct of
    * the form `@attr in (<'file')` (or `not …`) is instead planned as a
    * distributed left-semi (left-anti) join against a parallelized id table,
    * which AQE broadcasts or shuffles by size; the remaining conjuncts
    * compile to the usual predicate Column. Only top-level conjuncts are
    * extracted — a file list under `or`/counting keeps the InSet plan
    * (documented limitation; matches how such filters are actually used). */
  def filterPlanned(view: DataFrame, expression: String,
                    idLoader: Compiler.IdListLoader,
                    semiJoinThreshold: Int = 100000): DataFrame = {
    import graft.ofl._
    val q = parse(expression)
    if (q.neverMatches)
      throw new OflTypeException("Filter expression can never match")
    val conjuncts = q.ast match {
      case And(cs) => cs
      case other   => Vector(other)
    }
    val spark = view.sparkSession
    import spark.implicits._

    def attrCol(a: Expr): Option[Column] = a match {
      case IntAttrExpr(IntAttr.Id)        => Some(col("id"))
      case IntAttrExpr(IntAttr.Version)   => Some(col("version"))
      case IntAttrExpr(IntAttr.Changeset) => Some(col("changeset"))
      case IntAttrExpr(IntAttr.Uid)       => Some(col("uid"))
      case _                              => None
    }

    // load each file once (they can be huge — that's why this path exists)
    val loaded = scala.collection.mutable.Map.empty[String, Set[Long]]
    val cachingLoader: Compiler.IdListLoader =
      f => loaded.getOrElseUpdate(f, idLoader(f))

    val (joins, residual) = conjuncts.partition {
      case InIntList(a, _, _, Some(f)) =>
        attrCol(a).isDefined && cachingLoader(f).size > semiJoinThreshold
      case _ => false
    }

    var out = view
    joins.foreach { case InIntList(a, op, _, Some(f)) =>
      val ids = cachingLoader(f).toSeq.toDF("__id")
      val joinType = if (op == ListOp.In) "left_semi" else "left_anti"
      out = out.join(ids, attrCol(a).get === col("__id"), joinType)
    case _ => ()
    }
    val residualExpr =
      if (residual.isEmpty) BoolLit(true)
      else if (residual.size == 1) residual.head else And(residual.toVector)
    // entity mask comes from the FULL expression (join conjuncts included)
    val masked = Compiler.pruningPredicate(q.ast) match {
      case Some(p) => out.filter(p)
      case None    => out
    }
    // residual tag checks also target the view's hot columns when present
    masked.filter(Compiler.compile(residualExpr, cachingLoader,
      HotTags.forSchema(view.schema)))
  }

  /** Filter over a materialized typed view (see [[materializeView]]):
    * same compiled predicate, no span decode on the hot path. Tag checks on
    * [[HotTags]] keys the view materialized compile to their top-level
    * columns — pushed into the parquet scan. */
  def filterView(view: DataFrame, expression: String,
                 idLoader: Compiler.IdListLoader = Compiler.noFiles): DataFrame = {
    val q = parse(expression)
    if (q.neverMatches)
      throw new OflTypeException("Filter expression can never match")
    view.filter(Compiler.compileEffective(q.ast, idLoader,
      HotTags.forSchema(view.schema)))
  }

  /** Engine session defaults — 32 shuffle partitions for local[32], AQE for
    * runtime re-planning (skew joins, dynamic broadcast). */
  def session(master: String = "local[32]", appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
