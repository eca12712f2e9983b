package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CPU-bound scaling probe: same synthetic workload at a given master
  * (local[N] thread mode or local-cluster[n,c,m] process mode), used to
  * measure the sandbox's Spark scaling ceiling independent of our engine. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val masterArg = if (args.nonEmpty) args(0) else "8"
    val master = if (masterArg.forall(_.isDigit)) s"local[$masterArg]" else masterArg
    val cores: Int = "local-cluster\\[(\\d+),(\\d+),".r.findFirstMatchIn(master)
      .map(m => m.group(1).toInt * m.group(2).toInt)
      .orElse("local\\[(\\d+)\\]".r.findFirstMatchIn(master).map(_.group(1).toInt))
      .getOrElse(8)
    val jdk17Opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio", "java.base/java.util",
      "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder().master(master)
      .config("spark.ui.enabled", "false")
      .config("spark.executor.memory", "3g")
      .config("spark.executor.extraJavaOptions", jdk17Opens)
      .config("spark.sql.shuffle.partitions", cores.toString).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 200000000L, 1, cores * 4)
      .select(max(xxhash64(col("id")))).collect() // warm (JIT on every executor)
    val t0 = System.nanoTime()
    spark.range(0, 4000000000L, 1, cores * 4)
      .select(max(xxhash64(col("id"), col("id") + 1, col("id") * 3))).collect()
    println(s"PROBE master=$master cores=$cores sec=${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }
}
