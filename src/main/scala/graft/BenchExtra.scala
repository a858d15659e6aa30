package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): times individual
  * catalog queries in isolation with the SAME action as the frozen
  * [[Bench]] (`.count()`), plus optional noop-sink timing (every column
  * materialized, §1.4) and `.explain("formatted")` dumps for the plan
  * evidence files under plans/r06/.
  *
  * Bench.scala itself is frozen for measurement; this separate main exists
  * so per-query iteration never touches the driver contract.
  *
  * Env:
  *   SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS     core count (default 32)
  *   SPARK_GRAFT_QUERIES  comma-separated query names (default: all)
  *   SPARK_GRAFT_REPS     timed reps per query after 1 warmup (default 2)
  *   SPARK_GRAFT_NOOP     "1" = also time a noop-sink write per query
  *   SPARK_GRAFT_PLANDIR  if set, write <q>.txt explain dumps there
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", (cpus.toInt * 8).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "48g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)

    val wanted = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val noop = sys.env.get("SPARK_GRAFT_NOOP").contains("1")
    val planDir = sys.env.get("SPARK_GRAFT_PLANDIR")
    planDir.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.forall(_.contains(n)) }
    val out = new StringBuilder("{")
    qs.zipWithIndex.foreach { case ((name, fn), qi) =>
      spark.sparkContext.setJobDescription(name)
      planDir.foreach { d =>
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(java.nio.file.Paths.get(d, s"$name.txt"),
          plan.getBytes("UTF-8"))
      }
      def once(): Double = {
        val t0 = System.nanoTime()
        try {
          if (noop) fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          else fn(spark, sfDir).count()
        } catch { case e: Throwable => println(s"ERR $name: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      val warm = once()
      val times = (1 to reps).map(_ => once())
      val best = (warm +: times).min
      println(f"TIMING $name warm=$warm%.3f reps=${times.map(t => f"$t%.3f").mkString("/")} best=$best%.3f")
      if (qi > 0) out.append(",")
      out.append("\"").append(name).append("\":").append(f"$best%.3f")
      spark.sparkContext.setJobDescription(null)
    }
    out.append("}")
    println("EXTRA_JSON " + out)
    spark.stop()
  }
}
