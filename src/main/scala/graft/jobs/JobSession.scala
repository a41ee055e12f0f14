package graft.jobs

import org.apache.spark.sql.SparkSession

/** Session bootstrap for job mains: under spark-submit the master comes
  * from the submit config; standalone (sbt run / tests) it falls back to
  * local with SPARK_GRAFT_CPUS threads and matching shuffle parallelism. */
object JobSession {
  def get(name: String): SparkSession = {
    val base = SparkSession.builder()
      .appName(name)
      .config("spark.sql.session.timeZone", "UTC")
    val b =
      if (sys.props.contains("spark.master") || sys.env.contains("SPARK_MASTER")) base
      else {
        val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
          Runtime.getRuntime.availableProcessors().toString)
        base.master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.ui.enabled", "false")
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
