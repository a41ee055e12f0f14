package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Round-6 optimization probe: time the sub-stages of the expensive
  * query pipelines in isolation (noop-sink style — count() over each
  * intermediate) so optimization targets the measured cost, not the
  * suspected one. Not part of the driver contract; plain stdout timings.
  */
object R6Probe {
  private def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    // scalastyle:off println
    println(f"[probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (r=$r)")
    // scalastyle:on println
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mode = if (args.nonEmpty) args(0) else "ngram"
    mode match {
      case "ngram" => ngramProbe(spark, sfDir, threshold = 0.5)
      case "ngram07" => ngramProbe(spark, sfDir, threshold = 0.7)
      case "streaming" => streamingProbe(spark, sfDir)
      case _ => sys.error(s"unknown mode $mode")
    }
    spark.stop()
  }

  /** Split streaming_dedup-style cost into staging vs streaming-engine
    * time (two runs each to see warm behavior). */
  private def streamingProbe(spark: SparkSession, dir: String): Unit = {
    Seq("4", "2", "1", "4", "2", "1").zipWithIndex.foreach { case (width, round) =>
      val path = s"$dir/documents.parquet"
      val staged = java.nio.file.Files.createTempDirectory("r6probe_sd")
      t(s"[$width#$round] stage batch0 (copy)") {
        java.nio.file.Files.copy(java.nio.file.Paths.get(path),
          staged.resolve("batch-0.parquet"))
      }
      val dupDir = java.nio.file.Files.createTempDirectory("r6probe_sd_dup")
      t(s"[$width#$round] stage batch1 (shifted write)") {
        spark.read.parquet(path)
          .withColumn("doc_id", F.col("doc_id") + 1000000L)
          .coalesce(1).write.mode("overwrite").parquet(dupDir.toString)
        val l = java.nio.file.Files.list(dupDir)
        val part =
          try l.filter(p => p.getFileName.toString.endsWith(".parquet"))
            .findFirst().get()
          finally l.close()
        java.nio.file.Files.move(part, staged.resolve("batch-1.parquet"))
      }
      java.nio.file.Files.setLastModifiedTime(staged.resolve("batch-0.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(1600000000000L))
      java.nio.file.Files.setLastModifiedTime(staged.resolve("batch-1.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(1600000060000L))
      val schema = t(s"[$width#$round] schema read")(spark.read.parquet(path).schema)
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", width)
      try {
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(staged.toString)
        val name = s"r6sd_${width}_$round"
        val q = t(s"[$width#$round] stream start") {
          graft.ops.StreamingDedup.firstSeen(
              stream.select(F.col("doc_id"), F.col("text")), "doc_id", "text")
            .writeStream.outputMode("append").format("memory")
            .queryName(name)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
        }
        t(s"[$width#$round] stream run (awaitTermination)")(q.awaitTermination())
        t(s"[$width#$round] sink count")(spark.table(name).count())
      } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    }
  }

  private def ngramProbe(spark: SparkSession, dir: String, threshold: Double): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(F.col("doc_id"), F.col("text"))
    val n = 3

    // replicate ngramPrefixCandidates piecewise (hashed-shingle path)
    val toks = docs.select(F.col("doc_id").as("__id"),
      F.explode(graft.ops.TextAnalysis.shingle_hashes(F.col("text"), n)).as("__tok"))
    t("toks explode count")(toks.count())
    val freq = toks.groupBy("__tok").agg(F.count(F.lit(1)).as("__df"))
    t("freq agg count")(freq.count())
    val byDoc = toks.join(freq, "__tok")
      .groupBy("__id")
      .agg(
        F.sort_array(F.collect_list(F.struct(F.col("__df"), F.col("__tok")))).as("__ts"),
        F.count(F.lit(1)).as("__sz"))
      .select(F.col("__id"),
        F.transform(F.col("__ts"), t => t.getField("__tok")).as("__toks"),
        F.col("__sz"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("byDoc build+count (cold)")(byDoc.count())
    t("byDoc count (warm)")(byDoc.count())

    val plen = (F.col("__sz") -
      F.ceil(F.lit(threshold) * F.col("__sz") - F.lit(1e-9)) + 1).cast("int")
    val prefix = byDoc.select(F.col("__id"), F.col("__sz"),
      F.posexplode(F.slice(F.col("__toks"), F.lit(1), plen)).as(Seq("__p", "__tok")))
    t("prefix explode count (warm byDoc)")(prefix.count())

    val cand0 = graft.ops.SkewJoin.selfPairsWithinGroups(
      prefix.select(F.col("__tok"), F.col("__id"), F.col("__sz"), F.col("__p")),
      Seq("__tok"))
    t("skewjoin raw pairs count")(cand0.count())

    val needOverlap = F.ceil(F.lit(threshold / (1.0 + threshold)) *
      (F.col("__sza") + F.col("__szb")).cast("double") - F.lit(1e-9))
    val cand = cand0
      .select(F.col("__l.__id").as("id_a"),
        F.col("__l.__sz").as("__sza"), F.col("__l.__p").as("__pa"),
        F.col("__r.__id").as("id_b"),
        F.col("__r.__sz").as("__szb"), F.col("__r.__p").as("__pb"))
      .filter(F.col("id_a") < F.col("id_b"))
      .filter(F.least(F.col("__sza"), F.col("__szb")).cast("double") >=
        F.lit(threshold) * F.greatest(F.col("__sza"), F.col("__szb")).cast("double") - F.lit(1e-9))
      .filter(F.lit(1) + F.least(
        F.col("__sza") - F.col("__pa") - 1,
        F.col("__szb") - F.col("__pb") - 1) >= needOverlap)
      .select("id_a", "id_b", "__sza", "__szb")
      .dropDuplicates("id_a", "id_b")
    t("cand dedup count")(cand.count())

    val verified = cand
      .join(byDoc.select(F.col("__id").as("id_a"), F.col("__toks").as("__ta")), Seq("id_a"))
      .join(byDoc.select(F.col("__id").as("id_b"), F.col("__toks").as("__tb")), Seq("id_b"))
      .withColumn("__i", F.size(F.array_intersect(F.col("__ta"), F.col("__tb"))).cast("long"))
      .withColumn("jaccard", F.col("__i").cast("double") /
        (F.col("__sza") + F.col("__szb") - F.col("__i")).cast("double"))
      .filter(F.col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    t("verified pairs count")(verified.count())
    t("verified pairs count (2nd)")(verified.count())

    // end-to-end via the real operator, then CC
    val pairs = t("ngramJaccardPairs build") {
      graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = threshold)
    }
    t("ngramJaccardPairs count")(pairs.count())
    t("connectedComponents full")(
      graft.ops.Dedup.connectedComponents(pairs, "id_a", "id_b").count())
  }
}
