package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, functions => F}

import graft.core.hash.Murmur2Kernel

/** Multimodal (image/audio/video) columns for training-data pipelines:
  * opaque binary content + typed metadata, with the decode/transform
  * steps STUBBED behind deterministic fakes (this container has no image
  * or audio codecs) while the Spark-side plumbing — schema, size-aware
  * partitioning, batch iteration, frame explosion — is real and tested.
  *
  * Swap-in points are marked `STUB:`; a real deployment replaces the fake
  * with a codec call (JVM) or a Pandas-UDF/`mapInPandas` stage (Python),
  * keeping every signature and partitioning decision unchanged.
  */
object Multimodal {

  /** One media asset row: the contractual multimodal schema. */
  case class Asset(
      asset_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte], // opaque encoded bytes
      width: Int, // images/video
      height: Int,
      duration_ms: Int, // audio/video
      format: String)

  case class DecodedImage(
      asset_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      pixels_fingerprint: Long)

  case class Frame(
      asset_id: Long,
      frame_idx: Int,
      ts_ms: Int,
      frame_fingerprint: Long)

  val Kinds: Array[String] = Array("image", "audio", "video")
  val Formats: Map[String, Array[String]] = Map(
    "image" -> Array("jpeg", "png", "webp"),
    "audio" -> Array("mp3", "flac", "ogg"),
    "video" -> Array("mp4", "webm"))

  /** Deterministic synthetic asset corpus: content bytes are counter-mode
    * murmur output, so regenerating is byte-identical (same invariant as
    * TranscriptGen) and sizes vary over ~1KB..~64KB. */
  def generateAssets(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { i =>
      def draw(key: String): Long =
        Murmur2Kernel.hash64Seeded(graft.core.ByteOps.utf8(s"asset:$i:$key"), seed)
      val kind = Kinds(Math.floorMod(draw("kind"), 3L).toInt)
      val formats = Formats(kind)
      val format = formats(Math.floorMod(draw("fmt"), formats.length.toLong).toInt)
      val size = 1024 + Math.floorMod(draw("size"), 64L * 1024).toInt
      val content = new Array[Byte](size)
      var off = 0
      var ctr = 0L
      while (off < size) {
        val h = Murmur2Kernel.hash64Seeded(graft.core.ByteOps.utf8(s"asset:$i:b$ctr"), seed)
        var b = 0
        while (b < 8 && off < size) {
          content(off) = (h >>> (b * 8)).toByte
          off += 1
          b += 1
        }
        ctr += 1
      }
      val width = if (kind == "audio") 0 else 64 + Math.floorMod(draw("w"), 1920L).toInt
      val height = if (kind == "audio") 0 else 64 + Math.floorMod(draw("h"), 1080L).toInt
      val durationMs = if (kind == "image") 0 else 500 + Math.floorMod(draw("d"), 60000L).toInt
      Asset(i, kind, content, width, height, durationMs, format)
    }
  }

  /** Size-aware repartitioning: binary workloads must balance BYTES per
    * task, not rows — a 4KB-thumbnail partition and a 64KB-video
    * partition with equal row counts differ 16x in work. One lightweight
    * agg computes total bytes; partition count = ceil(total/target). */
  def repartitionBySize(df: DataFrame, contentCol: String,
      targetBytesPerPartition: Long = 128L << 20): DataFrame = {
    val totalRow = df.agg(F.sum(F.length(F.col(contentCol)))).head()
    if (totalRow.isNullAt(0)) return df // empty input
    val total = totalRow.getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytesPerPartition).toInt)
    // distribute on the FULL content hash: real media share fixed
    // magic-byte prefixes, so any prefix key would collapse same-format
    // assets into one partition
    df.repartition(parts, graft.spark.functions.murmur64(F.col(contentCol)))
  }

  /** Decode images. STUB: a real pipeline calls an image codec here
    * (e.g. `javax.imageio` or a mapInPandas+PIL stage); the fake returns
    * the asset's recorded dimensions plus a murmur fingerprint of the
    * encoded bytes, so downstream joins/dedup logic is fully exercised
    * and deterministic. Batch shape (mapPartitions over an iterator,
    * never materializing a partition in memory) is the real contract. */
  def decodeImages(assets: Dataset[Asset]): Dataset[DecodedImage] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      it.map { a =>
        // STUB: decode(a.content) would go here
        DecodedImage(a.asset_id, a.width, a.height, 3,
          Murmur2Kernel.hash64(a.content))
      }
    }
  }

  /** Resize. STUB: fake produces the target dims and a fingerprint
    * derived from (source fingerprint, target dims) — deterministic, so
    * tests can assert exact equality across partitionings. */
  def resizeImages(decoded: Dataset[DecodedImage], w: Int, h: Int): Dataset[DecodedImage] = {
    import decoded.sparkSession.implicits._
    decoded.map { d =>
      val fp = Murmur2Kernel.hash64Seeded(
        graft.core.ByteOps.utf8(s"${d.pixels_fingerprint}:$w:$h"), 0L)
      d.copy(width = w, height = h, pixels_fingerprint = fp)
    }
  }

  /** Sample frames from video assets every `everyMs`. STUB: the fake
    * frame fingerprint is a function of (content fingerprint, ts) — a
    * real pipeline seeks+decodes. The EXPLOSION (one row per frame,
    * bounded by duration) is the real plumbing being tested. */
  def sampleFrames(assets: Dataset[Asset], everyMs: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      val contentFp = Murmur2Kernel.hash64(a.content)
      val n = math.max(1, a.duration_ms / everyMs)
      (0 until n).iterator.map { f =>
        val ts = f * everyMs
        Frame(a.asset_id, f, ts,
          Murmur2Kernel.hash64Seeded(graft.core.ByteOps.utf8(s"$contentFp:$ts"), 0L))
      }
    }
  }

  /** Exact media dedup via content fingerprint — binary twin of
    * Dedup.exactDedup; shuffles 16 bytes/row, never the media bytes. */
  def dedupAssets(assets: Dataset[Asset]): DataFrame = {
    val df = assets.toDF()
    df.select(F.col("asset_id"),
      graft.spark.functions.murmur64(F.col("content")).as("__fp"))
      .groupBy("__fp")
      .agg(F.min("asset_id").as("asset_id"))
      .select("asset_id")
  }
}
