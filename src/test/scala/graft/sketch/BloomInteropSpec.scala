package graft.sketch

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Differential interop: the committed `.blm` fixtures were written by
  * the COMPILED, UNMODIFIED reference (`cmd/mkblm.java` and a direct
  * `BloomFilter.getState()` serialization; see FIXTURES.md §5) — the
  * reader must reproduce the native graft build bit for bit and answer
  * every probe identically. */
class BloomInteropSpec extends AnyFunSuite {

  private def load(name: String): BloomSketch = {
    val in = getClass.getResourceAsStream(s"/interop/$name")
    assert(in != null, s"missing fixture $name")
    try BloomInterop.readFilterState(in) finally in.close()
  }

  test("reference mkblm .blm (murmur, long hash) converts bit-identically") {
    val converted = load("ref_murmur_5000x8.blm")
    assert(converted.kernel.name == "murmur2")
    assert(converted.maxSize == 5000L)
    assert(converted.bitsPerItem == 8)
    assert(converted.longHash)

    val native = BloomSketch(5000L, 8)
    (0 until 5000).foreach(i => native.put(f"k$i%05d"))
    // strongest check: the converted state IS the natively-built state
    assert(java.util.Arrays.equals(converted.serialize(), native.serialize()))
    // and behaviorally: identical accept/reject on members + 15k probes
    (0 until 20000).foreach { i =>
      val key = f"k$i%05d"
      assert(converted.contains(key) == native.contains(key), key)
      if (i < 5000) assert(converted.contains(key), s"false negative $key")
    }
  }

  test("reference .blm with jenkins int-hash config converts bit-identically") {
    val converted = load("ref_jenkins_2000x9_int.blm")
    assert(converted.kernel.name == "jenkins")
    assert(converted.maxSize == 2000L)
    assert(converted.bitsPerItem == 9) // odd bpe: exercises the recovery inversion
    assert(!converted.longHash)

    val native = BloomSketch(2000L, 9, graft.core.hash.HashKernels.jenkins, longHash = false)
    (0 until 2000).foreach(i => native.put(f"jk$i%05d"))
    assert(java.util.Arrays.equals(converted.serialize(), native.serialize()))
    (0 until 8000).foreach { i =>
      val key = f"jk$i%05d"
      assert(converted.contains(key) == native.contains(key), key)
    }
  }

  test("reference-written filter probed through bloom_might_contain end-to-end") {
    val spark = graft.spark.SparkTestBase.session
    import spark.implicits._
    val bytes = {
      val in = getClass.getResourceAsStream("/interop/ref_murmur_5000x8.blm")
      try BloomInterop.readFilterState(in).serialize() finally in.close()
    }
    // 20k probes routed through the SQL surface against the converted
    // filter: member acceptance is total, overall accept set equals the
    // direct probes (identical accept/reject on the whole corpus)
    val probes = spark.range(20000).select(
      F.format_string("k%05d", F.col("id")).as("key"))
    val lit = F.lit(bytes)
    val accepted = probes
      .filter(graft.spark.functions.bloom_might_contain(lit, F.col("key")))
      .select("key").as[String].collect().toSet
    val direct = {
      val sk = load("ref_murmur_5000x8.blm")
      (0 until 20000).map(i => f"k$i%05d").filter(sk.contains).toSet
    }
    assert(accepted === direct)
    assert((0 until 5000).forall(i => accepted(f"k$i%05d")), "member false negative")
  }

  test("writer reproduces the reference's own .blm files byte-for-byte") {
    // read fixture -> BloomSketch -> write: if the writer's wire form is
    // exactly the reference JVM's, the output IS the input file — the
    // strongest possible proof that ckblm can load what graft writes
    for (name <- Seq("ref_murmur_5000x8.blm", "ref_jenkins_2000x9_int.blm")) {
      val original = {
        val in = getClass.getResourceAsStream(s"/interop/$name")
        try in.readAllBytes() finally in.close()
      }
      val bos = new java.io.ByteArrayOutputStream()
      BloomInterop.writeFilterState(load(name), bos)
      assert(java.util.Arrays.equals(bos.toByteArray, original),
        s"$name: written stream diverges from the reference-written file")
    }
    // and the writer's output round-trips through our own reader
    val native = BloomSketch(512L, 10)
    (0 until 512).foreach(i => native.put(s"w$i"))
    val bos = new java.io.ByteArrayOutputStream()
    BloomInterop.writeFilterState(native, bos)
    val back = BloomInterop.readFilterState(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(java.util.Arrays.equals(back.serialize(), native.serialize()))
  }

  test("hostile class names in the stream are rejected") {
    // a Java-serialized HashMap: the header is valid serialization, but
    // the class is outside the allowlist — must throw, not instantiate
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(new java.util.HashMap[String, String]())
    oos.close()
    val in = new java.io.ByteArrayInputStream(bos.toByteArray)
    intercept[java.io.InvalidClassException] {
      BloomInterop.readFilterState(in)
    }
  }

  test("inconsistent FilterState geometry is rejected") {
    val ex = intercept[IllegalArgumentException] {
      // maxSize/bitSetLength/k with no bpe preimage
      val m = classOf[BloomInterop.type].getDeclaredMethods
        .find(_.getName == "recoverBitsPerElement").get
      m.setAccessible(true)
      try m.invoke(BloomInterop, Long.box(1000L), Int.box(999999), Int.box(3))
      catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }
    }
    assert(ex.getMessage.contains("no consistent bitsPerElement"))
  }
}
