package graft.sketch

/** Growable primitive double array — quantile sketches append one value
  * per row, and a generic `ArrayBuffer[Double]` would box every element
  * (measured as the dominant allocation source at 32-core parallelism).
  */
private[sketch] final class DoubleBuf(initialCapacity: Int = 8) extends Serializable {
  private var arr = new Array[Double](math.max(2, initialCapacity))
  private var len = 0

  def length: Int = len
  def isEmpty: Boolean = len == 0
  def nonEmpty: Boolean = len > 0

  def apply(i: Int): Double = arr(i)

  def add(v: Double): Unit = {
    if (len == arr.length) {
      val bigger = new Array[Double](arr.length * 2)
      System.arraycopy(arr, 0, bigger, 0, len)
      arr = bigger
    }
    arr(len) = v
    len += 1
  }

  def addAll(other: DoubleBuf): Unit = {
    var i = 0
    while (i < other.len) { add(other.arr(i)); i += 1 }
  }

  /** New sorted copy of the live prefix. */
  def sortedArray(): Array[Double] = {
    val out = new Array[Double](len)
    System.arraycopy(arr, 0, out, 0, len)
    java.util.Arrays.sort(out)
    out
  }

  def foreach(f: Double => Unit): Unit = {
    var i = 0
    while (i < len) { f(arr(i)); i += 1 }
  }

  def clear(): Unit = len = 0

  def copy(): DoubleBuf = {
    val b = new DoubleBuf(math.max(2, len))
    b.addAll(this)
    b
  }
}
