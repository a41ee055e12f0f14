import java.util.concurrent.CountDownLatch;
import java.util.concurrent.atomic.AtomicLong;

/** Memory-bandwidth envelope probe: N threads each sweep a private 64 MB
  * long array with stride 8 (one cache line) for the given duration;
  * prints aggregate traversed GB/s. Models the DRAM-bound component of a
  * columnar scan+hash workload with zero JVM/Spark overhead. */
public class BwProbe {
  public static void main(String[] args) throws Exception {
    final int threads = Integer.parseInt(args[0]);
    final long ms = Long.parseLong(args.length > 1 ? args[1] : "8000");
    final int n = 8 * 1024 * 1024; // 64 MB of longs per thread
    final AtomicLong bytes = new AtomicLong();
    final CountDownLatch start = new CountDownLatch(1);
    final CountDownLatch done = new CountDownLatch(threads);
    for (int t = 0; t < threads; t++) {
      final int seed = t;
      new Thread(() -> {
        long[] a = new long[n];
        for (int i = 0; i < n; i++) a[i] = i * 2654435761L + seed;
        try { start.await(); } catch (InterruptedException e) { return; }
        long deadline = System.nanoTime() + ms * 1_000_000L;
        long sum = 0, local = 0;
        while (System.nanoTime() < deadline) {
          for (int i = 0; i < n; i += 8) sum += a[i];
          local += (long) (n / 8) * 64; // one cache line per step
        }
        if (sum == 42) System.out.print(""); // defeat DCE
        bytes.addAndGet(local);
        done.countDown();
      }).start();
    }
    long t0 = System.nanoTime();
    start.countDown();
    done.await();
    double sec = (System.nanoTime() - t0) / 1e9;
    System.out.printf("threads=%d GBps=%.2f%n", threads, bytes.get() / 1e9 / sec);
  }
}
