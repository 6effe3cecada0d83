// Memory-bandwidth probe for the scaling postmortem: N threads stream-sum
// disjoint 256 MB long[] slices; reports aggregate GB/s per thread count.
// A flat GB/s curve past ~8-12 threads demonstrates the single-VM memory
// bus ceiling that caps the 4->16/8->32 index-build pairings while the
// pure-ALU probe (Calib.java cpu loop) keeps scaling.
// Usage: java MemBw.java [threadCounts...]   (default: 1 2 4 8 16 32)
import java.util.concurrent.*;

public class MemBw {
  static final int LONGS = 32 << 20; // 256 MB per thread

  public static void main(String[] args) throws Exception {
    int[] counts = args.length > 0
        ? java.util.Arrays.stream(args).mapToInt(Integer::parseInt).toArray()
        : new int[]{1, 2, 4, 8, 16, 32};
    int max = java.util.Arrays.stream(counts).max().getAsInt();
    long[][] slabs = new long[max][];
    for (int i = 0; i < max; i++) {
      slabs[i] = new long[LONGS];
      java.util.Arrays.fill(slabs[i], i + 1); // pre-touch
    }
    for (int n : counts) {
      // warmup + 3 measured passes, best-of
      double best = 0;
      for (int rep = 0; rep < 4; rep++) {
        double gbs = run(slabs, n);
        if (rep > 0 && gbs > best) best = gbs;
      }
      System.out.printf("{\"threads\":%d,\"agg_gbps\":%.2f,\"per_thread_gbps\":%.2f}%n",
          n, best, best / n);
    }
  }

  static double run(long[][] slabs, int n) throws Exception {
    ExecutorService ex = Executors.newFixedThreadPool(n);
    CountDownLatch start = new CountDownLatch(1);
    long[] sink = new long[n];
    Future<?>[] fs = new Future<?>[n];
    for (int t = 0; t < n; t++) {
      final int ti = t;
      fs[t] = ex.submit(() -> {
        try { start.await(); } catch (InterruptedException e) { return; }
        long s = 0;
        long[] a = slabs[ti];
        for (int pass = 0; pass < 4; pass++)
          for (int i = 0; i < a.length; i++) s += a[i];
        sink[ti] = s;
      });
    }
    long t0 = System.nanoTime();
    start.countDown();
    for (Future<?> f : fs) f.get();
    long t1 = System.nanoTime();
    ex.shutdown();
    double bytes = 4.0 * n * LONGS * 8.0;
    if (sink[0] == 42) System.out.println("impossible"); // keep sink live
    return bytes / (t1 - t0); // bytes/ns == GB/s
  }
}
