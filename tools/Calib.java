// Host-health probe matching graft.Bench's calib markers: fault = allocate
// and touch 512 MB of fresh heap (the sandbox's pathological page-fault
// path); cpu = fixed pure-ALU loop. Prints one line: fault=<s> cpu=<s>
public class Calib {
  public static void main(String[] a) {
    long t0 = System.nanoTime();
    byte[][] chunks = new byte[64][];
    for (int i = 0; i < 64; i++) {
      chunks[i] = new byte[8 * 1024 * 1024];
      for (int j = 0; j < chunks[i].length; j += 4096) chunks[i][j] = 1;
    }
    double fault = (System.nanoTime() - t0) / 1e9;
    t0 = System.nanoTime();
    long x = 1;
    for (long i = 0; i < 200_000_000L; i++) x = x * 6364136223846793005L + 1442695040888963407L;
    double cpu = (System.nanoTime() - t0) / 1e9;
    System.out.println("fault=" + String.format("%.3f", fault) +
      " cpu=" + String.format("%.3f", cpu) + " sink=" + (x == 0 ? 0 : 1));
  }
}
