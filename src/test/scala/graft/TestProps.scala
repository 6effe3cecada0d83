package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal property-check harness: scalatestplus bridge is not on the
  * offline classpath, so we sample generators deterministically ourselves. */
object TestProps {
  def forAllN[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  def forAllN2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 60)(f: (A, B) => Unit): Unit =
    forAllN(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }
}
