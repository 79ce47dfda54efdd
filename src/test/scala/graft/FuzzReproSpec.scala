package graft
import org.scalatest.funsuite.AnyFunSuite
/** Scratch repro driver for sweep-found failures (env-gated). */
class FuzzReproSpec extends AnyFunSuite {
  test("repro sweep seed") {
    assume(sys.env.contains("SPARK_GRAFT_REPRO_SEED"))
    val i = sys.env("SPARK_GRAFT_REPRO_SEED").toInt
    val ren = i % 5 == 4
    new LakeLifecycleFuzzSpec().runSequence(seed = 10000L + i, nOps = 20,
      sharded = i % 2 == 0, keyed = i % 3 == 0, tagged = i % 4 == 0,
      dv = i % 2 == 1, constrained = !ren && i % 3 == 1, dml = !ren,
      renames = ren)
  }
}
