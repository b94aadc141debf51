package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Proves every native expression in plans/ actually COMPILES under
  * whole-stage codegen — not merely that it evaluates correctly. The
  * default Spark config silently falls back to interpreted eval when
  * Janino rejects the generated code (logging one warning), so the
  * ordinary suites would stay green while the perf claim rotted. This
  * suite runs with codegen.fallback=false + CODEGEN_ONLY so a broken
  * doGenCode throws instead, and cross-checks each expression's codegen
  * value against its interpreted value on the same rows. */
class CodegenSpec extends AnyFunSuite {
  // A dedicated session: getOrCreate() would reuse SparkSpec's session
  // and ignore these confs, so go through a fresh session with the
  // strict flags. SparkSession confs are per-session (SQLConf), so this
  // coexists with the shared-context suites.
  lazy val strict: SparkSession = {
    val base = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val s = base.newSession()
    s.conf.set("spark.sql.codegen.fallback", "false")
    s.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    graft.plans.TextSketches.register(s)
    graft.plans.VectorOps.register(s)
    graft.plans.PHash63.register(s)
    graft.plans.RollingHash.register(s)
    graft.plans.JaroWinklerSim.register(s)
    graft.plans.TokenStats.register(s)
    s
  }
  lazy val lax: SparkSession = {
    val s = strict.newSession()
    s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    graft.plans.TextSketches.register(s)
    graft.plans.VectorOps.register(s)
    graft.plans.PHash63.register(s)
    graft.plans.RollingHash.register(s)
    graft.plans.JaroWinklerSim.register(s)
    graft.plans.TokenStats.register(s)
    s
  }

  private val exprs = Seq(
    "minhash_sig(split(t, ' '), 8)",
    "simhash60(split(t, ' '))",
    "word_shingles(split(t, ' '), 3)",
    "word_ngrams(split(t, ' '), 2)",
    "token_chunks(split(t, ' '), 4)",
    "cooc_pairs(split(t, ' '), 2)",
    "char_ngrams(t, 3)",
    "phash63(cast(t AS BINARY))",
    "lsh_bucket(cast(array(1.5, -2.0, 0.25) AS ARRAY<FLOAT>), 8, 3)",
    "rolling_hash(t)",
    "jaro_winkler(t, reverse(t))",
    "dot_f32(cast(array(1.0, 2.0) AS ARRAY<FLOAT>), " +
      "cast(array(3.0, 4.0) AS ARRAY<FLOAT>))",
    "dot_f64(cast(array(1.0, 2.0) AS ARRAY<DOUBLE>), " +
      "cast(array(3.0, 4.0) AS ARRAY<DOUBLE>))",
    "token_stats(t)")

  private val fixtureSql =
    """SELECT * FROM VALUES
        ('the quick brown fox jumps over the lazy dog'),
        ('a b c d e f g h i j k l'),
        ('one'),
        ('') AS v(t)"""

  test("every plans/ expression compiles under CODEGEN_ONLY with " +
    "fallback disabled, and matches the interpreted value") {
    exprs.foreach { e =>
      val sql = s"SELECT cast($e AS STRING) AS v FROM ($fixtureSql)"
      val gen =
        try strict.sql(sql).collect().map(_.getString(0)).toSeq
        catch { case ex: Throwable =>
          fail(s"codegen path failed for `$e`: ${ex.getMessage}")
        }
      val interp = lax.sql(sql).collect().map(_.getString(0)).toSeq
      assert(gen == interp, s"codegen != interpreted for `$e`")
    }
  }
}
