package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.NativeExpressions._

/** SparkSessionExtensions entry point: makes the engine's native
  * kernels available to pure-SQL users at session build time —
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)…
  *   // or spark.sql.extensions=graft.GraftExtensions
  *
  * so `SELECT graft_minhash(text) …` works with no Scala imports. The
  * same registry the per-session `NativeExpressions.register` fills,
  * wired through the injection mechanism a deployment config can name.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.GraftRules.BoundedLevenshtein)
    e.injectOptimizerRule(s => new graft.plans.GraftRules.ManifestSkip(s))
    e.injectOptimizerRule(s => new graft.plans.GraftRules.ManifestAgg(s))
    e.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash"),
      (es: Seq[Expression]) => MinHashSig(es.head, 3, 32, 42L)))
    e.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash"),
      (es: Seq[Expression]) => SimHash(es.head, 64)))
    e.injectFunction((FunctionIdentifier("graft_fingerprint"),
      info("graft_fingerprint"),
      (es: Seq[Expression]) => Fingerprint(es.head)))
    e.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("graft_shingle_set"),
      info("graft_shingle_set"),
      (es: Seq[Expression]) => ShingleHashSet(es.head, 3)))
    e.injectFunction((FunctionIdentifier("graft_jaccard"),
      info("graft_jaccard"),
      (es: Seq[Expression]) => SortedJaccard(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("graft_text_profile"),
      info("graft_text_profile"),
      (es: Seq[Expression]) => TextProfile(es.head)))
    e.injectFunction((FunctionIdentifier("graft_minhash_from_hashes"),
      info("graft_minhash_from_hashes"),
      (es: Seq[Expression]) => MinHashFromHashes(es.head, 32, 42L)))
    e.injectFunction((FunctionIdentifier("graft_jaro_winkler"),
      info("graft_jaro_winkler"),
      (es: Seq[Expression]) => JaroWinkler(es(0), es(1))))
    // graft_blocklist_counts(text, 'pat1', 'pat2', …) →
    // array<long>[total hits, distinct patterns] in ONE AC pass; the
    // pattern list must be string literals (the automaton is built at
    // plan time and shipped with the plan)
    e.injectFunction((FunctionIdentifier("graft_blocklist_counts"),
      info("graft_blocklist_counts"),
      (es: Seq[Expression]) => {
        require(es.length >= 2,
          "graft_blocklist_counts(text, pattern, ...) needs >= 1 pattern")
        val pats = es.tail.map { p =>
          require(p.foldable &&
            p.dataType == org.apache.spark.sql.types.StringType,
            s"blocklist patterns must be string literals, got $p")
          p.eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
            .toString
        }
        graft.operators.Blocklist.AcScan(es.head, pats)
      }))
    // graft_tokens_cjk(text) → the han-bigram mixed-script tokenizer
    // (native kernel; bit-identical to TextFunctions.tokensCjk)
    e.injectFunction((FunctionIdentifier("graft_tokens_cjk"),
      info("graft_tokens_cjk"),
      (es: Seq[Expression]) => TokensCjk(es.head)))
    // graft_signpack(embedding) / graft_hamming(a, b) → the binary-
    // quantized ANN kernels, so a pure-SQL session can run the 32×
    // compressed shortlist scan with zero Scala
    e.injectFunction((FunctionIdentifier("graft_signpack"),
      info("graft_signpack"),
      (es: Seq[Expression]) => SignPack(es.head)))
    e.injectFunction((FunctionIdentifier("graft_hamming"),
      info("graft_hamming"),
      (es: Seq[Expression]) => HammingPacked(es(0), es(1))))
  }
}
