package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.functions.{CosineSimilarity, MinHashSignature}

/** graft's native Catalyst expressions as SQL functions.
  *
  * Two registration paths, one function list:
  *  - [[GraftFunctions.register]] adds them to an EXISTING session's
  *    function registry (what [[SqlSurface]] does alongside its views);
  *  - [[GraftExtensions]] injects them at session build time via
  *    `spark.sql.extensions=graft.sql.GraftExtensions` — the standard
  *    deployment shape for a cluster where the session is constructed by
  *    infrastructure, not by library code.
  *
  * These are the CODEGEN'D kernels (`doGenCode`), not Scala UDFs: a SQL
  * query using them stays inside whole-stage codegen exactly like the
  * DataFrame API path (asserted by SqlSurfaceSpec's plan check), so the
  * SQL surface costs what the Scala surface costs at 100 TB.
  */
object GraftFunctions {

  private type Builder = Seq[Expression] => Expression

  private def litInt(e: Expression, fn: String, what: String): Int =
    e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be a literal integer, got $other")
    }

  private def fn(name: String, usage: String)(
      b: Builder): (FunctionIdentifier, ExpressionInfo, Builder) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftFunctions.type].getName, null, name,
        usage, "", "", "", "misc_funcs", "4.0.0", "", "scala_udf"),
      b)

  /** The full function list, shared by both registration paths. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    fn("graft_cosine_similarity",
      "_FUNC_(a, b) - cosine similarity of two " +
        "array<float|double> vectors (single-pass fused kernel).") {
      case Seq(a, b) => CosineSimilarity(a, b)
      case args => throw new IllegalArgumentException(
        s"graft_cosine_similarity expects 2 arguments, got ${args.length}")
    },
    fn("graft_minhash_signature",
      "_FUNC_(text[, shingleLen]) - MinHash signature " +
        "(array<long>, one element per default seed) over character " +
        "shingles; the codegen'd kernel behind minhash dedup.") {
      case Seq(text) =>
        MinHashSignature(text, 8, graft.operators.Dedup.DefaultSeeds.toArray)
      case Seq(text, n) =>
        MinHashSignature(text,
          litInt(n, "graft_minhash_signature", "shingleLen"),
          graft.operators.Dedup.DefaultSeeds.toArray)
      case args => throw new IllegalArgumentException(
        s"graft_minhash_signature expects 1-2 arguments, got ${args.length}")
    },
    fn("graft_sample_hash",
      "_FUNC_(key) - the engine's deterministic 60-bit sampling coin " +
        "(uniform long in [0, 2^60)), bit-identical to the Scala " +
        "samplers'; `WHERE _FUNC_(id) < f * 1152921504606846976` is a " +
        "shuffle-free, reproducible f-fraction sample that selects " +
        "EXACTLY the docs graft.operators.Corpus.thresholdSample keeps.") {
      // the same digest-bytes kernel Corpus.sampleHash uses (r17) —
      // bit-identical to the composed
      // conv(substring(md5(cast(key as string)), 1, 15), 16, 10)::long
      case Seq(key) =>
        graft.functions.Md5Hash60(Cast(key, StringType))
      case args => throw new IllegalArgumentException(
        s"graft_sample_hash expects 1 argument, got ${args.length}")
    },
    fn("graft_kmv_distinct",
      "_FUNC_(hash60[, k]) - deterministic approximate COUNT(DISTINCT) " +
        "via a bounded k-minimum-values sketch over a graft_sample_hash " +
        "column; exact below k distinct values, reproducible across " +
        "engines/partitionings (default k=64).") {
      // returns the raw AggregateFunction: the analyzer wraps registry
      // aggregates in AggregateExpression itself (same as built-ins)
      case Seq(h) => graft.functions.KmvDistinct(h, 64)
      case Seq(h, kk) =>
        graft.functions.KmvDistinct(h,
          litInt(kk, "graft_kmv_distinct", "k"))
      case args => throw new IllegalArgumentException(
        s"graft_kmv_distinct expects 1-2 arguments, got ${args.length}")
    },
    fn("graft_quality_signals",
      "_FUNC_(text) - all five pre-training quality-gate signals " +
        "(struct<n_tokens, n_chars, n_sym, n_distinct, n_stop>) in one " +
        "pass over the document; the kernel behind the quality gate " +
        "(default stopword lexicon).") {
      case Seq(text) => graft.functions.QualitySignalsExpr(text,
        graft.operators.TextAnalysis.DefaultStopwords)
      case args => throw new IllegalArgumentException(
        s"graft_quality_signals expects 1 argument, got ${args.length}")
    },
    fn("graft_simhash",
      "_FUNC_(text[, nBits]) - the document's SimHash fingerprint " +
        "(per-bit majority vote of md5 hashes over distinct word " +
        "tokens) as one int64; default 60 bits.") {
      case Seq(text) => graft.functions.SimHashFingerprint(text, 60)
      case Seq(text, bits) =>
        graft.functions.SimHashFingerprint(text,
          litInt(bits, "graft_simhash", "nBits"))
      case args => throw new IllegalArgumentException(
        s"graft_simhash expects 1-2 arguments, got ${args.length}")
    },
    fn("graft_term_counts",
      "_FUNC_(text) - map<term, count> of the document's non-empty " +
        "space-separated tokens in one pass; explode it for narrow " +
        "(doc, term, tf) rows with no per-token shuffle.") {
      case Seq(text) => graft.functions.TermCounts(text)
      case args => throw new IllegalArgumentException(
        s"graft_term_counts expects 1 argument, got ${args.length}")
    },
    fn("graft_phash",
      "_FUNC_(payload) - the 60-bit profile difference-hash of a " +
        "binary payload (the perceptual-dedup stub path): 61 byte-" +
        "segment levels, bit j = level[j] < level[j+1]. Real image " +
        "decode stays with the Multimodal operator (imperative codec " +
        "work); this kernel equals it for every unclaimable payload.") {
      case Seq(payload) => graft.functions.ProfileHash60(payload)
      case args => throw new IllegalArgumentException(
        s"graft_phash expects 1 argument, got ${args.length}")
    },
    fn("graft_split_count",
      "_FUNC_(text[, bySpaceOnly]) - size(split(text, ' ')) when " +
        "bySpaceOnly (default), size(split(text, '\\s+')) otherwise — " +
        "the token COUNT without materializing the split array.") {
      case Seq(text) => graft.functions.SplitCount(text, bySpaceOnly = true)
      case Seq(text, Literal(b: Boolean, _)) =>
        graft.functions.SplitCount(text, b)
      case args => throw new IllegalArgumentException(
        "graft_split_count expects (text[, literal boolean]), got " +
          args.mkString(", "))
    },
    fn("graft_bpeish_count",
      "_FUNC_(text) - regexp_count(text, " +
        "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]') as one byte walk — the " +
        "BPE-ish pre-tokenizer count.") {
      case Seq(text) => graft.functions.BpeishTokenCount(text)
      case args => throw new IllegalArgumentException(
        s"graft_bpeish_count expects 1 argument, got ${args.length}")
    },
    fn("graft_lexicon_hits",
      "_FUNC_(text) - per-language stopword hit counts " +
        "(struct<n_tokens, de_hits, en_hits, es_hits, fr_hits>) in one " +
        "pass; the kernel behind shuffle-free language ID (default " +
        "lexicons).") {
      case Seq(text) =>
        val lex = graft.operators.TextAnalysis.DefaultLexicons
        graft.functions.LexiconHits(text,
          lex.keys.toSeq.sorted.map(l => l -> lex(l)))
      case args => throw new IllegalArgumentException(
        s"graft_lexicon_hits expects 1 argument, got ${args.length}")
    },
    fn("graft_repetition_signals",
      "_FUNC_(text) - struct<n_tokens, n_distinct, max_trigram_count> " +
        "boilerplate signals in one pass (trigrams counted as " +
        "zero-copy substring slices).") {
      case Seq(text) => graft.functions.RepetitionSignals(text)
      case args => throw new IllegalArgumentException(
        s"graft_repetition_signals expects 1 argument, got ${args.length}")
    })

  /** Register every function into an existing session (idempotent:
    * re-registration replaces the same name with the same builder). */
  def register(s: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      s.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** Session-build-time injection: set
  * `spark.sql.extensions=graft.sql.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`); every session built
  * with it resolves the graft_* functions natively. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
