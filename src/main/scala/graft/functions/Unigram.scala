package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-LM subword tokenizer (the SentencePiece unigram model, Kudo
  * 2018) — the other major trained-tokenizer family next to [[Bpe]]:
  * instead of greedy merges, a piece vocabulary with probabilities is fit
  * by EM over all segmentations, and encoding is the Viterbi-best
  * segmentation per word.
  *
  * Scale shape is identical to the BPE trainer: ONE distributed corpus
  * scan collapses words to the (type, freq) table (vocabulary-sized — MBs
  * for a 100 TB corpus), then seeding, EM, and pruning run driver-local
  * over that table; encoding is a pure projection scan through a codegen'd
  * expression carrying the vocabulary as a plan reference object.
  *
  * Simplifications vs full SentencePiece (documented, deterministic):
  * seeding takes the `seedFactor × vocabSize` most frequent substrings (≤
  * `maxPieceLen` chars) rather than an ESA suffix-array screen, and
  * pruning keeps the highest-expected-count pieces in one cut rather than
  * iterative loss-based rounds. Single characters are always kept, so
  * every word segments losslessly (the gate's invariant).
  */
object Unigram {

  /** Piece vocabulary with log probabilities; arrays are piece-sorted so
    * the model is deterministic and comparable across runs. */
  final case class UnigramModel(pieces: Array[String],
      logProbs: Array[Double]) {
    def size: Int = pieces.length
    def toMap: Map[String, Double] = pieces.zip(logProbs).toMap
  }

  /** Train on the corpus: one scan for the word-type table (same
    * normalization as [[Bpe.typeTable]]: lowercase, whitespace-collapsed
    * words), then driver-local EM. `maxTypes` guards the collect exactly
    * like `Bpe.train`. */
  def train(df: DataFrame, textCol: String, vocabSize: Int = 1000,
      maxPieceLen: Int = 8, emIters: Int = 4, seedFactor: Int = 4,
      maxTypes: Int = 5000000): UnigramModel = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && emIters >= 1)
    val rows = Bpe.typeTable(df, textCol)
      .select(col("_word"), col("_freq")).collect()
    require(rows.length <= maxTypes,
      s"Unigram.train: ${rows.length} word types exceed maxTypes=$maxTypes")
    require(rows.nonEmpty, "Unigram.train needs a non-empty corpus")
    val words: Array[(String, Long)] =
      rows.map(r => (r.getString(0), r.getLong(1)))
    trainLocal(words, vocabSize, maxPieceLen, emIters, seedFactor)
  }

  /** Driver-local core, exposed for known-answer specs. */
  private[graft] def trainLocal(words: Array[(String, Long)],
      vocabSize: Int, maxPieceLen: Int, emIters: Int,
      seedFactor: Int): UnigramModel = {
    import scala.collection.mutable
    // ---- seed: frequency-weighted substring counts ----
    val subFreq = mutable.HashMap.empty[String, Double]
    words.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        val maxL = math.min(maxPieceLen, w.length - i)
        while (l <= maxL) {
          val p = w.substring(i, i + l)
          subFreq(p) = subFreq.getOrElse(p, 0.0) + f.toDouble
          l += 1
        }
        i += 1
      }
    }
    val singles: Set[String] = subFreq.keysIterator.filter(_.length == 1).toSet
    val seedBudget = math.max(seedFactor * vocabSize, singles.size)
    val seedMulti = subFreq.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(seedBudget - singles.size)
    var probs: Map[String, Double] = {
      val seed = seedMulti ++ singles.toSeq.map(s => s -> subFreq(s))
      val tot = seed.iterator.map(_._2).sum
      seed.iterator.map { case (p, f) => p -> f / tot }.toMap
    }

    // ---- EM over word types (forward-backward in log space) ----
    val NegInf = Double.NegativeInfinity
    def logsum(a: Double, b: Double): Double =
      if (a == NegInf) b else if (b == NegInf) a
      else if (a > b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))
    var it = 0
    while (it < emIters) {
      val logp = probs.map { case (p, pr) => p -> math.log(pr) }
      val expected = mutable.HashMap.empty[String, Double]
      words.foreach { case (w, f) =>
        val n = w.length
        val la = Array.fill(n + 1)(NegInf); la(0) = 0.0
        var i = 1
        while (i <= n) {
          var j = math.max(0, i - maxPieceLen)
          while (j < i) {
            if (la(j) != NegInf) {
              logp.get(w.substring(j, i)).foreach { lp =>
                la(i) = logsum(la(i), la(j) + lp)
              }
            }
            j += 1
          }
          i += 1
        }
        if (la(n) != NegInf) { // unreachable only if a char fell out — skip
          val lb = Array.fill(n + 1)(NegInf); lb(n) = 0.0
          i = n - 1
          while (i >= 0) {
            var k = math.min(n, i + maxPieceLen)
            while (k > i) {
              if (lb(k) != NegInf) {
                logp.get(w.substring(i, k)).foreach { lp =>
                  lb(i) = logsum(lb(i), lp + lb(k))
                }
              }
              k -= 1
            }
            i -= 1
          }
          i = 0
          while (i < n) {
            var k = i + 1
            val maxK = math.min(n, i + maxPieceLen)
            while (k <= maxK) {
              val piece = w.substring(i, k)
              logp.get(piece).foreach { lp =>
                val e = math.exp(la(i) + lp + lb(k) - la(n)) * f
                if (e > 0)
                  expected(piece) = expected.getOrElse(piece, 0.0) + e
              }
              k += 1
            }
            i += 1
          }
        }
      }
      // floor keeps never-chosen singles alive as the lossless fallback
      val tot = expected.valuesIterator.sum
      val floor = math.max(tot * 1e-10, Double.MinPositiveValue)
      probs = probs.keysIterator.map { p =>
        val e = expected.getOrElse(p, 0.0)
        p -> math.max(e, if (p.length == 1) floor else e)
      }.filter { case (p, e) => e > 0 || p.length == 1 }
        .map { case (p, e) => p -> math.max(e, floor) }.toMap
      val z = probs.valuesIterator.sum
      probs = probs.map { case (p, e) => p -> e / z }
      it += 1
    }

    // ---- prune: singles always survive; best multis fill the budget ----
    val keptMulti = probs.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, pr) => (-pr, p) }
      .take(math.max(vocabSize - singles.size, 0))
    val kept = (keptMulti ++ singles.toSeq.map(s => s -> probs(s)))
    val z = kept.iterator.map(_._2).sum
    val fin = kept.map { case (p, pr) => p -> math.log(pr / z) }
      .sortBy(_._1)
    UnigramModel(fin.map(_._1).toArray, fin.map(_._2).toArray)
  }

  /** Persist a trained model as one JSON file (Hadoop FS — any URI), the
    * same shape as [[Bpe.save]]: train once on the 100 TB corpus, encode
    * everywhere forever. Log-probs round-trip via their exact bit pattern
    * so a loaded model segments bit-identically. */
  def save(model: UnigramModel, spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val json = graft.service.MiniJson.render(
      model.pieces.zip(model.logProbs).map { case (p, lp) => Map(
        "piece" -> p,
        // a string, not a number: JSON numbers round-trip through double
        // and would corrupt the low bits of the pattern
        "logp_bits" -> java.lang.Double.doubleToLongBits(lp).toString)
      }.toList)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): UnigramModel = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes =
      try in.readAllBytes()
      finally in.close()
    val rows = graft.service.MiniJson
      .parse(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      .asInstanceOf[List[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    UnigramModel(
      rows.map(_("piece").toString).toArray,
      rows.map(r => java.lang.Double.longBitsToDouble(
        r("logp_bits").toString.toLong)).toArray)
  }

  /** Viterbi-best tokens for every whitespace word of `textCol`,
    * flattened per row — one codegen'd projection, no shuffle. Unknown
    * characters fall back to single-char tokens (large negative score),
    * so concatenating the tokens always rebuilds the normalized text. */
  def encodeTokens(textCol: Column, model: UnigramModel): Column = {
    val wordArr = split(trim(regexp_replace(lower(textCol), "\\s+", " ")),
      " ")
    flatten(transform(wordArr, w =>
      org.apache.spark.sql.GraftColumnBridge.column(UnigramApply(
        org.apache.spark.sql.GraftColumnBridge.expression(w),
        model.pieces, model.logProbs))))
  }
}

/** Viterbi segmentation of one word under a unigram vocabulary — the scan
  * kernel behind [[Unigram.encodeTokens]]. The (pieces, logProbs) pair
  * rides along as plan reference objects; per executor a hash map is
  * built once (transient lazy). Ties prefer the LONGER piece (strict->
  * scan from longest candidate), making output deterministic. */
case class UnigramApply(child: org.apache.spark.sql.catalyst.expressions.Expression,
    pieces: Array[String], logProbs: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_apply needs string, got $t")
  }

  @transient private lazy val vocab = UnigramApply.buildVocab(pieces, logProbs)

  override def nullSafeEval(input: Any): Any =
    UnigramApply.segment(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", vocab,
      classOf[UnigramApply.Vocab].getName)
    // NOT named `apply` — see BpeApply for the Janino forwarder pitfall
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramApply.segment($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): UnigramApply =
    copy(child = newChild)
  override def prettyName: String = "unigram_apply"
}

object UnigramApply {
  import org.apache.spark.unsafe.types.UTF8String

  /** Serializable vocabulary with a lazily-built lookup map. */
  final class Vocab(val pieces: Array[String], val logProbs: Array[Double])
      extends Serializable {
    @transient lazy val map: java.util.HashMap[String, java.lang.Double] = {
      val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
      var i = 0
      while (i < pieces.length) { m.put(pieces(i), logProbs(i)); i += 1 }
      m
    }
    @transient lazy val maxLen: Int =
      if (pieces.isEmpty) 1 else pieces.iterator.map(_.length).max
  }

  def buildVocab(pieces: Array[String], logProbs: Array[Double]): Vocab =
    new Vocab(pieces, logProbs)

  private val UnknownPenalty = -1e4 // worse than any real piece, finite

  /** Called from generated code (static-forwardable, not named `apply`). */
  def segment(word: UTF8String,
      vocab: Vocab): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val w = word.toString
    val n = w.length
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](0))
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      // longest candidate first + strict > keeps ties on the longer piece
      var j = math.max(0, i - vocab.maxLen)
      while (j < i) {
        if (best(j) != Double.NegativeInfinity) {
          val lp = vocab.map.get(w.substring(j, i))
          val score =
            if (lp != null) best(j) + lp.doubleValue()
            else if (i - j == 1) best(j) + UnknownPenalty // char fallback
            else Double.NegativeInfinity
          if (score > best(i)) { best(i) = score; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    // reconstruct
    var count = 0
    var p = n
    while (p > 0) { count += 1; p = back(p) }
    val out = new Array[Any](count)
    p = n
    var k = count - 1
    while (p > 0) {
      out(k) = UTF8String.fromString(w.substring(back(p), p))
      k -= 1; p = back(p)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
