package graft.functions

import scala.collection.mutable

/** Byte-pair-encoding subword tokenizer — the training-stack-fidelity
  * text operator the r14 verdict asked for: production LLM pipelines
  * tokenize with a TRAINED merge table, not whitespace, and token
  * counting/packing downstream of a real tokenizer is what decides
  * shard sizes and context budgets.
  *
  * Both halves are deterministic by construction:
  *
  *  - '''train''' runs the classic Sennrich-style merge learning over a
  *    (word, count) vocabulary: count adjacent symbol pairs weighted by
  *    word frequency, merge the most frequent pair (ties broken by the
  *    lexicographically smallest pair), repeat for a FIXED number of
  *    iterations. At corpus scale the word-frequency table is the small
  *    side (distinct words, not corpus tokens — one map-side-combined
  *    `groupBy` produces it), so learning runs driver-side over a
  *    compact vocabulary exactly as reference BPE trainers do.
  *  - '''encode''' applies the learned merges IN RANK ORDER, each to
  *    global fixpoint, over the word's character sequence. For a
  *    well-formed table (every rule's symbols are single characters or
  *    outputs of strictly earlier rules — which training guarantees,
  *    and [[wellFormed]] checks) this is equivalent to the
  *    lowest-rank-pair-first loop reference encoders run: a later merge
  *    can never create a new instance of an earlier rule's pair,
  *    because that pair would have had to be learned AFTER the symbol
  *    it contains.
  *
  * The encode semantics are REPLAYABLE IN SQL: on the padded string
  * form (word `abc` as `" a b c "`) each rule's left-to-right merge
  * pass equals replacing the LEFTMOST occurrence of `" a b "` with
  * `" ab "` repeatedly until absent — `ta_bpe_encode`'s DuckDB oracle
  * runs exactly that through a recursive CTE of strpos/substr steps —
  * making the tokenizer engine-portable rather than a Spark-private
  * artifact. (Bulk `replace` would NOT be equivalent: its consumed
  * delimiters skip a symbol after each match inside a repeated-symbol
  * run.)
  */
object BpeTokenizer {

  /** Learn `numMerges` merge rules from a (word, count) vocabulary.
    * Deterministic: pair counts are exact longs; the argmax tie-break
    * is (count desc, pair lexicographic asc). Stops early if no
    * adjacent pair remains (every word fully merged).
    */
  def train(wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var vocab: Seq[(Vector[String], Long)] = wordCounts
      .map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var it = 0
    while (it < numMerges && !done) {
      val pairCounts = mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, c) => (mergePair(syms, best), c) }
        it += 1
      }
    }
    merges.result()
  }

  /** One left-to-right non-overlapping merge pass of `pair` over a
    * symbol sequence — the training-side twin of encode's replacement
    * (a merge consumes both symbols; scanning resumes AFTER the merged
    * token, so `aaa` under (a,a) gives [aa, a], not [aa, aa]).
    */
  private[functions] def mergePair(syms: Vector[String],
      pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Encode one word under an ordered merge table: rules in rank order,
    * ONE left-to-right non-overlapping pass each ([[mergePair]] — the
    * Sennrich convention; one pass per rule is already that rule's
    * fixpoint, since a merge's output `ab` can never equal `a` or `b`
    * and so never recreates its own pair). NOT implemented as bulk
    * string `replace`: replacing " a b " with consumed delimiters skips
    * a symbol after every match inside an odd run (`aaaaa` under (a,a)
    * would give [aa, a, aa] instead of the correct [aa, aa, a]) — the
    * SQL oracle therefore replays each rule by LEFTMOST-single-
    * occurrence replacement to exhaustion, which IS equivalent to the
    * left-to-right pass (each replacement takes the leftmost remaining
    * pair, and merged output never re-matches the rule), as
    * BpeTokenizerSpec's property test pins.
    */
  def encode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var syms = word.map(_.toString).toVector
    merges.foreach { m => syms = mergePair(syms, m) }
    syms
  }

  /** A merge table is well-formed iff each rule's two symbols are
    * single characters or the output of a strictly earlier rule — the
    * property that makes rank-order application equivalent to
    * lowest-rank-pair-first encoding. Training output always satisfies
    * it; asserted in the spec so a hand-edited fixture can't silently
    * change encode semantics.
    */
  def wellFormed(merges: Seq[(String, String)]): Boolean = {
    val known = mutable.Set.empty[String]
    merges.forall { case (a, b) =>
      val ok = (a.length == 1 || known(a)) && (b.length == 1 || known(b))
      known += a + b
      ok
    }
  }

  /** The DuckDB CTE text replaying `merges` over a previously-defined
    * `dw(w)` distinct-word relation: defines `rules`, the recursive
    * `enc` (leftmost-occurrence replacement, rank order), and
    * `pieces(w, ps)`. ONE source of truth for every oracle that needs
    * the subword split (`ta_bpe_encode`, `pipe_token_pack_bpe`) —
    * callers splice it into a `WITH RECURSIVE` list after defining
    * `dw`; the rules VALUES are interpolated from the same Scala
    * constant the engine broadcasts, so engine and oracles cannot
    * drift apart silently.
    */
  def duckdbReplayCtes(merges: Seq[(String, String)]): String = {
    val n = merges.length
    val vals = merges.zipWithIndex
      .map { case ((a, b), i) => s"($i, ' $a $b ', ' ${a + b} ')" }
      .mkString(", ")
    s"""rules(i, pat, rep) AS (VALUES $vals),
        -- rank-order merge replay: each rule merges its LEFTMOST
        -- occurrence repeatedly until absent (equivalent to one
        -- left-to-right non-overlapping pass — bulk replace() would
        -- NOT be: its consumed delimiters skip a symbol inside odd
        -- same-symbol runs), then i advances; done when i = $n
        enc(w, s, i) AS (
          SELECT w,
            ' ' || array_to_string(regexp_extract_all(w, '.'), ' ') || ' ', 0
          FROM dw
          UNION ALL
          SELECT e.w,
            CASE WHEN strpos(e.s, r.pat) > 0
                 THEN substr(e.s, 1, strpos(e.s, r.pat) - 1) || r.rep ||
                      substr(e.s, strpos(e.s, r.pat) + length(r.pat))
                 ELSE e.s END,
            CASE WHEN strpos(e.s, r.pat) > 0 THEN e.i ELSE e.i + 1 END
          FROM enc e JOIN rules r ON r.i = e.i
          WHERE e.i < $n),
        pieces AS (SELECT w, string_split(trim(s), ' ') AS ps
          FROM enc WHERE i = $n)"""
  }

  /** The deterministic vocabulary a merge table induces, with stable
    * token ids: the 26 base characters `a`..`z` get ids 0..25, merge
    * rule k's output gets id 26+k. Every piece [[encode]] can emit over
    * `[a-z]+` words is either a base char or a rule output, so the map
    * is total for the encode domain — and it is reproducible from the
    * merge table alone, which is what lets a SQL oracle state the SAME
    * ids as a literal VALUES table.
    */
  def vocabIds(merges: Seq[(String, String)]): Map[String, Int] = {
    val base = ('a' to 'z').zipWithIndex.map { case (c, i) => c.toString -> i }
    val learned = merges.zipWithIndex.map { case ((a, b), k) => (a + b) -> (26 + k) }
    // a re-learned pair producing an existing token cannot happen (train
    // never merges a pair twice — the pair no longer exists after its
    // merge), so the map sizes must add up; assert rather than assume
    val m = (base ++ learned).toMap
    require(m.size == base.size + learned.size,
      "duplicate token in vocabulary — merge table re-derived a token")
    m
  }

  /** The frozen merge table `ta_bpe_encode` ships: 40 merges trained
    * ONCE from the sf0.01 documents corpus ([a-z]+ words of
    * lowercased text) by [[train]] — regenerable via
    * `BpeTokenizerSpec`'s training-reproducibility test, which asserts
    * `train(corpus word counts, 40)` equals this constant exactly. A
    * frozen table (not per-run training) is how tokenizers exist in
    * production: trained once, versioned, applied everywhere — and it
    * is what lets the DuckDB oracle replay the identical rules from a
    * static SQL literal.
    */
  val FrozenMerges: Seq[(String, String)] = FrozenBpeMerges.Merges
}
