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

  /** [[train]] at production vocabulary sizes: the same merges, learned
    * INCREMENTALLY. [[train]] recounts every pair over the whole
    * vocabulary per iteration (O(merges × vocab) — fine at the frozen
    * 40/48-rule fixtures, quadratic pain at a 5k+ tier); this keeps
    * exact pair counts in a (count desc, pair asc)-ordered tree plus a
    * pair→words index, and each merge touches only the words that
    * CONTAIN the merged pair — remove their old pairs' contributions,
    * re-merge, add the new ones. Counts stay exact longs and the
    * argmax tie-break is the same (count desc, lexicographic asc), so
    * the output is IDENTICAL to [[train]]'s, property-pinned in
    * BpeHeapEncodeSpec. The index may hold stale word ids (a word that
    * no longer contains the pair); their deltas cancel exactly, so
    * staleness costs work, never correctness.
    */
  def trainIncremental(wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    val words = wordCounts.map(_._1.map(_.toString).toVector).toArray
    val wcnt = wordCounts.map(_._2).toArray
    val cnt = mutable.Map.empty[(String, String), Long]
    val where = mutable.Map.empty[(String, String), mutable.Set[Int]]
    val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long.reverse, Ordering.String, Ordering.String)
    val set = mutable.TreeSet.empty[(Long, String, String)](ord)
    def bump(p: (String, String), d: Long): Unit = {
      val old = cnt.getOrElse(p, 0L)
      if (old != 0L) set.remove((old, p._1, p._2))
      val nu = old + d
      if (nu != 0L) { cnt(p) = nu; set.add((nu, p._1, p._2)); () }
      else { cnt.remove(p); () }
    }
    words.indices.foreach { wi =>
      val s = words(wi)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        bump(p, wcnt(wi))
        where.getOrElseUpdate(p, mutable.Set.empty) += wi
        i += 1
      }
    }
    val out = Seq.newBuilder[(String, String)]
    var it = 0
    while (it < numMerges && set.nonEmpty) {
      val (_, a, b) = set.head
      val p = (a, b)
      out += p
      where.getOrElse(p, mutable.Set.empty).toSeq.foreach { wi =>
        val s = words(wi)
        var i = 0
        while (i < s.length - 1) { bump((s(i), s(i + 1)), -wcnt(wi)); i += 1 }
        val ns = mergePair(s, p)
        words(wi) = ns
        i = 0
        while (i < ns.length - 1) {
          val np = (ns(i), ns(i + 1))
          bump(np, wcnt(wi))
          where.getOrElseUpdate(np, mutable.Set.empty) += wi
          i += 1
        }
      }
      where.remove(p)
      it += 1
    }
    out.result()
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

  /** HEAP-walk encode — the production-vocabulary shape of [[encode]].
    * [[encode]] scans EVERY rule over the symbol list (O(merges × L)
    * per word): the right reference semantics and exactly what the SQL
    * oracle replays, but the wrong algorithm at a 30k–50k-merge
    * production vocabulary (~10⁹ rule passes over a 20k-word corpus
    * vocab). This walks only the word's ADJACENT PAIRS with a rank
    * heap — O(L log L) per word, INDEPENDENT of merge-table size:
    * each adjacent pair that has a rank enters a priority queue; the
    * lowest-rank (ties: leftmost) instance merges; a merge invalidates
    * its neighbors' stale entries lazily (per-node version stamps) and
    * enqueues the ≤2 new pairs it creates.
    *
    * EQUIVALENT to [[encode]] for any [[wellFormed]] table, which
    * training always emits (property-pinned in BpeHeapEncodeSpec on
    * both frozen fixtures and random trained tables):
    *  - a merge of rule r creates only pairs CONTAINING r's output, and
    *    any rule using that output is learned strictly later, so new
    *    pairs always rank > r — the minimum present rank never
    *    decreases, giving exactly the rank-order rule sequence;
    *  - within one rank, leftmost-first single merges ARE the
    *    left-to-right non-overlapping pass ([[mergePair]]'s semantics —
    *    the tie-break on the left node's original char offset is what
    *    makes `aaa` under (a,a) give [aa, a], never [a, aa]).
    *
    * Node indices double as those offsets: node i starts at word
    * offset i forever (merges fold the right symbol into the LEFT
    * node), so list order equals index order and the tie-break is free.
    */
  final class RankEncoder(merges: Seq[(String, String)])
      extends Serializable {
    require(wellFormed(merges),
      "RankEncoder needs a well-formed merge table (training output)")
    private val rank: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap

    private case class E(r: Int, pos: Int, l: Int, rt: Int, vl: Int, vr: Int)
    // PriorityQueue is a max-heap: invert so the head is the lowest
    // (rank, position) — rank order first, leftmost-first within a rank
    private val ord: Ordering[E] = Ordering.by(e => (-e.r, -e.pos))

    def encode(word: String): Seq[String] = {
      val n = word.length
      if (n == 0) return Seq.empty
      if (n == 1) return Seq(word)
      val sym = new Array[String](n)
      val next = new Array[Int](n)
      val prev = new Array[Int](n)
      val ver = new Array[Int](n)
      val alive = new Array[Boolean](n)
      var i = 0
      while (i < n) {
        sym(i) = String.valueOf(word.charAt(i))
        next(i) = i + 1; prev(i) = i - 1; alive(i) = true
        i += 1
      }
      next(n - 1) = -1
      val pq = mutable.PriorityQueue.empty[E](ord)
      def push(l: Int): Unit = {
        val rt = next(l)
        if (rt >= 0) rank.get((sym(l), sym(rt))).foreach { r =>
          pq.enqueue(E(r, l, l, rt, ver(l), ver(rt)))
        }
      }
      i = 0
      while (i < n - 1) { push(i); i += 1 }
      while (pq.nonEmpty) {
        val e = pq.dequeue()
        // lazy invalidation: the entry is live iff both nodes are
        // alive, still adjacent, and unchanged since it was enqueued
        if (alive(e.l) && alive(e.rt) && next(e.l) == e.rt &&
            ver(e.l) == e.vl && ver(e.rt) == e.vr) {
          sym(e.l) = sym(e.l) + sym(e.rt)
          alive(e.rt) = false
          val nn = next(e.rt)
          next(e.l) = nn
          if (nn >= 0) prev(nn) = e.l
          ver(e.l) += 1
          if (prev(e.l) >= 0) push(prev(e.l))
          push(e.l)
        }
      }
      val out = Seq.newBuilder[String]
      var c = 0 // node 0 has no left neighbor, so it can never be merged away
      while (c >= 0) { out += sym(c); c = next(c) }
      out.result()
    }

    /** Byte-level heap encode: [[toByteChars]] then [[encode]] — the
      * fast twin of [[encodeBytes]].
      */
    def encodeBytes(word: String): Seq[String] = encode(toByteChars(word))
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
  def duckdbReplayCtes(merges: Seq[(String, String)]): String =
    replayCtes(merges,
      """SELECT w,
            ' ' || array_to_string(regexp_extract_all(w, '.'), ' ') || ' ', 0
          FROM dw""")

  private def sqlQuote(s: String): String = s.replace("'", "''")

  /** The shared rule-replay body, parameterized by the SEED select that
    * produces each word's initial `(w, padded-symbol-string, 0)` row —
    * code-point symbols for [[duckdbReplayCtes]], byte-mapped chars for
    * [[duckdbByteReplayCtes]]. The replay itself is symbol-agnostic:
    * plain strpos/substr over the space-padded form.
    */
  private def replayCtes(merges: Seq[(String, String)],
      seedSelect: String): String = {
    val n = merges.length
    val vals = merges.zipWithIndex
      .map { case ((a, b), i) =>
        s"($i, ' ${sqlQuote(a)} ${sqlQuote(b)} ', ' ${sqlQuote(a + b)} ')" }
      .mkString(", ")
    s"""rules(i, pat, rep) AS (VALUES $vals),
        -- rank-order merge replay: each rule merges its LEFTMOST
        -- occurrence repeatedly until absent (equivalent to one
        -- left-to-right non-overlapping pass — bulk replace() would
        -- NOT be: its consumed delimiters skip a symbol inside odd
        -- same-symbol runs), then i advances; done when i = $n
        enc(w, s, i) AS (
          $seedSelect
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

  // ——— Single-sourced encode UDFs. The `.asNondeterministic()` pin is
  // LOAD-BEARING, not cosmetic: every consumer explodes the pieces
  // downstream, and for a deterministic UDF InferFiltersFromGenerate
  // adds `size(udf(w)) > 0` filters that predicate pushdown moves
  // through the broadcast join and BELOW the distinct-word aggregate —
  // re-running encode once per word OCCURRENCE (measured 200,500 calls
  // vs 500 for the BpeTokenizerSpec fixture, a 400× scale-killer at
  // corpus size). Marking it nondeterministic pins evaluation to the
  // post-distinct project. Declared HERE, next to the merge tables, so
  // the pin exists in exactly one place and a new consumer cannot
  // silently reintroduce the blowup.

  /** The encode functions a UDF should close over: the heap-walk
    * [[RankEncoder]] when the merge table is training-shaped
    * ([[wellFormed]] — the property the heap's equivalence proof
    * needs), the reference sequential-scan [[encode]]/[[encodeBytes]]
    * otherwise. A hand-built or truncated merge table thus still gets
    * a working encoder with the reference rank-order semantics instead
    * of a construction-time exception; the fast path stays the default
    * because training output is always well-formed.
    */
  private def encoderFor(merges: Seq[(String, String)])
      : (String => Seq[String], String => Seq[String]) =
    if (wellFormed(merges)) {
      val enc = new RankEncoder(merges)
      (enc.encode _, enc.encodeBytes _)
    } else (w => encode(w, merges), w => encodeBytes(w, merges))

  /** Subword pieces of one `[a-z]+` word under `merges` — the memoized
    * per-DISTINCT-word UDF every `ta_bpe_*`/`pipe_*_bpe` entry shares.
    */
  def encodeUdf(merges: Seq[(String, String)])
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    // heap-walk encoder: identical pieces (BpeHeapEncodeSpec pins the
    // equivalence), O(L log L) per word instead of O(merges × L)
    val (enc, _) = encoderFor(merges)
    org.apache.spark.sql.functions.udf((w: String) => enc(w))
      .asNondeterministic()
  }

  /** [[encodeUdf]] continued through [[vocabIds]] to token ids. */
  def encodeIdsUdf(merges: Seq[(String, String)])
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val ids = vocabIds(merges)
    val (enc, _) = encoderFor(merges)
    org.apache.spark.sql.functions
      .udf((w: String) => enc(w).map(p => ids(p).toLong))
      .asNondeterministic()
  }

  // ——— Byte-level BPE: the total-domain tokenizer. The `[a-z]+` family
  // above silently DROPS digits, punctuation and all non-Latin text at
  // its regexp pre-filter; production tokenizers are byte-level
  // precisely so the id map is total for arbitrary bytes. Same
  // construction GPT-2's encoder published: remap each of the 256 byte
  // values to a distinct PRINTABLE code point (bytes that are already
  // printable-and-not-space keep themselves; the rest get 256, 257, …
  // in byte order), run ordinary character BPE over the remapped
  // string, and decode by reversing the map. Every piece is then a
  // string both engines handle verbatim, no symbol ever contains the
  // space delimiter the padded-string replay uses, and ids are total:
  // base byte b ↦ id b, merge rule k's output ↦ id 256+k.

  /** The byte↦char bijection: printable non-space single-byte code
    * points (`!`..`~`, `¡`..`¬`, `®`..`ÿ`) map to themselves, the other
    * 68 byte values map to 256+n in byte order — all in the BMP, so one
    * UTF-16 char each.
    */
  val ByteToChar: Array[Char] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  private val CharToByte: Map[Char, Int] =
    ByteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** A word's UTF-8 bytes as the remapped printable-char string — the
    * symbol sequence byte-level training and encoding run over.
    */
  def toByteChars(word: String): String = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = ByteToChar(bytes(i) & 0xFF); i += 1 }
    new String(out)
  }

  /** Byte-level encode: total over ARBITRARY input — digits,
    * punctuation, any Unicode. Pieces are strings of remapped byte
    * chars; [[decodeBytes]] inverts losslessly.
    */
  def encodeBytes(word: String, merges: Seq[(String, String)]): Seq[String] =
    encode(toByteChars(word), merges)

  /** Lossless inverse of [[encodeBytes]]: concatenate the pieces, map
    * each char back to its byte, decode UTF-8.
    */
  def decodeBytes(pieces: Seq[String]): String = {
    val chars = pieces.mkString
    val bytes = new Array[Byte](chars.length)
    var i = 0
    while (i < chars.length) {
      bytes(i) = CharToByte(chars(i)).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The TOTAL id map a byte-level merge table induces: byte value b
    * (as its remapped char) ↦ id b for all 256 bytes, merge rule k's
    * output ↦ id 256+k. [[encodeBytes]] can only emit single byte
    * chars or rule outputs, so lookup never misses — the totality the
    * `[a-z]+` [[vocabIds]] lacks.
    */
  def byteVocabIds(merges: Seq[(String, String)]): Map[String, Int] = {
    val base = ByteToChar.zipWithIndex
      .map { case (c, b) => c.toString -> b }
    val learned = merges.zipWithIndex
      .map { case ((a, b), k) => (a + b) -> (256 + k) }
    val m = (base ++ learned).toMap
    require(m.size == base.length + learned.size,
      "duplicate token in byte vocabulary — merge table re-derived a token")
    m
  }

  /** Byte-level [[encodeUdf]] — same memoize-per-distinct-word +
    * nondeterministic-pin contract.
    */
  def encodeBytesUdf(merges: Seq[(String, String)])
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val (_, encB) = encoderFor(merges)
    org.apache.spark.sql.functions
      .udf((w: String) => encB(w))
      .asNondeterministic()
  }

  /** Byte-level id encode: total for arbitrary words. */
  def encodeByteIdsUdf(merges: Seq[(String, String)])
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val ids = byteVocabIds(merges)
    val (_, encB) = encoderFor(merges)
    org.apache.spark.sql.functions
      .udf((w: String) => encB(w).map(p => ids(p).toLong))
      .asNondeterministic()
  }

  /** Pieces AND ids in ONE pass — for consumers that need both: two
    * separate UDF calls would run the merge replay twice per distinct
    * word, doubling exactly the vocabulary-bounded work the
    * memoization exists to cap. Returns (piece, id) pairs; the id is a
    * map lookup on the piece just computed.
    */
  def encodeBytesWithIdsUdf(merges: Seq[(String, String)])
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val ids = byteVocabIds(merges)
    val (_, encB) = encoderFor(merges)
    org.apache.spark.sql.functions
      .udf((w: String) =>
        encB(w).map(p => (p, ids(p).toLong)))
      .asNondeterministic()
  }

  /** [[duckdbReplayCtes]] for the BYTE-level tokenizer: the seed
    * decomposes each word into UTF-8 bytes VIA `hex(encode(w))` (two
    * hex digits per byte, pure VARCHAR ops) and maps each byte through
    * a 256-row VALUES table to the SAME remapped chars the engine uses
    * — so the replay runs over identical symbols in both engines. The
    * byte map is interpolated from [[ByteToChar]], the rules from the
    * frozen table: one source of truth, same as the `[a-z]+` replay.
    * Callers splice after defining `dw(w)`; `bmap` and `wbytes` ride
    * along in the WITH list.
    */
  def duckdbByteReplayCtes(merges: Seq[(String, String)]): String = {
    val bmapVals = ByteToChar.zipWithIndex
      .map { case (c, b) => f"('$b%02X', '${sqlQuote(c.toString)}')" }
      .mkString(", ")
    s"""bmap(hx, ch) AS (VALUES $bmapVals),
        wbytes AS (
          SELECT w, i, substr(hex(encode(w)), 2 * i - 1, 2) AS hx
          FROM dw, unnest(range(1, octet_length(encode(w)) + 1)) AS u(i)),
        ${replayCtes(merges,
      """SELECT w, ' ' || string_agg(ch, ' ' ORDER BY i) || ' ', 0
          FROM wbytes JOIN bmap USING (hx) GROUP BY w""")}"""
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

  /** The frozen BYTE-level merge table (`ta_bpe_bytes`): 48 merges
    * trained once from the sf0.01 documents corpus — `\S+` pretokens of
    * the RAW text (no lowercasing, no alphabet filter: case, digits and
    * punctuation are learnable bytes here), remapped through
    * [[ByteToChar]], learned by the same [[train]]. Reproducibility
    * pinned by ByteBpeSpec exactly like [[FrozenMerges]].
    */
  val FrozenByteMerges: Seq[(String, String)] = FrozenBpeMerges.ByteMerges
}
