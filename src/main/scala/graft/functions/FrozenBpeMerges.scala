package graft.functions

/** The versioned merge-table artifact for [[BpeTokenizer]] — 40 rules
  * trained once from the sf0.01 documents corpus (word extraction:
  * `[a-z]+` over lowercased text; tie-break: count desc, then
  * lexicographic pair). `BpeTokenizerSpec` re-trains from the corpus
  * every run and asserts exact equality with this constant, so the
  * fixture cannot drift from the trainer silently; `ta_bpe_encode`'s
  * DuckDB oracle interpolates the SAME constant into its recursive-CTE
  * replay, so engine and oracle share one source of truth.
  */
object FrozenBpeMerges {
  val Merges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
    ("a", "r"), ("p", "ar"), ("j", "o"), ("jo", "in"),
    ("a", "s"), ("as", "h"), ("h", "ash"), ("r", "ow"),
    ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"),
    ("co", "lu"), ("colu", "m"), ("colum", "n"), ("cu", "st"),
    ("cust", "o"), ("custo", "mer"), ("f", "i"), ("fi", "l"),
    ("fil", "t"), ("filt", "er"), ("a", "l"), ("al", "l"),
    ("m", "all"), ("s", "mall"), ("g", "e"), ("l", "ow"))

  /** The frozen BYTE-level table: 48 merges trained once from the
    * sf0.01 documents corpus ENRICHED by `TextAnalysis.ByteRichExpr`
    * (case, digits, punctuation, multi-byte UTF-8 — the corpus itself
    * is ASCII-lowercase, so the byte-rich shape is constructed, same
    * policy as `ta_unicode_nfc`); pretokens `\S+`, symbols remapped
    * through `BpeTokenizer.ByteToChar` before training. Non-ASCII
    * remapped chars are stated as unicode escapes so the fixture is
    * encoding-proof; `ByteBpeSpec` re-trains and asserts exact
    * equality every run.
    */
  val ByteMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("c", "a"), ("o", "r"), ("s", "t"),
    ("o", "w"), ("1", "4"), ("i", "n"), (".", "14"),
    (".14", "!"), ("3", ".14!"), ("D", "o"), ("Do", "c"),
    ("ca", "f"), ("caf", "\u00c3"), ("caf\u00c3", "\u00a9"), ("\u00e2", "\u0122"),
    ("\u00e2", "\u0126"), ("\u00e2", "\u013a"), ("\u00e2\u0122", "\u0136"), ("\u00e2\u0126", "\u0138"),
    ("\u00e2\u013a", "\u0137"), ("\u00e2\u013a\u0137", "\u00f0"), ("\u00e2\u013a\u0137\u00f0", "\u0141"), ("\u00e2\u013a\u0137\u00f0\u0141", "\u013b"),
    ("\u00e2\u013a\u0137\u00f0\u0141\u013b", "\u0124"), ("a", "t"), ("m", "er"), ("a", "l"),
    ("p", "a"), ("pa", "r"), ("k", "e"), ("ke", "y"),
    ("t", "a"), ("b", "at"), ("ta", "b"), ("a", "s"),
    ("c", "o"), ("bat", "c"), ("c", "u"), ("tab", "l"),
    ("batc", "h"), ("co", "l"), ("r", "ow"), ("s", "m"),
    ("tabl", "e"), ("sm", "al"), ("col", "u"), ("d", "at")
  )
}
