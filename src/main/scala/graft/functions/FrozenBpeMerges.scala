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
}
