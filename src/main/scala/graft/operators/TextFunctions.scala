package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text functions mirroring the reference's word mappers.
  * All are compositions of built-in (codegen'd) functions — no UDFs.
  */
object TextFunctions {

  /** The eight Arabic tashkeel marks the reference strips
    * (ArabicTextWordsTokenizerTransformer.remove_diac,
    * /root/reference v2/arabic_transformers.py:25-28).
    */
  val ArabicDiacritics: String = "ًٌٍَُِّْ"

  def removeDiacritics(c: Column): Column = translate(c, ArabicDiacritics, "")

  /** Arabic letter-run extraction (v2/arabic_transformers.py:17-24):
    * runs of Arabic letters + diacritics are the token candidates.
    */
  val ArabicTokenPattern: String = "[\\u0621-\\u063a\\u0640-\\u0652\\u0622\\u0623\\u0624\\u0625\\u0626\\u0629\\u0649]+"

  /** Array of Arabic tokens in `c`. */
  def arabicTokens(c: Column): Column =
    filter(regexp_extract_all(c, lit(ArabicTokenPattern), lit(0)), w => trim(w) =!= "")

  /** truncate_str_255 analog (v2/core/commons.py). */
  def truncate255(c: Column): Column = substring(c, 1, 255)

  /** The reference's unique-word normalizer chain lower∘strip (v2/main.py:112). */
  def normalizeWord(c: Column): Column = lower(trim(c))

  /** basename_backwards_xN analog (v2/core/commons.py, used at
    * v2/main.py:205): keep only the last `n` path segments so loaded
    * file paths stay bounded; combined with truncation to 270 chars
    * (truncate_str_270).
    */
  def basenameBackwards(c: Column, n: Int = 4): Column = {
    val parts = split(c, "/")
    val tail  = when(size(parts) <= n, parts).otherwise(slice(parts, -n, n))
    substring(array_join(tail, "/"), 1, 270)
  }
}
