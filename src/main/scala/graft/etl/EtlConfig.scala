package graft.etl

import scala.util.matching.Regex

/** Config metadata driving the ETL, mirroring the reference's YAML shape
  * (fields enumerated from usage at data_manager.py:38, 49, 53, 62,
  * 71–76, 90, 108–109 and settings.py:23–31).
  *
  * Config is bounded, driver-side data: maps here become literal
  * `map(...)` expressions or broadcast lookups — never a shuffle.
  */
final case class FileMappingConfig(
    csvSeparator: String,
    /** csv column -> canonical name; keys also act as the projection
      * (data_manager.py:49–53: select original_fields.keys then rename). */
    originalFields: Map[String, String],
    /** canonical columns concatenated with '#' and MD5-hashed
      * (data_manager.py:62–63). */
    surrogateKeyColumns: Seq[String],
    /** acc_number -> acc_name decode map (data_manager.py:71); stm only. */
    accounts: Map[String, String] = Map.empty,
    /** debit/credit flag -> ±1 multiplier (data_manager.py:76); stm only. */
    debitMultiplier: Map[String, Int] = Map.empty,
    /** Python strftime pattern for date columns (data_manager.py:72,80–81). */
    dateFormat: String = "%Y-%m-%d",
    /** final projection + ordering (data_manager.py:90). */
    desiredFields: Seq[String])

/** Top-level ETL config: file-name routing + per-(mappingType, bank)
  * transform configs (settings.py:23–31; data_manager.py:143–170). */
final case class EtlConfig(
    /** must expose exactly 3 capture groups: (bank, accType, mappingType)
      * (data_manager.py:143–159). */
    filePattern: Regex,
    /** mappingType -> bank -> config (data_manager.py:161–170). */
    mapping: Map[String, Map[String, FileMappingConfig]])

object EtlConfig {

  /** Python strftime -> java.time (Spark datetime) pattern translation
    * (SURVEY.md §2 F4). Only directives that appear in bank-statement
    * configs are supported; unknown directives are an error rather than
    * a silent mis-parse (§7.3 risk 3).
    */
  private val strftimeMap: Map[Char, String] = Map(
    'd' -> "dd", 'm' -> "MM", 'Y' -> "yyyy", 'y' -> "yy",
    'H' -> "HH", 'M' -> "mm", 'S' -> "ss", 'j' -> "DDD",
    'B' -> "MMMM", 'b' -> "MMM", 'p' -> "a", 'I' -> "hh",
    'f' -> "SSSSSS", 'z' -> "xx", '%' -> "%")

  def strftimeToSpark(fmt: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val d = fmt.charAt(i + 1)
        out ++= strftimeMap.getOrElse(d,
          throw new IllegalArgumentException(s"unsupported strftime directive %$d in '$fmt'"))
        i += 2
      } else {
        // literal text: java.time treats letters as pattern chars — quote them
        if (c.isLetter) out ++= s"'$c'" else out += c
        i += 1
      }
    }
    out.result()
  }
}
