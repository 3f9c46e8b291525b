package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** YAML subset parser + EtlConfig binding contracts (settings.py
  * loader parity on the reference's config shape). */
class YamlConfigSpec extends AnyFunSuite {
  import YamlConfig._

  test("scalars: quotes, numbers, booleans, null, comments") {
    val root = parse(
      """a: 'single % kept'   # trailing comment
        |b: "dq \"esc\""
        |c: 42
        |d: -1.5
        |e: true
        |f: null
        |g: plain text with spaces
        |h: 'it''s quoted'
        |""".stripMargin).asInstanceOf[Map[String, Any]]
    assert(root("a") == "single % kept")
    assert(root("b") == "dq \"esc\"")
    assert(root("c") == 42L)
    assert(root("d") == -1.5)
    assert(root("e") == true)
    assert(root("f") == null)
    assert(root("g") == "plain text with spaces")
    assert(root("h") == "it's quoted")
  }

  test("nested blocks, block lists, inline collections, key order") {
    val root = parse(
      """top:
        |  mid:
        |    k1: v1
        |    k2: v2
        |  list:
        |    - one
        |    - two
        |  inline_list: [a, b, c]
        |  inline_map: {x: 1, y: 2}
        |""".stripMargin).asInstanceOf[Map[String, Any]]
    val top = root("top").asInstanceOf[Map[String, Any]]
    assert(top("mid").asInstanceOf[Map[String, Any]].keys.toSeq == Seq("k1", "k2"))
    assert(top("list") == Vector("one", "two"))
    assert(top("inline_list") == Vector("a", "b", "c"))
    assert(top("inline_map").asInstanceOf[Map[String, Any]] == Map("x" -> 1L, "y" -> 2L))
  }

  test("unsupported constructs and malformed lines are loud errors") {
    intercept[IllegalArgumentException](parse("a: &anchor x"))
    intercept[IllegalArgumentException](parse("a: |\n  block"))
    intercept[IllegalArgumentException](parse("just a line without separator"))
    intercept[IllegalArgumentException](parse("a:\n\tb: tabs"))
  }

  test("tabs inside quoted values are legal; escapes scan left to right") {
    // a tab csv_separator is valid YAML — only tab INDENTATION is not
    val root = parse("sep: '\t'\nesc: \"a\\\\nb\"\n").asInstanceOf[Map[String, Any]]
    assert(root("sep") == "\t")
    // "a\\nb" = literal backslash then 'n' — sequential replaces would
    // collapse it into a newline
    assert(root("esc") == "a\\nb")
  }

  test("fixture file binds to the exact code-built EtlConfig shape") {
    val cfg = loadEtlConfigFile(getClass.getResource("/etl_config.yaml").getPath)
    assert(cfg.filePattern.regex == """(\w+?)_(\w+?)_(stm|sec)\.csv""")
    val stm = cfg.mapping("stm")("alfabank")
    assert(stm.csvSeparator == ";")
    // key ORDER is part of the contract: original_fields keys act as
    // the csv projection (data_manager.py:49-53)
    assert(stm.originalFields.keys.toSeq == Seq("acc", "date", "amount", "flag", "descr"))
    assert(stm.originalFields("amount") == "sum")
    assert(stm.surrogateKeyColumns == Seq("acc_number", "dt", "sum"))
    assert(stm.accounts == Map("40817001" -> "Main account"))
    assert(stm.debitMultiplier == Map("D" -> -1, "K" -> 1))
    assert(stm.dateFormat == "%d.%m.%Y")
    assert(stm.desiredFields.head == "surrogate_key")
    val sec = cfg.mapping("sec")("alfabank")
    assert(sec.accounts.isEmpty && sec.debitMultiplier.isEmpty)
    assert(sec.dateFormat == "%Y-%m-%d")
  }

  test("missing required keys name the key in the error") {
    val e = intercept[IllegalArgumentException](
      loadEtlConfig("file_pattern: 'x'\n"))
    assert(e.getMessage.contains("mapping"))
    val e2 = intercept[IllegalArgumentException](loadEtlConfig(
      """file_pattern: 'x'
        |mapping:
        |  stm:
        |    bank1:
        |      csv_separator: ';'
        |""".stripMargin))
    assert(e2.getMessage.contains("original_fields"))
  }
}
