package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wipe-guard contract for Verify's output dir (ADVICE r3: a directory of
  * dotfiles must NOT be deletable). Pure predicate, no Spark.
  */
class VerifyGuardSpec extends AnyFunSuite {

  test("positive evidence accepted: markers, q-dirs, crashed-run leftovers") {
    assert(Verify.looksLikeVerifyOut(Seq("manifest.json", "oracle_sql.json", "q1_agg")))
    assert(Verify.looksLikeVerifyOut(Seq("q1_agg", "q2_clean_names"))) // crashed run: no markers
    assert(Verify.looksLikeVerifyOut(Seq("oracle_sql.json")))
    assert(Verify.looksLikeVerifyOut(Seq("q1_agg", "_SUCCESS", ".crc")))
    assert(Verify.looksLikeVerifyOut(Seq.empty)) // empty dir: nothing at risk
  }

  test("refuses without positive evidence or with unrecognized contents") {
    // dot/underscore-only: some other tool's state, not a Verify dump
    assert(!Verify.looksLikeVerifyOut(Seq(".git", ".config")))
    assert(!Verify.looksLikeVerifyOut(Seq("_metadata", "_temporary")))
    // transposed-args shape: an sf dataset dir
    assert(!Verify.looksLikeVerifyOut(Seq("lineitem.parquet", "orders.parquet")))
    // one unrecognized entry poisons an otherwise-valid dump dir
    assert(!Verify.looksLikeVerifyOut(Seq("manifest.json", "q1_agg", "notes.txt")))
    // a bare q-prefix is NOT a dump name — q<digits>_ is the convention
    assert(!Verify.looksLikeVerifyOut(Seq("queries.csv")))
    assert(!Verify.looksLikeVerifyOut(Seq("quarterly", ".DS_Store")))
  }

  test("refusal recognizer names the actual offenders (ADVICE r4)") {
    // The message builder uses the same recognizer as the guard: a name
    // like "queries.csv" must be reported, not filtered out by a stale
    // startsWith("q") check.
    assert(!Verify.recognizes("queries.csv"))
    assert(!Verify.recognizes("quarterly"))
    assert(Verify.recognizes("q1_agg"))
    assert(Verify.recognizes("_SUCCESS"))
    assert(Verify.recognizes(".crc"))
    assert(Verify.recognizes("manifest.json"))
  }
}
