package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** O4 config resolution (config.py:64-122 semantics): env var beats
  * override beats default; typed getters coerce or fall back.
  */
class EngineConfigSpec extends AnyFunSuite {

  test("resolution order: env > override > default") {
    val key = "etl.transform.null_handling"
    assert(EngineConfig(env = Map.empty).getString(key, "x") == "drop") // default
    val overridden = EngineConfig(env = Map.empty).withOverride(key, "fill")
    assert(overridden.getString(key, "x") == "fill")
    val env = EngineConfig(
      overrides = Map(key -> "fill"),
      env = Map("GRAFT_ETL_TRANSFORM_NULL_HANDLING" -> "flag"))
    assert(env.getString(key, "x") == "flag")
  }

  test("typed getters coerce and fall back on junk") {
    val c = EngineConfig(env = Map.empty)
      .withOverride("a.int", "17")
      .withOverride("a.bad", "seventeen")
      .withOverride("a.bool", "Yes")
      .withOverride("a.double", "0.85")
    assert(c.getInt("a.int", 0) == 17)
    assert(c.getInt("a.bad", 5) == 5)
    assert(c.getBoolean("a.bool", default = false))
    assert(c.getDouble("a.double", 0.0) == 0.85)
    assert(c.getInt("missing.key", 9) == 9)
  }

  test("dot and dash keys translate to env names") {
    val c = EngineConfig(env = Map("GRAFT_ETL_MAX_FILE_SIZE_MB" -> "250"))
    assert(c.getInt("etl.max-file-size.mb", 0) == 250)
  }
}
