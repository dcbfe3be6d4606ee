package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash (Charikar '02) 64-bit document fingerprints + Hamming-ball
  * candidate search.
  *
  * The fingerprint is computed entirely per-row with higher-order
  * functions — no explode, no shuffle: for each of the 64 bit positions,
  * sum ±1 over the token hashes' bits and keep the sign. Near-duplicates
  * are then pairs within a small Hamming distance, found by the
  * Manku/Jain/Sarma table construction: split the 64 bits into
  * `chunks` equal pieces — two hashes within Hamming distance d share at
  * least one identical chunk when chunks > d — and bucket-join on chunk
  * value, verifying the true distance with bit_count(xor).
  */
object SimHash {

  /** 64-bit simhash of a token-array column, as a signed long. Native
    * single-pass codegen'd expression ([[graft.functions.SimHash64]]);
    * token hashes are xxhash64(seed 42), votes and sign bits in one loop.
    */
  def simhash64(tokens: Column): Column =
    call_function("graft_simhash64", array_distinct(tokens))

  /** Per-doc simhash fingerprints for a text column. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), simhash64(Shingles.tokens(col(textCol))).as("simhash"))

  /** Pairs (idA < idB) with Hamming distance ≤ maxDistance. `chunks` must
    * exceed maxDistance for exact recall (pigeonhole); 4 chunks of 16 bits
    * is the standard d ≤ 3 configuration.
    */
  def nearPairs(
      fps: DataFrame,
      idCol: String,
      maxDistance: Int = 3,
      chunks: Int = 4
  ): DataFrame = {
    require(chunks > maxDistance, "need chunks > maxDistance for exact recall")
    val width = 64 / chunks
    val mask = (1L << width) - 1
    val chunkCols = (0 until chunks).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("simhash"), c * width).bitwiseAND(lit(mask)).as("ck"))
    }
    val exploded = fps
      .select(col(idCol), col("simhash"), explode(array(chunkCols: _*)).as("cc"))
      .select(col(idCol), col("simhash"), col("cc.chunk").as("chunk"), col("cc.ck").as("ck"))

    // Unlike the MinHash band join (64-bit buckets, tiny groups), chunk
    // values are only 16 bits, so a shared-vocabulary corpus produces HOT
    // buckets — a bucket-collect would build quadratic pair arrays in one
    // task (measured 2x slower), while the hash self-join streams them
    // through codegen. The double-evaluation trap of a self-join is
    // closed by materializing the exploded fingerprints first: 4 rows of
    // (id, hash, chunk) per doc, trivially small at any corpus size.
    val mat = exploded.localCheckpoint()
    val a = mat.select(col("chunk"), col("ck"),
      col(idCol).as("id_a"), col("simhash").as("sim_a"))
    val b = mat.select(col("chunk"), col("ck"),
      col(idCol).as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("chunk", "ck"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .filter(col("hamming") <= maxDistance)
      .distinct()
  }
}
