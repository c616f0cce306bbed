package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution is heavy-
  * tailed — the 100 TB survival kit the driver prompt calls out (AQE's
  * skew-join handles sort-merge cases adaptively; explicit salting covers
  * the planned-ahead case and documents the technique).
  *
  * Salted equi-join: the skewed (large) side gets a random-but-
  * deterministic salt in [0, saltFactor); the small side is replicated
  * `saltFactor` times with every salt value; the join key becomes
  * (key, salt), spreading each hot key over saltFactor reducers.
  * Results are identical to the unsalted join (verified in SkewSpec).
  */
object Skew {

  /** Per-row salt — spreads rows of one key across `saltFactor` partitions.
    * The ordinal (monotonically_increasing_id) drives the spread, NOT a
    * pure content hash: byte-identical duplicate rows (the common
    * heavy-skew case) would all hash to one salt and defeat the spread
    * entirely. The content hash is mixed in so distinct rows with the
    * same ordinal don't correlate across partitions. The salt value never
    * affects join/aggregate RESULTS — the small side is replicated across
    * every salt — only row placement; and because the ordinal depends on
    * row order within a recomputed partition, mEID is (correctly) marked
    * nondeterministic in Catalyst, so a fetch-failure retry recomputes the
    * consuming stage rather than trusting stale placement. rand() would
    * give the same guarantees with worse debuggability. */
  private def salt(df: DataFrame, saltFactor: Int): Column = {
    // xxhash64 rejects MapType inputs — hash only the hashable columns
    // (the ordinal alone already carries the spread; the content hash is
    // decorrelation, so dropping unhashable columns from it is safe)
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    pmod(
      xxhash64((cols :+ monotonically_increasing_id()): _*),
      lit(saltFactor.toLong))
  }

  /** Inner equi-join `large ⋈ small` on `keys`, salted `saltFactor` ways.
    * `small` is replicated saltFactor× (explode), so keep saltFactor
    * modest (8–32) and the replicated side the smaller one. */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0)
    val saltedLarge = large.withColumn("__salt", salt(large, saltFactor))
    val replicatedSmall = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${saltFactor - 1})")))
    saltedLarge.join(replicatedSmall, keys :+ "__salt").drop("__salt")
  }

  /** Skewed-aggregate: two-phase groupBy — first by (key, salt) (spreads a
    * hot key over saltFactor partial aggregates), then by key. Only
    * algebraic aggregates compose this way; count/sum are provided. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], sumCol: String,
      saltFactor: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", salt(df, saltFactor))
      .groupBy((keyCols :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__s"))
      .groupBy(keyCols: _*)
      .agg(sum("__n").as("n"), sum("__s").as(s"sum_$sumCol"))
  }

  /** Driver-oracle entry (SURVEY §2 B14): the salt spreads rows, never
    * results — the two-phase aggregate must equal the plain GROUP BY, so
    * the one-phase SQL IS the oracle. lineitem's l_returnflag is the
    * canonical 3-hot-key distribution. The double SUMs match the one-phase
    * oracle BIT-FOR-BIT only because l_quantity is INTEGER-VALUED (every
    * partial sum is exact in binary, so regrouping cannot change it) — a
    * fractional double column would make the salted two-phase total
    * order-sensitive and hash-mismatch intermittently; such an entry must
    * sum as decimal instead. */
  val entries: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)] = Seq(
    "skew_agg" -> ((s, d) => saltedCountSum(
      graft.Tables.load(s, d, "lineitem").select("l_returnflag", "l_quantity"),
      Seq("l_returnflag"), "l_quantity").orderBy("l_returnflag")))

  val oracle: Seq[(String, String)] = Seq(
    "skew_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS sum_l_quantity
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
