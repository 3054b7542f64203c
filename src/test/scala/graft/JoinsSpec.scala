package graft

import org.apache.spark.sql.functions._

import graft.engine.Joins

/** Salted-join semantics: bit-identical to the plain join (including
  * many-to-many multiplicity) while spreading a hot key over reducers. */
class JoinsSpec extends SparkSpec {

  // Heavy-tailed probe: one key with 5000 rows, 100 cold keys with 10 each.
  private def skewedProbe = {
    import spark.implicits._
    val hot = (0 until 5000).map(i => (0L, i.toLong))
    val cold = for (k <- 1 to 100; i <- 0 until 10) yield (k.toLong, i.toLong)
    (hot ++ cold).toDF("okey", "payload")
  }

  // Build side with DUPLICATE keys so many-to-many multiplicity is tested.
  private def build = {
    import spark.implicits._
    (0 to 100).flatMap(k => Seq((k.toLong, s"a$k"), (k.toLong, s"b$k")))
      .toDF("okey", "attr")
  }

  test("salted inner join is multiset-equal to the plain inner join") {
    val plain = skewedProbe.join(build, Seq("okey"))
      .select("okey", "payload", "attr")
    val salted = Joins.saltedInner(skewedProbe, build, "okey", salt = 8)
      .select("okey", "payload", "attr")
    // exceptAll both ways = multiset equality (duplicates counted).
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
    assert(plain.count() == (5000L + 100L * 10L) * 2L)
  }

  test("the hot key's rows land on multiple reducers") {
    // Post-join partitioning is the (okey, _salt) exchange, so the hot
    // key must span >1 partition — the entire point of salting. A plain
    // join puts every hot-key row in exactly one partition. Broadcast
    // would sidestep the exchange and AQE coalescing could re-merge the
    // tiny test partitions, so both are pinned off for the assertion
    // (at scale a large×large join shuffles regardless).
    def hotSpread(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("okey") === 0L)
        .select(spark_partition_id().as("pid")).distinct().count()
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val salted = Joins.saltedInner(skewedProbe, build, "okey", salt = 8)
      assert(hotSpread(salted) > 1, "salting must spread the hot key")
      val plain = skewedProbe.join(build, Seq("okey"))
      assert(hotSpread(plain) == 1, "unsalted shuffle join pins a key to one reducer")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
