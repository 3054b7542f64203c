package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{Retrieval, Selection}

/** Partitioning-invariance properties for the round-9 operators: the
  * hash-gate determinism of q126–q128 rests on every float reaching
  * the output through either exact integer/decimal arithmetic or a
  * fixed-order expression — so the results must be BIT-identical under
  * any physical partitioning, not merely close. */
object RetrievalProperties extends Properties("Retrieval") {

  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val word: Gen[String] = Gen.oneOf("a", "b", "c", "d", "e", "f")
  private val text: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val docsGen: Gen[List[(Long, String, String)]] =
    Gen.choose(3, 12)
      .flatMap(n => Gen.listOfN(n, Gen.zip(text, Gen.oneOf("en", "de"))))
      .map(_.zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) })
  private val embGen: Gen[List[(Long, Array[Float], Int)]] =
    Gen.choose(3, 12)
      .flatMap(n => Gen.listOfN(n, Gen.zip(
        Gen.chooseNum(-100, 100), Gen.chooseNum(-100, 100), Gen.oneOf(0, 1, 2))))
      .map(_.zipWithIndex.map { case ((x, y, l), i) =>
        (i.toLong, Array(x / 10.0f, y / 10.0f), l)
      })

  property("DSIR weights bit-identical under any partitioning") =
    forAll(docsGen, Gen.choose(1, 7), Gen.choose(1, 7)) { (rows, p1, p2) =>
      import spark.implicits._
      def run(p: Int) = Selection.dsirLogWeights(
          rows.toDF("doc_id", "text", "lang").repartition(p),
          col("lang") === "en")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      run(p1) == run(p2)
    }

  property("hybrid RRF top-k bit-identical under any partitioning") =
    forAll(docsGen, embGen, Gen.choose(1, 7), Gen.choose(1, 7)) {
      (docRows, embRows, p1, p2) =>
        import spark.implicits._
        val ids = docRows.map(_._1).toSet.intersect(embRows.map(_._1).toSet)
        // Keep the id spaces aligned like the real tables.
        val docs = docRows.filter(r => ids(r._1)).toDF("doc_id", "text", "lang")
        val emb = embRows.filter(r => ids(r._1)).toDF("vec_id", "embedding", "label")
        def run(p: Int) = Retrieval.hybridRrfTopK(
            docs.repartition(p), emb.repartition(p),
            nQueries = 3, listK = 4, k = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            Option(r.get(2)), Option(r.get(3)), r.getDouble(4), r.getInt(5)))
          .sortBy(t => (t._1, t._6)).toSeq
        run(p1) == run(p2)
    }

  property("hard negatives: label-disjoint and partition-invariant") =
    forAll(embGen, Gen.choose(1, 7), Gen.choose(1, 7)) { (rows, p1, p2) =>
      import spark.implicits._
      def run(p: Int) = Retrieval.hardNegatives(
          rows.toDF("vec_id", "embedding", "label").repartition(p),
          nQueries = 3, k = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getInt(3), r.getDouble(4), r.getInt(5)))
        .sortBy(t => (t._1, t._6)).toSeq
      val a = run(p1)
      a == run(p2) && a.forall(t => t._2 != t._4)
    }
}
