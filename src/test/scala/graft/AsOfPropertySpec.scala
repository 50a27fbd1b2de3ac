package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized differential test: on arbitrary inputs (null keys and
  * times, duplicate timestamps, skewed keys, empty sides) the three as-of
  * execution paths — custom streaming merge, custom broadcast index, and the
  * union+window composition — must agree with each other AND with a direct
  * Scala reference model, for both left and inner variants and under a
  * tolerance. Duplicate (key, time) right rows are excluded by construction:
  * every engine (DuckDB included) picks an arbitrary winner among exact
  * ties, so equality there is not a defined property.
  */
case class AsOfPropL(id: Int, k: Option[Long], t: Option[Long])
case class AsOfPropR(k: Option[Long], t: Option[Long], v: Double)

class AsOfPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private type L = AsOfPropL
  private type R = AsOfPropR
  private val L = AsOfPropL
  private val R = AsOfPropR

  private def refModel(ls: Seq[L], rs: Seq[R], tol: Option[Long]): Map[Int, Option[Double]] =
    ls.map { l =>
      val m = (l.k, l.t) match {
        case (Some(lk), Some(lt)) =>
          rs.filter(r => r.k.contains(lk) && r.t.exists(rt =>
              rt <= lt && tol.forall(lt - rt <= _)))
            .sortBy(_.t.get).lastOption.map(_.v)
        case _ => None
      }
      l.id -> m
    }.toMap

  test("merge, broadcast, and union+window agree with the reference model") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 12) {
      val nKeys = 1 + rnd.nextInt(4) // small domain → collisions + skew
      val nL = rnd.nextInt(60)
      val nR = rnd.nextInt(40)
      val ls = (1 to nL).map { i =>
        L(i,
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(nKeys).toLong),
          if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(50).toLong))
      }
      // distinct (k, t) on the right: tie winners are engine-arbitrary
      val rs = (1 to nR).map { _ =>
        R(if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(nKeys).toLong),
          if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(50).toLong),
          math.rint(rnd.nextDouble() * 1e4) / 1e2)
      }.groupBy(r => (r.k, r.t)).map(_._2.head).toSeq
      val tol = if (rnd.nextBoolean()) None else Some(rnd.nextInt(20).toLong)

      val lDf = ls.toDF("id", "k", "t").repartition(1 + rnd.nextInt(5))
      val rDf = rs.toDF("k", "t", "v").repartition(1 + rnd.nextInt(5))
      val expected = refModel(ls, rs, tol)

      def asMap(df: org.apache.spark.sql.DataFrame): Map[Int, Option[Double]] =
        df.select("id", "v").collect()
          .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

      val merge = asMap(AsOfJoin.leftAsOfNative(lDf, rDf, "k", "k", "t", "t", Seq("v"), tol))
      val bcast = asMap(AsOfJoin.leftAsOfNative(lDf, broadcast(rDf), "k", "k", "t", "t", Seq("v"), tol))
      val window = if (tol.isEmpty)
        Some(asMap(AsOfJoin.leftAsOf(lDf, rDf, "k", "k", "t", "t", Seq("v")))) else None

      assert(merge == expected, s"merge vs model, trial $trial (tol=$tol)")
      assert(bcast == expected, s"broadcast vs model, trial $trial (tol=$tol)")
      window.foreach(w => assert(w == expected, s"union+window vs model, trial $trial"))

      val inner = AsOfJoin.innerAsOfNative(lDf, rDf, "k", "k", "t", "t", Seq("v"), tol)
        .select("id").collect().map(_.getInt(0)).toSet
      assert(inner == expected.filter(_._2.isDefined).keySet, s"inner vs model, trial $trial")
    }
  }
}
