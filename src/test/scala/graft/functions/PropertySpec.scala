package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5 item 1): F1 over arbitrary numeric
  * formattings, F2 date arithmetic round-trips, merge idempotence for
  * R1-governed fields. Batched evaluation — one Spark job per property,
  * not per case.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  // plain-ScalaCheck sampling (the scalatest bridge isn't in the offline
  // cache): deterministic seeds, explicit loop
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private def evalMany(inputs: Seq[String],
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Any] =
    inputs.toDF("c").select(f(col("c"))).collect().map(_.get(0)).toSeq

  test("F1: any spaced/comma-formatted number parses to its value") {
    val cases = for {
      sign <- Seq("", "-")
      intPart <- Seq("5", "55", "555", "5555", "55555")
      frac <- Seq("", ",5", ".25")
      suffix <- Seq("", " ₽/мес.", " м²", "м")
      spaced <- Seq(false, true)
    } yield {
      val digits = if (spaced && intPart.length > 3)
        intPart.dropRight(3) + " " + intPart.takeRight(3)
      else intPart
      val expected = (sign + intPart + frac.replace(",", ".")) match {
        case s => s.toDouble
      }
      (sign + digits + frac + suffix, expected)
    }
    val got = evalMany(cases.map(_._1), Functions.parseNumeric)
    cases.zip(got).foreach { case ((in, exp), actual) =>
      assert(actual == exp, s"input '$in'")
    }
  }

  test("F2: day-month labels round-trip through the calendar for every day of 2025") {
    // asOf end-of-year → no rollback; every (day, month) must reproduce
    val asOf = lit("2025-12-31 23:59:00").cast("timestamp")
    val months = Seq("янв" -> 1, "фев" -> 2, "мар" -> 3, "апр" -> 4,
      "май" -> 5, "июн" -> 6, "июл" -> 7, "авг" -> 8, "сен" -> 9,
      "окт" -> 10, "ноя" -> 11, "дек" -> 12)
    val maxDay = Map(1 -> 31, 2 -> 28, 3 -> 31, 4 -> 30, 5 -> 31, 6 -> 30,
      7 -> 31, 8 -> 31, 9 -> 30, 10 -> 31, 11 -> 30, 12 -> 31)
    val cases = for {
      (name, m) <- months
      d <- 1 to maxDay(m)
    } yield (s"$d $name 13:45", f"2025-$m%02d-$d%02d 13:45:00")
    val got = cases.map(_._1).toDF("c")
      .select(Functions.parseRussianDate(col("c"), asOf)).as[String].collect()
    cases.map(_._2).zip(got).foreach { case (exp, act) => assert(act == exp) }
  }

  test("F2: invalid calendar days are NaT for any month") {
    val asOf = lit("2025-12-31 23:59:00").cast("timestamp")
    val bad = Seq("30 фев 10:00", "31 апр 10:00", "32 янв 10:00", "0 май 10:00")
    val got = bad.toDF("c")
      .select(Functions.parseRussianDate(col("c"), asOf)).collect().map(_.get(0))
    assert(got.forall(_ == null))
  }

  test("merge idempotence: re-merging an equal-price batch changes nothing") {
    import graft.merge.MergeListings
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("offer_id", StringType), StructField("updated_date", StringType),
      StructField("price_value", DoubleType), StructField("description", StringType)))
    val gen = for {
      n <- Gen.choose(1, 12)
      rows <- Gen.listOfN(n, for {
        id <- Gen.choose(1, 5)
        price <- Gen.oneOf(100.0, 200.0, 300.0)
        d <- Gen.choose(1, 28)
        desc <- Gen.alphaStr.map(_.take(6))
      } yield Row(id.toString, f"2026-01-$d%02d 10:00:00", price, desc))
    } yield rows
    samples(gen, 5).foreach { rows =>
      val batch = spark.createDataFrame(
        spark.sparkContext.parallelize(rows), schema)
      val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      val once = MergeListings.mergeBatch(empty, batch,
        None).localCheckpoint()
      // merging the RESULT with itself as source (same prices, null-safe
      // fields) must be a fixpoint except last_active refresh semantics
      val again = MergeListings.mergeBatch(once,
        once.withColumn("updated_date", lit(null).cast("string")), None)
      val a = once.drop("last_active").orderBy("offer_id").collect().toSeq
      val b = again.drop("last_active").orderBy("offer_id").collect().toSeq
      assert(a == b)
    }
  }
}
