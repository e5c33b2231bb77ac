package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.operators.TaxiAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-tested reference parity: a hand-built taxi table with known
  * answers for the reference's literal queries. */
class TaxiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  /** 8 trips: 6 clean (Nov/Dec 2017), 1 negative duration, 1 bad extra. */
  private lazy val taxi = {
    val rows = Seq(
      // vendor, pickup, dropoff, pc, dist, rate, fwd, pu, do, pay, fare, extra, mta, tip, tolls, surch, total
      ("1", "2017-11-01 10:00:00", "2017-11-01 10:30:00", 1, 5.0, "1", "N", "100", "200", "1", 10.0, 0.5, 0.5, 2.0, 0.0, 0.3, 13.3),
      ("1", "2017-11-02 11:00:00", "2017-11-02 11:15:00", 2, 2.0, "1", "N", "100", "200", "1", 6.0, 0.0, 0.5, 0.0, 0.0, 0.3, 6.8),
      ("1", "2017-12-25 09:00:00", "2017-12-25 10:00:00", 1, 20.0, "1", "N", "100", "200", "2", 30.0, 1.0, 0.5, 6.0, 0.0, 0.3, 37.8),
      ("2", "2017-12-31 22:00:00", "2017-12-31 23:00:00", 3, 15.0, "1", "N", "100", "200", "1", 25.0, 0.5, 0.5, 5.0, 0.0, 0.3, 31.3),
      ("2", "2017-11-15 08:00:00", "2017-11-15 08:24:00", 1, 4.0, "1", "N", "100", "200", "1", 8.0, 0.0, 0.5, 1.0, 0.0, 0.3, 9.8),
      ("2", "2017-12-05 18:00:00", "2017-12-05 18:30:00", 1, 6.0, "1", "N", "100", "200", "2", 12.0, 0.5, 0.5, 22.0, 0.0, 0.3, 35.3),
      // dirty: dropoff before pickup
      ("1", "2017-11-03 12:00:00", "2017-11-03 11:00:00", 1, 3.0, "1", "N", "100", "200", "1", 7.0, 0.0, 0.5, 0.0, 0.0, 0.3, 7.8),
      // dirty: disallowed extra 4.5
      ("2", "2017-12-06 13:00:00", "2017-12-06 13:20:00", 1, 3.0, "1", "N", "100", "200", "1", 7.0, 4.5, 0.5, 0.0, 0.0, 0.3, 12.3))
    import spark.implicits._
    val df = rows.toDF("VendorID", "p", "d", "passenger_count", "trip_distance",
      "RatecodeID", "store_and_fwd_flag", "PULocationID", "DOLocationID",
      "payment_type", "fare_amount", "extra", "mta_tax", "tip_amount",
      "tolls_amount", "improvement_surcharge", "total_amount")
    df.withColumn("tpep_pickup_datetime", org.apache.spark.sql.functions.to_timestamp($"p"))
      .withColumn("tpep_dropoff_datetime", org.apache.spark.sql.functions.to_timestamp($"d"))
      .drop("p", "d")
  }

  test("records + pct share per vendor (ref lines 62–74)") {
    val counts = TaxiAnalysis.recordsPerVendor(taxi).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("1" -> 4L, "2" -> 4L))
    val pct = TaxiAnalysis.vendorPctShare(taxi).collect().map(_.getDouble(2))
    assert(pct.toSeq == Seq(50.0, 50.0))
  }

  test("min/max timestamps + duration stats per vendor (ref lines 80–92)") {
    val mm = TaxiAnalysis.minMaxTimestamps(taxi).collect()
    assert(mm.length == 2)
    val v1 = mm.find(_.getString(0) == "1").get
    assert(v1.getTimestamp(1) == ts("2017-11-01 10:00:00"))
    assert(v1.getTimestamp(2) == ts("2017-12-25 09:00:00"))
    val stats = TaxiAnalysis.durationStats(taxi).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(stats("1") == -1.0) // the negative-duration dirty row
  }

  test("negative scans, value distributions, zero passengers (ref lines 102–220)") {
    // no negative fares in the fixture
    assert(TaxiAnalysis.negativeValueScan(taxi, "fare_amount").collect().isEmpty)
    val extraDist = TaxiAnalysis.valueDistribution(taxi, "extra").collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(extraDist(("2", 4.5)) == 1) // the disallowed-extra dirty row
    assert(extraDist(("1", 0.0)) == 2)
    assert(TaxiAnalysis.zeroPassengerCount(taxi).collect().isEmpty)
  }

  test("invalid durations found (ref lines 99–104)") {
    val bad = TaxiAnalysis.invalidDurations(taxi).collect()
    assert(bad.length == 1 && bad(0).getString(0) == "1" && bad(0).getLong(1) == 1L)
  }

  test("ETL keeps only clean trips with yr/mnth partitions (ref lines 252–278)") {
    val clean = TaxiAnalysis.cleanTrips(taxi)
    assert(clean.count() == 6)
    val months = clean.select("mnth").distinct().collect().map(_.getInt(0)).sorted
    assert(months.toSeq == Seq(11, 12))
  }

  test("quality violations per vendor (ref lines 231–244)") {
    val v = TaxiAnalysis.qualityViolations(taxi).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("1" -> 1L, "2" -> 1L))
  }

  test("avg fare by month (ref Analysis I Q1)") {
    val m = TaxiAnalysis.avgFareByMonth(taxi).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(m(11) == 8.0)   // (10+6+8)/3
    assert(m(12) == 22.33) // (30+25+12)/3
  }

  test("payment preference ordered by count (ref Analysis I Q3)") {
    val p = TaxiAnalysis.paymentPreference(taxi).collect()
    assert(p(0).getString(0) == "1" && p(0).getLong(1) == 4L)
    assert(p(0).getDouble(2) == 66.67)
  }

  test("tip percentiles (ref Analysis I Q4)") {
    val r = TaxiAnalysis.tipPercentiles(taxi).head()
    assert(r.getDouble(0) == 6.0)  // avg of 2,0,6,5,1,22
    assert(r.getDouble(2) == 3.5)  // median of sorted 0,1,2,5,6,22
  }

  test("extra charge fraction (ref Analysis I Q5)") {
    val r = TaxiAnalysis.extraChargeFraction(taxi).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 6L && r.getDouble(2) == 0.67)
  }

  test("tip segments share (ref Analysis II Q2)") {
    val segs = TaxiAnalysis.tipSegments(taxi).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(segs("[0-5)") == 50.0)   // tips 2,0,1 of 6
    assert(segs(">=20") == 16.67)   // tip 22
  }

  test("speed by month + special days (ref Analysis II Q3/Q4)") {
    val sp = TaxiAnalysis.avgSpeedByMonth(taxi).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(sp(11) == 9.33) // (10+8+10)/3 rounded
    val days = TaxiAnalysis.specialDaysSpeed(taxi).collect()
    assert(days.length == 2) // Dec 25 and Dec 31
    assert(days.map(_.getDouble(1)).toSeq == Seq(20.0, 15.0))
  }

  test("loads the reference CSV shape end-to-end") {
    val dir = Files.createTempDirectory("graft-taxi").toString
    val header = "VendorID,tpep_pickup_datetime,tpep_dropoff_datetime,passenger_count,trip_distance,RatecodeID,store_and_fwd_flag,PULocationID,DOLocationID,payment_type,fare_amount,extra,mta_tax,tip_amount,tolls_amount,improvement_surcharge,total_amount"
    val row = "1,2017-11-01 10:00:00,2017-11-01 10:30:00,1,5.0,1,N,100,200,1,10.0,0.5,0.5,2.0,0.0,0.3,13.3"
    Files.writeString(java.nio.file.Path.of(dir, "taxi.csv"), header + "\n" + row + "\n")
    val df = TaxiAnalysis.load(spark, dir)
    assert(df.count() == 1)
    assert(TaxiAnalysis.recordsPerVendor(df).head().getLong(1) == 1L)
  }
}
