package graft

import org.apache.spark.sql.functions._
import graft.ops.{Changelog, Maintenance}

/** Round-9e: partition checksums (q192) and SCD2 compaction (q193).
  * The checksum's load-bearing property is ORDER- and PARTITIONING-
  * insensitivity (a replica validates regardless of its physical
  * layout) plus single-row sensitivity (a corrupted row flips its
  * partition's fingerprint). Compaction's is losslessness: the merged
  * intervals carry exactly the original history's state timeline. */
class Round9eSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("partition checksums are layout-invariant and single-row sensitive") {
    val base = Maintenance.partitionChecksums(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(base.nonEmpty)
    // a replica with a different physical layout must fingerprint equal:
    // recompute over a shuffled, re-partitioned copy of the table
    val shuffled = Tables.orders(spark, dir)
      .repartition(7, col("o_custkey"))
      .sortWithinPartitions("o_totalprice")
    shuffled.createOrReplaceTempView("orders_shuffled")
    val P = 1000000007L
    val term = (
      (col("o_orderkey") % P) * 1000003L % P +
        (col("o_custkey") % P) * 9176L % P +
        floor(col("o_totalprice") * 100d + 0.5d).cast("long") % P +
        ascii(col("o_orderstatus"))) % P
    val replica = shuffled
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"), (sum(term) % P).as("c"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(replica === base)
    // flipping ONE row's status must change exactly that month's checksum
    val victim = Tables.orders(spark, dir).orderBy("o_orderkey").limit(1)
      .collect().head
    val vKey = victim.getLong(0)
    val corrupted = Tables.orders(spark, dir)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") === vKey, lit("X")).otherwise(col("o_orderstatus")))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"), (sum(term) % P).as("c"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val changed = base.keySet.filter(m => base(m) != corrupted(m))
    assert(changed.size === 1, s"exactly one month must change, got $changed")
  }

  test("scd2Compact is lossless: adjacent runs differ, intervals chain, as-of agrees") {
    val compacted = Changelog.scd2Compact(spark, dir).collect()
    assert(compacted.nonEmpty)
    val byUser = compacted.groupBy(_.getLong(0))
    byUser.foreach { case (u, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getString(4) !== b.getString(4),
            s"user $u: adjacent compacted runs must differ in state")
          assert(a.getLong(3) === b.getLong(2),
            s"user $u: a run's valid_to must chain to the next run's valid_from")
        case _ => ()
      }
      // exactly the last run is open
      assert(sorted.init.forall(!_.isNullAt(3)) && sorted.last.isNullAt(3))
    }
    // no history lost: collapsed counts account for every raw version
    val totalCollapsed = compacted.map(_.getLong(5)).sum
    assert(totalCollapsed === Tables.events(spark, dir).count())
    // and the as-of answer (state at T) is unchanged by compaction
    val cutUs = java.sql.Timestamp.valueOf("2024-01-15 00:00:00").getTime * 1000L
    val fromCompacted = compacted
      .filter(r => r.getLong(2) <= cutUs && (r.isNullAt(3) || r.getLong(3) > cutUs))
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    val fromRaw = Changelog.asOfSnapshot(spark, dir, cutoff = "2024-01-15")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fromCompacted === fromRaw)
  }
}
