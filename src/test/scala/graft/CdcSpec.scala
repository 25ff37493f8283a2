package graft

import org.apache.spark.sql.functions._

import graft.ops.Cdc

/** `Cdc.applyChanges` semantics beyond what the t79 oracle exercises:
  * no-op deletes, insert-as-update symmetry, equal-seq determinism,
  * and the column-collision guard. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")

  private def merge(delta: Seq[(Long, String, String, Long)]) =
    Cdc.applyChanges(base, delta.toDF("id", "v", "op", "seq"),
      "id", "op", "seq")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("update revises, delete removes, insert adds") {
    assert(merge(Seq((1L, "a2", "update", 1L), (2L, "b", "delete", 1L),
      (9L, "z", "insert", 1L))) === Map(1L -> "a2", 3L -> "c", 9L -> "z"))
  }

  test("delete of an absent key is a no-op; replayed insert upserts") {
    // takedown for a never-ingested page changes nothing; an insert
    // replayed against an existing key behaves as an update (SCD-1
    // symmetry), not a duplicate row
    assert(merge(Seq((7L, "x", "delete", 1L))) ===
      Map(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(merge(Seq((2L, "b9", "insert", 1L))) ===
      Map(1L -> "a", 2L -> "b9", 3L -> "c"))
  }

  test("last op per key wins; equal seq resolves deterministically") {
    // update@1 then delete@2 — the delete wins (the t79 oracle path);
    // at EQUAL seq the op-name tiebreak ('update' > 'delete' DESC)
    // must pick the same winner on every run
    assert(merge(Seq((1L, "a2", "update", 1L), (1L, "a2", "delete", 2L)))
      === Map(2L -> "b", 3L -> "c"))
    val tied = merge(Seq((1L, "a2", "update", 1L), (1L, "xx", "delete", 1L)))
    assert(tied === Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    // FULLY tied (same key, seq AND op, different payloads): the
    // payload-hash tiebreak must pick the same winner on every run,
    // independent of input order/partitioning
    val fullTie = Seq((1L, "p", "update", 1L), (1L, "q", "update", 1L))
    val r1 = merge(fullTie)
    val r2 = merge(fullTie.reverse)
    assert(r1 === r2)
    assert(Set("p", "q").contains(r1(1L)))
  }

  test("a NULL or unknown op fails loud instead of silently deleting") {
    // a malformed op used to win its key's window, anti-join the key
    // out of the base, then fail the non-delete upsert filter — the
    // document vanished on bad input; now the op domain is validated
    // before it decides anything
    for (badOp <- Seq(null.asInstanceOf[String], "DELETE", "upsert")) {
      val ex = intercept[Throwable] {
        merge(Seq((1L, "a2", badOp, 1L)))
      }
      val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
      assert(msgs.contains("insert|update|delete"),
        s"op '$badOp' must be rejected loudly, got:\n$msgs")
    }
  }

  test("a NULL key in the feed fails loud instead of accreting on " +
    "every replay") {
    // a null-keyed upsert can re-ENTER the table but never anti-join
    // back out (null never equi-matches) — each replay would add the
    // row again; the guard makes the malformed feed fail instead
    val base = Seq((1L, "a")).toDF("id", "v")
    val delta = Seq((Option.empty[Long], "x", "insert", 1L))
      .toDF("id", "v", "op", "seq")
    val e = intercept[Exception] {
      Cdc.applyChanges(base, delta, "id", "op", "seq").collect()
    }
    val msgs = Iterator.iterate(e.asInstanceOf[Throwable])(_.getCause)
      .takeWhile(_ != null).take(8)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("NULL id"), s"expected the null-key guard:\n$msgs")
  }

  test("a base column clashing with op/seq fails loud") {
    val badBase = Seq((1L, "a", "u")).toDF("id", "v", "op")
    val e = intercept[IllegalArgumentException] {
      Cdc.applyChanges(badBase, badBase.withColumn("seq", lit(1L)),
        "id", "op", "seq")
    }
    assert(e.getMessage.contains("rename"))
  }
}
