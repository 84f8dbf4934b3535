package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class IOSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("csv round-trip with pinned schema (no inference jobs)") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    val dir = tmp("csv")
    IO.writeCsv(docs, dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val back = IO.csv(spark, dir, schema)
    assert(back.count() == docs.count())
    assert(back.agg(sum("n_chars")).head.getLong(0) ==
      docs.agg(sum("n_chars")).head.getLong(0))
  }

  test("json round-trip with pinned schema") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "source")
    val dir = tmp("json")
    docs.write.mode("overwrite").json(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType)))
    assert(IO.json(spark, dir, schema).count() == docs.count())
  }

  test("partitioned layout prunes partitions on read") {
    val docs = Tables.load(spark, sf, "documents")
    val dir = tmp("part")
    IO.writePartitioned(docs, dir, Seq("lang"))
    val pruned = spark.read.parquet(dir).filter(col("lang") === "en")
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), s"no partition pruning:\n$scan")
    assert(pruned.count() ==
      docs.filter(col("lang") === "en").count())
    // one file per partition dir (layout contract)
    val enFiles = new java.io.File(s"$dir/lang=en").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(enFiles == 1)
    // filesPerPartition > 1 actually splits each dir (a bare
    // repartition(n, cols) would put every key in ONE task and ONE
    // file — and at n=1 funnel the whole dataset through one task)
    val dir3 = tmp("part3")
    IO.writePartitioned(docs, dir3, Seq("lang"), filesPerPartition = 3)
    val enFiles3 = new java.io.File(s"$dir3/lang=en").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(enFiles3 >= 2 && enFiles3 <= 3, s"expected 2-3 files, got $enFiles3")
    assert(spark.read.parquet(dir3).count() == docs.count())
    // compact/upsert must refuse the partitioned layout: a flat rewrite
    // loses directory pruning and type-infers the partition keys
    val err = intercept[IllegalArgumentException] {
      IO.compact(spark, dir3)
    }
    assert(err.getMessage.contains("hive-partitioned"), err.getMessage)
    // a MapType column must not break the salt (hash functions reject
    // maps — the salt hashes only the hashable columns)
    val withMap = docs.select(col("doc_id"), col("lang"),
      map(lit("k"), col("source")).as("attrs"))
    val dirM = tmp("partmap")
    IO.writePartitioned(withMap, dirM, Seq("lang"), filesPerPartition = 2)
    assert(spark.read.parquet(dirM).count() == docs.count())
  }

  test("bucketed table join avoids shuffle on the bucket key") {
    val orders = Tables.load(spark, sf, "orders")
    IO.writeBucketed(orders, "orders_bkt", Seq("o_custkey"), 4)
    val t = spark.table("orders_bkt")
    val agg = t.groupBy("o_custkey").agg(sum("o_totalprice"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed scan still shuffled:\n$plan")
    // the write computed catalog stats: the CBO sees a real row count,
    // so join order never rides on authoring order (stats posture)
    val cat = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("orders_bkt"))
    assert(cat.stats.exists(_.rowCount.contains(BigInt(orders.count()))),
      s"no row-count stats on bucketed table: ${cat.stats}")
    // column-level NDV stats are opt-in on the join keys
    IO.analyzeTable(spark, "orders_bkt", Seq("o_custkey"))
    val cat2 = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("orders_bkt"))
    assert(cat2.stats.exists(_.colStats.get("o_custkey").exists(_.distinctCount.isDefined)),
      s"no NDV stats for o_custkey: ${cat2.stats.map(_.colStats)}")
  }

  test("compact rewrites a small-files layout into few files, data intact") {
    val docs = Tables.load(spark, sf, "documents")
    val dir = tmp("compact")
    docs.repartition(37).write.mode("overwrite").parquet(dir)
    def parquetFiles() = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles() == 37, "fixture should start fragmented")
    val before = docs.orderBy("doc_id").collect()
    IO.compact(spark, dir, targetFileMB = 64)
    assert(parquetFiles() == 1, s"expected 1 compacted file, got ${parquetFiles()}")
    val after = spark.read.parquet(dir).orderBy("doc_id").collect()
    assert(after.sameElements(before), "compaction changed the data")
  }

  test("replayStream reuses one staging dir per source file (ADVICE r2)") {
    val tmpRoot = new java.io.File(System.getProperty("java.io.tmpdir"))
    def stagingDirs(): Set[String] =
      tmpRoot.listFiles().filter(_.getName.startsWith("replay_stream"))
        .map(_.getName).toSet
    val schema = Tables.load(spark, sf, "events").schema
    val before = stagingDirs()
    (1 to 3).foreach { _ =>
      IO.replayStream(spark, s"$sf/events.parquet", schema)
    }
    val added = stagingDirs() -- before
    assert(added.size <= 1,
      s"repeated replayStream calls leaked ${added.size} staging dirs")
  }

  test("orc round-trip preserves data; text source reads raw lines") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    IO.writeOrc(docs, s"$dir/docs_orc")
    val back = IO.orc(spark, s"$dir/docs_orc")
    assert(back.schema == docs.schema)
    assert(back.orderBy("doc_id").collect()
      .sameElements(docs.orderBy("doc_id").collect()))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/raw.txt"),
      "line one\nline two\n".getBytes)
    val lines = IO.textLines(spark, s"$dir/raw.txt").as[String].collect().sorted
    assert(lines.toSeq == Seq("line one", "line two"))
  }

  test("upsert: updates replace, inserts add, untouched rows carry over") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/t"
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "score").write.parquet(dir)
    val updates = Seq((2L, "b2", 99.0), (4L, "d", 40.0)).toDF("k", "name", "score")
    IO.upsert(spark, dir, updates, Seq("k"))
    val rows = spark.read.parquet(dir)
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, "a", 10.0),    // untouched
      (2L, "b2", 99.0),   // replaced
      (3L, "c", 30.0),    // untouched
      (4L, "d", 40.0)))   // inserted
    // no stray staging dirs left behind
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(f =>
      f.getName.endsWith(".staged") || f.getName.endsWith(".old")))
    // the generation marker column name is reserved, never clobbered
    intercept[IllegalArgumentException] {
      IO.upsert(spark, dir, updates.withColumn("__gen", lit(9)), Seq("k"))
    }
  }

  test("event-time upsert: a late OLDER update never overwrites a newer row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evt").toString + "/t"
    Seq((1L, 100L, "new"), (2L, 50L, "mid")).toDF("k", "ver", "v").write.parquet(dir)
    val late = Seq((1L, 40L, "stale"), (2L, 60L, "newer"), (3L, 10L, "insert"))
      .toDF("k", "ver", "v")
    IO.upsert(spark, dir, late, Seq("k"), orderCols = Seq("ver"))
    val rows = spark.read.parquet(dir).as[(Long, Long, String)]
      .collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, 100L, "new"),    // stale late update lost
      (2L, 60L, "newer"),   // genuinely newer update won
      (3L, 10L, "insert"))) // new key inserted
  }

  test("createOrUpsert: uncommitted staged create is cleared, never promoted") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_create")
    val dir = s"$base/t"
    // simulate a crash MID-create: a staged dir with _temporary and no
    // _SUCCESS — promoting it would surface a half-written table
    val staged = java.nio.file.Paths.get(s"$base/t.staged/_temporary")
    java.nio.file.Files.createDirectories(staged)
    IO.createOrUpsert(spark, dir, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    val rows = spark.read.parquet(dir).as[(Long, String)].collect()
    assert(rows.toSeq == Seq((1L, "a")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/t.staged")))
    // and a second call takes the upsert branch
    IO.createOrUpsert(spark, dir, Seq((2L, "b")).toDF("k", "v"), Seq("k"))
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("upsert self-heals a crash between the swap renames") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_heal").toString + "/t"
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "score").write.parquet(dir)
    // simulate a prior run killed between move(dir, old) and
    // move(staged, dir): table dir gone, the COMPLETE new data in .staged
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.move(p, p.resolveSibling("t.staged"))
    assert(!java.nio.file.Files.exists(p))
    IO.upsert(spark, dir, Seq((3L, 30.0)).toDF("k", "score"), Seq("k"))
    val rows = spark.read.parquet(dir).as[(Long, Double)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)),
      "self-heal lost the staged survivor or the update")
  }

  test("concurrent upsert: second writer refuses with a named error; table equals the winner") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lock").toString + "/t"
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "score").write.parquet(dir)
    val before = spark.read.parquet(dir).as[(Long, Double)].collect().sortBy(_._1)
    // writer A holds the lease (mid-flight); writer B must fail FAST with
    // the named error and leave the table exactly as A's read saw it
    IO.acquireTableLock("test", dir)
    try {
      val e = intercept[ConcurrentWriterException] {
        IO.upsert(spark, dir, Seq((2L, 99.0)).toDF("k", "score"), Seq("k"))
      }
      assert(e.getMessage.contains("concurrent writer"), e.getMessage)
      assert(e.getMessage.contains(dir), e.getMessage)
      val eC = intercept[ConcurrentWriterException] {
        IO.compact(spark, dir)
      }
      assert(eC.getMessage.contains("compact"), eC.getMessage)
      assert(spark.read.parquet(dir).as[(Long, Double)].collect().sortBy(_._1)
        .sameElements(before), "refused writer still mutated the table")
    } finally IO.releaseTableLock(dir)
    // lease released -> the writer goes through; table equals the winner
    IO.upsert(spark, dir, Seq((2L, 99.0)).toDF("k", "score"), Seq("k"))
    assert(spark.read.parquet(dir).as[(Long, Double)].collect().sortBy(_._1)
      .toSeq == Seq((1L, 10.0), (2L, 99.0)))
    // no lock file left behind after a successful write
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir + ".lock")))
  }

  test("concurrent upsert race: exactly one of two simultaneous writers wins the lease") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = java.nio.file.Files.createTempDirectory("graft_race").toString + "/t"
    Seq((1L, 1.0)).toDF("k", "score").write.parquet(dir)
    // a barrier maximizes the overlap; upsert runs Spark jobs so the
    // loser reliably arrives while the winner still holds the lease
    val gate = new java.util.concurrent.CyclicBarrier(2)
    def attempt(v: Double): Future[Either[Throwable, Unit]] = Future {
      gate.await()
      try Right(IO.upsert(spark, dir, Seq((1L, v)).toDF("k", "score"), Seq("k")))
      catch { case e: ConcurrentWriterException => Left(e) }
    }
    val results = Await.result(
      Future.sequence(Seq(attempt(2.0), attempt(3.0))), 120.seconds)
    val wins = results.count(_.isRight)
    assert(wins >= 1, s"no writer succeeded: $results")
    assert(results.forall {
      case Left(e) => e.isInstanceOf[ConcurrentWriterException]
      case Right(_) => true
    }, s"loser failed with the wrong error: $results")
    // the table equals ONE winner's result — never a torn mix
    val rows = spark.read.parquet(dir).as[(Long, Double)].collect()
    assert(rows.length == 1 && Set(2.0, 3.0).contains(rows.head._2), rows.toSeq.toString)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir + ".lock")))
  }

  test("stale lease from a crashed writer is broken, not honored forever") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stale").toString + "/t"
    Seq((1L, 1.0)).toDF("k", "score").write.parquet(dir)
    // a crashed holder leaves the lock file behind; with age past the
    // lease the next writer breaks it and proceeds
    IO.acquireTableLock("test", dir)
    val lock = java.nio.file.Paths.get(dir + ".lock")
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - IO.staleLockMs - 1000))
    IO.upsert(spark, dir, Seq((1L, 2.0)).toDF("k", "score"), Seq("k"))
    assert(spark.read.parquet(dir).as[(Long, Double)].head()._2 == 2.0)
    assert(!java.nio.file.Files.exists(lock), "broken lease not cleaned up")
  }

  test("parquetEvolved surfaces late-added columns as nulls on old files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dir/gen=1")
    Seq((3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "v", "score")
      .write.parquet(s"$dir/gen=2")
    val merged = IO.parquetEvolved(spark, dir)
    assert(merged.columns.toSet == Set("id", "v", "score", "gen"))
    val rows = merged.select("id", "score").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty, "old rows must null-fill")
    assert(rows(3L).contains(30.0) && rows(4L).contains(40.0))
  }

  test("writeSorted: disjoint per-file key ranges, data intact") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_sorted").toString + "/li"
    IO.writeSorted(li, dir, numFiles = 4, "l_orderkey")
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length == 4, s"expected 4 files, got ${files.length}")
    // every file covers a disjoint l_orderkey range -> min/max footer
    // stats let a ranged scan skip all but one file
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(org.apache.spark.sql.functions.min("l_orderkey"),
          org.apache.spark.sql.functions.max("l_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, s"overlap: $hi > $lo")
      case _ =>
    }
    assert(spark.read.parquet(dir).count() == li.count())
  }

  test("jsonWithDeadLetter: corrupt lines quarantined whole, none dropped") {
    val dir = tmp("jsonl_dl")
    val lines = Seq(
      """{"id": 1, "name": "ok"}""",
      """{"id": "NOT_A_NUMBER", "name": "bad-type"}""",
      """not json at all""",
      """{"id": 4, "name": "also ok"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.jsonl"),
      lines.mkString("\n").getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val (clean, dead) = IO.jsonWithDeadLetter(spark, dir, schema)
    assert(clean.count() == 2 && dead.count() == 2)
    assert(clean.columns.toSeq == Seq("id", "name"))
    assert(clean.select(sum(col("id"))).head.getLong(0) == 5)
    val raws = dead.collect().map(_.getString(0)).toSet
    assert(raws == Set(lines(1), lines(2)), "dead letters must carry the raw line")
  }

  test("csvWithDeadLetter: wrong arity and uncastable cells quarantined") {
    val dir = tmp("csv_dl")
    val lines = Seq(
      "id,n",
      "1,10",
      "2,notanumber",
      "3,30")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.csv"),
      lines.mkString("\n").getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("n", LongType)))
    val (clean, dead) = IO.csvWithDeadLetter(spark, dir, schema)
    assert(clean.count() == 2 && dead.count() == 1)
    assert(dead.head.getString(0).contains("notanumber"))
  }
}
