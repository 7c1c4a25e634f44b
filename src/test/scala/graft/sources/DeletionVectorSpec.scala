package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.testing.StubSharingServer

/** Deletion-vector APPLICATION: Z85 + portable-roaring codec
  * round-trips, and end-to-end reads where a DV-bearing shared table
  * returns exactly the SURVIVING rows — the capability the reference
  * client lacks entirely (it forces `responseformat=parquet` and
  * would silently return deleted rows). */
class DeletionVectorSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkTestSession.spark
  private var server: StubSharingServer = _
  private var tmp: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    server = new StubSharingServer(expectedToken = "tok").start()
    tmp = Files.createTempDirectory("graft-dv")
  }
  override def afterAll(): Unit = server.stop()

  test("Z85 round-trips arbitrary byte payloads incl. non-multiple-of-4") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 3, 4, 5, 16, 171)) {
      val bytes = Array.fill(n)(rnd.nextInt().toByte)
      val enc = DeletionVectors.z85Encode(bytes)
      assert(enc.length % 5 == 0)
      assert(DeletionVectors.z85Decode(enc, n).toSeq == bytes.toSeq)
    }
  }

  test("roaring serialize/deserialize round-trips every container kind") {
    val cases = Seq(
      Seq.empty[Long],
      Seq(0L),
      Seq(1L, 3L, 5L, 70000L),                      // two array containers
      (0L until 5000L).map(_ * 2),                  // bitmap container (>4096)
      Seq(7L, (1L << 32) | 9L, (2L << 32) | 1L),    // multiple 32-bit bitmaps
      (0L until 300L) ++ Seq(1L << 33))
    cases.foreach { positions =>
      val data = DeletionVectors.serialize(positions)
      assert(DeletionVectors.deserialize(data).toSeq == positions,
        s"case of ${positions.size} positions")
    }
  }

  test("deserialize accepts the run-container flavor (cookie 12347)") {
    // hand-built: 1 bitmap, cookie 12347 with 1 container flagged as a
    // run container holding runs [5..8] and [100..100]
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    def i32(v: Int) = out.writeInt(Integer.reverseBytes(v))
    def i16(v: Int) = out.writeShort(java.lang.Short.reverseBytes(v.toShort).toInt)
    def i64(v: Long) = out.writeLong(java.lang.Long.reverseBytes(v))
    i32(1681511377); i64(1L)                 // magic + one bitmap
    i32(0)                                   // bitmap key (high-32 = 0)
    i32((0 << 16) | 12347)                   // cookie: (n-1)<<16 | 12347
    out.writeByte(1)                         // run flag bitset: container 0
    i16(0); i16(4)                           // key 0, cardinality-1 = 4
    // < NO_OFFSET_THRESHOLD containers → no offset header
    i16(2)                                   // two runs
    i16(5); i16(3)                           // 5..8
    i16(100); i16(0)                         // 100
    out.flush()
    assert(DeletionVectors.deserialize(bos.toByteArray).toSeq ==
      Seq(5L, 6L, 7L, 8L, 100L))
  }

  test("portable-format conformance: keyed entries, empty bitmaps skipped") {
    // Hand-authored byte-for-byte per the PUBLIC Delta protocol's
    // RoaringBitmapArray portable format (the layout delta-spark's
    // writer produces): magic, int64 count = ARRAY length (max key+1,
    // empty slots included), then per NON-EMPTY bitmap an int32 LE
    // key followed by a standard 32-bit roaring bitmap. Keys 0 and 2
    // present, key 1 EMPTY and absent from the wire — a dense
    // index-ordinal decoder (no keys) cannot parse this fixture: it
    // would read key bytes as a roaring cookie and fail.
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    def i32(v: Int) = out.writeInt(Integer.reverseBytes(v))
    def i16(v: Int) = out.writeShort(java.lang.Short.reverseBytes(v.toShort).toInt)
    def i64(v: Long) = out.writeLong(java.lang.Long.reverseBytes(v))
    i32(1681511377); i64(3L)        // magic + array length 3 (keys 0..2)
    i32(0)                          // --- bitmap key 0 ---
    i32(12346)                      // cookie SERIAL_COOKIE_NO_RUNCONTAINER
    i32(1)                          // one container
    i16(0); i16(2)                  // container key 0, cardinality-1 = 2
    i32(16)                         // offset header: 4+4+4+4 bytes in
    i16(1); i16(2); i16(3)          // values {1,2,3}
    i32(2)                          // --- bitmap key 2 (key 1 skipped) ---
    i32(12346)
    i32(1)
    i16(0); i16(0)                  // container key 0, cardinality 1
    i32(16)
    i16(7)                          // value {7}
    out.flush()
    val expect = Seq(1L, 2L, 3L, (2L << 32) | 7L)
    assert(DeletionVectors.deserialize(bos.toByteArray).toSeq == expect)
    // and our own serializer emits this exact keyed layout for the
    // same positions (count = max key + 1, no entry for empty key 1)
    assert(DeletionVectors.serialize(expect).toSeq == bos.toByteArray.toSeq)
  }

  /** Write df as ONE parquet file; return (url, size, rows-in-file-order). */
  private def writeOne(df: org.apache.spark.sql.DataFrame, name: String)
    : (String, Long) = {
    val dir = tmp.resolve(name)
    df.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    var p: java.nio.file.Path = null
    graft.sources.testing.DirWalk.eachChild(dir)(f =>
      if (f.getFileName.toString.endsWith(".parquet")) p = f)
    (p.toUri.toString, Files.size(p))
  }

  private def sharedRead(name: String) =
    spark.read.format("deltashare")
      .option("endpoint", server.endpoint).option("bearerToken", "tok")
      .load(s"share1.schema1.$name")

  test("inline DV: shared read returns exactly the surviving rows") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"row$i")).toDF("k", "v")
    val (url, size) = writeOne(df, "dv_inline")
    // delete physical rows 3, 7, 8, 97 (file order = k order: one
    // file, written from one in-order partition)
    val deleted = Seq(3L, 7L, 8L, 97L)
    val data = DeletionVectors.serialize(deleted)
    val desc =
      s"""{"storageType":"i","pathOrInlineDv":"${DeletionVectors.z85Encode(data)}","sizeInBytes":${data.length},"cardinality":${deleted.size}}"""
    server.tables += ("dv_inline" -> ((df.schema.json, Seq.empty[String],
      Seq((url, size, Map.empty[String, String])))))
    server.deltaFormatTables = Set("dv_inline")
    server.fileDeletionVectors = Map(url -> desc)
    try {
      val got = sharedRead("dv_inline").select("k").as[Long].collect().sorted
      assert(got.toSeq == (0L until 100L).filterNot(deleted.contains))
      // filters still work (re-applied above the unfiltered DV read)
      assert(sharedRead("dv_inline").filter(col("k") < 10).count() == 7)
      // and a stats-only COUNT(*) must NOT be answered from numRecords
      // (which counts deleted rows): force stats on and expect 96
      server.fileStats = Map(url -> """{"numRecords":100}""")
      assert(sharedRead("dv_inline").count() == 96)
    } finally {
      server.deltaFormatTables = Set.empty
      server.fileDeletionVectors = Map.empty
      server.fileStats = Map.empty
      server.tables -= "dv_inline"
    }
  }

  test("URL-addressed DV ('p'): framed DV file fetched and applied") {
    import spark.implicits._
    val df = (0L until 50L).map(i => (i, i * 10)).toDF("k", "x")
    val (url, size) = writeOne(df, "dv_url")
    val deleted = Seq(0L, 49L)
    val data = DeletionVectors.serialize(deleted)
    // on-disk framing: [version 1][pad][size int32 BE][data][crc32 BE]
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(1)
    bos.write(Array[Byte](0, 0, 0)) // arbitrary leading padding
    val offset = 4
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(data.length)
    out.write(data)
    val crc = new java.util.zip.CRC32(); crc.update(data)
    out.writeInt(crc.getValue.toInt)
    out.flush()
    val dvPath = tmp.resolve("dv_url.bin")
    Files.write(dvPath, bos.toByteArray)
    server.httpFiles += ("dv_url.bin" -> dvPath)
    val dvUrl = s"http://127.0.0.1:${server.port}/files/dv_url.bin"
    val desc =
      s"""{"storageType":"p","pathOrInlineDv":"$dvUrl","offset":$offset,"sizeInBytes":${data.length},"cardinality":2}"""
    server.tables += ("dv_url" -> ((df.schema.json, Seq.empty[String],
      Seq((url, size, Map.empty[String, String])))))
    server.deltaFormatTables = Set("dv_url")
    server.fileDeletionVectors = Map(url -> desc)
    try {
      val got = sharedRead("dv_url").select("k").as[Long].collect().sorted
      assert(got.toSeq == (1L until 49L))
    } finally {
      server.deltaFormatTables = Set.empty
      server.fileDeletionVectors = Map.empty
      server.tables -= "dv_url"
    }
  }

  test("descriptor positions: inline decode equals the authored set") {
    val positions = Seq(2L, 4L, 4096L, 70000L)
    val data = DeletionVectors.serialize(positions)
    val desc = DeletionVectors.Descriptor("i",
      DeletionVectors.z85Encode(data), 0L, data.length.toLong,
      positions.size.toLong)
    assert(DeletionVectors.positions(desc).toSeq == positions)
    assert(desc.supported)
    assert(!DeletionVectors.Descriptor("u", "x", 0, 0, 0).supported)
  }
}
