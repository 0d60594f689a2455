package graft.ext

import org.apache.spark.sql.types.BinaryType

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "abc", 3L), (1L, "defg", 4L), (2L, "hijkl", 5L), (3L, "", 0L)
  ).toDF("doc_id", "text", "n_chars")

  test("media table: binary payload column + typed metadata struct") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("content").dataType === BinaryType)
    val metaFields = m.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(metaFields.fieldNames.toSeq ===
      Seq("width", "height", "channels", "n_frames", "format"))
    val kinds = m.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds === Map(0L -> "image", 1L -> "audio", 2L -> "video", 3L -> "image"))
  }

  test("feature extraction is deterministic and byte-faithful") {
    val feats = Multimodal.mediaFeatures(Multimodal.mediaTable(docs))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(0L).n_bytes === 3)
    // "abc" = 97,98,99 -> mean 98
    assert(feats(0L).mean_intensity === 98.0)
    assert(feats(3L).n_bytes === 0 && feats(3L).mean_intensity === 0.0)
    // determinism: second run identical phash
    val again = Multimodal.mediaFeatures(Multimodal.mediaTable(docs))
      .collect().map(f => f.media_id -> f.phash).toMap
    assert(again === feats.view.mapValues(_.phash).toMap)
  }

  test("batching hands the codec bounded batches without dropping rows") {
    val many = spark.range(0, 1000)
      .selectExpr("id AS doc_id", "repeat('x', 10) AS text", "10 AS n_chars")
    val n = Multimodal.mediaFeatures(Multimodal.mediaTable(many), batchSize = 7).count()
    assert(n === 1000)
  }

  test("feature extraction adds no shuffle (partitioning preserved)") {
    val media = Multimodal.mediaTable(docs).repartition(3)
    val plan = Multimodal.mediaFeatures(media).queryExecution.executedPlan.toString
    // exactly one Exchange: the explicit repartition; extraction adds none
    assert(plan.split("Exchange").length - 1 === 1, s"unexpected shuffle:\n$plan")
    assert(Multimodal.mediaFeatures(media).rdd.getNumPartitions === 3)
  }

  test("resize updates metadata consistently") {
    val r = Multimodal.resizeTo(Multimodal.mediaTable(docs), 224, 224)
      .select("meta.width", "meta.height", "meta.format").collect().head
    assert(r.getInt(0) === 224 && r.getInt(1) === 224)
    assert(r.getString(2).endsWith("-resized"))
  }

  test("frame sampling emits every nth frame for video rows only") {
    val f = Multimodal.frameSample(Multimodal.mediaTable(docs), nth = 2).collect()
    // only doc 2 is video; n_frames = 5 % 240 + 1 = 6 -> frames 0,2,4
    assert(f.map(_.getLong(0)).toSet === Set(2L))
    assert(f.map(_.getInt(2)).sorted === Array(0, 2, 4))
  }

  test("binaryFile ingest reads payload bytes; glob prunes at listing") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.jpg"),
      Array[Byte](1, 2, 3))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.wav"),
      Array[Byte](9, 9))
    val all = Multimodal.readBinaryFiles(spark, dir)
    assert(all.count() === 2)
    val jpgs = Multimodal.readBinaryFiles(spark, dir, Some("*.jpg")).collect()
    assert(jpgs.length === 1)
    assert(jpgs.head.getAs[Array[Byte]]("content").toSeq === Seq[Byte](1, 2, 3))
    assert(jpgs.head.getAs[Long]("length") === 3L)
  }
}
