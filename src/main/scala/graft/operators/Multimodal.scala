package graft.operators

import graft.queries.RelationalQueries.Q
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Multimodal-column plumbing (north-star): media payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extract runs as a
  * partition-local transform over the binary batches. The container has no
  * image/audio codecs, so the decode step is a clearly-marked DETERMINISTIC
  * STUB ([[stubDecode]]) — the Spark-side plumbing (schema, binary column,
  * partition-local batch processing, feature schema) is real and tested.
  *
  * Scale shape: decode is a narrow per-partition map — no shuffle; at
  * 100 TB the only knobs are input split size and executor memory for the
  * largest payload, both orthogonal to this operator's correctness.
  */
object Multimodal {

  /** Typed metadata + payload view over `documents` (text bytes stand in
    * for media bytes; a real pipeline would read image/audio files the same
    * way — `binary` payload + metadata struct).
    */
  def mediaDf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // range-spread the payload view once for every mm_* consumer: the
    // decode/feature mapPartitions otherwise run inside the 1-task scan
    // of the single-file corpus, and four of the five entries end in an
    // ORDER BY doc_id this partitioning already satisfies
    Tables.spreadRange(Tables.documents(s, d), $"doc_id").select(
      $"doc_id",
      encode($"text", "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length($"text").cast(LongType).as("byte_len"),
        $"source".as("origin")).as("meta"))
  }

  /** DETERMINISTIC DECODE STUB — stands in for a real media decoder
    * (image decode / audio resample / frame sample). Computes an 8-bin
    * byte-value histogram normalized by payload length: deterministic,
    * schema-shaped like a real feature extractor (fixed-width float
    * vector), and cheap enough to run in tests.
    */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](8)
    if (payload == null || payload.isEmpty) return bins
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xff) >>> 5) += 1f
      i += 1
    }
    var b = 0
    while (b < 8) { bins(b) /= payload.length; b += 1 }
    bins
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Partition-local decode + feature extraction over the binary column —
    * the real plumbing around the stubbed decoder.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val encoder = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("doc_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          // stubDecode accepts null (un-decodable row → zero vector);
          // the length read must honor the same contract, not NPE
          val len = if (payload == null) 0L else payload.length.toLong
          Row(r.getAs[Long]("doc_id"), len, stubDecode(payload))
        }
      }(encoder)
  }

  /** Feature "resize": downsample a feature vector by averaging adjacent
    * bins (the stub analogue of image resize / audio resample).
    */
  def resizeFeatures(features: Array[Float], outBins: Int): Array[Float] = {
    require(outBins > 0 && features.length % outBins == 0,
      s"cannot resize ${features.length} bins to $outBins")
    val factor = features.length / outBins
    Array.tabulate(outBins) { i =>
      var s = 0f
      var j = 0
      while (j < factor) { s += features(i * factor + j); j += 1 }
      s / factor
    }
  }

  /** Frame sampling: split the payload into fixed-size frames and keep
    * every `stride`-th one (the stub analogue of video frame sampling).
    */
  def sampleFrames(payload: Array[Byte], frameSize: Int = 64,
      stride: Int = 2): Seq[Array[Byte]] =
    // null payload (an un-decodable row) samples to no frames — the same
    // in-contract null stubDecode already accepts
    if (payload == null) Seq.empty
    else payload.grouped(frameSize).zipWithIndex
      .collect { case (f, i) if i % stride == 0 => f }
      .toSeq

  /** Oracle-checked metadata projection (the part DuckDB can mirror). */
  val binaryStats: Q = Q(
    "mm_binary_stats",
    (s, d) => {
      import s.implicits._
      mediaDf(s, d).select(
        $"doc_id",
        $"meta.mime".as("mime"),
        $"meta.byte_len".as("byte_len"),
        $"meta.origin".as("origin"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id, 'text/plain' AS mime,
      CAST(strlen(text) AS BIGINT) AS byte_len, source AS origin
      FROM documents ORDER BY doc_id"""))

  /** Feature extraction through the stub decoder. The stub normalizes the
    * 8-bin byte histogram in FLOAT32; the oracle reproduces the identical
    * bits because DuckDB's REAL division is the same single
    * correctly-rounded IEEE float32 operation on the same exact-integer
    * operands (counts and lengths are < 2²⁴, so their float
    * representations are exact) — verified bit-for-bit over the corpus.
    * The payload is the UTF-8 encoding of an ASCII corpus, so
    * `unicode(char)` equals the byte the JVM histogram bins on.
    */
  val featureExtract: Q = Q(
    "mm_feature_extract",
    (s, d) => {
      import s.implicits._
      extractFeatures(mediaDf(s, d))
        .select($"doc_id", $"byte_len",
          $"features".getItem(0).as("f0"),
          $"features".getItem(1).as("f1"),
          $"features".getItem(2).as("f2"),
          $"features".getItem(3).as("f3"))
        .orderBy($"doc_id")
    },
    Some("""WITH b AS (SELECT doc_id, strlen(text) AS n,
        [unicode(text[i]) // 32 for i in range(1, strlen(text)+1)] AS bins
      FROM documents)
      SELECT doc_id, CAST(n AS BIGINT) AS byte_len,
        CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(len(list_filter(bins, x -> x = 0)) AS REAL) / CAST(n AS REAL) END AS f0,
        CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(len(list_filter(bins, x -> x = 1)) AS REAL) / CAST(n AS REAL) END AS f1,
        CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(len(list_filter(bins, x -> x = 2)) AS REAL) / CAST(n AS REAL) END AS f2,
        CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(len(list_filter(bins, x -> x = 3)) AS REAL) / CAST(n AS REAL) END AS f3
      FROM b ORDER BY doc_id"""))

  /** Frame-sampling stats computed from the REAL frame sampler output; the
    * DuckDB oracle derives the same numbers in closed form (frame counts
    * from byte length), so a hash-match verifies the sampler's geometry.
    */
  val frameSample: Q = Q(
    "mm_frame_sample",
    (s, d) => {
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("n_frames", LongType, nullable = false),
        StructField("first_frame_len", LongType, nullable = false)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      mediaDf(s, d).select("doc_id", "payload")
        .mapPartitions { rows =>
          rows.map { r =>
            val frames = sampleFrames(r.getAs[Array[Byte]]("payload"))
            Row(r.getAs[Long]("doc_id"), frames.length.toLong,
              frames.headOption.map(_.length.toLong).getOrElse(0L))
          }
        }(enc)
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      ((strlen(text) + 63) // 64 + 1) // 2 AS n_frames,
      least(64, strlen(text)) AS first_frame_len
      FROM documents ORDER BY doc_id"""))

  /** Decode → resize, chained partition-locally (the image-thumbnail /
    * audio-downsample shape): the 8-bin stub features are averaged down to
    * 4 bins by [[resizeFeatures]] inside the same narrow pass — no
    * shuffle anywhere before the presentation sort. The oracle replays
    * the float32 arithmetic: each output bin is one REAL addition and one
    * exact power-of-two division on bit-identical inputs, so the result
    * matches bit-for-bit like mm_feature_extract.
    */
  val resize: Q = Q(
    "mm_resize",
    (s, d) => {
      import s.implicits._
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("resized", ArrayType(FloatType, containsNull = false),
          nullable = false)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      mediaDf(s, d).select("doc_id", "payload")
        .mapPartitions { rows =>
          rows.map { r =>
            val payload = r.getAs[Array[Byte]]("payload")
            Row(r.getAs[Long]("doc_id"),
              resizeFeatures(stubDecode(payload), 4))
          }
        }(enc)
        .select($"doc_id",
          $"resized".getItem(0).as("r0"), $"resized".getItem(1).as("r1"),
          $"resized".getItem(2).as("r2"), $"resized".getItem(3).as("r3"))
        .orderBy($"doc_id")
    },
    Some("""WITH b AS (SELECT doc_id, strlen(text) AS n,
        [unicode(text[i]) // 32 for i in range(1, strlen(text)+1)] AS bins
      FROM documents),
      f AS (SELECT doc_id,
        CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(len(list_filter(bins, x -> x = 0)) AS REAL) / CAST(n AS REAL) END AS f0,
        CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(len(list_filter(bins, x -> x = 1)) AS REAL) / CAST(n AS REAL) END AS f1,
        CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(len(list_filter(bins, x -> x = 2)) AS REAL) / CAST(n AS REAL) END AS f2,
        CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(len(list_filter(bins, x -> x = 3)) AS REAL) / CAST(n AS REAL) END AS f3,
        CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(len(list_filter(bins, x -> x = 4)) AS REAL) / CAST(n AS REAL) END AS f4,
        CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(len(list_filter(bins, x -> x = 5)) AS REAL) / CAST(n AS REAL) END AS f5,
        CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(len(list_filter(bins, x -> x = 6)) AS REAL) / CAST(n AS REAL) END AS f6,
        CASE WHEN n = 0 THEN CAST(0 AS REAL) ELSE CAST(len(list_filter(bins, x -> x = 7)) AS REAL) / CAST(n AS REAL) END AS f7
      FROM b)
      SELECT doc_id,
        (f0 + f1) / 2 AS r0, (f2 + f3) / 2 AS r1,
        (f4 + f5) / 2 AS r2, (f6 + f7) / 2 AS r3
      FROM f ORDER BY doc_id"""))

  /** Frame-level dedup — the video/audio twin of document exact-dedup:
    * fingerprint every sampled frame (md5 of the frame bytes) and report
    * per-source frame counts, distinct fingerprints, and the dup rate.
    * The frame explode is partition-local over the binary payloads; the
    * only shuffles are the distinct and the per-source rollup, both on
    * 16-byte fingerprints rather than frame bytes. The oracle replays the
    * exact framing geometry (64-byte frames, stride 2) with substr on the
    * UTF-8 text, so a hash-match verifies both the sampler and the
    * fingerprint pipeline.
    */
  val frameDedup: Q = Q(
    "mm_frame_dedup",
    (s, d) => {
      import s.implicits._
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("source", StringType, nullable = false),
        StructField("frame_md5", StringType, nullable = false)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      val media = Tables.documents(s, d).select(
        $"doc_id", $"source", encode($"text", "UTF-8").as("payload"))
      media.mapPartitions { rows =>
        rows.flatMap { r =>
          sampleFrames(r.getAs[Array[Byte]]("payload")).map { f =>
            Row(r.getAs[Long]("doc_id"), r.getAs[String]("source"),
              org.apache.commons.codec.digest.DigestUtils.md5Hex(f))
          }
        }
      }(enc)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_frames"),
          countDistinct($"frame_md5").as("n_distinct"),
          (lit(1.0) - countDistinct($"frame_md5").cast("double") /
            count(lit(1))).as("dup_rate"))
        .orderBy($"source")
    },
    Some("""WITH f AS (
        SELECT doc_id, source,
          md5(substr(text, (k - 1) * 128 + 1, 64)) AS frame_md5
        FROM documents,
          LATERAL (SELECT unnest(range(1,
            ((strlen(text) + 63) // 64 + 1) // 2 + 1)) AS k))
      SELECT source, count(*) AS n_frames,
        CAST(count(DISTINCT frame_md5) AS BIGINT) AS n_distinct,
        1.0 - CAST(count(DISTINCT frame_md5) AS DOUBLE) / count(*) AS dup_rate
      FROM f GROUP BY source ORDER BY source"""))

  val all: Seq[Q] = Seq(binaryStats, featureExtract, frameSample, resize,
    frameDedup)
}
