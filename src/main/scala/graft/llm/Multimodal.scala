package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed by a batched per-partition "decoder".
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic fake (`fakeDecode`); everything around it —
  * the binary column, the metadata struct, the mapPartitions batch shape,
  * the partitioning — is real and is what matters at 100 TB: payloads
  * never pass through a shuffle (features are extracted before any
  * aggregation), and the decoder is applied streaming per partition, one
  * batch at a time, like a Pandas-UDF/mapInPandas stage would be.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String,
                      width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, byte_len: Long, checksum: String,
                           width: Int, height: Int, mean_byte: Double)

  /** Attach a binary payload + metadata struct to the documents table
    * (payload = utf-8 bytes of the text; stands in for image/audio blobs). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("application/fake").as("mime"),
        (pmod(col("n_chars"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(32)) + 16).cast("int").as("height")).as("meta"))

  /** STUB decoder — deterministic fake for the absent media libraries.
    * A real deployment swaps this body for an image/audio decode; the
    * signature (bytes in, features out, called inside a partition batch)
    * is the contract. */
  private def fakeDecode(payload: Array[Byte]): (Long, Double) = {
    // ??? <- real decode goes here; deterministic fake below
    val len = payload.length.toLong
    val mean = if (len == 0) 0.0 else payload.foldLeft(0L)(_ + java.lang.Byte.toUnsignedInt(_)).toDouble / len
    (len, mean)
  }

  /** Uniform FRAME SAMPLING over a timed payload — the video half of
    * the multimodal plumbing. Sample timestamps are pure metadata
    * arithmetic (duration = chars × msPerChar stands in for the
    * demuxer's duration field), and each emitted frame carries ONLY its
    * own slice of the payload: the explode fans out the tiny
    * (idx, ts) pairs, never the full blob, and the slice happens on the
    * local row before any shuffle — the shape that matters when frames
    * come from multi-GB videos. A real deployment swaps the substring
    * for the codec's seek+decode at `ts_ms`; everything else stands. */
  def sampleFrames(docs: DataFrame, everyMs: Long = 1000L,
                   frameChars: Int = 32, msPerChar: Long = 40L): DataFrame = {
    require(everyMs > 0 && frameChars > 0 && msPerChar > 0)
    val dur = (length(col("text")).cast("long") * msPerChar).as("dur")
    // Generate and the slicing Project fuse inside one codegen stage, so
    // carrying `text` through the explode never materializes a copy per
    // frame — each output row reads the parent buffer and emits only its
    // substring. No join, no shuffle.
    // Empty text means dur=0 and sequence(0, -1), which Spark generates
    // DESCENDING — two bogus frames instead of none. Same load-bearing
    // guard as Dedup.dedupSubstrings.
    docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"), dur)
      .select(col("doc_id"), col("text"), explode(sequence(lit(0L),
        floor((col("dur") - 1) / lit(everyMs)).cast("long"))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * everyMs).as("ts_ms"),
        col("text").substr(
          ((col("frame_idx") * everyMs) / lit(msPerChar)).cast("long") + 1,
          lit(frameChars)).as("frame"))
  }

  /** Batched per-partition feature extraction over the binary column —
    * the mapInPandas analog: no per-row task overhead, payload bytes stay
    * partition-local. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    val typed = media.select(col("doc_id"), col("payload"),
      col("meta.mime").as("mime"), col("meta.width").as("width"),
      col("meta.height").as("height")).as[MediaRow]
    typed.mapPartitions { rows =>
      // One digest instance per partition; `digest()` resets it after each
      // call, so reuse across rows is safe and amortizes the setup cost —
      // the point of the mapPartitions shape.
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = "0123456789abcdef".toCharArray
      rows.map { r =>
        val (len, mean) = fakeDecode(r.payload)
        val d = md.digest(r.payload)
        val sb = new java.lang.StringBuilder(d.length * 2)
        var i = 0
        while (i < d.length) {
          val b = d(i) & 0xff
          sb.append(hex(b >>> 4)).append(hex(b & 0xf))
          i += 1
        }
        MediaFeatures(r.doc_id, len, sb.toString, r.width, r.height, mean)
      }
    }
  }
}
