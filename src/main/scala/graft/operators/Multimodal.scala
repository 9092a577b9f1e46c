package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column pattern: opaque binary payloads + typed metadata.
  *
  * The container has no image/audio codecs (task brief: STUB the decode),
  * so the "image bytes" are the document text cast to binary and the
  * decoder is a deterministic fake — but the Spark-side plumbing
  * (binary columns, metadata structs, partition-parallel decode via
  * mapPartitions, schema of the decoded output) is real and tested.
  */
object Multimodal {

  /** Multimodal struct column: text + metadata struct + embedding,
    * joined on doc_id = vec_id; nested JSON export of the metadata.
    * At scale, this is the "asset table" pattern — one row per asset,
    * metadata nested, payload columns pruned unless selected. */
  def multimodalStruct(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .join(Tables.embeddings(s, sf),
            col("doc_id") === col("vec_id"))
      .select(col("doc_id"),
        to_json(struct(col("lang"), col("source"), col("n_chars")))
          .as("meta_json"),
        size(col("embedding")).cast("bigint").as("emb_dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6)
          .as("first_dim"))
      .orderBy("doc_id")

  /** Binary payload "decode": byte length, content hash, head bytes —
    * pure SQL surface over a binary column (oracle: DuckDB md5 of the
    * same UTF-8 bytes). */
  def multimodalBinary(s: SparkSession, sf: String): DataFrame =
    Tables.documents(s, sf)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .select(col("doc_id"),
        length(col("payload")).cast("bigint").as("byte_len"),
        md5(col("payload")).as("content_md5"),
        substring(col("payload"), 1, 4).cast("string").as("head4"))
      .orderBy("doc_id")

  /** Decoded "image" record produced by the stub decoder. */
  case class DecodedAsset(doc_id: Long, width: Int, height: Int,
                          channels: Int, n_pixels: Long)

  /** STUB: deterministic fake image decode — real codecs are absent in
    * this container. Derives dimensions from the payload bytes; the
    * partition-parallel shape (iterator-in/iterator-out, no
    * driver-side materialization) is exactly how a real decoder plugs
    * in (a Pandas-UDF/mapInArrow equivalent in the Scala API). */
  private def stubDecode(id: Long, payload: Array[Byte]): DecodedAsset = {
    val w = 64 + (payload.length % 512)
    val h = 64 + ((if (payload.nonEmpty) payload(0) & 0xff else 0) % 512)
    DecodedAsset(id, w, h, 3, w.toLong * h * 3)
  }

  /** mapPartitions decode pipeline over (doc_id, payload) — one decoder
    * instantiation per partition (where a real pipeline would init the
    * codec once), streaming rows through without collecting. */
  def multimodalDecode(s: SparkSession, sf: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, sf)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (codec init, buffers)
        it.map { case (id, bytes) => stubDecode(id, bytes) }
      }
      .toDF()
      .orderBy("doc_id")
  }
}
