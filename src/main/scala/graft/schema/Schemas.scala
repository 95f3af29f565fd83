package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructType registry for every table layer of the engine.
  *
  * Mirrors the reference's three schema layers (SURVEY.md §1):
  * operational DDL (reference `data/transformation_db.py:18-85`), star
  * schema DDL (reference `data/transformation_dw.py:11-116`), staging
  * CSV shapes (reference `data/extraction.py:48-55,61-69,96-105`,
  * `manual_tools/manual_finance_uploader.py:72-104`).
  *
  * All fields are nullable; NOT NULL constraints are enforced by
  * pre-load filtering ([[graft.ops.Relational.dropNullsIn]]), matching
  * the reference's `dropna(subset=...)` behavior — violating rows are
  * silently dropped, never errored.
  */
object Schemas {

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })

  // ---------------------------------------------------------------
  // Operational layer (reference data/transformation_db.py:18-85)
  // ---------------------------------------------------------------

  val places: StructType = st(
    "place_id" -> StringType, "name" -> StringType,
    "phone_number" -> StringType, "opening_hours_text" -> StringType,
    "types" -> StringType, "lat" -> DoubleType, "lng" -> DoubleType,
    "rating_search" -> DoubleType)

  /** `rating` added vs reference DDL (`transformation_db.py:31-39`):
    * extraction emits it (`extraction.py:54`) and fact_maps requires it
    * NOT NULL (`transformation_dw.py:78,249`) — see SURVEY.md §7.1. */
  val reviews: StructType = st(
    "id_review" -> StringType, "timestamp_review" -> TimestampType,
    "place_id" -> StringType, "author_url" -> StringType,
    "review_text" -> StringType, "rating" -> DoubleType)

  val tweets: StructType = st(
    "id_tweet" -> StringType, "place_id_source" -> StringType,
    "keyword_search" -> StringType, "created_at_tweet" -> TimestampType,
    "text_tweet" -> StringType, "id_author_twitter" -> StringType,
    "author_location" -> StringType, "tweet_geo_place_id" -> StringType)

  val pemasukan: StructType = st(
    "id_transaksi_original" -> StringType, "timestamp" -> TimestampType,
    "id_proyek" -> StringType, "nama_proyek" -> StringType,
    "sektor_pariwisata" -> StringType, "id_penyumbang" -> StringType,
    "nama_penyumbang" -> StringType, "jenis_penyumbang" -> StringType,
    "jenis_pemasukan" -> StringType, "jumlah" -> LongType,
    "bukti" -> StringType)

  val pengeluaran: StructType = st(
    "id_transaksi_original" -> StringType, "timestamp" -> TimestampType,
    "id_proyek" -> StringType, "nama_proyek" -> StringType,
    "sektor_pariwisata" -> StringType, "id_vendor" -> StringType,
    "nama_vendor" -> StringType, "id_departemen" -> StringType,
    "nama_departemen" -> StringType, "jenis_kebutuhan" -> StringType,
    "jumlah" -> LongType, "bukti" -> StringType)

  val operational: Map[String, StructType] = Map(
    "places" -> places, "reviews" -> reviews, "tweets" -> tweets,
    "pemasukan" -> pemasukan, "pengeluaran" -> pengeluaran)

  /** Primary-key column per operational table
    * (reference `transformation_db.py:140-160` id_column args). */
  val operationalKeys: Map[String, String] = Map(
    "places" -> "place_id", "reviews" -> "id_review",
    "tweets" -> "id_tweet", "pemasukan" -> "id_transaksi_original",
    "pengeluaran" -> "id_transaksi_original")

  // ---------------------------------------------------------------
  // Star schema (reference data/transformation_dw.py:11-116).
  // BigQuery TIME has no Spark native type → 'HH:mm:ss' string (§1);
  // BIGNUMERIC → DecimalType(38,9).
  // ---------------------------------------------------------------

  val dimWaktu: StructType = st(
    "timestamp_datetime" -> TimestampType, "jam" -> StringType,
    "hari" -> StringType, "tanggal" -> DateType,
    "bulan" -> StringType, "tahun" -> LongType)

  val dimPlace: StructType = st(
    "place_id" -> StringType, "nama_tempat" -> StringType,
    "latitude" -> DoubleType, "longitude" -> DoubleType,
    "tipe_tempat" -> StringType, "kontak" -> StringType,
    "jam_operasional" -> StringType)

  val dimUser: StructType = st(
    "id_user" -> StringType, "lokasi_user" -> StringType)

  val dimVendor: StructType = st(
    "id_vendor" -> StringType, "nama_vendor" -> StringType)

  val dimDepartemen: StructType = st(
    "id_departemen" -> StringType, "nama_departemen" -> StringType)

  val dimProyek: StructType = st(
    "id_proyek" -> StringType, "nama_proyek" -> StringType,
    "sektor_pariwisata" -> StringType)

  val dimPenyumbang: StructType = st(
    "id_penyumbang" -> StringType, "nama_penyumbang" -> StringType,
    "jenis_penyumbang" -> StringType)

  val money: DataType = DecimalType(38, 9)

  val factMaps: StructType = st(
    "id_review" -> StringType, "timestamp_datetime" -> TimestampType,
    "place_id" -> StringType, "author_url" -> StringType,
    "review_longtext" -> StringType, "rating" -> DoubleType)

  val factTwitter: StructType = st(
    "id_tweet" -> StringType, "created_at_datetime" -> TimestampType,
    "id_user" -> StringType, "nama_lokasi" -> StringType,
    "text_tweet" -> StringType)

  val factPengeluaran: StructType = st(
    "id_transaksi" -> StringType, "timestamp_datetime" -> TimestampType,
    "jenis_kebutuhan" -> StringType, "id_vendor" -> StringType,
    "id_departemen" -> StringType, "jumlah_pengeluaran" -> money,
    "bukti_pengeluaran" -> StringType, "id_proyek" -> StringType)

  val factPemasukan: StructType = st(
    "id_transaksi_income" -> StringType, "timestamp_datetime" -> TimestampType,
    "jenis_pemasukan" -> StringType, "id_penyumbang" -> StringType,
    "jumlah_pemasukan" -> money, "bukti_pemasukan" -> StringType,
    "id_proyek" -> StringType)

  val mart: Map[String, StructType] = Map(
    "dim_waktu" -> dimWaktu, "dim_place" -> dimPlace,
    "dim_user" -> dimUser, "dim_vendor" -> dimVendor,
    "dim_departemen" -> dimDepartemen, "dim_proyek" -> dimProyek,
    "dim_penyumbang" -> dimPenyumbang, "fact_maps" -> factMaps,
    "fact_twitter" -> factTwitter, "fact_pengeluaran" -> factPengeluaran,
    "fact_pemasukan" -> factPemasukan)

  // ---------------------------------------------------------------
  // Staging CSV shapes (what the extractors emit;
  // reference extraction.py:139-148 places search+detail merge,
  // :48-55 reviews, :96-105 tweets).
  // ---------------------------------------------------------------

  val stagingPlaces: StructType = st(
    "place_id" -> StringType, "name" -> StringType,
    "rating_search" -> DoubleType, "name_detail" -> StringType,
    "phone_number" -> StringType, "opening_hours_text" -> StringType,
    "types_detail" -> StringType, "lat_detail" -> DoubleType,
    "lng_detail" -> DoubleType)

  val stagingReviews: StructType = reviews
  val stagingTweets: StructType = tweets
  val stagingPemasukan: StructType = pemasukan
  val stagingPengeluaran: StructType = pengeluaran
}
