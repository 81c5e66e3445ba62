package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Flatten
import graft.etl.Flatten.{Leaf, Obj}
import graft.functions.WeightedMean
import graft.operators.Multimodal

/** Reference-parity ETL semantics + extension-point surface, driven through
  * the testdata tables so the oracle gate covers them: the P1–P3 flatten
  * engine, the multimodal binary pipeline, and the Aggregator UDAF.
  * (The full Jira fixture pipelines — page envelopes, null parents, label
  * joins — run in JiraEtlSpec against src/test/resources/fixtures.)
  */
object EtlOps {

  val defs: Seq[QueryDef] = Seq(

    // q41: multimodal frame sampling — documents wrapped as binary media
    // payloads, 4 evenly-spaced 32-byte "frames" sliced per payload
    // (codegen'd substring on binary; blob never shuffles), then content-
    // addressed. Oracle recomputes on the text equivalent of the bytes.
    QueryDef("q41_multimodal_frames",
      (s, d) => {
        val media = Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text")
        Multimodal.sampleFrames(media, 4, 32)
          .select(col("media_id"), col("frame_idx"), col("offset"),
            md5(decode(col("frame"), "UTF-8")).as("frame_hash"))
          .orderBy("media_id", "frame_idx")
      },
      Some("""SELECT doc_id AS media_id, i AS frame_idx,
          CAST(floor(i * greatest(len(text) - 32, 0) / 3) AS INTEGER) + 1 AS offset,
          md5(substr(text, CAST(floor(i * greatest(len(text) - 32, 0) / 3) AS INTEGER) + 1, 32)) AS frame_hash
        FROM documents, (SELECT CAST(unnest(generate_series(0, 3)) AS INTEGER) i) f
        ORDER BY media_id, frame_idx""")),

    // q95: the REAL raster codec end-to-end — synthesize an 8×6 P6 image
    // per document (pixels = md5-derived, SQL-recomputable), ENCODE it,
    // DECODE it back, nearest-neighbor resize to 4×3, and report integer
    // raster stats of the resized image. The oracle recomputes the resized
    // pixels straight from the generating formula (dst (x,y) maps to src
    // (2x, 2y)), so a header-parse bug, a pixel-order bug, or a resize
    // off-by-one all hash-mismatch. All map-side; pixels never shuffle.
    QueryDef("q95_ppm_decode",
      (s, d) => {
        val media = Multimodal.syntheticPpm(Tables.documents(s, d), "doc_id", 8, 6)
        Multimodal.ppmStats(Multimodal.resizePpm(media, 4, 3))
          .select(col("media_id").as("doc_id"), col("w"), col("h"), col("lum"))
          .orderBy("doc_id")
      },
      Some("""WITH g AS (
          SELECT d.doc_id, gx.x, gy.y, gc.c,
            (('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)||':'||CAST(gx.x*2 AS VARCHAR)||':'||CAST(gy.y*2 AS VARCHAR)||':'||CAST(gc.c AS VARCHAR)),1,8))::BIGINT) % 256 AS v
          FROM documents d,
               generate_series(0,3) AS gx(x), generate_series(0,2) AS gy(y), generate_series(0,2) AS gc(c))
        SELECT doc_id, CAST(4 AS INTEGER) w, CAST(3 AS INTEGER) h, CAST(sum(v) AS BIGINT) lum
        FROM g GROUP BY doc_id ORDER BY doc_id""")),

    // q98: the REAL audio codec end-to-end — synthesize 64 PCM16 samples
    // per document at 8 kHz (sample = md5-derived, SQL-recomputable),
    // ENCODE as RIFF/WAVE, DECODE back (magic + chunk walk + little-
    // endian sample extraction), RESAMPLE nearest-neighbor to 4 kHz
    // (output sample i = source sample 2i, the floor map), re-encode,
    // decode again, then integer frame features (L1 energy + zero
    // crossings) over 16-sample frames. The oracle recomputes the
    // resampled stream straight from the generating formula at the
    // strided indices, so a header off-by-one, an endianness flip, a
    // sign-extension bug, or a resample off-by-one all hash-mismatch.
    // The audio mirror of q95; all map-side, samples never shuffle.
    QueryDef("q98_wav_decode",
      (s, d) => {
        val media = Multimodal.syntheticWav(Tables.documents(s, d), "doc_id", 64, 8000)
        Multimodal.wavFrameFeatures(Multimodal.wavResample(media, 4000), 16)
          .select(col("media_id").as("doc_id"), col("frame_idx"),
            col("l1"), col("zc"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH s AS (
          SELECT d.doc_id, g.i,
            (('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)||':'||CAST(g.i*2 AS VARCHAR)),1,8))::BIGINT) % 65536 - 32768 AS v
          FROM documents d, (SELECT CAST(unnest(generate_series(0, 31)) AS INTEGER) i) g),
        w AS (SELECT doc_id, i, v, lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM s)
        SELECT doc_id, CAST(i // 16 AS INTEGER) AS frame_idx,
          CAST(sum(abs(v)) AS BIGINT) AS l1,
          CAST(sum(CASE WHEN i % 16 > 0 AND (v < 0) <> (pv < 0) THEN 1 ELSE 0 END) AS BIGINT) AS zc
        FROM w GROUP BY doc_id, frame_idx ORDER BY doc_id, frame_idx""")),

    // q107: perceptual image hash (dHash) through the REAL raster codec —
    // synthesize a 16×12 P6 image per document (md5-formula pixels), decode,
    // nearest-neighbor resample to the 9×8 dHash grid, integer grayscale,
    // adjacent-column comparison bits → two unsigned 32-bit halves. The
    // oracle recomputes every grid pixel from the generating formula at the
    // resample's floor-mapped source coordinates (sx = gx·16 div 9,
    // sy = gy·12 div 8), so a resize off-by-one, a channel-order bug, or a
    // bit-index flip all hash-mismatch. The image-dedup fingerprint;
    // near-dup pairing over it is MultimodalSpec's planted-duplicate case.
    QueryDef("q107_image_dhash",
      (s, d) => {
        val media = Multimodal.syntheticPpm(Tables.documents(s, d), "doc_id", 16, 12)
        Multimodal.dhash(media, 8, 8)
          .select(col("media_id").as("doc_id"), col("h_hi"), col("h_lo"))
          .orderBy("doc_id")
      },
      Some("""WITH grid AS (
          SELECT d.doc_id, gx.x, gy.y, CAST(sum(
              ('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)||':'||CAST(gx.x*16//9 AS VARCHAR)||':'||CAST(gy.y*12//8 AS VARCHAR)||':'||CAST(gc.c AS VARCHAR)),1,8))::BIGINT % 256
            ) // 3 AS BIGINT) gray
          FROM documents d, generate_series(0,8) AS gx(x),
               generate_series(0,7) AS gy(y), generate_series(0,2) AS gc(c)
          GROUP BY d.doc_id, gx.x, gy.y),
        bits AS (
          SELECT a.doc_id, a.y*8 + a.x AS idx,
                 CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
          FROM grid a JOIN grid b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
          WHERE a.x < 8)
        SELECT doc_id,
          CAST(sum(CASE WHEN idx >= 32 THEN bit * (1::BIGINT << (idx - 32)) ELSE 0 END) AS BIGINT) h_hi,
          CAST(sum(CASE WHEN idx < 32 THEN bit * (1::BIGINT << idx) ELSE 0 END) AS BIGINT) h_lo
        FROM bits GROUP BY doc_id ORDER BY doc_id""")),

    // q42: Aggregator UDAF — quantity-weighted mean discount per flag.
    // Partial+final merge like built-in avg: one two-double buffer per
    // group shuffles, nothing else.
    QueryDef("q42_udaf_weighted_mean",
      (s, d) => {
        val wm = udaf(WeightedMean,
          org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaDouble,
            org.apache.spark.sql.Encoders.scalaDouble))
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            round(wm(col("l_discount"), col("l_quantity")), 6).as("wavg_discount"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
          round(sum(l_discount * l_quantity) / sum(l_quantity), 6) AS wavg_discount,
          count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // q44: vector UDAF — per-label embedding centroid in one typed
    // Aggregator pass (partial elementwise sums merge map-side; the
    // shuffle carries one 64-dim buffer per partition per label, not rows).
    QueryDef("q44_label_centroid",
      (s, d) => {
        val cen = udaf(graft.functions.CentroidAggregator,
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
        Tables.embeddings(s, d)
          .groupBy(col("label"))
          .agg(cen(col("embedding")).as("centroid"))
          .select(col("label"), posexplode(col("centroid")).as(Seq("dim", "c")))
          .select(col("label"), col("dim").cast("int").as("dim"),
            round(col("c"), 6).as("c"))
          .orderBy("label", "dim")
      },
      Some("""SELECT label, CAST(i - 1 AS INTEGER) AS dim,
          round(avg(embedding[i]), 6) AS c
        FROM embeddings, (SELECT unnest(generate_series(1, 64)) i) ii
        GROUP BY label, i ORDER BY label, dim""")),

    // q43: the P1–P3 flatten engine over a nested struct: raw-key prefix
    // chain + mapped leaf naming, '//' array join, unmapped-key projection
    // (o_comment is present in the struct but absent from the mapping →
    // dropped). Same semantics the JiraEtl mappings use.
    QueryDef("q43_flatten_nested",
      (s, d) => {
        val nested = Tables.orders(s, d).select(
          col("o_orderkey").as("id"),
          struct(
            struct(col("o_orderstatus").as("name"),
              struct(col("o_orderpriority").as("name")).as("category")).as("status"),
            split(col("o_orderpriority"), "-").as("labels"),
            col("o_totalprice").as("price"),
            col("o_custkey").as("junk")).as("fields"))
        val mapping = Obj(
          "id" -> Leaf("order_id"),
          "fields" -> Obj(
            "status" -> Obj(
              "name" -> Leaf("name"),
              "category" -> Obj("name" -> Leaf("key"))),
            "labels" -> Leaf("labels"),
            "price" -> Leaf("price")))
        Flatten(nested, mapping).orderBy("order_id")
      },
      Some("""SELECT o_orderkey AS order_id, o_orderstatus AS fields_status_name,
          o_orderpriority AS fields_status_category_key,
          array_to_string(string_split(o_orderpriority, '-'), '//') AS fields_labels,
          o_totalprice AS fields_price
        FROM orders ORDER BY order_id""")),

    // q258: data-quality audit table — the Deequ/dbt-test-shaped gate a
    // 100 TB ingest runs before publishing a partition: referential
    // integrity (anti-join counts — the broadcast-dim form of a dbt
    // relationship test), primary-key uniqueness, null/range checks, and
    // a derived-column consistency check (n_chars ≡ length(text) — the
    // class of bug where a backfill recomputed one column and not the
    // other). One aggregate per check; every count exact; zeros are the
    // point — this table IS the cleanliness proof the pipeline logs, and
    // EtlSpec proves each check fires on a constructed dirty corpus.
    QueryDef("q258_dq_audit",
      (s, d) => {
        import org.apache.spark.sql.{Column, DataFrame}
        def bad(c: Column) = sum(when(c, 1L).otherwise(0L))
        val c = Tables.customer(s, d)
        val dim = broadcast(c.select(col("c_custkey").as("k"),
          lit(true).as("_hit")))
        // ONE scan + ONE cut 1-row aggregate per fact table (the
        // Profile.card stance: adding a check never adds a scan); FK
        // orphans ride the same scan via the broadcast dim left join
        val oAgg = graft.operators.Checkpoints.cut(
          Tables.orders(s, d)
            .join(dim, col("o_custkey") === col("k"), "left")
            .agg(count(lit(1)).as("n"), bad(col("_hit").isNull).as("fk"),
              (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk"),
              bad(!col("o_orderstatus").isin("O", "F", "P")).as("dom")))
        val eAgg = graft.operators.Checkpoints.cut(
          Tables.events(s, d)
            .join(dim, col("user_id") === col("k"), "left")
            .agg(count(lit(1)).as("n"), bad(col("_hit").isNull).as("fk"),
              bad(col("value").isNull || col("value") <= 0.0).as("vp")))
        val dAgg = graft.operators.Checkpoints.cut(
          Tables.documents(s, d)
            .agg(count(lit(1)).as("n"),
              bad(col("n_chars") =!= length(col("text"))).as("nc"),
              bad(col("text").isNull || length(col("text")) === 0)
                .as("emp")))
        val lAgg = Tables.lineitem(s, d)
          .agg(count(lit(1)).as("n"),
            bad(col("l_quantity") < 1.0 || col("l_quantity") > 50.0)
              .as("qr"))
        def rows(agg: DataFrame, tbl: String, checks: (String, String)*) =
          checks.map { case (name, colName) =>
            agg.select(lit(tbl).as("tbl"), lit(name).as("check_name"),
              col("n").as("n_rows"), col(colName).as("n_violations"))
          }
        val all =
          rows(eAgg, "events", "fk_user_customer" -> "fk",
            "value_positive" -> "vp") ++
          rows(oAgg, "orders", "fk_custkey_customer" -> "fk",
            "pk_unique" -> "pk", "status_domain" -> "dom") ++
          rows(dAgg, "documents", "n_chars_consistent" -> "nc",
            "text_nonempty" -> "emp") ++
          rows(lAgg, "lineitem", "quantity_range" -> "qr")
        graft.operators.Checkpoints.sealAndRelease(
          all.reduce(_ unionByName _).orderBy("tbl", "check_name"),
          oAgg, eAgg, dAgg)
      },
      Some("""SELECT * FROM (
          SELECT 'events' tbl, 'fk_user_customer' check_name,
            CAST(count(*) AS BIGINT) n_rows,
            CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              n_violations
          FROM events LEFT JOIN customer ON user_id = c_custkey
          UNION ALL
          SELECT 'orders', 'fk_custkey_customer', CAST(count(*) AS BIGINT),
            CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          FROM orders LEFT JOIN customer ON o_custkey = c_custkey
          UNION ALL
          SELECT 'orders', 'pk_unique', CAST(count(*) AS BIGINT),
            CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'documents', 'n_chars_consistent', CAST(count(*) AS BIGINT),
            CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
              AS BIGINT)
          FROM documents
          UNION ALL
          SELECT 'documents', 'text_nonempty', CAST(count(*) AS BIGINT),
            CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
              THEN 1 ELSE 0 END) AS BIGINT)
          FROM documents
          UNION ALL
          SELECT 'events', 'value_positive', CAST(count(*) AS BIGINT),
            CAST(sum(CASE WHEN value IS NULL OR value <= 0.0
              THEN 1 ELSE 0 END) AS BIGINT)
          FROM events
          UNION ALL
          SELECT 'lineitem', 'quantity_range', CAST(count(*) AS BIGINT),
            CAST(sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0
              THEN 1 ELSE 0 END) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT 'orders', 'status_domain', CAST(count(*) AS BIGINT),
            CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
              THEN 1 ELSE 0 END) AS BIGINT)
          FROM orders)
        ORDER BY tbl, check_name"""))
  )
}
