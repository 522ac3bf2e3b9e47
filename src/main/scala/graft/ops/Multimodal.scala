package graft.ops

import org.apache.spark.sql.functions._

/** Multimodal columns — images/audio/video as opaque BinaryType payloads
  * with typed metadata, per the LLM-data-pipeline north star.
  *
  * No media FIXTURES exist in this environment, so most ops use a
  * clearly-marked deterministic stub (byte histogram standing in for pixel
  * decode); everything around it — BinaryType schema, typed Dataset
  * encoders, mapPartitions batch shape, per-frame chunking, metadata
  * structs — is the real plumbing a production pipeline would keep, with
  * the codec call swapped in where the stub is. mm_decode_real swaps it
  * in: a genuine PNG encode/decode round-trip through the JDK's
  * javax.imageio codec over synthesized images, exact-verified.
  *
  * The payload is synthesized deterministically (UTF-8 bytes of the ascii
  * document text), which lets DuckDB mirror every byte-level computation
  * through character functions — so even the binary ops are oracle-checked.
  *
  * mapPartitions here is the genuine per-partition imperative case: codecs
  * are stateful/expensive to init, so the real version initializes one
  * decoder per partition and streams the batch through it.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  case class MmRow(doc_id: Long, payload: Array[Byte])

  /** STUB DECODE: byte histogram (16 bins) in place of a real image/audio
    * decode. Deterministic, byte-exact, partition-local.
    */
  private def decodeStub(payload: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xFF) >> 4) += 1
      i += 1
    }
    hist
  }

  /** "Decode" + feature-extract over binary payloads via typed
    * mapPartitions; emits (doc_id, bin, cnt) rows of the 16-bin histogram.
    */
  val mmDecodeFeatures = Op(
    "mm_decode_features",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[MmRow]
        .mapPartitions { it =>
          it.flatMap { r =>
            decodeStub(r.payload).zipWithIndex.collect {
              case (cnt, bin) if cnt > 0 => (r.doc_id, bin.toLong, cnt)
            }
          }
        }
        .toDF("doc_id", "bin", "cnt")
        .orderBy(col("doc_id"), col("bin"))
    },
    Some("""
      SELECT doc_id, ascii(c) // 16 AS bin, COUNT(*) AS cnt
      FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
            FROM documents WHERE doc_id < 200)
      GROUP BY doc_id, bin
      ORDER BY doc_id, bin
    """)
  )

  /** Metadata-typed resize: the payload is untouched (codec stubbed); the
    * op transforms the typed metadata struct and proves payload integrity
    * via byte length — the schema/partitioning shape of a real resize.
    */
  val mmResizeMeta = Op(
    "mm_resize_meta",
    (s, d) =>
      T.documents(s, d)
        .select(
          col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          struct(
            lit("gray8").as("format"),
            (col("n_chars") % 48 + 16).as("width"),
            (col("n_chars") % 32 + 8).as("height")).as("meta"))
        .select(
          col("doc_id"),
          col("meta.format").as("format"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          (col("meta.width") / 2).cast("long").as("new_width"),
          (col("meta.height") / 2).cast("long").as("new_height"),
          length(col("payload")).cast("long").as("n_bytes"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, 'gray8' AS format,
             n_chars % 48 + 16 AS width,
             n_chars % 32 + 8 AS height,
             (n_chars % 48 + 16) // 2 AS new_width,
             (n_chars % 32 + 8) // 2 AS new_height,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents ORDER BY doc_id
    """)
  )

  /** Frame sampling: chunk the payload into 64-byte frames, keep every 4th
    * (video keyframe-sampling shape), emit per-frame checksum. Byte-level
    * imperative work in the typed partition iterator.
    */
  val mmFrameSample = Op(
    "mm_frame_sample",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[MmRow]
        .mapPartitions { it =>
          it.flatMap { r =>
            val nFrames = r.payload.length / 64
            (0 until nFrames by 4).iterator.map { k =>
              val frame = r.payload.slice(k * 64, k * 64 + 64)
              val checksum = frame.foldLeft(0L)((acc, b) => acc + (b & 0xFF))
              (r.doc_id, k.toLong, frame.length.toLong, checksum)
            }
          }
        }
        .toDF("doc_id", "frame_idx", "frame_len", "checksum")
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some("""
      WITH f AS (
        SELECT doc_id, text,
               unnest(range(0, octet_length(encode(text)) // 64, 4)) AS frame_idx
        FROM documents WHERE doc_id < 200)
      SELECT doc_id, frame_idx,
             CAST(64 AS BIGINT) AS frame_len,
             CAST(list_sum(list_transform(
               string_split(substring(text, CAST(frame_idx * 64 + 1 AS INT), 64), ''),
               c -> ascii(c))) AS BIGINT) AS checksum
      FROM f ORDER BY doc_id, frame_idx
    """)
  )

  /** Exact content dedup over binary payloads: md5 of the bytes is the
    * content key — the first-pass dedup for ANY modality at 100 TB (a
    * 16-byte key per object shuffles instead of the payloads themselves;
    * near-dup tiers like MinHash/SimHash/embedding-cosine run after this).
    * Emits the duplication histogram (n_copies → n_groups) with the min
    * canonical id as a value probe, so the result is non-empty and
    * hash-checkable whether or not the corpus contains exact dups.
    */
  val mmContentDedup = Op(
    "mm_content_dedup",
    (s, d) =>
      T.documents(s, d)
        .select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("content_key"))
        .groupBy(col("content_key"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
        .groupBy(col("n_copies"))
        .agg(count(lit(1)).as("n_groups"), min(col("canonical_id")).as("min_canonical"))
        .orderBy(col("n_copies")),
    Some("""
      SELECT n_copies, COUNT(*) AS n_groups, MIN(canonical_id) AS min_canonical
      FROM (SELECT md5(text) AS content_key, MIN(doc_id) AS canonical_id,
                   COUNT(*) AS n_copies
            FROM documents GROUP BY 1)
      GROUP BY n_copies ORDER BY n_copies
    """)
  )

  /** One decoded-image feature row (see mmDecodeReal). */
  case class MmPixelStats(doc_id: Long, png_bytes: Long, width: Long,
      height: Long, r_sum: Long, g_sum: Long, b_sum: Long)

  /** REAL image decode through `javax.imageio` — the one multimodal tier
    * the stub histogram could not cover. No media fixtures exist in this
    * environment, so the op synthesizes its own: per document a small RGB
    * image whose pixels are integer formulas of (doc_id, x, y), PNG-encoded
    * in the same task — from that point on the pipeline is exactly what a
    * production image corpus runs: a BinaryType payload column, a
    * mapPartitions pass that initializes ONE decoder per partition
    * (ImageIO.setUseCache(false) — codecs are stateful and per-row init is
    * the classic perf bug), ImageIO.read over each payload, and typed
    * per-image feature rows out (dimensions + per-channel pixel sums).
    * PNG is lossless, so the decoded stats are closed-form deterministic —
    * ExemptSpec recomputes them from the pixel formulas and requires exact
    * equality, which proves the codec round-trip end-to-end, not a stub.
    * Oracle-exempt: DuckDB has no PNG codec. At 100 TB the shape is
    * unchanged: payloads stay columnar binary, decode is partition-local
    * scan work with zero shuffle; only the tiny feature rows aggregate.
    */
  val mmDecodeReal = Op(
    "mm_decode_real",
    (s, d) => {
      import s.implicits._
      T.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions { it =>
          // per-partition codec init, not per row
          javax.imageio.ImageIO.setUseCache(false)
          it.map { docId =>
            val w = (docId % 16 + 8).toInt
            val h = (docId % 12 + 6).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val r = ((docId * 7 + x * 13 + y * 31) % 256).toInt
                val g = ((docId * 11 + x * 17 + y * 3) % 256).toInt
                val b = ((docId * 5 + x * 29 + y * 23) % 256).toInt
                img.setRGB(x, y, (r << 16) | (g << 8) | b)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (docId, bos.toByteArray)
          }
        }
        .toDF("doc_id", "payload")
        .as[MmRow]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.map { r =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.payload))
            var rs = 0L; var gs = 0L; var bs = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val p = img.getRGB(x, y)
                rs += (p >> 16) & 0xFF; gs += (p >> 8) & 0xFF; bs += p & 0xFF
                x += 1
              }
              y += 1
            }
            MmPixelStats(r.doc_id, r.payload.length.toLong,
              img.getWidth.toLong, img.getHeight.toLong, rs, gs, bs)
          }
        }
        .toDF()
        .orderBy(col("doc_id"))
    },
    None
  )

  /** Raw-file ingest via the `binaryFile` source — THE entry point for
    * media/blob corpora that don't arrive as parquet: each file becomes one
    * row (path, length, content BinaryType) and all downstream processing is
    * ordinary distributed DataFrame work; file listing parallelizes across
    * the cluster and a length pushdown filter skips oversized blobs at scan
    * time. Fixture: 50 docs written out as one text file each (partitioned
    * write, so the doc id travels in the directory name, never the driver),
    * read back as binary, fingerprinted. Oracle recomputes length+md5 from
    * the documents table (text is ASCII, so bytes == chars; the text sink
    * appends one '\n').
    */
  val scanBinaryFiles = Op(
    "scan_binary_files",
    (s, d) => {
      val dir = T.scratch("binary_files_corpus")
      T.documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), col("text"))
        .coalesce(1)
        .write.mode("overwrite").partitionBy("doc_id").text(dir)
      s.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .option("recursiveFileLookup", "true")
        .load(dir)
        .select(
          regexp_extract(col("path"), "doc_id=(\\d+)", 1).cast("long").as("doc_id"),
          col("length").as("n_bytes"),
          md5(col("content")).as("content_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, CAST(strlen(text) + 1 AS BIGINT) AS n_bytes,
             md5(text || chr(10)) AS content_md5
      FROM documents WHERE doc_id < 50 ORDER BY doc_id
    """)
  )

  /** One perceptual hash row (see mmPhashDedup). */
  case class MmPhash(doc_id: Long, phash: Long)

  /** Perceptual-hash image dedup — the LAION-style near-duplicate stage
    * for image corpora: decode (genuine javax.imageio PNG round-trip, the
    * mm_decode_real path), average-hash (8×8 nearest-sample grayscale
    * grid, bit = sample > grid mean → a 64-bit signature; Zauner 2010's
    * aHash), then the SAME banded-sketch candidate topology the text tier
    * uses (sim_simhash_bands geometry: 4×16-bit bands, equi-join on
    * (band, value)). Pigeonhole guarantee: a pair within hamming ≤ 3 must
    * collide on ≥1 band (4 differing bits can already evade, one per
    * band); the verdict filter accepts hamming ≤ 8, so 4-8 is BEST-EFFORT
    * recall — wide bands keep band cardinality at 65 536 (no bucket
    * saturation at corpus scale), the same recall/cost knob documented at
    * sim_simhash_bands. Exact hamming (xor + bit_count, codegen'd) ≤ 8 is
    * the verdict. The corpus plants its own ground truth: doc_ids 50-99
    * re-render doc_id−50's image with one perturbed pixel. Closed-form
    * analysis of the generator (ExemptSpec recomputes it): planted pairs
    * land at hamming {0,1,2,7} — all 50 band-collide (the hamming-7 ones
    * empirically, not by guarantee) — and exactly 4 non-planted pairs among
    * the tiny-image docs {0,1,50,51} sit at hamming 6, so the full output
    * is those 54 pairs. Oracle: none (imageio); ExemptSpec pins the exact
    * 54-pair output, that all 50 planted pairs are present, agreement with
    * the brute-force all-pairs ≤8 twin, and determinism. At 100 TB:
    * signatures are 8 bytes/image — the pair search never touches pixels
    * again.
    */
  val mmPhashDedup = Op(
    "mm_phash_dedup",
    (s, d) => {
      import s.implicits._
      val sigs = T.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"))
        .as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.map { docId =>
            // ids >= 50 re-render (docId-50)'s image with ONE pixel nudged:
            // a planted near-duplicate with a known partner
            val base = if (docId >= 50) docId - 50 else docId
            val w = (base % 16 + 8).toInt
            val h = (base % 12 + 6).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                var r = ((base * 7 + x * 13 + y * 31) % 256).toInt
                val g = ((base * 11 + x * 17 + y * 3) % 256).toInt
                val b = ((base * 5 + x * 29 + y * 23) % 256).toInt
                if (docId >= 50 && x == 0 && y == 0) r = (r + 16) % 256
                img.setRGB(x, y, (r << 16) | (g << 8) | b)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            // decode through the codec (round-trip, not the in-memory img)
            val dec = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bos.toByteArray))
            // aHash: 8x8 nearest-sample gray grid, bit = sample > mean
            val g8 = new Array[Int](64)
            var i = 0
            while (i < 8) {
              var j = 0
              while (j < 8) {
                val p = dec.getRGB(j * dec.getWidth / 8, i * dec.getHeight / 8)
                g8(i * 8 + j) =
                  (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3
                j += 1
              }
              i += 1
            }
            val mean = g8.sum / 64
            var sig = 0L
            i = 0
            while (i < 64) {
              if (g8(i) > mean) sig |= (1L << i)
              i += 1
            }
            MmPhash(docId, sig)
          }
        }
        .toDF()
      // banded candidates (sim_simhash_bands topology) + exact hamming
      val banded = sigs.select(col("doc_id"), col("phash"),
          explode(expr(
            "transform(sequence(0, 3), b -> " +
              "struct(b AS band, shiftright(phash, b * 16) & 65535 AS bv))"))
            .as("bb"))
        .select(col("doc_id"), col("phash"),
          col("bb.band").as("band"), col("bb.bv").as("bv"))
      val a = banded.select(col("band"), col("bv"),
        col("doc_id").as("a_id"), col("phash").as("ha"))
      val b = banded.select(col("band"), col("bv"),
        col("doc_id").as("b_id"), col("phash").as("hb"))
      a.join(b, Seq("band", "bv"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), col("ha"), col("hb"))
        .distinct()
        .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
        .filter(col("hamming") <= 8)
        .select(col("a_id"), col("b_id"), col("hamming"))
        .orderBy(col("a_id"), col("b_id"))
    },
    None
  )

  /** Audio-frame energy extraction (r7) — the audio leg of the modality
    * tier (images have decode/phash, video has frame-sample; this is the
    * VAD/silence-trim primitive every speech-data pipeline runs first).
    * Payload: 1024 synthesized int8 "PCM" samples per doc — written and
    * re-read as a genuine BinaryType column, so the Spark side exercises
    * the real plumbing: binary → per-partition imperative frame loop
    * (mapPartitions, one "codec" per partition) → 128-sample frames →
    * integer sum-of-squares energy per frame. No floats anywhere: energy
    * is an exact long, "loud" is an integer threshold, so the per-doc
    * rollup (n_frames, loud frames, peak/total energy) hash-oracles —
    * DuckDB regenerates the same samples from the same formula and
    * windows them with list algebra, never touching binary. The frame
    * loop is partition-local and allocation-free per row; at 100 TB audio
    * this is the scan-speed shape: bytes stream once, per-frame state is
    * one accumulator, only (doc_id, features) leave the executor.
    */
  val mmAudioEnergy = Op(
    "mm_audio_energy",
    (s, d) => {
      import s.implicits._
      // synthesize the "recording": s[i] = ((doc_id*31 + 7*i*i) mod 256) - 128
      val pcm = T.documents(s, d)
        .filter(col("doc_id") < 500)
        .select(col("doc_id"))
        .as[Long]
        .map { id =>
          val bytes = new Array[Byte](1024)
          var i = 0
          while (i < 1024) {
            bytes(i) = ((((id * 31 + 7L * i * i) % 256) + 256) % 256 - 128).toByte
            i += 1
          }
          MmRow(id, bytes)
        }
      pcm.mapPartitions { it =>
        // one frame "codec" per partition; rows stream through it
        it.map { r =>
          var f = 0
          var nLoud = 0L
          var peak = 0L
          var total = 0L
          while (f < 8) {
            var e = 0L
            var i = f * 128
            val end = i + 128
            while (i < end) {
              val v = r.payload(i).toLong
              e += v * v
              i += 1
            }
            if (e > 700000L) nLoud += 1
            if (e > peak) peak = e
            total += e
            f += 1
          }
          (r.doc_id, 8L, nLoud, peak, total)
        }
      }.toDF("doc_id", "n_frames", "n_loud", "peak_energy", "total_energy")
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH pcm AS (
        SELECT doc_id,
               list_transform(range(0, 1024),
                 i -> ((doc_id * 31 + 7 * i * i) % 256 + 256) % 256 - 128) AS s
        FROM documents WHERE doc_id < 500),
      frames AS (
        SELECT doc_id, f,
               CAST(list_sum(list_transform(range(f * 128, (f + 1) * 128),
                 i -> s[i + 1] * s[i + 1])) AS BIGINT) AS e
        FROM pcm CROSS JOIN (SELECT unnest(range(0, 8)) AS f))
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_frames,
             CAST(SUM(CASE WHEN e > 700000 THEN 1 ELSE 0 END) AS BIGINT) AS n_loud,
             CAST(MAX(e) AS BIGINT) AS peak_energy,
             CAST(SUM(e) AS BIGINT) AS total_energy
      FROM frames GROUP BY doc_id ORDER BY doc_id
    """)
  )

  /** Shot-boundary detection — the temporal-segmentation leg of the video
    * tier (mm_frame_sample extracts keyframes; THIS finds where the cuts
    * are, the first step of every video-training-data pipeline since
    * captions/shots are aligned per segment): per-frame signature from the
    * byte payload in the typed partition iterator (the "codec" runs once
    * per partition, frames never shuffle as pixels — only 8-byte
    * signatures do), then a per-video lag window scores consecutive-frame
    * deviation and a cut fires where |Δ| exceeds the threshold (200 ≈ the
    * fixture's p90 inter-frame delta, so ~10% of transitions cut — a real
    * detector calibrates θ the same way). Rollup per video: frames, cuts,
    * max delta, mean shot length in frames (floor div). All integer →
    * fully hash-oracled; at scale the plan is scan → window on the video
    * key → map-side rollup, linear in frames.
    */
  val mmShotBoundary = Op(
    "mm_shot_boundary",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val frames = T.documents(s, d)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[MmRow]
        .mapPartitions { it =>
          it.flatMap { r =>
            val nFrames = r.payload.length / 64
            (0 until nFrames).iterator.map { k =>
              val frame = r.payload.slice(k * 64, k * 64 + 64)
              val sig = frame.foldLeft(0L)((acc, b) => acc + (b & 0xFF))
              (r.doc_id, k.toLong, sig)
            }
          }
        }
        .toDF("doc_id", "frame_idx", "sig")
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      frames
        .withColumn("delta", abs(col("sig") - lag(col("sig"), 1).over(w)))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_frames"),
          sum(when(col("delta") > 200, 1L).otherwise(0L)).as("n_cuts"),
          max(col("delta")).as("max_delta"),
          expr("count(1) div (sum(case when delta > 200 then 1 else 0 end) + 1)")
            .as("mean_shot_frames"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH f AS (
        SELECT doc_id, text,
               unnest(range(0, octet_length(encode(text)) // 64, 1)) AS frame_idx
        FROM documents WHERE doc_id < 200),
      sigs AS (
        SELECT doc_id, frame_idx,
               list_sum(list_transform(
                 string_split(substring(text, CAST(frame_idx * 64 + 1 AS INT), 64), ''),
                 c -> ascii(c))) AS sig
        FROM f),
      dd AS (
        SELECT doc_id,
               ABS(sig - LAG(sig) OVER (PARTITION BY doc_id ORDER BY frame_idx)) AS delta
        FROM sigs)
      SELECT doc_id, COUNT(*) AS n_frames,
             CAST(SUM(CASE WHEN delta > 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
             CAST(MAX(delta) AS BIGINT) AS max_delta,
             CAST(COUNT(*) // (SUM(CASE WHEN delta > 200 THEN 1 ELSE 0 END) + 1) AS BIGINT)
               AS mean_shot_frames
      FROM dd GROUP BY doc_id ORDER BY doc_id
    """)
  )

  val ops: Vector[Op] = Vector(
    mmDecodeFeatures, mmResizeMeta, mmFrameSample, mmContentDedup,
    scanBinaryFiles, mmDecodeReal, mmPhashDedup, mmAudioEnergy,
    mmShotBoundary)
}
