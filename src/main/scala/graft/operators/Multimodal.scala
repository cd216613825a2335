package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * fixed-size chunking, and a batched feature-extraction stage.
  *
  * The image path is a REAL codec roundtrip: each document's bytes are
  * laid out as a grayscale raster, encoded to an actual PNG with the
  * JDK's `javax.imageio` (no external codec needed), and the feature
  * stage DECODES that PNG and computes its statistics from the decoded
  * pixels. Because 8-bit grayscale PNG is lossless at the raster level,
  * the pixel stats have a closed form over the source bytes — which is
  * what lets the decode path keep a DuckDB oracle (m03/m07/m08) instead
  * of a rows-only check. The audio path (m09) needs no codec at all —
  * raw 8-bit PCM is the byte column itself, and the frame features
  * (DC-removed energy, zero crossings) are exact integer arithmetic.
  * Compressed audio/video codecs stay out of scope (none in the
  * container), but they would slot into the same shape: binary column
  * in, `mapPartitions` codec call, typed stats out.
  *
  * Scale: chunking, encode and decode are narrow (no shuffle);
  * payloads at 100 TB would live in parquet binary columns exactly like
  * this, with `spark.sql.files.maxPartitionBytes` sizing the splits.
  */
object Multimodal {

  /** Documents as a multimodal table: payload bytes + metadata struct. */
  def asBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        length(col("text").cast("binary")).cast("long").as("byte_len"),
        md5(col("text").cast("binary")).as("content_md5"),
        lit("text/plain").as("mime")).as("meta"))

  /** Fixed-size chunk index (idx, byte length) per payload — the shape a
    * frame-sampler or tile-splitter produces. */
  def chunkIndex(docs: DataFrame, chunkBytes: Int = 64): DataFrame =
    asBinary(docs)
      .select(col("doc_id"), length(col("payload")).cast("long").as("n"))
      // n = 0 must yield zero chunks — unguarded sequence(0, -1) would
      // DESCEND and emit two bogus chunks for an empty payload
      .filter(col("n") > 0)
      .withColumn("chunk_idx",
        explode(expr(s"sequence(0, cast(ceil(n / $chunkBytes.0) as bigint) - 1)")))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(chunkBytes.toLong), col("n") - col("chunk_idx") * chunkBytes).as("chunk_bytes"))

  /** Record shape entering/leaving the decoder. */
  case class Payload(doc_id: Long, payload: Array[Byte])
  case class Features(doc_id: Long, n_bytes: Long, features: Array[Float])
  /** An encoded image: real PNG bytes + the source-byte count (the
    * raster tail-pads the last row with zeros, so byte_len ≤ w·h). */
  case class PngRow(doc_id: Long, n_bytes: Long, png: Array[Byte],
                    width: Int, height: Int)

  /** Raster width for the byte→image layout (row-major fill). */
  private val ImgWidth = 32

  /** ENCODE: each payload's bytes become the samples of a `ImgWidth`-
    * wide 8-bit grayscale raster (row-major, zero-padded tail row),
    * written to genuine PNG bytes via the JDK's ImageIO — a real,
    * deterministic codec with no external deps. A narrow mapPartitions;
    * the ImageIO writer is re-entrant so partitions encode in parallel. */
  def encodePng(docs: DataFrame): Dataset[PngRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    asBinary(docs).select(col("doc_id"), col("payload")).as[Payload]
      .mapPartitions { it =>
        // codec init ONCE per partition (the pattern the whole operator
        // exists to demonstrate): ImageIO.write per row would run the
        // writer-registry lookup and stream setup per image — measured
        // ~2× the whole encode cost at 60k docs
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").next()
        val bos = new java.io.ByteArrayOutputStream()
        val rows = it.map { p =>
          val n = p.payload.length
          val h = math.max(1, (n + ImgWidth - 1) / ImgWidth)
          val img = new java.awt.image.BufferedImage(
            ImgWidth, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var i = 0
          while (i < n) {
            raster.setSample(i % ImgWidth, i / ImgWidth, 0, p.payload(i) & 0xff)
            i += 1
          }
          bos.reset()
          // close() releases the stream's internal cache promptly (the
          // ImageIO contract requires it) — leaking one per row holds
          // every image's cache until GC
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          try { writer.setOutput(ios); writer.write(img) } finally ios.close()
          PngRow(p.doc_id, n.toLong, bos.toByteArray, ImgWidth, h)
        }
        disposeOnExhaust(rows)(writer.dispose())
      }
  }

  /** DECODE + feature extraction — a REAL image decode (ImageIO PNG
    * reader), not a stub: lane j accumulates the decoded pixels at
    * row-major positions ≡ j (mod 8). Grayscale PNG is lossless, so
    * decoded samples equal the source bytes and the zero padding adds
    * nothing — the features keep their closed byte-arithmetic form
    * (exact integer lane sums, ONE terminal float division; at <2^23
    * per lane `round(f*255)` recovers the sum exactly), which is what
    * keeps m03 on a value-level DuckDB oracle THROUGH the codec. */
  def extractFeatures(docs: DataFrame): Dataset[Features] = {
    val spark = docs.sparkSession
    import spark.implicits._
    encodePng(docs).mapPartitions { it =>
      val decode = pngReader()
      disposeOnExhaust(it.map { r =>
        val img = decode(r.png)
        val raster = img.getRaster
        val acc = new Array[Long](8)
        var idx = 0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            acc(idx % 8) += raster.getSample(x, y, 0)
            idx += 1
            x += 1
          }
          y += 1
        }
        Features(r.doc_id, r.n_bytes, Array.tabulate(8)(j => acc(j).toFloat / 255.0f))
      })(decode.dispose())
    }
  }

  /** Per-partition PNG decoder: reader-registry lookup ONCE, decode
    * many (call inside mapPartitions — readers are not serializable).
    * Callers wrap their output in [[disposeOnExhaust]] to release the
    * codec's native state when the partition completes. */
  private def pngReader(): PngDecoder = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    new PngDecoder {
      def apply(bytes: Array[Byte]): java.awt.image.BufferedImage = {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try { reader.setInput(iis); reader.read(0) } finally iis.close()
      }
      def dispose(): Unit = reader.dispose()
    }
  }

  private trait PngDecoder extends (Array[Byte] => java.awt.image.BufferedImage) {
    def dispose(): Unit
  }

  /** Run `cleanup` exactly once when the wrapped iterator is drained —
    * the codec-disposal hook for per-partition ImageIO reader/writer
    * instances. Drain alone is not enough: an early-terminating consumer
    * (limit/take/first) never reaches the final hasNext, so disposal is
    * ALSO registered as a task-completion listener — the codec is
    * released however the task iterator ends. */
  private def disposeOnExhaust[T](it: Iterator[T])(cleanup: => Unit): Iterator[T] = {
    var done = false
    def runOnce(): Unit = if (!done) { done = true; cleanup }
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => runOnce()))
    new Iterator[T] {
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) runOnce()
        h
      }
      def next(): T = it.next()
    }
  }

  case class FrameRow(doc_id: Long, frame_idx: Long, px_sum: Long)

  /** Decoded frame sampling: every `stride`-th RASTER ROW of the
    * decoded image, with its pixel sum — the decode-side twin of the
    * m04 chunk-stride sampler (chunkBytes = ImgWidth makes chunk k and
    * raster row k the same byte span, so both are oracle-checkable
    * from the text). The decode runs once per image, emitting
    * height/stride rows — narrow, no shuffle. */
  def frameRowStats(docs: DataFrame, stride: Int = 4): Dataset[FrameRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    encodePng(docs).mapPartitions { it =>
      val decode = pngReader()
      disposeOnExhaust(it.flatMap { r =>
        val img = decode(r.png)
        val raster = img.getRaster
        (0 until img.getHeight by stride).iterator.map { y =>
          var s = 0L
          var x = 0
          while (x < img.getWidth) { s += raster.getSample(x, y, 0); x += 1 }
          FrameRow(r.doc_id, y.toLong, s)
        }
      })(decode.dispose())
    }
  }

  case class DsRow(doc_id: Long, row_idx: Long, ds_sum: Long)

  /** RESIZE through the real codec: decode the PNG, 2×2 box-filter
    * downsample (each output pixel = integer mean `div 4` of its source
    * box — the standard antialiased integer downscale), emit each
    * output row's pixel sum. Only FULL boxes are produced (outH =
    * h div 2), so images shorter than two raster rows emit nothing —
    * no edge-extrapolation ambiguity to mirror. The per-pixel `div`
    * happens BEFORE the row sum, so the oracle genuinely checks the
    * resize arithmetic, not a linear function that commutes past it.
    * Narrow mapPartitions, codec reused per partition, no shuffle. */
  def downsampleRowStats(docs: DataFrame): Dataset[DsRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    encodePng(docs).mapPartitions { it =>
      val decode = pngReader()
      disposeOnExhaust(it.flatMap { r =>
        val img = decode(r.png)
        val raster = img.getRaster
        val outH = img.getHeight / 2
        val outW = img.getWidth / 2
        (0 until outH).iterator.map { yy =>
          var s = 0L
          var xx = 0
          while (xx < outW) {
            s += (raster.getSample(2 * xx, 2 * yy, 0)
              + raster.getSample(2 * xx + 1, 2 * yy, 0)
              + raster.getSample(2 * xx, 2 * yy + 1, 0)
              + raster.getSample(2 * xx + 1, 2 * yy + 1, 0)) / 4
            xx += 1
          }
          DsRow(r.doc_id, yy.toLong, s)
        }
      })(decode.dispose())
    }
  }

  case class DHashRow(doc_id: Long, dhash: Long)

  /** dHash perceptual signature THROUGH the real codec — the standard
    * image near-dup primitive (difference hash): bit (r, c) of the
    * 64-bit signature is the horizontal gradient sign p(r,c) < p(r,c+1)
    * over an 8×9 top-left window of the decoded raster (out-of-raster
    * reads are 0, mirroring the encoder's zero padding). Gradient signs
    * survive brightness/contrast shifts, which is why dHash (not a
    * byte hash) is what image-dedup pipelines key on. Narrow
    * mapPartitions with per-partition codec reuse (the m07/m08
    * discipline); grayscale PNG is lossless, so the decoded samples
    * equal the payload bytes and the whole signature keeps a closed
    * byte-arithmetic form the oracle replays. */
  def dHashSignatures(docs: DataFrame): Dataset[DHashRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    encodePng(docs).mapPartitions { it =>
      val decode = pngReader()
      disposeOnExhaust(it.map { r =>
        val img = decode(r.png)
        val raster = img.getRaster
        val h = img.getHeight
        val w = img.getWidth
        def p(rr: Int, cc: Int): Int =
          if (rr < h && cc < w) raster.getSample(cc, rr, 0) else 0
        var sig = 0L
        var k = 0
        while (k < 64) {
          if (p(k / 8, k % 8) < p(k / 8, k % 8 + 1)) sig |= (1L << k)
          k += 1
        }
        DHashRow(r.doc_id, sig)
      })(decode.dispose())
    }
  }

  /** Image near-dup pairs over the dHash signatures — the d05 SimHash
    * banding shape verbatim (4 × 16-bit bands block the candidates, a
    * `bit_count(xor)` Hamming verify gates them), applied to the
    * multimodal column: perceptual-hash dedup is THE image-dedup
    * primitive for training corpora (CSAM/near-copy filtering, frame
    * dedup), and here it carries a FULL value oracle because the
    * signature's gradient bits replay as byte arithmetic. Scale shape:
    * candidates meet through the band equi-join (fan-out controlled by
    * band width), never an all-pairs product. */
  def dHashNearDupPairs(docs: DataFrame, maxDist: Int = 3): DataFrame =
    hammingBandPairs(dHashSignatures(docs).toDF(), "dhash", maxDist)

  /** The shared 64-bit-signature near-dup join (d05's shape): 4 × 16-bit
    * bands block the candidates, `bit_count(xor)` Hamming-verifies them
    * — serves both perceptual hashes (m12 image dHash, m13 audio
    * energy-delta). Candidates meet through the band equi-join, never
    * an all-pairs product. */
  private def hammingBandPairs(sig: DataFrame, sigCol: String,
                               maxDist: Int): DataFrame = {
    // materialize the narrow (doc_id, sig) relation once (r21): the
    // banding self-join below evaluates its input per side, and the
    // fingerprint subtree is a mapPartitions CODEC pass (PNG decode /
    // PCM scan) with no exchange underneath for ReuseExchange to share
    // — uncut, the whole corpus decodes twice
    val sigCut = graft.operators.eagerCut(sig)
    val banded = sigCut.select(col("doc_id"), col(sigCol).as("sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          expr(s"($sigCol >> ${b * 16}) & 65535").as("bk"))): _*)).as("bb"))
      .select(col("doc_id"), col("sig"),
        col("bb.band").as("band"), col("bb.bk").as("bk"))
    val a = banded.select(col("band"), col("bk"),
      col("doc_id").as("a_id"), col("sig").as("a_sig"))
    val b = banded.select(col("band"), col("bk"),
      col("doc_id").as("b_id"), col("sig").as("b_sig"))
    a.join(b, Seq("band", "bk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  case class AudioFp(doc_id: Long, afp: Long)

  /** Robust audio fingerprint (Haitsma–Kalker shape, time-normalized):
    * the payload divides into 65 EQUAL time slices (length
    * normalization — the move that makes the fingerprint robust to
    * playback-rate/clip-length differences, exactly why real audio
    * hashes window over the whole clip), each slice contributes its
    * DC-removed energy (the m09 arithmetic), and bit k of the 64-bit
    * fingerprint is the energy-DELTA sign e(k) < e(k+1) — the
    * sign-of-band-energy-difference construction of the classic robust
    * audio hash. Payloads shorter than one byte per slice are filtered
    * (no degenerate empty slices). All-integer byte arithmetic —
    * engine-exact, full oracle. Narrow map, no codec, no shuffle. */
  def audioFingerprints(docs: DataFrame, nSlices: Int = 65): Dataset[AudioFp] = {
    val spark = docs.sparkSession
    import spark.implicits._
    asBinary(docs).select(col("doc_id"), col("payload")).as[Payload]
      .filter(p => p.payload.length >= nSlices)
      .map { p =>
        val n = p.payload.length
        val e = new Array[Long](nSlices)
        var s = 0
        while (s < nSlices) {
          val start = s * n / nSlices
          val end = (s + 1) * n / nSlices
          var sum = 0L; var i = start
          while (i < end) { sum += (p.payload(i) & 0xff); i += 1 }
          val mu = sum / (end - start)
          var en = 0L; i = start
          while (i < end) { val v = (p.payload(i) & 0xff) - mu; en += v * v; i += 1 }
          e(s) = en
          s += 1
        }
        var sig = 0L; var k = 0
        while (k < nSlices - 1) { if (e(k) < e(k + 1)) sig |= (1L << k); k += 1 }
        AudioFp(p.doc_id, sig)
      }
  }

  /** Audio near-dup pairs over the energy-delta fingerprints — the m12
    * banding join applied to the audio column: with m12 this covers
    * perceptual dedup for BOTH non-text modalities the corpus carries. */
  def audioNearDupPairs(docs: DataFrame, maxDist: Int = 6): DataFrame =
    hammingBandPairs(audioFingerprints(docs).toDF(), "afp", maxDist)

  /** CORPUS-LEVEL cross-modality duplicate report — the closing query
    * of a multimodal curation pipeline: the per-modality near-dup
    * detectors (text Jaccard d03, image dHash m12, audio
    * fingerprint m13) contribute tagged edge sets over ONE doc-id
    * space, their union closes transitively (a doc image-similar to
    * one neighbor and audio-similar to another joins all three in one
    * cluster — exactly the cross-signal containment a per-modality
    * report misses), and each cluster reports its size, the SORTED
    * set of modalities that evidenced it, and the d20 quality-rule
    * representative ((quality desc, doc_id asc) struct-max — keep the
    * best member, not the arbitrary min-id).
    *
    * Scale shape: nothing new — three banded/blocked pair generators
    * (each already candidate-bounded), the O(log n)-style min-label
    * components over their UNION (edge count = sum of the three pair
    * sets, not a product), one shuffle each for the modality rollup
    * and the representative argmax. The report is clusters-sized
    * (≪ corpus). */
  def crossModalDupReport(docs: DataFrame): DataFrame = {
    // eagerCut: the tagged pair set feeds BOTH the component closure
    // and the modality rollup — without the barrier each branch would
    // re-run all three pair generators (the dHash branch re-decodes
    // the whole corpus through the codec). Pairs-sized (≪ corpus),
    // blocks reclaimed when the result is dereferenced.
    val tagged = eagerCut(Dedup.jaccardPairs(docs)
      .select(col("a_id"), col("b_id")).withColumn("modality", lit("text"))
      .unionByName(dHashNearDupPairs(docs)
        .select(col("a_id"), col("b_id")).withColumn("modality", lit("image")))
      .unionByName(audioNearDupPairs(docs)
        .select(col("a_id"), col("b_id")).withColumn("modality", lit("audio"))))
    val clusters = Dedup.duplicateClusters(
      tagged.select(col("a_id"), col("b_id")).distinct())
    val modal = tagged
      .join(clusters.withColumnRenamed("doc_id", "a_id"), Seq("a_id"))
      .groupBy(col("cluster_id"))
      .agg(array_join(sort_array(collect_set(col("modality"))), ",")
        .as("modalities"))
    clusters
      .join(TextAnalysis.qualityScore(docs)
        .select(col("doc_id"), col("quality")), Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("quality"), (-col("doc_id")).as("nid"))).as("m"))
      // the modality rollup is clusters-sized — broadcast it onto the
      // representative aggregate rather than shuffling both tiny sides
      .join(broadcast(modal), Seq("cluster_id"))
      .select(col("cluster_id"), col("n_members"), col("modalities"),
        (-col("m.nid")).as("rep_id"), col("m.quality").as("rep_quality"))
  }

  case class PatchRow(doc_id: Long, py: Long, px: Long, px_sum: Long,
                      px_min: Long, px_max: Long)

  /** ViT-style patch grid through the real codec: decode the PNG and
    * split the raster into non-overlapping `patch`×`patch` tiles — the
    * tokenization step a vision transformer runs before embedding (an
    * image becomes a sequence of patch tokens). Per patch: pixel sum,
    * min, max (the stats a patch-normalization layer consumes). Only
    * FULL patch rows are produced (grid height = h div patch — the m08
    * no-partial-box policy), so the one ambiguous edge case is out by
    * construction; zero padding INSIDE a full bottom block (n not a
    * multiple of the raster width) is real pixel data the oracle
    * reproduces from the byte layout. Narrow mapPartitions, codec
    * reused + disposed per partition, no shuffle — at 100 TB this is
    * the classic embarrassing-parallel preprocessing stage. */
  def vitPatchStats(docs: DataFrame, patch: Int = 8): Dataset[PatchRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    encodePng(docs).mapPartitions { it =>
      val decode = pngReader()
      disposeOnExhaust(it.flatMap { r =>
        val img = decode(r.png)
        val raster = img.getRaster
        val gridH = img.getHeight / patch
        val gridW = img.getWidth / patch
        for {
          py <- (0 until gridH).iterator
          px <- (0 until gridW).iterator
        } yield {
          var s = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
          var y = py * patch
          while (y < (py + 1) * patch) {
            var x = px * patch
            while (x < (px + 1) * patch) {
              val v = raster.getSample(x, y, 0).toLong
              s += v; if (v < mn) mn = v; if (v > mx) mx = v
              x += 1
            }
            y += 1
          }
          PatchRow(r.doc_id, py.toLong, px.toLong, s, mn, mx)
        }
      })(decode.dispose())
    }
  }

  case class AudioFrame(doc_id: Long, frame_idx: Long, energy: Long,
                        zero_crossings: Long)

  /** Audio-feature extraction over raw 8-bit PCM payloads (PCM is
    * codec-free, so unlike image decode this path needs no stub at
    * all): per fixed-size frame, DC-offset removal (integer floor mean
    * — the standard pre-step; without it a unipolar signal never
    * crosses zero) then signal energy Σ(v−μ)² and zero-crossing count
    * (sign changes of the centered signal — the classic cheap
    * voiced/unvoiced + pitch-proxy features). All-integer arithmetic on
    * the byte samples, so every value is engine-exact. Narrow map over
    * the payload column, no codec state, no shuffle. */
  def audioFrameStats(docs: DataFrame, frame: Int = 64): Dataset[AudioFrame] = {
    val spark = docs.sparkSession
    import spark.implicits._
    asBinary(docs).select(col("doc_id"), col("payload")).as[Payload]
      .flatMap { p =>
        val n = p.payload.length
        val nf = (n + frame - 1) / frame
        (0 until nf).iterator.map { f =>
          val start = f * frame
          val end = math.min(n, start + frame)
          var sum = 0L
          var i = start
          while (i < end) { sum += (p.payload(i) & 0xff); i += 1 }
          val mu = sum / (end - start)
          var e = 0L
          var zc = 0L
          i = start
          while (i < end) {
            val v = (p.payload(i) & 0xff) - mu
            e += v * v
            if (i + 1 < end) {
              val w = (p.payload(i + 1) & 0xff) - mu
              if (v * w < 0) zc += 1
            }
            i += 1
          }
          AudioFrame(p.doc_id, f.toLong, e, zc)
        }
      }
  }

  case class ShotBoundary(doc_id: Long, frame_idx: Long, diff_sum: Long,
                          is_boundary: Boolean)

  /** Shot-boundary detection over the frame stream: consecutive FULL
    * 64-byte frames (the m04 frame convention — a video decoder would
    * hand the same shape) compared by summed absolute sample
    * difference; a boundary fires when the mean per-sample change
    * exceeds `threshold` — the classic pixel-difference cut detector,
    * the first pass of any video-curation pipeline (dedup shots, sample
    * one keyframe per shot). All-integer, codec-free on this byte
    * layout; narrow map, no shuffle, no state — at 100 TB the frame
    * pairs of one payload never leave their task. */
  def shotBoundaries(docs: DataFrame, frame: Int = 64,
                     threshold: Int = 32): Dataset[ShotBoundary] = {
    val spark = docs.sparkSession
    import spark.implicits._
    asBinary(docs).select(col("doc_id"), col("payload")).as[Payload]
      .flatMap { p =>
        val nFull = p.payload.length / frame
        (0 until nFull - 1).iterator.map { f =>
          var diff = 0L
          var i = 0
          while (i < frame) {
            diff += math.abs((p.payload(f * frame + i) & 0xff)
              - (p.payload((f + 1) * frame + i) & 0xff))
            i += 1
          }
          ShotBoundary(p.doc_id, f.toLong, diff, diff > threshold.toLong * frame)
        }
      }
  }

  case class Embedding(doc_id: Long, e0: Long, e1: Long, e2: Long, e3: Long)

  /** Batched "model inference" over binary payloads: `grouped(batchSize)`
    * is the batch shape — a real embedding model would run ONCE per batch
    * here (amortizing per-call overhead), exactly how `mapInPandas`
    * batches arrow record-batches. The stub embedding is a deterministic
    * closed form of (byte_len, doc_id) so even the inference path is
    * oracle-checkable; per-doc output never depends on batch membership
    * (which partitioning would make nondeterministic). */
  def batchedEmbed(docs: DataFrame, batchSize: Int = 64): Dataset[Embedding] = {
    val spark = docs.sparkSession
    import spark.implicits._
    asBinary(docs).select(col("doc_id"), col("payload")).as[Payload]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // model.call(batch) would go here, once per group
          batch.iterator.map { p =>
            val n = p.payload.length.toLong
            def e(k: Long) = (n * (k + 1) + p.doc_id * 31) % 9973
            Embedding(p.doc_id, e(0), e(1), e(2), e(3))
          }
        }
      }
  }

  /** TRAINING-SAMPLE ASSEMBLY — the last step of a multimodal pipeline:
    * one nested record per document joining every modality (binary
    * payload + typed metadata, the chunk index as an ordered
    * array-of-structs, the embedding vector, the language tag). All
    * joins are 1:1 or 1:N on doc_id, so at 100 TB the three inputs
    * bucket on doc_id and assembly is exchange-free; the nested output
    * is exactly the row-group layout a training dataloader reads
    * (sample-contiguous, no reassembly joins at read time). */
  def trainingSamples(docs: DataFrame, emb: DataFrame): DataFrame = {
    val chunks = chunkIndex(docs)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("chunk_idx"), col("chunk_bytes")))).as("chunks"))
    asBinary(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .join(chunks, Seq("doc_id"), "left")
      .join(emb.select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("payload"), col("meta"),
        coalesce(col("chunks"), expr("array()")).as("chunks"), col("embedding"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // nested assembly verified through a flat projection (the nested
    // schema itself is pinned by MultimodalSpec-style field access here)
    "m06_training_samples" -> ((s, d) =>
      trainingSamples(t(s, d, "documents"), t(s, d, "embeddings"))
        .select(col("doc_id"), col("lang"),
          col("meta.byte_len").as("byte_len"),
          col("meta.content_md5").as("content_md5"),
          size(col("chunks")).cast("long").as("n_chunks"),
          size(col("embedding")).cast("long").as("emb_dim"))
        .orderBy(col("doc_id"))),
    "m05_batched_embed" -> ((s, d) =>
      batchedEmbed(t(s, d, "documents")).toDF().orderBy(col("doc_id"))),
    "m01_binary_meta" -> ((s, d) =>
      asBinary(t(s, d, "documents"))
        .select(col("doc_id"), col("meta.byte_len").as("byte_len"),
          col("meta.content_md5").as("content_md5"), col("meta.mime").as("mime"))
        .orderBy(col("doc_id"))),
    "m02_chunk_index" -> ((s, d) =>
      chunkIndex(t(s, d, "documents")).orderBy(col("doc_id"), col("chunk_idx"))),
    // all 8 float lanes roundtripped to their exact integer lane sums —
    // the values travel bytes → PNG encode → ImageIO decode → lane
    // accumulate, and still hash-compare against a pure byte-arithmetic
    // oracle (lossless grayscale raster; see extractFeatures)
    "m03_feature_stub" -> ((s, d) =>
      extractFeatures(t(s, d, "documents")).toDF()
        .select(col("doc_id") +: col("n_bytes") +:
          (0 until 8).map(j => expr(
            s"cast(round(cast(element_at(features, ${j + 1}) as double) * 255.0) as bigint)")
            .as(s"l$j")): _*)
        .orderBy(col("doc_id"))),
    // decoded-frame sampling: every 4th raster row of the real decoded
    // PNG with its pixel sum; row k spans source bytes [32k, 32k+32), so
    // the oracle is plain text arithmetic
    "m07_frame_pixel_stats" -> ((s, d) =>
      frameRowStats(t(s, d, "documents")).toDF()
        .orderBy(col("doc_id"), col("frame_idx"))),
    // frame sampling: keep every 4th chunk — the stride pattern a video
    // frame-sampler applies before decode (narrow, pushdown-friendly)
    "m04_frame_sample" -> ((s, d) =>
      chunkIndex(t(s, d, "documents"))
        .filter(col("chunk_idx") % 4 === 0)
        .orderBy(col("doc_id"), col("chunk_idx"))),
    // 2×2 box downsample THROUGH the codec (encode → decode → resize):
    // per-pixel integer div before the row sum, so the resize arithmetic
    // itself is what the oracle hashes
    "m08_box_downsample" -> ((s, d) =>
      downsampleRowStats(t(s, d, "documents")).toDF()
        .orderBy(col("doc_id"), col("row_idx"))),
    // raw-PCM audio frames: DC-removed energy + zero crossings
    "m09_audio_frames" -> ((s, d) =>
      audioFrameStats(t(s, d, "documents")).toDF()
        .orderBy(col("doc_id"), col("frame_idx"))),
    // ViT patch tokenization through the decode path: 8×8 tiles of the
    // decoded raster with per-patch sum/min/max
    "m10_vit_patches" -> ((s, d) =>
      vitPatchStats(t(s, d, "documents")).toDF()
        .orderBy(col("doc_id"), col("py"), col("px"))),
    // consecutive-frame pixel-difference cut detector over the frame
    // stream — the first pass of a video-curation pipeline
    "m11_shot_boundaries" -> ((s, d) =>
      shotBoundaries(t(s, d, "documents")).toDF()
        .orderBy(col("doc_id"), col("frame_idx"))),
    // image near-dups: dHash through the real codec, d05's banding
    // shape for the pair join — full value oracle (gradient bits
    // replay as byte arithmetic; PNG is lossless)
    "m12_image_neardups" -> ((s, d) =>
      dHashNearDupPairs(t(s, d, "documents"))
        .orderBy(col("a_id"), col("b_id"))),
    // audio near-dups: time-normalized energy-delta fingerprint, same
    // banding join — full value oracle (all-integer byte arithmetic)
    "m13_audio_neardups" -> ((s, d) =>
      audioNearDupPairs(t(s, d, "documents"))
        .orderBy(col("a_id"), col("b_id"))),
    // the corpus-level closing query: all three modality dup signals
    // fused into one transitive cluster report with quality-rule
    // representatives — full value oracle composed from the d02/m12/
    // m13/d07/d20 replays
    "m14_crossmodal_dup_report" -> ((s, d) =>
      crossModalDupReport(t(s, d, "documents"))
        .orderBy(col("cluster_id")))
  )

  /** The m12 oracle: the 8×9 window's pixels recomputed from the byte
    * layout (row-major at the encoder's width — PNG is lossless, so
    * decoded samples ≡ source bytes, zero beyond length), the 64
    * gradient bits as integer CASE terms (bit 63's literal is the
    * two's-complement Long.MinValue, the d18 precedent), then d18's
    * banding join + `bit_count(xor)` Hamming verify. BYTE-exact by
    * construction (r13): pixels index the hex dump of the UTF-8
    * payload (`hex(encode(text))`, byte b ↦ hex chars 2b+1..2b+2), the
    * same bytes the kernel's encoder consumed — so a non-ASCII
    * document would replay identically instead of diverging through
    * character positions. */
  /** The m12 replay as a CTE LIST (names prefixed `i`), so the same
    * definition serves the m12 oracle and composes — beside the audio
    * CTEs — into m14's corpus-level report. Ends at `icand`
    * (a_id, b_id, hamming), unfiltered; the use site applies its
    * distance bound. */
  private def dHashCtes: String = {
    val bits = (0 until 64).map { k =>
      val r = k / 8; val c = k % 8
      s"(CASE WHEN q[${r * 9 + c + 1}] < q[${r * 9 + c + 2}] THEN CAST(${1L << k} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("\n             + ")
    s"""ihx AS (
           SELECT doc_id, hex(encode(text)) AS h,
             CAST(octet_length(encode(text)) AS BIGINT) AS n
           FROM documents),
         ipx AS (
           SELECT doc_id, list_transform(range(0, 72),
             k -> CASE WHEN (k // 9) * $ImgWidth + (k % 9) < n
                  THEN CAST(('0x' || substring(h,
                    CAST(2 * ((k // 9) * $ImgWidth + (k % 9)) + 1 AS INTEGER),
                    2)) AS INTEGER)
                  ELSE 0 END) AS q
           FROM ihx),
         isig AS MATERIALIZED (
           SELECT doc_id,
             $bits AS dhash
           FROM ipx),
         ibanded AS (
           SELECT doc_id, dhash, b AS band, (dhash >> (b * 16)) & 65535 AS bk
           FROM isig, (SELECT unnest(range(0, 4)) AS b)),
         icand AS (
           SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
           FROM ibanded a JOIN ibanded b
             ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)"""
  }

  private def dHashOracleSql(maxDist: Int = 3): String =
    s"""WITH $dHashCtes
         SELECT a_id, b_id, hamming FROM icand WHERE hamming <= $maxDist
         ORDER BY a_id, b_id"""

  /** The m13 oracle: 65 equal byte slices (1-based spans
    * `(s·n)//65+1 .. ((s+1)·n)//65`), per-slice DC-removed energy (the
    * m09 arithmetic), the 64 delta-sign bits, then the shared
    * banding/Hamming join. BYTE-exact by construction (r13, the m12
    * fix): slice values index the hex dump of the UTF-8 payload —
    * count, spans, and values all over the same bytes the kernel
    * reads, never character positions. */
  /** The m13 replay as a CTE LIST (names prefixed `a`) — the m12
    * convention, for the same composition into m14. Ends at `acand`
    * (a_id, b_id, hamming), unfiltered. */
  private def audioFpCtes: String = {
    val bits = (0 until 64).map { k =>
      s"(CASE WHEN es[${k + 1}] < es[${k + 2}] THEN CAST(${1L << k} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("\n             + ")
    s"""ac AS (
           SELECT doc_id, hex(encode(text)) AS h,
             CAST(octet_length(encode(text)) AS BIGINT) AS n
           FROM documents WHERE octet_length(encode(text)) >= 65),
         asl AS (
           SELECT doc_id, s,
             list_transform(range((s * n) // 65 + 1, ((s + 1) * n) // 65 + 1),
               i -> CAST(('0x' || substring(h, CAST(2 * i - 1 AS INTEGER), 2))
                 AS INTEGER)) AS v
           FROM ac, (SELECT unnest(range(0, 65)) AS s)),
         am AS (SELECT doc_id, s, v,
             CAST(list_sum(v) AS BIGINT) // len(v) AS mu FROM asl),
         ae AS (SELECT doc_id, s,
             CAST(list_sum(list_transform(v, x -> (x - mu) * (x - mu)))
               AS BIGINT) AS energy
           FROM am),
         ael AS (SELECT doc_id, list(energy ORDER BY s) AS es FROM ae GROUP BY doc_id),
         asig AS MATERIALIZED (
           SELECT doc_id,
             $bits AS afp
           FROM ael),
         abanded AS (
           SELECT doc_id, afp, b AS band, (afp >> (b * 16)) & 65535 AS bk
           FROM asig, (SELECT unnest(range(0, 4)) AS b)),
         acand AS (
           SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS hamming
           FROM abanded a JOIN abanded b
             ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)"""
  }

  private def audioFpOracleSql(maxDist: Int = 6): String =
    s"""WITH $audioFpCtes
         SELECT a_id, b_id, hamming FROM acand WHERE hamming <= $maxDist
         ORDER BY a_id, b_id"""

  /** The m14 oracle: the three modality pair replays (text Jaccard —
    * the d03/d07 oracle; image `icand` ≤ 3; audio `acand` ≤ 6)
    * tagged and unioned, the d07 recursive-reach closure over their
    * union, the d20 quality rule for the representative, and the
    * per-cluster sorted-distinct modality list. Every fragment is an
    * already-green oracle's text — the composition is the only new
    * claim. */
  private def crossModalOracleSql: String =
    s"""WITH RECURSIVE $dHashCtes,
         $audioFpCtes,
         tagged AS (
           SELECT a_id, b_id, 'text' AS modality
           FROM (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   list_distinct(string_split(a.text, ' ')) AS a_ws,
                   list_distinct(string_split(b.text, ' ')) AS b_ws
                 FROM documents a JOIN documents b
                 ON substring(a.text, 1, 20) = substring(b.text, 1, 20)
                   AND a.doc_id < b.doc_id)
           WHERE CAST(len(list_intersect(a_ws, b_ws)) AS DOUBLE)
             / (len(a_ws) + len(b_ws) - len(list_intersect(a_ws, b_ws))) >= 0.5
           UNION ALL
           SELECT a_id, b_id, 'image' FROM icand WHERE hamming <= 3
           UNION ALL
           SELECT a_id, b_id, 'audio' FROM acand WHERE hamming <= 6),
         edges AS (
           SELECT a_id AS u, b_id AS v FROM tagged
           UNION SELECT b_id, a_id FROM tagged),
         reach(u, v) AS (
           SELECT u, u FROM edges
           UNION
           SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
         clusters AS (
           SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
         q AS (
           SELECT doc_id,
             (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws))
               * (1.0 - CAST(len(list_filter(ws, w -> w IN ('the', 'a'))) AS DOUBLE)
                   / len(ws)) AS quality
           FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
         modal AS (
           SELECT c.cluster_id,
             array_to_string(list_sort(list(DISTINCT t.modality)), ',') AS modalities
           FROM tagged t JOIN clusters c ON c.doc_id = t.a_id
           GROUP BY c.cluster_id),
         ranked AS (
           SELECT c.cluster_id, c.doc_id, q.quality,
             row_number() OVER (PARTITION BY c.cluster_id
               ORDER BY q.quality DESC, c.doc_id) AS rk,
             count(*) OVER (PARTITION BY c.cluster_id) AS n_members
           FROM clusters c JOIN q USING (doc_id))
         SELECT r.cluster_id, CAST(r.n_members AS BIGINT) AS n_members,
           m.modalities, r.doc_id AS rep_id, r.quality AS rep_quality
         FROM ranked r JOIN modal m USING (cluster_id)
         WHERE r.rk = 1 ORDER BY cluster_id"""

  def oracleSql: Map[String, String] = Map(
    "m12_image_neardups" -> dHashOracleSql(),
    "m13_audio_neardups" -> audioFpOracleSql(),
    "m14_crossmodal_dup_report" -> crossModalOracleSql,
    "m06_training_samples" ->
      """SELECT d.doc_id, d.lang,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS byte_len,
           md5(d.text) AS content_md5,
           CAST(ceil(octet_length(encode(d.text)) / 64.0) AS BIGINT) AS n_chunks,
           CAST(len(e.embedding) AS BIGINT) AS emb_dim
         FROM documents d LEFT JOIN embeddings e ON e.vec_id = d.doc_id
         ORDER BY d.doc_id""",
    "m05_batched_embed" ->
      """SELECT doc_id,
           (CAST(octet_length(encode(text)) AS BIGINT) * 1 + doc_id * 31) % 9973 AS e0,
           (CAST(octet_length(encode(text)) AS BIGINT) * 2 + doc_id * 31) % 9973 AS e1,
           (CAST(octet_length(encode(text)) AS BIGINT) * 3 + doc_id * 31) % 9973 AS e2,
           (CAST(octet_length(encode(text)) AS BIGINT) * 4 + doc_id * 31) % 9973 AS e3
         FROM documents ORDER BY doc_id""",
    "m01_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         md5(text) AS content_md5, 'text/plain' AS mime
         FROM documents ORDER BY doc_id""",
    "m02_chunk_index" ->
      """WITH c AS (
           SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n,
             unnest(range(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT))) AS i
           FROM documents)
         SELECT doc_id, i AS chunk_idx, least(64, n - i * 64) AS chunk_bytes
         FROM c ORDER BY doc_id, chunk_idx""",
    // lane j = bytes at 0-based positions ≡ j (mod 8); docs are ASCII so
    // ord(char) == byte value (equality with octet_length checked above)
    "m03_feature_stub" ->
      ("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         """ + (0 until 8).map { j =>
        s"COALESCE(CAST(list_sum(list_transform(range(${j + 1}, length(text) + 1, 8), i -> ord(text[i]))) AS BIGINT), 0) AS l$j"
      }.mkString(",\n         ") +
        "\n         FROM documents ORDER BY doc_id"),
    "m04_frame_sample" ->
      """WITH c AS (
           SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n,
             unnest(range(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT))) AS i
           FROM documents)
         SELECT doc_id, i AS chunk_idx, least(64, n - i * 64) AS chunk_bytes
         FROM c WHERE i % 4 = 0 ORDER BY doc_id, chunk_idx""",
    // raster row r of the encoded image holds bytes [32r, 32r+32) (1-based
    // text positions 32r+1 .. min(n, 32r+32)); empty docs still encode a
    // single all-zero row
    // output pixel (yy, xx) averages 1-based text positions
    // {64yy+2xx+1, +2, +33, +34} (rows 2yy and 2yy+1 of the width-32
    // raster); positions past n read the zero tail padding; only full
    // 2×2 boxes exist (yy < h div 2), so sub-64-byte docs emit nothing
    "m08_box_downsample" -> {
      def px(off: Int) =
        s"(CASE WHEN 64 * yy + 2 * xx + $off <= n THEN ord(text[64 * yy + 2 * xx + $off]) ELSE 0 END)"
      s"""WITH c AS (
           SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n, text,
             unnest(range(0, greatest(1, CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT)) // 2)) AS yy
           FROM documents)
         SELECT doc_id, yy AS row_idx,
           CAST(list_sum(list_transform(range(0, 16), xx ->
             (${px(1)} + ${px(2)} + ${px(33)} + ${px(34)}) // 4)) AS BIGINT) AS ds_sum
         FROM c ORDER BY doc_id, row_idx"""
    },
    // frame f spans 1-based positions f*64+1 .. min(n, f*64+64); μ is
    // the integer floor mean (sums are non-negative, so // ≡ div);
    // single-sample frames have no pairs → zero crossings 0
    "m09_audio_frames" ->
      """WITH c AS (
           SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n, text,
             unnest(range(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT))) AS f
           FROM documents),
         fr AS (
           SELECT doc_id, f,
             list_transform(range(f * 64 + 1, least(n, f * 64 + 64) + 1),
               i -> ord(text[i])) AS v
           FROM c),
         m AS (
           SELECT doc_id, f, v,
             CAST(list_sum(v) AS BIGINT) // len(v) AS mu
           FROM fr)
         SELECT doc_id, f AS frame_idx,
           CAST(list_sum(list_transform(v, x -> (x - mu) * (x - mu))) AS BIGINT) AS energy,
           CAST(COALESCE(list_sum(list_transform(range(1, len(v)),
             i -> CASE WHEN (v[i] - mu) * (v[i + 1] - mu) < 0 THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zero_crossings
         FROM m ORDER BY doc_id, frame_idx""",
    // frame f vs f+1, both full (pairs = n//64 − 1); 1-based text
    // positions f*64+i / (f+1)*64+i for i in 1..64; boundary when the
    // summed absolute difference exceeds 32 per sample (2048 per frame)
    "m11_shot_boundaries" ->
      """WITH c AS (
           SELECT doc_id, text,
             unnest(range(0, greatest(
               octet_length(encode(text)) // 64 - 1, 0))) AS f
           FROM documents),
         d AS (
           SELECT doc_id, f,
             CAST(list_sum(list_transform(range(1, 65),
               i -> abs(ord(text[CAST(f * 64 + i AS BIGINT)])
                      - ord(text[CAST((f + 1) * 64 + i AS BIGINT)]))))
               AS BIGINT) AS diff_sum
           FROM c)
         SELECT doc_id, f AS frame_idx, diff_sum, diff_sum > 2048 AS is_boundary
         FROM d ORDER BY doc_id, frame_idx""",
    // patch (py, px) covers raster positions (py*8+j//8, px*8+j%8) for
    // j in 0..63; position p holds byte p of the text when p < n, else
    // the encoder's zero padding — decoded pixels ≡ this byte layout
    // because grayscale PNG is lossless
    "m10_vit_patches" ->
      """WITH c AS (
           SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n, text,
             unnest(range(0, greatest(1, CAST(ceil(octet_length(encode(text)) / 32.0)
               AS BIGINT)) // 8)) AS py
           FROM documents),
         p AS (
           SELECT doc_id, n, text, py, unnest(range(0, 4)) AS px FROM c),
         v AS (
           SELECT doc_id, py, px,
             list_transform(range(0, 64), j ->
               CASE WHEN (py * 8 + j // 8) * 32 + px * 8 + j % 8 < n
                 THEN ord(text[CAST((py * 8 + j // 8) * 32 + px * 8 + j % 8 + 1 AS BIGINT)])
                 ELSE 0 END) AS vals
           FROM p)
         SELECT doc_id, py, px,
           CAST(list_sum(vals) AS BIGINT) AS px_sum,
           CAST(list_min(vals) AS BIGINT) AS px_min,
           CAST(list_max(vals) AS BIGINT) AS px_max
         FROM v ORDER BY doc_id, py, px""",
    "m07_frame_pixel_stats" ->
      """WITH c AS (
           SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n, text,
             unnest(range(0, greatest(1, CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT)))) AS r
           FROM documents)
         SELECT doc_id, r AS frame_idx,
           COALESCE(CAST(list_sum(list_transform(
             range(r * 32 + 1, least(n, r * 32 + 32) + 1), i -> ord(text[i])))
             AS BIGINT), 0) AS px_sum
         FROM c WHERE r % 4 = 0 ORDER BY doc_id, frame_idx"""
  )
}
