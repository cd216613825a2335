package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The REAL image codec path (r7): bytes → grayscale PNG via the JDK's
  * ImageIO → decode → pixel stats. The spec pins the property the m03/
  * m07 oracles rest on — the raster roundtrip is LOSSLESS, so decoded
  * pixel arithmetic equals source-byte arithmetic.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  // exercises: empty payload, single byte, exact row, row+1, a 4-row
  // payload, and a multi-row ASCII doc. Values stay ≤ 0x7f because the
  // table path is text → UTF-8 bytes (the fixture's documents are
  // ASCII, where char == byte — the same identity the m03 oracle uses);
  // the full signed-byte range is covered by the direct codec test.
  private val samples = Seq(
    0L -> Array.emptyByteArray,
    1L -> Array[Byte](7),
    2L -> Array.tabulate[Byte](32)(i => i.toByte),
    3L -> Array.tabulate[Byte](33)(i => ((i * 3) % 128).toByte),
    4L -> Array.tabulate[Byte](128)(i => i.toByte),
    5L -> "the quick brown fox jumps over the lazy dog".getBytes("UTF-8"),
    // ≥ 256 bytes: tall enough (h ≥ 8) to produce a full 8×8 patch row,
    // with a padded tail INSIDE the bottom block (300 = 9 rows + 12) —
    // the m10 edge the grid stats must reproduce
    6L -> Array.tabulate[Byte](300)(i => ((i * 7) % 128).toByte))

  private def docsDF = samples
    .map { case (id, b) => (id, new String(b.map(x => (x & 0xff).toChar))) }
    .toDF("doc_id", "text")

  test("grayscale PNG raster roundtrips ALL 256 sample values (pure codec, no Spark)") {
    val img = new java.awt.image.BufferedImage(
      32, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    (0 until 256).foreach(i => r.setSample(i % 32, i / 32, 0, i))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    (0 until 256).foreach { i =>
      assert(back.getRaster.getSample(i % 32, i / 32, 0) == i,
        s"sample value $i did not survive the PNG roundtrip")
    }
  }

  test("PNG encode→decode roundtrip is lossless (every byte, every sample)") {
    // direct codec check, no Spark: the property every oracle rests on
    for ((id, bytes) <- samples) {
      val df = Seq((id, new String(bytes.map(x => (x & 0xff).toChar)))).toDF("doc_id", "text")
      val row = Multimodal.encodePng(df).collect().head
      assert(row.n_bytes == bytes.length)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.png))
      assert(img.getWidth == 32 && img.getHeight == math.max(1, (bytes.length + 31) / 32))
      val raster = img.getRaster
      var i = 0
      while (i < bytes.length) {
        assert(raster.getSample(i % 32, i / 32, 0) == (bytes(i) & 0xff),
          s"doc $id: pixel $i diverged from source byte")
        i += 1
      }
      // zero padding beyond the payload
      (bytes.length until img.getWidth * img.getHeight).foreach { j =>
        assert(raster.getSample(j % 32, j / 32, 0) == 0, s"doc $id: pad pixel $j non-zero")
      }
    }
  }

  test("vit patches: 8×8 tile stats == direct byte arithmetic, full blocks only") {
    val got = Multimodal.vitPatchStats(docsDF).collect().groupBy(_.doc_id)
    for ((id, bytes) <- samples) {
      val h = math.max(1, (bytes.length + 31) / 32)
      val gridH = h / 8
      val rows = got.getOrElse(id, Array.empty)
      // full patch rows only: docs shorter than 8 raster rows emit none
      assert(rows.length == gridH * 4,
        s"doc $id: ${rows.length} patches, expected ${gridH * 4}")
      rows.foreach { pr =>
        val vals = (0 until 64).map { j =>
          val pos = (pr.py.toInt * 8 + j / 8) * 32 + pr.px.toInt * 8 + j % 8
          if (pos < bytes.length) bytes(pos) & 0xff else 0
        }
        assert(pr.px_sum == vals.map(_.toLong).sum, s"doc $id patch (${pr.py},${pr.px}) sum")
        assert(pr.px_min == vals.min.toLong && pr.px_max == vals.max.toLong,
          s"doc $id patch (${pr.py},${pr.px}) min/max")
      }
    }
  }

  test("shot boundaries: hand-built cut fires, steady frames don't, partial tail ignored") {
    // 3 full frames + a 10-byte tail: flat 0s → flat 64s → flat 64s.
    // cut at 0→1 (diff 64·64 = 4096 > 2048), none at 1→2; the tail
    // forms no full frame pair, so exactly 2 comparisons emit.
    val bytes = Array.fill[Byte](64)(0) ++ Array.fill[Byte](64)(64) ++
      Array.fill[Byte](64)(64) ++ Array.fill[Byte](10)(7)
    val df = Seq((1L, new String(bytes.map(x => (x & 0xff).toChar))))
      .toDF("doc_id", "text")
    val got = Multimodal.shotBoundaries(df).collect().sortBy(_.frame_idx)
    assert(got.length == 2, s"expected 2 frame pairs, got ${got.length}")
    assert(got(0).diff_sum == 64L * 64 && got(0).is_boundary,
      s"cut not detected: ${got(0)}")
    assert(got(1).diff_sum == 0L && !got(1).is_boundary,
      s"false boundary: ${got(1)}")
  }

  test("decoded lane sums == direct byte arithmetic (the m03 contract)") {
    val got = Multimodal.extractFeatures(docsDF).collect()
      .map(f => f.doc_id -> f).toMap
    for ((id, bytes) <- samples) {
      val expect = new Array[Long](8)
      bytes.zipWithIndex.foreach { case (b, i) => expect(i % 8) += (b & 0xff) }
      val f = got(id)
      assert(f.n_bytes == bytes.length.toLong)
      (0 until 8).foreach { j =>
        assert(math.round(f.features(j) * 255.0f).toLong == expect(j),
          s"doc $id lane $j: decoded sum diverged")
      }
    }
  }

  test("box downsample == per-pixel integer box means of source bytes (m08)") {
    val got = Multimodal.downsampleRowStats(docsDF).collect()
      .groupBy(_.doc_id).view.mapValues(_.map(r => r.row_idx -> r.ds_sum).toMap).toMap
    for ((id, bytes) <- samples) {
      val h = math.max(1, (bytes.length + 31) / 32)
      def px(i: Int): Long = if (i < bytes.length) (bytes(i) & 0xff).toLong else 0L
      val expect = (0 until h / 2).map { yy =>
        yy.toLong -> (0 until 16).map { xx =>
          (px(64 * yy + 2 * xx) + px(64 * yy + 2 * xx + 1)
            + px(64 * yy + 2 * xx + 32) + px(64 * yy + 2 * xx + 33)) / 4
        }.sum
      }.toMap
      assert(got.getOrElse(id, Map.empty) == expect, s"doc $id downsample diverged")
    }
    // sub-64-byte docs emit no rows (no full 2x2 box exists)
    assert(!got.contains(0L) && !got.contains(1L) && !got.contains(2L))
  }

  test("audio frames: DC-removed energy and zero crossings, exact integers (m09)") {
    val got = Multimodal.audioFrameStats(docsDF).collect()
      .groupBy(_.doc_id).view
      .mapValues(_.map(r => r.frame_idx -> (r.energy, r.zero_crossings)).toMap).toMap
    for ((id, bytes) <- samples if bytes.nonEmpty) {
      val nf = (bytes.length + 63) / 64
      val expect = (0 until nf).map { f =>
        val fr = bytes.slice(f * 64, math.min(bytes.length, f * 64 + 64))
          .map(b => (b & 0xff).toLong)
        val mu = fr.sum / fr.length
        val c = fr.map(_ - mu)
        val e = c.map(v => v * v).sum
        val zc = c.sliding(2).count(p => p.length == 2 && p(0) * p(1) < 0)
        f.toLong -> (e, zc.toLong)
      }.toMap
      assert(got(id) == expect, s"doc $id audio frames diverged")
    }
    assert(!got.contains(0L)) // empty payload → no frames
    // a genuinely oscillating frame has nonzero crossings on the fixture
    assert(got(5L).values.exists(_._2 > 0L))
  }

  test("dHash is invariant under uniform brightness shift; distinct images differ (m12)") {
    // the property that justifies gradient-sign hashing over byte
    // hashing: adding a constant to every pixel preserves every strict
    // comparison, so the shifted image has the IDENTICAL signature —
    // while an unrelated image does not
    val base = "the quick brown fox jumps over the lazy dog again and again and again"
    val shifted = base.map(c => (c + 1).toChar) // every byte +1
    val other = base.reverse
    val sigs = Multimodal.dHashSignatures(
        Seq((1L, base), (2L, shifted), (3L, other)).toDF("doc_id", "text"))
      .collect().map(r => r.doc_id -> r.dhash).toMap
    assert(sigs(1L) == sigs(2L), "brightness shift changed the signature")
    assert(sigs(1L) != sigs(3L), "unrelated image collided")
    // and the pair join surfaces exactly the shifted twin at distance 0
    val pairs = Multimodal.dHashNearDupPairs(
        Seq((1L, base), (2L, shifted), (3L, other)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 0L)), s"got $pairs")
  }

  test("audio fingerprint survives 2x time stretch; unrelated clip stays far (m13)") {
    // time normalization is the design claim: a clip played at half
    // speed (every sample doubled) divides into the SAME 65 relative
    // slices, so its energy-delta signs barely move — the stretched
    // twin must pair through the banding join while the reversed clip
    // (same bytes, different envelope) must not
    val base = ("the quick brown fox jumps over the lazy dog " * 6).trim
    val stretch = base.flatMap(c => s"$c$c")
    val other = base.reverse
    val pairs = Multimodal.audioNearDupPairs(
        Seq((1L, base), (2L, stretch), (3L, other)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("cross-modal report: image and audio edges fuse one cluster; modality tags and d20 rep (m14)") {
    // the semantic m14 pins: (1) TRANSITIVITY across modalities — A
    // pairs with B only as images (shared 8×9 dHash window: A extends
    // B with a divergent tail past byte 233), B pairs with C only as
    // audio (the m13 time-stretch twin) — yet all three land in ONE
    // cluster whose modality set is exactly {audio, image}; (2) a
    // pure-text cluster tags "text"; (3) an unrelated doc never
    // appears; (4) the representative follows the d20 rule
    // ((quality desc, doc_id asc) argmax), not min-id.
    val base = ("the quick brown fox jumps over the lazy dog " * 6).trim
    // tail: many distinct words (text Jaccard vs base < 0.5) with a
    // loud on/off energy envelope (audio distance vs base stays far)
    val tail = (0 until 24).map(i =>
      if (i % 2 == 0) "z" * 12 else s"w$i").mkString(" ")
    val docs = Seq(
      1L -> (base + " " + tail),          // A: image-twin of B, nothing else
      2L -> base,                         // B
      3L -> base.flatMap(c => s"$c$c"),   // C: audio-twin of B (2x stretch)
      4L -> "completely unrelated payload with its own words entirely",
      5L -> (base + " alpha"),            // E: text near-dup of F
      6L -> (base + " beta")              // F
    ).toDF("doc_id", "text")
    val rep = Multimodal.crossModalDupReport(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).sortBy(_._1)
    // expected clusters: {1,2,3} via image+audio … except E/F ALSO
    // text-pair with A and B (same 20-char prefix, Jaccard vs base is
    // high since they add one word) — compute the expected partition
    // from the kernel's own pair sets to keep the fixture honest
    val textPairs = graft.operators.Dedup.jaccardPairs(docs)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // E/F extend base by ONE word: Jaccard = 9/10 ≥ 0.5 vs base, so
    // text edges fold 2,5,6 together (and A stays sub-threshold:
    // its 12 tail words push it below 0.5)
    assert(textPairs == Set((2L, 5L), (2L, 6L), (5L, 6L)), s"text: $textPairs")
    val imgPairs = Multimodal.dHashNearDupPairs(docs)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(imgPairs.contains((1L, 2L)) && !imgPairs.exists(p =>
        p._1 == 3L || p._2 == 3L), s"image: $imgPairs")
    val audPairs = Multimodal.audioNearDupPairs(docs)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(audPairs.contains((2L, 3L)) && !audPairs.contains((1L, 2L)),
      s"audio: $audPairs")
    // everything except doc 4 is one component; modalities = all three
    assert(rep.length == 1, s"got ${rep.toSeq}")
    val (cid, n, mods, repId) = rep.head
    assert(cid == 1L && n == 5L, s"got ${rep.toSeq}")
    assert(mods.split(",").toSet.subsetOf(Set("audio", "image", "text"))
      && mods.contains("image") && mods.contains("audio") && mods.contains("text"),
      s"modalities: $mods")
    // d20 rule: the (quality desc, doc_id asc) argmax over the members
    val quality = graft.operators.TextAnalysis.qualityScore(docs)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expectedRep = Seq(1L, 2L, 3L, 5L, 6L)
      .maxBy(id => (quality(id), -id))
    assert(repId == expectedRep,
      s"rep $repId != d20 argmax $expectedRep (quality: $quality)")
  }

  test("decoded frame-row sums == per-32-byte-span sums, stride honored (m07)") {
    val got = Multimodal.frameRowStats(docsDF).collect()
      .groupBy(_.doc_id).view.mapValues(_.map(r => r.frame_idx -> r.px_sum).toMap).toMap
    for ((id, bytes) <- samples) {
      val h = math.max(1, (bytes.length + 31) / 32)
      val expectRows = (0 until h by 4).map { r =>
        r.toLong -> bytes.slice(r * 32, math.min(bytes.length, r * 32 + 32))
          .map(b => (b & 0xff).toLong).sum
      }.toMap
      assert(got(id) == expectRows, s"doc $id frame rows diverged")
    }
  }
}
