package graft

import graft.dedup.Dedup
import graft.functions.{BloomHash, SimHash, TextFunctions}
import graft.ml.FeatureEval
import graft.multimodal.Multimodal
import graft.sim.Similarity
import org.apache.spark.sql.functions._

/** Pins for the operators the driver can only rows-check (no DuckDB
  * oracle): hash kernels, ANN paths, the multimodal stub and the ML
  * evaluation. Each rows-only `SparkEntry.queries` entry has a
  * behavioral anchor here.
  */
class RowsOnlySpec extends SparkSpec {

  test("rolling fingerprint is the ordered x31 fold of word FNV hashes") {
    import spark.implicits._
    val out = graft.text.TextAnalysis.rollingFingerprint(
      Seq((1L, "hello world"), (2L, "world hello"), (3L, "")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cleaned = TextFunctions.cleanedTextLocal("hello world")
    val ws = cleaned.split(" ")
    val expected = ws.foldLeft(0L)((acc, w) => acc * 31L + SimHash.fnv1a64(w))
    assert(out(1L) == expected)
    assert(out(1L) != out(2L)) // order-sensitive, unlike the bag fingerprint
  }

  test("bloom row hash is the OR of per-token filters, k bits per token") {
    val (h1, l1) = BloomHash.rowHash(Seq("alpha"))
    val (h2, l2) = BloomHash.rowHash(Seq("beta"))
    val (hr, lr) = BloomHash.rowHash(Seq("alpha", "beta"))
    assert((hr, lr) == (h1 | h2, l1 | l2))
    val bits = java.lang.Long.bitCount(h1) + java.lang.Long.bitCount(l1)
    assert(bits > 0 && bits <= BloomHash.NumHashes)
    // containment prefilter has no false negatives by construction
    assert((hr & h1) == h1 && (lr & l1) == l1)
  }

  test("multimodal decodeFeatures derives the deterministic stub features") {
    import spark.implicits._
    val out = Multimodal.decodeFeatures(spark,
      Seq((7L, "ab c")).toDF("doc_id", "text")).collect().head
    assert(out.doc_id == 7L)
    assert(out.n_bytes == 4)
    val bytes = "ab c".getBytes("UTF-8").map(_ & 0xff)
    assert(out.feature.toSeq == Seq(4.0, bytes.sum.toDouble / 4, 1.0, 'a'.toInt.toDouble))
  }

  test("decodeImages really decodes PNG/JPEG blobs from a parquet fixture") {
    import spark.implicits._
    // build real images in-memory: 2×2 solid red PNG, 3×1 solid
    // (0,128,255) JPEG-encoded... JPEG is lossy, so pin PNG exactly and
    // JPEG approximately; plus one garbage blob
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def jpg(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_img_").toString
    Seq((1L, png(2, 2, 0xFF0000)), (2L, jpg(4, 3, 0x808080)), (3L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "blob").write.mode("overwrite").parquet(s"$dir/imgs.parquet")
    val out = Multimodal.decodeImages(spark, spark.read.parquet(s"$dir/imgs.parquet"))
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).decode_ok && out(1L).width == 2 && out(1L).height == 2)
    assert(out(1L).mean_r == 255.0 && out(1L).mean_g == 0.0 && out(1L).mean_b == 0.0)
    assert(out(2L).decode_ok && out(2L).width == 4 && out(2L).height == 3)
    // JPEG is lossy: a solid mid-gray survives within a small tolerance
    assert(math.abs(out(2L).mean_r - 128.0) < 4 && math.abs(out(2L).mean_g - 128.0) < 4)
    assert(!out(3L).decode_ok && out(3L).n_bytes == 3)
  }

  test("decodeAudio really decodes WAV blobs: format, duration, RMS") {
    import spark.implicits._
    // 0.5 s of a full-scale square wave at 8 kHz mono 16-bit PCM:
    // RMS = 1.0 exactly; plus a half-scale variant (RMS 0.5) and garbage
    def wav(amplitude: Short, frames: Int, rate: Float = 8000f): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val pcm = new Array[Byte](frames * 2)
      for (i <- 0 until frames) {
        val s: Short = if (i % 2 == 0) amplitude else (-amplitude).toShort
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_wav_").toString
    Seq((1L, wav((-32768).toShort, 4000)), (2L, wav(16384, 2000)), (3L, Array[Byte](9, 9)))
      .toDF("doc_id", "blob").write.mode("overwrite").parquet(s"$dir/wavs.parquet")
    val out = Multimodal.decodeAudio(spark, spark.read.parquet(s"$dir/wavs.parquet"))
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).decode_ok && out(1L).sample_rate == 8000.0 && out(1L).channels == 1)
    assert(out(1L).frames == 4000 && math.abs(out(1L).duration_sec - 0.5) < 1e-6)
    assert(math.abs(out(1L).rms - 1.0) < 1e-3, s"rms=${out(1L).rms}")
    assert(out(2L).frames == 2000 && math.abs(out(2L).rms - 0.5) < 1e-3)
    assert(!out(3L).decode_ok && out(3L).n_bytes == 2)
  }

  test("feistelPermute is a seeded bijection on [0, n)") {
    for (n <- Seq(1L, 2L, 7L, 1000L, 1025L)) {
      val img = (0L until n).map(FeatureEval.feistelPermute(_, n, seed = 42L))
      assert(img.toSet == (0L until n).toSet, s"n=$n not a bijection")
    }
    // different seeds give different permutations; most points move
    val n = 1000L
    val a = (0L until n).map(FeatureEval.feistelPermute(_, n, 1L))
    val b = (0L until n).map(FeatureEval.feistelPermute(_, n, 2L))
    assert(a != b)
    assert(a.zipWithIndex.count { case (v, i) => v == i } < 50)
  }

  test("permutation importance ranks the real signal far above noise") {
    import spark.implicits._
    val df = (0 until 300).map { i =>
      val x = i.toDouble / 3
      val noise = SimHash.fnv1a64(i.toString).toDouble / Long.MaxValue
      (x, noise, 3.0 * x + 1.0)
    }.toDF("x", "noise", "y")
    val imp = FeatureEval.permutationImportance(df, Seq("x", "noise"), "y")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(imp("x") > 100 * math.max(imp("noise"), 1e-9))
  }

  private def clusteredEmb = {
    import spark.implicits._
    // two tight, well-separated clusters in R^4
    (0 until 6).map(i => (i.toLong, Array(10f + i * 0.1f, 0f, 0f, 1f))) ++
      (6 until 12).map(i => (i.toLong, Array(0f, 10f + i * 0.1f, 1f, 0f)))
  }

  test("CDC chunks: exact cover, size bounds, shift-robust hashes, partition-independent") {
    import spark.implicits._
    def word(i: Int) = s"w${(i * 2654435761L) % 997}"
    val body = (0 until 300).map(word)
    val docs = Seq((1L, body.mkString(" ")),
      (2L, ((0 until 5).map(i => s"new$i") ++ body).mkString(" "))).toDF("doc_id", "text")
    val chunks = graft.text.TextAnalysis.cdcChunks(spark, docs).collect()
    val byDoc = chunks.groupBy(_.doc_id)

    // exact cover: contiguous 1-based starts, lengths sum to the word count
    for ((did, cs) <- byDoc) {
      val sorted = cs.sortBy(_.chunk_idx)
      assert(sorted.head.start_word == 1)
      sorted.sliding(2).filter(_.length == 2).foreach { p =>
        assert(p(1).start_word == p(0).start_word + p(0).n_words) }
      val total = if (did == 1L) 300 else 305
      assert(sorted.map(_.n_words).sum == total)
      // size bounds (the final chunk may undershoot minSize)
      sorted.init.foreach(c => assert(c.n_words >= 4 && c.n_words <= 64, c.toString))
    }

    // shift robustness: the 5-word prefix perturbs at most the first
    // few chunks — fixed-stride chunking would shift every hash
    val h1 = byDoc(1L).map(_.chunk_hash).toSet
    val h2 = byDoc(2L).map(_.chunk_hash).toSet
    assert(byDoc(1L).length >= 5, s"want several chunks, got ${byDoc(1L).length}")
    assert((h1 -- h2).size <= 2, s"${(h1 -- h2).size} of ${h1.size} hashes lost after shift")

    // deterministic under repartitioning
    val again = graft.text.TextAnalysis.cdcChunks(spark, docs.repartition(5)).collect().toSet
    assert(again == chunks.toSet)
  }

  test("removeContamination excises the eval passage from the corpus doc only") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d e f g h i j"), (2L, "x y z")).toDF("doc_id", "text")
    val eval = Seq((100L, "c d e f g h i j")).toDF("doc_id", "text")
    val spans = graft.dedup.Dedup.duplicateSpansAcross(corpus, eval, 5, 8)
    val s0 = spans.select("doc_a", "start_a", "span_words")
      .as[(Long, Long, Long)].collect().toSeq
    assert(s0 == Seq((1L, 3L, 8L)), s0.toString)
    val cleaned = graft.dedup.Dedup.removeContamination(corpus, spans)
      .as[(Long, String)].collect().toMap
    assert(cleaned == Map(1L -> "a b", 2L -> "x y z"))
  }

  test("CDC dedup catches a shifted near-copy that exact dedup misses") {
    import spark.implicits._
    def word(i: Int) = s"w${(i * 2654435761L) % 997}"
    val body = (0 until 300).map(word).mkString(" ")
    val docs = Seq(
      (1L, body),                                          // original
      (2L, "inserted prefix here " + body),                // shifted copy
      (3L, (500 until 800).map(word).mkString(" "))        // unrelated
    ).toDF("doc_id", "text")
    // exact dedup sees three distinct hashes
    assert(graft.dedup.Dedup.exact(docs).where(!col("keep")).count() == 0)
    val pairs = graft.dedup.Dedup.cdcNearDup(docs, 0.5)
      .select("id_1", "id_2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
    // containment bounded by construction (set semantics)
    val full = graft.dedup.Dedup.cdcNearDup(docs, 0.0)
    assert(full.where(col("containment") > 1.0).count() == 0)
  }

  test("quality classifier separates vocabularies and generalizes past a noisy weak label") {
    import spark.implicits._
    // class A speaks words a0..a9, class B speaks b0..b9
    def doc(seedWord: String, i: Int) =
      (0 until 12).map(j => s"$seedWord${(i * 7 + j) % 10}").mkString(" ")
    val docs = ((0 until 30).map(i => (i.toLong, doc("a", i), 1)) ++
      (30 until 60).map(i => (i.toLong, doc("b", i), 0)))
      .toDF("doc_id", "text", "truth")
    // weak label flips 3 of the A docs — the hashed-BoW model must
    // still score them as A (their vocabulary is pure class A)
    val weak = (col("truth") === 1) && !col("doc_id").isin(0L, 1L, 2L)
    val scored = graft.ml.QualityClassifier
      .weakLabelScore(docs, weak, numFeatures = 1 << 12)
      .join(docs.select("doc_id", "truth"), "doc_id")
      .select(col("doc_id"), col("keep"), (col("truth") === 1).as("t"))
      .as[(Long, Boolean, Boolean)].collect()
    val acc = scored.count(r => r._2 == r._3).toDouble / scored.length
    assert(acc >= 0.95, s"accuracy $acc")
    // the three mislabeled docs are pulled back across the boundary
    scored.filter(_._1 < 3L).foreach(r => assert(r._2, s"doc ${r._1} not corrected"))
  }

  test("diversity sample: perCell per cell, deterministic, subset of the corpus") {
    import spark.implicits._
    val emb = clusteredEmb.toDF("vec_id", "embedding")
    val assigned = Similarity.assignCells(emb, 2, 42L)
    val cellSizes = assigned.groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val s1 = Similarity.diversitySample(emb, 2, preAssigned = Some(assigned))
      .select("vec_id", "cell").as[(Long, Int)].collect().toSet
    // exactly min(perCell, cellSize) picked per cell
    val perCell = s1.groupBy(_._2).view.mapValues(_.size).toMap
    cellSizes.foreach { case (c, n) => assert(perCell(c) == math.min(2L, n)) }
    // subset of the corpus, and reproducible under a different partitioning
    assert(s1.map(_._1).subsetOf(clusteredEmb.map(_._1).toSet))
    val s2 = Similarity.diversitySample(emb.repartition(5), 2, preAssigned = None,
      nCells = 2, seed = 42L).select("vec_id", "cell").as[(Long, Int)].collect().toSet
    assert(s1.map(_._1) == s2.map(_._1))
  }

  test("approx distinct stays within HLL error of the exact count") {
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.1, s"$k: ${approx(k)} vs $e")
    }
  }

  test("MinHashSig aggregate is bit-identical to k min(xxhash64(i, g)) expressions") {
    import spark.implicits._
    val inv = Seq((1L, 11L), (1L, 22L), (1L, 33L), (2L, 22L), (2L, 44L))
      .toDF("did", "g")
    val viaAgg = inv.groupBy("did")
      .agg(graft.functions.MinHashSig.minhashSig(col("g"), 8).as("sig"))
      .select(col("did"), col("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val minExprs = (0 until 8).map(i => min(xxhash64(lit(i), col("g"))).as(s"m_$i"))
    val viaExpr = inv.groupBy("did").agg(minExprs.head, minExprs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong(_)).toSeq).toMap
    assert(viaAgg == viaExpr)
  }

  test("lsh knn matches brute force on separated clusters") {
    import spark.implicits._
    val emb = clusteredEmb.toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceKnnBlocked(emb, emb, 1)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val lsh = Similarity.lshKnn(emb, 1, bits = 4, dim = 4)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(lsh == brute)
  }

  test("pq knn keeps every top-1 neighbor inside the true cluster") {
    import spark.implicits._
    val emb = clusteredEmb.toDF("vec_id", "embedding")
    val pq = Similarity.pqKnn(emb, emb, 1, m = 2, bits = 4)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect()
    assert(pq.length == 12)
    // ADC ranks through 2-byte codes; on separated clusters the top-1
    // must still land in the query's own cluster for every vector
    pq.foreach { case (q, n) => assert((q < 6) == (n < 6), s"$q -> $n") }
  }

  test("ivfadc knn keeps every top-1 neighbor inside the true cluster") {
    import spark.implicits._
    val emb = clusteredEmb.toDF("vec_id", "embedding")
    val res = Similarity.ivfPqKnn(emb, emb, 1, nCells = 2, m = 2, bits = 4, nProbe = 1)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect()
    assert(res.length == 12)
    res.foreach { case (q, n) => assert((q < 6) == (n < 6), s"$q -> $n") }
  }

  test("ivfadc with full probe and full rerank recovers brute force exactly") {
    import spark.implicits._
    val emb = clusteredEmb.toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceKnnBlocked(emb, emb, 2)
      .select("vec_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val rr = Similarity.ivfPqKnn(emb, emb, 2, nCells = 2, m = 2, bits = 4,
      nProbe = 2, rerank = 12)
      .select("vec_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(rr == brute)
  }

  test("ivf knn matches brute force on separated clusters") {
    import spark.implicits._
    val emb = clusteredEmb.toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceKnnBlocked(emb, emb, 1)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val ivf = Similarity.ivfKnn(emb, 1, nCells = 2)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(ivf == brute)
  }
}
