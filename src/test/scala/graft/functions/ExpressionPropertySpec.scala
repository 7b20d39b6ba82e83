package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Literal, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the fused codegen expressions, driven through
  * their interpreted `eval` path against independent Scala reference
  * implementations (the codegen path is pinned to the same values by
  * the corpus equivalence specs in OperatorsSpec — Catalyst guarantees
  * eval/codegen agreement per expression contract, and we check eval
  * here under ScalaCheck's input space: empty arrays, duplicates,
  * extremes). No SparkSession needed — expressions are pure.
  */
object ExpressionPropertySpec extends Properties("expressions") {

  private def longArray(xs: Seq[Long]): Literal =
    Literal.create(new GenericArrayData(xs.toArray), ArrayType(LongType, false))
  private def doubleArray(xs: Seq[Double]): Literal =
    Literal.create(new GenericArrayData(xs.toArray), ArrayType(DoubleType, false))
  private def floatArray(xs: Seq[Float]): Literal =
    Literal.create(new GenericArrayData(xs.toArray), ArrayType(FloatType, false))
  private def stringArray(xs: Seq[String]): Literal =
    Literal.create(
      new GenericArrayData(xs.map(UTF8String.fromString).toArray),
      ArrayType(StringType, false))

  // --- sorted_intersect_count ---------------------------------------
  private val sortedSets: Gen[(Seq[Long], Seq[Long])] = for {
    a <- Gen.listOf(Gen.choose(-1000L, 1000L))
    b <- Gen.listOf(Gen.choose(-1000L, 1000L))
  } yield (a.distinct.sorted, b.distinct.sorted)

  property("sorted_intersect_count == set intersection size") =
    Prop.forAll(sortedSets) { case (a, b) =>
      val got = SortedIntersectCount(longArray(a), longArray(b))
        .eval(null).asInstanceOf[Int]
      got == a.toSet.intersect(b.toSet).size
    }

  // --- minhash_sigs --------------------------------------------------
  private val hashInputs: Gen[(Seq[Long], Int)] = for {
    xs <- Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))
    n <- Gen.choose(1, 16)
  } yield (xs, n)

  property("minhash_sigs == per-permutation min of XXH64 chain") =
    Prop.forAll(hashInputs) { case (xs, n) =>
      val got = MinHashSigs(longArray(xs), Literal(n, IntegerType))
        .eval(null).asInstanceOf[ArrayData].toLongArray.toSeq
      val want = (0 until n).map { i =>
        val seed = XXH64.hashInt(i, 42L)
        xs.map(h => XXH64.hashLong(h, seed)).min
      }
      got == want
    }

  property("minhash_sigs of empty set is null") =
    Prop(MinHashSigs(longArray(Nil), Literal(4, IntegerType)).eval(null) == null)

  // --- hyperplane_sig ------------------------------------------------
  private val sigInputs: Gen[(Seq[Float], Int)] = for {
    dim <- Gen.choose(1, 16)
    xs <- Gen.listOfN(dim, Gen.choose(-10.0f, 10.0f))
    n <- Gen.choose(1, 8)
  } yield (xs, n)

  property("hyperplane_sig bit p == sign of plane-p dot product") =
    Prop.forAll(sigInputs) { case (xs, n) =>
      val planes = Array.tabulate(n * xs.length)(i => ((i * 31 + 7) % 13 - 6) / 7.0)
      val got = HyperplaneSig(floatArray(xs), doubleArray(planes.toSeq),
        Literal(n, IntegerType)).eval(null).asInstanceOf[Long]
      (0 until n).forall { p =>
        val dot = xs.indices.map(d => xs(d).toDouble * planes(p * xs.length + d)).sum
        ((got >> p) & 1L) == (if (dot > 0) 1L else 0L)
      }
    }

  property("hyperplane_sig nulls on plane-matrix/dimension mismatch") =
    Prop.forAll(sigInputs) { case (xs, n) =>
      // one extra matrix element → wrong stride → must be null, never a
      // silently wrong signature
      val planes = Seq.fill(n * xs.length + 1)(0.5)
      HyperplaneSig(floatArray(xs), doubleArray(planes),
        Literal(n, IntegerType)).eval(null) == null
    }

  // --- md5_minhash_sigs ----------------------------------------------
  private val shingleInputs: Gen[(Seq[String], Int)] = for {
    xs <- Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    n <- Gen.choose(1, 8)
  } yield (xs, n)

  property("md5_minhash_sigs == per-permutation min hex digest") =
    Prop.forAll(shingleInputs) { case (xs, n) =>
      val got = Md5MinHashSigs(stringArray(xs), Literal(n, IntegerType))
        .eval(null).asInstanceOf[ArrayData]
      val gotSeq = (0 until got.numElements()).map(got.getUTF8String(_).toString)
      val md = java.security.MessageDigest.getInstance("MD5")
      val want = (0 until n).map { i =>
        xs.map { s =>
          md.reset()
          md.digest(s"$i|$s".getBytes("UTF-8"))
            .map(b => f"${b & 0xff}%02x").mkString
        }.min
      }
      gotSeq == want
    }

  property("md5_minhash_sigs skips null elements; all-null input is null") = {
    val mixed = new GenericArrayData(
      Array[AnyRef](UTF8String.fromString("a"), null, UTF8String.fromString("b")))
    val mixedLit = Literal.create(mixed, ArrayType(StringType, true))
    val got = Md5MinHashSigs(mixedLit, Literal(2, IntegerType))
      .eval(null).asInstanceOf[ArrayData]
    val want = Md5MinHashSigs(stringArray(Seq("a", "b")), Literal(2, IntegerType))
      .eval(null).asInstanceOf[ArrayData]
    val allNull = Literal.create(
      new GenericArrayData(Array[AnyRef](null, null)), ArrayType(StringType, true))
    Prop(
      (0 until 2).forall(i => got.getUTF8String(i) == want.getUTF8String(i)) &&
        Md5MinHashSigs(allNull, Literal(2, IntegerType)).eval(null) == null)
  }

  // --- nearest_centroid_idx ------------------------------------------
  private val centroidInputs: Gen[(Seq[Float], Seq[Seq[Double]])] = for {
    dim <- Gen.choose(1, 16)
    nc <- Gen.choose(1, 8)
    emb <- Gen.listOfN(dim, Gen.choose(-5.0f, 5.0f))
    cents <- Gen.listOfN(nc, Gen.listOfN(dim, Gen.choose(-5.0, 5.0)))
  } yield (emb, cents)

  property("nearest_centroid_idx == argmax of per-centroid cosines (ties -> later)") =
    Prop.forAll(centroidInputs) { case (emb, cents) =>
      val got = NearestCentroidIdx(
        floatArray(emb), doubleArray(cents.flatten),
        Literal(cents.size, IntegerType)).eval(null).asInstanceOf[Int]
      def cos(c: Seq[Double]): Double = {
        var dot = 0.0; var nx = 0.0; var nb = 0.0
        emb.indices.foreach { i =>
          val x = emb(i).toDouble; dot += x * c(i); nx += x * x; nb += c(i) * c(i)
        }
        dot / (math.sqrt(nx) * math.sqrt(nb))
      }
      // replicate Spark double ordering (NaN greatest) + later-index ties
      val scores = cents.map(cos)
      val want = scores.zipWithIndex.maxBy { case (s, i) =>
        (if (s.isNaN) Double.MaxValue else s, i)
      }._2
      got == want
    }

  property("top_centroid_idxs == sort by (cos desc, idx asc) take k") =
    Prop.forAll(centroidInputs, Gen.choose(1, 10)) { case ((emb, cents), k) =>
      val got = TopCentroidIdxs(
        floatArray(emb), doubleArray(cents.flatten),
        Literal(cents.size, IntegerType), Literal(k, IntegerType))
        .eval(null).asInstanceOf[ArrayData].toIntArray.toSeq
      def cos(c: Seq[Double]): Double = {
        var dot = 0.0; var nx = 0.0; var nb = 0.0
        emb.indices.foreach { i =>
          val x = emb(i).toDouble; dot += x * c(i); nx += x * x; nb += c(i) * c(i)
        }
        dot / (math.sqrt(nx) * math.sqrt(nb))
      }
      val want = cents.map(cos).zipWithIndex
        .sortBy { case (s, i) => (s.isNaN, -s, i) } // NaN last, cos desc, idx asc
        .take(math.min(k, cents.size)).map(_._2)
      got == want
    }

  property("top_centroid_idxs head agrees with nearest_centroid_idx on non-NaN scores") =
    Prop.forAll(centroidInputs) { case (emb, cents) =>
      val top = TopCentroidIdxs(
        floatArray(emb), doubleArray(cents.flatten),
        Literal(cents.size, IntegerType), Literal(1, IntegerType))
        .eval(null).asInstanceOf[ArrayData].toIntArray.head
      val nearest = NearestCentroidIdx(
        floatArray(emb), doubleArray(cents.flatten),
        Literal(cents.size, IntegerType)).eval(null).asInstanceOf[Int]
      // the two differ only in tie/NaN preference (later vs earlier);
      // restrict the claim to inputs without exact ties or NaN
      def cos(c: Seq[Double]): Double = {
        var dot = 0.0; var nx = 0.0; var nb = 0.0
        emb.indices.foreach { i =>
          val x = emb(i).toDouble; dot += x * c(i); nx += x * x; nb += c(i) * c(i)
        }
        dot / (math.sqrt(nx) * math.sqrt(nb))
      }
      val scores = cents.map(cos)
      val clean = !scores.exists(_.isNaN) && scores.distinct.size == scores.size
      !clean || top == nearest
    }

  property("nearest_centroid_idx nulls on matrix/dimension mismatch") =
    Prop.forAll(centroidInputs) { case (emb, cents) =>
      NearestCentroidIdx(floatArray(emb), doubleArray(cents.flatten :+ 1.0),
        Literal(cents.size, IntegerType)).eval(null) == null
    }

  // --- null-element handling (review-hardened edges) -----------------
  private def nullableLongs(xs: Seq[java.lang.Long]): Literal =
    Literal.create(new GenericArrayData(xs.toArray[AnyRef]),
      ArrayType(LongType, true))

  property("sorted_intersect_count skips null elements") = {
    // nulls sort first under sort_array; also test one mid-array
    val a = nullableLongs(Seq(null, 1L, 3L, 5L))
    val b = nullableLongs(Seq(1L, null, 5L, 7L))
    Prop(SortedIntersectCount(a, b).eval(null) == 2)
  }

  property("minhash_sigs skips null elements; all-null input is null") = {
    val mixed = nullableLongs(Seq(7L, null, 9L))
    val got = MinHashSigs(mixed, Literal(4, IntegerType))
      .eval(null).asInstanceOf[ArrayData].toLongArray.toSeq
    val want = MinHashSigs(longArray(Seq(7L, 9L)), Literal(4, IntegerType))
      .eval(null).asInstanceOf[ArrayData].toLongArray.toSeq
    val allNull = nullableLongs(Seq(null, null))
    Prop(got == want && MinHashSigs(allNull, Literal(4, IntegerType)).eval(null) == null)
  }

  property("simhash64 skips null elements") = {
    val mixed = nullableLongs(Seq(0xF0L, null, 0x0FL))
    val got = SimHash64(mixed).eval(null)
    val want = SimHash64(longArray(Seq(0xF0L, 0x0FL))).eval(null)
    Prop(got == want)
  }

  property("hyperplane_sig nulls on a null embedding element") = {
    val emb = Literal.create(
      new GenericArrayData(Array[AnyRef](java.lang.Float.valueOf(1.0f), null)),
      ArrayType(FloatType, true))
    val planes = doubleArray(Seq(1.0, 1.0, -1.0, -1.0)) // 2 planes × dim 2
    Prop(HyperplaneSig(emb, planes, Literal(2, IntegerType)).eval(null) == null)
  }

  // --- cosine_similarity ---------------------------------------------
  private val vecPairs: Gen[(Seq[Float], Seq[Float])] = for {
    dim <- Gen.choose(1, 32)
    a <- Gen.listOfN(dim, Gen.choose(-5.0f, 5.0f))
    b <- Gen.listOfN(dim, Gen.choose(-5.0f, 5.0f))
  } yield (a, b)

  property("cosine_similarity == sequential double fold") =
    Prop.forAll(vecPairs) { case (a, b) =>
      val got = CosineSimilarity(floatArray(a), floatArray(b))
        .eval(null).asInstanceOf[Double]
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      val want = dot / (math.sqrt(na) * math.sqrt(nb))
      // bit-identical or both NaN (zero vectors)
      got == want || (got.isNaN && want.isNaN)
    }

  property("cosine_similarity nulls on dimension mismatch") =
    Prop.forAll(vecPairs) { case (a, b) =>
      CosineSimilarity(floatArray(a), floatArray(b :+ 1.0f)).eval(null) == null
    }

  // --- bloom_might_contain_long ---------------------------------------
  private def bloomLit(xs: Seq[Long], fpp: Double = 0.01): Literal = {
    val bf = org.apache.spark.util.sketch.BloomFilter
      .create(math.max(xs.size, 1).toLong, fpp)
    xs.foreach(bf.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    Literal.create(bos.toByteArray, org.apache.spark.sql.types.BinaryType)
  }

  property("bloom: NO false negatives — every inserted key probes true") =
    Prop.forAll(Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))) { xs =>
      val bl = bloomLit(xs)
      xs.forall { x =>
        BloomMightContainLong(bl, Literal(x, LongType))
          .eval(null).asInstanceOf[Boolean]
      }
    }

  property("bloom: false-positive rate is bounded (not everything matches)") =
    Prop.forAll(Gen.listOfN(200, Gen.choose(0L, 1L << 40))) { xs =>
      val bl = bloomLit(xs.distinct)
      val inSet = xs.toSet
      // probe 400 keys far outside the insert range — at fpp = 0.01 the
      // chance of >10% spurious hits is astronomically small
      val probes = (1L to 400L).map(i => (1L << 50) + i).filterNot(inSet)
      val fp = probes.count { x =>
        BloomMightContainLong(bl, Literal(x, LongType))
          .eval(null).asInstanceOf[Boolean]
      }
      fp <= probes.size / 10
    }

  property("bloom: null filter and null key yield null, never false") = {
    val nullFilter = Literal.create(null, org.apache.spark.sql.types.BinaryType)
    val nullKey = Literal.create(null, LongType)
    Prop(BloomMightContainLong(nullFilter, Literal(1L, LongType)).eval(null) == null) &&
      Prop(BloomMightContainLong(bloomLit(Seq(1L)), nullKey).eval(null) == null)
  }

  // --- deflate_len ---------------------------------------------------

  /** Independent reference: a FRESH Deflater per call with the same
    * parameters (raw stream, default level) — pins the thread-local
    * reuse + reset in the expression to the from-scratch semantics. */
  private def refDeflateLen(bytes: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](8192)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      n
    } finally d.end()
  }

  private def deflateOf(s: String): Int =
    DeflateLen(Literal.create(UTF8String.fromString(s), StringType))
      .eval(null).asInstanceOf[Int]

  property("deflate_len == fresh-Deflater reference on arbitrary strings") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      deflateOf(s) == refDeflateLen(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

  property("deflate_len: repetition compresses, entropy does not") = {
    val repetitive = "spam ham " * 500
    val diverse = (0 until 500).map(i => (i * 2654435761L).toHexString).mkString(" ")
    // sub-linear on pure repetition; ratio separates the two classes
    Prop(deflateOf(repetitive) * 10 < repetitive.length) &&
      Prop(deflateOf(repetitive) * 5 < deflateOf(diverse))
  }

  property("deflate_len: null in, null out") =
    Prop(DeflateLen(Literal.create(null, StringType)).eval(null) == null)

  // --- bpe_segment ----------------------------------------------------
  private def segOf(text: String, merges: Seq[(String, String)]): Seq[String] =
    BpeSegment(
      Literal.create(UTF8String.fromString(text), StringType),
      stringArray(merges.map(_._1)), stringArray(merges.map(_._2)))
      .eval(null).asInstanceOf[ArrayData]
      .toObjectArray(StringType).map(_.toString).toSeq

  // reference: recursive list rewrite (the OperatorsSpec bpe reference
  // mechanism), applied merge-by-merge in rank order
  private def refSegment(text: String, merges: Seq[(String, String)]): Seq[String] = {
    def rewrite(syms: List[String], l: String, r: String): List[String] = syms match {
      case a :: b :: rest if a == l && b == r => (l + r) :: rewrite(rest, l, r)
      case a :: rest => a :: rewrite(rest, l, r)
      case Nil => Nil
    }
    text.trim.split("\\s+").toSeq.flatMap { w =>
      merges.foldLeft(w.toList.map(_.toString) :+ "</w>") {
        case (syms, (l, r)) => rewrite(syms, l, r)
      }
    }
  }

  private val bpeInputs: Gen[(String, Seq[(String, String)])] = for {
    nWords <- Gen.choose(1, 6)
    words <- Gen.listOfN(nWords, Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    nMerges <- Gen.choose(0, 6)
    // merges over the same tiny alphabet (+ composites) so they actually fire
    merges <- Gen.listOfN(nMerges, for {
      l <- Gen.oneOf("a", "b", "c", "ab", "bc", "aa")
      r <- Gen.oneOf("a", "b", "c", "</w>", "ab")
    } yield (l, r))
  } yield (words.mkString(" "), merges)

  property("bpe_segment == rank-ordered recursive-rewrite reference") =
    Prop.forAll(bpeInputs) { case (text, merges) =>
      segOf(text, merges) == refSegment(text, merges)
    }

  property("bpe_segment with no merges = chars + </w> markers") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.oneOf('x', 'y')).map(_.mkString)) { w =>
      segOf(w, Nil) == (w.map(_.toString) :+ "</w>")
    }

  property("bpe_segment: detokenization round-trips (strip </w> = original words)") =
    Prop.forAll(bpeInputs) { case (text, merges) =>
      val detok = segOf(text, merges).mkString
        .replace("</w>", " ").trim.split("\\s+").toSeq
      detok == text.trim.split("\\s+").toSeq
    }

  property("bpe_segment nulls on mismatched merge arrays") =
    Prop(BpeSegment(
      Literal.create(UTF8String.fromString("ab"), StringType),
      stringArray(Seq("a")), stringArray(Nil)).eval(null) == null)

  // --- unigram_segment ------------------------------------------------
  private def uniSegOf(text: String, table: Seq[(String, Double)]): Seq[String] =
    UnigramSegment(
      Literal.create(UTF8String.fromString(text), StringType),
      stringArray(table.map(_._1)), doubleArray(table.map(_._2)))
      .eval(null).asInstanceOf[ArrayData]
      .toObjectArray(StringType).map(_.toString).toSeq

  // score of a candidate segmentation under the expression's rules:
  // in-table piece → its log-prob, unknown single → UnkLogProb,
  // unknown multi → invalid
  private def uniScore(pieces: Seq[String], table: Map[String, Double]): Double =
    pieces.foldLeft(0.0) { (acc, p) =>
      if (acc == Double.NegativeInfinity) acc
      else table.get(p) match {
        case Some(lp) => acc + lp
        case None =>
          if (p.length == 1) acc + UnigramSegment.UnkLogProb
          else Double.NegativeInfinity
      }
    }

  // brute force: enumerate every segmentation of the word (test alphabet
  // is BMP, one char = one code point), take the best score
  private def bruteBest(word: String, table: Map[String, Double]): Double = {
    val L = word.length
    (0 until (1 << math.max(L - 1, 0))).iterator.map { mask =>
      val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
      var start = 0
      for (i <- 0 until L - 1) if ((mask & (1 << i)) != 0) {
        pieces += word.substring(start, i + 1); start = i + 1
      }
      pieces += word.substring(start)
      uniScore(pieces.toSeq, table)
    }.max
  }

  private val uniInputs: Gen[(String, Seq[(String, Double)])] = for {
    nWords <- Gen.choose(1, 4)
    words <- Gen.listOfN(nWords,
      Gen.choose(1, 7).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    nPieces <- Gen.choose(0, 8)
    table <- Gen.listOfN(nPieces, for {
      p <- Gen.oneOf("a", "b", "c", "ab", "bc", "ca", "abc", "aab", "bb", "aaa")
      lp <- Gen.choose(-10.0, -0.1)
    } yield (p, lp))
  } yield (words.mkString(" "), table.distinctBy(_._1))

  property("unigram_segment is Viterbi-optimal vs brute-force enumeration") =
    Prop.forAll(uniInputs) { case (text, table) =>
      val m = table.toMap
      // optimality decomposes per word: the whole-text score must equal
      // the sum of per-word brute-force bests
      val gotScore = uniScore(uniSegOf(text, table), m)
      val bestScore = text.trim.split("\\s+").map(bruteBest(_, m)).sum
      math.abs(gotScore - bestScore) < 1e-9
    }

  property("unigram_segment: concatenation round-trips to the original words") =
    Prop.forAll(uniInputs) { case (text, table) =>
      uniSegOf(text, table).mkString == text.trim.split("\\s+").mkString
    }

  property("unigram_segment with empty table = single code points") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.oneOf('x', 'y')).map(_.mkString)) { w =>
      uniSegOf(w, Nil) == w.map(_.toString)
    }

  property("unigram_segment nulls on mismatched piece arrays") =
    Prop(UnigramSegment(
      Literal.create(UTF8String.fromString("ab"), StringType),
      stringArray(Seq("a")), doubleArray(Nil)).eval(null) == null)

  // adversarial tables: a -Inf or NaN logprob on a single code point
  // makes a word Viterbi-unreachable (the in-table branch bypasses the
  // UnkLogProb fallback; NaN never wins a max) — the row must yield
  // null, not crash in the backtrack
  property("unigram_segment nulls (not crashes) on non-finite single-piece scores") =
    Prop.forAll(Gen.oneOf(Double.NegativeInfinity, Double.NaN)) { bad =>
      UnigramSegment(
        Literal.create(UTF8String.fromString("aa a"), StringType),
        stringArray(Seq("a")), doubleArray(Seq(bad))).eval(null) == null
    }

  property("unigram_segment: non-finite MULTI-piece scores degrade to singles") =
    // only the multi "ab" is poisoned; singles fall back to UnkLogProb,
    // so the word still segments — the null contract is for genuinely
    // unreachable words only
    Prop(uniSegOf("ab", Seq("ab" -> Double.NegativeInfinity)) == Seq("a", "b"))
}
