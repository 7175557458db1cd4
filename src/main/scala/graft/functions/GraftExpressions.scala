package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot paths.
  *
  * The built-in composition (nested `transform`/`aggregate` lambdas)
  * is interpreted per element — measured 4-10x slower than these
  * single-pass loops (see Dedup scaladoc). Both expressions implement
  * `doGenCode`, so they stay inside whole-stage codegen on the 100 TB
  * scan path.
  */

/** MinHash signature of an array<string>: for seed j in [0, numHashes),
  * signature(j) = min over elements of xxhash64(element, seed = j).
  * Empty arrays produce Long.MaxValue entries (callers filter empties).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, j.toLong)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  UTF8String $s = $arr.getUTF8String($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), (long) $j);
         |    if ($h < $sig[$j]) $sig[$j] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Cosine similarity of two array<double> columns in one pass
  * (dot and both norms accumulated together). IEEE semantics: zero
  * norms yield NaN/Inf, never an ANSI error. Mismatched vector
  * lengths return NULL — corrupt embedding data must not pass as a
  * plausible truncated similarity.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects (array<double>, array<double>), got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null children OR length mismatch
  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Word-level k-shingles of a space-tokenized string — one pass over
  * the text (split + window fused), replacing a split/transform/
  * array_distinct lambda chain that is interpreted per element.
  * `dedupe = true` (the posting-list/Jaccard form) keeps DISTINCT
  * shingles in first-occurrence order; `dedupe = false` keeps EVERY
  * position's shingle (the substring-duplication form, where position
  * counts are the signal). CodegenFallback: the loop is the row's
  * entire work, so per-row interpreted dispatch is noise.
  */
case class WordShingles(child: Expression, k: Int, dedupe: Boolean = true)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].split(space, -1)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    def gram(i: Int): UTF8String = {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks(i + j); j += 1 }
      UTF8String.concatWs(space, parts: _*)
    }
    if (dedupe) {
      val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
      var i = 0
      while (i < n) { seen.add(gram(i)); i += 1 }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
    } else {
      val all = new Array[Any](n)
      var i = 0
      while (i < n) { all(i) = gram(i); i += 1 }
      new GenericArrayData(all)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Rebuild a space-tokenized string with duplicate token SPANS cut
  * out — the map-side tail of [[graft.ext.TextStats.cutDupSpans]]
  * (exact-substring dedup, Lee et al. arXiv:2107.06499). `cutStarts`
  * is the SORTED array of 0-based token positions whose k-gram is a
  * non-first duplicate occurrence; each start covers tokens
  * [p, p+k-1]. Overlapping or touching covers merge into maximal
  * spans (start <= prevEnd + 1), the text is rebuilt from the tokens
  * outside them, and the result is struct<text_cut string, n_spans
  * int, n_removed int> — one pass, no per-token set probing (the
  * equivalent filter/exists lambda pair is interpreted per token ×
  * per span). CodegenFallback: the token walk is the row's entire
  * work. Null text -> null; docs with no cuts return the text
  * unchanged with zero counts.
  */
case class CutTokenSpans(text: Expression, cutStarts: Expression, k: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 1, "span width k must be >= 1")

  override def left: Expression = text
  override def right: Expression = cutStarts

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, cutStarts.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cut_token_spans expects (string, array<int>), got $other")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("text_cut", StringType, nullable = false),
    StructField("n_spans", IntegerType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false)))
  override def prettyName: String = "cut_token_spans"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(t: Any, cs: Any): Any = {
    val toks = t.asInstanceOf[UTF8String].split(space, -1)
    val starts = cs.asInstanceOf[ArrayData]
    val m = starts.numElements()
    if (m == 0)
      return new GenericInternalRow(Array[Any](t.asInstanceOf[UTF8String], 0, 0))
    // walk the sorted starts into merged spans, marking covered tokens
    val covered = new Array[Boolean](toks.length)
    var spans = 0
    var curEnd = -2 // so the first start never "touches" a prior span
    var i = 0
    while (i < m) {
      val p = starts.getInt(i)
      val end = math.min(p + k - 1, toks.length - 1)
      if (p > curEnd + 1) spans += 1
      var j = math.max(p, 0)
      while (j <= end) { covered(j) = true; j += 1 }
      if (end > curEnd) curEnd = end
      i += 1
    }
    var removed = 0
    var kept = 0
    var j = 0
    while (j < toks.length) {
      if (covered(j)) removed += 1 else { toks(kept) = toks(j); kept += 1 }
      j += 1
    }
    val rebuilt =
      if (kept == 0) UTF8String.EMPTY_UTF8
      else UTF8String.concatWs(space, java.util.Arrays.copyOf(toks, kept): _*)
    new GenericInternalRow(Array[Any](rebuilt, spans, removed))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CutTokenSpans =
    copy(text = l, cutStarts = r)
}

/** Random-hyperplane LSH bucket of an array<double> vector: bit j of
  * the result is the sign of dot(vec, plane_j), where plane_j's
  * components are deterministic pseudo-random values in [-1, 1)
  * derived from xxhash64(j | seed-salted dim, seed). Single fused
  * loop (planes x dims); the equivalent zip_with/aggregate lambda
  * composition is interpreted per element. `seed` selects an
  * INDEPENDENT plane family (default 42 = the pinned q35/q42/q53
  * planes); banding over several families multiplies effective bands
  * past the 63-bit-per-signature cap (crossLingualNearDupPairs).
  */
case class HyperplaneBucket(child: Expression, planes: Int,
                            seed: Long = 42L)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(planes >= 1 && planes <= 63, "planes must be in [1, 63]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket expects array<double>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = vec.numElements()
    var bucket = 0L
    var j = 0
    while (j < planes) {
      var d = 0.0
      var i = 0
      while (i < n) {
        val h = XXH64.hashLong((j.toLong << 32) | i.toLong, seed)
        val comp = (java.lang.Math.floorMod(h, 2000001L) - 1000000L) / 1000000.0
        d += vec.getDouble(i) * comp
        i += 1
      }
      if (d >= 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** URL canonicalization — the first operator of every web-crawl
  * pipeline: two raw URLs that differ only in case, default port,
  * `www.` prefix, trailing slashes, fragment, tracking parameters or
  * query-parameter ORDER are the same fetch, and a crawl dedups on
  * the canonical form before anything else runs. One fused pass per
  * row (string-heavy row work — the [[SimHash]] CodegenFallback
  * argument); the exact step order is the cross-engine CONTRACT the
  * DuckDB oracle replays:
  *
  *  1. cut at the first '#' (fragment);
  *  2. require "://" after a non-empty scheme, else NULL (opaque
  *     non-URL input is surfaced, not guessed at);
  *  3. scheme and authority lowercase; authority ends at the first
  *     '/' or '?';
  *  4. strip one ":80" iff scheme http / ":443" iff https, then one
  *     leading "www.";
  *  5. strip ALL trailing '/' from the path;
  *  6. query: split on '&', drop empty params, drop params whose name
  *     (before '=') is utm_* / gclid / fbclid, SORT the rest
  *     byte-lexicographically, re-join with '&' (omit '?' if none
  *     survive).
  *
  * Byte sort == UTF-16 compareTo for the ASCII parameter alphabet;
  * non-ASCII params would need a collation note (crawl URLs are
  * percent-encoded ASCII by RFC 3986). */
case class UrlCanonicalize(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"url_canonicalize expects string, got $other")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_canonicalize"

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString
    val hashAt = raw.indexOf('#')
    val s0 = if (hashAt >= 0) raw.substring(0, hashAt) else raw
    val sep = s0.indexOf("://")
    if (sep < 1) return null
    val scheme = s0.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val rest = s0.substring(sep + 3)
    var authEnd = rest.length
    var i = 0
    while (i < rest.length && authEnd == rest.length) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?') authEnd = i
      i += 1
    }
    var host = rest.substring(0, authEnd).toLowerCase(java.util.Locale.ROOT)
    if (scheme == "http" && host.endsWith(":80"))
      host = host.substring(0, host.length - 3)
    else if (scheme == "https" && host.endsWith(":443"))
      host = host.substring(0, host.length - 4)
    if (host.startsWith("www.")) host = host.substring(4)
    val tail = rest.substring(authEnd)
    val qAt = tail.indexOf('?')
    var path = if (qAt >= 0) tail.substring(0, qAt) else tail
    val query = if (qAt >= 0) tail.substring(qAt + 1) else ""
    var pEnd = path.length
    while (pEnd > 0 && path.charAt(pEnd - 1) == '/') pEnd -= 1
    path = path.substring(0, pEnd)
    val kept = query.split("&", -1).filter { p =>
      if (p.isEmpty) false
      else {
        val eq = p.indexOf('=')
        val name = if (eq >= 0) p.substring(0, eq) else p
        !(name.startsWith("utm_") || name == "gclid" || name == "fbclid")
      }
    }
    java.util.Arrays.sort(kept, (a: String, b: String) => a.compareTo(b))
    val sb = new java.lang.StringBuilder(raw.length)
    sb.append(scheme).append("://").append(host).append(path)
    if (kept.nonEmpty) sb.append('?').append(String.join("&", kept: _*))
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
}

/** Portable SimHash of a space-tokenized string (32- or 64-bit), one
  * fused pass per row. Bit source per token, from md5(token)'s 32 hex
  * digits:
  *  - signature position i in [1, 32]: the HIGH bit of hex digit i
  *    (digit in '8'..'f') — the original 32-bit construction;
  *  - position i in [33, 64]: the SECOND bit of hex digit i-32
  *    (digit in '4'..'7' or 'c'..'f') — 32 more iid uniform bits from
  *    the same digest, no second hash pass.
  * Signature bit = sign of the token-count-weighted vote sum; emitted
  * as a `bits`-char '0'/'1' string so the definition is reproducible
  * in any engine with md5 and substr (the DuckDB oracle mirrors both
  * layouts). Bit-for-bit identical to the
  * `split -> transform(md5) -> bits x aggregate` lambda composition it
  * replaces (which interpreted bits x tokens lambda dispatches per
  * row — the repo's no-interpreted-lambdas-on-scan-paths invariant).
  * Null in -> null out. CodegenFallback: the md5-per-token loop is the
  * row's entire work.
  */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(bits == 32 || bits == 64, "simhash bits must be 32 or 64")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash$bits expects string, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = s"simhash$bits"

  @transient private lazy val md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].split(space, -1)
    val votes = new Array[Int](bits)
    val digest = md5.get()
    var t = 0
    while (t < toks.length) {
      val d = digest.digest(toks(t).getBytes)
      var i = 0
      while (i < bits) {
        // hex digit di = high/low nibble of byte di/2; digit >= '8'
        // iff nibble bit 3 set; digit in 4-7/c-f iff nibble bit 2 set.
        val di = if (i < 32) i else i - 32
        val nib = if ((di & 1) == 0) (d(di >> 1) >> 4) & 0xF else d(di >> 1) & 0xF
        val hit = if (i < 32) nib >= 8 else (nib & 4) != 0
        votes(i) += (if (hit) 1 else -1)
        i += 1
      }
      t += 1
    }
    val out = new Array[Byte](bits)
    var i = 0
    while (i < bits) { out(i) = if (votes(i) > 0) '1' else '0'; i += 1 }
    UTF8String.fromBytes(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Count of whitespace tokens contained in a FOLDABLE literal token
  * set — the codegen'd replacement for
  * `size(filter(split(text, " "), t => t.isin(set)))`, whose lambda is
  * interpreted per token (stopword ratios and marker-word language
  * scores run this over every document at scan time). The set is
  * hashed once per task, not per row.
  */
/** Maximum multiplicity of any element in an array<string> — the
  * per-row form of "count of the most frequent n-gram" (the Gopher
  * top-n-gram dominance signal). Sort-a-copy + one run-length pass:
  * no hashing, no boxing beyond the element refs, O(n log n) per row
  * with n = tokens per document. Doing this MAP-SIDE is what turns
  * the per-doc top-gram statistic from two gram-keyed shuffles
  * (explode → count → max) into zero — only the final per-group
  * aggregate exchanges rows. Null elements are skipped; empty (or
  * all-null) arrays return 0. Codegen'd (UTF8String is Comparable,
  * binary order — any total order works for run counting).
  */
case class TopElementFreq(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_element_freq expects array<string>, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "top_element_freq"

  override protected def nullSafeEval(a: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    val n = ad.numElements()
    val arr = new Array[AnyRef](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!ad.isNullAt(i)) { arr(m) = ad.getUTF8String(i); m += 1 }
      i += 1
    }
    if (m == 0) return 0
    java.util.Arrays.sort(arr, 0, m)
    var best = 1; var run = 1
    i = 1
    while (i < m) {
      if (arr(i) == arr(i - 1) || arr(i).equals(arr(i - 1))) {
        run += 1; if (run > best) best = run
      } else run = 1
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val run = ctx.freshName("run")
      s"""
         |final int $n = $a.numElements();
         |final Object[] $arr = new Object[$n];
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) { $arr[$m++] = $a.getUTF8String($i); }
         |}
         |if ($m == 0) {
         |  ${ev.value} = 0;
         |} else {
         |  java.util.Arrays.sort($arr, 0, $m);
         |  int $best = 1; int $run = 1;
         |  for (int $i = 1; $i < $m; $i++) {
         |    if ($arr[$i].equals($arr[$i - 1])) {
         |      $run++; if ($run > $best) $best = $run;
         |    } else { $run = 1; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TopElementFreq =
    copy(child = newChild)
}

case class TokenSetCount(text: Expression, tokens: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = tokens

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, tokens.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (tokens.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "token_set_count expects a foldable (literal) token array")
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_set_count expects (string, array<string>), got $other")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_set_count"

  @transient lazy val tokenSet: java.util.HashSet[UTF8String] = {
    val ad = tokens.eval(InternalRow.empty).asInstanceOf[ArrayData]
    val s = new java.util.HashSet[UTF8String](ad.numElements() * 2)
    var i = 0
    while (i < ad.numElements()) { s.add(ad.getUTF8String(i)); i += 1 }
    s
  }
  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(t: Any, ts: Any): Any = {
    val toks = t.asInstanceOf[UTF8String].split(space, -1)
    var cnt = 0
    var i = 0
    while (i < toks.length) { if (tokenSet.contains(toks(i))) cnt += 1; i += 1 }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenSet", tokenSet, "java.util.HashSet<UTF8String>")
    val spaceRef = ctx.addReferenceObj("space", space, "UTF8String")
    nullSafeCodeGen(ctx, ev, (t, _) => {
      val toks = ctx.freshName("toks")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |UTF8String[] $toks = $t.split($spaceRef, -1);
         |int $cnt = 0;
         |for (int $i = 0; $i < $toks.length; $i++) {
         |  if ($setRef.contains($toks[$i])) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): TokenSetCount =
    copy(text = l, tokens = r)
}

/** Indices of the `probes` nearest centroids (by cosine similarity)
  * for an array<double> vector, against a FOLDABLE literal centroid
  * matrix (array<array<double>>): a fused map-side fold that replaces
  * the crossJoin(centroids) + row_number window an expression-free
  * plan needs — that shape shuffles corpus x nCentroids rows through
  * a per-vector sort just to pick an argmax; this one is shuffle-free.
  * Ordering: similarity desc, centroid index asc (Double.compare, so
  * NaN sorts first like Spark's desc sort); a dimension-mismatched
  * centroid scores -Infinity (never wins). CodegenFallback: the
  * nCentroids x dims loop is the row's entire work.
  */
case class NearestCentroids(vec: Expression, centroids: Expression, probes: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(probes >= 1, "probes must be >= 1")

  override def left: Expression = vec
  override def right: Expression = centroids

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, centroids.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        if (centroids.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "nearest_centroids expects a foldable (literal) centroid matrix")
      case other => TypeCheckResult.TypeCheckFailure(
        s"nearest_centroids expects (array<double>, array<array<double>>), got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  @transient private lazy val cents: Array[Array[Double]] = {
    val ad = centroids.eval(InternalRow.empty).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }
  @transient private lazy val centNorms: Array[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum))

  override protected def nullSafeEval(v: Any, cs: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = cents.length
    var nx = 0.0
    var i = 0
    while (i < n) { val xi = x.getDouble(i); nx += xi * xi; i += 1 }
    val nxs = math.sqrt(nx)
    val sims = new Array[Double](m)
    var j = 0
    while (j < m) {
      val cj = cents(j)
      if (cj.length != n) sims(j) = Double.NegativeInfinity
      else {
        var dot = 0.0
        var i2 = 0
        while (i2 < n) { dot += x.getDouble(i2) * cj(i2); i2 += 1 }
        sims(j) = dot / (nxs * centNorms(j))
      }
      j += 1
    }
    val order = (0 until m).sortWith { (a, b) =>
      val c = java.lang.Double.compare(sims(a), sims(b))
      if (c != 0) c > 0 else a < b
    }
    new GenericArrayData(order.take(math.min(probes, m)).toArray)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCentroids =
    copy(vec = l, centroids = r)
}

/** Unit-normalize an array<double> (the cosine→inner-product
  * reduction every additive-decomposition index needs: on unit
  * vectors IP IS cosine, which is what lets PQ's per-subspace tables
  * sum to the full similarity). Zero vectors pass through as zeros —
  * NaN must not poison downstream aggregates. Codegen'd: runs inside
  * the corpus scan at index-build time.
  */
case class VecNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_normalize expects array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val xi = x.getDouble(i); s += xi * xi; i += 1 }
    val nrm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    if (nrm > 0.0) while (i < n) { out(i) = x.getDouble(i) / nrm; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double v = $a.getDouble($i); $s += v * v;
         |}
         |double $nrm = java.lang.Math.sqrt($s);
         |double[] $out = new double[$n];
         |if ($nrm > 0.0) {
         |  for (int $i = 0; $i < $n; $i++) { $out[$i] = $a.getDouble($i) / $nrm; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): VecNormalize =
    copy(child = c)
}

/** Product-quantization encode: split the vector into M contiguous
  * subvectors (M = codebook count; dsub = dims / M) and emit, per
  * subspace, the index of the L2-nearest codeword — the standard PQ
  * assignment (codewords minimize per-subspace reconstruction error,
  * so the ADC table sum approximates the full inner product). The
  * codebook rides in as a FOLDABLE literal `array<array<array<
  * double>>>` ([m][j][dsub]) decoded once per executor — no codebook
  * join, no corpus shuffle; the emitted array<int> of M small codes
  * IS the stored index (M bytes/vector at K<=256 in a production
  * layout vs 4*dims for floats). Ties break toward the lower
  * codeword index; a dims/codebook mismatch returns NULL (corrupt
  * embedding data must not encode plausibly). CodegenFallback like
  * [[NearestCentroids]]: the M*K*dsub loop is the row's entire work.
  */
case class PqEncode(vec: Expression, codebooks: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def left: Expression = vec
  override def right: Expression = codebooks

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, codebooks.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
        if (codebooks.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "pq_encode expects a foldable (literal) codebook tensor")
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects (array<double>, array<array<array<double>>>), got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true // null children OR shape mismatch
  override def prettyName: String = "pq_encode"

  @transient private lazy val books: Array[Array[Array[Double]]] = {
    val ms = codebooks.eval(InternalRow.empty).asInstanceOf[ArrayData]
    Array.tabulate(ms.numElements()) { m =>
      val ks = ms.getArray(m)
      Array.tabulate(ks.numElements())(j => ks.getArray(j).toDoubleArray())
    }
  }

  override protected def nullSafeEval(v: Any, cs: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val mCount = books.length
    if (mCount == 0) return null
    val dsub = books(0)(0).length
    if (x.numElements() != mCount * dsub) return null
    val codes = new Array[Int](mCount)
    var m = 0
    while (m < mCount) {
      val off = m * dsub
      val book = books(m)
      var best = 0
      var bestDist = Double.PositiveInfinity
      var j = 0
      while (j < book.length) {
        val cw = book(j)
        var dist = 0.0
        var i = 0
        while (i < dsub) {
          val d = x.getDouble(off + i) - cw(i)
          dist += d * d
          i += 1
        }
        if (dist < bestDist) { bestDist = dist; best = j }
        j += 1
      }
      codes(m) = best
      m += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
    copy(vec = l, codebooks = r)
}

/** Asymmetric-distance (ADC) score: given a vector's PQ codes
  * (array<int>, length M) and a QUERY's flattened distance table
  * (array<double>, length M*K: entry m*K + j = IP(query subvector m,
  * codeword j)), the approximate inner product is the table sum
  * `Σ_m table[m*K + codes[m]]` — M array reads per corpus row instead
  * of a dims-length dot product, which with unit vectors approximates
  * cosine. K is inferred per row (table.len / codes.len); a
  * non-divisible pair or out-of-range code returns NULL. This is THE
  * hot path of a PQ search (corpus × queries rows), so it implements
  * `doGenCode` and stays inside whole-stage codegen.
  */
case class PqAdcScore(codes: Expression, table: Expression)
    extends BinaryExpression {

  override def left: Expression = codes
  override def right: Expression = table

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, table.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score expects (array<int>, array<double>), got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null children OR shape mismatch
  override def prettyName: String = "pq_adc_score"

  override protected def nullSafeEval(c: Any, t: Any): Any = {
    val cd = c.asInstanceOf[ArrayData]
    val tb = t.asInstanceOf[ArrayData]
    val m = cd.numElements()
    val tn = tb.numElements()
    if (m == 0 || tn % m != 0) return null
    val k = tn / m
    var s = 0.0
    var i = 0
    while (i < m) {
      val code = cd.getInt(i)
      if (code < 0 || code >= k) return null
      s += tb.getDouble(i * k + code)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val m = ctx.freshName("m")
      val tn = ctx.freshName("tn")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val code = ctx.freshName("code")
      s"""
         |int $m = $c.numElements();
         |int $tn = $t.numElements();
         |if ($m == 0 || $tn % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $k = $tn / $m;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    int $code = $c.getInt($i);
         |    if ($code < 0 || $code >= $k) { ${ev.isNull} = true; break; }
         |    $s += $t.getDouble($i * $k + $code);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
    copy(codes = l, table = r)
}

/** Deflated (zlib level 6, raw/nowrap) byte length of a string's
  * UTF-8 encoding — the primitive under the classic compression-ratio
  * corpus-quality signal (boilerplate, template spam, and repeated
  * n-gram text compress far below prose; near-random noise compresses
  * above it), computable with zero dependencies via
  * `java.util.zip.Deflater`. Returns an EXACT LONG so aggregates over
  * a corpus (total compressed / total raw bytes) are integer sums —
  * deterministic under any partition order, which a double ratio's
  * float-summed avg() is not. The per-document ratio is the composed
  * column [[GraftFunctions.deflateRatio]] (len / octet_length).
  * Empty strings return 0; null stays null. The Deflater instance and
  * output buffer live per expression INSTANCE (one per task thread)
  * and are reset per row — the per-partition amortization a
  * mapPartitions codec batch would do, inside an expression that
  * composes with any plan. CodegenFallback: the deflate call IS the
  * row's work.
  *
  * Determinism note: output length is a property of the JVM's bundled
  * zlib at the chosen level — stable within an environment (specs and
  * the driver pin it here), but a cross-JVM-vendor pipeline should
  * treat thresholds as calibration, not constants.
  */
case class DeflateLen(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_len expects string, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  @transient private lazy val deflater =
    new java.util.zip.Deflater(6, true)
  @transient private var buf: Array[Byte] = _

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) return 0L
    if (buf == null || buf.length < 4096) buf = new Array[Byte](4096)
    deflater.reset()
    deflater.setInput(bytes)
    deflater.finish()
    var total = 0L
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      total += n
      if (n == 0 && !deflater.finished()) return null // cannot make progress
    }
    total
  }

  override protected def withNewChildInternal(c: Expression): DeflateLen =
    copy(child = c)
}

/** Jaro-Winkler similarity kernel, byte-level (exact for ASCII; for
  * the fuzzy-matching use cases here — catalog names, identifiers —
  * inputs are ASCII by construction). Top-level object with no
  * companion class, so scalac emits STATIC forwarders and generated
  * code can call `graft.functions.JaroWinklerKernel.similarity(a, b)`
  * directly.
  *
  * The exact formula is pinned to the de-facto standard shared by
  * DuckDB's built-in (rapidfuzz lineage) so oracles replay it
  * bit-for-bit (empirically verified on 250k real-name pairs):
  * match window `max(l1,l2)/2 - 1` (floored at 0), greedy
  * first-free-match scan, transpositions `t = mismatched aligned
  * pairs / 2`, `jaro = (m/l1 + m/l2 + (m-t)/m) / 3`, and the Winkler
  * prefix boost `jaro + p * 0.1 * (1 - jaro)` (common prefix `p <= 4`)
  * applied only when `jaro > 0.7`. Both-empty -> 1.0, one-empty -> 0.
  * IEEE operation order matches the reference implementations
  * left-to-right, so the double is reproducible cross-engine.
  */
object JaroWinklerKernel {
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s2(j) == s1(i)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    var sim = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (sim > 0.7) {
      var p = 0
      val pmax = math.min(4, math.min(l1, l2))
      while (p < pmax && s1(p) == s2(p)) p += 1
      sim += p * 0.1 * (1.0 - sim)
    }
    sim
  }
}

/** `graft_jaro_winkler(a, b)` — native codegen'd Jaro-Winkler string
  * similarity (see [[JaroWinklerKernel]] for the exact pinned
  * formula and its cross-engine reproducibility contract). The
  * entity-resolution scoring primitive: blocked candidate pairs are
  * scored inside whole-stage codegen, no UDF serialization.
  *
  * CONTRACT (also for SQL callers via ensureRegistered): the kernel
  * operates on raw UTF-8 BYTES. For ASCII input — the
  * catalog-name/identifier domain every driver query and oracle
  * uses — byte-level and character-level scores coincide. For
  * non-ASCII input the match window, lengths, and transpositions are
  * computed per byte, so multi-byte code points score differently
  * from a char-level Jaro-Winkler; callers matching non-ASCII names
  * should normalize/transliterate first (or treat the score as a
  * byte-shingle similarity, which is still a valid metric — just not
  * the textbook char one).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerKernel.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroWinkler = copy(left = l, right = r)
}

/** Hilbert-curve index of a 2-D point — the locality-tighter sibling
  * of [[graft.ops.Layout.zOrderKey]]'s Morton interleave: consecutive
  * Hilbert keys are always spatially ADJACENT (Morton takes quadrant-
  * boundary jumps), so range-clustered files get strictly tighter
  * per-file min/max spans in both dimensions (LayoutSpec measures
  * the contraction). The canonical xy2d bit-descent (Hilbert 1891;
  * the standard public-domain formulation): at each bit level take
  * the quadrant `(3·rx) xor ry`, then reflect+swap the frame when
  * ry = 0. The loop is per-row constant work over `bits` levels,
  * implemented as a codegen'd kernel so the 100 TB write path stays
  * inside whole-stage codegen — a foldLeft of when() columns would
  * blow up the expression tree 4× per level. Inputs must be
  * non-negative and < 2^bits (pmod/bucket wider domains first, as
  * with the Morton key).
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, "bits in [1, 31]")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hilbert_key expects (bigint, bigint), got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertKernel.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertKernel.xy2d($a, $b, $bits);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HilbertKey = copy(left = l, right = r)
}

/** The xy2d descent shared by interpreted eval and codegen. */
object HilbertKernel {
  def xy2d(xIn: Long, yIn: Long, bits: Int): Long = {
    var x = xIn; var y = yIn; var d = 0L
    val n1 = (1L << bits) - 1L
    var k = bits - 1
    while (k >= 0) {
      val rx = (x >> k) & 1L
      val ry = (y >> k) & 1L
      d += (1L << (2 * k)) * (3L * rx + ry - 2L * rx * ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n1 - x; y = n1 - y }
        val t = x; x = y; y = t
      }
      k -= 1
    }
    d
  }

  /** The inverse walk (canonical d2xy): LayoutSpec pins
    * `xy2d(d2xy(d)) == d` over full small grids. */
  def d2xy(dIn: Long, bits: Int): (Long, Long) = {
    var t = dIn; var x = 0L; var y = 0L
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2L)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4L
      s *= 2L
    }
    (x, y)
  }
}

/** Column-API and SQL registration for the native expressions. */
object GraftFunctions {

  private def intOf(e: Expression): Int =
    e.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  private def longOf(e: Expression): Long =
    e.eval(InternalRow.empty).asInstanceOf[Number].longValue()

  private def boolOf(e: Expression): Boolean =
    e.eval(InternalRow.empty).asInstanceOf[Boolean]

  /** SINGLE source of truth for every native function: name ->
    * expression builder. Both the session-registry path
    * ([[ensureRegistered]]) and the config-injected path
    * ([[GraftExtensions]]) iterate THIS list, so the two surfaces
    * cannot drift (round 1 and round 2 each shipped an injection gap
    * when they were maintained by hand; GraftExtensionsSpec pins the
    * parity).
    */
  val registry: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine_similarity" -> {
      case Seq(a, b) => CosineSimilarity(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_cosine_similarity(a, b): got ${other.size} args")
    },
    "graft_minhash_signature" -> {
      case Seq(c, n) => MinHashSignature(c, intOf(n))
      case other => throw new IllegalArgumentException(
        s"graft_minhash_signature(arr, numHashes): got ${other.size} args")
    },
    "graft_word_shingles" -> {
      case Seq(c, n) => WordShingles(c, intOf(n))
      case Seq(c, n, d) => WordShingles(c, intOf(n), boolOf(d))
      case other => throw new IllegalArgumentException(
        s"graft_word_shingles(text, k[, dedupe]): got ${other.size} args")
    },
    "graft_cut_token_spans" -> {
      case Seq(t, c, kk) => CutTokenSpans(t, c, intOf(kk))
      case other => throw new IllegalArgumentException(
        s"graft_cut_token_spans(text, cutStarts, k): got ${other.size} args")
    },
    "graft_top_element_freq" -> {
      case Seq(c) => TopElementFreq(c)
      case other => throw new IllegalArgumentException(
        s"graft_top_element_freq(arr): got ${other.size} args")
    },
    "graft_url_canonicalize" -> {
      case Seq(c) => UrlCanonicalize(c)
      case other => throw new IllegalArgumentException(
        s"graft_url_canonicalize(url): got ${other.size} args")
    },
    "graft_hyperplane_bucket" -> {
      case Seq(c, n) => HyperplaneBucket(c, intOf(n))
      case Seq(c, n, sd) => HyperplaneBucket(c, intOf(n), longOf(sd))
      case other => throw new IllegalArgumentException(
        s"graft_hyperplane_bucket(vec, planes[, seed]): got ${other.size} args")
    },
    "graft_topk_by_score" -> {
      case Seq(s, i, kk) => TopKByScore(s, i, intOf(kk))
      case other => throw new IllegalArgumentException(
        s"graft_topk_by_score(score, id, k): got ${other.size} args")
    },
    "graft_topk_by_score_str" -> {
      case Seq(s, i, kk) => TopKByScoreStr(s, i, intOf(kk))
      case other => throw new IllegalArgumentException(
        s"graft_topk_by_score_str(score, id, k): got ${other.size} args")
    },
    "graft_nearest_centroids" -> {
      case Seq(v, cs, p) => NearestCentroids(v, cs, intOf(p))
      case other => throw new IllegalArgumentException(
        s"graft_nearest_centroids(vec, centroids, probes): got ${other.size} args")
    },
    "graft_simhash32" -> {
      case Seq(t) => SimHash(t, 32)
      case other => throw new IllegalArgumentException(
        s"graft_simhash32(text): got ${other.size} args")
    },
    "graft_simhash64" -> {
      case Seq(t) => SimHash(t, 64)
      case other => throw new IllegalArgumentException(
        s"graft_simhash64(text): got ${other.size} args")
    },
    "graft_token_set_count" -> {
      case Seq(t, ts) => TokenSetCount(t, ts)
      case other => throw new IllegalArgumentException(
        s"graft_token_set_count(text, tokens): got ${other.size} args")
    },
    "graft_vector_sum" -> {
      case Seq(v) => VectorSum(v)
      case other => throw new IllegalArgumentException(
        s"graft_vector_sum(vec): got ${other.size} args")
    },
    "graft_int8_quantize" -> {
      case Seq(v) => Int8Quantize(v)
      case other => throw new IllegalArgumentException(
        s"graft_int8_quantize(vec): got ${other.size} args")
    },
    "graft_int8_dequantize" -> {
      case Seq(q) => Int8Dequantize(q)
      case other => throw new IllegalArgumentException(
        s"graft_int8_dequantize(q): got ${other.size} args")
    },
    "graft_int8_cosine" -> {
      case Seq(q, v) => Int8CosineSim(q, v)
      case other => throw new IllegalArgumentException(
        s"graft_int8_cosine(q, vec): got ${other.size} args")
    },
    "graft_deflate_len" -> {
      case Seq(t) => DeflateLen(t)
      case other => throw new IllegalArgumentException(
        s"graft_deflate_len(text): got ${other.size} args")
    },
    "graft_vec_normalize" -> {
      case Seq(v) => VecNormalize(v)
      case other => throw new IllegalArgumentException(
        s"graft_vec_normalize(vec): got ${other.size} args")
    },
    "graft_pq_encode" -> {
      case Seq(v, cb) => PqEncode(v, cb)
      case other => throw new IllegalArgumentException(
        s"graft_pq_encode(vec, codebooks): got ${other.size} args")
    },
    "graft_pq_adc_score" -> {
      case Seq(c, t) => PqAdcScore(c, t)
      case other => throw new IllegalArgumentException(
        s"graft_pq_adc_score(codes, table): got ${other.size} args")
    },
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its
    // own runtime row-group filtering but does not register them as
    // SQL functions — surfacing them here (same classes, no copies)
    // gives the dedup sidecar a distributed bloom build and a
    // codegen'd probe.
    "graft_bloom_filter_agg" -> {
      case Seq(c, n) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(c, n)
      case other => throw new IllegalArgumentException(
        s"graft_bloom_filter_agg(xxhash64Value, expectedItems): got ${other.size} args")
    },
    "graft_might_contain" -> {
      case Seq(b, v) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(b, v)
      case other => throw new IllegalArgumentException(
        s"graft_might_contain(bloomBytes, xxhash64Value): got ${other.size} args")
    },
    "graft_jaro_winkler" -> {
      case Seq(a, b) => JaroWinkler(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_jaro_winkler(a, b): got ${other.size} args")
    },
    "graft_hilbert_key" -> {
      case Seq(a, b, bits) => HilbertKey(a, b, intOf(bits))
      case other => throw new IllegalArgumentException(
        s"graft_hilbert_key(x, y, bits): got ${other.size} args")
    },
    "graft_bytes8_max" -> {
      case Seq(a, b) => Bytes8Max(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_bytes8_max(a, b): got ${other.size} args")
    },
    "graft_bytes8_max_agg" -> {
      case Seq(g) => Bytes8MaxAgg(g)
      case other => throw new IllegalArgumentException(
        s"graft_bytes8_max_agg(g): got ${other.size} args")
    },
  )

  /** Idempotently register the functions in a session's registry so
    * they are usable from both the Column API (call_function) and SQL.
    * Idempotence is checked against the registry itself (probing for
    * the first function) rather than any session-keyed cache.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(registry.head._1)))
      return
    registry.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  def minhashSignature(spark: SparkSession, arr: Column, numHashes: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_minhash_signature", arr,
      org.apache.spark.sql.functions.lit(numHashes))
  }

  def cosineSimilarity(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_cosine_similarity", a, b)
  }

  /** Codegen'd Hilbert-curve index (see [[HilbertKey]]). */
  def hilbertKey(spark: SparkSession, x: Column, y: Column,
                 bits: Int = 21): Column = {
    ensureRegistered(spark)
    call_function("graft_hilbert_key", x, y,
      org.apache.spark.sql.functions.lit(bits))
  }

  /** Codegen'd Jaro-Winkler similarity (see [[JaroWinkler]]). */
  def jaroWinkler(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_jaro_winkler", a, b)
  }

  /** Branchless packed-byte max (see [[Bytes8Max]]). */
  def bytes8Max(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_bytes8_max", a, b)
  }

  /** Packed-byte max-union aggregate (see [[Bytes8MaxAgg]]). */
  def bytes8MaxAgg(spark: SparkSession, g: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_bytes8_max_agg", g)
  }

  def wordShingles(spark: SparkSession, text: Column, k: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_word_shingles", text,
      org.apache.spark.sql.functions.lit(k))
  }

  /** Max multiplicity of any array element — see [[TopElementFreq]]. */
  def topElementFreq(spark: SparkSession, arr: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_top_element_freq", arr)
  }

  /** Every position's k-shingle (no dedup) — see [[WordShingles]]. */
  def wordShinglesAll(spark: SparkSession, text: Column, k: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_word_shingles", text,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(false))
  }

  /** Duplicate-span cutting tail (see [[CutTokenSpans]]): returns
    * struct<text_cut, n_spans, n_removed>. */
  def cutTokenSpans(spark: SparkSession, text: Column, cutStarts: Column,
                    k: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_cut_token_spans", text, cutStarts,
      org.apache.spark.sql.functions.lit(k))
  }

  def urlCanonicalize(spark: SparkSession, url: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_url_canonicalize", url)
  }

  def hyperplaneBucket(spark: SparkSession, vec: Column, planes: Int,
                       seed: Long = 42L): Column = {
    ensureRegistered(spark)
    call_function("graft_hyperplane_bucket", vec,
      org.apache.spark.sql.functions.lit(planes),
      org.apache.spark.sql.functions.lit(seed))
  }

  /** Partial top-k aggregate (see [[TopKByScore]]). */
  def topKByScore(spark: SparkSession, score: Column, id: Column, k: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_topk_by_score", score, id,
      org.apache.spark.sql.functions.lit(k))
  }

  /** String-id partial top-k aggregate (see [[TopKByScoreStr]]). */
  def topKByScoreStr(spark: SparkSession, score: Column, id: Column, k: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_topk_by_score_str", score, id,
      org.apache.spark.sql.functions.lit(k))
  }

  /** Map-side nearest-centroid assignment (see [[NearestCentroids]]);
    * `centroids` must be a literal column (e.g. typedLit of the
    * driver-resident centroid matrix). */
  def nearestCentroids(spark: SparkSession, vec: Column, centroids: Column,
                       probes: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_nearest_centroids", vec, centroids,
      org.apache.spark.sql.functions.lit(probes))
  }

  /** Fused 32-bit md5 SimHash (see [[SimHash]]). Uses the active
    * session for registration so pure-Column call sites work. */
  def simHash32(text: Column): Column = {
    ensureRegistered(SparkSession.active)
    call_function("graft_simhash32", text)
  }

  /** Fused 64-bit md5 SimHash (see [[SimHash]]) — the near-dup-join
    * signature width: 16-bit pigeonhole bands at maxHamming=3 drop the
    * unrelated-pair collision floor 256x vs 8-bit bands. */
  def simHash64(text: Column): Column = {
    ensureRegistered(SparkSession.active)
    call_function("graft_simhash64", text)
  }

  /** Count of whitespace tokens present in `tokens` (see
    * [[TokenSetCount]]). */
  def tokenSetCount(text: Column, tokens: Seq[String]): Column = {
    ensureRegistered(SparkSession.active)
    call_function("graft_token_set_count", text,
      org.apache.spark.sql.functions.typedLit(tokens))
  }

  /** Partial elementwise vector sum aggregate (see [[VectorSum]]):
    * returns struct<sum array<double>, n bigint>. */
  def vectorSum(spark: SparkSession, vec: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_vector_sum", vec)
  }

  /** Symmetric int8 scalar quantization (see [[Int8Quantize]]). */
  def int8Quantize(spark: SparkSession, vec: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_int8_quantize", vec)
  }

  /** Inverse of [[int8Quantize]] (see [[Int8Dequantize]]). */
  def int8Dequantize(spark: SparkSession, q: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_int8_dequantize", q)
  }

  /** Asymmetric int8-corpus x float-query cosine (see
    * [[Int8CosineSim]]). */
  def int8Cosine(spark: SparkSession, q: Column, vec: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_int8_cosine", q, vec)
  }

  /** Deflated UTF-8 byte length (see [[DeflateLen]]). */
  def deflateLen(spark: SparkSession, text: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_deflate_len", text)
  }

  /** Per-document deflate compression ratio (compressed / raw UTF-8
    * bytes; empty text is defined incompressible = 1.0). Both sides of
    * the division are exact integers — see [[DeflateLen]] for why the
    * primitive is a length, not a ratio. */
  def deflateRatio(spark: SparkSession, text: Column): Column = {
    import org.apache.spark.sql.functions.{octet_length, when, lit}
    when(octet_length(text) === 0, lit(1.0))
      .otherwise(deflateLen(spark, text).cast("double") /
        octet_length(text).cast("double"))
  }

  /** Unit-normalization (see [[VecNormalize]]). */
  def vecNormalize(spark: SparkSession, vec: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_vec_normalize", vec)
  }

  /** PQ code assignment (see [[PqEncode]]); `codebooks` must be a
    * literal column (typedLit of the driver-resident [m][j][dsub]
    * tensor). */
  def pqEncode(spark: SparkSession, vec: Column, codebooks: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_pq_encode", vec, codebooks)
  }

  /** ADC table-sum score (see [[PqAdcScore]]). */
  def pqAdcScore(spark: SparkSession, codes: Column, table: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_pq_adc_score", codes, table)
  }

  /** Distributed bloom-filter build over a LONG column (hash strings
    * with xxhash64 first); returns the serialized filter as binary.
    * `expectedItems` sizes the filter (capped by
    * spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits —
    * raise those confs for corpus-scale states). */
  def bloomFilterAgg(spark: SparkSession, value: Column,
                     expectedItems: Long): Column = {
    ensureRegistered(spark)
    call_function("graft_bloom_filter_agg", value,
      org.apache.spark.sql.functions.lit(expectedItems))
  }

  /** Codegen'd bloom probe: `bloom` must be a literal/foldable binary
    * (the sidecar bytes), `value` the xxhash64 of the probed key. */
  def mightContain(spark: SparkSession, bloom: Column, value: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_might_contain", bloom, value)
  }
}
