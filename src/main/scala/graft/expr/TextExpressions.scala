package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis runtime kernels (static forwarders for codegen) backing
  * the training-data-pipeline expressions: MinHash signatures, SimHash,
  * rolling-hash fingerprints, n-gram language id. All deterministic, no
  * external models (offline build).
  */
object TextRt {

  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit FNV-1a over a char range — the shingle hash. */
  def hashRange(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** MinHash signature over character shingles: numHashes affine
    * re-hashes of each shingle's base hash (one pass per document —
    * O(len·numHashes) with tight inner loop).
    */
  def minhash(text: UTF8String, shingle: Int, numHashes: Int): Array[Long] = {
    val s = text.toString
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (s.length < shingle) {
      val h0 = hashRange(s, 0, s.length)
      var j = 0
      while (j < numHashes) {
        val h = mix(h0 ^ (j * 0x9e3779b97f4a7c15L))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      return sig
    }
    var i = 0
    val end = s.length - shingle
    while (i <= end) {
      val h0 = hashRange(s, i, i + shingle)
      var j = 0
      while (j < numHashes) {
        val h = mix(h0 ^ (j * 0x9e3779b97f4a7c15L))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** 64-bit SimHash over whitespace tokens. */
  def simhash(text: UTF8String): Long = {
    val s = text.toString
    val counts = new Array[Int](64)
    var start = -1
    var i = 0
    val n = s.length
    while (i <= n) {
      val ws = i == n || Character.isWhitespace(s.charAt(i))
      if (!ws && start < 0) start = i
      else if (ws && start >= 0) {
        val h = mix(hashRange(s, start, i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        start = -1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Rolling polynomial fingerprint of the whole text (Rabin-Karp style,
    * base 257 mod 2^64) — the document fingerprint primitive.
    */
  def fingerprint(text: UTF8String): Long = {
    val s = text.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = h * 257L + s.charAt(i).toLong
      i += 1
    }
    mix(h)
  }

  // hoisted: String.split compiles a fresh Pattern per call for multi-char
  // regexes — these run once per ROW in codegen'd kernels
  private val WsPattern = java.util.regex.Pattern.compile("\\s+")
  private val NonLetterPattern = java.util.regex.Pattern.compile("[^\\p{L}]+")

  /** Exact word-level n-gram Jaccard similarity between two texts. */
  def ngramJaccard(a: UTF8String, b: UTF8String, n: Int): Double = {
    def grams(t: String): java.util.HashSet[Long] = {
      val toks = WsPattern.split(t).filter(_.nonEmpty)
      val set = new java.util.HashSet[Long]()
      var i = 0
      while (i + n <= toks.length) {
        var h = 0xcbf29ce484222325L
        var j = 0
        while (j < n) {
          val w = toks(i + j)
          var c = 0
          while (c < w.length) { h ^= w.charAt(c).toLong; h *= 0x100000001b3L; c += 1 }
          h ^= 0x1fL; h *= 0x100000001b3L
          j += 1
        }
        set.add(h)
        i += 1
      }
      set
    }
    val ga = grams(a.toString); val gb = grams(b.toString)
    if (ga.isEmpty && gb.isEmpty) return 1.0
    var inter = 0
    val it = ga.iterator()
    while (it.hasNext) if (gb.contains(it.next())) inter += 1
    val union = ga.size + gb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  // ---- language id: stopword-profile scoring (deterministic heuristic) ----

  private val profiles: Array[(String, java.util.HashSet[String])] = Array(
    "en" -> Array("the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "are", "this", "you"),
    "de" -> Array("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "von", "sie", "auf", "werden", "im"),
    "fr" -> Array("le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour", "qui", "sur", "pas", "vous"),
    "es" -> Array("el", "la", "los", "las", "que", "de", "en", "una", "por", "con", "para", "del", "se", "es"),
    "pt" -> Array("que", "uma", "para", "com", "os", "das", "dos", "em", "um", "se", "mais", "como", "foi", "por"),
    "ru" -> Array("и", "в", "не", "на", "что", "это", "как", "он", "по", "из", "она", "так", "его", "за")
  ).map { case (l, ws) =>
    val s = new java.util.HashSet[String]()
    ws.foreach(s.add)
    (l, s)
  }

  /** Best-scoring language by stopword hit ratio; "und" (undetermined)
    * below a minimal evidence threshold — mirrors the n-gram-heuristic
    * approach used by web-scale pipelines.
    */
  def langId(text: UTF8String): UTF8String = {
    // Locale.ROOT: default-locale lowercasing is non-deterministic across
    // executors (Turkish dotless-ı breaks the en stopwords "is"/"it")
    val toks = NonLetterPattern
      .split(text.toString.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)
    if (toks.isEmpty) return UTF8String.fromString("und")
    var bestLang = "und"
    var bestHits = 0
    var i = 0
    while (i < profiles.length) {
      val (lang, set) = profiles(i)
      var hits = 0
      var t = 0
      while (t < toks.length) {
        if (set.contains(toks(t))) hits += 1
        t += 1
      }
      if (hits > bestHits) { bestHits = hits; bestLang = lang }
      i += 1
    }
    if (bestHits * 20 < toks.length) UTF8String.fromString("und") // <5% evidence
    else UTF8String.fromString(bestLang)
  }
}

object HStore {
  /** Faithful port of OGRHStoreGetValue
    * (`/root/reference/gdal/ogr/swq_op_general.cpp:107-242`): `k => v`
    * pairs with optional double-quoting and backslash escapes; returns
    * null for absent keys or malformed input (like the reference's NULL).
    */
  def getValue(hstore: String, searchedKey: String): String = {
    var pos = 0
    val n = hstore.length

    // returns next position after separator, or -1 invalid; `end` = token end
    def checkEnd(p0: Int, isKey: Boolean): Int = {
      var p = p0 + 1
      while (p < n) {
        val c = hstore.charAt(p)
        if (c == ' ') p += 1
        else if (isKey && c == '=' && p + 1 < n && hstore.charAt(p + 1) == '>') return p + 2
        else if (!isKey && c == ',') return p + 1
        else return -1
      }
      p
    }

    /** (token, nextPos) or null. */
    def nextString(start: Int, isKey: Boolean): (String, Int) = {
      val sb = new StringBuilder
      var started = false
      var inString = false
      var p = start
      while (p < n) {
        val c = hstore.charAt(p)
        if (inString) {
          if (c == '"') {
            val np = checkEnd(p, isKey)
            return if (np < 0) null else (sb.toString, np)
          } else if (c == '\\') {
            p += 1
            if (p >= n) return null
            sb.append(hstore.charAt(p))
          } else sb.append(c)
        } else {
          if (c == ' ') {
            if (started) {
              val np = checkEnd(p, isKey)
              return if (np < 0) null else (sb.toString, np)
            }
          } else if (isKey && c == '=' && p + 1 < n && hstore.charAt(p + 1) == '>') {
            if (started) return (sb.toString, p + 2)
          } else if (!isKey && c == ',') {
            if (started) return (sb.toString, p + 1)
          } else if (c == '"') {
            sb.clear() // reference resets the token start at a quote
            started = true
            inString = true
          } else {
            started = true
            sb.append(c)
          }
        }
        p += 1
      }
      if (!inString && started) (sb.toString, p) else null
    }

    while (pos < n) {
      val k = nextString(pos, isKey = true)
      if (k == null || k._2 >= n) return null
      val v = nextString(k._2, isKey = false)
      if (v == null) return null
      if (k._1 == searchedKey) return v._1
      pos = v._2
      if (pos >= n) return null
    }
    null
  }
}

/** hstore_get_value(hstore, key) -> string (null on absent/invalid) */
case class HStoreGetValue(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(h: Any, k: Any): Any = {
    val v = HStore.getValue(h.asInstanceOf[UTF8String].toString,
      k.asInstanceOf[UTF8String].toString)
    if (v == null) null else UTF8String.fromString(v)
  }
  override def nullable: Boolean = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (h, k) => {
      s"""org.apache.spark.unsafe.types.UTF8String ${ev.value}Tmp =
         |  graft.expr.HStoreRt.getValue($h, $k);
         |if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}Tmp; }""".stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "hstore_get_value"
}

/** Codegen shim (UTF8String in/out, null for missing). */
object HStoreRt {
  def getValue(h: UTF8String, k: UTF8String): UTF8String = {
    val v = HStore.getValue(h.toString, k.toString)
    if (v == null) null else UTF8String.fromString(v)
  }
}

/** minhash_sig(text, shingleSize, numHashes) -> array<long> */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any, s: Any, n: Any): Any =
    new GenericArrayData(TextRt.minhash(t.asInstanceOf[UTF8String], s.asInstanceOf[Int], n.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s, n) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.expr.TextRt.minhash($t, $s, $n))")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "minhash_sig"
}

/** simhash64(text) -> long */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any): Any = TextRt.simhash(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.TextRt.simhash($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** doc_fingerprint(text) -> long */
case class DocFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any): Any = TextRt.fingerprint(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.TextRt.fingerprint($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "doc_fingerprint"
}

/** lang_id(text) -> string */
case class LangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any): Any = TextRt.langId(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.TextRt.langId($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "lang_id"
}

/** ngram_jaccard(a, b, n) -> double */
case class NgramJaccard(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any, n: Any): Any =
    TextRt.ngramJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, n) => s"graft.expr.TextRt.ngramJaccard($a, $b, $n)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "ngram_jaccard"
}

/** hamming64(a, b) -> int */
case class Hamming64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextRt.hamming(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "hamming64"
}
