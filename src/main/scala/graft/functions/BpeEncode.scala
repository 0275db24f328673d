package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Production-size BPE application — `bpe_encode(text, merges)` — greedy
  * rank-priority byte-pair-encoding of a document against a learned merge
  * table (Sennrich et al. 2016; the sequence-level formulation is Gage 1994,
  * and space-inclusive merges are the byte-level-BPE convention of GPT-2,
  * Radford et al. 2019, whose vocabularies carry tokens like `" the"`).
  *
  * `merges` is the RANKED merge list — element r (0-based; lower = higher
  * priority) is `"left␟right"` with `␟` = U+001F, the engine's BPE wire
  * sentinel (t18/t21/t23's oracle convention; tokens never contain it).
  * The result is the document's token sequence: initial tokens are the
  * text's code points, and merges apply in rank-priority order — always
  * the lowest-ranked pair present anywhere in the sequence, leftmost site
  * first — until no listed pair remains. Single-space tokens are dropped
  * from the output (t21's contract: the encoded stream, not the
  * whitespace), but merged tokens CONTAINING spaces are kept.
  *
  * Bit-equality contract (spec'd in BpeEncodeSpec): for a CAUSALLY
  * CONSISTENT merge list — each side of merge r is a single code point or
  * the output of an earlier merge, which every iteratively-trained list
  * satisfies by construction — this greedy application equals the
  * rank-chained single-pass `replace` formulation t21 demonstrates (and
  * the DuckDB oracle replays): applying rank r cannot create a site of any
  * rank ≤ r (the merged token is born at rank r, so pairs containing it
  * rank strictly later; an overlapping same-rank site is consumed by the
  * leftmost-first scan), hence rank order + leftmost order is exactly one
  * left-to-right non-overlapping pass per rank. Duplicate pairs later in
  * the list are dead by the same argument and are ignored (first rank
  * wins). NULL on either input yields NULL; a malformed merge element
  * (missing/extra sentinel, empty side, NULL element) refuses loudly.
  *
  * Why an Expression (SURVEY.md §2.10 preference (b)): t21's chained
  * `replace` columns are exactly right at its 20-merge demonstration but
  * do not survive a production vocabulary — ~32 k merges would be 32 k
  * chained string-rewrite columns (codegen falls over on expression-tree
  * depth long before that) and O(vocab × document) full-string passes.
  * Here the merge table folds ONCE into a [[BpeCodec]] (rank map + heap
  * encoder, `ctx.addReferenceObj` — the [[PhraseCount]] pattern, and the
  * same reference-object trick Spark's own RegExpReplace uses for its
  * compiled pattern), and each row pays one O(L log L) greedy pass
  * regardless of vocabulary size — the standard tokenizer inner loop. */
case class BpeEncode(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode requires (string, array<string>), got (${l.sql}, ${r.sql})")
    }

  /** The codec is built ONCE when the merge table is foldable (the engine's
    * only calling shape: the learned list as a literal / broadcast-folded
    * array), so the per-row cost is the encode loop alone. A non-foldable
    * merges column still evaluates correctly through the per-row slow path. */
  @transient private lazy val staticCodec: Option[BpeCodec] =
    if (right.foldable) {
      Option(right.eval(null)).map(m => BpeCodec.fromArray(m.asInstanceOf[ArrayData]))
    } else None

  override def nullSafeEval(text: Any, merges: Any): Any = {
    val codec = staticCodec.getOrElse(
      BpeCodec.fromArray(merges.asInstanceOf[ArrayData]))
    codec.encode(text.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    staticCodec match {
      case Some(codec) =>
        val ref = ctx.addReferenceObj("bpeCodec", codec, classOf[BpeCodec].getName)
        nullSafeCodeGen(ctx, ev, (text, _) => s"${ev.value} = $ref.encode($text);")
      case None =>
        nullSafeCodeGen(ctx, ev, (text, merges) =>
          s"${ev.value} = graft.functions.BpeCodec.fromArray($merges).encode($text);")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bpe_encode"
}

/** Byte-level BPE application — `bpe_encode_bytes(payload, merges)` — the
  * GPT-2 production form (Radford et al. 2019, `bytes_to_unicode`): the
  * input is BINARY, every byte 0–255 is first remapped to a single printable
  * code point (bytes 33–126, 161–172, 174–255 keep their own code point; the
  * 68 non-printables map in byte order to 256–323, so space → U+0120 `Ġ` and
  * newline → U+010A `Ċ` — the characters GPT-2 vocabularies are famous for),
  * and the SAME greedy rank-priority merge loop as [[BpeEncode]] then runs
  * over the remapped code points. Nothing is dropped from the output (the
  * byte-level convention: the token stream concatenates back to the exact
  * input bytes), and `merges` is expressed in the REMAPPED alphabet — which
  * is what a trained byte-level vocabulary is.
  *
  * Word-memo fast path (the lru_cache of GPT-2's reference encoder): when
  * every merge is confined to a single pre-token — `Ġ` appears in no right
  * side and only at position 0 of a left side, which any list trained on
  * `Ġword` pre-tokens satisfies by construction — pre-token boundaries
  * (before each `Ġ`) are walls no merge site can cross, so the document
  * splits at them and each pre-token encodes independently through the
  * bounded per-thread memo. A list with space-crossing merges (e.g. trained
  * on raw sequences) falls back to one whole-sequence greedy pass.
  *
  * Bit-equality contract: identical to [[BpeEncode]]'s (greedy == the
  * rank-chained single-pass replace the DuckDB oracle replays, for causally
  * consistent lists), over the remapped alphabet — the remap is a bijection
  * byte → code point, so the causal argument is untouched by it. */
case class BpeEncodeBytes(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode_bytes requires (binary, array<string>), got (${l.sql}, ${r.sql})")
    }

  @transient private lazy val staticCodec: Option[BpeCodec] =
    if (right.foldable) {
      Option(right.eval(null)).map(m => BpeCodec.fromArray(m.asInstanceOf[ArrayData]))
    } else None

  override def nullSafeEval(payload: Any, merges: Any): Any = {
    val codec = staticCodec.getOrElse(
      BpeCodec.fromArray(merges.asInstanceOf[ArrayData]))
    codec.encodeBytes(payload.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    staticCodec match {
      case Some(codec) =>
        val ref = ctx.addReferenceObj("bpeCodec", codec, classOf[BpeCodec].getName)
        nullSafeCodeGen(ctx, ev, (payload, _) => s"${ev.value} = $ref.encodeBytes($payload);")
      case None =>
        nullSafeCodeGen(ctx, ev, (payload, merges) =>
          s"${ev.value} = graft.functions.BpeCodec.fromArray($merges).encodeBytes($payload);")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncodeBytes =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bpe_encode_bytes"
}

/** A compiled merge table: two-level rank map (left-token → right-token →
  * rank, no per-lookup key allocation) + the greedy encoder. Serializable
  * so `addReferenceObj` ships it once per executor; the maps rebuild
  * lazily on first use there. */
final class BpeCodec(private val pairs: Array[(String, String)]) extends Serializable {

  /** left → (right → rank); FIRST rank wins on duplicates (a later
    * duplicate can never fire — its sites were consumed at the first rank). */
  @transient private lazy val ranks: java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
    var r = 0
    while (r < pairs.length) {
      val (a, b) = pairs(r)
      val inner = m.computeIfAbsent(a, _ => new java.util.HashMap[String, Integer]())
      if (!inner.containsKey(b)) inner.put(b, Integer.valueOf(r))
      r += 1
    }
    m
  }

  /** True when no merge side contains a space: spaces are then walls the
    * greedy pass can never cross, so documents split into words that encode
    * independently — which unlocks the per-word memo below (the lru_cache of
    * GPT-2's reference encoder): under a Zipf corpus almost every word is a
    * repeat, so the amortized cost approaches O(distinct words). */
  @transient private lazy val wordLevel: Boolean =
    pairs.forall { case (a, b) => a.indexOf(' ') < 0 && b.indexOf(' ') < 0 }

  /** Per-thread bounded word memo (word → encoded tokens). Thread-local
    * because codegen evaluates on many task threads; bounded so a
    * high-cardinality vocabulary cannot hold executor memory. */
  @transient private lazy val wordCache: ThreadLocal[java.util.LinkedHashMap[String, Array[String]]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[String]]): Boolean =
          size() > BpeCodec.WordCacheCap
      })

  private def rankOf(a: String, b: String): Int = {
    val inner = ranks.get(a)
    if (inner == null) return -1
    val r = inner.get(b)
    if (r == null) -1 else r.intValue()
  }

  /** Greedy rank-priority merge of one token run (the standard heap inner
    * loop): a doubly-linked list over the initial code-point tokens and a
    * primitive min-heap of (rank, leftmost-position) candidate sites.
    * Stale heap entries (their site was consumed or its tokens changed) are
    * detected by re-ranking on pop — rank↔pair is one-to-one, so a matching
    * rank IS the same pair. O(L log L): each merge pushes ≤ 2 sites. */
  private def greedy(s: String, out: java.util.ArrayList[String],
      dropSpaces: Boolean): Unit = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) return
    val tok = new Array[String](n)
    var i = 0
    while (i < n) { tok(i) = new String(Character.toChars(cps(i))); i += 1 }
    if (n > 1) {
      val next = Array.tabulate(n)(_ + 1)
      val prev = Array.tabulate(n)(_ - 1)
      val alive = Array.fill(n)(true)
      val heap = new LongMinHeap(n)
      i = 0
      while (i < n - 1) {
        val r = rankOf(tok(i), tok(i + 1))
        if (r >= 0) heap.push((r.toLong << 32) | i.toLong)
        i += 1
      }
      while (heap.nonEmpty) {
        val v = heap.pop()
        val r = (v >>> 32).toInt
        val p = (v & 0xffffffffL).toInt
        if (alive(p)) {
          val q = next(p)
          if (q < n && rankOf(tok(p), tok(q)) == r) {
            tok(p) = tok(p) + tok(q)
            alive(q) = false
            val k = next(q)
            next(p) = k
            if (k < n) prev(k) = p
            val pl = prev(p)
            if (pl >= 0) {
              val rl = rankOf(tok(pl), tok(p))
              if (rl >= 0) heap.push((rl.toLong << 32) | pl.toLong)
            }
            if (k < n) {
              val rk = rankOf(tok(p), tok(k))
              if (rk >= 0) heap.push((rk.toLong << 32) | p.toLong)
            }
          }
        }
      }
      i = 0
      while (i < n) {
        if (alive(i) && !(dropSpaces && tok(i) == " ")) out.add(tok(i))
        i += 1
      }
    } else if (!(dropSpaces && tok(0) == " ")) out.add(tok(0))
  }

  private def encodeWord(w: String): Array[String] = {
    val cache = wordCache.get()
    val hit = cache.get(w)
    if (hit != null) return hit
    val out = new java.util.ArrayList[String](w.length)
    greedy(w, out, dropSpaces = false)
    val arr = out.toArray(new Array[String](out.size()))
    cache.put(w, arr)
    arr
  }

  /** True when every merge stays inside one byte-level PRE-TOKEN (`Ġ` =
    * U+0120, the remapped space, in no right side and only leading a left
    * side) — then boundaries before each `Ġ` are walls and the per-pre-token
    * memo applies, exactly the GPT-2 reference encoder's cache discipline. */
  @transient private lazy val preTokenLevel: Boolean =
    pairs.forall { case (a, b) =>
      b.indexOf(BpeCodec.RemappedSpace) < 0 && a.indexOf(BpeCodec.RemappedSpace, 1) < 0
    }

  private def encodePreToken(w: String): Array[String] = {
    val cache = wordCache.get()
    val hit = cache.get(w)
    if (hit != null) return hit
    val out = new java.util.ArrayList[String](w.length)
    greedy(w, out, dropSpaces = false)
    val arr = out.toArray(new Array[String](out.size()))
    cache.put(w, arr)
    arr
  }

  /** Byte-level entry: remap (bijective, [[BpeCodec.ByteToChar]]) then the
    * same greedy loop; no token is dropped. */
  def encodeBytes(payload: Array[Byte]): GenericArrayData = {
    val n = payload.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) { sb.append(BpeCodec.ByteToChar(payload(i) & 0xff)); i += 1 }
    val s = sb.toString
    val out = new java.util.ArrayList[String](math.max(8, n / 2))
    if (preTokenLevel) {
      // boundaries BEFORE each Ġ are walls: encode pre-token by pre-token
      var start = 0
      i = 1
      while (i <= s.length) {
        if (i == s.length || s.charAt(i) == BpeCodec.RemappedSpace) {
          val toks = encodePreToken(s.substring(start, i))
          var j = 0
          while (j < toks.length) { out.add(toks(j)); j += 1 }
          start = i
        }
        i += 1
      }
    } else {
      greedy(s, out, dropSpaces = false)
    }
    val res = new Array[Any](out.size())
    var j = 0
    while (j < res.length) { res(j) = UTF8String.fromString(out.get(j)); j += 1 }
    new GenericArrayData(res)
  }

  def encode(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[String](math.max(8, s.length / 2))
    if (wordLevel) {
      // spaces are walls: encode word-by-word through the memo; the walls
      // themselves are exactly the single-space tokens the output drops
      var start = 0
      var i = 0
      val n = s.length
      while (i <= n) {
        if (i == n || s.charAt(i) == ' ') {
          if (i > start) {
            val toks = encodeWord(s.substring(start, i))
            var j = 0
            while (j < toks.length) { out.add(toks(j)); j += 1 }
          }
          start = i + 1
        }
        i += 1
      }
    } else {
      greedy(s, out, dropSpaces = true)
    }
    val res = new Array[Any](out.size())
    var j = 0
    while (j < res.length) { res(j) = UTF8String.fromString(out.get(j)); j += 1 }
    new GenericArrayData(res)
  }
}

object BpeCodec {
  val Sep: Char = '\u001F'
  private[functions] val WordCacheCap = 16384

  /** GPT-2's `bytes_to_unicode` (Radford et al. 2019, public reference
    * implementation): printable bytes 33–126 / 161–172 / 174–255 keep their
    * code point; the remaining 68 bytes map in byte order to 256–323.
    * Bijective byte → code point, so token streams concatenate back to the
    * exact input bytes. Space (32) lands on U+0120 `Ġ`, newline on U+010A. */
  val ByteToChar: Array[Char] = {
    val a = new Array[Char](256)
    var k = 0
    var b = 0
    while (b < 256) {
      if ((b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174 && b <= 255)) {
        a(b) = b.toChar
      } else {
        a(b) = (256 + k).toChar
        k += 1
      }
      b += 1
    }
    a
  }

  /** `Ġ` — where byte 0x20 lands; the byte-level pre-token boundary marker. */
  val RemappedSpace: Char = ByteToChar(' '.toInt)

  /** Remap a string's UTF-8 bytes through [[ByteToChar]] — how a byte-level
    * working set (and its trained merge alphabet) is built from text. */
  def remapUtf8(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(ByteToChar(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** Parse the wire-format merge table (`"left␟right"` per rank). Loud on
    * malformed elements — a silent skip would encode with a DIFFERENT
    * vocabulary than the caller trained. */
  def fromArray(merges: ArrayData): BpeCodec = {
    val n = merges.numElements()
    val pairs = new Array[(String, String)](n)
    var i = 0
    while (i < n) {
      require(!merges.isNullAt(i),
        s"bpe_encode: merge table element $i is NULL")
      val s = merges.getUTF8String(i).toString
      val at = s.indexOf(Sep)
      require(at > 0 && at < s.length - 1 && s.indexOf(Sep, at + 1) < 0,
        s"bpe_encode: merge element $i is not 'left\\u001Fright': '$s'")
      pairs(i) = (s.substring(0, at), s.substring(at + 1))
      i += 1
    }
    new BpeCodec(pairs)
  }
}

/** Minimal growable primitive long min-heap (binary). Avoids the boxing a
  * `PriorityQueue[java.lang.Long]` would pay per candidate site in the
  * per-row hot loop. */
private[functions] final class LongMinHeap(initialCapacity: Int) {
  private var a = new Array[Long](math.max(8, initialCapacity))
  private var n = 0

  def nonEmpty: Boolean = n > 0

  def push(v: Long): Unit = {
    if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
    a(n) = v
    var i = n
    n += 1
    while (i > 0) {
      val p = (i - 1) >> 1
      if (a(p) <= a(i)) return
      val t = a(p); a(p) = a(i); a(i) = t
      i = p
    }
  }

  def pop(): Long = {
    val top = a(0)
    n -= 1
    a(0) = a(n)
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      if (l >= n) done = true
      else {
        val c = if (l + 1 < n && a(l + 1) < a(l)) l + 1 else l
        if (a(i) <= a(c)) done = true
        else {
          val t = a(i); a(i) = a(c); a(c) = t
          i = c
        }
      }
    }
    top
  }
}

/** The matching trainer — N rounds of weighted pair count → argmax →
  * left-to-right non-overlapping re-encode over a (sequence, weight)
  * working set (t23's loop, as a local function of the already-aggregated
  * working set). Deterministic and mirrored operation-for-operation by the
  * DuckDB oracle's unrolled MATERIALIZED CTE rounds: pair counts include
  * overlapping adjacencies, and the argmax tie-breaks (count DESC, pair-key
  * ASC) — the pair key being `left␟right`, compared bytewise, which for the
  * engine's [ -] working sets equals Java String order. */
object BpeTrain {

  /** @param weighted (sequence, weight) working set — e.g. the corpus's
    *                 weighted word vocabulary, or weighted adjacent-word
    *                 bigrams when space-crossing merges are wanted
    * @return ranked merges, ≤ rounds (shorter iff the set exhausts first) */
  def train(weighted: Seq[(String, Long)], rounds: Int): Seq[(String, String)] = {
    val seqs = weighted.map { case (s, w) =>
      (s.codePoints().toArray.map(cp => new String(Character.toChars(cp))), w)
    }.toArray
    val learned = Seq.newBuilder[(String, String)]
    var state = seqs
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      state.foreach { case (toks, w) =>
        var i = 0
        while (i < toks.length - 1) {
          val k = toks(i) + BpeCodec.Sep + toks(i + 1)
          counts.update(k, counts.getOrElse(k, 0L) + w)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var bestKey: String = null
        var bestCnt = Long.MinValue
        counts.foreach { case (k, c) =>
          if (c > bestCnt || (c == bestCnt && k.compareTo(bestKey) < 0)) {
            bestKey = k; bestCnt = c
          }
        }
        val at = bestKey.indexOf(BpeCodec.Sep)
        val (a, b) = (bestKey.substring(0, at), bestKey.substring(at + 1))
        learned += ((a, b))
        state = state.map { case (toks, w) =>
          (mergeOnce(toks, a, b), w)
        }
        r += 1
      }
    }
    learned.result()
  }

  /** One left-to-right non-overlapping merge pass (= one sentinel `replace`
    * on the ␟␟-encoded form, the oracle's spelling). */
  private[functions] def mergeOnce(toks: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == a && toks(i + 1) == b) {
        out += (a + b)
        i += 2
      } else {
        out += toks(i)
        i += 1
      }
    }
    out.result()
  }
}
