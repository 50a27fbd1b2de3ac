package graft.sources

import java.io.{DataInputStream, EOFException, InputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.{Charset, StandardCharsets}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native reader for uncompressed `.sas7bdat` datasets — the SAS boundary
  * the reference crosses by driving a remote SAS process (`wrds2pg/sas/`,
  * api.py:219-234) and exporting; reading the binary format directly
  * removes the export step entirely.
  *
  * The on-disk layout follows the community-documented sas7bdat format
  * (reverse-engineered and published; independently implemented by
  * pandas.read_sas, parso and readstat): a header carrying alignment /
  * endianness / page geometry, then fixed-size pages whose subheaders
  * (identified by signature) describe row size, column count, a shared
  * text heap, and per-column name/offset/length/type/format vectors; rows
  * are fixed-width records packed on `mix` pages (after the 8-aligned
  * subheader-pointer array) and `data` pages. Both 32-bit and 64-bit
  * variants, either endianness, truncated (3–7 byte) numerics, and the
  * DATE/DATETIME format→type conversions (SAS epoch 1960-01-01) are
  * handled. Both compressed layouts are decoded natively — RLE
  * (COMPRESS=CHAR, "SASYZCRL") and RDC (COMPRESS=BINARY, "SASYZCR2") —
  * compressed rows ride as per-row page subheaders. Fixtures are
  * validated against pandas.read_sas (an independent reader) before the
  * Scala spec pins values — see tools/make_sas7bdat_fixtures.py.
  *
  * ==Scale shape==
  * SAS datasets are single sequential streams (no internal split points
  * without decoding every page chain), so parallelism is PER FILE — a SAS
  * library directory of datasets reads as one task per file, each
  * streaming pages through a fixed `pageSize` buffer (never whole-file in
  * memory). That matches how the format is produced (one exported table
  * per file) and how the reference consumes it (per-table transfer).
  */
object Sas7bdat {

  private val Magic: Array[Byte] = Array(
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0xc2, 0xea, 0x81, 0x60,
    0xb3, 0x14, 0x11, 0xcf, 0xbd, 0x92, 0x08, 0x00,
    0x09, 0xc7, 0x31, 0x8c, 0x18, 0x1f, 0x10, 0x11).map(_.toByte)

  // page types after masking with 0xFF00
  private val PageMeta = 0x0000
  private val PageData = 0x0100
  private val PageMix = 0x0200
  private val PageAmd = 0x0400
  private val PageMeta2 = 0x4000

  /** SAS format names whose numeric values are days / seconds since
    * 1960-01-01 (the published SAS intervals list). */
  private val DateFormats = Set(
    "DATE", "DAY", "DDMMYY", "DOWNAME", "JULDAY", "JULIAN", "MMDDYY",
    "MMYY", "MMYYC", "MMYYD", "MMYYP", "MMYYS", "MONNAME", "MONTH",
    "MONYY", "QTR", "QTRR", "NENGO", "WEEKDATE", "WEEKDATX", "WEEKDAY",
    "WEEKV", "WORDDATE", "WORDDATX", "YEAR", "YYMM", "YYMMC", "YYMMD",
    "YYMMP", "YYMMS", "YYMMN", "YYMON", "YYMMDD", "YYQ", "YYQC", "YYQD",
    "YYQP", "YYQS", "YYQN", "YYQR", "YYQRC", "YYQRD", "YYQRP", "YYQRS",
    "YYQRN", "E8601DA", "B8601DA")
  private val DatetimeFormats = Set(
    "DATETIME", "DTWKDATX", "B8601DN", "B8601DT", "B8601DX", "B8601DZ",
    "B8601LX", "E8601DN", "E8601DT", "E8601DX", "E8601DZ", "E8601LX",
    "DATEAMPM", "DTDATE", "DTMONYY", "DTYEAR", "TOD", "MDYAMPM")

  private val SasEpochDays = 3653L          // 1960-01-01 → 1970-01-01
  private val SasEpochSeconds = 315619200L

  final case class SasColumn(
      name: String, dataOffset: Int, dataLength: Int, isNumeric: Boolean,
      format: String) {
    def dataType: DataType =
      if (!isNumeric) StringType
      else if (DateFormats.contains(format)) DateType
      else if (DatetimeFormats.contains(format)) TimestampType
      else DoubleType
  }

  final case class SasMeta(
      u64: Boolean, littleEndian: Boolean, encoding: Charset,
      headerSize: Int, pageSize: Int, pageCount: Long,
      rowLength: Int, rowCount: Long, mixPageRowCount: Long,
      columns: Seq[SasColumn], rleCompressed: Boolean = false,
      rdcCompressed: Boolean = false) {
    def compressed: Boolean = rleCompressed || rdcCompressed
    def schema: StructType =
      StructType(columns.map(c => StructField(c.name, c.dataType, nullable = true)))
  }

  // ----------------------------------------------------------------- bytes

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    new DataInputStream(in).readFully(buf)
    buf
  }

  private final class B(bytes: Array[Byte], little: Boolean) {
    private def order = if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    def u2(off: Int): Int =
      ByteBuffer.wrap(bytes, off, 2).order(order).getShort & 0xffff
    def u4(off: Int): Long =
      ByteBuffer.wrap(bytes, off, 4).order(order).getInt & 0xffffffffL
    def u8(off: Int): Long = ByteBuffer.wrap(bytes, off, 8).order(order).getLong
    def uint(off: Int, len: Int): Long =
      if (len == 8) u8(off) else if (len == 4) u4(off) else u2(off)
    def raw(off: Int, len: Int): Array[Byte] = bytes.slice(off, off + len)
    /** SAS numerics may be stored truncated to 3–7 bytes: the LOW-order
      * mantissa bytes are dropped, so the stored bytes are the most
      * significant end of the IEEE double. */
    def num(off: Int, len: Int): Double = {
      val full = new Array[Byte](8)
      if (little) System.arraycopy(bytes, off, full, 8 - len, len)
      else System.arraycopy(bytes, off, full, 0, len)
      ByteBuffer.wrap(full).order(order).getDouble
    }
  }

  // ---------------------------------------------------------------- header

  /** Header encoding byte → charset, following the community-documented
    * code table (the same map pandas.io.sas.sas_constants.encoding_names
    * publishes; names translated to their canonical JVM charset spellings).
    * An encoding the JVM cannot provide fails LOUDLY — silently decoding
    * Cyrillic as UTF-8 corrupts every string downstream. Unknown codes
    * keep the historical UTF-8 default (code 20, and files with the byte
    * unset). */
  private val EncodingNames: Map[Int, String] = Map(
    20 -> "UTF-8", 29 -> "ISO-8859-1", 30 -> "ISO-8859-2",
    31 -> "ISO-8859-3", 32 -> "ISO-8859-4", 33 -> "ISO-8859-5",
    34 -> "ISO-8859-6", 35 -> "ISO-8859-7", 36 -> "ISO-8859-8",
    37 -> "ISO-8859-9", 39 -> "x-IBM874", 40 -> "ISO-8859-15",
    41 -> "IBM437", 42 -> "IBM850", 43 -> "IBM852", 44 -> "IBM857",
    45 -> "IBM00858", 46 -> "IBM862", 47 -> "IBM864", 48 -> "IBM865",
    49 -> "IBM866", 50 -> "IBM869", 51 -> "x-IBM874", 56 -> "x-IBM737",
    57 -> "IBM775", 58 -> "IBM860", 59 -> "IBM863",
    60 -> "windows-1250", 61 -> "windows-1251", 62 -> "windows-1252",
    63 -> "windows-1253", 64 -> "windows-1254", 65 -> "windows-1255",
    66 -> "windows-1256", 67 -> "windows-1257", 68 -> "windows-1258",
    118 -> "x-windows-950", 123 -> "Big5", 125 -> "GB2312",
    126 -> "GBK", 134 -> "EUC-JP", 136 -> "windows-31j",
    138 -> "Shift_JIS", 140 -> "EUC-KR", 141 -> "x-windows-949")

  private def charsetFor(code: Int): Charset =
    EncodingNames.get(code) match {
      case Some(name) =>
        require(Charset.isSupported(name),
          s"sas7bdat encoding code $code maps to charset '$name', which this " +
            "JVM does not provide — decoding with a substitute would corrupt " +
            "every string; install a JVM with the charset or re-export as UTF-8")
        Charset.forName(name)
      case None => StandardCharsets.UTF_8 // 20-family default and unset bytes
    }

  /** Parse header + metadata pages. Leaves `in` positioned AT the first
    * page (metadata pages are re-read by the row iterator, which skips
    * their rows-free bodies cheaply). */
  private def readMeta(in: InputStream): SasMeta = {
    val head0 = readFully(in, 288)
    require(head0.take(32).sameElements(Magic), "not a sas7bdat file (bad magic)")
    val u64 = head0(32) == 0x33
    val align1 = if (head0(35) == 0x33) 4 else 0
    val little = head0(37) == 0x01
    val b0 = new B(head0, little)
    val encoding = charsetFor(head0(70) & 0xff)
    val headerSize = b0.u4(196 + align1).toInt
    val rest = readFully(in, headerSize - 288)
    val head = new B(head0 ++ rest, little)
    val intLen = if (u64) 8 else 4
    val pageSize = head.u4(200 + align1).toInt
    val pageCount = head.uint(204 + align1, intLen)

    var rowLength, rowCount, mixRows, colCount = -1L
    val textHeap = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    val lens = scala.collection.mutable.ArrayBuffer.empty[Int]
    val numeric = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    val formats = scala.collection.mutable.ArrayBuffer.empty[String]

    val bitOff = if (u64) 32 else 16
    val ptrLen = if (u64) 24 else 12
    var rle = false
    var rdc = false
    var done = false
    var pagesRead = 0
    while (!done && pagesRead < pageCount) {
      val page = new B(readFully(in, pageSize), little)
      pagesRead += 1
      val pageType = page.u2(bitOff) & 0xff00
      if (Seq(PageMeta, PageMeta2, PageAmd, PageMix).contains(pageType)) {
        val shCount = page.u2(bitOff + 4)
        (0 until shCount).foreach { i =>
          val p = bitOff + 8 + i * ptrLen
          val shOff = page.uint(p, intLen).toInt
          val shLen = page.uint(p + intLen, intLen).toInt
          val compression = page.raw(p + 2 * intLen, 1)(0)
          if (shLen > 0 && compression != 1) {
            val sig = page.raw(shOff, intLen)
            signatureKind(sig, u64) match {
              case "rowsize" =>
                rowLength = page.uint(shOff + 5 * intLen, intLen)
                rowCount = page.uint(shOff + 6 * intLen, intLen)
                mixRows = page.uint(shOff + 15 * intLen, intLen)
              case "colsize" =>
                colCount = page.uint(shOff + intLen, intLen)
              case "text" =>
                val blobSize = page.u2(shOff + intLen)
                val blob = page.raw(shOff + intLen, blobSize)
                if (textHeap.isEmpty) {
                  val s = new String(blob, StandardCharsets.ISO_8859_1)
                  rdc = s.contains("SASYZCR2")
                  rle = !rdc && s.contains("SASYZCRL")
                }
                textHeap += blob
              case "colname" =>
                val n = (shLen - 2 * intLen - 12) / 8
                (0 until n).foreach { j =>
                  val base = shOff + intLen + 8 * (j + 1)
                  val heapIdx = page.u2(base)
                  val nameOff = page.u2(base + 2)
                  val nameLen = page.u2(base + 4)
                  names += new String(
                    textHeap(heapIdx), nameOff, nameLen, encoding).trim
                }
              case "colattr" =>
                val n = (shLen - 2 * intLen - 12) / (intLen + 8)
                (0 until n).foreach { j =>
                  val e = intLen + 8
                  offs += page.uint(shOff + intLen + 8 + j * e, intLen).toInt
                  lens += page.u4(shOff + 2 * intLen + 8 + j * e).toInt
                  numeric += page.raw(shOff + 2 * intLen + 14 + j * e, 1)(0) == 1
                }
              case "format" =>
                val heapIdx = page.u2(shOff + 3 * intLen + 22)
                val fmtOff = page.u2(shOff + 3 * intLen + 24)
                val fmtLen = page.u2(shOff + 3 * intLen + 26)
                formats += (if (fmtLen == 0 || heapIdx >= textHeap.size) ""
                            else new String(
                              textHeap(heapIdx), fmtOff, fmtLen, encoding).trim)
              case _ => // counts / column-list / unknown: ignored
            }
          }
        }
      }
      // metadata complete once every per-column vector is full
      done = colCount >= 0 && names.size >= colCount && offs.size >= colCount
    }
    require(rowLength > 0 && colCount > 0,
      "sas7bdat metadata incomplete (missing row-size or column subheaders)")
    require(names.size == colCount && offs.size == colCount,
      s"sas7bdat column metadata mismatch: $colCount declared, " +
        s"${names.size} names, ${offs.size} attributes")
    val cols = (0 until colCount.toInt).map { i =>
      SasColumn(names(i), offs(i), lens(i), numeric(i),
        if (i < formats.size) formats(i) else "")
    }
    SasMeta(u64, little, encoding, headerSize, pageSize, pageCount,
      rowLength.toInt, rowCount, mixRows, cols,
      rleCompressed = rle, rdcCompressed = rdc)
  }

  // ------------------------------------------------------------------- RLE

  /** SASYZCRL (COMPRESS=CHAR) decoder. Command set per the public format
    * documentation, each confirmed against pandas.read_sas on generated
    * probes (tools/make_sas7bdat_fixtures.py): high nibble selects the
    * command, low nibble (and for long forms the next byte) carries the
    * length. */
  private[sources] def rleDecompress(src: Array[Byte], outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var i = 0
    var o = 0
    def nxt(): Int = { val b = src(i) & 0xff; i += 1; b }
    def fill(n: Int, b: Byte): Unit = {
      require(o + n <= outLen, s"RLE overrun at $o + $n > $outLen")
      java.util.Arrays.fill(out, o, o + n, b); o += n
    }
    def copy(n: Int): Unit = {
      require(o + n <= outLen && i + n <= src.length, s"RLE copy overrun")
      System.arraycopy(src, i, out, o, n); i += n; o += n
    }
    while (i < src.length && o < outLen) {
      val c = nxt()
      val nib = c & 0x0f
      (c & 0xf0) match {
        case 0x00 => copy((nib << 8) + nxt() + 64)
        case 0x40 => val n = (nib << 8) + nxt() + 18; fill(n, nxt().toByte)
        case 0x60 => fill((nib << 8) + nxt() + 17, ' '.toByte)
        case 0x70 => fill((nib << 8) + nxt() + 17, 0x00)
        case 0x80 => copy(nib + 1)
        case 0x90 => copy(nib + 17)
        case 0xa0 => copy(nib + 33)
        case 0xb0 => copy(nib + 49)
        case 0xc0 => fill(nib + 3, nxt().toByte)
        case 0xd0 => fill(nib + 2, '@'.toByte)
        case 0xe0 => fill(nib + 2, ' '.toByte)
        case 0xf0 => fill(nib + 2, 0x00)
        case bad => throw new IllegalStateException(
          f"unknown RLE control byte 0x$bad%02x at input offset ${i - 1}")
      }
    }
    require(o == outLen, s"RLE decompressed $o bytes, expected $outLen")
    out
  }

  // ------------------------------------------------------------------- RDC
  /** SASYZCR2 (COMPRESS=BINARY, Ross Data Compression) decoder. Command
    * set per the public format documentation, confirmed against
    * pandas.read_sas on generated probes exercising every command family
    * (tools/make_sas7bdat_fixtures.py `rdc_compress`): a 16-bit big-endian
    * control word gates each group of 16 items — a 0 bit is one literal
    * byte; a 1 bit is a command byte whose high nibble selects
    * short RLE (0), long RLE (1), long copy (2) or a short copy of
    * `cmd` bytes (3–15), with the low nibble (+ following bytes for the
    * long forms) carrying length/offset. Copies may self-overlap, so they
    * run byte-at-a-time forward. */
  private[sources] def rdcDecompress(src: Array[Byte], outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var i = 0
    var o = 0
    var ctrl = 0
    var mask = 0
    def nxt(): Int = { val b = src(i) & 0xff; i += 1; b }
    def fill(n: Int, b: Byte): Unit = {
      require(o + n <= outLen, s"RDC overrun at $o + $n > $outLen")
      java.util.Arrays.fill(out, o, o + n, b); o += n
    }
    def copyBack(ofs: Int, n: Int): Unit = {
      require(ofs <= o && o + n <= outLen, s"RDC copy overrun (ofs=$ofs, o=$o, n=$n)")
      var k = 0
      while (k < n) { out(o + k) = out(o - ofs + k); k += 1 }
      o += n
    }
    while (i < src.length && o < outLen) {
      mask >>= 1
      if (mask == 0) {
        ctrl = (nxt() << 8) | nxt()
        mask = 0x8000
      }
      if ((ctrl & mask) == 0) {
        out(o) = src(i); o += 1; i += 1
      } else {
        val c = nxt()
        val cmd = (c >> 4) & 0x0f
        val nib = c & 0x0f
        cmd match {
          case 0 => val b = nxt().toByte; fill(nib + 3, b)
          case 1 => val n = nib + (nxt() << 4) + 19; fill(n, nxt().toByte)
          case 2 =>
            val ofs = nib + 3 + (nxt() << 4)
            copyBack(ofs, nxt() + 16)
          case _ =>
            val ofs = nib + 3 + (nxt() << 4)
            copyBack(ofs, cmd)
        }
      }
    }
    require(o == outLen, s"RDC decompressed $o bytes, expected $outLen")
    out
  }

  private def signatureKind(sig: Array[Byte], u64: Boolean): String = {
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    val h = hex(sig)
    val all = Seq(
      "f7f7f7f7" -> "rowsize", "f6f6f6f6" -> "colsize",
      "fffffc00" -> "counts", "00fcffff" -> "counts",
      "fdffffff" -> "text", "fffffffd" -> "text",
      "ffffffff" -> "colname",
      "fcffffff" -> "colattr", "fffffffc" -> "colattr",
      "feffffff" -> "collist", "fffffffe" -> "collist",
      "fefbffff" -> "format", "fffffbfe" -> "format")
    if (!u64) all.collectFirst { case (k, v) if h == k => v }.getOrElse("?")
    else all.collectFirst {
      case (k, v) if h == k + "00000000" || h == "00000000" + k ||
        h == k + "ffffffff" || h == "ffffffff" + k => v
    }.getOrElse(if (h == "ffffffffffffffff") "colname" else "?")
  }

  // ------------------------------------------------------------------ rows

  /** Decode one fixed-width row into external Row values. */
  private def decodeRow(page: B, rowStart: Int, meta: SasMeta): Row = {
    val vals = meta.columns.map { c =>
      if (c.isNumeric) {
        val d = page.num(rowStart + c.dataOffset, math.min(c.dataLength, 8))
        if (d.isNaN) null
        else c.dataType match {
          case DateType => java.sql.Date.valueOf(
            java.time.LocalDate.ofEpochDay(math.round(d) - SasEpochDays))
          case TimestampType => java.sql.Timestamp.from(
            java.time.Instant.ofEpochMilli(
              math.round(d * 1000.0) - SasEpochSeconds * 1000L))
          case _ => d
        }
      } else {
        val s = new String(
          page.raw(rowStart + c.dataOffset, c.dataLength), meta.encoding)
        val t = s.replaceAll("[ \u0000]+$", "")
        if (t.isEmpty) null else t
      }
    }
    Row.fromSeq(vals)
  }

  /** Walk every row of one file as (page-or-row buffer, row start
    * offset) slices — the shared core under both the external-Row reader
    * and the DataSource V2 internal-row reader. Streams pages through one
    * fixed buffer, so memory stays O(pageSize). */
  private def rowSlices(open: () => InputStream, meta: SasMeta): Iterator[(B, Int)] = {
    val in = open()
    readFully(in, meta.headerSize) // position at the first page
    val bitOff = if (meta.u64) 32 else 16
    val ptrLen = if (meta.u64) 24 else 12
    val intLen = if (meta.u64) 8 else 4
    var emitted = 0L
    var pagesRead = 0L

    new Iterator[(B, Int)] {
      private var pageRows: Iterator[(B, Int)] = Iterator.empty

      private def advance(): Unit = {
        while (!pageRows.hasNext && pagesRead < meta.pageCount &&
            emitted < meta.rowCount) {
          val bytes =
            try readFully(in, meta.pageSize)
            catch { case _: EOFException => pagesRead = meta.pageCount; null }
          if (bytes != null) {
            pagesRead += 1
            val page = new B(bytes, meta.littleEndian)
            val pageType = page.u2(bitOff) & 0xff00
            val blockCount = page.u2(bitOff + 2)
            val shCount = page.u2(bitOff + 4)
            // compressed files: rows ride as subheaders (pointer
            // compression=4 — or 0 when RLE didn't shrink a row — with
            // type=1 and an unrecognized signature) on meta-ish pages
            val shRows: Seq[(B, Int)] =
              if (!meta.compressed || shCount == 0 || pageType == PageData) Nil
              else (0 until shCount).flatMap { idx =>
                val p = bitOff + 8 + idx * ptrLen
                val shOff = page.uint(p, intLen).toInt
                val shLen = page.uint(p + intLen, intLen).toInt
                val comp = page.raw(p + 2 * intLen, 1)(0)
                val typ = page.raw(p + 2 * intLen + 1, 1)(0)
                val isData = shLen > 0 && comp != 1 && typ == 1 &&
                  (comp == 4 || comp == 0) &&
                  signatureKind(page.raw(shOff, intLen), meta.u64) == "?"
                if (!isData) None
                else {
                  val payload = page.raw(shOff, shLen)
                  val rowBytes =
                    if (shLen >= meta.rowLength) payload
                    else if (meta.rdcCompressed) rdcDecompress(payload, meta.rowLength)
                    else rleDecompress(payload, meta.rowLength)
                  Some((new B(rowBytes, meta.littleEndian), 0))
                }
              }
            val (start, n) =
              if (pageType == PageMix) {
                val ptrEnd = bitOff + 8 + shCount * ptrLen
                val aligned = ptrEnd + ((8 - (ptrEnd % 8)) % 8)
                (aligned,
                  math.min(meta.mixPageRowCount, meta.rowCount - emitted).toInt)
              } else if (pageType == PageData) {
                (bitOff + 8, math.min(blockCount, meta.rowCount - emitted).toInt)
              } else (0, 0)
            val packed = (0 until n).map(i => (page, start + i * meta.rowLength))
            val all = (shRows ++ packed).take((meta.rowCount - emitted).toInt)
            if (all.nonEmpty) {
              emitted += all.size
              pageRows = all.iterator
            }
          }
        }
      }

      override def hasNext: Boolean = {
        if (!pageRows.hasNext) advance()
        val h = pageRows.hasNext
        if (!h) in.close()
        h
      }
      override def next(): (B, Int) = {
        if (!hasNext) throw new NoSuchElementException
        pageRows.next()
      }
    }
  }

  /** Stream every row of one file as external Rows. */
  private def rowIterator(open: () => InputStream): Iterator[Row] = {
    val metaIn = open()
    val meta = try readMeta(metaIn) finally metaIn.close()
    rowSlices(open, meta).map { case (b, start) => decodeRow(b, start, meta) }
  }

  /** Stream rows of one file as Catalyst InternalRows containing ONLY the
    * `projected` columns — the DataSource V2 read path, where column
    * pruning reaches the byte decoder (unprojected columns are never
    * decoded, dates/strings never converted). */
  private[sources] def internalRowIterator(
      open: () => InputStream, meta: SasMeta, projected: Array[Int])
      : Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val cols = projected.map(meta.columns)
    rowSlices(open, meta).map { case (b, start) =>
      val vals = new Array[Any](cols.length)
      var i = 0
      while (i < cols.length) {
        val c = cols(i)
        vals(i) =
          if (c.isNumeric) {
            val d = b.num(start + c.dataOffset, math.min(c.dataLength, 8))
            if (d.isNaN) null
            else c.dataType match {
              case DateType => (math.round(d) - SasEpochDays).toInt
              case TimestampType =>
                math.round(d * 1000.0) * 1000L - SasEpochSeconds * 1000000L
              case _ => d
            }
          } else {
            val s = new String(b.raw(start + c.dataOffset, c.dataLength), meta.encoding)
            val t = s.replaceAll("[ \u0000]+$", "")
            if (t.isEmpty) null else UTF8String.fromString(t)
          }
        i += 1
      }
      new GenericInternalRow(vals)
    }
  }

  // ----------------------------------------------------------------- spark

  /** Schema of a dataset (driver-side: header + metadata pages only). */
  def schemaOf(spark: SparkSession, file: String): StructType =
    metaOf(spark, file).schema

  /** Executor-side meta read for the DataSource V2 path (no SparkSession). */
  private[sources] def readMetaFrom(open: () => InputStream): SasMeta = {
    val in = open()
    try readMeta(in) finally in.close()
  }

  private[sources] def metaOf(spark: SparkSession, file: String): SasMeta = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try readMeta(in) finally in.close()
  }

  /** Read one `.sas7bdat` file or a directory of them as a DataFrame —
    * one task per file (the format is a single sequential stream; see
    * class doc), each streaming pages. Every file must share the first
    * file's schema. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath).toSeq
          .filter(_.getName.toLowerCase.endsWith(".sas7bdat"))
          .sortBy(_.getName).map(_.toString)
      else Seq(p.toString)
    require(files.nonEmpty, s"no .sas7bdat files under $path")
    val schema = schemaOf(spark, files.head)
    files.tail.foreach { f =>
      val s = schemaOf(spark, f)
      require(s == schema,
        s"schema mismatch in $f: $s does not match ${files.head}: $schema")
    }
    val rdd = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { f =>
        // executor-side: default Hadoop conf (local/default FS); the format
        // itself carries everything else
        val fp = new Path(f)
        val ffs = fp.getFileSystem(new org.apache.hadoop.conf.Configuration())
        rowIterator(() => ffs.open(fp))
      }
    spark.createDataFrame(rdd, schema)
  }
}
