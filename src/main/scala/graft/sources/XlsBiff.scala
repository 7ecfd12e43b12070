package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Minimal legacy-XLS (BIFF8 inside a CFB compound document) reader
 * (SURVEY.md §2.1; ref modules/csv/.../flattening/XlsGenerator.scala:105,
 * which delegates to POI HSSF). Self-contained: the CFB container and the
 * BIFF record stream are parsed directly from the public format specs
 * ([MS-CFB], [MS-XLS]) — no POI.
 *
 * Supported (the cell-data core): CFB v3/v4 sectors with FAT/DIFAT,
 * directory, regular-sector AND mini-stream storage of the Workbook stream;
 * BIFF8 BOF/EOF, BOUNDSHEET (name → substream offset), SST + LABELSST
 * (compressed and UTF-16 strings, including strings spanning CONTINUE
 * records with per-segment encoding re-declaration), LABEL, NUMBER, RK,
 * MULRK, BOOLERR (bool and error-code cells); BIFF5/7 workbooks ("Book"
 * stream, CODEPAGE-encoded inline byte strings in BOUNDSHEET/LABEL/RSTRING).
 * Encrypted workbooks (FILEPASS, [MS-XLS] 2.4.117): all three published
 * variants decrypt — binary RC4 "standard" ([MS-OFFCRYPTO] 2.3.6: MD5 key
 * derivation, per-1024-byte block rekeying), RC4 CryptoAPI (2.3.5: SHA-1
 * derivation, 40/128-bit keys, same block rekeying), and XOR obfuscation
 * method 1 (2.3.7: InitialCode/XorMatrix key array, per-record end-seeded
 * index) — each behind its password-verifier check; the spreadsheet
 * default password "VelvetSweatshop" is tried when none is given, matching
 * Excel's silent auto-open. BIFF4 and earlier are not supported. Unknown records
 * are skipped by length, so real-world files with formatting records parse
 * fine; corrupt chains fail loudly with context.
 *
 * Distribution matches the xlsx path: one task per file via binaryFiles.
 */
object XlsBiff {

  private val ENDOFCHAIN = 0xFFFFFFFEL
  private val FREESECT = 0xFFFFFFFFL

  private def u16(b: ByteBuffer, off: Int): Int = b.getShort(off) & 0xFFFF
  private def u32(b: ByteBuffer, off: Int): Long = b.getInt(off) & 0xFFFFFFFFL

  /** Read a FAT/miniFAT chain of sector ids starting at `start`; fails
    * loudly on out-of-range sids and cyclic chains (corrupt files must not
    * silently truncate into wrong data). */
  private def chain(fat: Array[Long], start: Long): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var s = start
    var guard = 0
    while (s != ENDOFCHAIN && s != FREESECT) {
      require(s >= 0 && s < fat.length, s"CFB: sector id $s outside FAT (${fat.length})")
      require(guard <= fat.length, "CFB: cyclic sector chain")
      out += s.toInt
      s = fat(s.toInt)
      guard += 1
    }
    out.result()
  }

  /** Extract the Workbook stream bytes from a CFB container. */
  private[graft] def workbookStream(bytes: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(u32(b, 0) == 0xE011CFD0L && u32(b, 4) == 0xE11AB1A1L, "not a CFB file")
    val sectorSize = 1 << u16(b, 0x1E)
    val miniSize = 1 << u16(b, 0x20)
    val numFat = u32(b, 0x2C).toInt
    val firstDir = u32(b, 0x30)
    val miniCutoff = u32(b, 0x38)
    val firstMiniFat = u32(b, 0x3C)
    val numMiniFat = u32(b, 0x40).toInt
    val firstDifat = u32(b, 0x44)
    // spec formula (sid+1)*sectorSize: identical to 512+sid*512 for v3 and
    // correct for v4's 4096-byte sectors
    def sectorOff(sid: Int): Int = (sid + 1) * sectorSize
    val maxSectors = bytes.length / sectorSize + 1
    // FAT sector list: 109 header DIFAT entries + chained DIFAT sectors
    val fatSectors = {
      val head = (0 until math.min(109, numFat)).map(i => u32(b, 0x4C + 4 * i))
      var extra = Vector.empty[Long]
      var ds = firstDifat
      var guard = 0
      while (ds != ENDOFCHAIN && ds != FREESECT) {
        require(guard <= maxSectors, "CFB: cyclic or runaway DIFAT chain")
        val off = sectorOff(ds.toInt)
        extra ++= (0 until sectorSize / 4 - 1).map(i => u32(b, off + 4 * i))
        ds = u32(b, off + sectorSize - 4)
        guard += 1
      }
      (head ++ extra).filter(s => s != FREESECT).take(numFat)
    }
    val fat: Array[Long] = fatSectors.flatMap { fs =>
      val off = sectorOff(fs.toInt)
      (0 until sectorSize / 4).map(i => u32(b, off + 4 * i))
    }.toArray
    def readChain(start: Long, size: Long): Array[Byte] = {
      val sids = chain(fat, start)
      val out = new Array[Byte](size.toInt)
      var pos = 0
      for (sid <- sids if pos < size) {
        val n = math.min(sectorSize, size.toInt - pos)
        System.arraycopy(bytes, sectorOff(sid), out, pos, n)
        pos += n
      }
      out
    }
    // directory entries (128B each) from the directory chain
    val dirBytes = {
      val sids = chain(fat, firstDir)
      val out = new Array[Byte](sids.size * sectorSize)
      sids.zipWithIndex.foreach { case (sid, i) =>
        System.arraycopy(bytes, sectorOff(sid), out, i * sectorSize, sectorSize)
      }
      out
    }
    val db = ByteBuffer.wrap(dirBytes).order(ByteOrder.LITTLE_ENDIAN)
    case class Entry(name: String, objType: Int, start: Long, size: Long)
    val entries = (0 until dirBytes.length / 128).map { i =>
      val off = i * 128
      val nameLen = u16(db, off + 64)
      val name = if (nameLen >= 2)
        new String(dirBytes, off, nameLen - 2, "UTF-16LE") else ""
      Entry(name, dirBytes(off + 66) & 0xFF, u32(db, off + 116), u32(db, off + 120))
    }
    val root = entries.find(_.objType == 5)
      .getOrElse(throw new IllegalArgumentException("CFB: no root entry"))
    val wb = entries.find(e => e.objType == 2 && (e.name == "Workbook" || e.name == "Book"))
      .getOrElse(throw new IllegalArgumentException("CFB: no Workbook stream"))
    if (wb.size >= miniCutoff) readChain(wb.start, wb.size)
    else {
      // mini stream: 64-byte sectors inside the root entry's stream,
      // chained through the mini FAT
      val miniStream = readChain(root.start, root.size)
      val miniFat: Array[Long] = {
        val sids = chain(fat, firstMiniFat).take(numMiniFat max 1)
        sids.flatMap { sid =>
          val off = sectorOff(sid)
          (0 until sectorSize / 4).map(i => u32(b, off + 4 * i))
        }.toArray
      }
      val sids = chain(miniFat, wb.start)
      val out = new Array[Byte](wb.size.toInt)
      var pos = 0
      for (sid <- sids if pos < wb.size) {
        val n = math.min(miniSize, wb.size.toInt - pos)
        System.arraycopy(miniStream, sid * miniSize, out, pos, n)
        pos += n
      }
      out
    }
  }

  /** Decode an RK-encoded number ([MS-XLS] 2.5.122). */
  private[graft] def decodeRk(rk: Long): Double = {
    val div100 = (rk & 1L) != 0
    val isInt = (rk & 2L) != 0
    val v =
      if (isInt) (rk.toInt >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if (div100) v / 100.0 else v
  }

  /** Cursor over the SST body and its CONTINUE record bodies. Strings may
    * split ONLY within character data ([MS-XLS] 2.5.293): each continuation
    * segment re-opens with a fresh grbit byte that redefines the encoding
    * for the remaining characters of the in-flight string. */
  private final class SstCursor(segments: IndexedSeq[Array[Byte]]) {
    private var seg = 0
    private var off = 0
    private def ensure(): Unit =
      while (off >= segments(seg).length && seg < segments.size - 1) { seg += 1; off = 0 }
    def hasMore: Boolean = { ensure(); off < segments(seg).length }
    def atSegmentEnd: Boolean = off >= segments(seg).length
    def u8(): Int = { ensure(); val v = segments(seg)(off) & 0xFF; off += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    def readString(): String = {
      val cch = u16()
      var flags = u8()
      val rich = (flags & 8) != 0
      val ext = (flags & 4) != 0
      val cRun = if (rich) u16() else 0
      val cbExt = if (ext) u32() else 0L
      var high = (flags & 1) != 0
      val sb = new StringBuilder
      var remaining = cch
      while (remaining > 0) {
        ensure()
        if (atSegmentEnd) throw new IllegalArgumentException("BIFF: truncated SST string")
        val bytesLeft = segments(seg).length - off
        val charsHere = math.min(remaining, if (high) bytesLeft / 2 else bytesLeft)
        if (charsHere == 0) throw new IllegalArgumentException("BIFF: malformed SST split")
        sb.append(new String(segments(seg), off,
          if (high) charsHere * 2 else charsHere, if (high) "UTF-16LE" else "ISO-8859-1"))
        off += (if (high) charsHere * 2 else charsHere)
        remaining -= charsHere
        if (remaining > 0) { // split point: next segment re-declares encoding
          if (!atSegmentEnd)
            throw new IllegalArgumentException("BIFF: dangling byte at SST split")
          ensure()
          high = (u8() & 1) != 0
        }
      }
      var skip = cRun * 4L + cbExt
      while (skip > 0) {
        ensure()
        val n = math.min(skip, (segments(seg).length - off).toLong).toInt
        if (n == 0) throw new IllegalArgumentException("BIFF: truncated SST rich/ext data")
        off += n; skip -= n
      }
      sb.toString
    }
  }

  /** Name the FILEPASS encryption variant ([MS-XLS] 2.4.117: wEncryptionType
    * 0 = XOR obfuscation; 1 = RC4, sub-versioned standard vs CryptoAPI) so
    * the unsupported-error tells the operator which decryptor a file needs. */
  private def filepassKind(b: ByteBuffer, body: Int): String =
    u16(b, body) match {
      case 0 => "XOR obfuscation"
      case 1 => if (u16(b, body + 2) == 1 && u16(b, body + 4) == 1)
                  "RC4 standard" else "RC4 CryptoAPI"
      case other => s"unknown type $other"
    }

  // ------------------------------------------------- FILEPASS / binary RC4

  /** RC4 (KSA + PRGA), transcribed from the public algorithm — own 20 lines
    * rather than SunJCE ARCFOUR so keystream bytes can be discarded for the
    * plaintext spans the BIFF rules leave clear. */
  private[graft] final class Rc4(key: Array[Byte]) {
    private val S = Array.tabulate(256)(_.toByte)
    private var i = 0
    private var j = 0
    locally {
      var jj = 0
      var ii = 0
      while (ii < 256) {
        jj = (jj + S(ii) + key(ii % key.length)) & 0xFF
        val t = S(ii); S(ii) = S(jj); S(jj) = t
        ii += 1
      }
    }
    def next(): Int = {
      i = (i + 1) & 0xFF
      j = (j + S(i)) & 0xFF
      val t = S(i); S(i) = S(j); S(j) = t
      S((S(i) + S(j)) & 0xFF) & 0xFF
    }
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** [MS-OFFCRYPTO] 2.3.6.2 binary-RC4 key material: the 5-byte truncated
    * MD5 of the UTF-16LE password, folded with the salt 16 times. */
  private[graft] def rc4KeyBase(password: String, salt: Array[Byte]): Array[Byte] = {
    val trunc = md5(password.getBytes("UTF-16LE")).take(5)
    md5(Array.fill(16)(trunc ++ salt).flatten.toArray).take(5)
  }

  /** Rekeyed cipher for 1024-byte block `n`: the full 16-byte
    * MD5(keyBase ++ LE32(n)) is the RC4 key ([MS-OFFCRYPTO] 2.3.6.2). */
  private[graft] def rc4Block(keyBase: Array[Byte], n: Int): Rc4 =
    new Rc4(md5(keyBase, Array[Byte](
      (n & 0xFF).toByte, ((n >> 8) & 0xFF).toByte,
      ((n >> 16) & 0xFF).toByte, ((n >> 24) & 0xFF).toByte)))

  /** [MS-OFFCRYPTO] 2.3.6.4: block-0 RC4 over the 32 contiguous verifier
    * bytes; the password is right iff MD5(verifier) == verifierHash. */
  private def rc4PasswordOk(password: String, salt: Array[Byte],
                            encVerifier: Array[Byte], encVerifierHash: Array[Byte]): Boolean = {
    val c = rc4Block(rc4KeyBase(password, salt), 0)
    val verifier = encVerifier.map(b => (b ^ c.next()).toByte)
    val verifierHash = encVerifierHash.map(b => (b ^ c.next()).toByte)
    java.util.Arrays.equals(md5(verifier), verifierHash)
  }

  /** Records whose bodies stay plaintext under RC4 ([MS-XLS] 2.2.10): BOF,
    * FILEPASS, UsrExcl, FileLock, InterfaceHdr, RRDInfo, RRDHead — plus
    * every record's 4-byte type/length header and BOUNDSHEET's lbPlyPos. */
  private val PlainBodies = Set(0x0809, 0x002F, 0x0194, 0x0195, 0x00E1, 0x0196, 0x0138)

  /** XOR the RC4 keystream onto a Workbook stream following the BIFF rules.
    * The keystream covers EVERY byte — plaintext spans advance it without
    * applying it — and rekeys each 1024-byte block, so decryption is
    * position-exact regardless of record layout. XOR makes this symmetric:
    * applied to a plaintext stream it encrypts (the spec uses it that way). */
  private[graft] def rc4Crypt(stream: Array[Byte], password: String,
                              salt: Array[Byte]): Array[Byte] =
    rc4CryptWith(stream, rc4Block(rc4KeyBase(password, salt), _))

  /** The [MS-XLS] 2.2.10 record walk, parameterized by the per-1024-byte
    * block cipher factory — shared by the binary-RC4 ([MS-OFFCRYPTO] 2.3.6)
    * and RC4-CryptoAPI (2.3.5) variants, whose only difference upstream of
    * the keystream is the key-derivation hash. */
  private[graft] def rc4CryptWith(stream: Array[Byte],
                                  blockCipher: Int => Rc4): Array[Byte] = {
    val out = stream.clone()
    var cipher = blockCipher(0)
    var block = 0
    var pos = 0
    def advance(n: Int, apply: Boolean): Unit = {
      var k = 0
      while (k < n) {
        val bl = pos >> 10
        if (bl != block) { block = bl; cipher = blockCipher(bl) }
        val ks = cipher.next()
        if (apply) out(pos) = (out(pos) ^ ks).toByte
        pos += 1
        k += 1
      }
    }
    val b = ByteBuffer.wrap(stream).order(ByteOrder.LITTLE_ENDIAN)
    while (pos + 4 <= stream.length) {
      val recT = u16(b, pos)
      val len = math.min(u16(b, pos + 2), stream.length - pos - 4)
      advance(4, apply = false)
      if (PlainBodies(recT)) advance(len, apply = false)
      else if (recT == 0x0085) { // BOUNDSHEET: lbPlyPos clear, name encrypted
        advance(math.min(4, len), apply = false)
        advance(len - math.min(4, len), apply = true)
      } else advance(len, apply = true)
    }
    out
  }

  // --------------------------------------- FILEPASS / RC4 CryptoAPI (SHA-1)

  private def sha1(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
    parts.foreach(d.update)
    d.digest()
  }

  private def le32(n: Int): Array[Byte] = Array[Byte](
    (n & 0xFF).toByte, ((n >> 8) & 0xFF).toByte,
    ((n >> 16) & 0xFF).toByte, ((n >> 24) & 0xFF).toByte)

  /** [MS-OFFCRYPTO] 2.3.5.2 CryptoAPI key material: H0 = SHA1(salt ++
    * UTF-16LE password); the block-n key is the first keyBits/8 bytes of
    * SHA1(H0 ++ LE32(n)) — except 40-bit keys, which are zero-extended to
    * 16 bytes ("CryptDeriveKey with a 40-bit effective length"). */
  private[graft] def cryptoApiKey(password: String, salt: Array[Byte],
                                  keyBits: Int, block: Int): Array[Byte] = {
    val h0 = sha1(salt, password.getBytes("UTF-16LE"))
    val hb = sha1(h0, le32(block))
    if (keyBits == 40) hb.take(5) ++ Array.fill[Byte](11)(0)
    else hb.take(keyBits / 8)
  }

  /** [MS-OFFCRYPTO] 2.3.5.6: one block-0 RC4 stream decrypts the 16-byte
    * verifier then the hash field; the password is right iff
    * SHA1(verifier) == the first 20 decrypted hash bytes. */
  private def cryptoApiPasswordOk(password: String, salt: Array[Byte], keyBits: Int,
                                  encVerifier: Array[Byte],
                                  encVerifierHash: Array[Byte]): Boolean = {
    val c = new Rc4(cryptoApiKey(password, salt, keyBits, 0))
    val verifier = encVerifier.map(b => (b ^ c.next()).toByte)
    val verifierHash = encVerifierHash.map(b => (b ^ c.next()).toByte)
    java.util.Arrays.equals(sha1(verifier), verifierHash.take(20))
  }

  /** Parse the RC4-CryptoAPI FILEPASS body ([MS-XLS] 2.4.117 with
    * EncryptionInfo per [MS-OFFCRYPTO] 2.3.5.1) into
    * (keyBits, salt, encryptedVerifier, encryptedVerifierHash). */
  private def parseCryptoApiFilepass(stream: Array[Byte], body: Int,
                                     len: Int): (Int, Array[Byte], Array[Byte], Array[Byte]) = {
    val b = ByteBuffer.wrap(stream).order(ByteOrder.LITTLE_ENDIAN)
    // body: wEncryptionType(2) vMajor(2) vMinor(2) Flags(4) HeaderSize(4)
    //       EncryptionHeader(HeaderSize) EncryptionVerifier
    val headerSize = u32(b, body + 10).toInt
    val hdr = body + 14
    // EncryptionVerifier needs 60 bytes: saltSize(4) + salt(16) +
    // verifier(16) + hashSize(4) + SHA-1 hash(20)
    require(len >= 14 + headerSize + 60, "BIFF: truncated CryptoAPI FILEPASS")
    val algId = u32(b, hdr + 8)
    // AlgID 0 means "determined by Flags" ([MS-OFFCRYPTO] 2.3.5.1): with
    // the fAES bit (0x20) set the header declares AES, which must surface
    // as an unsupported-algorithm error, not a wrong-password failure from
    // the RC4 verifier it would otherwise fall through to.
    val hdrFlags = u32(b, hdr)
    if (algId == 0L && (hdrFlags & 0x20L) != 0L)
      throw new UnsupportedOperationException(
        "BIFF: CryptoAPI header declares AES (AlgID 0 with fAES flag) — " +
          "only the RC4 variants of [MS-OFFCRYPTO] are implemented")
    require(algId == 0x6801L || algId == 0L,
      s"BIFF: CryptoAPI AlgID 0x${algId.toHexString} is not RC4")
    // KeySize = 0 means the 40-bit default ([MS-OFFCRYPTO] 2.3.5.1)
    val keyBits = { val k = u32(b, hdr + 16).toInt; if (k == 0) 40 else k }
    val ver = hdr + headerSize
    val saltSize = u32(b, ver).toInt
    require(saltSize == 16, s"BIFF: CryptoAPI salt size $saltSize != 16")
    def bytes(off: Int, n: Int) =
      java.util.Arrays.copyOfRange(stream, off, off + n)
    val salt = bytes(ver + 4, 16)
    val encVerifier = bytes(ver + 20, 16)
    val verifierHashSize = u32(b, ver + 36).toInt
    require(verifierHashSize == 20, s"BIFF: CryptoAPI verifier hash size $verifierHashSize != 20 (SHA-1)")
    val encVerifierHash = bytes(ver + 40, 20)
    (keyBits, salt, encVerifier, encVerifierHash)
  }

  // ------------------------------------------------ FILEPASS / XOR method 1
  // [MS-OFFCRYPTO] 2.3.7 "XOR Obfuscation": a 16-byte key array derived
  // from the ANSI password via the published InitialCode/XorMatrix tables,
  // applied per record with the array index seeded from the record's END
  // offset. The XorMatrix is the published 105-entry table; every row
  // satisfies the generator recurrence x(i+1) = (x(i)·2) mod 0x11021
  // (CRC-CCITT polynomial), which the spec's values encode and which makes
  // transcription errors detectable.

  private val XorPad = Array(0xBB, 0xFF, 0xFF, 0xBA, 0xFF, 0xFF, 0xB9, 0x80,
    0x00, 0xBE, 0x0F, 0x00, 0xBF, 0x0F, 0x00).map(_.toByte)

  private val XorInitialCode = Array(0xE1F0, 0x1D0F, 0xCC9C, 0x84C0, 0x110C,
    0x0E10, 0xF1CE, 0x313E, 0x1872, 0xE139, 0xD40F, 0x84F9, 0x280C, 0xA96A,
    0x4EC3)

  /** 15 generator seeds × 7 doublings mod 0x11021 = the 105-entry XorMatrix
    * ([MS-OFFCRYPTO] 2.3.7.2), generated rather than transcribed. */
  private val XorMatrix: Array[Int] = {
    val seeds = Array(0xAEFC, 0x7B61, 0x4563, 0x0375, 0xD849, 0x6F45, 0xEB23,
      0x47D3, 0xB861, 0x45A0, 0xAA51, 0x76B4, 0x3730, 0x3331, 0x1021)
    seeds.flatMap { s =>
      Iterator.iterate(s) { v =>
        val d = v << 1
        if ((d & 0x10000) != 0) d ^ 0x11021 else d
      }.take(7).toArray
    }
  }

  /** ANSI (cp1252) password bytes, truncated to the format's 15-char max. */
  private def ansiPassword(password: String): Array[Byte] =
    password.take(15).getBytes("windows-1252")

  /** [MS-OFFCRYPTO] 2.3.7.1 CreatePasswordVerifier_Method1 — the classic
    * 16-bit Excel password hash (15-bit rotate-xor over the bytes in
    * reverse, then length and 0xCE4B folded in). */
  private[graft] def xorPasswordVerifier(password: String): Int = {
    val pw = ansiPassword(password)
    def rotl15(v: Int): Int = ((v << 1) & 0x7FFF) | (if ((v & 0x4000) != 0) 1 else 0)
    var verifier = 0
    for (i <- pw.length - 1 to 0 by -1)
      verifier = rotl15(verifier) ^ (pw(i) & 0xFF)
    rotl15(verifier) ^ pw.length ^ 0xCE4B
  }

  /** [MS-OFFCRYPTO] 2.3.7.2 CreateXorKey_Method1: fold the XorMatrix rows
    * selected by the set bits (6..0) of each password byte, in reverse
    * byte order, into the length-selected initial code. */
  private[graft] def xorKey(password: String): Int = {
    val pw = ansiPassword(password)
    require(pw.nonEmpty, "XOR key derivation needs a non-empty password")
    var key = XorInitialCode(pw.length - 1)
    var element = 0x68 // 104: last XorMatrix entry, decremented per bit
    for (i <- pw.length - 1 to 0 by -1) {
      var c = pw(i) & 0xFF
      var j = 0
      while (j < 7) {
        if ((c & 0x40) != 0) key ^= XorMatrix(element)
        c <<= 1
        element -= 1
        j += 1
      }
    }
    key
  }

  /** [MS-OFFCRYPTO] 2.3.7.2 CreateXorArray_Method1: the 16-byte key array —
    * password bytes then pad bytes, each XorRor'd (xor then rotate right 1)
    * with the alternating low/high key bytes, filled from both ends per the
    * spec's index walk. */
  private[graft] def xorArray(password: String): Array[Byte] = {
    val pw = ansiPassword(password)
    val key = xorKey(password)
    val keyHi = ((key >> 8) & 0xFF).toByte
    val keyLo = (key & 0xFF).toByte
    def ror1(b: Int): Byte = (((b & 0xFF) >>> 1) | ((b & 1) << 7)).toByte
    def xorRor(a: Byte, k: Byte): Byte = ror1((a ^ k) & 0xFF)
    val out = new Array[Byte](16)
    var index = pw.length
    if (index % 2 == 1) {
      out(index) = xorRor(XorPad(0), keyHi)
      index -= 1
      out(index) = xorRor(pw(pw.length - 1), keyLo)
    }
    while (index > 0) {
      index -= 1
      out(index) = xorRor(pw(index), keyHi)
      index -= 1
      out(index) = xorRor(pw(index), keyLo)
    }
    index = 15
    var padIndex = 15 - pw.length
    while (padIndex > 0) {
      out(index) = xorRor(XorPad(padIndex), keyHi)
      index -= 1; padIndex -= 1
      out(index) = xorRor(XorPad(padIndex), keyLo)
      index -= 1; padIndex -= 1
    }
    out
  }

  /** Apply XOR method-1 obfuscation over a Workbook stream ([MS-XLS]
    * 2.2.10 + [MS-OFFCRYPTO] 2.3.7.3). Per record the array index seeds
    * from the record's END offset — (bodyStart + length) mod 16 — and
    * advances per body byte (clear spans advance without applying, like
    * the RC4 keystream discipline). Byte transform per the
    * LibreOffice-concordant direction (the OFFCRYPTO pseudocode swaps the
    * encode/decode labels): encode = rotl(plain, 3) ^ key; decode =
    * rotl(cipher ^ key, 5). Record headers and the [MS-XLS] 2.2.10 exempt
    * records stay clear. */
  private[graft] def xorCrypt(stream: Array[Byte], password: String,
                              encrypt: Boolean): Array[Byte] = {
    val arr = xorArray(password)
    def rotl(b: Int, n: Int): Byte =
      ((((b & 0xFF) << n) | ((b & 0xFF) >>> (8 - n))) & 0xFF).toByte
    val out = stream.clone()
    val b = ByteBuffer.wrap(stream).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 0
    while (pos + 4 <= stream.length) {
      val recT = u16(b, pos)
      val len = math.min(u16(b, pos + 2), stream.length - pos - 4)
      val body = pos + 4
      val clearPrefix =
        if (PlainBodies(recT)) len
        else if (recT == 0x0085) math.min(4, len)
        else 0
      var idx = (body + len) & 0xF
      var i = 0
      while (i < len) {
        if (i >= clearPrefix) {
          out(body + i) =
            if (encrypt) (rotl(out(body + i), 3) ^ arr(idx)).toByte
            else rotl(out(body + i) ^ arr(idx), 5)
        }
        idx = (idx + 1) & 0xF
        i += 1
      }
      pos = body + len
    }
    out
  }

  /** Excel's well-known default password: files "encrypted" without a user
    * password (workbook protection) use it and open silently. */
  private val DefaultPassword = "VelvetSweatshop"

  /** Find a FILEPASS record and decrypt the stream for any of the three
    * published variants — XOR obfuscation, binary RC4 ("standard"), RC4
    * CryptoAPI. Tried passwords: the caller's, else the spreadsheet
    * default; a failed verifier raises with the variant named. */
  private[graft] def decryptIfNeeded(stream: Array[Byte], password: Option[String]): Array[Byte] = {
    val b = ByteBuffer.wrap(stream).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 0
    while (pos + 4 <= stream.length) {
      val recT = u16(b, pos)
      val len = u16(b, pos + 2)
      val body = pos + 4
      if (recT == 0x002F) {
        def tryPasswords(kind: String, ok: String => Boolean): String =
          (password.toSeq :+ DefaultPassword).find(ok).getOrElse(
            throw new IllegalArgumentException(
              s"BIFF: $kind-encrypted workbook — wrong or missing password " +
                "(default password also failed)"))
        filepassKind(b, body) match {
          case "RC4 standard" =>
            require(len >= 54, "BIFF: truncated FILEPASS record")
            def bytes(off: Int, n: Int) =
              java.util.Arrays.copyOfRange(stream, body + off, body + off + n)
            val salt = bytes(6, 16)
            val encVerifier = bytes(22, 16)
            val encVerifierHash = bytes(38, 16)
            val pw = tryPasswords("RC4",
              p => rc4PasswordOk(p, salt, encVerifier, encVerifierHash))
            return rc4Crypt(stream, pw, salt)
          case "RC4 CryptoAPI" =>
            val (keyBits, salt, encVerifier, encVerifierHash) =
              parseCryptoApiFilepass(stream, body, len)
            val pw = tryPasswords("RC4-CryptoAPI", p =>
              cryptoApiPasswordOk(p, salt, keyBits, encVerifier, encVerifierHash))
            return rc4CryptWith(stream,
              n => new Rc4(cryptoApiKey(pw, salt, keyBits, n)))
          case "XOR obfuscation" =>
            // body: wEncryptionType(2) key(2) verificationBytes(2)
            require(len >= 6, "BIFF: truncated XOR FILEPASS record")
            val storedKey = u16(b, body + 2)
            val storedVerifier = u16(b, body + 4)
            // empty candidate passwords can never open a real workbook
            // (Excel requires 1-15 chars) and would crash the key tables
            val pw = tryPasswords("XOR", p => p.nonEmpty &&
              xorPasswordVerifier(p) == storedVerifier && xorKey(p) == storedKey)
            return xorCrypt(stream, pw, encrypt = false)
          case kind => throw new IllegalArgumentException(
            s"BIFF: encrypted workbook (FILEPASS, $kind) is not supported")
        }
      }
      pos = body + len
    }
    stream
  }

  /** Windows codepage id → JVM charset for BIFF5 byte strings. */
  private def codepageName(cp: Int): String = cp match {
    case 1200  => "UTF-16LE"
    case 10000 => "x-MacRoman"
    case other =>
      val candidate = if (other >= 1250 && other <= 1258) s"windows-$other" else s"cp$other"
      if (java.nio.charset.Charset.isSupported(candidate)) candidate else "windows-1252"
  }

  /** Parse the Workbook stream: (sheet name → rows) in boundsheet order.
    * Handles BIFF8 and BIFF5/7 ([MS-XLS] 2.4.21 BOF.vers): BIFF5 has no
    * SST/LABELSST — strings are inline byte strings in the CODEPAGE
    * encoding, and BOUNDSHEET/LABEL carry no grbit flags byte. */
  private[graft] def sheets(stream: Array[Byte]): Seq[(String, Seq[IndexedSeq[String]])] = {
    val b = ByteBuffer.wrap(stream).order(ByteOrder.LITTLE_ENDIAN)
    require(stream.length >= 6 && u16(b, 0) == 0x0809, "BIFF: stream does not start with BOF")
    val biff5 = u16(b, 4) != 0 && u16(b, 4) < 0x0600
    var codepage = "windows-1252" // CODEPAGE record overrides
    // pass 1: globals — SST + BOUNDSHEETs
    var pos = 0
    var sst = IndexedSeq.empty[String]
    var bounds = Vector.empty[(String, Int)] // (name, substream offset)
    var depth = 0
    var done = false
    while (!done && pos + 4 <= stream.length) {
      val rec = u16(b, pos); val len = u16(b, pos + 2); val body = pos + 4
      rec match {
        case 0x0809 => depth += 1
        case 0x000A => depth -= 1; if (depth <= 0) done = true
        case 0x002F => () // already decrypted upstream (decryptIfNeeded)
        case 0x0042 => codepage = codepageName(u16(b, body))
        case 0x00FC => // SST (+ any immediately-following CONTINUE records)
          val unique = u32(b, body + 4).toInt
          var segs = Vector(java.util.Arrays.copyOfRange(stream, body + 8, body + len))
          var q = body + len
          while (q + 4 <= stream.length && u16(b, q) == 0x003C) {
            val clen = u16(b, q + 2)
            segs :+= java.util.Arrays.copyOfRange(stream, q + 4, q + 4 + clen)
            q += 4 + clen
          }
          val cur = new SstCursor(segs)
          sst = IndexedSeq.fill(unique)(cur.readString())
        case 0x0085 => // BOUNDSHEET (BIFF5: byte string, no flags byte)
          val lbPlyPos = u32(b, body).toInt
          val cch = stream(body + 6) & 0xFF
          val name =
            if (biff5) new String(stream, body + 7, cch, codepage)
            else if ((stream(body + 7) & 1) != 0)
              new String(stream, body + 8, cch * 2, "UTF-16LE")
            else new String(stream, body + 8, cch, "ISO-8859-1")
          bounds :+= (name, lbPlyPos)
        case _ => ()
      }
      pos = body + len
    }
    // pass 2: per-sheet substreams
    bounds.map { case (name, start) =>
      val cells = collection.mutable.ArrayBuffer[(Int, Int, String)]()
      var p = start
      var d = 0
      var stop = false
      while (!stop && p + 4 <= stream.length) {
        val rec = u16(b, p); val len = u16(b, p + 2); val body = p + 4
        rec match {
          case 0x0809 => d += 1
          case 0x000A => d -= 1; if (d <= 0) stop = true
          case 0x00FD => // LABELSST
            cells += ((u16(b, body), u16(b, body + 2), sst(u32(b, body + 6).toInt)))
          case 0x0203 => // NUMBER (xnum IEEE double)
            cells += ((u16(b, body), u16(b, body + 2),
              Spreadsheet.renderNumeric(b.getDouble(body + 6).toString)))
          case 0x027E => // RK
            cells += ((u16(b, body), u16(b, body + 2),
              Spreadsheet.renderNumeric(decodeRk(u32(b, body + 6)).toString)))
          case 0x00BD => // MULRK: ixfe+rk pairs colFirst..colLast
            val rw = u16(b, body); val colFirst = u16(b, body + 2)
            val nCells = (len - 6) / 6
            for (i <- 0 until nCells)
              cells += ((rw, colFirst + i,
                Spreadsheet.renderNumeric(decodeRk(u32(b, body + 4 + 6 * i + 2)).toString)))
          case 0x0205 => // BOOLERR: bool or error-code variant
            val isBool = (stream(body + 7) & 0xFF) == 0
            val v =
              if (isBool) { if (stream(body + 6) != 0) "true" else "false" }
              else (stream(body + 6) & 0xFF) match { // keep xlsx t="e" parity
                case 0x00 => "#NULL!"; case 0x07 => "#DIV/0!"; case 0x0F => "#VALUE!"
                case 0x17 => "#REF!"; case 0x1D => "#NAME?"; case 0x24 => "#NUM!"
                case 0x2A => "#N/A"; case other => s"#ERR$other"
              }
            cells += ((u16(b, body), u16(b, body + 2), v))
          case 0x0204 | 0x00D6 => // LABEL / BIFF5 RSTRING (inline string)
            val cch = u16(b, body + 6)
            val s =
              if (biff5) new String(stream, body + 8, cch, codepage) // no flags byte
              else if ((stream(body + 8) & 1) != 0)
                new String(stream, body + 9, cch * 2, "UTF-16LE")
              else new String(stream, body + 9, cch, "ISO-8859-1")
            cells += ((u16(b, body), u16(b, body + 2), s))
          case 0x002F => () // already decrypted upstream (decryptIfNeeded)
          case _ => ()
        }
        p = body + len
      }
      val rows = cells.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, cs) =>
        val width = cs.map(_._2).max + 1
        val row = Array.fill(width)("")
        cs.foreach { case (_, c, v) => row(c) = v }
        row.toIndexedSeq
      }
      (name, rows)
    }
  }

  /** Dense string rows of one sheet of an xls byte payload (gaps → ""),
    * parity with Spreadsheet.xlsxRows. RC4-standard-encrypted workbooks
    * decrypt with `password` (or the spreadsheet default). */
  def xlsRows(bytes: Array[Byte], sheetName: Option[String] = None,
              password: Option[String] = None): Seq[IndexedSeq[String]] = {
    val all = sheets(decryptIfNeeded(workbookStream(bytes), password))
    sheetName match {
      case Some(n) => all.find(_._1 == n)
        .getOrElse(throw new IllegalArgumentException(s"no sheet $n in xls"))._2
      case None => all.headOption.map(_._2).getOrElse(Nil)
    }
  }

  /** XlsGenerator flattened mode (ref XlsGenerator.scala:105): same
    * hierarchy scan and per-file driver as the xlsx/CSV cousins. */
  def xlsFlattened(spark: SparkSession, glob: String, sheetName: Option[String],
                   valueName: String, dataColStart: Int, dataColEnd: Option[Int],
                   hierarchy: () => List[Spreadsheet.ParseNode],
                   endFieldCol: Int = -1, endField: String = null,
                   password: Option[String] = None): DataFrame =
    Spreadsheet.flattenedDf(spark, glob,
      bytes => xlsRows(bytes, sheetName, password).iterator,
      valueName, dataColStart, dataColEnd, hierarchy, endFieldCol, endField)
}
