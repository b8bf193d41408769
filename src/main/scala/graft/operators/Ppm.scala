package graft.operators

/** Minimal binary-PPM (Netpbm "P6") codec in pure Scala — a REAL decoder
  * for a real public image format (spec: netpbm.sourceforge.net/doc/ppm
  * .html): an ASCII header — magic "P6", width, height, maxval, each
  * separated by whitespace and/or '#'-to-end-of-line comments — then one
  * whitespace byte and exactly width·height·3 raw RGB raster bytes.
  *
  * This replaces the former md5-seeded `stubDecode`: the bytes→pixels path
  * is now genuine (header parse + raster slice), and the perceptual-hash
  * kernels ([[aHash]]/[[dHash]]) are the standard average/difference image
  * hashes computed from the decoded pixels. Everything is integer
  * arithmetic so the DuckDB oracle can reproduce the hashes in closed form
  * from the fixture's doc_id-planted pixel functions (FIXTURES.md §4).
  *
  * The reference (elnatan1990/datafusion-impl) has nothing in this
  * category; this is the north-star multimodal brief item (SURVEY.md §2.5).
  */
object Ppm {

  final case class Image(width: Int, height: Int, maxVal: Int, rgb: Array[Byte])

  /** Canonical encoding: "P6\n{w} {h}\n{maxval}\n" + raster. */
  def encode(img: Image): Array[Byte] = {
    require(img.rgb.length == img.width * img.height * 3, "raster size")
    val header =
      s"P6\n${img.width} ${img.height}\n${img.maxVal}\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Strict P6 parser. Accepts the full header grammar (any whitespace
    * runs, '#' comments between tokens) but fails loudly on anything
    * malformed — a corrupt blob must never decode to wrong pixels.
    */
  def decode(bytes: Array[Byte]): Image = {
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"PPM: $msg at byte $i")
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') fail("bad magic")
    i = 2
    def isWs(b: Byte) =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b
    def skipWsAndComments(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (i < bytes.length && isWs(bytes(i))) { i += 1; moved = true }
        if (i < bytes.length && bytes(i) == '#') {
          while (i < bytes.length && bytes(i) != '\n') i += 1
          moved = true
        }
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      if (i >= bytes.length || bytes(i) < '0' || bytes(i) > '9')
        fail("expected digit")
      var v = 0
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0')
        if (v > (1 << 24)) fail("header int out of range")
        i += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val mv = readInt()
    if (w <= 0 || h <= 0 || mv <= 0 || mv > 255) fail("bad dims/maxval")
    // exactly ONE whitespace byte separates maxval from the raster (a
    // raster may legitimately START with '#' or whitespace-valued bytes,
    // so comment/whitespace skipping must stop here — per the spec)
    if (i >= bytes.length || !isWs(bytes(i))) fail("missing raster separator")
    i += 1
    val n = w * h * 3
    if (bytes.length - i != n) fail(s"raster length ${bytes.length - i} != $n")
    Image(w, h, mv, java.util.Arrays.copyOfRange(bytes, i, i + n))
  }

  /** Integer grayscale (r+g+b)/3 per pixel, row-major — integer division,
    * so the DuckDB mirror ((r+g+b)//3) is bit-identical.
    */
  def gray(img: Image): Array[Int] =
    Array.tabulate(img.width * img.height) { p =>
      ((img.rgb(3 * p) & 0xff) + (img.rgb(3 * p + 1) & 0xff) +
        (img.rgb(3 * p + 2) & 0xff)) / 3
    }

  /** Average hash: bit p set iff gray(p)·n ≥ Σgray. The mean compare is
    * kept in exact integers (gray·n vs total) — no float mean to diverge
    * between engines. Requires ≤ 64 pixels (the fixture's are ≤ 35).
    */
  def aHash(img: Image): Long = {
    val g = gray(img); val n = g.length
    require(n <= 64, s"aHash needs <=64 pixels, got $n")
    var tot = 0L; var p = 0
    while (p < n) { tot += g(p); p += 1 }
    var h = 0L; p = 0
    while (p < n) { if (g(p).toLong * n >= tot) h |= 1L << p; p += 1 }
    h
  }

  /** Difference hash: bit y·(w−1)+x set iff gray(x+1,y) > gray(x,y) —
    * horizontal-gradient signs, the standard dHash. Requires ≤ 64 bits.
    */
  def dHash(img: Image): Long = {
    val g = gray(img); val w = img.width
    require((w - 1) * img.height <= 64, "dHash needs <=64 bits")
    var hsh = 0L; var y = 0
    while (y < img.height) {
      var x = 0
      while (x < w - 1) {
        if (g(y * w + x + 1) > g(y * w + x)) hsh |= 1L << (y * (w - 1) + x)
        x += 1
      }
      y += 1
    }
    hsh
  }
}
