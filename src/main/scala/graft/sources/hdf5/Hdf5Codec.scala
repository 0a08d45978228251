package graft.sources.hdf5

import java.io.{File, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.types._

/** Pure-JVM codec for the public HDF5 binary file format — the subset
  * the reference's I/O uses (flat named 1-D datasets, contiguous
  * layout: `/root/reference/src/cgen-hpat-pattern-match.jl:849-1048`
  * read, `:1201-1269` write). No native libhdf5: the bytes written
  * here follow the HDF5 File Format Specification directly —
  * superblock version 0, a root group with a version-1 B-tree + local
  * heap + symbol table node, and one version-1 object header per
  * dataset carrying dataspace / datatype / fill-value / contiguous
  * layout messages. Files open in any standard HDF5 tool; the reader
  * walks the same structures (following header continuations and
  * skipping unknown messages, so libhdf5-written flat files read too).
  *
  * Type mapping (all little-endian):
  *  - LongType/IntegerType → fixed-point, signed, 8/4 bytes
  *  - BooleanType          → fixed-point, unsigned, 1 byte (0/1)
  *  - DoubleType/FloatType → IEEE float, 8/4 bytes
  *  - StringType           → fixed-length null-padded UTF-8 string
  *    sized to the longest value (the classic HDF5 table-column string
  *    shape; values must not contain NUL bytes)
  *
  * Contiguous layout is the point at scale: a row range [start, end)
  * of any column is exactly the byte range
  * [addr + start·esz, addr + end·esz), so block-partitioned executors
  * seek and read disjoint ranges — no decode of unrequested rows, no
  * shuffle. Nulls are rejected at write time (an HDF5 fixed dataset
  * has no null notion, and neither does the reference engine).
  */
object Hdf5Codec {

  private val Signature: Array[Byte] =
    Array(0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF
  private val LeafK = 32 // symbols per SNOD ≤ 2·LeafK
  private val InternalK = 16 // B-tree fan-out ≤ 2·InternalK

  /** One dataset's file metadata after a parse. `cols` = 1 for rank-1
    * datasets; rank-2 (matrix) datasets are row-major n×cols and read
    * back as one array-typed value per row. */
  final case class DatasetMeta(name: String, dtype: DataType,
                               elemSize: Int, rows: Long,
                               dataAddr: Long, dataSize: Long,
                               cols: Long = 1L) {
    def sparkType: DataType =
      if (cols > 1) ArrayType(dtype, containsNull = false) else dtype
  }
  final case class FileMeta(datasets: Seq[DatasetMeta]) {
    def apply(name: String): DatasetMeta =
      datasets.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"no dataset /$name in HDF5 file (have: ${datasets.map(_.name).mkString(", ")})"))
    def rows: Long = datasets.headOption.map(_.rows).getOrElse(0L)
  }

  // ------------------------------------------------------------- write

  /** Encode `cols` as a complete HDF5 file at `file` (atomic: staged to
    * a sibling temp file, then moved). */
  def write(file: File, cols: Seq[(String, (DataType, IndexedSeq[Any]))]): Unit = {
    require(cols.nonEmpty, "HDF5 write needs at least one column dataset")
    require(cols.size <= 2 * LeafK,
      s"HDF5 sink caps at ${2 * LeafK} datasets per file (one SNOD)")
    val lens = cols.map(_._2._2.size).distinct
    require(lens.size == 1, s"ragged column datasets: $lens")
    cols.foreach { case (n, (_, vs)) =>
      require(!vs.contains(null),
        s"HDF5 dataset /$n has null values; HDF5 fixed datasets have no null notion")
    }
    val nRows = lens.head

    // Sorted symbol table (the v1 group B-tree requires name order).
    val sorted = cols.sortBy(_._1)
    val utf8 = sorted.map { case (n, _) => n.getBytes(StandardCharsets.UTF_8) }

    // --- local heap data: offset 0 holds the empty string (the root
    // link name), then each dataset name, null-terminated, 8-aligned.
    val heapOffsets = new Array[Long](sorted.size)
    var heapPos = 8L
    val heapData = new ArrayBuffer[Byte]()
    heapData ++= new Array[Byte](8)
    for (i <- sorted.indices) {
      heapOffsets(i) = heapPos
      val padded = align8(utf8(i).length + 1)
      heapData ++= utf8(i)
      heapData ++= new Array[Byte](padded - utf8(i).length)
      heapPos += padded
    }
    val heapDataSize = heapPos

    // --- per-dataset encoded pieces (datatype message body + data bytes)
    // Rank-2 (matrix) datasets arrive as ArrayType columns: row-major
    // n×cols of the element type (the reference's HDF5 matrix read is
    // the same layout, 1-D block partitioned on the first dim).
    val ncols: Seq[Long] = sorted.map {
      case (n, (ArrayType(_, _), vs)) =>
        val widths = vs.map {
          case a: Array[_] => a.length
          case s: scala.collection.Seq[_] => s.size
          case other => throw new IllegalArgumentException(
            s"/$n: array column values must be Seq/Array, got ${other.getClass}")
        }.distinct
        require(widths.size == 1 && widths.head > 0,
          s"/$n: rank-2 dataset needs uniform non-empty row width, got $widths")
        widths.head.toLong
      case _ => 1L
    }
    val dtypeBodies = sorted.map { case (n, (t, vs)) => datatypeBody(n, t, vs) }
    val elemSizes = dtypeBodies.map(_._2)
    val dsBodyLens = ncols.map(c => if (c > 1) 24 else 16)
    val ohSizes = sorted.indices.map { i =>
      // dataspace(8+body) + datatype(8+body) + fill(8+8) + layout(8+24)
      (8 + dsBodyLens(i)) + (8 + dtypeBodies(i)._1.length) + 16 + 32
    }

    // --- file layout (sequential address assignment)
    var pos = 96L // superblock
    val rootOhAddr = pos; pos += 16 + 24 // v1 prefix+pad, one 16-byte stab msg
    val btreeAddr = pos; pos += 24 + (2 * InternalK + 1) * 8 + 2 * InternalK * 8
    val heapHdrAddr = pos; pos += 32
    val heapDataAddr = pos; pos += heapDataSize
    val snodAddr = pos; pos += 8 + 2 * LeafK * 40
    val ohAddrs = new Array[Long](sorted.size)
    for (i <- sorted.indices) { ohAddrs(i) = pos; pos += 16 + ohSizes(i) }
    val dataAddrs = new Array[Long](sorted.size)
    val dataSizes = new Array[Long](sorted.size)
    for (i <- sorted.indices) {
      pos = align8(pos)
      dataAddrs(i) = pos
      dataSizes(i) = nRows.toLong * ncols(i) * elemSizes(i)
      pos += dataSizes(i)
    }
    val eof = pos

    val buf = ByteBuffer.allocate(math.toIntExact(eof))
      .order(ByteOrder.LITTLE_ENDIAN)

    // --- superblock v0
    buf.put(Signature)
    buf.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // sb/fs/root vers + reserved
    buf.put(0.toByte) // shared header message format version
    buf.put(8.toByte).put(8.toByte) // size of offsets / lengths
    buf.put(0.toByte)
    buf.putShort(LeafK.toShort).putShort(InternalK.toShort)
    buf.putInt(0) // file consistency flags
    buf.putLong(0L) // base address
    buf.putLong(Undef) // free space info
    buf.putLong(eof)
    buf.putLong(Undef) // driver info block
    // root group symbol table entry (cache type 1: cached stab scratch)
    buf.putLong(0L).putLong(rootOhAddr).putInt(1).putInt(0)
    buf.putLong(btreeAddr).putLong(heapHdrAddr)

    // --- root group object header (v1): one Symbol Table message
    buf.put(1.toByte).put(0.toByte).putShort(1.toShort)
    buf.putInt(1).putInt(24).putInt(0) // refcount, header size, pad
    buf.putShort(0x0011.toShort).putShort(16.toShort)
    buf.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.putLong(btreeAddr).putLong(heapHdrAddr)

    // --- group B-tree v1: one leaf-level node, one SNOD child.
    // Keys are heap offsets: key0 = 0 ("", ≤ first name), key1 = last
    // (greatest) name in the child. Node is allocated at full 2K size.
    val btreeEnd = buf.position() + 24 + (2 * InternalK + 1) * 8 + 2 * InternalK * 8
    buf.put("TREE".getBytes(StandardCharsets.US_ASCII))
    buf.put(0.toByte).put(0.toByte).putShort(1.toShort) // group node, level 0, 1 entry
    buf.putLong(Undef).putLong(Undef) // siblings
    buf.putLong(0L) // key 0
    buf.putLong(snodAddr) // child 0
    buf.putLong(heapOffsets.last) // key 1
    while (buf.position() < btreeEnd) buf.put(0.toByte)

    // --- local heap header + data segment
    buf.put("HEAP".getBytes(StandardCharsets.US_ASCII))
    buf.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.putLong(heapDataSize)
    buf.putLong(1L) // free-list head: 1 = no free block (H5HL_FREE_NULL)
    buf.putLong(heapDataAddr)
    buf.put(heapData.toArray)

    // --- symbol table node: entries sorted by name
    val snodEnd = buf.position() + 8 + 2 * LeafK * 40
    buf.put("SNOD".getBytes(StandardCharsets.US_ASCII))
    buf.put(1.toByte).put(0.toByte).putShort(sorted.size.toShort)
    for (i <- sorted.indices) {
      buf.putLong(heapOffsets(i)).putLong(ohAddrs(i))
      buf.putInt(0).putInt(0) // cache type 0, reserved
      buf.putLong(0L).putLong(0L) // scratch
    }
    while (buf.position() < snodEnd) buf.put(0.toByte)

    // --- dataset object headers
    for (i <- sorted.indices) {
      buf.put(1.toByte).put(0.toByte).putShort(4.toShort)
      buf.putInt(1).putInt(ohSizes(i)).putInt(0)
      // dataspace v1: simple, rank 1 or 2, no max-dims flag (max = current)
      val rank = if (ncols(i) > 1) 2 else 1
      buf.putShort(0x0001.toShort).putShort(dsBodyLens(i).toShort).putInt(0)
      buf.put(1.toByte).put(rank.toByte).put(0.toByte)
      buf.put(new Array[Byte](5))
      buf.putLong(nRows.toLong)
      if (rank == 2) buf.putLong(ncols(i))
      // datatype
      val body = dtypeBodies(i)._1
      buf.putShort(0x0003.toShort).putShort(body.length.toShort).putInt(0)
      buf.put(body)
      // fill value v2: alloc early, fill undefined (library default)
      buf.putShort(0x0005.toShort).putShort(8.toShort).putInt(0)
      buf.put(2.toByte).put(1.toByte).put(0.toByte).put(0.toByte)
      buf.putInt(0)
      // data layout v3, class 1 (contiguous): address + size
      buf.putShort(0x0008.toShort).putShort(24.toShort).putInt(0)
      buf.put(3.toByte).put(1.toByte)
      buf.putLong(dataAddrs(i)).putLong(dataSizes(i))
      buf.put(new Array[Byte](6))
    }

    // --- raw data, little-endian contiguous (rank-2 rows back to back)
    for (i <- sorted.indices) {
      while (buf.position() < dataAddrs(i)) buf.put(0.toByte)
      val (_, (t, vs)) = sorted(i)
      val esz = elemSizes(i)
      def putElem(elem: DataType): Any => Unit = elem match {
        case LongType    => v => buf.putLong(v.asInstanceOf[Long])
        case IntegerType => v => buf.putInt(v.asInstanceOf[Int])
        case DoubleType  => v => buf.putDouble(v.asInstanceOf[Double])
        case FloatType   => v => buf.putFloat(v.asInstanceOf[Float])
        case BooleanType =>
          v => buf.put(if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
        case StringType => v => {
          val b = v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
          buf.put(b).put(new Array[Byte](esz - b.length))
        }
        case other => throw new UnsupportedOperationException(
          s"hdf5 sink: unsupported column type $other")
      }
      t match {
        case ArrayType(elem, _) =>
          val put = putElem(elem)
          vs.foreach {
            case a: Array[_] => a.foreach(put)
            case s: scala.collection.Seq[_] => s.foreach(put)
            case other => throw new IllegalArgumentException(s"$other")
          }
        case scalar => vs.foreach(putElem(scalar))
      }
    }

    file.getParentFile match { case null => (); case d => d.mkdirs() }
    val tmp = new File(file.getParentFile, s".${file.getName}.tmp")
    Files.write(tmp.toPath, buf.array())
    Files.move(tmp.toPath, file.toPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    metaCache.remove(file.getAbsolutePath)
  }

  /** Datatype message body (8-byte header + class properties, 8-byte
    * padded) and the element size. */
  private def datatypeBody(name: String, t: DataType,
                           vs: IndexedSeq[Any]): (Array[Byte], Int) = {
    def fixed(size: Int, signed: Boolean): Array[Byte] = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x10.toByte) // version 1 << 4 | class 0 (fixed-point)
      b.put((if (signed) 0x08 else 0x00).toByte).put(0.toByte).put(0.toByte)
      b.putInt(size)
      b.putShort(0.toShort).putShort((8 * size).toShort) // bit offset / precision
      b.putShort(0.toShort).putShort(0.toShort) // pad to 8
      b.array()
    }
    def ieee(size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x11.toByte) // version 1 << 4 | class 1 (float)
      // bit field: little-endian, implied-msb mantissa norm (bits 4-5 =
      // 2), sign bit location in byte 1
      b.put(0x20.toByte).put((8 * size - 1).toByte).put(0.toByte)
      b.putInt(size)
      b.putShort(0.toShort).putShort((8 * size).toShort)
      if (size == 8) { b.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte); b.putInt(1023) }
      else { b.put(23.toByte).put(8.toByte).put(0.toByte).put(23.toByte); b.putInt(127) }
      b.putInt(0) // pad to 8
      b.array()
    }
    t match {
      // rank-2 dataset: datatype message carries the ELEMENT type
      // (matrix shape lives in the dataspace message)
      case ArrayType(elem, _) =>
        require(elem != StringType,
          "hdf5 sink: rank-2 string datasets not supported")
        datatypeBody(name, elem, IndexedSeq.empty)
      case LongType    => (fixed(8, signed = true), 8)
      case IntegerType => (fixed(4, signed = true), 4)
      case BooleanType => (fixed(1, signed = false), 1)
      case DoubleType  => (ieee(8), 8)
      case FloatType   => (ieee(4), 4)
      case StringType =>
        val maxLen = math.max(1,
          if (vs.isEmpty) 1
          else vs.iterator.map(v =>
            v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8).length).max)
        vs.foreach(v => require(!v.asInstanceOf[String].contains('\u0000'),
          s"HDF5 string dataset /$name: NUL bytes not representable in " +
            "null-padded fixed-length strings"))
        val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        b.put(0x13.toByte) // version 1 << 4 | class 3 (string)
        b.put(0x01.toByte) // padding: null pad
        b.put(0x01.toByte) // character set: UTF-8
        b.put(0.toByte)
        b.putInt(maxLen)
        (b.array(), maxLen)
      case other => throw new UnsupportedOperationException(
        s"hdf5 sink: unsupported column type $other")
    }
  }

  private def align8(n: Long): Long = (n + 7) & ~7L
  private def align8(n: Int): Int = (n + 7) & ~7

  // -------------------------------------------------------------- read

  /** Parsed-file cache keyed by absolute path, invalidated on
    * (length, mtime) change — metadata is parsed once per executor,
    * then every block read is a pure seek. */
  private val metaCache = new TrieMap[String, (Long, Long, FileMeta)]()

  def meta(file: File): FileMeta = {
    val key = file.getAbsolutePath
    val (len, mtime) = (file.length(), file.lastModified())
    metaCache.get(key) match {
      case Some((l, m, fm)) if l == len && m == mtime => fm
      case _ =>
        val fm = parse(file)
        metaCache.put(key, (len, mtime, fm))
        fm
    }
  }

  def exists(file: File): Boolean = file.isFile

  /** Read rows [start, end) of `column` — one seek + one contiguous
    * read of exactly (end−start)·cols·elemSize bytes. Rank-2 datasets
    * yield one primitive array per row (a contiguous row slab, the
    * reference's 1-D block matrix read). */
  def readRange(file: File, column: String, start: Long, end: Long): IndexedSeq[Any] = {
    val dm = meta(file)(column)
    require(start >= 0 && end <= dm.rows && start <= end,
      s"range [$start,$end) outside dataset /$column of ${dm.rows} rows")
    val n = math.toIntExact(end - start)
    val rowBytes = dm.cols * dm.elemSize
    val bytes = new Array[Byte](math.toIntExact(n * rowBytes))
    val raf = new RandomAccessFile(file, "r")
    try { raf.seek(dm.dataAddr + start * rowBytes); raf.readFully(bytes) }
    finally raf.close()
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def scalars(count: Int): IndexedSeq[Any] = dm.dtype match {
      case LongType    => IndexedSeq.fill[Any](count)(b.getLong)
      case IntegerType => IndexedSeq.fill[Any](count)(b.getInt)
      case DoubleType  => IndexedSeq.fill[Any](count)(b.getDouble)
      case FloatType   => IndexedSeq.fill[Any](count)(b.getFloat)
      case BooleanType => IndexedSeq.fill[Any](count)(b.get != 0)
      case StringType  => IndexedSeq.fill[Any](count) {
        val s = new Array[Byte](dm.elemSize); b.get(s)
        var e = s.length
        while (e > 0 && s(e - 1) == 0) e -= 1
        new String(s, 0, e, StandardCharsets.UTF_8)
      }
      case other => throw new UnsupportedOperationException(s"hdf5: $other")
    }
    if (dm.cols == 1L) scalars(n)
    else {
      val w = math.toIntExact(dm.cols)
      IndexedSeq.fill[Any](n)(dm.dtype match {
        case LongType    => Array.fill(w)(b.getLong)
        case IntegerType => Array.fill(w)(b.getInt)
        case DoubleType  => Array.fill(w)(b.getDouble)
        case FloatType   => Array.fill(w)(b.getFloat)
        case other => throw new UnsupportedOperationException(
          s"hdf5: rank-2 $other")
      })
    }
  }

  def readAll(file: File): Seq[(String, (DataType, IndexedSeq[Any]))] = {
    val fm = meta(file)
    fm.datasets.map(d =>
      d.name -> (d.sparkType -> readRange(file, d.name, 0L, d.rows)))
  }

  private def parse(file: File): FileMeta = {
    val raf = new RandomAccessFile(file, "r")
    try {
      def readAt(addr: Long, n: Int): ByteBuffer = {
        val a = new Array[Byte](n)
        raf.seek(addr); raf.readFully(a)
        ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN)
      }
      // superblock v0
      val sb = readAt(0L, 96)
      val sig = new Array[Byte](8); sb.get(sig)
      require(java.util.Arrays.equals(sig, Signature),
        s"$file is not an HDF5 file (bad signature)")
      val sbVersion = sb.get()
      require(sbVersion == 0, s"unsupported HDF5 superblock version $sbVersion")
      sb.position(13)
      require(sb.get() == 8 && sb.get() == 8,
        "only 8-byte offsets/lengths supported")
      sb.position(64)
      val rootOh = sb.getLong

      // root object header → symbol table message
      var btreeAddr = Undef
      var heapAddr = Undef
      walkMessages(raf, rootOh) { (mtype, body) =>
        if (mtype == 0x0011) { btreeAddr = body.getLong; heapAddr = body.getLong }
      }
      require(btreeAddr != Undef && heapAddr != Undef,
        "root group has no symbol table message")

      // local heap → data segment
      val hh = readAt(heapAddr, 32)
      val hsig = new Array[Byte](4); hh.get(hsig)
      require(new String(hsig, StandardCharsets.US_ASCII) == "HEAP", "bad local heap")
      hh.position(8)
      val heapSize = hh.getLong; hh.getLong
      val heapDataAddr = hh.getLong
      val heap = readAt(heapDataAddr, math.toIntExact(heapSize))

      def heapString(off: Long): String = {
        heap.position(math.toIntExact(off))
        val sbld = new ArrayBuffer[Byte]()
        var c = heap.get()
        while (c != 0) { sbld += c; c = heap.get() }
        new String(sbld.toArray, StandardCharsets.UTF_8)
      }

      // group B-tree (recurse internal levels) → SNOD entries
      val entries = ArrayBuffer[(String, Long)]()
      def walkBtree(addr: Long): Unit = {
        val hd = readAt(addr, 24)
        val tsig = new Array[Byte](4); hd.get(tsig)
        require(new String(tsig, StandardCharsets.US_ASCII) == "TREE", "bad B-tree node")
        require(hd.get() == 0, "not a group B-tree")
        val level = hd.get()
        val used = hd.getShort & 0xFFFF
        // children interleaved with keys: key0, child0, key1, child1…
        val body = readAt(addr + 24, used * 16 + 8)
        for (i <- 0 until used) {
          body.position(8 + i * 16)
          val child = body.getLong
          if (level > 0) walkBtree(child)
          else {
            val sn = readAt(child, 8)
            val ssig = new Array[Byte](4); sn.get(ssig)
            require(new String(ssig, StandardCharsets.US_ASCII) == "SNOD", "bad SNOD")
            sn.position(6)
            val count = sn.getShort & 0xFFFF
            val se = readAt(child + 8, count * 40)
            for (j <- 0 until count) {
              se.position(j * 40)
              entries += heapString(se.getLong) -> se.getLong
            }
          }
        }
      }
      walkBtree(btreeAddr)

      val datasets = entries.map { case (name, ohAddr) =>
        var rows = -1L
        var ncols = 1L
        var dtype: DataType = null
        var esz = 0
        var dataAddr = Undef
        var dataSize = -1L
        walkMessages(raf, ohAddr) { (mtype, body) =>
          mtype match {
            case 0x0001 => // dataspace (v1 or v2)
              val v = body.get()
              val rank = body.get() & 0xFF
              require(rank <= 2,
                s"/$name: only rank ≤ 2 datasets supported, rank=$rank")
              body.get() // flags
              if (v == 1) body.position(body.position() + 5)
              else body.get() // v2: type byte
              rows = if (rank == 0) 1L else body.getLong
              if (rank == 2) ncols = body.getLong
            case 0x0003 => // datatype
              val cv = body.get() & 0xFF
              val cls = cv & 0x0F
              val bits0 = body.get() & 0xFF
              body.get(); body.get()
              val size = body.getInt
              cls match {
                case 0 =>
                  val signed = (bits0 & 0x08) != 0
                  dtype = (size, signed) match {
                    case (8, true)  => LongType
                    case (4, true)  => IntegerType
                    case (2, true)  => ShortType
                    case (1, true)  => ByteType
                    case (1, false) => BooleanType
                    case other => throw new UnsupportedOperationException(
                      s"/$name: fixed-point $other")
                  }
                  esz = size
                case 1 =>
                  dtype = if (size == 8) DoubleType else FloatType
                  esz = size
                case 3 =>
                  dtype = StringType; esz = size
                case c => throw new UnsupportedOperationException(
                  s"/$name: HDF5 datatype class $c not supported (fixed/float/string only)")
              }
            case 0x0008 => // data layout
              val v = body.get() & 0xFF
              require(v == 3, s"/$name: layout message version $v (need 3)")
              val lclass = body.get() & 0xFF
              require(lclass == 1,
                s"/$name: only contiguous layout supported (class $lclass)")
              dataAddr = body.getLong; dataSize = body.getLong
            case _ => ()
          }
        }
        require(rows >= 0 && dtype != null && dataAddr != Undef,
          s"/$name: incomplete object header (rows=$rows dtype=$dtype)")
        DatasetMeta(name, dtype, esz, rows, dataAddr, dataSize, ncols)
      }
      FileMeta(datasets.toSeq)
    } finally raf.close()
  }

  /** Walk a version-1 object header's messages (following continuation
    * blocks), invoking `f(type, body)` per message. Unknown message
    * types are skipped by size. */
  private def walkMessages(raf: RandomAccessFile, addr: Long)
                          (f: (Int, ByteBuffer) => Unit): Unit = {
    def readAt(a: Long, n: Int): ByteBuffer = {
      val arr = new Array[Byte](n)
      raf.seek(a); raf.readFully(arr)
      ByteBuffer.wrap(arr).order(ByteOrder.LITTLE_ENDIAN)
    }
    val pre = readAt(addr, 12)
    require(pre.get() == 1, "only version-1 object headers supported")
    pre.get()
    val nMsgs = pre.getShort & 0xFFFF
    pre.getInt // reference count
    val hdrSize = pre.getInt
    var blocks = List((addr + 16, hdrSize.toLong)) // v1: 4 pad bytes after prefix
    var seen = 0
    while (blocks.nonEmpty && seen < nMsgs) {
      val (bAddr, bLen) = blocks.head
      blocks = blocks.tail
      val b = readAt(bAddr, math.toIntExact(bLen))
      while (b.remaining() >= 8 && seen < nMsgs) {
        val mtype = b.getShort & 0xFFFF
        val msize = b.getShort & 0xFFFF
        b.get(); b.get(); b.get(); b.get() // flags + reserved
        val body = b.slice().order(ByteOrder.LITTLE_ENDIAN)
        body.limit(msize)
        if (mtype == 0x0010) { // object header continuation
          blocks = (body.getLong, body.getLong) :: blocks
        } else f(mtype, body)
        b.position(b.position() + msize)
        seen += 1
      }
    }
  }
}
