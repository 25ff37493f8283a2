package graft.ingest

import java.io.{InputStream, OutputStream}

import org.apache.hadoop.conf.{Configurable, Configuration}
import org.apache.hadoop.io.compress._

/** Hadoop `CompressionCodec` for zstd backed by zstd-jni (which Spark
  * already ships for shuffle/event-log compression) — real corpora
  * (Dolma, FineWeb) release as `.jsonl.zst`, and Hadoop's own
  * ZStandardCodec needs the native libhadoop this environment (and
  * many clusters) doesn't load.
  *
  * Stream-only: compression runs in the wrapping streams, so the
  * Compressor/Decompressor the codec advertises are inert pool
  * tokens — `LineRecordReader` acquires one from `CodecPool` and
  * passes it to `createInputStream`, which ignores it and wraps the
  * raw stream; only the pool's own `reset()`/`end()` lifecycle ever
  * touches them. Frames: the reader is `setContinuous(true)` so
  * concatenated frames (what independent distributed writers append)
  * decode as one stream.
  *
  * Like gzip this codec is NOT splittable — one task per file, the
  * jsonl sharding contract (many files = the parallelism knob). */
final class GraftZstdCodec extends Configurable with CompressionCodec {
  import GraftZstdCodec._

  private var conf: Configuration = _
  override def setConf(c: Configuration): Unit = conf = c
  override def getConf: Configuration = conf

  override def createOutputStream(out: OutputStream)
      : CompressionOutputStream = new ZstdOut(out)
  override def createOutputStream(out: OutputStream, c: Compressor)
      : CompressionOutputStream = new ZstdOut(out)
  override def createInputStream(in: InputStream)
      : CompressionInputStream = new ZstdIn(in)
  override def createInputStream(in: InputStream, d: Decompressor)
      : CompressionInputStream = new ZstdIn(in)

  override def getCompressorType: Class[_ <: Compressor] =
    classOf[InertCompressor]
  override def createCompressor(): Compressor = new InertCompressor
  override def getDecompressorType: Class[_ <: Decompressor] =
    classOf[InertDecompressor]
  override def createDecompressor(): Decompressor = new InertDecompressor

  override def getDefaultExtension: String = ".zst"
}

object GraftZstdCodec {

  private final class ZstdOut(raw: OutputStream)
      extends CompressionOutputStream(raw) {
    private val z = new com.github.luben.zstd.ZstdOutputStream(raw, 3)
    override def write(b: Int): Unit = z.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      z.write(b, off, len)
    override def flush(): Unit = z.flush()
    // the frame ends on close; finish() has no separate meaning for a
    // one-shot text shard
    override def finish(): Unit = z.flush()
    override def resetState(): Unit = ()
    override def close(): Unit = z.close() // ends the frame, closes raw
  }

  private final class ZstdIn(raw: InputStream)
      extends CompressionInputStream(raw) {
    private val z = {
      val s = new com.github.luben.zstd.ZstdInputStream(raw)
      s.setContinuous(true) // concatenated frames read as one stream
      s
    }
    override def read(): Int = z.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      z.read(b, off, len)
    override def resetState(): Unit = ()
    override def close(): Unit = z.close()
  }

  /** Pool tokens: `CodecPool` instantiates/recycles these around the
    * record reader; the codec's streams never consult them. Only the
    * lifecycle methods are reachable — the data-path methods throw so
    * a future caller that DOES try block-mode compression fails
    * loudly instead of silently corrupting. */
  private def inert = throw new IllegalStateException(
    "GraftZstdCodec is stream-only; block-mode (de)compression is not " +
      "supported")

  final class InertCompressor extends Compressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = inert
    override def needsInput(): Boolean = inert
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit =
      inert
    override def getBytesRead: Long = 0L
    override def getBytesWritten: Long = 0L
    override def finish(): Unit = ()
    override def finished(): Boolean = true
    override def compress(b: Array[Byte], off: Int, len: Int): Int = inert
    override def reset(): Unit = ()
    override def end(): Unit = ()
    override def reinit(conf: Configuration): Unit = ()
  }

  final class InertDecompressor extends Decompressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = inert
    override def needsInput(): Boolean = inert
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit =
      inert
    override def needsDictionary(): Boolean = false
    override def finished(): Boolean = true
    override def decompress(b: Array[Byte], off: Int, len: Int): Int = inert
    override def getRemaining: Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
  }
}
