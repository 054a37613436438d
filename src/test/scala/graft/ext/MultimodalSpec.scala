package graft.ext

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import sqlImplicits._

  test("extractFeatures: binary plumbing, deterministic stub decode, batch shape") {
    val docs = Seq(
      (1L, "hello world"),
      (2L, ""),
      (3L, "a much longer document body with more bytes"),
    ).toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(docs)
    assert(media.schema("payload").dataType.typeName == "binary")

    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(feats.map(_.doc_id).toSeq == Seq(1L, 2L, 3L))
    assert(feats(0).n_bytes == 11 && feats(1).n_bytes == 0)
    assert(feats.forall(f => f.width >= 64 && f.height >= 64 && f.frame_count >= 1))
    assert(feats(0).digest.length == 16)

    // Determinism: same payload → same stub features on a second run.
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(again.map(f => (f.width, f.height, f.frame_count)).toSeq ==
      feats.map(f => (f.width, f.height, f.frame_count)).toSeq)
  }

  test("resize composes as a media→media transform with recorded dims") {
    val docs = Seq((1L, "abc"), (2L, "different payload")).toDF("doc_id", "text")
    val resized = Multimodal.resize(Multimodal.mediaFromDocuments(docs), 224, 224)
      .collect().sortBy(_.doc_id)
    assert(resized.map(_.doc_id).toSeq == Seq(1L, 2L))
    assert(resized.forall(r => r.width == 224 && r.height == 224 && r.payload.nonEmpty))
    // Deterministic and payload-dependent.
    assert(!resized(0).payload.sameElements(resized(1).payload))
    val again = Multimodal.resize(Multimodal.mediaFromDocuments(docs), 224, 224)
      .collect().sortBy(_.doc_id)
    assert(again(0).payload.sameElements(resized(0).payload))

    // A resize output is itself a valid media table → stages pipeline.
    val feats = Multimodal.extractFeatures(
      Multimodal.resize(Multimodal.mediaFromDocuments(docs), 64, 64).toDF())
    assert(feats.count() == 2)
  }

  test("frame sampling fans out ceil(frames/n) rows per doc") {
    val docs = Seq((1L, "video-ish payload one"), (2L, "another")).toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(docs)
    val frameCounts = Multimodal.extractFeatures(media).collect()
      .map(f => f.doc_id -> f.frame_count).toMap

    val n = 4
    val sampled = Multimodal.sampleFrames(media, n).collect()
    val perDoc = sampled.groupBy(_.doc_id).view.mapValues(_.length).toMap
    frameCounts.foreach { case (id, frames) =>
      assert(perDoc(id) == (frames + n - 1) / n, s"doc $id: $frames frames")
    }
    // Indices are the sampled arithmetic progression; digests distinct per frame.
    val s1 = sampled.filter(_.doc_id == 1L).sortBy(_.frame_idx)
    assert(s1.map(_.frame_idx).toSeq == (0 until frameCounts(1L) by n).toSeq)
    assert(s1.map(_.frame_digest).distinct.length == s1.length)
  }

  test("real WAV decode: geometry, duration, RMS over actual PCM samples") {
    // 8 kHz mono, 2000 frames (250 ms) of a full-scale square wave:
    // RMS of ±A is exactly A = 16384/32768 = 0.5.
    val square = Array.tabulate[Short](2000)(i =>
      if ((i / 10) % 2 == 0) 16384 else -16384)
    val wav = Multimodal.encodeWav(8000, 1, square)
    val silent = Multimodal.encodeWav(44100, 2, new Array[Short](882)) // 10 ms stereo
    val feats = Multimodal.extractFeatures(
      Seq((1L, wav), (2L, silent)).toDF("doc_id", "payload"))
      .collect().sortBy(_.doc_id)
    val f1 = feats(0)
    assert(f1.format == "wav" && f1.sample_rate == 8000 && f1.frame_count == 2000
      && f1.duration_ms == 250, s"$f1")
    assert(f1.mean_level == 0.5, s"square-wave RMS must be exactly 0.5: ${f1.mean_level}")
    val f2 = feats(1)
    assert(f2.format == "wav" && f2.sample_rate == 44100 && f2.frame_count == 441
      && f2.duration_ms == 10 && f2.mean_level == 0.0, s"$f2")
  }

  test("real BMP decode: dims, padded rows, exact mean luminance") {
    // 6x4, left half pure white, right half pure black → mean 127.5
    // (width 6 → row stride 20 bytes, so the 2-byte padding is exercised).
    val bmp = Multimodal.encodeBmp(6, 4,
      (x, _) => if (x < 3) (255, 255, 255) else (0, 0, 0))
    val feats = Multimodal.extractFeatures(Seq((1L, bmp)).toDF("doc_id", "payload"))
      .collect()
    val f = feats(0)
    assert(f.format == "bmp" && f.width == 6 && f.height == 4 && f.frame_count == 1, s"$f")
    assert(f.mean_level == 127.5, s"half-white/half-black mean must be 127.5: ${f.mean_level}")
  }

  test("real BMP resize: resampled payload re-decodes at target dims with preserved content") {
    // Solid color resize: every sampled pixel identical, so luminance
    // must survive the resample exactly.
    val solid = Multimodal.encodeBmp(8, 8, (_, _) => (30, 60, 200)) // BGR
    val resized = Multimodal.resize(Seq((1L, solid)).toDF("doc_id", "payload"), 3, 5)
      .collect()(0)
    val out = Multimodal.decodeBmp(resized.payload)
    assert(out.isDefined && out.get.width == 3 && out.get.height == 5, s"$out")
    // Same color, different pixel count → same mean up to summation
    // rounding (the sums accumulate over 64 vs 15 pixels).
    assert(math.abs(out.get.meanLevel - Multimodal.decodeBmp(solid).get.meanLevel) < 1e-9)
    // A non-uniform image resized 2x down keeps the spatial layout:
    // left-white/right-black stays half-and-half under nearest-neighbor.
    val halves = Multimodal.encodeBmp(8, 4,
      (x, _) => if (x < 4) (255, 255, 255) else (0, 0, 0))
    val down = Multimodal.resize(Seq((1L, halves)).toDF("doc_id", "payload"), 4, 2)
      .collect()(0)
    assert(Multimodal.decodeBmp(down.payload).get.meanLevel == 127.5)
  }

  test("real PNG decode: dims, luminance, every scanline filter reconstructs identically") {
    // 6x4, left half white, right half black → mean 127.5 — and the
    // SAME image encoded under each of the five PNG filters must
    // reconstruct to identical pixels (this is what proves the
    // Sub/Up/Average/Paeth unfilter paths, not just the happy Filter-0
    // case).
    def img(x: Int, @annotation.nowarn y: Int) =
      if (x < 3) (255, 255, 255) else (0, 0, 0)
    val byFilter = (0 to 4).map { f =>
      val png = Multimodal.encodePng(6, 4, img, filter = f)
      val info = Multimodal.decodePng(png)
      assert(info.isDefined, s"filter $f failed to decode")
      (f, info.get, Multimodal.decodePngPixels(png).get._4.toSeq)
    }
    byFilter.foreach { case (f, info, _) =>
      assert(info.format == "png" && info.width == 6 && info.height == 4, s"filter $f: $info")
      assert(info.meanLevel == 127.5, s"filter $f mean ${info.meanLevel}")
    }
    val pixels = byFilter.map(_._3)
    assert(pixels.distinct.size == 1, "filters reconstructed different pixels")
    // A gradient (every byte different) through the Paeth filter —
    // the hardest reconstruction path — survives a full round trip.
    val grad = Multimodal.encodePng(16, 16,
      (x, y) => (x * 16, y * 16, (x + y) * 8), filter = 4)
    val back = Multimodal.decodePngPixels(grad)
    assert(back.isDefined && back.get._1 == 16 && back.get._2 == 16)
    assert((back.get._4(0) & 0xff) == 0 && (back.get._4((16 * 15 + 15) * 3) & 0xff) == 240)
    // And the feature-extraction plumbing reports it as a real png.
    val f = Multimodal.extractFeatures(Seq((1L, grad)).toDF("doc_id", "payload"))
      .collect()(0)
    assert(f.format == "png" && f.width == 16 && f.height == 16, s"$f")
  }

  test("real PNG resize: resampled payload re-decodes as a valid PNG at target dims") {
    val solid = Multimodal.encodePng(8, 8, (_, _) => (200, 60, 30))
    val resized = Multimodal.resize(Seq((1L, solid)).toDF("doc_id", "payload"), 3, 5)
      .collect()(0)
    val out = Multimodal.decodePng(resized.payload)
    assert(out.isDefined && out.get.width == 3 && out.get.height == 5, s"$out")
    assert(math.abs(out.get.meanLevel - Multimodal.decodePng(solid).get.meanLevel) < 1e-9)
    val halves = Multimodal.encodePng(8, 4,
      (x, _) => if (x < 4) (255, 255, 255) else (0, 0, 0), filter = 2)
    val down = Multimodal.resize(Seq((1L, halves)).toDF("doc_id", "payload"), 4, 2)
      .collect()(0)
    assert(Multimodal.decodePng(down.payload).get.meanLevel == 127.5)
  }

  test("PNG chunk walk skips ancillary chunks; malformed PNGs are rejected") {
    // Splice a tEXt chunk between IHDR and IDAT — decode must skip it.
    val png = Multimodal.encodePng(4, 4, (_, _) => (10, 20, 30))
    val ihdrEnd = 8 + 12 + 13 // sig + (len+type+crc) + IHDR data
    val textData = "key value".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update("tEXt".getBytes("US-ASCII")); crc.update(textData)
    val c = crc.getValue.toInt
    val textChunk =
      Array[Byte](0, 0, 0, textData.length.toByte) ++
        "tEXt".getBytes("US-ASCII") ++ textData ++
        Array[Byte]((c >> 24).toByte, (c >> 16).toByte, (c >> 8).toByte, c.toByte)
    val spliced = png.take(ihdrEnd) ++ textChunk ++ png.drop(ihdrEnd)
    val info = Multimodal.decodePng(spliced)
    assert(info.isDefined && info.get.width == 4, s"$info")
    // Truncated IDAT and a non-PNG with the right magic both reject
    // cleanly (fall to the stub via decode()).
    assert(Multimodal.decodePng(png.take(40)).isEmpty)
    val fakeSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      "garbage follows".getBytes("US-ASCII")
    assert(Multimodal.decodePng(fakeSig).isEmpty)
    assert(Multimodal.decode(fakeSig).format == "unknown")
  }

  test("malformed and foreign payloads fall back to the stub, never throw") {
    val truncatedWav = Multimodal.encodeWav(8000, 1, Array.tabulate[Short](100)(_.toShort))
      .take(30) // cut inside the header
    val lyingBmp = "BMnot really a bitmap".getBytes("US-ASCII")
    val jpegish = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      "fake jpeg".getBytes("US-ASCII")
    val feats = Multimodal.extractFeatures(
      Seq((1L, truncatedWav), (2L, lyingBmp), (3L, jpegish))
        .toDF("doc_id", "payload"))
      .collect().sortBy(_.doc_id)
    assert(feats.forall(_.format == "unknown"), feats.map(_.format).toSeq)
    assert(feats.forall(f => f.mean_level == -1.0 && f.width >= 64))
  }

  test("real JPEG decode: dims exact, luminance within lossy tolerance") {
    // Solid colors survive DCT quantization almost exactly; tolerance
    // covers the chroma-subsampled round-off.
    val solid = Multimodal.encodeJpeg(24, 16, (_, _) => (200, 60, 30))
    val info = Multimodal.decode(solid)
    assert(info.format == "jpeg" && info.width == 24 && info.height == 16, s"$info")
    val expected = 0.299 * 200 + 0.587 * 60 + 0.114 * 30
    assert(math.abs(info.meanLevel - expected) < 3.0,
      s"mean ${info.meanLevel} vs expected $expected")
    // A gradient (every block different) still reports exact geometry
    // and a mid-range mean.
    val grad = Multimodal.encodeJpeg(32, 32, (x, y) => (x * 8, y * 8, (x + y) * 4))
    val g = Multimodal.decodeJpeg(grad)
    assert(g.isDefined && g.get.width == 32 && g.get.height == 32, s"$g")
    assert(g.get.meanLevel > 50 && g.get.meanLevel < 200, s"$g")
    // And the feature-extraction plumbing reports it as a real jpeg.
    val f = Multimodal.extractFeatures(Seq((1L, solid)).toDF("doc_id", "payload"))
      .collect()(0)
    assert(f.format == "jpeg" && f.width == 24 && f.height == 16, s"$f")
  }

  test("real JPEG resize: resampled payload re-decodes as a valid JPEG at target dims") {
    val solid = Multimodal.encodeJpeg(8, 8, (_, _) => (120, 120, 120))
    val resized = Multimodal.resize(Seq((1L, solid)).toDF("doc_id", "payload"), 3, 5)
      .collect()(0)
    val out = Multimodal.decodeJpeg(resized.payload)
    assert(out.isDefined && out.get.width == 3 && out.get.height == 5, s"$out")
    assert(math.abs(out.get.meanLevel - Multimodal.decodeJpeg(solid).get.meanLevel) < 3.0)
  }

  test("malformed JPEGs reject cleanly: truncated entropy stream falls to the stub") {
    val solid = Multimodal.encodeJpeg(24, 16, (_, _) => (10, 200, 10))
    // Cut inside the header segments — ImageIO must fail, not throw out.
    assert(Multimodal.decodeJpeg(solid.take(8)).isEmpty)
    assert(Multimodal.decode(solid.take(8)).format == "unknown")
    // SOI magic alone with garbage after it (already covered by the
    // foreign-payload test, re-pinned here against the REAL arm).
    val jpegish = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      "not entropy-coded data".getBytes("US-ASCII")
    assert(Multimodal.decodeJpeg(jpegish).isEmpty)
  }

  test("forged chunk lengths near Int.MaxValue reject cleanly, never throw") {
    // A length like 0x7ffffff0 makes `off + 12 + len` wrap negative in
    // Int arithmetic, slipping past a naive bounds check and crashing
    // in the subsequent read (ADVICE r5). Both chunk walks must do the
    // comparison in Long arithmetic and reject.
    val png = Multimodal.encodePng(4, 4, (_, _) => (10, 20, 30))
    val forgedPng = png.clone()
    val idatOff = 8 + 12 + 13 // first chunk after IHDR
    forgedPng(idatOff) = 0x7f.toByte
    forgedPng(idatOff + 1) = 0xff.toByte
    forgedPng(idatOff + 2) = 0xff.toByte
    forgedPng(idatOff + 3) = 0xf0.toByte
    assert(Multimodal.decodePng(forgedPng).isEmpty)
    assert(Multimodal.decode(forgedPng).format == "unknown")
    val wav = Multimodal.encodeWav(8000, 1, Array.tabulate[Short](100)(_.toShort))
    val forgedWav = wav.clone()
    // fmt chunk size field lives at offset 16 (RIFF 12 + id 4).
    forgedWav(16) = 0xf0.toByte
    forgedWav(17) = 0xff.toByte
    forgedWav(18) = 0xff.toByte
    forgedWav(19) = 0x7f.toByte
    assert(Multimodal.decodeWav(forgedWav).isEmpty)
    assert(Multimodal.decode(forgedWav).format == "unknown")
  }

  test("WAV chunk walk skips foreign chunks and honors word alignment") {
    // Insert an odd-sized LIST chunk between fmt and data; the parser
    // must skip it (with pad byte) and still find the data chunk.
    val base = Multimodal.encodeWav(16000, 1, Array.tabulate[Short](160)(_.toShort))
    val fmtEnd = 36 // RIFF(12) + fmt(8+16)
    val listPayload = "INFOx".getBytes("US-ASCII") // odd size 5 → 1 pad byte
    val chunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ listPayload ++ Array[Byte](0)
    val spliced = base.take(fmtEnd) ++ chunk ++ base.drop(fmtEnd)
    // Patch the RIFF size field (bytes 4..7, little-endian).
    val riffSize = spliced.length - 8
    for (i <- 0 until 4) spliced(4 + i) = (riffSize >> (8 * i)).toByte
    val info = Multimodal.decodeWav(spliced)
    assert(info.isDefined && info.get.sampleRate == 16000
      && info.get.frameCount == 160, s"$info")
  }

  test("FLAC metadata arm: STREAMINFO geometry and exact duration, no entropy decode") {
    val flac = Multimodal.encodeFlacHeader(44100, 2, 441000L)
    val info = Multimodal.decodeFlac(flac)
    assert(info.isDefined, "well-formed STREAMINFO rejected")
    val m = info.get
    assert(m.format == "flac" && m.sampleRate == 44100
      && m.frameCount == 441000 && m.durationMs == 10000L
      && m.meanLevel == -1.0, s"$m")
    assert(Multimodal.decode(flac).format == "flac")
    // A 36-bit sample count survives (frameCount saturates at Int.Max).
    val big = Multimodal.decodeFlac(
      Multimodal.encodeFlacHeader(48000, 1, (1L << 35) + 7L)).get
    assert(big.durationMs == ((1L << 35) + 7L) * 1000L / 48000L)
    // Truncated or wrong-first-block payloads reject cleanly.
    assert(Multimodal.decodeFlac(flac.take(20)).isEmpty)
    val wrongType = flac.clone(); wrongType(4) = 0x84.toByte // type 4 ≠ STREAMINFO
    assert(Multimodal.decodeFlac(wrongType).isEmpty)
  }

  test("GIF container arm: dims from the screen descriptor, frames from the block walk") {
    val gif = Multimodal.encodeGif(320, 200, frames = 7)
    val info = Multimodal.decodeGif(gif)
    assert(info.isDefined, "well-formed GIF rejected")
    val m = info.get
    assert(m.format == "gif" && m.width == 320 && m.height == 200
      && m.frameCount == 7 && m.meanLevel == -1.0, s"$m")
    assert(Multimodal.decode(gif).format == "gif")
    // An extension block between frames is skipped, not counted.
    val withExt = {
      val head = gif.take(13 + 6) // header + screen desc + palette
      val body = gif.slice(13 + 6, gif.length)
      // Graphic-control extension: 0x21 0xF9, one 4-byte sub-block, 0.
      val ext = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
      head ++ ext ++ body
    }
    assert(Multimodal.decodeGif(withExt).map(_.frameCount).contains(7))
  }

  test("printable text can never reach the GIF/FLAC arms (q90 stub determinism)") {
    // "GIF89a" prose: the magic matches and every block-intro byte
    // (!, comma, semicolon) is printable, but a frame's sub-block walk
    // can only terminate on a 0x00 byte — absent from ASCII text — and
    // a trailer with zero frames is rejected, so document prose always
    // falls to the stub.
    val prose = "GIF89a is an image format, isn't it; see the spec!"
      .getBytes("US-ASCII")
    assert(Multimodal.decodeGif(prose).isEmpty)
    assert(Multimodal.decode(prose).format == "unknown")
    val zeroFrames = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](10, 0, 10, 0, 0, 0, 0, 0x3b)
    assert(Multimodal.decodeGif(zeroFrames).isEmpty,
      "a trailer with no image descriptor must not count as a GIF")
    // FLAC's STREAMINFO type byte is 0x00/0x80 — not printable.
    val flacProse = "fLaC streams are lossless audio".getBytes("US-ASCII")
    assert(Multimodal.decodeFlac(flacProse).isEmpty)
    assert(Multimodal.decode(flacProse).format == "unknown")
  }
}
