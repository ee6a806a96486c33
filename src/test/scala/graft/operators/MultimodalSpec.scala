package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media generation is deterministic across runs and partitionings") {
    val a = Multimodal.generate(spark, 50L).collect().sortBy(_.media_id)
    val b = Multimodal.generate(spark, 50L).repartition(7).collect()
      .sortBy(_.media_id)
    assert(a.length === 50)
    a.zip(b).foreach { case (x, y) =>
      assert(x.media_id === y.media_id)
      assert(java.util.Arrays.equals(x.payload, y.payload))
      assert(x.meta === y.meta)
    }
  }

  test("binary payload + struct metadata survive a parquet round-trip") {
    val out = tmpDir("media")
    Multimodal.generate(spark, 30L).write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() === 30L)
    val schema = back.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
  }

  test("feature extraction decodes PPM images and stubs other kinds") {
    val ds = Multimodal.generate(spark, 70L) // spans multiple decode batches
    val recs = ds.collect().sortBy(_.media_id)
    val feats = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    assert(feats.length === 70)
    assert(feats.forall(f => f.brightness > 0.0 && f.brightness < 1.0))
    // every payload is exactly its format's self-described size: images
    // are header + raster, audio the fixed 4096-byte WAV, video the boxes
    // plus one 589-byte embedded PPM frame per second of duration
    feats.zip(recs).foreach { case (f, r) =>
      assert(f.n_bytes === r.payload.length)
      r.kind match {
        case "image" =>
          assert(f.n_bytes === s"P6\n${r.meta.width} ${r.meta.height}\n255\n"
            .length + r.meta.width * r.meta.height * 3)
        case "audio" => assert(f.n_bytes === 4096)
        case _ =>
          assert(f.n_bytes ===
            140 + (r.meta.duration_ms / 1000L).toInt * 589)
      }
    }
    // image brightness is the RASTER mean — recompute locally by skipping
    // the header (3rd newline), not via the decoder
    val r0 = recs(0) // media_id 0 is an image
    assert(r0.kind === "image")
    val rasterFrom = {
      var nl = 0; var i = 0
      while (nl < 3) { if (r0.payload(i) == '\n') nl += 1; i += 1 }
      i
    }
    val raster = r0.payload.drop(rasterFrom)
    val expected = raster.map(_ & 0xff).sum.toDouble / raster.length / 255.0
    assert(math.abs(feats(0).brightness - expected) < 1e-12)
    // aspect comes from the decoded header and equals the metadata ratio
    assert(feats(0).aspect === r0.meta.width.toDouble / r0.meta.height)
  }

  test("decodePpm parses header and rejects malformed input") {
    val img = Multimodal.generate(spark, 3L).filter(_.kind == "image").head()
    val Some((w, h, mean)) = Multimodal.decodePpm(img.payload)
    assert(w === img.meta.width && h === img.meta.height)
    assert(mean > 0.0 && mean < 1.0)
    // comments in the header are legal PPM
    val tiny = "P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, -1, -1, -1) // one black + one white pixel
    assert(Multimodal.decodePpm(tiny) === Some((2, 1, 0.5)))
    assert(Multimodal.decodePpm("P5\n2 1\n255\n".getBytes("US-ASCII")) === None)
    assert(Multimodal.decodePpm("P6\n2 1\n255\n".getBytes("US-ASCII")) === None)
    assert(Multimodal.decodePpm(Array[Byte]()) === None)
  }

  test("decodeWav parses RIFF/WAVE PCM chunks and rejects malformed input") {
    val recs = Multimodal.generate(spark, 6L).collect().sortBy(_.media_id)
    val wav = recs(1) // id 1 → audio, 8 kHz (rate varies by id/3)
    assert(wav.kind === "audio")
    val Some((rate, durMs, rms)) = Multimodal.decodeWav(wav.payload)
    assert(rate === 8000)
    // the corpus really varies the rate: id 4 is the next audio item
    assert(Multimodal.decodeWav(recs(4).payload).get._1 === 16000)
    assert(durMs === wav.meta.duration_ms)
    assert(rms > 0.0 && rms < 1.0)
    // hand-built 2-sample file (samples 0 and -32768): rms = 1/sqrt(2),
    // with an unknown LIST chunk between fmt and data to prove the chunk
    // walk skips what it doesn't know
    def le4(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le2(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def tag(s: String) = s.getBytes("US-ASCII")
    val tiny = tag("RIFF") ++ le4(36 + 6 + 4) ++ tag("WAVE") ++
      tag("fmt ") ++ le4(16) ++ le2(1) ++ le2(1) ++ le4(8000) ++
      le4(16000) ++ le2(2) ++ le2(16) ++
      tag("LIST") ++ le4(6) ++ Array.fill[Byte](6)(7) ++
      tag("data") ++ le4(4) ++ le2(0) ++ le2(0x8000)
    val Some((r2, d2, rms2)) = Multimodal.decodeWav(tiny)
    assert(r2 === 8000 && d2 === 0L)
    assert(math.abs(rms2 - 1.0 / math.sqrt(2.0)) < 1e-12)
    assert(Multimodal.decodeWav(tag("RIFX") ++ tiny.drop(4)) === None)
    assert(Multimodal.decodeWav(Array[Byte]()) === None)
    assert(Multimodal.decodeWav(recs(0).payload) === None) // a PPM image
    // audio features surface the decoded stats
    val afAll = Multimodal.extractFeatures(Multimodal.generate(spark, 6L))
      .collect().sortBy(_.media_id)
    val af = afAll(1)
    assert(af.sample_rate === 8000 && af.duration_ms === wav.meta.duration_ms)
    assert(math.abs(af.brightness - rms) < 1e-12)
  }

  test("decodeMp4 parses the ISO BMFF box tree and rejects malformed input") {
    val recs = Multimodal.generate(spark, 6L).collect().sortBy(_.media_id)
    val vid = recs(2) // id 2 → video
    assert(vid.kind === "video")
    val Some((durMs, (mdFrom, mdUntil))) = Multimodal.decodeMp4(vid.payload)
    assert(durMs === vid.meta.duration_ms)
    // generator layout: ftyp(16) + moov(8 + mvhd 108) + mdat header(8)
    assert(mdFrom === 140 && mdUntil === vid.payload.length)
    // box-structure sanity from the raw bytes
    assert(new String(vid.payload, 4, 4, "US-ASCII") === "ftyp")
    assert(new String(vid.payload, 20, 4, "US-ASCII") === "moov")
    // rejects: not a container / truncated box / other kinds' payloads
    assert(Multimodal.decodeMp4(Array[Byte]()) === None)
    assert(Multimodal.decodeMp4(vid.payload.take(100)) === None)
    assert(Multimodal.decodeMp4(recs(0).payload) === None) // PPM
    assert(Multimodal.decodeMp4(recs(1).payload) === None) // WAV
    // features surface the container duration and mdat-only brightness
    val f = Multimodal.extractFeatures(Multimodal.generate(spark, 6L))
      .collect().sortBy(_.media_id)
    assert(f(2).duration_ms === vid.meta.duration_ms && f(2).sample_rate === 0)
    val mdat = vid.payload.slice(mdFrom, mdUntil)
    val mean = mdat.map(_ & 0xff).sum.toDouble / mdat.length / 255.0
    assert(math.abs(f(2).brightness - mean) < 1e-12)
  }

  test("decoders never throw on arbitrary bytes (fuzz)") {
    // corrupt media must become accountable Nones (→ stub features), not
    // task failures — the PERMISSIVE-mode posture of the json/csv paths
    // applied to binary decode. Seeded RNG keeps failures reproducible.
    val rng = new scala.util.Random(42)
    val cases = Seq.tabulate(200) { i =>
      val b = new Array[Byte](rng.nextInt(300))
      rng.nextBytes(b)
      // half the cases get a plausible magic prefix to push deeper paths
      if (i % 4 == 1 && b.length >= 2) { b(0) = 'P'; b(1) = '6' }
      if (i % 4 == 2 && b.length >= 12) {
        "RIFF".getBytes.copyToArray(b, 0); "WAVE".getBytes.copyToArray(b, 8)
      }
      if (i % 4 == 3 && b.length >= 8)
        "ftyp".getBytes.copyToArray(b, 4)
      b
    }
    cases.foreach { b =>
      Multimodal.decodePpm(b)
      Multimodal.decodeWav(b)
      Multimodal.decodeMp4(b)
    }
    // crafted adversarial cases (found by review, kept as regressions):
    def be4(v: Int) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def le4b(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // minimal 8-byte mvhd box ending exactly at the buffer end: the
    // version byte b(j+8) does not exist — must be None, not AIOOBE
    val tinyMvhd = be4(16) ++ "ftyp".getBytes ++ be4(0) ++ be4(0) ++
      be4(16) ++ "moov".getBytes ++ be4(8) ++ "mvhd".getBytes
    assert(Multimodal.decodeMp4(tinyMvhd) === None)
    // near-Int.MaxValue size fields: bounds math must not wrap negative
    val hugeWavChunk = "RIFF".getBytes ++ le4b(36) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le4b(0x7ffffff0) ++ Array.fill[Byte](24)(0)
    assert(Multimodal.decodeWav(hugeWavChunk) === None)
    val hugeMp4Box = be4(16) ++ "ftyp".getBytes ++ be4(0) ++ be4(0) ++
      be4(0x7ffffff0) ++ "free".getBytes ++ Array.fill[Byte](8)(0)
    assert(Multimodal.decodeMp4(hugeMp4Box) === None)
    // truncations of VALID files exercise every length check
    val recs = Multimodal.generate(spark, 3L).collect().sortBy(_.media_id)
    recs.foreach { r =>
      Seq(1, 7, 13, 43, 44, 45, 100, 139, 140, 141).foreach { n =>
        val cut = r.payload.take(math.min(n, r.payload.length))
        Multimodal.decodePpm(cut)
        Multimodal.decodeWav(cut)
        Multimodal.decodeMp4(cut)
      }
    }
  }

  test("sampleVideoFrames decodes real embedded PPM frames from mdat") {
    val ds = Multimodal.generate(spark, 12L)
    val frames = Multimodal.sampleVideoFrames(ds).collect()
    // videos are ids 2,5,8,11 with 1+(id%60) frames each: 3+6+9+12
    assert(frames.length === 30)
    assert(frames.forall(f => f.width == 16 && f.height == 12))
    assert(frames.forall(f => f.pixel_mean > 0 && f.pixel_mean < 1))
    // independent recompute for one known frame (id=5, frame 2): generator
    // layout mdat payload at 140, 589-byte frames, 13-byte headers
    val p = ds.collect().find(_.media_id == 5L).get.payload
    val start = 140 + 2 * 589 + 13
    val mean =
      (start until start + 576).map(p(_) & 0xff).sum.toDouble / 576 / 255.0
    val got = frames.find(f => f.media_id == 5L && f.frame_idx == 2).get
    assert(math.abs(got.pixel_mean - mean) < 1e-12)
    // frames differ from each other (per-frame seeds, not one repeated fill)
    val means5 = frames.filter(_.media_id == 5L).map(_.pixel_mean).distinct
    assert(means5.length === 6)
    // everyKth keeps frames 0, k, 2k, ... only
    val sampled = Multimodal.sampleVideoFrames(ds, everyKth = 3).collect()
    assert(sampled.nonEmpty && sampled.forall(_.frame_idx % 3 == 0))
    assert(sampled.count(_.media_id == 11L) === 4) // 0,3,6,9 of 12
    // non-video payloads contribute nothing
    assert(frames.map(_.media_id).distinct.sorted === Seq(2L, 5L, 8L, 11L))
  }

  test("frame sampling slices every payload into n frames that reassemble") {
    val ds = Multimodal.generate(spark, 10L)
    val frames = Multimodal.frameSample(ds, 4).collect()
    assert(frames.length === 40)
    assert(frames.groupBy(_.media_id).forall(_._2.map(_.frame_idx).sorted
      .sameElements(0 until 4)))
    // concatenating frames in order reassembles the payload byte-for-byte
    // (the last frame absorbs the division remainder — PPM payload sizes
    // are not multiples of 4)
    val payloads = ds.collect().map(r => r.media_id -> r.payload).toMap
    frames.groupBy(_.media_id).foreach { case (id, fs) =>
      val rebuilt = fs.sortBy(_.frame_idx).flatMap(_.frame)
      assert(java.util.Arrays.equals(rebuilt, payloads(id)))
    }
  }
}
