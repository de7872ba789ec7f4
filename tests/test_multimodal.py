"""Multimodal pipeline tests: the decode stub is deterministic, so every
pandas stage is verifiable against a pure-Python recompute of the same
bytes — the strongest check available without real codecs."""

import hashlib

import numpy as np
import pytest

from recommender_systems_pyspark_spark.multimodal.media import (
    FRAME_BYTES,
    THUMB_SIDE,
    decode_media_real,
    media_table,
    x_media_features,
    x_media_frame_sample,
    x_media_metadata,
    x_media_resize,
)

SF = "/root/testdata/sf0.001"


def _docs_bytes(spark):
    m = media_table(spark, SF).select("doc_id", "payload").collect()
    return {r.doc_id: bytes(r.payload) for r in m}


def test_media_table_schema(spark):
    m = media_table(spark, SF)
    assert dict(m.dtypes)["payload"] == "binary"
    meta = {f.name for f in m.schema["meta"].dataType.fields}
    assert meta == {"width", "height", "n_frames", "sample_rate"}
    assert m.count() > 0


def test_real_decode_unknown_format_raises():
    # JPEG magic: genuinely needs an external codec -> explicit stub branch
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media_real(b"\xff\xd8\xff\xe0fakejpeg", "image")


def test_pgm_real_decode_roundtrip(spark):
    from recommender_systems_pyspark_spark.multimodal.media import (
        encoded_media_table,
    )

    rows = (
        encoded_media_table(spark, SF)
        .where("media_type = 'image' AND byte_len > 0")
        .select("doc_id", "payload", "payload_enc")
        .collect()
    )
    assert rows
    for r in rows:
        enc = bytes(r.payload_enc)
        assert enc.startswith(b"P5\n")  # genuine netpbm container
        decoded = decode_media_real(enc)
        assert decoded.tobytes() == bytes(r.payload)


def test_pgm_parser_handles_comments_and_p6():
    raster = bytes(range(12))
    pgm = b"P5\n# a comment\n12 1\n255\n" + raster[:12]
    assert decode_media_real(pgm).tobytes() == raster[:12]
    ppm = b"P6 2 2 255\n" + raster  # 2x2 RGB = 12 bytes, space-separated hdr
    assert decode_media_real(ppm).tobytes() == raster


def test_wav_real_decode_roundtrip(spark):
    from recommender_systems_pyspark_spark.multimodal.media import (
        encoded_media_table,
    )

    rows = (
        encoded_media_table(spark, SF)
        .where("media_type = 'audio' AND byte_len > 0")
        .select("doc_id", "payload", "payload_enc")
        .collect()
    )
    assert rows
    for r in rows:
        enc = bytes(r.payload_enc)
        data = bytes(r.payload)
        # standards-correct RIFF framing, little-endian sizes; odd-sized
        # data chunks carry the word-alignment pad byte (ADVICE r6 #2) —
        # the chunk size field excludes it, the RIFF length includes it
        pad = len(data) % 2
        assert enc[:4] == b"RIFF" and enc[8:12] == b"WAVE"
        assert int.from_bytes(enc[4:8], "little") == 36 + len(data) + pad
        assert len(enc) == 44 + len(data) + pad
        assert int.from_bytes(enc[40:44], "little") == len(data)
        if pad:
            assert enc[-1] == 0
        assert int.from_bytes(enc[24:28], "little") == 16000  # sample rate
        assert decode_media_real(enc).tobytes() == data


def test_wav_parser_rejects_compressed():
    # fmt chunk declaring format 85 (MP3) must hit the codec stub
    body = (85).to_bytes(2, "little") + b"\x01\x00" + b"\x00" * 12
    wav = b"RIFF" + (100).to_bytes(4, "little") + b"WAVE" + b"fmt " + (16).to_bytes(4, "little") + body
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media_real(wav)


def test_decode_any_falls_back_for_raw():
    from recommender_systems_pyspark_spark.multimodal.media import decode_any

    raw = b"\x01\x02\x03raw-video-bytes"
    assert decode_any(raw).tobytes() == raw


def test_decode_any_survives_coincidental_magic():
    # ADVICE r6 #1: raw payloads that merely START like a container must
    # fall back to the fake decode, not crash the Arrow stage with
    # ValueError/IndexError from a half-parse.
    from recommender_systems_pyspark_spark.multimodal.media import decode_any

    for raw in (b"P5 but not an image", b"RIFFxxxxWAVEgarbage",
                b"YUV4MPEG2 spoof no header newline"):
        assert decode_any(raw).tobytes() == raw


def test_y4m_real_decode_roundtrip(spark):
    from recommender_systems_pyspark_spark.multimodal.media import (
        demux_frames,
        encoded_media_table,
    )

    rows = (
        encoded_media_table(spark, SF)
        .where("media_type = 'video' AND byte_len > 0")
        .select("doc_id", "payload", "payload_enc", "meta.n_frames")
        .collect()
    )
    assert rows
    for r in rows:
        enc = bytes(r.payload_enc)
        data = bytes(r.payload)
        assert enc.startswith(b"YUV4MPEG2 W")  # genuine Y4M stream header
        frames = demux_frames(enc)
        assert len(frames) == r.n_frames
        assert all(len(f) == FRAME_BYTES for f in frames)  # fixed planes
        # concatenated planes == source bytes + zero pad on the last plane
        joined = b"".join(frames)
        assert joined[: len(data)] == data
        assert set(joined[len(data):]) <= {0}
        assert decode_media_real(enc).tobytes() == joined


def test_y4m_demuxer_rejects_malformed():
    from recommender_systems_pyspark_spark.multimodal.media import demux_frames

    with pytest.raises(ValueError, match="YUV4MPEG2"):
        demux_frames(b"NOTY4M\nFRAME\n")
    with pytest.raises(ValueError, match="W/H"):
        demux_frames(b"YUV4MPEG2 F25:1 Cmono\n")
    with pytest.raises(NotImplementedError, match="colourspace"):
        demux_frames(b"YUV4MPEG2 W2 H1 C420\nFRAME\n\x00\x00")
    with pytest.raises(ValueError, match="FRAME marker"):
        demux_frames(b"YUV4MPEG2 W2 H1 Cmono\nXRAME\n\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        demux_frames(b"YUV4MPEG2 W4 H1 Cmono\nFRAME\n\x00\x00")


def test_features_match_pure_python(spark):
    payloads = _docs_bytes(spark)
    m = media_table(spark, SF).where("byte_len > 0")
    from recommender_systems_pyspark_spark.multimodal.media import (
        FEATURES_SCHEMA,
        extract_features,
    )

    rows = m.mapInPandas(extract_features, schema=FEATURES_SCHEMA).collect()
    assert len(rows) == len([b for b in payloads.values() if b])
    for r in rows:
        buf = np.frombuffer(payloads[r.doc_id], dtype=np.uint8)
        assert r.byte_len == len(buf)
        assert r.mean_sample == pytest.approx(float(buf.mean()))
        assert r.max_sample == int(buf.max())


def _expected_thumb(buf: np.ndarray) -> list[int]:
    n_out = THUMB_SIDE * THUMB_SIDE
    idx = np.arange(n_out, dtype=np.int64) * (len(buf) - 1) // (n_out - 1)
    return buf[idx].astype(np.int32).tolist()


def test_resize_shape_and_determinism(spark):
    from recommender_systems_pyspark_spark.multimodal.media import (
        RESIZE_SCHEMA,
        media_table,
        resize_thumbnail,
    )

    m = media_table(spark, SF).where("media_type = 'image' AND byte_len > 0")
    rows = m.mapInPandas(resize_thumbnail, schema=RESIZE_SCHEMA).collect()
    assert rows, "image-typed media expected in fixture"
    payloads = _docs_bytes(spark)
    for r in rows:
        assert len(r.thumb) == THUMB_SIDE * THUMB_SIDE
        assert r.thumb_w == THUMB_SIDE and r.thumb_h == THUMB_SIDE
        buf = np.frombuffer(payloads[r.doc_id], dtype=np.uint8)
        assert r.thumb == _expected_thumb(buf)


def test_resize_registered_query_scalars(spark):
    # The registered query projects the array away (driver canonicalizer
    # can't hash list cells) — check md5/sum against a pure recompute.
    rows = x_media_resize(spark, SF).collect()
    assert rows
    payloads = _docs_bytes(spark)
    for r in rows:
        buf = np.frombuffer(payloads[r.doc_id], dtype=np.uint8)
        thumb = _expected_thumb(buf)
        joined = ",".join(str(v) for v in thumb)
        assert r.thumb_md5 == hashlib.md5(joined.encode()).hexdigest()
        assert r.thumb_sum == sum(thumb)


def test_frame_sample_checksums(spark):
    # sample_frames consumes REAL containers (r7 contract) and must still
    # emit checksums of the SOURCE byte chunks (pad trimmed via byte_len).
    import pyspark.sql.functions as F

    payloads = _docs_bytes(spark)
    from recommender_systems_pyspark_spark.multimodal.media import (
        FRAMES_SCHEMA,
        encoded_media_table,
        sample_frames,
    )

    m = encoded_media_table(spark, SF).where("byte_len > 0").select(
        "doc_id", "media_type", F.col("payload_enc").alias("payload"), "byte_len"
    )
    rows = m.mapInPandas(sample_frames, schema=FRAMES_SCHEMA).collect()
    assert rows
    for r in rows[:50]:
        buf = payloads[r.doc_id]
        frame = buf[r.frame_idx * FRAME_BYTES : (r.frame_idx + 1) * FRAME_BYTES]
        assert r.frame_idx % 2 == 0
        assert r.frame_len == len(frame)
        assert r.frame_md5 == hashlib.md5(frame).hexdigest()


def test_metadata_prunes_payload(spark, tmp_path):
    # Materialize the media lake, then check a metadata-only projection
    # prunes the blob column out of the parquet scan (ReadSchema).
    lake = str(tmp_path / "media.parquet")
    media_table(spark, SF).write.parquet(lake)
    scan = spark.read.parquet(lake).select("doc_id", "media_type", "byte_len")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[-1].splitlines()[0]
    assert "payload" not in read_schema
    assert "byte_len" in read_schema


def test_registered_queries_run(spark):
    for fn in (x_media_metadata, x_media_features, x_media_frame_sample):
        assert fn(spark, SF).count() > 0
