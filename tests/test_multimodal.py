"""Multimodal binary-column tests: executor-side synthesis, decode, resize,
feature extraction, frame sampling — all through Arrow-batched mapInPandas.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandemic_knowledge_spark.operators.multimodal import (
    byte_stats,
    decode_raw,
    encode_raw,
    extract_features,
    resize,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=32, height=16, width=12, channels=3).cache()


def test_codec_roundtrip():
    arr = np.arange(2 * 4 * 5 * 3, dtype=np.uint8).reshape(2, 4, 5, 3)
    assert np.array_equal(decode_raw(encode_raw(arr)), arr)


def test_codec_rejects_foreign_blob():
    from pandemic_knowledge_spark.operators.multimodal import (
        UnsupportedMediaError,
        decode_media,
    )

    with pytest.raises(UnsupportedMediaError):
        decode_raw(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)  # PNG magic ≠ RAW
    with pytest.raises(UnsupportedMediaError):
        decode_media(b"\xff\xd8\xff\xe0" + b"\x00" * 64)  # JPEG needs ext. codec


def test_synth_corpus_shape(media):
    assert media.count() == 32
    types = dict(media.groupBy("media_type").count().collect())
    assert types == {"image": 16, "video": 16}
    row = media.filter(F.col("media_id") == 3).first()
    assert row.meta.n_frames == 8 and row.meta.width == 12
    # content is a real self-describing blob, not a placeholder
    assert decode_raw(bytes(row.content)).shape == (8, 16, 12, 3)


def test_synth_deterministic(spark, media):
    again = synth_media(spark, n=32, height=16, width=12, channels=3)
    a = {r.media_id: bytes(r.content) for r in media.collect()}
    b = {r.media_id: bytes(r.content) for r in again.collect()}
    assert a == b


def test_extract_features(media):
    feats = extract_features(media).cache()
    assert feats.count() == 32
    r = feats.filter(F.col("media_id") == 0).first()
    assert len(r.mean_channel) == 3 and len(r.histogram) == 16
    assert sum(r.histogram) == pytest.approx(1.0)
    # uniform random uint8 → mean near 127.5, std near 73.9
    assert 100 < r.mean_channel[0] < 155
    assert 60 < r.std_channel[0] < 90


def test_resize(media):
    small = resize(media, out_h=8, out_w=6)
    row = small.filter(F.col("media_id") == 2).first()
    assert row.meta.height == 8 and row.meta.width == 6
    arr = decode_raw(bytes(row.content))
    assert arr.shape == (1, 8, 6, 3)
    # resize composes with decode-dependent ops (same schema in/out)
    feats = extract_features(small)
    assert feats.count() == 32


def test_sample_frames(media):
    frames = sample_frames(media.filter(F.col("media_type") == "video"), every=2).cache()
    # 16 videos × frames 0,2,4,6 of 8
    assert frames.count() == 16 * 4
    one = frames.filter((F.col("media_id") == 1) & (F.col("frame_index") == 2)).first()
    sampled = decode_raw(bytes(one.frame))
    assert sampled.shape == (1, 16, 12, 3)
    full = decode_raw(
        bytes(media.filter(F.col("media_id") == 1).first().content)
    )
    assert np.array_equal(sampled[0], full[2])


def test_byte_stats_jvm_only(media):
    stats = byte_stats(media)
    r = stats.filter(F.col("media_id") == 0).first()
    # header 20B + 16*12*3 payload per frame
    assert r.n_bytes == 20 + 16 * 12 * 3
    assert r.magic == "PKRW"
    assert "mapInPandas" not in stats._jdf.queryExecution().executedPlan().toString()


def test_media_features_oracle_literals_match_generator():
    """The multimodal_media_features VALUES oracle embeds precomputed
    aggregates; recompute them from the SAME generator params (n=64, 32x32x3,
    8 frames for video) so any parameter drift breaks loudly here first."""
    agg = {}
    for mid in range(64):
        is_video = mid % 2 == 1
        f = 8 if is_video else 1
        rng = np.random.default_rng(mid)
        arr = rng.integers(0, 256, (f, 32, 32, 3), dtype=np.uint8).astype(np.float64)
        mt = "video" if is_video else "image"
        n, frames, s = agg.get(mt, (0, 0, 0.0))
        agg[mt] = (n + 1, frames + f, s + arr.mean(axis=(0, 1, 2))[0])
    expected = {
        "image": (32, 32, 126.8774),
        "video": (32, 256, 127.6169),
    }
    for mt, (n, frames, s) in agg.items():
        e_n, e_frames, e_avg = expected[mt]
        assert (n, frames) == (e_n, e_frames)
        assert round(s / n, 4) == e_avg


# ------------------------------------------------------------- real codecs


def _encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal REAL PNG encoder (8-bit, non-interlaced) used to produce
    genuine PNG bytes for the decoder tests. Supports filter 0 (None) and
    2 (Up) — enough to exercise the unfilter paths."""
    import struct as st
    import zlib

    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype, data):
        body = ctype + data
        return st.pack(">I", len(data)) + body + st.pack(">I", zlib.crc32(body))

    raw = b""
    prev = np.zeros((w, c), dtype=np.uint8)
    for y in range(h):
        line = arr[y]
        if filter_type == 0:
            raw += b"\x00" + line.tobytes()
        else:  # Up filter: store line - prev (mod 256)
            raw += b"\x02" + (line - prev).tobytes()
        prev = line
    ihdr = st.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Genuine WAV bytes via the stdlib writer: (n, ch) int16."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_decode_png_roundtrip_filters():
    from pandemic_knowledge_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    for ftype in (0, 2):
        got = decode_png(_encode_png(img, filter_type=ftype))
        assert got.shape == (1, 5, 4, 3)
        assert np.array_equal(got[0], img), f"filter {ftype}"
    gray = rng.integers(0, 256, (3, 7, 1), dtype=np.uint8)
    assert np.array_equal(decode_png(_encode_png(gray))[0], gray)
    rgba = rng.integers(0, 256, (2, 2, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(_encode_png(rgba))[0], rgba)


def test_decode_wav_stdlib():
    from pandemic_knowledge_spark.operators.multimodal import decode_wav

    t = np.arange(64)
    stereo = np.stack(
        [(1000 * np.sin(t / 3)).astype(np.int16), (t * 100).astype(np.int16)], axis=1
    )
    got = decode_wav(_encode_wav(stereo))
    assert got.shape == (1, 1, 64, 2)
    # high byte, offset to unsigned
    expect = ((stereo.astype(np.int32) >> 8) + 128).astype(np.uint8)
    assert np.array_equal(got[0, 0], expect)


def test_feature_pipeline_decodes_mixed_codecs_and_quarantines(spark):
    """RAW + real PNG + real WAV decode through the SAME mapInPandas stage;
    a JPEG-magic blob and garbage quarantine per blob instead of killing the
    job; decode_audit explains each verdict."""
    from pandemic_knowledge_spark.operators.multimodal import (
        decode_audit,
        extract_features,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    wav = (rng.integers(-3000, 3000, (32, 1))).astype(np.int16)
    rows = [
        (1, bytearray(encode_raw(img[None, ...]))),
        (2, bytearray(_encode_png(img))),
        (3, bytearray(_encode_wav(wav))),
        (4, bytearray(b"\xff\xd8\xff\xe0" + b"\x00" * 32)),  # JPEG magic
        (5, bytearray(b"garbage-bytes")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    feats = {r.media_id: r for r in extract_features(df).collect()}
    assert set(feats) == {1, 2, 3}  # 4 and 5 quarantined
    # RAW and PNG of the same pixels give identical features
    assert feats[1].mean_channel == feats[2].mean_channel
    assert feats[3].n_frames == 1
    audit = {r.media_id: r for r in decode_audit(df).collect()}
    assert [audit[i].ok for i in (1, 2, 3, 4, 5)] == [True, True, True, False, False]
    assert "magic" in audit[4].error


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 8),
    w=st.integers(1, 8),
    c=st.sampled_from([1, 2, 3, 4]),
    ftype=st.sampled_from([0, 2]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, ftype, seed):
    """Any 8-bit image round-trips through our encoder and REAL decoder for
    every supported color type and the None/Up filters."""
    from pandemic_knowledge_spark.operators.multimodal import decode_png

    img = np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)
    got = decode_png(_encode_png(img, filter_type=ftype))
    assert got.shape == (1, h, w, c)
    assert np.array_equal(got[0], img)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 256),
    ch=st.sampled_from([1, 2]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, seed):
    """Any 16-bit PCM stream round-trips through the stdlib WAV path with
    the documented high-byte+offset mapping."""
    from pandemic_knowledge_spark.operators.multimodal import decode_wav

    pcm = (
        np.random.default_rng(seed)
        .integers(-(2**15), 2**15, (n, ch))
        .astype(np.int16)
    )
    got = decode_wav(_encode_wav(pcm))
    assert got.shape == (1, 1, n, ch)
    expect = ((pcm.astype(np.int32) >> 8) + 128).astype(np.uint8)
    assert np.array_equal(got[0, 0], expect)


def test_truncated_known_format_quarantines():
    """A blob with a valid PNG/WAV magic but truncated payload must map to
    UnsupportedMediaError (quarantine), not escape as struct/zlib errors."""
    from pandemic_knowledge_spark.operators.multimodal import (
        UnsupportedMediaError,
        decode_media,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    good_png = _encode_png(img)
    # cut inside IHDR, inside IDAT, and inside the WAV header respectively
    for blob in (good_png[:20], good_png[: len(good_png) // 2], _encode_wav(np.zeros((8, 1), dtype=np.int16))[:16]):
        with pytest.raises(UnsupportedMediaError):
            decode_media(blob)


def test_resize_and_sample_frames_quarantine_mixed_corpus(spark):
    """resize/sample_frames honor the same per-blob quarantine as
    extract_features: PNG decodes (re-encoded RAW), garbage is dropped."""
    from pandemic_knowledge_spark.operators.multimodal import (
        resize as rz,
        sample_frames as sf_frames,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    rows = [
        (1, "image", bytearray(encode_raw(img[None, ...])), {"format": "raw", "width": 6, "height": 6, "channels": 3, "n_frames": 1, "sample_rate": None}),
        (2, "image", bytearray(_encode_png(img)), {"format": "png", "width": 6, "height": 6, "channels": 3, "n_frames": 1, "sample_rate": None}),
        (3, "image", bytearray(b"junk-bytes"), None),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, media_type string, content binary, "
        "meta struct<format:string,width:int,height:int,channels:int,n_frames:int,sample_rate:int>",
    )
    small = {r.media_id: r for r in rz(df, 3, 3).collect()}
    assert set(small) == {1, 2}
    assert decode_raw(bytes(small[2].content)).shape == (1, 3, 3, 3)
    frames = {r.media_id for r in sf_frames(df, every=1).collect()}
    assert frames == {1, 2}
