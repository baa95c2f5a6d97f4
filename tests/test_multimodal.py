"""Multimodal column tests: header parses (image/WAV/MP4), the
mapInPandas feature-extraction tiers (fake / image / content), resize
tiers and their shared meta contract, and frame sampling from real
container durations. Relocated from test_pipeline_streaming.py (r5
verdict, misfiled-tests item)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with sibling modules)

from siskin_spark.operators.multimodal import (
    _HAS_AV,
    _HAS_PIL,
    MEDIA_SCHEMA,
    decode_image,
    extract_features,
    fake_decode_features,
    frame_sample,
    image_pixel_features,
    mp4_frame_luminance,
    parse_image_header,
    parse_mp4_duration,
    parse_mp4_sample_times,
    parse_wav_header,
    resize_images,
    resize_stub,
    wav_pcm_features,
)


def _png_bytes(width: int, height: int) -> bytes:
    """A minimal VALID PNG built with stdlib only (zlib for IDAT+CRC):
    signature + IHDR + one-scanline-per-row IDAT + IEND."""
    import struct
    import zlib

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + b"\x80" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _jpeg_bytes(width: int, height: int) -> bytes:
    """SOI + APP0 + SOF0 header prefix — enough container structure for
    any dimension reader that walks JPEG segments."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _make_wav(samples, channels=1, rate=8000):
    """Minimal 16-bit PCM WAV container around the given sample list."""
    import struct

    bits = 16
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    data = struct.pack(f"<{len(samples)}h", *samples)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_multimodal_features(spark):
    rows = [
        (1, "image", b"\x89PNGfakebytes", "image/png", {}),
        (2, "audio", b"RIFFfakewav", "audio/wav", {}),
        (3, "video", b"\x00\x00ftypmp4fake", "video/mp4", {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media).collect()
    assert len(feats) == 3
    f1 = next(r for r in feats if r["media_id"] == 1)
    assert 64 <= f1["width"] <= 255 and len(f1["feature"]) == 8
    # determinism: same bytes -> same feature vector
    again = next(r for r in extract_features(media).collect() if r["media_id"] == 1)
    assert again["feature"] == f1["feature"]
    # resize plumbing
    resized = resize_stub(media, 224, 224).first()
    assert resized["meta"]["resize_w"] == "224"
    with pytest.raises(ValueError):
        decode_image(b"x")  # not an image container


def test_real_image_decode_header_parse(spark):
    """decode_image reads REAL dimensions — Pillow when installed,
    stdlib header parse otherwise (r3 verdict item 5: the decode step
    is no longer only the md5 stand-in)."""
    import struct

    png = _png_bytes(320, 200)
    assert parse_image_header(png) == (320, 200, "png")
    gif = b"GIF89a" + struct.pack("<HH", 40, 30) + b"\x00" * 6
    assert parse_image_header(gif) == (40, 30, "gif")
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 17, -23) + b"\x00" * 8
    assert parse_image_header(bmp) == (17, 23, "bmp")  # top-down height abs()
    jpg = _jpeg_bytes(640, 480)
    assert parse_image_header(jpg) == (640, 480, "jpeg")

    # end-to-end through the Arrow mapInPandas path with real decode
    media = spark.createDataFrame(
        [
            (1, "image", png, "image/png", {}),
            (2, "image", jpg, "image/jpeg", {}),
            (3, "image", b"not an image", "image/png", {}),
        ],
        MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in extract_features(media, decoder="image").collect()}
    assert (got[1]["width"], got[1]["height"]) == (320, 200)
    assert (got[2]["width"], got[2]["height"]) == (640, 480)
    assert got[3]["width"] is None and got[3]["height"] is None  # undecodable
    assert len(got[1]["feature"]) == 8  # embedding slot still populated


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_real_image_decode_pillow():
    w, h, fmt = decode_image(_png_bytes(12, 34))
    assert (w, h, fmt) == (12, 34, "png")


def test_resize_images_fallback_without_pillow(spark):
    """resize_images degrades to the metadata-only stub when Pillow is
    absent; with Pillow it decodes/resizes/re-encodes (gated test
    below). Either way the schema is unchanged."""
    media = spark.createDataFrame(
        [(1, "image", b"\x89PNGnotreally", "image/png", None)], MEDIA_SCHEMA
    )
    out = resize_images(media, 32, 32)
    # same column names/types either tier (nullability may tighten)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in MEDIA_SCHEMA.fields
    ]
    row = out.first()
    # EVERY row carries the stamp, even a failed decode (which then
    # also carries resize_error on the Pillow tier)
    assert row["meta"].get("resize_w") == "32"
    if _HAS_PIL:
        assert "resize_error" in row["meta"]


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_resize_images_real_pillow(spark):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 6), (200, 10, 10)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", buf.getvalue(), "image/png", None)], MEDIA_SCHEMA
    )
    row = resize_images(media, 32, 32).first()
    assert row["meta"]["resize_w"] == "32"
    w, h, fmt = decode_image(bytes(row["content"]))
    assert (w, h, fmt) == (32, 32, "png")


def test_parse_wav_and_mp4_headers():
    """Real audio/video metadata from stdlib header parses — the same
    tier as parse_image_header: no media library, genuine container
    structure."""
    import struct

    # WAV: 2ch 16-bit 8kHz, 1600 frames = 0.2s
    channels, rate, bits = 2, 8000, 16
    block = channels * bits // 8
    n_frames = 1600
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    data = b"\x00" * (n_frames * block)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    assert parse_wav_header(wav) == (2, 8000, 0.2)
    with pytest.raises(ValueError):
        parse_wav_header(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):  # fmt chunk missing
        parse_wav_header(b"RIFF" + struct.pack("<I", 4) + b"WAVE")

    # MP4: ftyp + moov{mvhd v0 timescale=1000 duration=2500} = 2.5s
    def box(tag, payload):
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    mvhd = b"\x00" * 4 + b"\x00" * 8 + struct.pack(">I", 1000) + struct.pack(
        ">I", 2500
    ) + b"\x00" * 80
    mp4 = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + box(
        b"moov", box(b"mvhd", mvhd)
    )
    assert parse_mp4_duration(mp4) == 2.5
    # 64-bit (version 1) mvhd: timescale at +20, 8-byte duration
    mvhd1 = b"\x01" + b"\x00" * 3 + b"\x00" * 16 + struct.pack(
        ">I", 600
    ) + struct.pack(">Q", 1800) + b"\x00" * 80
    mp4v1 = box(b"moov", box(b"mvhd", mvhd1))
    assert parse_mp4_duration(mp4v1) == 3.0
    with pytest.raises(ValueError):
        parse_mp4_duration(b"\x00\x00\x00\x08free")
    # ONE malformed-input semantics across both mp4 parsers: a box
    # whose declared size overruns the buffer raises ValueError from
    # parse_mp4_duration too (it shares _mp4_boxes with
    # parse_mp4_sample_times), rather than clamping to a plausible
    # duration while the sample-table parser rejects the same payload
    overrun = struct.pack(">I", 10_000) + b"moov" + box(b"mvhd", mvhd)
    with pytest.raises(ValueError):
        parse_mp4_duration(overrun)
    with pytest.raises(ValueError):
        parse_mp4_sample_times(overrun)


def test_frame_sample_real_duration(spark):
    """frame_sample derives the sampling grid from the REAL mp4
    duration; unparseable video rows degrade to one null-duration
    frame; non-video rows are excluded."""
    import struct

    def box(tag, payload):
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    mvhd = b"\x00" * 4 + b"\x00" * 8 + struct.pack(">I", 1000) + struct.pack(
        ">I", 2500
    ) + b"\x00" * 80  # 2.5 s
    mp4 = box(b"ftyp", b"isom") + box(b"moov", box(b"mvhd", mvhd))
    media = spark.createDataFrame(
        [
            (1, "video", mp4, "video/mp4", None),
            (2, "video", b"nope", "video/mp4", None),
            (3, "image", mp4, "image/x", None),
        ],
        MEDIA_SCHEMA,
    )
    rows = frame_sample(media, every_s=1.0).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    # ceil(2.5 / 1.0) = 3 frames at offsets 0,1,2 with duration 2.5
    assert sorted(r["frame_offset_s"] for r in by_id[1]) == [0.0, 1.0, 2.0]
    assert all(r["duration_s"] == 2.5 for r in by_id[1])
    assert len(by_id[2]) == 1 and by_id[2][0]["duration_s"] is None
    assert 3 not in by_id


def _make_y4m(frames_y, width, height, fps=(4, 1), chroma="420"):
    """Synthesize a YUV4MPEG2 stream: each frames_y entry is the full
    Y plane bytes; chroma planes are zero-filled at the subsampled
    size."""
    from siskin_spark.operators.multimodal import _Y4M_CHROMA_DIV

    div = _Y4M_CHROMA_DIV[chroma]
    chroma_bytes = b"" if div == 0 else b"\x00" * (2 * (width * height // div))
    head = f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C{chroma}\n"
    out = head.encode()
    for y in frames_y:
        assert len(y) == width * height
        out += b"FRAME\n" + y + chroma_bytes
    return out


def test_y4m_parse_and_frame_luminance():
    """YUV4MPEG2: real header parse and REAL pixel decode — the
    luminance histogram comes from the actual Y-plane bytes, same
    binning as image_pixel_features."""
    from siskin_spark.operators.multimodal import (
        parse_y4m_header,
        y4m_frame_luminance,
        y4m_frame_offsets,
    )

    # 4x4, 2 frames: frame 0 all-black (bin 0), frame 1 half 0 half 255
    f0 = b"\x00" * 16
    f1 = b"\x00" * 8 + b"\xff" * 8
    y4m = _make_y4m([f0, f1], 4, 4, fps=(4, 1))
    assert parse_y4m_header(y4m) == (4, 4, 4, 1, "420")
    offs = y4m_frame_offsets(y4m)
    assert len(offs) == 2
    h0 = y4m_frame_luminance(y4m, offs[0], dim=8)
    assert h0[0] == 1.0 and sum(h0) == 1.0
    h1 = y4m_frame_luminance(y4m, offs[1], dim=8)
    assert h1[0] == 0.5 and h1[7] == 0.5
    # malformed: truncated final frame, bad magic, missing dims
    with pytest.raises(ValueError):
        y4m_frame_offsets(y4m[:-4])
    with pytest.raises(ValueError):
        parse_y4m_header(b"AVI1 nope")
    with pytest.raises(ValueError):
        parse_y4m_header(b"YUV4MPEG2 F25:1\nFRAME\n")


def test_frame_sample_y4m_real_pixel_features(spark):
    """frame_sample on a y4m payload: duration and per-frame times
    from the frame walk, and frame_feature is the REAL luminance
    histogram of the frame at/before each sampled offset; mp4 rows
    keep frame_feature null when pyav is absent (the codec'd-video
    pixel tier is pyav-gated, like the Pillow image gate)."""
    import struct

    def box(tag, payload):
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    f0 = b"\x00" * 16
    f1 = b"\xff" * 16
    f2 = b"\x80" * 16
    # 3 frames at 2 fps -> duration 1.5 s, frame times 0.0/0.5/1.0
    y4m = _make_y4m([f0, f1, f2], 4, 4, fps=(2, 1))
    mvhd = b"\x00" * 4 + b"\x00" * 8 + struct.pack(">I", 1000) + struct.pack(
        ">I", 1500
    ) + b"\x00" * 80
    mp4 = box(b"ftyp", b"isom") + box(b"moov", box(b"mvhd", mvhd))
    media = spark.createDataFrame(
        [
            (1, "video", y4m, "video/x-yuv4mpeg", None),
            (2, "video", mp4, "video/mp4", None),
        ],
        MEDIA_SCHEMA,
    )
    rows = frame_sample(media, every_s=0.6).collect()
    y_rows = sorted(
        (r for r in rows if r["media_id"] == 1), key=lambda r: r["frame_idx"]
    )
    # ceil(1.5/0.6) = 3 sampled offsets 0.0/0.6/1.2 -> frames 0/1/2
    assert [r["frame_time_s"] for r in y_rows] == [0.0, 0.5, 1.0]
    assert all(r["duration_s"] == 1.5 for r in y_rows)
    assert y_rows[0]["frame_feature"][0] == 1.0  # all-black frame
    assert y_rows[1]["frame_feature"][7] == 1.0  # all-white frame
    assert y_rows[2]["frame_feature"][4] == 1.0  # mid-gray frame
    assert all(
        r["frame_feature"] is None for r in rows if r["media_id"] == 2
    )


def test_extract_features_y4m_content_tier(spark):
    """decoder='content' on a y4m video row: REAL dimensions from the
    stream header and a REAL first-frame luminance feature; a
    y4m-magic payload with truncated frames tiers down to the md5
    stand-in with null dims."""
    from siskin_spark.operators.multimodal import (
        extract_features,
        fake_decode_features,
    )

    y4m = _make_y4m([b"\xff" * 16], 4, 4)
    bad = y4m[:-6]  # magic intact, final frame truncated
    media = spark.createDataFrame(
        [
            (1, "video", y4m, "video/x-yuv4mpeg", None),
            (2, "video", bad, "video/x-yuv4mpeg", None),
        ],
        MEDIA_SCHEMA,
    )
    got = {r["media_id"]: r for r in extract_features(media, decoder="content").collect()}
    assert (got[1]["width"], got[1]["height"]) == (4, 4)
    assert got[1]["feature"][7] == 1.0  # real all-white first frame
    # header intact -> dims stay real (same contract as the image
    # header-parse tier); the FEATURE tiers down because the frame
    # bytes are truncated
    assert (got[2]["width"], got[2]["height"]) == (4, 4)
    stand_in = fake_decode_features(bad)[2]
    assert got[2]["feature"] == pytest.approx(stand_in)


def test_wav_pcm_features_content_derived():
    """The audio feature is derived from the ACTUAL PCM samples (pure
    stdlib + numpy, unconditional): a half-silent half-loud signal
    yields a rising RMS envelope, unit-normalized."""
    import struct

    # 800 samples: first half silence, second half full-scale square
    samples = [0] * 400 + [20000, -20000] * 200
    feat = wav_pcm_features(_make_wav(samples), dim=8)
    assert len(feat) == 8
    # first four segments silent, last four loud and equal
    assert all(abs(x) < 1e-12 for x in feat[:4])
    assert all(x > 0.4 for x in feat[4:])
    assert abs(sum(x * x for x in feat) - 1.0) < 1e-9  # unit L2
    # deterministic
    assert feat == wav_pcm_features(_make_wav(samples), dim=8)
    with pytest.raises(ValueError):
        wav_pcm_features(b"not a wav at all")
    # 8-bit PCM: unsupported encoding. Build the container OUTSIDE the
    # raises block so only wav_pcm_features itself is under the context
    # manager (a struct.pack error here must fail the test, not
    # satisfy it).
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav8 = (
        b"RIFF" + struct.pack("<I", 28) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt8
        + b"data" + struct.pack("<I", 4) + b"\x00\x01\x02\x03"
    )
    with pytest.raises(ValueError):
        wav_pcm_features(wav8)


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_image_pixel_features_pillow():
    """Pillow-gated: the image feature is a luminance histogram over
    the DECODED pixels — a half-black half-white image puts exactly
    half the mass in the darkest bin and half in the brightest."""
    import io

    from PIL import Image

    im = Image.new("L", (16, 16), 0)
    for y in range(16):
        for x in range(8, 16):
            im.putpixel((x, y), 255)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    feat = image_pixel_features(buf.getvalue(), dim=8)
    assert feat[0] == 0.5 and feat[7] == 0.5
    assert all(x == 0.0 for x in feat[1:7])


def test_extract_features_content_tier(spark):
    """decoder='content': audio rows get the PCM RMS envelope (always —
    pure stdlib), image/video rows tier down to the md5 stand-in when
    no decoder exists, and a corrupt payload never fails the batch."""
    wav = _make_wav([0] * 400 + [20000, -20000] * 200)
    media = spark.createDataFrame(
        [
            (1, "audio", wav, "audio/wav", None),
            (2, "audio", b"RIFFcorrupt", "audio/wav", None),  # corrupt
            (3, "video", b"\x00\x00ftypfake", "video/mp4", None),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in extract_features(media, decoder="content").collect()}

    def close(got, want):  # feature column is float32: ~1e-7 relative
        return len(got) == len(want) and all(
            abs(g - w) < 1e-5 for g, w in zip(got, want)
        )

    assert close(rows[1]["feature"], wav_pcm_features(wav, dim=8))
    # corrupt audio + video: md5 fallback tier, batch did not fail
    assert close(rows[2]["feature"], fake_decode_features(b"RIFFcorrupt", 8)[2])
    assert close(
        rows[3]["feature"], fake_decode_features(b"\x00\x00ftypfake", 8)[2]
    )


def test_extract_features_content_dim_validated(spark):
    """decoder='content' with a dim that doesn't divide 256 is a caller
    misconfiguration: rejected at plan-build time, never silently
    tiered down to the md5 stand-in inside the executor."""
    media = spark.createDataFrame(
        [(1, "image", b"\x89PNGx", "image/png", None)], MEDIA_SCHEMA
    )
    with pytest.raises(ValueError):
        extract_features(media, dim=7, decoder="content")
    # the fake tier has no 256-bin constraint: dim=7 stays legal there
    assert len(extract_features(media, dim=7).first()["feature"]) == 7


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_extract_features_content_tier_image_pillow(spark):
    """Pillow-gated: with decoder='content' an image row's feature is
    the pixel histogram, not the md5 stand-in, and width/height are
    the real decoded dimensions."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (10, 4), 255).save(buf, format="PNG")
    png = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "image", png, "image/png", None)], MEDIA_SCHEMA
    )
    row = extract_features(media, decoder="content").first()
    assert (row["width"], row["height"]) == (10, 4)
    assert [round(v, 6) for v in row["feature"]] == [
        round(v, 6) for v in image_pixel_features(png, dim=8)
    ]


def test_frame_sample_truncated_mvhd_degrades(spark):
    """A video whose mvhd box declares a full size but is cut short
    mid-payload must degrade to the documented null-duration row —
    previously this leaked struct.error/IndexError and failed the
    whole Arrow batch."""
    import struct

    def box(tag, payload):
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    # mvhd declares the standard 100-byte v0 payload but carries 10
    truncated = box(b"moov", box(b"mvhd", b"\x00" * 10))
    empty = box(b"moov", struct.pack(">I", 8) + b"mvhd")
    for payload in (truncated, empty):
        with pytest.raises(ValueError):
            parse_mp4_duration(payload)
    media = spark.createDataFrame(
        [
            (1, "video", truncated, "video/mp4", None),
            (2, "video", empty, "video/mp4", None),
        ],
        MEDIA_SCHEMA,
    )
    rows = frame_sample(media).collect()
    assert len(rows) == 2 and all(r["duration_s"] is None for r in rows)


def test_resize_meta_contract_all_kinds(spark):
    """Both resize tiers stamp resize_w/resize_h on EVERY row (audio,
    video, AND undecodable images), so downstream consumers keying on
    meta presence behave identically whether or not Pillow is
    installed; only the Pillow tier can additionally stamp
    resize_error."""
    media = spark.createDataFrame(
        [
            (1, "image", b"\x89PNGnope", "image/png", None),
            (2, "audio", b"RIFFnope", "audio/wav", None),
            (3, "video", b"\x00\x00ftyp", "video/mp4", None),
        ],
        MEDIA_SCHEMA,
    )
    for tier in (resize_images, resize_stub):
        rows = tier(media, 64, 64).collect()
        assert all(r["meta"].get("resize_w") == "64" for r in rows), tier.__name__
        assert all(r["meta"].get("resize_h") == "64" for r in rows), tier.__name__


def _mp4_with_stts(
    mvhd_dur=(1000, 2500), stts_entries=((2, 300), (1, 600)),
    timescale=600, handler=b"vide", include_stts=True,
):
    """mp4 skeleton with a real sample table: ftyp + moov{mvhd,
    trak{mdia{mdhd, hdlr, minf{stbl{stts}}}}}."""
    import struct

    def box(tag, payload):
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    mvhd = (
        b"\x00" * 4 + b"\x00" * 8
        + struct.pack(">I", mvhd_dur[0]) + struct.pack(">I", mvhd_dur[1])
        + b"\x00" * 80
    )
    mdhd = b"\x00" * 4 + b"\x00" * 8 + struct.pack(">I", timescale) + struct.pack(
        ">I", 0
    ) + b"\x00" * 4
    hdlr = b"\x00" * 8 + handler + b"\x00" * 12
    stts = (
        b"\x00" * 4
        + struct.pack(">I", len(stts_entries))
        + b"".join(struct.pack(">II", c, d) for c, d in stts_entries)
    )
    stbl = box(b"stts", stts) if include_stts else b""
    trak = box(
        b"trak",
        box(b"mdia", box(b"mdhd", mdhd) + box(b"hdlr", hdlr)
            + box(b"minf", box(b"stbl", stbl))),
    )
    return box(b"ftyp", b"isom") + box(b"moov", box(b"mvhd", mvhd) + trak)


def test_parse_mp4_sample_times():
    """stts run-length deltas expand to real per-frame timestamps in
    media-timescale seconds; audio-only/absent tables raise."""
    from siskin_spark.operators.multimodal import parse_mp4_sample_times

    mp4 = _mp4_with_stts()  # deltas: 300,300 then 600 at timescale 600
    assert parse_mp4_sample_times(mp4) == [0.0, 0.5, 1.0]
    with pytest.raises(ValueError):
        parse_mp4_sample_times(_mp4_with_stts(include_stts=False))
    with pytest.raises(ValueError):  # zero timescale
        parse_mp4_sample_times(_mp4_with_stts(timescale=0))
    with pytest.raises(ValueError):  # adversarial sample-count bound
        parse_mp4_sample_times(
            _mp4_with_stts(stts_entries=((2_000_000, 1),)), max_samples=1000
        )
    # non-video handler still parses when it is the only trak with stts
    assert parse_mp4_sample_times(_mp4_with_stts(handler=b"soun")) == [
        0.0, 0.5, 1.0,
    ]


def test_frame_sample_real_frame_times(spark):
    """frame_sample reports the ACTUAL frame decode time at/before
    each sampled offset when an stts table exists; null otherwise."""
    from siskin_spark.operators.multimodal import frame_sample

    import struct

    def box(tag, payload):
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    with_table = _mp4_with_stts()  # frames at 0.0, 0.5, 1.0; dur 2.5s
    mvhd = b"\x00" * 4 + b"\x00" * 8 + struct.pack(">I", 1000) + struct.pack(
        ">I", 2500
    ) + b"\x00" * 80
    no_table = box(b"ftyp", b"isom") + box(b"moov", box(b"mvhd", mvhd))
    media = spark.createDataFrame(
        [
            (1, "video", with_table, "video/mp4", None),
            (2, "video", no_table, "video/mp4", None),
        ],
        MEDIA_SCHEMA,
    )
    rows = frame_sample(media, every_s=0.7).collect()
    a = sorted((r for r in rows if r["media_id"] == 1), key=lambda r: r["frame_idx"])
    # grid offsets 0.0, 0.7, 1.4, 2.1 -> nearest frames 0.0, 0.5, 1.0, 1.0
    assert [round(r["frame_offset_s"], 1) for r in a] == [0.0, 0.7, 1.4, 2.1]
    assert [r["frame_time_s"] for r in a] == [0.0, 0.5, 1.0, 1.0]
    b = [r for r in rows if r["media_id"] == 2]
    assert b and all(r["frame_time_s"] is None for r in b)  # no stts
    assert all(r["duration_s"] == 2.5 for r in b)  # mvhd grid still real


def test_mp4_frame_luminance_dim_and_gate_contract():
    """Plan-build errors (bad dim) surface regardless of pyav; without
    pyav the decode tier raises the module's single malformed-payload
    type so callers tier down per row — mirroring the Pillow gate."""
    with pytest.raises(ValueError, match="dim"):
        mp4_frame_luminance(b"\x00\x00ftypmp4", 0.0, dim=7)
    if not _HAS_AV:
        with pytest.raises(ValueError, match="pyav"):
            mp4_frame_luminance(b"\x00\x00ftypmp4", 0.0)


@pytest.mark.skipif(not _HAS_AV, reason="pyav not installed")
def test_mp4_frame_luminance_real_pyav(spark):
    """With pyav importable, codec'd video reaches REAL pixels: encode
    a tiny two-frame mp4 in-memory (black frame then white frame) and
    assert the luminance histogram matches each frame — the same
    feature shape as the y4m and image tiers."""
    import io

    import av
    import numpy as np

    buf = io.BytesIO()
    with av.open(buf, mode="w", format="mp4") as container:
        stream = container.add_stream("h264", rate=1)
        stream.width, stream.height = 64, 64
        stream.pix_fmt = "yuv420p"
        for value in (0, 255):
            img = np.full((64, 64, 3), value, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(img, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    payload = buf.getvalue()

    black = mp4_frame_luminance(payload, 0.0)
    assert len(black) == 8 and abs(sum(black) - 1.0) < 1e-6
    assert black[0] > 0.9  # lossy-codec tolerance: near-black stays in bin 0
    white = mp4_frame_luminance(payload, 1.0)
    assert white[7] > 0.9

    media = spark.createDataFrame(
        [(1, "video", payload, "video/mp4", None)], MEDIA_SCHEMA
    )
    rows = frame_sample(media, every_s=1.0).collect()
    assert rows and any(
        r["frame_feature"] is not None and abs(sum(r["frame_feature"]) - 1.0) < 1e-6
        for r in rows
    )
