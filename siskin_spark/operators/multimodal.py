"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas`` (SURVEY.md §7.5).

Image decoding has three tiers:

1. **Pillow**, when importable (``_HAS_PIL``): full decode —
   width/height/mode from the actual pixel pipeline.
2. **Header parse** (always available, pure stdlib):
   :func:`parse_image_header` reads real dimensions from PNG/GIF/BMP/
   JPEG container headers — no image library needed, and sufficient
   for the metadata/filtering stages of a training-data pipeline.
3. **Deterministic fake** (``fake_decode_features``): md5-derived
   pseudo-features for the embedding slot, used by the oracle-checked
   plumbing query where determinism across engines is the contract.

The FEATURE column has a content-derived tier too
(``decoder='content'`` in :func:`extract_features`): image rows get a
pixel-luminance histogram when Pillow can decode
(:func:`image_pixel_features`), audio rows a WAV PCM RMS envelope
from a pure-stdlib sample parse (:func:`wav_pcm_features` — no
librosa needed), and video rows in the raw-plane YUV4MPEG2 container
get a REAL first-frame luminance histogram
(:func:`y4m_frame_luminance` — the y4m format is uncompressed Y'CbCr
planes, so pixels are reachable with no codec library); anything
without a decode path tiers down to the md5 stand-in per row.
Audio/video container metadata is likewise real from stdlib header
parses (:func:`parse_wav_header` — channels/rate/duration from
RIFF/WAVE; :func:`parse_mp4_duration` — duration from the ISO-BMFF
moov/mvhd box; :func:`parse_y4m_header` — dimensions/rate/colorspace).
CODEC-compressed frame decode (mp4/h264 etc.) is pyav-gated
(``_HAS_AV``, same pattern as the Pillow gate):
:func:`mp4_frame_luminance` decodes real per-frame pixels when pyav
is importable and tiers down to a null feature otherwise (this
container ships no pyav, so here mp4 rows get the real
metadata-derived sampling grid + sample-table frame times with null
pixel features, while y4m rows always get real per-frame features).
The Spark-side plumbing — schema, batch iteration, partitioning, UDF
signatures — is real and tested at every tier.

Scale notes: binary payloads ride in Parquet binary columns;
``spark.sql.files.maxPartitionBytes`` bounds scan partitions, and the
mapInPandas batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``)
bounds executor memory per batch — at 100 TB you tune those two knobs,
not the code.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


try:  # optional dependency: full decode path
    from PIL import Image as _PILImage  # type: ignore

    _HAS_PIL = True
except ImportError:  # container default: header-parse path only
    _PILImage = None
    _HAS_PIL = False

# Pillow decode failures a per-row tier-down must absorb: bad payloads
# raise OSError/ValueError, but DecompressionBombError (an adversarial
# header claiming e.g. 65500x65500 pixels) subclasses Exception
# DIRECTLY — catching only (OSError, ValueError) would let one such
# payload fail the whole Arrow batch instead of tiering that row down.
_PIL_DECODE_ERRORS: tuple[type[BaseException], ...] = (OSError, ValueError)
if _HAS_PIL and hasattr(_PILImage, "DecompressionBombError"):
    _PIL_DECODE_ERRORS = _PIL_DECODE_ERRORS + (_PILImage.DecompressionBombError,)

try:  # optional dependency: codec'd-video (mp4 etc.) pixel decode
    import av as _av  # type: ignore

    _HAS_AV = True
except ImportError:  # container default: header/sample-table tier only
    _av = None
    _HAS_AV = False


def _malformed_raises_valueerror(fn):
    """Parser-boundary contract: ANY malformed payload raises
    ValueError, full stop. The container walkers bounds-check before
    unpacking, but a short buffer can still reach struct.unpack (a
    truncated fixed-offset field) or slicing — fuzzing found
    struct.error escaping on e.g. an 8-byte PNG signature with no
    IHDR. Normalizing here keeps every caller's per-row tier-down to
    one exception type instead of a grab-bag."""
    import functools
    import struct

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        try:
            return fn(*a, **kw)
        except (struct.error, IndexError) as e:
            raise ValueError(f"malformed container: {e}") from e

    return wrapped


@_malformed_raises_valueerror
def parse_image_header(content: bytes) -> tuple[int, int, str]:
    """Real image dimensions from container headers — pure stdlib, no
    image library. Covers PNG (IHDR), GIF (logical screen descriptor),
    BMP (BITMAPINFOHEADER), and JPEG (SOF0/1/2 marker scan). Raises
    ValueError on anything else."""
    import struct

    if content[:8] == b"\x89PNG\r\n\x1a\n" and content[12:16] == b"IHDR":
        w, h = struct.unpack(">II", content[16:24])
        return int(w), int(h), "png"
    if content[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", content[6:10])
        return int(w), int(h), "gif"
    if content[:2] == b"BM" and len(content) >= 26:
        w, h = struct.unpack("<ii", content[18:26])
        return int(w), abs(int(h)), "bmp"
    if content[:2] == b"\xff\xd8":  # JPEG: scan segments for a SOF
        i = 2
        while i + 9 < len(content):
            if content[i] != 0xFF:
                break
            marker = content[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", content[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                h, w = struct.unpack(">HH", content[i + 5 : i + 9])
                return int(w), int(h), "jpeg"
            i += 2 + seg_len
    raise ValueError("unrecognized image container (png/gif/bmp/jpeg supported)")


def decode_image(content: bytes) -> tuple[int, int, str]:
    """Best-available image decode: Pillow when importable (full pixel
    decode), header parse otherwise. The (width, height, format)
    contract is identical either way."""
    if _HAS_PIL:
        import io

        with _PILImage.open(io.BytesIO(content)) as im:
            return int(im.width), int(im.height), (im.format or "unknown").lower()
    return parse_image_header(content)


def fake_decode_features(content: bytes, dim: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic stand-in decoder: pseudo width/height and a unit
    feature vector derived from the md5 of the bytes."""
    h = hashlib.md5(content).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    raw = [float(b) - 127.5 for b in h[2 : 2 + dim]]
    n = sum(x * x for x in raw) ** 0.5 or 1.0
    return width, height, [x / n for x in raw]


def image_pixel_features(content: bytes, dim: int = 8) -> list[float]:
    """CONTENT-derived image feature: an L1-normalized ``dim``-bin
    luminance histogram over the decoded pixels. Deterministic and
    library-stable (integer bin counts over Pillow's ``convert('L')``
    luminance, no resampling). Requires Pillow; ``dim`` must divide
    256. Raises when Pillow is missing or the payload won't decode —
    callers tier down to :func:`fake_decode_features`."""
    if not _HAS_PIL:
        raise RuntimeError("Pillow not available: no pixel decode path")
    if 256 % dim:
        raise ValueError("dim must divide 256 for even luminance bins")
    import io

    with _PILImage.open(io.BytesIO(content)) as im:
        hist = im.convert("L").histogram()  # 256 integer luminance bins
    binw = 256 // dim
    bins = [float(sum(hist[i * binw : (i + 1) * binw])) for i in range(dim)]
    total = sum(bins) or 1.0
    return [b / total for b in bins]


@_malformed_raises_valueerror
def wav_pcm_features(content: bytes, dim: int = 8) -> list[float]:
    """CONTENT-derived audio feature from WAV PCM samples — pure
    stdlib parse + numpy math, no audio library. Splits the
    interleaved 16-bit PCM stream into ``dim`` equal segments and
    returns the unit-L2-normalized per-segment RMS envelope (loudness
    shape over time — the useful cheap signal for dedup/quality
    filtering of audio corpora). Raises ValueError on non-WAV or
    non-16-bit-PCM payloads — callers tier down to
    :func:`fake_decode_features`."""
    import struct

    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, n = 12, len(content)
    fmt = data = None
    while pos + 8 <= n:
        tag = content[pos : pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + size]
        if tag == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, _channels, _rate, _, _block_align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError("only 16-bit integer PCM supported")
    samples = np.frombuffer(
        data[: (len(data) // 2) * 2], dtype="<i2"
    ).astype(np.float64)
    if samples.size == 0:
        raise ValueError("empty WAV data chunk")
    rms = np.array(
        [
            float(np.sqrt(np.mean(seg * seg))) if seg.size else 0.0
            for seg in np.array_split(samples, dim)
        ]
    )
    norm = float(np.linalg.norm(rms)) or 1.0
    return (rms / norm).tolist()


def extract_features(
    media: DataFrame, dim: int = 8, decoder: str = "fake"
) -> DataFrame:
    """mapInPandas feature extraction over binary media rows.

    Arrow-batched: each pandas batch holds whole payloads; the iterator
    form keeps peak memory at one batch regardless of partition size.

    ``decoder='fake'`` (default) derives deterministic pseudo
    width/height AND the feature vector from the bytes alone — the
    cross-engine-reproducible contract the oracle query checks.
    ``decoder='image'`` reads REAL dimensions via :func:`decode_image`
    (Pillow when available, header parse otherwise) but keeps the
    md5-derived feature. ``decoder='content'`` additionally derives
    the FEATURE from the decoded content where a decoder exists:
    image rows get a pixel-luminance histogram
    (:func:`image_pixel_features`, Pillow-gated), audio rows a WAV PCM
    RMS envelope (:func:`wav_pcm_features`, pure stdlib — always
    available), video rows in the raw-plane YUV4MPEG2 container a
    first-frame luminance histogram (:func:`y4m_frame_luminance`, pure
    stdlib+numpy); rows with no decode path (codec-compressed video,
    undecodable payloads, images without Pillow) tier down to the md5
    stand-in, per row, so one corrupt payload never fails the Arrow
    batch.
    """

    import struct

    # caller misconfiguration must fail HERE, at plan-build time, not
    # be silently tiered down to the md5 stand-in inside the executor
    if decoder == "content" and 256 % dim:
        raise ValueError("dim must divide 256 for even luminance bins")

    def dims(c: bytes, kind: str, f: tuple) -> tuple[int | None, int | None]:
        if decoder in ("image", "content"):
            if kind == "video" and c.startswith(b"YUV4MPEG2"):
                try:
                    w, h, *_ = parse_y4m_header(c)
                    return w, h
                except ValueError:
                    return None, None
            try:
                w, h, _ = decode_image(c)
                return w, h
            except (struct.error, IndexError) + _PIL_DECODE_ERRORS:
                # a payload passing the magic-byte check but truncated
                # before the size fields — must yield null dims like
                # any other undecodable payload, not fail the batch
                return None, None
        return f[0], f[1]

    def feature(c: bytes, kind: str, f: tuple) -> list[float]:
        if decoder == "content":
            if kind == "image" and _HAS_PIL:
                try:
                    return image_pixel_features(c, dim)
                except (struct.error, IndexError) + _PIL_DECODE_ERRORS:
                    # per-row DECODE failure only (incl. Pillow's
                    # DecompressionBombError, and the struct/Index
                    # errors plugin decoders raise on truncated
                    # payloads — same set the dims() tier catches);
                    # config errors were rejected at plan-build time
                    pass
            if kind == "audio":
                try:
                    return wav_pcm_features(c, dim)
                except (ValueError, struct.error):
                    pass
            if kind == "video":
                if c.startswith(b"YUV4MPEG2"):
                    # raw-plane container: REAL first-frame luminance
                    # histogram, same feature shape as the image tier
                    try:
                        return y4m_frame_luminance(c, y4m_frame_offsets(c)[0], dim)
                    except (ValueError, struct.error):
                        pass
                elif _HAS_AV:
                    # codec'd container: REAL first-frame luminance
                    # through the pyav gate, per-row tier-down
                    try:
                        return mp4_frame_luminance(c, 0.0, dim)
                    except ValueError:
                        pass
        return f[2]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode_features(c, dim) for c in pdf["content"]]
            sizes = [
                dims(c, k, f)
                for c, k, f in zip(pdf["content"], pdf["kind"], feats)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "sha1": [hashlib.sha1(c).hexdigest() for c in pdf["content"]],
                    "width": [s[0] for s in sizes],
                    "height": [s[1] for s in sizes],
                    "feature": [
                        feature(c, k, f)
                        for c, k, f in zip(pdf["content"], pdf["kind"], feats)
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize via mapInPandas when Pillow is importable
    (``_HAS_PIL``): decodes each image payload, resizes to
    (width, height), re-encodes PNG, and stamps the new size in
    ``meta``; undecodable payloads pass through unchanged with a
    ``resize_error`` marker instead of failing the Arrow batch.
    Without Pillow this falls back to :func:`resize_stub` (metadata
    only — the container default).

    Shared meta contract across both tiers: EVERY row (any kind) gets
    ``resize_w``/``resize_h`` stamped; only this tier can additionally
    stamp ``resize_error`` (the stub never decodes, so it never
    fails). Same schema in and out — drop-in interchangeable pipeline
    stages."""
    if not _HAS_PIL:
        return resize_stub(media, width, height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            out_content, out_meta = [], []
            for content, kind, meta in zip(
                pdf["content"], pdf["kind"], pdf["meta"]
            ):
                meta = dict(meta or {})
                if kind != "image":
                    # stamp the target size on non-image rows too so
                    # this tier is meta-for-meta interchangeable with
                    # resize_stub (which stamps every row)
                    meta.update(
                        {"resize_w": str(width), "resize_h": str(height)}
                    )
                    out_content.append(content)
                    out_meta.append(meta)
                    continue
                # stamp BEFORE decoding: the contract is that EVERY
                # row carries resize_w/resize_h, including rows whose
                # decode fails below (those additionally get
                # resize_error and keep their original bytes)
                meta.update({"resize_w": str(width), "resize_h": str(height)})
                try:
                    with _PILImage.open(io.BytesIO(content)) as im:
                        resized = im.resize((width, height))
                        buf = io.BytesIO()
                        resized.save(buf, format="PNG")
                    out_content.append(buf.getvalue())
                except Exception as exc:  # undecodable: pass through
                    meta["resize_error"] = type(exc).__name__
                    out_content.append(content)
                out_meta.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": out_content,
                    "mime": pdf["mime"],
                    "meta": out_meta,
                }
            )

    return media.mapInPandas(run, MEDIA_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes bytes through (a real impl transforms
    ``content`` — :func:`resize_images` when Pillow is available);
    records the target size in ``meta`` so downstream stages see the
    declared dimensions."""
    return media.withColumn(
        "meta",
        F.map_concat(
            F.coalesce(F.col("meta"), F.create_map().cast("map<string,string>")),
            F.create_map(
                F.lit("resize_w"), F.lit(str(width)),
                F.lit("resize_h"), F.lit(str(height)),
            ),
        ),
    )


@_malformed_raises_valueerror
def parse_wav_header(content: bytes) -> tuple[int, int, float]:
    """Real audio metadata from a RIFF/WAVE header — pure stdlib.
    Returns (channels, sample_rate, duration_seconds). Raises
    ValueError on non-WAV payloads (same contract tier as
    :func:`parse_image_header`: header parse, no audio library)."""
    import struct

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, n = 12, len(content)
    channels = rate = block_align = None
    data_size = None
    while pos + 8 <= n:
        tag = content[pos : pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + size]
        if tag == b"fmt " and len(body) >= 16:
            _, channels, rate, _, block_align, _ = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif tag == b"data":
            data_size = size
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if not channels or not rate or not block_align:
        raise ValueError("WAV missing fmt chunk")
    if data_size is None:
        raise ValueError("WAV missing data chunk")
    return channels, rate, data_size / (block_align * rate)


@_malformed_raises_valueerror
def parse_mp4_duration(content: bytes) -> float:
    """Real video duration from an ISO-BMFF (mp4/mov) header — walks
    top-level boxes to moov/mvhd, pure stdlib. Returns seconds; raises
    ValueError when no mvhd is present (truncated or non-mp4).

    Shares :func:`_mp4_boxes` with :func:`parse_mp4_sample_times`, so
    the two parsers have ONE malformed-input semantics: a box whose
    declared size overruns the buffer raises ValueError from both,
    instead of one clamping to a plausible duration while the other
    rejects the same payload."""
    import struct

    for tag, b0, b1 in _mp4_boxes(content, 0, len(content)):
        if tag != b"moov":
            continue
        for tag2, c0, c1 in _mp4_boxes(content, b0, b1):
            if tag2 != b"mvhd":
                continue
            if c0 >= c1:
                raise ValueError("truncated mvhd box")
            version = content[c0]
            # bounds-check BEFORE unpacking: a box declaring a large
            # size but cut short mid-payload must degrade as the same
            # ValueError tier as any other malformed container, not
            # leak struct.error/IndexError to callers
            if c0 + (32 if version == 1 else 20) > c1:
                raise ValueError("truncated mvhd box")
            if version == 1:
                (timescale,) = struct.unpack(">I", content[c0 + 20 : c0 + 24])
                (duration,) = struct.unpack(">Q", content[c0 + 24 : c0 + 32])
            else:
                (timescale,) = struct.unpack(">I", content[c0 + 12 : c0 + 16])
                (duration,) = struct.unpack(">I", content[c0 + 16 : c0 + 20])
            if not timescale:
                raise ValueError("mvhd timescale is zero")
            return duration / timescale
    raise ValueError("no moov/mvhd box found (not an mp4 or truncated)")


def _mp4_boxes(content: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the boxes in
    content[start:end], bounds-checked: a box whose declared size
    overruns the buffer raises the same ValueError tier as every other
    malformed-container condition."""
    import struct

    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", content[pos : pos + 4])
        tag = content[pos + 4 : pos + 8]
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            (size,) = struct.unpack(">Q", content[pos + 8 : pos + 16])
            payload = pos + 16
        else:
            payload = pos + 8
        if size < payload - pos or pos + size > end:
            raise ValueError(f"box {tag!r} overruns its container")
        yield tag, payload, pos + size
        pos += size


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


@_malformed_raises_valueerror
def parse_mp4_sample_times(content: bytes, max_samples: int = 1_000_000) -> list[float]:
    """Real per-frame decode timestamps from the mp4 SAMPLE TABLE —
    pure stdlib, same tier as :func:`parse_mp4_duration` but
    frame-granular: walks moov -> trak -> mdia (preferring the track
    whose hdlr handler is 'vide') -> mdhd (media timescale) -> stbl ->
    stts (time-to-sample run-length deltas) and expands the deltas to
    one timestamp per sample, in seconds.

    The pixel decode of each frame remains the declared stub (no
    codec library in the container), but with this the sampling grid
    is the file's ACTUAL frame timeline, not a uniform approximation.
    Raises ValueError on non-mp4 payloads, missing/truncated tables,
    zero timescale, or a table claiming more than ``max_samples``
    (adversarial-input bound)."""
    import struct

    def find(tag: bytes, lo: int, hi: int):
        for t, a, b in _mp4_boxes(content, lo, hi):
            if t == tag:
                return a, b
            if t in _MP4_CONTAINERS:
                try:
                    return find(tag, a, b)
                except ValueError:
                    continue
        raise ValueError(f"no {tag!r} box found")

    # collect every trak; prefer a 'vide' handler
    moov_a, moov_b = find(b"moov", 0, len(content))
    traks = [
        (a, b) for t, a, b in _mp4_boxes(content, moov_a, moov_b) if t == b"trak"
    ]
    if not traks:
        raise ValueError("moov has no trak box")

    def is_video(lo: int, hi: int) -> bool:
        try:
            a, b = find(b"hdlr", lo, hi)
        except ValueError:
            return False
        return content[a + 8 : a + 12] == b"vide"

    ordered = [t for t in traks if is_video(*t)] + [
        t for t in traks if not is_video(*t)
    ]
    last_err = None
    for lo, hi in ordered:
        try:
            ma, mb = find(b"mdhd", lo, hi)
            if ma >= mb:
                raise ValueError("truncated mdhd box")
            version = content[ma]
            need = 24 if version == 1 else 16
            if ma + need > mb:
                raise ValueError("truncated mdhd box")
            off = ma + (20 if version == 1 else 12)
            (timescale,) = struct.unpack(">I", content[off : off + 4])
            if not timescale:
                raise ValueError("mdhd timescale is zero")
            sa, sb = find(b"stts", lo, hi)
            if sa + 8 > sb:
                raise ValueError("truncated stts box")
            (n_entries,) = struct.unpack(">I", content[sa + 4 : sa + 8])
            if sa + 8 + 8 * n_entries > sb:
                raise ValueError("stts entries overrun the box")
            times: list[float] = []
            t = 0
            for i in range(n_entries):
                cnt, delta = struct.unpack(
                    ">II", content[sa + 8 + 8 * i : sa + 16 + 8 * i]
                )
                if len(times) + cnt > max_samples:
                    raise ValueError("stts sample count exceeds bound")
                for _ in range(cnt):
                    times.append(t / timescale)
                    t += delta
            if not times:
                raise ValueError("stts has zero samples")
            return times
        except ValueError as e:  # try the next trak (e.g. audio-only)
            last_err = e
    raise last_err  # every trak failed


# YUV4MPEG2: the one video container whose frames are decodable with
# no codec library — raw Y'CbCr planes behind a text header (the
# mjpegtools interchange format). Chroma subsampling determines the
# U/V plane size as a fraction of the Y plane's (w*h); the Y plane is
# the luminance channel itself, so frame features come straight off it.
_Y4M_CHROMA_DIV = {
    "420": 4, "420jpeg": 4, "420paldv": 4, "420mpeg2": 4,
    "422": 2,
    "444": 1,
    "mono": 0,  # no chroma planes
}


@_malformed_raises_valueerror
def parse_y4m_header(content: bytes) -> tuple[int, int, int, int, str]:
    """Parse a YUV4MPEG2 stream header — pure stdlib, same tier as
    :func:`parse_wav_header`. Returns (width, height, fps_num,
    fps_den, colorspace); raises ValueError on non-y4m payloads,
    missing W/H/F params, or an unsupported colorspace."""
    if not content.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = content.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated y4m stream header")
    width = height = None
    num, den = 30, 1  # y4m default frame rate when F is absent
    chroma = "420"
    for param in content[9:nl].decode("ascii", "replace").split():
        tag, val = param[0], param[1:]
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            num, den = (int(x) for x in val.split(":"))
        elif tag == "C":
            chroma = val
    if not width or not height or width < 0 or height < 0:
        raise ValueError("y4m header missing W/H")
    if num <= 0 or den <= 0:
        raise ValueError("y4m frame rate must be positive")
    if chroma not in _Y4M_CHROMA_DIV:
        raise ValueError(f"unsupported y4m colorspace C{chroma}")
    return width, height, num, den, chroma


@_malformed_raises_valueerror
def y4m_frame_offsets(content: bytes, max_frames: int = 1_000_000) -> list[int]:
    """Byte offset of each frame's Y PLANE in a y4m stream, walking
    FRAME markers with bounds checks (a truncated final frame raises
    ValueError like every other malformed container). The walk is
    O(frames) seeks, not a read of the pixel data."""
    width, height, _, _, chroma = parse_y4m_header(content)
    y_size = width * height
    div = _Y4M_CHROMA_DIV[chroma]
    frame_size = y_size + (0 if div == 0 else 2 * (y_size // div))
    pos = content.find(b"\n") + 1
    n = len(content)
    offsets: list[int] = []
    while pos < n:
        if content[pos : pos + 5] != b"FRAME":
            raise ValueError("y4m frame marker missing")
        nl = content.find(b"\n", pos + 5)
        if nl < 0 or nl + 1 + frame_size > n:
            raise ValueError("truncated y4m frame")
        offsets.append(nl + 1)
        pos = nl + 1 + frame_size
        if len(offsets) > max_frames:
            raise ValueError("y4m frame count exceeds bound")
    if not offsets:
        raise ValueError("y4m stream has zero frames")
    return offsets


def y4m_frame_luminance(content: bytes, frame_offset: int, dim: int = 8) -> list[float]:
    """REAL pixel decode of one y4m frame: normalized ``dim``-bin
    luminance histogram of the frame's Y plane (the same feature shape
    as :func:`image_pixel_features`, so image and video features are
    comparable downstream). ``frame_offset`` is a Y-plane byte offset
    from :func:`y4m_frame_offsets`."""
    import numpy as np

    if 256 % dim:
        raise ValueError("dim must divide 256 for even luminance bins")
    width, height, _, _, _ = parse_y4m_header(content)
    y = np.frombuffer(content, dtype=np.uint8, count=width * height, offset=frame_offset)
    # same binning as image_pixel_features: luminance value v lands in
    # bin v // (256/dim), counts L1-normalized over the plane
    hist = np.bincount(y // (256 // dim), minlength=dim)
    return (hist / float(width * height)).tolist()


def _mp4_best_frame_hist(
    container, stream, seek_time_s: float, dim: int, max_scan_frames: int
) -> list[float]:
    """Decode the frame at/before ``seek_time_s`` from an ALREADY-OPEN
    pyav container and histogram its luminance. Keyframe-seek, then
    scan forward to the last frame at/before the target (what a
    demuxer serves for the offset). A frame reporting no pts
    (``frame.time is None`` — raw elementary streams) ends the scan:
    with no timestamps to compare, the first decoded frame IS the
    answer for any target, and scanning further would both clobber an
    already-correct best and decode ``max_scan_frames`` frames for
    nothing."""
    import numpy as np

    if seek_time_s > 0 and stream.time_base:
        container.seek(
            int(seek_time_s / float(stream.time_base)),
            stream=stream,
            any_frame=False,
        )
    best = None
    for i, frame in enumerate(container.decode(stream)):
        t = frame.time
        if t is None:
            if best is None:
                best = frame
            break
        if best is None or t <= seek_time_s + 1e-9:
            best = frame
        if t >= seek_time_s or i >= max_scan_frames:
            break
    if best is None:
        raise ValueError("no decodable video frame")
    y = np.asarray(best.to_ndarray(format="gray")).ravel()
    hist = np.bincount(y // (256 // dim), minlength=dim)
    return (hist / float(y.size)).tolist()


def mp4_frames_luminance(
    content: bytes,
    seek_times: list[float],
    dim: int = 8,
    max_scan_frames: int = 512,
) -> list[list[float] | None]:
    """Batch variant of :func:`mp4_frame_luminance`: opens and parses
    the container ONCE and keyframe-seeks per target, so a video row
    sampled at N offsets costs one open + N GOP decodes instead of N
    full open/parse/seek cycles over the same payload.
    Per-target decode failures yield None in that slot (the caller's
    null-feature tier-down); a payload pyav cannot open at all raises
    ValueError, like the single-frame API."""
    import io

    if 256 % dim:
        raise ValueError("dim must divide 256 for even luminance bins")
    if not _HAS_AV:
        raise ValueError(
            "pyav not available: codec'd video stays at the header/"
            "sample-table tier"
        )
    out: list[list[float] | None] = []
    try:
        with _av.open(io.BytesIO(bytes(content))) as container:
            stream = container.streams.video[0]
            for t in seek_times:
                try:
                    out.append(
                        _mp4_best_frame_hist(
                            container, stream, t, dim, max_scan_frames
                        )
                    )
                except Exception:  # noqa: BLE001 — per-target tier-down;
                    # pyav's exception hierarchy moved across releases
                    # (av.AVError → av.error.FFmpegError), so no
                    # version-specific class names here
                    out.append(None)
    except ValueError:
        raise
    except Exception as e:  # noqa: BLE001 — container-level failure
        raise ValueError(f"undecodable video payload: {e}") from e
    return out


def mp4_frame_luminance(
    content: bytes, seek_time_s: float, dim: int = 8, max_scan_frames: int = 512
) -> list[float]:
    """REAL pixel decode of one codec'd-video frame via pyav, when
    importable (``_HAS_AV``) — same pyav gate pattern as the Pillow
    image tier. Seeks to the keyframe at/before ``seek_time_s``,
    decodes forward to the last frame at/before that time (what a
    demuxer serves for the offset), and returns the same normalized
    ``dim``-bin luminance histogram as :func:`y4m_frame_luminance` /
    :func:`image_pixel_features`, so image, raw-plane video, and
    codec'd video features are comparable downstream.

    Raises ValueError when pyav is absent or the payload/frame is
    undecodable — callers tier the row down to a null feature, per
    row, never failing the Arrow batch. The decode scan after the
    keyframe seek is capped at ``max_scan_frames`` so a malformed
    index can't trigger an unbounded full-stream decode. For many
    offsets over one payload use :func:`mp4_frames_luminance`."""
    feat = mp4_frames_luminance(content, [seek_time_s], dim, max_scan_frames)[0]
    if feat is None:
        raise ValueError("undecodable video frame")
    return feat


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_offset_s", T.DoubleType()),
        T.StructField("duration_s", T.DoubleType()),
        # decode timestamp of the ACTUAL frame at/before the sampled
        # offset (from the stts sample table); null when the payload
        # has no parseable sample table
        T.StructField("frame_time_s", T.DoubleType()),
        # REAL pixel feature: luminance histogram of the frame
        # at/before the sampled offset — always for y4m (raw planes),
        # for codec'd containers (mp4) only when pyav is importable;
        # null when no decode path reaches pixels
        T.StructField("frame_feature", T.ArrayType(T.FloatType())),
    ]
)


def frame_sample(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Real frame-sampling plan for video rows: one row per sampled
    offset in [0, duration), duration read from the mp4 header
    (:func:`parse_mp4_duration`) — the SAMPLING GRID is always real.
    Unparseable payloads yield a single row with null duration
    (frame_idx 0, offset 0.0) so downstream stages see every video.

    When the payload carries a parseable stts SAMPLE TABLE
    (:func:`parse_mp4_sample_times`), each sampled offset additionally
    reports ``frame_time_s`` — the decode timestamp of the actual
    frame at/before that offset (what a demuxer would seek to);
    payloads without one get null there, and the grid still comes
    from the mvhd duration.

    YUV4MPEG2 payloads go further: the container is raw Y'CbCr planes,
    so duration AND per-frame times come from the frame walk, and each
    sampled row carries a REAL ``frame_feature`` — the luminance
    histogram of the decoded frame at/before the offset
    (:func:`y4m_frame_luminance`), the same feature shape the image
    content tier emits. Codec'd containers (mp4) reach pixels through
    the pyav gate (:func:`mp4_frame_luminance`): a real per-frame
    luminance histogram when pyav is importable, tier-down to a null
    ``frame_feature`` per row when it is absent or the payload does
    not decode — mirroring the Pillow gate on the image tier.

    mapInPandas rather than a column expression: the metadata lives
    inside the binary payload, and the per-row work is a bounded
    header/frame-marker walk plus (y4m only) one plane histogram per
    sampled frame, never a full-stream decode."""
    import bisect
    import math

    import struct as _struct

    _degrade = (ValueError, _struct.error, IndexError)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, durs, fts, feats = [], [], [], [], [], []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if kind != "video":
                    continue
                raw = bytes(content)
                times = fo = None
                try:
                    if raw.startswith(b"YUV4MPEG2"):
                        _, _, num, den, _ = parse_y4m_header(raw)
                        fo = y4m_frame_offsets(raw)
                        times = [i * den / num for i in range(len(fo))]
                        dur = len(fo) * den / num
                    else:
                        dur = parse_mp4_duration(raw)
                    n = max(1, math.ceil(dur / every_s))
                except _degrade:
                    # belt-and-braces with the parsers' own bounds
                    # checks: ANY malformed payload degrades to the
                    # documented null-duration row, never fails the
                    # whole Arrow batch
                    dur, n, fo = None, 1, None
                if times is None and not raw.startswith(b"YUV4MPEG2"):
                    try:
                        times = parse_mp4_sample_times(raw)
                    except _degrade:
                        times = None
                # codec'd-video pixel tier: collect this row's target
                # times, then ONE batched pyav pass (one container
                # open + N keyframe seeks) backfills the placeholders
                pend: list[tuple[int, float]] = []
                for i in range(n):
                    off = i * every_s
                    ids.append(mid)
                    idxs.append(i)
                    offs.append(off)
                    durs.append(dur)
                    if times is None:
                        fts.append(None)
                        feats.append(None)
                        pend.append((len(feats) - 1, off))
                    else:
                        # the frame a demuxer decodes for offset t is
                        # the last sample at/before t (first frame
                        # when t precedes every sample)
                        j = max(bisect.bisect_right(times, off) - 1, 0)
                        fts.append(times[j])
                        if fo is not None:
                            feats.append(y4m_frame_luminance(raw, fo[j]))
                        else:
                            feats.append(None)
                            pend.append((len(feats) - 1, times[j]))
                if pend and _HAS_AV:
                    try:
                        hists = mp4_frames_luminance(
                            raw, [t for _, t in pend]
                        )
                    except ValueError:
                        hists = [None] * len(pend)
                    for (k, _), h in zip(pend, hists):
                        feats[k] = h
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_offset_s": pd.Series(offs, dtype="float64"),
                    "duration_s": pd.Series(durs, dtype="float64"),
                    "frame_time_s": pd.Series(fts, dtype="float64"),
                    "frame_feature": pd.Series(feats, dtype="object"),
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
