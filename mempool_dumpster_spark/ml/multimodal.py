"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

The Spark-side contract (schemas, partitioning, UDF signatures, batch
shapes) is real and tested. Dimension/format extraction is REAL for the
container formats whose headers are self-describing — PNG (IHDR chunk),
JPEG (SOF0/1/2... frame markers), GIF (logical screen descriptor), and BMP
(BITMAPINFOHEADER) — via `image_header`, a pure-Python byte parse needing
no codec library. Full pixel decode dispatches to PIL when importable;
payloads in formats the header parser doesn't know fall back to
`_fake_decode` (deterministic byte-statistics features) or raise
NotImplementedError in strict mode.

At 100 TB: media tables are date/modality-partitioned; decode runs as
mapInPandas so each Arrow batch holds only `batch_rows` payloads (bound
memory via maxRecordsPerBatch), and feature extraction emits SMALL columns
(embeddings/metadata), never re-emitting payload bytes unless asked.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical media-table schema
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("mime", T.StringType(), True),  # e.g. image/png
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, mime string, n_bytes long, byte_mean double, "
    "byte_entropy double, width int, height int, format string, "
    "decode_ok boolean"
)

#: JPEG start-of-frame markers that carry dimensions (all SOFn except the
#: non-frame 0xC4 DHT, 0xC8 JPG, and 0xCC DAC markers).
_JPEG_SOF = frozenset(
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)


def image_header(payload: bytes) -> tuple[str, int, int] | None:
    """Parse (format, width, height) from an image payload's header bytes —
    pure Python, no codec library. Recognizes PNG, JPEG, GIF, and BMP.
    Returns None for unrecognized formats; raises ValueError when the
    signature matches but the header is truncated or malformed (the caller
    maps that to decode_ok=False, distinct from "unknown format")."""
    n = len(payload)
    if n >= 8 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        # First chunk must be IHDR: 4-byte length, 'IHDR', then
        # 4-byte big-endian width and height (PNG spec 11.2.2).
        if n < 24 or payload[12:16] != b"IHDR":
            raise ValueError("truncated or non-IHDR-first PNG")
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        if not (0 < w and 0 < h):
            raise ValueError("PNG IHDR with zero dimension")
        return ("png", w, h)
    if n >= 2 and payload[:2] == b"\xff\xd8":
        # Walk marker segments to the first SOFn frame header:
        # FF marker len(2) [precision(1) height(2) width(2) ...].
        i = 2
        while i + 1 < n:
            if payload[i] != 0xFF:
                raise ValueError("JPEG marker desync")
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in _JPEG_SOF:
                if i + 9 > n:
                    raise ValueError("truncated JPEG SOF")
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                if not (0 < w and 0 < h):
                    raise ValueError("JPEG SOF with zero dimension")
                return ("jpeg", w, h)
            if 0xD0 <= marker <= 0xD9 or marker == 0x01:
                i += 2  # standalone marker, no length field
                continue
            if i + 4 > n:
                raise ValueError("truncated JPEG segment")
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seg_len < 2:
                raise ValueError("invalid JPEG segment length")
            i += 2 + seg_len
        raise ValueError("no JPEG SOF marker found")
    if n >= 6 and payload[:6] in (b"GIF87a", b"GIF89a"):
        if n < 10:
            raise ValueError("truncated GIF header")
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        if not (0 < w and 0 < h):
            raise ValueError("GIF logical screen with zero dimension")
        return ("gif", w, h)
    if n >= 18 and payload[:2] == b"BM":
        # 'BM' alone is a weak signature (any text starting "BM…" matches),
        # so discriminate on the DIB header-size field at offset 14: 12 is
        # the OS/2 BITMAPCOREHEADER (16-bit dims), the rest are the
        # BITMAPINFOHEADER family (32-bit dims). Anything else is not a
        # BMP — fall through to unknown-format rather than decode garbage.
        dib = int.from_bytes(payload[14:18], "little")
        if dib == 12:
            if n < 22:
                raise ValueError("truncated BMP core header")
            w = int.from_bytes(payload[18:20], "little")
            h = int.from_bytes(payload[20:22], "little")
        elif dib in (40, 52, 56, 64, 108, 124):
            if n < 26:
                raise ValueError("truncated BMP info header")
            w = int.from_bytes(payload[18:22], "little", signed=True)
            h = int.from_bytes(payload[22:26], "little", signed=True)
            w, h = abs(w), abs(h)  # negative height = top-down rows
        else:
            return None
        if not (0 < w and 0 < h):
            raise ValueError("BMP header with zero dimension")
        return ("bmp", w, h)
    return None


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decode: byte statistics +
    dimensions derived from content length. Keeps every downstream shape
    (schema, nullability, batching) identical to the real path. Vectorized
    over the payload with numpy — per-payload cost is O(n) C-speed, the
    shape a real decoder would have."""
    import math

    import numpy as np

    n = len(payload)
    if n == 0:
        return {"byte_mean": 0.0, "byte_entropy": 0.0, "width": 0, "height": 0}
    arr = np.frombuffer(payload, dtype=np.uint8)
    counts = np.bincount(arr, minlength=256)
    p = counts[counts > 0] / n
    entropy = float(-(p * np.log2(p)).sum())
    side = max(1, int(math.sqrt(n)))
    return {
        "byte_mean": float(arr.mean()),
        "byte_entropy": entropy,
        "width": side,
        "height": (n + side - 1) // side,
    }


def decode_images(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode/feature-extract an image media table → IMAGE_FEATURES_SCHEMA.

    mapInPandas: one Arrow batch in, one out; payload bytes never leave the
    executor. Dimensions and format come from `image_header` (pure-Python
    PNG/JPEG/GIF/BMP header parse — no codec library needed); with PIL
    installed its full decode refines them. Payloads in formats the header
    parser doesn't recognize fall back to `_fake_decode`'s byte statistics
    with format=NULL — or raise NotImplementedError when strict=True (a
    recognized-but-malformed header is decode_ok=False instead, so one
    corrupt file can't kill a 100 TB scan).
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        try:
            import io

            from PIL import Image  # type: ignore

            def pil_size(payload: bytes):
                img = Image.open(io.BytesIO(payload))
                return (img.format or "").lower(), *img.size

        except ImportError:
            pil_size = None

        def decode(payload: bytes) -> dict:
            header = image_header(payload)  # ValueError → decode_ok=False
            if header is None and pil_size is not None:
                # PIL failing to identify the payload means it is STILL an
                # unknown format — the same strict/fallback contract as
                # having no PIL at all, not a decode_ok=False malformed file
                # (environment must not change the output classification).
                try:
                    header = pil_size(payload)
                except Exception:
                    header = None
            if header is None:
                if strict:
                    raise NotImplementedError(
                        "unrecognized image format (not PNG/JPEG/GIF/BMP) "
                        "and no PIL in this container"
                    )
                return {**_fake_decode(payload), "format": None}
            fmt, w, h = header
            stats = _fake_decode(payload)
            stats.update({"width": w, "height": h, "format": fmt})
            return stats

        for pdf in batches:
            out = []
            # column-wise zip, not iterrows (no per-row Series construction)
            for media_id, mime, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"]
            ):
                payload = payload or b""
                try:
                    feats = decode(bytes(payload))
                    ok = True
                except NotImplementedError:
                    raise
                except Exception:
                    feats = {"byte_mean": None, "byte_entropy": None,
                             "width": None, "height": None, "format": None}
                    ok = False
                out.append(
                    {
                        "media_id": media_id,
                        "mime": mime,
                        "n_bytes": len(payload),
                        "decode_ok": ok,
                        **feats,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "mime", "n_bytes", "byte_mean",
                    "byte_entropy", "width", "height", "format", "decode_ok",
                ],
            )

    return media.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_n_seconds: int = 5
) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into per-frame
    task rows (media_id, frame_ts) without touching payloads — the decode
    itself would be another mapInPandas over (payload, frame_ts) pairs.
    Duration comes from metadata so the expansion is pure column algebra."""
    duration = F.coalesce(
        F.element_at("meta", "duration_s").cast("double"), F.lit(0.0)
    )
    n_frames = F.greatest((duration / every_n_seconds).cast("int"), F.lit(1))
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts_s", F.col("frame_idx") * every_n_seconds)


FRAME_SAMPLE_SCHEMA = (
    "media_id long, frame_ts_s double, sample_idx long, codec string, "
    "frame_bytes binary, format string, width int, height int, "
    "decode_ok boolean, pixels_ok boolean"
)


def _mp4_sample_table(payload: bytes):
    """Parse the first VIDEO track's sample table from a full MP4/MOV
    payload: returns (codec_fourcc, timescale, duration_ticks, samples)
    where samples is a list of (decode_ts_ticks, file_offset, size,
    is_sync). Pure Python over the ISO-BMFF boxes (stsd codec, mdhd
    timescale, stts decode times, stss keyframes — absent means every
    sample is sync, stsc sample→chunk runs, stsz sizes, stco/co64
    chunk offsets). Returns None when the payload is not ISO-BMFF or
    has no video sample table; raises ValueError for recognized-but-
    malformed tables (truncated arrays, inconsistent counts)."""
    n = len(payload)
    is_bmff = False
    for btype, _body, _bend in _mp4_boxes(payload, 0, min(n, 64)):
        is_bmff = btype == b"ftyp"
        break
    if not is_bmff:
        return None

    def u32(i):
        return int.from_bytes(payload[i : i + 4], "big")

    def full_box(body):  # (version, body-after-version/flags)
        return payload[body], body + 4

    for btype, body, bend in _mp4_boxes(payload, 0, n):
        if btype != b"moov":
            continue
        for ttype, tbody, tend in _mp4_boxes(payload, body, bend):
            if ttype != b"trak":
                continue
            timescale = duration = None
            handler = None
            stbl = None
            for mtype, mbody, mend in _mp4_boxes(payload, tbody, tend):
                if mtype != b"mdia":
                    continue
                for dtype, dbody, dend in _mp4_boxes(payload, mbody, mend):
                    if dtype == b"mdhd":
                        ver, _ = full_box(dbody)
                        if ver == 1:
                            timescale = u32(dbody + 20)
                            duration = int.from_bytes(
                                payload[dbody + 24 : dbody + 32], "big"
                            )
                        else:
                            timescale = u32(dbody + 12)
                            duration = u32(dbody + 16)
                    elif dtype == b"hdlr":
                        handler = payload[dbody + 8 : dbody + 12]
                    elif dtype == b"minf":
                        for stype, sbody, send in _mp4_boxes(
                            payload, dbody, dend
                        ):
                            if stype == b"stbl":
                                stbl = (sbody, send)
            if handler != b"vide" or stbl is None or not timescale:
                continue
            codec = None
            stts = stss = stsc = stco = None
            stsz_uniform = 0
            stsz_sizes: list[int] | None = None
            for stype, sbody, send in _mp4_boxes(payload, *stbl):
                _ver, p = full_box(sbody)
                if stype == b"stsd":
                    if u32(p) >= 1:  # entry_count
                        codec = payload[p + 8 : p + 12].decode(
                            "ascii", "replace"
                        )
                elif stype == b"stts":
                    cnt = u32(p)
                    stts = [
                        (u32(p + 4 + 8 * i), u32(p + 8 + 8 * i))
                        for i in range(cnt)
                    ]
                elif stype == b"stss":
                    cnt = u32(p)
                    stss = {u32(p + 4 + 4 * i) for i in range(cnt)}
                elif stype == b"stsc":
                    cnt = u32(p)
                    stsc = [
                        (u32(p + 4 + 12 * i), u32(p + 8 + 12 * i))
                        for i in range(cnt)
                    ]
                elif stype == b"stsz":
                    stsz_uniform = u32(p)
                    cnt = u32(p + 4)
                    if stsz_uniform == 0:
                        stsz_sizes = [u32(p + 8 + 4 * i) for i in range(cnt)]
                    else:
                        stsz_sizes = [stsz_uniform] * cnt
                elif stype in (b"stco", b"co64"):
                    cnt = u32(p)
                    if stype == b"stco":
                        stco = [u32(p + 4 + 4 * i) for i in range(cnt)]
                    else:
                        stco = [
                            int.from_bytes(
                                payload[p + 4 + 8 * i : p + 12 + 8 * i], "big"
                            )
                            for i in range(cnt)
                        ]
            if not (stts and stsc and stco and stsz_sizes):
                raise ValueError("video stbl missing stts/stsc/stsz/stco")
            n_samples = len(stsz_sizes)
            # decode timestamps from the stts run-length pairs
            times: list[int] = []
            t = 0
            for count, delta in stts:
                for _ in range(count):
                    if len(times) >= n_samples:
                        break
                    times.append(t)
                    t += delta
            if len(times) < n_samples:
                raise ValueError("stts covers fewer samples than stsz")
            # sample → (offset, size) via the stsc chunk runs
            offsets: list[int] = []
            si = 0
            for run_idx, (first_chunk, per_chunk) in enumerate(stsc):
                last_chunk = (
                    stsc[run_idx + 1][0] - 1
                    if run_idx + 1 < len(stsc)
                    else len(stco)
                )
                for chunk in range(first_chunk, last_chunk + 1):
                    if si >= n_samples:
                        break
                    base = stco[chunk - 1]
                    off = base
                    for _ in range(per_chunk):
                        if si >= n_samples:
                            break
                        offsets.append(off)
                        off += stsz_sizes[si]
                        si += 1
            if len(offsets) < n_samples:
                raise ValueError("stsc/stco cover fewer samples than stsz")
            samples = [
                (
                    times[i],
                    offsets[i],
                    stsz_sizes[i],
                    stss is None or (i + 1) in stss,
                )
                for i in range(n_samples)
            ]
            return codec, timescale, duration or 0, samples
    return None


def sample_frames(
    media: DataFrame,
    every_n_seconds: int = 5,
    strict: bool = False,
) -> DataFrame:
    """Materialize `frame_sample_plan`'s timestamps into actual frames:
    for each MP4/MOV payload, walk the video track's sample table, pick
    — per sampled timestamp — the latest KEYFRAME at or before it (stss;
    a table without stss marks every sample sync), and extract that
    sample's bytes from the payload. Still-image codecs (MJPEG / PNG-in-
    MP4 — the shape screen-capture and camera pipelines emit) parse
    header-level dimensions via `image_header` with no codec library
    (decode_ok); FULL pixel decode dispatches to PIL when importable
    (pixels_ok), and in codec-less environments the extracted still
    passes through unchanged with pixels_ok=False — or strict=True
    raises — the same honest contract as `resize_images`. Compressed
    inter-frame codecs (avc1/hevc) extract their sync-sample bytes with
    decode_ok=False: NAL reassembly is a real codec's job, and reporting
    a parsed-looking frame would be a lie.

    Scale: one Arrow-batched mapInPandas pass; each row emits only its
    sampled frames' bytes (seconds-apart keyframes), never the payload —
    output is a small fraction of input for any real video corpus."""

    def run(batches: Iterator) -> Iterator:
        import io as _io

        import pandas as pd

        try:
            from PIL import Image

            have_pil = True
        except Exception:
            have_pil = False
        if strict and not have_pil:
            raise NotImplementedError(
                "frame pixel decode needs a codec library (PIL); run "
                "strict=False for header-parse + pass-through plumbing"
            )
        cols = [
            "media_id", "frame_ts_s", "sample_idx", "codec", "frame_bytes",
            "format", "width", "height", "decode_ok", "pixels_ok",
        ]
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                bad = {
                    "media_id": media_id, "frame_ts_s": None,
                    "sample_idx": None, "codec": None, "frame_bytes": None,
                    "format": None, "width": None, "height": None,
                    "decode_ok": False, "pixels_ok": False,
                }
                try:
                    table = _mp4_sample_table(raw)
                except ValueError:
                    if strict:
                        raise
                    out.append(bad)
                    continue
                if table is None:
                    if strict:
                        raise NotImplementedError(
                            "frame sampling implemented for ISO-BMFF "
                            "(MP4/MOV) containers only"
                        )
                    out.append(bad)
                    continue
                codec, timescale, duration, samples = table
                dur_s = duration / timescale if timescale else 0.0
                n_frames = max(1, int(dur_s / every_n_seconds))
                for k in range(n_frames):
                    ts = float(k * every_n_seconds)
                    target = int(ts * timescale)
                    idx = 0
                    for i, (t, _o, _s, _k) in enumerate(samples):
                        if t <= target:
                            idx = i
                        else:
                            break
                    while idx > 0 and not samples[idx][3]:
                        idx -= 1  # snap back to the latest keyframe
                    _t, off, size, _sync = samples[idx]
                    frame = raw[off : off + size]
                    row = dict(
                        bad,
                        frame_ts_s=ts,
                        sample_idx=idx,
                        codec=codec,
                        frame_bytes=frame,
                    )
                    if len(frame) == size:
                        try:
                            header = image_header(frame)
                        except ValueError:
                            header = None
                        if header is not None:
                            fmt, w, h = header
                            row.update(
                                format=fmt, width=w, height=h, decode_ok=True
                            )
                            if have_pil:
                                try:
                                    img = Image.open(_io.BytesIO(frame))
                                    img.load()
                                    row.update(
                                        width=img.width,
                                        height=img.height,
                                        pixels_ok=True,
                                    )
                                except Exception:
                                    if strict:
                                        raise
                    elif strict:
                        raise ValueError(
                            "sample byte range extends past the payload"
                        )
                    out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return media.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


# --- audio ------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = (
    "media_id long, mime string, n_bytes long, format string, "
    "sample_rate int, channels int, bits_per_sample int, duration_s double, "
    "decode_ok boolean"
)


# MPEG audio bitrate tables, kbps by bitrate index 1..14; key is
# (version-group, layer-group): V1 keeps per-layer tables, V2/V2.5 share
# one table for Layers II+III.
_MP3_BITRATES = {
    ("v1", 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("v1", 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("v1", 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("v2", 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("v2", 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
# sample rates by version bits (3=MPEG1, 2=MPEG2, 0=MPEG2.5) then rate index
_MP3_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


def _mp3_header(payload: bytes) -> tuple[str, int, int, int, float] | None:
    """MPEG-audio (MP3) duration via the frame-header walk: skip an ID3v2
    tag, parse the first frame header for version/layer/bitrate/rate/mode,
    then prefer the VBR tables (Xing/Info frame count, or VBRI) and fall
    back to the CBR byte formula audio_bytes*8/bitrate. Returns None when
    the payload is not MPEG audio; raises ValueError for recognized-but-
    malformed framing (ID3 tag with no sync, reserved indices)."""
    n = len(payload)
    start = 0
    tagged = payload[:3] == b"ID3"
    if tagged:
        if n < 10:
            raise ValueError("truncated ID3v2 tag")
        size = 0
        for byte in payload[6:10]:
            if byte & 0x80:
                raise ValueError("ID3v2 size is not syncsafe")
            size = (size << 7) | byte
        start = 10 + size
    # locate the frame sync: immediately after the tag (allowing a small
    # padding window), or at byte 0 for a bare stream
    sync = None
    for j in range(start, min(n - 3, start + 4096)):
        if payload[j] == 0xFF and (payload[j + 1] & 0xE0) == 0xE0:
            sync = j
            break
    if sync is None or (not tagged and sync != 0):
        if tagged:
            raise ValueError("ID3v2 tag without MPEG frame sync")
        return None
    h1, h2, h3 = payload[sync + 1], payload[sync + 2], payload[sync + 3]
    ver_bits = (h1 >> 3) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer_bits = (h1 >> 1) & 3  # 3=Layer I, 2=Layer II, 1=Layer III
    if ver_bits == 1 or layer_bits == 0:
        # NOT malformed MPEG audio — other formats share the 0xFFE sync
        # with these bit patterns (AAC/ADTS is 0xFFF with layer bits 00).
        # Unknown container, so strict mode raises NotImplementedError
        # instead of the file being misreported as corrupt MP3.
        return None
    bitrate_idx = h2 >> 4
    rate_idx = (h2 >> 2) & 3
    if bitrate_idx in (0, 15):
        raise ValueError("free-format/invalid MPEG bitrate index")
    if rate_idx == 3:
        raise ValueError("reserved MPEG sample-rate index")
    layer = 4 - layer_bits  # 1, 2, 3
    v1 = ver_bits == 3
    table = _MP3_BITRATES[
        ("v1" if v1 else "v2", layer if v1 else min(layer, 2))
    ]
    bitrate = table[bitrate_idx] * 1000
    sample_rate = _MP3_RATES[ver_bits][rate_idx]
    channels = 1 if (h3 >> 6) == 3 else 2
    if layer == 1:
        samples_per_frame = 384
    elif layer == 2 or v1:
        samples_per_frame = 1152
    else:
        samples_per_frame = 576  # MPEG2/2.5 Layer III
    # VBR: Xing/Info sits after the side info; VBRI at a fixed +32
    side = (17 if channels == 1 else 32) if v1 else (9 if channels == 1 else 17)
    frames = None
    xing_off = sync + 4 + side
    if payload[xing_off : xing_off + 4] in (b"Xing", b"Info"):
        if xing_off + 12 > n:
            raise ValueError("truncated Xing header")
        flags = int.from_bytes(payload[xing_off + 4 : xing_off + 8], "big")
        if flags & 0x1:
            frames = int.from_bytes(payload[xing_off + 8 : xing_off + 12], "big")
    vbri_off = sync + 4 + 32
    if frames is None and payload[vbri_off : vbri_off + 4] == b"VBRI":
        if vbri_off + 20 > n:
            raise ValueError("truncated VBRI header")
        frames = int.from_bytes(payload[vbri_off + 14 : vbri_off + 18], "big")
    if frames is not None:
        duration = frames * samples_per_frame / sample_rate
    else:
        # CBR byte formula: exact for a COMPLETE CBR stream, but — like
        # the OGG tail note above — it derives from the payload LENGTH,
        # so a head-probe or truncated payload yields a confidently
        # short duration with decode_ok=True. MP3 carries no declared
        # stream size to cross-check (unlike WAV's data chunk), so
        # truncation is undetectable here: feed full files.
        duration = (n - sync) * 8 / bitrate
    return ("mp3", sample_rate, channels, 0, duration)


def audio_header(payload: bytes) -> tuple[str, int, int, int, float] | None:
    """Parse (format, sample_rate, channels, bits_per_sample, duration_s)
    from an audio payload — pure Python, no codec library. REAL for
    WAV/RIFF (the fmt chunk is self-describing and duration is exactly
    data_size / byte_rate), MP3 (frame-header walk — CBR exact via the
    byte formula, VBR via the Xing/VBRI frame count), FLAC (the
    STREAMINFO block carries rate/channels/bits/total-samples exactly),
    and OGG Vorbis/Opus (codec id packet on the first page for
    rate/channels; duration from the LAST page's granule position —
    sample-exact, Opus pre-skip subtracted; note OGG therefore needs the
    file TAIL, not just a head probe — and CBR MP3 likewise needs the
    FULL payload: its duration is computed from the byte length, so a
    truncated payload reports a confidently short duration with
    decode_ok=True, undetectable because MP3 declares no stream size to
    cross-check). Returns None for unrecognized
    containers; raises ValueError for a recognized-but-malformed header
    (the caller maps that to decode_ok=False, distinct from "unknown
    format")."""
    n = len(payload)
    if payload[:4] == b"OggS":
        if n < 28:
            raise ValueError("truncated Ogg page header")
        nsegs = payload[26]
        body = 27 + nsegs
        pkt = payload[body : body + 19]
        if pkt[:7] == b"\x01vorbis":
            if len(pkt) < 16:
                raise ValueError("truncated Vorbis id header")
            fmt = "ogg_vorbis"
            channels = pkt[11]
            rate = int.from_bytes(pkt[12:16], "little")
            granule_rate, preskip = rate, 0
        elif pkt[:8] == b"OpusHead":
            if len(pkt) < 19:
                raise ValueError("truncated OpusHead")
            fmt = "ogg_opus"
            channels = pkt[9]
            preskip = int.from_bytes(pkt[10:12], "little")
            rate = int.from_bytes(pkt[12:16], "little")  # original input rate
            granule_rate = 48_000  # Opus granules are always 48 kHz
        else:
            raise ValueError("Ogg page without a Vorbis/Opus id header")
        if rate <= 0 or channels <= 0:
            raise ValueError("Ogg id header with zero rate/channels")
        # Forward page walk for the final granule: page size is
        # 27 + nsegs + sum(segment table), so every step lands on a real
        # page boundary. An rfind(b"OggS") shortcut is WRONG — compressed
        # page bodies can (and do) contain the capture pattern, yielding a
        # garbage granule with decode_ok=True.
        granule = None
        i = 0
        while i + 27 <= n and payload[i : i + 4] == b"OggS":
            segn = payload[i + 26]
            seg_table = payload[i + 27 : i + 27 + segn]
            if len(seg_table) < segn:
                break  # truncated tail: keep the last complete page's granule
            g = int.from_bytes(payload[i + 6 : i + 14], "little", signed=True)
            if g >= 0:  # -1 marks a page with no finished packet
                granule = g
            i += 27 + segn + sum(seg_table)
        if granule is None:
            raise ValueError("no Ogg page with a granule position")
        duration = max(granule - preskip, 0) / granule_rate
        return (fmt, rate, channels, 0, duration)
    if payload[:4] == b"fLaC":
        if n < 8 + 34:
            raise ValueError("truncated FLAC STREAMINFO")
        btype = payload[4] & 0x7F
        if btype != 0:
            raise ValueError("FLAC first metadata block is not STREAMINFO")
        si = payload[8:42]
        rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
        channels = ((si[12] >> 1) & 0x7) + 1
        bits = (((si[12] & 0x1) << 4) | (si[13] >> 4)) + 1
        total = ((si[13] & 0xF) << 32) | int.from_bytes(si[14:18], "big")
        if rate == 0:
            raise ValueError("FLAC STREAMINFO with zero sample rate")
        return ("flac", rate, channels, bits, total / rate)
    mp3 = _mp3_header(payload)
    if mp3 is not None:
        return mp3
    if n >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        fmt_fields = None
        data_size = None
        for cid, body, size in _riff_chunks(payload):
            if cid == b"fmt ":
                fmt_fields = _wav_fmt_fields(payload, body, size)
            elif cid == b"data":
                # size may legitimately exceed the buffer for a streamed
                # header probe; trust the declared size for duration
                data_size = size
        if fmt_fields is None or data_size is None:
            raise ValueError("WAV missing fmt or data chunk")
        _fmt_code, channels, rate, byte_rate, bits = fmt_fields
        if not (rate > 0 and channels and byte_rate):
            raise ValueError("WAV fmt chunk with zero rate/channels")
        return ("wav", rate, channels, bits or 0, data_size / byte_rate)
    return None


def _riff_chunks(payload: bytes):
    """Iterate RIFF chunks after the 12-byte RIFF/WAVE header as
    (chunk_id, body_offset, declared_size) — the shared walker behind
    `audio_header`'s WAV branch and `_wav_pcm_samples`. Chunks are
    word-aligned; a declared size past the buffer is yielded as-is (the
    caller decides whether to trust it — header probe — or clamp it —
    sample decode)."""
    n = len(payload)
    i = 12
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        yield cid, i + 8, size
        i = i + 8 + size + (size & 1)


def _wav_fmt_fields(
    payload: bytes, body: int, size: int
) -> tuple[int, int, int, int, int]:
    """(fmt_code, channels, rate, byte_rate, bits) from a fmt chunk body,
    validating the DECLARED size too — a fmt chunk claiming < 16 bytes
    would otherwise read the next chunk's header bytes as fields."""
    if size < 16 or body + 16 > len(payload):
        raise ValueError("truncated WAV fmt chunk")
    return (
        int.from_bytes(payload[body : body + 2], "little"),
        int.from_bytes(payload[body + 2 : body + 4], "little"),
        int.from_bytes(payload[body + 4 : body + 8], "little"),
        int.from_bytes(payload[body + 8 : body + 12], "little"),
        int.from_bytes(payload[body + 14 : body + 16], "little"),
    )


def audio_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Feature-extract an audio media table → AUDIO_FEATURES_SCHEMA, the
    audio twin of `decode_images`. WAV/MP3/FLAC/OGG headers decode for
    real (`audio_header`); unrecognized formats emit NULL features with
    decode_ok=False — or raise NotImplementedError when strict=True —
    keeping the plumbing (schema, Arrow batching, partitioning) identical
    to what a codec-enabled deployment would run."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for media_id, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"]
            ):
                payload = bytes(payload) if payload is not None else b""
                row = {
                    "media_id": media_id,
                    "mime": mime,
                    "n_bytes": len(payload),
                    "format": None,
                    "sample_rate": None,
                    "channels": None,
                    "bits_per_sample": None,
                    "duration_s": None,
                    "decode_ok": False,
                }
                try:
                    hdr = audio_header(payload)
                except ValueError:
                    hdr = None  # malformed known format: decode_ok stays False
                else:
                    if hdr is None and strict:
                        raise NotImplementedError(
                            "no pure-Python duration parse for this audio "
                            "container; install a codec library or run "
                            "strict=False"
                        )
                if hdr is not None:
                    fmt, rate, ch, bits, dur = hdr
                    row.update(
                        format=fmt,
                        sample_rate=rate,
                        channels=ch,
                        bits_per_sample=bits,
                        duration_s=float(dur),
                        decode_ok=True,
                    )
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "mime", "n_bytes", "format", "sample_rate",
                    "channels", "bits_per_sample", "duration_s", "decode_ok",
                ],
            )

    return media.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


# --- video ------------------------------------------------------------------

VIDEO_FEATURES_SCHEMA = (
    "media_id long, mime string, n_bytes long, format string, "
    "width int, height int, duration_s double, n_tracks int, "
    "decode_ok boolean"
)


def _mp4_boxes(buf: bytes, start: int, end: int):
    """Iterate ISO-BMFF boxes in buf[start:end) as (type, body_off, box_end).
    Handles 64-bit largesize (size==1) and to-end boxes (size==0); raises
    ValueError on impossible sizes so callers can flag malformed files."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(buf[i : i + 4], "big")
        btype = buf[i + 4 : i + 8]
        body = i + 8
        if size == 1:
            if i + 16 > end:
                raise ValueError("truncated largesize box")
            size = int.from_bytes(buf[i + 8 : i + 16], "big")
            body = i + 16
        elif size == 0:
            size = end - i
        # a declared size may exceed a header-probe buffer (mdat tail) —
        # clamp the body end; a size smaller than the box header itself is
        # structurally malformed
        if size < 8:
            raise ValueError(f"bad box size {size}")
        yield btype, body, min(i + size, end)
        i += size


def _ebml_vint(buf: bytes, i: int, keep_marker: bool = False):
    """Read one EBML variable-length integer at buf[i]. Element IDs keep
    the length-marker bit (keep_marker=True); sizes strip it, and an
    all-ones size means 'unknown' (returned as None — streamed Segments
    use it). Raises ValueError on truncation or a zero lead byte."""
    if i >= len(buf):
        raise ValueError("truncated EBML vint")
    b0 = buf[i]
    if b0 == 0:
        raise ValueError("invalid EBML vint lead byte 0x00")
    length, mask = 1, 0x80
    while not (b0 & mask):
        mask >>= 1
        length += 1
    if i + length > len(buf):
        raise ValueError("truncated EBML vint body")
    if keep_marker:
        return int.from_bytes(buf[i : i + length], "big"), i + length
    val = b0 & (mask - 1)
    for j in range(1, length):
        val = (val << 8) | buf[i + j]
    if val == (1 << (7 * length)) - 1:
        return None, i + length  # unknown size
    return val, i + length


def _ebml_elements(buf: bytes, start: int, end: int):
    """Iterate EBML child elements in buf[start:end) as
    (element_id, body_off, body_end). An unknown-size element extends to
    `end` (only legal for the last child at a level, e.g. Segment). A
    vint CUT by the end of the buffer ends iteration instead of raising —
    a header probe legitimately truncates mid-element (e.g. two bytes
    into a Cluster id) after Info/Tracks are already parsed; a zero lead
    byte is still malformed and propagates."""
    i = start
    while i < end:
        try:
            eid, j = _ebml_vint(buf, i, keep_marker=True)
            size, k = _ebml_vint(buf, j)
        except ValueError as e:
            if "truncated" in str(e):
                return
            raise
        if size is None:
            yield eid, k, end
            return
        yield eid, k, min(k + size, end)
        i = k + size


def _ebml_header(payload: bytes) -> tuple[str, int, int, float, int]:
    """Matroska/WebM probe: DocType from the EBML header picks the format;
    Segment→Info carries TimestampScale (ns/tick, default 1e6) and
    Duration (float ticks); Segment→Tracks→TrackEntry→Video carries
    PixelWidth/PixelHeight. Same header-probe contract as the MP4 walk."""
    n = len(payload)
    fmt = None
    width = height = 0
    n_tracks = 0
    timescale = 1_000_000  # ns per tick, Matroska default
    duration_ticks: float | None = None
    import struct as _struct

    for eid, body, bend in _ebml_elements(payload, 0, n):
        if eid == 0x1A45DFA3:  # EBML header
            for cid, cbody, cend in _ebml_elements(payload, body, bend):
                if cid == 0x4282:  # DocType
                    doctype = payload[cbody:cend].rstrip(b"\x00")
                    fmt = "webm" if doctype == b"webm" else "mkv"
        elif eid == 0x18538067:  # Segment
            for cid, cbody, cend in _ebml_elements(payload, body, bend):
                if cid == 0x1549A966:  # Info
                    for iid, ib, ie in _ebml_elements(payload, cbody, cend):
                        if iid == 0x2AD7B1:  # TimestampScale
                            timescale = int.from_bytes(payload[ib:ie], "big")
                        elif iid == 0x4489:  # Duration (float)
                            raw = payload[ib:ie]
                            if len(raw) == 4:
                                duration_ticks = _struct.unpack(">f", raw)[0]
                            elif len(raw) == 8:
                                duration_ticks = _struct.unpack(">d", raw)[0]
                            else:
                                raise ValueError(
                                    f"EBML Duration of {len(raw)} bytes"
                                )
                elif cid == 0x1654AE6B:  # Tracks
                    for tid, tb, te in _ebml_elements(payload, cbody, cend):
                        if tid != 0xAE:  # TrackEntry
                            continue
                        n_tracks += 1
                        for vid, vb, ve in _ebml_elements(payload, tb, te):
                            if vid != 0xE0:  # Video settings
                                continue
                            for pid, pb, pe in _ebml_elements(payload, vb, ve):
                                if pid == 0xB0:  # PixelWidth
                                    width = max(
                                        width,
                                        int.from_bytes(payload[pb:pe], "big"),
                                    )
                                elif pid == 0xBA:  # PixelHeight
                                    height = max(
                                        height,
                                        int.from_bytes(payload[pb:pe], "big"),
                                    )
    if fmt is None:
        # every real Matroska/WebM file writes a DocType; EBML magic with
        # vint-parseable garbage behind it is malformed, not an empty file
        raise ValueError("EBML stream without DocType")
    if timescale <= 0:
        raise ValueError("EBML TimestampScale of zero")
    duration_s = (duration_ticks or 0.0) * timescale / 1e9
    return (fmt, width, height, duration_s, n_tracks)


def video_header(payload: bytes) -> tuple[str, int, int, float, int] | None:
    """Parse (format, width, height, duration_s, n_tracks) from a video
    container header — pure Python, no codec library. REAL for MP4/MOV
    (ISO BMFF: mvhd carries timescale+duration, tkhd carries 16.16
    fixed-point track dimensions; presentation size = max over tracks,
    audio tracks being 0x0) and for MKV/WebM (EBML walk: DocType,
    Segment→Info duration × TimestampScale, Tracks→Video pixel
    dimensions). Returns None for unrecognized containers; raises
    ValueError for a recognized-but-malformed header.

    The parse only touches the byte ranges it addresses, so feeding it a
    HEADER PROBE (first N bytes, moov-before-mdat "faststart" files) works
    as long as moov — or the EBML Info/Tracks elements — is inside the
    probe."""
    n = len(payload)
    if payload[:4] == b"\x1a\x45\xdf\xa3":
        return _ebml_header(payload)
    if n >= 12 and payload[4:8] == b"ftyp":
        fmt = "mov" if payload[8:12] == b"qt  " else "mp4"
        timescale = duration = None
        width = height = 0
        n_tracks = 0
        for btype, body, bend in _mp4_boxes(payload, 0, n):
            if btype != b"moov":
                continue
            for ctype, cbody, cend in _mp4_boxes(payload, body, bend):
                if ctype == b"mvhd":
                    if cbody >= n:
                        raise ValueError("truncated mvhd header")
                    v = payload[cbody]
                    if v == 1:
                        if cbody + 32 > n:
                            raise ValueError("truncated mvhd v1")
                        timescale = int.from_bytes(
                            payload[cbody + 20 : cbody + 24], "big"
                        )
                        duration = int.from_bytes(
                            payload[cbody + 24 : cbody + 32], "big"
                        )
                    else:
                        if cbody + 20 > n:
                            raise ValueError("truncated mvhd v0")
                        timescale = int.from_bytes(
                            payload[cbody + 12 : cbody + 16], "big"
                        )
                        duration = int.from_bytes(
                            payload[cbody + 16 : cbody + 20], "big"
                        )
                elif ctype == b"trak":
                    n_tracks += 1
                    for ttype, tbody, _tend in _mp4_boxes(payload, cbody, cend):
                        if ttype != b"tkhd":
                            continue
                        if tbody >= n:
                            raise ValueError("truncated tkhd header")
                        v = payload[tbody]
                        off = tbody + (88 if v == 1 else 76)
                        if off + 8 > n:
                            raise ValueError("truncated tkhd")
                        w = int.from_bytes(payload[off : off + 4], "big") >> 16
                        h = int.from_bytes(payload[off + 4 : off + 8], "big") >> 16
                        width, height = max(width, w), max(height, h)
            if timescale is None:
                raise ValueError("moov without mvhd")
            if not timescale:
                raise ValueError("mvhd with zero timescale")
            return (fmt, width, height, (duration or 0) / timescale, n_tracks)
        raise ValueError("MP4 ftyp without moov in probe")
    return None


def video_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Feature-extract a video media table → VIDEO_FEATURES_SCHEMA — the
    video leg of the decode_images / audio_features triad. MP4/MOV headers
    decode for real (`video_header`); unrecognized containers emit NULL
    features with decode_ok=False, or raise NotImplementedError in strict
    mode. Same 100 TB plumbing: Arrow-batched mapInPandas, payload bytes
    never re-emitted, output rows are small fixed-width metadata that
    `frame_sample_plan` can consume for duration-driven frame expansion."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for media_id, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"]
            ):
                payload = bytes(payload) if payload is not None else b""
                row = {
                    "media_id": media_id,
                    "mime": mime,
                    "n_bytes": len(payload),
                    "format": None,
                    "width": None,
                    "height": None,
                    "duration_s": None,
                    "n_tracks": None,
                    "decode_ok": False,
                }
                try:
                    hdr = video_header(payload)
                except ValueError:
                    hdr = None
                else:
                    if hdr is None and strict:
                        raise NotImplementedError(
                            "no pure-Python header parse for this video "
                            "container; install a demuxer or run strict=False"
                        )
                if hdr is not None:
                    fmt, w, h, dur, ntr = hdr
                    row.update(
                        format=fmt,
                        width=w,
                        height=h,
                        duration_s=float(dur),
                        n_tracks=ntr,
                        decode_ok=True,
                    )
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "mime", "n_bytes", "format", "width",
                    "height", "duration_s", "n_tracks", "decode_ok",
                ],
            )

    return media.mapInPandas(run, schema=VIDEO_FEATURES_SCHEMA)


# --- resize ------------------------------------------------------------------

RESIZED_SCHEMA = (
    "media_id long, mime string, width int, height int, "
    "payload binary, resize_ok boolean"
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    strict: bool = False,
) -> DataFrame:
    """Resize an image media table to (width, height) → RESIZED_SCHEMA —
    the remaining verb of the decode / feature-extract / resize /
    frame-sample quartet. Real resampling dispatches to PIL when
    importable; in codec-less environments (this container) the payload
    passes through UNCHANGED with resize_ok=False — or strict=True raises
    — while the Spark-side plumbing is fully real: Arrow batch shapes,
    output schema, and the bounded-memory contract (each batch holds
    `spark.sql.execution.arrow.maxRecordsPerBatch` payloads; output
    payload bytes are proportional to the TARGET size under a real codec,
    so resize is the standard first step that makes a 100 TB image corpus
    tractable downstream)."""
    if width < 1 or height < 1:
        raise ValueError(f"target size must be positive, got {width}x{height}")

    def run(batches: Iterator) -> Iterator:
        import io as _io

        import pandas as pd

        try:
            from PIL import Image  # noqa: F401

            have_pil = True
        except Exception:
            have_pil = False
        if strict and not have_pil:
            raise NotImplementedError(
                "image resize needs a codec library (PIL); run strict=False "
                "for pass-through plumbing"
            )
        for pdf in batches:
            out = []
            for media_id, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"]
            ):
                raw = bytes(payload) if payload is not None else b""
                row = {
                    "media_id": media_id,
                    "mime": mime,
                    "width": width,
                    "height": height,
                    "payload": raw,
                    "resize_ok": False,
                }
                if have_pil:
                    try:
                        img = Image.open(_io.BytesIO(raw))
                        buf = _io.BytesIO()
                        img.resize((width, height)).save(
                            buf, format=img.format or "PNG"
                        )
                        row.update(payload=buf.getvalue(), resize_ok=True)
                    except Exception:
                        # undecodable payload: pass through with ok=False —
                        # unless strict, which must fail fast REGARDLESS of
                        # whether PIL is installed (same contract as
                        # decode_images; otherwise installing a codec would
                        # silently flip strict pipelines to pass-through)
                        if strict:
                            raise
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "mime", "width", "height", "payload",
                    "resize_ok",
                ],
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


# --- PCM audio features ------------------------------------------------------

PCM_FEATURES_SCHEMA = (
    "media_id long, mime string, n_samples long, rms double, peak double, "
    "zero_crossings long, clipped_frac double, decode_ok boolean"
)


def _wav_pcm_samples(payload: bytes):
    """Decode integer-PCM WAV sample data to a numpy float array in
    [-1, 1] (mono-mixed). Returns None for non-WAV/non-integer-PCM;
    raises ValueError for malformed WAV (same contract as audio_header).
    Pure numpy frombuffer — no codec library."""
    import numpy as np

    n = len(payload)
    if not (n >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"):
        return None
    fmt_fields = None
    data = None
    for cid, body, size in _riff_chunks(payload):
        if cid == b"fmt ":
            fmt_fields = _wav_fmt_fields(payload, body, size)
        elif cid == b"data":
            # clamp to the buffer: sample decode needs real bytes, unlike
            # the header probe's declared-size duration
            data = payload[body : body + min(size, n - body)]
    if fmt_fields is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    fmt_code, channels, _rate, _byte_rate, bits = fmt_fields
    if fmt_code != 1 or bits not in (8, 16, 32) or not channels:
        return None  # float/compressed/odd-width PCM: not handled here
    if bits == 8:  # 8-bit WAV is unsigned
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    else:
        dt = np.int16 if bits == 16 else np.int32
        usable = (len(data) // np.dtype(dt).itemsize) * np.dtype(dt).itemsize
        x = np.frombuffer(data[:usable], dtype=dt).astype(np.float64)
        x = x / float(2 ** (bits - 1))
    if channels > 1:
        usable = (len(x) // channels) * channels
        x = x[:usable].reshape(-1, channels).mean(axis=1)
    return x


def pcm_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Signal-level features over decodable integer-PCM WAV payloads —
    the feature-extraction stage past header parsing: RMS level, peak
    amplitude, zero-crossing count, and clipped-sample fraction (|x| ≥
    0.999), the standard cheap quality gates an audio-corpus pipeline
    runs (silence / clipping / DC detection) before expensive ASR.
    Non-PCM formats emit NULL features with decode_ok=False (strict
    raises NotImplementedError); malformed WAV is decode_ok=False
    without strict raising — same contract as the header decoders. Same
    100 TB plumbing: Arrow-batched mapInPandas, payloads never
    re-emitted, output is fixed-width metadata."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for media_id, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"]
            ):
                payload = bytes(payload) if payload is not None else b""
                row = {
                    "media_id": media_id,
                    "mime": mime,
                    "n_samples": None,
                    "rms": None,
                    "peak": None,
                    "zero_crossings": None,
                    "clipped_frac": None,
                    "decode_ok": False,
                }
                try:
                    x = _wav_pcm_samples(payload)
                except ValueError:
                    x = None  # malformed: decode_ok stays False
                else:
                    if x is None and strict:
                        raise NotImplementedError(
                            "no pure-Python PCM decode for this audio "
                            "payload; install a codec library or run "
                            "strict=False"
                        )
                if x is not None and len(x):
                    row.update(
                        n_samples=int(len(x)),
                        rms=float(np.sqrt(np.mean(x * x))),
                        peak=float(np.max(np.abs(x))),
                        zero_crossings=int(
                            np.count_nonzero(np.diff(np.signbit(x)))
                        ),
                        clipped_frac=float(
                            np.count_nonzero(np.abs(x) >= 0.999) / len(x)
                        ),
                        decode_ok=True,
                    )
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "mime", "n_samples", "rms", "peak",
                    "zero_crossings", "clipped_frac", "decode_ok",
                ],
            )

    return media.mapInPandas(run, schema=PCM_FEATURES_SCHEMA)


# --- synthetic container builder --------------------------------------------

#: ISO-BMFF unity transformation matrix (mvhd/tkhd): fixed-point
#: [0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000]
_MP4_IDENTITY_MATRIX = b"".join(
    v.to_bytes(4, "big")
    for v in (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
)


def build_keyframe_mp4(
    frame_payloads: list[bytes],
    frame_seconds: int = 5,
    timescale: int = 600,
    codec: bytes = b"raw ",
) -> bytes:
    """Deterministic ISO-BMFF (MP4) container holding `frame_payloads` as
    the video track's samples, one every `frame_seconds`, all sync
    (no stss → every sample is a keyframe). Single chunk; full
    stsd/stts/stsc/stsz/stco sample table — exactly the shape
    `sample_frames` walks. The fixture/synthetic-data complement of the
    parser: build_keyframe_mp4 → sample_frames must round-trip the
    payload bytes, which the media_frame_knn registry query pins
    cross-engine (the oracle recomputes the expected frame bytes
    analytically — a wrong stco offset or stsz size shows up as a hash
    mismatch, not a silent garbage frame)."""
    if not frame_payloads:
        raise ValueError("at least one frame payload required")

    def box(t: bytes, b: bytes) -> bytes:
        return (len(b) + 8).to_bytes(4, "big") + t + b

    def full(t: bytes, b: bytes) -> bytes:
        return box(t, b"\x00\x00\x00\x00" + b)

    n = len(frame_payloads)
    delta = frame_seconds * timescale
    duration = n * delta
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isom")
    mdat = box(b"mdat", b"".join(frame_payloads))
    chunk_off = len(ftyp) + 8  # samples start right after mdat's header
    mdhd = full(
        b"mdhd",
        (0).to_bytes(4, "big") * 2
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + (0x55C4).to_bytes(2, "big")
        + b"\x00\x00",
    )
    hdlr = full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
    stsd = full(b"stsd", (1).to_bytes(4, "big") + box(codec, b"\x00" * 70))
    stts = full(
        b"stts",
        (1).to_bytes(4, "big") + n.to_bytes(4, "big") + delta.to_bytes(4, "big"),
    )
    stsc = full(
        b"stsc",
        (1).to_bytes(4, "big")
        + (1).to_bytes(4, "big") + n.to_bytes(4, "big") + (1).to_bytes(4, "big"),
    )
    stsz = full(
        b"stsz",
        (0).to_bytes(4, "big")
        + n.to_bytes(4, "big")
        + b"".join(len(p).to_bytes(4, "big") for p in frame_payloads),
    )
    stco = full(b"stco", (1).to_bytes(4, "big") + chunk_off.to_bytes(4, "big"))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    # mvhd/tkhd are MANDATORY ISO-BMFF boxes — without them the package's
    # OWN video_header rejects the container ('moov without mvhd') and
    # video_features reports decode_ok=False for files this module built.
    # Both sit AFTER mdat in the byte stream, so adding them shifts no
    # stco sample offset. Version-0 layouts; width/height 0 (the payloads
    # are opaque bytes, not coded video).
    mvhd = full(
        b"mvhd",
        (0).to_bytes(4, "big") * 2              # creation/modification
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + (0x00010000).to_bytes(4, "big")       # rate 1.0
        + (0x0100).to_bytes(2, "big")           # volume 1.0
        + b"\x00" * 10                          # reserved
        + _MP4_IDENTITY_MATRIX
        + b"\x00" * 24                          # pre_defined
        + (2).to_bytes(4, "big"),               # next_track_ID
    )
    tkhd = full(
        b"tkhd",
        (0).to_bytes(4, "big") * 2              # creation/modification
        + (1).to_bytes(4, "big")                # track_ID
        + b"\x00" * 4                           # reserved
        + duration.to_bytes(4, "big")
        + b"\x00" * 8                           # reserved
        + b"\x00" * 8                           # layer/alt_group/volume/rsvd
        + _MP4_IDENTITY_MATRIX
        + (0).to_bytes(4, "big") * 2,           # width/height (16.16)
    )
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def build_pcm_wav(
    samples: list[int],
    rate: int = 8000,
    channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Deterministic integer-PCM WAV container for `samples` (signed
    int16 when bits=16, unsigned bytes when bits=8) — the audio
    complement of `build_keyframe_mp4`: build_pcm_wav → audio_header /
    _wav_pcm_samples must round-trip exactly, which the audio_clip_knn
    registry query pins cross-engine (the oracle recomputes the sample
    values analytically, so a wrong fmt field, byte order, or data
    offset shows up as a hash mismatch). Interleave multi-channel input
    yourself (frame-major), exactly as a real WAV stores it."""
    import struct as _struct

    if bits not in (8, 16):
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    if channels < 1:
        raise ValueError("channels must be >= 1")
    if bits == 8:
        data = bytes(s & 0xFF for s in samples)
    else:
        data = b"".join(_struct.pack("<h", s) for s in samples)
    block_align = channels * bits // 8
    byte_rate = rate * block_align
    fmt = _struct.pack(
        "<HHIIHH", 1, channels, rate, byte_rate, block_align, bits
    )
    return (
        b"RIFF"
        + _struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + _struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + _struct.pack("<I", len(data))
        + data
    )


PCM_PROFILE_SCHEMA = (
    "media_id long, mime string, n_samples long, profile array<double>, "
    "decode_ok boolean"
)


def pcm_segment_profile(media: DataFrame, n_segments: int = 8) -> DataFrame:
    """FIXED-WIDTH audio feature vector per clip: the loudness envelope —
    mono-mixed samples split into `n_segments` equal spans (floor
    boundaries s·n//S), each emitting Σ|x_i| — the cheap audio
    fingerprint that feeds the similarity layer the way byte histograms
    do for video stills (media_frame_knn). Exactness contract: for
    integer PCM each |x_i| is k/2^(bits-1) with small k, so every
    partial sum is exactly representable and the profile is
    BIT-IDENTICAL regardless of summation order — a DuckDB oracle
    recomputes it from integer sums. Undecodable payloads emit a NULL
    profile with decode_ok=False (same contract as pcm_features). Same
    100 TB plumbing: one Arrow-batched mapInPandas pass, payloads never
    re-emitted, output is media_id + n_segments doubles."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for media_id, payload, mime in zip(
                pdf["media_id"], pdf["payload"], pdf["mime"]
            ):
                payload = bytes(payload) if payload is not None else b""
                row = {
                    "media_id": media_id,
                    "mime": mime,
                    "n_samples": None,
                    "profile": None,
                    "decode_ok": False,
                }
                try:
                    x = _wav_pcm_samples(payload)
                except ValueError:
                    x = None
                if x is not None and len(x):
                    n = len(x)
                    ax = np.abs(x)
                    row.update(
                        n_samples=int(n),
                        profile=[
                            float(
                                ax[s * n // n_segments : (s + 1) * n // n_segments].sum()
                            )
                            for s in range(n_segments)
                        ],
                        decode_ok=True,
                    )
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "mime", "n_samples", "profile", "decode_ok",
                ],
            )

    return media.mapInPandas(run, schema=PCM_PROFILE_SCHEMA)
