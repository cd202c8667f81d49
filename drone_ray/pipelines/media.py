"""Multimodal columns: opaque binary payloads + typed metadata, processed by
actor-pool map_batches stages.

Three decode tiers, all behind one stage class:

* ``real=False`` (default) — deterministic fake decoder (content-hash
  projection): exercises the full Ray plumbing with zero dependencies.
* ``real=True`` with Pillow installed — actual pixel decode (import is
  guarded and attempted ONCE per actor in ``__init__``): grayscale
  thumbnail features + intrinsic dimensions.
* ``real=True`` without Pillow — pure-stdlib PNG pixel decode
  (:func:`decode_png_pixels`: zlib inflate + scanline unfilter, 8-bit
  gray/palette/RGB/RGBA), so the real tier has CI coverage in
  imaging-library-free containers; non-PNG payloads keep the honest
  NotImplementedError at the exact point the codec call would go.

Independent of all three, :func:`media_dims` parses intrinsic width/height
straight out of PNG/GIF/BMP/JPEG headers in pure stdlib python — real
metadata decode with no imaging library at all — and
:func:`media_metadata` exposes it as a stateless map_batches stage.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def media_dims(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) parsed from the container header — public
    file-format magic only (PNG IHDR, GIF logical screen descriptor, BMP
    info header, JPEG SOFn frame marker). None for unknown/truncated
    payloads. Pure stdlib: works in environments with no imaging library,
    which is what a metadata-profiling pass over 100 TB of crawl media
    wants anyway (headers only — never decode pixels to count them)."""
    p = payload or b""
    if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24 and p[12:16] == b"IHDR":
        w, h = struct.unpack(">II", p[16:24])
        return ("png", int(w), int(h))
    if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
        w, h = struct.unpack("<HH", p[6:10])
        return ("gif", int(w), int(h))
    if p[:2] == b"BM" and len(p) >= 26:
        w, h = struct.unpack("<ii", p[18:26])
        return ("bmp", int(w), abs(int(h)))  # h < 0 = top-down DIB
    if p[:2] == b"\xff\xd8":  # JPEG: scan segments for a frame header
        i = 2
        while i + 9 <= len(p):
            if p[i] != 0xFF:
                return None  # marker desync — corrupt
            # 0xFF fill bytes are legal padding before a marker (ITU T.81
            # §B.1.1.2): skip runs of 0xFF, then read the real marker byte
            j = i + 1
            while j < len(p) and p[j] == 0xFF:
                j += 1
            if j >= len(p):
                return None
            marker = p[j]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i = j + 1  # standalone markers carry no length field
                continue
            if marker in (0xDA, 0xD9):
                return None  # entropy-coded data / EOI before any SOF
            if j + 3 > len(p):
                return None
            seglen = struct.unpack(">H", p[j + 1 : j + 3])[0]
            # SOF0-15 except DHT/JPG/DAC (C4, C8, CC) carry dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if j + 8 <= len(p):
                    h, w = struct.unpack(">HH", p[j + 4 : j + 8])
                    return ("jpeg", int(w), int(h))
                return None
            i = j + 1 + seglen
    return None


# MPEG audio sample rates by version bits (11=MPEG1, 10=MPEG2, 00=MPEG2.5)
_MP3_SR = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def audio_info(payload: bytes) -> tuple[str, int, int, float | None] | None:
    """(format, sample_rate, channels, duration_seconds|None) parsed from
    audio container headers in pure stdlib — the audio twin of
    :func:`media_dims` (same 100-TB stance: profile headers, never decode
    samples). Covers the public header layouts of WAV (RIFF fmt/data
    chunks), FLAC (STREAMINFO metadata block), and MP3 (ID3v2 skip + first
    MPEG frame header; frame headers carry no total length, so duration is
    None). None for unknown/truncated payloads."""
    p = payload or b""
    if p[:4] == b"RIFF" and len(p) >= 12 and p[8:12] == b"WAVE":
        i, sr, ch, block_align, data_size = 12, None, None, None, None
        while i + 8 <= len(p):
            cid = p[i : i + 4]
            (clen,) = struct.unpack("<I", p[i + 4 : i + 8])
            if cid == b"fmt " and i + 22 <= len(p):
                _tag, ch, sr = struct.unpack("<HHI", p[i + 8 : i + 16])
                if i + 22 <= len(p):
                    (block_align,) = struct.unpack("<H", p[i + 20 : i + 22])
            elif cid == b"data":
                data_size = clen
            i += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
        if sr and ch:
            dur = (
                data_size / (sr * block_align)
                if data_size is not None and block_align
                else None
            )
            return ("wav", int(sr), int(ch), dur)
        return None
    if p[:4] == b"fLaC" and len(p) >= 42 and (p[4] & 0x7F) == 0:  # STREAMINFO first
        si = p[8:42]
        # bits: 20 sample rate | 3 channels-1 | 5 bps-1 | 36 total samples
        b = int.from_bytes(si[10:18], "big")
        sr = b >> 44
        ch = ((b >> 41) & 0x7) + 1
        total = b & ((1 << 36) - 1)
        if sr:
            return ("flac", int(sr), int(ch), (total / sr) if total else None)
        return None
    i = 0
    if p[:3] == b"ID3" and len(p) >= 10:  # ID3v2 tag: syncsafe 28-bit size
        i = 10 + (
            ((p[6] & 0x7F) << 21) | ((p[7] & 0x7F) << 14)
            | ((p[8] & 0x7F) << 7) | (p[9] & 0x7F)
        )
    if i + 4 <= len(p) and p[i] == 0xFF and (p[i + 1] & 0xE0) == 0xE0:
        version = (p[i + 1] >> 3) & 0x3
        layer = (p[i + 1] >> 1) & 0x3
        sr_idx = (p[i + 2] >> 2) & 0x3
        if version != 1 and layer != 0 and sr_idx != 3:
            sr = _MP3_SR[version][sr_idx]
            ch = 1 if (p[i + 3] >> 6) == 3 else 2
            return ("mp3", int(sr), int(ch), None)
    return None


def video_info(payload: bytes) -> tuple[str, float | None, int, int] | None:
    """(format, duration_seconds|None, width, height) parsed from video
    container headers in pure stdlib — completes the image/audio/video
    profiling trio. Covers the public ISO-BMFF (MP4/MOV) box layout: walks
    top-level boxes to ``moov``, reads ``mvhd`` (timescale + duration) and
    the first video ``tkhd`` (track width/height, 16.16 fixed point).
    WebM/Matroska is recognized by its EBML magic (format only — EBML
    varint walking is out of scope for a header pass). None otherwise."""
    p = payload or b""
    if p[:4] == b"\x1aE\xdf\xa3":  # EBML magic (WebM/MKV)
        return ("webm", None, 0, 0)
    if len(p) < 12 or p[4:8] != b"ftyp":
        return None
    fmt = "mp4"

    def boxes(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            (size,) = struct.unpack(">I", p[i : i + 4])
            btype = p[i + 4 : i + 8]
            body = i + 8
            if size == 1 and i + 16 <= hi:  # 64-bit largesize
                (size,) = struct.unpack(">Q", p[i + 8 : i + 16])
                body = i + 16
            if size == 0:
                size = hi - i  # box extends to end
            if size < 8 or i + size > hi:
                return
            yield btype, body, i + size
            i += size

    dur = None
    w = h = 0
    for btype, body, end in boxes(0, len(p)):
        if btype != b"moov":
            continue
        for ctype, cbody, cend in boxes(body, end):
            if ctype == b"mvhd" and cbody + 4 <= cend:
                ver = p[cbody]
                if ver == 1 and cbody + 28 <= cend:
                    ts, d = struct.unpack(">IQ", p[cbody + 20 : cbody + 32])
                elif ver == 0 and cbody + 20 <= cend:
                    ts, d = struct.unpack(">II", p[cbody + 12 : cbody + 20])
                else:
                    continue
                if ts:
                    dur = d / ts
            elif ctype == b"trak" and not (w and h):
                for ttype, tbody, tend in boxes(cbody, cend):
                    if ttype == b"tkhd" and tend - tbody >= 84:
                        tw, th = struct.unpack(">II", p[tend - 8 : tend])
                        if tw and th:  # audio tracks carry 0x0
                            w, h = tw >> 16, th >> 16
        return (fmt, dur, int(w), int(h))
    return (fmt, dur, int(w), int(h))


def _audio_metadata_batch(batch: pa.Table) -> pa.Table:
    payloads = batch["media"].to_pylist()
    fmts: list[str | None] = []
    srs, chs, durs, sizes = [], [], [], []
    for p in payloads:
        p = p or b""
        sizes.append(len(p))
        d = audio_info(p)
        if d is None:
            fmts.append(None), srs.append(None), chs.append(None), durs.append(None)
        else:
            fmts.append(d[0]), srs.append(d[1]), chs.append(d[2]), durs.append(d[3])
    cols = {name: batch[name] for name in batch.column_names if name != "media"}
    cols["n_bytes"] = pa.array(sizes, pa.int64())
    cols["format"] = pa.array(fmts, pa.string())
    cols["sample_rate"] = pa.array(srs, pa.int32())
    cols["channels"] = pa.array(chs, pa.int32())
    cols["duration_s"] = pa.array(durs, pa.float64())
    return pa.table(cols)


def _video_metadata_batch(batch: pa.Table) -> pa.Table:
    payloads = batch["media"].to_pylist()
    fmts: list[str | None] = []
    durs, ws, hs, sizes = [], [], [], []
    for p in payloads:
        p = p or b""
        sizes.append(len(p))
        d = video_info(p)
        if d is None:
            fmts.append(None), durs.append(None), ws.append(None), hs.append(None)
        else:
            fmts.append(d[0]), durs.append(d[1]), ws.append(d[2]), hs.append(d[3])
    cols = {name: batch[name] for name in batch.column_names if name != "media"}
    cols["n_bytes"] = pa.array(sizes, pa.int64())
    cols["format"] = pa.array(fmts, pa.string())
    cols["duration_s"] = pa.array(durs, pa.float64())
    cols["width"] = pa.array(ws, pa.int32())
    cols["height"] = pa.array(hs, pa.int32())
    return pa.table(cols)


def video_metadata(ds: Dataset, *, batch_size: int = 256) -> Dataset:
    """Header-only video profiling (format, duration_s, width, height,
    n_bytes) — stateless map_batches over (id, media: binary), NULLs for
    unrecognized payloads. Frame decode would follow the guarded-import
    pattern (ffmpeg/pyav) of MediaDecodeStub; the profiling pass needs no
    codec at any scale."""
    return ds.map_batches(_video_metadata_batch, batch_format="pyarrow", batch_size=batch_size)


def audio_metadata(ds: Dataset, *, batch_size: int = 256) -> Dataset:
    """Header-only audio profiling over a (id, media: binary) dataset:
    (format, sample_rate, channels, duration_s, n_bytes) per row, NULLs for
    unrecognized payloads. Stateless map_batches, same shape as
    :func:`media_metadata`. Sample DECODE (the ffmpeg tier) follows the
    guarded-import pattern of MediaDecodeStub when a codec library exists;
    header profiling is the pass that needs no library at any scale."""
    return ds.map_batches(_audio_metadata_batch, batch_format="pyarrow", batch_size=batch_size)


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type → samples/pixel


def decode_png_pixels(payload: bytes) -> tuple[np.ndarray, int, int] | None:
    """Pure-stdlib PNG pixel decode (zlib inflate + scanline unfilter) —
    the testable ``real=True`` tier for containers without an imaging
    library. Supports 8-bit non-interlaced grayscale / gray+alpha / RGB /
    RGBA / palette (the overwhelming majority of web PNGs); anything else
    returns None so callers can fall through to their stub/error path.

    Returns (grayscale float64 H×W in [0, 1], width, height). Grayscale is
    the ITU-R BT.601 luma (the same weights PIL's convert("L") uses), so a
    Pillow-present run and this path agree on features to rounding.
    """
    import zlib

    p = payload or b""
    if p[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(p):
        (length,) = struct.unpack(">I", p[pos : pos + 4])
        ctype = p[pos + 4 : pos + 8]
        data = p[pos + 8 : pos + 8 + length]
        if len(data) < length:
            return None  # truncated
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr[:13])
    if depth != 8 or interlace != 0 or comp != 0 or filt != 0 or color not in _PNG_CHANNELS:
        return None
    ch = _PNG_CHANNELS[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    # unfilter: each scanline is (filter_byte, stride bytes); filters are
    # defined on bytes with the per-pixel offset = channel count
    out = np.zeros((h, stride), dtype=np.uint8)
    raw_rows = np.frombuffer(raw[: h * (stride + 1)], dtype=np.uint8).reshape(h, stride + 1)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(raw_rows[y, 0])
        line = raw_rows[y, 1:].astype(np.int32)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up (vectorizable: depends only on prev row)
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = line.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 1:
                    cur[x] = (cur[x] + a) & 0xFF
                elif f == 3:
                    cur[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - ch] if x >= ch else 0
                    pp = a + b - c
                    pa_, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                    pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                    cur[x] = (cur[x] + pred) & 0xFF
        else:
            return None  # invalid filter byte
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, ch).astype(np.float64)
    if color == 3:  # palette lookup
        if plte is None:
            return None
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3).astype(np.float64)
        idx = px[:, :, 0].astype(np.int64)
        if idx.max(initial=0) >= pal.shape[0]:
            return None
        rgb = pal[idx]
        gray = rgb @ np.array([0.299, 0.587, 0.114])
    elif color in (0, 4):  # gray / gray+alpha (alpha ignored for features)
        gray = px[:, :, 0]
    else:  # RGB / RGBA
        gray = px[:, :, :3] @ np.array([0.299, 0.587, 0.114])
    return gray / 255.0, int(w), int(h)


def _block_mean_resize(gray: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    """Box-filter resample of an H×W array to (rows, cols) by averaging the
    pixels each output cell covers — stdlib/numpy stand-in for a thumbnail
    resize (exact for integer ratios, area-weighted otherwise)."""
    h, w = gray.shape
    rows, cols = shape
    ye = np.linspace(0, h, rows + 1).astype(np.int64)
    xe = np.linspace(0, w, cols + 1).astype(np.int64)
    outv = np.empty((rows, cols))
    for r in range(rows):
        y0, y1 = ye[r], max(ye[r] + 1, ye[r + 1])
        band = gray[y0:y1]
        for c in range(cols):
            x0, x1 = xe[c], max(xe[c] + 1, xe[c + 1])
            outv[r, c] = band[:, x0:x1].mean()
    return outv


class MediaDecodeStub:
    """Callable-class stage (one instance per actor). ``__init__`` does the
    once-per-actor setup — including the guarded Pillow import, so the
    try/except runs once per actor, never per batch; ``__call__`` processes
    one Arrow batch."""

    def __init__(self, feature_dim: int = 16, real: bool = False):
        self.feature_dim = feature_dim
        self.real = real
        # deterministic fake "decoder": a fixed projection seeded once
        self.proj = np.random.default_rng(42).standard_normal((32, feature_dim))
        self._pil = None
        if real:
            try:
                from PIL import Image as _Image  # guarded: not in this container

                self._pil = _Image
            except ImportError:
                self._pil = None

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.real:
            if self._pil is not None:
                return self._decode_pil(payload)[0]
            return self._decode_stdlib(payload)[0]
        digest = hashlib.blake2b(payload, digest_size=32).digest()
        raw = np.frombuffer(digest, dtype=np.uint8).astype(np.float64) / 255.0
        return raw @ self.proj

    def _feature_shape(self) -> tuple[int, int]:
        side = int(np.sqrt(self.feature_dim))
        return (side, side) if side * side == self.feature_dim else (self.feature_dim, 1)

    def _decode_stdlib(self, payload: bytes) -> tuple[np.ndarray, int, int]:
        """Real pixel decode without Pillow: the pure-stdlib PNG path
        (zlib unfilter). Non-PNG payloads keep the honest
        NotImplementedError at the exact point the codec call would go."""
        d = decode_png_pixels(payload)
        if d is None:
            raise NotImplementedError(
                "real media decode without Pillow supports 8-bit PNG only "
                "(stdlib zlib path); install PIL for other formats or use "
                "real=False"
            )
        gray, w, h = d
        feat = _block_mean_resize(gray, self._feature_shape()).reshape(-1)
        return feat[: self.feature_dim], w, h

    def _decode_pil(self, payload: bytes) -> tuple[np.ndarray, int, int]:
        """Actual pixel decode: grayscale thumbnail resampled to
        ``feature_dim`` cells, scaled to [0, 1] — (feature, width, height)."""
        import io

        img = self._pil.open(io.BytesIO(payload))
        w, h = img.size
        side = int(np.sqrt(self.feature_dim))
        shape = (side, side) if side * side == self.feature_dim else (self.feature_dim, 1)
        small = img.convert("L").resize(shape)
        feat = np.asarray(small, dtype=np.float64).reshape(-1) / 255.0
        return feat[: self.feature_dim], int(w), int(h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["media"].to_pylist()
        n = len(payloads)
        feats = np.zeros((n, self.feature_dim))
        widths = np.zeros(n, np.int32)
        heights = np.zeros(n, np.int32)
        sizes = np.zeros(n, np.int64)
        for i, p in enumerate(payloads):
            p = p or b""
            sizes[i] = len(p)
            if self.real and self._pil is not None:
                feats[i], widths[i], heights[i] = self._decode_pil(p)
            elif self.real:
                feats[i], widths[i], heights[i] = self._decode_stdlib(p)
            else:
                feats[i] = self._decode(p)
                # fake intrinsic dims derived deterministically from content
                h = hashlib.blake2b(p, digest_size=4).digest()
                widths[i] = 64 + h[0] % 192
                heights[i] = 64 + h[1] % 192
        cols = {name: batch[name] for name in batch.column_names if name != "media"}
        cols["n_bytes"] = pa.array(sizes, pa.int64())
        cols["width"] = pa.array(widths, pa.int32())
        cols["height"] = pa.array(heights, pa.int32())
        cols["feature"] = pa.array(feats.tolist(), pa.list_(pa.float64()))
        return pa.table(cols)


def media_features(
    ds: Dataset,
    *,
    feature_dim: int = 16,
    real: bool = False,
    concurrency: int = 2,
    batch_size: int = 64,
    num_cpus: float = 1,
) -> Dataset:
    """Actor-pool decode/feature-extract over a (id, media: binary) dataset.
    Small batch_size on purpose: binary rows are wide, so batch × concurrency
    must fit the worker heap (SURVEY-level memory note). ``real=True``
    decodes actual pixels (Pillow when present, stdlib PNG otherwise)."""
    return ds.map_batches(
        MediaDecodeStub,
        fn_constructor_kwargs={"feature_dim": feature_dim, "real": real},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def _metadata_batch(batch: pa.Table) -> pa.Table:
    payloads = batch["media"].to_pylist()
    fmts: list[str | None] = []
    ws, hs, sizes = [], [], []
    for p in payloads:
        p = p or b""
        sizes.append(len(p))
        d = media_dims(p)
        if d is None:
            fmts.append(None)
            ws.append(None)
            hs.append(None)
        else:
            fmts.append(d[0])
            ws.append(d[1])
            hs.append(d[2])
    cols = {name: batch[name] for name in batch.column_names if name != "media"}
    cols["n_bytes"] = pa.array(sizes, pa.int64())
    cols["format"] = pa.array(fmts, pa.string())
    cols["width"] = pa.array(ws, pa.int32())
    cols["height"] = pa.array(hs, pa.int32())
    return pa.table(cols)


def media_metadata(ds: Dataset, *, batch_size: int = 256) -> Dataset:
    """Header-only media profiling over a (id, media: binary) dataset:
    (format, width, height, n_bytes) per row, NULLs for unrecognized
    payloads. Stateless map_batches — no actor pool needed (no model, no
    codec): pure header parsing at memory-bandwidth speed, the right
    first pass over petabyte media corpora before any pixel decode."""
    return ds.map_batches(_metadata_batch, batch_format="pyarrow", batch_size=batch_size)
