"""Multimodal stub stage: real actor-pool plumbing over a binary column."""

import numpy as np
import pyarrow as pa
import pytest

from drone_ray.pipelines.media import MediaDecodeStub, media_features


def _media_ds(n=100):
    import ray.data as rd

    rng = np.random.default_rng(0)
    payloads = [rng.bytes(64 + int(i) % 512) for i in range(n)]
    return rd.from_arrow(
        pa.table({"id": np.arange(n, dtype=np.int64), "media": pa.array(payloads, pa.binary())})
    )


def test_media_features_schema_and_determinism():
    ds = _media_ds()
    out = media_features(ds, feature_dim=8, concurrency=2, batch_size=16).to_pandas()
    assert sorted(out.columns) == ["feature", "height", "id", "n_bytes", "width"]
    assert len(out) == 100
    assert all(len(f) == 8 for f in out["feature"])
    # deterministic: same payload → same features at different batch size
    out2 = media_features(_media_ds(), feature_dim=8, concurrency=1, batch_size=7).to_pandas()
    a = out.sort_values("id")["feature"].tolist()
    b = out2.sort_values("id")["feature"].tolist()
    assert np.allclose(np.array(a), np.array(b))


def test_real_decode_is_explicitly_stubbed():
    stub = MediaDecodeStub(real=True)
    with pytest.raises(NotImplementedError):
        stub._decode(b"payload")


def _png(w, h):
    """Minimal valid PNG, stdlib-only (zlib + struct + crc32)."""
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + bytes(w) for _ in range(h))  # filter 0 + zero rows
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_media_dims_header_parsers():
    import struct

    from drone_ray.pipelines.media import media_dims

    assert media_dims(_png(320, 200)) == ("png", 320, 200)
    gif = b"GIF89a" + struct.pack("<HH", 640, 480) + b"\x00" * 6
    assert media_dims(gif) == ("gif", 640, 480)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 800, -600) + b"\x00" * 10
    assert media_dims(bmp) == ("bmp", 800, 600)  # top-down DIB: |h|
    # JPEG: SOI, APP0 segment, DHT (must be skipped), SOF0 with dims
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
        + b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 600, 900)
        + b"\x00" * 4
    )
    assert media_dims(jpeg) == ("jpeg", 900, 600)
    assert media_dims(b"") is None
    assert media_dims(b"not an image at all") is None
    assert media_dims(b"\x89PNG\r\n\x1a\n\x00\x00") is None  # truncated


def test_media_metadata_stage():
    import ray.data as rd

    from drone_ray.pipelines.media import media_metadata

    payloads = [_png(10, 20), b"junk", _png(7, 7)]
    ds = rd.from_arrow(
        pa.table({"id": np.arange(3, dtype=np.int64), "media": pa.array(payloads, pa.binary())})
    )
    out = media_metadata(ds).to_pandas().sort_values("id").reset_index(drop=True)
    assert out["format"].tolist() == ["png", None, "png"]
    assert out["width"].tolist()[0] == 10 and out["height"].tolist()[0] == 20
    assert out["n_bytes"].tolist() == [len(p) for p in payloads]


def test_real_decode_with_pil_when_available():
    """Real pixel decode when Pillow exists; the stub contract otherwise.
    In this container PIL is absent, so the except branch is the one that
    runs — the try branch is exercised wherever Pillow is installed."""
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    stub = MediaDecodeStub(feature_dim=16, real=True)
    if has_pil:
        t = pa.table({"id": pa.array([1], pa.int64()), "media": pa.array([_png(32, 16)], pa.binary())})
        out = stub(t)
        assert out["width"].to_pylist() == [32]
        assert out["height"].to_pylist() == [16]
        assert len(out["feature"].to_pylist()[0]) == 16
    else:
        with pytest.raises(NotImplementedError):
            stub._decode(_png(8, 8))


def test_media_dims_jpeg_fill_bytes_and_sos():
    """ITU T.81 §B.1.1.2: 0xFF padding before a marker is legal; the scan
    must skip fill bytes instead of reading the 0xFF as a marker, and must
    stop at SOS/EOI rather than running into entropy-coded data."""
    import struct

    from drone_ray.pipelines.media import media_dims

    # fill bytes (0xFF 0xFF 0xFF) padding before the SOF0 marker
    jpeg_fill = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
        + b"\xff\xff\xff"  # legal padding run
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 123, 456)
        + b"\x00" * 4
    )
    assert media_dims(jpeg_fill) == ("jpeg", 456, 123)
    # SOS before any SOF: stop cleanly (None), never mis-read entropy data
    jpeg_sos = (
        b"\xff\xd8"
        + b"\xff\xda" + struct.pack(">H", 4) + b"\x00\x00"
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 1, 2)
    )
    assert media_dims(jpeg_sos) is None
    # EOI immediately: None, no crash
    assert media_dims(b"\xff\xd8\xff\xd9") is None
    # trailing fill bytes then truncation: None, no IndexError
    assert media_dims(b"\xff\xd8\xff\xff\xff\xff\xff\xff\xff\xff") is None
