"""Pure-stdlib PNG codec (zlib + numpy filter reconstruction).

Makes one REAL compressed image format work in environments without
Pillow (this container has no codec libs): non-interlaced, 8-bit
greyscale / RGB / RGBA PNGs per the W3C PNG spec (RFC 2083) — signature,
IHDR/IDAT/IEND chunk walk, zlib inflate, and per-row filter
reconstruction (None/Sub/Up/Average/Paeth). The encoder writes
filter-0 rows by default and can apply any filter per row (used by
tests to exercise every decoder reconstruction path).

Not a general-purpose codec: palette (color type 3), 16-bit depth, and
Adam7 interlacing raise ``ValueError`` — the multimodal operators fall
back to the soft-imported Pillow path for anything this module refuses.
"""

from __future__ import annotations

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _build_codec():
    """Factory whose nested functions cloudpickle serializes BY VALUE:
    executor closures (mapInPandas in multimodal.py) can carry the codec
    without requiring ``etl_spark`` to be importable on the workers
    (same self-contained-closure discipline as every other operator —
    a driver outside the repo without --py-files still works)."""
    import struct
    import zlib

    signature = PNG_SIGNATURE
    channels_of = {0: 1, 2: 3, 6: 4}  # color type -> channels, 8-bit only

    def is_png(raw: bytes) -> bool:
        return raw[: len(signature)] == signature

    def paeth(a, b, c):
        """Paeth predictor over int arrays (vectorized)."""
        import numpy as np

        p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
        pa = np.abs(p - a)
        pb = np.abs(p - b)
        pc = np.abs(p - c)
        return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))

    def decode_png(raw: bytes):
        """PNG bytes -> uint8 ndarray of shape (h, w) for greyscale or
        (h, w, channels) for RGB/RGBA."""
        import numpy as np

        if not is_png(raw):
            raise ValueError("not a PNG (bad signature)")
        pos = len(signature)
        width = height = None
        channels = None
        idat = bytearray()
        while pos + 8 <= len(raw):
            (length,) = struct.unpack(">I", raw[pos:pos + 4])
            ctype = raw[pos + 4:pos + 8]
            data = raw[pos + 8:pos + 8 + length]
            pos += 12 + length  # length + type + data + crc
            if ctype == b"IHDR":
                (width, height, depth, color, _comp, _filt,
                 interlace) = struct.unpack(">IIBBBBB", data)
                if depth != 8:
                    raise ValueError(
                        f"unsupported PNG bit depth {depth} (8 only)"
                    )
                if color not in channels_of:
                    raise ValueError(
                        f"unsupported PNG color type {color} "
                        "(grey/RGB/RGBA only)"
                    )
                if interlace != 0:
                    raise ValueError("interlaced PNG not supported")
                channels = channels_of[color]
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
        if width is None or not idat:
            raise ValueError("truncated PNG (missing IHDR/IDAT)")
        stride = width * channels
        flat = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
        if flat.size != height * (stride + 1):
            raise ValueError("PNG pixel data size mismatch")
        rows = flat.reshape(height, stride + 1)
        filters = rows[:, 0]
        out = np.zeros((height, stride), dtype=np.uint8)
        bpp = channels
        for y in range(height):
            f = int(filters[y])
            cur = rows[y, 1:].astype(np.int32)
            prev = (
                out[y - 1].astype(np.int32)
                if y else np.zeros(stride, dtype=np.int32)
            )
            if f == 0:  # None
                rec = cur
            elif f == 1:  # Sub: per-lane prefix sum mod 256
                lanes = cur.reshape(-1, bpp)
                rec = np.cumsum(lanes, axis=0, dtype=np.int64).reshape(-1) % 256
            elif f == 2:  # Up
                rec = (cur + prev) % 256
            elif f == 3:  # Average: sequential left-dependency per lane
                rec = np.empty(stride, dtype=np.int32)
                rec[:bpp] = (cur[:bpp] + prev[:bpp] // 2) % 256
                for i in range(bpp, stride):
                    rec[i] = (cur[i] + (rec[i - bpp] + prev[i]) // 2) % 256
            elif f == 4:  # Paeth: sequential left-dependency per lane
                rec = np.empty(stride, dtype=np.int32)
                rec[:bpp] = (cur[:bpp] + paeth(
                    np.zeros(bpp, np.int32), prev[:bpp],
                    np.zeros(bpp, np.int32))) % 256
                for i in range(bpp, stride):
                    rec[i] = (
                        cur[i]
                        + int(paeth(
                            np.int32(rec[i - bpp]), np.int32(prev[i]),
                            np.int32(prev[i - bpp]),
                        ))
                    ) % 256
            else:
                raise ValueError(f"bad PNG filter type {f}")
            out[y] = rec.astype(np.uint8)
        img = out.reshape(height, width, channels)
        return img[:, :, 0] if channels == 1 else img

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def encode_png(img, filter_type=0, level: int = 6) -> bytes:
        """uint8 ndarray (h, w) / (h, w, 3) / (h, w, 4) -> PNG bytes.

        ``filter_type``: a fixed per-row filter 0-4, or ``"mixed"`` to
        cycle through all five (forward filtering uses original pixels,
        so every mode is pure vector math; decoders must reconstruct all
        of them — that is what the tests exercise)."""
        import numpy as np

        img = np.ascontiguousarray(img, dtype=np.uint8)
        if img.ndim == 2:
            h, w = img.shape
            channels, color = 1, 0
            flat = img.reshape(h, w)
        elif img.ndim == 3 and img.shape[2] in (3, 4):
            h, w, channels = img.shape
            color = 2 if channels == 3 else 6
            flat = img.reshape(h, w * channels)
        else:
            raise ValueError(f"unsupported image shape {img.shape}")
        stride = w * channels
        bpp = channels
        left = np.zeros((h, stride), dtype=np.int32)
        if stride > bpp:
            left[:, bpp:] = flat[:, :-bpp]
        up = np.zeros((h, stride), dtype=np.int32)
        up[1:] = flat[:-1]
        upleft = np.zeros((h, stride), dtype=np.int32)
        if stride > bpp:
            upleft[1:, bpp:] = flat[:-1, :-bpp]
        body = bytearray()
        for y in range(h):
            f = (y % 5) if filter_type == "mixed" else int(filter_type)
            cur = flat[y].astype(np.int32)
            if f == 0:
                enc = cur
            elif f == 1:
                enc = (cur - left[y]) % 256
            elif f == 2:
                enc = (cur - up[y]) % 256
            elif f == 3:
                enc = (cur - (left[y] + up[y]) // 2) % 256
            elif f == 4:
                enc = (cur - paeth(left[y], up[y], upleft[y])) % 256
            else:
                raise ValueError(f"bad PNG filter type {f}")
            body.append(f)
            body += enc.astype(np.uint8).tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (
            signature
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(body), level))
            + chunk(b"IEND", b"")
        )

    return is_png, decode_png, encode_png


is_png, decode_png, encode_png = _build_codec()
