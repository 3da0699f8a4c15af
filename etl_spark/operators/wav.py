"""Pure-stdlib WAV (RIFF/PCM) codec — the audio counterpart of
``operators.png``: one REAL compressed-container audio format that
works in environments without soundfile/PyAV (this container has
neither). 16-bit little-endian PCM, any channel count, per the RIFF
spec; everything else (float/ADPCM/24-bit, missing chunks) raises
``ValueError`` so the multimodal operators can fall through to their
soft-imported codec plug-points.

Built through a factory so the functions pickle BY VALUE into executor
closures (mapInPandas) — workers never need ``etl_spark`` importable
(same discipline as ``png._build_codec``)."""

from __future__ import annotations


def _build_codec():
    import struct

    def is_wav(raw: bytes) -> bool:
        return len(raw) >= 12 and raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"

    def decode_wav(raw: bytes):
        """WAV bytes -> (sample_rate, int16 ndarray of shape (n,) mono /
        (n, channels) multi-channel)."""
        import numpy as np

        if not is_wav(raw):
            raise ValueError("not a WAV (bad RIFF/WAVE header)")
        pos = 12
        fmt = None
        data = None
        while pos + 8 <= len(raw):
            cid = raw[pos:pos + 4]
            (size,) = struct.unpack("<I", raw[pos + 4:pos + 8])
            body = raw[pos + 8:pos + 8 + size]
            pos += 8 + size + (size & 1)  # chunks are word-aligned
            if cid == b"fmt ":
                if size < 16:
                    raise ValueError("truncated fmt chunk")
                (audio_format, channels, rate, _brate, _balign,
                 bits) = struct.unpack("<HHIIHH", body[:16])
                if audio_format != 1 or bits != 16:
                    raise ValueError(
                        f"unsupported WAV encoding (format={audio_format}, "
                        f"bits={bits}) — 16-bit PCM only"
                    )
                fmt = (channels, rate)
            elif cid == b"data":
                data = body
        if fmt is None or data is None:
            raise ValueError("truncated WAV (missing fmt/data chunk)")
        channels, rate = fmt
        samples = np.frombuffer(
            data[: (len(data) // (2 * channels)) * 2 * channels],
            dtype="<i2",
        )
        if channels > 1:
            samples = samples.reshape(-1, channels)
        return rate, samples

    def encode_wav(samples, sample_rate: int) -> bytes:
        """int16 ndarray (n,) or (n, channels) -> WAV bytes."""
        import numpy as np

        s = np.asarray(samples)
        if s.dtype != np.int16:
            raise ValueError(f"samples must be int16, got {s.dtype}")
        channels = 1 if s.ndim == 1 else s.shape[1]
        payload = s.astype("<i2").tobytes()
        block_align = 2 * channels
        fmt = struct.pack(
            "<HHIIHH", 1, channels, sample_rate,
            sample_rate * block_align, block_align, 16,
        )
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
            + (b"\x00" if len(payload) & 1 else b"")
        )
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    def wav_meta(raw: bytes):
        """(sample_rate, channels, n_samples, duration_ms) from the
        headers alone — no sample copy."""
        import struct as _st

        if not is_wav(raw):
            raise ValueError("not a WAV")
        pos = 12
        fmt = None
        n_bytes = None
        while pos + 8 <= len(raw):
            cid = raw[pos:pos + 4]
            (size,) = _st.unpack("<I", raw[pos + 4:pos + 8])
            if cid == b"fmt " and size >= 16:
                (_a, channels, rate, _b, balign, _bits) = _st.unpack(
                    "<HHIIHH", raw[pos + 8:pos + 24]
                )
                fmt = (channels, rate, balign)
            elif cid == b"data":
                n_bytes = size
            pos += 8 + size + (size & 1)
        if fmt is None or n_bytes is None:
            raise ValueError("truncated WAV")
        channels, rate, balign = fmt
        n = n_bytes // max(1, balign)
        return rate, channels, n, int(round(n * 1000 / max(1, rate)))

    return is_wav, decode_wav, encode_wav, wav_meta


is_wav, decode_wav, encode_wav, wav_meta = _build_codec()
