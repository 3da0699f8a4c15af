"""Stdlib JPEG header (metadata) parser — SOF marker scan.

The census/filter path of a 100-TB media table needs dimensions and
component counts, not pixels (``decode_media_meta`` feeds profiling,
size filters, and aspect-ratio buckets). JPEG stores those in the
frame-header (SOFn) segment, so a marker walk over the first few KB of
the blob yields them with zero native deps — the same design as
``operators.png``'s IHDR read, extended to JPEG's variable-length
segment framing (JFIF/EXIF/COM/DQT/DHT segments precede the SOF at
arbitrary offsets; ITU-T T.81 §B.2). Full pixel decode (entropy-coded
scan data) stays behind the soft-imported Pillow plug-point in
``operators.multimodal`` — out of scope per VERDICT r4 #2.

Reference parity: the Go reference has no media handling at all; this
module belongs to the engine's multimodal extension family
(SURVEY.md "LLM-data-pipeline operators").
"""

from __future__ import annotations

import struct

# Marker map (ITU-T T.81 Table B.1). SOF markers are 0xC0-0xCF minus
# DHT (0xC4), JPG (0xC8, reserved) and DAC (0xCC); SOF0 = baseline DCT,
# SOF2 = progressive DCT — together >99% of JPEGs in the wild.
_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
# Standalone markers carry NO length field: TEM, RST0-7, SOI, EOI.
_STANDALONE = frozenset({0x01, *range(0xD0, 0xD8), 0xD8, 0xD9})


def is_jpeg(raw: bytes) -> bool:
    """Sniff the SOI marker + a following marker byte (``FF D8 FF``) —
    the standard magic prefix shared by JFIF, EXIF and raw JPEG."""
    return len(raw) >= 3 and raw[:3] == b"\xff\xd8\xff"


def jpeg_meta(raw: bytes) -> tuple[int, int, int]:
    """Scan the segment chain for the first SOFn marker and return
    ``(width, height, n_components)``.

    Walks ``FF marker [len16 payload]`` segments from the SOI, skipping
    application (APPn), comment (COM), quantization/huffman table and
    any other variable-length segments by their declared big-endian
    length, tolerating marker fill bytes (``FF FF ... marker``, §B.1.1.2).
    Stops at SOS/EOI (no SOF seen ⇒ malformed). Raises ``ValueError``
    on anything structurally invalid — callers that must degrade to a
    null row (``decode_media_meta``) catch it; nothing partial is ever
    returned.
    """
    if not is_jpeg(raw):
        raise ValueError("not a JPEG: missing SOI magic")
    n = len(raw)
    i = 2  # past SOI
    while i + 1 < n:
        if raw[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        # optional fill bytes: any number of 0xFF before the marker id
        j = i + 1
        while j < n and raw[j] == 0xFF:
            j += 1
        if j >= n:
            break
        marker = raw[j]
        i = j + 1
        if marker == 0xD9:  # EOI before any SOF
            break
        if marker in _STANDALONE:
            continue
        if i + 2 > n:
            raise ValueError("truncated segment length")
        (seg_len,) = struct.unpack(">H", raw[i : i + 2])
        if seg_len < 2:
            raise ValueError(f"invalid segment length {seg_len}")
        if marker in _SOF_MARKERS:
            # SOF payload: precision(1) height(2) width(2) ncomp(1)
            if seg_len < 8 or i + 8 > n:
                raise ValueError("truncated SOF segment")
            height, width = struct.unpack(">HH", raw[i + 3 : i + 7])
            ncomp = raw[i + 7]
            if width == 0 or ncomp == 0:
                # height 0 is legal pre-DNL; width/ncomp 0 are not
                raise ValueError("invalid SOF dimensions")
            return width, height, ncomp
        if marker == 0xDA:  # SOS without a prior SOF
            raise ValueError("SOS before SOF: malformed JPEG")
        i += seg_len
    raise ValueError("no SOF marker found")


def jpeg_header_fixture(
    width: int, height: int, comment: bytes = b"", n_components: int = 1
) -> bytes:
    """Deterministic structurally-valid JPEG *header stream* for tests
    and oracle fixtures: SOI + JFIF APP0 + COM(comment) + DQT stub +
    SOF0 + EOI. Exercises the real marker walk (variable-length segment
    skipping included) without entropy-coded scan data — this is a
    fixture for the METADATA path, not a decodable image (pixel decode
    is the Pillow plug-point). ``comment`` is capped at one COM segment
    (≤ 65533 bytes); dimensions must fit the 16-bit SOF fields."""
    if not (1 <= width <= 0xFFFF and 1 <= height <= 0xFFFF):
        raise ValueError("SOF dimensions are 16-bit: 1..65535")
    if len(comment) > 0xFFFD:
        raise ValueError("COM payload exceeds one segment (65533 bytes)")
    out = [b"\xff\xd8"]  # SOI
    jfif = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    out.append(b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif)
    if comment:
        out.append(b"\xff\xfe" + struct.pack(">H", len(comment) + 2) + comment)
    dqt = b"\x00" + bytes(64)  # table 0, all-zero stub (never dequantized)
    out.append(b"\xff\xdb" + struct.pack(">H", len(dqt) + 2) + dqt)
    comps = b"".join(
        struct.pack(">BBB", c + 1, 0x11, 0) for c in range(n_components)
    )
    sof = struct.pack(">BHHB", 8, height, width, n_components) + comps
    out.append(b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)
