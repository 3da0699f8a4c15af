"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus a typed metadata struct —
the lake-table schema, partitioning, and UDF batch shapes are real and
tested; the *codec* step is stubbed because no image/audio libraries exist
in this container. Each stub is an Arrow-batched ``mapInPandas`` with the
exact signature a real decoder would have: swap the marked function body
for PIL/torchaudio/ffmpeg and nothing else changes.

Scale notes: binary payloads dominate row size, so media tables bucket by
asset id and transforms run ``mapInPandas`` with small
``spark.sql.execution.arrow.maxRecordsPerBatch`` (payload bytes, not row
count, bound Arrow batch memory). Metadata-only queries never touch the
blob column — parquet column pruning skips the bytes entirely (verify with
``.explain``: ReadSchema excludes ``data``).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("data", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

# Deterministic fake codec: a "media file" is a 16-byte header
#   magic(4s) width(i) height(i) duration_ms(i)   (little-endian)
# followed by payload bytes. Lets tests exercise real decode plumbing
# (header parse, feature extraction, batch shapes) with zero native deps.
_MAGIC = b"ETLM"
_HDR_FMT = "<4siii"  # magic, width, height, duration_ms
_HDR_SIZE = struct.calcsize(_HDR_FMT)


def pack_fake_media(width: int, height: int, duration_ms: int, payload: bytes) -> bytes:
    return struct.pack(_HDR_FMT, _MAGIC, width, height, duration_ms) + payload


def synthesize_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic tiny media table for tests/benches (no external data)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = (int(rng.integers(8, 64)), int(rng.integers(8, 64))) if kind != "audio" else (0, 0)
        dur = int(rng.integers(100, 10_000)) if kind != "image" else 0
        payload = rng.integers(0, 256, size=int(rng.integers(16, 256)), dtype=np.uint8).tobytes()
        rows.append(
            (
                f"asset{i:06d}",
                kind,
                {"image": "image/fake", "audio": "audio/fake", "video": "video/fake"}[kind],
                pack_fake_media(w, h, dur, payload),
                (w, h, dur, len(payload) + _HDR_SIZE),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_media_meta(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Parse the media header out of the binary column (decode step).

    Arrow-batched mapInPandas — the per-batch body is where a real decoder
    (PIL.Image.open / soundfile.read) plugs in. Output adds
    ``decoded_width/decoded_height/decoded_duration_ms/payload_bytes``."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("decoded_width", T.IntegerType()),
            T.StructField("decoded_height", T.IntegerType()),
            T.StructField("decoded_duration_ms", T.IntegerType()),
            T.StructField("payload_bytes", T.LongType()),
        ]
    )

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct as _st

        hdr_fmt, magic = _HDR_FMT, _MAGIC
        hdr_size = _st.calcsize(hdr_fmt)
        for b in batches:
            widths, heights, durs, sizes = [], [], [], []
            for blob in b[data_col]:
                if blob is None or len(blob) < hdr_size or bytes(blob[:4]) != magic:
                    widths.append(None); heights.append(None)
                    durs.append(None); sizes.append(None)
                    continue
                _, w, h, d = _st.unpack(hdr_fmt, bytes(blob[:hdr_size]))
                widths.append(w); heights.append(h); durs.append(d)
                sizes.append(len(blob) - hdr_size)
            b = b.assign(
                decoded_width=widths,
                decoded_height=heights,
                decoded_duration_ms=durs,
                payload_bytes=sizes,
            )
            yield b

    import pandas as pd  # noqa: F401  (executor-side import)

    return df.mapInPandas(fn, out_schema)


def extract_features(df: DataFrame, data_col: str = "data", n_features: int = 8) -> DataFrame:
    """Feature-extraction stub: deterministic byte-histogram features from
    the payload (a real pipeline would run a vision/audio encoder here —
    same mapInPandas shape, output array<float> column)."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    hdr_size = _HDR_SIZE

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for b in batches:
            feats = []
            for blob in b[data_col]:
                if blob is None or len(blob) <= hdr_size:
                    feats.append(None)
                    continue
                arr = np.frombuffer(bytes(blob[hdr_size:]), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=n_features, range=(0, 256))
                total = hist.sum() or 1
                feats.append((hist / total).astype(np.float32).tolist())
            yield b.assign(features=feats)

    import pandas as pd  # noqa: F401

    return df.mapInPandas(fn, out_schema)


def resize_image(df: DataFrame, width: int, height: int, data_col: str = "data") -> DataFrame:
    """Image resize — STUB. Real implementation requires an image library
    not present in this container; the Spark-side contract (mapInPandas over
    binary, returns same schema with replaced payload + updated meta) is
    what this function documents."""
    raise NotImplementedError(
        "image decode libraries are not available in this environment; "
        "plug PIL/opencv into the mapInPandas body — the plumbing "
        "(schema, Arrow batching, bucketing) is provided by this module"
    )


def sample_frames(df: DataFrame, every_ms: int, data_col: str = "data") -> DataFrame:
    """Video frame sampling — STUB (see resize_image)."""
    raise NotImplementedError(
        "video decode libraries are not available in this environment; "
        "plug ffmpeg/pyav into the mapInPandas body"
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only rollup: never reads the blob column (column pruning
    keeps the scan to the meta struct — check ReadSchema in explain)."""
    return (
        df.groupBy("kind")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("meta.n_bytes").alias("total_bytes"),
            F.avg("meta.duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )
