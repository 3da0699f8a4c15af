"""spark-submit job: stdlib codecs + semantic dedup across REAL executor
JVM boundaries (driven by tests/test_spark_submit.py on
local-cluster[2,2,1024]). The PNG/WAV codec functions are factory-built
so cloudpickle ships them by value inside the mapInPandas closures;
this job proves that holds when executors are separate processes that
only have the --py-files zip."""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession


def main() -> None:
    spark = SparkSession.builder.getOrCreate()
    from etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_stats,
        resize_image,
    )
    from etl_spark.operators.png import decode_png, encode_png
    from etl_spark.operators.similarity import semantic_dedup
    from etl_spark.operators.wav import encode_wav

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    png = encode_png(img, filter_type="mixed")
    tone = (
        16384 * np.sin(2 * np.pi * 100 * np.arange(8000) / 8000)
    ).astype(np.int16)
    wav = encode_wav(tone, 8000)
    media = spark.createDataFrame(
        [
            ("img", "image", "image/png", png, (8, 8, 0, len(png))),
            ("aud", "audio", "audio/wav", wav, (0, 0, 1000, len(wav))),
        ],
        MEDIA_SCHEMA,
    ).repartition(2)
    r = {x["asset_id"]: x for x in resize_image(media, 4, 4).collect()}
    shape = decode_png(bytes(r["img"]["data"])).shape
    a = audio_stats(media).collect()[0]

    emb = spark.createDataFrame(
        [(i, np.eye(1, 8)[0].tolist()) for i in range(3)]
        + [(9, (-np.eye(1, 8)[0]).tolist())],
        ["vec_id", "embedding"],
    ).repartition(2)
    surv = sorted(
        x["vec_id"]
        for x in semantic_dedup(
            emb, n_clusters=1, threshold=0.9, centroids=np.eye(1, 8)
        ).collect()
    )
    ok = (
        shape == (4, 4)
        and abs(a["rms"] - 0.5 / np.sqrt(2)) < 0.01
        and surv == [0, 9]
    )
    print(
        "CODEC_JOB_OK"
        if ok
        else f"CODEC_JOB_FAIL shape={shape} rms={a['rms']} surv={surv}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
