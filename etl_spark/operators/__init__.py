from etl_spark.operators.mapping import (
    concat_fields,
    field_map,
    include_exclude_extra,
    lowercase_columns,
    trim_string_values,
    uppercase_string_values,
)
from etl_spark.operators.reshape import kv_unpivot, multi_mapping
from etl_spark.operators.filters import isin_filter, required_fields, validator_split
from etl_spark.operators.coerce import coerce_to_schema
from etl_spark.operators.lookup import lookup_in
from etl_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
    simhash_pairs_from_fingerprints,
    simhash_signatures_pandas,
    md5_shingle_hashes,
)
from etl_spark.operators.multimodal import (
    audio_stats,
    decode_media_meta,
    extract_features,
    media_stats,
    resize_image,
    sample_frames,
    synthesize_media_df,
)
from etl_spark.operators.png import decode_png, encode_png, is_png
from etl_spark.operators.temporal import asof_join, interval_join, scd2_history
from etl_spark.operators.wav import decode_wav, encode_wav, is_wav, wav_meta
from etl_spark.operators.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
    cluster_embeddings,
    ivf_topk,
    lsh_topk,
    semantic_dedup,
)

__all__ = [
    "field_map",
    "concat_fields",
    "lowercase_columns",
    "uppercase_string_values",
    "trim_string_values",
    "include_exclude_extra",
    "kv_unpivot",
    "multi_mapping",
    "isin_filter",
    "required_fields",
    "validator_split",
    "coerce_to_schema",
    "lookup_in",
    "exact_dedup",
    "minhash_signature",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_neardup_pairs",
    "simhash_pairs_from_fingerprints",
    "simhash_signatures_pandas",
    "md5_shingle_hashes",
    "brute_force_topk",
    "lsh_topk",
    "cluster_embeddings",
    "ivf_topk",
    "embedding_neardup_pairs",
    "semantic_dedup",
    "asof_join",
    "interval_join",
    "scd2_history",
    "audio_stats",
    "decode_media_meta",
    "extract_features",
    "media_stats",
    "resize_image",
    "sample_frames",
    "synthesize_media_df",
    "decode_png",
    "encode_png",
    "is_png",
    "decode_wav",
    "encode_wav",
    "is_wav",
    "wav_meta",
]
