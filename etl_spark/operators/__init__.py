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
]
