"""Reshaping operators: key-value unpivot (melt) and row multiplication.

The two genuinely relational reshape ops the reference implements in
imperative Go, re-expressed as single Catalyst `Generate`/`Expand` nodes —
narrow, pipelined, no shuffle:

- KV unpivot (`processKeyValueTable`, /root/reference/etl.go:226-300): one
  row becomes K ``(key, value[, value_type])`` rows with carried include
  columns. Spark: ``melt`` -> an Expand node.
- Row multiplication (`multiple_mapping`,
  /root/reference/migrate/migrate.go:82-119): each source row crossed with
  N mapping templates. Spark: ``explode(array(struct...))`` -> Generate.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.operators.mapping import _TEMPLATE_RE, template_expr


def kv_unpivot(
    df: DataFrame,
    value_columns: list[str],
    include: list[str] | None = None,
    key_field: str = "key",
    value_field: str = "value",
    type_field: str | None = None,
    exclude_keys: list[str] | None = None,
    extra: dict[str, Any] | None = None,
) -> DataFrame:
    """Melt ``value_columns`` into (key, value) rows.

    Parity with /root/reference/etl.go:226-300: values stringified (bools
    normalized to 'true'/'false' like the reference's "0"/"1" handling at
    etl.go:274-281 — Spark's boolean->string cast already yields
    true/false); optional ``type_field`` carries the SOURCE column's type
    name (schema-as-data, GetDataTypeMap at etl.go:270-273) — resolved at
    plan time from the DataFrame schema, so it is a literal per melted
    column, not a runtime lookup. ``exclude_keys`` drops melted rows by key
    name (etl.go:291-297)."""
    include = include or []
    by_name = {f.name: f.dataType for f in df.schema.fields}
    structs = []
    for c in value_columns:
        fields = [
            F.lit(c).alias(key_field),
            F.col(c).cast("string").alias(value_field),
        ]
        if type_field:
            fields.append(F.lit(by_name[c].simpleString()).alias(type_field))
        structs.append(F.struct(*fields))
    out = df.select(
        *include, F.explode(F.array(*structs)).alias("_kv")
    ).select(*include, "_kv.*")
    if exclude_keys:
        out = out.filter(~F.col(key_field).isin(exclude_keys))
    for k, v in (extra or {}).items():
        if isinstance(v, str) and _TEMPLATE_RE.match(v.strip()):
            out = out.withColumn(k, template_expr(v))
        else:
            out = out.withColumn(k, F.lit(v))
    return out


def multi_mapping(df: DataFrame, mappings: list[dict[str, Any]]) -> DataFrame:
    """Each input row x N mapping templates -> N output rows
    (/root/reference/migrate/migrate.go:82-119, e.g. one user-settings row
    expanding to `default_company` + `default_service` rows). Template
    values may reference source columns or ``{{...}}`` expressions; all
    templates must share a key set."""
    if not mappings:
        return df.limit(0)
    keys = list(mappings[0])
    structs = []
    for m in mappings:
        if list(m) != keys:
            raise ValueError("all multi_mapping templates must share one key set")
        fields = []
        for k in keys:
            v = m[k]
            if isinstance(v, str) and _TEMPLATE_RE.match(v.strip()):
                fields.append(template_expr(v).alias(k))
            elif isinstance(v, str) and v in df.columns:
                fields.append(F.col(v).alias(k))
            else:
                fields.append(F.lit(v).alias(k))
        structs.append(F.struct(*fields))
    return df.select(F.explode(F.array(*structs)).alias("_m")).select("_m.*")


def with_context_window(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    value_col: str,
    n: int = 3,
    sep: str = " ",
    out_col: str = "context",
) -> DataFrame:
    """Concatenated trailing context per row: the previous ``n`` values of
    ``value_col`` within a partition, in order — the transcript
    training-pair primitive (context = prior turns, response = this
    turn). One window per partition key (a single key-equality shuffle;
    at transcript scale the partition is a conversation — thousands of
    rows, never the table). First rows with no history get NULL (not ""),
    matching SQL string_agg-over-empty-frame semantics."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-n, -1)
    )
    ctx = F.collect_list(F.col(value_col)).over(w)
    return df.withColumn(
        out_col,
        F.when(F.size(ctx) > 0, F.array_join(ctx, sep)),
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

      n_words          whitespace word count
      dup_word_frac    1 - distinct_words / n_words (0 = all unique)
      top_bigram_frac  occurrences of the most frequent word bigram /
                       total bigrams (NULL for docs with < 2 words)

    High values flag degenerate/boilerplate docs (Rae et al., Gopher
    §A1.1-style filters). Shape at scale: posexplode + two groupBys keyed
    by (doc, token) — pure codegen key-equality shuffles, no higher-order
    functions (CodegenFallback) and no Python; the doc-level reduction is
    map-side combinable."""
    from pyspark.sql import Window as W

    words = df.select(
        id_col,
        F.posexplode(
            F.split(F.lower(F.trim(F.regexp_replace(text_col, r"\s+", " "))), " ")
        ).alias("__p", "__w"),
    )
    per_word = words.groupBy(id_col, "__w").agg(F.count(F.lit(1)).alias("__c"))
    word_stats = per_word.groupBy(id_col).agg(
        F.sum("__c").alias("n_words"),
        (
            F.lit(1.0)
            - F.count(F.lit(1)).cast("double") / F.sum("__c").cast("double")
        ).alias("dup_word_frac"),
    )
    nxt = F.lead("__w").over(W.partitionBy(id_col).orderBy("__p"))
    bigrams = words.select(
        id_col, F.concat_ws(" ", "__w", nxt).alias("__bg"), nxt.alias("__nx")
    ).filter(F.col("__nx").isNotNull())
    per_bg = bigrams.groupBy(id_col, "__bg").agg(F.count(F.lit(1)).alias("__c"))
    bg_stats = per_bg.groupBy(id_col).agg(
        (
            F.max("__c").cast("double") / F.sum("__c").cast("double")
        ).alias("top_bigram_frac")
    )
    return word_stats.join(bg_stats, on=id_col, how="left").select(
        id_col, "n_words", "dup_word_frac", "top_bigram_frac"
    )


def truncate_to_budget(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    tokens_col,
    budget: int,
) -> DataFrame:
    """Keep the longest SUFFIX of rows per partition whose token total
    fits ``budget`` — context-window trimming for transcripts: the most
    recent turns survive, the oldest are dropped first (the standard
    prompt-assembly truncation before packing turns into a model
    context). A row whose own token count already exceeds the remaining
    budget is dropped along with everything older than it.

    Shape at scale: ONE reverse running-sum window per partition key (a
    single key-equality shuffle; a partition is one conversation — never
    the table), pure codegen, no Python. The result is a deterministic
    function of the data for any physical partitioning because
    ``order_by`` must totally order rows within a partition (pass the
    turn index / event id as the tiebreaker, exactly like
    ``with_context_window``).

    ``tokens_col`` is a column name or Column expression (e.g.
    ``token_count(text_col)``); token totals accumulate as BIGINT.
    """
    from pyspark.sql import Window as W

    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    w = (
        W.partitionBy(*partition_by)
        .orderBy(*[F.col(c).desc() for c in order_by])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    staged = df.withColumn("__tok", toks.cast("long"))
    return (
        staged.withColumn("__rev_cum", F.sum("__tok").over(w))
        .filter(F.col("__rev_cum") <= budget)
        .drop("__tok", "__rev_cum")
    )
