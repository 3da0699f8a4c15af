"""Projection / column operators: field maps, template expressions, concat,
case/trim normalization, include/exclude/extra.

Re-expression of the reference's mapper family as plan-time DataFrame
combinators — every one of these compiles to a Catalyst `Project`, so at
scale they are free (fused into whole-stage codegen with the scan):

- field map / rename, drop-unmatched (/root/reference/mapper/mapper.go:30-58)
- v2 field map + constant additionalFields (/root/reference/v2/mapper/field.go:29-53)
- `{{...}}` template expressions: ternary, now(), literals, coalesce-ish
  truthiness (/root/reference/mapper/mapper.go:37-44,
  /root/reference/migrate/migrate.go:85-105; examples
  /root/reference/examples/users.yaml:34-38)
- concat fields with delimiter, dropping sources (/root/reference/concat/concat.go:25-46)
- lowercase keys (/root/reference/sanitize/sanitize.go:29-41)
- uppercase / trim every string value (/root/reference/v2/transfomer/transformers.go:11-42)
- include/extra/exclude projection (/root/reference/etl.go:243-297)
"""

from __future__ import annotations

import logging
import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.functions.text import slug

_log = logging.getLogger(__name__)

_TEMPLATE_RE = re.compile(r"^\{\{(.*)\}\}$", re.S)
_TERNARY_RE = re.compile(r"^(.*?)\?(.*):(.*)$", re.S)
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def template_expr(template: str) -> Column:
    """Compile a reference-style ``{{...}}`` template to a Column.

    Supported forms (the corpus in /root/reference/examples/*.yaml):
      {{'LITERAL'}}                      -> lit
      {{now()}}                          -> current_timestamp()
      {{col}}                            -> column ref
      {{cond ? a : b}}                   -> IF(cond, a, b); a bare-identifier
                                            cond means "IS NOT NULL" (Go
                                            evaluate truthiness on row maps)
      {{user_active == 1 ? 'A' : 'B'}}   -> comparison conditions pass through
      {{slug(name)}}                     -> engine slug()
    Anything else is handed to Spark SQL via F.expr.
    """
    m = _TEMPLATE_RE.match(template.strip())
    body = m.group(1).strip() if m else template.strip()
    return _compile_expr(body)


def _compile_expr(body: str) -> Column:
    t = _TERNARY_RE.match(body)
    if t and "?" not in t.group(1):
        cond, a, b = (s.strip() for s in t.groups())
        if _IDENT_RE.match(cond):
            cond_sql = f"({cond} IS NOT NULL)"
        else:
            cond_sql = cond.replace("==", "=")
        return F.expr(f"IF({cond_sql}, {_sqlify(a)}, {_sqlify(b)})")
    return F.expr(_sqlify(body))


def _sqlify(s: str) -> str:
    s = s.strip().replace("==", "=")
    if s == "now()":
        return "current_timestamp()"
    inner = re.match(r"^slug\((.*)\)$", s)
    if inner:
        # route through the engine slug (regexp chain), expressed as SQL
        return (
            "regexp_replace(regexp_replace(lower(trim("
            + inner.group(1)
            + r")), '[^a-z0-9]+', '-'), '^-+|-+$', '')"
        )
    return s


def _resolve_struct_path(df: DataFrame, src: str) -> tuple[Column, list[str]] | None:
    """Walk a dotted path (``a.b.c``) through nested struct fields, the
    engine analogue of dipper.Get (/root/reference/lib/value.go:196-207).
    Returns (column, [top-level column consumed]) or None — a pure
    schema walk, so an unresolvable path never silently becomes a value."""
    parts = src.split(".")
    field = next((f for f in df.schema.fields if f.name == parts[0]), None)
    if field is None:
        return None
    col = F.col(f"`{parts[0]}`")
    dtype = field.dataType
    for p in parts[1:]:
        if not isinstance(dtype, T.StructType):
            return None
        sub = next((f for f in dtype.fields if f.name == p), None)
        if sub is None:
            return None
        col = col.getField(p)
        dtype = sub.dataType
    return col, [parts[0]]


def _resolve_context(src: str, context: dict[str, Any]) -> tuple[Any, bool]:
    """Resolve the reference's non-column value namespaces against a job
    context dict (/root/reference/lib/value.go:34-210):

      param.x / query.x     -> context['param'|'query'][x]  (``*_suffix`` ok)
      consts.x              -> context['consts'][x]
      enums.group.x         -> context['enums'][group][x]
      <other header keys>   -> context[x] (anything not in the reserved set)
    Returns (value, found)."""
    parts = src.split(".")
    ns = parts[0]
    if ns in ("param", "query") and len(parts) == 2:
        space = context.get(ns) or {}
        name = parts[1]
        if "*_" in name:
            suffix = name.replace("*", "")
            for k, v in space.items():
                if k.endswith(suffix):
                    return v, True
        elif name in space:
            return space[name], True
        return None, False
    if ns == "consts" and len(parts) == 2:
        space = context.get("consts") or {}
        return (space[parts[1]], True) if parts[1] in space else (None, False)
    if ns == "enums" and len(parts) == 3:
        group = (context.get("enums") or {}).get(parts[1]) or {}
        return (group[parts[2]], True) if parts[2] in group else (None, False)
    reserved = {"param", "query", "consts", "enums", "scopes"}
    if src in context and src not in reserved:
        return context[src], True
    return None, False


def _resolve_source(
    df: DataFrame, src: str, context: dict[str, Any] | None = None
) -> tuple[Column, list[str]] | None:
    """Resolve a non-template mapping value against the frame at plan time,
    mirroring lib.GetValue (/root/reference/lib/value.go:12-210):

      exact column          -> col
      ``a.b.c``             -> nested struct field walk (value.go:196-207)
      ``body.x``            -> column x (value.go:62-77)
      ``header.`` prefix    -> stripped, then context/namespace lookup
      ``param.x`` etc.      -> literal from the job context (value.go:78-118)
      ``eval.{{expr}}``     -> compiled expression (value.go:119-143)
      ``a+b`` concat parts  -> concat of each resolved part (value.go:12-32)
      ``*_suffix``/``pre*`` -> first column matching the wildcard
                               (value.go:66-73,187-194)
    Returns (column, consumed source names) or None if unresolvable."""
    context = context or {}
    if src.startswith("header."):
        val, found = _resolve_context(src[len("header."):], context)
        return (F.lit(val), []) if found else None
    if src.startswith("eval."):
        body = src[len("eval."):].strip()
        m = _TEMPLATE_RE.match(body)
        return _compile_expr(m.group(1).strip() if m else body), []
    if src.startswith("body.") and "." not in src[len("body."):]:
        name = src[len("body."):]
        return _resolve_source(df, name)
    # Reserved namespaces beat column resolution (the reference's switch on
    # vParts[0] runs before dipper.Get on row data, value.go:61-118).
    if src.split(".")[0] in ("param", "query", "consts", "enums"):
        val, found = _resolve_context(src, context)
        if found:
            return F.lit(val), []
    if src in df.columns:
        return F.col(f"`{src}`"), [src]
    if "." in src and "+" not in src:
        walked = _resolve_struct_path(df, src)
        if walked is not None:
            return walked
    # Bare header-data keys resolve only after row data fails
    # (value.go:196-207: dipper.Get(data) then dipper.Get(headerData)).
    val, found = _resolve_context(src, context)
    if found:
        return F.lit(val), []
    if "+" in src:
        parts = [p.strip() for p in src.split("+")]
        resolved, used = [], []
        for p in parts:
            r = _resolve_source(df, p, context)
            if r is None:
                resolved.append(F.lit(p))
            else:
                resolved.append(r[0])
                used.extend(r[1])
        return F.concat(*resolved), used
    if "*" in src:
        import fnmatch

        for c in df.columns:
            if fnmatch.fnmatch(c, src):
                return F.col(c), [c]
        return None
    return None


def field_map(
    df: DataFrame,
    mapping: dict[str, str],
    keep_unmatched: bool = False,
    additional: dict[str, Any] | None = None,
    context: dict[str, Any] | None = None,
) -> DataFrame:
    """``dest <- src`` projection. ``mapping`` values may be source column
    names, dotted struct paths (``a.b.c``), ``{{...}}`` templates, ``a+b``
    concats, ``*_suffix`` wildcards, or job-context namespaces
    (``param.x`` / ``query.x`` / ``consts.x`` / ``enums.g.x`` /
    ``header.x`` / ``eval.{{...}}``, /root/reference/lib/value.go:34-210);
    unmapped source columns are dropped unless ``keep_unmatched``
    (KeepUnmatchedFields, /root/reference/mapper/mapper.go:49-55).
    ``additional`` adds constant columns
    (/root/reference/v2/mapper/field.go:44-49). ``context`` carries job
    parameters: {'param': {...}, 'query': {...}, 'consts': {...},
    'enums': {...}, <other header keys>}.

    A value that resolves to nothing becomes a literal (reference configs
    use bare literals in mappings) — but a WARNING is logged so a typo'd
    column/path never fails silently."""
    cols: list[Column] = []
    used: set[str] = set()
    for dest, src in mapping.items():
        if isinstance(src, str) and _TEMPLATE_RE.match(src.strip()):
            cols.append(template_expr(src).alias(dest))
            continue
        resolved = (
            _resolve_source(df, src, context) if isinstance(src, str) else None
        )
        if resolved is not None:
            cols.append(resolved[0].alias(dest))
            used.update(resolved[1])
        else:
            if isinstance(src, str) and (
                "." in src or any(c in df.columns for c in (src.lower(), src.upper()))
            ):
                _log.warning(
                    "field_map: source %r for dest %r did not resolve to a "
                    "column/path/namespace; emitting it as a LITERAL", src, dest,
                )
            cols.append(F.lit(src).alias(dest))
    if keep_unmatched:
        mapped_dests = set(mapping)
        for c in df.columns:
            if c not in used and c not in mapped_dests:
                cols.append(F.col(c))
    for k, v in (additional or {}).items():
        cols.append(
            (template_expr(v) if isinstance(v, str) and _TEMPLATE_RE.match(v.strip())
             else F.lit(v)).alias(k)
        )
    return df.select(*cols)


def concat_fields(
    df: DataFrame,
    sources: list[str],
    dest: str,
    delimiter: str = " ",
    drop_sources: bool = True,
) -> DataFrame:
    """concat_ws over N source fields (/root/reference/concat/concat.go:25-46)."""
    out = df.withColumn(dest, F.concat_ws(delimiter, *[F.col(c) for c in sources]))
    return out.drop(*sources) if drop_sources else out


def lowercase_columns(df: DataFrame) -> DataFrame:
    """Rename every column to lowercase (sanitize,
    /root/reference/sanitize/sanitize.go:29-41) — plan-time rename, free."""
    return df.toDF(*[c.lower() for c in df.columns])


def _map_string_values(df: DataFrame, fn) -> DataFrame:
    return df.select(
        *[
            fn(F.col(f.name)).alias(f.name)
            if isinstance(f.dataType, T.StringType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def uppercase_string_values(df: DataFrame) -> DataFrame:
    """Upper-case every string column
    (/root/reference/v2/transfomer/transformers.go:11-20)."""
    return _map_string_values(df, F.upper)


def trim_string_values(df: DataFrame) -> DataFrame:
    """Trim every string column
    (/root/reference/v2/transfomer/transformers.go:33-42)."""
    return _map_string_values(df, F.trim)


def include_exclude_extra(
    df: DataFrame,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    extra: dict[str, Any] | None = None,
) -> DataFrame:
    """IncludeFields / ExcludeFields / ExtraValues projection
    (/root/reference/etl.go:243-297). ``extra`` values may be ``{{...}}``
    templates, ``field:name`` references, or constants."""
    out = df
    if include:
        out = out.select(*include)
    if exclude:
        out = out.drop(*[c for c in exclude if c in out.columns])
    for k, v in (extra or {}).items():
        if isinstance(v, str) and _TEMPLATE_RE.match(v.strip()):
            out = out.withColumn(k, template_expr(v))
        elif isinstance(v, str) and v.startswith("field:"):
            out = out.withColumn(k, F.col(v[len("field:"):]))
        else:
            out = out.withColumn(k, F.lit(v))
    return out
