"""Two-dialect SQL helpers.

Each named query is declared once as a dialect-parameterized SQL template;
``spark`` renders the Spark SQL run by the engine, ``duck`` renders the
DuckDB oracle the driver verifies against. Fragments that must be
bit-identical across engines live in :mod:`..functions`.

Spark-side table names are prefixed ``slsp_`` so registering them never
clobbers views in an externally-owned SparkSession; the DuckDB oracle uses
the driver's pre-registered plain table names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table


def tbl(name: str, d: str) -> str:
    return f"slsp_{name}" if d == "spark" else name


def views(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    out = {}
    for n in names:
        df = load_table(spark, sf_dir, n)
        df.createOrReplaceTempView(f"slsp_{n}")
        out[n] = df
    return out


def s(expr: str, d: str) -> str:
    """Cast to string (Spark STRING / DuckDB VARCHAR)."""
    return f"CAST({expr} AS {'STRING' if d == 'spark' else 'VARCHAR'})"


def ts_str(expr: str, d: str) -> str:
    """Format a timestamp to 'yyyy-MM-dd HH:mm:ss' (second precision)."""
    if d == "spark":
        return f"date_format({expr}, 'yyyy-MM-dd HH:mm:ss')"
    return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"


def ts_str_us(expr: str, d: str) -> str:
    """Format a timestamp with microsecond precision."""
    if d == "spark":
        return f"date_format({expr}, 'yyyy-MM-dd HH:mm:ss.SSSSSS')"
    return f"strftime({expr}, '%Y-%m-%d %H:%M:%S.%f')"


def dec_sum(expr: str, scale: int = 6) -> str:
    """Order-independent (exact decimal) sum of a double expression, emitted
    as DOUBLE. Identical text parses in both engines."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE)"


def dec_avg(expr: str, scale: int = 6) -> str:
    """Exact-sum average emitted as DOUBLE (same division in both engines)."""
    return f"({dec_sum(expr, scale)} / COUNT(*))"


def intdiv(a: str, b: str, d: str) -> str:
    return f"({a} DIV {b})" if d == "spark" else f"({a} // {b})"


def b64_decode(expr: str, d: str) -> str:
    """base64 string -> original utf8 string."""
    if d == "spark":
        return f"CAST(unbase64({expr}) AS STRING)"
    return f"decode(from_base64({expr}))"


def b64_encode(expr: str, d: str) -> str:
    """utf8 string -> base64 string."""
    if d == "spark":
        return f"base64(CAST({expr} AS BINARY))"
    return f"base64(CAST({expr} AS BLOB))"


def json_get(expr: str, path_key: str, d: str) -> str:
    """Extract a top-level JSON field as string (NULL when absent)."""
    if d == "spark":
        return f"get_json_object({expr}, '$.{path_key}')"
    return f"json_extract_string({expr}, '$.{path_key}')"


def arr_len(expr: str, d: str) -> str:
    return f"size({expr})" if d == "spark" else f"len({expr})"


def arr_distinct(expr: str, d: str) -> str:
    return f"array_distinct({expr})" if d == "spark" else f"list_distinct({expr})"


def unnest_fn(d: str) -> str:
    """Row-generating array expansion in the SELECT list (same shape in both
    engines: ``SELECT k, explode/unnest(arr) AS x FROM t``)."""
    return "explode" if d == "spark" else "unnest"


def arr_intersect_len(a: str, b: str, d: str) -> str:
    if d == "spark":
        return f"size(array_intersect({a}, {b}))"
    return f"len(list_intersect({a}, {b}))"


def arr_union_len(a: str, b: str, d: str) -> str:
    if d == "spark":
        return f"size(array_union({a}, {b}))"
    return f"len(list_distinct(list_concat({a}, {b})))"


def inline_values(rows: str, alias: str, cols: str, d: str) -> str:
    """Inline literal table (broadcast dimension): ``rows`` is the
    ``(..), (..)`` tuple text. Spark wants ``FROM VALUES ... AS t(c)``,
    DuckDB wants ``FROM (VALUES ...) t(c)``."""
    if d == "spark":
        return f"SELECT * FROM VALUES {rows} AS {alias}({cols})"
    return f"SELECT * FROM (VALUES {rows}) {alias}({cols})"


def epoch_s(ts: str, d: str) -> str:
    """Timestamp → whole epoch seconds as BIGINT (truncating)."""
    if d == "spark":
        return f"CAST(unix_timestamp({ts}) AS BIGINT)"
    return f"CAST(floor(epoch({ts})) AS BIGINT)"


def xor(a: str, b: str, d: str) -> str:
    return f"({a} ^ {b})" if d == "spark" else f"xor({a}, {b})"


def to_double_arr(expr: str, d: str) -> str:
    if d == "spark":
        return f"transform({expr}, x -> CAST(x AS DOUBLE))"
    return f"list_transform({expr}, x -> CAST(x AS DOUBLE))"


def hash64(expr: str, d: str) -> str:
    """Deterministic 60-bit BIGINT key from a string — bit-identical across
    dialects (md5 hex prefix). Use to replace long string shuffle/join keys
    (shingles, canonical URLs) with 8-byte integers: at 1.4M keys the
    collision probability is ~1e-7, and because BOTH engines hash the same
    way a collision changes both sides identically — hash-exactness holds
    regardless."""
    if d == "spark":
        return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"


def re_replace_all(expr: str, pat: str, rep: str, d: str) -> str:
    """Regex-replace EVERY match. Spark's regexp_replace is global by
    default with ``$1`` backreferences; DuckDB needs the ``'g'`` option and
    ``\\1`` backreferences — pass ``rep`` in ``$1`` style."""
    if d == "spark":
        return f"regexp_replace({expr}, '{pat}', '{rep}')"
    duck_rep = rep.replace("$", "\\")
    return f"regexp_replace({expr}, '{pat}', '{duck_rep}', 'g')"


def qsample(src: str, id_col: str, k: int, where: str = "") -> str:
    """Fixed-size hash-rank query cohort (VERDICT r5 #4): the ``k`` rows of
    ``src`` whose multiplicative-hash rank of ``id_col`` is smallest.

    A ``% m`` modulus cohort grows linearly with the corpus, so an eval
    whose exact side brute-forces the cohort against the corpus silently
    becomes ~N²/m at scale; a hash-rank LIMIT keeps the exact pass k·N at
    ANY corpus size. The text renders identically in both dialects (BIGINT
    multiply + modulo, total ORDER BY with the id as tiebreak), so both
    engines draw the same cohort; Spark executes the LIMIT as
    TakeOrderedAndProject — per-partition top-k, never a global sort."""
    w = f" WHERE {where}" if where else ""
    return (
        f"SELECT {id_col} FROM {src}{w} "
        f"ORDER BY ({id_col} * 2654435761) % 1048576, {id_col} LIMIT {k}"
    )


def dot(a: str, b: str, dim: int, d: str) -> str:
    """Dot product of two DOUBLE arrays with a fixed left-to-right summation
    order, so the result is bit-exact across Spark and DuckDB (IEEE ops in a
    fixed order). The Spark side is a flat 64-term sum — plain expressions
    stay inside whole-stage codegen, unlike higher-order functions
    (aggregate/transform) which run interpreted per row; the left-associative
    ``+`` chain is the same order as DuckDB's sequential fold."""
    if d == "spark":
        terms = " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(dim))
        return f"(CAST(0 AS DOUBLE) + {terms})"
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, {dim}), i -> {a}[i] * {b}[i])), "
        f"(x, y) -> x + y)"
    )


def dot_const(a: str, signs: list[int], d: str) -> str:
    """Dot product of a DOUBLE array with a compile-time constant ±1 sign
    vector (random-hyperplane LSH projections)."""
    lit = ", ".join(str(s) for s in signs)
    dim = len(signs)
    if d == "spark":
        # flat codegen-friendly form; constant folding turns each term into
        # {a}[i] or -{a}[i]
        terms = " + ".join(
            f"{a}[{i}] * CAST({signs[i]} AS DOUBLE)" for i in range(dim)
        )
        return f"(CAST(0 AS DOUBLE) + {terms})"
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, {dim}), "
        f"i -> {a}[i] * CAST(([{lit}])[i] AS DOUBLE))), "
        f"(x, y) -> x + y)"
    )
