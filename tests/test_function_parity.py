"""Cross-engine fuzz parity for the two-dialect scalar fragments.

The oracle comparison only exercises fragments on the driver corpora; this
test feeds adversarial strings (unicode, punctuation runs, long inputs,
whitespace shapes) through BOTH renderings of each fragment and requires
bit-identical outputs — the property the whole two-dialect design rests on.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from aws_localstack_stream_processing_spark.functions import hashing, text

CASES = [
    "",
    "hello world",
    "a",
    "the quick brown fox jumps over the lazy dog",
    "  leading and  double  spaces ",
    "punctuation!!! and, some; stuff???",
    "digits 123 456 7890 mixed2words",
    "MixedCase WORDS lower UPPER",
    "repeat repeat repeat repeat repeat",
    "x" * 500,
    ("word " * 300).strip(),
    "tab\tseparated\twords",
    "ümlaut café naïve résumé",  # non-ascii
    "quote'single and \"double\" quotes",
    "back\\slash and/forward",
]

FRAGMENTS = {
    "djb2": hashing.djb2,
    "djb2_js": hashing.djb2_js,
    "rolling_fingerprint": hashing.rolling_fingerprint,
    "sha256": hashing.sha256_hex,
    "n_words": text.n_words,
    "token_count": text.token_count,
    "stopword_hits": text.stopword_hits,
    "distinct_words": text.distinct_words,
}


@pytest.mark.parametrize("name", sorted(FRAGMENTS))
def test_fragment_parity(name, spark):
    frag = FRAGMENTS[name]
    pdf = pd.DataFrame({"i": range(len(CASES)), "s": CASES})

    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("parity_in")
    spark_rows = {
        r.i: r.v
        for r in spark.sql(
            f"SELECT i, {frag('s', 'spark')} AS v FROM parity_in"
        ).collect()
    }

    con = duckdb.connect()
    con.register("parity_in", pdf)
    duck_rows = {
        i: v
        for i, v in con.execute(
            f"SELECT i, {frag('s', 'duck')} AS v FROM parity_in"
        ).fetchall()
    }
    con.close()

    assert spark_rows.keys() == duck_rows.keys()
    for i in spark_rows:
        assert spark_rows[i] == duck_rows[i], (
            name,
            CASES[i][:60],
            spark_rows[i],
            duck_rows[i],
        )


DATE_EDGES = [
    # ISO-week/year boundaries incl. leap years and century rules
    "1995-01-01", "1995-12-31", "1996-02-29", "1996-12-29", "1996-12-30",
    "1998-12-28", "1999-01-03", "2000-01-01", "2000-02-29", "2000-12-31",
    "2001-01-01", "2004-12-26", "2005-01-02", "2015-12-28", "2016-01-04",
    "2020-12-31", "2021-01-01", "2024-02-29", "2024-12-30", "2026-01-01",
]


def test_datetime_surface_parity_on_year_boundaries(spark):
    """The calendar-function contract (sql_datetime_fn_surface) on
    adversarial dates the sampled orders rows may never hit: ISO week
    numbering around Dec 28 - Jan 4, leap days, century leap rules,
    month-end clamping. Both dialect renderings must agree cell for
    cell."""
    from aws_localstack_stream_processing_spark.plans.pipeline_ops import (
        _datetime_surface_sql,
    )

    def probe(d: str) -> str:
        # re-point the shared template at a VALUES relation shaped like
        # orders (o_orderkey % 97 = 0 keeps every probe row)
        sql = _datetime_surface_sql(d)
        tbl = "slsp_orders" if d == "spark" else "orders"
        return sql.replace(tbl, "parity_dates")

    pdf = pd.DataFrame(
        {
            "o_orderkey": [97 * (i + 1) for i in range(len(DATE_EDGES))],
            "o_orderdate": pd.to_datetime(DATE_EDGES),
        }
    )
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("parity_dates")
    spark_rows = {
        r[0]: tuple(r[1:]) for r in spark.sql(probe("spark")).collect()
    }

    con = duckdb.connect()
    con.register("parity_dates", pdf)
    duck_rows = {r[0]: tuple(r[1:]) for r in con.execute(probe("duck")).fetchall()}
    con.close()

    assert spark_rows.keys() == duck_rows.keys()
    assert len(spark_rows) == len(DATE_EDGES)
    for k in spark_rows:
        assert spark_rows[k] == duck_rows[k], (k, spark_rows[k], duck_rows[k])


LEV_PAIRS = [
    ("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
    ("kitten", "sitting"), ("flaw", "lawn"),
    ("red widget", "blue widget"), ("small ring", "small king"),
    ("a" * 200, "a" * 199 + "b"), ("ab" * 100, "ba" * 100),
    ("quote'single", 'quote"single'), ("tab\tsep", "tab sep"),
    ("repeat repeat repeat", "repeat repaet repeat"),
]


def test_levenshtein_parity(spark):
    """er_blocking_fuzzy_join's verify predicate rests on both engines
    computing the SAME edit distance — classic unit-cost Levenshtein,
    probed on empty/transposition/long-string adversarial pairs.

    ASCII ONLY by contract: DuckDB's levenshtein counts BYTES while
    Spark counts code points ('ümlaut café' vs the unaccented form is 2
    in Spark, 4 in DuckDB — verified divergent). The ER operator's
    docstring carries the restriction; a unicode corpus would normalize
    or strip to ASCII in the blocking stage first."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"i": range(len(LEV_PAIRS)),
         "a": [a for a, _ in LEV_PAIRS],
         "b": [b for _, b in LEV_PAIRS]}
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("lev_in")
    s = {r.i: r.v for r in spark.sql(
        "SELECT i, levenshtein(a, b) AS v FROM lev_in").collect()}
    con = duckdb.connect()
    con.register("lev_in", pdf)
    d = dict(con.execute("SELECT i, levenshtein(a, b) FROM lev_in").fetchall())
    con.close()
    for i in s:
        assert s[i] == d[i], (LEV_PAIRS[i], s[i], d[i])


def test_ln_and_percentile_disc_parity(spark):
    """profile_entropy divides two BIGINT counts and takes ln();
    profile_quantile_bins picks discrete quantiles. Pin that (a) ln of
    count ratios is bit-identical across engines, and (b) percentile_disc
    returns the same actual data value (never interpolates) for even and
    odd populations and for values with non-terminating binary fractions."""
    import math
    import pandas as pd

    ratios = [(n, t) for t in (3, 7, 10, 997, 12345) for n in (1, 2, t - 1, t)]
    pdf = pd.DataFrame({"i": range(len(ratios)),
                        "n": [n for n, _ in ratios],
                        "t": [t for _, t in ratios]})
    spark.createDataFrame(pdf).createOrReplaceTempView("ln_in")
    expr = "ln(CAST(n AS DOUBLE) / CAST(t AS DOUBLE))"
    s = {r.i: r.v for r in spark.sql(
        f"SELECT i, {expr} AS v FROM ln_in").collect()}
    con = duckdb.connect()
    con.register("ln_in", pdf)
    d = dict(con.execute(f"SELECT i, {expr} FROM ln_in").fetchall())
    for i in s:
        assert s[i] == d[i] and s[i] == math.log(ratios[i][0] / ratios[i][1])

    vals = [0.1, 0.2, 0.3, 100.7, 100.71, 1e9 + 0.07, -5.3, 0.0, 7.5]
    vdf = pd.DataFrame({"x": vals})
    spark.createDataFrame(vdf).createOrReplaceTempView("pd_in")
    q = ("SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY x) AS q1, "
         "percentile_disc(0.50) WITHIN GROUP (ORDER BY x) AS q2, "
         "percentile_disc(0.75) WITHIN GROUP (ORDER BY x) AS q3 FROM pd_in")
    srow = spark.sql(q).collect()[0]
    con.register("pd_in", vdf)
    drow = con.execute(q).fetchone()
    con.close()
    sv = sorted(vals)
    assert (srow.q1, srow.q2, srow.q3) == tuple(drow)
    assert {srow.q1, srow.q2, srow.q3} <= set(sv)
