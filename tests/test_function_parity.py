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
