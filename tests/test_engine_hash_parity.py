"""Engine-independence of the md5-prefix hash.

Three oracle pairings (MinHash-LSH, SimHash, and — via deterministic
literals — LSH ANN) rest on one contract: Spark's
`conv(substring(md5(s),1,15),16,10)` equals DuckDB's
`CAST('0x' || substring(md5(s),1,15) AS BIGINT)` for every string both
engines can see.  This test pins that contract on an adversarial corpus
(empty string, unicode, long inputs, quotes, whitespace runs) plus a
seeded random sample, comparing all values in one Spark job and one
DuckDB query.
"""

from __future__ import annotations

import random
import string

import duckdb
import pyspark.sql.functions as F

from iceberg_table_generator_spark.operators.dedup import _md5_60

ADVERSARIAL = [
    "",
    " ",
    "  double  spaces  ",
    "newline\nin the middle",
    "tab\tand'quote\"and\\backslash",
    "ünïcödé ẞtrings — em–dash",
    "日本語のテキスト",
    "a" * 10_000,
    "the the the the the",
    "0x1p-3",
]


def _random_corpus(n: int = 500, seed: int = 1234) -> list[str]:
    rng = random.Random(seed)
    alphabet = string.ascii_letters + string.digits + "  .,'\"-—é日"
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        for _ in range(n)
    ]


def test_md5_60_spark_duckdb_parity(spark):
    corpus = ADVERSARIAL + _random_corpus()
    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(corpus)], "i int, s string")
    spark_vals = {
        r["i"]: r["h"] for r in sdf.select("i", _md5_60(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(corpus)))
    duck_vals = dict(
        con.execute(
            "SELECT i, CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT) FROM t"
        ).fetchall()
    )
    assert spark_vals == duck_vals
    # 60-bit range sanity: non-negative and below 2^60
    assert all(0 <= v < (1 << 60) for v in spark_vals.values())
