"""Replicates the driver's correctness gate locally: every queries() entry
with an oracle_sql() twin must match DuckDB row-for-row (order-insensitive)
at sf0.01; rows-only entries must run and return sane row counts."""

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _key(row):
    return tuple(repr(v) for v in row)


@pytest.mark.parametrize("name", sorted(E.oracle_sql()))
def test_query_matches_duckdb_oracle(spark, con, name):
    df = E.queries()[name](spark, SF_DIR)
    duck = con.sql(E.oracle_sql()[name])
    duck_cols = [d[0] for d in duck.description]
    assert sorted(df.columns) == sorted(duck_cols), (
        f"{name}: column mismatch {df.columns} vs {duck_cols}"
    )
    cols = sorted(df.columns)
    spark_rows = sorted((_key([r[c] for c in cols]) for r in df.collect()))
    duck_rows = sorted(
        (_key([row[duck_cols.index(c)] for c in cols]) for row in duck.fetchall())
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    mism = [i for i, (a, b) in enumerate(zip(spark_rows, duck_rows)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"{spark_rows[mism[0]]} vs {duck_rows[mism[0]]}"
    )


def test_rows_only_queries_run(spark):
    qs = E.queries()
    with_oracle = set(E.oracle_sql())
    for name, fn in qs.items():
        if name in with_oracle:
            continue
        n = fn(spark, SF_DIR).count()
        assert n >= 0, name
        if name in ("minhash_signatures", "simhash_sketch"):
            assert n > 0, f"{name} unexpectedly empty"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"cluster_id", "cluster_size", "member_ids"} <= set(df.columns)


def test_quality_micros_cross_engine_fuzz(spark):
    """The quality quantization must agree between Spark and DuckDB on
    arbitrary text — this is the divergence class (round-half ties on
    doubles) that broke doc_quality in round 1.  400 seeded random texts,
    mixed scripts/lengths/punctuation."""
    import random

    import duckdb
    import pandas as pd

    from lsh_hdc_spark.functions.textstats import quality_micros

    rng = random.Random(20260816)
    alphabets = [
        "abcdefghij ", "abc 123 !?.,", "ħéllo wörld ünï ", "的是在不了 ",
        "a" * 5 + " ", "x y z w v u t s r q ",
    ]
    texts = [
        "".join(rng.choice(rng.choice(alphabets)) for _ in range(rng.randint(0, 300)))
        for _ in range(400)
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = {
        r.doc_id: r.quality_micros
        for r in quality_micros(
            spark.createDataFrame(pdf), "doc_id", "text"
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", pdf)
    import __spark_entry__ as E

    want = dict(con.sql(E.oracle_sql()["doc_quality"]).fetchall())
    assert got == want
