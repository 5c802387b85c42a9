"""Hashing parity: the product's numpy splitmix64 family and Spark's
xxhash64 must agree bit-for-bit with the oracle's independent pure-int
implementations — this underpins the exactness of the parity gate."""

import numpy as np
from pyspark.sql import functions as F

import ref_oracle as O
from lsh_hdc_spark.functions import hashing as H


def test_mix64_matches_oracle():
    for v in (0, 1, 42, 2**31, 2**63, 2**64 - 1, 0xDEADBEEF):
        assert int(H.mix64(np.uint64(v))) == O.mix64(v)


def test_hash_seeds_match_oracle():
    got = [int(x) for x in H.hash_seeds(16, 0x5EED_1E5B)]
    assert got == O.hash_seeds(16, 0x5EED_1E5B)
    # different seeds -> different streams
    assert H.hash_seeds(4, 1).tolist() != H.hash_seeds(4, 2).tolist()


def test_oracle_xxh64_matches_spark(spark):
    strs = ["", "a", "abc", "hello world", "x" * 7, "y" * 8, "z" * 15,
            "w" * 31, "v" * 32, "u" * 33, "t" * 100, "héllo wörld",
            "the fast key order sort"]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    rows = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in strs:
        assert O.xxh64(s.encode("utf-8")) == rows[s], repr(s)


def test_as_u64_roundtrip():
    a = np.array([-1, 0, 1, -(2**63)], dtype=np.int64)
    assert (H.as_i64(H.as_u64(a)) == a).all()
