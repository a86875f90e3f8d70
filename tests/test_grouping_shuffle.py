"""Unit coverage for the grouping-construction facades (groupbyhash /
groupbylex / groupbypack — oracle-checked in q184-q186) and the
deterministic epoch shuffle (q187): permutation/offset invariants the
SQL oracles can't express directly."""

import pytest
from pyspark.sql import functions as F

from riptable_spark.operators import grouping as gp
from riptable_spark.operators.pipeline import shuffle_rows


@pytest.fixture(scope="module")
def kv(spark):
    rows = [(i, ["b", "a", "c", "a", "b"][i % 5]) for i in range(40)]
    return spark.createDataFrame(rows, "rowid long, k string")


def test_groupbyhash_first_appearance_order(kv):
    out = {r.k: (r.ikey, r.ifirstkey) for r in gp.groupbyhash(kv, "k", "rowid").collect()}
    # first appearances: b@0, a@1, c@2 → ikeys 1,2,3
    assert out == {"b": (1, 0), "a": (2, 1), "c": (3, 2)}


def test_groupbylex_sorted_order(kv):
    out = {r.k: r.ikey for r in gp.groupbylex(kv, "k").collect()}
    assert out == {"a": 1, "b": 2, "c": 3}


def test_groupbypack_contiguous_positions(kv):
    rows = gp.groupbypack(kv, "k", "rowid").collect()
    # igroup is a permutation of 0..n-1
    assert sorted(r.igroup for r in rows) == list(range(40))
    # within the packed order, each group occupies [ifirst, ifirst+ncount)
    for r in rows:
        assert r.ifirst <= r.igroup < r.ifirst + r.ncount
    # groups are contiguous: same k ⇒ consecutive igroup by rowid
    by_k = {}
    for r in sorted(rows, key=lambda r: (r.k, r.rowid)):
        by_k.setdefault(r.k, []).append(r.igroup)
    for positions in by_k.values():
        assert positions == list(range(positions[0], positions[0] + len(positions)))


@pytest.mark.parametrize("hash_kind", ["xxhash64", "md5"])
def test_shuffle_rows_is_exact_permutation(spark, hash_kind):
    df = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    pos = [r.shuffle_pos for r in shuffle_rows(df, "doc_id", seed=1, n_buckets=16, hash_kind=hash_kind).collect()]
    assert sorted(pos) == list(range(300))


def test_shuffle_rows_seed_changes_order_but_stays_stable(spark):
    df = spark.range(0, 200).select(F.col("id").alias("doc_id"))

    def order(seed):
        return tuple(
            r.doc_id
            for r in shuffle_rows(df, "doc_id", seed=seed, n_buckets=8)
            .orderBy("shuffle_pos")
            .collect()
        )

    a1, a2, b = order(1), order(1), order(2)
    assert a1 == a2  # rerun-stable
    assert a1 != b  # independent epoch permutation
    # bucket count must not change the order (it's a plan knob, not semantics)
    c = tuple(
        r.doc_id
        for r in shuffle_rows(df, "doc_id", seed=1, n_buckets=32)
        .orderBy("shuffle_pos")
        .collect()
    )
    assert c == a1
