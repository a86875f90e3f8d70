"""Z-order layout tests: the Morton key's bit structure, and the thing
the layout exists for — per-file Parquet min/max footers that bound
EVERY z-dimension tightly (data skipping), verified by reading the
written files' column statistics with pyarrow."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from riptable_spark.operators import zorder as zo
from riptable_spark.sources.io import load_table

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    z = df.select(zo.interleave_bits([F.col("x"), F.col("y")], bits=3).alias("z")).first().z
    # x bits at even positions, y at odd: x=101, y=011 → z = 1·1 + 1·2 + 0·4 + 1·8 + 1·16 + 0·32 = 27
    assert z == 0b011011


def test_interleave_rejects_overflow():
    with pytest.raises(ValueError):
        zo.interleave_bits([F.lit(0), F.lit(0)], bits=32)


def _file_spans(path: str, col: str) -> list[tuple[float, float]]:
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            spans.append((min(los), max(his)))
    return spans


def _mean_norm_span(spans, lo, hi):
    return sum((b - a) / (hi - lo) for a, b in spans) / len(spans)


def test_zordered_write_narrows_both_columns(spark, tmp_path):
    """The whole point: after save_zordered on (custkey, totalprice),
    each written file covers a small slice of BOTH columns' ranges, so a
    predicate on either prunes most files. A plain (unsorted) write has
    near-full spans."""
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    row = o.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("o_totalprice"), F.max("o_totalprice")
    ).first()
    lo1, hi1, lo2, hi2 = row

    plain = str(tmp_path / "plain")
    o.repartition(8).write.parquet(plain)
    zpath = str(tmp_path / "zorder")
    zo.save_zordered(o, zpath, ["o_custkey", "o_totalprice"], bits=8, n_files=32)

    z1 = _mean_norm_span(_file_spans(zpath, "o_custkey"), lo1, hi1)
    z2 = _mean_norm_span(_file_spans(zpath, "o_totalprice"), lo2, hi2)
    p1 = _mean_norm_span(_file_spans(plain, "o_custkey"), lo1, hi1)
    p2 = _mean_norm_span(_file_spans(plain, "o_totalprice"), lo2, hi2)

    # hash-partitioned files span ~the full range on both columns
    assert p1 > 0.9 and p2 > 0.9
    # z-ordered files bound both dimensions much tighter (measured ~0.3/0.2
    # at 32 files; more files → tighter, the curve property)
    assert z1 < 0.5 and z2 < 0.5
    # round-trip is lossless
    assert spark.read.parquet(zpath).count() == o.count()


def test_interleave_roundtrip_property(spark):
    """interleave ∘ deinterleave is the identity on every dimension, for
    random cell values across dimension counts."""
    from pyspark.sql import functions as F

    for n_cols, bits in [(2, 8), (3, 8), (4, 4)]:
        df = spark.range(0, 500).select(
            *[
                (F.xxhash64(F.col("id"), F.lit(j)).bitwiseAND(F.lit((1 << bits) - 1))).alias(f"x{j}")
                for j in range(n_cols)
            ]
        )
        z = zo.interleave_bits([F.col(f"x{j}") for j in range(n_cols)], bits)
        back = df.select(
            *[F.col(f"x{j}") for j in range(n_cols)],
            z.alias("z"),
        ).select(
            *[
                (zo.deinterleave_bits(F.col("z"), n_cols, j, bits) == F.col(f"x{j}")).alias(f"ok{j}")
                for j in range(n_cols)
            ]
        )
        row = back.agg(*[F.min(f"ok{j}").alias(f"ok{j}") for j in range(n_cols)]).first()
        assert all(row[f"ok{j}"] for j in range(n_cols)), (n_cols, bits)
