"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator inventory from
SURVEY.md §2 — implementations live in ``riptable_spark/`` and the
registry in ``riptable_spark/queries.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from riptable_spark import queries2  # noqa: F401 — registers batch-2 queries
from riptable_spark import queries3  # noqa: F401 — registers batch-3 queries
from riptable_spark import queries4  # noqa: F401 — registers batch-4 queries
from riptable_spark import queries5  # noqa: F401 — registers batch-5 queries
from riptable_spark import queries6  # noqa: F401 — registers batch-6 queries
from riptable_spark import queries7  # noqa: F401 — registers batch-7 queries
from riptable_spark import queries8  # noqa: F401 — registers batch-8 queries
from riptable_spark import queries9  # noqa: F401 — registers batch-9 queries
from riptable_spark import queries10  # noqa: F401 — registers batch-10 queries
from riptable_spark import queries11  # noqa: F401 — registers batch-11 queries
from riptable_spark import queries12  # noqa: F401 — registers batch-12 queries
from riptable_spark import queries13  # noqa: F401 — registers batch-13 queries
from riptable_spark import queries14, queries15, queries16, queries17  # noqa: F401 — registers batch-14 queries
from riptable_spark import queries18  # noqa: F401 — registers batch-18 queries
from riptable_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


# Harnesses that cap how many queries they check walk the dict in insertion
# order, so front-load one representative of every operator family (scan,
# filter, each join flavor, agg, window, dedup/ANN, streaming, categorical,
# UDF) ahead of the remaining variants.
_PRIORITY = [
    "q01_pricing_summary",
    "q04_groupby_stats",
    "q07_merge2_inner",
    "q13_asof_backward",
    "q17_rolling",
    "q20_drop_duplicates",
    "q22_accum2",
    "q26_datetime",
    "q27_strings",
    "q28_text_stats",
    "q30_dedup_exact",
    "q31_token_jaccard",
    "q32_cosine_topk",
    "q33_minhash_pairs",
    "q35_ema_decay",
    "q41_math_surface",
    "q47_rollup",
    "q48_apply_reduce",
    "q64_timewindow_range",
    "q71_streaming_tumbling",
    "q80_regression",
    "q101_categorical_reuse",
    "q106_salted_join",
    "q111_apply_rows",
    "q114_lsh_dedup",
    # --- rotating back half (round 5): all 25 are never-driver-checked
    # (absent from CORRECTNESS_r01..r04) — the round-4 tail (winnow
    # audits, NFC, diagnostics) plus one representative of each
    # still-unchecked family (TPC-H joins, sketches, tokenizer, record
    # linkage, SCD, ANN scale path), so successive CORRECTNESS_r*.json
    # files accumulate driver-side coverage of the registry tail (core
    # reps above stay pinned).
    "q632_winnow_density",
    "q633_winnow_boilerplate_removal",
    "q634_nfc_normalize",
    "q635_winnow_shared_runs",
    "q637_winnow_incremental",
    "q638_stream_winnow_screen",
    "q639_acf_ljung_box",
    "q640_page_hinkley",
    "q641_cooks_distance",
    "q642_crps_ensemble",
    "q643_vif",
    "q189_repeated_spans",
    "q276_curation_e2e",
    "q321_tpch_q6",
    "q322_tpch_q21",
    "q384_shapley_attribution",
    "q66_text_quality",
    "q138_ivf_topk",
    "q162_bloom_decontaminate",
    "q293_tpch_q3",
    "q421_scd2_build",
    "q571_tpch_q2",
    # round-5 batch-18 reps (also never driver-checked; the freshest
    # code, so driver-side verification is most valuable here)
    "q644_zipf_fit",
    "q648_tf_jaccard",
    "q652_corpus_plan",
]


def _ordered(d: dict) -> dict:
    out = {k: d[k] for k in _PRIORITY if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLES)
