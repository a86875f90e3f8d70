"""Mergeable distinct-count sketching (HyperLogLog) with an
engine-portable, SQL-replayable construction.

Spark's built-in approx_count_distinct is an opaque binary sketch; this
module builds the SAME algorithm as a plain (bucket, rho) RELATION so it
can be persisted, MERGED across shards/days with a max-aggregation, and
hash-checked against a DuckDB oracle bit-for-bit:

- register build: one hash + two bit-ops per row, then max per bucket —
  a map-side-combined aggregate whose output is ≤ 2^p rows;
- merge: union + max — associative, the property that lets a 100 TB
  ingest keep per-partition sketches and fold them later;
- estimate: the harmonic sum Σ 2^(−M_j) is computed as the INTEGER
  Σ 2^(53−M_j) (each term exact, total < 2^63), so the only float ops
  are one division and the small-range ln correction — identical in
  any engine.

Public method: Flajolet et al. 2007 (HyperLogLog), the standard m=2^p
registers with the 2.5m small-range linear-counting correction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _base_hash64


def _bit_length(col: Column) -> Column:
    """Number of binary digits of a non-negative BIGINT (0 → treated by
    callers).  conv(x, 10, 2) renders the minimal binary string in both
    Spark and DuckDB (bin(x)), so its length IS the bit length."""
    return F.length(F.conv(col.cast("string"), 10, 2))


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = 8,
    hash_kind: str = "md5",
) -> DataFrame:
    """Build the (bucket, rho) register relation for a column: bucket =
    top ``p`` bits of the 60-bit portable hash, rho = leading-zero count
    of the remaining 60−p bits + 1 (all-zero remainder → 60−p+1).
    NULLs are excluded (distinct-count semantics).  Output ≤ 2^p rows."""
    rem_bits = 60 - p
    h = _base_hash64(F.col(col).cast("string"), hash_kind)
    bucket = F.shiftright(h, rem_bits).cast("int")
    rest = h.bitwiseAND(F.lit((1 << rem_bits) - 1))
    rho = F.when(rest == 0, F.lit(rem_bits + 1)).otherwise(
        rem_bits - _bit_length(rest) + 1
    ).cast("int")
    return (
        df.where(F.col(col).isNotNull())
        .select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*register_relations: DataFrame) -> DataFrame:
    """Fold any number of register relations into one — union + max per
    bucket.  Associative and idempotent: per-shard sketches persisted
    daily can merge into weekly/monthly counts without rescanning."""
    if not register_relations:
        raise ValueError("hll_merge needs at least one register relation")
    u = register_relations[0]
    for r in register_relations[1:]:
        u = u.unionByName(r)
    return u.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """Cardinality estimate from a register relation.  The harmonic sum
    runs in INTEGER arithmetic (Σ 2^(53−rho), absent buckets contribute
    2^53), so the estimate double is bit-identical across engines;
    the ≤2.5m small-range case switches to linear counting m·ln(m/V).
    Returns 1 row (n_buckets_used, estimate)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(F.expr("CAST(shiftleft(1L, 53 - rho) AS BIGINT)")).alias("__s__"),
    )
    used = F.col("used")
    s_total = (F.col("__s__") + (F.lit(m) - used) * F.lit(1 << 53)).cast("double")
    raw = F.lit(alpha * m * m * float(1 << 53)) / s_total
    v = F.lit(m) - used  # zero registers
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return agg.select(used.alias("n_buckets_used"), est.alias("estimate"))


def hll_count(df: DataFrame, col: str, p: int = 8, hash_kind: str = "md5") -> DataFrame:
    """One-call distinct-count estimate (build + estimate)."""
    return hll_estimate(hll_registers(df, col, p, hash_kind), p)


# ---------------------------------------------------------- count-min
def cms_build(
    df: DataFrame,
    col: str,
    d: int = 4,
    w: int = 1024,
    hash_kind: str = "md5",
) -> DataFrame:
    """Count-Min sketch as a plain (row, bucket, count) RELATION: d
    independent hash rows of w counters — the fixed-memory frequency
    summary for heavy-hitter screens over unbounded key domains.
    Mergeable by SUM (fold per-shard sketches without rescanning);
    estimates are upper bounds (never undercount).  Output ≤ d·w rows;
    the build is one explode-by-d + map-side-combined count."""
    rows = []
    for i in range(d):
        h = _base_hash64(F.concat_ws("#", F.lit(str(i)), F.col(col).cast("string")), hash_kind)
        rows.append(F.struct(F.lit(i).alias("row"), F.pmod(h, F.lit(w)).alias("bucket")))
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(F.array(*rows)).alias("rb"))
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Fold count-min relations: union + SUM per (row, bucket)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("row", "bucket").agg(F.sum("count").alias("count"))


def cms_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    hash_kind: str = "md5",
) -> DataFrame:
    """Point-frequency estimates for a key relation: each key probes its
    d counters (equi-join on (row, bucket) — the sketch side is ≤ d·w
    rows and broadcasts) and takes the MIN.  Absent counters read 0.
    Returns (key, est)."""
    rows = []
    for i in range(d):
        h = _base_hash64(F.concat_ws("#", F.lit(str(i)), F.col(key_col).cast("string")), hash_kind)
        rows.append(F.struct(F.lit(i).alias("row"), F.pmod(h, F.lit(w)).alias("bucket")))
    probes = keys.select(
        F.col(key_col), F.explode(F.array(*rows)).alias("rb")
    ).select(key_col, "rb.row", "rb.bucket")
    j = probes.join(F.broadcast(sketch), on=["row", "bucket"], how="left")
    return (
        j.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("count"), F.lit(0))).alias("est"))
    )


def hll_registers_by(
    df: DataFrame,
    group_cols: list[str] | str,
    col: str,
    p: int = 8,
    hash_kind: str = "md5",
) -> DataFrame:
    """Per-group register relations: (group…, bucket, rho) — the
    persistable sketch table a 100 TB ingest writes once per
    partition/day and folds later.  ≤ 2^p rows per group."""
    glist = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    rem_bits = 60 - p
    h = _base_hash64(F.col(col).cast("string"), hash_kind)
    bucket = F.shiftright(h, rem_bits).cast("int")
    rest = h.bitwiseAND(F.lit((1 << rem_bits) - 1))
    rho = F.when(rest == 0, F.lit(rem_bits + 1)).otherwise(
        rem_bits - _bit_length(rest) + 1
    ).cast("int")
    return (
        df.where(F.col(col).isNotNull())
        .select(*glist, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*glist, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_trailing_estimate(
    registers: DataFrame,
    time_col: str,
    trailing: int,
    p: int = 8,
) -> DataFrame:
    """Trailing-window distinct counts from periodic sketches: for each
    time bucket t, merge the registers of (t−trailing+1 … t) with a
    range-frame MAX per (bucket,) and estimate — "trailing-24h active
    users from hourly sketches" without ever rescanning raw events.

    The merge is a rangeBetween window over the REGISTER relation
    (≤ 2^p rows per period), so the whole rollup costs
    O(periods · 2^p) — independent of event volume.  Estimation inherits
    hll_estimate's integer-harmonic portability.  Returns
    (time, n_buckets_used, estimate)."""
    from pyspark.sql import Window
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # dense (time × observed bucket) grid so every period sees every
    # bucket that occurs anywhere in its trailing range
    times = registers.select(F.col(time_col).alias("t")).distinct()
    buckets = registers.select("bucket").distinct()
    grid = times.crossJoin(buckets)
    j = grid.join(
        registers.select(F.col(time_col).alias("t"), "bucket", "rho"),
        on=["t", "bucket"], how="left",
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("t")
        .rangeBetween(-(trailing - 1), 0)
    )
    merged = j.select(
        "t", "bucket", F.max("rho").over(w).alias("rho")
    ).where(F.col("rho").isNotNull())
    agg = merged.groupBy("t").agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(F.expr("CAST(shiftleft(1L, 53 - rho) AS BIGINT)")).alias("__s__"),
    )
    used = F.col("used")
    s_total = (F.col("__s__") + (F.lit(m) - used) * F.lit(1 << 53)).cast("double")
    raw = F.lit(alpha * m * m * float(1 << 53)) / s_total
    v = F.lit(m) - used
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return agg.select(
        F.col("t").alias(time_col), used.alias("n_buckets_used"), est.alias("estimate")
    )


# ------------------------------------------------- histogram quantiles
def hist_sketch(
    df: DataFrame,
    col: str,
    bins: int = 256,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Fixed-grid histogram sketch: (bucket, count) over [lo, hi) with
    edge clamping — the mergeable (SUM) quantile summary for columns
    with a known range.  ≤ ``bins`` rows; one map-side-combined count."""
    x = F.col(col).cast("double")
    b = F.floor((x - lo) / (hi - lo) * bins)
    b = F.greatest(F.lit(0), F.least(F.lit(bins - 1), b)).cast("int")
    return (
        df.where(x.isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Fold histogram sketches: union + SUM per bucket."""
    if not sketches:
        raise ValueError("hist_merge needs at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("bucket").agg(F.sum("count").alias("count"))


def hist_quantile(
    sketch: DataFrame,
    qs: list[tuple[int, int]],
    bins: int = 256,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Quantile estimates from a histogram sketch at rational targets
    ``qs`` = [(num, den), …]: the answer is the LEFT EDGE of the first
    bucket whose cumulative count reaches q·total — the reach test is
    all-integer (cum·den ≥ num·total), the edge value one exact
    bucket→double expression, so estimates are engine-identical and the
    error is bounded by one bucket width.  Returns (q_num, q_den,
    quantile_est)."""
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bucket",
        F.sum("count").over(w).alias("__cum__"),
    ).crossJoin(F.broadcast(sketch.agg(F.sum("count").alias("__tot__"))))
    outs = []
    for num, den in qs:
        first = (
            cum.where(F.col("__cum__") * den >= F.col("__tot__") * num)
            .agg(F.min("bucket").alias("__b__"))
            .select(
                F.lit(num).alias("q_num"), F.lit(den).alias("q_den"),
                (F.lit(lo) + F.col("__b__").cast("double") * ((hi - lo) / bins)).alias("quantile_est"),
            )
        )
        outs.append(first)
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return u


# -------------------------------------------------------- KMV (bottom-k)
def kmv_sketch(
    df: DataFrame,
    col: str,
    k: int = 64,
    hash_kind: str = "md5",
) -> DataFrame:
    """KMV (bottom-k / theta) sketch: the k SMALLEST distinct hash
    values of a column — simultaneously a distinct-count estimator and
    a deterministic uniform sample of the distinct domain (the rows
    whose hashes they are).  Mergeable: union two sketches and re-take
    the bottom k.  Returns (hv, value) — ≤ k rows."""
    h = _base_hash64(F.col(col).cast("string"), hash_kind)
    d = (
        df.where(F.col(col).isNotNull())
        .select(h.alias("hv"), F.col(col).alias("value"))
        .groupBy("hv")
        .agg(F.min("value").alias("value"))
    )
    # orderBy + limit plans as TakeOrderedAndProject — per-partition
    # bottom-k then a k-row driver merge, never a single-partition sort
    return d.orderBy("hv").limit(k)


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Union + bottom-k — the KMV fold."""
    u = a.unionByName(b).groupBy("hv").agg(F.min("value").alias("value"))
    return u.orderBy("hv").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate (k−1)·H/h_k where h_k is the k-th
    smallest hash and H = 2^60 (the portable-hash range).  With fewer
    than k distinct hashes the sketch IS the domain — exact count.
    Integer inputs, one division: engine-identical."""
    agg = sketch.agg(F.count(F.lit(1)).alias("n"), F.max("hv").alias("hk"))
    est = F.when(
        F.col("n") < k, F.col("n").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << 60)) / F.col("hk").cast("double")
    )
    return agg.select(F.col("n").alias("n_in_sketch"), est.alias("estimate"))


def topk_frequent(
    df: DataFrame,
    item_col: str,
    k: int,
    n_shards: int = 64,
    by: list[str] | None = None,
) -> DataFrame:
    """EXACT global (or per-group) top-k most frequent items with a
    bounded merge — the distributed heavy-hitters shape.

    Counts reduce map-side (two-stage hash agg on the item), then each
    of ``n_shards`` hash-shards of the ITEM domain keeps its local
    top-k via a per-shard window (WindowGroupLimit: streaming k-row
    heaps before the exchange).  Because sharding is BY ITEM, every
    item's count lives in exactly one shard, so any global top-k item
    ranks ≤ k inside its own shard — the union of shard winners
    (≤ n_shards·k rows) provably contains the global top-k, which one
    tiny final sort extracts.  No single reducer ever sees the full
    item-count relation: the global sort input is n_shards·k rows
    regardless of domain size.

    Ties break by item value ascending (total order both stages), so
    the result is deterministic and SQL-replayable.
    """
    grp = list(by or [])
    counts = (
        df.groupBy(*grp, F.col(item_col).alias("item"))
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .withColumn("__shard__", F.pmod(F.xxhash64(F.col("item")), F.lit(n_shards)))
    )
    w_shard = Window.partitionBy(*grp, "__shard__").orderBy(
        F.col("freq").desc(), F.col("item")
    )
    shortlist = counts.withColumn("__r__", F.row_number().over(w_shard)).where(
        F.col("__r__") <= k
    )
    w_all = Window.partitionBy(*grp) if grp else Window.partitionBy(F.lit(1))
    w_final = w_all.orderBy(F.col("freq").desc(), F.col("item"))
    return (
        shortlist.withColumn("rank", F.row_number().over(w_final))
        .where(F.col("rank") <= k)
        .select(*grp, "item", "freq", F.col("rank").cast("long").alias("rank"))
    )
