"""Mergeable sketches with cross-engine-exact state: HyperLogLog
(distinct), count-min (frequency), Bloom (membership).

At 10^12 documents, "distinct docs per tile / users per day / tokens per
shard" cannot be a count-distinct (one corpus-sized shuffle per key and a
driver-sized distinct set); the standard answer is an HLL register
sketch: fixed 2^P-register state per key, built with ONE map-side-
combinable ``max`` aggregation, mergeable across partitions / days /
snapshots by register-wise ``max``. Spark's ``approx_count_distinct`` IS
that sketch, but its HLL++ register layout is engine-private — nothing
else can verify or merge it. This module builds the sketch from public
arithmetic so the register state itself is portable and value-checkable:

* item hash = md5 of the item's string bytes — bit-identical in the JVM,
  DuckDB, and Python (the `simhash_md5_pairs` discipline);
* register index = first 2 hex nibbles (P=8 → 256 registers); rank rho =
  1 + leading zero BITS of the next 13 nibbles (52 bits), derived with
  string arithmetic (strip leading '0' nibbles + a 4-way CASE on the
  first surviving nibble) — no float log2 anywhere;
* the estimator's harmonic sum runs in INTEGER arithmetic:
  sum(2^(53-rho)) as int64 (max 256 * 2^53 < 2^63), absent registers
  contributing 2^53 — exact and order-independent, so Spark's shuffle
  order and DuckDB's scan order produce the IDENTICAL double estimate;
* the only transcendental (ln in the small-range correction) is rounded
  to EST_DP before any hashing/comparison (CLAUDE.md libm-vs-JVM rule).

The reference has no sketch tier (its Count is exact, RTree.cs); this is
engine-new for the 100 TB metrics path (north_star's per-partition
metrics rows: a lineage row can carry a 256-byte register state and the
daily rollup merges them without re-reading data).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 8                       # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_RHO_BITS = 52               # rank drawn from 13 hex nibbles
POW53 = 1 << 53                 # integer weight of an empty register
# alpha_256, precomputed once in Python so both engines embed the same
# double literal instead of re-deriving it in their own float order
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
EST_DP = 4


# --- register derivation: one definition, three engines ----------------------

def hll_register_cols(item: Column) -> tuple[Column, Column]:
    """(register, rho) Columns from md5(item-as-string). Pure codegen'd
    string/CASE arithmetic — exact, no transcendentals."""
    h = F.md5(item.cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    hex13 = F.substring(h, 3, 13)
    stripped = F.regexp_replace(hex13, "^0+", "")
    nz = F.lit(13) - F.length(stripped)
    first = F.substring(stripped, 1, 1)
    bits = (F.when(first.isin(*"89abcdef"), 4)
             .when(first.isin(*"4567"), 3)
             .when(first.isin("2", "3"), 2)
             .otherwise(1))
    rho = F.when(F.length(stripped) == 0, F.lit(HLL_RHO_BITS + 1)) \
        .otherwise(nz * 4 + (F.lit(5) - bits)).cast("long")
    return reg, rho


def hll_register_sql(item_expr: str) -> tuple[str, str]:
    """DuckDB∩Spark-dialect twins of hll_register_cols (same op order).
    Register decode is per-nibble strpos (DuckDB has no conv)."""
    h = f"md5(CAST({item_expr} AS VARCHAR))"
    nib = "(strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1)"
    reg = (f"CAST({nib.format(h=h, i=1)} * 16 "
           f"+ {nib.format(h=h, i=2)} AS BIGINT)")
    stripped = f"regexp_replace(substr({h}, 3, 13), '^0+', '')"
    first = f"substr({stripped}, 1, 1)"
    bits = (f"(CASE WHEN {first} >= '8' THEN 4 "
            f"WHEN {first} >= '4' THEN 3 "
            f"WHEN {first} >= '2' THEN 2 ELSE 1 END)")
    rho = (f"CAST(CASE WHEN length({stripped}) = 0 THEN {HLL_RHO_BITS + 1} "
           f"ELSE (13 - length({stripped})) * 4 + (5 - {bits}) "
           f"END AS BIGINT)")
    return reg, rho


def hll_register_py(item: str) -> tuple[int, int]:
    """Pure-Python twin (pytest ground truth)."""
    h = hashlib.md5(item.encode()).hexdigest()
    reg = int(h[:2], 16)
    v = int(h[2:15], 16)
    rho = HLL_RHO_BITS + 1 if v == 0 else HLL_RHO_BITS - v.bit_length() + 1
    return reg, rho


# --- sketch build / merge / estimate -----------------------------------------

def hll_sketch(df: DataFrame, key_cols: list[str], item_col: str) -> DataFrame:
    """(key..., register, rho) — the sketch state, one map-side-
    combinable max aggregation (at 100 TB: partials are 256 longs per
    key per task; the shuffle moves sketches, not items). Only registers
    that were hit appear; absent rows mean rho 0."""
    reg, rho = hll_register_cols(F.col(item_col))
    return (df.select(*key_cols, reg.alias("register"), rho.alias("__rho"))
              .groupBy(*key_cols, "register")
              .agg(F.max("__rho").alias("rho")))


def hll_merge(sketches: list[DataFrame], key_cols: list[str]) -> DataFrame:
    """Union of sketch states → register-wise max. Merging N days /
    partitions / snapshots never touches the underlying items."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*key_cols, "register").agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, key_cols: list[str]) -> DataFrame:
    """(key..., n_registers, estimate) from the sketch state. The
    harmonic sum is int64-exact (order-independent); estimate is the
    standard HLL form with the small-range (linear-counting) correction,
    rounded to EST_DP."""
    weight = F.round(F.pow(F.lit(2.0), F.lit(53) - F.col("rho"))) \
        .cast("long")
    agg = sketch.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(weight).alias("__s_hit"))
    zeros = F.lit(HLL_M) - F.col("n_registers")
    s_int = F.col("__s_hit") + zeros * F.lit(POW53)
    # the numerator literal is the SAME Python-precomputed double the SQL
    # twin embeds — neither engine re-derives it in its own float order
    raw = (F.lit(HLL_ALPHA * HLL_M * HLL_M * float(POW53))
           / s_int.cast("double"))
    small = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M))
                                        / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (zeros > 0), small) \
        .otherwise(raw)
    return agg.select(*key_cols, "n_registers",
                      F.round(est, EST_DP).alias("estimate"))


def hll_estimate_sql(table_expr: str, key_expr: str, item_expr: str,
                     key_name: str = "key") -> str:
    """DuckDB twin: registers → estimate in one query. The estimator
    numerator alpha*m^2*2^53 is precomputed in Python and embedded as ONE
    double literal (repr round-trips exactly) so neither engine re-derives
    it in its own multiplication order; the harmonic sum is the same
    int64-exact form as the Column version."""
    reg, rho = hll_register_sql(item_expr)
    numer = repr(HLL_ALPHA * HLL_M * HLL_M * float(POW53))
    raw = (f"({numer} / CAST(s_hit + ({HLL_M} - n_registers)"
           f" * CAST({POW53} AS BIGINT) AS DOUBLE))")
    return f"""
        WITH regs AS (
            SELECT {key_expr} AS {key_name}, {reg} AS register,
                   max({rho}) AS rho
            FROM {table_expr}
            GROUP BY 1, 2
        ), agg AS (
            SELECT {key_name},
                   CAST(count(*) AS BIGINT) AS n_registers,
                   CAST(sum(CAST(round(pow(2.0, 53 - rho)) AS BIGINT))
                        AS BIGINT) AS s_hit
            FROM regs GROUP BY 1
        )
        SELECT {key_name}, n_registers,
               round(CASE WHEN {raw} <= {2.5 * HLL_M!r}
                          AND n_registers < {HLL_M}
                     THEN {float(HLL_M)!r}
                          * ln({float(HLL_M)!r}
                               / CAST({HLL_M} - n_registers AS DOUBLE))
                     ELSE {raw}
                     END, {EST_DP}) AS estimate
        FROM agg
    """


def hll_estimate_py(items: list[str]) -> float:
    """Pure-Python twin of sketch→estimate (pytest ground truth)."""
    regs = [0] * HLL_M
    for it in items:
        r, rho = hll_register_py(it)
        regs[r] = max(regs[r], rho)
    s_int = sum(1 << (53 - v) for v in regs)
    zeros = regs.count(0)
    raw = HLL_ALPHA * HLL_M * HLL_M * float(POW53) / float(s_int)
    if raw <= 2.5 * HLL_M and zeros > 0:
        return round(HLL_M * math.log(HLL_M / zeros), EST_DP)
    return round(raw, EST_DP)


# --- count-min sketch: mergeable-by-SUM frequency counters -------------------
#
# The frequency-side companion of the HLL tier: "how often does token /
# url / user X occur per shard" at 10^12 rows cannot be an exact groupBy
# per candidate set (one corpus-sized shuffle per question); a count-min
# sketch is a fixed D×W counter grid per key, built with ONE map-side-
# combinable SUM aggregation, mergeable across partitions / days /
# snapshots by counter-wise ADDITION (strictly mergeable — no max
# semantics needed), and point-queried as min over the D hashed cells
# (an overestimate, never an underestimate, by construction). Counters
# are integer sums → the sketch STATE is bit-exact across Spark, DuckDB
# and Python with no rounding discipline at all; bucket d of an item is
# byte d of its md5 (the same public-hash trick as the HLL register).

CM_D = 4                        # hash rows
CM_W = 256                      # buckets per row (one md5 byte)


def cm_bucket_col(item: Column, d: int) -> Column:
    """Bucket of ``item`` in hash row ``d`` (byte d of md5) — codegen'd."""
    h = F.md5(item.cast("string"))
    return F.conv(F.substring(h, 2 * d + 1, 2), 16, 10).cast("long")


def cm_bucket_sql(item_expr: str, d: int) -> str:
    """DuckDB twin of cm_bucket_col (per-nibble strpos decode)."""
    h = f"md5(CAST({item_expr} AS VARCHAR))"
    nib = f"(strpos('0123456789abcdef', substr({h}, {{i}}, 1)) - 1)"
    return (f"CAST({nib.format(i=2 * d + 1)} * 16 "
            f"+ {nib.format(i=2 * d + 2)} AS BIGINT)")


def cm_bucket_py(item: str, d: int) -> int:
    """Pure-Python twin (pytest ground truth)."""
    return int(hashlib.md5(item.encode()).hexdigest()[2 * d:2 * d + 2], 16)


def cm_sketch(df: DataFrame, key_cols: list[str], item_col: str,
              weight_col: str | None = None) -> DataFrame:
    """(key..., row, col, cnt) — the counter state, one map-side-
    combinable SUM aggregation (partials are ≤ D·W longs per key per
    task; the shuffle moves counters, not items). Absent (row, col)
    cells are exact zeros."""
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    cells = F.array(*[
        F.struct(F.lit(d).cast("long").alias("row"),
                 cm_bucket_col(F.col(item_col), d).alias("col"))
        for d in range(CM_D)])
    return (df.select(*key_cols, F.explode(cells).alias("c"),
                      w.alias("__w"))
              .select(*key_cols, F.col("c.row").alias("row"),
                      F.col("c.col").alias("col"), "__w")
              .groupBy(*key_cols, "row", "col")
              .agg(F.sum("__w").alias("cnt")))


def cm_merge(sketches: list[DataFrame], key_cols: list[str]) -> DataFrame:
    """Union of counter states → counter-wise SUM. Merging N days /
    partitions / snapshots never touches the underlying items, and —
    unlike HLL — merge is exact: counters add."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*key_cols, "row", "col").agg(
        F.sum("cnt").alias("cnt"))


def cm_query(sketch: DataFrame, probes: DataFrame, key_cols: list[str],
             item_col: str) -> DataFrame:
    """Point-query: (key..., item, est) where est = min over the D rows
    of the item's counter cell (0 when the cell was never hit). The
    probe side explodes to D rows and LEFT-joins the sketch — the
    sketch is the small side (≤ D·W rows per key) so Catalyst
    broadcasts it; the corpus is never touched."""
    cells = F.array(*[
        F.struct(F.lit(d).cast("long").alias("row"),
                 cm_bucket_col(F.col(item_col), d).alias("col"))
        for d in range(CM_D)])
    p = (probes.select(*key_cols, F.col(item_col).alias("__item"),
                       F.explode(cells).alias("c"))
         .select(*key_cols, "__item", F.col("c.row").alias("row"),
                 F.col("c.col").alias("col")))
    joined = p.join(F.broadcast(sketch), [*key_cols, "row", "col"], "left")
    return (joined.groupBy(*key_cols, "__item")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
                 .alias("est"))
            .withColumnRenamed("__item", item_col))


def cm_counters_sql(table_expr: str, key_expr: str, item_expr: str,
                    weight_expr: str = "1") -> str:
    """DuckDB twin of cm_sketch: UNION ALL over the D fixed hash rows
    (key, row, col, cnt) — counter-exact vs the Spark state."""
    parts = [
        f"SELECT {key_expr} AS key, CAST({d} AS BIGINT) AS row, "
        f"{cm_bucket_sql(item_expr, d)} AS col, "
        f"CAST(sum({weight_expr}) AS BIGINT) AS cnt "
        f"FROM {table_expr} GROUP BY 1, 3"
        for d in range(CM_D)]
    return " UNION ALL ".join(parts)


def cm_query_sql(counters_sql: str, probes_sql: str,
                 item_expr: str = "item") -> str:
    """DuckDB twin of cm_query: probes × D rows LEFT JOIN the counter
    CTE, min(coalesce(cnt, 0)) per (key, item). ``probes_sql`` must
    yield (key, item)."""
    probe_rows = " UNION ALL ".join(
        f"SELECT key, {item_expr} AS item, CAST({d} AS BIGINT) AS row, "
        f"{cm_bucket_sql(item_expr, d)} AS col FROM probes"
        for d in range(CM_D))
    return f"""
        WITH counters AS ({counters_sql}),
        probes AS ({probes_sql}),
        cells AS ({probe_rows})
        SELECT cells.key, cells.item,
               CAST(min(coalesce(counters.cnt, 0)) AS BIGINT) AS est
        FROM cells LEFT JOIN counters
          ON cells.key = counters.key AND cells.row = counters.row
         AND cells.col = counters.col
        GROUP BY 1, 2
    """


def cm_query_py(items: list[str], probe: str) -> int:
    """Pure-Python twin: build the counters, query one probe."""
    counters: dict[tuple[int, int], int] = {}
    for it in items:
        for d in range(CM_D):
            c = (d, cm_bucket_py(it, d))
            counters[c] = counters.get(c, 0) + 1
    return min(counters.get((d, cm_bucket_py(probe, d)), 0)
               for d in range(CM_D))


# --- Bloom filter: OR-mergeable membership sketch ----------------------------
#
# The membership side of the sketch triple (HLL = distinct, CMS =
# frequency, Bloom = membership). At 100 TB the canonical use is JOIN
# PRUNING: build the filter over the SMALL side's keys (eval set,
# dimension keys), broadcast the ~kB bitmap, and drop non-matching
# corpus rows MAP-SIDE before any shuffle — no false negatives, a
# bounded false-positive rate, and merge across partitions/days is
# bitwise OR (idempotent, so the streaming story is the HLL algebra,
# not the CMS delta-dir one). Bit positions come from md5 nibble
# triplets (4096-bit filter = 3 nibbles per position, K=4 positions
# from 12 nibbles) — bit-exact across Spark, DuckDB and Python.

BF_K = 4                        # hash positions per item
BF_BITS = 4096                  # filter width (64 words × 64 bits)
BF_WORDS = BF_BITS // 64


def bf_position_col(item: Column, d: int) -> Column:
    """Bit position of ``item`` for hash d (md5 nibbles 3d+1..3d+3)."""
    h = F.md5(item.cast("string"))
    return F.conv(F.substring(h, 3 * d + 1, 3), 16, 10).cast("long")


def bf_position_sql(item_expr: str, d: int) -> str:
    """DuckDB twin of bf_position_col."""
    h = f"md5(CAST({item_expr} AS VARCHAR))"
    nib = f"(strpos('0123456789abcdef', substr({h}, {{i}}, 1)) - 1)"
    return (f"CAST({nib.format(i=3 * d + 1)} * 256 "
            f"+ {nib.format(i=3 * d + 2)} * 16 "
            f"+ {nib.format(i=3 * d + 3)} AS BIGINT)")


def bf_position_py(item: str, d: int) -> int:
    """Pure-Python twin (pytest ground truth)."""
    return int(hashlib.md5(item.encode()).hexdigest()[3 * d:3 * d + 3], 16)


# 1<<63 doesn't fit a signed long literal — bit 63 is min-long; a mask
# lookup table sidesteps F.shiftleft's int-literal-only amount
_POW2 = [1 << b for b in range(63)] + [-(1 << 63)]


def _mask_col(bit: Column) -> Column:
    """Single-bit int64 mask for a [0, 64) bit index Column."""
    arr = F.array(*[F.lit(v).cast("long") for v in _POW2])
    return F.element_at(arr, bit.cast("int") + 1)


def bf_build(df: DataFrame, key_cols: list[str], item_col: str) -> DataFrame:
    """(key..., word, bits) — the sparse bitmap state, one map-side-
    combinable bit_or aggregation (partials are ≤ BF_WORDS longs per
    key per task). Absent words are zero."""
    positions = F.array(*[bf_position_col(F.col(item_col), d)
                          for d in range(BF_K)])
    return (df.select(*key_cols, F.explode(positions).alias("__pos"))
              .select(*key_cols, (F.col("__pos") / 64).cast("long")
                      .alias("word"),
                      _mask_col(F.col("__pos") % 64).alias("__m"))
              .groupBy(*key_cols, "word")
              .agg(F.bit_or("__m").alias("bits")))


def bf_merge(filters: list[DataFrame], key_cols: list[str]) -> DataFrame:
    """Union of bitmap states → word-wise OR (idempotent — replaying a
    batch re-ORs to the same state, the HLL exactly-once algebra)."""
    out = filters[0]
    for s in filters[1:]:
        out = out.unionByName(s)
    return out.groupBy(*key_cols, "word").agg(F.bit_or("bits").alias("bits"))


def bf_might_contain(bf: DataFrame, probes: DataFrame, key_cols: list[str],
                     item_col: str) -> DataFrame:
    """(key..., item, member) — member=1 iff ALL K positions are set
    (no false negatives by construction). Probe side explodes to K
    rows, LEFT-joins the (tiny) bitmap, and requires K hits."""
    positions = F.array(*[bf_position_col(F.col(item_col), d)
                          for d in range(BF_K)])
    p = (probes.select(*key_cols, F.col(item_col).alias("__item"),
                       F.explode(positions).alias("__pos"))
         .select(*key_cols, "__item", (F.col("__pos") / 64).cast("long")
                 .alias("word"), (F.col("__pos") % 64).alias("__bit")))
    hit = (F.coalesce(F.col("bits"), F.lit(0))
           .bitwiseAND(_mask_col(F.col("__bit"))) != 0).cast("long")
    joined = p.join(F.broadcast(bf), [*key_cols, "word"], "left")
    return (joined.groupBy(*key_cols, "__item")
            .agg((F.sum(hit) == BF_K).cast("long").alias("member"))
            .withColumnRenamed("__item", item_col))


def bf_prune_col(state_rows: list, item: Column) -> Column:
    """MAP-SIDE membership test as a pure Column expression — the join-
    pruning shape: ``state_rows`` is the COLLECTED bitmap (rows with
    .word/.bits, ≤ BF_WORDS of them — kilobytes), embedded as a literal
    array so the corpus side needs no join, no shuffle, no Python.
    Returns a boolean Column (true = possibly present)."""
    words = [0] * BF_WORDS
    for r in state_rows:
        words[int(r["word"])] = int(r["bits"])
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    checks = []
    for d in range(BF_K):
        pos = bf_position_col(item, d)
        w = F.element_at(arr, ((pos / 64).cast("int") + 1))
        checks.append(w.bitwiseAND(_mask_col(pos % 64)) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


# DuckDB raises on 1 << 63 (overflow-checked shift) — embed the same
# signed-mask lookup table the Column side uses, as a literal list
_MASK_LIST_SQL = ("[" + ", ".join(
    [str(1 << b) for b in range(63)] + ["(-9223372036854775807 - 1)"])
    + "]")


def _mask_sql(bit_expr: str) -> str:
    return f"CAST({_MASK_LIST_SQL}[CAST({bit_expr} AS INT) + 1] AS BIGINT)"


def bf_build_sql(table_expr: str, key_expr: str, item_expr: str) -> str:
    """DuckDB twin of bf_build: (key, word, bits) — bit-exact vs Spark."""
    parts = " UNION ALL ".join(
        f"SELECT {key_expr} AS key, {bf_position_sql(item_expr, d)} AS pos "
        f"FROM {table_expr}" for d in range(BF_K))
    return f"""
        SELECT key, CAST(pos // 64 AS BIGINT) AS word,
               CAST(bit_or({_mask_sql("pos % 64")}) AS BIGINT) AS bits
        FROM ({parts}) p GROUP BY 1, 2
    """


def bf_member_sql(bf_sql: str, probes_sql: str,
                  item_expr: str = "item") -> str:
    """DuckDB twin of bf_might_contain. ``probes_sql`` yields
    (key, item)."""
    cells = " UNION ALL ".join(
        f"SELECT key, {item_expr} AS item, "
        f"CAST({bf_position_sql(item_expr, d)} // 64 AS BIGINT) AS word, "
        f"CAST({bf_position_sql(item_expr, d)} % 64 AS INT) AS bit "
        f"FROM probes" for d in range(BF_K))
    return f"""
        WITH bf AS ({bf_sql}), probes AS ({probes_sql}),
        cells AS ({cells})
        SELECT cells.key, cells.item,
               CAST(CASE WHEN sum(CASE WHEN
                      (coalesce(bf.bits, 0)
                       & {_mask_sql("cells.bit")}) <> 0
                      THEN 1 ELSE 0 END) = {BF_K}
                    THEN 1 ELSE 0 END AS BIGINT) AS member
        FROM cells LEFT JOIN bf
          ON cells.key = bf.key AND cells.word = bf.word
        GROUP BY 1, 2
    """


def bf_member_py(items: list[str], probe: str) -> int:
    """Pure-Python twin: build the bitmap, test one probe."""
    words = [0] * BF_WORDS
    for it in items:
        for d in range(BF_K):
            p = bf_position_py(it, d)
            words[p // 64] |= 1 << (p % 64)
    return int(all(words[bf_position_py(probe, d) // 64]
                   >> (bf_position_py(probe, d) % 64) & 1
                   for d in range(BF_K)))


# --- fixed-histogram quantile sketch: mergeable-by-SUM -----------------------
#
# The quantile side of the sketch family. KLL/t-digest state depends on
# randomized compaction — useless for cross-engine value checks — so
# this takes the deterministic fixed-grid route: a (key, bin, cnt)
# histogram over a DECLARED value domain [lo, hi), mergeable by
# counter-wise sum (the CMS algebra), with interpolated quantile
# estimates whose float arithmetic is replayed operation-for-operation
# in DuckDB. Error is bounded by the bin width (hi−lo)/bins — the
# honest trade for determinism, and at 100 TB the state per key is
# ≤ bins longs no matter how many rows contributed.
#
# Quantile contract: q ∈ (0, 1]. The target rank is q·total; the
# selected bin is the unique one whose cumulative count first reaches
# the target, with linear interpolation inside the bin.

QH_BINS = 256


def qh_bin_col(value: Column, lo: float, hi: float,
               bins: int = QH_BINS) -> Column:
    """Histogram bin of ``value`` — clamped so out-of-domain values
    land in the edge bins (same clamp as grid.quantize)."""
    width = (hi - lo) / bins
    b = F.floor((value - F.lit(lo)) / F.lit(width))
    return F.greatest(F.least(b, F.lit(bins - 1)), F.lit(0)).cast("long")


def qh_sketch(df: DataFrame, key_cols: list[str], value_col: str,
              lo: float, hi: float, bins: int = QH_BINS) -> DataFrame:
    """(key..., bin, cnt) — one map-side-combinable sum aggregation."""
    return (df.select(*key_cols,
                      qh_bin_col(F.col(value_col), lo, hi, bins)
                      .alias("bin"))
              .groupBy(*key_cols, "bin")
              .agg(F.count(F.lit(1)).alias("cnt")))


def qh_merge(sketches: list[DataFrame], key_cols: list[str]) -> DataFrame:
    """Union of histogram states → bin-wise sum (exact merge)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*key_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def qh_quantiles(sketch: DataFrame, key_cols: list[str], qs: list[float],
                 lo: float, hi: float, bins: int = QH_BINS) -> DataFrame:
    """(key..., q, est) — interpolated quantile per requested q.

    target = q·total; the selected bin is the unique one with
    cum−cnt < target ≤ cum; est = lo + (bin + (target−(cum−cnt))/cnt)
    ·width, rounded to EST_DP. Every float op (including q·total) uses
    the same literals and order as the SQL twin, so knife-edge targets
    that land exactly on a bin boundary branch identically in both
    engines."""
    from pyspark.sql import Window
    width = (hi - lo) / bins
    w = (Window.partitionBy(*key_cols).orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy(*key_cols)
    cum = (sketch.withColumn("cum", F.sum("cnt").over(w))
           .withColumn("total", F.sum("cnt").over(wt)))
    qdf = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    x = cum.select(*key_cols, "bin", "cnt", "cum", "total", qdf)
    target = F.col("q") * F.col("total").cast("double")
    hit = x.filter(((F.col("cum") - F.col("cnt")).cast("double") < target)
                   & (F.col("cum").cast("double") >= target))
    frac = ((target - (F.col("cum") - F.col("cnt")).cast("double"))
            / F.col("cnt").cast("double"))
    est = (F.lit(lo)
           + (F.col("bin").cast("double") + frac) * F.lit(width))
    return hit.select(*key_cols, "q",
                      F.round(est, EST_DP).alias("est"))


def qh_sketch_sql(table_expr: str, key_expr: str, value_expr: str,
                  lo: float, hi: float, bins: int = QH_BINS) -> str:
    """DuckDB twin of qh_sketch (same clamp, same width literal)."""
    width = (hi - lo) / bins
    b = f"CAST(floor(({value_expr} - {lo!r}) / {width!r}) AS BIGINT)"
    return f"""
        SELECT {key_expr} AS key,
               greatest(least({b}, {bins - 1}), 0) AS bin,
               CAST(count(*) AS BIGINT) AS cnt
        FROM {table_expr} GROUP BY 1, 2
    """


def qh_quantiles_sql(sketch_sql: str, qs: list[float], lo: float,
                     hi: float, bins: int = QH_BINS) -> str:
    """DuckDB twin of qh_quantiles — identical float ops and branch
    predicate."""
    width = (hi - lo) / bins
    # bare literals parse as DECIMAL in DuckDB (repo VALUES→DECIMAL
    # rule) — force DOUBLE so q·total multiplies in the same type Spark
    # uses
    q_list = ", ".join(f"CAST({float(q)!r} AS DOUBLE)" for q in qs)
    return f"""
        WITH h AS ({sketch_sql}),
        c AS (
          SELECT key, bin, cnt,
                 sum(cnt) OVER (PARTITION BY key ORDER BY bin
                                ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(cnt) OVER (PARTITION BY key) AS total
          FROM h),
        x AS (SELECT c.*, q FROM c CROSS JOIN (
                SELECT unnest([{q_list}]) AS q) qs)
        SELECT key, q,
               round({lo!r} + (CAST(bin AS DOUBLE)
                     + (q * CAST(total AS DOUBLE)
                        - CAST(cum - cnt AS DOUBLE))
                       / CAST(cnt AS DOUBLE)) * {width!r},
                     {EST_DP}) AS est
        FROM x
        WHERE CAST(cum - cnt AS DOUBLE) < q * CAST(total AS DOUBLE)
          AND CAST(cum AS DOUBLE) >= q * CAST(total AS DOUBLE)
    """


def _round_half_up(x: float, dp: int) -> float:
    """Spark's F.round semantics (BigDecimal.valueOf → HALF_UP on the
    shortest decimal repr). Python's round() is banker's — it diverges
    exactly when an estimate lands on a half boundary, which the
    power-of-two bin widths here make common (e.g. 99.53125 @ 4dp)."""
    import decimal
    d = decimal.Decimal(repr(x)).quantize(
        decimal.Decimal(1).scaleb(-dp), rounding=decimal.ROUND_HALF_UP)
    return float(d)


def qh_quantile_py(values: list[float], q: float, lo: float, hi: float,
                   bins: int = QH_BINS) -> float:
    """Pure-Python twin (pytest ground truth)."""
    width = (hi - lo) / bins
    hist = [0] * bins
    for v in values:
        b = int(math.floor((v - lo) / width))
        hist[max(min(b, bins - 1), 0)] += 1
    total = len(values)
    target = q * total
    cum = 0
    for b, cnt in enumerate(hist):
        if cnt == 0:
            continue
        prev = cum
        cum += cnt
        if prev < target <= cum:
            frac = (target - prev) / cnt
            return _round_half_up(lo + (b + frac) * width, EST_DP)
    raise ValueError("q out of (0, 1] or empty input")


# --- KMV / theta sketch: bottom-k distinct hashes, SET ALGEBRA ---------------
#
# The set-operation companion of the HLL tier. HLL answers |A| and (by
# register-max merge) |A ∪ B|, but it cannot intersect: there is no
# register arithmetic for |A ∩ B|. The standard answer (DataSketches
# theta / KMV) keeps the K MINIMUM distinct hash values per key. That
# state is
#   * mergeable EXACTLY: bottom-K of a union only ever needs each side's
#     bottom-K (union = re-rank the concatenated samples) — so per-
#     partition / per-day / per-snapshot sketches roll up without
#     re-reading items, like every sketch in this module;
#   * intersectable: with theta = the Kth minimum (the sample is a
#     uniform coin-flip sample of the distinct items at rate theta/2^52),
#     |A ∩ B| ≈ |{h ∈ sample_A ∩ sample_B : h < min(theta_A, theta_B)}|
#     / (min theta / 2^52) — the theta-sketch a-priori estimator.
#
# Engine portability: the item hash is the first 13 md5 nibbles as an
# int64 in [0, 2^52) (the HLL rank draw, re-used as a uniform variate);
# ranking bottom-K over distinct hashes is pure relational algebra
# (row_number ≤ K) in both engines; the only float op in an estimate is
# ONE int64→double division, rounded to EST_DP (CLAUDE.md libm rule).
# Scale shape: the distinct pre-aggregation is map-side combined, and
# the rank shuffle is WindowGroupLimit-bounded — each map task forwards
# at most K rows per key, so the exchange moves O(K · keys · tasks)
# rows, never the corpus.

KMV_K = 64
POW52 = 1 << 52                 # hash domain size (theta of a non-full sketch)


def kmv_hash_col(item: Column) -> Column:
    """Uniform 52-bit int64 hash of ``item`` (first 13 md5 nibbles)."""
    return F.conv(F.substring(F.md5(item.cast("string")), 1, 13),
                  16, 10).cast("long")


def kmv_hash_sql(item_expr: str) -> str:
    """DuckDB twin (per-nibble strpos decode — DuckDB has no conv)."""
    h = f"md5(CAST({item_expr} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (12 - i)}" for i in range(13))
    return f"CAST({terms} AS BIGINT)"


def kmv_hash_py(item: str) -> int:
    """Pure-Python twin (pytest ground truth)."""
    return int(hashlib.md5(item.encode()).hexdigest()[:13], 16)


def kmv_sketch(df: DataFrame, key_cols: list[str], item_col: str,
               k: int = KMV_K) -> DataFrame:
    """(key..., rk, h) — the bottom-``k`` distinct item hashes per key,
    rank-ordered (rk 1..≤k). Two map-side-reduced exchanges: the
    (key, h) distinct, then the WindowGroupLimit-capped rank."""
    from pyspark.sql import Window
    w = Window.partitionBy(*key_cols).orderBy("h")
    return (df.select(*key_cols, kmv_hash_col(F.col(item_col)).alias("h"))
              .distinct()
              .withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= k))


def kmv_merge(sketches: list[DataFrame], key_cols: list[str],
              k: int = KMV_K) -> DataFrame:
    """Union of sample rows → distinct → re-rank → bottom-k. Exact:
    merge(bottom-k per part) == bottom-k(whole), because a union's k
    minima all come from some part's k minima."""
    from pyspark.sql import Window
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    w = Window.partitionBy(*key_cols).orderBy("h")
    return (out.select(*key_cols, "h").distinct()
               .withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") <= k))


def kmv_estimate(sketch: DataFrame, key_cols: list[str],
                 k: int = KMV_K) -> DataFrame:
    """(key..., n_sample, estimate). Non-full sketch (n < k): the sample
    IS the distinct set — exact count. Full: the classic KMV estimator
    (k-1) · 2^52 / h_(k) — one int64→double division, rounded EST_DP."""
    agg = sketch.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.max("h").alias("__hk"))
    est = F.when(F.col("n_sample") < k,
                 F.col("n_sample").cast("double")) \
        .otherwise(F.round(F.lit((k - 1) * POW52) / F.col("__hk"), EST_DP))
    return agg.select(*key_cols, "n_sample", est.alias("estimate"))


def kmv_theta_col(k: int = KMV_K) -> Column:
    """theta of a (n_sample, __hk) aggregate row: 2^52 when the sketch
    holds every distinct item, else the Kth minimum."""
    return F.when(F.col("n_sample") < k, F.lit(POW52)) \
        .otherwise(F.col("__hk"))


def kmv_intersect_pairs(sketch: DataFrame, key_col: str,
                        k: int = KMV_K) -> DataFrame:
    """(key_a, key_b, n_common, estimate) for every unordered key pair
    (key_a < key_b) of a single-key sketch — the theta-sketch
    intersection. t = min(theta_a, theta_b); the common-sample count
    below t scales by 2^52/t (exact when both sketches are complete).
    All joins here are sketch-sized (O(K · keys)), never corpus-sized."""
    stats = sketch.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_sample"), F.max("h").alias("__hk"))
    stats = stats.select(key_col, kmv_theta_col(k).alias("theta"))
    sa = sketch.select(F.col(key_col).alias("key_a"), "h")
    sb = sketch.select(F.col(key_col).alias("key_b"), "h")
    common = (sa.join(sb, ["h"]).filter(F.col("key_a") < F.col("key_b"))
                .join(F.broadcast(stats.select(
                    F.col(key_col).alias("key_a"),
                    F.col("theta").alias("ta"))), "key_a")
                .join(F.broadcast(stats.select(
                    F.col(key_col).alias("key_b"),
                    F.col("theta").alias("tb"))), "key_b")
                .withColumn("t", F.least("ta", "tb"))
                .filter((F.col("t") == POW52) | (F.col("h") < F.col("t")))
                .groupBy("key_a", "key_b", "t")
                .agg(F.count(F.lit(1)).alias("n_common")))
    pairs = (stats.select(F.col(key_col).alias("key_a"),
                          F.col("theta").alias("ta"))
                  .crossJoin(stats.select(F.col(key_col).alias("key_b"),
                                          F.col("theta").alias("tb")))
                  .filter(F.col("key_a") < F.col("key_b"))
                  .withColumn("t", F.least("ta", "tb"))
                  .select("key_a", "key_b", "t"))
    full = pairs.join(common, ["key_a", "key_b", "t"], "left") \
                .fillna({"n_common": 0})
    est = F.when(F.col("t") == POW52,
                 F.col("n_common").cast("double")) \
        .otherwise(F.round(F.col("n_common") * F.lit(POW52)
                           / F.col("t"), EST_DP))
    return full.select("key_a", "key_b", "n_common", est.alias("estimate"))


def kmv_sketch_sql(table_expr: str, key_expr: str, item_expr: str,
                   k: int = KMV_K, key_name: str = "key") -> str:
    """DuckDB twin of kmv_sketch."""
    return f"""
        SELECT {key_name}, rk, h FROM (
            SELECT {key_name}, h,
                   row_number() OVER (PARTITION BY {key_name}
                                      ORDER BY h) AS rk
            FROM (SELECT DISTINCT {key_expr} AS {key_name},
                         {kmv_hash_sql(item_expr)} AS h
                  FROM {table_expr}) d
        ) r WHERE rk <= {k}
    """


def kmv_estimate_sql(sketch_sql: str, k: int = KMV_K,
                     key_name: str = "key") -> str:
    """DuckDB twin of kmv_estimate (same division, same rounding)."""
    return f"""
        SELECT {key_name}, n_sample,
               CASE WHEN n_sample < {k} THEN CAST(n_sample AS DOUBLE)
                    ELSE round({(k - 1) * POW52} / CAST(hk AS DOUBLE),
                               {EST_DP})
               END AS estimate
        FROM (SELECT {key_name}, CAST(count(*) AS BIGINT) AS n_sample,
                     max(h) AS hk
              FROM ({sketch_sql}) s GROUP BY 1) a
    """


def kmv_intersect_pairs_sql(sketch_sql: str, k: int = KMV_K,
                            key_name: str = "key") -> str:
    """DuckDB twin of kmv_intersect_pairs."""
    return f"""
        WITH sk AS ({sketch_sql}),
        st AS (
            SELECT {key_name},
                   CASE WHEN count(*) < {k} THEN CAST({POW52} AS BIGINT)
                        ELSE max(h) END AS theta
            FROM sk GROUP BY 1
        ), pairs AS (
            SELECT a.{key_name} AS key_a, b.{key_name} AS key_b,
                   least(a.theta, b.theta) AS t
            FROM st a, st b WHERE a.{key_name} < b.{key_name}
        ), common AS (
            SELECT p.key_a, p.key_b, p.t,
                   CAST(count(*) AS BIGINT) AS n_common
            FROM pairs p
            JOIN sk sa ON sa.{key_name} = p.key_a
            JOIN sk sb ON sb.{key_name} = p.key_b AND sb.h = sa.h
            WHERE p.t = {POW52} OR sa.h < p.t
            GROUP BY 1, 2, 3
        )
        SELECT p.key_a, p.key_b,
               coalesce(c.n_common, 0) AS n_common,
               CASE WHEN p.t = {POW52}
                    THEN CAST(coalesce(c.n_common, 0) AS DOUBLE)
                    ELSE round(coalesce(c.n_common, 0) * {float(POW52)!r}
                               / CAST(p.t AS DOUBLE), {EST_DP})
               END AS estimate
        FROM pairs p LEFT JOIN common c
          ON c.key_a = p.key_a AND c.key_b = p.key_b
    """


def kmv_estimate_py(items: list[str], k: int = KMV_K) -> float:
    """Pure-Python twin (pytest ground truth)."""
    hs = sorted({kmv_hash_py(it) for it in items})[:k]
    if len(hs) < k:
        return float(len(hs))
    return _round_half_up((k - 1) * POW52 / hs[-1], EST_DP)


def kmv_intersect_py(a: list[str], b: list[str], k: int = KMV_K) -> float:
    """Pure-Python twin of the pair intersection estimate."""
    sa = sorted({kmv_hash_py(x) for x in a})[:k]
    sb = sorted({kmv_hash_py(x) for x in b})[:k]
    ta = POW52 if len(sa) < k else sa[-1]
    tb = POW52 if len(sb) < k else sb[-1]
    t = min(ta, tb)
    common = set(sa) & set(sb)
    n = len(common) if t == POW52 else sum(1 for h in common if h < t)
    if t == POW52:
        return float(n)
    return _round_half_up(n * float(POW52) / t, EST_DP)


def kmv_pair_stats(sketch: DataFrame, key_col: str,
                   k: int = KMV_K) -> DataFrame:
    """(key_a, key_b, n_common, est_inter, est_union, jaccard) for every
    unordered key pair — the shard-overlap question ("how much of shard
    A is also in shard B") answered from sketches alone. est_union
    re-ranks the two samples' union (exactly a kmv_merge of the pair);
    jaccard = round(est_inter / est_union, EST_DP) — a ratio of two
    already-rounded doubles, so both engines divide identical values.
    All frames here are sketch-sized (O(K · keys²) worst case over the
    pair frame), never corpus-sized."""
    from pyspark.sql import Window
    inter = kmv_intersect_pairs(sketch, key_col, k) \
        .withColumnRenamed("estimate", "est_inter")
    pairs = inter.select("key_a", "key_b")
    sa = sketch.select(F.col(key_col).alias("key_a"), "h")
    sb = sketch.select(F.col(key_col).alias("key_b"), "h")
    u = (pairs.join(sa, "key_a").select("key_a", "key_b", "h")
         .unionByName(
             pairs.join(sb, "key_b").select("key_a", "key_b", "h"))
         .distinct())
    w = Window.partitionBy("key_a", "key_b").orderBy("h")
    usk = (u.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") <= k)
           .groupBy("key_a", "key_b")
           .agg(F.count(F.lit(1)).alias("n_sample"),
                F.max("h").alias("__hk")))
    est_u = F.when(F.col("n_sample") < k,
                   F.col("n_sample").cast("double")) \
        .otherwise(F.round(F.lit((k - 1) * POW52) / F.col("__hk"), EST_DP))
    uni = usk.select("key_a", "key_b", est_u.alias("est_union"))
    out = inter.join(uni, ["key_a", "key_b"])
    jac = F.when(F.col("est_union") > 0,
                 F.round(F.col("est_inter") / F.col("est_union"), EST_DP)) \
        .otherwise(F.lit(0.0))
    return out.select("key_a", "key_b", "n_common", "est_inter",
                      "est_union", jac.alias("jaccard"))


def kmv_pair_stats_sql(sketch_sql: str, k: int = KMV_K,
                       key_name: str = "key") -> str:
    """DuckDB twin of kmv_pair_stats."""
    inter = kmv_intersect_pairs_sql(sketch_sql, k, key_name)
    return f"""
        WITH sk AS ({sketch_sql}),
        inter AS (SELECT key_a, key_b, n_common,
                         estimate AS est_inter FROM ({inter}) i),
        uh AS (
            SELECT DISTINCT i.key_a, i.key_b, s.h
            FROM inter i JOIN sk s
              ON s.{key_name} = i.key_a OR s.{key_name} = i.key_b
        ), usk AS (
            SELECT key_a, key_b,
                   CAST(count(*) AS BIGINT) AS n_sample, max(h) AS hk
            FROM (SELECT key_a, key_b, h,
                         row_number() OVER (PARTITION BY key_a, key_b
                                            ORDER BY h) AS rk
                  FROM uh) r
            WHERE rk <= {k} GROUP BY 1, 2
        ), uni AS (
            SELECT key_a, key_b,
                   CASE WHEN n_sample < {k} THEN CAST(n_sample AS DOUBLE)
                        ELSE round({(k - 1) * POW52} / CAST(hk AS DOUBLE),
                                   {EST_DP})
                   END AS est_union
            FROM usk
        )
        SELECT i.key_a, i.key_b, i.n_common, i.est_inter, u.est_union,
               CASE WHEN u.est_union > 0
                    THEN round(i.est_inter / u.est_union, {EST_DP})
                    ELSE 0.0 END AS jaccard
        FROM inter i JOIN uni u
          ON u.key_a = i.key_a AND u.key_b = i.key_b
    """


def kmv_jaccard_py(a: list[str], b: list[str], k: int = KMV_K) -> float:
    """Pure-Python twin of the pair jaccard estimate."""
    ei = kmv_intersect_py(a, b, k)
    hs = sorted({kmv_hash_py(x) for x in a} | {kmv_hash_py(x) for x in b})
    hs = hs[:k]
    eu = float(len(hs)) if len(hs) < k \
        else _round_half_up((k - 1) * POW52 / hs[-1], EST_DP)
    if eu <= 0:
        return 0.0
    return _round_half_up(ei / eu, EST_DP)
