"""Streaming HLL cardinality sketches (the batch≡stream twin of
``operators/sketch.py``).

Two shapes, both with BOUNDED state — the whole point of a register
sketch on a stream:

* ``hll_sketch_stream`` — a streaming groupBy(key, register).max(rho)
  aggregation. State is ≤ keys × 256 rows FOREVER (no watermark needed:
  the sketch never grows with item count), so ``complete``-mode output is
  cheap and the final table equals the batch sketch row-for-row.

* ``merge_sketch_into`` — a foreachBatch handler that folds each
  micro-batch's sketch into a persisted register-state table via
  register-wise max. Because max-merge is an IDEMPOTENT commutative
  monoid, a replayed batch (crash between write and checkpoint commit)
  re-merges to the identical state — exactly-once falls out of the
  algebra, with no (run_id, batch_id) bookkeeping. The injected-crash
  pytest asserts exactly that.

At 10^12 docs this is the live-metrics path: the stream never stores
items, only 256-register states per key, and the persisted state table
is mergeable with batch/backfill sketches from ``operators.sketch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mbrngq_spark.operators.sketch import hll_register_cols

SKETCH_STATE_SCHEMA = "register long, rho long"


def hll_sketch_stream(stream: DataFrame, key_cols: list[str],
                      item_col: str) -> DataFrame:
    """(key..., register, rho) as a streaming aggregation — identical
    expression tree to the batch ``hll_sketch`` (same md5 register/rank
    Columns), so batch≡stream equality is structural."""
    reg, rho = hll_register_cols(F.col(item_col))
    return (stream.select(*key_cols, reg.alias("register"),
                          rho.alias("__rho"))
            .groupBy(*key_cols, "register")
            .agg(F.max("__rho").alias("rho")))


def _state_keys(key_cols: list[str]) -> list[str]:
    return [*key_cols, "register"]


def merge_sketch_into(spark: SparkSession, state_path: str,
                      key_cols: list[str], item_col: str,
                      key_schema: str):
    """foreachBatch handler factory: fold each micro-batch into the
    register-state table at ``state_path``.

    Read-merge-overwrite per batch; the merge (register-wise max) is
    idempotent, so a crash-replayed batch leaves the state unchanged.
    ``key_schema`` is the DDL for the key columns (e.g. ``"k string"``)
    used to read an absent/empty state table."""
    schema = f"{key_schema}, {SKETCH_STATE_SCHEMA}"

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        reg, rho = hll_register_cols(F.col(item_col))
        batch_sk = (batch_df.select(*key_cols, reg.alias("register"),
                                    rho.alias("__rho"))
                    .groupBy(*key_cols, "register")
                    .agg(F.max("__rho").alias("rho")))
        try:
            state = spark.read.schema(schema).parquet(state_path)
        except Exception:
            state = spark.createDataFrame([], schema)
        merged = (state.unionByName(batch_sk)
                  .groupBy(*_state_keys(key_cols))
                  .agg(F.max("rho").alias("rho"))
                  .localCheckpoint(eager=True))  # cut lineage before the
        # overwrite reads-then-replaces the same files
        merged.write.mode("overwrite").parquet(state_path)

    return handle
