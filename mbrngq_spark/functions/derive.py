"""Deterministic derived geometry over the testdata ``documents`` table.

The reference generates points uniformly at random in the configured space
with a uniformly random category (mbR-NGQ/Data/DataGenerators.cs:10-28,
UniformGenerator). Our engine derives the same *distribution* deterministically
from ``doc_id`` via integer LCG-style mixing, chosen so the EXACT same value
is computable in both Spark SQL and DuckDB ANSI SQL (the driver's oracle):
pure int64 multiply/add/mod, then one float64 divide — bit-identical in both
engines.

Every constant lives here once; both the Column expressions and the SQL
snippets are generated from them, so engine and oracle can never drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mbrngq_spark.config import DEFAULT, EngineConfig

# LCG-ish mixing constants (public-domain Knuth/glibc multipliers).
XA, XB, XM = 1103515245, 12345, 1000003
YA, YB, YM = 69069, 99991, 999983
CA, CB, CM = 48271, 17, 1000033


def x_col(doc_id: Column, cfg: EngineConfig = DEFAULT) -> Column:
    h = (doc_id.cast("long") * F.lit(XA) + F.lit(XB)) % F.lit(XM)
    return h.cast("double") / F.lit(float(XM)) * F.lit(cfg.width) + F.lit(cfg.min_x)


def y_col(doc_id: Column, cfg: EngineConfig = DEFAULT) -> Column:
    h = (doc_id.cast("long") * F.lit(YA) + F.lit(YB)) % F.lit(YM)
    return h.cast("double") / F.lit(float(YM)) * F.lit(cfg.height) + F.lit(cfg.min_y)


def category_col(doc_id: Column, cfg: EngineConfig = DEFAULT) -> Column:
    return (((doc_id.cast("long") * F.lit(CA) + F.lit(CB)) % F.lit(CM))
            % F.lit(cfg.m)).cast("int")


def with_geometry(docs: DataFrame, cfg: EngineConfig = DEFAULT,
                  id_col: str = "doc_id") -> DataFrame:
    """documents → + (x, y, category) columns (pure codegen'd arithmetic)."""
    did = F.col(id_col)
    return (docs
            .withColumn("x", x_col(did, cfg))
            .withColumn("y", y_col(did, cfg))
            .withColumn("category", category_col(did, cfg)))


# --- matching ANSI-SQL snippets (DuckDB oracle) ----------------------------

def x_sql(id_expr: str = "doc_id", cfg: EngineConfig = DEFAULT) -> str:
    return (f"(CAST(({id_expr} * {XA} + {XB}) % {XM} AS DOUBLE)"
            f" / {float(XM)} * {cfg.width} + {cfg.min_x})")


def y_sql(id_expr: str = "doc_id", cfg: EngineConfig = DEFAULT) -> str:
    return (f"(CAST(({id_expr} * {YA} + {YB}) % {YM} AS DOUBLE)"
            f" / {float(YM)} * {cfg.height} + {cfg.min_y})")


def category_sql(id_expr: str = "doc_id", cfg: EngineConfig = DEFAULT) -> str:
    return f"CAST((({id_expr} * {CA} + {CB}) % {CM}) % {cfg.m} AS INT)"
