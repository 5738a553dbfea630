"""Deterministic corpus sampling — the up/down-sampling stage of a
training-data mix (e.g. downsample Common-Crawl-tier sources, keep
curated tiers whole).

Hash-based, not RNG-based: the keep/drop decision is a pure function of
(id, salt), so it is reproducible across runs, cluster sizes, partition
layouts and retries — the property a resumable 100 TB pipeline actually
needs (rand()-based sampling changes the kept set every run and breaks
checkpoint resume). Map-only: a filter projection, no shuffle, fully
pushdown-friendly.

The per-document uniform comes from md5 (bit-identical in Spark and
DuckDB), so the exact kept set is value-checkable by the SQL oracle —
same family as multimodal.media_meta_col. Granularity is 1/1000 (rates
round to the NEAREST 0.1% — int(round(...)), not truncation, so binary
float error in e.g. rate=0.3 cannot shave a grain), plenty for mix
weights.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRAIN = 1000


def sample_unit(id_col: Column, salt: str = "s1") -> Column:
    """Deterministic unit ∈ {0, …, 999} per (id, salt): md5-hex character
    codes folded like multimodal._md5_seed. Changing ``salt`` draws an
    independent sample (e.g. train/held-out splits)."""
    m = F.md5(F.concat(id_col.cast("string"), F.lit("/" + salt)))
    seed = (F.ascii(F.substring(m, 1, 1)) * F.lit(131 * 131)
            + F.ascii(F.substring(m, 2, 1)) * F.lit(131)
            + F.ascii(F.substring(m, 3, 1)))
    return seed % F.lit(GRAIN)


def sample_uniform(docs: DataFrame, rate: float, id_col: str = "doc_id",
                   salt: str = "s1") -> DataFrame:
    """Keep ≈``rate`` of rows, deterministically."""
    return docs.filter(sample_unit(F.col(id_col), salt)
                       < F.lit(int(round(rate * GRAIN))))


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      strat_col: str = "source", id_col: str = "doc_id",
                      default_rate: float = 1.0,
                      salt: str = "s1") -> DataFrame:
    """Per-stratum keep rates (the corpus-mix weights): strata named in
    ``rates`` keep that fraction, everything else keeps ``default_rate``.
    One codegen'd CASE — no shuffle, no per-stratum pass."""
    thresh = F.lit(int(round(default_rate * GRAIN)))
    for name, rate in sorted(rates.items()):
        thresh = F.when(F.col(strat_col) == name,
                        F.lit(int(round(rate * GRAIN)))).otherwise(thresh)
    return docs.filter(sample_unit(F.col(id_col), salt) < thresh)
