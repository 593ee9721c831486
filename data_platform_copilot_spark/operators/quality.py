"""Repetition-based quality signals (the Gopher/C4 pretraining
filters: MassiveText's repetition rules, Rae et al. 2021 §A1.1).

Per document:
- ``top_token_share``   — most frequent token's share of all tokens
- ``top_bigram_share``  — most frequent word 2-gram's share
- ``dup_trigram_frac``  — fraction of 3-gram INSTANCES that are
                          repeats of an earlier one (1 - distinct/total)

High values mark degenerate/boilerplate text (keyword stuffing, menu
dumps, repeated paragraphs) that repetition filters drop before
training.

Shape: ONE explode emits (id, kind, gram) for all three gram kinds
(unigram/bigram/trigram slices built by zipping shifted token-array
views — fixed cost per row, stays in codegen until the explode), then
ONE groupBy(id, kind, gram) whose output rows are per-doc distinct
grams, then ONE groupBy(id) folds the three signals out of
conditional aggregates. Two shuffles total, both keyed on uniform
(id, gram) / (id); no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text
from ..sources.registry import spread


def _grams(toks: Column, n: int, kind: int) -> Column:
    """array<struct<k,g>> of the row's word n-grams (non-distinct)."""
    width = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    shifted = [F.slice(toks, i + 1, width).alias(f"t{i}") for i in range(n)]
    return F.transform(
        F.arrays_zip(*shifted),
        lambda s: F.struct(
            F.lit(kind).alias("k"),
            F.concat_ws(" ", *[s[f"t{i}"] for i in range(n)]).alias("g")))


def repetition_signals(df: DataFrame, id_col: str,
                       text_col: str) -> DataFrame:
    """(id, top_token_share, top_bigram_share, dup_trigram_frac).

    Documents shorter than 3 tokens yield NULL for the signals whose
    gram kind they cannot form (matching the SQL oracle's empty
    position ranges).
    """
    df = spread(df)
    toks = F.split(normalize_text(F.col(text_col)), " ")
    exploded = (
        df.where(F.size(toks) >= 1)
        .select(F.col(id_col).alias("id"),
                F.explode(F.concat(_grams(toks, 1, 1),
                                   _grams(toks, 2, 2),
                                   _grams(toks, 3, 3))).alias("s"))
        .select("id", F.col("s.k").alias("k"), F.col("s.g").alias("g"))
    )
    freq = exploded.groupBy("id", "k", "g").agg(F.count("*").alias("c"))

    def _of(kind: int, col: Column) -> Column:
        return F.when(F.col("k") == kind, col)

    return (
        freq.groupBy("id").agg(
            (F.max(_of(1, F.col("c"))).cast("double")
             / F.sum(_of(1, F.col("c")))).alias("top_token_share"),
            (F.max(_of(2, F.col("c"))).cast("double")
             / F.sum(_of(2, F.col("c")))).alias("top_bigram_share"),
            (F.lit(1.0)
             - F.count(_of(3, F.lit(1))).cast("double")
             / F.sum(_of(3, F.col("c")))).alias("dup_trigram_frac"),
        )
    )
