"""Distributed BPE-merge training (Sennrich et al. 2016, ACL —
"Neural Machine Translation of Rare Words with Subword Units").

The tokenizer-training step of an LLM data pipeline, built ENTIRELY
from relational operations so the learned merge table is
value-verifiable against a SQL replay:

- state = the corpus's distinct-word symbol streams, one row per
  (word, position, symbol) — vocabulary-sized, NOT corpus-sized: the
  100 TB corpus collapses to its word vocabulary + counts in one
  groupBy, and every merge round after that touches only the vocab.
- each round: adjacent-pair frequencies (self-join on position+1,
  count-weighted combine), a deterministic argmax (freq DESC, then
  lexicographic pair — the tiebreak both engines replay), greedy
  left-to-right non-overlapping occurrence selection (the
  consecutive-run / odd-rank window trick), and a rebuild of the
  symbol stream with merged positions renumbered.

The driver sees one KB-sized row per round (the chosen pair); the
symbol state localCheckpoints per round to stop logical-plan growth
across rounds (same rationale as operators/graph.py — executor-local
blocks, no HDFS round-trip; at this cadence a lost executor costs a
re-run of a vocabulary-sized job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.registry import truncate_lineage

MARKER = "</w>"

# Diagnostic: driver-round count of the most recent bpe_train run
# (batching exists to shrink this; benches read it after training).
last_round_count = 0


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(w, n): the corpus's distinct words with counts — the only
    corpus-sized pass in BPE training."""
    return (df.select(F.explode(tokens(F.col(text_col))).alias("w"))
            .where(F.length("w") > 0)
            .groupBy("w").agg(F.count("*").alias("n")))


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(w, pos, s): each word split into single characters plus the
    end-of-word marker, 1-based positions."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)))
    return (words.select(
        "w", F.posexplode(F.concat(chars, F.array(F.lit(MARKER))))
        .alias("pos0", "s"))
        .select("w", (F.col("pos0") + 1).alias("pos"), "s"))


def bpe_train(df: DataFrame, text_col: str,
              n_merges: int = 8, batch: int = 1) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (merge_rank, lhs, rhs, freq) — deterministic for a given corpus,
    so a SQL oracle replaying the identical rounds value-verifies
    the whole training run."""
    merges_df, _ = bpe_train_with_state(df, text_col, n_merges, batch)
    return merges_df


def bpe_train_with_state(df: DataFrame, text_col: str,
                         n_merges: int = 8, batch: int = 1):
    """(merge table, final symbol state (w, pos, s)) — the state is
    what segmentation consumes: a word's row count IS its subword
    count under the learned merges, and joining it back to the
    corpus by word segments 100 TB of text with a vocab-sized dim
    join.

    ``batch`` amortizes the driver-synchronized round cost (the
    latency floor at real vocab sizes — a 32k-merge run at batch=1
    is 32k sequential vocab-sized jobs): each round collects the
    ranked pair frequencies once and greedily accepts up to ``batch``
    pairs, in (freq DESC, lhs, rhs) rank order, whose symbol sets
    {lhs, rhs, lhs+rhs} are pairwise disjoint across the accepted
    set, then applies them all in ONE rebuild. Disjointness makes
    the batch application order-independent: no accepted pair can
    create, destroy, or overlap an occurrence of another (a position
    holds one symbol, so occurrences of symbol-disjoint pairs can
    never share a position).

    ``batch=1`` is EXACTLY the sequential Sennrich semantics (the
    generic path degenerates to accept-the-argmax; pytest pins
    equivalence). ``batch>1`` is the standard parallel-BPE
    approximation: a merge may create a novel pair whose frequency
    would outrank a later accepted pair under strict sequential
    recounting, so the merge TABLE can differ slightly from
    batch=1; recorded freqs are all measured against the round's
    starting state. Every output remains fully deterministic for a
    given (corpus, batch).
    """
    global last_round_count
    spark = df.sparkSession
    words = word_vocab(df, text_col).localCheckpoint()
    s = _initial_symbols(words).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    last_round_count = 0
    while len(merges) < n_merges:
        last_round_count += 1
        want = min(batch, n_merges - len(merges))
        a, b = s.alias("a"), s.alias("b")
        pairs = (a.join(b, (F.col("a.w") == F.col("b.w"))
                        & (F.col("b.pos") == F.col("a.pos") + 1))
                 .select(F.col("a.w").alias("w"),
                         F.col("a.pos").alias("apos"),
                         F.col("a.s").alias("lhs"),
                         F.col("b.s").alias("rhs")))
        # candidate horizon: enough ranked rows that symbol collisions
        # rarely starve the batch, still KB-sized on the driver
        horizon = 1 if want == 1 else max(64, 4 * want)
        ranked = (pairs.join(words, "w")
                  .groupBy("lhs", "rhs").agg(F.sum("n").alias("freq"))
                  .orderBy(F.desc("freq"), "lhs", "rhs")
                  .limit(horizon).collect())
        if not ranked:
            break
        taken: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for row in ranked:
            if len(taken) == want:
                break
            syms = {row["lhs"], row["rhs"], row["lhs"] + row["rhs"]}
            if used & syms:
                continue
            taken.append((row["lhs"], row["rhs"], int(row["freq"])))
            used |= syms
        for lhs, rhs, freq in taken:
            merges.append((len(merges) + 1, lhs, rhs, freq))
        # greedy left-to-right non-overlap PER PAIR: consecutive
        # candidate positions (only possible when lhs == rhs) form
        # runs via the pos - row_number trick; odd ranks within a run
        # merge. Accepted pairs are symbol-disjoint, so their
        # occurrences are position-disjoint and one pass applies all.
        is_taken = None
        for lhs, rhs, _ in taken:
            hit = (F.col("lhs") == lhs) & (F.col("rhs") == rhs)
            is_taken = hit if is_taken is None else (is_taken | hit)
        cand = (pairs
                .where(is_taken)
                .withColumn("rn", F.row_number().over(
                    W.partitionBy("w", "lhs", "rhs").orderBy("apos")))
                .withColumn("grp", F.col("apos") - F.col("rn"))
                .withColumn("rn2", F.row_number().over(
                    W.partitionBy("w", "lhs", "rhs", "grp")
                    .orderBy("apos")))
                .where(F.col("rn2") % 2 == 1)
                .select("w", "apos",
                        F.concat("lhs", "rhs").alias("merged")))
        start = cand.select("w", F.col("apos").alias("pos"), "merged")
        tail = cand.select("w", (F.col("apos") + 1).alias("pos"),
                           F.lit(True).alias("is_tail"))
        s = (s.join(start, ["w", "pos"], "left")
             .join(tail, ["w", "pos"], "left")
             .where(F.col("is_tail").isNull())
             .select("w", "pos",
                     F.coalesce("merged", "s").alias("s"))
             .select("w",
                     F.row_number().over(
                         W.partitionBy("w").orderBy("pos")).alias("pos"),
                     "s"))
        # per-round checkpoint + stats rebase: without the rebase the
        # inherited size estimate compounds exponentially across
        # rounds (see sources/registry.truncate_lineage)
        s = truncate_lineage(s)

    return (spark.createDataFrame(
        merges, "merge_rank long, lhs string, rhs string, freq long"), s)


def bpe_reference(texts: list[str], n_merges: int = 8,
                  batch: int = 1):
    """Pure-python Sennrich reference for tests: same tokenization
    (lowercase, whitespace-collapsed), same tiebreak, same greedy
    left-to-right merging. ``batch`` mirrors the distributed
    batching contract exactly — identical rank order, identical
    candidate horizon (``max(64, 4*want)``), identical greedy
    symbol-disjoint acceptance — so batched runs are pinned against
    this loop the same way batch=1 is."""
    import re
    from collections import Counter

    words: Counter = Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.lower()).strip().split(" "):
            if w:
                words[w] += 1
    seqs = {w: [*w, MARKER] for w in words}
    merges = []
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        pair_counts: Counter = Counter()
        for w, seq in seqs.items():
            for i in range(len(seq) - 1):
                pair_counts[(seq[i], seq[i + 1])] += words[w]
        if not pair_counts:
            break
        horizon = 1 if want == 1 else max(64, 4 * want)
        ranked = sorted(pair_counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        ranked = ranked[:horizon]
        taken, used = [], set()
        for (lhs, rhs), freq in ranked:
            if len(taken) == want:
                break
            syms = {lhs, rhs, lhs + rhs}
            if used & syms:
                continue
            taken.append((lhs, rhs, freq))
            used |= syms
        for lhs, rhs, freq in taken:
            merges.append((len(merges) + 1, lhs, rhs, freq))
        accepted = {(lhs, rhs): lhs + rhs for lhs, rhs, _ in taken}
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if (i + 1 < len(seq)
                        and (seq[i], seq[i + 1]) in accepted):
                    out.append(accepted[(seq[i], seq[i + 1])])
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    return merges
