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
    is 32k sequential vocab-sized jobs). Since r15 batching is
    EXACT (r14 verdict #6): a round accepts a batch only when a
    sequential recount PROVABLY agrees, so the merge table is
    byte-identical to batch=1 at every ``batch`` (pinned by pytest
    against the pure-python reference and by the DuckDB round-replay
    oracle). The proof obligations, per round:

    1. The accepted set is a CONSECUTIVE prefix of the (freq DESC,
       lhs, rhs) ranking with no CROSS-ADJACENCY between accepted
       pairs: ``p_i.lhs != p_j.rhs`` and ``p_i.rhs != p_j.lhs`` for
       every earlier ``p_j`` (acceptance STOPS at the first
       violation — skipping would let the skipped pair, whose count
       may survive the earlier merges, outrank a later accepted pair
       under recounting). Cross-adjacency freedom is exactly
       position-disjointness of their occurrences — two pairs can
       only share a position where one's lhs is the other's rhs —
       so each accepted pair's own frequency is UNCHANGED by
       applying the earlier ones (its recorded freq equals the
       sequential recount), the one-pass rebuild is
       order-independent, accepted pairs merge to frequency zero,
       and every other old pair can only lose occurrences. Sharing
       a mere symbol is fine: (e, r) and (e, </w>) batch together.
    2. The only counts that can GROW are novel pairs involving a
       merged symbol lhs+rhs; each such occurrence consumes an
       original occurrence of a PARENT pair ((x, lhs) for the novel
       (x, lhs+rhs); (rhs, y) for (lhs+rhs, y)), so the parent's
       round-start frequency bounds the novel pair. The batch is
       truncated to the longest prefix where every earlier accepted
       pair's max parent frequency is STRICTLY below the last
       accepted frequency (ties conservatively rejected — a tying
       novel pair could win the lexicographic tiebreak). One extra
       vocab-sized aggregation per round checks this; the pair-freq
       frame is materialized once and shared by the ranking and the
       parent probe.
    3. String-coincidence guards: a batch ends right after a pair
       whose merged string already exists as a symbol (post-merge
       counts for that string CONFLATE old and novel occurrences —
       sequential conflates identically in-state, but the growth of
       conflated pair counts between batch steps cannot be bounded
       by rule 2), and stops before a pair whose merged string
       equals an earlier accepted pair's (their outputs would
       conflate mid-batch). The symbol universe is tracked on the
       driver (initial characters + every accepted merge) — no
       extra job.

    Every output remains fully deterministic for a given corpus and
    independent of ``batch``; a pathological corpus just truncates
    batches toward 1 and pays more rounds, never a different table.
    """
    global last_round_count
    spark = df.sparkSession
    words = word_vocab(df, text_col).localCheckpoint()
    s = _initial_symbols(words).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    last_round_count = 0
    # driver-side symbol universe for the batch conflation guard
    # (proof obligation 3) — alphabet-sized, collected once; only
    # consulted when batch > 1
    universe: set[str] = set()
    if batch > 1:
        universe = {r["s"] for r in s.select("s").distinct().collect()}
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
        freqs = (pairs.join(words, "w")
                 .groupBy("lhs", "rhs").agg(F.sum("n").alias("freq")))
        if want > 1:
            # two driver actions consume the pair table this round
            # (ranking + parent probe) — share one materialization.
            # Plain lazy localCheckpoint, like the round state above:
            # materialize_auto's cluster path would persist once per
            # ROUND with no unpersist hook (its documented leak).
            freqs = freqs.localCheckpoint(eager=False)
        # exact batching accepts only a CONSECUTIVE ranked prefix, so
        # `want` rows is the whole candidate horizon
        ranked = (freqs.orderBy(F.desc("freq"), "lhs", "rhs")
                  .limit(want).collect())
        if not ranked:
            break
        taken: list[tuple[str, str, int]] = []
        for row in ranked:
            lhs, rhs, mstr = row["lhs"], row["rhs"], row["lhs"] + row["rhs"]
            # proof obligation 1: no cross-adjacency with any earlier
            # accepted pair (STOP, don't skip); obligation 3: no
            # mid-batch merged-string collision
            if any(lhs == pr or rhs == pl or mstr == pl + pr
                   for pl, pr, _f in taken):
                break
            taken.append((lhs, rhs, int(row["freq"])))
            if mstr in universe:
                break  # obligation 3: conflating merge ends the batch
        if len(taken) > 1:
            # proof obligation 2: bound every novel pair by its
            # parents' round-start frequencies and truncate the batch
            # until no novel pair can outrank a later accepted pair
            parent_max = freqs.agg(*[
                F.max(F.when((F.col("rhs") == lhs)
                             | (F.col("lhs") == rhs),
                             F.col("freq"))).alias(f"p{j}")
                for j, (lhs, rhs, _f) in enumerate(taken)]).collect()[0]
            bound = [parent_max[f"p{j}"] or 0 for j in range(len(taken))]
            m = len(taken)
            while m > 1 and any(bound[j] >= taken[m - 1][2]
                                for j in range(m - 1)):
                m -= 1
            taken = taken[:m]
        for lhs, rhs, freq in taken:
            merges.append((len(merges) + 1, lhs, rhs, freq))
            universe.add(lhs + rhs)
        # greedy left-to-right non-overlap PER PAIR: consecutive
        # candidate positions (only possible when lhs == rhs) form
        # runs via the pos - row_number trick; odd ranks within a run
        # merge. Accepted pairs are cross-adjacency-free, so their
        # occurrences are position-disjoint and one pass applies all
        # (no position is a start of one pair and a tail of another).
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
    left-to-right merging. ``batch`` mirrors the distributed EXACT
    batching contract — consecutive ranked prefix, cross-adjacency
    stop, conflation guards, parent-frequency truncation — so
    batched runs are pinned against this loop the same way batch=1
    is (and both must equal batch=1's table at every batch)."""
    import re
    from collections import Counter

    words: Counter = Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.lower()).strip().split(" "):
            if w:
                words[w] += 1
    seqs = {w: [*w, MARKER] for w in words}
    universe = {c for w in words for c in w} | {MARKER}
    merges = []
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        pair_counts: Counter = Counter()
        for w, seq in seqs.items():
            for i in range(len(seq) - 1):
                pair_counts[(seq[i], seq[i + 1])] += words[w]
        if not pair_counts:
            break
        ranked = sorted(pair_counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        ranked = ranked[:want]
        taken = []
        for (lhs, rhs), freq in ranked:
            mstr = lhs + rhs
            if any(lhs == pr or rhs == pl or mstr == pl + pr
                   for pl, pr, _f in taken):
                break  # cross-adjacency / mid-batch conflation: stop
            taken.append((lhs, rhs, freq))
            if mstr in universe:
                break  # conflating merge ends the batch
        if len(taken) > 1:
            bound = [max((f for (ql, qr), f in pair_counts.items()
                          if qr == lhs or ql == rhs), default=0)
                     for lhs, rhs, _f in taken]
            m = len(taken)
            while m > 1 and any(bound[j] >= taken[m - 1][2]
                                for j in range(m - 1)):
                m -= 1
            taken = taken[:m]
        for lhs, rhs, freq in taken:
            merges.append((len(merges) + 1, lhs, rhs, freq))
            universe.add(lhs + rhs)
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
