"""BPE merge learning — the tokenizer-training side of the pipeline family
(extension; no reference counterpart).

Classic byte-pair-encoding vocabulary learning (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") as an
iterative DataFrame algorithm, like kmeans_train and cluster_duplicates:

  base     word-frequency table (one corpus shuffle, result ≈ vocab size)
  iterate  count adjacent symbol pairs weighted by word frequency →
           argmax pair (deterministic tie-break) → merge it in every word

Each iteration is one explode + one grouped count over the VOCABULARY
(not the corpus) — after the initial word count, cost is independent of
corpus size, which is exactly why BPE training scales: 100 TB of text
collapses to a few million distinct words before any iteration runs.

The greedy left-to-right merge is an exact array fold (no delimited-string
replace — boundary spaces make those miss adjacent occurrences).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions import text as T
from .iterate import pin

__all__ = ["word_frequencies", "learn_bpe_merges", "apply_merge"]

END = "</w>"  # end-of-word sentinel so suffix merges differ from infix


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokens — the only corpus-sized pass."""
    return (
        docs.select(F.explode(T.tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """Word → array of single-char symbols + end-of-word sentinel."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(chars, F.array(F.lit(END)))


def apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) → a+b, the BPE
    training step. Fold with lookback: if the last emitted symbol is `a`
    and the current is `b`, fuse them (a just-fused symbol can't fuse
    again — it no longer equals `a` unless a+b == a, impossible for
    non-empty b)."""
    fused = F.lit(a + b)
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(fused)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    checkpoint_dir: str | None = None,
) -> list[dict]:
    """Learn the top ``n_merges`` BPE merges. Returns
    [{rank, left, right, merged, freq}] in merge order. Deterministic:
    pair-count ties break on the pair string ascending."""
    vocab = word_frequencies(docs, text_col).select(
        "freq", _initial_symbols(F.col("word")).alias("syms")
    )
    # r13: pin the INITIAL vocabulary too — without it the one corpus-sized
    # pass runs twice (round 0's argmax job, then again when round 1
    # materializes the first merged-vocab pin, whose lineage still reaches
    # back to the raw corpus).
    vocab = pin(vocab, checkpoint_dir, eager=False)
    merges: list[dict] = []
    for rank in range(n_merges):
        pairs = vocab.filter(F.size("syms") >= 2).select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("left"),
                        F.element_at("syms", i + 1).alias("right"),
                    ),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("pair_freq"))
            .orderBy(F.desc("pair_freq"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, freq = best[0]["left"], best[0]["right"], best[0]["pair_freq"]
        merges.append(
            {"rank": rank, "left": a, "right": b, "merged": a + b, "freq": freq}
        )
        vocab = vocab.select(
            "freq", apply_merge(F.col("syms"), a, b).alias("syms")
        )
        # keep the lineage shallow: the vocab is tiny, the per-round pin
        # truncates plan growth (same trick as cluster_duplicates'
        # pointer jumping; checkpoint_dir switches to reliable
        # checkpoints on preemptible clusters)
        vocab = pin(vocab, checkpoint_dir, eager=False)
    return merges
