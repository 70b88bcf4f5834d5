"""Distributed BPE-merge training (the tokenizer-TRAINING op).

Classic byte-pair-encoding trains on the WORD-FREQUENCY table, not the raw
corpus: one corpus-wide pass builds ``word -> count`` (the only
corpus-sized shuffle, map-side partially aggregated and vocabulary-sized on
the reduce side), then every merge round runs entirely over that
vocab-sized table:

  1. adjacent-pair counts weighted by word frequency — explode the symbol
     arrays' adjacent pairs, groupBy(pair).sum(n): map-side partial
     aggregation, the shuffle carries pair partials (|pairs| rows), never
     text;
  2. the winning pair — max count, ties broken lexicographically so
     training is deterministic — collected to the driver (ONE row: the
     broadcast "model delta" of the round);
  3. apply the merge to every word's symbol array via a single
     higher-order-function ``aggregate`` (greedy left-to-right, exactly the
     classic BPE application order) — zero shuffle, zero Python UDF.

100 TB plan: the corpus is touched ONCE (word counts); K merge rounds cost
O(vocab) each. Symbol arrays localCheckpoint per round to truncate the
K-deep lineage (the same pattern q_dedup_clusters uses for its label-
propagation rounds). No BatchEvalPython anywhere; the per-round driver
collect is one row.

No reference-repo analog (the reference ships no tokenizer); the op joins
the training-data family (SURVEY.md) beside vocab/bigram-PMI, which seed it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _adjacent_pairs(sym_col: str):
    """array<string> -> array<struct<l,r>> of adjacent symbol pairs."""
    return F.expr(
        f"filter(transform({sym_col}, (x, i) -> "
        f"struct(x AS l, get({sym_col}, i + 1) AS r)), p -> p.r IS NOT NULL)"
    )


def _merge_pair_expr(sym_col: str, left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) into one symbol —
    one HOF ``aggregate`` walking the array with a pending-symbol
    accumulator (classic BPE application order: 'aaa' under (a,a) becomes
    ['aa','a']). Pure column expression: JVM-side, no shuffle, no UDF."""
    l_lit = F.lit(left)
    r_lit = F.lit(right)
    merged = F.lit(left + right)

    def step(acc, x):
        take = (acc["pend"] == l_lit) & (x == r_lit)
        return F.when(
            take,
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit(None).cast("string").alias("pend"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["pend"].isNotNull(),
                    F.concat(acc["out"], F.array(acc["pend"])),
                )
                .otherwise(acc["out"])
                .alias("out"),
                x.alias("pend"),
            )
        )

    def finish(acc):
        return F.when(
            acc["pend"].isNotNull(), F.concat(acc["out"], F.array(acc["pend"]))
        ).otherwise(acc["out"])

    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )
    return F.aggregate(F.col(sym_col), init, step, finish)


def pair_counts(wf: DataFrame) -> DataFrame:
    """One round's adjacent-pair counts over the (sym, n) word-frequency
    table — map-side partially aggregated (|pairs|-sized shuffle)."""
    return (
        wf.select(F.explode(_adjacent_pairs("sym")).alias("p"), "n")
        .groupBy("p.l", "p.r")
        .agg(F.sum("n").alias("cnt"))
    )


def train_bpe(documents: DataFrame, num_merges: int = 8) -> DataFrame:
    """Learn ``num_merges`` BPE merges over the documents' text; returns one
    row per round: (round, left, right, merged, pair_count), round 1-based
    in training order. Deterministic: ties break on (left, right)."""
    words = documents.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    ).where(F.col("w") != "")
    # the ONE corpus-sized aggregation; vocab-sized thereafter
    wf = words.groupBy("w").agg(F.count("*").alias("n"))
    # initial symbols: the word's characters (split-by-empty keeps order and
    # multi-byte code points; Spark emits no empty trailing element)
    wf = wf.select(F.split("w", "").alias("sym"), "n").localCheckpoint()

    spark = documents.sparkSession
    merges: list[tuple] = []
    for rnd in range(1, num_merges + 1):
        top = (
            pair_counts(wf)
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break  # every word is a single symbol: nothing left to merge
        row = top[0]
        merges.append(
            (rnd, row["l"], row["r"], row["l"] + row["r"], int(row["cnt"]))
        )
        wf = wf.select(
            _merge_pair_expr("sym", row["l"], row["r"]).alias("sym"), "n"
        ).localCheckpoint()  # truncate the K-deep HOF lineage per round
    return spark.createDataFrame(
        merges, "round int, left string, right string, merged string, pair_count long"
    )


def train_bpe_reference(texts: list[str], num_merges: int = 8) -> list[tuple]:
    """Pure-Python reference trainer (the test oracle): same pretokenizer,
    same greedy application, same deterministic tie-break."""
    from collections import Counter

    wf = Counter()
    for t in texts:
        for w in (t or "").strip().split():
            if w:
                wf[w] += 1
    syms = {w: list(w) for w in wf}
    out: list[tuple] = []
    for rnd in range(1, num_merges + 1):
        pairs: Counter = Counter()
        for w, n in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += n
        if not pairs:
            break
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rnd, l, r, l + r, cnt))
        for w in syms:
            s = syms[w]
            new: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(s[i])
                    i += 1
            syms[w] = new
    return out
