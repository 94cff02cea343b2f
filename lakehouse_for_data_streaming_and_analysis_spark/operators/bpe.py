"""Distributed BPE vocabulary induction (tokenizer training).

The reference's text surface stops at token *counting*; a training-data
pipeline also needs to *learn* the tokenizer. Byte-pair encoding
(Sennrich et al. 2016, ACL — public) is the canonical vocabulary
induction algorithm: repeatedly merge the most frequent adjacent symbol
pair. This module expresses it Spark-first.

Scale design (the part that matters at 100 TB):

* Training runs on the **word-frequency table**, not the raw corpus —
  exactly how reference BPE implementations train. Building that table
  is the only corpus-sized operation (one explode + one map-side-combined
  groupBy shuffle); every merge round thereafter touches a vocab-sized
  DataFrame (≤ distinct-word count, orders of magnitude below corpus
  rows, but still distributed — a 100 TB web corpus has ~1e8 distinct
  words, far beyond a driver dict).
* Each merge round is:
    1. adjacent-pair counting — a JVM ``transform`` over each word's
       symbol array weighted by the word count, exploded and aggregated
       in ONE vocab-sized shuffle (map-side partial aggregation);
    2. top-pair selection — ``orderBy(count desc, pair asc).limit(1)``,
       a tiny TakeOrdered, with a deterministic lexicographic tie-break;
    3. merge application — a JVM ``aggregate()`` left fold per word that
       rewrites ``[…, a, b, …] -> […, ab, …]`` greedily left-to-right
       (matching the classic scan), no Python, no shuffle.
  ``localCheckpoint`` truncates lineage per round (same idiom as
  ``operators/graphs.py``), so N rounds never stack N plans.
* The learned artifact (the merge table) is ``n_merges`` rows — like
  k-means centroids it is legitimately driver-sized metadata.

Determinism: counts are integers and the tie-break is total, so the
merge sequence is exactly reproducible — pinned byte-for-byte against a
pure-Python reference implementation in ``tests/test_bpe.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# End-of-word sentinel, appended as its own symbol so merges can learn
# word-final units ("ing</w>") distinctly from word-internal ones.
EOW = "</w>"


def word_symbol_table(docs: DataFrame, tokens_col: Column) -> DataFrame:
    """Corpus -> (word, weight, syms) frequency table.

    ``syms`` is the word's initial symbol sequence: its characters plus
    the ``EOW`` sentinel. The explode+groupBy here is the single
    corpus-sized shuffle of the whole training run.
    """
    words = (
        docs.select(F.explode(tokens_col).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    syms = F.concat(
        F.filter(F.split(F.col("word"), ""), lambda c: F.length(c) > 0),
        F.array(F.lit(EOW)),
    )
    return words.select("word", "weight", syms.alias("syms"))


def _pair_counts(words: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol sequences.

    The transform+explode is map-side; the groupBy shuffle carries one
    row per distinct pair per partition (partial aggregation).
    """
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.struct(
            F.element_at("syms", i).alias("left"),
            F.element_at("syms", i + 1).alias("right"),
        ),
    )
    return (
        words.where(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "weight")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("weight").alias("pair_count"))
    )


def apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right, non-overlapping application of one merge
    rule as a JVM array fold: append each symbol unless it completes
    the (left, right) pair with the accumulator's tail, in which case
    the tail is replaced by the merged symbol. ``aaaa`` under (a,a)
    becomes ``[aa, aa]`` — the classic scan's behavior."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _exact_batch(top: list, fetched: int, batch: int) -> list:
    """Longest prefix of the count-desc/pair-asc ranking that provably
    reproduces classic sequential BPE when applied in order:

    1. stop at the first pair sharing a symbol with an earlier
       accepted pair (disjoint merges cannot change each other's
       counts — a merge only destroys/creates pairs that contain its
       own symbols);
    2. drop trailing accepted pairs whose count equals the boundary
       (first rejected / first unfetched) count — every pair CREATED
       by an accepted merge has count ≤ some destroyed overlapping
       pair ≤ boundary, so a STRICT gap guarantees no created pair
       can outrank a later accepted one even under lexicographic
       tie-breaks;
    3. always keep at least the global top pair (a single-merge step
       is trivially exact).

    The byte-for-byte parity test against the sequential Python
    reference (tests/test_bpe.py) is the empirical check on this
    argument.
    """
    used: set[str] = set()
    accepted = []
    boundary = None
    for r in top:
        if r.left in used or r.right in used:
            boundary = r.pair_count
            break
        accepted.append(r)
        used.add(r.left)
        used.add(r.right)
    if boundary is None and fetched == batch:
        # ranking may continue past the fetch window — treat the last
        # fetched count as the (conservative) boundary
        boundary = top[-1].pair_count
    if boundary is not None:
        accepted = [r for r in accepted if r.pair_count > boundary]
    if not accepted:
        accepted = [top[0]]
    return accepted


def _local_merges(
    vocab: dict[tuple, int], n_merges: int
) -> tuple[list[dict], dict]:
    """Classic sequential BPE over a driver-resident vocabulary —
    the small-vocab fast path of ``learn_merges``. Same algorithm,
    same tie-break, same outputs as the distributed rounds."""
    from collections import Counter

    merges: list[dict] = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append(
            {
                "rank": rank,
                "left": left,
                "right": right,
                "merged": left + right,
                "pair_count": int(cnt),
            }
        )
        nxt: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + c
        vocab = nxt
    return merges, vocab


def learn_merges(
    words: DataFrame,
    n_merges: int,
    batch: int = 64,
    local_threshold: int = 200_000,
) -> tuple[list[dict], DataFrame]:
    """Frequency-batched BPE: each round counts pairs once, then
    accepts the longest exactness-preserving prefix of the ranking
    (``_exact_batch``) instead of a single pair — cutting the round
    count (and with it the per-round scheduling + shuffle cost, the
    dominant term both here and at 100 TB) while producing the EXACT
    classic merge sequence. Returns (merge table, final symbol table).

    Small-vocab fast path: the corpus-sized pass (word_symbol_table's
    explode + groupBy) is always distributed, but when the RESULTING
    word-frequency table fits comfortably on the driver
    (``local_threshold`` rows) the merge rounds run locally — the
    same algorithm on the same counts, skipping ~n_merges cycles of
    pure job-scheduling latency (measured 11s -> 3s at sf0.1, where
    the synthetic corpus has only 31 distinct words). A 100 TB web
    corpus (~1e8 distinct words) takes the distributed rounds; both
    paths are parity-pinned in tests/test_bpe.py."""
    if local_threshold > 0:
        head = words.select("word", "weight").limit(
            local_threshold + 1
        ).collect()
        if len(head) <= local_threshold:
            vocab = {
                tuple(list(r.word) + [EOW]): int(r.weight) for r in head
            }
            merges, final_vocab = _local_merges(vocab, n_merges)
            spark = words.sparkSession

            def _word(k: tuple) -> str:
                w = "".join(k)
                return w[: -len(EOW)] if w.endswith(EOW) else w

            final = spark.createDataFrame(
                [
                    {"word": _word(k), "weight": c, "syms": list(k)}
                    for k, c in final_vocab.items()
                ],
                schema="word string, weight long, syms array<string>",
            )
            return merges, final
    # eager=False: the checkpoint materializes inside the NEXT round's
    # pair-count job, so each round costs ONE Spark job (pair count +
    # collect) instead of two.
    cur = words.localCheckpoint(eager=False)
    merges: list[dict] = []
    while len(merges) < n_merges:
        top = (
            _pair_counts(cur)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(batch)
            .collect()
        )
        if not top:
            break
        accepted = _exact_batch(top, len(top), batch)
        accepted = accepted[: n_merges - len(merges)]
        syms = F.col("syms")
        for r in accepted:
            merges.append(
                {
                    "rank": len(merges),
                    "left": r.left,
                    "right": r.right,
                    "merged": r.left + r.right,
                    "pair_count": int(r.pair_count),
                }
            )
            # chained folds apply the batch in rank order within one
            # projection — identical to sequential application
            syms = apply_merge(syms, r.left, r.right)
        cur = cur.withColumn("syms", syms).localCheckpoint(eager=False)
    return merges, cur
