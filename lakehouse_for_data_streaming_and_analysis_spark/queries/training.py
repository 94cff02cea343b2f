"""Learned components of the training-data pipeline: tokenizer
vocabulary induction (BPE) and a distilled quality classifier.

Both are inherently iterative (merge rounds / gradient steps), so they
are driver rows-only checks (``__spark_entry__.ROWS_ONLY``); their
numerics are pinned exactly (BPE — integer counts) or at 1e-6
(logistic regression vs a dense numpy replay) in ``tests/test_bpe.py``
and ``tests/test_classifier.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..analytics import classifier
from ..catalog import load_table
from ..functions import text as textfns
from ..operators import bpe

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_MERGE_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("left", T.StringType(), False),
        T.StructField("right", T.StringType(), False),
        T.StructField("merged", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
    ]
)


@q("bpe_vocab_merges")
def bpe_vocab_merges(spark, sf_dir, n_merges: int = 24):
    """Learn the first ``n_merges`` BPE merges over the documents
    corpus (see operators/bpe.py for the scale topology: one
    corpus-sized shuffle to build the word-frequency table, then
    vocab-sized rounds). Output is the learned merge table — the
    tokenizer artifact itself. Integer counts + total tie-break make
    the sequence exactly reproducible; pinned byte-for-byte against a
    pure-Python reference in tests/test_bpe.py."""
    docs = load_table(spark, sf_dir, "documents", fanout=True)
    words = bpe.word_symbol_table(docs, textfns.tokens("text"))
    merges, _ = bpe.learn_merges(words, n_merges)
    return spark.createDataFrame(merges, schema=_MERGE_SCHEMA).orderBy("rank")


# Feature + label expressions shared by the query and its test replay.
def classifier_features(docs: DataFrame) -> DataFrame:
    toks = textfns.tokens("text")
    sw_arr = F.array(*[F.lit(w) for w in textfns.STOPWORDS["en"]])
    n_tok = F.size(toks)
    per_doc = docs.select(
        "doc_id",
        "n_chars",
        n_tok.alias("n_tok"),
        F.size(F.filter(toks, lambda t: F.array_contains(sw_arr, t))).alias(
            "sw"
        ),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("tok_chars"),
    )
    return per_doc.select(
        "doc_id",
        F.log1p("n_chars").alias("x_len"),
        (F.col("sw") / F.col("n_tok")).alias("x_sw_ratio"),
        (F.col("n_distinct") / F.col("n_tok")).alias("x_distinct_ratio"),
        (F.col("tok_chars") / F.col("n_tok")).alias("x_mean_tok_len"),
        # Label: the curation gate's keep/drop decision (length band +
        # token floor + stopword share), the heuristic this classifier
        # distills into a smooth score.
        (
            F.col("n_chars").between(100, 10000)
            & (F.col("n_tok") >= 20)
            & (F.col("sw") * 2 <= F.col("n_tok"))
        )
        .cast("double")
        .alias("label"),
    )


XCOLS = ["x_len", "x_sw_ratio", "x_distinct_ratio", "x_mean_tok_len"]


@q("quality_classifier_scores")
def quality_classifier_scores(spark, sf_dir, iters: int = 10):
    """Distill the rule-based quality gate into a learned linear
    scorer: label docs with the heuristic gate, train L2-regularized
    logistic regression by Newton/IRLS (one scan + one 1-row
    aggregate per iteration — analytics/classifier.py), then score
    every document JVM-side. Returns per-doc label, smooth score, and
    the hard prediction at 0.5."""
    docs = load_table(spark, sf_dir, "documents", fanout=True)
    # checkpoint BEFORE standardize: the token-array folds are the
    # expensive pass, and standardize's stats aggregate would
    # otherwise recompute them (measured 3.2s -> 0.9s at sf0.1)
    raw = classifier_features(docs).localCheckpoint(eager=True)
    feats = classifier.standardize(raw, XCOLS)
    model = classifier.logreg_fit(feats, XCOLS, "label", iters=iters)
    score = classifier.logreg_score(feats, model, XCOLS)
    return feats.select(
        "doc_id",
        F.col("label").cast("int").alias("label"),
        F.round(score, 4).alias("score"),
        (score >= 0.5).cast("int").alias("predicted"),
    )


@q("bpe_tokenize_docs")
def bpe_tokenize_docs(spark, sf_dir, n_merges: int = 24):
    """The APPLY side of the tokenizer — the operation that actually
    runs at 100 TB (training the vocab is offline; segmenting the
    corpus is the scale job): learn the merge table, then segment
    every document by broadcasting the word -> symbol-count vocabulary
    against the exploded token stream (segmentation is per-word, so
    the corpus-sized side never shuffles — one broadcast hash join +
    one doc-grain aggregate). Returns per-doc word and subword counts;
    per-doc parity with the sequential Python reference pinned in
    tests/test_bpe.py."""
    docs = load_table(spark, sf_dir, "documents", fanout=True)
    toks = textfns.tokens("text")
    words = bpe.word_symbol_table(docs, toks)
    _, final = bpe.learn_merges(words, n_merges)
    vocab = final.select("word", F.size("syms").alias("n_sub"))
    stream = (
        docs.select("doc_id", F.explode(toks).alias("word"))
        .where(F.length("word") > 0)
    )
    return (
        stream.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
        )
    )
