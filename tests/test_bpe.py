"""BPE vocabulary induction: exact parity with a pure-Python reference
implementation (integer counts + total tie-break => the merge sequence
is exactly reproducible), plus segmentation-compression sanity."""

from __future__ import annotations

import re
from collections import Counter

import duckdb
from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.operators import bpe
from lakehouse_for_data_streaming_and_analysis_spark.functions import text as textfns
from lakehouse_for_data_streaming_and_analysis_spark.queries.training import bpe_vocab_merges

from .conftest import SF_DIR

N_MERGES = 12


def _python_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference BPE (Sennrich et al. 2016 algorithm, reimplemented):
    greedy top-pair merging over the word-frequency table with the
    same (count desc, pair asc) tie-break as the Spark operator."""
    vocab = {
        tuple(list(w) + [bpe.EOW]): c for w, c in word_counts.items()
    }
    merges = []
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
                "pair_count": cnt,
            }
        )
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges, vocab


def _word_counts_from_fixture() -> dict[str, int]:
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT w, COUNT(*) FROM (
              SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
              FROM read_parquet('{SF_DIR}/documents.parquet'))
            WHERE len(w) > 0 GROUP BY 1"""
    ).fetchall()
    con.close()
    return {w: c for w, c in rows}


import pytest

# local_threshold=0 forces the distributed merge rounds; the default
# takes the driver-local fast path — both must produce the classic
# sequential merge sequence byte-for-byte.
PATHS = pytest.mark.parametrize(
    "local_threshold", [0, 200_000], ids=["distributed", "local"]
)


@PATHS
def test_merge_sequence_matches_python_reference(spark, local_threshold):
    from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    words = bpe.word_symbol_table(docs, textfns.tokens("text"))
    got, _ = bpe.learn_merges(
        words, N_MERGES, local_threshold=local_threshold
    )
    want, _ = _python_bpe(_word_counts_from_fixture(), N_MERGES)
    assert got == want


@PATHS
def test_final_symbol_table_matches_python_reference(spark, local_threshold):
    from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    words = bpe.word_symbol_table(docs, textfns.tokens("text"))
    _, final = bpe.learn_merges(
        words, N_MERGES, local_threshold=local_threshold
    )
    got = {
        tuple(r.syms): r.weight
        for r in final.groupBy("syms")
        .agg(F.sum("weight").alias("weight"))
        .collect()
    }
    _, want_vocab = _python_bpe(_word_counts_from_fixture(), N_MERGES)
    assert got == dict(want_vocab)


def test_query_output_matches_reference(spark):
    got = bpe_vocab_merges(spark, SF_DIR, n_merges=N_MERGES).collect()
    want, _ = _python_bpe(_word_counts_from_fixture(), N_MERGES)
    assert [
        (r.rank, r.left, r.right, r.merged, r.pair_count) for r in got
    ] == [
        (m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
        for m in want
    ]


def test_merges_compress_the_corpus(spark):
    """Each merge strictly reduces total symbol count by its pair
    count (non-overlapping greedy application) — the compression
    monotonicity that makes BPE a compression algorithm."""
    from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    words = bpe.word_symbol_table(docs, textfns.tokens("text"))
    before = words.agg(
        F.sum(F.size("syms") * F.col("weight"))
    ).collect()[0][0]
    merges, final = bpe.learn_merges(words, N_MERGES)
    after = final.agg(
        F.sum(F.size("syms") * F.col("weight"))
    ).collect()[0][0]
    assert after < before
    # every learned merge is a real unit over the corpus alphabet
    for m in merges:
        assert m["pair_count"] >= 1
        assert m["merged"] == m["left"] + m["right"]
        assert not re.fullmatch(r"\s*", m["merged"])


def test_tokenize_docs_matches_python_segmentation(spark):
    from lakehouse_for_data_streaming_and_analysis_spark.queries.training import bpe_tokenize_docs

    got = {
        r.doc_id: (r.n_words, r.n_subwords)
        for r in bpe_tokenize_docs(spark, SF_DIR, n_merges=N_MERGES).collect()
    }
    _, vocab = _python_bpe(_word_counts_from_fixture(), N_MERGES)
    sub_len = {
        "".join(s for s in k)[: -len(bpe.EOW)]: len(k) for k in vocab
    }
    con = duckdb.connect()
    doc_words = con.execute(
        f"""SELECT doc_id, w FROM (
              SELECT doc_id,
                     unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
              FROM read_parquet('{SF_DIR}/documents.parquet'))
            WHERE len(w) > 0"""
    ).fetchall()
    con.close()
    want: dict = {}
    for doc_id, w in doc_words:
        n_words, n_sub = want.get(doc_id, (0, 0))
        want[doc_id] = (n_words + 1, n_sub + sub_len[w])
    assert got == want
