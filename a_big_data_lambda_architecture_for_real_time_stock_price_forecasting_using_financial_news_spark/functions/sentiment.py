"""Pluggable sentiment scorer (SURVEY §2.6 M3).

The reference runs Spark-NLP FinBERT
(``Batch_layer/batchPipeline.py:134-147``) and reads per-class
probabilities out of annotation-struct metadata maps. Model downloads are
not reproducible test dependencies, so the default backend here is a
deterministic lexicon scorer producing the same *shape*: a
``map<string,double>`` with keys ``positive``/``negative``/``neutre``,
values in [0,1] summing to 1.

Three implementations behind one interface:
- :func:`lexicon_scores` — pure Column expressions, stays in codegen (the
  cheapest path when the scorer really is a lexicon);
- :func:`lexicon_scores_pandas` — the same math as an Arrow-batched
  ``pandas_udf`` in plain pandas ops;
- :func:`tensor_scores_pandas` — a frozen-weight embedding+linear net run
  as REAL batched tensor math (token-id gather → sum-pool → matmul) over
  each Arrow record batch with numpy: the execution shape of the
  reference's FinBERT stage (batch inference, padded token batches,
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounding peak memory).

Determinism contract for the oracle: hit counts are integers; every
probability is one ``int/int`` double division, so Spark and DuckDB agree
bit-for-bit. The tensor net's integer weights ENCODE the lexicon, so all
three backends are value-identical and interchangeable under the same
oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StructField, StructType

# Explicit StructType, never a DDL string: this module is imported inside
# executor Python workers (the tensor scorer's batch function lives here),
# and decorating with a string return type would try to parse DDL where no
# SparkSession exists.
_SCORE_SCHEMA = StructType(
    [
        StructField("positive", DoubleType()),
        StructField("negative", DoubleType()),
        StructField("neutre", DoubleType()),
    ]
)

POSITIVE_WORDS = ("fast", "big")
NEGATIVE_WORDS = ("slow", "small")


def _hits(words: Column, vocab: tuple[str, ...]) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(*vocab)))


def score_components(text: Column | str) -> dict[str, Column]:
    """Integer hit counts + total token count (duplicates counted, matching
    a bag-of-words model)."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.split(c, " ")
    return {
        "n_words": F.size(words),
        "pos_hits": _hits(words, POSITIVE_WORDS),
        "neg_hits": _hits(words, NEGATIVE_WORDS),
    }


def lexicon_scores(text: Column | str) -> Column:
    """map<string,double> sentiment scores; shape-compatible with the
    FinBERT metadata map the reference indexes at batchPipeline.py:80-82."""
    comp = score_components(text)
    n = comp["n_words"].cast("double")
    pos = comp["pos_hits"] / n
    neg = comp["neg_hits"] / n
    neutre = (comp["n_words"] - comp["pos_hits"] - comp["neg_hits"]) / n
    return F.create_map(
        F.lit("positive"), pos, F.lit("negative"), neg, F.lit("neutre"), neutre
    )


@pandas_udf(_SCORE_SCHEMA)
def lexicon_scores_pandas(text: pd.Series) -> pd.DataFrame:
    """Arrow-batched scorer — the seam a transformer model would plug into
    (tokenize + batch-infer per Arrow batch). Same math as
    :func:`lexicon_scores`."""
    words = text.str.split(" ")
    n = words.str.len().astype("float64")
    pos = words.apply(lambda ws: sum(w in POSITIVE_WORDS for w in ws))
    neg = words.apply(lambda ws: sum(w in NEGATIVE_WORDS for w in ws))
    return pd.DataFrame(
        {
            "positive": pos / n,
            "negative": neg / n,
            "neutre": (n - pos - neg) / n,
        }
    )


# --- frozen-weight tensor scorer --------------------------------------------
# A tiny embedding+linear net whose INTEGER weights encode the lexicon:
# the embedding maps a token to [is_positive, is_negative, 1], sum-pooling
# yields the hidden state h = [pos_hits, neg_hits, n_words], and the head
# maps h to logits [pos, neg, n - pos - neg]. The model's capacity is not
# the point — its EXECUTION is: scoring runs as genuine padded-batch tensor
# math (token-id gather → sum-pool → batched matmul) over every Arrow
# record batch, the same shape a real FinBERT checkpoint runs through this
# seam (reference Batch_layer/batchPipeline.py:134-147), while integer
# arithmetic until one final division keeps it bit-identical to the
# lexicon oracle.
_VOCAB = {w: i for i, w in enumerate(POSITIVE_WORDS + NEGATIVE_WORDS)}
_OOV = len(_VOCAB)  # unknown-token id
_PAD = _OOV + 1  # padding id: all-zero embedding row
_EMB = np.zeros((_PAD + 1, 3), dtype=np.int64)
for _w, _i in _VOCAB.items():
    _EMB[_i, 0] = 1 if _w in POSITIVE_WORDS else 0
    _EMB[_i, 1] = 1 if _w in NEGATIVE_WORDS else 0
_EMB[:_PAD, 2] = 1  # every real token (incl. OOV) contributes 1 to n_words
_HEAD = np.array([[1, 0, 0], [0, 1, 0], [-1, -1, 1]], dtype=np.int64)


def tensor_score_batch(text: pd.Series) -> pd.DataFrame:
    """One Arrow batch through the frozen net, all-numpy:

    tokenize → id-encode into a padded (batch, max_len) matrix → embedding
    gather ``E[ids]`` → sum-pool over the sequence axis → ``h @ W.T``.
    Peak memory is O(batch × max_len × dim), which is exactly what
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds — size it so a
    batch of activations fits next to the model weights (the FinBERT-shape
    sizing question this backend exists to exercise)."""
    toks = [t.split(" ") if isinstance(t, str) else [] for t in text]
    bsz = len(toks)
    maxlen = max((len(ws) for ws in toks), default=1) or 1
    ids = np.full((bsz, maxlen), _PAD, dtype=np.int64)
    for r, ws in enumerate(toks):
        for c, w in enumerate(ws):
            ids[r, c] = _VOCAB.get(w, _OOV)
    h = _EMB[ids].sum(axis=1)  # (batch, 3) gather + sum-pool
    logits = h @ _HEAD.T  # (batch, 3) batched matmul
    with np.errstate(invalid="ignore", divide="ignore"):
        probs = logits.astype(np.float64) / h[:, 2].astype(np.float64)[:, None]
    return pd.DataFrame(
        {"positive": probs[:, 0], "negative": probs[:, 1], "neutre": probs[:, 2]},
        index=text.index,
    )


def make_tensor_udf(batch_counter=None):
    """Build the Arrow-batched tensor scorer. ``batch_counter`` (a Spark
    accumulator) lets tests observe how many record batches actually
    crossed the seam under a given arrow.maxRecordsPerBatch setting."""
    @pandas_udf(_SCORE_SCHEMA)
    def tensor_scores(text: pd.Series) -> pd.DataFrame:
        if batch_counter is not None:
            batch_counter.add(1)
        return tensor_score_batch(text)

    return tensor_scores


tensor_scores_pandas = make_tensor_udf()
