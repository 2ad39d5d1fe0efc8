"""Pluggable sentiment scorer (SURVEY §2.6 M3).

The reference runs Spark-NLP FinBERT
(``Batch_layer/batchPipeline.py:134-147``) and reads per-class
probabilities out of annotation-struct metadata maps. Model downloads are
not reproducible test dependencies, so the default backend here is a
deterministic lexicon scorer producing the same *shape*: a
``map<string,double>`` with keys ``positive``/``negative``/``neutre``,
values in [0,1] summing to 1.

Two implementations behind one interface:
- :func:`lexicon_scores` — pure Column expressions, stays in codegen (the
  scale path; default);
- :func:`lexicon_scores_pandas` — the same math as an Arrow-batched
  ``pandas_udf``, demonstrating the integration seam a real FinBERT backend
  would use (batch inference over Arrow record batches).

Determinism contract for the oracle: hit counts are integers; every
probability is one ``int/int`` double division, so Spark and DuckDB agree
bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

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


@pandas_udf("positive double, negative double, neutre double")
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
