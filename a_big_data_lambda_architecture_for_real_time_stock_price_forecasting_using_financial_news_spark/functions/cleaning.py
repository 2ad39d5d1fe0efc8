"""Text cleaning as pure Column expressions (SURVEY §2.3 X4/X5).

The reference cleans text twice:
- producer-side regex chain (``producer/twitterProducer.py:28-29``): strip
  @mentions, URLs, non-alphanumerics, collapse spaces;
- engine-side scalar Python UDF (``Batch_layer/batchPipeline.py:41-52``):
  None/len<10 → null, strip emoji via ``emoji.EMOJI_DATA``, URLs, @handles,
  ``$`` ``#``, ``_``→space, trim.

A row-at-a-time Python UDF breaks WholeStageCodegen and pays a
JVM↔Python round trip per batch — at 100 TB that is the single hottest
anti-pattern in the reference. Everything here is ``regexp_replace``/
``translate``/``trim`` chains that stay JVM-side; emoji stripping uses
unicode-range character classes instead of a Python emoji table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Emoji / pictograph blocks (covers the overwhelming bulk of
#: ``emoji.EMOJI_DATA``): misc symbols, dingbats, emoticons, transport,
#: supplemental symbols, flags, variation selectors, ZWJ.
EMOJI_CLASS = (
    "[\\x{1F000}-\\x{1FAFF}\\x{2600}-\\x{27BF}\\x{FE0E}\\x{FE0F}\\x{200D}"
    "\\x{2190}-\\x{21FF}\\x{2B00}-\\x{2BFF}\\x{1F1E6}-\\x{1F1FF}]"
)

URL_RE = r"(https?://\S+|www\.\S+)"
HANDLE_RE = r"@\w+"


def clean_text(col: Column | str, min_len: int = 10) -> Column:
    """X5: the CleanNews UDF's semantics, UDF-free.

    Order mirrors the reference (batchPipeline.py:41-52): length gate →
    emoji strip → URL strip → handle strip → ``$``/``#`` removal →
    ``_``→space → whitespace collapse → trim. Returns NULL for null/short
    input (caller drops with ``na.drop``, P6).
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c, EMOJI_CLASS, "")
    cleaned = F.regexp_replace(cleaned, URL_RE, "")
    cleaned = F.regexp_replace(cleaned, HANDLE_RE, "")
    cleaned = F.regexp_replace(cleaned, r"[$#]", "")
    cleaned = F.regexp_replace(cleaned, r"_", " ")
    cleaned = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    return F.when(c.isNotNull() & (F.length(c) >= min_len), cleaned)


def clean_tweet(col: Column | str) -> Column:
    """X4: producer-side tweet cleaning (twitterProducer.py:28-29):
    remove @mentions and URLs, drop non-alphanumerics (keep spaces),
    collapse runs of spaces, strip ``;``, trim."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c, HANDLE_RE, "")
    cleaned = F.regexp_replace(cleaned, URL_RE, "")
    cleaned = F.regexp_replace(cleaned, r"[^A-Za-z0-9 ]", "")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))
