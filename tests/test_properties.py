"""Property-based equivalence tests (hypothesis): each scale-path operator
must be result-identical to its naive formulation on arbitrary inputs —
the invariant the oracle gate checks on fixtures, here checked on
adversarial generated data (duplicate keys, hot keys, sub-second
timestamps, empty sides).

Example counts are kept small: every example runs real Spark jobs."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

PKG = "a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark"


def _mod(name):
    from importlib import import_module

    return import_module(f"{PKG}.{name}")


# a tiny key space on purpose: forces duplicate + hot keys
_keys = st.integers(min_value=0, max_value=3)
_vals = st.integers(min_value=-5, max_value=5)


@settings(max_examples=8, deadline=None)
@given(
    left=st.lists(st.tuples(_keys, _vals), max_size=12),
    right=st.lists(st.tuples(_keys, _vals), max_size=6),
    n_salts=st.integers(min_value=1, max_value=5),
)
def test_salted_join_equals_plain_join_on_any_data(spark, left, right, n_salts):
    joins = _mod("operators.joins")
    l = spark.createDataFrame(
        [Row(k=k, lv=v) for k, v in left], "k int, lv int"
    )
    r = spark.createDataFrame(
        [Row(k=k, rv=v) for k, v in right], "k int, rv int"
    )
    for how in ("inner", "left"):
        plain = sorted(tuple(x) for x in l.join(r, ["k"], how).collect())
        salted = sorted(
            tuple(x) for x in joins.salted_join(l, r, ["k"], n_salts, how).collect()
        )
        assert salted == plain, (how, n_salts)


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(st.tuples(_keys, st.integers(min_value=0, max_value=9)), max_size=20),
    n_salts=st.integers(min_value=1, max_value=5),
)
def test_salted_count_distinct_equals_plain(spark, rows, n_salts):
    agg = _mod("operators.aggregate")
    df = spark.createDataFrame([Row(k=k, v=v) for k, v in rows], "k int, v int")
    plain = {
        r["k"]: r["nd"]
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("nd")).collect()
    }
    salted = {
        r["k"]: r["n_distinct"]
        for r in agg.salted_count_distinct(df, ["k"], "v", n_salts).collect()
    }
    assert salted == plain


_EPOCH = datetime.datetime(2024, 1, 1)


def _ts(micros: int) -> datetime.datetime:
    return _EPOCH + datetime.timedelta(microseconds=micros)


# timestamps inside ~3 bucket widths (bucket=10s), microsecond resolution
# around bucket edges to hunt boundary bugs
_micros = st.one_of(
    st.integers(min_value=0, max_value=30_000_000),
    # dense cloud right at bucket boundaries
    st.builds(
        lambda b, d: b * 10_000_000 + d,
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=-2, max_value=2).map(lambda x: x % 10_000_000),
    ),
)


@settings(max_examples=8, deadline=None)
@given(
    points=st.lists(st.tuples(_keys, _micros), max_size=10),
    intervals=st.lists(
        st.tuples(_keys, _micros, st.integers(min_value=0, max_value=25_000_000)),
        max_size=5,
    ),
)
def test_point_in_interval_join_equals_naive(spark, points, intervals):
    """Bucketed range join == naive non-equi join for ANY microsecond
    timestamps (the r2 advice bug: second-truncated bucketing dropped the
    final bucket of sub-second interval ends)."""
    rj = _mod("operators.range_join")
    p = spark.createDataFrame(
        [Row(u=k, ts=_ts(m), pid=i) for i, (k, m) in enumerate(points)],
        "u int, ts timestamp, pid int",
    )
    iv = spark.createDataFrame(
        [
            Row(u=k, start=_ts(s), end=_ts(s + w), iid=i)
            for i, (k, s, w) in enumerate(intervals)
        ],
        "u int, start timestamp, end timestamp, iid int",
    )
    got = {
        (r["pid"], r["iid"])
        for r in rj.point_in_interval_join(
            p, iv, ["u"], "ts", "start", "end", bucket_seconds=10
        ).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in p.join(iv, "u")
        .filter((F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end")))
        .collect()
    }
    assert got == naive


@settings(max_examples=6, deadline=None)
@given(
    batches=st.lists(
        st.lists(st.tuples(_keys, st.integers(min_value=-100, max_value=100)), min_size=1, max_size=6),
        min_size=1,
        max_size=4,
    )
)
def test_incremental_mean_any_batch_split_equals_global_mean(spark, batches, tmp_path_factory):
    """K5 invariant: merging (sum,count) states batch by batch — in any
    split — yields the exact global mean per key."""
    upsert = _mod("streaming.upsert")

    tmp = tmp_path_factory.mktemp("mean_prop")
    view = upsert.KeyedParquetView(spark, str(tmp / "v"), ["k"])
    allrows: list[tuple[int, int]] = []
    for i, batch in enumerate(batches):
        allrows.extend(batch)
        b = (
            spark.createDataFrame([Row(k=k, v=v) for k, v in batch], "k int, v int")
            .groupBy("k")
            .agg(F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("cnt_v"))
        )
        view.merge_incremental_mean(b, batch_id=i)
    got = {r["k"]: (r["sum_v"], r["cnt_v"]) for r in view.read().collect()}
    want: dict[int, list[int]] = {}
    for k, v in allrows:
        want.setdefault(k, [0, 0])
        want[k][0] += v
        want[k][1] += 1
    assert got == {k: (s, c) for k, (s, c) in want.items()}


@settings(max_examples=6, deadline=None)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["stock", "senti"]),  # which column-half writes
            _keys,  # which day
            st.integers(min_value=0, max_value=99),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_column_half_merges_any_interleaving(spark, ops, tmp_path_factory):
    """J2 invariant: for ANY interleaving of stock-half and sentiment-half
    merges, each key's final row holds the LAST written value of each half
    independently (the reference's racing painless scripts, serialized)."""
    upsert = _mod("streaming.upsert")

    tmp = tmp_path_factory.mktemp("halves_prop")
    view = upsert.KeyedParquetView(spark, str(tmp / "v"), ["d"])
    last: dict[tuple[str, int], int] = {}
    for i, (half, day, val) in enumerate(ops):
        if half == "stock":
            b = spark.createDataFrame(
                [Row(d=f"day{day}", close=float(val))], "d string, close double"
            )
            view.merge_column_halves(b, ["close"], batch_id=i, writer="stock")
        else:
            b = spark.createDataFrame(
                [Row(d=f"day{day}", nbr=val)], "d string, nbr int"
            )
            view.merge_column_halves(b, ["nbr"], batch_id=i, writer="senti")
        last[(half, day)] = val
    rows = {r["d"]: r for r in view.read().collect()}
    days = {d for (_, d) in last}
    assert set(rows) == {f"day{d}" for d in days}
    for d in days:
        row = rows[f"day{d}"]
        want_stock = last.get(("stock", d))
        want_senti = last.get(("senti", d))
        got_stock = row["close"] if "close" in rows[f"day{d}"].__fields__ else None
        assert got_stock == (float(want_stock) if want_stock is not None else None), d
        got_senti = row["nbr"] if "nbr" in row.__fields__ else None
        assert got_senti == want_senti, d


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=99), min_size=1, max_size=120),
        min_size=1,
        max_size=6,
    )
)
def test_chunking_covers_every_word_exactly_once_per_window(spark, docs):
    """For any document, x28 chunking (a) covers every word position in at
    least one chunk, (b) starts exactly at multiples of the stride, and
    (c) reassembling the stride-prefix of each chunk plus the tail of the
    last reproduces the document."""
    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.plans.registry import (
        CHUNK_STRIDE,
        CHUNK_WORDS,
        x28_doc_chunking,
    )
    import tempfile

    rows = [
        (i, " ".join(f"w{tok}x{j}" for j, tok in enumerate(words)), "en", "s", 0)
        for i, words in enumerate(docs)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        out = x28_doc_chunking(spark, d).collect()

    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(range(len(docs)))
    for i, words in enumerate(docs):
        original = [f"w{tok}x{j}" for j, tok in enumerate(words)]
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        assert [c.start_word for c in chunks] == [
            k * CHUNK_STRIDE for k in range(len(chunks))
        ]
        # width: CHUNK_WORDS except possibly the tail
        for c in chunks:
            assert c.n_words == min(CHUNK_WORDS, len(original) - c.start_word)
            assert c.chunk_text.split(" ") == original[
                c.start_word : c.start_word + CHUNK_WORDS
            ]
        rebuilt = []
        for c in chunks[:-1]:
            rebuilt.extend(c.chunk_text.split(" ")[:CHUNK_STRIDE])
        rebuilt.extend(chunks[-1].chunk_text.split(" "))
        assert rebuilt == original


@settings(max_examples=8, deadline=None)
@given(
    # (ts_offset_seconds, price_cents, batch_assignment): a TINY ts space on
    # purpose so same-timestamp trades with different prices are common —
    # the r7-advice hazard the t17 fixture's unique timestamps never hit
    trades=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),      # ts collision-prone
            st.integers(min_value=1, max_value=999),    # price in cents
            st.integers(min_value=0, max_value=2),      # micro-batch id
        ),
        min_size=1,
        max_size=18,
    ),
    day_span=st.integers(min_value=1, max_value=2),
)
def test_ohlc_state_split_invariant_under_any_batching(spark, trades, day_span):
    """The Lambda convergence algebra, property-checked: folding per-batch
    ``daily_ohlc_state`` partials through ``merge_ohlc_states`` must equal
    the single-pass state over ALL trades, for ANY assignment of trades to
    micro-batches and ANY batch arrival order — including same-timestamp
    different-price collisions, where both sides must apply the same
    lexicographic (ts, value) tiebreak or open/close diverge."""
    upsert = _mod("streaming.upsert")
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            [
                Row(
                    ts=base
                    + datetime.timedelta(days=(off % day_span), seconds=off),
                    value=cents / 100.0,
                )
                for off, cents, _ in rows
            ],
            "ts timestamp, value double",
        )

    full = upsert.daily_ohlc_state(mk(trades))

    batches = {}
    for row in trades:
        batches.setdefault(row[2], []).append(row)
    # reversed arrival order exercises commutativity, not just associativity
    parts = [
        upsert.daily_ohlc_state(mk(rows))
        for _, rows in sorted(batches.items(), reverse=True)
    ]
    folded = parts[0]
    for p in parts[1:]:
        folded = upsert.merge_ohlc_states(folded, p, ["event_date"])

    def norm(df):
        return sorted(
            (
                r["event_date"],
                r["open_ts"],
                str(r["open_v"]),
                str(r["high_v"]),
                str(r["low_v"]),
                r["close_ts"],
                str(r["close_v"]),
                r["n_trades"],
                str(r["turnover"]),
            )
            for r in df.collect()
        )

    assert norm(folded) == norm(full)


@settings(max_examples=8, deadline=None)
@given(
    # duration can be zero (degenerate instant) and starts collide often,
    # with multi-key interleaving; swallowing intervals (long early span
    # covering several later ones) appear naturally from the wide range
    iv=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),    # user
            st.integers(min_value=0, max_value=20),   # start offset (s)
            st.integers(min_value=0, max_value=15),   # duration (s)
        ),
        min_size=1,
        max_size=16,
    ),
)
def test_interval_coalesce_matches_naive_sweep(spark, iv):
    """w19's windowed gaps-and-islands must equal the textbook O(n log n)
    driver-side sweep on arbitrary spans — including an early interval that
    swallows several later-starting ones (the case plain lag(e) gets wrong
    and the running max of prior ends exists to handle)."""
    from pyspark.sql import Window

    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        Row(
            user_id=u,
            event_id=i,
            s=base + datetime.timedelta(seconds=st_),
            e=base + datetime.timedelta(seconds=st_ + d),
        )
        for i, (u, st_, d) in enumerate(iv)
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, s timestamp, e timestamp"
    )

    # the w19 plan shape, applied to the generated spans directly
    wo = Window.partitionBy("user_id").orderBy("s", "event_id")
    m = df.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.max("e").over(wo.rowsBetween(Window.unboundedPreceding, -1)).alias("pm"),
    )
    isl = m.select(
        "user_id",
        "s",
        "e",
        F.sum(
            F.when(F.col("pm").isNull() | (F.col("s") > F.col("pm")), 1).otherwise(0)
        )
        .over(wo)
        .alias("island"),
    )
    got = sorted(
        (r["user_id"], r["island_start"], r["island_end"], r["n"])
        for r in isl.groupBy("user_id", "island")
        .agg(
            F.min("s").alias("island_start"),
            F.max("e").alias("island_end"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )

    # naive sweep: sort per key, merge while next.start <= running max end
    want = []
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.s, r.e, r.event_id))
    for u, spans in by_user.items():
        spans.sort(key=lambda t: (t[0], t[2]))
        cur_s, cur_e, n = spans[0][0], spans[0][1], 1
        for s, e, _ in spans[1:]:
            if s <= cur_e:
                cur_e = max(cur_e, e)
                n += 1
            else:
                want.append((u, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
        want.append((u, cur_s, cur_e, n))
    assert got == sorted(want)


@settings(max_examples=6, deadline=None)
@given(
    # tiny vocab + containment-prone construction: half the docs are
    # near-substrings of others, so C(A,B) >= 0.9 pairs actually occur
    docs=st.lists(
        st.lists(st.sampled_from("a b c d e f".split()), min_size=12, max_size=30),
        min_size=2,
        max_size=6,
    ),
    paste=st.booleans(),
)
def test_containment_prefix_filter_has_zero_false_negatives(spark, docs, paste):
    """d12's exactness claim, adversarially checked: the PPJoin prefix
    filter (each doc posts only its floor(0.1*n)+1 smallest sorted shingle
    hashes) plus the integer verify must return EXACTLY the brute-force
    all-pairs containment relation over the same shingle sets — no false
    negatives (the filter's theorem) and no false positives (the verify)."""
    dedup = _mod("ext.dedup")

    rows = [Row(doc_id=i, text=" ".join(toks)) for i, toks in enumerate(docs)]
    if paste and docs:
        # a guaranteed containment case: doc 0 pasted into a longer page
        rows.append(
            Row(
                doc_id=len(rows),
                text=" ".join(docs[0]) + " " + " ".join(docs[-1]),
            )
        )
    df = spark.createDataFrame(rows, "doc_id int, text string")

    got = sorted(
        (r["id_small"], r["id_big"], r["inter"])
        for r in dedup.containment_pairs(df, "doc_id", "text").collect()
    )

    # ground truth: same sketch sets, brute-force all ordered pairs
    sz = df.select(
        "doc_id",
        dedup.shingle_hashes(dedup.shingles(F.col("text"))).alias("hs"),
    ).collect()
    sets = {r["doc_id"]: set(r["hs"]) for r in sz if len(r["hs"]) >= 10}
    want = []
    ids = sorted(sets)
    for a in ids:
        for b in ids:
            if a == b:
                continue
            na, nb = len(sets[a]), len(sets[b])
            # orientation: small side first, (n, id) tuple order
            if (na, a) >= (nb, b):
                continue
            inter = len(sets[a] & sets[b])
            if 10 * inter >= 9 * na:
                want.append((a, b, inter))
    assert got == sorted(want)


@settings(max_examples=8, deadline=None)
@given(
    lefts=st.lists(st.tuples(_keys, st.integers(min_value=0, max_value=8)), min_size=1, max_size=12),
    rights=st.lists(
        st.tuples(_keys, st.integers(min_value=0, max_value=8), _vals),
        max_size=10,
        unique_by=lambda t: (t[0], t[1]),  # the operator's documented precondition
    ),
)
def test_asof_join_equals_naive_most_recent_prior(spark, lefts, rights):
    """The union-sort as-of join must equal the naive per-left-row argmax
    (most recent right with ts <= left.ts, per key) on any data — dense ts
    collisions included, where a right row at EXACTLY left.ts must be
    visible to that left row (ASOF >= semantics, the tag DESC detail)."""
    asof = _mod("operators.asof")
    l = spark.createDataFrame(
        [Row(k=k, ts=_ts(s * 1_000_000), lid=i) for i, (k, s) in enumerate(lefts)],
        "k int, ts timestamp, lid int",
    )
    r = spark.createDataFrame(
        [Row(k=k, ts=_ts(s * 1_000_000), px=v) for k, s, v in rights],
        "k int, ts timestamp, px int",
    )
    got = {
        row["lid"]: row["px"]
        for row in asof.asof_join(l, r, ["k"], "ts", ["px"]).collect()
    }
    want = {}
    for i, (k, s) in enumerate(lefts):
        best = None
        for rk, rs, rv in rights:
            if rk == k and rs <= s and (best is None or rs > best[0]):
                best = (rs, rv)
        want[i] = best[1] if best else None
    assert got == want


def _py_phash60(tok: str) -> int:
    import hashlib

    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)


def _py_fold60(phs: list[int]) -> int:
    """hashlib twin of hashing.fold60: md5 over '|'-joined decimals,
    first 15 hex chars as an int (60 bits)."""
    import hashlib

    joined = "|".join(str(p) for p in phs)
    return int(hashlib.md5(joined.encode()).hexdigest()[:15], 16)


def _py_cdc_chunks(toks: list[str]) -> list[tuple[int, int]]:
    """Independent (hashlib-only) model of x36's per-doc chunking:
    boundary BEFORE any token whose hash % 64 == 0; chunk identity =
    60-bit fold60 over the chunk's ordered token hashes (widened from
    the old mod-1e9 rolling fold, r11 ADVICE). Returns
    [(chunk_hash, n_toks)]."""
    out: list[tuple[int, int]] = []
    cur: list[int] = []
    for t in toks:
        ph = _py_phash60(t)
        if ph % 64 == 0 and cur:
            out.append((_py_fold60(cur), len(cur)))
            cur = []
        cur.append(ph)
    if cur:
        out.append((_py_fold60(cur), len(cur)))
    return out


def _cdc_vocab() -> list[str]:
    """6 non-boundary + 2 boundary tokens (hash % 64 == 0), found by probe
    so generated docs actually contain chunk boundaries."""
    bound = [w for w in (f"w{i}" for i in range(3000)) if _py_phash60(w) % 64 == 0][:2]
    plain = [w for w in (f"w{i}" for i in range(3000)) if _py_phash60(w) % 64 != 0][:6]
    assert len(bound) == 2
    return plain + bound


_CDC_VOCAB = _cdc_vocab()


@settings(max_examples=6, deadline=None)
@given(
    doc=st.lists(st.integers(min_value=0, max_value=7), min_size=10, max_size=40),
    ins_at=st.integers(min_value=0, max_value=40),
    ins_tok=st.integers(min_value=0, max_value=7),
)
def test_cdc_chunking_matches_reference_and_is_insert_local(spark, doc, ins_at, ins_tok):
    """x36's content-defined chunking, property-checked two ways: (1) the
    engine pipeline (tokens -> phash60 -> boundary window -> fold60
    agg) equals an independent hashlib reimplementation on any doc; (2) the
    operator's reason to exist — inserting ONE token changes at most the
    one chunk containing the edit (which may split in two if the inserted
    token is a boundary), every other chunk fingerprint survives — unlike
    fixed windows, where everything after the edit shifts."""
    tx, hh = _mod("ext.text"), _mod("ext.hashing")

    toks = [_CDC_VOCAB[i] for i in doc]
    pos = min(ins_at, len(toks))
    edited = toks[:pos] + [_CDC_VOCAB[ins_tok]] + toks[pos:]
    df = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(toks)), Row(doc_id=2, text=" ".join(edited))],
        "doc_id int, text string",
    )

    from pyspark.sql import Window

    t = df.select("doc_id", F.posexplode(tx.tokens(F.col("text"))).alias("pos", "t"))
    h = t.select("doc_id", "pos", hh.phash60(F.col("t")).alias("ph"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    c = h.withColumn(
        "chunk",
        F.sum(F.when(F.col("ph") % 64 == 0, 1).otherwise(0)).over(w),
    )
    g = c.groupBy("doc_id", "chunk").agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("pos").alias("p"), F.col("ph").alias("s"))
            )
        ).alias("arr"),
        F.count(F.lit(1)).alias("n_toks"),
    )
    fp = g.select(
        "doc_id",
        "chunk",
        hh.fold60(F.transform(F.col("arr"), lambda x: x["s"])).alias("chunk_hash"),
        "n_toks",
    )
    rows = fp.collect()
    got = {
        did: [
            (r["chunk_hash"], r["n_toks"])
            for r in sorted(rows, key=lambda r: r["chunk"])
            if r["doc_id"] == did
        ]
        for did in (1, 2)
    }

    ref_orig, ref_new = _py_cdc_chunks(toks), _py_cdc_chunks(edited)
    assert got[1] == ref_orig
    assert got[2] == ref_new

    # insert locality on the chunk sequences
    i = 0
    while i < min(len(ref_orig), len(ref_new)) and ref_orig[i] == ref_new[i]:
        i += 1
    k = 0
    while (
        k < min(len(ref_orig), len(ref_new)) - i
        and ref_orig[len(ref_orig) - 1 - k] == ref_new[len(ref_new) - 1 - k]
    ):
        k += 1
    assert len(ref_orig) - i - k <= 1, (ref_orig, ref_new)
    assert len(ref_new) - i - k <= 2, (ref_orig, ref_new)


# ---------------------------------------------------------------------------
# r9 additions: KMV closure, bitmap OR-merge, plan-compiled GBT, PPS crossing
# ---------------------------------------------------------------------------

_ids = st.integers(min_value=0, max_value=60)


def _phash60_py(s: str, seed: str) -> int:
    import hashlib

    return int(hashlib.md5(f"{seed}|{s}".encode()).hexdigest()[:15], 16)


@settings(max_examples=8, deadline=None)
@given(
    a=st.sets(_ids, max_size=30),
    b=st.sets(_ids, max_size=30),
    k=st.integers(min_value=2, max_value=8),
)
def test_kmv_sketch_union_closure_and_jaccard(spark, a, b, k):
    """The a30 combine rule — k smallest of the two SKETCHES' union —
    must equal the KMV sketch of the full set union (the closure
    property the 2K-row pairwise combine relies on), and the matches
    count must equal the textbook combined-sketch Jaccard numerator
    computed from the raw sets."""
    ha = sorted(_phash60_py(str(x), "kmv") for x in a)
    hb = sorted(_phash60_py(str(x), "kmv") for x in b)
    sk_a, sk_b = ha[:k], hb[:k]
    # engine-side combine: k smallest of the union of the two sketches
    combined = sorted(set(sk_a) | set(sk_b))[:k]
    # naive: KMV of the full union
    truth = sorted({_phash60_py(str(x), "kmv") for x in (a | b)})[:k]
    assert combined == truth
    matches = sum(1 for h in combined if h in set(sk_a) and h in set(sk_b))
    naive_matches = sum(1 for h in truth if h in set(ha[:k]) and h in set(hb[:k]))
    assert matches == naive_matches


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(st.tuples(_keys, _ids), min_size=1, max_size=40),
    cut=st.integers(min_value=0, max_value=40),
)
def test_bitmap_or_merge_equals_one_shot_and_exact(spark, rows, cut):
    """a29/t25's algebra: word-wise OR of per-batch bitmap partials must
    equal the one-shot bitmap, and popcount must equal exact distinct —
    for ANY batch split (the t17 mergeable-state contract)."""
    cut = min(cut, len(rows))

    def words(batch):
        out = {}
        for t, u in batch:
            key = (t, u // 62)
            out[key] = out.get(key, 0) | (1 << (u % 62))
        return out

    w1, w2 = words(rows[:cut]), words(rows[cut:])
    merged = dict(w1)
    for kk, v in w2.items():
        merged[kk] = merged.get(kk, 0) | v
    # engine one-shot over the same rows
    df = spark.createDataFrame(
        [Row(event_type=str(t), user_id=u) for t, u in rows],
        "event_type string, user_id long",
    )
    got = {
        (int(r["event_type"]), r["word_idx"]): r["word"]
        for r in df.groupBy(
            "event_type", F.expr("user_id div 62").alias("word_idx")
        )
        .agg(
            F.bit_or(F.expr("shiftleft(1L, cast(user_id % 62 as int))")).alias(
                "word"
            )
        )
        .collect()
    }
    assert got == merged
    # popcount == exact distinct per type
    exact = {}
    for t, u in rows:
        exact.setdefault(t, set()).add(u)
    for t, mem in exact.items():
        pop = sum(bin(v).count("1") for (tt, _), v in merged.items() if tt == t)
        assert pop == len(mem)


@settings(max_examples=8, deadline=None)
@given(
    feats=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),      # q
            st.integers(min_value=0, max_value=12),      # dc
            st.integers(min_value=0, max_value=12_000_000),  # pc
        ),
        min_size=1,
        max_size=12,
    )
)
def test_gbt_case_chain_equals_tree_walk(spark, feats):
    """The m19 CASE-chain compilation must score identically to a plain
    Python walk of the same GBT_TREES literal on arbitrary features."""
    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.plans import (
        registry as reg,
    )

    def walk(q, dc, pc):
        env = {"q": q, "dc": dc, "pc": pc}
        total = 0
        for rf, rt, l, r in reg.GBT_TREES:
            f, t, lo, hi = l if env[rf] <= rt else r
            total += lo if env[f] <= t else hi
        return total

    df = spark.createDataFrame(
        [Row(q=q, dc=dc, pc=pc) for q, dc, pc in feats],
        "q long, dc long, pc long",
    )
    cols = {"q": F.col("q"), "dc": F.col("dc"), "pc": F.col("pc")}
    got = [
        (r["q"], r["dc"], r["pc"], r["score"])
        for r in df.select(
            "q", "dc", "pc", reg._gbt_score_col(cols).alias("score")
        ).collect()
    ]
    for q, dc, pc, s in got:
        assert s == walk(q, dc, pc), (q, dc, pc)


@settings(max_examples=8, deadline=None)
@given(
    weights=st.lists(st.integers(min_value=1, max_value=25), min_size=1, max_size=30),
    n=st.integers(min_value=1, max_value=10),
)
def test_pps_crossing_rule_equals_naive_thresholds(spark, weights, n):
    """o5's integer crossing test must select exactly the items whose
    cumulative-weight span covers a threshold k*W/n (naive Fraction
    reference), and when every weight is below W/n it selects exactly
    n items."""
    from fractions import Fraction

    W = sum(weights)
    cum = 0
    naive = []
    for i, w in enumerate(weights):
        lo, hi = cum, cum + w
        crossed = [
            k
            for k in range(1, n + 1)
            if Fraction(lo) < Fraction(k * W, n) <= Fraction(hi)
        ]
        if crossed:
            naive.append((i, max(crossed)))
        cum = hi
    # the integer rule from the entry
    cum = 0
    got = []
    for i, w in enumerate(weights):
        cum += w
        if (cum * n) // W > ((cum - w) * n) // W:
            got.append((i, (cum * n) // W))
    assert got == naive
    if all(w * n < W for w in weights):
        assert len(got) == n
