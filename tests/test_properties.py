"""Property-based tests (hypothesis): operator laws that must hold for
ANY input, not just goldens — the generalization of the reference's
partition-invariant tests (tests/test_partition.py:12-41).

Strategy sizes are kept small (Spark job per example is expensive):
each property runs ~15 examples over one shared local session.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from yamr_spark.operators.keyvalue import sum_per_key
from yamr_spark.operators.skew import salted_sum
from yamr_spark.operators.temporal import asof_join

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_keys = st.sampled_from(["a", "b", "c", "hot"])
_kv_rows = st.lists(st.tuples(_keys, st.integers(-1000, 1000)), min_size=1, max_size=60)


@given(rows=_kv_rows)
@_SETTINGS
def test_salted_sum_equals_plain_sum(spark, rows):
    df = spark.createDataFrame(rows, "k string, v long").withColumn(
        "v", F.col("v").cast("double")
    )
    plain = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {
        r["k"]: r["value_sum"] for r in salted_sum(df, "k", "v", buckets=5).collect()
    }
    assert salted == plain  # integral doubles: exact under any order


@given(rows=_kv_rows)
@_SETTINGS
def test_sum_per_key_partition_invariance(spark, rows):
    """Same result at 1, 2, and 7 shuffle partitions — the reference's
    'every key lands in exactly one region' invariant, stated as
    result-equality across region counts."""
    df = spark.createDataFrame(rows, "key string, value long")
    results = []
    for n in (1, 2, 7):
        out = sum_per_key(df.repartition(n, "key"))
        results.append(sorted(map(tuple, out.collect())))
    assert results[0] == results[1] == results[2]


_ts_pool = [dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m) for m in range(0, 300, 7)]


@given(
    left=st.lists(
        st.tuples(st.integers(1, 3), st.sampled_from(_ts_pool)), min_size=1, max_size=15
    ),
    right=st.lists(
        st.tuples(st.integers(1, 3), st.sampled_from(_ts_pool), st.floats(0, 10)),
        max_size=15,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
@_SETTINGS
def test_asof_join_matches_naive(spark, left, right):
    """asof_join == the O(n·m) per-row definition: value of the latest
    right row with the same key and ts <= left ts."""
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, ts timestamp"
    )
    rdf = spark.createDataFrame(right, "k long, ts timestamp, v double")
    got = {
        r["lid"]: r["v_asof"]
        for r in asof_join(ldf, rdf, on=["k"], right_values=["v"]).collect()
    }
    for i, (k, t) in enumerate(left):
        matches = [(rt, v) for rk, rt, v in right if rk == k and rt <= t]
        want = max(matches)[1] if matches else None
        assert got[i] == want, (i, k, t, matches)


@given(
    left=st.lists(
        st.tuples(st.integers(1, 2), st.sampled_from(_ts_pool)), min_size=1, max_size=10
    ),
    right=st.lists(
        st.tuples(st.integers(1, 2), st.sampled_from(_ts_pool)), max_size=10
    ),
)
@_SETTINGS
def test_range_join_matches_naive(spark, left, right):
    """bucketed range join == the O(n·m) definition, for bucket widths
    that do and don't divide the window."""
    from yamr_spark.operators.temporal import range_join_bucketed

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, ts timestamp"
    )
    rdf = spark.createDataFrame(
        [(j, k, t) for j, (k, t) in enumerate(right)], "rid long, k long, ts timestamp"
    )
    for bucket_s in (600, 777):
        got = sorted(
            (r["lid"], r["rid"])
            for r in range_join_bucketed(
                ldf, rdf, on=["k"], lower_s=-1800, upper_s=0, bucket_s=bucket_s
            ).collect()
        )
        want = sorted(
            (i, j)
            for i, (lk, lt) in enumerate(left)
            for j, (rk, rt) in enumerate(right)
            if lk == rk and lt - dt.timedelta(seconds=1800) <= rt <= lt
        )
        assert got == want, (bucket_s, got, want)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c\nd!e."), min_size=0, max_size=40
        ),
        min_size=1,
        max_size=6,
    )
)
@_SETTINGS
def test_compat_shim_matches_native_wordcount(spark, texts):
    """The C7/C8 python shim and the native codegen'd word count agree on
    arbitrary text (same tokenization contract)."""
    from yamr_spark.compat import run_job
    from yamr_spark.compat.jobs import WordCountMapper, WordCountReducer
    from yamr_spark.operators.wordcount import word_count

    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    native = sorted(map(tuple, word_count(docs).collect()))
    shim = sorted(
        map(
            tuple,
            run_job(
                spark, docs, WordCountMapper(), WordCountReducer(),
                map_schema="key string, value long", text_col="text",
            ).collect(),
        )
    )
    assert shim == native


def test_hash60_cross_engine_parity(spark):
    """functions.hash60 is the shuffle-key primitive for the whole
    n-gram/minhash family — pin that Spark, DuckDB, and plain hashlib
    agree bit-for-bit, including non-ASCII (UTF-8 bytes hash)."""
    import hashlib

    import duckdb
    from pyspark.sql import functions as F

    from yamr_spark.functions import hash60

    samples = ["", "a", "hello world", "naïve café ünïcode", "a b c", "0"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r.s: r.h for r in df.select("s", hash60(F.col("s")).alias("h")).collect()}
    con = duckdb.connect()
    for s in samples:
        expect = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        assert got[s] == expect, s
        duck = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
        ).fetchone()[0]
        assert duck == expect, s


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c.d-e\n"), min_size=0, max_size=120
        ),
        min_size=1,
        max_size=8,
    ),
    width=st.integers(2, 10),
    stride=st.integers(1, 10),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunking_matches_naive(spark, texts, width, stride):
    """chunk_documents vs a 5-line pure-Python reference: window count
    is ceil(n_tokens/stride), every window is tokens[s:s+width], hashes
    agree — for arbitrary text, width, and stride."""
    import hashlib
    import re

    from yamr_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_hash)
        for r in chunk_documents(docs, width=width, stride=stride).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        toks = [x for x in re.split(r"\W+", t.lower()) if x]
        for idx, s in enumerate(range(0, len(toks), stride)):
            w = toks[s : s + width]
            h = int(hashlib.md5(" ".join(w).encode()).hexdigest()[:15], 16)
            want[(i, idx)] = (len(w), h)
    assert got == want


@given(ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=60, unique=True))
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_global_shuffle_is_permutation(spark, ids):
    """global_shuffle: bijective over ids, shard = key % shards, key
    matches the md5 reference implementation for arbitrary ids."""
    import hashlib

    from yamr_spark.operators.curation import global_shuffle

    docs = spark.createDataFrame([(i, "en") for i in ids], "doc_id long, lang string")
    rows = global_shuffle(docs, shards=8, salt="s1").collect()
    assert len(rows) == len(ids)
    for r in rows:
        expect = int(
            hashlib.md5(f"s1|{r.doc_id}".encode()).hexdigest()[:15], 16
        )
        assert r.shuffle_key == expect
        assert r.shard == expect % 8


_vec = st.lists(
    st.one_of(
        st.floats(-10, 10, allow_nan=False),
        st.just(0.0),
        st.just(float("nan")),
    ),
    min_size=3,
    max_size=3,
)
_emb_rows = st.lists(_vec, min_size=2, max_size=8)


@given(rows=_emb_rows)
@_SETTINGS
def test_cosine_contract_null_or_bounded(spark, rows):
    """The module-wide cosine contract under ANY input, including zero
    and NaN components: every emitted cosine is either NULL (excluded
    degenerate) or a real number in [-1, 1] (6dp rounding can push
    |cos| to at most 1.0000005; assert with that slack). No input may
    crash the scorer (ANSI divide) or emit NaN (rank inversion)."""
    import math

    from yamr_spark.operators.similarity import with_cosine

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "vec_id long, embedding array<double>",
    )
    a = df.selectExpr("vec_id as ia", "embedding as va")
    b = df.selectExpr("vec_id as ib", "embedding as vb")
    out = with_cosine(a.crossJoin(b)).select("cosine").collect()
    for r in out:
        if r.cosine is not None:
            assert not math.isnan(r.cosine)
            assert -1.0000005 <= r.cosine <= 1.0000005


_words = st.sampled_from([f"w{i}" for i in range(12)])
_docs_texts = st.lists(
    st.lists(_words, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


@given(texts=_docs_texts, span=st.data())
@_SETTINGS
def test_containment_stratified_full_span_recall(spark, texts, span):
    """The one-sided recall GUARANTEE (the reason the operator exists):
    for ANY corpus, a doc whose text is a contiguous ≥3-token span of
    another doc must be reported with containment 1.0 — its bottom-k
    probes all live in the container's shingle set and every tiny-
    corpus shingle is under the df cap. Also: every reported value is
    in (0, 1] and never self-referential."""
    from yamr_spark.operators.dedup import containment_pairs_stratified

    host = max(texts, key=lambda t: len(t.split()))
    toks = host.split()
    rows = [(i, t) for i, t in enumerate(texts)]
    has_span = len(toks) >= 3
    if has_span:
        start = span.draw(st.integers(0, len(toks) - 3))
        end = span.draw(st.integers(start + 3, len(toks)))
        rows.append((len(texts), " ".join(toks[start:end])))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.src, r.dst): r.containment
        for r in containment_pairs_stratified(docs).collect()
    }
    for (s, d), c in got.items():
        assert s != d and 0.0 < c <= 1.0
    if has_span:
        host_id = texts.index(host)
        if host_id != len(texts):
            assert got.get((len(texts), host_id)) == 1.0


def test_gemm_covariance_batch_boundary_invariance(spark, sf_dir):
    """The gemm covariance's exactness CONTRACT is batch-boundary
    independence (integer arithmetic, associative merge). Force
    radically different Arrow batch sizes and partitionings — results
    must be IDENTICAL bit-for-bit, not merely close."""
    from yamr_spark.operators.similarity import embedding_covariance_gemm
    from yamr_spark.registry import _ship_package
    from yamr_spark.tables import table

    _ship_package(spark)
    emb = table(spark, sf_dir, "embeddings")
    prior = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        tiny = {
            (r.i, r.j): r.cov
            for r in embedding_covariance_gemm(emb.repartition(13), max_dim=16).collect()
        }
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        big = {
            (r.i, r.j): r.cov
            for r in embedding_covariance_gemm(emb.coalesce(1), max_dim=16).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prior)
    assert tiny == big


def test_pca_and_sampling_partition_invariance(spark, sf_dir):
    """Decimal-disciplined iteration and hash-keyed sampling must not
    depend on physical layout: pca_top_component and weighted_sample
    return identical rows under different partitionings."""
    from yamr_spark.operators.curation import weighted_sample
    from yamr_spark.operators.similarity import pca_top_component
    from yamr_spark.registry import _ship_package
    from yamr_spark.tables import table

    _ship_package(spark)
    emb = table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, pca_top_component(emb.repartition(11), max_dim=8).collect()))
    b = sorted(map(tuple, pca_top_component(emb.coalesce(1), max_dim=8).collect()))
    assert a == b

    docs = table(spark, sf_dir, "documents")
    s1 = sorted(map(tuple, weighted_sample(docs.repartition(17), "doc_id", "n_chars").collect()))
    s2 = sorted(map(tuple, weighted_sample(docs.coalesce(1), "doc_id", "n_chars").collect()))
    assert s1 == s2


@given(
    vals=st.lists(st.integers(0, 30), min_size=1, max_size=80),
)
@_SETTINGS
def test_cms_never_underestimates_any_multiset(spark, vals):
    """CMS law for ANY integer multiset: every probe's estimate is
    >= its exact count (collisions only add), and with a collision-free
    width the estimate equals the exact count."""
    from yamr_spark.operators.text import cms_point_estimates

    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = cms_point_estimates(df, "x", n_probes=10, depth=2, width=16).collect()
    exact = {v: vals.count(v) for v in vals}
    assert got, vals
    for r in got:
        assert r.cms_est >= r.exact_cnt == exact[r.probe_val]
        assert r.never_underestimates
    wide = cms_point_estimates(df, "x", n_probes=10, depth=2, width=1 << 16).collect()
    assert all(r.cms_est == r.exact_cnt for r in wide)


@given(
    toks=st.lists(st.integers(0, 9), min_size=1, max_size=50),
    budget=st.integers(1, 120),
)
@_SETTINGS
def test_token_budget_pack_prefix_law(spark, toks, budget):
    """For ANY document-length multiset and ANY budget, the two-phase
    plan equals the flat hash-priority prefix rule (replayed in plain
    Python over the same md5 priorities), never exceeds the budget,
    and is monotone: a bigger budget never selects fewer tokens."""
    import hashlib

    from yamr_spark.operators.curation import token_budget_pack

    rows = [(i, " ".join(["w"] * t), "l") for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = token_budget_pack(df, budget, n_buckets=4).collect()[0]

    def pri(i: int) -> int:
        return int(hashlib.md5(f"tbp:{i}".encode()).hexdigest()[:15], 16)

    order = sorted((pri(i), i, max(t, 1)) for i, t in enumerate(toks))
    cum = sel_d = sel_t = 0
    for _, _, t in order:
        if cum + t > budget:
            break
        cum += t
        sel_d += 1
        sel_t += t
    assert (got.docs_selected, got.tokens_selected) == (sel_d, sel_t)
    assert got.tokens_selected <= budget
    bigger = token_budget_pack(df, budget + 40, n_buckets=4).collect()[0]
    assert bigger.tokens_selected >= got.tokens_selected


def test_lm_score_layout_invariance(spark, sf_dir):
    """The r07 driver flake was quality_stratified_sample's 6dp mean
    flipping with partition layout (float AVG summed in shuffle order).
    The decimal-disciplined means must return IDENTICAL rows under
    repartition(1) vs repartition(97) — for the upstream lm_score
    (which feeds quartile edges) and the stratified report itself."""
    from yamr_spark.operators.curation import quality_stratified_sample
    from yamr_spark.operators.text import unigram_lm_score
    from yamr_spark.registry import _ship_package
    from yamr_spark.tables import table

    _ship_package(spark)
    docs = table(spark, sf_dir, "documents")
    a = sorted(map(tuple, unigram_lm_score(docs.repartition(1)).collect()))
    b = sorted(map(tuple, unigram_lm_score(docs.repartition(97)).collect()))
    assert a == b

    qa = sorted(map(tuple, quality_stratified_sample(docs.repartition(1)).collect()))
    qb = sorted(map(tuple, quality_stratified_sample(docs.repartition(97)).collect()))
    assert qa == qb


# round 9: span-dedup merge law and heavy-hitter exactness over random
# corpora — the brute-force Python replays of the operators' contracts.

_words = st.sampled_from(list("abcdefgh"))
_doc_texts = st.lists(
    st.lists(_words, min_size=0, max_size=20).map(lambda ws: " ".join(ws)),
    min_size=2,
    max_size=8,
)


def _brute_span_stats(texts: list[str], width: int):
    toks = {i: t.split() for i, t in enumerate(texts)}
    wins: dict[int, list[tuple[int, str]]] = {}
    seen_docs: dict[str, set[int]] = {}
    for i, ts in toks.items():
        for s in range(len(ts) - width + 1):
            w = " ".join(ts[s : s + width])
            wins.setdefault(i, []).append((s + 1, w))
            seen_docs.setdefault(w, set()).add(i)
    out = {}
    for i, ws in wins.items():
        dup_pos = sorted(s for s, w in ws if len(seen_docs[w]) >= 2)
        if not dup_pos:
            continue
        spans = []
        for s in dup_pos:
            if spans and s <= spans[-1][1] + width:
                spans[-1][1] = s
            else:
                spans.append([s, s])
        dup_tokens = sum(e - b + width for b, e in spans)
        out[i] = (len(toks[i]), len(spans), dup_tokens)
    return out


@given(texts=_doc_texts)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_span_dup_stats_matches_brute_force(spark, texts):
    """For ANY corpus: cross-doc dup windows, island merge, and token
    accounting equal the quadratic Python replay (width=3 keeps random
    8-letter-vocab corpora actually producing collisions)."""
    from yamr_spark.operators.curation import span_dup_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_spans, r.dup_tokens)
        for r in span_dup_stats(df, width=3).collect()
    }
    assert got == _brute_span_stats(texts, 3)


@given(texts=_doc_texts, k=st.sampled_from([2, 3, 5]))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_heavy_hitters_exact_for_any_corpus_and_k(spark, texts, k):
    """Exactness law: for ANY corpus and threshold parameter k, the
    two-pass plan returns exactly the terms with cnt*k > N (brute
    Python counts), regardless of how Arrow batches slice the data."""
    from collections import Counter

    from yamr_spark.operators.text import heavy_hitters_exact

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(4)
    got = {r.term: r.cnt for r in heavy_hitters_exact(df, k=k).collect()}
    counts = Counter(w for t in texts for w in t.split())
    n = sum(counts.values())
    want = {t: c for t, c in counts.items() if c * k > n}
    assert got == want


@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=80),
    n_parts=st.sampled_from([1, 3, 13]),
)
@_SETTINGS
def test_exact_global_rank_is_sorted_position(spark, vals, n_parts):
    """Property (r10): exact_global_rank == the row's 1-based position
    in the Python-sorted list, for ANY multiset of values (tie runs,
    hot keys, single element) and ANY range-partition count — the
    brute-force replay of the distributed rank's contract."""
    from yamr_spark.operators.ranking import exact_global_rank

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: r.rnk
        for r in exact_global_rank(df, ["v", "id"], n_parts=n_parts).collect()
    }
    want = {
        id_: pos + 1
        for pos, (v, id_) in enumerate(sorted((v, i) for i, v in rows))
    }
    assert got == want


# --- exact substring dedup vs a brute-force python model -------------

_sd_tok = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_sd_doc = st.lists(_sd_tok, min_size=0, max_size=14)
_sd_corpus = st.lists(_sd_doc, min_size=2, max_size=5)


def _sd_model(docs_tokens, width):
    """Brute-force keep-lowest-doc substring dedup over token lists."""
    from collections import defaultdict

    occ = defaultdict(set)  # window text -> set of doc ids
    for d, toks in enumerate(docs_tokens):
        for s in range(len(toks) - width + 1):
            occ[tuple(toks[s : s + width])].add(d)
    dup_owner = {w: min(ds) for w, ds in occ.items() if len(ds) >= 2}
    out = {}
    for d, toks in enumerate(docs_tokens):
        dropped_pos = set()
        for s in range(len(toks) - width + 1):
            w = tuple(toks[s : s + width])
            if w in dup_owner and dup_owner[w] != d:
                dropped_pos.update(range(s, s + width))
        # maximal dropped spans == count of contiguous runs
        runs = 0
        prev = None
        for p in sorted(dropped_pos):
            if prev is None or p != prev + 1:
                runs += 1
            prev = p
        out[d] = (len(toks), runs, len(dropped_pos))
    return out


@given(corpus=_sd_corpus)
@_SETTINGS
def test_substring_dedup_matches_bruteforce(spark, corpus):
    from yamr_spark.operators.curation import substring_dedup_docs

    width = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        int(r["doc_id"]): (
            int(r["n_tokens"]),
            int(r["n_dropped_spans"]),
            int(r["dropped_tokens"]),
        )
        for r in substring_dedup_docs(df, width=width).collect()
    }
    assert got == _sd_model(corpus, width)


# --- minimizer-anchored substring dedup vs pure-python model -----------------

_min_texts = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=40), min_size=2, max_size=5
)


def _min_model(texts, k, w):
    """Pure-python replay of substring_dedup_minimized: md5-keyed
    rightmost-min winnowing selection, exact-text verify among
    selecting docs, keep-lowest-owner, gap-k span merge."""
    import hashlib

    PM = 999_999_999_999
    anchors = {}  # doc -> set of selected 1-based positions
    for d, text in enumerate(texts):
        anchors[d] = set()
        if len(text) < k:
            continue
        n = max(len(text) - k + 1, 1)
        keys = [
            (
                hashlib.md5(text[j - 1 : j - 1 + k].encode()).hexdigest(),
                PM - j,
                j,
            )
            for j in range(1, n + 1)
        ]
        for i in range(1, max(n - w + 1, 1) + 1):
            win = keys[i - 1 : min(i - 1 + w, n)]
            anchors[d].add(min(win)[2])
    # verify: anchor k-gram text selected in >= 2 docs; min doc owns
    from collections import defaultdict

    occ = defaultdict(set)
    for d, ss in anchors.items():
        for s in ss:
            occ[texts[d][s - 1 : s - 1 + k]].add(d)
    owner = {t: min(ds) for t, ds in occ.items() if len(ds) >= 2}
    out = {}
    for d, text in enumerate(texts):
        flags = sorted(
            s
            for s in anchors[d]
            if texts[d][s - 1 : s - 1 + k] in owner
            and owner[texts[d][s - 1 : s - 1 + k]] != d
        )
        spans, start, prev = [], None, None
        for s in flags:
            if prev is None or s > prev + k:
                if start is not None:
                    spans.append((start, prev))
                start = s
            prev = s
        if start is not None:
            spans.append((start, prev))
        flagged = sum(e - b + k for b, e in spans)
        out[d] = (len(text), len(spans), flagged)
    return out


@given(texts=_min_texts)
@_SETTINGS
def test_minimized_dedup_matches_model(spark, texts):
    """substring_dedup_minimized == the pure-python selection/verify/
    merge model on random small-alphabet corpora (dense collisions, so
    selection ties, sub-k docs, clipped windows, and multi-owner cases
    all get exercised)."""
    from yamr_spark.operators.curation import substring_dedup_minimized

    k, w = 4, 3
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        int(r["doc_id"]): (
            int(r["n_chars"]),
            int(r["n_flagged_spans"]),
            int(r["flagged_chars"]),
        )
        for r in substring_dedup_minimized(df, k=k, w=w).collect()
    }
    assert got == _min_model(texts, k, w)
