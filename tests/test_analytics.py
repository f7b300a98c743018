"""Analytics operators: approx-aggregate error bounds + pivot golden."""

from __future__ import annotations

from pyspark.sql import functions as F

from yamr_spark.registry import all_queries
from yamr_spark.tables import table


def test_approx_aggregates_error_bounds(spark, sf_dir):
    """The registered contract (VERDICT r05 #6): in-query error-band
    booleans — sketch within rtol of the exact twin — plus exact
    count columns. A sketch drifting out of band flips a boolean and
    fails both here and the driver hash."""
    rows = {
        r["event_type"]: r
        for r in all_queries()["approx_aggregates"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("users"),
        )
        .collect()
    }
    assert rows.keys() == exact.keys()
    for et, ex in exact.items():
        ap = rows[et]
        assert ap["n_events"] == ex["n"]
        assert ap["exact_users"] == ex["users"]
        assert ap["users_within_5pct"] is True
        assert ap["p50_within_5pct"] is True


def test_pivot_counts_sum_to_total(spark, sf_dir):
    piv = all_queries()["pivot_user_event_counts"](spark, sf_dir)
    total = (
        piv.select(
            sum(F.col(c) for c in piv.columns if c != "user_id").alias("t")
        )
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    assert total == table(spark, sf_dir, "events").count()


def test_scd2_invariants(spark, sf_dir):
    """SCD2 output invariants: every key has exactly one current row;
    changed keys carry exactly one closed version whose valid_to equals
    the new version's valid_from; unchanged keys keep one row; NEW keys
    (absent from base) appear as exactly one current insert opened at
    the update timestamp."""
    from yamr_spark.registry import all_queries
    from yamr_spark.tables import table

    rows = all_queries()["scd2_customer_history"](spark, sf_dir).collect()
    base_keys = {
        r.c_custkey for r in table(spark, sf_dir, "customer").select("c_custkey").collect()
    }
    by_key = {}
    for r in rows:
        by_key.setdefault(r.c_custkey, []).append(r)
    n_changed = n_inserted = 0
    for key, versions in by_key.items():
        current = [v for v in versions if v.is_current]
        assert len(current) == 1, key
        if key not in base_keys:
            n_inserted += 1
            assert len(versions) == 1
            assert versions[0].valid_from == "1998-08-01"
            assert versions[0].c_mktsegment == "SEGNEW"
        elif len(versions) == 2:
            n_changed += 1
            closed = next(v for v in versions if not v.is_current)
            assert closed.valid_to == current[0].valid_from
        else:
            assert len(versions) == 1
    assert n_changed > 0  # the update batch really changed keys
    assert n_inserted > 0  # …and really inserted new keys


def test_scd2_insert_change_unchanged_one_batch(spark):
    """scd2_history unit: one batch containing an insert (new key), a
    change, a no-op update, and an untouched key — each lands in its
    branch; NULL attribute values do not masquerade as 'row absent'
    (presence is tracked by marker columns, not attr null-ness)."""
    from yamr_spark.operators.relational import scd2_history

    base = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C"), (4, None)],
        "k int, attr string",
    )
    updates = spark.createDataFrame(
        [(2, "B2"), (3, "C"), (5, "NEW"), (4, None)],
        "k int, attr string",
    )
    out = scd2_history(base, updates, key="k", attrs=["attr"],
                       base_ts="t0", update_ts="t1")
    rows = {(r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
            for r in out.collect()}
    assert rows == {
        (1, "A", "t0", None, True),          # untouched
        (2, "B", "t0", "t1", False),         # changed: closed old
        (2, "B2", "t1", None, True),         # changed: opened new
        (3, "C", "t0", None, True),          # no-op update
        (4, None, "t0", None, True),         # NULL attr no-op (eqNullSafe)
        (5, "NEW", "t1", None, True),        # insert
    }


def test_export_manifest_covers_corpus_exactly(spark, sf_dir):
    """Shards partition the corpus: doc counts sum to the corpus size
    and a single doc's relocation/corruption would change its shard's
    checksum (checksums are exact integer sums)."""
    from yamr_spark.registry import all_queries
    from yamr_spark.tables import table

    out = all_queries()["export_manifest"](spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in out) == n_docs
    assert len({r.shard for r in out}) == len(out)
    assert all(int(r.checksum) > 0 for r in out)


def test_skyline_2d_golden(spark):
    """Skyline dominance rules on a crafted set: equal pairs both
    survive; equal-price-bigger kills; cheaper-same-size kills;
    cross-band and in-band domination both apply."""
    from yamr_spark.operators.relational import skyline_2d

    rows = [
        # (key, price, size)
        (1, 10.0, 5),    # frontier
        (2, 10.0, 5),    # duplicate pair — both survive (no strict)
        (3, 10.0, 4),    # equal price, smaller → dominated by 1
        (4, 20.0, 5),    # pricier, same size → dominated by 1
        (5, 20.0, 8),    # frontier
        (6, 250.0, 9),   # frontier (different band)
        (7, 260.0, 8),   # dominated cross-band by 5 (cheaper, same size)
        (8, 5.0, 1),     # frontier (cheapest)
    ]
    df = spark.createDataFrame(rows, "k long, price double, size int")
    got = {r.k for r in skyline_2d(df, "price", "size", keys=["k"]).collect()}
    assert got == {1, 2, 5, 6, 8}


def test_skyline_2d_quantization_contract(spark):
    """ADVICE r06 + review r07: the operator computes the EXACT skyline
    of the quantize_dp-rounded minimize column. Sub-quantum float
    spreads therefore shift results in BOTH directions — a dominated
    row can survive (false keep) and a truly-undominated cheaper row
    can lose the quantized equal-price tiebreak (false drop); raising
    quantize_dp to the data's precision restores the true skyline. A
    decimal column finer than the quantum is rejected loudly."""
    import pytest

    from yamr_spark.operators.relational import skyline_2d

    rows = [(1, 10.001, 5), (2, 10.004, 5)]  # 2 strictly dominated by 1
    df = spark.createDataFrame(rows, "k long, price double, size int")
    # default 2dp quantum merges 10.001 and 10.004 → both survive (the
    # false-KEEP direction: quantized-equal price, equal size)
    got2 = {r.k for r in skyline_2d(df, "price", "size", keys=["k"]).collect()}
    assert got2 == {1, 2}
    # 3dp quantum resolves them → the dominated row dies
    got3 = {
        r.k
        for r in skyline_2d(df, "price", "size", keys=["k"], quantize_dp=3).collect()
    }
    assert got3 == {1}

    # false-DROP direction: (10.001, 5) vs (10.004, 9) — mutually
    # undominated in the reals, but at the 2dp quantum they are
    # equal-priced and the smaller size loses; 3dp restores both
    rows2 = [(1, 10.001, 5), (2, 10.004, 9)]
    df2 = spark.createDataFrame(rows2, "k long, price double, size int")
    assert {r.k for r in skyline_2d(df2, "price", "size", keys=["k"]).collect()} == {2}
    assert {
        r.k
        for r in skyline_2d(df2, "price", "size", keys=["k"], quantize_dp=3).collect()
    } == {1, 2}

    # band-boundary cases (review r07, repro'd live pre-fix): pairs that
    # quantize to the SAME price but straddle a raw-value band edge must
    # follow the quantized equal-price rule, not band pruning — bands
    # now derive from the quantized key
    strad = spark.createDataFrame(
        [(1, 99.999, 5), (2, 100.001, 9)], "k long, price double, size int"
    )
    assert {r.k for r in skyline_2d(strad, "price", "size", keys=["k"]).collect()} == {2}
    strad_eq = spark.createDataFrame(
        [(1, 99.999, 5), (2, 100.001, 5)], "k long, price double, size int"
    )
    assert {
        r.k for r in skyline_2d(strad_eq, "price", "size", keys=["k"]).collect()
    } == {1, 2}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="whole multiple"):
        skyline_2d(df2, "price", "size", keys=["k"], band_width=0.005)

    dec = df.select("k", F.col("price").cast("decimal(10,3)").alias("price"), "size")
    with pytest.raises(ValueError, match="scale 3 > quantize_dp=2"):
        skyline_2d(dec, "price", "size", keys=["k"])
    assert {
        r.k
        for r in skyline_2d(dec, "price", "size", keys=["k"], quantize_dp=3).collect()
    } == {1}


def test_kmv_set_ops_empty_inputs_defined(spark):
    """ADVICE r06: Jaccard of two EMPTY inputs is a defined 0.0, not
    NULL/NaN from 0/0 inclusion-exclusion."""
    from yamr_spark.operators.text import kmv_set_ops

    empty = spark.createDataFrame([], "v string")
    row = kmv_set_ops(empty, empty, "v").collect()[0]
    assert row.est_union == 0.0
    assert row.jaccard_est == 0.0


def test_kmv_distinct_per_group_accuracy(spark, sf_dir):
    """Per-group KMV: groups below k report the EXACT distinct count;
    filled sketches estimate within the ~1/sqrt(k) error band."""
    from yamr_spark.operators.text import kmv_distinct_per_group
    from yamr_spark.tables import table

    ev = table(spark, sf_dir, "events")
    got = {r.event_type: r for r in kmv_distinct_per_group(ev, "event_type", "user_id", k=64).collect()}
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for t, r in got.items():
        if r.n_hashes < 64:
            assert r.estimate == exact[t]
        else:
            assert abs(r.estimate - exact[t]) / exact[t] < 0.5, (t, r.estimate, exact[t])
