"""Hypothesis property tests (SURVEY.md §5.3.3): the as-of join
pattern vs a per-row Python reference on generated inputs — the
operator whose tie/boundary semantics SURVEY §7 ranks hardest (#3).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F


def spark_asof(spark, events: list[tuple], orders: list[tuple]):
    """The q_join_asof formulation on arbitrary (id, key, t) inputs."""
    e = spark.createDataFrame(
        pd.DataFrame(events, columns=["event_id", "user_id", "t"]),
        schema="event_id long, user_id long, t long",
    )
    o = spark.createDataFrame(
        pd.DataFrame(orders, columns=["order_id", "custkey", "ot"]),
        schema="order_id long, custkey long, ot long",
    )
    cand = e.join(o, (o.custkey == e.user_id) & (o.ot <= e.t), "left")
    w = Window.partitionBy("event_id").orderBy(
        F.col("ot").desc_nulls_last(), F.col("order_id").desc_nulls_last()
    )
    return {
        (r["event_id"], r["order_id"])
        for r in cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "order_id")
        .collect()
    }


def python_asof(events: list[tuple], orders: list[tuple]):
    """Oracle: per-event linear scan with the documented tiebreak
    (latest ot ≤ t; ties → max order_id; no match → None)."""
    out = set()
    for event_id, user_id, t in events:
        best = None
        for order_id, custkey, ot in orders:
            if custkey == user_id and ot <= t:
                if best is None or (ot, order_id) > (best[1], best[0]):
                    best = (order_id, ot)
        out.add((event_id, best[0] if best else None))
    return out


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 10**6),  # event_id (uniquified below)
            st.integers(0, 3),  # user_id: few keys → dense matches
            st.integers(0, 50),  # event time
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda r: r[0],
    ),
    orders=st.lists(
        st.tuples(
            st.integers(0, 10**6),  # order_id (uniquified below)
            st.integers(0, 3),  # custkey
            st.integers(0, 50),  # order time — duplicates LIKELY → tie paths
        ),
        min_size=0,
        max_size=12,
        unique_by=lambda r: r[0],
    ),
)
def test_asof_join_matches_python_reference(spark, events, orders):
    assert spark_asof(spark, events, orders) == python_asof(events, orders)


def python_cc(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Oracle: union-find connected components, min node id as label."""
    parent = {i: i for i in range(1, n_nodes + 1)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in parent}


@pytest.mark.slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_nodes=st.integers(8, 14),
    edges=st.lists(
        st.tuples(st.integers(1, 14), st.integers(1, 14)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=0,
        max_size=10,
    ),
)
def test_connected_components_matches_union_find(spark, n_nodes, edges):
    """Random graphs (arbitrary diameter) agree with union-find —
    the convergence contract ADVICE r2 asked for (a fixed-round
    horizon would split long chains)."""
    from frafka_spark.llm.dedup import connected_components

    edges = [(a, b) for a, b in edges if a <= n_nodes and b <= n_nodes]
    nodes = spark.createDataFrame(
        [(i,) for i in range(1, n_nodes + 1)], "doc_id long"
    )
    sym = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    edf = spark.createDataFrame(sym or [(0, 0)], "src long, dst long")
    if not sym:
        edf = edf.filter("src <> 0")  # typed empty edge list
    got = {
        r["doc_id"]: r["lbl"] for r in connected_components(nodes, edf).collect()
    }
    assert got == python_cc(n_nodes, edges)


def test_connected_components_diameter5_chain(spark):
    """A planted diameter-5 chain resolves to ONE component — the
    exact case a 3-round fixed horizon (round 2's formulation) split
    into several clusters."""
    from frafka_spark.llm.dedup import connected_components

    chain = [(i, i + 1) for i in range(1, 6)]
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "src long, dst long"
    )
    got = {r["doc_id"]: r["lbl"] for r in connected_components(nodes, edges).collect()}
    assert got == {i: 1 for i in range(1, 7)}


def test_connected_components_cap_raises(spark):
    """Exceeding max_rounds fails LOUDLY instead of mislabeling."""
    from frafka_spark.llm.dedup import connected_components

    chain = [(i, i + 1) for i in range(1, 6)]
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_rounds=2)


# ---- chunking: coverage + reconstruction properties ----------------


@given(n_words=st.integers(min_value=1, max_value=130))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_chunking_covers_and_reconstructs(spark, n_words):
    """Every chunk set (a) covers all word positions, (b) reconstructs
    the document from stride-aligned prefixes, (c) has the closed-form
    chunk count — for any doc length including the sub-window edge."""
    from frafka_spark.llm.text import CHUNK_STRIDE, CHUNK_WORDS

    words = [f"w{i}" for i in range(n_words)]
    import math

    expected_chunks = max(
        math.ceil((n_words - CHUNK_WORDS) / CHUNK_STRIDE) + 1, 1
    )
    # replicate the declared query's expression tree on a local frame
    d = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    w = d.select("doc_id", F.split("text", " ").alias("w"))
    n_chunks = F.greatest(
        F.ceil((F.size("w") - CHUNK_WORDS) / float(CHUNK_STRIDE)).cast("int") + F.lit(1),
        F.lit(1),
    )
    chunk = F.slice("w", (F.col("chunk_id") - 1) * CHUNK_STRIDE + 1, CHUNK_WORDS)
    rows = (
        w.select("doc_id", "w", F.explode(F.sequence(F.lit(1), n_chunks)).alias("chunk_id"))
        .select("chunk_id", F.concat_ws(" ", chunk).alias("chunk_text"))
        .orderBy("chunk_id")
        .collect()
    )
    assert len(rows) == expected_chunks
    seen: set[str] = set()
    rebuilt: list[str] = []
    for r in rows:
        toks = r.chunk_text.split(" ") if r.chunk_text else []
        seen.update(toks)
        take = toks if r.chunk_id == len(rows) else toks[:CHUNK_STRIDE]
        rebuilt.extend(take)
    assert seen == set(words)
    assert rebuilt == words


def test_funnel_stages_monotonically_shrink(spark):
    """Each funnel stage is a subset of the previous (ordered
    semantics): counts never grow, and a purchase BEFORE the first
    view never converts."""
    import __spark_entry__ as entry

    from tests.conftest import SF_DIR

    rows = {
        r.stage: r.n_users
        for r in entry.queries()["q_events_funnel"](spark, SF_DIR).collect()
    }
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"]

    # constructed: user 1 purchases before viewing -> reaches stage 1 only
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    e = spark.createDataFrame(
        [
            (1, t(10), "purchase"),
            (1, t(20), "view"),
            (2, t(1), "view"),
            (2, t(2), "click"),
            (2, t(3), "purchase"),
        ],
        "user_id long, ts timestamp, event_type string",
    )

    from frafka_spark.operators.analytics import funnel_stages

    v, c, p = funnel_stages(e)
    assert v.count() == 2 and c.count() == 1 and p.count() == 1
    assert p.collect()[0].user_id == 2


def test_funnel_user_stages_equals_chain(spark):
    """The single-pass windowed per-user funnel relation is row-for-row
    the chained-join formulation: outer-joining the three
    ``funnel_stages`` frames yields exactly ``funnel_user_stages``
    (users with no stage-0 event never appear in the chain and carry
    all-NULL stage columns in the windowed form)."""
    from pyspark.sql import functions as F

    from frafka_spark.io import table
    from frafka_spark.operators.analytics import (
        funnel_stages,
        funnel_user_stages,
    )
    from tests.conftest import SF_DIR

    e = table(spark, SF_DIR, "events").select("user_id", "event_type", "ts")
    v, c, p = funnel_stages(e)
    chained = v.join(c, "user_id", "left").join(p, "user_id", "left")
    single = funnel_user_stages(e).filter(F.col("_t0").isNotNull())
    assert single.exceptAll(chained).count() == 0
    assert chained.exceptAll(single).count() == 0
    # the windowed form adds ONLY all-NULL rows beyond the chain
    extras = funnel_user_stages(e).filter(F.col("_t0").isNull())
    assert extras.filter(
        F.col("_t1").isNotNull() | F.col("_t2").isNotNull()
    ).count() == 0


# ---- dec_sum: scaled-long exact-sum contract -----------------------


@given(
    vals=st.lists(
        st.decimals(
            min_value=-999_999, max_value=999_999, places=2, allow_nan=False
        ),
        min_size=0,
        max_size=60,
    ),
    with_null=st.booleans(),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_dec_sum_exact_vs_python_decimal(spark, vals, with_null):
    """dec_sum's hi/lo scaled-long formulation equals the exact
    Decimal sum for arbitrary signed 2-decimal inputs (the fixture
    money/quantity domain), including empty input and NULLs —
    bit-for-bit, since the exact value is representable."""
    from decimal import Decimal

    from frafka_spark.functions.determinism import dec_sum

    rows = [(float(v),) for v in vals] + ([(None,)] if with_null else [])
    df = spark.createDataFrame(rows or [(None,)], "x double")
    got = df.agg(dec_sum("x", "s")).first().s
    want = sum((Decimal(v).quantize(Decimal("0.01")) for v in vals), Decimal(0))
    if not vals:
        assert got is None
    else:
        assert got == float(want), (got, want)


def test_connected_components_log_round_convergence(spark):
    """VERDICT r4 item 7, superseded by the r5 pointer-jump rewrite:
    supersteps take min(lbl, neighbor min, lbl(lbl)) so rounds scale
    ~log(diameter). A planted 200-node chain (diameter 199) must
    resolve INSIDE the default 16-round cap — impossible for plain
    neighbor propagation, which needs 199 rounds — and resolve to the
    single true component min."""
    from frafka_spark.llm.dedup import CC_MAX_ROUNDS, connected_components

    n = 200
    chain = [(i, i + 1) for i in range(1, n)]
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id long")
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "src long, dst long"
    )
    assert n - 1 > CC_MAX_ROUNDS  # linear propagation could not finish
    got = {
        r["doc_id"]: r["lbl"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {i: 1 for i in range(1, n + 1)}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["append", "overwrite", "merge", "compact"]),
            st.integers(0, 30),  # key range start
            st.integers(1, 8),  # row count
        ),
        min_size=1,
        max_size=5,
    )
)
def test_manifest_table_matches_multiset_model(spark, tmp_path_factory, ops):
    """Model-based check of the manifest table format: a random
    sequence of append / overwrite / merge / compact commits must
    leave every committed version readable and equal to a plain
    Python multiset replaying the same sequence — time travel is
    total and exact — and ``read_changes`` across every adjacent
    version pair must equal the model's multiset diff (compaction:
    empty; appends additionally tag the committing version).

    Merge follows ``operators/merge.py`` semantics: every matched
    target row (including duplicates a prior append created) takes
    the change row's values; unmatched change keys insert once.
    """
    from pyspark.sql import functions as F  # noqa: F401

    from frafka_spark.sources import manifest_table as mt

    path = str(tmp_path_factory.mktemp("mtbl") / "tbl")
    model: list[tuple[int, int]] = []
    snapshots: list[list[tuple[int, int]]] = []
    for i, (kind, lo, n) in enumerate(ops):
        rows = {k: k * 1000 + i for k in range(lo, lo + n)}
        df = spark.createDataFrame(sorted(rows.items()), ["k", "v"])
        if kind == "compact" and mt.current_version(path) is not None and model:
            mt.compact(spark, path)
            # logical no-op: model unchanged
        elif kind == "append":
            mt.write_table(df, path, mode="append")
            model = model + sorted(rows.items())
        elif kind == "overwrite" or mt.current_version(path) is None:
            mt.write_table(df, path, mode="overwrite")
            model = sorted(rows.items())
        else:
            mt.merge_table(spark, path, df, key="k")
            updated = [(k, rows.get(k, v)) for k, v in model]
            inserts = [
                (k, v) for k, v in sorted(rows.items())
                if k not in {mk for mk, _ in model}
            ]
            model = updated + inserts
        snapshots.append(sorted(model))
    for version, expect in enumerate(snapshots):
        got = sorted(
            (r.k, r.v)
            for r in mt.read_table(spark, path, version=version).collect()
        )
        assert got == expect, (version, ops)
    # CDF model check: changes between adjacent versions == multiset diff
    from collections import Counter

    for version in range(1, len(snapshots)):
        prev_c = Counter(snapshots[version - 1])
        cur_c = Counter(snapshots[version])
        expect_changes = Counter()
        for kv in (cur_c - prev_c).elements():
            expect_changes[(*kv, "insert")] += 1
        for kv in (prev_c - cur_c).elements():
            expect_changes[(*kv, "delete")] += 1
        got_changes = Counter(
            (r.k, r.v, r._change_type)
            for r in mt.read_changes(spark, path, version - 1, version).collect()
        )
        assert got_changes == expect_changes, (version, ops)


def test_ohlc_invariants(spark):
    """q_events_ohlc: every bar satisfies low ≤ open ≤ high and
    low ≤ close ≤ high, and bar counts sum to the event count."""
    from frafka_spark.registry import QUERIES

    import frafka_spark

    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    bars = QUERIES["q_events_ohlc"].fn(spark, SF_DIR).toPandas()
    assert len(bars) > 0
    assert (bars["low"] <= bars["high"]).all()
    assert ((bars["open"] >= bars["low"]) & (bars["open"] <= bars["high"])).all()
    assert ((bars["close"] >= bars["low"]) & (bars["close"] <= bars["high"])).all()
    from frafka_spark.io import table

    assert bars["n_events"].sum() == table(spark, SF_DIR, "events").count()


def test_length_deciles_partition_the_corpus(spark):
    """q_llm_length_deciles: ten buckets, counts sum to the corpus,
    bucket sizes equal within 1, and char ranges are non-overlapping
    in decile order."""
    from frafka_spark.registry import QUERIES

    import frafka_spark

    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    d = (
        QUERIES["q_llm_length_deciles"]
        .fn(spark, SF_DIR)
        .toPandas()
        .sort_values("decile")
        .reset_index(drop=True)
    )
    assert list(d["decile"]) == list(range(1, 11))
    from frafka_spark.io import table

    n = table(spark, SF_DIR, "documents").count()
    assert d["n_docs"].sum() == n
    assert d["n_docs"].max() - d["n_docs"].min() <= 1
    # equi-depth: a later decile's min never undercuts an earlier max
    assert (d["min_chars"][1:].values >= d["max_chars"][:-1].values).all()


def test_transition_probabilities_normalize(spark):
    """q_events_transitions: outgoing probabilities per prev_type sum
    to ~1 (rounding slack), counts are positive."""
    from frafka_spark.registry import QUERIES

    import frafka_spark

    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    t = QUERIES["q_events_transitions"].fn(spark, SF_DIR).toPandas()
    assert (t["n"] > 0).all()
    sums = t.groupby("prev_type")["p"].sum()
    assert ((sums - 1.0).abs() < 1e-2).all(), sums
    # every observed event type appears as a source (all users have
    # long streams at this sf, so no type is terminal-only)
    assert set(t["prev_type"]) == set(t["event_type"])


def test_minhash_estimate_bounded_error(spark):
    """q_llm_dedup_est_audit: the 8-lane estimate is a multiple of
    1/8 in [0,1] and the audit covers exactly the declared near-dup
    pairs."""
    from frafka_spark.registry import QUERIES

    import frafka_spark

    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    a = QUERIES["q_llm_dedup_est_audit"].fn(spark, SF_DIR).toPandas()
    near = QUERIES["q_llm_dedup_near"].fn(spark, SF_DIR).toPandas()
    assert len(a) == len(near) > 0
    est8 = a["est_jaccard"] * 8
    assert ((est8 - est8.round()).abs() < 1e-9).all()
    assert ((a["est_jaccard"] >= 0) & (a["est_jaccard"] <= 1)).all()
    # detected pairs passed the >=0.5 exact threshold; an 8-lane
    # estimate of a >=0.5 pair can never read 0 agreements
    assert (est8.round() >= 1).all()


def test_shard_assignment_is_total_and_stable(spark):
    """q_llm_shard: 16 shards cover the corpus exactly once; the
    assignment of a given doc is reproducible (pure hash)."""
    from frafka_spark.registry import QUERIES

    import frafka_spark

    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    s = QUERIES["q_llm_shard"].fn(spark, SF_DIR).toPandas()
    assert len(s) == 16
    from frafka_spark.io import table

    docs = table(spark, SF_DIR, "documents")
    assert s["n_docs"].sum() == docs.count()
    assert s["total_chars"].sum() == docs.agg(F.sum("n_chars")).collect()[0][0]


def test_compression_ratio_semantics(spark):
    """q_llm_compression: ratios live in (0, ~1.2], a highly
    repetitive text compresses below a high-entropy one, and the
    operator is deterministic across invocations."""
    from frafka_spark.registry import QUERIES

    import frafka_spark

    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    r1 = (
        QUERIES["q_llm_compression"].fn(spark, SF_DIR)
        .toPandas().sort_values("source").reset_index(drop=True)
    )
    assert len(r1) > 0
    assert (r1["min_ratio"] > 0).all()
    assert (r1["max_ratio"] <= 1.2).all()
    r2 = (
        QUERIES["q_llm_compression"].fn(spark, SF_DIR)
        .toPandas().sort_values("source").reset_index(drop=True)
    )
    assert r1.equals(r2)  # bit-stable replay
    # direct semantic check on constructed docs
    import zlib

    rep = "spam " * 200
    import random

    rng = random.Random(7)
    noise = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(6))
        for _ in range(200)
    )
    ratio = lambda t: len(zlib.compress(t.encode(), 6)) / len(t)  # noqa: E731
    assert ratio(rep) < 0.05 < ratio(noise)


def test_rfm_quintiles_balance_and_segment_rule(spark):
    """q_events_rfm: each score column is a valid ntile(5) — buckets
    1..5 with sizes differing by ≤1 — and the segment label obeys the
    declared CASE rule row-by-row."""
    from frafka_spark.registry import QUERIES

    import frafka_spark

    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    rfm = QUERIES["q_events_rfm"].fn(spark, SF_DIR).toPandas()
    n = len(rfm)
    assert n >= 5
    for col in ("r_score", "f_score", "m_score"):
        counts = rfm[col].value_counts()
        assert sorted(counts.index) == [1, 2, 3, 4, 5], (col, counts)
        assert counts.max() - counts.min() <= 1, (col, counts)

    def seg(row):
        r, f, m = row.r_score, row.f_score, row.m_score
        if r == 1 and f <= 2:
            return "champion"
        if r <= 2 and m <= 2:
            return "loyal_high_value"
        if r >= 4 and f <= 2:
            return "at_risk"
        if r >= 4 and f >= 4:
            return "hibernating"
        return "regular"

    for row in rfm.itertuples():
        assert row.segment == seg(row), row


def test_segment_dedup_exact_dups_fully_flagged(spark):
    """q_llm_dedup_segment cross-law with q_llm_dedup_exact: a doc
    whose full text has ≥2 exact copies shares EVERY segment, so its
    duplicated-segment fraction must be exactly 1.0; and per-doc
    segment counts must equal ceil(n_words/10)."""
    import math

    from frafka_spark.io import table
    from frafka_spark.registry import QUERIES

    import frafka_spark

    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    seg = QUERIES["q_llm_dedup_segment"].fn(spark, SF_DIR).toPandas()
    assert (seg["n_dup_segments"] <= seg["n_segments"]).all()
    assert ((seg["dup_seg_frac"] >= 0) & (seg["dup_seg_frac"] <= 1)).all()

    docs = table(spark, SF_DIR, "documents").toPandas()
    n_words = docs.set_index("doc_id")["text"].str.split(" ").str.len()
    counts = seg.set_index("doc_id")["n_segments"]
    for doc_id, nw in n_words.items():
        assert counts[doc_id] == max(math.ceil(nw / 10), 1), doc_id

    exact = QUERIES["q_llm_dedup_exact"].fn(spark, SF_DIR).toPandas()
    dup_hashes = exact[exact["n_copies"] > 1]
    if len(dup_hashes):
        import hashlib

        texts = docs.assign(
            h=docs["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
        )
        dup_doc_ids = texts[texts["h"].isin(dup_hashes["content_hash"])]["doc_id"]
        flagged = seg.set_index("doc_id").loc[dup_doc_ids, "dup_seg_frac"]
        assert (flagged == 1.0).all(), flagged[flagged < 1.0]


def test_priority_dedup_partitions_and_precedence(spark):
    """q_llm_dedup_priority: copies sum to the corpus, one keeper per
    digest, keeper source is the group minimum, and group sizes match
    q_llm_dedup_exact's policy-free groups."""
    from frafka_spark.io import table
    from frafka_spark.registry import QUERIES

    import frafka_spark

    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    pri = QUERIES["q_llm_dedup_priority"].fn(spark, SF_DIR).toPandas()
    n_docs = table(spark, SF_DIR, "documents").count()
    assert pri["n_copies"].sum() == n_docs
    assert pri["content_hash"].is_unique
    exact = QUERIES["q_llm_dedup_exact"].fn(spark, SF_DIR).toPandas()
    merged = pri.merge(exact, on="content_hash", suffixes=("", "_exact"))
    assert len(merged) == len(pri)
    assert (merged["n_copies"] == merged["n_copies_exact"]).all()
    # keeper precedence: the keeper's source is the minimum source of
    # its group (recomputed from the raw corpus)
    import hashlib

    docs = table(spark, SF_DIR, "documents").toPandas()
    docs["h"] = docs["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    min_src = docs.groupby("h")["source"].min()
    keep_src = pri.set_index("content_hash")["keep_source"]
    assert (keep_src == min_src.loc[keep_src.index]).all()


def test_stickiness_bounds_and_day_cover(spark):
    """q_events_stickiness: dau ≤ mau30, ratio in (0, 1], and exactly
    the corpus's distinct active days are reported."""
    from frafka_spark.io import table
    from frafka_spark.registry import QUERIES

    import frafka_spark

    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    st_ = QUERIES["q_events_stickiness"].fn(spark, SF_DIR).toPandas()
    assert (st_["dau"] <= st_["mau30"]).all()
    assert ((st_["stickiness"] > 0) & (st_["stickiness"] <= 1)).all()
    days = (
        table(spark, SF_DIR, "events")
        .select(F.to_date("ts").cast("string").alias("d"))
        .distinct()
        .count()
    )
    assert len(st_) == days


def test_pii_corpus_clean_and_redaction_total(spark):
    """q_llm_pii laws: (1) the raw corpus really is PII-free (the
    synthesis precondition — no digits, '@', or parens in text), (2)
    counts follow the planting rule exactly, (3) redaction is total
    (pii_clean everywhere), and (4) a planted row's redacted hash
    differs from the md5 of its raw text while an unplanted row's
    equals it."""
    import hashlib

    from frafka_spark.io import table
    from frafka_spark.registry import QUERIES

    import frafka_spark

    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    docs = table(spark, SF_DIR, "documents").toPandas()
    assert not docs["text"].str.contains(r"[0-9@()]", regex=True).any()

    pii = QUERIES["q_llm_pii"].fn(spark, SF_DIR).toPandas().set_index("doc_id")
    ids = pii.index.to_series()
    assert (pii["n_emails"] == (ids % 2 == 0).astype(int)).all()
    assert (pii["n_phones"] == (ids % 3 == 0).astype(int)).all()
    assert (pii["n_ips"] == (ids % 5 == 0).astype(int)).all()
    assert (pii["n_pii"] == pii[["n_emails", "n_phones", "n_ips"]].sum(axis=1)).all()
    assert pii["pii_clean"].all()

    raw_md5 = docs.set_index("doc_id")["text"].map(
        lambda t: hashlib.md5(t.encode()).hexdigest()
    )
    planted = pii["n_pii"] > 0
    assert (pii.loc[planted, "redacted_md5"] != raw_md5[planted]).all()
    assert (pii.loc[~planted, "redacted_md5"] == raw_md5[~planted]).all()


def test_scd2_interval_chain_laws(spark):
    """q_merge_scd2 laws per dimension key: versions are contiguous
    1..k, exactly one open (is_current) row, each closed row's
    valid_to equals the next version's valid_from (no gaps, no
    overlaps), and consecutive versions always differ in the tracked
    attribute (the run-length collapse law)."""
    from frafka_spark.registry import QUERIES

    import frafka_spark

    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    scd = QUERIES["q_merge_scd2"].fn(spark, SF_DIR).toPandas()
    assert (scd.groupby("custkey")["is_current"].sum() == 1).all()
    for _, g in scd.groupby("custkey"):
        g = g.sort_values("version")
        assert list(g["version"]) == list(range(1, len(g) + 1))
        assert bool(g.iloc[-1]["is_current"])
        assert (g["valid_to"].iloc[:-1].values == g["valid_from"].iloc[1:].values).all()
        assert g["valid_to"].iloc[-1] == "9999-12-31"
        attrs = g["attr"].tolist()
        assert all(a != b for a, b in zip(attrs, attrs[1:]))


def test_growth_accounting_identity(spark):
    """q_events_growth_accounting laws: active = new + retained +
    resurrected on every day; churned(d) = active(d-1) - retained(d)
    for consecutive days; day-1 churn is 0; totals of n_new equal the
    distinct user count (every user is new exactly once)."""
    from frafka_spark.io import table
    from frafka_spark.registry import QUERIES

    import frafka_spark

    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    g = (
        QUERIES["q_events_growth_accounting"]
        .fn(spark, SF_DIR)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert (
        g["n_active"] == g["n_new"] + g["n_retained"] + g["n_resurrected"]
    ).all()
    assert g.loc[0, "n_churned"] == 0
    prev_active = g["n_active"].shift(1)
    consec = g.index[1:]
    assert (
        g.loc[consec, "n_churned"]
        == prev_active[consec] - g.loc[consec, "n_retained"]
    ).all()
    n_users = table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert g["n_new"].sum() == n_users


def test_pit_join_total_coverage(spark):
    """q_join_pit law: every lineitem lands exactly once — in a real
    version's bucket when its ship date falls inside the customer's
    history, else in the explicit '(no history)' bucket — so the
    per-priority counts sum to the full lineitem count and the
    no-history bucket matches an independent recount of pre-history
    ship dates."""
    from frafka_spark.io import table
    from frafka_spark.registry import QUERIES

    import frafka_spark

    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    pit = QUERIES["q_join_pit"].fn(spark, SF_DIR).toPandas()
    n_lines = table(spark, SF_DIR, "lineitem").count()
    assert pit["n_lines"].sum() == n_lines
    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    first = (
        table(spark, SF_DIR, "orders")
        .groupBy("o_custkey")
        .agg(F.min(F.to_date("o_orderdate")).alias("first_day"))
        .withColumnRenamed("o_custkey", "fk")
    )
    n_prehistory = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(first, F.col("fk") == F.col("o_custkey"))
        .filter(F.to_date("l_shipdate") < F.col("first_day"))
        .count()
    )
    no_hist = pit.set_index("priority_at_ship")["n_lines"].get("(no history)", 0)
    assert no_hist == n_prehistory


def test_survival_km_laws(spark):
    """q_events_survival: Kaplan-Meier invariants — survival starts
    below 1, is strictly within (0, 1], and is NON-INCREASING along
    each event type's churn-day sequence; hazards stay in (0, 1];
    and the risk set at the first churn day equals the type's total
    users (churned + censored all at risk initially)."""
    import frafka_spark
    from frafka_spark.io import table
    from frafka_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    rows = (
        QUERIES["q_events_survival"]
        .fn(spark, SF_DIR)
        .orderBy("event_type", "day")
        .collect()
    )
    assert rows
    totals = {
        r["event_type"]: r["n"]
        for r in table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    last_surv: dict = {}
    first_seen: set = set()
    for r in rows:
        t = r["event_type"]
        assert 0.0 < r["hazard"] <= 1.0
        assert 0.0 <= r["survival"] <= 1.0
        if t not in first_seen:
            first_seen.add(t)
            assert r["n_risk"] == totals[t], (t, r["n_risk"], totals[t])
        if t in last_surv:
            assert r["survival"] <= last_surv[t] + 1e-9
        last_surv[t] = r["survival"]


def test_cdc_apply_is_idempotent_and_complete(spark):
    """q_merge_cdc: applying the same compacted feed twice must be a
    no-op (CDC compaction is idempotent), deleted keys must not
    appear, and every surviving key is accounted for: target keys
    minus deletes, plus inserted keys."""
    import frafka_spark
    from frafka_spark.io import table
    from frafka_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    out = QUERIES["q_merge_cdc"].fn(spark, SF_DIR)
    again = QUERIES["q_merge_cdc"].fn(spark, SF_DIR)
    assert out.exceptAll(again).count() == 0
    assert again.exceptAll(out).count() == 0
    assert out.filter(F.col("last_op") == "D").count() == 0
    orders = table(spark, SF_DIR, "orders")
    feed_keys = orders.select(
        (
            F.col("o_custkey")
            + F.when(F.col("o_orderkey") % 13 == 0, 1000000).otherwise(0)
        ).alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 97 == 0, "D")
        .when(F.col("o_orderkey") % 13 == 0, "I")
        .otherwise("U")
        .alias("op"),
    )
    last = (
        feed_keys.groupBy("key")
        .agg(F.max_by("op", "seq").alias("last_op"))
    )
    deleted = {r["key"] for r in last.filter(F.col("last_op") == "D").collect()}
    target_keys = {
        r["c_custkey"]
        for r in table(spark, SF_DIR, "customer").select("c_custkey").collect()
    }
    inserted = {
        r["key"]
        for r in last.filter(
            (F.col("key") >= 1000000) & (F.col("last_op") != "D")
        ).collect()
    }
    want = (target_keys - deleted) | inserted
    got = {r["c_custkey"] for r in out.select("c_custkey").collect()}
    assert got == want


def test_geo_radius_grid_equals_naive(spark):
    """q_join_geo_radius: the grid-bucketed plan must find EXACTLY
    the naive all-pairs matches (cell size = radius ⇒ exact recall)
    — asserted engine-side, independent of the oracle."""
    import frafka_spark
    from frafka_spark.io import table
    from frafka_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    frafka_spark.load_all()
    got = (
        QUERIES["q_join_geo_radius"]
        .fn(spark, SF_DIR)
        .select("c_custkey", "s_suppkey")
    )
    cust = table(spark, SF_DIR, "customer").select(
        "c_custkey",
        (((F.col("c_custkey") * 9973) % 1800) / 10.0 - 90.0).alias("lat"),
        (((F.col("c_custkey") * 7919) % 3600) / 10.0 - 180.0).alias("lon"),
    )
    supp = table(spark, SF_DIR, "supplier").select(
        "s_suppkey",
        (((F.col("s_suppkey") * 6547) % 1800) / 10.0 - 90.0).alias("s_lat"),
        (((F.col("s_suppkey") * 4513) % 3600) / 10.0 - 180.0).alias("s_lon"),
    )
    d2 = (F.col("lat") - F.col("s_lat")) * (F.col("lat") - F.col("s_lat")) + (
        F.col("lon") - F.col("s_lon")
    ) * (F.col("lon") - F.col("s_lon"))
    naive = cust.crossJoin(supp).filter(d2 <= 4.0).select(
        "c_custkey", "s_suppkey"
    )
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


@given(
    series=st.lists(
        st.floats(min_value=0.0, max_value=25.0, allow_nan=False),
        min_size=0,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_lo_row_segmentation_identity(series):
    """The mathematical core of q_events_alert_episodes, validated
    beyond the fixtures: on ANY value series, the lo-row segmentation
    form (segment at every below-LO row; first above-HI row per
    segment opens; the boundary row closes) emits exactly the
    episodes the sequential hysteresis state machine emits. Pure
    Python on both sides — this pins the IDENTITY itself; the
    differential and plan tests pin its Spark/DuckDB realizations.
    """
    HI, LO = 15.0, 5.0
    rows = list(enumerate(series))  # (mi, v), minutes already ordered

    # sequential reference machine (alert_stream's semantics)
    want = []
    active, opened, peak, n = False, 0, 0.0, 0
    for mi, v in rows:
        if not active:
            if v > HI:
                active, opened, peak, n = True, mi, v, 1
        else:
            n += 1
            peak = max(peak, v)
            if v < LO:
                want.append((opened, mi, peak, n))
                active = False

    # relational lo-row segmentation form
    got = []
    seg_id = 0
    segs: dict[int, list[tuple[int, float]]] = {}
    for mi, v in rows:
        segs.setdefault(seg_id, []).append((mi, v))
        if v < LO:  # boundary row belongs to the segment it closes
            seg_id += 1
    for seg in segs.values():
        opened_mi = next((mi for mi, v in seg if v > HI), None)
        closed_mi = next((mi for mi, v in seg if v < LO), None)
        if opened_mi is None or closed_mi is None:
            continue
        window = [(mi, v) for mi, v in seg if opened_mi <= mi <= closed_mi]
        got.append(
            (
                opened_mi,
                closed_mi,
                max(v for _, v in window),
                len(window),
            )
        )

    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(
            # adversarial: exact band multiples and their IEEE
            # neighbors (the probe-key rounding territory), plus
            # ordinary magnitudes
            st.sampled_from(
                [
                    0.0,
                    10.0,
                    20.0,
                    30.0,
                    9.999999999999998,
                    10.000000000000002,
                    19.999999999999996,
                    20.000000000000004,
                    29.999999999999996,
                ]
            ),
            st.floats(
                min_value=-50.0,
                max_value=100.0,
                allow_nan=False,
                allow_infinity=False,
            ),
            st.sampled_from([-10.0, -20.0, -9.999999999999998]),
        ),
        min_size=1,
        max_size=60,
    ),
    groups=st.integers(min_value=1, max_value=3),
)
def test_banded_range_count_matches_per_row_reference(spark, vals, groups):
    """The bucket-band decomposition (q_win_range_frame_scaled's
    engine) must equal the per-row RANGE-frame reference — count of
    same-group values in [v − width, v] with the lower bound computed
    by the SAME IEEE subtraction — including when values sit exactly
    on band multiples or one ulp on either side (the probe-key
    rounding edge the docstring argues about)."""
    import pandas as pd

    WIDTH = 10.0
    rows = [(i % groups, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "v"]), schema="g int, v double"
    )
    from frafka_spark.operators.windows import (
        banded_range_count,
        banded_range_count_rows,
    )

    got = {
        (r["g"], r["v"]): r["n_in_band"]
        for r in banded_range_count(df, "g", "v", WIDTH).collect()
    }
    for g, v in set(rows):
        lo = v - WIDTH  # the identical IEEE double the frame computes
        want = sum(1 for gg, x in rows if gg == g and lo <= x <= v)
        assert got[(g, v)] == want, (g, v, got[(g, v)], want)

    # the per-row variant (q_win_range_frame_scaled's engine since
    # r10): same band counts, one row out per row in, payload intact —
    # duplicate values in `rows` exercise the peers-inclusive frame
    rid = [
        (i, g, float(v)) for i, (g, v) in enumerate(rows)
    ]
    df2 = spark.createDataFrame(
        pd.DataFrame(rid, columns=["rid", "g", "v"]),
        schema="rid int, g int, v double",
    )
    per_row = banded_range_count_rows(df2, "g", "v", WIDTH, "rid").collect()
    assert len(per_row) == len(rows)
    by_rid = {r["rid"]: (r["g"], r["v"], r["n_in_band"]) for r in per_row}
    for i, g, v in rid:
        lo = v - WIDTH
        want = sum(1 for _, gg, x in rid if gg == g and lo <= x <= v)
        assert by_rid[i] == (g, v, want), (i, by_rid[i], (g, v, want))


# ---------------------------------------------------------------------------
# Bloom-filter primitives (sources/manifest_table.py) — pure-Python
# properties, no Spark session needed, so examples are cheap.
# ---------------------------------------------------------------------------

_bloom_values = st.lists(
    st.one_of(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.text(max_size=40),
        st.floats(allow_nan=False, allow_infinity=False),
        st.booleans(),
        st.binary(max_size=24),
    ),
    max_size=120,
)


@settings(max_examples=150, deadline=None)
@given(members=_bloom_values, probes=_bloom_values)
def test_bloom_never_false_negative_and_bounded_fpp(members, probes):
    """A Bloom filter's ONE hard guarantee: every inserted value
    passes its own filter (no false negatives — absence proofs are
    exact). Also sanity-bound the false-positive side: with the 1 %
    sizing, absent probes can false-positive but not wholesale."""
    from frafka_spark.sources.manifest_table import (
        _bloom_build,
        _bloom_maybe_contains,
    )

    bloom = _bloom_build(members)
    live = {v for v in members if v is not None}
    for v in live:
        assert _bloom_maybe_contains(bloom, v)
    # The false-positive RATE is only meaningful for non-degenerate
    # filters — a 1-member bloom is 9 bits and can false-positive on
    # anything (hypothesis will find such probes). Bound the rate only
    # once the filter has real width; the deterministic large-case
    # test below pins the 1%-sizing behavior.
    if len(live) >= 32:
        absent = {p for p in probes if p is not None and p not in live}
        false_pos = sum(
            1 for p in absent if _bloom_maybe_contains(bloom, p)
        )
        assert false_pos <= max(2, int(len(absent) * 0.3)), (
            false_pos,
            len(absent),
        )


def test_bloom_fpp_near_sizing_on_a_large_filter():
    """Deterministic large case: 1000 members, 1000 absent probes —
    the observed false-positive rate sits near the 1% the sizing
    targets (≤5% leaves margin for hash clustering)."""
    from frafka_spark.sources.manifest_table import (
        _bloom_build,
        _bloom_maybe_contains,
    )

    bloom = _bloom_build([f"member-{i}" for i in range(1000)])
    fp = sum(
        1
        for i in range(1000)
        if _bloom_maybe_contains(bloom, f"absent-{i}")
    )
    assert fp <= 50, fp


@settings(max_examples=100, deadline=None)
@given(
    members=st.lists(st.integers(0, 10**6), max_size=80),
)
def test_bloom_canonical_encoding_is_width_independent(members):
    """The canonical byte encoding hashes the same logical value the
    same regardless of Python/arrow numeric width or float identity:
    SQL equality coerces numerics, so int 1 and float 1.0 MUST agree
    (ADVICE r10 — a cross-typed probe must not prove false absence),
    while bools, strings, and non-integral floats stay distinct."""
    from frafka_spark.sources.manifest_table import (
        _bloom_bytes,
        _bloom_hashes,
    )

    for v in members:
        assert _bloom_bytes(v) == _bloom_bytes(int(str(v)))
        assert _bloom_bytes(v) == _bloom_bytes(float(v))  # SQL coercion
        assert _bloom_hashes(v) == _bloom_hashes(v)
    # typed prefixes keep remaining cross-type collisions structural
    assert _bloom_bytes(1) != _bloom_bytes(True)
    assert _bloom_bytes(1) == _bloom_bytes(1.0)   # 1 = 1.0 in SQL
    assert _bloom_bytes(1) != _bloom_bytes(1.5)
    assert _bloom_bytes(1) != _bloom_bytes("1")


@settings(
    max_examples=5, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 9)),
        min_size=1,
        max_size=60,
    ),
    dlo=st.integers(0, 500),
    dwidth=st.integers(0, 120),
    upd=st.lists(
        st.tuples(st.integers(0, 600), st.integers(100, 109)), max_size=10
    ),
)
def test_manifest_dml_sequence_matches_python_model(
    spark, rows, dlo, dwidth, upd
):
    """delete_rows → merge_table_pruned → compact on ARBITRARY small
    tables vs a per-row Python model: the final snapshot's multiset
    equals the model after SQL-DELETE + upsert semantics, compaction
    changes nothing, and v0 still time-travels to the original rows —
    the end-to-end invariant the per-operator lifecycle tests can't
    sweep across input shapes."""
    _run_dml_sequence(spark, rows, dlo, dwidth, upd, partition_by=None)


@settings(
    max_examples=3, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 9)),
        min_size=1,
        max_size=60,
    ),
    dlo=st.integers(0, 500),
    dwidth=st.integers(0, 120),
    upd=st.lists(
        st.tuples(st.integers(0, 600), st.integers(100, 109)), max_size=15
    ),
)
def test_dml_sequence_on_partitioned_table(spark, rows, dlo, dwidth, upd):
    """The SAME DML sweep on a table hive-partitioned by ``v``:
    partition metadata must ride every commit (delete, merge,
    compact) without changing a single visible row — partition
    pruning is an optimization, never a semantics change (VERDICT
    r11 #3)."""
    _run_dml_sequence(spark, rows, dlo, dwidth, upd, partition_by=["v"])


def _run_dml_sequence(spark, rows, dlo, dwidth, upd, partition_by):
    import shutil
    import tempfile

    from frafka_spark.sources import manifest_table as mt

    path = tempfile.mkdtemp(prefix="dmlprop_")
    try:
        df = spark.createDataFrame(rows, "k long, v long").repartition(3)
        mt.write_table_with_stats(
            df, path, ["k"], mode="overwrite", partition_by=partition_by
        )

        dhi = dlo + dwidth
        mt.delete_rows(spark, path, "k", dlo, dhi)
        model = [(k, v) for k, v in rows if not (dlo <= k <= dhi)]

        changes = {}
        for k, v in upd:  # keyed change set: last write per key wins
            changes[k] = v
        if changes:
            ch = spark.createDataFrame(
                sorted(changes.items()), "k long, v long"
            )
            mt.merge_table_pruned(spark, path, ch, key="k")
            updated = [
                (k, changes[k]) if k in changes else (k, v)
                for k, v in model
            ]
            matched = {k for k, _ in model}
            inserts = [
                (k, v) for k, v in changes.items() if k not in matched
            ]
            model = updated + inserts

        mt.compact(spark, path, target_file_bytes=10_000)
        if partition_by:
            # compact rewrote THROUGH the partitioned writer: every
            # file regains an exact partition tuple
            m = mt._read_manifest(path, mt.current_version(path))
            assert m.get("partition_by") == partition_by
            assert set(m.get("partitions", {})) == set(m["files"])

        got = sorted((r.k, r.v) for r in mt.read_table(spark, path).collect())
        assert got == sorted(model)
        v0 = sorted(
            (r.k, r.v)
            for r in mt.read_table(spark, path, version=0).collect()
        )
        assert v0 == sorted(rows)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@settings(
    max_examples=5, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 9)),
        min_size=1,
        max_size=60,
    ),
    ulo=st.integers(0, 500),
    uwidth=st.integers(0, 120),
    bump=st.integers(1, 50),
    dkeys=st.lists(st.integers(0, 600), max_size=10),
    cdc=st.dictionaries(
        st.integers(0, 600),
        st.one_of(st.tuples(st.just("upsert"), st.integers(200, 209)),
                  st.tuples(st.just("delete"), st.none())),
        max_size=10,
    ),
)
def test_r11_dml_sequence_matches_python_model(
    spark, rows, ulo, uwidth, bump, dkeys, cdc
):
    """The round-11 DML surface swept end-to-end vs a per-row Python
    model: update_rows → delete_keys → three-branch merge_table_cdc
    on ARBITRARY small tables, then RESTORE to v0 — the final
    snapshot equals the model at every step, the restore returns the
    original rows as a NEW commit, and the pre-restore snapshot still
    time-travels."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from frafka_spark.sources import manifest_table as mt

    path = tempfile.mkdtemp(prefix="dmlprop11_")
    try:
        df = spark.createDataFrame(rows, "k long, v long").repartition(3)
        mt.write_table_with_stats(df, path, ["k"], mode="overwrite")

        uhi = ulo + uwidth
        mt.update_rows(
            spark, path, "k", ulo, uhi, {"v": F.col("v") + bump}
        )
        model = [
            (k, v + bump if ulo <= k <= uhi else v) for k, v in rows
        ]

        mt.delete_keys(spark, path, "k", dkeys)
        dset = set(dkeys)
        model = [(k, v) for k, v in model if k not in dset]

        if cdc:
            ch = spark.createDataFrame(
                [(k, v if v is not None else 0, op)
                 for k, (op, v) in sorted(cdc.items())],
                "k long, v long, _op string",
            )
            mt.merge_table_cdc(spark, path, ch, key="k")
            dels = {k for k, (op, _) in cdc.items() if op == "delete"}
            ups = {k: v for k, (op, v) in cdc.items() if op == "upsert"}
            matched = {k for k, _ in model}
            model = [
                (k, ups.get(k, v)) for k, v in model if k not in dels
            ] + [(k, v) for k, v in ups.items() if k not in matched]

        pre_restore = mt.current_version(path)
        got = sorted((r.k, r.v) for r in mt.read_table(spark, path).collect())
        assert got == sorted(model)

        mt.restore_table(path, 0)
        back = sorted(
            (r.k, r.v) for r in mt.read_table(spark, path).collect()
        )
        assert back == sorted(rows)
        mid = sorted(
            (r.k, r.v)
            for r in mt.read_table(spark, path, version=pre_restore).collect()
        )
        assert mid == sorted(model)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@settings(
    max_examples=5, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 9)),
        min_size=1,
        max_size=60,
    ),
    d1lo=st.integers(0, 500),
    d1w=st.integers(0, 120),
    u2lo=st.integers(0, 500),
    u2w=st.integers(0, 120),
    bump=st.integers(1, 50),
    extra=st.lists(
        st.tuples(st.integers(600, 700), st.integers(0, 9)), max_size=15
    ),
    d3lo=st.integers(0, 700),
    d3w=st.integers(0, 150),
)
def test_dv_sequence_matches_python_model(
    spark, rows, d1lo, d1w, u2lo, u2w, bump, extra, d3lo, d3w
):
    """The merge-on-read surface swept vs a per-row Python model:
    delete_rows_dv → update_rows_dv → append → delete_rows_dv →
    compact on ARBITRARY small tables. Invariants: the visible
    snapshot equals the model after every step, vectors never touch
    time travel (v0 intact), the second DV delete merges with vectors
    left on update-image files, and the incremental CDF over the
    whole chain FOLDS v0 into the final snapshot (inserts minus
    deletes, multiset-exact) — the consumer-facing contract of the
    O(delta) fast path."""
    _run_dv_sequence(spark, rows, d1lo, d1w, u2lo, u2w, bump, extra, d3lo, d3w)


@settings(
    max_examples=3, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 9)),
        min_size=1,
        max_size=60,
    ),
    d1lo=st.integers(0, 500),
    d1w=st.integers(0, 120),
    u2lo=st.integers(0, 500),
    u2w=st.integers(0, 120),
    bump=st.integers(1, 50),
    extra=st.lists(
        st.tuples(st.integers(600, 700), st.integers(0, 9)), max_size=15
    ),
    d3lo=st.integers(0, 700),
    d3w=st.integers(0, 150),
)
def test_dv_sequence_with_sidecar_vectors(
    spark, rows, d1lo, d1w, u2lo, u2w, bump, extra, d3lo, d3w
):
    """The SAME merge-on-read sweep with the inline threshold shrunk
    to 2 positions, so virtually every vector takes the packed-bitmap
    SIDECAR representation — the spill path must be semantically
    invisible (VERDICT r11 #2)."""
    from frafka_spark.sources import manifest_table as mt

    saved = mt._DV_INLINE_MAX
    mt._DV_INLINE_MAX = 2
    try:
        _run_dv_sequence(
            spark, rows, d1lo, d1w, u2lo, u2w, bump, extra, d3lo, d3w
        )
    finally:
        mt._DV_INLINE_MAX = saved


def _run_dv_sequence(
    spark, rows, d1lo, d1w, u2lo, u2w, bump, extra, d3lo, d3w
):
    import shutil
    import tempfile
    from collections import Counter

    from pyspark.sql import functions as F

    from frafka_spark.sources import manifest_table as mt

    path = tempfile.mkdtemp(prefix="dvprop_")
    try:
        df = spark.createDataFrame(rows, "k long, v long").repartition(3)
        mt.write_table_with_stats(df, path, ["k"], mode="overwrite")
        model = list(rows)

        d1hi = d1lo + d1w
        mt.delete_rows_dv(spark, path, "k", d1lo, d1hi)
        model = [(k, v) for k, v in model if not (d1lo <= k <= d1hi)]

        u2hi = u2lo + u2w
        mt.update_rows_dv(
            spark, path, "k", u2lo, u2hi, {"v": F.col("v") + bump}
        )
        model = [
            (k, v + bump if u2lo <= k <= u2hi else v) for k, v in model
        ]

        if extra:
            mt.write_table(
                spark.createDataFrame(extra, "k long, v long"), path,
                mode="append",
            )
            model = model + list(extra)

        d3hi = d3lo + d3w
        mt.delete_rows_dv(spark, path, "k", d3lo, d3hi)
        model = [(k, v) for k, v in model if not (d3lo <= k <= d3hi)]

        pre_compact = mt.current_version(path)
        got = sorted((r.k, r.v) for r in mt.read_table(spark, path).collect())
        assert got == sorted(model)

        # incremental CDF folds v0 into the pre-compact snapshot
        ch = mt.read_changes(spark, path, 0, pre_compact).collect()
        folded = Counter(rows)
        folded.update(
            (r.k, r.v) for r in ch if r._change_type == "insert"
        )
        folded.subtract(
            (r.k, r.v) for r in ch if r._change_type == "delete"
        )
        assert +folded == Counter(model)

        mt.compact(spark, path, target_file_bytes=10_000)
        assert "dv" not in mt._read_manifest(path, mt.current_version(path))
        got2 = sorted(
            (r.k, r.v) for r in mt.read_table(spark, path).collect()
        )
        assert got2 == sorted(model)
        v0 = sorted(
            (r.k, r.v)
            for r in mt.read_table(spark, path, version=0).collect()
        )
        assert v0 == sorted(rows)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_cte_recursive_closed_form_equals_recursive_fixpoint(spark, tmp_path):
    """The closed-form prefix rewrite of q_cte_recursive must equal the
    WITH RECURSIVE fixpoint on adversarial data — specifically keys whose
    ancestor chain has a HOLE (parent absent from customer) must drop,
    exactly as the recursive join would never reach them."""
    from frafka_spark.operators.subqueries import (
        _RECURSIVE_SQL,
        q_cte_recursive,
    )

    # 4501 breaks (450 and 45 absent); 9999 breaks (999/99/9? 9 present
    # but 999 and 99 absent); 770/7700 chain fully present; 123 present.
    keys = list(range(1, 10)) + list(range(10, 26)) + [123, 4501, 77, 770, 7700, 9999]
    sf_dir = str(tmp_path / "sf_holes")
    df = spark.createDataFrame([(int(k),) for k in keys], "c_custkey bigint")
    df.write.parquet(f"{sf_dir}/customer.parquet")

    got = sorted(
        tuple(r) for r in q_cte_recursive(spark, sf_dir).collect()
    )

    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView(
        "customer"
    )
    try:
        want = sorted(tuple(r) for r in spark.sql(_RECURSIVE_SQL).collect())
    finally:
        spark.catalog.dropTempView("customer")
        from frafka_spark import io as _io

        _io._VIEWS_REGISTERED.pop(_io._session_key(spark), None)

    assert got == want
    dropped = {k for k in keys} - {r[0] for r in got}
    assert dropped == {4501, 9999}
    by_key = {r[0]: r for r in got}
    assert by_key[7700] == (7700, 7, 3, "7/77/770/7700")
