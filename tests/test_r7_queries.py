"""Invariant pins for the round-7 registrations (i48-i54).

The oracle differential itself is covered by tests/test_differential.py
(these names are registered, so they run through the exact comparator the
driver uses).  What lives HERE is everything the differential cannot see:

- formula-sharing hazards: i48's Spark side and its oracle share the
  gaps-and-islands formulation, so a both-engines-wrong formula would
  pass the differential — pinned against an independent pure-Python
  reference (SURVEY §5.8);
- the i54 token-union-vs-span-sum counterexample (the bug class the
  shared dup_token_cover helper exists to prevent);
- semantic invariants (exactly-k, weight bias, partitioning invariance,
  probability bounds, sketch-error brackets);
- plan-shape pins mirroring tests/test_plans.py for the scale claims the
  docstrings make.
"""

from __future__ import annotations

import pytest

from csv_to_parquet_aws_datalake_spark import registry

registry.load_all()

R7_NAMES = (
    "i48_span_dedup", "i49_weighted_topk_sample", "i50_domain_mixture",
    "i51_contamination_matrix", "i52_quantile_drift", "i53_packing_census",
    "i54_span_coverage",
)


def test_r7_queries_are_registered():
    missing = [n for n in R7_NAMES if n not in registry.QUERIES]
    assert not missing, f"round-7 queries not registered: {missing}"
    # i52 is the one rows-only-by-design entry (sketch values are
    # engine-specific); every other r7 query must carry a DuckDB oracle
    assert "i52_quantile_drift" not in registry.ORACLES
    no_oracle = [n for n in R7_NAMES
                 if n != "i52_quantile_drift" and n not in registry.ORACLES]
    assert not no_oracle, f"round-7 queries missing oracles: {no_oracle}"


def test_i49_is_exactly_k_and_weight_biased(spark, sf_dir):
    # A-ES returns exactly k rows, and longer docs must be over-represented:
    # the sample's mean n_chars should exceed the corpus mean (weights are
    # proportional to n_chars).
    from pyspark.sql import functions as F

    rows = registry.QUERIES["i49_weighted_topk_sample"](spark, sf_dir).collect()
    assert len(rows) == 50
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    corpus_mean = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg(F.avg("n_chars")).collect()[0][0]
    )
    assert sample_mean > corpus_mean


def test_i50_mixture_invariants(spark, sf_dir):
    # temperature alpha=0.5 flattens: small sources gain share, the largest
    # source loses; keep_p is a probability with max exactly 1.
    fn = registry.QUERIES["i50_domain_mixture"]
    rows = {r["source"]: r for r in fn(spark, sf_dir).collect()}
    assert abs(sum(r["share"] for r in rows.values()) - 1.0) < 1e-3
    assert abs(sum(r["temp_share"] for r in rows.values()) - 1.0) < 1e-3
    assert max(r["keep_p"] for r in rows.values()) == pytest.approx(1.0)
    assert all(0.0 < r["keep_p"] <= 1.0 for r in rows.values())
    biggest = max(rows.values(), key=lambda r: r["n_toks"])
    smallest = min(rows.values(), key=lambda r: r["n_toks"])
    assert biggest["temp_share"] <= biggest["share"]
    assert smallest["temp_share"] >= smallest["share"]


def test_i52_sketch_inside_exact_bracket(spark, sf_dir):
    # the d10-style pin: each approx_percentile answer must lie between the
    # exact (q ± slack) quantiles.  slack = 1/acc + 2/n: the sketch's
    # nominal rank error (acc=100 in the query) PLUS two ranks of
    # discretization — the sketch returns a data value while quantile_cont
    # interpolates between two, and on a 70-row language group a single
    # rank is already 1.4%.
    import duckdb

    fn = registry.QUERIES["i52_quantile_drift"]
    rows = fn(spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'")
    for r in rows:
        n = con.execute(
            "SELECT count(*) FROM documents WHERE lang = ?", [r["lang"]]
        ).fetchone()[0]
        slack = 0.01 + 2.0 / n
        for q, col in ((0.5, "approx_p50"), (0.9, "approx_p90")):
            lo, hi = con.execute(
                "SELECT quantile_cont(n_chars, ?), quantile_cont(n_chars, ?)"
                " FROM documents WHERE lang = ?",
                [max(q - slack, 0.0), min(q + slack, 1.0), r["lang"]],
            ).fetchone()
            assert lo <= r[col] <= hi, (r["lang"], col, r[col], lo, hi)
    con.close()


def test_i48_spans_are_maximal_and_duplicated(spark, sf_dir):
    # every reported span really is wall-to-wall duplicated 5-grams, and
    # spans in the same doc never touch (maximality: a gap of >=1 pos).
    fn = registry.QUERIES["i48_span_dedup"]
    rows = fn(spark, sf_dir).collect()
    assert rows, "test corpus (31-token vocab) must produce duplicate grams"
    by_doc: dict[int, list] = {}
    for r in rows:
        assert r["span_end"] - r["span_start"] >= 4  # at least one 5-gram
        assert r["span_grams"] == r["span_end"] - 4 - r["span_start"] + 1
        by_doc.setdefault(r["doc_id"], []).append(r)
    for spans in by_doc.values():
        spans.sort(key=lambda r: r["span_start"])
        for a, b in zip(spans, spans[1:]):
            # consecutive dup positions would have merged into one island
            assert b["span_start"] > (a["span_end"] - 4) + 1


# ---------------------------------------------------------------------------
# Plan-shape pins: the docstrings make scale claims; enforce them the way
# tests/test_plans.py does.
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffles(plan: str) -> int:
    return sum(1 for ln in plan.splitlines()
               if "Exchange hashpartitioning" in ln
               or "Exchange SinglePartition" in ln)


def test_i48_skew_safe_dup_test_and_bounded_shuffles(spark, sf_dir):
    # r9 shape (ADVICE r7): the duplicate test is a partially-aggregated
    # count + semi-join, NOT a gram-partitioned window — the only Window
    # left is the doc-keyed island merge, and the gram count must carry a
    # map-side partial_count (the skew defense: a hot gram collapses to
    # one row per map task before the shuffle)
    plan = _plan(registry.QUERIES["i48_span_dedup"](spark, sf_dir))
    assert plan.count("FileScan parquet") <= 2     # pruned count branch
    assert _shuffles(plan) <= 3                    # gram agg + doc window
    assert plan.count("Window [") == 1             # island merge only
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_i49_is_take_ordered_not_global_sort(spark, sf_dir):
    plan = _plan(registry.QUERIES["i49_weighted_topk_sample"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert _shuffles(plan) == 0


def test_i50_i51_pin_the_corpus_scan(spark, sf_dir):
    # localCheckpoint policy: the post-pin plan must contain NO parquet scan
    # (the corpus was read exactly once, at pin time) — every remaining
    # exchange moves the tiny census / gram sliver.
    for name in ("i50_domain_mixture", "i51_contamination_matrix"):
        plan = _plan(registry.QUERIES[name](spark, sf_dir))
        assert plan.count("FileScan parquet") == 0, name
        assert "CartesianProduct" not in plan, name


def test_i52_i53_one_shuffle_each(spark, sf_dir):
    for name in ("i52_quantile_drift", "i53_packing_census"):
        plan = _plan(registry.QUERIES[name](spark, sf_dir))
        # i53's two post-window aggregations must REUSE the lang
        # partitioning (HashPartitioning(lang) satisfies their clustering)
        assert _shuffles(plan) <= 1, name


# ---------------------------------------------------------------------------
# From-scratch recomputations on constructed frames: i48's Spark side and
# its oracle SHARE the gaps-and-islands formula, so the differential alone
# cannot catch a both-engines-wrong formulation — pin the kernel against an
# independent pure-Python reference (the test-strategy layer SURVEY §5.8
# applies to formula-sharing queries).
# ---------------------------------------------------------------------------


def _py_span_reference(texts: dict[int, str], w: int = 5):
    """Naive O(n^2) span finder: gram counts by dict, islands by scanning."""
    grams: dict[str, int] = {}
    pos_by_doc: dict[int, list[int]] = {}
    for doc_id, text in texts.items():
        toks = text.split(" ")
        for i in range(len(toks) - w + 1):
            g = " ".join(toks[i:i + w])
            grams[g] = grams.get(g, 0) + 1
    for doc_id, text in texts.items():
        toks = text.split(" ")
        pos_by_doc[doc_id] = [
            i for i in range(len(toks) - w + 1)
            if grams[" ".join(toks[i:i + w])] > 1
        ]
    out = []
    for doc_id, positions in pos_by_doc.items():
        run: list[int] = []
        for p in positions + [None]:
            if run and (p is None or p != run[-1] + 1):
                out.append((doc_id, run[0], run[-1] + w - 1, len(run)))
                run = []
            if p is not None:
                run.append(p)
    return sorted(out)


def test_i48_kernel_matches_pure_python_reference(spark):
    import random

    from csv_to_parquet_aws_datalake_spark.operators.llm_text import (
        span_dedup_spans,
    )

    rng = random.Random(481)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = {i: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30)))
             for i in range(40)}
    # include a doc too short to gram (edge: must contribute nothing)
    texts[99] = "alpha beta"
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_grams"])
        for r in span_dedup_spans(df).collect())
    assert got == _py_span_reference(texts)


def test_i52_double_run_is_stable(spark, sf_dir):
    # rows-only counterpart of t2_emulation's double-run: the sketch
    # answer must be deterministic for identical input and partitioning
    fn = registry.QUERIES["i52_quantile_drift"]
    one = sorted(map(tuple, fn(spark, sf_dir).collect()))
    two = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert one == two


def test_i49_sample_is_partitioning_invariant(spark, sf_dir):
    # the A-ES claim: membership is a pure function of (seed, doc_id, w) —
    # the same frame at 1 and at 13 partitions must yield the same sample
    from pyspark.sql import functions as F

    def sample_with(parts):
        import csv_to_parquet_aws_datalake_spark.loader as loader
        from csv_to_parquet_aws_datalake_spark.operators.llm_pipeline import (
            aes_sampling_key,
        )

        base = loader.load_table(spark, sf_dir, "documents")
        d = base.repartition(parts)
        # the REGISTERED key expression (single-sourced, r9 review) on the
        # repartitioned frame (the query loads its own table)
        rows = (d.select("doc_id", aes_sampling_key().alias("k"))
                .orderBy(F.asc("k"), "doc_id").limit(50).collect())
        return [r["doc_id"] for r in rows]

    assert sample_with(1) == sample_with(13)
    # and the registered-path sample equals the inline recomputation
    got = [r["doc_id"] for r in
           registry.QUERIES["i49_weighted_topk_sample"](spark, sf_dir)
           .collect()]
    assert got == sample_with(7)


def test_i49_boundary_keys_are_ulp_separated(spark, sf_dir):
    # ADVICE r7: membership is decided by ordering the UNROUNDED double
    # key, so if rank 50 and rank 51 sat within a few ULPs, a libm
    # -ln(u) difference between Spark's JVM and DuckDB could flip the
    # boundary doc.  Pin that the actual corpus keeps a gap orders of
    # magnitude above cross-engine libm disagreement (<= 1 ULP on a
    # correctly-rounded log; allow a wide 64-ULP margin).  Equal keys at
    # the boundary would be a real hazard even with the doc_id
    # tie-break, since the oracle compares post-round values — assert
    # strict separation too.
    import math

    from pyspark.sql import functions as F

    import csv_to_parquet_aws_datalake_spark.loader as loader
    from csv_to_parquet_aws_datalake_spark.operators.llm_pipeline import (
        aes_sampling_key,
    )

    d = loader.load_table(spark, sf_dir, "documents")
    ks = [r["k"] for r in
          d.select(aes_sampling_key().alias("k"))
          .orderBy(F.asc("k")).limit(51).collect()]
    assert len(ks) == 51  # corpus larger than the sample: boundary exists
    k50, k51 = ks[49], ks[50]
    assert k51 - k50 > 64 * math.ulp(k50), (k50, k51)


def test_i51_matrix_on_constructed_sources(spark):
    # hand-computed contamination matrix: srcA and srcB share exactly the
    # grams of one common sentence; srcC shares nothing.
    from pyspark.sql import functions as F

    from csv_to_parquet_aws_datalake_spark.operators import llm_text

    common = "one two three four five six"          # 2 distinct 5-grams
    rows = [
        (1, common + " alpha", "srcA"),             # grams: 3
        (2, common + " beta", "srcB"),              # grams: 3
        (3, "p q r s t u v w", "srcC"),             # grams: 4, disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    sg = llm_text._spark_grams(df, "source").select("source", "g").distinct()
    # pin the building blocks on a constructed frame (the public fn loads
    # the documents table): shared-gram counts between constructed sources
    a, b = sg.alias("a"), sg.alias("b")
    pairs = (
        a.join(b, (F.col("a.g") == F.col("b.g"))
               & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("sa"), F.col("b.source").alias("sb"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .collect()
    )
    assert {(r["sa"], r["sb"]): r["shared"] for r in pairs} == {
        ("srcA", "srcB"): 2,   # 'one..five' and 'two..six' only
    }


def test_dup_gram_kernel_on_adversarial_hot_gram_corpus(spark):
    # the r9 skew fix's own adversary: EVERY doc shares one stop-phrase
    # 5-gram (the hot key whose window partition could not be split),
    # surrounded by per-doc-unique filler.  The kernel must stay exact:
    # each doc hits on the shared gram's position only, and the span is
    # exactly the 5 shared tokens.
    from csv_to_parquet_aws_datalake_spark.operators.llm_text import (
        dup_gram_positions, span_dedup_spans,
    )

    hot = "click here to read more"
    rows = [(i, f"u{i}a u{i}b u{i}c {hot} u{i}d u{i}e u{i}f")
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hits = dup_gram_positions(df).collect()
    # filler tokens are doc-unique, so only grams fully inside the hot
    # phrase repeat: exactly one position (pos 3) per doc
    assert len(hits) == 200
    assert all(r["pos"] == 3 for r in hits)
    spans = span_dedup_spans(df).collect()
    assert len(spans) == 200
    assert all(r["span_start"] == 3 and r["span_end"] == 7
               and r["span_grams"] == 1 for r in spans)


def test_i54_coverage_is_token_union_not_span_sum(spark):
    # the counterexample that killed the naive sum-of-span-lengths
    # formula: i48 islands are maximal in GRAM space, but islands with a
    # 1-4 position gap OVERLAP in token space.  doc X = t0..t12 with gram
    # g4 unique (Y duplicates X's g0..g3, Z duplicates g5..g8) produces X
    # islands (0,7) and (5,12): span lengths sum to 16 > 13 tokens, while
    # the true covered-token union is all 13.
    from csv_to_parquet_aws_datalake_spark.operators.llm_text import (
        dup_gram_positions, dup_token_cover, span_dedup_spans,
    )

    t = [f"t{i}" for i in range(13)]
    rows = [(1, " ".join(t)),             # doc X
            (2, " ".join(t[0:8])),        # doc Y: duplicates X grams 0..3
            (3, " ".join(t[5:13]))]       # doc Z: duplicates X grams 5..8
    df = spark.createDataFrame(rows, "doc_id long, text string")

    spans_x = sorted(
        (r["span_start"], r["span_end"])
        for r in span_dedup_spans(df).collect() if r["doc_id"] == 1)
    assert spans_x == [(0, 7), (5, 12)]           # overlapping in tokens
    assert sum(e - s + 1 for s, e in spans_x) == 16  # the naive overcount

    # drive the SAME production helper i54 uses (no inline re-derivation:
    # a drifting copy would mask the exact bug this test exists to pin)
    cover = dup_token_cover(dup_gram_positions(df)).collect()
    by_doc = {r["doc_id"]: r["dup_toks"] for r in cover}
    assert by_doc[1] == 13                        # union, not 16
    assert by_doc[2] == 8 and by_doc[3] == 8      # fully covered docs


def test_i54_share_never_exceeds_one(spark, sf_dir):
    fn = registry.QUERIES["i54_span_coverage"]
    for r in fn(spark, sf_dir).collect():
        assert 0.0 <= r["dup_share"] <= 1.0, r
        assert r["dup_toks"] <= r["total_toks"], r


def test_i54_plan_shape(spark, sf_dir):
    # three column-pruned scans (grams path: doc_id+text, plus the
    # text-only dup-count branch of the r9 semi-join shape; census path:
    # doc_id+source+text), keyed shuffles only (gram agg, doc_id
    # window+join side, source rollup), never a cartesian
    plan = _plan(registry.QUERIES["i54_span_coverage"](spark, sf_dir))
    assert plan.count("FileScan parquet") <= 3
    assert _shuffles(plan) <= 4
    assert "CartesianProduct" not in plan


def test_i53_census_matches_pure_python_packer(spark, monkeypatch):
    # i53's bin formula ((run_sum - n_toks) div 512 in doc_id order) is
    # SHARED with its oracle SQL, so the differential cannot catch a
    # both-engines-wrong packing — pin against an independent pure-Python
    # greedy packer (same hazard class as i48's pure-Python span pin).
    import random

    from csv_to_parquet_aws_datalake_spark.operators import llm_pipeline as lp

    rng = random.Random(530)
    rows = []
    for i in range(120):
        lang = ["en", "fr", "de"][i % 3]
        n_toks = rng.randint(1, 700)        # some docs straddle/overflow 512
        rows.append((i, lang, " ".join("w" for _ in range(n_toks))))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    monkeypatch.setattr(lp, "load_table", lambda s, d, n: docs)
    got = {r["lang"]: r for r in lp.i53_packing_census(spark, "ignored").collect()}

    # independent reference: greedy fixed-boundary packing per lang, docs
    # in doc_id order; a doc starting before a 512 boundary stays in its
    # starting bin (bins CAN overflow) — the i39 contract
    by_lang: dict[str, list[int]] = {}
    for doc_id, lang, text in sorted(rows):
        by_lang.setdefault(lang, []).append(len(text.split(" ")))
    for lang, sizes in by_lang.items():
        bins: dict[int, int] = {}
        offset = 0
        for n in sizes:
            bins[offset // 512] = bins.get(offset // 512, 0) + n
            offset += n
        r = got[lang]
        assert r["n_bins"] == len(bins), lang
        assert r["n_docs"] == len(sizes), lang
        assert r["total_toks"] == sum(sizes), lang
        assert r["max_bin_toks"] == max(bins.values()), lang
        assert r["overflow_bins"] == sum(1 for v in bins.values() if v > 512), lang
        assert r["fill_rate"] == round(sum(bins.values()) / (len(bins) * 512.0), 6), lang
