"""Physical-plan regression tests: the scale properties the engine
depends on (pushdown, pruning, broadcast, partial top-k) must survive
refactors — a correct-but-full-scan plan is a failure at 100 TB even
when the answer matches."""

from __future__ import annotations

import re

import pytest

from data_analyse_marche_emploi_spark import catalog


def plan_of(spark, sf_dir, name: str) -> str:
    # default metadata truncation (100 chars) cuts ReadSchema lists short
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    # plan assertions describe the COLD plan: drop any cached scans left
    # by earlier modules, or CacheManager swaps InMemoryRelation in for
    # the parquet scan and PushedFilters vanish from the plan string.
    spark.catalog.clearCache()
    df = catalog.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "agg_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # into PushedFilters
    # column pruning: lineitem has 11 columns, the query needs 5
    cols = read_schemas(plan)[0].split(",")
    assert len(cols) == 5


def test_in_list_pushdown(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "filter_terms_in")
    assert "In(c_mktsegment" in plan


def test_dim_joins_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_enrich")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_anti_join_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_anti")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_topk_is_partial(spark, sf_dir):
    """Top-k must plan as TakeOrderedAndProject (per-partition heads),
    never a global sort."""
    for name in ("agg_topk", "order_limit", "dq_skew_report"):
        plan = plan_of(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, name


def test_nested_projection_prunes(spark, sf_dir):
    """proj_source_fields must read exactly its three columns."""
    plan = plan_of(spark, sf_dir, "proj_source_fields")
    cols = read_schemas(plan)[0].split(",")
    assert len(cols) == 3


@pytest.mark.parametrize(
    "name",
    [
        "dedup_minhash_lsh",
        "dedup_simhash_pairs",
        "ann_lsh",
        "ann_lsh_multiprobe",
        "dedup_semantic",
        "assoc_basket_pairs",
        "graph_triangle_count",
        "curation_dsir_select",
    ],
)
def test_similarity_paths_have_no_cartesian(spark, sf_dir, name):
    """The scale paths must never plan an all-pairs (corpus x corpus)
    product. ann_lsh is allowed its two deliberate broadcast products
    against FIXED-size sides (the bits*n_tables-row plane table for
    signatures — once for the corpus, once for the query set): each is
    linear in the corpus with a constant multiplier, not quadratic."""
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    nlj = plan.count("BroadcastNestedLoopJoin")
    # assoc_basket_pairs broadcasts ONE row (the scalar basket count) —
    # a constant-size product, verified single-row by the aggregate
    # feeding the exchange
    # ann_lsh_multiprobe adds a third plane-table product (the per-bit
    # margin rows feeding the probe sequence — still bits*n_tables
    # rows, query side only). dedup_semantic's single product is the
    # n_clusters-row centroid table (a TakeOrderedAndProject of the
    # corpus), broadcast for the map-side assignment argmax.
    # curation_dsir_select broadcasts its two 1-row corpus-total
    # aggregates (Cs, Ct) — constant-size products feeding the
    # bucket-domain log-ratio table, never vectors x vectors
    allowed = {
        "ann_lsh": 2,
        "ann_lsh_multiprobe": 3,
        "dedup_semantic": 1,
        "assoc_basket_pairs": 1,
        "curation_dsir_select": 2,
    }
    assert nlj <= allowed.get(name, 0)
    if name == "curation_dsir_select" and nlj:
        # both product build sides must be the single-row total
        # aggregates (sum over the bucket counts)
        idents = re.findall(
            r"BroadcastExchange IdentityBroadcastMode(?:.*\n){1,6}", plan
        )
        assert len(idents) == nlj
        for block in idents:
            assert re.search(r"HashAggregate.*functions=\[sum", block), block
    if name == "assoc_basket_pairs" and nlj:
        assert re.search(
            r"BroadcastExchange IdentityBroadcastMode(?:.*\n){1,6}?.*"
            r"HashAggregate.*functions=\[count",
            plan,
        ), plan
    if name == "ann_lsh_multiprobe" and nlj:
        # every broadcast-product build side must be the fixed-size
        # plane table, same rule as ann_lsh below
        idents = re.findall(
            r"BroadcastExchange IdentityBroadcastMode(?:.*\n){1,4}", plan
        )
        assert len(idents) == nlj
        for block in idents:
            assert "ExistingRDD[tbl" in block
    if name == "dedup_semantic" and nlj:
        # the one product's build side is the n_clusters-row limit of
        # the corpus scan, never vectors×vectors
        m = re.search(
            r"BroadcastExchange IdentityBroadcastMode(?:.*\n){1,8}", plan
        )
        assert m and "TakeOrderedAndProject" in m.group(0), plan
    if name == "ann_lsh" and nlj:
        # counting alone would let a corpus×corpus BNLJ hide behind the
        # allowance: pin that every broadcast-product build side IS the
        # fixed-size plane table (its ExistingRDD schema), so a
        # regression that broadcasts vectors×vectors fails here
        idents = re.findall(
            r"BroadcastExchange IdentityBroadcastMode(?:.*\n){1,4}", plan
        )
        assert len(idents) == nlj
        for block in idents:
            assert "ExistingRDD[tbl" in block


def test_global_sort_is_range_partitioned(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sort_global")
    assert "rangepartitioning" in plan


def test_shuffle_hash_hint_respected(spark, sf_dir):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, sf_dir, "join_hint_shuffle_hash")
        assert "ShuffledHashJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_ivf_candidate_join_is_hashed(spark, sf_dir):
    """ann_ivf's only unconditioned product is corpus × the (constant,
    broadcast) centroid set — linear in corpus size. The candidate join
    itself must be an equi-hash join on the inverted-list id."""
    plan = plan_of(spark, sf_dir, "ann_ivf")
    assert "CartesianProduct" not in plan
    assert re.search(r"BroadcastHashJoin \[list_id", plan)


def test_mixture_sample_pushes_strata_to_scan(spark, sf_dir):
    """The mixture's stratum membership must reach the parquet scan as
    an IN filter (partition/row-group pruning at scale), and the rate
    dim must broadcast."""
    plan = plan_of(spark, sf_dir, "mixture_stratified_sample")
    assert re.search(r"PushedFilters: \[.*In\(lang", plan)
    assert "BroadcastHashJoin" in plan


def test_pii_redact_is_shuffle_free(spark, sf_dir):
    """Pure per-row redaction: no keyed shuffle anywhere in the plan
    (the loader's round-robin repartition is a parallelism barrier,
    not operator data movement)."""
    plan = plan_of(spark, sf_dir, "pii_redact")
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_cap_per_source_single_shuffle(spark, sf_dir):
    """Rank-filter cap: exactly one shuffle, on the group key."""
    plan = plan_of(spark, sf_dir, "cap_docs_per_source")
    assert plan.count("Exchange hashpartitioning") == 1


def test_repetition_signals_partial_aggregates(spark, sf_dir):
    """Both aggregation levels must partial-aggregate map-side (the
    skew story for hot tokens) — and nothing may collect or join the
    corpus to itself."""
    plan = plan_of(spark, sf_dir, "text_repetition")
    assert "partial_count" in plan or "partial" in plan.lower()
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_chunking_reads_only_needed_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "docs_to_chunks")
    cols = read_schemas(plan)[0].split(",")
    assert len(cols) == 2  # doc_id, text


def test_market_share_star_broadcasts_dims(spark, sf_dir):
    """Q8 shape: every dimension edge (part, asia-nation set, supplier
    nation names, region) broadcasts; no cartesian anywhere; all three
    selective predicates (p_type, r_name, the order-date window) reach
    their parquet scans."""
    plan = plan_of(spark, sf_dir, "q_market_share")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan
    assert re.search(r"PushedFilters: \[.*EqualTo\(p_type,ECONOMY", plan)
    assert re.search(r"PushedFilters: \[.*EqualTo\(r_name,ASIA", plan)
    assert re.search(r"PushedFilters: \[.*GreaterThanOrEqual\(o_orderdate", plan)


def test_large_orders_aggregates_before_joining(spark, sf_dir):
    """Q18 shape: the quantity pre-aggregation (the only hash shuffle)
    runs below the enrichment joins, so only HAVING survivors move."""
    plan = plan_of(spark, sf_dir, "q_large_orders")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


def test_top_supplier_argmax_is_broadcast_not_window(spark, sf_dir):
    """Q15 shape: the argmax must be a broadcast-scalar join, not a
    single-partition global window (which serializes at scale)."""
    plan = plan_of(spark, sf_dir, "q_top_supplier")
    assert "Window" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_dormant_customers_anti_join_pushes_date(spark, sf_dir):
    """Q22 shape: the recency anti-join's date predicate reaches the
    orders scan; the scalar threshold joins as a 1-row broadcast."""
    plan = plan_of(spark, sf_dir, "q_dormant_customers")
    assert re.search(r"PushedFilters: \[.*GreaterThanOrEqual\(o_orderdate,2000-01-01", plan)
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row (count,total) scalar
    assert plan.count("Exchange hashpartitioning") <= 1


def test_runtime_bloom_filter_engages_on_shuffle_join(spark, sf_dir):
    """At cluster scale (application side too big to broadcast, >10 GB
    scan) Spark injects a runtime bloom filter built from the selective
    creation side into the probe-side scan. Local fixtures never cross
    those thresholds, so simulate the size regime by conf: the filtered
    orders side of q_shipping_priority must then produce
    bloom_filter_agg + might_contain on the lineitem probe side —
    proof the engine's declarative plans are runtime-filter-eligible
    (no manual semi-join pre-filters needed at 100 TB)."""
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, sf_dir, "q_shipping_priority")
        assert "bloom_filter_agg" in plan and "might_contain" in plan
    finally:
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_window_exact_owner_partial_aggregates_no_window(spark, sf_dir):
    """The per-window owner must be a groupBy min (partial-aggregates
    map-side, probe skew AQE-splittable), never a partition-window min,
    which would funnel every copy of a hot boilerplate window into one
    task. Regression guard for the skew fix."""
    plan = plan_of(spark, sf_dir, "dedup_window_exact")
    assert "partial_min" in plan
    assert "Window" not in plan


def test_gapfill_single_key_shuffle_then_window(spark, sf_dir):
    """Gap-fill's fill window must ride the key partitioning the
    aggregation created — a single-partition (global) window would be
    the scale-killer."""
    plan = plan_of(spark, sf_dir, "ts_gapfill")
    assert "Window" in plan
    assert "partitionBy" not in plan or "user_id" in plan
    # the spine explode must be a Generate, not a driver loop
    assert "Generate explode" in plan


def test_snapshot_diff_shuffles_hashes_not_payload(spark, sf_dir):
    """Both diff sides must reduce to (key, 8-byte hash) before the
    full-outer join — the value column may be read but never joined."""
    plan = plan_of(spark, sf_dir, "snapshot_diff")
    assert "FullOuter" in plan
    assert "xxhash64" in plan


def test_line_dedup_owner_partial_aggregates_no_cartesian(spark, sf_dir):
    """dedup_lines_global's segment ownership must partial-aggregate
    map-side (boilerplate segments collapse before the shuffle) and the
    candidate topology must stay an equi-join — no window-function
    funnel, no cartesian anywhere."""
    plan = plan_of(spark, sf_dir, "dedup_lines_global")
    assert "partial_min" in plan
    assert "Window" not in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan

def test_substring_rewrite_owner_partial_aggregates_no_cartesian(spark, sf_dir):
    """dedup_substring_rewrite's window ownership must partial-aggregate
    map-side over the (h1, h2) composite (a boilerplate window shared by
    10^7 docs collapses to one row per task before the shuffle), never a
    partition-window rank, and the dup join-back must stay an equi-join
    — no cartesian, no nested-loop."""
    plan = plan_of(spark, sf_dir, "dedup_substring_rewrite")
    assert "partial_min" in plan
    assert "Window" not in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_tf_idf_never_broadcasts_term_table(spark, sf_dir):
    """The tf⋈dfreq join must be a ShuffledHashJoin on term: the
    doc-frequency side is term-cardinality sized (10⁸-10⁹ distinct
    terms at 100 TB) so ANY BroadcastHashJoin here is an OOM at scale
    — r4 force-broadcast dfreq; hint-free Catalyst statically broadcast
    the even-bigger tf side (measured 8.3 s at sf0.1). The only allowed
    broadcast product is the guaranteed-one-row n_docs aggregate."""
    plan = plan_of(spark, sf_dir, "text_tf_idf")
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    # the single BNLJ is the 1-row n_docs cross join, nothing else
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_line_dedup_default_shuffles_hash_keys_not_text(spark, sf_dir):
    """dedup_lines_global's default ownership exchange must key on the
    128-bit segment-hash struct, never the segment string — at 100 TB
    the text-keyed form shuffles the whole corpus; the hash form ships
    16-byte keys and rebuilds clean_text map-side from the original
    column."""
    plan = plan_of(spark, sf_dir, "dedup_lines_global")
    assert "hashpartitioning(__h" in plan
    assert "hashpartitioning(__seg" not in plan
    assert "partial_min" in plan
    assert "Window" not in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


@pytest.mark.parametrize(
    "name",
    ["dedup_ngram_jaccard", "dedup_minhash_lsh", "text_repetition",
     "dedup_clusters"],
)
def test_no_lambda_filter_below_exchange(spark, sf_dir, name):
    """InferFiltersFromGenerate synthesizes `size(arr) > 0` filters
    under explodes; with a COMPUTED array the substituted filter sinks
    below the repartition exchange and re-evaluates the query's most
    expensive lambda in the narrow pre-shuffle stage (measured 2.9 s →
    0.4 s on the sf0.1 shingle explode when removed). The rule is
    excluded session-wide and explicit guards are written as cheap
    token-count predicates — no Filter in these plans may carry a
    higher-order lambda over the text column."""
    plan = plan_of(spark, sf_dir, name)
    for line in plan.splitlines():
        stripped = line.strip().lstrip(":+- ")
        if stripped.startswith("Filter") and "lambdafunction" in stripped:
            raise AssertionError(
                f"{name}: lambda-bearing Filter in plan: {stripped[:200]}"
            )


def test_q21_shape_semi_and_anti_no_cartesian(spark, sf_dir):
    """q_cheapest_line_supplier must express both correlated EXISTS
    subqueries as hash semi/anti joins with the non-equi conjunct
    riding the equi-key — a cartesian or BNLJ here is quadratic in
    order size at scale."""
    plan = plan_of(spark, sf_dir, "q_cheapest_line_supplier")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_q2_argmin_is_partial_aggregate_not_window(spark, sf_dir):
    """q_min_price_supplier's per-part minimum must come from a
    partial-aggregating groupBy joined back, never a per-part window
    (WindowExec buffers a hot part's whole group in one task)."""
    plan = plan_of(spark, sf_dir, "q_min_price_supplier")
    assert "partial_min" in plan
    assert "Window" not in plan


@pytest.mark.parametrize(
    "name,hash_col",
    [("dedup_image_phash", "phash"), ("dedup_audio_fingerprint", "afp"),
     ("dedup_video_phash", "vphash")],
)
def test_multimodal_dedup_shuffles_hashes_not_media(spark, sf_dir, name, hash_col):
    """The multimodal dedup entries' content exchange must key on the
    8-byte hash column — the `media` binary column must never appear in
    ANY exchange (it is produced and consumed map-side; at corpus scale
    shuffling payload bytes is the difference between feasible and
    not)."""
    plan = plan_of(spark, sf_dir, name)
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert any(f"hashpartitioning({hash_col}" in ln for ln in exchanges)
    assert not any("media" in ln for ln in exchanges)


def test_ohlc_single_partial_aggregate_no_window(spark, sf_dir):
    """ts_ohlc's open/close must ride min/max(struct) inside ONE
    partially-aggregated groupBy — a first_value/last_value window
    would shuffle and sort every event instead of pre-combined
    (key, bucket) rows."""
    plan = plan_of(spark, sf_dir, "ts_ohlc")
    assert "Window" not in plan
    assert "partial_min" in plan and "partial_max" in plan


def test_interpolate_generates_gaps_no_spine_join(spark, sf_dir):
    """ts_interpolate must GENERATE gap rows from consecutive known
    points (lead + sequence explode) — a spine left-join would
    re-derive the bucket aggregate on both sides and need a second
    window pass. One Window spec, no Join node anywhere."""
    plan = plan_of(spark, sf_dir, "ts_interpolate")
    assert "Join" not in plan
    assert len(re.findall(r"\n[^\n]*\bWindow\b", plan)) == 1
    assert "explode(sequence" in plan


def test_rolling_distinct_no_window_no_expand(spark, sf_dir):
    """ts_rolling_distinct expresses COUNT(DISTINCT) OVER RANGE as a
    bucket-contribution explode + plain hash aggregates: no Window
    node (not partial-aggregable) and no Expand (single distinct agg
    plans as two-level HashAggregate)."""
    plan = plan_of(spark, sf_dir, "ts_rolling_distinct")
    assert "Window" not in plan
    assert "Expand" not in plan
    assert "explode(sequence" in plan


def test_q21_shape_no_expand_no_distinct_rewrite(spark, sf_dir):
    """q_waiting_suppliers must decorrelate via stacked distinct-free
    aggregates: a countDistinct pair would trigger Catalyst's
    Expand/gid rewrite (3x fact rows + an extra fact-wide exchange).
    The top-10 must stay a partial top-k, never a global sort."""
    plan = plan_of(spark, sf_dir, "q_waiting_suppliers")
    assert "Expand" not in plan
    assert "partial_sum" in plan
    assert "TakeOrderedAndProject" in plan


def test_q20_shape_broadcasts_dims_partial_aggregates(spark, sf_dir):
    """q_promo_part_suppliers: the part filter must broadcast into the
    fact scan and the supplier rollup must partial-aggregate; no
    sort-merge join anywhere (every non-fact side is dim-sized)."""
    plan = plan_of(spark, sf_dir, "q_promo_part_suppliers")
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan
    assert "SortMergeJoin" not in plan


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Both sides written bucketBy(8, orderkey): the sort-merge join
    must consume the bucket layout directly — zero Exchange below the
    join (the aggregate above it may still shuffle). A plan that
    re-shuffles bucketed tables silently forfeits the entire point of
    paying the write-time shuffle."""
    plan = plan_of(spark, sf_dir, "join_bucketed_no_shuffle")
    m = re.search(r"SortMergeJoin.*", plan, re.DOTALL)
    assert m, f"expected a SortMergeJoin over the bucketed tables:\n{plan}"
    below_join = m.group(0)
    assert "Exchange" not in below_join, (
        "bucketed join must not re-shuffle either side:\n" + below_join
    )
    assert plan.count("Bucketed: true") == 2, plan


def test_partitioned_write_prunes_directories(spark, sf_dir):
    """Hive-layout write + filtered read-back: the scan must prune at
    the DIRECTORY level — PartitionFilters carries the event_type
    predicate and every file the plan touches lives under
    event_type=purchase/. A scan reading sibling partitions means the
    layout bought nothing."""
    plan = plan_of(spark, sf_dir, "pipeline_partitioned_write_prune")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1), plan
    # the partition predicate must NOT degrade into a data filter
    # (df.inputFiles() can't verify pruning — it lists the relation
    # pre-pruning — so the plan string is the contract)
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "event_type" not in pushed.group(1), plan


def test_lateral_topk_decorrelates_to_window_group_limit(spark, sf_dir):
    """The correlated LATERAL ORDER BY/LIMIT must decorrelate: no
    per-driving-row re-execution (no nested-loop/cartesian over the
    correlation), a hash/broadcast join on the correlation key, and
    Spark 4's WindowGroupLimit partial+final so each task keeps only
    its per-key top-2 before the window exchange — the map-side
    combine of the top-k-per-group world."""
    plan = plan_of(spark, sf_dir, "sql_lateral_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan and "Final" in plan
    assert "row_number()" in plan
