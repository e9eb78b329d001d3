"""Market-basket and co-occurrence-graph operators.

Association mining and graph analytics over (basket, item) pairs —
the "customers who bought X also bought Y" family and the triangle
structure of the resulting affinity graph. Same candidate-enumeration
discipline as the set-similarity joins (operators/dedup.py): baskets
aggregate ONCE into sorted item arrays, pair fanout is a two-level
posexplode (every intermediate row bounded at O(basket size), never
a flattened C(n,2) array in one row), and all downstream joins are
item-cardinality, not pair-cardinality, equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_items(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """One sorted, deduplicated item array per basket — the single
    content shuffle of the whole family (partial collect_set dedups
    map-side, so repeated items never cross the wire twice)."""
    return df.groupBy(F.col(basket_col).alias("basket")).agg(
        F.sort_array(F.collect_set(F.col(item_col))).alias("items")
    )


def pair_counts(baskets: DataFrame, min_support: int = 1) -> DataFrame:
    """Co-occurrence counts for every unordered item pair sharing a
    basket: (item_a < item_b, pair_cnt). Two-level explode — anchor on
    posexplode, then explode the remaining slice — so a hot basket of
    n items streams C(n,2) ROWS instead of building one C(n,2)-element
    array (the 2^31 single-row cap). At corpus scale, cap basket size
    upstream the way max_df caps posting lists: a degenerate basket
    holding half the catalog is a stop-basket, not a signal."""
    return (
        baskets.filter(F.size("items") >= 2)
        .select(F.col("items"), F.posexplode("items").alias("pos", "item_a"))
        .select(
            "item_a",
            F.explode(
                F.expr("slice(items, pos + 2, size(items) - pos - 1)")
            ).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= int(min_support))
    )


def association_metrics(
    baskets: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Attach per-item basket counts and exact integer lift to each
    pair: lift6 = floor(pair_cnt * n_baskets * 10^6 / (cnt_a * cnt_b))
    — pure int64 arithmetic (no float division on the compare path; at
    petabyte basket counts promote the product to DECIMAL(38,0), the
    topology is unchanged). Item counts re-derive from the basket
    arrays (item-cardinality shuffle); the scalar basket count is the
    only broadcast, one row by construction."""
    ic = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    return (
        pairs.join(
            ic.select(F.col("item").alias("item_a"), F.col("cnt").alias("cnt_a")),
            "item_a",
        )
        .join(
            ic.select(F.col("item").alias("item_b"), F.col("cnt").alias("cnt_b")),
            "item_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "item_a",
            "item_b",
            "pair_cnt",
            "cnt_a",
            "cnt_b",
            F.expr(
                "(pair_cnt * n_baskets * 1000000) div (cnt_a * cnt_b)"
            ).alias("lift6"),
        )
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation over an undirected graph given
    as canonical edges (src < dst): the classic wedge-close — join
    edges to edges on dst = src to enumerate wedges x<y<z, then
    semi-close each wedge against the (x, z) edge. Every step is an
    equi-join on node keys (shuffle-partitionable; no cartesian), each
    triangle materializes exactly once thanks to the canonical order,
    and the final rollup explodes the three corners into node rows.
    Skew knob at scale: degree-cap or support-threshold the edge list
    first — a celebrity node's wedge count is quadratic in its degree,
    which is the measured reason the catalog entry builds the graph
    from support-pruned co-purchase pairs."""
    e1 = edges.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    e2 = edges.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    e3 = edges.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    return (
        tri.select(
            F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_cnt"))
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Per-node LOCAL clustering coefficient over canonical (src < dst)
    undirected edges: triangles(node) / wedges(node), where
    wedges(node) = C(degree, 2) — how close the node's neighborhood is
    to a clique, the standard community-density signal one aggregate
    above :func:`triangle_counts`.

    Exact integer arithmetic on the compare path: ``coef6 =
    (tri_cnt * 2 * 10^6) div (deg * (deg - 1))`` — no float ratio to
    flip across engines. Nodes of degree < 2 have zero wedges (the
    ratio is undefined) and are excluded rather than faked as 0.

    Scale shape: degree is one node-keyed rollup of the edge list
    (each edge explodes into its two endpoints map-side), triangles
    come from the wedge-close equi-joins, and the final join is
    node-cardinality. Nothing new shuffles beyond triangle_counts."""
    deg = (
        edges.select(F.explode(F.array("src", "dst")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        deg.filter(F.col("deg") >= 2)
        .join(triangle_counts(edges), "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("tri_cnt"), F.lit(0)).alias("tri_cnt"),
            F.expr(
                "(coalesce(tri_cnt, 0) * 2000000) div (deg * (deg - 1))"
            ).alias("coef6"),
        )
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank over canonical undirected edges, in
    EXACT int64 fixed-point (ranks scaled by ``scale``): each round
    ``r'(v) = base + (damping_num * sum_{u~v} (r(u) div deg(u)))
    div damping_den`` with ``base = scale*(den-num) div den`` — every
    operation is an integer join/aggregate/division, so any engine
    computes bit-identical ranks (a float power iteration is the
    classic cross-engine hash-flip). Per-edge truncation of
    ``r div deg`` loses < deg ulps of mass per node per round —
    irrelevant for ranking, essential for determinism.

    Scale shape: one symmetric edge table, then per iteration ONE
    node-keyed join (rank+degree onto edge sources) and ONE
    destination rollup — shuffle volume is O(edges) int64 rows per
    round, the textbook distributed power iteration. Iteration count
    is fixed and small (rank ordering stabilizes long before values);
    lineage stays shallow so no checkpoint is needed. Dangling nodes
    cannot exist here (an undirected edge gives both endpoints
    degree >= 1); isolated nodes are out of the edge set by
    definition and score base + nothing = base."""
    # (r14 optimization round: a localCheckpoint of sym/deg here was
    # measured SLOWER — 2.9 s → 4.1 s warm at sf0.1 — because AQE's
    # exchange reuse already computes the shared pair_counts subtree
    # once per action, while the checkpoint pays an extra eager
    # materialization of O(edges) rows. Left un-checkpointed
    # deliberately; at iteration counts deep enough to blow up the
    # plan, a reliable checkpoint every ~10 rounds is the tool.)
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    base = scale * (damping_den - damping_num) // damping_den
    # ``deg`` rides INSIDE the rank relation (r15): the old loop
    # re-joined ranks⋈deg every iteration just to recover the degree
    # it had thrown away — one node-keyed join per round for free.
    # Carrying the extra int64 column through the per-round rollup
    # join costs bytes only; the integer arithmetic is unchanged.
    ranks = deg.select("node", "deg", F.lit(int(scale)).alias("rank"))
    for _ in range(int(iterations)):
        contrib = (
            sym.join(
                ranks.select(
                    F.col("node").alias("src"),
                    F.expr("rank div deg").alias("give"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("give").alias("got"))
        )
        ranks = (
            deg.join(contrib, "node", "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(int(base))
                    + F.expr(
                        f"({damping_num} * coalesce(got, 0)) div {damping_den}"
                    )
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.col("rank").alias("rank9"))
