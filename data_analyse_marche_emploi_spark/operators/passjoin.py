"""Exact edit-distance self-join via PassJoin segment blocking.

The edit-distance sibling of the SSJoin/PPJoin prefix filter in
``dedup.py``: an EXACT similarity self-join (no recall loss) whose
candidate generation is a plain equi-join, never a cartesian.

Pigeonhole lemma (Li, Deng, Feng — "PassJoin: a partition-based
method for similarity joins", VLDB 2011, public): partition a string
``s`` into ``d+1`` contiguous segments; any string ``r`` with
``ed(r, s) <= d`` must contain at least one segment *verbatim* —
``d`` edits can touch at most ``d`` of the ``d+1`` segments.
Alignment bound: in the optimal alignment the untouched segment ``i``
(starting at ``p_i`` in ``s``) appears in ``r`` starting within
``[p_i - d, p_i + d]`` — the net insert/delete drift before it is at
most ``d``. So:

* index side: each doc emits its ``d+1`` segments keyed by
  ``(len(s), i, xxhash64(seg))`` — O(d) rows per doc;
* probe side: each doc emits, for every candidate source length
  ``m in [len(r)-d, len(r)+d]`` and segment ``i``, the substrings of
  the scheme's segment length starting inside the paper's
  MULTI-MATCH-AWARE window (default) — the O(d^2)-per-length
  tightening of the plain +/-d shift window, which stays available
  as ``multi_match=False`` and serves as the differential twin in
  tests (identical pairs, ~3x more probe keys at d=5);
* candidates = equi-join on the key triple (8-byte hashes shuffle,
  never text); verification joins texts back and keeps
  ``levenshtein(a, b) <= d``.

Hash collisions only ever ADD candidates (verification kills them),
so exactness is preserved. Reference parity: the reference has no
string-similarity join at all (ingestion-elasticsearch.py:1-314 is
ingest-only); this is part of the training-data curation surface.
"""

from pyspark.sql import DataFrame, functions as F

__all__ = ["passjoin_pairs"]


def _segments_expr(text: str, ln: str, d: int) -> str:
    """SQL expr: array of structs (i, seg) — the even d+1-partition.

    Segment i (1-based) of a length-``ln`` string spans
    ``[1 + ((i-1)*ln) div (d+1), (i*ln) div (d+1)]`` — the standard
    even split whose segment lengths differ by at most one.
    """
    n = d + 1
    return (
        f"transform(sequence(1, {n}), i -> struct("
        f"i AS i, "
        f"substring({text}, 1 + CAST(((i-1)*{ln}) div {n} AS INT), "
        f"CAST((i*{ln}) div {n} - ((i-1)*{ln}) div {n} AS INT)) AS seg))"
    )


def _probe_keys(
    base: DataFrame, d: int, min_len: int, multi_match: bool
) -> DataFrame:
    """Probe-side key rows ``(rid, m, i, h)``: for each plausible
    source length ``m`` and segment ``i``, the xxhash64 of each
    substring of the scheme's segment length starting inside the
    drift window.  seg_len(m, i) = (i*m) div (d+1) - ((i-1)*m) div
    (d+1); start p_i(m) = 1 + ((i-1)*m) div (d+1).  The window around
    p_i is the multi-match-aware intersection (default) or the plain
    ``[p_i - d, p_i + d]`` shift window — both clamped to
    ``[1, len(r) - seg_len + 1]``.  Split out so tests can count the
    two modes' key fan-out directly."""
    n = d + 1
    probe_expr = (
        f"transform(sequence(greatest(__plen - {d}, {min_len}), __plen + {d}), "
        f"m -> transform(sequence(1, {n}), i -> struct(m AS m, i AS i, "
        f"  CAST(1 + ((i-1)*m) div {n} AS INT) AS p, "
        f"  CAST((i*m) div {n} - ((i-1)*m) div {n} AS INT) AS sl)))"
    )
    if multi_match:
        # Multi-match-aware drift bounds relative to w.p, with
        # delta = __plen - w.m (probe minus source length).
        lo_rel = f"greatest(-(w.i - 1), (__plen - w.m) - ({n} - w.i))"
        hi_rel = f"least(w.i - 1, (__plen - w.m) + ({n} - w.i))"
    else:
        lo_rel, hi_rel = f"-{d}", f"{d}"
    lo = f"greatest(w.p + ({lo_rel}), 1)"
    hi = f"least(w.p + ({hi_rel}), __plen - w.sl + 1)"
    # sequence(lo, hi) DESCENDS when lo > hi (step defaults to -1) —
    # an empty window must yield an empty array, not reversed starts.
    window_expr = (
        f"CASE WHEN ({lo}) > ({hi}) THEN array() ELSE "
        f"array_distinct(transform(sequence({lo}, {hi}), "
        f"q -> xxhash64(substring(__ptext, q, w.sl)))) END"
    )
    return (
        base.select(
            "__pid",
            "__plen",
            "__ptext",
            F.explode(F.flatten(F.expr(probe_expr))).alias("w"),
        )
        .select(
            F.col("__pid").alias("rid"),
            F.col("w.m").alias("m"),
            F.col("w.i").alias("i"),
            F.explode(F.expr(window_expr)).alias("h"),
        )
        .filter(F.col("h").isNotNull())
    )


def passjoin_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    d: int = 5,
    min_len: int | None = None,
    multi_match: bool = True,
) -> DataFrame:
    """All pairs (i, j, dist) with ``levenshtein <= d``, exactly.

    ``min_len`` defaults to ``d + 1``: shorter strings would get
    EMPTY segments under the even split (an empty-string hash key
    matches every probe window of length zero — a false all-pairs
    bucket).  Strings below the floor are excluded; a caller that
    needs them pairs the sub-``d+1`` band quadratically — it is a
    fixed-size length class, so that residue is corpus-bounded.

    ``multi_match=True`` (default) uses the paper's multi-match-aware
    substring selection (VLDB 2011 §4.2): for probe ``r`` against
    source length ``m`` (``delta = len(r) - m``), segment ``i``'s
    substring start is confined to
    ``[p_i + max(-(i-1), delta - (d+1-i)),
       p_i + min(i-1, delta + (d+1-i))]``
    instead of the plain shift window ``[p_i - d, p_i + d]``.  Left
    half: if segment ``i`` is the FIRST untouched segment under the
    optimal alignment, each of segments ``1..i-1`` consumed >= 1 edit,
    so net drift before ``p_i`` is at most ``i-1``; right half: the
    ``d+1-i`` segments after ``i`` must absorb the remaining length
    difference, bounding drift by ``delta ± (d+1-i)``.  Windows sum to
    O(d^2) keys per (probe, m) instead of O(d^2) per segment — ~3x
    fewer probe rows at d=5, measured and pinned in test_passjoin.py;
    the pair SET is provably (and differentially) identical because
    only non-first matching segments are skipped.  ``False`` keeps the
    plain shift window as the oracle/differential twin.

    Scale shape: the only shuffles are the (len, segment-index,
    segment-hash) equi-join — probe side carries O(d^2) 8-byte keys
    per doc (~120 at d=5 multi-match, ~360 plain, deduplicated per
    key triple before the join) — and the two id->text verification
    joins.  Nothing is quadratic in corpus size; per-bucket occupancy
    is bounded by true near-dup density because a shared 1/(d+1)
    segment of a long string is itself a near-dup signal.
    Verification cost is one levenshtein per candidate pair, driven
    by Spark's built-in (JVM codegen).
    """
    if min_len is None:
        min_len = d + 1
    elif min_len < d + 1:
        # Below d+1 the even split yields zero-length segments whose
        # hash matches every zero-length probe window — the blocking
        # degrades to an all-pairs bucket among short strings. Loud
        # beats silently quadratic.
        raise ValueError(f"min_len must be >= d + 1 = {d + 1}, got {min_len}")
    base = df.select(
        F.col(id_col).alias("__pid"),
        F.col(text_col).alias("__ptext"),
        F.length(text_col).alias("__plen"),
    ).filter(F.col("__plen") >= F.lit(min_len))

    # Index side: the d+1 segments of each doc, keyed by its own length.
    idx = base.select(
        "__pid",
        F.col("__plen").alias("m"),
        F.explode(F.expr(_segments_expr("__ptext", "__plen", d))).alias("s"),
    ).select(
        F.col("__pid").alias("sid"),
        "m",
        F.col("s.i").alias("i"),
        F.xxhash64(F.col("s.seg")).alias("h"),
    )

    probe = _probe_keys(base, d, min_len, multi_match)

    cand = (
        idx.join(probe, ["m", "i", "h"])
        .filter(F.col("sid") != F.col("rid"))
        .select(
            F.least("sid", "rid").alias("i"),
            F.greatest("sid", "rid").alias("j"),
        )
        .distinct()
    )

    a = base.select(
        F.col("__pid").alias("i"), F.col("__ptext").alias("__ta")
    )
    b = base.select(
        F.col("__pid").alias("j"), F.col("__ptext").alias("__tb")
    )
    return (
        cand.join(a, "i")
        .join(b, "j")
        .select(
            "i",
            "j",
            F.levenshtein("__ta", "__tb").alias("dist"),
        )
        .filter(F.col("dist") <= d)
    )
