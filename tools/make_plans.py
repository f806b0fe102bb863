"""Regenerate PLANS.md: captured physical plans for the flagship
operators, with the scale property each plan must exhibit.

Run: python tools/make_plans.py  [SF_DIR]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from columnarmodeling_spark.queries import REGISTRY  # noqa: E402
from columnarmodeling_spark.session import get_spark  # noqa: E402

CASES = {
    "q01_pricing_summary": "Scan→filter→agg flagship (A7 stress–strain shape). "
    "What to check: the date predicate reaches the Parquet scan as "
    "PushedFilters, ReadSchema holds only the 7 needed columns, and the "
    "aggregate is split partial (before the exchange) / final (after).",
    "q02_regional_revenue": "Star join (J2/J6). What to check: all four "
    "dimension joins are BroadcastHashJoin (no shuffle on the fact side "
    "until the final aggregate); each dim's filter is pushed to its own scan.",
    "q06_range_band_join": "BC range (theta) join (P2/J6). What to check: the "
    "tiny boundary-condition side is broadcast (BroadcastNestedLoopJoin — "
    "correct for a band predicate; at 9 rows the quadratic term is the BC "
    "count, not the particle count).",
    "q30_proximity_pairs": "Flagship J1 binned proximity join. What to check: "
    "the theta predicate (dist < eps) never reaches the join condition — the "
    "join key is the grid cell (equi), the distance is a post-filter; AQE is "
    "free to split hot cells (skew-join).",
    "q42_ngram_jaccard_pairs": "Shingle-intersection similarity join. What to "
    "check: the pair space is produced only by the shingle equi-join; counts "
    "via partial hash agg; the cached shingle relation feeds all three "
    "branches (InMemoryTableScan).",
    "q69_ivf_search": "IVF top-k ANN search (scale path). What to check: the "
    "10-row centroid table is BroadcastExchange (probe routing costs no "
    "shuffle of the vectors); the per-cell exact kernel is a "
    "FlatMapCoGroupsInPandas whose two inputs hash-partition on the cell "
    "id only — the O(n^2) pair space never appears in the plan.",
    "q96_ivf_adaptive": "Adaptive-k IVF search (k=ceil(sqrt(n)) cells). What "
    "to check: cell routing is a MapInPandas directly over the scan (the "
    "seed matrix rides a sc.broadcast; one int64 matmul per Arrow batch "
    "— no join, no per-vector window); the only exchanges hash-partition "
    "on the cell id into the same cogrouped FlatMapCoGroupsInPandas as "
    "q69. The seed draw itself (separate job) is a TakeOrderedAndProject "
    "— per-partition top-k, never a single-partition global Sort.",
    "q97_bm25_topterms": "BM25 top-terms (text-ranking shape). What to "
    "check: tf and df are partial/final HashAggregates (map-side combine "
    "before each exchange); the one-row corpus-stats frame enters via "
    "BroadcastExchange; the final ranking window partitions by doc_id — "
    "no global sort anywhere in the plan.",
    "q99_rollup_cascade": "Hypertable rollup cascade (continuous-aggregate "
    "pattern). What to check: the raw events scan appears ONCE; the hour "
    "and day branches read InMemoryTableScan of the cached minute/hour "
    "partials instead of re-scanning raw data — measured 16x more raw "
    "rows -> 1.1x total time (SCALE.md).",
    "q109_span_dedup": "Exact repeated-span removal (ExactSubstr-style "
    "dedup). What to check: the gram relation is built once by a "
    "generator expression inside the scan projection (no Python, no "
    "join for shingling); the hot-gram side is a partial/final hash agg "
    "whose output is small enough that AQE broadcasts it back onto the "
    "gram stream; islands merge inside ONE window exchange keyed by "
    "doc_id. No pairwise doc x doc space exists anywhere in the plan.",
    "q111_load_curves": "Time-varying load-curve BC evaluation "
    "(operators/load_curves.interpolate_curves). What to check: control "
    "points and probes meet in a plain UNION (no range join, no "
    "per-probe binary search) and the interpolation resolves inside ONE "
    "window exchange keyed by curve_id — last_value/first_value "
    "IGNORE NULLS pull the bracketing control points, so cost is "
    "O((points+probes) log) per curve regardless of probe count; the "
    "endpoint-clamp branches are CASE expressions in the same "
    "projection, not extra joins.",
    "q118_joint_weakening": "Joint/discontinuity re-materialization "
    "(operators/joints.py). What to check: the joint table enters via "
    "BroadcastExchange into a BroadcastNestedLoopJoin whose condition "
    "is the full orientation predicate (sign-product crossing test) — "
    "correct and linear-in-bonds because the broadcast side is the "
    "O(10) joint set; the crossed flag comes back to the bond stream "
    "through a left join on (src, dst); no shuffle of the bond stream "
    "beyond that single hash join.",
    "q113_ivf_recall_curve": "ANN recall-vs-cost sweep (nprobe 1/2/4). "
    "What to check: the exact baseline and the 32-row md5 probe sample "
    "enter as localCheckpoint scans (computed ONCE, reused by all "
    "three sweep arms; the baseline is |probes| x n, linear in the "
    "corpus — no all-pairs join anywhere); each arm's IVF candidates "
    "meet the exact top-k in a left_semi hash join on (vec_id, "
    "neighbor) followed by partial/final count aggs; the three one-row "
    "arm results meet in a Union — no sweep-wide shuffle, each arm is "
    "independently parallel.",
    "q124_pq_adc_recall": "PQ-ADC recall eval on the sampled probe set. "
    "What to check: the LUT side is the localCheckpointed subd "
    "relation semi-joined (BroadcastHashJoin) to the 32-row probe "
    "sample BEFORE the (sub, code) equi-join, so ADC fan-out is "
    "8 rows per (probe, candidate) — linear in the corpus; the exact "
    "L2 baseline is a BroadcastNestedLoopJoin whose BROADCAST side is "
    "the 32 probe vectors (|probes| x n pairs, never n^2); both "
    "rankings are per-probe windows over bounded partitions, and the "
    "final recall row is a two-integer aggregate.",
    "q185_hll_set_algebra": "HLL set algebra (union/intersection from "
    "two 4 KB sketches). What to check: each corpus side collapses to "
    "ONE 2048-row (bucket, max-rho) hash agg before anything joins — "
    "the estimate arithmetic then runs on a full-outer join of two "
    "constant-size relations, so the only data-sized work is the two "
    "agg scans; the exact-overlap check beside it is a separate "
    "semi-join branch that shares the token scans.",
    "q187_table_fingerprint": "Order-insensitive table fingerprint "
    "(XOR of 60-bit row hashes). What to check: ONE partial/final "
    "bit_xor aggregate pair per table — 8 bytes of agg state through "
    "the exchange, no sort, no window; the plan must be a pure "
    "scan→project→two-stage agg with nothing else.",
    "q190_cms_join_size": "Count-Min join-size estimation. What to "
    "check: each corpus folds to a d x w (5 x 256) counter relation "
    "via hash aggs BEFORE the sketch-sketch equi-join on (row, col) — "
    "the join input is constant-size regardless of corpus, and the "
    "exact join size computed beside it shares the token scans "
    "(per-token-count aggs then a product join on the token key, "
    "linear in distinct tokens).",
    "q192_softening_bonds": "Pluggable constitutive law (UDM analog) "
    "through the breaking block solver. What to check: per round, ONE "
    "FlatMapCoGroupsInPandas on the (bx, by) block key carrying both "
    "particles and bonds (the ustate damage column rides the bond "
    "relation); two rounds appear because fuse=4 < n_steps=8, each "
    "behind a localCheckpoint barrier; the per-bond law runs inside "
    "the kernel, invisible to the plan — exactly the point: swapping "
    "the constitutive model changes NO exchange.",
    "q205_viscoelastic_bonds": "Second pluggable law (rate-dependent "
    "Kelvin–Voigt, queries/simulation._kelvin_voigt_law) through the "
    "q192 hook. What to check: the plan is IDENTICAL in shape to "
    "q192's — two FlatMapCoGroupsInPandas rounds on the (bx, by) "
    "block key (fuse=4 < n_steps=8), the ustate column (now the "
    "PREVIOUS length, not damage) riding the bond relation through "
    "the shuffle rounds — because the law runs inside the kernel: "
    "swapping spring+dashpot for bilinear softening changes NO "
    "exchange, which is the whole point of the hook.",
    "q193_label_propagation": "Synchronous LPA communities, 4 unrolled "
    "rounds. What to check: each round is exactly one shuffled "
    "edge-label hash join + one (node, label) partial/final count agg "
    "+ one per-node top-1 as ANOTHER partial/final hash agg "
    "(lexicographic struct-max — NO window operator appears anywhere "
    "in the plan, so hub degrees never serialize); rounds are "
    "separated by localCheckpoint scans (Scan ExistingRDD), so the "
    "captured plan shows only the LAST round + the size join — fixed "
    "shuffle count per round at any scale.",
    "q197_rfm_segments": "RFM quintiles from global ranks. What to "
    "check: three with_global_index passes appear as "
    "repartitionByRange Exchanges each followed by a per-partition "
    "window and a BroadcastHashJoin against the #partitions-row "
    "offset relation — no single-partition window anywhere; the "
    "scores are map-side integer arithmetic over the broadcast "
    "customer-count row.",
    "q198_residual_vq": "Residual (two-level) VQ encode. What to "
    "check: BOTH assignment stages are BroadcastNestedLoopJoins whose "
    "broadcast side is a constant-size codebook (16 coarse / 17 "
    "residual entries); per-vector top-1 windows partition on vec_id "
    "with codebook-size partitions; the level-2 codebook is built from "
    "a TakeOrdered 32-row seed draw + the zero row — nothing "
    "data-sized is ever broadcast or sorted globally.",
    "q199_poisson_bootstrap": "Deterministic Poisson bootstrap. What "
    "to check: the B=8 replica fan-out is a broadcast crossJoin of an "
    "8-row range followed by pure map-side weight arithmetic (md5 + "
    "threshold CASEs) into ONE partial/final hash agg on the replica "
    "id — the entire bootstrap is a single scan's map work, no "
    "resampling exchange exists in the plan.",
    "q126_ivfpq_search": "IVFADC search (adaptive cells + PQ codes). "
    "What to check: routing is the q96 MapInPandas (broadcast seed "
    "matrix, no join); the ONLY exchanges hash-partition on the cell "
    "id into a FlatMapCoGroupsInPandas whose probe side carries "
    "128-entry LUT arrays and whose index side carries 8-code arrays "
    "— no per-(sub, code) join rows anywhere (the 178x-at-16x "
    "first-cut plan had an 8-rows-per-pair SortMergeJoin here; "
    "SCALE.md records the redesign).",
    "q127_bloom_prefilter": "Bloom n-gram membership prefilter. What "
    "to check: the finished filter is a <=2048-row aggregate behind a "
    "BroadcastExchange — the probe side's bit checks are map-side "
    "after a broadcast hash join on the word index; the only "
    "all-to-all shuffles are the shingle hash agg and the per-doc "
    "accounting agg, both linear in corpus size.",
    "q128_triangle_count": "Degree-oriented triangle counting. What "
    "to check: the wedge join and the closing-edge join are both "
    "shuffle hash joins keyed on vertex ids — no broadcast of the "
    "edge set, no cartesian anywhere; the orientation filter "
    "(struct(deg, id) comparison) runs map-side BEFORE the wedge "
    "join, so hub vertices never fan out as wedge centers.",
    "q129_prefix_filter_join": "Exact prefix-filter similarity join. "
    "What to check: candidate generation joins ONLY the prefix "
    "relation with itself (equi on the shingle string); the df "
    "ordering rides one hash agg + one per-doc window; verification "
    "re-joins the full shingle relation strictly on candidate pairs. "
    "Hot shingles appear in NO prefix (rarest-first order), so the "
    "candidate join has no skewed build key.",
    "q130_sequence_packing": "Concat-and-chunk sequence packing. What "
    "to check: the global prefix sum is the two-pass pattern — a "
    "RangePartitioning exchange, a per-partition window (partitionBy "
    "__pid, never empty-partition global), and a broadcast of the "
    "#partitions offset rows; chunk membership is a generator "
    "explode bounded by each doc's own span.",
    "q134_hll_distinct": "HyperLogLog distinct-count sketch. What to "
    "check: the register build is ONE partial/final hash agg on "
    "(lang, bucket) — 512 rows of state per group, merged by max, so "
    "the map-side combine absorbs the shingle stream; rho is pure "
    "JVM expressions (length(bin())) inside whole-stage codegen; the "
    "exact-distinct eval side is the only vocabulary-sized agg.",
    "q135_funnel": "Ordered funnel conversion (view→click→purchase). "
    "What to check: every join and agg keys on user_id — one hash "
    "partitioning reused down the chain (AQE may broadcast the "
    "shrinking stage frames at this sf; at scale they stay "
    "shuffle-hash on the same key); no window, no sort, no per-user "
    "event ordering anywhere in the plan.",
    "q136_skyline": "Skyline / Pareto frontier via global prefix-max. "
    "What to check: the per-price level agg is partial/final; the "
    "prefix max is the two-pass pattern — ONE RangePartitioning "
    "exchange, a per-partition window (partitionBy __pid), and a "
    "BroadcastExchange of the #partitions offset rows — never a "
    "single-partition global window; survivors re-attach by a "
    "left_semi hash join on (price, size).",
    "q145_interval_join": "Big-big interval join as a binned equi-join. "
    "What to check: the join key is the 32-day bucket (shuffle hash "
    "join, AQE-splittable) — the BETWEEN appears only as a residual "
    "predicate (a Filter above the join or the join's non-equi extra "
    "condition), never as the SOLE join condition, which would force "
    "BroadcastNestedLoop; the interval side's bucket "
    "explode is a generator bounded at 2 rows per interval; both "
    "date→epoch-day projections run in whole-stage codegen over the "
    "scans.",
    "q142_weighted_sample": "Weighted Poisson sampling + HT totals. "
    "What to check: the inclusion decision and the HT term are pure "
    "projections inside whole-stage codegen over the scan (no "
    "pre-shuffle); the only exchanges are the two per-source "
    "partial/final hash aggs and their left join — nothing sees the "
    "full corpus twice.",
    "q132_countmin_sketch": "Count-Min sketch heavy hitters. What to "
    "check: the sketch build is ONE partial/final hash agg over "
    "(j, col) — state is bounded at 4x1024 counters regardless of "
    "vocabulary, so the map-side combine absorbs the token stream; "
    "the 4-row hash-family table and the finished 4096-row sketch "
    "both enter the probe via BroadcastExchange (the eval costs the "
    "top-20 side nothing but map work); the only all-to-all "
    "exchanges are the two token aggs, both linear in corpus size.",
    "q149_gap_fill": "Regular-grid LOCF gap fill. What to check: the "
    "bucket agg, the per-user bounds agg, the grid generator "
    "(explode of sequence(lo, hi) — bounded by span, not a cross "
    "join), the left join and the IGNORE-NULLS fill window ALL key "
    "on user_id — one hash partitioning reused end to end, no "
    "global sort, no single-partition window.",
    "q151_pmi_collocations": "PMI collocation mining. What to check: "
    "the min-count Filter sits directly on the bigram partial/final "
    "agg OUTPUT — i.e. the Zipf tail is pruned BEFORE the two "
    "unigram equi-joins; the two corpus totals enter via "
    "BroadcastExchange (one-row each); the unigram joins are plain "
    "shuffle/broadcast hash joins keyed on a word with fan-out 1 "
    "per surviving bigram (both sides pre-aggregated).",
    "q155_zorder_layout": "Morton z-order layout key. What to check: "
    "the whole interleave (8 mask-and-spread stages) collapses into "
    "ONE whole-stage-codegen Project over the scan — no exchange "
    "until the single per-bucket partial/final hash agg; ReadSchema "
    "carries only c_custkey and c_acctbal.",
    "q157_equidepth_hist": "Equi-depth histogram over the global "
    "index. What to check: the rank comes from the two-pass pattern "
    "— one RangePartitioning exchange, a per-partition window "
    "(partitionBy __pid), BroadcastExchange of the #partitions "
    "offsets — never a single-partition global window; the count "
    "enters via a one-row broadcast and the bucket arithmetic is a "
    "codegen projection feeding one partial/final agg.",
    "q162_bucketed_join": "Bucket-pruned co-located join. What to "
    "check: both scans show `Bucketed: true` / SelectedBucketsCount "
    "8 of 8, and NO shuffle exchange exists on the fact side — at "
    "this sf the planner (correctly) still broadcasts the small "
    "orders side, so the co-location property itself is asserted by "
    "tests/test_timeseries.py::test_bucketed_join_plan_has_no_"
    "exchange, which disables broadcast and verifies the "
    "SortMergeJoin consumes both bucketed scans with ZERO Exchange; "
    "only the final aggregate exchanges, keyed on the group column.",
    "q165_mad_robust": "Per-group median via composite-key global "
    "index. What to check: NO per-group sort task exists — the only "
    "sort is the RangePartitioning exchange over (flag, value, "
    "tiebreak); group ranks derive from a broadcast (flag, min-rank) "
    "join; the median probe is a broadcast hash join on (flag, rn).",
    "q169_tfidf_cosine_pairs": "Inverted-index TF-IDF cosine join. "
    "What to check: the pair space exists ONLY downstream of the "
    "posting-list self-equi-join on the term, with the df cutoff "
    "filter BELOW the join on the probe side; tf/df/norm "
    "aggregations are partial/final hash aggs; the corpus-size "
    "relation enters via a one-row BroadcastExchange.",
    "q170_hist_quantiles": "Histogram quantile sketch vs exact. What "
    "to check: the histogram build is ONE partial/final hash agg "
    "whose state is 1024 buckets regardless of rows; the cumulative "
    "pass and the exact side both ride the two-pass operators "
    "(RangePartitioning + per-partition window + broadcast offsets); "
    "the 4 quantile probes are broadcast joins against bounded "
    "relations.",
    "q171_twap": "Time-weighted average per series. What to check: "
    "one user-keyed window (lead) feeding one user-keyed "
    "partial/final hash agg — the exchange for the window is REUSED "
    "by the aggregation (same hash partitioning), and the weighted "
    "sums are codegen integer expressions.",
    "q194_ewma_smoothing": "Per-user EWMA fold (batch twin of the "
    "q201 stream). What to check: ONE user-keyed partial/final "
    "hash agg (collect_list with map-side partials) and the entire "
    "fold — array_sort, slice, aggregate lambda — as codegen-free "
    "array expressions in the SAME projection, no window, no second "
    "exchange; per-user state bounded by that user's activity (the "
    "documented skew bound, segmented escape in q208).",
    "q195_feature_hashing": "Hashing-trick featurization. What to "
    "check: explode(tokens) is a generator over the scan, the "
    "hash/sign/bucket arithmetic is pure codegen projection, and the "
    "ONLY exchange is the (doc_id, bucket) partial/final hash agg — "
    "a single-scan, single-shuffle featurizer with no joins and no "
    "vocabulary relation anywhere.",
    "q196_negative_sampling": "Deterministic negative sampling with "
    "collision flags. What to check: the positive-pair relation is "
    "localCheckpointed and reused by both the draw and the collision "
    "probe; the k=2 fan-out and the max-partkey row enter via "
    "BroadcastExchange crossJoins (constant-size, not data-sized); "
    "the collision check is a hash join keyed on (custkey, partkey) "
    "— co-partitioned with the draw, never a cartesian.",
    "q200_calibration_curve": "Decile calibration curve. What to "
    "check: the per-user agg is partial/final; the global rank is "
    "the two-pass with_global_index pattern (RangePartitioning "
    "exchange, per-partition window, broadcast #partitions offsets) "
    "— never a single-partition window; the user count enters as a "
    "one-row broadcast and the decile agg is 10 output rows.",
    "q202_graph_modularity": "Newman modularity of the LPA "
    "communities. What to check: the community relation is computed "
    "ONCE (localCheckpoint Scan ExistingRDD) and feeds both the "
    "intra-edge join and the degree-sum branch; every join keys on a "
    "vertex id (shuffle/broadcast hash joins — no cartesian except "
    "the final crossJoins of four ONE-ROW aggregates); degree and "
    "per-community sums are partial/final hash aggs.",
    "q203_psi_drift": "PSI drift between two language slices. What "
    "to check: the token stream collapses to a (lang, bucket) "
    "partial/final hash agg with at most 2x64 rows of state — the "
    "smoothing grid is a 128-row crossJoin of constants, the "
    "right-join against it and everything downstream (totals, "
    "probability ratios, the PSI sum) runs on constant-size "
    "relations; the only data-sized work is the one token agg.",
    "q204_chisq_homogeneity": "Chi-square homogeneity margin test. "
    "What to check: the observed-count agg is the only data-sized "
    "exchange; row/column margins and the grand total are aggs OVER "
    "THAT 2xK cell relation (constant-size) entering the term "
    "computation via BroadcastExchange; the statistic is one final "
    "one-row agg — scan, one hash agg, broadcast margins, done.",
    "q208_ewma_segmented": "Segmented associative EWMA (the q194 "
    "hot-user escape, registered). What to check: TWO partial/final "
    "hash aggs — (user, chunk) then user — with every fold (per-chunk "
    "affine map, cross-chunk composition, final A·s0+B) as array "
    "expressions inside the agg projections; no window, no sort "
    "beyond array_sort of bounded per-chunk/per-user-chunk lists; no "
    "buffer ever holds more than one chunk of one user's events.",
    "q209_decontamination": "Training-side decontamination screen. "
    "What to check: one documents scan feeds tokenize→8-gram "
    "explode→distinct; the benchmark side reduces to a DISTINCT gram "
    "relation before the equi-join (no doc×doc space anywhere) and "
    "is broadcast-PINNED (a real eval suite is fixed-size), so the "
    "gram-hit join is a BroadcastHashJoin at any corpus scale; the "
    "per-doc totals/hits are partial/final hash aggs with the left "
    "join resolving clean docs to 0.",
    "q210_heavy_hitters": "Two-pass exact heavy hitters. What to "
    "check: pass 1 is ONE MapInPandas over the gram rows (the "
    "Misra-Gries summary — no shuffle before it, k entries between "
    "batches) emitting candidates PLUS per-partition totals rows, "
    "eagerly localCheckpointed; the final plan then holds exactly "
    "ONE documents scan (pass 2's exact count) — candidates enter "
    "as BroadcastHashJoin over the checkpointed ExistingRDD and the "
    "global N is sum(n_p) over the same ExistingRDD, so the corpus "
    "is tokenized exactly twice across both jobs (round-8 verdict "
    "#3: was three).",
    "q211_containment_pairs": "Asymmetric containment screen. What "
    "to check: the candidate pair space is produced ONLY by the "
    "capped-gram equi-join (df<=50 filter sits between the df agg "
    "and the self-join; localCheckpoint truncates the shared "
    "lineage); intersection counts via partial/final hash agg on "
    "the (doc_a, doc_b) pair; the integer threshold filter runs "
    "before the single rounded division.",
    "q212_viscoelastic_bonds_3d": "Kelvin–Voigt law through the 3D "
    "breaking solver. What to check: each round is ONE "
    "FlatMapCoGroupsInPandas whose two inputs hash-partition on the "
    "(bx, by, bz) block key — the 3×3×3 halo replication is a "
    "Generate(explode) + filter, not a join; the bond relation "
    "(with its ustate column) re-enters each round through the "
    "checkpointed lineage, so state survival costs no extra "
    "operator; the final plan unions the survivors' log with the "
    "per-round broken logs.",
    "q213_winnowing": "Winnowing fingerprints. What to check: ONE "
    "documents scan feeds the gram explode; the trailing-window min "
    "is a single doc_id-partitioned window (no global sort); the "
    "rightmost-min resolution is an equi-join keyed (doc_id, hash) "
    "with the ±w position band as a post-predicate — bounded "
    "fan-out, no pair space; counts/checksum are partial/final "
    "hash aggs.",
    "q214_contamination_spans": "Contamination span extension. What "
    "to check: the only pair-producing structure is the gram "
    "equi-join (bench side df-capped then broadcast); the "
    "islands pass is one (doc, bench, diagonal)-partitioned "
    "row_number window — state is a run, never a document; span "
    "stats are two stacked hash aggs.",
    "q215_tokenizer_fertility": "Tokenizer fertility stats. What to "
    "check: one scan, one partial/final hash agg keyed by lang, "
    "ratio projections after the agg — nothing else; ReadSchema "
    "holds only (lang, text).",
    "q216_mann_whitney": "Mann-Whitney U. What to check: the event "
    "scan collapses into a value-histogram hash agg BEFORE any "
    "window; the single running-sum window runs over distinct "
    "values; every statistic folds into one agg row — no per-event "
    "window, no global per-row sort.",
    "q217_kruskal_wallis": "Kruskal-Wallis H. What to check: same "
    "histogram-first shape as q216 with a second (value, type) agg "
    "joined back on value; the per-group term table is 5 rows "
    "crossJoin-broadcast with the scalar totals.",
    "q218_rrf_fusion": "Reciprocal-rank fusion. What to check: one "
    "user-keyed partial/final agg absorbs the event scan; all "
    "three row_number windows partition by event_type over the "
    "per-user relation; the top-20 filter runs before the final "
    "projection (WindowGroupLimit eligible).",
    "q219_consistent_hash": "Consistent-hash shard layout. What to "
    "check: both rings fold to single-row sorted lists entering via "
    "BroadcastNestedLoopJoin (scalar cross join); successor lookup "
    "is pure projection (array filter/min in codegen); the pt→shard "
    "maps are BroadcastHashJoins on 1k-row relations — the documents "
    "scan never shuffles.",
    "q220_langid_confusion": "Lang-id confusion + macro-F1. What to "
    "check: one documents scan through q52's marker projections, a "
    "3-row class table broadcast cross join, one partial/final hash "
    "agg to the 3-row matrix, and a single-row macro agg unioned "
    "below it.",
    "q221_token_zipf": "Zipf rank-frequency fit. What to check: the "
    "token agg is partial/final; the rank comes from "
    "with_global_index's repartitionByRange + per-partition "
    "row_number (NO single-task window); the OLS runs on one agg "
    "row of integer-quantized log sums.",
    "q223_ngram_novelty": "N-gram novelty score. What to check: the "
    "shingle relation feeds a gram-keyed min hash agg (partial/"
    "final) and one equi-join back on the gram — fan-out 1 per "
    "(doc, gram); the per-doc rollup is a second partial/final agg.",
    "q224_dup_size_histogram": "Duplicate-cluster size histogram. "
    "What to check: everything above the rollup is q56's plan "
    "(shingle equi-join + bounded label-propagation rounds); the "
    "histogram is two stacked hash aggs and a scalar "
    "crossJoin-broadcast.",
    "q225_label_centroid_cosine": "Label-centroid cosine matrix. "
    "What to check: the vector scan collapses to a (label, dim) "
    "hash agg FIRST; the pair join and norm joins run over "
    "640-row / 10-row relations (broadcast), never over vectors.",
    "q226_filter_funnel": "Quality filter funnel. What to check: "
    "one (doc, token) partial/final tf agg + a doc-keyed max, one "
    "join back to the per-doc stats, then three single-row aggs "
    "unioned — every gate is an integer cross-multiplication in "
    "codegen, no division, no window.",
    "q227_benford_digits": "Benford first-digit test. What to "
    "check: the scan collapses to a 9-row digit hash agg; the "
    "Benford grid is a 9-row range join (left) with the scalar "
    "total crossJoin-broadcast; digit extraction is integer-to-"
    "string, no log10 anywhere near the digit path.",
    "q228_ks_test": "Two-sample Kolmogorov-Smirnov. What to check: "
    "the event scan collapses to a distinct-value hash agg FIRST; "
    "the one global running-sum window runs over that histogram "
    "(range-partitionable, q216 shape); totals and the D max ride "
    "one-row BroadcastExchanges — no per-event window, no sort of "
    "the raw stream.",
    "q229_spearman": "Spearman rank correlation per language. What "
    "to check: both midrank windows partition by (lang) / (lang, "
    "value) — no global window; the five moment sums are one "
    "partial/final hash agg per language; rho is scalar arithmetic "
    "in the projection.",
    "q230_token_gini": "Token-frequency Gini per language. What to "
    "check: the token explode feeds a (lang, tok) partial/final "
    "agg, the rank window runs over the VOCABULARY relation "
    "partitioned by lang (bounded, not the token stream), and the "
    "Lorenz sums are a second per-lang hash agg.",
    "q231_repetition_runs": "Repeated-token run filter. What to "
    "check: both windows partition by doc_id(+tok) — state never "
    "leaves the document's shuffle partition; runs collapse via a "
    "(doc, tok, island) hash agg; the winner is a per-doc "
    "row_number, and the n_tok join is doc-keyed.",
    "q232_greedy_packing": "Greedy whole-document bin packing. "
    "What to check: token counting is codegen (size over the "
    "split), the only exchange is the hash partition by source "
    "feeding ONE Arrow-batched FlatMapGroupsInPandas (the "
    "sequential fold), and no window or sort appears outside the "
    "per-group fold.",
    "q233_kl_source_mix": "KL divergence per source vs corpus mix. "
    "What to check: two stacked map-side-combinable aggs build the "
    "mixes; the term join shuffles on tok over the VOCABULARY "
    "relation; n_s and N_c arrive via BroadcastExchange (20-row / "
    "one-row) — the corpus is scanned once.",
    "q234_grouped_ols": "Per-language OLS with R^2. What to check: "
    "ONE partial/final hash agg produces all six moment sums; "
    "slope/intercept/R^2 are projection arithmetic — no window, no "
    "join, no second scan.",
    "q235_source_overlap": "Source-pair vocabulary Jaccard. What "
    "to check: the corpus collapses to the distinct (source, tok) "
    "relation FIRST; the pair space comes only from the tok-keyed "
    "self-join (fan-out <= #sources per token); both size joins are "
    "BroadcastHashJoin.",
    "q236_skipgram_pmi": "Window-k skip-gram PMI. What to check: "
    "pair generation is offset-explode + (doc, position) EQUI-join "
    "(fan-out exactly k) — no doc-keyed quadratic join; the PMI "
    "joins run over the frequent-PAIR relation against vocabulary "
    "aggs, with T and N as one-row broadcasts.",
    "q237_theil_u": "Theil's U association. What to check: one "
    "groupBy builds the (lang, source) contingency table; all "
    "three c*ln(c) sums aggregate relations bounded by |L|, |S|, "
    "|L|*|S|; the final row is crossJoin-broadcast arithmetic.",
    "q238_trimmed_mean": "Trimmed + winsorized means. What to "
    "check: the rank pass is two windows partitioned by "
    "event_type (no global window); ONE agg of the kept band "
    "yields both estimators — no join-back, no second pass over "
    "the events.",
    "q239_sorted_neighborhood": "Sorted-neighborhood near-dup "
    "screen. What to check: the sort position comes from the "
    "two-pass with_global_index (no single-task window); pairing "
    "is the positional BLOCK equi-join with the explode-2-blocks "
    "trick; the verify join fans out only over candidate docs' "
    "shingles; the shingle relation materializes ONCE (checkpoint) "
    "for its three consumers — recomputing the tokenize+distinct "
    "per consumer tripled the scan at 64x.",
    "q240_welch_ttest": "Welch's t-test. What to check: ONE "
    "conditional-sum hash agg produces all six moments; t and dof "
    "are projection arithmetic on the single output row — no "
    "second scan, no window.",
    "q241_acf": "Hourly-count autocorrelation. What to check: the "
    "event scan folds to the hourly bucket agg first; the grid, "
    "centering, lag joins and den/num aggs all run over the "
    "hours-sized relation with the scalar moments broadcast.",
    "q242_markov_stationary": "Markov stationary distribution. "
    "What to check: the lead() window keys on user_id; the "
    "transition agg is map-side combinable with ≤|types|² state; "
    "the collected fold is the bounded |types|² relation (q63 "
    "precedent) — the plan shows only the matrix build.",
    "q243_cusum_changepoint": "CUSUM changepoint statistic. What "
    "to check: the event scan folds to the hourly (event_type, hr) "
    "hash agg with partial aggregation; both window functions "
    "(running sum, running min) share ONE partition-by-event_type "
    "sort over the clock-bounded grid; the per-type moments ride a "
    "BroadcastExchange back onto the grid.",
    "q244_rolling_retention": "Unbounded (rolling) retention curve. "
    "What to check: the event scan folds to ONE user_id-keyed "
    "lifetime agg (partial/final) — no events-sized join anywhere; "
    "the histogram, grid explode, and descending survival window "
    "all run on user- then clock-bounded relations; the "
    "cohort-size join is an explicit BroadcastHashJoin.",
    "q245_roc_auc": "Per-segment ROC AUC by the rank statistic. "
    "What to check: the level-compaction agg (segment, score) "
    "shrinks the relation BEFORE the window; the running "
    "neg-below window partitions by segment over compacted "
    "levels; no pair relation anywhere — the tie-corrected "
    "numerator is closed-form projection arithmetic.",
    "q246_hits": "HITS hubs & authorities. What to check: each "
    "half-step is one edges-x-scores equi-join plus a map-side-"
    "combinable hash agg; the rescale is a broadcast of the "
    "1-row max; localCheckpoint truncates lineage between rounds "
    "so the plan shows the LAST half-step, not 4 stacked rounds.",
    "q247_js_divergence": "Pairwise Jensen-Shannon divergence. "
    "What to check: the corpus scan folds to the (source, tok) "
    "hash agg; top-V is TakeOrderedAndProject (never a global "
    "sort); topv and the per-source totals ride "
    "BroadcastExchanges; the pair join runs over the |sources|×V "
    "dense matrix relation — corpus-independent size.",
    "q248_heaps_law": "Heaps' law vocabulary-growth fit. What to "
    "check: the doc rank is with_global_index's two-pass range "
    "partition (no single-task window); token first-occurrence is "
    "one map-side-combinable min-agg; the 41-row checkpoint "
    "relation rides a BroadcastExchange into the theta-join over "
    "the per-rank relation; the OLS moments fold to one row — no "
    "global prefix-sum window anywhere in the plan.",
    "q249_split_leakage": "Cross-split leakage audit. What to "
    "check: the pair space is q42's shingle equi-join (cached "
    "shingle subtree feeds counts and both join sides once); split "
    "labels are pure doc_id arithmetic in codegen — no assignment "
    "join exists; the matrix agg partial/final-folds onto <= 6 "
    "groups.",
    "q250_simpson_reversal": "Simpson's-reversal screen. What to "
    "check: one orders-customer equi-join on the natural custkey "
    "(AQE is free to broadcast the customer side); the per-segment "
    "and pooled moments are partial/final hash aggs onto "
    "|segments|+1 rows; the global flag relation is one broadcast "
    "row; localCheckpoint caps the union's plan reuse.",
    "q251_crosscorr": "Lead-lag cross-correlation. What to check: "
    "the event scan folds to the (type, hour) bucket agg; the "
    "grid, centering, and both lag-join sides run over the "
    "|types| x clock-bounded-hours relation off ONE "
    "localCheckpoint (no recompute per lag); the 13-row lag table "
    "and the per-type moment/denominator rows all ride "
    "BroadcastExchanges.",
    "q252_weighted_quantiles": "Exact weighted quantiles. What to "
    "check: the scan folds to the (type, value_cent) level "
    "compaction FIRST (partial/final hash agg); the cumulative "
    "window partitions by type over the domain-bounded level "
    "relation; totals ride a BroadcastExchange; quartile picks "
    "are conditional-min aggs — no division in the plan.",
    "q253_k_anonymity": "K-anonymity risk audit. What to check: "
    "one map-side-combinable hash agg onto the QI cell space "
    "(domain-bounded), a second onto |langs|+1 rows; the _ALL "
    "rollup reuses the per-lang relation via localCheckpoint "
    "instead of rescanning the corpus.",
    "q254_entropy_rate": "Markov chain entropy rate. What to "
    "check: the transition agg partial/final-folds onto the "
    "<= |types|^2 matrix BEFORE the localCheckpoint; the ln/"
    "entropy arithmetic and the pi join all run on that bounded "
    "relation (broadcast exchanges only); the single collect is "
    "the bounded matrix — the q63/q242 precedent.",
    "q255_fano_factor": "Fano factor / burstiness. What to check: "
    "the event scan folds to the (type, hour) bucket agg "
    "map-side; the zero-fill join and the moment agg run over "
    "the |types| x clock-bounded grid; output is |types| rows "
    "with all moments in one pass.",
    "q256_wasserstein": "Wasserstein-1 between source length "
    "distributions. What to check: the corpus folds to (source, "
    "len) counts map-side; the CDF window partitions by source "
    "over the domain-bounded level grid; the pair join keys on "
    "len with gaps/totals riding BroadcastExchanges; the term agg "
    "folds onto |sources| choose 2 rows.",
    "q257_interarrival": "Inter-arrival exponentiality screen. "
    "What to check: the lag window partitions by (user, type) — "
    "the log's natural key, no global ordering; both moment aggs "
    "are partial/final onto |types| rows; the tail pass reuses "
    "the localCheckpointed gap relation with the moment row "
    "broadcast.",
    "q160_jl_distortion": "JL ±1 projection distortion. What to "
    "check: the d×k sign expansion is a posexplode generator plus a "
    "BroadcastExchange of the 8-row direction table (the sign is "
    "computed inline in codegen — no sign matrix is ever "
    "materialized or shuffled); the projection is one (vec, "
    "direction)-keyed partial/final agg; the pair joins key on "
    "vec_id with the +250 offset applied as a projection, so both "
    "distance aggs are plain equi-joins + hash aggs.",
    "q258_source_reweighting": "Target-mix source reweighting. "
    "What to check: ONE map-side-combinable hash agg folds the "
    "corpus to |sources| rows; the (k, N) totals ride a one-row "
    "BroadcastExchange into a BroadcastNestedLoopJoin; every "
    "weight/cap/floor-div is plain projection arithmetic after "
    "the fold — no second corpus pass.",
    "q259_loo_cv_ols": "Leave-one-group-out OLS cross-validation. "
    "What to check: the six sufficient statistics fold "
    "partial/final onto |langs| rows in one agg; the global "
    "totals are a one-row BroadcastExchange; every fold's "
    "rest-of-corpus fit AND held-out MSE are projections on the "
    "broadcast join — the CV loop costs zero extra passes.",
    "q260_token_source_mi": "Token-source mutual information "
    "screen. What to check: the distinct (doc, tok) relation "
    "folds map-side to per-token df; top-k is a "
    "TakeOrderedAndProject (bounded), then rides a "
    "BroadcastExchange into the cell-count join so the second "
    "pass shuffles only k tokens' rows; the k x |sources| grid "
    "and the MI terms are broadcast-scale arithmetic.",
    "q261_unseen_mass": "Good-Turing unseen mass + Chao1 "
    "richness. What to check: the corpus folds map-side to the "
    "(source, tok) vocab relation; the counts-of-counts fold is "
    "a second partial/final hash agg keyed by source onto "
    "|sources| rows; both estimators are single projections — "
    "no window, no join, two exchanges total.",
    "q262_hellinger": "Hellinger / Bhattacharyya source-pair "
    "distance. What to check: the corpus folds to the (source, "
    "tok) relation behind one localCheckpoint that feeds both "
    "pair sides and the totals; the pair join keys on tok over "
    "the VOCABULARY (never doc pairs); per-source totals ride "
    "BroadcastExchanges; the term agg folds onto |sources| "
    "choose 2 rows.",
    "q263_vocab_coverage": "Vocabulary coverage curve. What to "
    "check: the corpus folds map-side to the vocab relation "
    "behind one localCheckpoint feeding the totals, the rank "
    "window, and the cumsum; the single-partition window is the "
    "documented q221 vocab-scale exception (vocab << corpus); "
    "the 3-row budget probe and the one-row totals ride "
    "BroadcastExchanges.",
    "q264_pca_power": "Top principal component by integer power "
    "iteration. What to check: the d^2 covariance fold is ONE "
    "MapInPandas over the scan (one exact int64 matmul per Arrow "
    "batch emitting 4096 partial cells) + a partial/final hash "
    "agg — no self-join, no per-vector d^2 codegen fan-out; every "
    "iteration round is a broadcast join + 64-row agg on the "
    "localCheckpointed cell relation; the Rayleigh/trace scalars "
    "ride one-row BroadcastExchanges.",
    "q265_fisher_ratio": "Fisher between/within scatter traces. "
    "What to check: ONE d-fan-out Generate feeds the "
    "(label, dim) partial/final agg; global means re-aggregate "
    "that bounded relation (no second corpus pass); the _ALL "
    "row composes from the per-label localCheckpoint — the "
    "corpus is scanned exactly once.",
    "q266_anisotropy": "Embedding anisotropy via the sum-vector "
    "identity. What to check: NO pair join anywhere in the plan "
    "— the per-row norm is an in-row HOF fold, unit components "
    "fold map-side onto the (label, dim) relation, and the _ALL "
    "row re-aggregates the same localCheckpointed relation.",
    "q267_participation_ratio": "Participation ratio (effective "
    "dimensionality). What to check: same MapInPandas batch-matmul "
    "covariance fold as q264 (d^2 cells, constant agg state); "
    "both traces are one more agg over the 4096-cell relation; "
    "output is a single row with no extra exchange.",
    "q268_theil_sen": "Theil-Sen robust trend. What to check: the "
    "event scan folds map-side onto the zero-filled hourly grid "
    "BEFORE any pairing; the pair join is grid x grid per type "
    "(clock-bounded, never event x event); both median picks are "
    "rank windows partitioned by type over the bounded pair/grid "
    "relations; the chosen slope rides a BroadcastExchange into "
    "the residual pass.",
    "q269_seasonality": "Hour-of-day seasonality ANOVA. What to "
    "check: the scan folds map-side onto the (type, day, hod) "
    "calendar grid; the per-hod and per-type moment aggs run on "
    "bounded relations off one localCheckpoint; eta^2 is pure "
    "int64 cross-multiplication — no float until the final "
    "quantized division; output is |types| x 24 rows.",
    "q270_js_shrinkage": "James-Stein shrinkage of per-source "
    "means. What to check: ONE map-side-combinable agg folds the "
    "corpus to |sources| rows of int64 moments off a "
    "localCheckpoint; the one-row global fold (incl. the "
    "milli-quantized swb sum) rides a BroadcastExchange; every "
    "weight and posterior mean is projection arithmetic — no "
    "second corpus pass.",
    "q271_capture_recapture": "Capture-recapture corpus-size "
    "estimate. What to check: one hash agg folds presence flags "
    "per md5 fingerprint (map-side combinable), one more agg to "
    "a single row; both estimators are projections — two "
    "exchanges total, output one row.",
    "q272_weighted_topk_sample": "Exact-k weighted sample "
    "(Gumbel top-k). What to check: tokenize + md5 key are pure "
    "projections on the scan; the ONLY exchange hash-partitions "
    "by source for the rank window (never a global sort); the "
    "filter keeps k rows per source.",
    "q273_laplacian_lambda": "Laplacian spectral radius by "
    "integer power iteration. What to check: each round is one "
    "edges-x-state equi-join + partial/final hash agg (the "
    "q133/q193 iteration shape) behind a localCheckpoint; the "
    "matvec and Rayleigh sums are exact int64 — no quantization "
    "node anywhere; the max-rescale scalar rides a one-row "
    "BroadcastExchange.",
    "q274_join_skew_profile": "Join-key skew profiler. What to "
    "check: one map-side-combinable fold onto the key relation "
    "behind a localCheckpoint; the p99 and top-k rank windows "
    "run over that bounded relation (q221 vocab-scale "
    "discipline); the summary scalars ride one-row "
    "BroadcastExchanges.",
    "q275_mmr_selection": "MMR diverse top-k. What to check: "
    "every cosine pass is a BROADCAST join (centroid or the one "
    "new pick) + partial/final hash agg — the vector relation is "
    "never shuffled on a pair key; each argmax is a "
    "TakeOrderedAndProject; the k-pick loop is fixed-depth with "
    "lazy localCheckpoints truncating lineage.",
    "q276_brier_decomposition": "Brier score Murphy "
    "decomposition. What to check: one user-keyed partial/final "
    "agg, one fold onto <= 21 forecast bins behind a "
    "localCheckpoint; the raw Brier sum is integer codegen (no "
    "float until the final projection); output one row.",
    "q277_mcnemar": "McNemar paired lang-id test. What to "
    "check: ONE document scan computes all six in-row HOF marker "
    "counts and both argmax guesses in codegen; the 2x2 cells "
    "fold in one partial/final agg to a single row — no join, "
    "no window, no second scan.",
    "q278_cochran_q": "Cochran's Q over three paired lang-id "
    "rules. What to check: ONE document scan computes all nine "
    "in-row HOF marker counts and the three argmax guesses in "
    "codegen; the success totals fold in one partial/final agg "
    "to a single row — no join, no window, no second scan.",
    "q279_cohen_kappa": "Cohen's kappa between two lang-id "
    "rules. What to check: same one-scan shape as q278 — the "
    "3x3 contingency marginals are conditional sums inside ONE "
    "partial/final agg; kappa is arithmetic on the single "
    "folded row.",
    "q280_gtest_keyness": "G-test (Dunning log-likelihood) "
    "keyness top-20. What to check: one tokenize scan feeds a "
    "vocab-bounded partial/final hash agg; the corpus totals "
    "arrive as a one-row broadcast (BroadcastNestedLoopJoin of "
    "a scalar); top-20 is TakeOrderedAndProject, never a global "
    "sort.",
    "q281_bh_fdr": "Benjamini-Hochberg FDR over per-source "
    "chi-square drift tests. What to check: the document scan "
    "folds map-side onto |sources| rows BEFORE the rank window; "
    "the single-partition window and the kmax fold both run on "
    "that bounded relation; totals ride a one-row broadcast.",
    "q282_mantel_haenszel": "Mantel-Haenszel pooled OR + CMH "
    "chi-square. What to check: ONE scan folds map-side onto "
    "|sources| 2x2 cells; per-stratum quantized terms sum in a "
    "second bounded agg to a single row — no join, no window.",
    "q283_cramers_v": "Cramer's V association matrix. What to "
    "check: one scan folds to the lang x source x lenb cube; "
    "the three pairwise tables, their marginal windows, and the "
    "chi-square aggs all run on that bounded cube — documents "
    "is scanned exactly once.",
    "q284_neyman_sample": "Neyman-allocation stratified sampler. "
    "What to check: pass 1 folds to |sources| moment rows; pass "
    "2's rank window is per-stratum (partitioned, never global) "
    "and the allocation joins back as a BroadcastHashJoin.",
    "q285_burrows_delta": "Burrows' Delta stylometry. What to "
    "check: one tokenize scan to the (source, token) counts; "
    "the top-30 marker pick is a TakeOrdered on the vocab "
    "rollup; grid/z/pairwise stages are joins on broadcast-size "
    "relations — never a document-level pair join.",
    "q286_irls_logistic": "Two-step IRLS logistic fit. What to "
    "check: three scans (two Newton steps + LL), each folding "
    "map-side to ONE row of int64 sums; the weight relation "
    "enters each scan as a one-row broadcast (BNLJ of a scalar); "
    "per-row sigmoid/Hessian contributions stay in codegen.",
    "q287_isotonic_calibration": "PAV isotonic calibration via "
    "the minimax closed form. What to check: the only "
    "corpus-sized work is the user-keyed agg; the bin relation "
    "is localCheckpointed at <=21 rows and the triangle "
    "interval join + min/max aggs all run on that bounded "
    "relation as broadcast joins.",
    "q288_holt_segmented": "Segmented associative Holt smoothing "
    "(q208's escape with a 2x2-matrix state). What to check: "
    "same shape as q208 — per-(user, chunk) hash agg folds the "
    "sorted event maps, per-user agg composes the bounded "
    "chunk-map list; no window, no per-user global sort, state "
    "bounded by one chunk of one user.",
    "q289_degree_assortativity": "Newman degree assortativity. "
    "What to check: degree agg + two equi-joins on the "
    "checkpointed edge relation; the five moments fold in ONE "
    "partial/final agg to a single row — both edge orientations "
    "are analytic (no 2E-row union).",
    "q291_mann_kendall": "Mann-Kendall trend test. What to "
    "check: the pair join is keyed by event_type over the "
    "CLOCK-BOUNDED hourly grid (the q268 shape); S, the tie "
    "terms, and n fold in grouped aggs on that grid; z is one "
    "row-level expression on the joined bounded relation.",
    "q292_softening_bonds_3d": "Bilinear softening law through "
    "the 3D breaking solver. What to check: identical plan "
    "shape to q212 (one FlatMapCoGroupsInPandas per round, "
    "3x3x3 halo via Generate+filter, ustate riding the "
    "checkpointed bond relation) — only the in-kernel law "
    "changes, which is the point of the force_law hook.",
    "q293_lsh_blocking_recall": "LSH blocking recall eval. What "
    "to check: the truth pair space comes ONLY from the "
    "shared-shingle equi-join, the candidate space ONLY from "
    "the band-bucket equi-join — no quadratic stage anywhere; "
    "the three counts fold to one row via scalar aggs on "
    "checkpointed bounded relations.",
    "q294_kwic_concordance": "Keyword-in-context concordance. "
    "What to check: ONE tokenize scan; posexplode retains the "
    "token array so context slices are in-row codegen "
    "(slice + array_join) — no self-join back to documents, no "
    "shuffle before the presentation sort.",
    "q295_heldout_perplexity": "Held-out bigram perplexity. "
    "What to check: train bigram/unigram tables are "
    "vocab-bounded hash aggs; test bigrams re-assemble via the "
    "(doc, pos) offset equi-join; scoring joins broadcast the "
    "vocab-sized LM tables; per-source fold is one "
    "partial/final agg.",
    "q296_sq8_distortion": "SQ8 quantization distortion eval. "
    "What to check: one posexplode pass; the 64-row per-dim "
    "stats relation joins back as a BroadcastHashJoin; the "
    "error chain is pure codegen, no UDF; per-vector fold is a "
    "partial/final hash agg.",
    "q297_time_decayed_features": "Wall-clock time-decay "
    "features. What to check: one events scan; the reference "
    "instant enters as a one-row broadcast (BNLJ of a scalar); "
    "per-event exp stays in codegen; the user-keyed agg is "
    "map-side combinable — no window, no state.",
    "q298_woe_iv": "WoE / information value screen. What to "
    "check: the rank comes from the two-pass global index "
    "(range partition + per-partition row_number + broadcast "
    "offsets — NO single-partition window); the bin fold and "
    "everything after run on 10 rows.",
    "q299_clustering_coefficient": "Local clustering "
    "coefficient. What to check: triangle enumeration is two "
    "equi-joins on the checkpointed src<dst edge relation "
    "(adjacency fan-out, no all-pairs); corner credit is three "
    "unions into one hash agg; cc is row-level arithmetic on "
    "the degree left-join.",
    "q300_conformal_coverage": "Split-conformal coverage. What "
    "to check: the only corpus-sized work is the user-keyed "
    "agg; the order statistic runs as a cumulative window on "
    "the <=42-row bounded nonconformity distribution; q_hat "
    "and the totals ride one-row broadcasts.",
    "q301_trailing_distinct_users": "Trailing 7-day distinct "
    "users. What to check: dedup agg on (day, user), a "
    "sequence-explode of exactly 7, a second dedup + count per "
    "day — no per-day rescan, no window; the zero-fill grid is "
    "a clock-bounded explode.",
    "q302_fisher_separability": "Per-dim Fisher/ANOVA-F "
    "separability. What to check: one posexplode pass; both "
    "aggs ((dim,label) then (dim)) are partial/final hash aggs; "
    "F is row-level arithmetic on 64 rows.",
    "q303_hard_example_mining": "Hard-example mining with the "
    "q286 fit. What to check: the weight relation enters the "
    "scoring scan as a one-row broadcast; per-doc loss stays in "
    "codegen; the top-5 rank is a source-partitioned window, "
    "never a global sort.",
    "q304_dq_audit": "Data-quality rule audit. What to check: "
    "five independent map-side folds unioned; the FK check is a "
    "BroadcastHashJoin LeftAnti on the key; no sort until the "
    "5-row presentation ORDER BY.",
    "q305_ivf_mrr": "IVF MRR eval. What to check: the exact "
    "baseline is the broadcast-matmul mapInPandas restricted to "
    "the 32-probe sample; the IVF side is the q96/q113 "
    "cell-cogrouped search; the final fold is one agg on the "
    "probe-sized relation.",
    "q306_sprt": "Wald SPRT walk. What to check: one events "
    "scan; the running sum and row_number share ONE "
    "event_type-partitioned window spec (single sort); the "
    "crossing detection is a filter + min agg, the attach is an "
    "equi-join on (type, rn).",
    "q307_gains_table": "Gains/lift deciles. What to check: the "
    "weight relation broadcasts into the scoring scan; the rank "
    "is the two-pass global index (range partition, NO "
    "single-partition window over documents); the cumulative "
    "windows run on the 10-row decile relation.",
    "q308_join_size_sketch": "CM join-size estimate. What to "
    "check: each side folds map-side to a <=3x8192-cell sketch "
    "(union of 3 hash projections into ONE hash agg); the "
    "estimate join is sketch-sized; the exact baseline is the "
    "key-grouped equi-join, used for scoring only.",
    "q309_langid_macro_f1": "Per-source macro-F1. What to "
    "check: ONE scan with the in-row HOF scoring; the class "
    "cross join is a 3-row broadcast; both aggs fold map-side "
    "onto |sources|-bounded relations.",
    "q310_skew_adaptive_agg": "Profiler-driven adaptive salting. "
    "What to check: the ~2.7% profile pass folds map-side onto the "
    "sampled key relation and collects ONE row; the captured plan "
    "is the branch the profile chose (salted on this corpus) — two "
    "HashAggregate pairs, (user_id, salt) partials then the per-key "
    "merge, no exchange beyond the two stage shuffles.",
    "q311_join_adaptive_strategy": "Profiler-driven adaptive join "
    "strategy (q310's driver-side plan selection on the join side). "
    "What to check: the captured plan is the branch the two-stat "
    "profile chose — at sf0.1 the build estimate (~150k orders) "
    "clears the 50k broadcast bar and the probe profiles ~2.7x "
    "skewed, so expect the SALTED shape: build side exploded 8x, "
    "SortMergeJoin on (user_id, salt) with no BroadcastExchange, "
    "then one HashAggregate pair on event_type. The profile itself "
    "ran eagerly at build time (eager=True) and is not in the plan.",
    "q312_url_canonicalize": "URL canonicalization + host rollup. "
    "What to check: the whole 15-step canonicalization chain is "
    "per-row Project expressions inside ONE WholeStageCodegen span "
    "over the scan (no UDF, no shuffle before the host agg); the "
    "rollup is a HASH aggregate — the sample-URL slot aggregates "
    "the 60-bit url hash (long buffer) precisely so min(STRING) "
    "does not demote it to SortAggregate, and the sample join is a "
    "broadcast of the tiny host relation; count(DISTINCT "
    "canon_url) expands to the standard two-level aggregate.",
    "q313_record_linkage": "Fellegi-Sunter blocked linkage self-join. "
    "What to check: the join key is the (nation, band) BLOCK (equi), "
    "the a_k < b_k dedup is a post-condition; agreement vectors and "
    "weights are Project arithmetic on the pair rows; the rollup is "
    "a tiny hash agg on <= 24 patterns — AQE is free to split a hot "
    "block exactly like the proximity join's grid cells.",
    "q314_kaplan_meier": "Kaplan-Meier survival. What to check: the "
    "signup/error reductions are user-keyed partial-then-final hash "
    "aggs; the horizon max is a one-row broadcast; both cumulative "
    "windows run AFTER the per-day rollup, so the single-partition "
    "WindowExec is bounded by horizon days, not events.",
    "q315_diff_in_differences": "DiD estimator. What to check: ONE "
    "scan with the event_type filter pushed, one map-side-combinable "
    "hash agg onto the 4-cell key, then a single-row final agg — no "
    "join, no window, no second scan.",
    "q316_dsir_importance": "DSIR importance resampling. What to "
    "check: the target flag join and the 64-row bucket-weight table "
    "are both BroadcastHashJoin; per-doc scoring is a partial hash "
    "agg over the exploded tokens; the top-100 is TakeOrderedAndProject "
    "(per-partition heaps), never a global Sort.",
    "q317_lsh_param_tuning": "LSH (b, r) parameter tuning. What to "
    "check: the pair space comes only from the cached shingle "
    "equi-join (InMemoryTableScan feeds the three q42-skeleton "
    "branches); the histogram folds to <= 20 rows before the 5-row "
    "grid broadcast-crossjoin; the decision window sorts 5 rows.",
    "q318_span_corruption_plan": "Span-corruption mask planning. "
    "What to check: every WindowExec is PARTITIONED BY doc_id (the "
    "candidate rank, the island flag, the island id) — no global "
    "window; the candidate explode is bounded by doc length; the "
    "final accounting join is doc_id-keyed.",
    "q319_host_quota_cap": "Per-host quota cap. What to check: the "
    "q312 canonicalization chain is Project expressions on the "
    "scan; the rank window partitions by host (giant-host escape "
    "documented: with_group_rank); the admission rollup is one "
    "hash agg on the host key.",
    "q320_kneser_ney_bigram": "Kneser-Ney bigram scoring. What to "
    "check: all four model tables derive from the ONE bigram hash "
    "agg; the scoring joins are equi-joins on pre-aggregated "
    "counts (fan-out 1 per probe row); the distinct-bigram total "
    "is a one-row BroadcastExchange; per-bigram quantization keeps "
    "the doc agg integer.",
    "q321_adaptive_histogram": "Adaptive histogram binning. What to "
    "check: the quartile pass is the two-pass global index (range "
    "partition, per-partition counts, broadcast offsets — no "
    "single-partition WindowExec on the data); the decision row is "
    "a one-row broadcast into the binning scan; the final agg folds "
    "map-side onto <= k groups.",
    "q322_budget_waterfill": "Budget waterfill allocation. What to "
    "check: one hash agg to the source grain BEFORE any window; the "
    "rank/cumsum window runs over |sources| rows; the budget is a "
    "one-row broadcast. No per-document window anywhere.",
    "q323_source_ablation_ppl": "Leave-one-source-out LM ablation. "
    "What to check: the four model tables are hash aggs over the ONE "
    "train-pairs relation; heldout scoring joins are fan-out-1 on "
    "pre-aggregated counts; the ablation join fans out by c1s "
    "matches only (bounded by |sources| per bigram) — NO per-source "
    "re-scan of the corpus anywhere in the plan.",
    "q324_obrien_fleming": "Group-sequential monitoring. What to "
    "check: ONE slice-bucketed scan joined to the 5-row broadcast "
    "look table builds all cumulative moments — never K re-scans of "
    "the fact stream; the stopping window sorts 5 rows.",
    "q325_cuped": "CUPED variance reduction. What to check: one "
    "user-keyed hash agg builds pre/post; the moment row and theta "
    "are broadcasts; the adjusted-mean pass is the only second scan "
    "of the per-user relation (map-side-combinable).",
    "q326_power_planning": "Power planning. What to check: one "
    "filtered scan folding map-side to a single moment row; the "
    "whole formula is scalar Project arithmetic.",
    "q327_blocklist_filter": "Blocklist suffix filtering (r13 host-"
    "grain replan per the r12 verdict). What to check: the document "
    "relation is touched by exactly ONE hash agg (doc grain -> host "
    "grain) and the denylist's BroadcastNestedLoopJoin runs against "
    "the <=|hosts| ROLLUP, not the doc stream; the r12 plan's "
    "data-proportional F.broadcast(hit-on-doc_id) is gone — no "
    "doc-keyed join anywhere; the post-join re-fold is a hash agg "
    "on <=|hosts|+|matches| rows.",
    "q328_gazetteer_tagging": "Gazetteer phrase tagging. What to "
    "check: both dictionary tables are BroadcastHashJoins against "
    "the token/bigram relations (never a per-row dictionary loop); "
    "the entity rollup's count(DISTINCT doc_id) expands to the "
    "two-level agg.",
    "q329_join_order_adaptive": "Adaptive join ordering. What to "
    "check: the captured plan is the ORDER the profile chose (at "
    "sf0.1 the filtered-lineitem estimate exceeds the orders-x-"
    "customer intermediate, so expect customer-first: orders joins "
    "customer before lineitem); the stats job ran eagerly at build "
    "time (eager=True) and is not in the plan.",
    "q330_suffix_repeats": "Suffix-array ExactSubstr (exact maximal "
    "repeats). What to check: ONE window exchange hash-partitioned "
    "on the (head, k2) bucket key (the distributed suffix sort — "
    "never an unpartitioned global sort; k2 is the r14 hot-head "
    "auto-widen: second token for heads over the 100k threshold, "
    "constant sentinel otherwise); the hot set is a partial/final "
    "HashAggregate on head feeding a BroadcastExchange (detecting "
    "the skew never recreates it); suffix generation is a generator "
    "expression inside the projection (no Python); the LCP "
    "arithmetic is all codegen'd array expressions; the per-doc "
    "fold is a partial/final HashAggregate. No doc x doc pair "
    "space anywhere in the plan.",
    "q331_crosslingual_neardup": "Cross-lingual near-dup (hashed "
    "lexicon + MinHash-LSH). What to check: concept hashing is "
    "stateless projection; signatures are one HashAggregate on "
    "doc_id; the en x non-en candidate join is an EQUI-join on "
    "(band, bv) — the pair space is band-bucketed, never |xx| x "
    "|en|; the per-doc best-match window partitions on doc_xx.",
    "q333_cluster_split": "Cluster-aware train/dev/test split. What "
    "to check: components are the q56 large-star/small-star loop "
    "(iterative, behind localCheckpoint scans); split assignment is a "
    "stateless md5 projection — NO extra shuffle between components "
    "and the rollup beyond the (split, source) agg; the leak audit is "
    "one hash agg on cluster_id feeding a 1-row BroadcastExchange.",
    "q332_quality_calibration": "Quality-classifier calibration "
    "(reliability + ECE/Brier). What to check: one doc-grain "
    "projection (features, algebraic sigmoid — no exp/ln anywhere "
    "in the plan, rational ops only) feeding one partial/final "
    "HashAggregate onto <=10 bins; the ECE/Brier fold and the "
    "final cross join run on the 10-row bin relation "
    "(BroadcastExchange of a 1-row agg).",
    "q336_lexicon_crosslingual_neardup": "Cross-lingual near-dup, "
    "learned-lexicon form. What to check: the ONLY difference from "
    "q331's plan is upstream — the 145-row lexicon dim enters via "
    "BroadcastExchange into a BroadcastHashJoin on (word, lang) "
    "replacing q331's md5 concept projection; signature agg, band "
    "explode, en x non-en equi-join and the doc_xx rank window are "
    "the same factored tail.",
    "q337_disjointness_keyjoin": "Key-level disjointness (q28's 100 TB "
    "form). What to check: NO collect_set anywhere — the plan is "
    "distinct (hash agg) -> self equi-join on ck -> partial/final "
    "HashAggregate on (pri_a, pri_b); per-row aggregation state is "
    "a counter, and no aggregate buffer holds an array.",
    "q338_gopher_repetition": "Gopher repetition filters. What to "
    "check: two independent two-level HashAggregate chains (keyed "
    "(doc_id, gram) then doc_id) — no collect_list of grams, no "
    "window; gram generation is a codegen'd generator expression; "
    "the final left joins run on doc-grain relations. The token "
    "relation is deliberately RECOMPUTED per consumer, not "
    "checkpointed: the 256x doubling measured the materialized "
    "token-array form super-linear (SCALE.md payload corollary).",
    "q339_chunk_dedup": "Chunk-level first-occurrence dedup (C4 line "
    "dedup). What to check: chunks leave the projection as 8-byte "
    "hashes (no chunk text crosses a shuffle) and the chunk "
    "relation is lazily checkpointed (2 consumers, no covering "
    "exchange); first-occurrence is one partial/final HashAggregate "
    "(min fkey per hash) feeding an equi-join back on hv; per-doc "
    "fold is a hash agg; no windows. The first-occurrence key is the "
    "GUARDED long composite (raise_error outside 2^42 doc / 2^20 "
    "chunk domain) — a min(struct) form was rejected because struct "
    "agg buffers demote this, the operator's one big shuffle, to "
    "SortAggregate.",
    "q340_simhash_hamming_pairs": "SimHash Hamming-ball banded join "
    "(Manku block-permute). What to check: the fingerprint build is "
    "ONE partial/final HashAggregate on doc_id carrying 60 long "
    "vote buffers (no per-bit row explosion — q45's explode-j form "
    "is the oracle-parity variant, not this plan); blocks explode "
    "4 structs/doc; candidates come from a (block, value) equi-join "
    "+ distinct; the verify is a codegen'd bit_count(xor) filter "
    "after two equi-joins back to fingerprints.",
    "q341_exact_span_removal": "Exact repeated-span removal (composed "
    "from q330). What to check: identical prefix to q330's plan "
    "(hashed suffix explode, hot-head broadcast, (head, k2) window) "
    "— the composition adds ONLY a lcp>=T filter, one per-doc "
    "running-max window over the flagged positions (a vanishing "
    "fraction of the suffix relation), and two hash aggs; no new "
    "shuffle on the suffix relation itself.",
    # q343_simhash_dup_clusters is deliberately NOT captured here: its
    # registered fn runs the component loop eagerly and the final
    # DataFrame is a checkpoint scan. Its plan story is exactly
    # q340_simhash_hamming_pairs (captured above) feeding the
    # q56_dup_clusters propagation round (captured in ROUND_CASES).
    "q345_image_phash_dup_classes": "Image dHash dup classes (real "
    "decode). What to check: ONE ArrowEvalPython/mapInPandas span "
    "for encode+decode+hash (no per-row Python), then a single "
    "partial/final HashAggregate on the 8-byte fingerprint — the "
    "class relation is the only shuffle; no pair space anywhere.",
    "q344_curation_manifest": "Per-doc curation manifest (q342's "
    "label relation written out). What to check: identical to "
    "q342's plan MINUS the funnel rollup — the stage joins collapse "
    "into one doc-grain CASE; the stages dim enters as a broadcast "
    "of a 9-row literal for the rule-name join.",
    "q342_curation_pipeline": "End-to-end curation pipeline (9-stage "
    "funnel). What to check: ONE doc-grain labeling pass — the "
    "stage relations join back by doc_id and the first-drop CASE "
    "collapses them; the blocklist verdict is host-grain (broadcast "
    "NL of the literal list against <=|hosts| rows, never a "
    "data-proportional broadcast); windows partition by host/source "
    "(q319's top-k shape); chunk + gram relations carry 8-byte "
    "hashes; the final funnel is a <=10-row rollup crossed with the "
    "9-row stages literal.",
}

# Iterative operators: the registered query's final DataFrame sits behind
# a lineage-truncating localCheckpoint, so the interesting plan is the
# PER-ROUND body the loop repeats. These builders construct one round
# lazily on representative inputs.


def _q56_round(spark, sf):
    from pyspark.sql import functions as F

    from columnarmodeling_spark.operators.graph import propagation_round

    edges = spark.range(1000).select(
        F.col("id").alias("src"), ((F.col("id") * 7) % 1000).alias("dst")
    )
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).selectExpr("src as u", "dst as v").distinct()
    labels = spark.range(1000).select(
        F.col("id"), F.col("id").alias("component")
    )
    return propagation_round(und, labels)


def _q64_round(spark, sf):
    from pyspark.sql import functions as F

    from columnarmodeling_spark.simulation.solver import blocked_round

    ids = spark.range(10_000)
    state = ids.select(
        "id",
        (F.col("id") % 100).cast("double").alias("x"),
        F.floor(F.col("id") / 100).cast("double").alias("y"),
        F.lit(0.0).alias("vx"),
        F.lit(0.0).alias("vy"),
        F.lit(1.0).alias("m"),
    )
    bonds = ids.filter((F.col("id") + 1) % 100 != 0).select(
        F.col("id").alias("src"),
        (F.col("id") + 1).alias("dst"),
        F.lit(0.95).alias("rest"),
    )
    return blocked_round(state, bonds, 1.0, 0.001, 50, 130.0, 55.0)


def _q85_stream(spark, sf):
    """The pre-drain streaming plan of q85 (the registered fn executes
    the drain, so the interesting plan is the stream-stream join it
    starts)."""
    from pyspark.sql import functions as F

    from columnarmodeling_spark.streaming.sources import events_stream

    a = events_stream(spark, sf).select(
        F.col("user_id").alias("a_user"),
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
    ).withWatermark("a_ts", "1 hour")
    b = events_stream(spark, sf).select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
    ).withWatermark("b_ts", "1 hour")
    return a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 30 MINUTES")),
    )


def _q90_cells(spark, sf):
    from pyspark.sql import functions as F

    from columnarmodeling_spark.geometry.voronoi import (
        adaptive_tile,
        voronoi_cells,
    )

    seeds = spark.range(10_000).select(
        F.col("id"),
        (F.pmod(F.col("id") * 37.49, F.lit(198.0)) + 1.0).alias("x"),
        (F.pmod(F.col("id") * 61.03, F.lit(198.0)) + 1.0).alias("y"),
    )
    return voronoi_cells(seeds, 200.0, 200.0, adaptive_tile(200.0, 200.0, 10_000))


def _q107_round(spark, sf):
    from pyspark.sql import functions as F

    from columnarmodeling_spark.simulation.solver import (
        run_solver_blocked_breaking,
    )

    ids = spark.range(10_000)
    state = ids.select(
        "id",
        (F.col("id") % 100).cast("double").alias("x"),
        F.floor(F.col("id") / 100).cast("double").alias("y"),
        F.lit(0.0).alias("vx"),
        F.lit(0.0).alias("vy"),
        F.lit(1.0).alias("m"),
    )
    bonds = ids.filter((F.col("id") + 1) % 100 != 0).select(
        F.col("id").alias("src"),
        (F.col("id") + 1).alias("dst"),
        F.lit(0.95).alias("rest"),
    )
    _, log = run_solver_blocked_breaking(
        state, bonds, n_steps=50, strain_limit=0.1, fuse=50, block=130.0,
        reach=1.1,
    )
    return log


def _q112_bonds(spark, sf):
    from pyspark.sql import functions as F

    from columnarmodeling_spark.operators.proximity import grid_proximity_join
    from columnarmodeling_spark.simulation.solver import weibull_strengths

    pts = spark.range(10_000).select(
        "id",
        (F.col("id") % 100).cast("double").alias("x"),
        F.floor(F.col("id") / 100).cast("double").alias("y"),
    )
    bonds = grid_proximity_join(pts, eps=1.5, id_col="id").select(
        "src", "dst", F.col("dist").alias("rest")
    )
    return weibull_strengths(bonds, m=3.0, sigma0=0.12, salt="plans")


def _q131_round(spark, sf):
    """One BPE-training round body: the pair-count + argmax the loop
    repeats (the registered fn collect()s each round's winner, so the
    interesting plan is this lazy per-round shape)."""
    from pyspark.sql import functions as F

    seq = spark.range(10_000).select(
        F.concat(
            F.lit("|"),
            F.regexp_replace(
                F.conv((F.col("id") % 997).cast("string"), 10, 36), "(.)", "$1|"
            ),
        ).alias("seq")
    )
    pairs = seq.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(filter(split(seq, '\\\\|'),"
                " x -> x <> '')) - 1), i -> struct("
                "get(filter(split(seq, '\\\\|'), x -> x <> ''), i - 1) AS a,"
                " get(filter(split(seq, '\\\\|'), x -> x <> ''), i) AS b))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    return (
        pairs.filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "a", "b")
        .limit(1)
    )


def _q133_round(spark, sf):
    """One integer-PageRank iteration body (the registered fn
    localCheckpoints each round, so the repeated shape is what scales)."""
    from pyspark.sql import functions as F

    edges = spark.range(10_000).select(
        F.col("id").alias("src"), ((F.col("id") * 7) % 10_000).alias("dst")
    )
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("degree")
    )
    pr = deg.select("id", F.lit(1_000_000).cast("long").alias("pr"))
    src_deg = deg.select(
        F.col("id").alias("src"), F.col("degree").alias("src_deg")
    )
    shares = (
        und.join(pr.withColumnRenamed("id", "src"), "src")
        .join(src_deg, "src")
        .select(
            F.col("dst").alias("id"),
            F.expr("div(pr, src_deg)").alias("share"),
        )
    )
    return shares.groupBy("id").agg(
        (F.lit(150000) + F.expr("div(850000 * sum(share), 1000000)")).alias(
            "pr"
        )
    )


def _q137_round(spark, sf):
    """One BFS min-plus relaxation round (the registered fn
    localCheckpoints each round, so the repeated shape is what scales)."""
    from pyspark.sql import functions as F

    edges = spark.range(10_000).select(
        F.col("id").alias("src"), ((F.col("id") * 7) % 10_000).alias("dst")
    )
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    dist = und.select(F.col("src").alias("id")).distinct().select(
        "id",
        F.when(F.col("id") % 50 == 0, F.lit(0))
        .otherwise(F.lit(999_999))
        .cast("long")
        .alias("d"),
    )
    relaxed = (
        und.join(dist.withColumnRenamed("id", "src"), "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min(F.col("d") + 1).alias("nd"))
    )
    return dist.join(relaxed, "id", "left").select(
        "id",
        F.least(F.col("d"), F.coalesce(F.col("nd"), F.lit(999_999))).alias(
            "d"
        ),
    )


def _q141_round(spark, sf):
    """One k-core peel round (degree filter + survivor-survivor edge
    retention — the repeated shape)."""
    from pyspark.sql import functions as F

    edges = spark.range(10_000).select(
        F.col("id").alias("src"), ((F.col("id") * 7) % 10_000).alias("dst")
    )
    e = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    keep = (
        e.groupBy("src")
        .agg(F.count("*").alias("deg"))
        .filter(F.col("deg") >= 3)
        .select(F.col("src").alias("id"))
    )
    return e.join(
        keep.withColumnRenamed("id", "src"), "src", "left_semi"
    ).join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")


def _q143_round(spark, sf):
    """One Lloyd round: broadcast-join assignment + centroid means on
    the LONG (vec_id, pos, v) relations."""
    from pyspark.sql import functions as F

    lv = spark.range(64_000).select(
        (F.col("id") % 1000).alias("vec_id"),
        (F.col("id") / 1000).cast("int").alias("pos"),
        ((F.col("id") * 37) % 2000).alias("v"),
    )
    cent = spark.range(512).select(
        (F.col("id") % 8 + 1).alias("cl"),
        (F.col("id") / 8).cast("int").alias("pos"),
        ((F.col("id") * 91) % 2000).alias("cv"),
    )
    a = (
        lv.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "cl")
        .agg(
            F.sum(
                (F.col("v") - F.col("cv")) * (F.col("v") - F.col("cv"))
            ).alias("d2")
        )
    )
    # packed-long argmin, mirroring the shipped q143 (struct buffers
    # would demote the assign step to SortAggregate)
    b = (
        a.groupBy("vec_id")
        .agg(F.min(F.col("d2") * 1024 + F.col("cl")).alias("p"))
        .select("vec_id", (F.col("p") % 1024).alias("cl"))
    )
    return b.join(lv, "vec_id").groupBy("cl", "pos").agg(
        F.expr("div(sum(v), count(*))").alias("cv")
    )


def _q201_stream(spark, sf):
    """The pre-drain stateful plan of q201 (the registered fn drains
    to memory and post-aggregates; the interesting plan is the
    applyInPandasWithState stage it starts)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from columnarmodeling_spark.streaming.sources import events_stream

    ev = events_stream(spark, sf).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        "value",
    )

    def fold(key, pdfs, state: GroupState):
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [0], "ewma": [0.0]})

    return ev.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType="user_id long, n_events long, ewma double",
        stateStructType="s double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _q206_stream(spark, sf):
    """The pre-drain stateful plan of q206 (late-robust transitions)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from columnarmodeling_spark.queries.streaming import (
        _transitions_late_fold,
    )
    from columnarmodeling_spark.streaming.sources import events_stream

    ev = events_stream(spark, sf).select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _transitions_late_fold,
        outputStructType="from_type string, to_type string, c long",
        stateStructType="us long, eid long, tp string, late long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _q207_stream(spark, sf):
    """The pre-drain stateful plan of q207 (late-robust EWMA)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from columnarmodeling_spark.queries.streaming import _ewma_late_fold
    from columnarmodeling_spark.streaming.sources import events_stream

    ev = events_stream(spark, sf).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        "value",
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _ewma_late_fold,
        outputStructType=(
            "user_id long, n_events long, ewma double, n_late long"
        ),
        stateStructType="s double, n long, us long, eid long, late long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _q334_stream(spark, sf):
    """The pre-drain plan of q334 (streaming near-dup gate)."""
    from pyspark.sql import functions as F

    from columnarmodeling_spark.functions.text import tokens
    from columnarmodeling_spark.queries._util import t
    from columnarmodeling_spark.queries.streaming import (
        _SNG_N,
        _band_rows,
        _spark_row_sig,
    )
    from columnarmodeling_spark.streaming.sources import documents_stream

    idx = (
        t(spark, sf, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .withColumn("tk", tokens("text"))
        .filter(F.size("tk") >= _SNG_N)
    )
    ib = _band_rows(_spark_row_sig(idx), "cand")
    doc = (
        documents_stream(spark, sf)
        .filter(F.col("doc_id") % 10 != 0)
        .withColumn("tk", tokens("text"))
        .filter(F.size("tk") >= _SNG_N)
    )
    sb = _band_rows(_spark_row_sig(doc), "doc_id")
    return (
        sb.join(F.broadcast(ib), ["band", "bv"])
        .groupBy("doc_id", "cand")
        .agg(F.count(F.lit(1)).cast("long").alias("n_band_hits"))
    )


def _q335_stream(spark, sf):
    """The pre-drain plan of q335 (sharded-index streaming gate)."""
    from pyspark.sql import functions as F

    from columnarmodeling_spark.functions.text import tokens
    from columnarmodeling_spark.queries._util import t
    from columnarmodeling_spark.queries.streaming import (
        _GATE_SHARDS,
        _SNG_N,
        _band_rows,
        _spark_row_sig,
    )
    from columnarmodeling_spark.streaming.sources import documents_stream

    shard = F.pmod(F.xxhash64("bv"), F.lit(_GATE_SHARDS)).alias("shard")
    idx = (
        t(spark, sf, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .withColumn("tk", tokens("text"))
        .filter(F.size("tk") >= _SNG_N)
    )
    ib = _band_rows(_spark_row_sig(idx), "cand").select("*", shard)
    doc = (
        documents_stream(spark, sf)
        .filter(F.col("doc_id") % 10 != 0)
        .withColumn("tk", tokens("text"))
        .filter(F.size("tk") >= _SNG_N)
    )
    sb = _band_rows(_spark_row_sig(doc), "doc_id").select("*", shard)
    return (
        sb.join(ib.hint("shuffle_hash"), ["shard", "band", "bv"])
        .groupBy("doc_id", "cand")
        .agg(F.count(F.lit(1)).cast("long").alias("n_band_hits"))
    )


def _q222_stream(spark, sf):
    """The pre-drain plan of q222 (streaming decontamination)."""
    from pyspark.sql import functions as F

    from columnarmodeling_spark.functions.text import tokens, word_shingles
    from columnarmodeling_spark.queries._util import t
    from columnarmodeling_spark.streaming.sources import documents_stream

    bench = (
        t(spark, sf, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .withColumn("tk", tokens("text"))
        .select(F.explode(word_shingles("tk", 8)).alias("gr"))
        .distinct()
    )
    doc = (
        documents_stream(spark, sf)
        .filter(F.col("doc_id") % 10 != 0)
        .withColumn("tk", tokens("text"))
        .select(
            "doc_id",
            F.explode(F.array_distinct(word_shingles("tk", 8))).alias(
                "gr"
            ),
        )
    )
    return doc.join(F.broadcast(bench), "gr").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit_grams")
    )


def _q290_stream(spark, sf):
    """The pre-drain stateful plan of q290 (streaming MG heavy hitters)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from columnarmodeling_spark.functions.text import tokens
    from columnarmodeling_spark.streaming.sources import documents_stream

    sharded = (
        documents_stream(spark, sf)
        .select(F.explode(tokens("text")).alias("tok"))
        .withColumn(
            "shard", F.pmod(F.xxhash64("tok"), F.lit(8)).cast("long")
        )
    )

    def mg(key, pdfs, state: GroupState):
        yield pd.DataFrame({"shard": [], "tok": []})

    return sharded.groupBy("shard").applyInPandasWithState(
        mg,
        outputStructType="shard long, tok string",
        stateStructType="toks array<string>, cnts array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ROUND_CASES = {
    "q290_stream_heavy_hitters (pre-drain stateful plan)": (
        "Streaming Misra-Gries heavy hitters (queries/streaming.py "
        "q290). What to check: tokenize + explode + shard hash are "
        "STATELESS stream projections; the only stateful operator is "
        "FlatMapGroupsInPandasWithState keyed by the 8-way shard "
        "(constant state: K counters per shard); no stream-side "
        "shuffle beyond the shard hash partition.",
        _q290_stream,
    ),
    "q334_stream_neardup_gate (pre-drain plan)": (
        "Streaming near-dup gate (queries/streaming.py q334). What to "
        "check: the MinHash signature is a PER-ROW array expression — "
        "no grouping, no shuffle anywhere on the stream side before "
        "the stateful agg (tokenize, shingle, per-row min, band "
        "explode are all stateless projections); the index band table "
        "enters via BroadcastExchange; the only stateful operator is "
        "the (doc_id, cand)-keyed update-mode StateStoreSave agg.",
        _q334_stream,
    ),
    "q335_stream_neardup_gate_sharded (pre-drain plan)": (
        "Sharded-index streaming near-dup gate (queries/streaming.py "
        "q335 — q334's huge-index escape). What to check: NO "
        "BroadcastExchange on the index side — the join is a "
        "ShuffledHashJoin (or SortMergeJoin) on (shard, band, bv), "
        "the static index build re-partitions per micro-batch and "
        "each task holds ONE shard's hash map (memory = index/16); "
        "the stream side's only shuffle is that join partitioning; "
        "the stateful op is still the (doc_id, cand) update-mode agg.",
        _q335_stream,
    ),
    "q222_stream_decontamination (pre-drain plan)": (
        "Streaming decontamination screen (queries/streaming.py q222). "
        "What to check: every op upstream of the join is a STATELESS "
        "stream projection (tokenize, shingle, array_distinct, "
        "explode); the benchmark gram set enters via BroadcastExchange "
        "(stream-static join, re-broadcast per micro-batch); the only "
        "stateful operator is the doc_id-keyed update-mode "
        "StateStoreSave agg — state one long per flagged doc.",
        _q222_stream,
    ),
    "q207_stream_ewma_late (pre-drain stateful plan)": (
        "Late-data-robust streaming EWMA (queries/streaming.py q207). "
        "What to check: the SAME single user_id-keyed "
        "FlatMapGroupsInPandasWithState exchange as q201 — the "
        "high-water-mark state widens the per-user state tuple from "
        "(s, n) to (s, n, us, eid, late), which is three extra scalars "
        "in the state store and ZERO extra operators or shuffles; late "
        "handling is kernel logic, invisible to the plan. The "
        "post-drain max-struct resolution agg is a batch plan over the "
        "tiny memory sink.",
        _q207_stream,
    ),
    "q206_stream_transitions_late (pre-drain stateful plan)": (
        "Late-data-robust streaming transitions (queries/streaming.py "
        "q206). What to check: same single user_id-keyed "
        "FlatMapGroupsInPandasWithState exchange as q166 — the "
        "high-water-mark state adds two longs per user, NO extra "
        "operator; late handling is kernel logic, invisible to the "
        "plan. q207's plan differs only in the fold schema; the "
        "post-drain resolution aggs are batch plans over the tiny "
        "memory sink.",
        _q206_stream,
    ),
    "q201_stream_ewma (pre-drain stateful plan)": (
        "Cross-batch stateful streaming EWMA (queries/streaming.py "
        "q201_stream_ewma). What to check: ONE exchange hash-partitions "
        "on user_id into FlatMapGroupsWithStateInPandas — state is two "
        "scalars per user in the keyed state store, no history re-read, "
        "no second shuffle; the post-drain final-state resolution "
        "(max-n struct agg) is a batch plan over the tiny memory sink. "
        "Exactness contract: bit-identical to q194's batch fold only "
        "under the single-micro-batch drain (see "
        "streaming/sources.events_stream docstring).",
        _q201_stream,
    ),
    "q141_kcore_peel (one peel round)": (
        "Bounded k-core peel loop body (queries/proximity.py "
        "q141_kcore_peel). What to check: one partial/final degree "
        "hash agg, then two left_semi hash joins keyed on the "
        "endpoint ids — the same key across rounds, so the exchange "
        "is reusable; no broadcast of the edge set, all-integer.",
        _q141_round,
    ),
    "q143_kmeans_lloyd (one assign + centroid round)": (
        "Integer Lloyd k-means loop body (queries/llm_similarity.py "
        "q143_kmeans_lloyd). What to check: the centroid relation "
        "(k x 64 rows) enters via BroadcastExchange into the "
        "assignment join on pos; both aggs are partial/final hash "
        "aggs; per-round cost is corpus x k with no corpus² term "
        "anywhere, and the min(struct) argmin avoids a per-vector "
        "window sort.",
        _q143_round,
    ),
    "q137_bfs_hops (one min-plus relaxation round)": (
        "Multi-source BFS loop body (queries/proximity.py "
        "q137_bfs_hops). What to check: per round, ONE edge×distance "
        "equi-join on src + ONE partial/final min hash agg on dst; "
        "the distance update is a left join back on the id key; "
        "integer arithmetic end-to-end in whole-stage codegen, and "
        "localCheckpoint keeps this plan identical across the fixed "
        "3-round hop budget.",
        _q137_round,
    ),
    "q131_bpe_train (one pair-count + argmax round)": (
        "Distributed BPE training loop body (queries/llm_text.py "
        "q131_bpe_train). What to check: the pair count is a "
        "partial/final hash agg whose state is the pair alphabet "
        "(bounded by vocabulary², tiny vs the corpus), and the argmax "
        "is a TakeOrderedAndProject — per-partition top-1, never a "
        "global Sort; the merge application between rounds is a pure "
        "map-side replace() projection (no shuffle), and "
        "localCheckpoint truncates the replace chain so round R's "
        "plan never contains rounds 1..R-1.",
        _q131_round,
    ),
    "q133_pagerank (one integer-PageRank iteration)": (
        "Iterative link-analysis loop body (queries/proximity.py "
        "q133_pagerank). What to check: one equi-join of the "
        "undirected edge list against the rank + degree relations "
        "(both keyed on src — AQE may broadcast the rank side at "
        "small graphs; at scale it's a shuffle hash join "
        "co-partitioned across rounds) feeding ONE partial/final "
        "hash agg on dst; all arithmetic is integer micro-units "
        "inside whole-stage codegen, and localCheckpoint keeps the "
        "per-round plan constant — rounds are a fixed 3, so the "
        "driver loop never grows with the graph.",
        _q133_round,
    ),
    "q112_weibull_breaks (bond-strength derivation feeding the breaking solver)": (
        "Weibull per-bond strength heterogeneity (simulation/solver.py "
        "weibull_strengths; reference Webull.dat:1). The solver round "
        "itself is the q107 plan — what is NEW here is the strength "
        "column. What to check: the draw is a pure projection on top of "
        "the binned proximity join (md5-prefix uniform of (src, dst, "
        "salt) through the Weibull inverse CDF, all JVM expressions "
        "inside whole-stage codegen) — NO extra shuffle, NO Python, no "
        "rand() (task-retry-unstable) anywhere; determinism is what "
        "lets the DuckDB oracle replay the identical arithmetic.",
        _q112_bonds,
    ),
    "q85_stream_stream_join (pre-drain streaming plan)": (
        "Watermark-bounded stream-stream interval self-join (SURVEY §2.8). "
        "What to check: the join keys carry the user equi-condition (state "
        "hash-partitions on user), both sides declare a 1-hour watermark "
        "(the state store evicts - finite at 100 TB/day), and the 30-minute "
        "bound appears as a join condition, NOT as a cartesian post-filter. "
        "Round-4 regression note: this plan was always right - the red "
        "bench number came from the stream source decoding micros "
        "timestamps as nanos, which collapsed every user's month into "
        "43 minutes of join state (streaming/sources.py now probes the "
        "batch schema).",
        _q85_stream,
    ),
    "q90 cell-build kernel (the tile+halo exchange inside voronoi_cells_verified)": (
        "Distributed bounded-Voronoi cell construction (geometry/"
        "voronoi.py). This captures the BUILD kernel; production q90 runs "
        "it via voronoi_cells_verified, which adds an eager checkpoint, a "
        "suspects.isEmpty() probe on the emitted per-cell exactness "
        "certificate, and - only when a cell fails it - a bounded "
        "tile-ring repair join (explode + equi-join + applyInPandas; see "
        "SCALE.md geometry section for its measured cost). What to check "
        "here: ONE exchange - seeds explode to their home tile + 8 halo "
        "replicas, then a single hash-partition on the tile key feeds "
        "FlatMapGroupsInPandas; per-tile bisector work is O(#home x "
        "#halo), never global O(n^2). The tile is density-derived "
        "(adaptive_tile: ~3x cell pitch from one count()), so tile count "
        "grows linearly with seed count.",
        _q90_cells,
    ),
    "q107_bond_breaks (one breaking-solver round, fuse=50)": (
        "Strain-threshold breaking variant of the block solver "
        "(simulation/solver.py run_solver_blocked_breaking). What to "
        "check: the same single FlatMapCoGroupsInPandas as the elastic "
        "round (50 sub-steps per shuffle), plus exactly one extra "
        "left_anti hash join per round - the loud-drop guard re-unioning "
        "over-stretched bonds into the log; the bond log union is "
        "checkpoint-truncated so lineage stays O(1) per round.",
        _q107_round,
    ),
    "q56_dup_clusters (one propagation round)": (
        "Connected-components loop body (operators/graph.py "
        "propagation_round; heaviest non-streaming headliner with q64). "
        "What to check: ONE exchange pair per round — the edge→label "
        "equi-join feeds a partial/final min hash-agg, and the label "
        "update joins back on the already-partitioned id key; rounds = "
        "cluster diameter, each round this same shape re-executes on "
        "checkpointed inputs.",
        _q56_round,
    ),
    "q64_solver_steps (one blocked round, fuse=50)": (
        "Halo-exchange block solver round (simulation/solver.py "
        "blocked_round). What to check: the physics runs in ONE "
        "FlatMapCoGroupsInPandas whose two inputs hash-partition on the "
        "block key (bx, by) — 50 whole Euler steps execute inside that "
        "single operator per shuffle round, which is why throughput is "
        "~3.7M particle-steps/s instead of the per-step loop's 0.05M "
        "(tools/solver_bench.py).",
        _q64_round,
    ),
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")

    out = io.StringIO()
    out.write("# PLANS — captured physical plans for the flagship operators\n\n")
    out.write("Generated by `python tools/make_plans.py` at sf0.1, `local[8]`, AQE on.\n")
    out.write("Each section states the scale property the plan must exhibit, then the\n")
    out.write("`explain('formatted')` output proving it.\n")
    for name, blurb in CASES.items():
        out.write(f"\n## {name}\n\n{blurb}\n\n```\n")
        df = REGISTRY[name].fn(spark, sf)
        with contextlib.redirect_stdout(out):
            df.explain("formatted")
        out.write("```\n")
    for name, (blurb, builder) in ROUND_CASES.items():
        out.write(f"\n## {name}\n\n{blurb}\n\n```\n")
        df = builder(spark, sf)
        with contextlib.redirect_stdout(out):
            df.explain("formatted")
        out.write("```\n")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as fh:
        fh.write(out.getvalue())


if __name__ == "__main__":
    main()
