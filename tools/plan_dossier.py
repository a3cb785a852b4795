"""Generate docs/PLANS.md: the formatted physical plan of each headline
query plus the scale argument for why that plan survives a 1000-executor
/ 100 TB deployment.

The dossier is *generated* (not hand-written) so the plans shown are
always the plans that actually run. Re-run after any operator change:

    python tools/plan_dossier.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "PLANS.md")

# name -> the scale argument a reviewer should check against the plan
COMMENTARY: dict[str, str] = {
    "bfl_and_or": (
        "BFL compiles to native Column expressions: the whole predicate "
        "appears in `PushedFilters` on the Parquet scan and the stage is "
        "one `WholeStageCodegen` span. Map-only — zero shuffles at any "
        "scale; executors scan only row groups whose min/max stats can "
        "match."
    ),
    "bfl_json_num_cmp": (
        "`json()` extraction runs on Spark 4 Variant (`try_parse_json` + "
        "`try_variant_get`) — JVM-side, no Python. The scan prunes to the "
        "two referenced columns (`ReadSchema`). Map-only; the JSON parse "
        "cost is per-row but embarrassingly parallel."
    ),
    "redact_typed_fast": (
        "Schema-static redact paths compile to `withField` struct "
        "rewrites — a pure projection inside `WholeStageCodegen`, no "
        "Python stage anywhere in the plan (contrast with the row-backend "
        "fallback reserved for dynamic/`..`/encoded paths)."
    ),
    "agg_pricing_summary": (
        "Classic partial-aggregation shape: `HashAggregate(partial)` "
        "before the exchange, final after — the shuffle carries one row "
        "per (partition × group), not per input row. Filter is in "
        "`PushedFilters`; only the five referenced columns are read."
    ),
    "join_top_revenue": (
        "The dimension side is wrapped in `broadcast()`: a "
        "`BroadcastHashJoin` with the orders fact table never shuffling "
        "for the join — only the final aggregation exchanges, keyed and "
        "partial-aggregated."
    ),
    "sessionize_gap": (
        "Gap sessionization = lag + running sum over one window: exactly "
        "one `Exchange hashpartitioning(user_id)`, sort within "
        "partitions. State never leaves the executor; skewed users would "
        "be salted (the streaming twin bounds state with watermarks)."
    ),
    "join_asof_clicks": (
        "As-of join via union + running max: ONE hash shuffle on "
        "user_id replaces a per-row backward probe (the reference "
        "pattern) or an exploding range join. Both event classes arrive "
        "filter-pushed from the scan."
    ),
    "ts_gap_fill_hourly": (
        "The dense calendar and key set derive from the cached per-hour "
        "aggregate (`InMemoryTableScan` nodes) — the fact table is "
        "scanned once regardless of size; the calendar join sides are "
        "broadcast (tiny by construction: hours × keys)."
    ),
    "pivot_segment_status": (
        "Pivot with declared values: no distinct-discovery job. "
        "Broadcast dim join + the standard two-phase pivot — the second "
        "exchange carries only already-aggregated (segment × status) "
        "rows."
    ),
    "dedup_ngram_jaccard": (
        "Exact Jaccard near-dup via PPJoin: candidate join keyed on "
        "rare-prefix 64-bit shingle hashes (no `CartesianProduct` / "
        "`BroadcastNestedLoopJoin` anywhere). Three keyed shuffles "
        "(document frequency, candidate join, verify) — each bounded by "
        "Σ df² over *prefix* occurrences, the published scale bound."
    ),
    "dedup_minhash_lsh": (
        "MinHash-LSH: banding join keyed on (band, hash); signatures "
        "come from one Arrow-vectorized pandas_udf pass (64 hashes per "
        "doc in numpy, not 64 Catalyst expressions). Join fan-out is "
        "bucket-bounded; no all-pairs comparison exists in the plan."
    ),
    "ann_topk": (
        "Brute-force cosine baseline: the deliberate "
        "`BroadcastNestedLoopJoin` broadcasts the *query* side (rows of "
        "constants); the corpus is scanned exactly once. The LSH/IVF "
        "variants replace the nested loop with (table, bucket)-keyed "
        "joins for the 100 TB path."
    ),
    "dedup_exact": (
        "Exact dedup = hash-groupBy on content hash: partial "
        "aggregation before the single keyed shuffle; the shuffle "
        "carries (hash, min_id, count), never document text."
    ),
    "pipeline_curate": (
        "The composed curation funnel (quality → exact dedup → "
        "near-dup removal) stays ONE plan: the n_chars/token gates "
        "appear in `PushedFilters` on the documents scan even though "
        "they were written three operators upstream — documents that "
        "fail quality never tokenize, hash, or shingle. All joins are "
        "keyed (semi/anti/shingle); no nested-loop anywhere."
    ),
    "pipeline_pack": (
        "Sequence packing = running sum over (source, doc_id order): "
        "exactly one `Exchange hashpartitioning(source)`. Packing is "
        "per-source by design, so there is no global-order bottleneck."
    ),
    "join_salted_skew": (
        "Skew-salted big-big join: the join key is (orderkey, salt), so "
        "a catastrophically hot key's rows spread over B reducers "
        "instead of one; the un-broadcastable smaller side is "
        "replicated B× via `explode` (a projection, not a shuffle). "
        "The salt derives from a data column — deterministic, "
        "oracle-verified identical to the plain join. AQE skew-split "
        "handles moderate skew; this is the declarative form for the "
        "extreme case."
    ),
    "pipeline_shards": (
        "Shard export manifest: the 16-way assignment is a map-only "
        "md5-nibble expression evaluated in the scan stage — no "
        "shuffle to assign, append-stable by construction. The "
        "manifest aggregation shuffles 16 groups of partial "
        "(count/sum/min/max) state; the `count(DISTINCT source)` adds "
        "the standard Expand + second keyed exchange, both "
        "group-bounded."
    ),
    "sample_mixture": (
        "Mixture sampling: the fact scan is map-only (md5 + string "
        "compare); the only aggregation is source-cardinality-sized "
        "counts joined back via `BroadcastHashJoin` — the corpus never "
        "shuffles. Rates clamp at 1 and selection is content-stable, "
        "so re-runs and other engines reproduce the sample exactly."
    ),
    "pipeline_release": (
        "The full dataset-release funnel (curate → mixture-sample → "
        "shard manifest) as ONE lazy plan: quality gates appear in "
        "`PushedFilters` on the documents scan, mixture thresholds "
        "derive from curated per-source counts broadcast back, and the "
        "shard aggregation carries 16 groups of partial state. The "
        "DuckDB oracle replays the entire funnel — the composed result, "
        "not just each stage, is hash-verified."
    ),
    "text_bm25_topk": (
        "BM25 ranking: the token explode is filtered to the query terms "
        "**before** the tf aggregate, so the only corpus-sized shuffle "
        "carries (doc_id, term) pairs for matching terms only; the "
        "|Q|-row idf table is a `BroadcastHashJoin` build side; the "
        "final top-k is `TakeOrderedAndProject` (per-partition heaps), "
        "never a global sort. Scores are rounded before ranking so the "
        "DuckDB oracle agrees on rank order."
    ),
    "pipeline_epoch_order": (
        "Reproducible epoch shuffle: the seeded hash and the shard "
        "nibble are map-only scan-stage expressions; the single "
        "`Exchange hashpartitioning(shard)` feeds a per-shard sort of "
        "corpus/16 rows each — no global sort, no RNG, no driver state."
    ),
    "text_unigram_surprisal": (
        "Unigram surprisal: the vocabulary aggregate and the per-doc "
        "average are both partial-agg shuffles keyed fine-grained "
        "(token / doc_id); the token-probability join broadcasts when "
        "the vocabulary fits (AQE decides) and the top-k is a "
        "TakeOrdered. No Python anywhere."
    ),
    "embed_clusters": (
        "Sample-fit / full-assign k-means: centroids are trained on a "
        "bounded lowest-id sample driver-side (no per-iteration Spark "
        "jobs), then ONE Arrow-batched argmin pass assigns the corpus "
        "with the k×dim matrix broadcast — a map-only plan, zero "
        "shuffles over the embedding table at any corpus size."
    ),
    "dedup_semantic": (
        "SemDeDup: the quadratic cosine comparison is confined to one "
        "cluster per `FlatMapGroupsInPandas` task (one shuffle keyed on "
        "the cluster id). Cluster sizes are bounded by choosing k ∝ N, "
        "which caps per-task memory/work — the published algorithm's "
        "own scaling argument as a grouped-pandas stage."
    ),
    "dedup_spans": (
        "Duplicated-substring spans without a suffix array: positional "
        "rolling-hash grams are scan-stage JVM expressions; the gram "
        "count is a partial-aggregated `Exchange` over 8-byte longs "
        "(boilerplate grams skew a count, never a pair join); the hits "
        "probe is a keyed left-semi join (broadcast at this SF, SMJ via "
        "AQE beyond); the interval merge is one doc_id-keyed window "
        "whose state is bounded by document length. No cartesian "
        "stage, no Python."
    ),
    "text_chunks": (
        "Overlapping chunking is the degenerate ideal: ONE `Generate` "
        "(posexplode of the per-row start list) inside the scan stage — "
        "zero shuffles, zero Python, output streamed straight to the "
        "sink at any corpus size."
    ),
    "sample_source_cap": (
        "Domain cap: map-only content hash + a single "
        "`Exchange hashpartitioning(source)` feeding one window rank — "
        "per-task sort bounded by the source's own rows. The committed "
        "two-phase twin (`sample_source_cap_twophase`) bounds window "
        "state at O(margin x cap) for mega-domains and is pinned "
        "bit-identical in pytest."
    ),
    "knn_pagerank": (
        "PageRank composed over the LSH-bucketed k-NN edge list: each "
        "iteration is two keyed shuffles (edges x ranks join, dst "
        "aggregate) over a ~k x N edge table; per-round "
        "`localCheckpoint` keeps the logical plan constant-size and "
        "the only driver traffic is one dangling-mass scalar per "
        "round."
    ),
    "search_hybrid_rrf": (
        "Hybrid BM25+dense retrieval: the ONLY corpus-sized shuffle is "
        "the (doc, term) tf aggregate pre-filtered by a broadcast "
        "semi-join to the <=80 query terms; idf / corpus stats / query "
        "vectors all ride `BroadcastExchange` (the "
        "`BroadcastNestedLoopJoin`s are 1-row stats and n_queries-row "
        "sides, never corpus x corpus), the dense side is one "
        "broadcast scan, and both rank lists are depth-bounded per "
        "query before the full-outer RRF fusion touches them. Zero "
        "Python stages."
    ),
    "pipeline_novelty_curve": (
        "Marginal gram coverage: one (source, gram64) distinct "
        "shuffle over the corpus, then a per-gram min-source "
        "aggregate and two |S|-row joins — no pairwise anything, so "
        "the plan is a fixed three-shuffle pipeline at any corpus "
        "size."
    ),
    "pipeline_source_overlap": (
        "Pairwise source Jaccard via the gram-keyed postings "
        "self-join (never document-pairwise): a gram held by h "
        "sources emits h(h-1)/2 pair rows, and the `max_holders` "
        "df-cap (documented crawl-scale mode) bounds that fanout; "
        "per-source sizes ride a broadcast into the final |S|^2-row "
        "projection."
    ),
    "sample_dsir_select": (
        "DSIR importance selection: ONE (token, is_target) "
        "conditional-count aggregate builds both unigram LMs in a "
        "single vocabulary-sized shuffle; the log-ratio table joins "
        "back onto the token stream (explicit broadcast in the "
        "hashed-bucket scale mode, where the model is a fixed 2^B "
        "rows regardless of vocabulary) and scoring is one doc-keyed "
        "partial agg feeding a TakeOrdered — never a global sort. "
        "Zero Python stages."
    ),
    "dedup_cluster_density": (
        "Triangle counting on the near-dup graph via degree-ordered "
        "orientation (Schank-Wagner): every oriented out-neighborhood "
        "is O(sqrt(m)), bounding the wedge join's fan-out where the "
        "unoriented join would square hub degrees; wedges come from a "
        "plain C(deg,2) aggregate, and nothing touches document text "
        "after the verified PPJoin pair stage."
    ),
    "events_rfm_segments": (
        "RFM rollup: one user-keyed partial-agg shuffle; the three "
        "ntiles window the one-row-per-user table, not the event "
        "stream — at billions of users substitute the "
        "equi_depth_histogram two-pass rank (bucket math is "
        "rank-only)."
    ),
    "events_seasonality": (
        "168-cell activity grid: map-only integer dow/hod derivation "
        "(no calendar functions), one 168-key partial agg, and the "
        "expected-count scalar rides a 1-row broadcast — zero driver "
        "actions."
    ),
    "sample_weighted_draw": (
        "Exact-size weighted draw (exponential clocks): one map-only "
        "scan derives the per-row race key (hash + log, no shuffle), "
        "then a TakeOrdered top-k gathers k rows via per-partition "
        "heaps — at any corpus size the data movement is exactly k "
        "rows."
    ),
    "sample_leakage_safe_splits": (
        "Cluster-keyed split assignment: the near-dup stage is the "
        "verified PPJoin + min-label propagation plan (gram-keyed, "
        "never all-pairs); the clustered subset (small by "
        "construction) left-joins back onto the corpus — AQE "
        "broadcasts it — and the split label is one map-side md5 "
        "CASE on the cluster key. Swap duplicate_clusters_lsh into "
        "the pair stage at crawl scale; the assignment side is "
        "unchanged."
    ),
    "sample_temperature_mixture": (
        "Alpha-tempered mixture weights: one map-only token-count "
        "scan, one |S|-row source aggregate, and the normalizing "
        "constants ride a 1-row `BroadcastExchange` back onto the "
        "|S| rows — zero driver actions, zero corpus-sized shuffles "
        "beyond the source rollup's partial agg."
    ),
    "sample_token_budget": (
        "Global-budget greedy selection: the running token total is "
        "the distributed two-pass prefix sum (range partitions -> "
        "per-range local windows keyed on `spark_partition_id` -> "
        "P-row offset window), so the only `SinglePartition` exchange "
        "in the plan holds one row per task — the whole-corpus "
        "single-partition cumsum that kills the naive window never "
        "exists. Offsets ride a broadcast back onto the ranges."
    ),
    "text_lexical_diversity": (
        "Lexical diagnostics: two partial-agg shuffles over the "
        "corpus — (source, token) and (source, bigram), the bigrams "
        "built map-side from the token array with no self-join and "
        "no window over the stream. TTR and distinct-n fold out of "
        "those tables by source; the Zipf least-squares fit windows "
        "only the top-100 rows per source of the vocabulary-sized "
        "unigram table."
    ),
    "dedup_clusters_distributed": (
        "The FORCED distributed clustering path (driver_max_edges=0): "
        "min-label propagation rounds over the PPJoin edge list, one "
        "doc_id-keyed shuffle per round with per-round "
        "`localCheckpoint` lineage truncation — the 100-TB plan the "
        "default entry's <=2M-edge driver union-find fast path skips. "
        "NOTE on the fingerprint: the checkpoint truncates lineage, so "
        "the returned frame's initial plan shows only the final "
        "exchange — the per-round cost is what bench.py measures "
        "end-to-end (VERDICT r7 #5), and the pair-stage plan is "
        "dedup_ngram_jaccard's, fingerprinted separately."
    ),
    "sample_source_cap_twophase": (
        "Mega-domain cap: a count-derived hash threshold pre-filters "
        "each source to ~margin*cap expected survivors MAP-ONLY "
        "(counts ride a broadcast), the rank window then sorts "
        "O(margin*cap) rows per source instead of O(|source|), and "
        "the rare under-fill re-ranks just the shortfall sources "
        "(probability ~exp(-margin)). All keys are a non-null "
        "surrogate so NULL-source docs survive the equi-joins — the "
        "round-8 docs-fuzz catch."
    ),
    "text_dup_sentences": (
        "C4-style sentence-level dedup signal: the sentence split is a "
        "JVM-side split/transform/filter chain (no Python, no "
        "lookbehind so the DuckDB twin is RE2-safe), the global "
        "occurrence count is ONE sentence-keyed window shuffle, and "
        "the per-doc rollup is a doc-keyed partial agg. At crawl "
        "scale fold the shuffle key to xxhash64 — 8-byte keys instead "
        "of sentence strings."
    ),
    "text_scrub_sentences": (
        "Keep-first sentence scrub (the C4 ACTION): survivor choice "
        "is one row_number over the case-folded sentence key ordered "
        "by (doc_id, sent_idx) — a single keyed shuffle whose per-key "
        "state is that key's occurrence count; singletons stream "
        "through. No joins, no driver actions."
    ),
    "events_markov_transitions": (
        "Markov chain MLE: ONE user-keyed window shuffle (the lead) "
        "produces adjacent pairs, then a (from, to)-keyed partial agg "
        "over at most |event_types|^2 rows; the per-from totals ride a "
        "broadcast back. Nothing corpus-sized survives the first "
        "aggregate — the transition matrix costs one shuffle at any "
        "corpus size."
    ),
    "sample_kcenter_coreset": (
        "Greedy k-center: k map-only passes over one cached "
        "(vec_id, embedding, dmin) table — each round folds the single "
        "new center (a broadcast literal) into dmin and takes a "
        "TakeOrdered(1) argmax, so k rows total reach the driver and "
        "no pairwise stage exists. Per-round localCheckpoint keeps the "
        "plan constant (the returned frame is the k-row selection "
        "itself, hence the empty fingerprint)."
    ),
    "join_bucketed_colocated": (
        "Co-located big-big join: both sides written "
        "bucketBy(orderkey)+sorted, so the SortMergeJoin reads bucket "
        "files directly — NO Exchange below the join (the plan gate in "
        "test_scale_patterns_ops.py); the only shuffle left is the "
        "final |status|-row aggregation. Pre-shuffle once at ingest, "
        "join shuffle-free forever — the 100-TB fact/fact layout next "
        "to AQE skew-split and explicit salting."
    ),
    "dedup_operating_curve": (
        "Threshold tuning curve from ONE PPJoin pass at t_min: every "
        "pair above any grid point is above t_min, so the curve is "
        "|grid| conditional aggregates over the cached verified pair "
        "list — never |grid| pair-generation passes. The returned "
        "frame is the 6-row curve itself (hence the empty "
        "fingerprint); the pair stage's plan is dedup_ngram_jaccard's."
    ),
    "dedup_clusters_lsh": (
        "MinHash-LSH banding: the candidate generator is a (band, "
        "band-hash) bucket self-join — shuffle volume is one signature "
        "row per (doc, band), never all-pairs — and every candidate is "
        "exact-Jaccard verified before clustering, so banding recall "
        "only prunes, never corrupts. Hot buckets are the skew risk at "
        "crawl scale; the TUNING.md cap note applies. The clustering "
        "tail is the same min-label propagation as the exact twins."
    ),
    "agg_heavy_hitters_verified": (
        "The approx_top_k sketch aggregates map-side (fixed-size "
        "state, one shuffle of sketch blocks); the audit joins the "
        "tiny per-type top-k back to the exact (type, user) rollup "
        "with the boundary row BROADCAST — the exact rollup is one "
        "keyed shuffle, everything after is bounded by k x |types|."
    ),
    "privacy_k_anonymity": (
        "One full-scan rollup to the level-1 quasi-identifier groups "
        "(bounded: |types| x 24 x |bands|), pinned via localCheckpoint "
        "so the level-2/level-3 re-aggregations and the ladder "
        "decision never re-scan events; the decision table is "
        "BROADCAST back onto the rows (plan shows 3 BroadcastHashJoin, "
        "0 SortMergeJoin). Events is read exactly twice at any scale: "
        "rollup build + row release."
    ),
    "privacy_l_diversity": (
        "Same ladder as privacy_k_anonymity but the release predicate "
        "needs DISTINCT users, which cannot re-aggregate from row "
        "counts — so the pinned base rollup is (QI, user)-grained; "
        "level-2/3 first re-aggregate to their (QI, user) grain, then "
        "count users. Still one full-data shuffle + broadcast "
        "decision; the rollup is bounded by distinct (QI, user) "
        "combos, orders of magnitude under row count."
    ),
    "pipeline_loso_ablation": (
        "All leave-one-source-out stats derive from ONE (source, "
        "lang) rollup (pinned via localCheckpoint — documents is "
        "tokenized exactly once); totals, language totals, and the "
        "killed-language audit are re-aggregations of that bounded "
        "rollup, broadcast-joined at the end. No per-source rescan — "
        "the naive formulation is |sources| passes, this is 1."
    ),
    "agg_quantiles_verified": (
        "The GK sketch aggregates in one mergeable pass; the rank "
        "audit broadcasts the per-type sketch row back onto events "
        "and re-aggregates — two scans total, no full-data shuffle "
        "beyond the two groupBys. The violation counters make the "
        "sketch CONTRACT (rank within n/accuracy) the driver-checked "
        "invariant, valid at any scale where the values drift."
    ),
    "agg_hll_verified": (
        "HLL++ estimate and exact distinct in the SAME single groupBy "
        "— both aggregates merge map-side, one shuffle. At 100 TB the "
        "exact half is the expensive one (its partial state is the "
        "distinct (type, user) set); the entry exists to certify the "
        "sketch's error envelope so the cheap half can be trusted "
        "alone, which is exactly how it would be deployed."
    ),
    "knn_graph_exact": (
        "The brute-force baseline, quadratic BY DESIGN: each unordered "
        "pair scored once (i<j cross join, mirrored), one node-keyed "
        "window for top-k. The plan to run on small N (centroids, "
        "query batches, per-cluster refinement) and the driver-verified "
        "ground truth for knn_graph's SRP-LSH recall — at corpus scale "
        "the bucketed knn_graph is the path."
    ),
    "profile_drift_events": (
        "Two release profiles = two aggregate scans with the same "
        "group keys; the drift join is per-column rows (bounded by "
        "schema width x |types|), broadcast. No full-data join."
    ),
    "embedding_drift_releases": (
        "Per-dimension mean/std via posexplode + one groupBy(dim) per "
        "release — shuffle volume is dim x partials, not vectors; the "
        "drift compare is a dim-row broadcast join."
    ),
    "ann_index_persisted": (
        "The lifecycle entry: build -> persist (Parquet codebooks + "
        "coded vectors) -> load -> serve, then a full-outer parity "
        "diff vs the in-session IVF-PQ path, bounded at top-k x "
        "|queries| rows. Timing is write-inclusive by design — the "
        "amortized index-build cost a serving deployment pays once."
    ),
    # -- round-11 verified-twin contract rows ---------------------------
    "ann_topk_lsh_verified": (
        "Contract harness, not a query: runs the SRP-LSH path AND the "
        "exact broadcast-NLJ twin (both bounded at k x |queries| output "
        "rows), then three checks — left-semi recall join, one window "
        "over <=50 rows for ranking discipline, and a per-sim equality "
        "join against recomputed cosines. Every check is bounded by the "
        "top-k output size, so the harness cost is the two ANN builds."
    ),
    "ann_topk_ivf_verified": (
        "Same harness shape over the IVF path: the k-means build is a "
        "bounded driver-side sample (corpus touched once by the "
        "broadcast-assignment pass), the checks are top-k-bounded."
    ),
    "ann_topk_pq_verified": (
        "Same harness over PQ-ADC. The per-sim exactness check is "
        "SKIPPED by contract (ADC scores through the codebook LUT, "
        "approximate by design) — recall floor + ranking discipline "
        "carry the row."
    ),
    "ann_topk_ivfpq_verified": (
        "Same harness over the composed IVF-PQ index; with "
        "ann_index_persisted this pins both the scoring contract and "
        "the persisted-serving parity of the production index shape."
    ),
    "knn_graph_verified": (
        "Runs the 24x5 SRP-LSH graph and the quadratic exact twin over "
        "the full corpus, then edge-set recall (left-semi), per-node "
        "ranking discipline (one window over kN rows), and per-edge sim "
        "equality vs recomputed cosine. Quadratic component is the "
        "exact twin — deliberate: it IS the ground truth. Benched "
        "single-run (see bench.py LIFECYCLE_ONCE)."
    ),
    "multimodal_wav_verified": (
        "Two map-only mapInPandas passes (synth+decode vs formula "
        "recompute) and one doc_id-keyed full-outer diff whose inputs "
        "are fixed-width feature rows — no payload bytes reach the "
        "shuffle. Linear at any corpus size."
    ),
    "multimodal_image_verified": (
        "Same shape over the image path; BMP and PNG containers "
        "alternate per doc so both stdlib codecs are exercised in "
        "every batch."
    ),
    "streaming_kanon_replay": (
        "Full-lifecycle replay: corpus -> distributed JSON ingest into "
        "a durable log -> real applyInPandasWithState stream run to "
        "exhaustion -> batching-invariant released-set projection. "
        "State is bounded per group (k-1 buffered ids); the shuffle is "
        "keyed on the QI triple. Benched single-run."
    ),
    "streaming_sentences_replay": (
        "Replay through dropDuplicatesWithinWatermark keyed on the "
        "sentence hash — state carries 16-byte keys, never sentence "
        "text; output compared as the batching-invariant admitted key "
        "set. Benched single-run."
    ),
    "dedup_simhash_verified": (
        "Hash exactness via a second, explode-free expression path "
        "(HOF bit votes over per-doc token-hash arrays) diffed "
        "against the grouped-sums form; pigeonhole recall (hamming<=3 "
        "MUST be found) vs a broadcast-NLJ brute force over the "
        "BOUNDED 8-byte/doc hash table — the quadratic scan never "
        "touches document text."
    ),
    "embedding_near_dup_verified": (
        "Precision is exact by construction (candidates verified with "
        "exact cosine); the contract re-derives every returned sim "
        "from raw vectors and checks total recall on EXACT-duplicate "
        "pairs (identical vectors co-bucket in every SRP table — a "
        "deterministic guarantee, unlike the probabilistic "
        "sub-identical recall that stays in pytest)."
    ),
    "embed_clusters_verified": (
        "Argmin audit: distances to all k centroids recomputed with "
        "JVM higher-order folds (different accumulation path than the "
        "numpy batch assignment), map-only over the corpus, one "
        "scalar aggregate out."
    ),
    "sample_kcenter_verified": (
        "Runs the k-center selection through BOTH center-shipping "
        "paths (inline literals and broadcast 1-row joins — the r10 "
        "dim-adaptive rewrite) and requires identical (rank, vec_id, "
        "dist) sequences via an empty full-outer diff. Benched "
        "single-run (two full selections by construction)."
    ),
    "text_bpe_verified": (
        "BPE losslessness over every distinct corpus word: merge "
        "table broadcast, Arrow-batched encode, two boolean columns "
        "aggregated to violation counters — the scan is one distinct "
        "over the token explode, linear at any corpus size."
    ),
    "dedup_semantic_verified": (
        "SemDeDup invariants: kept vectors mutually below the "
        "threshold within a cluster; every dropped vector covered by "
        "an earlier kept witness. Both checks are cluster-keyed joins "
        "— quadratic PER CLUSTER by the same bound as the op itself "
        "(max_cluster_size is the skew guard at scale), never "
        "corpus-quadratic."
    ),
    "multimodal_phash_verified": (
        "pHash of container-decoded pixels vs pHash of the synth "
        "formula pixels — two map-only Arrow passes and one "
        "doc_id-keyed diff of (ok, 8-byte hash) rows; pins the decode "
        "feeding the banded Hamming near-dup join."
    ),
    "multimodal_spectral_verified": (
        "Hann/rfft spectral profile of container-decoded WAVs vs the "
        "profile of formula-regenerated PCM — same two-pass map-only "
        "shape as the other roundtrip verifiers; pins the decode "
        "feeding the spectrogram and audio fingerprint."
    ),
    "dedup_minhash_md5_bands": (
        "LSH banding with an engine-portable band key (md5 of the "
        "band slice): one explode into (band, hash) keys and one "
        "bucket-keyed self-join — the identical never-cartesian plan "
        "shape as the production banding, value-checkable end-to-end."
    ),
    "layout_morton_keys": (
        "Z-order key construction: min/max bounds as a 1-row "
        "broadcast aggregate (no driver collect), then map-only "
        "bucketize + 20-term Morton interleave in one "
        "WholeStageCodegen span — linear at any scale, zero shuffles "
        "beyond the scalar bounds exchange."
    ),
}


def main() -> int:
    from pyspark.sql import SparkSession

    from basenine_spark.registry import SPARK_QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-dossier")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    MAX_PLAN_LINES = 160  # iterative ops re-print cached lineages per
    # round — thousands of lines that document nothing new

    sections = []
    for name, note in COMMENTARY.items():
        df = SPARK_QUERIES[name](spark, SF_DIR)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
            df._jdf.queryExecution(), "formatted"
        ).rstrip()
        lines = formatted.splitlines()
        if len(lines) > MAX_PLAN_LINES:
            dropped = len(lines) - MAX_PLAN_LINES
            # preserve the scan evidence (pushdown/pruning lines live in
            # the node-detail section at the END of formatted output)
            evidence = [
                l for l in lines[MAX_PLAN_LINES:]
                if "PushedFilters" in l or "ReadSchema" in l
            ]
            formatted = "\n".join(
                lines[:MAX_PLAN_LINES]
                + [f"... ({dropped} more lines: repeated cached-lineage "
                   f"re-prints, trimmed; scan evidence below)"]
                + sorted(set(evidence))
            )
        sections.append(
            f"## `{name}`\n\n{note}\n\n```\n{formatted}\n```\n"
        )

    header = (
        "# Physical plan dossier\n\n"
        "Generated by `tools/plan_dossier.py` from the actual plans at "
        f"`{SF_DIR}` — regenerate after operator changes; do not edit "
        "by hand. Each section states the property that makes the "
        "operator survive a 1000-executor / 100 TB deployment, and the "
        "plan below it is the evidence.\n\n"
        "Reading guide: `PushedFilters`/`ReadSchema` on a scan = "
        "predicate pushdown / column pruning reached the Parquet "
        "reader; `WholeStageCodegen` spans = JVM-compiled tight loops "
        "(no Python on the path); `Exchange hashpartitioning` = a "
        "shuffle, the unit of scale cost; `BroadcastHashJoin` = the "
        "fact side never moved.\n"
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    body = header + "\n" + "\n".join(sections)
    # plans may embed literal control bytes (e.g. the redact b64
    # one-byte NUL sentinel) — escape them so the dossier stays a text
    # file to git/grep
    body = "".join(
        c if c in ("\n", "\t") or ord(c) >= 0x20 else f"\\x{ord(c):02x}"
        for c in body
    )
    with open(OUT, "w") as f:
        f.write(body)
    print(f"wrote {OUT} ({len(sections)} plans)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
