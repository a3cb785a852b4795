"""Registry iteration order IS the driver's verification budget.

The driver records CORRECTNESS rows for a prefix of the registry
(round 2 recorded exactly the first 50 entries, leaving all dedup/
similarity/multimodal entries unverified).  ``_finalize_order()`` pins
the order; these tests keep future registry edits from silently pushing
an oracle-backed unique capability out of the window.
"""

from basenine_spark.registry import ORACLES, SPARK_QUERIES

WINDOW = 50


def test_window_is_fully_oracle_backed():
    names = list(SPARK_QUERIES)
    window = names[:WINDOW]
    rows_only = [n for n in window if ORACLES[n] is None]
    assert rows_only == [], (
        f"rows-only entries occupy oracle slots in the first {WINDOW}: "
        f"{rows_only}"
    )


def test_every_unverified_oracle_entry_is_inside_window():
    """THE guard against the recurring round-2/round-4 failure mode:
    registering an oracle-backed entry below the 50-row cut, where the
    driver never checks it.  Every oracle-backed entry must either be
    inside the window (will be checked this round) or already have a
    green hash-match row in a committed CORRECTNESS_r*.json (was
    checked in an earlier round's window)."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            if row.get("hash_match"):
                green.add(name)
    names = list(SPARK_QUERIES)
    offenders = [
        n
        for i, n in enumerate(names)
        if i >= WINDOW and ORACLES[n] is not None and n not in green
    ]
    assert offenders == [], (
        "oracle-backed entries registered below the driver's "
        f"{WINDOW}-row verification cut with no green CORRECTNESS row "
        f"in any committed round: {offenders} — promote them (demote a "
        "multi-round-green entry to free the slot)"
    )


def test_promoted_and_demoted_disjoint():
    # a name in both lists silently keeps its promoted slot and the
    # demotion frees nothing (the round-4 pipeline_funnel bug);
    # _finalize_order() raises, but assert here too so the failure is
    # a readable test, not an import error
    from basenine_spark.registry import _DEMOTED, _PROMOTED

    assert not (set(_PROMOTED) & set(_DEMOTED))


def test_extension_surface_inside_window():
    names = list(SPARK_QUERIES)[:WINDOW]
    required = {
        # dedup_exact: demoted round 11 (contract wave)
        # dedup_ngram_jaccard: demoted round 11 (contract wave)
        # ann_topk: demoted round 11 (contract wave)
        # multimodal_meta demoted late round 6 (family pinned by the
        # real-decode pytest surface) to fund join_interval_overlap
        # round-6 demotions (each multi-round green; family keeps an
        # in-window survivor, several replaced by strictly-richer
        # twins): text_winnow_fingerprints → text_winnow_overlap,
        # text_contamination → text_decontaminate_spans,
        # sample_mixture → sample_token_mixture, pipeline_epoch_order →
        # pipeline_curriculum_order, sessionize_gap →
        # events_session_funnel, join_asof_clicks held by
        # join_asof_tolerance, text_lang_profile by text_quality_flags,
        # text_repetition by text_bigram_surprisal, embedding_quantize
        # by ann_topk
        # dedup_clusters demoted round 9 (seven rounds green; its
        # forced-distributed twin stays in-window on the SAME oracle)
        # funding profile_drift_events
        # pii_scrub_events demoted round 7 (six rounds green; scrub
        # machinery is redact's, in-window) funding dedup_cluster_best
        # window_range_count / sample_quality_topk / dedup_incremental:
        # demoted late round 6 to fund text_boilerplate /
        # sample_exact_stratified / pipeline_datasheet (families held by
        # events_rolling_outliers, sample_quality_percentile, and
        # pipeline_release_delta respectively)
        # join_length_bands / pipeline_shards / query_limit_extract /
        # dedup_canonical: demoted round 7 (each multi-round green) to
        # fund the 4 rows-only → full-oracle promotions below
        # ts_gap_fill_hourly / text_chunks demoted round 7 (gap-fill
        # pinned by pytest; chunk math by test_chunking + spans fuzz)
        # funding the two corpus-composition promotions
        # agg_cube_orders demoted round 7 (grouping sets pinned by 4
        # committed green rounds) funding sample_leakage_safe_splits
        # pipeline_curate demoted round 10 (eight rounds green; the
        # curate CTE chain is re-verified every round inside in-window
        # pipeline_release) funding dedup_clusters_lsh
        # round 4: scale patterns + profiling + composed release
        # join_salted_skew demoted round 7 (salting pinned by 4 green
        # rounds + plan test) funding events_rfm_segments
        # profile_orders demoted late round 6 (profiling family held by
        # pipeline_datasheet/expectations/skew) funding sample_effective_mass
        # pipeline_release: demoted round 11 (replay wave)
        # text_vocab_topk demoted late round 6 (token-count family held
        # by quality_flags/bm25/surprisal) funding pipeline_pack_balanced
        # text_quality_flags demoted round 7 (gates re-verified inside
        # pipeline_curate/release) funding dedup_cluster_density
        # join_asof_tolerance demoted round 7 (asof family held by the
        # streaming twin + interval/salted joins in-window) funding
        # sample_weighted_draw
        # round 5: BM25 relevance ranking + unigram surprisal
        # text_bm25_topk demoted round 7 (Okapi machinery re-verified
        # inside in-window search_hybrid_rrf) funding sample_token_budget
        # text_unigram_surprisal demoted round 7 (bigram twin stays
        # in-window) funding sample_temperature_mixture
        # round 5 late: substring dedup, chunking, domain caps,
        # balanced release
        # dedup_spans demoted round 7 (family held by its richer
        # in-window twins dedup_scrub_spans / text_decontaminate_spans)
        # funding text_lexical_diversity
        # sample_source_cap demoted round 7 (cap family held by
        # sample_token_mixture; twophase + streaming twins in pytest)
        # funding sample_dsir_select
        # pipeline_release_balanced demoted round 7 (release family
        # survivors in-window) funding events_seasonality
        # round 6: the 19 rows-only → oracle promotions (VERDICT r5 #1)
        # events_funnel_steps demoted round 8 (chained-min funnel
        # re-verified inside the richer in-window events_session_funnel)
        # funding dedup_clusters_distributed
        # events_session_funnel demoted round 11 (green r6-r10;
        # sessionize+funnel construction pinned by five committed
        # rounds; events family keeps rolling_outliers/psi/rfm/markov)
        # events_cohort_retention demoted round 8 (calendar rollup
        # pinned by 2 green rounds) funding text_scrub_sentences
        # events_rolling_outliers demoted round 11 late (green
        # r6-r10; events family keeps rfm_segments + markov)
        # events_expectations demoted round 10 (green r6-r9; profile
        # maths held by profile_drift_events + pipeline_datasheet)
        # funding privacy_l_diversity
        # events_psi_drift demoted round 11 late (green r6-r10;
        # profile maths held by in-window profile_drift_events)
        # events_skew_profile demoted round 10 (green r6-r9; profiling
        # machinery held by profile_drift_events + pipeline_datasheet)
        # funding the round-10 promotions
        # sample_splits demoted round 7 (family held by exact_stratified
        # / token_mixture / quality_percentile / exact_n) funding
        # search_hybrid_rrf
        # sample_token_mixture demoted round 8 (token-mass machinery
        # held by richer in-window sample_temperature_mixture) funding
        # join_bucketed_colocated
        # sample_quality_percentile demoted round 11 (green r6-r10;
        # quantile machinery held by in-window sample_exact_stratified)
        # pipeline_release_delta demoted round 11 (green r6-r10; the
        # NOT-EXISTS delta is re-verified inside pipeline_release)
        # pipeline_curriculum_order / dedup_scrub_spans demoted round
        # 10 (green r6-r9; hash-rank construction held by
        # sample_exact_stratified + pack_balanced, span machinery by
        # the sentence-dedup twins) funding the round-10 promotions
        # text_decontaminate_spans demoted round 8 (gram machinery held
        # by in-window dedup_scrub_spans) funding text_dup_sentences
        # text_bigram_surprisal demoted round 11 (green r6-r10;
        # family keeps lexical_diversity + sentence twins in-window)
        # text_phrase_search demoted round 10 (green r6-r9; retrieval
        # family held by search_hybrid_rrf) funding the round-10
        # promotions
        # text_winnow_overlap demoted round 8 (winnow scheme + pair
        # join pinned by pytest goldens; gram family held by
        # scrub_spans/decontaminate/phrase_search) funding
        # dedup_operating_curve
        # agg_equi_depth_histogram demoted round 8 (two-pass rank shape
        # re-verified inside in-window sample_token_budget) funding
        # sample_source_cap_twophase
        # round 6 late: boilerplate mass, exact stratified eval set,
        # corpus datasheet, interval-overlap join
        # text_boilerplate demoted round 10 (green r6-r9; duplicate-
        # line accounting held by the sentence-dedup twins) funding
        # dedup_minhash_lsh
        # sample_exact_stratified demoted round 11 late (green
        # r6-r10; hash-rank cut held by the sampling survivors)
        # pipeline_datasheet demoted round 11 late (green r6-r10;
        # (source,lang) rollup family held by pipeline_loso_ablation)
        # join_interval_overlap demoted round 11 (green r6-r10; join
        # family keeps join_bucketed_colocated in-window)
        # pipeline_pack_balanced demoted round 10 (green r6-r9; LPT
        # math pinned in pytest, pipeline_pack in family) funding
        # knn_graph_exact
        # sample_effective_mass demoted round 8 (mass rollup re-verified
        # inside temperature_mixture + datasheet) funding
        # events_markov_transitions
        # round 7: the 4 deterministic rows-only → full-oracle
        # promotions (VERDICT r6 #3)
        # dedup_containment demoted round 9 (green r7-r8; pair
        # machinery re-verified inside the in-window survivors view)
        # funding embedding_drift_releases
        # dedup_containment_survivors demoted round 11 (green r7-r10;
        # PPJoin pair machinery held by ngram_jaccard/minhash_lsh)
        # sample_exact_n demoted round 9 (green r7-r8; family keeps
        # exact_stratified/weighted_draw/temperature_mixture/dsir
        # in-window) funding ann_index_persisted
        # validate_golden_errors: demoted round 11 (replay wave)
        # round 7: NEW hybrid sparse+dense retrieval capability
        # search_hybrid_rrf: demoted round 11 (replay wave 2)
        # round 7: corpus-composition analytics
        # pipeline_novelty_curve demoted round 11 (green r7-r10;
        # pipeline family keeps release/datasheet/overlap/loso)
        # pipeline_source_overlap demoted round 11 late (green
        # r7-r10; gram machinery is PPJoin-family)
        # round 7 late: quality-aware cluster representatives
        # dedup_cluster_best demoted round 11 late (green r7-r10;
        # CTE components held by clusters_distributed/clusters_lsh)
        # round 7: DSIR-style importance selection
        # sample_dsir_select demoted round 11 late (green r7-r10;
        # sampling family keeps temperature/leakage/twophase)
        # round 7: per-source lexical-diversity diagnostics
        # text_lexical_diversity demoted round 11 late (green
        # r7-r10; token rollup machinery held by the sentence twins)
        # round 7: greedy token-budget selection
        # sample_token_budget demoted round 11 (green r7-r10; the
        # two-pass prefix-sum rank shape pinned by four rounds)
        # round 7: temperature-based mixture reweighting
        # sample_temperature_mixture: demoted round 11 (replay wave)
        # round 7: leakage-safe cluster-keyed splits
        # sample_leakage_safe_splits: demoted round 11 (replay wave 2)
        # sample_weighted_draw demoted round 10 (green r7-r9; the
        # ES hash-keyed draw is the same construction in-window
        # sample_exact_stratified verifies) funding
        # agg_heavy_hitters_verified
        # round 7: RFM segmentation + seasonality grid
        # events_rfm_segments: demoted round 11 (replay wave)
        # events_seasonality demoted round 11 (green r7-r10)
        # round 7: cluster density/transitivity diagnostics
        # dedup_cluster_density: demoted round 11 (replay wave)
        # round 8: the 2 deterministic rows-only → full-oracle
        # promotions (VERDICT r7 #8) — the mega-domain cap's scale path
        # and the PPJoin threshold operating curve
        # sample_source_cap_twophase: demoted round 11 (replay wave)
        # dedup_operating_curve: demoted round 11 (replay wave)
        # round 8: the forced-distributed clustering path (same oracle
        # as dedup_clusters; the 100-TB plan under the driver's check)
        "dedup_clusters_distributed",
        # round 8: C4-style sentence-level dedup (ratio + keep-first)
        # text_dup_sentences: demoted round 11 (replay wave)
        # text_scrub_sentences: demoted round 11 (replay wave 2)
        # round 8: bucketed co-located join under the driver's check
        # join_bucketed_colocated: demoted round 11 (replay wave 2)
        # round 8: first-order Markov transition matrix
        # events_markov_transitions: demoted round 11 (replay wave 2)
        # round 9: the 3 rows-only → full-oracle promotions (VERDICT
        # r8 #3) — two-release profile drift, per-dimension embedding
        # drift, and the persisted-ANN lifecycle parity diff
        # profile_drift_events: demoted round 11 (contract wave)
        # embedding_drift_releases: demoted round 11 (final wave)
        # ann_index_persisted: demoted round 11 (final wave)
        # round 10: the 2 rows-only → full-oracle promotions (VERDICT
        # r9 #7) — the LSH banding path under the exact recursive-CTE
        # oracle, and the frequent-items sketch under the
        # ann_index_persisted parity pattern
        # dedup_clusters_lsh: demoted round 12
        # agg_heavy_hitters_verified: demoted round 14 (exact-regime
        # twin stays in-window)
        # round 10 NEW capabilities: k-anonymity release ladder,
        # leave-one-source-out ablation, and the GK/HLL contract
        # twins (ann_index_persisted pattern)
        "privacy_k_anonymity",
        # privacy_l_diversity: demoted round 12
        # pipeline_loso_ablation: demoted round 12
        # agg_quantiles_verified: demoted round 12 (late)
        # agg_hll_verified: demoted round 12
        # round 10 late: the exact kNN baseline under the full oracle
        # knn_graph_exact: demoted round 11 (final wave)
        # round 10 late: MinHash-LSH pairs under the shared exact oracle
        # dedup_minhash_lsh: demoted round 11 (final wave)
        # round 11: the three never-driver-checked families under
        # the gate (VERDICT r10 #1-#3)
        # ann_topk_lsh_verified: demoted round 13
        # ann_topk_ivf_verified: demoted round 13
        # ann_topk_pq_verified: demoted round 12
        # ann_topk_ivfpq_verified: demoted round 12
        "knn_graph_verified",
        # multimodal_wav_verified: demoted round 13
        # multimodal_image_verified: demoted round 13
        # streaming_kanon_replay: demoted round 14 (three replays stay)
        # streaming_sentences_replay: demoted round 12 (late)
        # round 11 late: five more never-driver families
        # dedup_simhash_verified: demoted round 13
        # embedding_near_dup_verified: demoted round 13
        # embed_clusters_verified: demoted round 12
        "sample_kcenter_verified",
        # text_bpe_verified: demoted round 14 (bpe_first_merge stays)
        # dedup_semantic_verified: demoted round 14 (the k-means core
        # gains the richer embed_clusters_exact_regime value oracle)
        # multimodal_phash_verified: demoted round 12
        # multimodal_spectral_verified: demoted round 12
        # round-11 replay wave: eight more streaming twins replayed
        # under full-value oracles
        # streaming_dedup_replay: demoted round 13
        # streaming_windows_replay: demoted round 12
        # streaming_source_cap_replay: demoted round 13
        # streaming_rfm_replay: demoted round 12
        "streaming_sessions_replay",
        # streaming_quality_replay: demoted round 12
        # streaming_asof_replay: demoted round 14 (exposure keeps the
        # richer stream-stream join in-window)
        "streaming_exposure_replay",
        # replay wave 2: blocklist/funnel full-value oracles + the
        # semdedup/dsir/anomaly contract rows
        # streaming_blocklist_replay: demoted round 13
        # streaming_funnel_replay: demoted round 13 (late)
        # streaming_semdedup_replay: demoted round 13
        # streaming_dsir_replay: demoted round 13
        # streaming_anomaly_replay: demoted round 14 late (funds
        # flush_reset_roundtrip; sessions + exposure stay in-window)
        # contract wave: the last never-driver-checked families
        # knn_pagerank_verified: demoted round 14 (superseded by the
        # exact-regime full value oracle)
        # layout_zorder_verified: demoted round 14 (morton_keys stays)
        # embedding_triplets_verified: demoted round 14
        "multimodal_hamming_verified",
        # final wave: the last families with no driver row of any kind
        # text_normalized_verified: demoted round 14
        "text_fertility_verified",
        # text_quality_verified: demoted round 14
        # multimodal_asset_verified: demoted round 14 (hamming stays)
        # round-12 rotation: two NEW direct value-hash rows, four
        # direct-hash returns for twin-covered families, six
        # long-demoted core rows rotated back in
        # dedup_simhash_md5_pairs: demoted round 14 late (funds
        # ann_srp_md5_candidates; the md5-twin discipline stays
        # in-window via minhash_md5_bands + srp_md5_candidates)
        # bpe_first_merge: demoted round 14 late (funds
        # log_compact_roundtrip; losslessness stays pytest-pinned and
        # text_fertility_verified keeps the encode path in-window)
        # knn_graph_exact: demoted round 13 late (re-executed every
        # round inside knn_graph_verified's verify phase)
        # dedup_minhash_lsh: demoted round 14 (md5_bands stays)
        # ann_index_persisted: demoted round 14
        # embedding_drift_releases: demoted round 13 (late)
        # r12 recall cohort re-demoted round 14 after two more greens:
        # dedup_exact / dedup_ngram_jaccard / ann_topk / pipeline_curate
        # / join_interval_overlap / events_markov_transitions
        # round-12 late additions
        # dedup_minhash_md5_sigs: demoted round 14 (subsumed by bands)
        "ann_ivf_curve_verified",
        # round-13 rotation: the new banding-stage md5 twin, the
        # parser-golden-backed validate re-promotion, and the
        # longest-demoted engine/BFL core rows (last checked r02-r05)
        "dedup_minhash_md5_bands",
        "validate_golden_errors",
        "single_lookup",
        "query_left_off",
        "macro_expansion_query",
        "fetch_forward",
        "bfl_time_window",
        "bfl_and_or",
        "bfl_json_num_cmp",
        "bfl_xml_path",
        "recursive_descent",
        # round-13 late: the Z-order key construction direct value row
        # and the sketch-in-exact-regime row
        "layout_morton_keys",
        "agg_heavy_hitters_exact_regime",
        "agg_quantile_exact_regime",
        # round-14 rotation: FIRST driver rows for the stateful engine
        # surface (VERDICT r13 #1), two exact-regime rows (#5), and
        # the sixteen r02-r05 BFL-core recalls (#2)
        "retention_rotation_roundtrip",
        "persistence_restart_roundtrip",
        "embed_clusters_exact_regime",
        "knn_pagerank_exact_regime",
        "bfl_eq_string",
        "bfl_neq_string",
        "bfl_cmp_gt",
        "bfl_cmp_le",
        "bfl_not",
        "bfl_bare_path_truthy",
        "bfl_startswith",
        "bfl_endswith",
        "bfl_contains",
        "bfl_json_key_eq",
        "bfl_collapse_missing",
        "bfl_index_select",
        "redact_typed_fast",
        "bfl_time_arith_fold",
        "bfl_json_base64_probe",
        "bfl_wildcard_existential",
        # round-14 late: /flush + /reset under the driver gate — the
        # last stateful-surface family without a driver row
        "flush_reset_roundtrip",
        # round-14 late: SRP-LSH candidate generation under the
        # md5-twin discipline (ANN sibling of minhash_md5_bands)
        "ann_srp_md5_candidates",
        # round-14 late: compaction maintenance — query equivalence +
        # id continuity across the atomic directory swap
        "log_compact_roundtrip",
    }
    missing = required - set(names)
    assert not missing, f"extension entries outside the window: {missing}"


def test_redact_fast_twin_demoted_but_registered():
    # redact_typed_fast hash-matches the SAME oracle as the in-window
    # redact_row_backend — demoted as redundant, must stay registered
    names = list(SPARK_QUERIES)
    assert "redact_typed_fast" in names
    assert names.index("redact_row_backend") < WINDOW


def test_demoted_entries_still_registered():
    # falling outside the window must not mean falling out of queries()
    names = set(SPARK_QUERIES)
    for n in (
        "dedup_minhash_lsh",
        "ann_topk_lsh",
        "ann_topk_ivf",
        "embedding_near_dup",
        "validate_golden_errors",
        "bfl_neq_string",
    ):
        assert n in names


def test_oracles_subset_of_queries():
    assert set(ORACLES) == set(SPARK_QUERIES)


def test_registry_import_is_sparkless():
    """Importing the registry (what the driver does first) must not
    create or require a SparkSession — all plans are built lazily
    inside queries()[name](spark, sf_dir)."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import basenine_spark.registry as r\n"
        "from pyspark.sql import SparkSession\n"
        "assert SparkSession.getActiveSession() is None\n"
        "assert len(r.SPARK_QUERIES) >= 100\n"
        "print('sparkless-ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0 and "sparkless-ok" in out.stdout, out.stderr[-500:]
