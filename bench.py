#!/usr/bin/env python
"""Benchmark harness — driver contract (see repo instructions).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via a count-style action
(``df.toPandas`` would add transfer cost that isn't query time;
``count()`` after a no-op cache-buster keeps it honest but cheap).

Each query runs ``BENCH_RUNS`` (default 3) consecutive times and
reports the MEDIAN: single-shot numbers mixed machine-contention noise
and first-run codegen-compile cost into every round-over-round delta
(round 2's uniform ~1.7× drift on untouched queries made per-query
comparisons unreadable). The median discards a one-off slow run while
still charging queries whose plans are consistently heavy; per-query
spreads land in "spread" for drift diagnosis.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nlp_with_pyspark_spark.queries import QUERIES  # noqa: E402
from nlp_with_pyspark_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "tfidf_long",
    "vocab_top100",
    "pricing_summary",
    "top_parts_by_revenue",
    "customer_nation_revenue",
    "salted_nation_revenue",
    "top_orders_per_customer",
    "order_priority_counts",
    "revenue_rollup",
    "events_tumbling_5m",
    "events_sliding_10m",
    "events_session_stats",
    "events_json_stats",
    "dedup_exact_groups",
    "stratified_sample_by_lang",
    "dedup_minhash_pairs",
    "dedup_components",
    "simhash_near_pairs",
    "ann_brute_force_topk",
    "ann_lsh_topk",
    "lang_id_counts",
    "quality_scores",
    "doc_token_chunks",
    "token_pack_assignments",
    "doc_fingerprints",
    "multimodal_asset_stats",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "events_asof_click_purchase",
    "click_purchase_attribution",
    "customer_rolling_7d_revenue",
    "session_event_overlap",
    "supplier_nation_revenue",
    "local_supplier_volume",
    "dormant_customers",
    "price_percentiles",
    "corpus_clean_stats",
    "sql_top_unshipped_orders",
    "events_distinct_users",
    "order_priority_pivot",
    "customer_order_setops",
    "confusion_metrics",
    "doc_token_stats",
    "small_qty_part_revenue",
    "high_balance_inactive",
    "promo_revenue_share",
    "latest_event_per_user",
    "bigram_top50",
    "embedding_centroid_topk",
    "repetition_features",
    "ann_ivf_topk",
    "decontamination_overlap",
    "pii_scrub_stats",
    "embedding_quantization_stats",
    "dedup_canonical_corpus",
    "dup_ngram_coverage",
    "domain_mixture_weights",
    "embedding_pq_codes",
    "corpus_stats_card",
    "model_auc_eval",
    "markup_strip_stats",
    "line_dedup_stats",
    "ann_ivfpq_topk",
    "click_purchase_funnel",
    "corpus_pipeline_funnel",
    "doc_lm_scores",
    "embedding_rp_project",
]
# Excluded on purpose: dedup_ngram_jaccard / embedding_near_dups are the
# exact all-pairs VERIFIERS for the LSH/minhash scale paths (quadratic by
# definition). Round 6 also pruned nine near-duplicate
# parameterizations of still-benched entries (order_status_cube,
# corpus_train_split, token_budget, multimodal_resize,
# order_priority_melt, customer_running_revenue, doc_length_histogram,
# tfidf_smoothed_long — IDF-formula twin of tfidf_long —
# and simhash_fingerprints — the projection sub-step of
# simhash_near_pairs) so the printed JSON line keeps headroom under
# the driver's 2000-char tail capture; the suite total is accordingly
# not directly comparable to rounds ≤ 5 on those names.


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERIES]
    # warm the JVM/codegen path once with the cheapest query so the
    # first measured query doesn't pay session startup costs
    try:
        QUERIES["vocab_top100"](spark, sf_dir).count()
    except Exception as exc:  # noqa: BLE001 — warm-up must not kill the run
        print(f"bench: warm-up FAILED: {exc}", file=sys.stderr)

    runs = int(os.environ.get("BENCH_RUNS", "3"))
    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    failed: list[str] = []
    for name in names:
        # per-query isolation: one broken query must not erase the whole
        # round's bench record (round 4 recorded NOTHING because query 11
        # threw and the uncaught exception killed the run before the JSON
        # line printed). Failures are reported in the JSON instead.
        try:
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                df = QUERIES[name](spark, sf_dir)
                df.count()  # full materialization of the query result
                samples.append(round(time.perf_counter() - t0, 3))
            times[name] = sorted(samples)[len(samples) // 2]
            spread[name] = samples
        except Exception as exc:  # noqa: BLE001 — keep benching
            failed.append(name)
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)

    # The driver captures only the LAST 2000 chars of stdout and parses
    # the final line as JSON: the printed line must stay compact (round
    # 3's inline per-query "spread" arrays pushed it past the buffer and
    # the round recorded parsed=null). Full samples go to stderr instead.
    print(
        json.dumps({"runs": runs, "spread": spread}, separators=(",", ":")),
        file=sys.stderr,
    )
    out = {
        "metric": "suite-med-of-%d" % runs,
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in times.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if failed:
        # a partial suite total must not read as a full-suite speedup:
        # a regression that CRASHES an expensive query would otherwise
        # shrink "value". Null it and report the partial sum separately.
        out["partial_sec"] = out["value"]
        out["value"] = None
        out["failed"] = failed
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1850:  # keep headroom under the 2000-char tail capture
        out["queries"] = {k: round(v, 1) for k, v in times.items()}
        line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1900:
        print("bench: line %d chars nears tail buffer" % len(line), file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
