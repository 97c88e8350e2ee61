#!/usr/bin/env python3
"""Seed (or re-seed) BASELINES.json from N full-catalog Bench artifacts.

Usage: seed_baselines.py OUT.json RUN1.json RUN2.json [RUN3.json ...]

Per entry the record keeps THREE estimators:
  - seconds / cal_32t / cal_mem: the MIN-seconds run (least co-tenant
    noise — the same reason the house compares min-of-N), reported by
    baseline_check.py for context.
  - median_norm: the MEDIAN of cal-normalized seconds (sec / cal_32t)
    across the runs — what baseline_check.py FLAGS against. The median
    is robust to one lucky/unlucky run, so a record seeded from runs
    with different entry execution orders (SPARK_GRAFT_ORDER_SEED, the
    r14 lesson: fixed-order runs bake cache/AQE adjacency into the min
    and any later reordering reads as fake drift — the
    doc_containment_profile false flag) is an honest typical cost.
  - spread_norm: MAX of cal-normalized seconds across the same runs,
    divided by median_norm (>= 1) — the entry's OWN observed
    run-to-run dispersion under identical no-co-tenant conditions.
    baseline_check.py widens the flag threshold by it
    (max(flag-ratio, spread_norm * margin)): eleven r14-r15
    adjudications all concluded "short entry flutters with the host
    window", and an entry whose seeding runs already disagree by
    1.6x cannot be meaningfully flagged at 1.5x. Encoded here so
    that lesson stops being re-litigated by hand each round.
    MEASURED LIMITATION (r16): three seeding runs executed back-to-back
    share one host window, so spread_norm UNDER-estimates cross-window
    dispersion — the r15 driver-run flags (x1.5-2.4, all cleared
    isolated) would not have been absorbed by the spreads those quiet
    runs produced. Defense in depth: Bench's own disagreement
    re-measure (passes differing >1.4x get an extra execution) catches
    the noisy window AT THE RUN, and any flag that still survives is a
    ten-minute mechanical adjudication via tools/probe_flags.py.

Seed from runs with DISTINCT order seeds; the seeds used are stamped
into the meta block ("order_seeds") so a reader can see whether the
record is order-decorrelated. All artifacts must agree on sf — mixing
scale factors would silently produce a mislabeled record.

Adjudication notes for entries with a history of host-drift false
alarms are carried in NOTES below — they migrate the scaladoc
adjudications into the mechanical record so they stop being
re-litigated.

Re-seed an entry's record in the SAME commit as any intended perf
change to it; baseline_check.py flags are otherwise measured against
the pre-change record.
"""
import json
import statistics
import subprocess
import sys

# r17 cross-window finding shared by the sub-second embedding entries:
# with byte-identical emb code, these float-array-scan entries read
# 0.26-0.67s across the three shuffled seed runs (one host window, cal
# 0.58-0.74, cal_mem 0.062) and 0.54-0.92s in EVERY run of a later
# window (the stable-order full run at cal 0.447 AND an isolated
# min-of-3 probe at cal 0.577) -- a host component neither cal_32t
# (ALU) nor cal_mem (sequential bandwidth) captures moves them x2
# between windows. The record is therefore seeded from all FOUR full
# runs spanning both windows, so spread_norm carries the measured
# cross-window dispersion instead of re-litigating it as flags.
EMB_CROSS_WINDOW = (
    "r17: reads x1.5-2.7 vs a single-window record whenever the host "
    "window shifts, with code byte-identical (adjudicated via a "
    "stable-order full run + an isolated min-of-3 probe, both slow, "
    "vs three seed runs, all fast); record seeded from four runs "
    "spanning both windows so the dispersion lives in spread_norm")

NOTES = {
    "sensor_topn":
        "r19 final-run x1.53 flag cleared: isolated min-of-5 0.505s @ "
        "cal 0.464 = x1.17 of median_norm, in-band; host noise; probe "
        "cal_mem 0.022 vs record 0.143",
    "doc_pack_bins":
        "r19 driver-run x9.99 flag cleared (tools/probe_flags.py): "
        "isolated min-of-5 0.461s @ cal 0.516 = x1.06 of median_norm, "
        "in-band; probe cal_mem 0.037 vs record 0.044 — the r18 "
        "prefix-sum swap is NOT a regression, the driver window was; "
        "host noise",
    "pipeline_curriculum":
        "r19 driver-run x6.22 flag cleared: isolated min-of-5 1.055s @ "
        "cal 0.576 = x1.10 of median_norm, in-band; host noise. The "
        "r18-suspected 'double corpus scan' was audited r19: Catalyst "
        "prunes the count branch to a zero-column metadata scan "
        "(PlanSpec round-19 pin)",
    "events_asof_join":
        "r19 driver-run x9.15 flag: isolated min-of-5 REPRODUCED x6.09 "
        "(1.414s @ cal 0.51, cal_mem 0.041 = record regime) on code "
        "untouched since r13 — but a same-JVM min-of-8 read 0.588s @ "
        "cal 0.895 = x1.44, in-band under that window's own cal. The "
        "custom Catalyst exec pays per-JVM plan/codegen constants that "
        "full-catalog runs amortize (the tpch_q19 class) on top of a "
        "bouncing window (cal_32t_runs 0.895/1.526/0.516 in the "
        "adjudication run). Re-seeded r19 under the current regime",
    "events_asof_next":
        "r19 x6.92 flag adjudicated with events_asof_join (same exec, "
        "same session): isolated min-of-5 x4.97 but same-JVM min-of-8 "
        "0.459s, in-band; per-JVM constants + window. Re-seeded r19",
    "events_range_join":
        "r19 x6.48 flag adjudicated with events_asof_join: isolated "
        "min-of-5 x3.32 but same-JVM min-of-8 0.575s, in-band; per-JVM "
        "constants + window. Re-seeded r19",
    "emb_semdedup": EMB_CROSS_WINDOW,
    "emb_pq_distortion": EMB_CROSS_WINDOW,
    "emb_gram_matrix": EMB_CROSS_WINDOW,
    "emb_ivf_cells": EMB_CROSS_WINDOW,
    "emb_label_centroids": EMB_CROSS_WINDOW,
    "emb_hard_negatives_shortlist": EMB_CROSS_WINDOW,
    "emb_hard_negatives_recall": EMB_CROSS_WINDOW,
    "emb_hubness": EMB_CROSS_WINDOW,
    "emb_knn_mrl": EMB_CROSS_WINDOW,
    "topn_per_key":
        "r16 driver-run x2.36 flag: probe_flags isolated min-of-5 "
        "REPRODUCED x2.27 (0.627s @ cal 0.616) and a second isolated "
        "probe read 0.68s -- but adjudicated HOST MEMORY-BANDWIDTH "
        "WINDOW, not code (r17): a 5-entry run minutes earlier (cal_mem "
        "0.07, the record regime) read 0.294s = x1.21 IN BAND, and the "
        "decisive control is a 2-entry run during the slow window "
        "(cal_mem 0.148, 2.4x the record era's ~0.06) where the "
        "untouched no-flag-history sibling taxi_ride_count co-inflated "
        "x2.8 alongside -- the r12 class where co-tenant pressure lands "
        "on DRAM bandwidth, scan-bound micro-entries inflate 2-3x, and "
        "ALU-bound cal_32t under-corrects. Entry code untouched since "
        "r15; record re-seeded r17 under the current regime. r19 "
        "final-run x2.50 was SELF-ADJUDICATED by the new in-run probe "
        "(probes map x0.95 in-band; baseline_check demoted it "
        "mechanically, FLAG-PROBED-CLEAR) — first live firing of the "
        "r19 self-adjudication path",
    "taxi_ride_count":
        "read x2.8 in the same r17 bandwidth-contended control window "
        "that adjudicated topn_per_key (cal_mem 0.148); in-band in every "
        "normal-regime run of the same session",
    "emb_intrinsic_dim":
        "r16 driver-run x1.51 flag cleared (r17, tools/probe_flags.py): "
        "isolated min-of-5 1.237s @ cal 0.574 = x0.50 of median_norm, "
        "deep in-band; the 3-run r16 record was seeded from one host "
        "window and reads conservative if anything; host noise",
    "emb_kmeans_elbow":
        "r16 canonical-run x1.74 flag reproduced isolated (0.520s @ cal "
        "0.468 = x1.85) minutes after the seed runs measured 0.206s on "
        "the same code -- the sub-second flutter class with an extra "
        "amplifier: the entry's four argmin projections are ~30 sqDist "
        "codegen expansions, so plan-compile (Janino) state dominates "
        "its sub-second runtime and varies with what compiled before "
        "it. Constant per-query overhead, vanishes at scale; total "
        "in-band",
    "windowed_count":
        "r16 builder-run x2.54 flag REPRODUCED isolated twice (0.647s @ "
        "cal 0.583 = x2.74; 0.458s @ cal 0.502 = x2.25, probe_flags "
        "min-of-5) with the entry's code untouched and the catalog total "
        "1.0x in-band -- adjudicated HOST-REGIME SHIFT, not code: the "
        "0.168s record came from an anomalously fast window (seed cals "
        "0.425-0.467 vs 0.48-0.58 now), absolute 0.46s for a 600k-row "
        "windowed aggregate is healthy, and cal normalization is "
        "sub-linear for sub-second entries (fixed scheduler overheads). "
        "Record re-seeded r16 under the current regime",
    "emb_knn_brute":
        "r15 canonical-run 1.68x flag cleared (two isolated probes, "
        "second 0.403s @ cal 0.461 = 1.15x; known flutterer, spread_norm "
        "2.0). r16 builder-run x1.78 flag reproduced isolated (1.072s @ "
        "cal 0.509 = x3.23) -- same host-regime adjudication as "
        "windowed_count; re-seeded r16",
    "doc_bigram_fluency":
        "r15 driver-run x2.37 flag cleared (adjudicated r16 via "
        "tools/probe_flags.py): isolated min-of-5 1.114s @ cal 0.43 = "
        "x1.00 of median_norm, dead in-band; host noise",
    "doc_dup_spans":
        "r15 driver-run x1.89 flag cleared (r16): isolated min-of-5 "
        "1.013s @ cal 0.445 = x1.03 of median_norm; host noise",
    "pipeline_dataset_card":
        "r15 driver-run x1.74 flag cleared (r16): isolated min-of-5 "
        "0.736s @ cal 0.45 = x1.15 of median_norm; host noise",
    "doc_sorted_neighborhood":
        "r15 driver-run x1.62 flag cleared (r16): isolated min-of-5 "
        "0.908s @ cal 0.43 = x0.84 of median_norm; host noise. "
        "r17 driver-run x3.00 flag cleared (r18, tools/probe_flags.py): "
        "isolated min-of-5 1.917s @ cal 0.938 = x0.83 of median_norm, "
        "in-band; the driver window ran at cal_mem 0.196 vs the "
        "record's 0.027 (7x bandwidth-degraded) — third flag in four "
        "rounds, all host windows; baseline_check now demotes this "
        "class to FLAG-BW via the cal_mem regime gate",
    "doc_dup_clusters_star":
        "r17 driver-run x1.64 flag cleared (r18): isolated min-of-5 "
        "2.174s @ cal 0.668 = x1.09 of median_norm, in-band; "
        "bandwidth-degraded driver window (cal_mem 7x record)",
    "emb_rank_agreement":
        "r17 debut-round x1.60 flag cleared (r18): isolated min-of-5 "
        "1.649s @ cal 0.605 = x1.45 of median_norm, in-band; "
        "bandwidth-degraded driver window (cal_mem 7x record)",
    "doc_split_leakage":
        "r17 driver-run x1.52 flag cleared (r18): isolated min-of-5 "
        "1.738s @ cal 0.46 = x1.20 of median_norm, in-band; "
        "bandwidth-degraded driver window (cal_mem 7x record)",
    "lang_id_confusion":
        "r15 driver-run x1.54 flag cleared (r16): isolated min-of-5 "
        "0.896s @ cal 0.492 = x1.21 of median_norm; host noise",
    "orders_rollup_incremental":
        "r17 driver-run x2.58 flag cleared (r18): first isolated "
        "min-of-5 read x1.93 @ cal 0.518 but a second isolated min-of-5 "
        "read x1.13 @ cal 1.5 / cal_mem 0.726 — the ratio tracks the "
        "window, not the code (entry untouched since r16, plan "
        "re-read: view-sized full-outer merge); the r17 driver window "
        "was cal_mem 7x the record's. Host regime",
    "tpch_q19":
        "r17 driver-run x2.17 flag adjudicated PLAN-COMPILE CONSTANT, "
        "not a regression (r18): two isolated min-of-5 probes read "
        "x2.11-2.14 even at record-regime cal_mem 0.029, but a "
        "min-of-12 same-JVM run read 0.313s @ cal 0.486 = x1.20 "
        "IN-BAND — the 0.24-0.32s entry is dominated by Janino "
        "codegen of its OR-of-ANDs residual on a fresh JVM, which "
        "full-catalog runs amortize (the emb_kmeans_elbow class). "
        "Vanishes at scale; code untouched",
    "word_count":
        "r17 driver-run x1.83 flag adjudicated like tpch_q19 (r18): "
        "isolated min-of-5 x2.19-2.75, but min-of-12 same-JVM 0.251s "
        "@ cal 0.486 = x1.37 in-band — sub-0.3s entry dominated by "
        "per-JVM warmup constants the record's full-catalog seeding "
        "amortizes. Vanishes at scale; code untouched",
    "emb_mmr_rerank":
        "r12 2.46s was host swing (adjudicated r13, min-of-5 at recorded "
        "cal ~1.6s @ cal_32t~0.5; EmbeddingCatalog.scala MMR scaladoc)",
    "tpch_q20":
        "r13 driver-run 1.98s did not reproduce (0.89-1.22 across four "
        "isolated snapshots); environmental",
    "doc_ngram_jaccard_prefix":
        "force-pinned PPJoin scale path, deliberately slower than counted "
        "on the dense corpus; r13 driver-run 6.43s did not reproduce "
        "(2.99-4.06 isolated)",
    "doc_containment_covered_prefix":
        "force-pinned PPJoin scale path, deliberately slower than counted "
        "on the dense corpus",
    "doc_containment_profile":
        "r14 1.50x-of-record flag adjudicated r15: isolated min-of-5 "
        "3.325s @ cal 0.467 = 1.11x of the old 2.746s record — the "
        "record was flattered by fixed-order seeding adjacency, not a "
        "regression; re-seeded from order-shuffled runs",
    "source_kmv_overlap":
        "r15 canonical-run 1.63x flag cleared: isolated min-of-5 3.158s "
        "@ cal 0.483 = 1.23x of median_norm, in-band; host noise",
    "doc_sample_per_source":
        "r15 canonical-run 1.60x flag cleared: two isolated probes, "
        "second 0.266s @ cal 0.461 = 1.19x of median_norm; sub-0.35s "
        "entry fluttering with the host window",
    "token_bpe_merges":
        "r15 canonical-run 1.55x flag cleared: isolated min-of-5 1.264s "
        "@ cal 0.443 = 1.25x of median_norm, in-band; host noise",
    "media_decode":
        "r15 canonical-run 1.50x flag cleared: isolated min-of-5 0.264s "
        "@ cal 0.443 = 1.20x of median_norm, in-band; sub-0.75s-normalized "
        "entry fluttering at the flag boundary",
    "events_ewma":
        "r11 events_* inflation was host distortion (adjudicated r12)",
    "events_ewma_salted":
        "r11 events_* inflation was host distortion (adjudicated r12)",
    "events_autocorr_salted":
        "r11 events_* inflation was host distortion (adjudicated r12)",
}


def main() -> int:
    out, runs = sys.argv[1], sys.argv[2:]
    arts = []
    for p in runs:
        with open(p) as f:
            arts.append(json.load(f))
    sfs = {a["sf"] for a in arts}
    if len(sfs) != 1:
        raise SystemExit(f"refusing to seed from mixed scale factors: {sorted(sfs)}")
    commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                            capture_output=True, text=True).stdout.strip()
    names = set()
    for a in arts:
        names |= set(a["queries"])
    entries = {}
    for n in sorted(names):
        best, norms, mem_norms = None, [], []
        for a in arts:
            if n in a["queries"]:
                sec = float(a["queries"][n])
                norms.append(sec / float(a["cal_32t"]))
                if float(a.get("cal_mem", 0)) > 0:
                    mem_norms.append(sec / float(a["cal_mem"]))
                if best is None or sec < best[0]:
                    best = (sec, a)
        sec, a = best
        med = statistics.median(norms)
        rec = {
            "seconds": round(sec, 3),
            "cal_32t": a["cal_32t"],
            "cal_mem": a["cal_mem"],
            "median_norm": round(med, 3),
            "spread_norm": round(max(norms) / med, 3) if med > 0 else 1.0,
            "n_runs": len(norms),
            "commit": commit,
        }
        # Mem-normalized median alongside the ALU-normalized one so
        # baseline_check.py's bandwidth-regime gate compares like for
        # like (r18 ADVICE: mixing the record's single min run with the
        # run's median-based threshold classified near-threshold flags
        # inconsistently).
        if mem_norms:
            rec["median_mem_norm"] = round(statistics.median(mem_norms), 3)
        if n in NOTES:
            rec["note"] = NOTES[n]
        entries[n] = rec
    doc = {
        "commit": commit,
        "sf": arts[0]["sf"],
        "order_seeds": [a.get("order_seed") for a in arts],
        "method": ("per-entry MIN seconds (context) + MEDIAN of "
                   "cal_32t-normalized seconds (flagging basis) + "
                   "MAX/MEDIAN dispersion (spread_norm, widens the flag "
                   "threshold) over %d "
                   "isolated full-catalog Bench runs (local[32], warmup "
                   "sf0.01, no co-tenant load), order-shuffled by "
                   "SPARK_GRAFT_ORDER_SEED where a seed is stamped (null "
                   "= the stable-order canonical run, included so the "
                   "record spans more than one host window — the r17 "
                   "emb cross-window lesson); compare via "
                   "tools/baseline_check.py, which normalizes the run by "
                   "its cal_32t and flags against median_norm"
                   % len(arts)),
        "entries": entries,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    tot = [sum(float(v) for v in a["queries"].values()) for a in arts]
    print(f"seeded {len(entries)} entries from {len(runs)} runs; "
          f"run totals: {[round(t, 1) for t in tot]}; "
          f"cals: {[a['cal_32t'] for a in arts]}; "
          f"order seeds: {doc['order_seeds']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
