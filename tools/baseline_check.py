#!/usr/bin/env python3
"""Mechanical per-entry perf-drift adjudication against BASELINES.json.

Usage: baseline_check.py <bench_artifact.json> [--baselines BASELINES.json]
                         [--flag-ratio 1.5] [--improve-ratio 0.67]
                         [--fail-on-flag]

The recurring tax this retires: raw per-entry seconds swing with host
weather (r11 events_*, r12-r13 emb_mmr_rerank, r13 tpch_q20 /
doc_ngram_jaccard_prefix all burned a round of re-adjudication), so a
bench artifact is compared to a committed baseline-of-record AFTER
normalizing both sides by their measured host-calibration scalar:

    norm(entry)  = seconds / cal_32t          (per artifact)
    ratio(entry) = norm(run) / norm(record)

The record side prefers `median_norm` (median of cal-normalized
seconds across order-shuffled seeding runs — robust to one lucky min
and to cache/AQE adjacency, the r14 doc_containment_profile lesson);
legacy records without it fall back to seconds/cal_32t of the min run.
The min-seconds run is still printed for context.

The flag threshold is DISPERSION-AWARE per entry: records seeded by
tools/seed_baselines.py carry `spread_norm` (max/median of the entry's
own cal-normalized seconds across the >=3 order-shuffled seeding runs),
and the effective threshold is

    max(--flag-ratio, spread_norm * --spread-margin)

An entry whose seeding runs already disagree by 1.6x under identical
no-co-tenant conditions cannot be meaningfully flagged at 1.5x — eleven
r14-r15 hand adjudications all ended "short entry flutters with the
host window"; this encodes that verdict mechanically. Records without
spread_norm (legacy) use --flag-ratio as before.

ratio > threshold       -> FLAG    (re-measure isolated before believing;
                                    a cleared flag means host noise, an
                                    uncleared one is a real regression)
                                    BANDWIDTH-REGIME GATE (r18, closes
                                    three consecutive rounds of hand
                                    adjudication): cal_32t is ALU-bound
                                    and under-corrects when the host
                                    window is memory-bandwidth-degraded
                                    (r17 driver ran at cal_mem 0.196 vs
                                    the record's 0.027 — 7x — and all
                                    three >2x flags landed on
                                    shuffle/sort-heavy entries in files
                                    untouched that round). When the
                                    run's cal_mem exceeds the entry
                                    record's by --mem-regime-ratio, a
                                    flag is re-checked against a SECOND
                                    normalization, seconds / cal_mem on
                                    both sides; if that reads in-band
                                    the flag is demoted to FLAG-BW
                                    ("bandwidth window — probe before
                                    treating as real") and does NOT
                                    trip --fail-on-flag. A flag that
                                    survives BOTH normalizations is a
                                    compute regression signal even in a
                                    degraded window.
                                    Entries where BOTH sides sit under
                                    --min-seconds are never flagged: tiny
                                    entries flutter x1.5 on scheduler
                                    noise alone, and a regression that
                                    small cannot matter at any scale the
                                    board grades. The floor compares
                                    CAL-NORMALIZED values (host-stable:
                                    raw seconds would let an entry
                                    straddle the threshold across hosts
                                    with different cal scalars).
ratio < --improve-ratio -> IMPROVED (candidate new record after an
                                    isolated confirm)
otherwise               -> in-band (noise; say nothing per-entry)

Accepted artifact shapes: the driver round wrapper ({"parsed": {...}}),
the raw Bench JSON line ({"metric": "total", "queries": {...}}), and
BENCH_FULL.json (same shape, all entries). The wrapper's parsed line
omits entries below the top-60 cut; absent entries are simply not
checked.

Exit code: 0 (report-only) unless --fail-on-flag is given, then 1 if
any entry flags. A record is advisory until re-seeded: after a real,
intended perf change, reseed the entry's record (tools/seed_baselines.py
over >=3 order-shuffled runs) in the same commit as the change.
"""
import argparse
import json
import sys


def load_artifact(path: str):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d or "cal_32t" not in d:
        raise SystemExit(f"{path}: not a bench artifact (need queries + cal_32t)")
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--baselines", default="BASELINES.json")
    ap.add_argument("--flag-ratio", type=float, default=1.5)
    ap.add_argument("--improve-ratio", type=float, default=0.67)
    ap.add_argument("--min-seconds", type=float, default=0.6,
                    help="floor in CAL-NORMALIZED seconds (~0.3s raw at "
                         "cal 0.5); both sides under it -> never flagged")
    ap.add_argument("--spread-margin", type=float, default=1.25,
                    help="multiplier on the record's own seeding-run "
                         "dispersion (spread_norm); the effective flag "
                         "threshold is max(flag-ratio, spread_norm * "
                         "spread-margin)")
    ap.add_argument("--mem-regime-ratio", type=float, default=2.0,
                    help="run cal_mem / record cal_mem above this marks "
                         "the run bandwidth-degraded vs that entry's "
                         "record; flags that read in-band under "
                         "cal_mem normalization demote to FLAG-BW")
    ap.add_argument("--fail-on-flag", action="store_true")
    args = ap.parse_args()

    art = load_artifact(args.artifact)
    with open(args.baselines) as f:
        base = json.load(f)
    entries = base["entries"]
    run_cal = float(art["cal_32t"])
    run_mem = float(art["cal_mem"]) if "cal_mem" in art else None
    # Self-adjudication probes (r19): Bench re-probes every entry whose
    # in-run reading exceeded ~2x of the record with an isolated
    # min-of-3 at end of run and stamps both readings into the artifact
    # ("probes" map + "cal_probe" scalar). A flag whose PROBE reads
    # in-band was a mid-run host window, not a regression — demote it
    # (FLAG-PROBED-CLEAR, does not trip --fail-on-flag); a flag whose
    # probe also exceeds threshold is a pre-adjudicated real signal.
    probes = art.get("probes", {}) or {}
    cal_probe = float(art.get("cal_probe", 0) or 0)

    flagged, probe_cleared, bw_flagged, improved, unrecorded, checked = \
        [], [], [], [], [], 0
    for name, sec in sorted(art["queries"].items()):
        rec = entries.get(name)
        if rec is None:
            unrecorded.append(name)
            continue
        checked += 1
        norm_run = float(sec) / run_cal
        norm_rec = (float(rec["median_norm"]) if "median_norm" in rec
                    else float(rec["seconds"]) / float(rec["cal_32t"]))
        ratio = norm_run / norm_rec if norm_rec > 0 else float("inf")
        thresh = max(args.flag_ratio,
                     float(rec.get("spread_norm", 1.0)) * args.spread_margin)
        small = (norm_run < args.min_seconds and norm_rec < args.min_seconds)
        if ratio > thresh and not small:
            # Bandwidth-regime gate: re-check the flag under cal_mem
            # normalization before treating it as a compute regression.
            # Prefers the record's mem-normalized MEDIAN (seeded r19+,
            # like-for-like with median_norm); legacy records fall back
            # to the min-seconds run's cal_mem — coarser, which is fine
            # for triage: the question is "does the excess vanish when
            # normalized by bandwidth instead of ALU?".
            bw = None
            rec_mem = rec.get("cal_mem")
            if (run_mem is not None and rec_mem and float(rec_mem) > 0
                    and run_mem / float(rec_mem) > args.mem_regime_ratio):
                rec_mem_norm = (float(rec["median_mem_norm"])
                                if "median_mem_norm" in rec
                                else float(rec["seconds"]) / float(rec_mem))
                ratio_mem = (float(sec) / run_mem) / rec_mem_norm
                bw = (run_mem / float(rec_mem), ratio_mem)
            row = (name, float(sec), float(rec["seconds"]), ratio,
                   rec.get("note"), thresh, bw)
            # In-run self-probe verdict (see header): the probe is an
            # isolated end-of-run re-measurement with its own cal.
            probe_ratio = None
            if name in probes and cal_probe > 0 and norm_rec > 0:
                probe_ratio = (float(probes[name]) / cal_probe) / norm_rec
            if probe_ratio is not None and probe_ratio <= thresh:
                probe_cleared.append(
                    (name, float(sec), float(rec["seconds"]), ratio,
                     f"self-probe x{probe_ratio:.2f} in-band", thresh, bw))
            elif bw is not None and bw[1] <= thresh:
                bw_flagged.append(row)
            else:
                flagged.append(row)
        elif ratio < args.improve_ratio and not small:
            improved.append((name, float(sec), float(rec["seconds"]), ratio,
                             rec.get("note"), thresh, None))

    print(f"artifact: {args.artifact}  cal_32t={run_cal}  "
          f"cal_mem={run_mem}  "
          f"entries={len(art['queries'])}  checked={checked}  "
          f"no-record={len(unrecorded)}")
    print(f"record:   {args.baselines}  commit={base.get('commit')}  "
          f"method={base.get('method')}")
    for tag, rows in (("FLAG", flagged), ("FLAG-PROBED-CLEAR", probe_cleared),
                      ("FLAG-BW", bw_flagged), ("IMPROVED", improved)):
        for name, sec, rsec, ratio, note, thresh, bw in sorted(
                rows, key=lambda r: -r[3]):
            line = (f"{tag:9s} {name:34s} run={sec:7.3f}s  record-min={rsec:7.3f}s  "
                    f"vs median_norm x{ratio:.2f}")
            if tag.startswith("FLAG") and thresh > args.flag_ratio:
                line += f" (thresh x{thresh:.2f})"
            if bw is not None:
                regime, ratio_mem = bw
                line += (f" [mem regime x{regime:.1f} degraded; "
                         f"mem-normalized x{ratio_mem:.2f}"
                         + (" in-band -> bandwidth window, probe before "
                            "treating as real" if tag == "FLAG-BW"
                            else " STILL OVER -> compute signal") + "]")
            if note:
                line += f"  [{note}]"
            print(line)
    if unrecorded:
        print("no-record (new entries; seed after an isolated min-of-3): "
              + ", ".join(sorted(unrecorded)))
    print(f"summary: {len(flagged)} flagged, {len(probe_cleared)} "
          f"probe-cleared, {len(bw_flagged)} "
          f"bandwidth-suspect, {len(improved)} improved, "
          f"{checked - len(flagged) - len(probe_cleared) - len(bw_flagged) - len(improved)} "
          f"in-band")
    return 1 if (args.fail_on_flag and flagged) else 0


if __name__ == "__main__":
    sys.exit(main())
