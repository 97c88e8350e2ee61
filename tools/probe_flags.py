#!/usr/bin/env python3
"""Adjudicate baseline_check.py flags mechanically: isolated min-of-N
probe per flagged entry, ready-to-paste NOTES lines out.

Usage: probe_flags.py <bench_artifact.json>
           [--baselines BASELINES.json] [--entries a,b,c] [--repeat 5]
           [--flag-ratio 1.5] [--clear-ratio 1.5] [--round-tag r16]
           [--sf-dir /root/testdata/sf0.1]
           [--warmup-dir /root/testdata/sf0.01] [--cpus 32]

This is the house adjudication convention (seed_baselines.py NOTES,
r12-r15), automated: for every entry the artifact flags vs
BASELINES.json median_norm, run ONE isolated Bench
(SPARK_GRAFT_ONLY=<entry>, SPARK_GRAFT_REPEAT=<N>, min-of-N with its
own in-process cal_32t), recompute the cal-normalized ratio, and emit
the verdict:

  ratio <= --clear-ratio  -> CLEARED    (host-window noise; paste the
                                         printed NOTES line into
                                         tools/seed_baselines.py)
  ratio  > --clear-ratio  -> REPRODUCED (treat as a real regression:
                                         find the cause, fix, and
                                         re-seed the record in the same
                                         commit)

Probes run SERIALLY via sbt (never two sbt processes at once — shared
target/ corrupts forked JVMs). Each probe is fully isolated: fresh JVM,
fresh SparkSession, warmup pass at --warmup-dir, its own calibration
scalars — the same protocol every NOTES adjudication since r12 used by
hand.

Exit code: 0 if every probed flag cleared, 1 if any reproduced,
2 on harness trouble (no flags parsed is NOT trouble: exits 0 having
said so).
"""
import argparse
import json
import os
import subprocess
import sys


def load_artifact(path: str):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d or "cal_32t" not in d:
        raise SystemExit(f"{path}: not a bench artifact (need queries + cal_32t)")
    return d


def record_norm(rec):
    if "median_norm" in rec:
        return float(rec["median_norm"])
    return float(rec["seconds"]) / float(rec["cal_32t"])


def bench_once(entry: str, repeat: int, sf_dir: str, warmup_dir: str,
               cpus: int, repo: str):
    """One isolated Bench run; returns (seconds, cal_32t, cal_mem) or
    raises. cal_mem rides along because bandwidth-window adjudications
    (r16 topn_per_key, r17 doc_sorted_neighborhood) hinge on it: a probe
    that reproduces a flag at cal_mem 3-7x the record's is measuring the
    window, not the code, and the NOTES line must say which."""
    env = dict(os.environ,
               SPARK_GRAFT_ONLY=entry,
               SPARK_GRAFT_REPEAT=str(repeat),
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_WARMUP_DIR=warmup_dir,
               SPARK_GRAFT_CPUS=str(cpus))
    p = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd=repo, env=env, capture_output=True, text=True,
                       timeout=1800)
    line = None
    for ln in p.stdout.splitlines():
        if '"metric"' in ln:
            line = ln
    if line is None:
        sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-1000:] + "\n")
        raise RuntimeError(f"no bench JSON line for {entry} (rc={p.returncode})")
    d = json.loads(line[line.index("{"):])
    if not d.get("ok", False):
        raise RuntimeError(f"probe for {entry} failed: {d.get('errors')}")
    if entry not in d.get("queries", {}):
        raise RuntimeError(f"probe line for {entry} lacks its timing: {line}")
    return (float(d["queries"][entry]), float(d["cal_32t"]),
            float(d.get("cal_mem", float("nan"))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--baselines", default="BASELINES.json")
    ap.add_argument("--entries", default=None,
                    help="comma list; default = entries the artifact flags")
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--flag-ratio", type=float, default=1.5)
    ap.add_argument("--min-seconds", type=float, default=0.6)
    ap.add_argument("--clear-ratio", type=float, default=1.5,
                    help="isolated ratio above this = reproduced/real")
    ap.add_argument("--round-tag", default="r?",
                    help="round label for the NOTES line, e.g. r16")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--warmup-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = load_artifact(args.artifact)
    with open(os.path.join(repo, args.baselines)) as f:
        base = json.load(f)
    entries = base["entries"]
    run_cal = float(art["cal_32t"])

    if args.entries:
        targets = [(n, (float(art["queries"][n]) / run_cal) / record_norm(entries[n])
                    if n in art["queries"] and n in entries else float("nan"))
                   for n in args.entries.split(",") if n.strip()]
    else:
        targets = []
        for name, sec in sorted(art["queries"].items()):
            rec = entries.get(name)
            if rec is None:
                continue
            norm_run = float(sec) / run_cal
            norm_rec = record_norm(rec)
            ratio = norm_run / norm_rec if norm_rec > 0 else float("inf")
            small = norm_run < args.min_seconds and norm_rec < args.min_seconds
            if ratio > args.flag_ratio and not small:
                targets.append((name, ratio))
        targets.sort(key=lambda t: -t[1])

    if not targets:
        print("no flags to adjudicate; nothing to do")
        return 0

    print(f"adjudicating {len(targets)} flag(s), min-of-{args.repeat} "
          f"isolated each: " + ", ".join(n for n, _ in targets))
    reproduced, notes = [], []
    for name, orig_ratio in targets:
        rec = entries.get(name)
        if rec is None:
            print(f"SKIP      {name}: no baseline record")
            continue
        sec, cal, mem = bench_once(name, args.repeat, args.sf_dir,
                                   args.warmup_dir, args.cpus, repo)
        ratio = (sec / cal) / record_norm(rec)
        rec_mem = float(rec.get("cal_mem", float("nan")))
        mem_note = (f"; probe cal_mem {mem} vs record {rec_mem}"
                    if mem == mem else "")
        if ratio <= args.clear_ratio:
            verdict = "CLEARED"
            note = (f"{args.round_tag} driver-run x{orig_ratio:.2f} flag "
                    f"cleared: isolated min-of-{args.repeat} {sec:.3f}s @ "
                    f"cal {cal} = x{ratio:.2f} of median_norm, in-band; "
                    f"host noise{mem_note}")
            notes.append((name, note))
        else:
            verdict = "REPRODUCED"
            reproduced.append(name)
            note = (f"{args.round_tag} flag REPRODUCED isolated: "
                    f"min-of-{args.repeat} {sec:.3f}s @ cal {cal} = "
                    f"x{ratio:.2f} of median_norm{mem_note} — real unless "
                    f"the cal_mem gap says bandwidth window; investigate "
                    f"and re-seed with the fix")
        print(f"{verdict:10s} {name:34s} driver=x{orig_ratio:.2f}  "
              f"isolated={sec:.3f}s @ cal {cal} cal_mem {mem} = x{ratio:.2f}")
    if notes:
        print("\nready-to-paste NOTES entries (tools/seed_baselines.py):")
        for name, note in notes:
            lines, cur = [], ""
            for w in note.split():
                if cur and len(cur) + 1 + len(w) > 64:
                    lines.append(cur)
                    cur = w
                else:
                    cur = f"{cur} {w}" if cur else w
            lines.append(cur)
            print(f'    "{name}":')
            for i, ln in enumerate(lines):
                tail = ' "' if i < len(lines) - 1 else '",'
                print(f'        "{ln}{tail}')
    print(f"\nsummary: {len(notes)} cleared, {len(reproduced)} reproduced"
          + (": " + ", ".join(reproduced) if reproduced else ""))
    return 1 if reproduced else 0


if __name__ == "__main__":
    sys.exit(main())
