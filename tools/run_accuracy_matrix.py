"""Accuracy evidence matrix runner (VERDICT r2 Missing #1 / Next #4).

Sequentially drives `synthetic_accuracy_bench.py` over:
  - worlds {urban, highway, dynamic} x seeds {7, 23, 1009} x {clean, fog}
    (highway is loop-free -> odometry only), AND
  - the reference sensor-profile flagfiles (16/32/64/128-beam, mulran,
    newer_college, ultrafast) on matching beam-structured synthetic scans
    — executed end-to-end, not just parse-loaded.

One subprocess at a time (two processes initializing the tunneled TPU
backend deadlock); each run writes docs/accuracy/<tag>.json and the tool
finishes with a markdown table for docs/ACCURACY.md.  Zero per-world
parameter edits: every run uses the named flagfile verbatim.

Usage: python tools/run_accuracy_matrix.py [--only matrix|profiles]
           [--frames 420] [--timeout 900] [--out docs/accuracy]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
_CFG_DIR = "/root/reference/script/config"

SEEDS = [7, 23, 1009]  # 7 is the tuning seed; 23/1009 untouched by tuning

PROFILES = [  # (tag, flagfile, beams)
    ("prof_16", "lo_gflag_list_16.txt", 16),
    ("prof_32", "lo_gflag_list_32.txt", 32),
    ("prof_64", "lo_gflag_list_64.txt", 64),
    ("prof_128", "lo_gflag_list_128.txt", 128),
    ("prof_mulran", "lo_gflag_list_mulran.txt", 64),
    ("prof_newer_college", "lo_gflag_list_newer_college.txt", 64),
    ("prof_ultrafast", "lo_gflag_list_kitti_ultrafast.txt", 0),
]


def build_jobs(frames: int, only: str):
    jobs = []
    if only in ("matrix", "all"):
        for world in ("urban", "highway", "dynamic"):
            for seed in SEEDS:
                for fog in (False, True):
                    tag = f"{world}_s{seed}{'_fog' if fog else ''}"
                    cmd = ["--world", world, "--seed", str(seed),
                           "--frames", str(frames)]
                    if fog:
                        cmd.append("--fog")
                    if world == "highway":
                        # the reference pairs sparse high-speed scenes
                        # with ITS OWN highway operating point
                        # (`lo_gflag_list_kitti_highway.txt` — larger
                        # beam budgets, no dynamic removal); using the
                        # urban flagfile on the highway world is a
                        # cross-profile mismatch the reference never
                        # recommends.  Still zero per-world edits: the
                        # named flagfile is used verbatim.
                        cmd += ["--skip_slam", "--config", os.path.join(
                            _CFG_DIR, "lo_gflag_list_kitti_highway.txt")]
                    jobs.append((tag, cmd))
        # round-5 rows (VERDICT r4 Next #5 / #2): the sparse regime gets a
        # BACK-END test — the closed interchange circuit runs full SLAM on
        # the highway flagfile (~1.12 km/lap; 560 frames re-traverse the
        # first ~110 m of mapped road) — and the deliberately KITTI-hard
        # urban world calibrates the matrix's difficulty
        for seed, fog in ((7, False), (23, False), (7, True)):
            tag = f"highway_loop_s{seed}{'_fog' if fog else ''}"
            cmd = ["--world", "highway_loop", "--seed", str(seed),
                   "--frames", str(max(frames, 560)),
                   "--config", os.path.join(
                       _CFG_DIR, "lo_gflag_list_kitti_highway.txt")]
            if fog:
                cmd.append("--fog")
            jobs.append((tag, cmd))
        # difficulty-calibration curve: three hardness levels of the same
        # world/seed; levels 2-3 run lax (cascades at extreme difficulty
        # are the measurement, not a defect)
        jobs.append(("urban_hard_s7",
                     ["--world", "urban_hard", "--seed", "7",
                      "--frames", str(frames)]))
        for lvl in (2, 3):
            jobs.append((f"urban_hard{lvl}_s7",
                         ["--world", "urban_hard", "--seed", "7",
                          "--hardness", str(lvl), "--frames", str(frames),
                          "--lax_health"]))
        jobs.append(("urban_hard_s23",
                     ["--world", "urban_hard", "--seed", "23",
                      "--frames", str(frames), "--lax_health"]))
    if only in ("disc", "all"):
        # discrimination tier (VERDICT r4 Missing #1): the repo's own
        # NDT/VGICP baselines and the ground-only feature ablation on the
        # SAME worlds — if they also score ~0.01 % the worlds measure
        # nothing; a sharp degradation makes the headline rows meaningful
        for world in ("urban", "dynamic"):
            for seed in SEEDS:
                base = ["--world", world, "--seed", str(seed),
                        "--frames", str(frames), "--lax_health"]
                for mode in ("ndt", "gicp"):
                    jobs.append((f"disc_{mode}_{world}_s{seed}",
                                 base + ["--baseline", mode]))
                jobs.append((f"disc_ablate_{world}_s{seed}",
                             base + ["--ablate_features"]))
        jobs.append(("disc_ndt_urban_hard_s7",
                     ["--world", "urban_hard", "--seed", "7",
                      "--frames", str(frames), "--lax_health",
                      "--baseline", "ndt"]))
    if only in ("profiles", "all"):
        for tag, flagfile, beams in PROFILES:
            cmd = ["--world", "urban", "--seed", "7",
                   "--frames", str(frames),
                   "--config", os.path.join(_CFG_DIR, flagfile)]
            if beams:
                cmd += ["--beams", str(beams)]
            jobs.append((tag, cmd))
        # round-5 (VERDICT r4 Weak #4): the newer_college flagfile in ITS
        # OWN regime — walking pace with handheld carry motion — to test
        # the "operating-point mismatch" hypothesis for the 3.99 m car-
        # speed end gap rather than leave it asserted
        jobs.append(("prof_newer_college_handheld",
                     ["--world", "urban", "--seed", "7",
                      "--frames", str(frames), "--beams", "64",
                      "--traj_step", "0.35", "--handheld", "--lax_health",
                      "--config", os.path.join(
                          _CFG_DIR, "lo_gflag_list_newer_college.txt")]))
    return jobs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="all",
                    choices=["matrix", "profiles", "disc", "all"])
    ap.add_argument("--frames", type=int, default=420)
    # a cold sensor-profile flagfile changes the compiled shapes: the
    # remote compile alone can take 5-10 min (prof_128 timed out at 1200)
    ap.add_argument("--timeout", type=float, default=2100.0)
    ap.add_argument("--out", default=os.path.join(_REPO, "docs",
                                                  "accuracy"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    jobs = build_jobs(args.frames, args.only)
    print(f"[matrix] {len(jobs)} runs", flush=True)
    results = {}
    for n, (tag, cmd) in enumerate(jobs):
        jpath = os.path.join(args.out, f"{tag}.json")
        if os.path.exists(jpath):
            with open(jpath) as f:
                results[tag] = json.load(f)
            print(f"[matrix] {tag}: cached", flush=True)
            continue
        t0 = time.time()
        full = [sys.executable,
                os.path.join(_HERE, "synthetic_accuracy_bench.py"),
                "--json_out", jpath] + cmd
        print(f"[matrix] ({n + 1}/{len(jobs)}) {tag} ...", flush=True)
        env = dict(os.environ)
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
        try:
            p = subprocess.run(full, timeout=args.timeout,
                               capture_output=True, text=True,
                               cwd=_REPO, env=env)
            ok = p.returncode == 0 and os.path.exists(jpath)
            if not ok:
                print(f"[matrix] {tag} FAILED rc={p.returncode}\n"
                      + (p.stdout or "")[-1500:]
                      + (p.stderr or "")[-1500:], flush=True)
                results[tag] = {"error": f"rc={p.returncode}"}
            else:
                with open(jpath) as f:
                    results[tag] = json.load(f)
        except subprocess.TimeoutExpired:
            print(f"[matrix] {tag} TIMEOUT", flush=True)
            results[tag] = {"error": "timeout"}
            # a killed TPU process leaves the tunnel session wedged for the
            # next ~2 min; starting immediately would cascade the failures
            # (.claude/skills/verify "wedge after kill")
            time.sleep(150)
        print(f"[matrix] {tag} done in {time.time() - t0:.0f}s", flush=True)

    # markdown table
    def row(tag, r):
        if "error" in r:
            return f"| {tag} | — | — | — | — | — | {r['error']} |"
        o = r.get("odometry", {})
        s = r.get("slam", {})
        return ("| {} | {:.3f} | {:.4f} | {} | {} | {} | {} |".format(
            tag, o.get("t_drift_pct", float("nan")),
            o.get("r_drift_deg_per_m", float("nan")),
            ("{:.3f}".format(s["t_drift_pct"]) if s else "—"),
            ("{:.3f}".format(s["end_gap_m"]) if s else "—"),
            r.get("loop_edges", "—"),
            r.get("odometry_failed_frames", 0)))

    lines = ["| run | odom drift % | odom deg/m | slam drift % | "
             "slam end-gap m | loop edges | failed frames |",
             "|---|---|---|---|---|---|---|"]
    for tag, _ in jobs:
        if tag in results:
            lines.append(row(tag, results[tag]))
    table = "\n".join(lines)
    with open(os.path.join(args.out, "MATRIX.md"), "w") as f:
        f.write(table + "\n")
    print(table, flush=True)
    bad = [t for t, r in results.items() if "error" in r]
    print(f"[matrix] complete, {len(bad)} failures: {bad}", flush=True)
    return 0 if not bad else 1


if __name__ == "__main__":
    main()
