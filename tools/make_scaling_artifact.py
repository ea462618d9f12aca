"""Assemble SCALING_r04.json — the committed multi-sequence scaling
artifact (round-2 VERDICT Missing #2 / Next #3).

Three measurements, each answering the part of the scaling question this
single-chip container can honestly answer:

1. streamed_tpu: `tools/scaling_bench.py` on the real chip — aggregate
   fps of the FULL streamed pipeline at S = 1,2,4,8 sequences batched on
   ONE chip.  Upper-bounded by chip compute + tunnel H2D; this is the
   end-to-end fleet number a user sees per chip.
2. device_tpu: `tools/perf_probe_multiseq_device.py` — device-side
   batching curve with inputs pre-staged (no tunnel): how much of the
   chip's compute each extra co-resident sequence costs.  On a MULTI-chip
   mesh each chip holds S/n_chips sequences, so per-chip efficiency at
   small S is the multi-chip operating point.
3. virtual_mesh_cpu: 8-virtual-device CPU mesh run — proves the
   shard_map program compiles + executes + stays healthy on an 8-device
   mesh.  Wall-clock efficiency there measures HOST CORE CONTENTION (all
   virtual devices share one CPU), not interconnect scaling, and is
   labeled as such.

The multiseq program is data-parallel with ZERO cross-sequence
collectives (`parallel/multiseq.py` shard_map in/out specs P("data") and
no psum/all_gather inside), so multi-chip scaling is bounded by input
feed and per-chip batching — both measured above — not by ICI traffic.

Usage: python tools/make_scaling_artifact.py [--out SCALING_r03.json]
           [--cpu_json /tmp/scaling_cpu8.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)


def run_json(cmd, timeout, tag):
    print(f"[artifact] {tag}: {' '.join(cmd)}", flush=True)
    try:
        p = subprocess.run(cmd, timeout=timeout, capture_output=True,
                           text=True, cwd=_REPO)
    except subprocess.TimeoutExpired:
        return {"error": "timeout"}
    # last JSON-looking line of stdout
    for line in reversed((p.stdout or "").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return {"error": f"rc={p.returncode}",
            "tail": (p.stdout or "")[-800:] + (p.stderr or "")[-800:]}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(_REPO,
                                                  "SCALING_r04.json"))
    ap.add_argument("--cpu_json", default="/tmp/scaling_cpu8.json")
    ap.add_argument("--frames", type=int, default=48)
    args = ap.parse_args()

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    streamed = run_json(
        [sys.executable, os.path.join(_HERE, "scaling_bench.py"),
         "--frames", str(args.frames), "--seqs", "1,2,4,8"],
        3000, "streamed_tpu")

    device = run_json(
        [sys.executable,
         os.path.join(_HERE, "perf_probe_multiseq_device.py"),
         "--seqs", "1,2,4,8"], 2400, "device_tpu")

    cpu = None
    if os.path.exists(args.cpu_json):
        with open(args.cpu_json) as f:
            cpu = json.load(f)

    out = {
        "round": 4,
        "streamed_tpu_single_chip": streamed,
        "device_side_tpu_single_chip": device,
        "virtual_mesh_8dev_cpu": cpu,
        "notes": [
            "One physical TPU chip is available via a tunnel; true "
            "multi-chip wall-clock cannot be measured in this container.",
            "The multiseq program is data-parallel with zero "
            "cross-sequence collectives (shard_map, P('data') in/out, no "
            "psum): multi-chip scaling is bounded by per-chip batching "
            "(device_side curve) and host feed (prefetched producer "
            "thread), not ICI traffic.",
            "virtual_mesh_8dev_cpu proves the 8-device mesh program "
            "compiles/executes/stays healthy; its wall-clock efficiency "
            "measures host-core contention (8 virtual devices share one "
            "CPU), not interconnect scaling.",
        ],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out)[:2000], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
