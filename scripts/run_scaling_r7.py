#!/usr/bin/env python
"""Round-7 scaling campaign: fused encode at (lo, hi) cores INTERLEAVED
with the pure-compute host-capacity control (scripts/capacity_curve.py)
so engine efficiency and the machine's same-window ceiling come from the
same weather.  Writes .benchdata/scaling.json in the shape bench.py's
frozen reader consumes (campaigns[].scaling_efficiency /
.host_capacity_efficiency), stamped with "scaling_round": 7
(VERDICT r6 'Next round' #5).

Usage: python scripts/run_scaling_r7.py [lo hi [rounds]]
Requires the pre-materialized 4B-token input
(.benchdata/tokens4b.parquet, scripts/gen_scaling_input.py).
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import capacity_curve  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
TOKENS = str(REPO / ".benchdata" / "tokens4b.parquet")


def encode_once(cores: int) -> dict:
    env = {"SCALING_FUSED": "1", "SKIP_UDF_METRICS": "1",
           "SCALING_REPS": "2"}
    import os
    full = dict(os.environ, **env)
    r = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--encode-only",
         "--cores", str(cores), "--tokens-path", TOKENS],
        capture_output=True, text=True, check=True, env=full)
    return json.loads(r.stdout.strip().splitlines()[-1])


def campaign(lo: int, hi: int, rounds: int) -> dict:
    enc = {lo: None, hi: None}
    cap = {lo: 0.0, hi: 0.0}
    for _ in range(rounds):
        for c in (lo, hi):
            cap[c] = max(cap[c], capacity_curve.measure(c))
            r = enc_r = encode_once(c)
            if enc[c] is None or enc_r["tokens_per_sec"] > \
                    enc[c]["tokens_per_sec"]:
                enc[c] = r
    eff = (enc[hi]["tokens_per_sec"] / enc[lo]["tokens_per_sec"]) \
        / (hi / lo)
    hc = (cap[hi] / cap[lo]) / (hi / lo)
    return {"from_cores": lo, "to_cores": hi,
            "scaling_efficiency": round(eff, 3),
            "host_capacity_efficiency": round(hc, 3),
            "scaling_round": 7,
            "tokens": enc[lo]["tokens"],
            "fused": True, "reps": 2, "rounds": rounds,
            "encode": {str(c): {"seconds": round(enc[c]["seconds"], 2),
                                "tokens_per_sec":
                                    round(enc[c]["tokens_per_sec"], 0)}
                       for c in (lo, hi)},
            "capacity_elem_iters_per_sec": {
                str(c): round(cap[c] / 1e6, 1) for c in (lo, hi)}}


def main() -> None:
    args = [int(a) for a in sys.argv[1:]]
    pairs = [(args[0], args[1])] if len(args) >= 2 else [(2, 8), (4, 16)]
    rounds = args[2] if len(args) >= 3 else 2
    camps = []
    t0 = time.perf_counter()
    for lo, hi in pairs:
        camps.append(campaign(lo, hi, rounds))
        print(json.dumps(camps[-1]), flush=True)
    out = {"scaling_round": 7,
           "input_tokens": camps[0]["tokens"],
           "methodology": "fused encode_files on the pre-materialized "
                          "4B-token input, interleaved with the "
                          "pure-numpy host-capacity control in the same "
                          "window; best-of per level across rounds",
           "wall_s": round(time.perf_counter() - t0, 1),
           "campaigns": camps}
    (REPO / ".benchdata" / "scaling.json").write_text(json.dumps(out,
                                                                 indent=1))
    print("wrote .benchdata/scaling.json")


if __name__ == "__main__":
    main()
