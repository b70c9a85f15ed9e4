#!/usr/bin/env python
"""Interleaved A/B of a Spark-conf set over selected bench legs.

Runs `bench.py --one <leg>` subprocesses alternating between the
baseline env and the candidate `SPARK_GRAFT_CONF`, two passes each
(the SCALING.md A/B protocol: interleaving absorbs host drift).

Usage:
  python tools_r13/ab_conf.py "<conf string>" leg1,leg2,... [runs_per_leg]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one(leg: str, conf: str | None, runs: int) -> dict:
    env = dict(os.environ)
    env["BENCH_RUNS"] = str(runs)
    env.pop("SPARK_GRAFT_CONF", None)
    if conf:
        env["SPARK_GRAFT_CONF"] = conf
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--one", leg],
        capture_output=True, text=True, check=True, env=env, timeout=900,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])[leg]


def main() -> None:
    conf = sys.argv[1]
    legs = sys.argv[2].split(",")
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    res: dict[str, dict] = {}
    for pas in (1, 2):
        for leg in legs:
            for label, c in (("base", None), ("cand", conf)):
                r = one(leg, c, runs)
                res.setdefault(leg, {}).setdefault(label, []).append(r)
                print(json.dumps({"pass": pas, "leg": leg, "arm": label, **r}), flush=True)
    print("== summary ==")
    for leg, arms in res.items():
        bmeds = sorted(x["med"] for x in arms["base"])
        cmeds = sorted(x["med"] for x in arms["cand"])
        print(json.dumps({"leg": leg, "base_meds": bmeds, "cand_meds": cmeds}))


if __name__ == "__main__":
    main()
