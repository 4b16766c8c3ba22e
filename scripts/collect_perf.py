#!/usr/bin/env python
"""Collect the round-4 TPU queue's logs into a PERF.md-ready summary.

Reads docs/r4_tpu_runs/*.log (written by scripts/tpu_round4.sh), pulls
the final JSON line out of each harness log, and prints a markdown
fragment plus the raw JSON blobs. Purely a log parser — no TPU access.

    python scripts/collect_perf.py [dir]
"""

from __future__ import annotations

import json
import os
import re
import sys


def last_json(path: str):
    """Last parseable JSON object line in a log."""
    out = None
    try:
        with open(path, "r", errors="replace") as f:
            for line in f:
                line = line.strip()
                if line.startswith("{") and line.endswith("}"):
                    try:
                        out = json.loads(line)
                    except json.JSONDecodeError:
                        pass
    except OSError:
        return None
    return out


def all_json(path: str):
    res = []
    try:
        with open(path, "r", errors="replace") as f:
            for line in f:
                line = line.strip()
                if line.startswith("{") and line.endswith("}"):
                    try:
                        res.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
    except OSError:
        pass
    return res


def main() -> None:
    d = sys.argv[1] if len(sys.argv) > 1 else "docs/r4_tpu_runs"
    print(f"## Round-4 TPU measurements (collected from {d})\n")

    for name, title in (("bench_4096", "Headline @4096 (post-IR+deal migration, write-combining on)"),
                        ("bench_65k", "Headline @65,536 rooms"),
                        ("bench_policy", "Policy-in-the-loop @16,384")):
        j = last_json(os.path.join(d, f"{name}.log"))
        if j:
            print(f"- **{title}**: `{json.dumps(j)}`")
        else:
            print(f"- **{title}**: NOT CAPTURED")
    print()

    for log_name, label in (("ab_writes", "werewolf"),
                            ("ab_writes_storm", "storm-forge")):
        j = last_json(os.path.join(d, f"{log_name}.log"))
        print(f"### Write-combining / statement-order A/B ({label})")
        if j:
            rows = [(k.replace("_us_per_step", ""), v)
                    for k, v in j.items() if k.endswith("_us_per_step")]
            print("| variant | us/step | env steps/s |")
            print("|---|---|---|")
            for k, v in rows:
                print(f"| {k} | {v} | {j.get(k + '_env_steps_per_s', '?')} |")
            print(f"\nraw: `{json.dumps(j)}`")
        else:
            print("NOT CAPTURED")
        print()

    games = all_json(os.path.join(d, "bench_games.log"))
    print("### Per-game breadth")
    if games:
        print("| game | us/step | M steps/s |")
        print("|---|---|---|")
        for g in games:
            if "game" in g:
                print(f"| {g['game']} | {g.get('us_per_step', '?')} | "
                      f"{g.get('msteps_per_s', g.get('env_steps_per_s', '?'))} |")
    else:
        print("NOT CAPTURED")
    print()

    j = last_json(os.path.join(d, "ab_async.log"))
    print("### Async learner A/B")
    print(f"`{json.dumps(j)}`" if j else "NOT CAPTURED")
    print()

    j = last_json(os.path.join(d, "chat_lm_r4.log"))
    print("### Grounded chat-LM retrain")
    print(f"`{json.dumps(j)}`" if j else "NOT CAPTURED")
    mpath = "docs/checkpoints/chat_lm_r4.metrics.json"
    if os.path.exists(mpath):
        with open(mpath) as f:
            print(f"metrics file: `{f.read().strip()}`")


if __name__ == "__main__":
    main()
