"""Exact-match accuracy aggregator with per-type breakdown.

Counterpart of reference scripts/eval_acc.py (plus the merge step of the
shard-and-merge launchers, scripts/eval/egoschema.sh:37-48).
"""

from __future__ import annotations

import argparse
import collections
import json
from typing import Dict, Iterable, List, Tuple


def merge_shards(paths: Iterable[str], dst: str) -> str:
    """Concatenate per-shard JSONL files (the launchers' `cat` step)."""
    with open(dst, "w") as out:
        for p in paths:
            with open(p) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        out.write(line + "\n")
    return dst


def compute_accuracy(path: str) -> Tuple[float, Dict[str, float], int]:
    acc, total = 0, 0
    type_dct: Dict[str, List[int]] = collections.defaultdict(list)
    with open(path) as f:
        for line in f:
            res = json.loads(line)
            answer = res["answer"]
            text = res["pred"].strip(".")
            correct = int(answer == text)
            acc += correct
            total += 1
            if "type" in res:
                type_dct[str(res["type"])].append(correct)
    overall = acc / max(total, 1)
    per_type = {k: sum(v) / len(v) for k, v in type_dct.items()}
    return overall, per_type, total


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", type=str, required=True)
    parser.add_argument("--dst", type=str, default=None)
    args = parser.parse_args()
    overall, per_type, total = compute_accuracy(args.src)
    print("Accuracy: ", overall)
    for tpidx, tpacc in per_type.items():
        print(f"Accuraccy for Type {tpidx}: {tpacc}")
    if args.dst:
        with open(args.dst, "w") as f:
            json.dump({"accuracy": overall, "per_type": per_type, "n": total}, f)


if __name__ == "__main__":
    main()
