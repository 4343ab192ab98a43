"""Diff two bench.py JSON artifacts and flag per-query regressions.

Institutionalizes the round-2 rule: any query regressing more than
REGRESSION_FACTOR between rounds needs a written plan diff (PLANS.md)
or a fix before the round closes.

Usage: python tools/bench_diff.py OLD.json NEW.json [factor]
Exit code 1 if any unexplained regression exceeds the factor.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        return json.load(fh)["queries"]


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, new = load(old_path), load(new_path)
    common = sorted(set(old) & set(new))
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    ratio = f"{t_new / t_old:.2f}x" if t_old > 0 else "n/a"
    print(
        f"{len(common)} common queries: {t_old:.1f}s -> {t_new:.1f}s ({ratio})"
    )
    added = sorted(set(new) - set(old))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    removed = sorted(set(old) - set(new))
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    bad = []
    for q in common:
        # ignore sub-100ms jitter: a 0.04 -> 0.07 s flip is noise
        if new[q] > old[q] * factor and new[q] - old[q] > 0.1:
            bad.append(q)
            fx = f"{new[q] / old[q]:.2f}x" if old[q] > 0 else "from 0"
            print(f"  REGRESSION {q}: {old[q]:.2f}s -> {new[q]:.2f}s ({fx})")
    improved = [q for q in common if old[q] > new[q] * factor and old[q] - new[q] > 0.1]
    for q in sorted(improved, key=lambda q: old[q] - new[q], reverse=True)[:10]:
        print(f"  improved {q}: {old[q]:.2f}s -> {new[q]:.2f}s")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
