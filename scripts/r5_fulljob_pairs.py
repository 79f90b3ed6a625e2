#!/usr/bin/env python3
"""r5 full-job pinned pairs at 480k docs (judge items 5+6 evidence).

Runs job.build_graph (extract -> link -> materialize all stages) via
taskset-pinned spark-submit legs: the 4 vs 16 pair (completing the
full-job scaling matrix) and the 2 vs 8 pair (comparable to r4's
0.738 at 480k, after the bucket-aligned-writes fix).  Uses
scaling_bench's measure_pair machinery; does NOT overwrite
BENCH/BASELINE.md — results are printed as JSON lines and merged into
the doc by hand with window context.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import scaling_bench as sb  # noqa: E402

N_DOCS = 480_000


def main():
    pyfiles = sb.build_zip()
    for base in (4, 2):
        lo, hi, eff = sb.measure_pair(base, N_DOCS, pyfiles, link=False,
                                      rounds=1, build_graph=True)
        print(json.dumps({"pair": f"{base}->{base * 4}",
                          "n_docs": N_DOCS, "eff": round(eff, 3),
                          "lo": lo, "hi": hi}), flush=True)


if __name__ == "__main__":
    main()
