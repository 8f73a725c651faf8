#!/usr/bin/env python
"""Dump the compiled HLO of the phase-2 train step and summarize the
fusions whose base names dominate the trace (scripts/trace_step.py), so
glue time is attributable to actual expressions/shapes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/hlo_dump.py
       [--out /tmp/p2_step.hlo.txt]
"""

import argparse
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/p2_step.hlo.txt")
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()

    import bench

    photo_step, state, packed = bench.build(
        args.batch, use_fused_train=True, phase2=True)
    compiled = photo_step.lower(state, packed).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB to {args.out}")

    # summarize: every fusion instruction with its kind and root op line
    for m in re.finditer(
            r"^\s*%?(?P<name>[\w.\-]*fusion[\w.\-]*)\s*=\s*(?P<shape>\S+)"
            r"\s+fusion\((?P<args>[^)]*)\), kind=(?P<kind>\w+), "
            r"calls=%?(?P<calls>[\w.\-]+)", txt, re.M):
        print(f"{m.group('name'):48s} {m.group('shape'):34s} "
              f"kind={m.group('kind'):8s} calls={m.group('calls')}")


if __name__ == "__main__":
    main()
