#!/usr/bin/env python3
"""Round-over-round bench sidecar comparison.

Usage: python3 tools/sidecar_diff.py BENCH_STATS_rA_final.json BENCH_STATS_rB_final.json

Reads two stats sidecars (one JSON object per line, as Bench streams
them), reports:
  - per-file canary (host speed at recording time) and the implied
    host-scale ratio, when both files carry a canary row (r15+);
  - common-query totals raw AND canary-normalized;
  - movers up/down beyond 1.5x and 0.5 s, with their suspect labels —
    a mover that was labeled suspect in its own run is already
    adjudicated as non-evidence;
  - alphabetical clustering of the up-movers (contiguous schedule
    windows are the classic co-tenant contamination signature, see
    README round-13/15 notes).

The same median convention as BenchGuard (upper median).
"""
import json
import sys


def load(path):
    medians, suspects, canary = {}, set(), None
    with open(path) as f:
        for line in f:
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if canary is None and "canary_mt" in d:
                canary = d["canary_mt"]
            walls = d.get("walls")
            if d.get("query") and walls:
                w = sorted(walls)
                medians[d["query"]] = w[len(w) // 2]
                if d.get("suspect"):
                    suspects.add(d["query"])
    return medians, suspects, canary


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    (a, sa, ca), (b, sb, cb) = load(sys.argv[1]), load(sys.argv[2])
    common = sorted(set(a) & set(b))
    print(f"A: {sys.argv[1]}  ({len(a)} queries, canary_mt={ca})")
    print(f"B: {sys.argv[2]}  ({len(b)} queries, canary_mt={cb})")
    scale = (cb / ca) if (ca and cb) else None
    if scale:
        print(f"host-scale B/A from canary: {scale:.3f}")
    ta = sum(a[q] for q in common)
    tb = sum(b[q] for q in common)
    print(f"common {len(common)}: A={ta:.1f}s  B={tb:.1f}s  "
          f"ratio={tb / ta:.3f}" +
          (f"  canary-normalized={tb / ta / scale:.3f}" if scale else ""))
    only_a, only_b = sorted(set(a) - set(b)), sorted(set(b) - set(a))
    if only_a:
        print(f"only in A ({len(only_a)}): {', '.join(only_a[:8])}"
              + (" …" if len(only_a) > 8 else ""))
    if only_b:
        print(f"only in B ({len(only_b)}): {', '.join(only_b[:8])}"
              + (" …" if len(only_b) > 8 else ""))

    def movers(hi, lo, hi_s, tag):
        # always printed A -> B regardless of direction
        out = [(hi[q] / max(lo[q], 1e-3), a[q], b[q], q) for q in common
               if hi[q] > lo[q] * 1.5 and hi[q] - lo[q] > 0.5]
        out.sort(reverse=True)
        if out:
            print(f"{tag} (>1.5x and >0.5s): {len(out)}")
            for r, va, vb, q in out[:20]:
                lab = "  [suspect in its run]" if q in hi_s else ""
                print(f"  {q}: {va:.2f} -> {vb:.2f}  ({r:.2f}x){lab}")
    movers(b, a, sb, "UP in B")
    movers(a, b, sa, "DOWN in B")
    if sa:
        print(f"suspect rows in A: {sorted(sa)}")
    if sb:
        print(f"suspect rows in B: {sorted(sb)}")


if __name__ == "__main__":
    main()
