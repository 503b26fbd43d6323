"""Compare two bench JSON records (same-day code A/B): per-query
ratios on the common basis, flagged rows beyond 1.25x + spread."""
import json
import sys


def load(p):
    with open(p) as fh:
        return json.loads(fh.readline())


def main(a_path, b_path):
    a, b = load(a_path), load(b_path)
    qa, qb = a["queries"], b["queries"]
    sa, sb = a.get("noise_spread_sec", {}), b.get("noise_spread_sec", {})
    common = sorted(set(qa) & set(qb))
    ratios = []
    flagged = []
    for n in common:
        if qa[n] <= 0:
            continue
        r = qb[n] / qa[n]
        ratios.append((r, n))
        spread = max(sa.get(n, 0.0), sb.get(n, 0.0))
        if qb[n] > qa[n] * 1.25 + spread:
            flagged.append((r, n, qa[n], qb[n], spread))
    ratios.sort()
    med = ratios[len(ratios) // 2][0]
    ta = sum(qa[n] for n in common)
    tb = sum(qb[n] for n in common)
    print(f"common rows: {len(common)}")
    print(f"A total {ta:.2f}s (load {a.get('host_loadavg_1m')}), "
          f"B total {tb:.2f}s (load {b.get('host_loadavg_1m')})")
    print(f"B/A total ratio {tb/ta:.3f}, per-query median {med:.3f}")
    print("\nflagged (B > 1.25*A + spread):")
    for r, n, va, vb, s in sorted(flagged, reverse=True):
        print(f"  {n}: {va:.2f} -> {vb:.2f} ({r:.2f}x, spread {s:.2f})")
    print("\nbest 8 (B faster):")
    for r, n in ratios[:8]:
        print(f"  {n}: {qa[n]:.2f} -> {qb[n]:.2f} ({r:.2f}x)")
    print("\nworst 8:")
    for r, n in ratios[-8:]:
        print(f"  {n}: {qa[n]:.2f} -> {qb[n]:.2f} ({r:.2f}x)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
