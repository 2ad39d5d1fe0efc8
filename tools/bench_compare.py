"""Compare two bench JSONs entry-by-entry (r13 optimization evidence).

Usage: python tools/bench_compare.py BEFORE.json AFTER.json
Prints per-entry before/after/ratio sorted by absolute delta, plus totals
and the machine stamps of both runs.
"""
import json
import sys


def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb), key=lambda k: qa[k] - qb.get(k, 0), reverse=True)
    print(f"{'entry':36} {'before':>7} {'after':>7} {'ratio':>6}")
    # timings are rounded to 3 decimals at the source, so a sub-millisecond
    # baseline entry would divide by zero — clamp instead of crashing
    def ratio(k):
        return qb[k] / max(qa[k], 1e-6)

    for k in shared:
        print(f"{k:36} {qa[k]:7.3f} {qb[k]:7.3f} {ratio(k):6.2f}")
    ta, tb = sum(qa[k] for k in shared), sum(qb[k] for k in shared)
    print(f"{'TOTAL (shared)':36} {ta:7.3f} {tb:7.3f} {tb/max(ta, 1e-6):6.2f}")
    import statistics
    print("median ratio:", round(statistics.median(ratio(k) for k in shared), 3))
    for tag, d in (("before", a), ("after", b)):
        m, mp = d.get("machine", {}), d.get("machine_post", {})
        print(f"{tag}: pre loadavg={m.get('loadavg')} cpu_micro={m.get('cpu_micro_sec')}"
              f" | post loadavg={mp.get('loadavg')}")


if __name__ == "__main__":
    main()
