"""Profile the fused SAC update scan on the real chip and print where the
time goes, op by op.

Captures a jax.profiler trace around a few dispatches of the SAME
update-scan program bench.py measures (batch 256, 1536-pt walker clouds,
HBM replay, scan-16), converts the xplane with xprof's own converter, and
prints the HLO op-stats table aggregated by category and by op — the
"read a profile trace of the update scan" item from VERDICT round 3.

Usage:  timeout 900 python tools/exp_update_profile.py [out_dir]
(reuses an existing trace under out_dir if one is present; delete it to
re-capture)
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(out_dir: str):
    import jax

    import bench
    from pointcloud_rl_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    agent = bench.build_agent()
    mem = bench.device_memory()
    n = bench.GRAD_SCAN
    # compile + warm
    np.asarray(agent.update_parameters_scan(mem, n))
    t0 = time.monotonic()
    np.asarray(agent.update_parameters_scan(mem, n))
    print(f"# warm window: {n / (time.monotonic() - t0):.1f} updates/s", file=sys.stderr)

    with jax.profiler.trace(out_dir):
        vec = None
        for _ in range(4):
            v = agent.update_parameters_scan(mem, n)
            vec = v if vec is None else vec + v
        np.asarray(vec)
    return out_dir


def _gviz_rows(data):
    """xprof emits a gviz DataTable JSON: {'cols': [...], 'rows': [{'c': [{'v': ...}]}]}"""
    if isinstance(data, bytes):
        data = data.decode(errors="replace")
    tbl = json.loads(data)
    cols = [c["label"] for c in tbl["cols"]]
    out = []
    for r in tbl.get("rows", []):
        vals = [c.get("v") if isinstance(c, dict) else None for c in r["c"]]
        out.append(dict(zip(cols, vals)))
    return out


def report(out_dir: str, top: int = 45):
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True))
    assert paths, f"no xplane under {out_dir}"
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    rows = _gviz_rows(data)
    by_cat = {}
    for r in rows:
        t = float(r.get("Total self time (us)") or 0.0)
        by_cat[r.get("HLO op category", "?")] = by_cat.get(r.get("HLO op category", "?"), 0.0) + t
    total = sum(by_cat.values()) or 1.0
    print(f"== self time by HLO category (total {total/1e3:.1f} ms traced) ==")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{v / total * 100:6.2f}%  {v/1e3:9.2f} ms  {k}")
    print(f"\n== top {top} HLO ops by self time ==")
    rows.sort(key=lambda r: -float(r.get("Total self time (us)") or 0.0))
    for r in rows[:top]:
        t = float(r.get("Total self time (us)") or 0.0)
        bw = r.get("Bound by", "?")
        flops = r.get("Model GFLOP/s")
        occ = r.get("#Occurrences")
        name = (r.get("HLO op name") or "?")[:70]
        fw = (r.get("Framework op name") or "")[:80]
        print(f"{t / total * 100:6.2f}%  {t/1e3:8.3f} ms  x{occ:>4}  [{bw}] {flops and float(flops):>10} GF/s  {name}  | {fw}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pcrl_update_profile"
    if not glob.glob(os.path.join(out, "**", "*.xplane.pb"), recursive=True):
        capture(out)
    report(out)
