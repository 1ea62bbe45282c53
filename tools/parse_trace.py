"""Summarize a jax.profiler xplane trace: top ops by TPU time.

Usage: python tools/parse_trace.py <trace_dir>
Finds the newest *.xplane.pb under the dir, aggregates XLA op durations on
the device planes, and prints the top-N rows with self-time percentages.
Works with the tsl xplane proto bundled in tensorflow.
"""

from __future__ import annotations

import collections
import glob
import os
import sys


def load_xspace(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def _opcode(name: str) -> str:
    """Rough HLO opcode class from the event name."""
    n = name.split("=", 1)[-1].strip() if "=" in name else name
    for key in ("convolution", "fusion", "copy-start", "copy-done", "copy",
                "all-reduce", "reduce", "dot", "custom-call", "transpose",
                "select-and-scatter", "scatter", "gather", "sort", "iota",
                "dynamic-slice", "dynamic-update-slice", "bitcast", "rng"):
        if n.startswith("%" + key) or f" {key}(" in n or n.startswith(key):
            return key
    return n.split("(")[0][:32]


def newest_xplane(trace_dir: str) -> str | None:
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    return paths[-1] if paths else None


def total_device_ms(trace_dir: str) -> float:
    """Total device XLA-op time (ms) across the newest trace under dir.

    The programmatic form of :func:`summarize`'s headline number — used by
    ``tools/roofline_configs.py`` to derive device ms/step (wall timing
    through the tunneled relay includes ~5 ms/step of streaming overhead;
    BASELINE.md measurement caveat).
    """
    path = newest_xplane(trace_dir)
    if path is None:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = load_xspace(path)
    total = 0
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                if "copy-start" in ev_meta.get(ev.metadata_id, "?"):
                    continue
                total += ev.duration_ps
    return total / 1e12 * 1000


def summarize(path: str, top: int = 40):
    xs = load_xspace(path)
    rows = collections.Counter()
    classes = collections.Counter()
    total = 0
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            # XLA op lines carry per-op events; step lines etc. are skipped
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                if "copy-start" in name:
                    continue  # async spans: duration != occupancy
                dur = ev.duration_ps
                rows[name] += dur
                classes[_opcode(name)] += dur
                total += dur
    print(f"total device op time: {total/1e12*1000:.2f} ms (all steps in trace)")
    print("\n== by opcode class ==")
    for name, dur in classes.most_common(15):
        print(f"{dur/total*100:6.2f}%  {dur/1e12*1000:8.3f} ms  {name}")
    print("\n== top individual ops ==")
    for name, dur in rows.most_common(top):
        print(f"{dur/total*100:6.2f}%  {dur/1e12*1000:8.3f} ms  {name[:120]}")


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else ".scratch/trace"
    paths = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True),
                   key=os.path.getmtime)
    if not paths:
        print(f"no xplane.pb under {root}")
        return 1
    print("parsing", paths[-1])
    summarize(paths[-1])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
