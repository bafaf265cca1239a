"""Capture a jax.profiler trace of the production training step and print
an op-level time breakdown (top-K fusions by device time).

    python bench_profile.py [--variant prod] [--top 30]

Parses the xplane proto directly (the proto bindings ship with the
baked-in tensorflow) — no TensorBoard session needed.  Run with
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if the C++ protobuf
rejects the generated code.  If the axon tunnel backend cannot capture
device traces, says so instead of guessing.
"""

from __future__ import annotations

import argparse
import glob
import os
import tempfile
from collections import defaultdict


def summarize_xspace(path: str, top: int = 30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    device_planes = [p for p in xspace.planes
                     if "TPU" in p.name or "device" in p.name.lower()]
    if not device_planes:
        print("no device planes captured (tunnel backend may not support "
              "device tracing); host planes:",
              [p.name for p in xspace.planes])
        return None

    def is_container(name: str) -> bool:
        # module/loop/launch rows double-count their children
        return (name.startswith(("jit_", "%while", "%conditional"))
                or name.isdigit())

    totals: dict = defaultdict(float)
    for plane in device_planes:
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                if is_container(name):
                    continue
                totals[name] += ev.duration_ps / 1e9  # -> ms
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])
    total_ms = sum(totals.values())
    print(f"device planes: {[p.name for p in device_planes]}")
    print(f"total leaf-op device time: {total_ms:.1f} ms "
          f"(all steps in trace)")
    for name, ms in ranked[:top]:
        print(f"  {ms:10.2f} ms  {100 * ms / total_ms:5.1f}%  {name[:110]}")
    return ranked


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="prod")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default=None,
                    help="trace dir (default: temp dir)")
    args = ap.parse_args()

    import jax

    from bench_step import build

    state, batch, run_n, _ = build(args.variant)
    key = jax.random.PRNGKey(0)
    st = run_n(state, batch, key)  # compile outside the trace
    float(jax.numpy.asarray(st.step))

    out = args.out or tempfile.mkdtemp(prefix="a3t_trace_")
    with jax.profiler.trace(out):
        st = run_n(state, batch, key)
        float(jax.numpy.asarray(st.step))

    paths = glob.glob(os.path.join(out, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print(f"no xplane captured under {out}")
        return
    summarize_xspace(max(paths, key=os.path.getmtime), args.top)


if __name__ == "__main__":
    main()
