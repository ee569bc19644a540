"""xprof xplane.pb parsing (pure-python protobuf fallback).

The axon tunnel's wall clock is NOT device time (CLAUDE.md: ~30 ms fixed
dispatch + slow transfers), so every perf claim in this repo is backed by
jax.profiler.trace → xplane.pb → the TPU planes parsed here.  Shared by
bench.py (device-time headline) and tools/train_step_profile.py
(op-category breakdown).

The reference logs only wall seconds per iteration (reference
train.py:343-345); device-level evidence is a TPU-native addition.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Tuple

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def parse_xplane_ops(trace_dir: str
                     ) -> Tuple[List[Tuple[str, float, int]], float]:
    """([(op_name, total_ms, n_events)] sorted by ms desc, module_ms) from
    the device 'XLA Ops' / 'XLA Modules' lines of the newest xplane.pb."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    agg: Dict[str, Tuple[float, int]] = {}
    module_ms = 0.0
    for plane in space.planes:
        if "TPU" not in plane.name or "Host" in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if "XLA Modules" in line.name:
                module_ms += sum(ev.duration_ps / 1e9 for ev in line.events)
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                ms, n = agg.get(name, (0.0, 0))
                agg[name] = (ms + ev.duration_ps / 1e9, n + 1)
    return (sorted(((k, v[0], v[1]) for k, v in agg.items()),
                   key=lambda t: -t[1]), module_ms)


def device_module_ms(trace_dir: str) -> float:
    """Total device 'XLA Modules' milliseconds in the newest trace — the
    executable's on-device span, the honest clock for throughput claims."""
    return parse_xplane_ops(trace_dir)[1]
