"""Capture + summarize an xprof trace of the full-res joint step.

Writes the trace under experiments/trace_fullres/, then parses the
xplane.pb with tensorboard_plugin_profile into per-HLO-op time stats and
prints the top ops by self time — the ground truth for where the 90 GB
of HBM traffic (tools/profile_fullres_cost.py) actually goes.

    python tools/trace_fullres.py [--fullres]
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import profile_joint as pj  # noqa: E402

TRACE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments", "trace_fullres")


def main():
    import numpy as np
    import jax

    step, state, batch, restore = pj.build_step()
    try:
        for _ in range(3):
            state, m = step(state, batch, 0.1, 0.5)
        float(np.asarray(m["loss"]))
        with jax.profiler.trace(TRACE_DIR):
            for _ in range(5):
                state, m = step(state, batch, 0.1, 0.5)
            float(np.asarray(m["loss"]))
    finally:
        restore()

    paths = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True))
    print(f"# trace: {paths}", file=sys.stderr)
    if not paths:
        print(json.dumps({"error": "no xplane.pb captured"}))
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("hlo_stats", "framework_op_stats"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [paths[-1]], tool, {})
            out = os.path.join(TRACE_DIR, f"{tool}.out")
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print(f"# wrote {out} ({len(data)} bytes)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# {tool} failed: {e!r}", file=sys.stderr)


if __name__ == "__main__":
    main()
