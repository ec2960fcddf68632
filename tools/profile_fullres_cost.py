"""Roofline accounting for the full-res joint step (VERDICT r2 weak #1).

Compares XLA's own cost model (flops / bytes accessed from
compiled.cost_analysis()) against measured step time, to separate
"HBM-bandwidth physics" from implementation slack: if
bytes_accessed / 819 GB/s ~= measured time, the step is at the bandwidth
roofline for the schedule XLA chose; if measured time is much larger,
there is implementation headroom (layout copies, serialization).

    python tools/profile_fullres_cost.py [--fullres]
Prints one JSON line per variant with flops, bytes, roofline ms, measured ms.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import profile_joint as pj  # noqa: E402  (tools/ sibling)

V5E_PEAK_TFLOPS = 197e12
V5E_HBM_BPS = 819e9


def main():
    variants = [
        ("full", {}),
        ("sp_frozen", {"sp_stopgrad_offsets": True,
                       "sp_stopgrad_desc": True,
                       "cut_sp_entirely": True}),
    ]
    for name, kw in variants:
        step, state, batch, restore = pj.build_step(**kw)
        try:
            lowered = step.lower(state, batch, 0.1, 0.5)
            compiled = lowered.compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            nbytes = float(ca.get("bytes accessed", 0.0))
            # breakdown of bytes by space if present
            extra = {k: float(v) for k, v in ca.items()
                     if "bytes accessed" in k and k != "bytes accessed"}
            dt = pj.time_step(step, state, batch)
        finally:
            restore()
        print(json.dumps({
            "variant": name,
            "measured_ms": round(dt * 1e3, 2),
            "flops_per_step_G": round(flops / 1e9, 1),
            "bytes_per_step_GB": round(nbytes / 1e9, 3),
            "compute_roofline_ms": round(flops / V5E_PEAK_TFLOPS * 1e3, 2),
            "hbm_roofline_ms": round(nbytes / V5E_HBM_BPS * 1e3, 2),
            "mfu_pct": round(flops / dt / V5E_PEAK_TFLOPS * 100, 1),
            "hbm_util_pct": round(nbytes / dt / V5E_HBM_BPS * 100, 1),
            "bytes_extra": extra,
        }), flush=True)


if __name__ == "__main__":
    main()
