"""Batch ablation-matrix eval driver (parity: deepFEPE/run_eval_good.py).

The reference's driver (:35-386) holds a dict of named checkpoints per
dataset, rewrites a base eval config per ablation cell (modes: deepF-only /
SP pair / SIFT / SP-only), checks artifact existence, and launches one
subprocess per cell. Same shape here, minus the cluster scp/kubectl
shuttling (single-host storage assumed):

  python -m deepfepe_tpu.run_eval --config configs/synthetic_baseline.yaml \
      --ablation ablations.yaml --out logs/ablation

Ablation YAML: {name: {pretrained: ..., overrides: {model: {...}, ...}}}.
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import subprocess
import sys
from pathlib import Path

import yaml


def update_config(base: dict, overrides: dict) -> dict:
    """Recursive config rewrite (ref: run_eval_good.update_config :35-66)."""
    out = copy.deepcopy(base)

    def merge(d, u):
        for k, v in u.items():
            if isinstance(v, dict) and isinstance(d.get(k), dict):
                merge(d[k], v)
            else:
                d[k] = v

    merge(out, overrides)
    return out


def check_exist(entries: dict, out_dir: str) -> dict:
    """Artifact existence report (ref: --check_exist / --check_output)."""
    report = {}
    for name, spec in entries.items():
        ck = spec.get("pretrained", "")
        report[name] = {
            "checkpoint": (not ck) or os.path.isfile(ck),
            "results": os.path.isfile(
                os.path.join(out_dir, name, "DeepF_err_ratio.npz")
            ),
        }
    return report


def run_ablations(
    base_config_path: str,
    ablation_path: str,
    out_dir: str,
    max_batches: int = 0,
    dry_run: bool = False,
):
    with open(base_config_path) as f:
        base = yaml.safe_load(f)
    with open(ablation_path) as f:
        entries = yaml.safe_load(f)

    os.makedirs(out_dir, exist_ok=True)
    results = {}
    for name, spec in entries.items():
        cfg = update_config(base, spec.get("overrides", {}))
        tmp_cfg = Path(out_dir) / f"temp_config_{name}.yaml"
        with open(tmp_cfg, "w") as f:
            yaml.safe_dump(cfg, f)
        cmd = [
            sys.executable, "-m", "deepfepe_tpu.cli", "eval_good",
            str(tmp_cfg), f"{Path(out_dir).name}/{name}",
        ]
        if spec.get("pretrained"):
            cmd += ["--pretrained", spec["pretrained"]]
        if max_batches:
            cmd += ["--max_batches", str(max_batches)]
        print("+", " ".join(cmd), flush=True)
        if dry_run:
            results[name] = {"cmd": cmd}
            continue
        # One fresh process per cell, as the reference does (:378-384).
        proc = subprocess.run(cmd, capture_output=True, text=True)
        last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        try:
            results[name] = json.loads(last[-1]) if last else {
                "error": proc.stderr[-500:]
            }
        except json.JSONDecodeError:
            results[name] = {"error": proc.stderr[-500:]}
        print(name, "->", results[name], flush=True)

    with open(Path(out_dir) / "ablation_results.json", "w") as f:
        json.dump(results, f, indent=2)
    return results


def main(argv=None):
    p = argparse.ArgumentParser("deepfepe_tpu.run_eval")
    p.add_argument("--config", required=True)
    p.add_argument("--ablation", required=True)
    p.add_argument("--out", default="logs/ablation")
    p.add_argument("--max_batches", type=int, default=0)
    p.add_argument("--check_exist", action="store_true")
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args(argv)
    if args.check_exist:
        with open(args.ablation) as f:
            entries = yaml.safe_load(f)
        print(json.dumps(check_exist(entries, args.out), indent=2))
        return
    return run_ablations(
        args.config, args.ablation, args.out, args.max_batches, args.dry_run
    )


if __name__ == "__main__":
    main()
