"""Export a trained policy for the CPM lab.

Parity with reference `scripts/export_for_lab.py` (fixing its stale 4-tuple
unpack, SURVEY §7 quirks): serializes the policy parameters plus the full
run-parameter JSON so the lab runtime can reload them standalone.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_path", help="trained model directory")
    ap.add_argument("--out_dir", default="outputs/lab_export")
    args = ap.parse_args()

    from sigmarl_tpu.config import Parameters
    from sigmarl_tpu.rl import checkpoint as ckpt

    sidecars = sorted(
        f for f in os.listdir(args.model_path) if f.endswith("_data.json")
    )
    with open(os.path.join(args.model_path, sidecars[-1])) as f:
        data = json.load(f)
    parameters = Parameters.from_dict(data["parameters"])
    parameters.where_to_save = os.path.dirname(args.model_path.rstrip("/")) + "/"
    parameters.model_name = os.path.basename(args.model_path.rstrip("/"))
    params = ckpt.load_best(parameters)

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "policy.pkl"), "wb") as f:
        pickle.dump(params["policy"], f)
    with open(os.path.join(args.out_dir, "parameters.json"), "w") as f:
        json.dump(data["parameters"], f, indent=1)
    print(f"exported policy + parameters to {args.out_dir}")


if __name__ == "__main__":
    main()
