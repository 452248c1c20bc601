"""CLI entry point: python run.py --config configs/<dataset>/<scene>.yaml

API parity with the reference entry (run.py:121-156): loads the YAML config
(with inherit_from chaining), applies --input_folder/--output overrides,
archives the merged config to the output directory, then runs the online
SLAM pipeline (tracking + mapping + final mesh/ATE outputs).
"""

import argparse
import json
import os

from remixfusion_tpu.config import load_config
from remixfusion_tpu.slam import RemixFusionTPU
from remixfusion_tpu.utils.runtime import setup_compilation_cache

setup_compilation_cache()


def main():
    print("=" * 60)
    print("remixfusion_tpu starting...")
    print("=" * 60)
    parser = argparse.ArgumentParser(
        description="TPU-native online RGB-D reconstruction")
    parser.add_argument("--config", type=str, required=True,
                        help="Path to config file.")
    parser.add_argument("--input_folder", type=str,
                        help="overrides data.datadir from the config")
    parser.add_argument("--output", type=str,
                        help="overrides data.output from the config")
    parser.add_argument("--max_frames", type=int, default=None,
                        help="truncate the sequence (debug/benchmark aid)")
    parser.add_argument("--resume", type=str, default=None,
                        help="resume.npz from pipeline.save_state (or "
                             "mapping.state_every) — continues the online "
                             "loop after the checkpointed frame; a "
                             "capability the reference does not have")
    args = parser.parse_args()

    cfg = load_config(args.config)
    if args.output is not None:
        cfg["data"]["output"] = args.output
    if args.input_folder is not None:
        cfg["data"]["datadir"] = args.input_folder
    if args.max_frames is not None:
        cfg["data"]["max_frames"] = args.max_frames

    save_path = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
    os.makedirs(save_path, exist_ok=True)
    with open(os.path.join(save_path, "config.json"), "w",
              encoding="utf-8") as f:
        f.write(json.dumps(cfg, indent=4, default=str))

    slam = RemixFusionTPU(cfg)
    if args.resume:
        slam.load_state(args.resume)
        slam.run(resume=True)
    else:
        slam.run()


if __name__ == "__main__":
    main()
