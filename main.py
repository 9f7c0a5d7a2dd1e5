#!/usr/bin/env python
"""CLI entry (ref main.py:14-64).

  python main.py --config train_faceDP --workspace base [--load_model ckpt]

Dispatches train / test / demo per the config's `mode`, exactly the
reference's 3-flag surface. The runner is the TPU-native Trainer
(dualpixelface_tpu/train/trainer.py) over a ('data','model') device mesh.
"""
from __future__ import annotations

import argparse
import random

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="dualpixelface_tpu runner")
    parser.add_argument("--config", type=str, required=True, help="config name under configs/")
    parser.add_argument("--workspace", type=str, required=True, help="workspace name")
    parser.add_argument("--load_model", type=str, default=None, help="checkpoint to load")
    parser.add_argument("--profile", action="store_true",
                        help="wrap the run in a jax profiler trace (written to the workspace log dir)")
    args = parser.parse_args()

    from dualpixelface_tpu.config import Configuration
    from dualpixelface_tpu.train import Trainer

    configuration = Configuration(args.config, args.workspace, args.load_model)
    configuration.validate()
    opt = configuration.get_config()

    # seed_everything(1) parity (ref main.py:25); JAX PRNG keys are seeded
    # explicitly inside the trainer/pipeline.
    random.seed(1)
    np.random.seed(1)

    from dualpixelface_tpu.utils.profiling import trace

    trainer = Trainer(opt)
    logdir = opt.get("logger_path") if args.profile else None
    with trace(logdir):
        if opt.mode == "train":
            trainer.fit()
            trainer.test()
        else:
            trainer.test()


if __name__ == "__main__":
    main()
