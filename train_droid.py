#!/usr/bin/env python
"""Self-train the DROID update operator on synthetic flow (see
splatslam_tpu/train/droid_trainer.py). Produces
pretrained/droid_selftrained.msgpack consumed when tracking.pretrained
points at a .msgpack file."""

import argparse

from splatslam_tpu.train import train

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--out", type=str,
                    default="pretrained/droid_selftrained.msgpack")
    args = ap.parse_args()
    train(steps=args.steps, batch=args.batch, lr=args.lr,
          ckpt_path=args.out)
