#!/usr/bin/env python
"""Self-train the DROID update operator on synthetic flow (see
splatslam_tpu/train/droid_trainer.py).

Stage "flow"  -> pretrained/droid_selftrained.msgpack (flow supervision)
Stage "dba"   -> pretrained/droid_dba.msgpack (fine-tuned THROUGH the
                 differentiable BA layer; consumed by the tracker when
                 tracking.pretrained points at a .msgpack)
Stage "both"  -> flow then dba.

--buckets both trains at BOTH geometry buckets (96x128/fx80 and
240x320/fx200 — FLOW_BUCKETS); the bench runs at the latter, and a net
trained only at 96x128 is near-blind there (measured EPE ~= the full GT
flow magnitude). --pool N pre-renders N batches and cycles them so the
single-core host's renderer doesn't starve the TPU (fresh rendering is
~1.5 s/batch vs a 14-44 ms device step).
"""

import argparse

from splatslam_tpu.train.droid_trainer import (FLOW_BUCKETS, train,
                                               train_dba)

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=("flow", "dba", "both"),
                    default="flow")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--dba-steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dba-batch", type=int, default=2,
                    help="batch for the dba stage (heavier: N-frame "
                         "sequences through the unrolled solver)")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--dba-lr", type=float, default=5e-5)
    ap.add_argument("--pool", type=int, default=0,
                    help="pre-render this many batches and cycle them")
    ap.add_argument("--buckets", choices=("small", "both"), default="both")
    ap.add_argument("--init", type=str, default=None,
                    help="continue the flow stage from this .msgpack "
                         "instead of random init")
    ap.add_argument("--out", type=str,
                    default="pretrained/droid_selftrained.msgpack")
    ap.add_argument("--dba-out", type=str,
                    default="pretrained/droid_dba.msgpack")
    args = ap.parse_args()
    buckets = FLOW_BUCKETS if args.buckets == "both" else None
    if args.stage in ("flow", "both"):
        init_params_flow = None
        if args.init:
            from splatslam_tpu.train.droid_trainer import load_selftrained
            init_params_flow = load_selftrained(args.init)
            print(f"[train] flow stage continues from {args.init}")
        train(steps=args.steps, batch=args.batch, lr=args.lr,
              ckpt_path=args.out, buckets=buckets, pool=args.pool,
              params=init_params_flow)
    if args.stage in ("dba", "both"):
        train_dba(steps=args.dba_steps, batch=args.dba_batch, lr=args.dba_lr,
                  init_ckpt=args.out, ckpt_path=args.dba_out,
                  buckets=buckets, pool=args.pool)
