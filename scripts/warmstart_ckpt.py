"""Seed a FRESH training run from a trained checkpoint's params.

Writes a step-0 checkpoint (trained params + freshly-initialized optimizer,
clip window, and loss tracker) into a new run directory, so
``transkun_tpu.cli.train NEWDIR ...`` fine-tunes from the trained weights
under its own schedule instead of resuming the donor's step counter and
optimizer moments.  (The reference warm-starts the same way: the checkpoint
file IS the init when present, ``train.py:53-73`` — this script just
transplants params across runs.)

Usage:
  python scripts/warmstart_ckpt.py DONOR_CKPT NEW_CKPT_DIR \
      --modelConf transkun_tpu/pretrained/2.0.conf \
      [--max_lr 1e-4 --nIter 20000 --weight_decay 1e-4 --warmupCutoff 500]

The optimizer hyperparameters must match what the fine-tune run will pass to
cli.train (the opt-state TREE shape depends only on params, but seeding with
the same flags keeps the recorded metadata honest).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("donor", help="trained checkpoint directory")
    ap.add_argument("out", help="new run directory to seed")
    ap.add_argument("--modelConf", required=True)
    ap.add_argument("--max_lr", type=float, default=1e-4)
    ap.add_argument("--nIter", type=int, default=20000)
    ap.add_argument("--weight_decay", type=float, default=1e-4)
    ap.add_argument("--warmupCutoff", type=int, default=500)
    ap.add_argument("--useBest", action="store_true",
                    help="transplant best_params instead of last params")
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")  # host-only work

    from transkun_tpu.models.config import parse_conf_file
    from transkun_tpu.train import init_train_state, make_optimizer
    from transkun_tpu.train.checkpoint import (
        checkpoint_exists,
        load_checkpoint,
        save_checkpoint,
    )

    if checkpoint_exists(args.out):
        raise SystemExit(f"{args.out} already holds a checkpoint — refusing")

    ckpt = load_checkpoint(args.donor)
    params = ckpt["params"]
    if args.useBest and "best_params" in ckpt:
        params = ckpt["best_params"]
    donor_step = int(ckpt.get("step", 0))

    module_mod, conf = parse_conf_file(args.modelConf)
    optimizer = make_optimizer(
        params["params"],
        max_lr=args.max_lr,
        weight_decay=args.weight_decay,
        n_iter=args.nIter,
        warmup_cutoff=args.warmupCutoff,
    )
    state = init_train_state(params, optimizer)
    save_checkpoint(
        args.out, state, best_params=None,
        extra={
            "loss_tracker": {"train": [], "val": []},
            "epoch": 0,
            "warmstart_from": os.path.abspath(args.donor),
            "warmstart_donor_step": donor_step,
        },
    )
    print(
        f"seeded {args.out} from {args.donor} (donor step {donor_step}, "
        f"{'best' if args.useBest else 'last'} params, fresh optimizer)"
    )


if __name__ == "__main__":
    main()
