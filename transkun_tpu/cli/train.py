"""Training CLI (counterpart of ``python3 -m transkun.train``,
``transkun/train.py:357-404``).

Single-host, data-parallel over every local TPU chip via the dp mesh (the
reference spawns one NCCL process per GPU; here one process drives all chips
through pjit/shard_map).  Usage:

    python -m transkun_tpu.cli.train ckpt_dir \
        --datasetPath ... --datasetMetaFile_train train.pickle \
        --datasetMetaFile_val val.pickle --modelConf conf.json
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    parser = argparse.ArgumentParser("Perform Training")
    parser.add_argument("saved_filename", help="checkpoint directory")
    parser.add_argument("--datasetPath", required=True)
    parser.add_argument("--datasetMetaFile_train", required=True)
    parser.add_argument("--datasetMetaFile_val", required=True)
    parser.add_argument("--batchSize", default=4, type=int, help="per-device batch")
    parser.add_argument("--hopSize", required=False, type=float)
    parser.add_argument("--chunkSize", required=False, type=float)
    parser.add_argument("--gradClippingQuantile", default=0.8, type=float)
    parser.add_argument("--max_lr", default=2e-4, type=float)
    parser.add_argument("--weight_decay", default=1e-4, type=float)
    parser.add_argument("--nIter", default=180000, type=int)
    parser.add_argument("--modelConf", required=True)
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--noiseFolder", required=False)
    parser.add_argument("--irFolder", required=False)
    parser.add_argument("--maxEpoch", default=1000000, type=int)
    parser.add_argument("--maxEvents", default=32, type=int,
                        help="per-track padded event capacity per chunk")
    parser.add_argument("--nDevices", default=None, type=int)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 activations (params stay fp32)")
    parser.add_argument("--statsEvery", default=40, type=int,
                        help="decode-and-score a train batch every N steps "
                        "(ref train.py:140-142); 0 disables the pass")
    parser.add_argument("--validateEvery", default=1, type=int,
                        help="run distributed validation every N epochs "
                        "(the reference validates per epoch; long runs on "
                        "small corpora drown in per-epoch decodes otherwise)."
                        "  Latest checkpoint is still saved every epoch")
    parser.add_argument("--warmupCutoff", default=500, type=int,
                        help="steps before the OneCycle schedule starts")
    parser.add_argument("--ckptEvery", default=2000, type=int)
    parser.add_argument("--dataLoaderWorkers", default=4, type=int,
                        help="host loader threads (reference flag parity; "
                        "threads not processes — numpy/scipy release the GIL)")
    parser.add_argument("--gradientCheckpoint", default="auto",
                        choices=["auto", "on", "off"],
                        help="encoder-block remat.  'auto' (default) keeps it "
                        "ON: slope-measured at flagship B=2 bf16, remat is "
                        "~10%% faster than storing activations (the encoder "
                        "is HBM-bound, so recompute beats spill/reload) and "
                        "it also enables large batches")
    parser.add_argument("--seed", default=None, type=int,
                        help="run seed (data stream + dropout).  Default: "
                        "wall clock.  A resumed run always reuses the seed "
                        "persisted in the checkpoint so the restarted stream "
                        "continues deterministically")
    parser.add_argument("--logEvery", default=8, type=int,
                        help="fetch/print train metrics every N steps; each "
                        "host fetch is a device sync (~27 ms on a tunneled "
                        "chip), so batching keeps steps async. NaN abort is "
                        "deferred by at most N steps. 1 = per-step prints")
    parser.add_argument("--deviceData", default="auto",
                        choices=["auto", "on", "off"],
                        help="pack the whole training corpus onto the device "
                        "once (int16) and slice chunks on device, instead of "
                        "uploading audio every step.  Removes the per-step "
                        "host->device transfer (the step bottleneck AND a "
                        "client-side leak on tunneled chips — see "
                        "scripts/probe_axon_leak.py).  'auto' uses it when "
                        "the corpus fits, augmentation is off, and the run "
                        "is single-process; bit-identical to the host "
                        "loader's int16-link path")
    parser.add_argument("--linkInt16", default="auto",
                        choices=["auto", "force", "off"],
                        help="upload audio as int16 and dequantize on device "
                        "(halves host->device traffic per step — the upload "
                        "is the step bottleneck on a tunneled chip).  'auto' "
                        "uses int16 only when the batch is exactly int16-"
                        "representable (un-augmented wav audio is); 'force' "
                        "rounds+clips (augmented audio; quant noise ~-90 dB, "
                        "far below the augmentation chain's)")
    parser.add_argument("--platform", default=None,
                        help="pin the jax backend (e.g. 'cpu').  Goes through "
                        "jax.config BEFORE backend init — the axon TPU plugin "
                        "in this environment ignores the JAX_PLATFORMS env "
                        "var.  Used by scripts/accuracy_certificate.py for "
                        "the CPU-scale certificate")
    parser.add_argument("--stopAtStep", default=None, type=int,
                        help="hard-stop after this many global steps (a final "
                        "checkpoint is saved first).  --nIter only SIZES the "
                        "OneCycle schedule (reference semantics); bounded "
                        "runs — the accuracy certificate, smoke schedules — "
                        "need an explicit step cap instead of computing a "
                        "matching maxEpoch")
    args = parser.parse_args(argv)

    if args.platform:
        import jax as _jax

        _jax.config.update("jax_platforms", args.platform)

    from ..utils.jax_setup import setup_cache

    setup_cache()
    # pod launch: join the multi-process runtime BEFORE any jax backend use
    # (counterpart of the reference's NCCL process-group init, train.py:29-31)
    from ..parallel import init_distributed, process_info

    multi_host = init_distributed()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from ..data import dataset as D
    from ..data.augment import Augmentator
    from ..data.labels import encode_batch
    from ..models.config import parse_conf_file
    from ..ops import frontend
    from ..parallel import make_mesh
    from ..train import init_train_state, make_optimizer, make_train_step
    from ..train.checkpoint import (
        checkpoint_exists,
        load_checkpoint,
        save_checkpoint,
    )
    from ..train.step import TrainState
    from ..train.optim import QuantileClipState

    module_mod, conf = parse_conf_file(args.modelConf)
    if args.gradientCheckpoint != "auto":
        conf.useGradientCheckpoint = args.gradientCheckpoint == "on"
    model = module_mod.TransKun(
        conf, compute_dtype=jnp.bfloat16 if args.bf16 else None
    )

    rank, world = process_info()
    run_seed = int(time.time()) if args.seed is None else args.seed
    if multi_host:
        # every process must build IDENTICAL replicated params/opt state, so
        # the seed is agreed on once (ref: rank 0 initializes, others load
        # the same checkpoint, train.py:53-73)
        from jax.experimental import multihost_utils

        run_seed = int(
            multihost_utils.broadcast_one_to_all(np.int32(run_seed % 2**31))
        )
    n_dev = args.nDevices or jax.device_count()
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    local_batch = args.batchSize * max(jax.local_device_count(), 1)
    global_batch = args.batchSize * max(n_dev, 1)
    if rank == 0:
        print(
            f"devices: {n_dev} ({world} process(es)), "
            f"global batch: {global_batch}"
        )

    params = model.init(jax.random.PRNGKey(run_seed))
    if rank == 0:
        from ..utils import compute_param_size

        print(f"#Param(M): {compute_param_size(params['params']):.2f}")
    optimizer = make_optimizer(
        params["params"],
        max_lr=args.max_lr,
        weight_decay=args.weight_decay,
        n_iter=args.nIter,
        warmup_cutoff=args.warmupCutoff,
    )
    step_fn = make_train_step(
        model.module, optimizer, mesh=mesh,
        clip_quantile=args.gradClippingQuantile,
        loss_fn=model.make_train_loss(axis_name="dp" if mesh else None),
    )
    state = init_train_state(params, optimizer)
    best_params = params
    loss_tracker = {"train": [], "val": []}
    start_epoch = 0

    ckpt_path = args.saved_filename
    if checkpoint_exists(ckpt_path):
        from ..train.checkpoint import restore_opt_state

        print("resuming from checkpoint...")
        ckpt = load_checkpoint(ckpt_path)
        state = TrainState(
            params=ckpt["params"],
            opt_state=restore_opt_state(ckpt["opt_state"], state.opt_state),
            clip_state=QuantileClipState(
                jnp.asarray(ckpt["clip_buffer"]), jnp.asarray(ckpt["clip_count"])
            ),
            step=jnp.asarray(ckpt["step"]),
        )
        best_params = ckpt.get("best_params", ckpt["params"])
        extra = ckpt.get("extra", {}) or {}
        loss_tracker = extra.get("loss_tracker", loss_tracker)
        start_epoch = int(extra.get("epoch", 0))
        # continue the exact data/dropout stream of the interrupted run
        run_seed = int(extra.get("run_seed", run_seed))

    dataset = D.DatasetMaestro(args.datasetPath, args.datasetMetaFile_train)
    dataset_val = D.DatasetMaestro(args.datasetPath, args.datasetMetaFile_val)

    writer = None
    if rank == 0:  # rank 0 owns logging + checkpoints (ref train.py:257-306)
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(ckpt_path + ".log")
        except Exception:
            writer = None

    hop = args.hopSize or conf.segmentHopSizeInSecond
    chunk = args.chunkSize or conf.segmentSizeInSecond
    n_chunk_samples = int(chunk * conf.fs)
    augmentator = None
    if args.augment:
        augmentator = Augmentator(
            sampleRate=conf.fs,
            noiseFolder=args.noiseFolder,
            convIRFolder=args.irFolder,
        )

    device_data = None
    if args.deviceData != "off":
        blockers = []
        if multi_host:
            blockers.append("multi-process run")
        if augmentator is not None:
            blockers.append("host augmentation")
        if blockers:
            if args.deviceData == "on":
                raise SystemExit(
                    f"--deviceData on is incompatible with: {', '.join(blockers)}"
                )
        else:
            from ..data.device_dataset import DeviceDataset

            try:
                device_data = DeviceDataset(
                    dataset, n_chunk_samples, mesh=mesh
                )
                if rank == 0:
                    print(
                        f"device-resident corpus: "
                        f"{device_data.nbytes / 2**30:.2f} GiB int16 on device",
                        flush=True,
                    )
            except ValueError as e:
                if args.deviceData == "on":
                    raise
                print(f"device dataset unavailable ({e}); using host loader")
            except jax.errors.JaxRuntimeError as e:
                # the device_put of the packed corpus can fail with an XLA
                # RESOURCE_EXHAUSTED even when the size guard passed — the
                # guard can't see HBM already held by params/optimizer
                # (ADVICE r4).  auto falls back to the host loader; an
                # explicit `on` surfaces the real error.
                if args.deviceData == "on" or "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                device_data = None
                print(f"device corpus does not fit HBM ({type(e).__name__}); "
                      "using host loader")

    if device_data is None and rank == 0:
        from ..utils.leak_guard import host_loader_leak_warning

        msg = host_loader_leak_warning(
            backend=jax.default_backend(),
            bytes_per_step=n_chunk_samples * local_batch
            * (2 if args.linkInt16 != "off" else 4),
        )
        if msg:
            print(msg, flush=True)

    def _frame(x):
        if x.dtype == jnp.int16:  # device-side dequantize (static under jit)
            # f32 divide by the loader's iinfo.max scale.  NOTE: inside jit
            # XLA may lower this to reciprocal-multiply, so vs the loader's
            # np.divide floats the result is within 1 ulp on ~2.3% of int16
            # values (measured exhaustively on the cpu backend and observed
            # on the chip; an explicit host-side reciprocal-multiply would
            # be 1 ulp off on MORE values, so divide stays)
            x = x.astype(jnp.float32) / jnp.float32(32767.0)
        return frontend.make_frame(
            jnp.swapaxes(x, -1, -2), conf.hopSize, conf.windowSize
        )

    frame_fn = jax.jit(_frame)
    link_mode = {"auto": None, "force": True, "off": False}[args.linkInt16]
    from ..models.transkun import _quantize_link

    # the training slicer normalizes by iinfo.max = 32767 (ref Data.py:416-419
    # convention), NOT read_audio's 2^15 — the link scale must match
    LINK_SCALE = 32767.0

    if multi_host:
        # label K auto-grow must agree across processes: a dense chunk on one
        # rank would otherwise give the SPMD step rank-dependent global
        # shapes (crash or collective hang).  Allgather-max the densest
        # count so every rank grows to the same bucket; all ranks step the
        # loader in lockstep (equal shard lengths, drop_last), so this
        # collective is always matched.
        from jax.experimental import multihost_utils

        def k_sync(densest: int) -> int:
            return int(
                np.max(multihost_utils.process_allgather(
                    np.asarray(densest, np.int32)))
            )
    else:
        k_sync = None

    global_step = int(state.step)
    for epoch in range(start_epoch, args.maxEpoch):
        data_iter = D.DatasetMaestroIterator(
            dataset, hop, chunk,
            seed=epoch * 100 + run_seed,
            augmentator=augmentator,
            notes_strictly_contained=False,
            skip_audio=device_data is not None,
        )
        # each process loads its own rank's shard of the epoch's chunks
        # (the reference's DistributedSampler, train.py:120-124)
        loader = D.BatchLoader(
            data_iter, local_batch, shuffle=True, seed=epoch, drop_last=True,
            rank=rank, world_size=world, num_workers=args.dataLoaderWorkers,
            collate=(D.collate_fn_device if device_data is not None
                     else D.collate_fn_batching),
        )
        loss_all = []
        pending_log = []
        t_log0 = time.time()

        def to_global(arr):
            """Process-local batch shard -> global dp-sharded array."""
            if not multi_host:
                return jnp.asarray(arr)
            from jax.experimental import multihost_utils

            return multihost_utils.host_local_array_to_global_array(
                np.asarray(arr), mesh, P("dp")
            )

        for idx, batch in enumerate(loader):
            t1 = time.time()
            notes_batch = batch["notes"]
            if device_data is not None:
                # audio never crosses the link: slice the packed on-device
                # corpus (two int32 scalars per item is the whole upload)
                audio_dev = device_data.slice_batch(
                    device_data.starts_for(batch["pieceIdx"], batch["begins"])
                )
                audio = None
                frames = frame_fn(audio_dev)
            else:
                audio = batch["audioSlices"]
                # chunk boundaries are float seconds, so raw lengths jitter
                # by a sample; crop to a fixed size so ONE program shape
                # serves every step (a fresh XLA compile per step otherwise)
                audio = audio[:, : min(n_chunk_samples, audio.shape[1])]
                frames = frame_fn(
                    jnp.asarray(_quantize_link(audio, link_mode, LINK_SCALE))
                )
            labels = encode_batch(
                notes_batch, conf.hopSize / conf.fs, model.targetMIDIPitch,
                args.maxEvents, k_sync=k_sync,
            )
            if multi_host:
                frames = to_global(np.asarray(frames))
            state, metrics = step_fn(
                state,
                frames,
                tuple(to_global(a) for a in labels.astuple()),
                jax.random.PRNGKey(global_step * 7919 + run_seed),
            )
            # metrics stay on device; fetching every step would sync the
            # (async) step chain at one link RTT each — batch the fetches
            pending_log.append((epoch, idx, global_step, metrics))
            if len(pending_log) >= max(args.logEvery, 1) or idx == len(loader) - 1:
                fetched = jax.device_get(
                    [(m["loss"], m["grad_norm"], m["clip_value"], m["finite"])
                     for _, _, _, m in pending_log]
                )
                # measured AFTER the fetch: the device_get waits for the
                # newest step, so this is true wall seconds per step (the
                # pre-fetch timestamp only measured host dispatch, which in
                # device-data mode is ~10 ms and wildly understates)
                dt = (time.time() - t_log0) / len(pending_log)
                try:  # host RSS (GB): long-run leak canary, linux only
                    with open("/proc/self/statm") as f:
                        rss_gb = int(f.read().split()[1]) * 4096 / 2**30
                except Exception:
                    rss_gb = float("nan")
                bad_step = None
                for (ep_i, idx_i, gs_i, _), (loss, gnorm, clipv, fin) in zip(
                    pending_log, fetched
                ):
                    loss, gnorm, clipv = float(loss), float(gnorm), float(clipv)
                    print(
                        f"epoch:{ep_i} progress:{idx_i / max(len(loader),1):0.3f} "
                        f"step:{gs_i} loss:{loss:0.4f} gradNorm:{gnorm:0.2f} "
                        f"clipValue:{clipv:0.2f} time:{dt:0.2f} "
                        f"rss:{rss_gb:0.1f}",
                        flush=True,
                    )
                    if writer:
                        writer.add_scalar("Loss/train", loss, gs_i)
                        writer.add_scalar("Optimizer/gradNorm", gnorm, gs_i)
                        writer.add_scalar("Optimizer/clipValue", clipv, gs_i)
                    loss_all.append(loss)
                    if not bool(fin) and bad_step is None:
                        bad_step = gs_i
                pending_log.clear()
                t_log0 = time.time()
                if bad_step is not None:
                    # the jitted step already SKIPPED every non-finite update
                    # on device (params/opt/clip state untouched — see
                    # train/step.py apply_update), so unlike the reference's
                    # same-step abort (train.py:299) no state was corrupted
                    print(
                        f"non-finite loss/grad at step {bad_step} "
                        "(update skipped on device), aborting"
                    )
                    raise SystemExit(1)

            if args.statsEvery > 0 and idx % args.statsEvery == 0 and rank == 0:
                # decode fns are single-device programs: under multi-host,
                # pull the replicated params to host once for the stats pass
                sp = jax.device_get(state.params) if multi_host else state.params
                if audio is None:  # device-resident mode: fetch this batch
                    audio = np.asarray(audio_dev)
                stats = model.compute_stats(sp, audio, notes_batch)
                stats2 = model.compute_stats_mireval(sp, audio, notes_batch)
                n_gt = stats2["nGT"] + 1e-4
                n_est = stats2["nEst"] + 1e-4
                n_cor = stats2["nCorrect"] + 1e-4
                p, r = n_cor / n_est, n_cor / n_gt
                f1 = 2 * p * r / (p + r)
                fw_p = (stats["nCorrectFramewise"] + 1e-4) / (stats["nEstFramewise"] + 1e-4)
                fw_r = (stats["nCorrectFramewise"] + 1e-4) / (stats["nGTFramewise"] + 1e-4)
                fw_f1 = 2 * fw_p * fw_r / (fw_p + fw_r)
                print(f"f1:{f1:.4f} precision:{p:.4f} recall:{r:.4f} f1Frame:{fw_f1:.4f}")
                if writer:
                    writer.add_scalar("Loss/train_f1", f1, global_step)
                    writer.add_scalar("Loss/train_precision", p, global_step)
                    writer.add_scalar("Loss/train_recall", r, global_step)
                    writer.add_scalar("Loss/train_f1_frame", fw_f1, global_step)
                    writer.add_scalar(
                        "Loss/train_mse_velocity", stats["seVelocityForced"] / n_gt,
                        global_step,
                    )
                    writer.add_scalar(
                        "Loss/train_mse_OF", stats["seOFForced"] / n_gt, global_step
                    )

            if idx % args.ckptEvery == args.ckptEvery - 1:
                ckpt_state = jax.device_get(state) if multi_host else state
                if rank == 0:
                    save_checkpoint(
                        ckpt_path, ckpt_state, best_params,
                        {"loss_tracker": loss_tracker, "epoch": epoch,
                         "run_seed": run_seed},
                    )
                    print("saved", flush=True)
            global_step += 1
            if args.stopAtStep is not None and global_step >= args.stopAtStep:
                break

        if args.stopAtStep is not None and global_step >= args.stopAtStep:
            ckpt_state = jax.device_get(state) if multi_host else state
            if rank == 0:
                save_checkpoint(
                    ckpt_path, ckpt_state, best_params,
                    {"loss_tracker": loss_tracker, "epoch": epoch,
                     "run_seed": run_seed},
                )
                print(f"stopAtStep {args.stopAtStep} reached; saved",
                      flush=True)
            break

        # distributed validation: every rank validates its own loader shard
        # over its LOCAL devices, then the 5-vector is summed across
        # processes (exactly the reference's sharded doValidation +
        # all_reduce, TrainUtil.py:231-272)
        from ..train.validate import (
            _metrics_from_agg,
            aggregate_across_processes,
            validation_counts,
        )

        if (epoch + 1) % max(args.validateEvery, 1) != 0:
            if rank == 0:
                loss_tracker["train"].append(
                    sum(loss_all) / max(len(loss_all), 1)
                )
                save_checkpoint(
                    ckpt_path,
                    jax.device_get(state) if multi_host else state,
                    best_params,
                    {"loss_tracker": loss_tracker, "epoch": epoch + 1,
                     "run_seed": run_seed},
                )
            continue

        val_params = jax.device_get(state.params) if multi_host else state.params
        if rank == 0:
            print("Validating...", flush=True)
        val_iter = D.DatasetMaestroIterator(
            dataset_val,
            conf.segmentHopSizeInSecond,
            chunk,
            notes_strictly_contained=False,
            seed=run_seed + epoch * 100,
        )
        val_loader = D.BatchLoader(
            val_iter, min(2 * global_batch, max(len(val_iter), 1)),
            shuffle=True, seed=epoch, drop_last=False,
            rank=rank, world_size=world,
        )
        counts = validation_counts(
            model, val_params, val_loader, conf.fs,
            devices=jax.local_devices(),
        )
        val_result = _metrics_from_agg(aggregate_across_processes(counts))
        if rank == 0:
            print("result:", val_result, flush=True)
            if writer:
                for k, v in val_result.items():
                    writer.add_scalar("val/" + k, v, epoch)

            loss_tracker["train"].append(sum(loss_all) / max(len(loss_all), 1))
            loss_tracker["val"].append(val_result["f1"])
            if val_result["f1"] >= max(loss_tracker["val"]):
                print("best updated", flush=True)
                best_params = val_params
            save_checkpoint(
                ckpt_path,
                jax.device_get(state) if multi_host else state,
                best_params,
                {"loss_tracker": loss_tracker, "epoch": epoch + 1,
                 "run_seed": run_seed},
            )


if __name__ == "__main__":
    main()
