"""Training CLI (greenfield — the reference says "training code coming
soon"; this realizes the training semantics its model code defines).

One jitted G+D step per batch (sketchedit_tpu/train/trainer.py), data-
parallel over all local devices when more than one is present, periodic
checkpointing with the reference's {epoch}_net_{M,G,D} naming and iter.txt
resume.

Example:
    python train.py --name myrun --dataset_mode editimage \
        --train_image_dir /data/images --batchSize 8 --use_cam \
        --pool_type max --joint_train_inp
"""

import os
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sketchedit_tpu.options.train_options import TrainOptions
    from sketchedit_tpu import data
    from sketchedit_tpu.models.deepfill_c2 import DeepFillConfig
    from sketchedit_tpu.params import checkpoint as ckpt
    from sketchedit_tpu.runner import enable_persistent_cache
    from sketchedit_tpu.train.trainer import (
        TrainConfig, init_train_state, train_step)
    from sketchedit_tpu.train.losses import load_vgg_params
    from sketchedit_tpu.utils.iter_counter import IterationCounter
    from sketchedit_tpu.parallel.mesh import (
        data_parallel_mesh, replicate, shard_batch)

    opt = TrainOptions().parse()
    enable_persistent_cache()

    dataloader = data.create_dataloader(opt)
    # --niter_decay: epoch-denominated flags -> step-denominated schedule
    steps_per_epoch = max(1, len(dataloader.dataset) // opt.batchSize)
    vgg_params = load_vgg_params()       # loaded once, serves both uses
    # --attention_impl sharded needs the patch mesh wired in (the CLI
    # accepts the choice everywhere; without this the first trace hits
    # deepfill_c2's assert after the whole setup wait). Mirrors
    # runner.config_from_opt; mutually exclusive with the DP batch mesh
    # (both would claim every device).
    attention_impl, attention_mesh = opt.attention_impl, None
    if attention_impl == "sharded":
        if len(jax.devices()) > 1:
            from sketchedit_tpu.parallel.sharded_attention import patch_mesh
            attention_mesh = patch_mesh()
        else:
            print("WARNING: --attention_impl sharded needs >1 device; "
                  "falling back to 'auto'")
            attention_impl = "auto"
    cfg = TrainConfig(
        netg=DeepFillConfig(
            use_cam=opt.use_cam, pool_type=opt.pool_type,
            no_mask_cc=opt.no_mask_cc, no_mask_coarse=opt.no_mask_coarse,
            joint_train_inp=opt.joint_train_inp,
            attention_impl=attention_impl,
            attention_mesh=attention_mesh),
        gan_mode=opt.gan_mode, lambda_l1=opt.lambda_l1,
        lambda_l1_mask=opt.lambda_l1_mask, lambda_vgg=opt.lambda_vgg,
        lambda_mask_rec=opt.lambda_mask_rec,
        no_gan_loss=opt.no_gan_loss,
        no_vgg_loss=opt.no_vgg_loss or vgg_params is None,
        vgg_imagenet_norm=bool(opt.vgg_imagenet_norm),
        precision=(None if opt.precision == "default" else opt.precision),
        init_type=opt.init_type, init_gain=opt.init_variance,
        filt_maskim=opt.filt_maskim, no_detach=opt.no_detach,
        netd=opt.netD, num_d=opt.num_D,
        update_part=opt.update_part, lr=opt.lr, beta1=opt.beta1,
        beta2=opt.beta2, no_TTUR=opt.no_TTUR, remat=opt.remat,
        reuse_fake=opt.reuse_fake,
        lr_decay_start=opt.niter * steps_per_epoch,
        lr_decay_steps=opt.niter_decay * steps_per_epoch,
        compute_dtype=opt.compute_dtype)
    if cfg.no_vgg_loss:
        vgg_params = None

    state = init_train_state(jax.random.PRNGKey(0), cfg)
    if opt.continue_train:
        # resume-exact: params + optimizer moments + step via Orbax
        restored = ckpt.load_train_state(opt, state)
        if restored is not None:
            state = restored
            print(f"resumed full train state at step {int(state['step'])}")
    # warm-start nets from checkpoints when present / requested
    for label, flag in (("M", opt.load_pretrained_mask),
                        ("G", opt.load_pretrained_g),
                        ("D", opt.load_pretrained_d)):
        if flag:
            state["params"][label] = ckpt.load_network_path(flag)
            print(f"loaded pretrained net {label} from {flag}")
        elif opt.continue_train and int(state["step"]) == 0:
            loaded = ckpt.load_network(label, opt)
            if loaded is not None:
                state["params"][label] = loaded
                print(f"resumed net {label} (weights only)")

    mesh = None
    n_dev = len(jax.devices())
    if attention_mesh is not None:
        print(f"patch-sharded attention over {n_dev} devices "
              "(no batch mesh)")
    elif n_dev > 1 and opt.batchSize % n_dev == 0:
        mesh = data_parallel_mesh()
        state = replicate(mesh, state)
        print(f"data-parallel over {n_dev} devices")
    elif n_dev > 1:
        print(f"NOTE: batchSize {opt.batchSize} not divisible by "
              f"{n_dev} devices; running single-device")

    # donate the train state: params/opt buffers update in place, saving
    # one full state copy of HBM traffic + allocation per step
    step_fn = jax.jit(
        lambda st, b, k: train_step(st, b, k, cfg, vgg_params),
        donate_argnums=(0,))

    # Packed single-blob transfer (data/packed_transfer.py): the tunneled
    # runtime charges ~45ms fixed per host->device transfer, so compact
    # batches ship as ONE uint8 blob, unpacked on device inside the step.
    from sketchedit_tpu.data.packed_transfer import (
        mask_keys, pack_batch, packable, unpack_batch)
    packed_step_cache = {}

    def packed_step_fn(hw, keys):
        if (hw, keys) not in packed_step_cache:
            packed_step_cache[hw, keys] = jax.jit(
                lambda st, blob, k: train_step(
                    st, unpack_batch(blob, *hw, keys=keys), k, cfg,
                    vgg_params),
                donate_argnums=(0,))
        return packed_step_cache[hw, keys]

    def upload(batch):
        """Host batch -> (device args, step callable). Upload is async on
        this runtime (asarray returns in ~20ms); calling it one batch
        ahead overlaps the transfer with the in-flight step."""
        if not cfg.lambda_mask_rec:
            # don't ship supervision bytes the step won't read (~4% of the
            # packed blob at 256^2; the tunnel charges per byte)
            batch.pop("region_gt", None)
        if packable(batch):
            hw = batch["image"].shape[1:3]
            keys = mask_keys(batch)
            # shard_batch places numpy directly: one transfer, already
            # sharded (asarray-then-device_put would pay the ~45ms fixed
            # transfer cost twice)
            blob = pack_batch(batch)
            blob = (shard_batch(mesh, blob) if mesh is not None
                    else jnp.asarray(blob))
            return blob, packed_step_fn(hw, keys)
        device_batch = {k: jnp.asarray(v) for k, v in batch.items()
                        if isinstance(v, np.ndarray)}
        if mesh is not None:
            device_batch = dict(zip(
                device_batch,
                shard_batch(mesh, *device_batch.values())))
        return device_batch, step_fn

    from sketchedit_tpu.train.validation import (
        MetricsLog, build_validator, is_improvement, recover_best,
        resolve_val_track)
    opt.val_track = resolve_val_track(opt)
    metrics_log = MetricsLog.from_opt(opt)
    validator = build_validator(opt, cfg)
    best_val = None
    if opt.continue_train and metrics_log is not None:
        best_val = recover_best(metrics_log.path, opt.val_track)
        if best_val is not None:
            print(f"resumed best {opt.val_track} = {best_val}")
    if validator is not None:
        print(f"validation: {validator.image.shape[0]} held-out items "
              f"from {opt.val_image_dir} every {opt.val_epoch_freq} epochs "
              f"(best checkpoint tracks {opt.val_track})")

    iter_counter = IterationCounter(opt, len(dataloader.dataset))
    key = jax.random.PRNGKey(opt.niter)
    if int(state["step"]):
        # resumed run: decorrelate the branch-flag/mask stream from the
        # prefix the original run already consumed (a fresh key would
        # replay the identical draws from step 0)
        key = jax.random.fold_in(key, int(state["step"]))

    # failure handling: on SIGTERM/SIGINT, save a resume-exact checkpoint
    # before exiting (preemption-safe training). The handler only sets a
    # flag; the save runs at the next loop boundary, where `state` is
    # guaranteed to be a live (post-rebind) value — saving inside the
    # handler would race with donate_argnums, which deletes the old state
    # buffers while the step is in flight.
    import signal

    stop_signum = None

    def _request_stop(signum, _frame):
        nonlocal stop_signum
        if stop_signum is not None:       # second signal: exit now
            raise SystemExit(128 + signum)
        stop_signum = signum
        print(f"signal {signum}: will checkpoint and exit after this step")

    def _maybe_stop():
        if stop_signum is None:
            return
        ckpt.save_pipeline(state["params"], "latest", opt)
        ckpt.save_train_state(jax.device_get(state), opt)
        iter_counter.record_current_iter()
        print(f"checkpointed on signal {stop_signum}; exiting", flush=True)
        # hard exit: the checkpoint is durably on disk and nothing else
        # needs flushing. Interpreter teardown with a live tunneled-TPU
        # client (in-flight uploads from the batch-ahead pipeline) was
        # observed to hang indefinitely in the PJRT client's futex wait —
        # a preemption handler must terminate deterministically.
        sys.stderr.flush()
        os._exit(128 + stop_signum)

    signal.signal(signal.SIGTERM, _request_stop)
    signal.signal(signal.SIGINT, _request_stop)

    for epoch in iter_counter.training_epochs():
        iter_counter.record_epoch_start(epoch)
        batch_it = iter(dataloader)
        nxt = next(batch_it, None)
        staged = upload(nxt) if nxt is not None else None
        while staged is not None:
            device_batch, fn = staged
            # stage the NEXT batch before dispatching this step: the
            # upload's DMA overlaps the in-flight device step (measured
            # 50 -> 118 img/s on real data at 256^2 b16)
            nxt = next(batch_it, None)
            staged = upload(nxt) if nxt is not None else None
            key, sub = jax.random.split(key)
            state, metrics = fn(state, device_batch, sub)
            iter_counter.record_one_iteration()
            _maybe_stop()
            if iter_counter.needs_printing():
                vals = {k: round(float(v), 4) for k, v in metrics.items()}
                print(f"epoch {epoch} iter {iter_counter.epoch_iter} "
                      f"({iter_counter.time_per_iter*1000:.0f} ms/img) "
                      f"{vals}")
                if metrics_log is not None:
                    metrics_log.log({
                        "kind": "train", "epoch": epoch,
                        "iter": iter_counter.epoch_iter,
                        "ms_per_img": round(
                            iter_counter.time_per_iter * 1000, 1),
                        "losses": vals})
            if iter_counter.needs_saving():
                ckpt.save_pipeline(state["params"], "latest", opt)
                ckpt.save_train_state(jax.device_get(state), opt)
                iter_counter.record_current_iter()
        iter_counter.record_epoch_end()
        if validator is not None and (epoch % opt.val_epoch_freq == 0
                                      or epoch == iter_counter.total_epochs):
            vals = {k: round(v, 4)
                    for k, v in validator.run(state["params"]).items()}
            if is_improvement(opt.val_track, vals[opt.val_track], best_val):
                best_val = vals[opt.val_track]
                ckpt.save_pipeline(state["params"], "best", opt)
                vals["best"] = True     # marks the row metrics.jsonl keeps
            print(f"validation epoch {epoch}: {vals}", flush=True)
            if metrics_log is not None:
                metrics_log.log({"kind": "val", "epoch": epoch, **vals})
        if (epoch % opt.save_epoch_freq == 0
                or epoch == iter_counter.total_epochs):
            ckpt.save_pipeline(state["params"], "latest", opt)
            ckpt.save_pipeline(state["params"], epoch, opt)
            ckpt.save_train_state(jax.device_get(state), opt)
            print(f"saved the model at the end of epoch {epoch}")


if __name__ == "__main__":
    main()
