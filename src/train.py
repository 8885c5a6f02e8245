"""Training entry point — CLI surface parity with the reference
(src/train.py): ``python src/train.py --config CONFIG --mode train``.

Orchestration mirrors reference main() (src/train.py:26-114): config/setup ->
loaders -> model -> optimizer -> epoch loop (train, evaluate, LR step,
save-best) -> final test on the best checkpoint (+ optional multi-annot
loop), re-expressed on the JAX runner.
"""
from __future__ import annotations

import sys
from pathlib import Path

FILE = Path(__file__).resolve()
ROOT = FILE.parents[1]
sys.path.append(ROOT.as_posix())

import jax  # noqa: E402

from qa_tiger_tpu.data import AVQADataset, BatchLoader  # noqa: E402
from qa_tiger_tpu.models import build_model  # noqa: E402
from qa_tiger_tpu.parallel import make_mesh  # noqa: E402
from qa_tiger_tpu.training import (  # noqa: E402
    PlateauScheduler,
    load_checkpoint,
    load_train_state,
    make_lr_schedule,
    save_checkpoint,
    save_train_state,
)
from qa_tiger_tpu.training.loop import AVQARunner  # noqa: E402
from qa_tiger_tpu.utils import (  # noqa: E402
    arg_parse,
    enable_compilation_cache,
    build_config,
    calculate_parameters,
    get_logger,
    logging_config,
    seed_everything,
    set_logger,
)


def make_loaders(cfg, mesh):
    n_shards = jax.process_count()
    shard = jax.process_index()
    train_ds = AVQADataset(cfg, mode=cfg.mode, repo_root=ROOT)
    val_ds = AVQADataset(cfg, mode="valid", repo_root=ROOT)
    per_host_bs = cfg.data.batch_size // n_shards
    train_loader = BatchLoader(
        train_ds, per_host_bs, shuffle=(cfg.mode == "train"), seed=cfg.seed,
        shard_id=shard, num_shards=n_shards)
    val_loader = BatchLoader(
        val_ds, cfg.data.eval_batch_size // n_shards, shuffle=False,
        shard_id=shard, num_shards=n_shards)
    return {cfg.mode: train_loader, "val": val_loader}


def main():
    enable_compilation_cache()
    args = arg_parse()
    if args.distributed:
        jax.distributed.initialize()
    cfg = build_config(args)
    writer, timestamp = set_logger(cfg)
    logger = get_logger()
    save_dir = Path(cfg.output_dir) / timestamp

    logging_config(cfg)
    seed_everything(cfg.seed)
    platform = cfg.hyper_params.get("platform")
    devices = jax.devices(platform) if platform else jax.devices()
    if platform:
        # pin eager ops (PRNG init, host transfers) to the requested
        # platform too — without this they land on the default backend
        # even though the mesh is elsewhere (same fix as dryrun_multichip)
        jax.config.update("jax_default_device", devices[0])
    # the data axis must divide the (per-host) batch sizes; use the largest
    # device count that does
    n = len(devices)
    min_batch = min(int(cfg.data.batch_size), int(cfg.data.eval_batch_size))
    while n > 1 and min_batch % n:
        n -= 1
    mesh = make_mesh(n_devices=n, devices=devices)

    loaders = make_loaders(cfg, mesh)
    model_cfg, init_fn, forward_fn, frozen = build_model(
        cfg.hyper_params.model_type, cfg.hyper_params.model,
        num_labels=cfg.get("num_labels", 42))
    runner = AVQARunner(cfg, model_cfg, init_fn, forward_fn, frozen,
                        mesh=mesh, seed=cfg.seed)
    clip_weights = cfg.hyper_params.model.get("clip_weights")
    if clip_weights:
        runner.load_clip_text_weights(clip_weights)
    if cfg.get("weight"):
        params, missing, unexpected = load_checkpoint(cfg.weight, runner.params)
        logger.info(f"Missing keys: {missing}")
        logger.info(f"Unexpected keys: {unexpected}")
        logger.info(f"=> loaded successfully '{cfg.weight}'")
        runner.load_params(params)
    calculate_parameters(runner.params, frozen_prefixes=frozen)
    if cfg.hyper_params.get("cache_qst_features"):
        # precompute every split's question features through the (now fully
        # loaded) frozen tower once; steps gather rows by ds_idx instead of
        # re-running the tower every batch of every epoch
        for loader in loaders.values():
            runner.build_question_cache(loader.dataset)

    optim_cfg = cfg.hyper_params.optim
    sched_cfg = cfg.hyper_params.sched
    plateau = None
    if sched_cfg.name == "ReduceLROnPlateau":
        plateau = PlateauScheduler(optim_cfg.lr, mode=sched_cfg.mode,
                                   factor=sched_cfg.factor,
                                   patience=sched_cfg.patience)
        lr_for_epoch = None
    else:
        lr_for_epoch = make_lr_schedule(
            sched_cfg.name, optim_cfg.lr, epochs=cfg.epochs,
            step_size=sched_cfg.get("step_size", 8),
            gamma=sched_cfg.get("gamma", 0.1),
            min_lr=optim_cfg.get("min_lr", 1e-7),
            warmup_epochs=sched_cfg.get("warmup_epochs", 2))

    best_acc, best_epoch = 0.0, -1
    start_epoch = 1
    resume_dir = cfg.get("resume")
    if resume_dir:
        # full mid-training resume (params + optimizer moments + epoch),
        # a capability the reference's save-best-only checkpoints lack
        template = runner.train_state(epoch=0, best_acc=0.0, best_epoch=-1)
        state = load_train_state(resume_dir, template)
        scalars = runner.restore_train_state(state)
        start_epoch = int(scalars.get("epoch", 0)) + 1
        best_acc = float(scalars.get("best_acc", 0.0))
        best_epoch = int(scalars.get("best_epoch", -1))
        logger.info(f"resumed from {resume_dir} at epoch {start_epoch}")
        # carry the pre-cut best checkpoint into the new run dir: if no
        # post-resume epoch beats best_acc, the final test stage below
        # still needs save_dir/best.npz (it lives next to the resumed
        # last_state in the ORIGINAL run dir)
        prev_best = Path(resume_dir).parent / "best.npz"
        if jax.process_index() == 0 and prev_best.exists() \
                and not (save_dir / "best.npz").exists():
            import shutil

            shutil.copy2(prev_best, save_dir / "best.npz")
            logger.info(f"carried over best checkpoint from {prev_best}")

    current_lr = optim_cfg.lr
    for epoch in range(start_epoch, cfg.epochs + 1):
        if lr_for_epoch is not None:
            current_lr = lr_for_epoch(epoch)
        if writer is not None:
            writer.add_scalar("train/lr", current_lr, epoch)

        logger.info(f"\n-------------- training epoch {epoch} --------------")
        runner.train_epoch(epoch, loaders["train"], current_lr, writer)

        logger.info(f"\n-------------- validation epoch {epoch} --------------")
        acc, loss = runner.evaluate(epoch, loaders["val"], writer)

        if plateau is not None:
            metric = acc if sched_cfg.mode == "max" else loss
            current_lr = plateau.step(metric)

        if acc >= best_acc and not cfg.debug:
            best_acc, best_epoch = acc, epoch
            logger.info(f"best model saved at epoch {epoch} with acc {best_acc}")
            if jax.process_index() == 0:
                save_checkpoint(runner.params, save_dir / "best.npz",
                                exclude_prefixes=("video_encoder",))
        if not cfg.debug and cfg.get("save_state", True) \
                and jax.process_index() == 0:
            state = runner.train_state(epoch=epoch, best_acc=best_acc,
                                       best_epoch=best_epoch)
            if cfg.get("save_state_async"):
                # orbax async: serialization overlaps the next epoch
                from qa_tiger_tpu.training import save_train_state_async

                save_train_state_async(state, save_dir / "last_state")
            else:
                save_train_state(state, save_dir / "last_state")
        logger.info(f"Epoch {epoch} done with {acc:3.2f} and loss {loss:.5f}.")
        logger.info(f"At epoch{best_epoch} best acc: {best_acc:3.2f}.")

    if cfg.get("save_state_async"):
        from qa_tiger_tpu.training import wait_for_async_saves

        wait_for_async_saves()

    if not cfg.debug:
        logger.info(f"\nTesting with Best validation model... {cfg.data.test_annot}")
        cfg.mode = "test"
        test_ds = AVQADataset(cfg, mode="test", repo_root=ROOT)
        test_loader = BatchLoader(
            test_ds, cfg.data.eval_batch_size // jax.process_count(),
            shuffle=False, shard_id=jax.process_index(),
            num_shards=jax.process_count())
        params, _, _ = load_checkpoint(save_dir / "best.npz", runner.params)
        runner.load_params(params)
        if cfg.hyper_params.get("cache_qst_features"):
            runner.build_question_cache(test_ds)
        runner.test(test_loader)
        if isinstance(cfg.data.get("test_annots"), (list, tuple)):
            for test_annot in cfg.data.test_annots:
                logger.info(f"\nTesting with Best validation model... {test_annot}")
                cfg.data.test_annot = test_annot
                ds = AVQADataset(cfg, mode="test", repo_root=ROOT)
                loader = BatchLoader(
                    ds, cfg.data.eval_batch_size // jax.process_count(),
                    shuffle=False, shard_id=jax.process_index(),
                    num_shards=jax.process_count())
                if cfg.hyper_params.get("cache_qst_features"):
                    runner.build_question_cache(ds)
                runner.test(loader)


if __name__ == "__main__":
    try:
        main()
    except Exception:
        import traceback

        traceback.print_exc()
        raise
