"""Evaluation entry point — CLI surface parity with the reference
(src/test.py): ``python src/test.py --config C --mode test --weight W
--output_path O`` (test.sh also forces ``--n_experts 7 --topK 7``).

Forces mode='test' (reference src/test.py:25), loads the model + checkpoint,
and evaluates the test split (or every entry of ``cfg.data.test_annots``),
writing results to ``<output_path>/<weight_stem>_result.txt``.
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
from qa_tiger_tpu.training import load_checkpoint  # noqa: E402
from qa_tiger_tpu.training.loop import AVQARunner  # noqa: E402
from qa_tiger_tpu.utils import (  # noqa: E402
    arg_parse,
    enable_compilation_cache,
    build_config,
    get_logger,
    logging_config,
    seed_everything,
    set_logger,
)


def main():
    enable_compilation_cache()
    args = arg_parse()
    args.mode = "test"
    if args.distributed:
        jax.distributed.initialize()
    cfg = build_config(args)
    set_logger(cfg)
    logger = get_logger()
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

    # build the first test dataset before the model so the answer vocabulary
    # (and thus num_labels) comes from the configured split — e.g.
    # MUSIC-AVQA-v2.0 carries its own answer2idx
    first_ds = AVQADataset(cfg, mode="test", repo_root=ROOT)
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

    def run_split(annot: str | None = None):
        if annot is not None:
            cfg.data.test_annot = annot
            logger.info(f"\nTesting... {annot}")
            ds = AVQADataset(cfg, mode="test", repo_root=ROOT)
        else:
            ds = first_ds
        loader = BatchLoader(
            ds, cfg.data.eval_batch_size // jax.process_count(),
            shuffle=False, shard_id=jax.process_index(),
            num_shards=jax.process_count())
        return runner.test(loader)

    run_split()
    if isinstance(cfg.data.get("test_annots"), (list, tuple)):
        for annot in cfg.data.test_annots:
            run_split(annot)


if __name__ == "__main__":
    try:
        main()
    except Exception:
        import traceback

        traceback.print_exc()
        raise
