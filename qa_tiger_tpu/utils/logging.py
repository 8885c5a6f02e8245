"""Observability: logger, TensorBoard writer, code snapshot, env/config dump.

Reproduces the reference's observability surface (src/utils.py:96-232):
- a process-0-only "AVQA" logger with file + console handlers,
- per-run output dir ``<output_dir>/<timestamp>_seed<seed>/`` with log.txt,
- test mode writes ``<weight_stem>_result.txt``,
- a zip snapshot of the framework source for provenance,
- config + environment dump,
- tunable-parameter report.

TensorBoard is optional (guarded import); scalars are written by process 0.
"""
from __future__ import annotations

import json
import logging
import os
import platform
import warnings
import zipfile
from datetime import datetime
from logging import getLogger
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np

LOGGER_NAME = "AVQA"


def _is_main_process() -> bool:
    try:
        return jax.process_index() == 0
    except RuntimeError:
        return True


def get_logger() -> logging.Logger:
    """Process-0 logger at INFO, other processes WARNING (ref src/utils.py:96-107)."""
    logger = getLogger(LOGGER_NAME)
    logger.setLevel(logging.INFO if _is_main_process() else logging.WARNING)
    return logger


class SummaryWriterStub:
    """No-op TensorBoard writer used when tensorboard isn't importable."""

    def add_scalar(self, *args: Any, **kwargs: Any) -> None:
        pass

    def flush(self) -> None:
        pass

    def close(self) -> None:
        pass


def _make_writer(logdir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter  # type: ignore

        return SummaryWriter(logdir)
    except Exception:
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            return SummaryWriter(logdir)
        except Exception:
            return SummaryWriterStub()


def save_code_snapshot(folder: str, logging_path: Path,
                       file_name: str = "code_snapshot.zip") -> None:
    """Zip all .py files under ``folder`` for run provenance (ref src/utils.py:110-133)."""
    if folder is None:
        raise ValueError("Please specify the directory to snapshot")
    if not _is_main_process():
        return
    save_name = str(Path(logging_path) / file_name)
    with zipfile.ZipFile(save_name, "w") as zipf:
        for dirpath, _dirnames, filenames in os.walk(folder):
            for filename in filenames:
                if filename.endswith(".py"):
                    file_path = os.path.join(dirpath, filename)
                    zipf.write(file_path, os.path.relpath(file_path, folder))
    print(f"Code snapshot saved as {save_name}")


def _attach_handlers(logger: logging.Logger, file_path: Optional[str]) -> None:
    formatter = logging.Formatter(
        "[%(asctime)s]-[%(filename)s line:%(lineno)d]:%(message)s "
    )
    console_handler = logging.StreamHandler()
    console_handler.setFormatter(formatter)
    logger.addHandler(console_handler)
    if file_path is not None:
        file_handler = logging.FileHandler(file_path, mode="w")
        file_handler.setFormatter(formatter)
        logger.addHandler(file_handler)


def set_logger(cfg) -> Tuple[Any, str]:
    """Create the run directory / result file and wire up logging.

    Train mode: ``<output_dir>/<timestamp>_seed<seed>/`` with a TensorBoard
    writer, log.txt, and a code snapshot zip (ref src/utils.py:159-190).
    Test mode: logs into ``<output_path>/<weight_stem>_result.txt`` (ref
    src/utils.py:138-158). Returns ``(writer_or_None, timestamp)``.
    """
    warnings.filterwarnings("ignore")
    logger = logging.getLogger(LOGGER_NAME)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()

    if cfg.mode == "test":
        if cfg.get("output_path"):
            out_dir = Path(cfg.output_path)
            out_dir.mkdir(parents=True, exist_ok=True)
            result_path = out_dir / (Path(str(cfg.weight)).stem + "_result.txt")
        else:
            weight = str(cfg.weight)
            for suffix in (".pt", ".npz"):
                if weight.endswith(suffix):
                    weight = weight[: -len(suffix)]
                    break
            result_path = Path(weight + "_result.txt")
        if _is_main_process():
            _attach_handlers(logger, str(result_path))
        return None, ""

    timestamp = "{0:%Y-%m-%d-%H-%M-%S}".format(datetime.now()) + f"_seed{cfg.seed}"
    writer = None
    if not cfg.debug and _is_main_process():
        out_dir = Path(cfg.output_dir) / timestamp
        out_dir.mkdir(parents=True, exist_ok=True)
        writer = _make_writer(out_dir.as_posix())
        _attach_handlers(logger, str(out_dir / "log.txt"))
        pkg_root = Path(__file__).resolve().parents[1]
        save_code_snapshot(pkg_root.as_posix(), out_dir)
    elif _is_main_process():
        _attach_handlers(logger, None)
    return writer, timestamp


def calculate_parameters(params, frozen_prefixes: tuple = ()) -> None:
    """Report total / tunable parameter counts (ref src/utils.py:193-210).

    ``params`` is a pytree; leaves under any ``frozen_prefixes`` top-level key
    count as non-tunable (mirrors requires_grad=False on the frozen encoder).
    """
    logger = get_logger()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    tot_params = 0
    tune_params = 0
    tune_list = []
    for path, leaf in flat:
        name = ".".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        n = int(np.prod(np.shape(leaf))) if np.ndim(leaf) else 1
        tot_params += n
        if not any(name.startswith(pref) for pref in frozen_prefixes):
            tune_params += n
            tune_list.append(name)
    ratio = (tune_params / max(tot_params, 1)) * 100
    logger.info("\n-------------- parameter info --------------")
    logger.info(f"num total params: {tot_params}")
    logger.info(f"num tunable params: {tune_params}")
    logger.info(f"tunable param ratio: {ratio:.2f}%")
    logger.info("tunable params:")
    logger.info(json.dumps(tune_list, indent=4))


def logging_config(cfg) -> None:
    """Dump config + environment (ref src/utils.py:213-232), JAX edition."""
    logger = get_logger()
    logger.info("\n-------------- config --------------")
    to_dump = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
    logger.info(json.dumps(to_dump, indent=4, default=str))
    logger.info("\n-------------- environment --------------")
    logger.info(f"Kernel version: {platform.platform()}")
    logger.info(f"Python version: {platform.python_version()}")
    logger.info(f"jax version: {jax.__version__}")
    logger.info(f"backend: {jax.default_backend()}")
    try:
        devices = jax.devices()
        logger.info(f"device count: {len(devices)}")
        for i, dev in enumerate(devices):
            logger.info(f"ㄴdevice {i}: {dev.device_kind} ({dev.platform})")
    except Exception as exc:  # pragma: no cover
        logger.info(f"device enumeration failed: {exc}")
