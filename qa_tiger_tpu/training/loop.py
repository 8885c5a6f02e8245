"""Jitted training / evaluation runner.

The TPU counterpart of the reference's train/evaluate/test loops
(src/trainutils.py:253-462):

- one jitted SPMD ``train_step`` (forward + CE + any auxiliary ``*loss*``
  outputs + Adam update) over a ``('data','model')`` mesh — gradient and
  metric reductions ride GSPMD-inserted collectives, replacing DDP's NCCL
  all_reduce,
- the frozen text tower is partitioned out of the differentiated/optimized
  parameter set (its Adam moments would be ~6x the trainable model), exactly
  matching requires_grad=False semantics,
- eval accumulates on-device (total + 9-way qtype counters), transferred once
  per epoch,
- ``debug=True`` stops each loop at batch 10 like the reference's smoke mode
  (src/trainutils.py:311-312).
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qa_tiger_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated_sharding,
)
from qa_tiger_tpu.training.metrics import masked_cross_entropy, qtype_counters
from qa_tiger_tpu.training.optim import make_optimizer
from qa_tiger_tpu.utils import get_logger

Params = Dict[str, Any]

BATCH_KEYS = ("quest", "audio", "video", "patch", "prompt",
              "label", "qtype_label", "valid")


def split_params(params: Params, frozen_prefixes: Tuple[str, ...]
                 ) -> Tuple[Params, Params]:
    trainable = {k: v for k, v in params.items() if k not in frozen_prefixes}
    frozen = {k: v for k, v in params.items() if k in frozen_prefixes}
    return trainable, frozen


def merge_params(trainable: Params, frozen: Params) -> Params:
    return {**trainable, **frozen}


class AVQARunner:
    """Owns the mesh, params, optimizer state, and the jitted step functions."""

    def __init__(self, cfg, model_cfg: dict, init_fn, forward_fn,
                 frozen_prefixes: Tuple[str, ...],
                 mesh=None, seed: int = 0,
                 init_params: Optional[Params] = None):
        self.cfg = cfg
        self.forward_fn = forward_fn
        self.frozen_prefixes = frozen_prefixes
        self.mesh = mesh if mesh is not None else make_mesh()
        # Pallas kernels require real TPU devices; decide once from the mesh
        # instead of guessing inside traced code (covers both the Gaussian-MoE
        # kernel via model_cfg and the fused attention via the global flag)
        on_tpu = bool(all(d.platform == "tpu"
                          for d in self.mesh.devices.flat))
        self.model_cfg = dict(model_cfg)
        self.model_cfg["use_fused"] = on_tpu
        from qa_tiger_tpu.ops.pallas.gaussian_moe import set_tpu_kernels_enabled

        set_tpu_kernels_enabled(on_tpu)
        self.logger = get_logger()

        key = jax.random.PRNGKey(seed)
        if init_params is None:
            init_params = init_fn(key, model_cfg)
        self.trainable, self.frozen = split_params(init_params, frozen_prefixes)

        # Frozen-tower precision: the reference keeps CLIP half-precision on
        # the accelerator and float32 only on CPU (src/models/clip.py:144-146
        # calls .float() solely for device == 'cpu'), so its GPU training and
        # eval both run the frozen text tower in fp16. bf16 is the TPU-native
        # equivalent (same MXU speed, wider exponent). The fp32 MXU mode is
        # 4x slower, and at the shipped train recipe (B=32 fp32) the frozen
        # tower dominates the step — this single cast is the difference
        # between ~20 ms and ~14 ms steps. model_cfg['encoder_dtype']
        # overrides (e.g. 'float32' to force full precision on TPU; CPU
        # meshes default to fp32 like the reference's CPU path, which is what
        # the torch-parity tests compare against).
        enc_dt = self.model_cfg.get("encoder_dtype")
        if enc_dt is None and on_tpu:
            enc_dt = "bfloat16"
            self.model_cfg["encoder_dtype"] = enc_dt
        self._frozen_dtype = jnp.dtype(enc_dt) if enc_dt else None
        self.frozen = self._cast_frozen(self.frozen)

        optim_cfg = cfg.hyper_params.optim
        self.tx = make_optimizer(
            betas=tuple(optim_cfg.get("betas", (0.9, 0.999))),
            weight_decay=optim_cfg.get("weight_decay", 0.0) or 0.0,
        )
        self.opt_state = self.tx.init(self.trainable)
        # two-group LR (reference src/trainutils.py:121-137): encoder-named
        # params step at encoder_lr, everything else at the scheduled lr
        from qa_tiger_tpu.training.optim import lr_multipliers

        self._lr_mults = lr_multipliers(
            self.trainable, optim_cfg.get("encoder_lr"),
            optim_cfg.get("lr", 1e-4))

        # place params/opt state on the mesh
        t_shard = param_shardings(self.trainable, self.mesh)
        f_shard = param_shardings(self.frozen, self.mesh)
        self.trainable = jax.device_put(self.trainable, t_shard)
        self.frozen = jax.device_put(self.frozen, f_shard)
        self.opt_state = jax.device_put(
            self.opt_state, replicated_sharding(self.mesh))
        self._batch_sharding = batch_sharding(self.mesh)
        self._step_rng = jax.random.PRNGKey(seed + 1)
        # opt-in question-feature cache (hyper_params.cache_qst_features):
        # per-dataset device-resident (pooled, words) tables keyed by the
        # dataset's id(); the active table is selected per loop from the
        # loader's dataset and gathered by the batch's ds_idx in
        # _device_batch. See build_question_cache.
        self._qst_caches: Dict[int, Tuple[Any, Any]] = {}
        self._active_qst_cache: Optional[Tuple[Any, Any]] = None
        self._qst_gather = jax.jit(lambda cache, idx: (
            jnp.take(cache[0], idx, axis=0),
            jnp.take(cache[1], idx, axis=0)))
        # microbatch gradient accumulation (an extension over the reference,
        # which always steps on the full batch): batch splits into
        # `grad_accum` sequential microbatches inside the jitted step
        self._grad_accum = int(optim_cfg.get("grad_accum", 1) or 1)

        # donate params/opt-state: updated in place, buffers alias outputs
        self._train_step = jax.jit(
            partial(self._train_step_impl), donate_argnums=(0, 2)
        )
        # opt-in multi-step dispatch (hyper_params.steps_per_dispatch=K):
        # K train steps ride ONE jit call via lax.scan — see _multi_step_impl
        self._train_multi = jax.jit(
            partial(self._multi_step_impl), donate_argnums=(0, 2)
        )
        self._eval_step = jax.jit(partial(self._eval_step_impl))

    # ------------------------------------------------------------------
    def build_question_cache_from_tokens(self, tokens: np.ndarray,
                                         key: Any, chunk: int = 512) -> None:
        """Encode token ids [N, L] through the frozen text tower ONCE and
        keep (pooled [N, Dq], words [N, L, W]) resident on device under
        ``key``; steps whose batches carry ``ds_idx`` then gather rows
        instead of re-running the tower (see _device_batch).

        TPU-first rationale: the tower is frozen, dropout-free, and
        deterministic, so re-encoding the same questions every step of every
        epoch buys nothing — the same reasoning under which the reference
        precomputes its video/audio features offline. The cache stays in the
        tower's dtype (bf16 on TPU meshes: ~79 KB/question for CLIP-L words),
        cast to the trainable dtype at gather time exactly like the online
        path. Removing the tower cuts the B=32 train step ~16.2 -> ~13 ms
        (docs/PROFILE.md "Question cache").
        """
        from qa_tiger_tpu.models.qa_tiger import encode_question_tokens

        toks = np.asarray(tokens)
        n = toks.shape[0]
        chunk = min(chunk, max(n, 1))
        enc = jax.jit(lambda frozen, t: encode_question_tokens(
            frozen, t, self.model_cfg))
        pooled_parts, words_parts = [], []
        for i in range(0, n, chunk):
            t = toks[i:i + chunk]
            pad = chunk - t.shape[0]
            if pad:  # keep one executable: pad the tail chunk, slice after
                t = np.concatenate([t, np.repeat(t[-1:], pad, axis=0)])
            p, w = enc(self.frozen, jnp.asarray(t))
            if pad:
                p, w = p[:chunk - pad], w[:chunk - pad]
            pooled_parts.append(p)
            words_parts.append(w)
        cache = (jnp.concatenate(pooled_parts), jnp.concatenate(words_parts))
        cache = jax.device_put(cache, replicated_sharding(self.mesh))
        self._qst_caches[key] = cache
        self.logger.info(
            f"question cache built: {n} questions, words "
            f"{tuple(cache[1].shape)} {cache[1].dtype} "
            f"({cache[1].nbytes / 1e6:.1f} MB resident)")

    def build_question_cache(self, dataset, chunk: int = 512) -> bool:
        """Build the question cache for ``dataset`` (tokenizer-mode only —
        with precomputed quest features there is no tower to skip). Returns
        True if a cache was built/exists."""
        key = id(dataset)
        if key in self._qst_caches:
            return True
        if getattr(dataset, "tokenizer", None) is None:
            self.logger.info("question cache skipped: dataset serves "
                             "precomputed question features")
            return False
        if "quest_encoder" not in self.frozen:
            self.logger.info("question cache skipped: no frozen text tower")
            return False
        texts = [s["question_content"] for s in dataset.samples]
        tokens = dataset.tokenizer(texts, truncate=True)
        self.build_question_cache_from_tokens(tokens, key, chunk=chunk)
        return True

    def _select_qst_cache(self, loader) -> None:
        self._active_qst_cache = self._qst_caches.get(
            id(getattr(loader, "dataset", None)))

    # ------------------------------------------------------------------
    def _device_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        ctx = self.model_cfg.get("text_ctx")
        if ctx and "quest" in batch \
                and np.issubdtype(np.asarray(batch["quest"]).dtype, np.integer):
            # trimmed-tower mode is bit-exact only while the EOT token (the
            # argmax id) survives the static slice; catch violations host-side
            # rather than silently pooling a wrong position
            eot = np.asarray(batch["quest"]).argmax(-1)
            if (eot >= ctx).any():
                raise ValueError(
                    f"text_ctx={ctx} but a question's EOT sits at position "
                    f"{int(eot.max())}; raise text_ctx (tokenized questions "
                    "must fit, including SOT/EOT)")
        out = {}
        cache = self._active_qst_cache
        if cache is not None and "ds_idx" in batch:
            idx = jax.device_put(np.asarray(batch["ds_idx"], np.int32),
                                 self._batch_sharding)
            out["quest"], out["quest_words"] = self._qst_gather(cache, idx)
        for k in BATCH_KEYS:
            if k in batch and batch[k] is not None and k not in out:
                out[k] = jax.device_put(batch[k], self._batch_sharding)
        return out

    def _train_step_impl(self, trainable, frozen, opt_state, batch, lr, rng):
        # Opt-in mixed precision (hyper_params.train_dtype='bfloat16'):
        # master weights and Adam moments stay fp32; the forward/backward
        # COMPUTE runs in bf16 (the cast's VJP returns fp32 gradients
        # automatically). The reference trains fp32 on GPU, so the default
        # here is fp32 — this knob is the TPU-native speed mode (bf16 MXU
        # is 4x the fp32 rate; see docs/PROFILE.md "Train step").
        train_dt = self.cfg.hyper_params.get("train_dtype")
        cast_dt = jnp.dtype(train_dt) if train_dt else None

        def _cast(tree):
            if cast_dt is None:
                return tree
            return jax.tree_util.tree_map(
                lambda a: a.astype(cast_dt)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

        def loss_fn(tp, mb, mb_rng):
            params = merge_params(_cast(tp), frozen)
            out = self.forward_fn(params, _cast(mb), self.model_cfg,
                                  train=True, rng=mb_rng)
            ce = masked_cross_entropy(out["out"], mb["label"], mb["valid"])
            losses = {"ce_loss": ce}
            total = ce
            for key, value in out.items():
                if "loss" in key:
                    losses[key] = value
                    total = total + value
            losses["total_loss"] = total
            return total, losses

        accum = self._grad_accum
        if accum <= 1:
            grads, losses = jax.grad(loss_fn, has_aux=True)(
                trainable, batch, rng)
        else:
            grads, losses = self._accumulated_grads(
                loss_fn, trainable, batch, rng, accum)
        updates, opt_state = self.tx.update(grads, opt_state, trainable)
        updates = jax.tree_util.tree_map(
            lambda u, m: lr * m * u, updates, self._lr_mults)
        trainable = jax.tree_util.tree_map(jnp.add, trainable, updates)
        return trainable, opt_state, losses

    def _multi_step_impl(self, trainable, frozen, opt_state, window,
                         lr, step_rng):
        """K train steps in ONE dispatch: ``lax.scan`` over the window.

        On a tunneled/remote backend each jit call pays ~3.5 ms of serial
        host dispatch (trace-measured wall−device gap, docs/PROFILE.md);
        scanning K steps inside one executable amortizes it K-fold while the
        per-step math is byte-for-byte ``_train_step_impl``. The RNG stream
        is the SAME one the host loop produces — each scanned step performs
        the identical ``jax.random.split`` the per-step path performs and
        the advanced key is returned — so params, Adam moments, and the
        post-window ``_step_rng`` all match the K=1 path exactly (the
        bitwise resume proof holds across a ``steps_per_dispatch`` change).
        The scan body is traced once, so compile time matches the
        single-step executable. Replaces the reference's strictly
        per-batch host loop (src/trainutils.py:253-312).

        ``window``: tuple of K device batches (stacked on-device here, so
        inputs keep their committed 'data'-axis shardings).
        """
        batches = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *window)

        def body(carry, mb):
            tr, opt, key = carry
            key, sub = jax.random.split(key)
            tr, opt, losses = self._train_step_impl(
                tr, frozen, opt, mb, lr, sub)
            return (tr, opt, key), losses

        (trainable, opt_state, step_rng), losses = jax.lax.scan(
            body, (trainable, opt_state, step_rng), batches)
        return trainable, opt_state, step_rng, losses

    @staticmethod
    def _accumulated_grads(loss_fn, trainable, batch, rng, accum):
        """lax.scan over `accum` microbatches; contributions are weighted by
        each microbatch's valid-row count, so for the CE loss the result is
        EXACTLY the full-batch gradient (masked means recombine by weight).
        Auxiliary ``*loss*`` outputs recombine by the same weights (exact when
        they are means over valid rows; an approximation otherwise — no
        shipped model emits any). Peak activation memory drops ~`accum`-fold;
        requires microbatches to stay divisible by the mesh's data axis.

        Caveat: with the default ``gather_mode="reference"`` the TempMoE
        batch-rotated expert gather depends on the batch size, so microbatched
        forwards differ from the full-batch forward (just as re-batching
        changes the torch reference); exact equivalence holds in
        ``gather_mode="paper"`` (tests/test_training.py proves it)."""
        def split(v):
            return v.reshape((accum, v.shape[0] // accum) + v.shape[1:])

        mbs = jax.tree_util.tree_map(split, batch)
        first = jax.tree_util.tree_map(lambda v: v[0], mbs)
        _, loss_shape = jax.eval_shape(
            lambda tp, mb: loss_fn(tp, mb, rng), trainable, first)
        zeros = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), loss_shape)
        g0 = jax.tree_util.tree_map(jnp.zeros_like, trainable)
        carry0 = (g0, zeros, jnp.float32(0.0), jnp.int32(0))

        def body(carry, mb):
            g_sum, l_sum, w_sum, i = carry
            w = jnp.sum(mb["valid"].astype(jnp.float32))
            g, losses = jax.grad(loss_fn, has_aux=True)(
                trainable, mb, jax.random.fold_in(rng, i))
            g_sum = jax.tree_util.tree_map(
                lambda a, b: a + w * b.astype(a.dtype), g_sum, g)
            l_sum = jax.tree_util.tree_map(
                lambda a, b: a + w * b, l_sum, losses)
            return (g_sum, l_sum, w_sum + w, i + 1), None

        (g_sum, l_sum, w_sum, _), _ = jax.lax.scan(body, carry0, mbs)
        denom = jnp.maximum(w_sum, 1.0)
        grads = jax.tree_util.tree_map(lambda g: g / denom, g_sum)
        losses = jax.tree_util.tree_map(lambda v: v / denom, l_sum)
        return grads, losses

    def _eval_step_impl(self, trainable, frozen, batch):
        params = merge_params(trainable, frozen)
        eval_dtype = self.cfg.hyper_params.get("eval_dtype")
        if eval_dtype:
            # bf16 eval: params + float features cast inside the jitted graph
            dt = jnp.dtype(eval_dtype)
            cast = lambda a: (a.astype(dt)  # noqa: E731
                              if jnp.issubdtype(a.dtype, jnp.floating) else a)
            params = jax.tree_util.tree_map(cast, params)
            batch = {k: cast(v) if k in ("audio", "video", "patch", "quest",
                                         "prompt", "quest_words") else v
                     for k, v in batch.items()}
        out = self.forward_fn(params, batch, self.model_cfg, train=False)
        ce = masked_cross_entropy(out["out"], batch["label"], batch["valid"])
        cor, tot, cor9, tot9 = qtype_counters(
            out["out"], batch["label"], batch["qtype_label"], batch["valid"])
        return ce, cor, tot, cor9, tot9

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int, loader, lr: float, writer=None) -> None:
        cfg = self.cfg
        logger = self.logger
        self._select_qst_cache(loader)
        loader.set_epoch(epoch)
        tot_batch = len(loader) - 1
        sums: Dict[str, float] = {}
        count = 0
        epoch_time = time.time()
        # ([batch_idx...], device losses — scalar leaves for single-step
        # dispatches, [K] leaves for multi-step windows)
        pending: list = []

        def _drain(buf) -> Dict[str, float]:
            """One host sync for the whole log window: fetch every buffered
            dispatch's losses, update running sums + per-step TB scalars."""
            if not buf:
                return {}
            host = jax.device_get([ld for _, ld in buf])
            last: Dict[str, float] = {}
            for (idxs, _), ld in zip(buf, host):
                arrs = {k: np.atleast_1d(np.asarray(v))
                        for k, v in ld.items()}
                for j, bi in enumerate(idxs):
                    last = {k: float(v[j]) for k, v in arrs.items()}
                    for k, v in last.items():
                        sums[k] = sums.get(k, 0.0) + v
                        if writer is not None:
                            writer.add_scalar(
                                f"train/loss/{k}", v,
                                (epoch - 1) * (tot_batch + 1) + bi)
            buf.clear()
            return last
        # profile_dir config key or QA_TIGER_PROFILE_DIR env: capture a
        # jax.profiler device trace of steps 1-3 of the first epoch
        # (step 0 is compile) into <dir>, TensorBoard/Perfetto-viewable.
        # The reference has no profiler at all (wall-clock logs only).
        prof_dir = cfg.get("profile_dir") or os.environ.get(
            "QA_TIGER_PROFILE_DIR")
        prof_on = False
        # opt-in multi-step dispatch (hyper_params.steps_per_dispatch=K):
        # device batches buffer into a K-window dispatched as ONE scanned
        # jit call (_multi_step_impl). debug/profiling keep per-step
        # dispatch so step boundaries stay observable. Partial windows
        # (epoch tail, log boundaries) fall back to the single-step
        # executable — same math, one extra compile the first time.
        k_steps = int(cfg.hyper_params.get("steps_per_dispatch", 1) or 1)
        if cfg.debug or prof_dir:
            k_steps = 1
        window: list = []  # (batch_idx, device batch) awaiting dispatch

        def _flush_window() -> None:
            if not window:
                return
            if k_steps > 1 and len(window) == k_steps:
                idxs = [bi for bi, _ in window]
                batches = tuple(b for _, b in window)
                (self.trainable, self.opt_state, self._step_rng,
                 losses) = self._train_multi(
                    self.trainable, self.frozen, self.opt_state, batches,
                    jnp.float32(lr), self._step_rng)
                pending.append((idxs, losses))
            else:
                for bi, b in window:
                    self._step_rng, rng = jax.random.split(self._step_rng)
                    self.trainable, self.opt_state, losses = \
                        self._train_step(
                            self.trainable, self.frozen, self.opt_state, b,
                            jnp.float32(lr), rng)
                    pending.append(([bi], losses))
            window.clear()

        try:
            for batch_idx, host_batch in enumerate(loader):
                if prof_dir and epoch == 1 and batch_idx == 1:
                    jax.profiler.start_trace(prof_dir)
                    prof_on = True
                start_time = time.time()
                batch = self._device_batch(host_batch)
                window.append((batch_idx, batch))
                if len(window) == k_steps:
                    # keep the loss scalars ON DEVICE: a float() here would
                    # serialize dispatch against the ~20 ms step every batch
                    # (the reference host-syncs per batch,
                    # trainutils.py:276-287; the TPU-native form drains once
                    # per log window)
                    _flush_window()
                count += 1

                if prof_on and batch_idx == 3:
                    jax.profiler.stop_trace()
                    prof_on = False
                    logger.info(f"Profiler trace written to {prof_dir}")

                if batch_idx % cfg.log_interval == 0 or batch_idx == tot_batch:
                    _flush_window()
                    last = _drain(pending)
                    batch_t = time.time() - start_time
                    elapsed = time.time() - epoch_time
                    avg_time = elapsed / (batch_idx + 1)
                    est = (tot_batch - batch_idx) * avg_time / 60
                    cur = str(batch_idx).zfill(len(str(max(tot_batch, 1))))
                    ratio = 100.0 * batch_idx / max(tot_batch, 1)
                    loss_str = " ".join(
                        f"{k}-{v:.4f}({sums[k] / count:.4f})"
                        for k, v in last.items())
                    logger.info(
                        f"[EST: {est:7.2f}m][Process Time: {batch_t:7.2f}s]"
                        f"- Epoch: {epoch} [{cur}/{tot_batch} ({ratio:3.0f}%)]"
                        f"\tLosses: {loss_str}")

                if cfg.debug and batch_idx == 10:
                    break
        finally:
            _flush_window()
            _drain(pending)
            if prof_on:
                jax.profiler.stop_trace()

    def _run_eval(self, loader, debug: bool):
        self._select_qst_cache(loader)
        ce_sum = 0.0
        cor = tot = 0
        cor9 = np.zeros(9, np.int64)
        tot9 = np.zeros(9, np.int64)
        n_batches = 0
        # keep the per-batch counters ON DEVICE and drain once per log
        # window: a float(ce) here would host-sync every batch, serializing
        # dispatch against the ~40 ms eval step (~3.5 ms/step on the
        # tunneled backend). Same pattern as train_epoch's loss drain; the
        # accumulation order after the batched fetch is unchanged, so the
        # reported numbers are bitwise identical to the per-batch path.
        pending: list = []

        def _drain() -> None:
            nonlocal ce_sum, cor, tot, cor9, tot9, n_batches
            if not pending:
                return
            for ce, c, t, c9, t9 in jax.device_get(pending):
                ce_sum += float(ce)
                cor += int(c)
                tot += int(t)
                cor9 += np.asarray(c9)
                tot9 += np.asarray(t9)
                n_batches += 1
            pending.clear()

        for batch_idx, host_batch in enumerate(loader):
            batch = self._device_batch(host_batch)
            pending.append(self._eval_step(
                self.trainable, self.frozen, batch))
            if batch_idx % self.cfg.log_interval == 0 \
                    or batch_idx == len(loader) - 1:
                _drain()
                self.logger.info(
                    f"Test progress: {batch_idx:3.0f}/{len(loader) - 1}")
            if debug and batch_idx == 10:
                break
        _drain()
        loss = ce_sum / max(n_batches, 1)
        return loss, cor, tot, cor9, tot9

    def evaluate(self, epoch: int, loader, writer=None) -> Tuple[float, float]:
        from qa_tiger_tpu.training.metrics import accuracy_report

        loss, cor, tot, cor9, tot9 = self._run_eval(loader, self.cfg.debug)
        if writer is not None:
            writer.add_scalar("valid/acc/Total",
                              cor / max(tot, 1) * 100.0, epoch)
        report = accuracy_report(cor, tot, cor9, tot9, self.logger.info,
                                 epoch=epoch, writer=writer)
        return report["Total"], loss

    def test(self, loader) -> float:
        from qa_tiger_tpu.training.metrics import accuracy_report

        _, cor, tot, cor9, tot9 = self._run_eval(loader, self.cfg.debug)
        report = accuracy_report(cor, tot, cor9, tot9, self.logger.info,
                                 prefix="Test")
        return report["Total"]

    # ------------------------------------------------------------------
    def _cast_frozen(self, frozen: Params) -> Params:
        """Cast frozen-tower float leaves to the runner's encoder dtype
        (see __init__; checkpoints always store fp32, the cast is applied
        on every (re)load path)."""
        if self._frozen_dtype is None:
            return frozen
        dt = self._frozen_dtype
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            frozen)

    def load_clip_text_weights(self, path: str) -> None:
        """Load a converted OpenAI CLIP checkpoint (.pt or .npz of the text
        tower) into the frozen ``quest_encoder`` — the counterpart of the
        reference's clip.load() download inside CLIP_TEncoder
        (src/models/encoders.py:13)."""
        from pathlib import Path as _Path

        if str(path).endswith(".pt"):
            from qa_tiger_tpu.convert.clip_import import convert_clip_checkpoint

            text_params, _, _ = convert_clip_checkpoint(str(path))
        else:
            from qa_tiger_tpu.training.checkpoint import load_checkpoint

            text_params, _, _ = load_checkpoint(_Path(path))
            text_params = text_params.get("quest_encoder", text_params)
        # merge into the existing frozen dict — replacing it wholesale would
        # silently drop any other frozen tower sharing the pytree
        new_frozen = self._cast_frozen(
            {**self.frozen, "quest_encoder": text_params})
        self.frozen = jax.device_put(
            new_frozen, param_shardings(new_frozen, self.mesh))
        self.logger.info(f"loaded frozen CLIP text tower from {path}")

    def train_state(self, **scalars) -> Dict[str, Any]:
        """Snapshot for full mid-training resume (params + Adam moments +
        host scalars) — a capability the reference's save-best-only flow
        lacks (SURVEY.md §5 checkpoint/resume). The per-step dropout RNG
        rides along as plain ints (it lands in the JSON meta), so a resumed
        run continues the SAME randomness stream an uninterrupted run would
        have seen — resume equality is bitwise, not just statistical."""
        return {"params": self.trainable, "opt_state": self.opt_state,
                "step_rng": np.asarray(self._step_rng,
                                       dtype=np.uint32).tolist(),
                **scalars}

    def restore_train_state(self, state: Dict[str, Any]) -> Dict[str, Any]:
        self.trainable = jax.device_put(
            state["params"], param_shardings(state["params"], self.mesh))
        self.opt_state = jax.device_put(
            state["opt_state"], replicated_sharding(self.mesh))
        if state.get("step_rng") is not None:
            self._step_rng = jnp.asarray(state["step_rng"], dtype=jnp.uint32)
        return {k: v for k, v in state.items()
                if k not in ("params", "opt_state", "step_rng")}

    @property
    def params(self) -> Params:
        return merge_params(self.trainable, self.frozen)

    def load_params(self, params: Params) -> None:
        trainable, frozen = split_params(params, self.frozen_prefixes)
        self.trainable = jax.device_put(
            trainable, param_shardings(trainable, self.mesh))
        if frozen:
            frozen = self._cast_frozen(frozen)
            self.frozen = jax.device_put(
                frozen, param_shardings(frozen, self.mesh))
        self.opt_state = self.tx.init(self.trainable)
