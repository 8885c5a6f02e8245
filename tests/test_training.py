"""Training-stack tests: schedules, masked loss/metrics, end-to-end smoke
training on synthetic data, checkpoint round-trip, multi-device equivalence."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qa_tiger_tpu.models.qa_tiger import (
    FROZEN_PREFIXES,
    qa_tiger_config,
    qa_tiger_forward,
    qa_tiger_init,
)
from qa_tiger_tpu.parallel import make_mesh
from qa_tiger_tpu.training import (
    PlateauScheduler,
    make_lr_schedule,
    masked_cross_entropy,
    qtype_counters,
)
from qa_tiger_tpu.training.loop import AVQARunner
from qa_tiger_tpu.utils import Box

import qa_tiger_tpu.models.clip_text as ct

ct.CLIP_TEXT_CONFIGS.setdefault(
    "tiny-test", dict(width=32, heads=4, layers=2, embed_dim=32))

TINY = dict(d_model=32, video_dim=32, patch_dim=24, audio_dim=16,
            topK=2, num_experts=4, encoder_type="tiny-test")
B, T, P = 8, 12, 4


def tiny_cfg():
    return Box(dict(
        type="qa-tiger", debug=False, log_interval=100, epochs=2,
        hyper_params=dict(
            model=dict(**TINY),
            optim=dict(lr=1e-3, betas=(0.95, 0.999), weight_decay=0,
                       encoder_lr=None, min_lr=1e-7),
            sched=dict(name="StepLR", step_size=8, gamma=0.1, mode="min",
                       factor=0.5, patience=5, warmup_epochs=2),
        ),
    ))


def synth_batch(rng, b=B, num_labels=42):
    return {
        "quest": rng.integers(1, 90, (b, 20)).astype(np.int64),
        "audio": rng.standard_normal((b, T, 16), dtype=np.float32),
        "video": rng.standard_normal((b, T, 32), dtype=np.float32),
        "patch": rng.standard_normal((b, T, P, 24), dtype=np.float32),
        "label": rng.integers(0, num_labels, b).astype(np.int32),
        "qtype_label": rng.integers(0, 9, b).astype(np.int32),
        "valid": np.ones(b, bool),
    }


class FakeLoader:
    def __init__(self, batches):
        self.batches = batches

    def set_epoch(self, e):
        pass

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


class TestSchedules:
    def test_steplr_matches_torch(self):
        torch = pytest.importorskip("torch")
        sched = make_lr_schedule("StepLR", 1e-4, step_size=8, gamma=0.1)
        m = torch.nn.Linear(2, 2)
        opt = torch.optim.Adam(m.parameters(), lr=1e-4)
        tsched = torch.optim.lr_scheduler.StepLR(opt, step_size=8, gamma=0.1)
        for epoch in range(1, 16):
            assert sched(epoch) == pytest.approx(opt.param_groups[0]["lr"])
            tsched.step()

    def test_plateau(self):
        s = PlateauScheduler(1.0, mode="max", factor=0.5, patience=1)
        assert s.step(10.0) == 1.0
        assert s.step(9.0) == 1.0   # 1 bad epoch, within patience
        assert s.step(8.0) == 0.5   # 2nd bad epoch -> decay
        assert s.step(11.0) == 0.5  # improvement resets

    @pytest.mark.parametrize("mode", ["min", "max"])
    @pytest.mark.parametrize("cooldown", [0, 2])
    def test_plateau_matches_torch_exactly(self, mode, cooldown):
        """Oracle: torch ReduceLROnPlateau with the reference's construction
        (src/trainutils.py:174-180 passes mode/factor/patience and leaves
        threshold/cooldown at torch defaults). Includes a near-flat segment
        where the 1e-4 rel threshold is the deciding factor."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0 if mode == "min" else 1)
        # random walk + a long near-flat stretch (sub-threshold improvements)
        metrics = list(rng.uniform(1.0, 2.0, 20))
        flat_base = 1.5
        metrics += [flat_base * (1 - 3e-5 * i) for i in range(25)]
        metrics += list(rng.uniform(1.0, 2.0, 15))

        m = torch.nn.Linear(2, 2)
        opt = torch.optim.SGD(m.parameters(), lr=1e-3)
        ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode=mode, factor=0.5, patience=3, cooldown=cooldown)
        ours = PlateauScheduler(1e-3, mode=mode, factor=0.5, patience=3,
                                cooldown=cooldown)
        for i, v in enumerate(metrics):
            ref.step(v)
            lr = ours.step(v)
            assert lr == pytest.approx(opt.param_groups[0]["lr"], rel=1e-12), \
                f"diverged at step {i} (metric {v})"

    @pytest.mark.parametrize("warmup_t", [0, 2, 5])
    def test_cosine_matches_timm_formula(self, warmup_t):
        """Oracle: timm CosineLRScheduler._get_lr with the reference's args
        (src/trainutils.py:153-168: t_initial=epochs, lr_min,
        warmup_lr_init=lr_min, warmup_prefix=False, cycle_mul=cycle_decay=1,
        cycle_limit=1, k_decay=1, t_in_epochs=True), stepped with
        sched.step(epoch) at epoch end (src/train.py:70) so epoch e trains
        at _get_lr(e-1). timm itself is not installed; this re-derives the
        published closed form independently."""
        import math

        base_lr, lr_min, epochs = 3e-4, 1e-7, 15

        def timm_get_lr(t):
            if t < warmup_t:
                return lr_min + t * (base_lr - lr_min) / warmup_t
            i = t // epochs
            if i >= 1:  # cycle_limit=1
                return lr_min
            t_curr = t - epochs * i
            return lr_min + 0.5 * (base_lr - lr_min) * (
                1 + math.cos(math.pi * t_curr / epochs))

        sched = make_lr_schedule("cosine", base_lr, epochs=epochs,
                                 min_lr=lr_min, warmup_epochs=warmup_t)
        for epoch in range(1, epochs + 6):  # beyond t_initial too
            assert sched(epoch) == pytest.approx(timm_get_lr(epoch - 1),
                                                 rel=1e-12), f"epoch {epoch}"


class TestMetrics:
    def test_masked_ce_matches_torch_on_unpadded(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        logits = rng.standard_normal((6, 42), dtype=np.float32)
        labels = rng.integers(0, 42, 6).astype(np.int32)
        valid = np.ones(6, bool)
        ours = masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                    jnp.asarray(valid))
        theirs = torch.nn.CrossEntropyLoss()(
            torch.tensor(logits), torch.tensor(labels).long())
        assert float(ours) == pytest.approx(float(theirs), rel=1e-5)

    def test_padding_excluded(self):
        rng = np.random.default_rng(1)
        logits = rng.standard_normal((6, 42), dtype=np.float32)
        labels = rng.integers(0, 42, 6).astype(np.int32)
        valid = np.array([1, 1, 1, 0, 0, 0], bool)
        full = masked_cross_entropy(jnp.asarray(logits[:3]),
                                    jnp.asarray(labels[:3]),
                                    jnp.ones(3, bool))
        masked = masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                      jnp.asarray(valid))
        assert float(full) == pytest.approx(float(masked), rel=1e-6)

    def test_qtype_counters(self):
        logits = np.zeros((4, 5), np.float32)
        logits[np.arange(4), [1, 2, 2, 3]] = 10  # predictions
        labels = np.array([1, 2, 0, 3], np.int32)  # 3 correct
        qt = np.array([0, 0, 4, 8], np.int32)
        valid = np.array([1, 1, 1, 0], bool)  # last one padded
        c, t, c9, t9 = qtype_counters(jnp.asarray(logits), jnp.asarray(labels),
                                      jnp.asarray(qt), jnp.asarray(valid))
        assert (int(c), int(t)) == (2, 3)
        assert np.asarray(t9).tolist() == [2, 0, 0, 0, 1, 0, 0, 0, 0]
        assert np.asarray(c9).tolist() == [2, 0, 0, 0, 0, 0, 0, 0, 0]


class TestEndToEnd:
    def test_loss_decreases_and_frozen_stays(self):
        cfg = tiny_cfg()
        model_cfg = qa_tiger_config(num_labels=42, **TINY)
        mesh = make_mesh(1, devices=jax.devices("cpu"))
        runner = AVQARunner(cfg, model_cfg, qa_tiger_init, qa_tiger_forward,
                            FROZEN_PREFIXES, mesh=mesh, seed=0)
        rng = np.random.default_rng(0)
        batch = synth_batch(rng)
        loader = FakeLoader([batch] * 4)

        frozen_before = jax.tree_util.tree_map(np.asarray, runner.frozen)
        dev_batch = runner._device_batch(batch)
        loss0 = float(runner._eval_step(runner.trainable, runner.frozen,
                                        dev_batch)[0])
        for epoch in range(1, 4):
            runner.train_epoch(epoch, loader, lr=1e-3)
        loss1 = float(runner._eval_step(runner.trainable, runner.frozen,
                                        dev_batch)[0])
        assert np.isfinite(loss1)
        assert loss1 < loss0  # overfits a single repeated batch
        frozen_after = jax.tree_util.tree_map(np.asarray, runner.frozen)
        for a, b in zip(jax.tree_util.tree_leaves(frozen_before),
                        jax.tree_util.tree_leaves(frozen_after)):
            np.testing.assert_array_equal(a, b)

    def test_encoder_dtype_bf16_tower(self):
        """model_cfg['encoder_dtype'] runs the frozen tower at reduced
        precision — the reference's own accelerator behavior (CLIP stays
        fp16 on GPU; .float() only on CPU, src/models/clip.py:144-146) —
        while the trainable head stays fp32. AVQARunner applies it by
        default on TPU meshes; here it's forced on CPU to check the
        mechanics: frozen leaves are bf16, logits track the fp32 tower,
        and a train step still runs."""
        cfg = tiny_cfg()
        mesh = make_mesh(1, devices=jax.devices("cpu"))
        mc32 = qa_tiger_config(num_labels=42, **TINY)
        r32 = AVQARunner(cfg, mc32, qa_tiger_init, qa_tiger_forward,
                         FROZEN_PREFIXES, mesh=mesh, seed=0)
        mc16 = qa_tiger_config(num_labels=42, encoder_dtype="bfloat16",
                               **TINY)
        r16 = AVQARunner(cfg, mc16, qa_tiger_init, qa_tiger_forward,
                         FROZEN_PREFIXES, mesh=mesh, seed=0)
        float_leaves = [np.asarray(x) for x in
                        jax.tree_util.tree_leaves(r16.frozen)]
        assert float_leaves
        for leaf in float_leaves:
            if np.issubdtype(leaf.dtype, np.floating) \
                    or leaf.dtype == jnp.bfloat16:
                assert leaf.dtype == jnp.bfloat16

        batch = synth_batch(np.random.default_rng(3))
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        out32 = np.asarray(qa_tiger_forward(
            r32.params, jb, r32.model_cfg, train=False)["out"])
        out16 = np.asarray(qa_tiger_forward(
            r16.params, jb, r16.model_cfg, train=False)["out"])
        assert out16.dtype == out32.dtype == np.float32
        np.testing.assert_allclose(out16, out32, atol=0.15, rtol=0.1)

        dev = r16._device_batch(batch)
        r16.trainable, r16.opt_state, losses = r16._train_step(
            r16.trainable, r16.frozen, r16.opt_state, dev,
            jnp.float32(1e-3), jax.random.PRNGKey(0))
        assert np.isfinite(float(losses["total_loss"]))

    def test_train_dtype_mixed_precision(self):
        """hyper_params.train_dtype='bfloat16': master weights stay fp32
        (the optimizer state too), gradients track the fp32 step's within
        bf16 tolerance, and the loss still decreases."""
        cfg = tiny_cfg()
        cfg.hyper_params.train_dtype = "bfloat16"
        model_cfg = qa_tiger_config(num_labels=42, **TINY)
        mesh = make_mesh(1, devices=jax.devices("cpu"))
        runner = AVQARunner(cfg, model_cfg, qa_tiger_init, qa_tiger_forward,
                            FROZEN_PREFIXES, mesh=mesh, seed=0)
        cfg32 = tiny_cfg()
        r32 = AVQARunner(cfg32, model_cfg, qa_tiger_init, qa_tiger_forward,
                         FROZEN_PREFIXES, mesh=mesh, seed=0)
        batch = synth_batch(np.random.default_rng(7))
        db = runner._device_batch(batch)

        losses = []
        for i in range(6):
            runner.trainable, runner.opt_state, ld = runner._train_step(
                runner.trainable, runner.frozen, runner.opt_state, db,
                jnp.float32(1e-2), jax.random.PRNGKey(i))
            losses.append(float(ld["total_loss"]))
        assert np.isfinite(losses[-1]) and losses[-1] < losses[0]
        for leaf in jax.tree_util.tree_leaves(runner.trainable):
            if jnp.issubdtype(np.asarray(leaf).dtype, np.floating):
                assert np.asarray(leaf).dtype == np.float32

        # one step from identical init: bf16-compute params stay close to
        # the fp32 step's (same rng -> same dropout draw)
        db32 = r32._device_batch(batch)
        t32, _, _ = r32._train_step(r32.trainable, r32.frozen, r32.opt_state,
                                    db32, jnp.float32(1e-2),
                                    jax.random.PRNGKey(0))
        r16 = AVQARunner(cfg, model_cfg, qa_tiger_init, qa_tiger_forward,
                         FROZEN_PREFIXES, mesh=mesh, seed=0)
        t16, _, _ = r16._train_step(r16.trainable, r16.frozen, r16.opt_state,
                                    db, jnp.float32(1e-2),
                                    jax.random.PRNGKey(0))
        for a, b in zip(jax.tree_util.tree_leaves(t16),
                        jax.tree_util.tree_leaves(t32)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0.15, atol=0.05)


    def test_checkpoint_upcasts_bf16_leaves(self, tmp_path):
        """np.savez round-trips ml_dtypes.bfloat16 as raw void '|V2' blobs,
        and TPU runners keep the frozen tower bf16 (encoder_dtype) — so
        save_checkpoint must upcast to fp32 or TPU-trained best.npz would
        be unloadable."""
        from qa_tiger_tpu.training import load_checkpoint, save_checkpoint

        params = {"quest_encoder": {"w": jnp.ones((4, 4), jnp.bfloat16)},
                  "head": {"w": jnp.full((2, 2), 0.5, jnp.float32)}}
        path = tmp_path / "best.npz"
        save_checkpoint(params, path, exclude_prefixes=())
        loaded, _, _ = load_checkpoint(path)
        got = loaded["quest_encoder"]["w"]
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, np.ones((4, 4), np.float32))

    def test_checkpoint_roundtrip(self, tmp_path):
        from qa_tiger_tpu.training import load_checkpoint, save_checkpoint

        model_cfg = qa_tiger_config(num_labels=42, **TINY)
        params = qa_tiger_init(jax.random.PRNGKey(0), model_cfg)
        save_checkpoint(params, tmp_path / "best.npz")
        params2 = qa_tiger_init(jax.random.PRNGKey(1), model_cfg)
        merged, missing, unexpected = load_checkpoint(
            tmp_path / "best.npz", params2)
        assert not unexpected
        np.testing.assert_array_equal(
            np.asarray(params["head"]["weight"]),
            merged["head"]["weight"])

    def test_load_clip_text_weights_merges_other_frozen(self, tmp_path):
        """Regression: loading the CLIP text tower must MERGE into the frozen
        pytree, not replace it — a second frozen prefix has to survive."""
        from qa_tiger_tpu.training import save_checkpoint

        cfg = tiny_cfg()
        model_cfg = qa_tiger_config(num_labels=42, **TINY)

        def init_two_frozen(key, mcfg):
            params = qa_tiger_init(key, mcfg)
            params["extra_frozen"] = {"w": jnp.ones((3, 3), jnp.float32)}
            return params

        mesh = make_mesh(1, devices=jax.devices("cpu"))
        runner = AVQARunner(cfg, model_cfg, init_two_frozen, qa_tiger_forward,
                            FROZEN_PREFIXES + ("extra_frozen",),
                            mesh=mesh, seed=0)
        assert set(runner.frozen) == {"quest_encoder", "extra_frozen"}

        fresh_text = qa_tiger_init(jax.random.PRNGKey(7), model_cfg)[
            "quest_encoder"]
        save_checkpoint({"quest_encoder": fresh_text}, tmp_path / "clip.npz")
        runner.load_clip_text_weights(str(tmp_path / "clip.npz"))
        assert set(runner.frozen) == {"quest_encoder", "extra_frozen"}
        np.testing.assert_array_equal(
            np.asarray(runner.frozen["extra_frozen"]["w"]), np.ones((3, 3)))

    def test_profile_dir_writes_trace(self, tmp_path):
        """cfg.profile_dir captures a jax.profiler device trace of train
        steps 1-3 (an observability feature the reference lacks)."""
        model_cfg = qa_tiger_config(num_labels=42, **TINY)
        cfg = tiny_cfg()
        cfg["profile_dir"] = str(tmp_path / "trace")
        mesh = make_mesh(1, devices=jax.devices("cpu"))
        runner = AVQARunner(cfg, model_cfg, qa_tiger_init, qa_tiger_forward,
                            FROZEN_PREFIXES, mesh=mesh, seed=0)
        rng = np.random.default_rng(3)
        loader = FakeLoader([synth_batch(rng) for _ in range(5)])
        runner.train_epoch(1, loader, 1e-3)
        artifacts = [f for f in (tmp_path / "trace").rglob("*") if f.is_file()]
        assert artifacts, "no trace files written"
        assert any("xplane" in f.name or f.suffix in (".pb", ".gz", ".json")
                   for f in artifacts)

    @pytest.mark.parametrize("accum", [2, 4])
    def test_grad_accum_matches_full_batch(self, accum):
        """grad_accum=N must produce the same update as the full batch: the
        masked-CE means recombine exactly by valid-count weighting.

        Exact equivalence requires a deterministic, batch-decoupled loss:
        gather_mode="paper" (the reference's default batch-rotated gather
        depends on batch SIZE — microbatching legitimately changes outputs,
        as re-batching does in the torch reference too) and train=False in
        the forward wrapper (TempMoE's router attention has the reference's
        hardcoded dropout=0.1, modules.py:268, so train-mode masks are
        batch-shaped and can never recombine across microbatches — true of
        any framework's grad accumulation under dropout)."""
        model_cfg = qa_tiger_config(num_labels=42, gather_mode="paper",
                                    **TINY)

        def det_forward(p, b, c, *, train=False, rng=None):
            return qa_tiger_forward(p, b, c, train=False)

        rng = np.random.default_rng(11)
        batch = synth_batch(rng)
        # exercise the weighting: pad out two rows
        batch["valid"][-2:] = False

        results = {}
        for name, ga in [("full", 1), ("accum", accum)]:
            cfg = tiny_cfg()
            cfg.hyper_params.optim["grad_accum"] = ga
            mesh = make_mesh(1, devices=jax.devices("cpu"))
            runner = AVQARunner(cfg, model_cfg, qa_tiger_init,
                                det_forward, FROZEN_PREFIXES,
                                mesh=mesh, seed=0)
            # linear-in-gradient update (plain SGD): comparing the updated
            # weights then compares the GRADIENTS. Adam's step-1 update is
            # ~±lr*sign(grad), which amplifies fp32 accumulation-order noise
            # on near-zero gradients into O(lr) weight differences.
            import optax

            runner.tx = optax.sgd(1.0)
            runner.opt_state = runner.tx.init(runner.trainable)
            dev = runner._device_batch(batch)
            runner.trainable, runner.opt_state, losses = runner._train_step(
                runner.trainable, runner.frozen, runner.opt_state, dev,
                jnp.float32(1e-3), jax.random.PRNGKey(5))
            results[name] = (
                jax.tree_util.tree_map(np.asarray, runner.trainable),
                float(losses["ce_loss"]))

        assert results["full"][1] == pytest.approx(results["accum"][1],
                                                   rel=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(results["full"][0]),
                        jax.tree_util.tree_leaves(results["accum"][0])):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

    @pytest.mark.skipif(len(jax.devices("cpu")) < 8,
                        reason="needs 8 virtual devices")
    def test_multidevice_matches_single(self):
        cfg = tiny_cfg()
        model_cfg = qa_tiger_config(num_labels=42, **TINY)
        rng = np.random.default_rng(3)
        batch = synth_batch(rng)

        results = {}
        for name, mesh in [("single", make_mesh(1, devices=jax.devices("cpu"))),
                           ("dp4", make_mesh(4, devices=jax.devices("cpu"))),
                           ("dp2tp2", make_mesh(4, model_parallel=2,
                                                devices=jax.devices("cpu")))]:
            runner = AVQARunner(cfg, model_cfg, qa_tiger_init,
                                qa_tiger_forward, FROZEN_PREFIXES,
                                mesh=mesh, seed=0)
            loader = FakeLoader([batch] * 2)
            runner.train_epoch(1, loader, lr=1e-3)
            dev_batch = runner._device_batch(batch)
            ce = float(runner._eval_step(runner.trainable, runner.frozen,
                                         dev_batch)[0])
            results[name] = ce
        assert results["single"] == pytest.approx(results["dp4"], abs=1e-4)
        assert results["single"] == pytest.approx(results["dp2tp2"], abs=1e-4)


class _ScalarWriter:
    def __init__(self):
        self.scalars = []

    def add_scalar(self, tag, value, step):
        self.scalars.append((tag, float(value), int(step)))


class TestMultiStepDispatch:
    """hyper_params.steps_per_dispatch=K: K train steps ride one scanned jit
    call (AVQARunner._multi_step_impl). Math AND the RNG stream must be the
    per-step path's exactly — the scanned body performs the same
    jax.random.split the host loop does — so params/opt-state/_step_rng and
    every logged per-step loss agree across K."""

    def _run(self, k, batches, log_interval=3, mesh=None):
        cfg = tiny_cfg()
        cfg.log_interval = log_interval
        if k > 1:
            cfg.hyper_params.steps_per_dispatch = k
        model_cfg = qa_tiger_config(num_labels=42, **TINY)
        runner = AVQARunner(cfg, model_cfg, qa_tiger_init, qa_tiger_forward,
                            FROZEN_PREFIXES,
                            mesh=mesh or make_mesh(1,
                                                   devices=jax.devices("cpu")),
                            seed=0)
        writer = _ScalarWriter()
        runner.train_epoch(1, FakeLoader(batches), lr=1e-3, writer=writer)
        return runner, writer

    @pytest.mark.parametrize("k", [2, 3])
    def test_matches_per_step_path(self, k):
        """7 batches with log_interval=3 exercise every window shape: a
        partial flush at a log boundary, full K-windows, and the epoch
        tail — all must land on the per-step path's exact state."""
        rng = np.random.default_rng(21)
        batches = [synth_batch(rng) for _ in range(7)]
        r1, w1 = self._run(1, batches)
        rk, wk = self._run(k, batches)

        # the RNG stream advanced identically (exact integer equality)
        np.testing.assert_array_equal(np.asarray(r1._step_rng),
                                      np.asarray(rk._step_rng))
        for a, b in zip(jax.tree_util.tree_leaves(r1.trainable),
                        jax.tree_util.tree_leaves(rk.trainable)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)
        # every per-step loss scalar logged, same step ids, same values
        assert len(wk.scalars) == len(w1.scalars)
        assert [(t, s) for t, _, s in wk.scalars] == \
            [(t, s) for t, _, s in w1.scalars]
        for (_, v1, _), (_, vk, _) in zip(w1.scalars, wk.scalars):
            assert v1 == pytest.approx(vk, rel=1e-4, abs=1e-5)

    @pytest.mark.skipif(len(jax.devices("cpu")) < 4,
                        reason="needs 4 virtual devices")
    def test_sharded_window(self):
        """The stacked [K, B, ...] window keeps the batch axis sharded over
        'data': on the SAME dp4 mesh, windowed and per-step runs must land
        on the same params (same-mesh comparison isolates the window path
        from the cross-mesh Adam reduction-order noise
        test_multidevice_matches_single sidesteps via eval CE)."""
        rng = np.random.default_rng(22)
        batches = [synth_batch(rng) for _ in range(4)]
        mesh4 = make_mesh(4, devices=jax.devices("cpu"))
        r1, _ = self._run(1, batches, log_interval=100, mesh=mesh4)
        r2, _ = self._run(2, batches, log_interval=100,
                          mesh=make_mesh(4, devices=jax.devices("cpu")))
        np.testing.assert_array_equal(np.asarray(r1._step_rng),
                                      np.asarray(r2._step_rng))
        for a, b in zip(jax.tree_util.tree_leaves(r1.trainable),
                        jax.tree_util.tree_leaves(r2.trainable)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)


class TestQuestionCache:
    """Opt-in question-feature cache (hyper_params.cache_qst_features):
    the frozen tower runs once per dataset, steps gather rows by ds_idx.
    Cached and online paths must agree — the tower is frozen, dropout-free
    and deterministic, so only fp reduction-order noise separates them."""

    def _runner(self, mesh=None):
        cfg = tiny_cfg()
        model_cfg = qa_tiger_config(num_labels=42, **TINY)
        return AVQARunner(
            cfg, model_cfg, qa_tiger_init, qa_tiger_forward, FROZEN_PREFIXES,
            mesh=mesh or make_mesh(1, devices=jax.devices("cpu")), seed=0)

    def test_train_and_eval_match_online(self):
        rng = np.random.default_rng(7)
        batches = [synth_batch(rng) for _ in range(3)]
        tokens = np.concatenate([b["quest"] for b in batches])
        for i, b in enumerate(batches):
            b["ds_idx"] = np.arange(i * B, (i + 1) * B, dtype=np.int32)

        results = {}
        for cached in (False, True):
            r = self._runner()
            if cached:
                # deliberately a different chunking than the batch size:
                # per-row tower outputs must not depend on batch packing
                r.build_question_cache_from_tokens(tokens, "ds", chunk=5)
                r._active_qst_cache = r._qst_caches["ds"]
            losses = []
            for i, hb in enumerate(batches):
                dev = r._device_batch(hb)
                if cached:
                    assert "quest_words" in dev and \
                        dev["quest"].dtype != np.int64
                r.trainable, r.opt_state, step_losses = r._train_step(
                    r.trainable, r.frozen, r.opt_state, dev,
                    jnp.float32(1e-3), jax.random.PRNGKey(i))
                losses.append(float(step_losses["total_loss"]))
            ce, cor, tot, _, _ = r._eval_step(
                r.trainable, r.frozen, r._device_batch(batches[0]))
            results[cached] = (losses, float(ce), int(cor), int(tot),
                               jax.tree_util.tree_map(np.asarray, r.trainable))

        np.testing.assert_allclose(results[True][0], results[False][0],
                                   rtol=1e-5, atol=1e-6)
        assert results[True][1] == pytest.approx(results[False][1], abs=1e-5)
        assert results[True][2:4] == results[False][2:4]
        for a, b in zip(jax.tree_util.tree_leaves(results[True][4]),
                        jax.tree_util.tree_leaves(results[False][4])):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_dataset_cache_selected_per_loader(self):
        """build_question_cache on a duck-typed dataset + the loop's
        per-loader cache selection (train_epoch path)."""
        from qa_tiger_tpu.data.tokenizer import ClipTokenizer

        class DummyDS:
            def __init__(self, texts):
                self.samples = [{"question_content": t} for t in texts]
                self.tokenizer = ClipTokenizer()

        texts = [f"is the instrument number {i} playing?" for i in range(B)]
        ds = DummyDS(texts)
        r = self._runner()
        assert r.build_question_cache(ds)
        assert r.build_question_cache(ds)  # idempotent (cache hit)

        rng = np.random.default_rng(11)
        batch = synth_batch(rng)
        batch["quest"] = np.asarray(ds.tokenizer(texts, truncate=True))
        batch["ds_idx"] = np.arange(B, dtype=np.int32)
        loader = FakeLoader([batch])
        loader.dataset = ds
        r.train_epoch(1, loader, lr=1e-3)          # selects + uses the cache
        assert r._active_qst_cache is not None

        # a loader over an uncached dataset deactivates it
        other = FakeLoader([batch])
        other.dataset = object()
        r._select_qst_cache(other)
        assert r._active_qst_cache is None

        # precomputed-feature datasets are skipped
        ds2 = DummyDS(texts)
        ds2.tokenizer = None
        assert not r.build_question_cache(ds2)
