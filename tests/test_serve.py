"""Batch-serving surface: spawn src/serve.py, fire concurrent requests,
assert the batched answers equal a direct jitted forward on the same
checkpoint (the server pads each flush to its fixed compiled shape)."""
import json
import os
import socket
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np
import pytest

import jax

REPO = Path(__file__).resolve().parents[1]
T, P = 8, 3
ANSWERS = ["one", "two", "three", "four"]
VIDEOS = ["va", "vb", "vc"]
QUESTIONS = [
    "How many instruments are playing?",
    "Is the ukulele louder than the cello?",
    "Where is the piano?",
]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    data = root / "data"
    rng = np.random.default_rng(0)
    for sub, shape in [("vggish", (T, 16)), ("clip", (T, 32)),
                       ("tome", (T, P, 24))]:
        (data / sub).mkdir(parents=True)
        for v in VIDEOS:
            np.save(data / sub / f"{v}.npy",
                    rng.standard_normal(shape).astype(np.float32))
    (data / "answer2idx.json").write_text(json.dumps(
        {"ans2ix": {a: i for i, a in enumerate(ANSWERS)},
         "max_que_len": 24}))

    cfg = root / "tiny_serve.py"
    cfg.write_text(f"""
import qa_tiger_tpu.models.clip_text as _ct
_ct.CLIP_TEXT_CONFIGS.setdefault('tiny-serve', dict(width=32, heads=4,
                                                    layers=1, embed_dim=32))
config = dict(
    type='qa-tiger', seed=3, epochs=1, num_labels={len(ANSWERS)},
    log_interval=100, output_dir='{(root / 'out').as_posix()}', weight='',
    data=dict(root='{data.as_posix()}', img_size=336, batch_size=4,
              eval_batch_size=4, num_workers=0, frame_sample_rate=1,
              train_annot='x.json', valid_annot='x.json',
              test_annot='x.json', test_annots=None,
              ans_quelen='answer2idx.json', quest_feat=None,
              audio_feat='vggish', video_feat='clip', patch_feat='tome',
              prompt_feat=None),
    hyper_params=dict(gpus='0', platform='cpu', model_type='QA-TIGER_tiny',
        # gather_mode='paper' makes row outputs independent of batch
        # composition, so server answers (padded batches) are comparable to
        # a direct batch-of-1 forward. Under the checkpoint-faithful default
        # gather_mode='reference' the TempMoE batch-rotated gather makes any
        # batched eval depend on its batch mates (see ops/tempmoe.py).
        model=dict(d_model=32, video_dim=32, patch_dim=24, audio_dim=16,
                   topK=2, num_experts=3, encoder_type='tiny-serve',
                   gather_mode='paper'),
        optim=dict(lr=1e-3, encoder_lr=None, min_lr=1e-7, weight_decay=0,
                   betas=(0.95, 0.999)),
        sched=dict(name='StepLR', mode='min', gamma=0.1, step_size=8,
                   factor=0.5, patience=5, verbose=True, warmup_epochs=1)),
)
""")

    port = _free_port()
    env = dict(os.environ)
    plats = env.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        env["JAX_PLATFORMS"] = plats + ",cpu"
    elif not plats:
        env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "src/serve.py", "--config", str(cfg),
         "--port", str(port), "--batch-size", "4", "--max-wait-ms", "200"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    base = f"http://127.0.0.1:{port}"
    deadline = time.monotonic() + 600
    last = ""
    try:
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                raise RuntimeError(
                    f"server died: {proc.stdout.read()[-3000:]}")
            try:
                with urllib.request.urlopen(base + "/health",
                                            timeout=5) as r:
                    if r.status == 200:
                        break
            except Exception as exc:  # not up / still compiling
                last = str(exc)
            time.sleep(2)
        else:
            raise TimeoutError(f"server never became healthy: {last}")
        yield base, cfg
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()


def _post(base, payload):
    req = urllib.request.Request(
        base + "/predict", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=180) as r:
        return json.loads(r.read())


def _direct_answers(cfg_path, requests):
    """Ground truth: same config/seed, direct jitted forward, batch of 1."""
    import qa_tiger_tpu.models.clip_text as ct

    ct.CLIP_TEXT_CONFIGS.setdefault(
        "tiny-serve", dict(width=32, heads=4, layers=1, embed_dim=32))
    from qa_tiger_tpu.data.tokenizer import ClipTokenizer
    from qa_tiger_tpu.models import build_model
    from qa_tiger_tpu.parallel import make_mesh
    from qa_tiger_tpu.training.loop import AVQARunner, merge_params
    from qa_tiger_tpu.utils import load_config_module

    cfg = load_config_module(str(cfg_path))
    model_cfg, init_fn, forward_fn, frozen = build_model(
        cfg.hyper_params.model_type, cfg.hyper_params.model,
        num_labels=len(ANSWERS))
    runner = AVQARunner(cfg, model_cfg, init_fn, forward_fn, frozen,
                        mesh=make_mesh(1, devices=jax.devices("cpu")),
                        seed=int(cfg.seed))
    params = merge_params(runner.trainable, runner.frozen)
    root = Path(cfg.data.root)
    tok = ClipTokenizer()
    out = []
    fwd = jax.jit(lambda p, b: forward_fn(p, b, runner.model_cfg,
                                          train=False)["out"])
    for question, video in requests:
        batch = {
            "audio": np.load(root / "vggish" / f"{video}.npy")[None],
            "video": np.load(root / "clip" / f"{video}.npy")[None],
            "patch": np.load(root / "tome" / f"{video}.npy")[None],
            "quest": tok(question, truncate=True).astype(np.int64),
        }
        logits = np.asarray(fwd(params, runner._device_batch(batch)))[0]
        out.append(ANSWERS[int(np.argmax(logits))])
    return out


def test_concurrent_requests_match_direct_forward(served):
    base, cfg_path = served
    requests = [(QUESTIONS[i % 3], VIDEOS[i % 3]) for i in range(8)]

    results = [None] * len(requests)
    errors = []

    def worker(i):
        try:
            results[i] = _post(base, {"question": requests[i][0],
                                      "video": requests[i][1], "topk": 2})
        except Exception as exc:  # pragma: no cover
            errors.append((i, exc))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(requests))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors

    for i, res in enumerate(results):
        assert res is not None
        assert res["answer"] in ANSWERS
        assert len(res["topk"]) == 2
        assert res["topk"][0]["answer"] == res["answer"]

    # batching actually happened (8 concurrent requests, fixed B=4 steps)
    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["served"] >= len(requests)
    assert stats["batches"] >= 2

    expected = _direct_answers(cfg_path, requests)
    got = [res["answer"] for res in results]
    assert got == expected, f"served {got} != direct {expected}"

    # unknown video -> 404, not a crash
    req = urllib.request.Request(
        base + "/predict",
        data=json.dumps({"question": "q", "video": "nope"}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        raise AssertionError("expected HTTP error for unknown video")
    except urllib.error.HTTPError as e:
        assert e.code in (404, 500)


def test_warmup_failure_surfaces(tmp_path):
    """A corrupt feature file during warmup must not silently kill the
    batcher thread: the Service records the error, /health semantics go
    'failed', and queued requests fail fast instead of hanging 120 s."""
    import sys as _sys
    from types import SimpleNamespace

    _sys.path.insert(0, str(REPO / "src"))
    from serve import Service

    import qa_tiger_tpu.models.clip_text as ct

    ct.CLIP_TEXT_CONFIGS.setdefault(
        "tiny-serve-f", dict(width=32, heads=4, layers=1, embed_dim=32))
    data = tmp_path / "data"
    (data / "vggish").mkdir(parents=True)
    (data / "vggish" / "va.npy").write_bytes(b"not an npy file")
    (data / "answer2idx.json").write_text(json.dumps(
        {"ans2ix": {"one": 0, "two": 1}, "max_que_len": 24}))
    cfg = tmp_path / "cfg.py"
    cfg.write_text(f"""
config = dict(
    type='qa-tiger', seed=3, num_labels=2, weight='',
    data=dict(root='{data.as_posix()}', num_frames={T}, frame_sample_rate=1,
              ans_quelen='answer2idx.json', audio_feat='vggish',
              video_feat=None, patch_feat=None),
    hyper_params=dict(platform='cpu', model_type='QA-TIGER_tiny',
        model=dict(d_model=32, video_dim=32, patch_dim=24, audio_dim=16,
                   topK=2, num_experts=3, encoder_type='tiny-serve-f'),
        optim=dict(lr=1e-3, betas=(0.95, 0.999), weight_decay=0),
        sched=dict(name='StepLR', step_size=8, gamma=0.1)),
)
""")
    svc = Service(SimpleNamespace(config=str(cfg), weight="", batch_size=2,
                                  max_wait_ms=5.0, dtype="float32",
                                  device_cache=0))
    assert svc.ready.wait(timeout=300)
    assert svc.failed is not None
    # a queued request fails fast with the recorded error instead of
    # hanging until the 120 s await timeout
    import threading as _threading
    fut = {"event": _threading.Event()}
    svc.queue.put(({"tokens": np.zeros(20, np.int64), "video": "va",
                    "slot": None, "feats": None}, fut))
    with pytest.raises(RuntimeError):
        svc._await(fut)
    svc.shutdown()


def _tiny_service(tmp_path, batch_size=2):
    """A ready Service over a 1-layer tower and a single vggish feature dir
    (CPU platform) — cheap enough for unit tests of the batcher internals."""
    import sys as _sys
    from types import SimpleNamespace

    _sys.path.insert(0, str(REPO / "src"))
    from serve import Service

    import qa_tiger_tpu.models.clip_text as ct

    ct.CLIP_TEXT_CONFIGS.setdefault(
        "tiny-serve-p", dict(width=32, heads=4, layers=1, embed_dim=32))
    data = tmp_path / "data"
    rng = np.random.default_rng(0)
    for sub, shape in [("vggish", (T, 16)), ("clip", (T, 32)),
                       ("tome", (T, P, 24))]:
        (data / sub).mkdir(parents=True)
        np.save(data / sub / "va.npy",
                rng.standard_normal(shape).astype(np.float32))
    (data / "answer2idx.json").write_text(json.dumps(
        {"ans2ix": {"one": 0, "two": 1}, "max_que_len": 24}))
    cfg = tmp_path / "cfg.py"
    cfg.write_text(f"""
config = dict(
    type='qa-tiger', seed=3, num_labels=2, weight='',
    data=dict(root='{data.as_posix()}', num_frames={T}, frame_sample_rate=1,
              ans_quelen='answer2idx.json', audio_feat='vggish',
              video_feat='clip', patch_feat='tome'),
    hyper_params=dict(platform='cpu', model_type='QA-TIGER_tiny',
        model=dict(d_model=32, video_dim=32, patch_dim=24, audio_dim=16,
                   topK=2, num_experts=3, encoder_type='tiny-serve-p'),
        optim=dict(lr=1e-3, betas=(0.95, 0.999), weight_decay=0),
        sched=dict(name='StepLR', step_size=8, gamma=0.1)),
)
""")
    svc = Service(SimpleNamespace(config=str(cfg), weight="",
                                  batch_size=batch_size, max_wait_ms=5.0,
                                  dtype="float32", device_cache=0))
    assert svc.ready.wait(timeout=300)
    assert svc.failed is None, svc.failed
    return svc


def test_bulk_enqueue_fills_batches(tmp_path):
    """predict_many must land its whole chunk as ONE queue item, and the
    batcher must carve full batches out of its pending buffer instead of
    racing the fill window one row at a time (the avg_fill<1 cause under
    a saturating client): 5 rows at batch_size=2 -> dispatches of 2/2/1
    even with a ZERO fill window, and FIFO answers for every row."""
    svc = _tiny_service(tmp_path, batch_size=2)
    try:
        svc.max_wait = 0.0  # bulk item arrives whole; no window needed
        dispatched = []

        def fake_dispatch(rows):
            dispatched.append(len(rows))
            # row i's prob vector encodes its global order via argmax
            base = sum(dispatched[:-1])
            out = np.zeros((svc.batch_size, 2), np.float32)
            for i in range(len(rows)):
                out[i, (base + i) % 2] = 1.0
            return out

        svc._dispatch = fake_dispatch
        out = svc.predict_many(
            [{"question": f"q{i}", "video": "va"} for i in range(5)],
            topk=1)
        assert [len(r["topk"]) for r in out] == [1] * 5
        assert dispatched == [2, 2, 1], dispatched
        # FIFO: global row i -> argmax i % 2
        assert [r["answer"] for r in out] == \
            ["one", "two", "one", "two", "one"]
    finally:
        svc.shutdown()


def test_shutdown_fails_pending_waiters_fast(tmp_path):
    """Rows buffered in the batcher (partial batch waiting on the fill
    window) or still in the queue at shutdown must be completed with an
    error promptly — not stranded for the 120 s _await timeout."""
    import threading
    import time as _time

    svc = _tiny_service(tmp_path, batch_size=4)
    svc.max_wait = 30.0  # a partial batch would wait here forever-ish

    futs = [{"event": threading.Event()} for _ in range(3)]
    row = {"tokens": np.zeros(77, np.int32), "video": "va", "slot": None,
           "feats": None}
    svc.queue.put(([row], [futs[0]]))           # picked up into pending
    _time.sleep(0.6)                            # batcher now in fill window
    svc.queue.put(([row, row], futs[1:]))       # still in the queue at stop
    svc.shutdown()
    t0 = _time.perf_counter()
    for f in futs:
        assert f["event"].wait(timeout=5), "waiter stranded at shutdown"
        assert f.get("error"), f
    assert _time.perf_counter() - t0 < 5


def test_pipelined_batcher_overlap_order_and_errors(tmp_path):
    """The batcher must keep dispatching while earlier batches are still
    being materialized (the pipeline that hides device latency), answers
    must come back in FIFO row order, and an error that only surfaces at
    materialization time must fan out to exactly that batch's futures."""
    svc = _tiny_service(tmp_path, batch_size=2)
    try:
        # generous fill window: consecutive puts land µs apart, so every
        # batch fills to exactly batch_size (deterministic boundaries)
        svc.max_wait = 5.0
        gate = threading.Event()
        dispatched = []

        class Deferred:
            """np.asarray(...) blocks until the gate opens (batch `tag`),
            or raises (tag == 'boom') — a stand-in for an in-flight device
            array whose fetch waits on / fails inside the device."""

            def __init__(self, tag, batch_size):
                self.tag, self.n = tag, batch_size

            def __array__(self, dtype=None, copy=None):
                if not gate.wait(timeout=60):  # pragma: no cover
                    raise TimeoutError("gate never opened")
                if self.tag == "boom":
                    raise RuntimeError("device exploded at fetch")
                return np.full((self.n, 2), float(self.tag), np.float32)

        def fake_dispatch(rows):
            tag = "boom" if rows[0]["tokens"][0] == 99 else len(dispatched)
            dispatched.append(len(rows))
            return Deferred(tag, svc.batch_size)

        svc._dispatch = fake_dispatch

        def enqueue(first_token=0):
            fut = {"event": threading.Event()}
            svc.queue.put(({"tokens": np.full(20, first_token, np.int64),
                            "video": "va", "slot": None, "feats": None},
                           fut))
            return fut

        # 6 rows = 3 full batches; the completer blocks on batch 0's
        # materialization, yet all 3 must be DISPATCHED (pipeline depth 3)
        futs = [enqueue() for _ in range(6)]
        deadline = time.monotonic() + 30
        while len(dispatched) < 3 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert len(dispatched) == 3, \
            f"batcher stalled behind the completer: {dispatched}"
        assert not any(f["event"].is_set() for f in futs)

        gate.set()
        probs = [svc._await(f) for f in futs]
        # FIFO: rows i=0,1 -> batch 0, i=2,3 -> batch 1, i=4,5 -> batch 2
        for i, p in enumerate(probs):
            assert p[0] == float(i // 2), (i, p)

        # a batch whose fetch raises fails ONLY its own futures
        bad = [enqueue(first_token=99) for _ in range(2)]
        good = [enqueue() for _ in range(2)]
        with pytest.raises(RuntimeError, match="device exploded"):
            svc._await(bad[0])
        with pytest.raises(RuntimeError):
            svc._await(bad[1])
        for f in good:
            assert svc._await(f)[0] == 4.0  # batch index 4 (5 dispatches)
        assert svc.stats["batches"] == 5
        assert svc.stats["served"] == 10
    finally:
        svc.shutdown()
