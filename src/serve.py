"""Persistent batch-serving surface — warm fixed-shape eval steps behind an
HTTP queue (a capability the reference lacks; its closest surface is the
offline split scorer, reference src/trainutils.py:397-462).

The jitted forward is compiled ONCE at startup for a fixed batch shape; a
batcher thread drains the request queue, pads each flush to that shape, and
DISPATCHES it without waiting (JAX async dispatch keeps up to 3 batches in
flight on device); a completer thread materializes results in FIFO order
and fans the answers back out. Fixed shapes are the TPU-native form of
serving this model: every question is 77 tokens and every video is T=60
frames, so continuous batching buys nothing — a full B=256 step saturates
the chip (see scripts/bench_serve.py for the measured rate).

    python src/serve.py --config configs/qa-tiger/vitl14.py \
        --weight best.npz --port 8765 --batch-size 256 --max-wait-ms 10

    POST /predict        {"question": "...", "video": "<vid>", "topk": 5}
    POST /predict_batch  {"items": [{"question", "video"}, ...], "topk": 1}
    GET  /health         readiness (compilation finished)
    GET  /stats          served counts / batch fill / cached-batch count

Note on determinism: under the checkpoint-faithful default
``gather_mode="reference"`` the TempMoE batch-rotated gather (see
ops/tempmoe.py) makes each row's output depend on its batch mates — exactly
as the reference's own batched eval does. Serving configs that need
batch-composition-independent answers should set
``hyper_params.model.gather_mode='paper'``.
"""
from __future__ import annotations

import argparse
import json
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

FILE = Path(__file__).resolve()
ROOT = FILE.parents[1]
sys.path.append(ROOT.as_posix())

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qa_tiger_tpu.data.tokenizer import ClipTokenizer  # noqa: E402
from qa_tiger_tpu.models import build_model  # noqa: E402
from qa_tiger_tpu.parallel import make_mesh  # noqa: E402
from qa_tiger_tpu.training import load_checkpoint  # noqa: E402
from qa_tiger_tpu.training.loop import AVQARunner, merge_params  # noqa: E402
from qa_tiger_tpu.utils import (  # noqa: E402
    enable_compilation_cache,
    load_config_module,
)


def parse_args():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", required=True)
    ap.add_argument("--weight", default="", help="best.npz or torch best.pt")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--batch-size", type=int, default=256,
                    help="fixed compiled batch shape; requests are padded")
    ap.add_argument("--max-wait-ms", type=float, default=10.0,
                    help="max time the batcher waits to fill a batch after "
                         "the first request arrives")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--device-cache", type=int, default=0,
                    help="keep up to N videos' features resident in device "
                         "memory; cached requests assemble their batch "
                         "on-device (only the 77 token ids cross the host "
                         "boundary), the TPU-native serving fast path")
    return ap.parse_args()


class FeatureStore:
    """Host-side cache over the shared per-video feature loading contract
    (qa_tiger_tpu.data.dataset.load_video_features — one implementation for
    the dataset, predict.py, and this server)."""

    def __init__(self, cfg):
        self.cfg_data = cfg.data
        root = Path(cfg.data.root)
        if not root.is_absolute():
            root = ROOT / root
        self.dirs = {k: root / sub for k, sub in
                     (("audio", cfg.data.audio_feat),
                      ("video", cfg.data.video_feat),
                      ("patch", cfg.data.get("patch_feat"))) if sub}
        self._cache: dict = {}
        self._lock = threading.Lock()

    def get(self, video_id: str) -> dict:
        from qa_tiger_tpu.data.dataset import load_video_features

        with self._lock:
            if video_id in self._cache:
                return self._cache[video_id]
        out = load_video_features(self.cfg_data, video_id, repo_root=ROOT)
        with self._lock:
            if len(self._cache) > 4096:  # bound host memory
                self._cache.clear()
            self._cache[video_id] = out
        return out


class Service:
    """Owns the compiled step, the request queue, and the batcher thread."""

    def __init__(self, args):
        cfg = load_config_module(args.config)
        if args.weight:
            cfg["weight"] = args.weight
        self.cfg = cfg
        self.batch_size = args.batch_size
        self.max_wait = args.max_wait_ms / 1e3
        self.dtype = jnp.dtype(args.dtype)

        root = Path(cfg.data.root)
        if not root.is_absolute():
            root = ROOT / root
        vocab = json.loads((root / cfg.data.ans_quelen).read_text())["ans2ix"]
        self.ix2ans = {int(v): k for k, v in vocab.items()}

        model_cfg, init_fn, forward_fn, frozen = build_model(
            cfg.hyper_params.model_type, cfg.hyper_params.model,
            num_labels=len(vocab))
        platform = cfg.hyper_params.get("platform")
        devices = jax.devices(platform) if platform else jax.devices()
        if platform:
            jax.config.update("jax_default_device", devices[0])
        self.runner = AVQARunner(
            cfg, model_cfg, init_fn, forward_fn, frozen,
            mesh=make_mesh(n_devices=1, devices=devices),
            seed=int(cfg.get("seed", 0)))
        clip_weights = cfg.hyper_params.model.get("clip_weights")
        if clip_weights:
            self.runner.load_clip_text_weights(clip_weights)
        if cfg.get("weight"):
            params, missing, unexpected = load_checkpoint(
                cfg.weight, self.runner.params)
            if missing or unexpected:
                print(f"# missing={missing} unexpected={unexpected}",
                      file=sys.stderr)
            self.runner.load_params(params)

        self.store = FeatureStore(cfg)
        self.tokenizer = ClipTokenizer()
        self._tok_cache: dict = {}
        self._tok_lock = threading.Lock()
        params = merge_params(self.runner.trainable, self.runner.frozen)
        if self.dtype != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(self.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
        self._params = params
        # softmax lives INSIDE the jit so a served batch is exactly ONE
        # device dispatch; on this backend every eager op is a separate
        # tunnel round-trip, and the old logits->astype->softmax->slice
        # chain cost three extra ones per batch
        self._forward = jax.jit(
            lambda p, b: jax.nn.softmax(
                forward_fn(p, b, self.runner.model_cfg,
                           train=False)["out"].astype(jnp.float32), axis=-1))

        # device-resident feature cache: features of the N hottest videos
        # stay in HBM as [N, ...] buffers; a cached request's batch is
        # assembled ON DEVICE by an index gather, so per-request host->device
        # traffic is the 77 token ids, not ~MBs of features
        self.cache_cap = max(0, args.device_cache)
        self._dev_bufs: dict = {}
        self._dev_slots: dict = {}
        self._cache_lock = threading.Lock()
        if self.cache_cap:
            def _fwd_cached(p, bufs, idx, quest):
                batch = {k: jnp.take(v, idx, axis=0)
                         for k, v in bufs.items()}
                batch["quest"] = quest
                out = forward_fn(p, batch, self.runner.model_cfg,
                                 train=False)["out"]
                return jax.nn.softmax(out.astype(jnp.float32), axis=-1)

            self._forward_cached = jax.jit(_fwd_cached)

            def _insert(buf, row, slot):
                return buf.at[slot].set(row)

            # NOT donated: in-flight cached forwards may still read the old
            # buffer; .at[].set copies, and inserts are rare (cache fills
            # once), so the copy is the price of lock-free forwards
            self._insert = jax.jit(_insert)

        self.queue: "queue.Queue" = queue.Queue()
        self.ready = threading.Event()
        self.failed: str | None = None
        self.stats = {"served": 0, "batches": 0, "rows": 0,
                      "cached_batches": 0}
        self._stop = threading.Event()
        # batches in flight on device; maxsize bounds device-queue depth so
        # the batcher stalls (backpressure) rather than piling work up
        self._inflight: "queue.Queue" = queue.Queue(maxsize=3)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._completer = threading.Thread(target=self._complete,
                                           daemon=True)
        self._thread.start()
        self._completer.start()

    # ------------------------------------------------------------------
    def _example_rows(self):
        """One row for warmup. Prefer a real feature file so the compiled
        shape is exactly the serving shape; synthetic fallback otherwise."""
        for d in self.store.dirs.values():
            for f in sorted(d.glob("*.npy"))[:1]:
                try:
                    feats = self.store.get(f.stem)
                    tokens = self.tokenizer(
                        "warmup question", truncate=True)[0]
                    return feats, tokens.astype(np.int32)
                except FileNotFoundError:
                    pass
        t = int(self.cfg.data.get("num_frames", 60) or 60)
        rng = np.random.default_rng(0)
        feats = {}
        dims = {"audio": self.runner.model_cfg.get("audio_dim", 128),
                "video": self.runner.model_cfg.get("video_dim", 768)}
        for key in self.store.dirs:
            if key == "patch":
                feats[key] = rng.standard_normal(
                    (t, 14, self.runner.model_cfg.get("patch_dim", 1024))
                ).astype(np.float32)
            else:
                feats[key] = rng.standard_normal(
                    (t, dims[key])).astype(np.float32)
        tokens = self.tokenizer("warmup question", truncate=True)[0]
        return feats, tokens.astype(np.int32)

    def _dispatch(self, rows):
        """rows: list of dicts {tokens, video, slot, feats}. Pads to the
        compiled batch_size and dispatches ONE jitted forward; returns the
        still-on-device [B, num_labels] probability array WITHOUT blocking
        on it, so the batcher can assemble the next batch while this one
        runs (JAX async dispatch is the pipeline)."""
        pad = self.batch_size - len(rows)
        # token ids are cached int32 in _tokens (the BPE vocab is 49408 so
        # int32 is lossless; it halves the per-batch host->device quest
        # transfer), so the stack here needs no per-batch astype copy —
        # this is exactly the per-row host path that caps the serve rate
        quest = np.stack([r["tokens"] for r in rows]
                         + [rows[0]["tokens"]] * pad)
        if self.cache_cap and self._dev_slots \
                and all(r["slot"] is not None for r in rows):
            # TPU-native fast path: gather the batch from HBM-resident
            # feature buffers; only token ids crossed the host boundary
            idx = np.array([r["slot"] for r in rows]
                           + [rows[0]["slot"]] * pad, np.int32)
            with self._cache_lock:
                bufs = self._dev_bufs  # snapshot; inserts swap in NEW
                # buffers (non-donating .at[].set), old ones stay valid
            self.stats["cached_batches"] += 1
            return self._forward_cached(
                self._params, bufs, jnp.asarray(idx), jnp.asarray(quest))
        batch = {}
        feats0 = rows[0]["feats"] or self.store.get(rows[0]["video"])
        for key in feats0:
            stack = np.stack(
                [(r["feats"] or self.store.get(r["video"]))[key]
                 for r in rows] + [feats0[key]] * pad)
            batch[key] = stack.astype(self.dtype)
        batch["quest"] = quest
        dev = self.runner._device_batch(batch)
        return self._forward(self._params, dev)

    def _step(self, rows):
        """Synchronous dispatch+materialize (warmup path)."""
        return np.asarray(self._dispatch(rows))[:len(rows)]

    def _warm_cached_path(self, feats):
        """Compile the device-gather forward against full-size HBM buffers."""
        bufs = {k: jnp.zeros((self.cache_cap,) + v.shape, self.dtype)
                for k, v in feats.items()}
        idx = jnp.zeros((self.batch_size,), jnp.int32)
        quest = jnp.zeros((self.batch_size,) + self.tokenizer(
            "w", truncate=True)[0].shape, jnp.int32)
        np.asarray(self._forward_cached(self._params, bufs, idx, quest))
        del bufs

    def _run(self):
        # warmup compile with a full synthetic batch, then open for business.
        # A failure here (corrupt feature file, OOM during the compile) must
        # not silently kill the daemon thread — record it so /health and
        # every pending future report the error instead of hanging.
        try:
            feats, tokens = self._example_rows()
            self._step([{"tokens": tokens, "video": None, "slot": None,
                         "feats": feats}] * self.batch_size)
            if self.cache_cap:
                self._warm_cached_path(feats)
        except Exception as exc:
            self.failed = f"{type(exc).__name__}: {exc}"
            self.ready.set()  # unblock health checks; they report failure
            while not self._stop.is_set():
                try:
                    _, futs = self._get_item(timeout=0.25)
                except queue.Empty:
                    continue
                for fut in futs:
                    fut["error"] = self.failed
                    fut["event"].set()
            self._fail_waiters([], self.failed)
            return
        self.ready.set()
        # rows accepted but not yet dispatched. Bulk enqueues
        # (predict_many) land as ONE queue item, so a client-side batch
        # fills a device batch in a single get() instead of racing the
        # fill window one row at a time on the shared core — the
        # under-fill (avg_fill 0.77) that capped the measured serve rate.
        pending_rows: list = []
        pending_futs: list = []
        while not self._stop.is_set():
            if not pending_rows:
                try:
                    rows, futs = self._get_item(timeout=0.25)
                except queue.Empty:
                    continue
                pending_rows.extend(rows)
                pending_futs.extend(futs)
            deadline = time.monotonic() + self.max_wait
            while len(pending_rows) < self.batch_size:
                if self._stop.is_set():
                    break
                remaining = min(deadline - time.monotonic(), 0.25)
                if remaining <= 0:
                    break
                try:
                    rows, futs = self._get_item(timeout=remaining)
                except queue.Empty:
                    if time.monotonic() >= deadline:
                        break
                    continue
                pending_rows.extend(rows)
                pending_futs.extend(futs)
            if self._stop.is_set():
                break  # pending rows fail fast via the drain below
            rows = pending_rows[:self.batch_size]
            futures = pending_futs[:self.batch_size]
            del pending_rows[:self.batch_size]
            del pending_futs[:self.batch_size]
            try:
                probs_dev = self._dispatch(rows)
            except Exception as exc:  # pragma: no cover
                for fut in futures:
                    fut["error"] = str(exc)
                    fut["event"].set()
                continue
            # hand the in-flight device array to the completer and go
            # straight back to assembling the next batch — device compute
            # and the result fetch overlap with host-side batch assembly
            placed = False
            while not self._stop.is_set():
                try:
                    self._inflight.put((probs_dev, futures), timeout=0.25)
                    placed = True
                    break
                except queue.Full:
                    continue
            if not placed:  # stopped mid-handoff: the completer will never
                pending_futs.extend(futures)  # see this batch — fail it too
        # shutdown: fail fast everything still waiting on this thread —
        # rows buffered locally and items still in the queue would
        # otherwise strand their callers for the full _await timeout
        self._fail_waiters(pending_futs, "shutting down")

    def _fail_waiters(self, futs, reason):
        """Complete the given futures AND everything left in the request
        queue with an error so predict/predict_many callers unblock
        immediately instead of riding out the 120 s _await timeout."""
        futs = list(futs)
        while True:
            try:
                _, more = self._get_item(timeout=0)
            except queue.Empty:
                break
            futs.extend(more)
        for fut in futs:
            fut.setdefault("error", reason)
            fut["event"].set()

    def _get_item(self, timeout):
        """Pop one queue item as (rows, futures) lists. Accepts both the
        bulk form ([rows], [futs]) that predict/predict_many enqueue and a
        bare (row_dict, fut) pair (unit tests drive the queue directly)."""
        rows, futs = self.queue.get(timeout=timeout)
        if isinstance(rows, dict):
            return [rows], [futs]
        return rows, futs

    def _complete(self):
        """Materialize in-flight batches in FIFO order and fan answers out.
        np.asarray here is where the wait-for-device happens; it runs OFF
        the batcher thread so the chip never idles between batches."""
        while not self._stop.is_set():
            try:
                probs_dev, futures = self._inflight.get(timeout=0.25)
            except queue.Empty:
                continue
            # stats BEFORE the events: a client that polls /stats right
            # after its answer arrives must see its own batch counted
            self.stats["served"] += len(futures)
            self.stats["batches"] += 1
            self.stats["rows"] += self.batch_size
            try:
                probs = np.asarray(probs_dev)
                for i, fut in enumerate(futures):
                    fut["probs"] = probs[i]
                    fut["event"].set()
            except Exception as exc:  # pragma: no cover — device-side
                for fut in futures:  # error surfaces at materialization
                    fut["error"] = str(exc)
                    fut["event"].set()
        # shutdown: batches still in flight never materialize — unblock
        # their waiters instead of stranding them on the _await timeout
        while True:
            try:
                _, futures = self._inflight.get_nowait()
            except queue.Empty:
                break
            for fut in futures:
                fut.setdefault("error", "shutting down")
                fut["event"].set()

    # ------------------------------------------------------------------
    def _tokens(self, question: str) -> np.ndarray:
        with self._tok_lock:
            hit = self._tok_cache.get(question)
        if hit is not None:
            return hit
        tokens = self.tokenizer(question, truncate=True)[0].astype(np.int32)
        ctx = self.runner.model_cfg.get("text_ctx")
        if ctx and int(tokens.argmax(-1)) >= ctx:
            raise ValueError(
                f"text_ctx={ctx} but the question's EOT sits at position "
                f"{int(tokens.argmax(-1))}")
        with self._tok_lock:
            if len(self._tok_cache) > 65536:
                self._tok_cache.clear()
            self._tok_cache[question] = tokens
        return tokens

    def _slot_for(self, video_id: str):
        """Device-cache slot for a video (insert on first use; None when the
        cache is full or disabled)."""
        if not self.cache_cap:
            return None
        with self._cache_lock:
            if video_id in self._dev_slots:
                return self._dev_slots[video_id]
        feats = self.store.get(video_id)  # host load outside the lock
        with self._cache_lock:
            if video_id in self._dev_slots:
                return self._dev_slots[video_id]
            if len(self._dev_slots) >= self.cache_cap:
                return None
            if not self._dev_bufs:
                self._dev_bufs = {
                    k: jnp.zeros((self.cache_cap,) + v.shape, self.dtype)
                    for k, v in feats.items()}
            slot = len(self._dev_slots)
            for k, v in feats.items():
                self._dev_bufs[k] = self._insert(
                    self._dev_bufs[k], jnp.asarray(v, self.dtype), slot)
            self._dev_slots[video_id] = slot
            return slot

    def _make_row(self, question: str, video_id: str) -> dict:
        tokens = self._tokens(question)
        slot = self._slot_for(video_id)
        feats = None if slot is not None else self.store.get(video_id)
        return {"tokens": tokens, "video": video_id, "slot": slot,
                "feats": feats}

    def _await(self, fut):
        if not fut["event"].wait(timeout=120):
            raise TimeoutError("batcher did not answer within 120s")
        if "error" in fut:
            raise RuntimeError(fut["error"])
        return fut["probs"]

    def _topk_payload(self, question, video_id, probs, topk):
        top = np.argsort(-probs)[:topk]
        return {
            "question": question,
            "video": video_id,
            "answer": self.ix2ans.get(int(top[0]), str(int(top[0]))),
            "topk": [{"answer": self.ix2ans.get(int(i), str(int(i))),
                      "prob": round(float(probs[i]), 4)} for i in top],
        }

    def predict(self, question: str, video_id: str, topk: int):
        fut = {"event": threading.Event()}
        self.queue.put(([self._make_row(question, video_id)], [fut]))
        return self._topk_payload(question, video_id, self._await(fut), topk)

    def predict_many(self, items, topk: int):
        """Enqueue a client-side batch as ONE queue item: the batcher sees
        the whole chunk at once instead of draining it row by row against
        its fill window (amortizes transport AND keeps batches full)."""
        rows = [self._make_row(it["question"], it["video"]) for it in items]
        futs = [{"event": threading.Event()} for _ in items]
        self.queue.put((rows, futs))
        return [self._topk_payload(it["question"], it["video"],
                                   self._await(fut), topk)
                for it, fut in zip(items, futs)]

    def shutdown(self):
        self._stop.set()


def make_handler(service: Service):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                if service.failed:
                    self._send(500, {"status": "failed",
                                     "error": service.failed})
                elif service.ready.is_set():
                    self._send(200, {"status": "ok",
                                     "batch_size": service.batch_size})
                else:
                    self._send(503, {"status": "compiling"})
            elif self.path == "/stats":
                s = dict(service.stats)
                s["avg_fill"] = round(
                    s["served"] / max(1, s["rows"]), 4)
                self._send(200, s)
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                if self.path == "/predict":
                    out = service.predict(
                        req["question"], req["video"],
                        int(req.get("topk", 1)))
                elif self.path == "/predict_batch":
                    out = {"results": service.predict_many(
                        req["items"], int(req.get("topk", 1)))}
                else:
                    self._send(404, {"error": "not found"})
                    return
                self._send(200, out)
            except FileNotFoundError as exc:
                self._send(404, {"error": f"unknown video: {exc}"})
            except Exception as exc:
                self._send(500, {"error": str(exc)})

        def log_message(self, *a):  # quiet
            pass

    return Handler


def main():
    enable_compilation_cache()
    args = parse_args()
    service = Service(args)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(service))
    print(json.dumps({"serving": f"http://{args.host}:{args.port}",
                      "batch_size": args.batch_size,
                      "dtype": str(args.dtype)}), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.shutdown()
        server.server_close()


if __name__ == "__main__":
    main()
