"""Minimal production-style serving front-end (continuous batching).

The reference engine has no server and leaves continuous batching as a
TODO (reference: README.md:110); this exposes the engine's
``submit``/``serve_step`` mid-flight-admission API over HTTP with only
stdlib dependencies:

  POST /generate   {"prompt": "text" | [token ids],
                    "max_tokens": 128, "temperature": 0.0,
                    "top_k": 0, "top_p": 1.0, "ignore_eos": false,
                    "blocking": true}
                   -> {"request_id", "token_ids", "text"?, "num_tokens",
                       "mat"} (blocks until that request finishes; other
                       requests keep decoding in the same batch).
                   With "blocking": false -> {"request_id"} as soon as
                   the request is admitted; collect with /result.
  GET  /result?request_id=N -> blocks until that request finishes
  POST /cancel     {"request_id": N} -> {"cancelled": bool} — aborts a
                   queued or in-flight request; its waiter gets
                   {"cancelled": true}
  GET  /health     -> {"ok": true, "queued": N, "running": N}

  With "stream": true, /generate responds with newline-delimited JSON:
  first {"request_id"}, then {"token_ids": [...], "done": false} chunks
  as tokens VERIFY (only the rollback-proof prefix is ever emitted —
  engine.serve_step with_deltas), and a final {"done": true, ...} record
  with the usual result fields.

All engine interaction happens on ONE driver thread (JAX dispatch is
not re-entrant); HTTP handlers enqueue work and wait on per-request
events. Requests submitted while a batch is in flight join it at the
next serve_step in pre-verify state — no draining.

Demo (no checkpoints):  python serve.py --layer-share --cpu --port 8700
Real checkpoints:       python serve.py -d DRAFT_DIR -t TARGET_DIR
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class PearlServer:
    """Driver thread: owns the engine, admits queued requests, steps the
    continuous-batching loop, resolves waiters on completion."""

    def __init__(self, engine, fused_rounds: int = 8, idle_sleep: float = 0.005):
        self.engine = engine
        self.fused_rounds = fused_rounds
        self.idle_sleep = idle_sleep
        self.inbox: queue.Queue = queue.Queue()
        self.cancel_box: queue.Queue = queue.Queue()
        self.results: dict[int, dict] = {}
        self.events: dict[int, threading.Event] = {}
        # per-request streaming subscriptions: seq_id -> Queue of
        # (token_ids, finished); registered by the DRIVER at admission so
        # no delta can be produced before the queue exists
        self.streams: dict[int, queue.Queue] = {}
        self.lock = threading.Lock()
        self.queued = 0
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def submit_async(self, prompt, params, timeout: float = 60.0,
                     stream_q: queue.Queue | None = None) -> int:
        """Thread-safe: enqueue a request, return its id at admission."""
        admitted = threading.Event()
        done = threading.Event()
        self.inbox.put((prompt, params, done, admitted, stream_q))
        with self.lock:
            self.queued += 1
        if not admitted.wait(timeout):
            raise TimeoutError("admission timed out")
        if getattr(done, "error", None):
            raise ValueError(done.error)
        return done.seq_id  # type: ignore[attr-defined]

    def submit_stream(self, prompt, params, timeout: float = 60.0):
        """Thread-safe: enqueue a streaming request; returns
        (request_id, queue of (token_ids, finished) chunks)."""
        q: queue.Queue = queue.Queue()
        rid = self.submit_async(prompt, params, timeout, stream_q=q)
        return rid, q

    def result(self, request_id: int, timeout: float | None = None) -> dict:
        """Block until the request finishes (or was cancelled)."""
        ev = self.events.get(request_id)
        if ev is None:
            if request_id in self.results:
                return self.results.pop(request_id)
            raise KeyError(f"unknown request {request_id}")
        if not ev.wait(timeout):
            raise TimeoutError("generation timed out")
        return self.results.pop(request_id)

    def generate(self, prompt, params, timeout: float | None = None) -> dict:
        """Thread-safe: enqueue a request and block until it finishes."""
        return self.result(self.submit_async(prompt, params), timeout)

    def cancel(self, request_id: int, timeout: float = 30.0) -> bool:
        """Thread-safe: ask the driver thread to abort a request."""
        done = threading.Event()
        self.cancel_box.put((request_id, done))
        done.wait(timeout)
        return bool(getattr(done, "cancelled", False))

    def stats(self) -> dict:
        with self.lock:
            out = {"ok": True, "queued": self.queued}
        out.update(self.engine.stats())  # snapshot; read-only race is fine
        return out

    def stop(self):
        self._stop.set()
        self.thread.join(timeout=10)

    # ------------------------------------------------------ driver thread

    def _admit(self):
        any_new = False
        while True:
            try:
                prompt, params, done, admitted, stream_q = self.inbox.get_nowait()
            except queue.Empty:
                return any_new
            try:
                seq_id = self.engine.submit(prompt, params)
            except Exception as e:  # bad request must not kill the driver
                done.seq_id = -1
                done.error = f"{type(e).__name__}: {e}"
                admitted.set()
                done.set()
                with self.lock:
                    self.queued -= 1
                continue
            done.seq_id = seq_id  # route the result back to this waiter
            self.events[seq_id] = done
            if stream_q is not None:
                self.streams[seq_id] = stream_q
            admitted.set()
            with self.lock:
                self.queued -= 1
            any_new = True

    def _drain_cancels(self):
        while True:
            try:
                request_id, done = self.cancel_box.get_nowait()
            except queue.Empty:
                return
            done.cancelled = self.engine.cancel(request_id)
            if done.cancelled:
                waiter = self.events.pop(request_id, None)
                if waiter is not None:
                    self.results[request_id] = {
                        "request_id": request_id, "cancelled": True,
                    }
                    waiter.set()
                sub = self.streams.pop(request_id, None)
                if sub is not None:
                    sub.put(([], True))  # unblock the streaming reader
            done.set()

    def _run(self):
        while not self._stop.is_set():
            self._admit()
            self._drain_cancels()
            if not self.engine.has_work:
                time.sleep(self.idle_sleep)
                continue
            done, deltas = self.engine.serve_step(self.fused_rounds, with_deltas=True)
            for seq_id, token_ids, num_acc in done:
                result = {
                    "request_id": seq_id,
                    "token_ids": token_ids,
                    "num_tokens": len(token_ids),
                    "mat": round(sum(num_acc) / max(1, len(num_acc)), 2),
                }
                if self.engine.tokenizer is not None:
                    result["text"] = self.engine.tokenizer.decode(token_ids)
                event = self.events.pop(seq_id, None)
                if event is not None:
                    self.results[seq_id] = result
                    event.set()
            for seq_id, token_ids, finished in deltas:
                sub = self.streams.get(seq_id)
                if sub is not None:
                    sub.put((token_ids, finished))
                    if finished:
                        del self.streams[seq_id]


def make_handler(server: PearlServer):
    from nano_pearl_tpu.config import SamplingParams

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                return self._reply(200, server.stats())
            if self.path.startswith("/result"):
                from urllib.parse import parse_qs, urlparse

                try:
                    rid = int(parse_qs(urlparse(self.path).query)["request_id"][0])
                    return self._reply(200, server.result(rid, timeout=600))
                except KeyError:
                    return self._reply(404, {"error": "unknown request_id"})
                except Exception as e:
                    return self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            return self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path == "/cancel":
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    ok = server.cancel(int(req["request_id"]))
                    return self._reply(200, {"cancelled": ok})
                except Exception as e:
                    return self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            if self.path != "/generate":
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                params = SamplingParams(
                    temperature=float(req.get("temperature", 0.0)),
                    max_tokens=int(req.get("max_tokens", 128)),
                    ignore_eos=bool(req.get("ignore_eos", False)),
                    top_k=int(req.get("top_k", 0)),
                    top_p=float(req.get("top_p", 1.0)),
                    stop_token_ids=tuple(
                        int(t) for t in req.get("stop_token_ids", ())
                    ),
                )
                if req.get("stream", False):
                    return self._stream(req["prompt"], params)
                if req.get("blocking", True):
                    result = server.generate(req["prompt"], params)
                    return self._reply(200, result)
                rid = server.submit_async(req["prompt"], params)
                return self._reply(200, {"request_id": rid})
            except Exception as e:  # surface errors to the client
                return self._reply(400, {"error": f"{type(e).__name__}: {e}"})

        def _stream(self, prompt, params):
            """Newline-delimited JSON: token chunks as they verify, then
            a final record with the full result fields. Submission errors
            raise BEFORE headers are sent (do_POST turns them into a
            400); after the 200 status line this never raises — a dead
            client or stalled generation cancels the request instead of
            letting do_POST write a second status line into the body."""
            rid, q = server.submit_stream(prompt, params)
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.end_headers()  # no Content-Length: connection close ends the body

            def line(payload):
                self.wfile.write((json.dumps(payload) + "\n").encode())
                self.wfile.flush()

            try:
                line({"request_id": rid})
                while True:
                    token_ids, finished = q.get(timeout=600)
                    if token_ids:  # the finished chunk may carry final tokens
                        line({"token_ids": token_ids, "done": False})
                    if finished:
                        break
                final = {"request_id": rid, "done": True}
                try:
                    final.update(server.result(rid, timeout=10))
                except KeyError:
                    final["cancelled"] = True  # cancelled before finishing
                line(final)
            except Exception:
                # client gone (BrokenPipeError) or generation stalled
                # (queue.Empty): stop decoding for a dead consumer and
                # drop the stream subscription
                server.cancel(rid)

    return Handler


def build_engine(args):
    from nano_pearl_tpu import PearlEngine
    from nano_pearl_tpu.config import PearlConfig

    dparams = tparams = None
    if args.layer_share:
        import bench as benchmod
        from nano_pearl_tpu.config import ModelConfig

        def mc(layers):
            return ModelConfig(
                architecture="LlamaForCausalLM", hidden_size=1024,
                intermediate_size=4096, num_hidden_layers=layers,
                num_attention_heads=16, num_key_value_heads=2,
                vocab_size=32768, eos_token_id=1,
                dtype="float32" if args.cpu else "bfloat16",
                max_position_embeddings=max(2048, args.max_model_len),
            )

        draft, target = mc(args.draft_layers), mc(args.target_layers)
        dparams, tparams = benchmod.build_layer_share_pair(draft, target, args.seed)
    else:
        assert args.draft_model and args.target_model, (
            "--draft-model/--target-model required without --layer-share"
        )
        draft, target = args.draft_model, args.target_model

    cfg = PearlConfig(
        draft_model=draft, target_model=target,
        draft_tp=args.draft_tp, target_tp=args.target_tp,
        max_model_len=args.max_model_len, gamma=args.gamma, seed=args.seed,
        # real checkpoint pairs have divergence-driven acceptance -> the
        # faster kernel schedule (see PearlConfig.perf_profile)
        perf_profile="throughput" if args.draft_model else "ceiling",
    )
    return PearlEngine(cfg, draft_params=dparams, target_params=tparams)


def main():
    p = argparse.ArgumentParser(description="nano-pearl-tpu HTTP server")
    p.add_argument("--draft-model", "-d", default=None)
    p.add_argument("--target-model", "-t", default=None)
    p.add_argument("--layer-share", action="store_true")
    p.add_argument("--draft-layers", type=int, default=3)
    p.add_argument("--target-layers", type=int, default=36)
    p.add_argument("--draft-tp", type=int, default=1)
    p.add_argument("--target-tp", type=int, default=1)
    p.add_argument("--max-model-len", type=int, default=4096)
    p.add_argument("--gamma", type=int, default=8)
    p.add_argument("--fused-rounds", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8700)
    p.add_argument("--cpu", action="store_true")
    p.add_argument(
        "--warmup-batches", default="1,8,32",
        help="comma-separated decode buckets to pre-compile before "
        "accepting traffic (first requests then pay zero compile "
        "latency); empty string to skip",
    )
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from nano_pearl_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    engine = build_engine(args)
    if args.warmup_batches:
        engine.warmup(
            batches=tuple(int(b) for b in args.warmup_batches.split(",")),
        )
    server = PearlServer(engine, fused_rounds=args.fused_rounds)
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(server))
    print(f"serving on http://{args.host}:{args.port}  (POST /generate, GET /health)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()


if __name__ == "__main__":
    main()
