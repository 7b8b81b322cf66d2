"""HTTP serving front-end (serve.py) over the continuous-batching API."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

from nano_pearl_tpu import PearlEngine
from nano_pearl_tpu.config import SamplingParams

from helpers import tiny_pearl_config


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_http_server_round_trip():
    import serve as serve_mod

    # reference outputs from a plain engine at the same config/seed
    ref = PearlEngine(tiny_pearl_config())
    ref.add_request([1, 2, 3, 4, 5], SamplingParams(temperature=0.0, max_tokens=12))
    want, *_ = ref.generate_token_ids()

    engine = PearlEngine(tiny_pearl_config())
    server = serve_mod.PearlServer(engine, fused_rounds=4)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve_mod.make_handler(server))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health", timeout=30
        ) as r:
            assert json.loads(r.read())["ok"]

        # two concurrent requests share the continuous batch
        results = {}

        def call(name, prompt, n):
            results[name] = _post(
                port, {"prompt": prompt, "max_tokens": n, "temperature": 0.0}
            )

        t1 = threading.Thread(target=call, args=("a", [1, 2, 3, 4, 5], 12))
        t2 = threading.Thread(target=call, args=("b", [7, 8, 9], 9))
        t1.start(); t2.start(); t1.join(120); t2.join(120)

        assert results["a"]["token_ids"] == want[0]
        assert results["a"]["num_tokens"] == 12
        assert results["b"]["num_tokens"] <= 9
        # missing prompt -> HTTP 400 with a JSON error body
        try:
            _post(port, {"max_tokens": 4})
            raise AssertionError("missing prompt should be a 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    finally:
        httpd.shutdown()
        server.stop()


def test_engine_cancel_frees_blocks():
    eng = PearlEngine(tiny_pearl_config())
    free0_d = eng.scheduler.draft_bm.num_free_blocks
    free0_t = eng.scheduler.target_bm.num_free_blocks
    a = eng.submit([1, 2, 3, 4, 5], SamplingParams(temperature=0.0, max_tokens=40))
    b = eng.submit([7, 8, 9], SamplingParams(temperature=0.0, max_tokens=10))
    eng.serve_step(2)  # both admitted + some rounds
    assert eng.cancel(a)
    assert not eng.cancel(a)  # already gone
    out = []
    while eng.has_work:
        out += eng.serve_step(2)
    ids = [o[0] for o in out]
    assert ids == [b]  # cancelled request never reported
    assert eng.scheduler.draft_bm.num_free_blocks == free0_d
    assert eng.scheduler.target_bm.num_free_blocks == free0_t
    # cancel of a WAITING (never admitted) request
    c = eng.submit([4, 5, 6], SamplingParams(temperature=0.0, max_tokens=10))
    assert eng.cancel(c)
    assert not eng.has_work


def test_http_async_and_cancel():
    import serve as serve_mod

    engine = PearlEngine(tiny_pearl_config())
    server = serve_mod.PearlServer(engine, fused_rounds=2)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve_mod.make_handler(server))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        sub = _post(port, {"prompt": [1, 2, 3, 4, 5], "max_tokens": 10,
                           "blocking": False})
        rid = sub["request_id"]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/result?request_id={rid}", timeout=120
        ) as r:
            res = json.loads(r.read())
        assert res["num_tokens"] == 10

        # async submit then cancel; /result reports cancellation
        sub2 = _post(port, {"prompt": [9, 9, 9], "max_tokens": 200,
                            "ignore_eos": True, "blocking": False})
        rid2 = sub2["request_id"]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/cancel",
            data=json.dumps({"request_id": rid2}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert json.loads(r.read())["cancelled"] is True
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/result?request_id={rid2}", timeout=60
        ) as r:
            assert json.loads(r.read())["cancelled"] is True
    finally:
        httpd.shutdown()
        server.stop()


def test_engine_stats_counters():
    eng = PearlEngine(tiny_pearl_config())
    s0 = eng.stats()
    assert s0["completed_requests"] == 0 and s0["waiting"] == 0
    eng.submit([1, 2, 3], SamplingParams(temperature=0.0, max_tokens=8))
    assert eng.stats()["waiting"] == 1
    while eng.has_work:
        eng.serve_step(2)
    s1 = eng.stats()
    assert s1["completed_requests"] == 1
    assert s1["completed_tokens"] == 8
    assert s1["running"] == 0
    assert s1["draft_free_blocks"] == s0["draft_free_blocks"]
    # latency percentiles appear once something completed and are sane
    assert "ttft_p50_s" not in s0
    assert 0 < s1["ttft_p50_s"] <= s1["e2e_p50_s"]
    assert 0 < s1["tpot_p50_s"] < s1["e2e_p95_s"]


def test_serving_fuzz_invariants():
    """Randomized submit/serve/cancel interleavings: the engine must
    (a) never crash, (b) report each uncancelled request exactly once
    with at most max_tokens tokens, (c) restore both block pools when
    drained. Greedy losslessness under batching churn is pinned by
    test_continuous; this pins the control plane."""
    import random

    rng = random.Random(0)
    eng = PearlEngine(tiny_pearl_config(max_num_seqs=4))
    free0 = (eng.scheduler.draft_bm.num_free_blocks,
             eng.scheduler.target_bm.num_free_blocks)
    live, results, cancelled = {}, {}, set()
    next_prompt = 1
    for step in range(60):
        op = rng.random()
        if op < 0.4 and len(live) < 6:
            n = rng.randint(1, 10)
            prompt = [(next_prompt + i) % 250 + 2 for i in range(n)]
            next_prompt += n
            mt = rng.randint(1, 20)
            sid = eng.submit(prompt, SamplingParams(temperature=0.0, max_tokens=mt))
            live[sid] = mt
        elif op < 0.55 and live:
            sid = rng.choice(list(live))
            if eng.cancel(sid):
                cancelled.add(sid)
                live.pop(sid)
        elif eng.has_work:
            for sid, toks, _acc in eng.serve_step(rng.randint(1, 4)):
                assert sid in live, f"unknown/duplicate completion {sid}"
                results[sid] = toks
                live.pop(sid)
    while eng.has_work:
        for sid, toks, _acc in eng.serve_step(2):
            assert sid in live
            results[sid] = toks
            live.pop(sid)
    assert not live
    for sid, toks in results.items():
        assert sid not in cancelled
        assert 1 <= len(toks)
    assert (eng.scheduler.draft_bm.num_free_blocks,
            eng.scheduler.target_bm.num_free_blocks) == free0


def test_engine_streaming_deltas():
    """serve_step(with_deltas=True): streamed chunks concatenate to the
    exact final completion, arrive before the request finishes, and are
    never retracted (only the rollback-proof prefix is emitted)."""
    eng = PearlEngine(tiny_pearl_config())
    sid = eng.submit([1, 2, 3, 4, 5],
                     SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True))
    streamed, final, saw_partial = [], None, False
    while eng.has_work:
        done, deltas = eng.serve_step(1, with_deltas=True)
        for rid, toks, finished in deltas:
            assert rid == sid
            if not finished and toks:
                saw_partial = True
            streamed += toks
        for rid, toks, _acc in done:
            final = toks
    assert saw_partial, "no incremental chunk arrived before completion"
    assert final is not None and streamed == final


def test_http_streaming():
    import serve as serve_mod

    engine = PearlEngine(tiny_pearl_config())
    server = serve_mod.PearlServer(engine, fused_rounds=1)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve_mod.make_handler(server))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt": [1, 2, 3], "max_tokens": 30,
                             "ignore_eos": True, "stream": True}).encode(),
            headers={"Content-Type": "application/json"},
        )
        chunks, final, rid = [], None, None
        with urllib.request.urlopen(req, timeout=120) as r:
            for raw in r:
                rec = json.loads(raw)
                if "request_id" in rec and "done" not in rec:
                    rid = rec["request_id"]
                elif rec.get("done"):
                    final = rec
                else:
                    chunks += rec["token_ids"]
        assert rid is not None and final is not None
        assert final["request_id"] == rid
        assert chunks == final["token_ids"]
        assert final["num_tokens"] == 30
    finally:
        httpd.shutdown()
        server.stop()
