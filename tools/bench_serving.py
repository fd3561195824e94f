"""Serving load benchmark -> SERVING_r4.json.

Measures the HTTP serving stack (serving/server.py — the drop-in
replacement for the reference's Flask -> gRPC -> TF Serving chain,
website/app/views.py:25-105) under N concurrent clients on the real chip:

  - RPS, p50/p95/mean latency at concurrency 1/4/8/16/32 (Griffin-Lim)
  - distinct per-request seeds at the middle concurrency: per-example PRNG
    keys let ANY seed mix coalesce, so this row should MATCH the same-seed
    row (round 3 measured 7.8 vs 19.4 RPS under the old same-seed rule)
  - the measured benefit of adaptive micro-batching (``--max-batch 8``
    coalescing vs ``--max-batch 1`` serial dispatch)
  - overload behavior: high concurrency against the bounded admission
    queue — p95 must stay bounded and 503s are counted separately
  - the WaveRNN-vocoded path (the flagship vocoder behind real HTTP, not
    just bench.py): RPS/latency at concurrency 1 and 8

The server runs in-process (its own ThreadingHTTPServer thread, exactly the
production entrypoint) with random-init weights and a capped decode length
— serving cost is decode-length-proportional compute, so relative
concurrency/coalescing behavior is representative while staying
checkpoint-independent; the artifact records provenance.

Usage: python -m tools.bench_serving [--out SERVING_r4.json] [--quick]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import threading
import time
import urllib.error
import urllib.request

import jax
import numpy as np

TEXTS = [
    "你好，欢迎使用语音合成系统。",
    "今天天气真不错，我们去公园散步吧。",
    "科学技术是第一生产力。",
    "这是一个用于测试并发性能的句子。",
]


def post(port: int, text: str, seed: int) -> tuple[float, str]:
    """-> (latency_s, 'ok' | 'rejected' | 'failed')."""
    body = json.dumps({"text": text, "seed": seed}).encode("utf-8")
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate_tts", data=body,
        headers={"Content-Type": "application/json"},
    )
    t0 = time.time()
    try:
        with urllib.request.urlopen(req, timeout=300) as resp:
            status = "ok" if json.loads(resp.read()).get("status") == 0 else "failed"
    except urllib.error.HTTPError as e:
        e.read()
        status = "rejected" if e.code == 503 else "failed"
    except Exception:
        status = "failed"
    return time.time() - t0, status


def load_run(port: int, concurrency: int, total: int,
             distinct_seeds: bool = False) -> dict:
    """Drive ``total`` requests through ``concurrency`` client threads.

    The reference serving contract (website/app/views.py:25-105) has NO
    per-request seed (the default rows use seed 0).  ``distinct_seeds=True``
    gives every request its own seed: per-example PRNG keys thread the seed
    per ROW through the decode, so any seed mix coalesces into one batch —
    this row should match the same-seed row.  503-rejected requests (the
    bounded admission queue shedding load) are counted separately from
    failures and excluded from the latency percentiles."""
    # untimed shakeout burst at this concurrency first: the very first
    # coalesced waves of a fresh (conc, wave-size) regime can still absorb a
    # one-off cost (jit dispatch-cache population, tunnel hiccup) that would
    # otherwise own the p95 of a small timed sample (round-5 measured a
    # steady-state conc-16 ratio of 1.1 after shakeout vs 3.0 without)
    shake = [threading.Thread(target=post, args=(port, TEXTS[i % len(TEXTS)], i))
             for i in range(concurrency)]
    for t in shake:
        t.start()
    for t in shake:
        t.join()

    lats: list[float] = []
    fails, rejects = [0], [0]
    lock = threading.Lock()
    idx = [0]

    def worker():
        while True:
            with lock:
                if idx[0] >= total:
                    return
                i = idx[0]
                idx[0] += 1
            dt, status = post(port, TEXTS[i % len(TEXTS)], seed=i if distinct_seeds else 0)
            with lock:
                if status == "ok":
                    lats.append(dt)
                elif status == "rejected":
                    rejects[0] += 1
                else:
                    fails[0] += 1

    t0 = time.time()
    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    lats_s = sorted(lats)
    return {
        "concurrency": concurrency,
        "requests": total,
        "failed": fails[0],
        "rejected_503": rejects[0],
        "rps": round(len(lats) / wall, 2),
        "p50_ms": round(1000 * lats_s[len(lats_s) // 2], 1) if lats_s else None,
        "p95_ms": round(1000 * lats_s[int(len(lats_s) * 0.95)], 1) if lats_s else None,
        "mean_ms": round(1000 * float(np.mean(lats_s)), 1) if lats_s else None,
        "wall_s": round(wall, 2),
    }


def start_server(cfg, synth, port: int, max_batch: int):
    from tacotronv2_wavernn_chinese_tpu.serving.server import serve

    httpd = serve(cfg, synth, host="127.0.0.1", port=port, max_batch=max_batch)
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    return httpd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SERVING_r4.json")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--ckpt-dir", default=None, help="optional trained checkpoint")
    ap.add_argument("--wavernn-ckpt-dir", default=None,
                    help="optional trained vocoder checkpoint for the wavernn rows")
    ap.add_argument("--no-wavernn", action="store_true",
                    help="skip the wavernn-vocoded serving rows")
    ap.add_argument("--max-iters", type=int, default=220)
    args = ap.parse_args()

    from tacotronv2_wavernn_chinese_tpu.config import default_config
    from tacotronv2_wavernn_chinese_tpu.infer.synthesizer import Synthesizer
    from tacotronv2_wavernn_chinese_tpu.models import tacotron as T
    from tacotronv2_wavernn_chinese_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = default_config()
    if args.ckpt_dir:
        synth = Synthesizer.from_checkpoints(cfg, args.ckpt_dir, None)
        synth.max_iters = args.max_iters
        weights = f"checkpoint {args.ckpt_dir}"
    else:
        params = T.init_tacotron(jax.random.PRNGKey(0), cfg.tacotron)
        # random init fires the stop token immediately; force realistic
        # decode lengths so each request does real decode work
        import jax.numpy as jnp

        params["stop_projection"] = dict(
            params["stop_projection"],
            b=jnp.full_like(params["stop_projection"]["b"], -20.0),
        )
        synth = Synthesizer(cfg, params, max_iters=args.max_iters)
        weights = f"random-init, stop bias -20, max_iters {args.max_iters}"

    # warm the compiled shapes: coalesced batches land in power-of-2 batch
    # buckets x the TEXTS' two T_in buckets (32 with only-short texts, 48
    # when the longest rides along), plus their batched Griffin-Lim programs
    # (16 first: the depth-adaptive coalescer grows waves past max_batch=8
    # up to max_batch_hard=16 under backlog — round-5's first serving run
    # paid a 78 s in-request compile at concurrency 16 because this warmup
    # stopped at 8)
    short, long_ = TEXTS[0], TEXTS[1]
    for nb in (16, 8, 4, 2, 1):
        synth.synthesize_batch([short] * nb)
        synth.synthesize_batch(([long_] + [short] * (nb - 1)) if nb > 1 else [long_])
    synth.synthesize(short)  # single path uses the unbatched GL program
    synth.synthesize(long_)

    rows = []
    total = 8 if args.quick else 96
    conc_list = [1, 4] if args.quick else [1, 4, 8, 16]

    httpd = start_server(cfg, synth, port=8761, max_batch=8)
    post(8761, TEXTS[0], 0)  # end-to-end warmup through HTTP
    for conc in conc_list:
        row = load_run(8761, conc, total)
        row["max_batch"] = 8
        rows.append(row)
        print(json.dumps(row), flush=True)
    # distinct per-request seeds: per-example PRNG keys let any seed mix
    # share a batch, so this row should MATCH the same-seed row above
    # (round 3: 7.82 vs 19.4 RPS under the old same-seed-prefix rule)
    conc_mid = 4 if args.quick else 8
    row = load_run(8761, conc_mid, total, distinct_seeds=True)
    row["max_batch"] = 8
    row["distinct_seeds"] = True
    rows.append(row)
    print(json.dumps(row), flush=True)
    # overload: 2x the sustainable concurrency against the bounded queue
    # (more total requests so the queue actually fills); p95 must stay in
    # the same class as conc 8 instead of growing with queue depth
    if not args.quick:
        row = load_run(8761, 32, 64)
        row["max_batch"] = 8
        row["overload"] = True
        rows.append(row)
        print(json.dumps(row), flush=True)
    httpd.shutdown()

    # coalescing OFF (serial dispatch) at the middle concurrency
    httpd = start_server(cfg, synth, port=8762, max_batch=1)
    post(8762, TEXTS[0], 0)
    row = load_run(8762, conc_mid, total)
    row["max_batch"] = 1
    rows.append(row)
    print(json.dumps(row), flush=True)
    httpd.shutdown()

    # ---- WaveRNN-vocoded serving rows (the flagship vocoder behind HTTP) --
    wavernn_rows = []
    if not args.no_wavernn:
        from tacotronv2_wavernn_chinese_tpu.models import wavernn as W

        if args.wavernn_ckpt_dir:
            wsynth = Synthesizer.from_checkpoints(
                cfg, args.ckpt_dir, args.wavernn_ckpt_dir
            )
            wsynth.max_iters = args.max_iters
            voc_weights = f"checkpoint {args.wavernn_ckpt_dir}"
        else:
            voc_params = W.init_wavernn(jax.random.PRNGKey(1), cfg.wavernn)
            wsynth = Synthesizer(
                cfg, synth.params, vocoder_params=voc_params,
                max_iters=args.max_iters,
            )
            voc_weights = "random-init (generation cost == trained)"
        # warm: decode buckets + the fold-bucketed kernel programs
        for nb in (8, 4, 2, 1):
            wsynth.synthesize_batch([short] * nb)
        wsynth.synthesize_batch([long_] + [short] * 7)
        wsynth.synthesize(short)
        wsynth.synthesize(long_)
        httpd = start_server(cfg, wsynth, port=8763, max_batch=8)
        post(8763, TEXTS[0], 0)
        for conc in ([1] if args.quick else [1, 8]):
            row = load_run(8763, conc, total)
            row["max_batch"] = 8
            row["vocoder"] = "wavernn"
            wavernn_rows.append(row)
            print(json.dumps(row), flush=True)
        httpd.shutdown()

    on = [r for r in rows if r["max_batch"] == 8 and r["concurrency"] == conc_mid
          and not r.get("distinct_seeds") and not r.get("overload")]
    off = [r for r in rows if r["max_batch"] == 1]
    distinct = [r for r in rows if r.get("distinct_seeds")]
    benefit = None
    if on and off and off[0]["rps"]:
        benefit = round(on[0]["rps"] / off[0]["rps"], 2)
    distinct_ratio = None
    if on and distinct and on[0]["rps"]:
        distinct_ratio = round(distinct[0]["rps"] / on[0]["rps"], 2)
    artifact = {
        "provenance": {
            "tool": "tools/bench_serving.py",
            "weights": weights,
            "vocoder_weights": voc_weights if wavernn_rows else None,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "vocoder": "griffin-lim rows unless marked wavernn",
        },
        "rows": rows,
        "wavernn_rows": wavernn_rows,
        "coalescing_rps_benefit_at_conc%d" % conc_mid: benefit,
        "distinct_seed_rps_ratio": distinct_ratio,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"# wrote {args.out}; coalescing x{benefit}, distinct-seed ratio {distinct_ratio}")


def get_pyin_cached(text):
    from tacotronv2_wavernn_chinese_tpu.frontend import get_pyin

    return get_pyin(text)[0]


if __name__ == "__main__":
    main()
