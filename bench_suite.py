"""Extended benchmark suite over the BASELINE configs (one JSON line each).

``bench.py`` remains the driver-facing single-metric benchmark; this suite
measures the other BASELINE.md configs on whatever platform is active:

  1. mono chain: tone → FIR127 → FFT4096 → magnitude
  2. rational polyphase resampler (L/M = 3/2)
  3. wideband FM receiver (freq-xlating FIR → quad demod → audio decim → deemph)
  4. 64-channel PFB channelizer + per-channel power
  5. sharded 64-channel channelizer + demod (all local devices)

Usage: python bench_suite.py [--block-len N] [--steps N]

TIMING CAVEAT (see docs/PERFORMANCE.md "timing-honesty"): on the axon remote
transport, block_until_ready does not flush device work, so these wall-clock
rates are host dispatch rates unless the platform provides a working D2H path
(bench.py carries the readback-verified protocol; this suite is comparative).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _readback(tree, deadline_s: float = 240.0) -> float | None:
    """Relay-safe checksum readback (8-lane float32 broadcast — 0-d and
    complex D2H are UNIMPLEMENTED on the axon relay, utils/transfer.py) on a
    daemon thread with a deadline. Returns the checksum or None."""
    import threading
    import jax
    import jax.numpy as jnp
    box: dict = {}

    def rb():
        try:
            leaves = [v for v in jax.tree_util.tree_leaves(tree)
                      if hasattr(v, "dtype")]
            vec = jax.jit(lambda ls: jnp.broadcast_to(
                sum(jnp.sum(jnp.abs(x)).astype(jnp.float32) for x in ls),
                (8,)))(leaves)
            box["v"] = float(np.asarray(vec)[0])
        except Exception as e:
            box["err"] = f"{type(e).__name__}: {e}"

    th = threading.Thread(target=rb, daemon=True)
    th.start()
    th.join(timeout=deadline_s)
    v = box.get("v")
    return v if v is not None and np.isfinite(v) else None


def _run(compiled, steps: int, block_len: int) -> tuple[float, bool]:
    """Readback-terminated differential timing (same protocol as bench.py);
    falls back to the labeled dispatch rate when D2H is out. Returns
    (Msps, verified)."""
    states = compiled.init_states()
    params = compiled.gather_params()
    for _ in range(3):
        states, sink_ins = compiled.step(states, params, {})
    if _readback(sink_ins) is not None:
        walls = {}
        wins = (max(steps // 8, 2), steps)
        ok = True
        for n in wins:
            t0 = time.perf_counter()
            for _ in range(n):
                states, sink_ins = compiled.step(states, params, {})
            if _readback(sink_ins) is None:
                ok = False
                break
            walls[n] = time.perf_counter() - t0
        if ok:
            dt = (walls[wins[1]] - walls[wins[0]]) / (wins[1] - wins[0])
            if dt > 0:
                return block_len / dt / 1e6, True
    # dispatch-rate fallback
    import jax
    t0 = time.perf_counter()
    for _ in range(steps):
        states, sink_ins = compiled.step(states, params, {})
    jax.block_until_ready((states, sink_ins))
    dt = time.perf_counter() - t0
    return steps * block_len / dt / 1e6, False


def config1(block_len):
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.blocks.basic import ComplexToneSource
    from gnuradio4_tpu.blocks.filter import FirFilter
    from gnuradio4_tpu.blocks.fourier import FFT
    from gnuradio4_tpu.blocks.testing import NullSink
    from gnuradio4_tpu.ops import filter_design as fd
    fs = 20e6
    g = gr.Graph()
    src = ComplexToneSource(frequency=1e6)
    fir = FirFilter(taps=fd.design_fir("lowpass", 127, sample_rate=fs,
                                       f_low=2e6).astype(np.float32))
    fft = FFT(fft_size=4096, window="Hann", output="magnitude", calibrate=False)
    g.connect_chain(src, fir, fft, NullSink())
    return gr.compile_graph(g, block_len=block_len, sample_rate=fs)


def config2(block_len):
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.blocks.basic import NoiseSource
    from gnuradio4_tpu.blocks.filter import RationalResampler
    from gnuradio4_tpu.blocks.testing import NullSink
    g = gr.Graph()
    g.connect_chain(g.add(NoiseSource()),
                    g.add(RationalResampler(interp=3, decim=2)),
                    g.add(NullSink()))
    return gr.compile_graph(g, block_len=block_len, sample_rate=1e6)


def config3(block_len):
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.blocks.basic import ComplexToneSource
    from gnuradio4_tpu.blocks.sdr import make_wbfm_receiver
    from gnuradio4_tpu.blocks.testing import NullSink
    quad_rate = 250e3
    g = gr.Graph()
    src = ComplexToneSource(frequency=10e3)
    rx = make_wbfm_receiver(quad_rate=quad_rate, audio_decim=5)
    snk = NullSink()
    g.add(rx)
    g.connect(src, rx["in"])
    g.connect(rx["out"], snk)
    return gr.compile_graph(g, block_len=block_len, sample_rate=quad_rate)


def config4(block_len):
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.blocks.basic import NoiseSource
    from gnuradio4_tpu.blocks.channelizer import PFBChannelizer
    from gnuradio4_tpu.blocks.math import Abs
    from gnuradio4_tpu.blocks.testing import NullSink
    g = gr.Graph()
    src = NoiseSource(noise="complex_gaussian")
    chan = PFBChannelizer(n_channels=64, taps_per_phase=8)
    g.connect_chain(g.add(src), g.add(chan), g.add(Abs()), g.add(NullSink()))
    return gr.compile_graph(g, block_len=block_len, sample_rate=1e9)


def _run_sched(build, block_len, steps) -> tuple[float, bool]:
    """Differential timing through the REAL scheduler loop: run the graph at
    two source lengths, checksum-readback-terminate each, slope cancels the
    D2H latency. ``build(n_steps) -> Scheduler``. Falls back to the labeled
    dispatch rate when D2H is out."""
    import jax

    def one(n, verified):
        sched = build(n)
        sched.init()
        sched._pump_once()
        ok = _readback(sched._states) is not None if verified else True
        t0 = time.perf_counter()
        n0 = sched._step
        while sched._pump_once():
            pass
        sched._drain()
        if verified:
            ok = ok and _readback(sched._states) is not None
        else:
            jax.block_until_ready(sched._states)
        return sched._step - n0, time.perf_counter() - t0, ok

    s1 = max(steps // 4, 2)
    n1, t1, ok1 = one(s1, True)
    if ok1:
        n2, t2, ok2 = one(steps, True)
        if ok2 and n2 > n1 and t2 > t1:
            return (n2 - n1) * block_len / (t2 - t1) / 1e6, True
    n, dt, _ = one(steps, False)
    return n * block_len / dt / 1e6, False


def config5_scheduler(block_len, steps):
    """Config 5 shape through the REAL scheduler loop (tag plane, message pump,
    pipelined delivery): 256-ch channelizer + per-channel demod + tag source.
    Returns (Msps, verified)."""
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.blocks.basic import NoiseSource
    from gnuradio4_tpu.blocks.channelizer import PFBChannelizer
    from gnuradio4_tpu.blocks.sdr import QuadratureDemod
    from gnuradio4_tpu.blocks.testing import NullSink

    def build(n):
        g = gr.Graph()
        src = NoiseSource(noise="complex_gaussian", n_samples=n * block_len)
        chan = PFBChannelizer(n_channels=256, taps_per_phase=8)
        dem = QuadratureDemod(gain=1.0)
        snk = NullSink()
        g.connect_chain(g.add(src), g.add(chan), g.add(dem), g.add(snk))
        return gr.Scheduler(g, block_len=block_len, sample_rate=1e9,
                            pipeline_depth=2, async_delivery=True)

    return _run_sched(build, block_len, steps)


def config6_cascade(block_len, steps):
    """The reference's bm_Scheduler shape (core/benchmarks/bm_Scheduler.cpp:
    20-26): a deep linear MultiplyConst/DivideConst cascade (40 blocks) —
    measures per-step scheduler overhead, not FLOPs. Returns (Msps, verified)
    through the real scheduler loop."""
    import gnuradio4_tpu as gr

    def build(n):
        g = gr.Graph()
        src = g.emplace("CountingSource", n_samples=n * block_len,
                        dtype="float32")
        prev = src
        for _ in range(20):
            m = g.emplace("MultiplyConst", value=2.0)
            d = g.emplace("DivideConst", value=2.0)
            g.connect(prev, m)
            g.connect(m, d)
            prev = d
        snk = g.emplace("CountingSink")
        g.connect(prev, snk)
        return gr.Scheduler(g, block_len=block_len, sample_rate=1e9,
                            pipeline_depth=2, async_delivery=True)

    return _run_sched(build, block_len, steps)


def config7_ldpc(block_len, steps):
    """Device LDPC min-sum decode throughput (n=256, R=1/2, 25 iters):
    coded Mbits/s through the real scheduler loop. Returns (Msps, verified)."""
    import numpy as np
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.ops.ldpc import make_ldpc, encode
    from gnuradio4_tpu.blocks.testing import VectorSink

    H, G = make_ldpc(256, 128, wc=3, seed=0)
    k = G.shape[0]
    bl = (block_len // 256) * 256
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (steps * bl // 256) * k).astype(np.uint8)
    c = encode(G, u.reshape(-1, k)).reshape(-1)
    y = 1.0 - 2.0 * c + 0.6 * rng.standard_normal(len(c))
    llr = (2 * y / 0.36).astype(np.float32)

    def build(n):
        g = gr.Graph()
        src = g.emplace("VectorSource")
        src.data = llr[: n * bl]
        dec = g.emplace("LdpcDecoder", n=256, m=128, seed=0)
        snk = g.add(VectorSink())
        g.connect_chain(src, dec, snk)
        return gr.Scheduler(g, block_len=bl, sample_rate=1e9,
                            pipeline_depth=2, async_delivery=True)

    return _run_sched(build, bl, steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block-len", type=int, default=1 << 20)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--configs", default="1,2,3,4,5,6,7")
    args = ap.parse_args()
    import jax
    import os
    if os.environ.get("GR4_BENCH_FORCE_CPU") == "1":
        # the axon plugin overrides JAX_PLATFORMS from the environment; only
        # an explicit config update reaches the CPU backend
        jax.config.update("jax_platforms", "cpu")
    platform = jax.devices()[0].platform
    builders = {"1": ("mono FIR127+FFT4096", config1),
                "2": ("polyphase resampler 3/2", config2),
                "3": ("WBFM receiver", config3),
                "4": ("PFB channelizer 64ch", config4)}
    for key in args.configs.split(","):
        key = key.strip()
        if key == "5":
            try:
                msps, verified = config5_scheduler(args.block_len, args.steps)
                print(json.dumps({"config": "5",
                                  "name": "scheduler loop: 256ch PFB + demod + tags",
                                  "platform": platform,
                                  "block_len": args.block_len,
                                  "msps": round(msps, 1),
                                  "verified": verified}), flush=True)
            except Exception as e:
                print(json.dumps({"config": "5",
                                  "error": f"{type(e).__name__}: {e}"}),
                      flush=True)
            continue
        if key == "6":
            bl6 = min(args.block_len, 1 << 16)   # overhead shows at small blocks
            try:
                msps, verified = config6_cascade(bl6, max(args.steps, 200))
                print(json.dumps({"config": "6",
                                  "name": "scheduler overhead: 40-block cascade"
                                          " (bm_Scheduler mirror)",
                                  "platform": platform,
                                  "block_len": bl6,
                                  "msps": round(msps, 1),
                                  "verified": verified}), flush=True)
            except Exception as e:
                print(json.dumps({"config": "6",
                                  "error": f"{type(e).__name__}: {e}"}),
                      flush=True)
            continue
        if key == "7":
            bl7 = min(args.block_len, 1 << 17)
            try:
                msps, verified = config7_ldpc(bl7, max(args.steps, 40))
                print(json.dumps({"config": "7",
                                  "name": "LDPC min-sum decode (n=256 R=1/2"
                                          " 25 iters), coded Mbit/s",
                                  "platform": platform,
                                  "block_len": bl7,
                                  "msps": round(msps, 1),
                                  "verified": verified}), flush=True)
            except Exception as e:
                print(json.dumps({"config": "7",
                                  "error": f"{type(e).__name__}: {e}"}),
                      flush=True)
            continue
        name, builder = builders[key]
        bl = args.block_len
        if key.strip() == "3":
            bl = min(bl, 1 << 18)  # FM chain has small natural block
        try:
            compiled = builder(bl)
            msps, verified = _run(compiled, args.steps, bl)
            print(json.dumps({"config": key.strip(), "name": name,
                              "platform": platform, "block_len": bl,
                              "msps": round(msps, 1),
                              "verified": verified}), flush=True)
        except Exception as e:
            print(json.dumps({"config": key.strip(), "name": name,
                              "error": f"{type(e).__name__}: {e}"}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
