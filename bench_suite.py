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
            # numeric leaves only — PRNG key arrays (key<fry>) reject jnp.abs
            leaves = [v for v in jax.tree_util.tree_leaves(tree)
                      if hasattr(v, "dtype")
                      and jnp.issubdtype(v.dtype, jnp.number)]
            if not leaves:
                box["err"] = "no numeric leaves"
                return
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
    """Readback-terminated differential timing (same protocol as bench.py)
    with a THREE-point linearity guard: the two independent slopes must
    agree within 40% or the window is drifting and the row is demoted to
    the labeled dispatch-rate fallback. (SUITE_r05's first pass produced
    physically-impossible 21/38 Gsps rows from a two-point slope in a
    flapping window — drift swamps short differentials.) Returns
    (Msps, verified)."""
    states = compiled.init_states()
    params = compiled.gather_params()
    for _ in range(3):
        states, sink_ins = compiled.step(states, params, {})
    if _readback(sink_ins) is not None:
        from gnuradio4_tpu.utils.bench_timing import guarded_slope, three_windows
        walls = {}
        wins = three_windows(steps // 8, steps)
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
            dt, why = guarded_slope(wins, walls)
            if dt is not None:
                return block_len / dt / 1e6, True
            print(f"# drift guard: {why} — demoting to dispatch-rate",
                  file=sys.stderr)
    # dispatch-rate fallback
    import jax
    t0 = time.perf_counter()
    for _ in range(steps):
        states, sink_ins = compiled.step(states, params, {})
    jax.block_until_ready((states, sink_ins))
    dt = time.perf_counter() - t0
    return steps * block_len / dt / 1e6, False


def config1(block_len, batch=1):
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
    return gr.compile_graph(g, block_len=block_len, sample_rate=fs,
                            batch_steps=batch)


def config2(block_len, batch=1):
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.blocks.basic import NoiseSource
    from gnuradio4_tpu.blocks.filter import RationalResampler
    from gnuradio4_tpu.blocks.testing import NullSink
    g = gr.Graph()
    g.connect_chain(g.add(NoiseSource()),
                    g.add(RationalResampler(interp=3, decim=2)),
                    g.add(NullSink()))
    return gr.compile_graph(g, block_len=block_len, sample_rate=1e6,
                            batch_steps=batch)


def config3(block_len, batch=1):
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
    return gr.compile_graph(g, block_len=block_len, sample_rate=quad_rate,
                            batch_steps=batch)


def config4(block_len, batch=1):
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.blocks.basic import NoiseSource
    from gnuradio4_tpu.blocks.channelizer import PFBChannelizer
    from gnuradio4_tpu.blocks.math import Abs
    from gnuradio4_tpu.blocks.testing import NullSink
    g = gr.Graph()
    src = NoiseSource(noise="complex_gaussian")
    chan = PFBChannelizer(n_channels=64, taps_per_phase=8)
    g.connect_chain(g.add(src), g.add(chan), g.add(Abs()), g.add(NullSink()))
    return gr.compile_graph(g, block_len=block_len, sample_rate=1e9,
                            batch_steps=batch)


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

    from gnuradio4_tpu.utils.bench_timing import guarded_slope, three_windows
    s1, s2, s3 = three_windows(steps // 4, steps)
    n1, t1, ok1 = one(s1, True)
    if ok1:
        n2, t2, ok2 = one(s2, True)
        n3, t3, ok3 = (0, 0.0, False) if not ok2 else one(s3, True)
        if ok3 and n3 > n2 > n1 and t3 > t2 > t1:
            # three-point linearity guard (see _run): drifting windows lie
            dt, why = guarded_slope((n1, n2, n3), {n1: t1, n2: t2, n3: t3})
            if dt is not None:
                return (n3 - n1) * block_len / (t3 - t1) / 1e6, True
            print(f"# drift guard (sched): {why} — demoting",
                  file=sys.stderr)
    n, dt, _ = one(steps, False)
    return n * block_len / dt / 1e6, False


def config5_scheduler(block_len, steps, batch=1):
    """Config 5 shape through the REAL scheduler loop (tag plane, message pump,
    pipelined delivery): 256-ch channelizer + per-channel demod + tag source.
    Returns (Msps, verified)."""
    # the differential's SHORT leg must still contain data super-steps after
    # its warm-up batch (s1 = steps//4 ≥ 2·batch), else it times only the
    # EOS dispatch and the slope is meaningless (measured on CPU smoke).
    # On TPU the legs also need ENOUGH super-steps that per-leg constants
    # (init, pipeline fill, readback jitter) cancel in the slope — 2/4/8
    # super-step legs drift-guarded three windows running at 4-9 Gsps
    # (19:02 window, slopes 0.231 vs 0.538 ms/step)
    import jax as _jax
    floor = 32 if _jax.default_backend() != "cpu" else 8
    steps = max(steps, floor * batch)
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.blocks.basic import NoiseSource
    from gnuradio4_tpu.blocks.channelizer import PFBChannelizer
    from gnuradio4_tpu.blocks.sdr import QuadratureDemod
    from gnuradio4_tpu.blocks.testing import NullSink
    from gnuradio4_tpu.core.tags import Tag

    class TaggedNoise(NoiseSource):
        """BASELINE config 5 requires TAG PROPAGATION at rate: a timing tag
        every 2^20 input samples rides the host sideband through the PFB's
        1/256 rate change and the demod to the sink (same plane the
        reference's trigger_time tags use)."""

        TAG_PERIOD = 1 << 20

        def emit_tags(self, ctx):
            n = next(iter(ctx.out_len.values()), 0)
            lo, hi = ctx.abs_index, ctx.abs_index + n
            p = self.TAG_PERIOD
            first = -(-lo // p) * p
            return [Tag(i - lo, {"trigger_time": float(i / 1e9)})
                    for i in range(first, hi, p)]

    def build(n):
        g = gr.Graph()
        src = TaggedNoise(noise="complex_gaussian", n_samples=n * block_len)
        chan = PFBChannelizer(n_channels=256, taps_per_phase=8)
        dem = QuadratureDemod(gain=1.0)
        snk = NullSink()
        g.connect_chain(g.add(src), g.add(chan), g.add(dem), g.add(snk))
        return gr.Scheduler(g, block_len=block_len, sample_rate=1e9,
                            pipeline_depth=2, async_delivery=True,
                            batch_steps=batch)

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
        # device_resident: one upload at init, on-device slice per step —
        # measures the DECODER through the scheduler loop instead of the
        # relay's pathological per-step host→device LLR copy (the kernel-only
        # view is config 7k; the host-feed path is exercised by the tests)
        src = g.emplace("VectorSource", device_resident=True)
        src.data = llr[: n * bl]
        dec = g.emplace("LdpcDecoder", n=256, m=128, seed=0)
        snk = g.emplace("NullSink")   # metrics-only egress (decode
        # correctness is pinned by tests/test_ldpc.py; the differential's
        # state checksum proves execution)
        g.connect_chain(src, dec, snk)
        return gr.Scheduler(g, block_len=bl, sample_rate=1e9,
                            pipeline_depth=2, async_delivery=True)

    return _run_sched(build, bl, steps)


def config7k(block_len, batch=1):
    """LDPC decode KERNEL rate: device-born random LLRs (decode cost is
    content-independent for fixed iterations) -> dense min-sum decoder ->
    sink, one compiled graph. Measures the DECODER, not the relay's H2D of
    host LLR feeds (config 7 measures the full scheduler loop, which on this
    transport is feed-bound)."""
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.blocks.basic import NoiseSource
    from gnuradio4_tpu.blocks.testing import NullSink
    g = gr.Graph()
    src = NoiseSource(noise="gaussian")
    dec = g.emplace("LdpcDecoder", n=256, m=128, seed=0)
    g.connect_chain(g.add(src), dec, g.add(NullSink()))
    return gr.compile_graph(g, block_len=(block_len // 256) * 256,
                            sample_rate=1e9, batch_steps=batch)


def _run_one(key: str, block_len: int, steps: int) -> dict:
    """Run one config in THIS process; returns its result record."""
    import jax
    import os
    if os.environ.get("GR4_BENCH_FORCE_CPU") == "1":
        # the axon plugin overrides JAX_PLATFORMS from the environment; only
        # an explicit config update reaches the CPU backend
        jax.config.update("jax_platforms", "cpu")
    try:
        # warm compile cache shared with bench.py — later attempts start warm
        here = os.path.dirname(os.path.abspath(__file__))
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(here, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    platform = jax.devices()[0].platform
    on_cpu = platform == "cpu"
    builders = {"1": ("mono FIR127+FFT4096", config1),
                "2": ("polyphase resampler 3/2", config2),
                "3": ("WBFM receiver (latency block)", config3),
                "3t": ("WBFM receiver (throughput block)", config3),
                "4": ("PFB channelizer 64ch", config4),
                "7k": ("LDPC min-sum decode kernel rate (n=256 R=1/2 "
                       "25 iters, dense), coded Mbit/s", config7k)}
    # per-config operating points (CPU smoke uses small windows)
    bl = block_len
    if key == "3":
        bl = min(bl, 1 << 18)          # latency-oriented natural block
    elif key == "3t":
        bl = max(bl, 1 << 22) if not on_cpu else bl   # throughput point
    elif key == "5":
        bl = max(bl, 1 << 21) if not on_cpu else bl
    elif key in ("1", "2", "4") and not on_cpu:
        bl = max(bl, 1 << 22)          # amortize per-step relay overhead
    elif key == "7k":
        bl = min(bl, 1 << 19)          # decode-bound; keep compile light
    if on_cpu:
        bl = min(bl, 1 << 18)
        steps = min(steps, 8)
    # step batching (round-5): amortize the measured ~6 ms/dispatch relay
    # floor. GR4_SUITE_BATCH overrides; per-config defaults below are the
    # sweep-measured operating points (1 until a window verifies otherwise).
    batch = int(os.environ.get("GR4_SUITE_BATCH", "0")) \
        or _BATCH_DEFAULTS.get(key, 1)
    if on_cpu:
        batch = min(batch, 2)
    rec: dict = {"config": key, "platform": platform, "block_len": bl,
                 "batch_steps": batch}
    try:
        if key == "5":
            rec["name"] = "scheduler loop: 256ch PFB + demod + tags"
            msps, verified = config5_scheduler(bl, steps, batch)
        elif key == "6":
            bl = min(bl, 1 << 16)      # overhead shows at small blocks
            rec.update(name="scheduler overhead: 40-block cascade "
                            "(bm_Scheduler mirror)", block_len=bl)
            msps, verified = config6_cascade(bl, max(steps, 200))
        elif key == "7":
            bl = min(bl, 1 << 17)
            rec.update(name="LDPC min-sum decode (n=256 R=1/2 25 iters, "
                            "dense check-layout), coded Mbit/s", block_len=bl)
            msps, verified = config7_ldpc(bl, max(steps, 40))
        else:
            name, builder = builders[key]
            rec["name"] = name
            compiled = builder(bl, batch)
            # small-block configs need MANY steps for a meaningful slope:
            # at ~ms-scale steps a (2, 20)-step differential drowns in the
            # readback-latency noise (the SUITE_r04 config-3 row measured a
            # physically-implausible 11 Gsps that way — window too small)
            if bl * batch <= (1 << 19) and not on_cpu:
                steps = max(steps, 200)
            # very fast configs (resampler/channelizer at ~0.1-0.3 ms/step)
            # need hundreds of steps for the slope to clear readback noise
            if key in ("2", "4") and not on_cpu:
                steps = max(steps, 256)
            # 7k decodes ~1 ms/step: the 18:53 window's 200-step legs
            # differed by less than the readback jitter (walls 0.49/0.48/0.69)
            if key == "7k" and not on_cpu:
                steps = max(steps, 1000)
            # one dispatch covers batch sub-steps of bl samples each
            msps, verified = _run(compiled, steps, bl * batch)
        rec.update(msps=round(msps, 1), verified=verified)
    except Exception as e:
        rec["error"] = f"{type(e).__name__}: {e}"
    return rec


# Per-config step-batching defaults (GR4_SUITE_BATCH overrides) — the
# SWEEP_r05 measured operating points (verified rows, 2026-08-20 13:0x
# window): wbfm at the 2^18 latency block 154 → 1186 Msps at batch=8
# (batch=32 slightly worse); large blocks neutral-to-worse (headline chain
# 2271 → 1797 at batch=8 on 2^23) so configs 1/2/3t/4 stay unbatched;
# config 5's compiled chain measured +1% at batch=4 and its Scheduler loop
# adds per-dispatch host work that batching amortizes further.
_BATCH_DEFAULTS: dict[str, int] = {"3": 8, "5": 8}

ALL_CONFIGS = "1,2,3,3t,4,5,6,7"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block-len", type=int, default=1 << 20)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--configs", default=ALL_CONFIGS)
    ap.add_argument("--out", default=None,
                    help="write all result records to this JSON file")
    ap.add_argument("--retries", type=int, default=4,
                    help="fresh-process attempts per config hunting a "
                         "healthy (verified) window")
    args = ap.parse_args()
    import os
    if os.environ.get("GR4_SUITE_CHILD") == "1":
        # child mode: one config, one process. A failed D2H poisons the whole
        # in-process PJRT client (NOTES.md), so each attempt gets a fresh one.
        # Hard watchdog: even COMPILE can hang on this transport (rc=7).
        import threading
        budget = float(os.environ.get("GR4_BENCH_CHILD_BUDGET_S", "600"))
        threading.Thread(target=lambda: (time.sleep(budget), os._exit(7)),
                         daemon=True).start()
        rec = _run_one(args.configs.strip(), args.block_len, args.steps)
        print(json.dumps(rec), flush=True)
        # readback threads may be wedged inside the PJRT client — exit hard
        os._exit(0)

    # parent: per-config healthy-window hunting in fresh subprocesses (same
    # protocol as bench.py's _main_with_retry, per VERDICT r3 item 2)
    import subprocess
    deadline = time.monotonic() + float(
        os.environ.get("GR4_SUITE_DEADLINE_S", "3600"))
    results: list[dict] = []
    for key in [k.strip() for k in args.configs.split(",") if k.strip()]:
        held: dict | None = None
        for attempt in range(args.retries):
            if time.monotonic() > deadline - 60:
                print(f"# suite deadline reached at config {key}",
                      file=sys.stderr)
                if held is None:
                    held = {"config": key, "error": "suite deadline reached "
                            "before any attempt"}
                break
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--configs", key, "--block-len", str(args.block_len),
                 "--steps", str(args.steps)],
                env={**os.environ, "GR4_SUITE_CHILD": "1"},
                capture_output=True, text=True)
            sys.stderr.write(r.stderr)
            rec = None
            for line in reversed(r.stdout.splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    try:
                        rec = json.loads(line)
                        break
                    except Exception:
                        pass
            if rec is None:
                rec = {"config": key,
                       "error": f"child rc={r.returncode}, no JSON"}
            if rec.get("verified"):
                held = rec
                break
            if held is None or "msps" in rec:
                held = rec       # keep the best labeled fallback
            wait = 20 * (attempt + 1)
            print(f"# config {key} attempt {attempt + 1}: "
                  f"{'UNVERIFIED' if 'msps' in rec else rec.get('error')} — "
                  f"fresh-process retry in {wait} s", file=sys.stderr)
            if attempt + 1 < args.retries:
                time.sleep(wait)
        if held is not None:
            results.append(held)
            print(json.dumps(held), flush=True)
    if args.out:
        import datetime
        payload = {"date": datetime.datetime.now(datetime.timezone.utc)
                   .strftime("%Y-%m-%dT%H:%M:%SZ"),
                   "protocol": "readback-terminated differential timing per "
                               "config, fresh process per attempt, "
                               "healthy-window hunting (verified=true) with "
                               "labeled dispatch-rate fallback",
                   "results": results}
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
