"""Headline benchmark: complex Msamples/s/chip on the FIR+FFT+demod chain
(BASELINE.json metric). Prints ONE JSON line.

Chain (all on device, no host transfer in the hot loop):
  complex tone → 127-tap freq-xlating FIR → {4096-pt FFT magnitude, quadrature
  demod → audio decim FIR} — i.e. BASELINE config 1 + config 3's demod arm fused.

vs_baseline: fraction of the north-star per-chip rate. North star = 10 Gsps
aggregate on v5e-16 ⇒ 625 Msps/chip (BASELINE.md).

Runs on the default platform (TPU under axon; CPU elsewhere). First TPU contact
through the tunnel can take ~2 min — warmup is excluded from timing.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

NORTH_STAR_PER_CHIP_MSPS = 625.0


def build_step(block_len: int, batch_steps: int = 1):
    import jax
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.blocks.basic import ComplexToneSource
    from gnuradio4_tpu.blocks.filter import FirFilter, FreqXlatingFir
    from gnuradio4_tpu.blocks.fourier import FFT
    from gnuradio4_tpu.blocks.sdr import QuadratureDemod
    from gnuradio4_tpu.blocks.testing import NullSink
    from gnuradio4_tpu.ops import filter_design as fd

    fs = 20e6
    g = gr.Graph()
    src = ComplexToneSource(frequency=1e6)
    taps = fd.design_fir("lowpass", 127, sample_rate=fs, f_low=2e6)
    fir = FreqXlatingFir(taps=taps.astype(np.float32), center_freq=3e6,
                         sample_rate_in=fs, decim=1)
    fft = FFT(fft_size=4096, window="Hann", output="magnitude", calibrate=False)
    dem = QuadratureDemod(gain=1.0)
    audio = FirFilter(taps=fd.design_fir("lowpass", 63, sample_rate=fs,
                                         f_low=1e6).astype(np.float32), decim=8)
    s1, s2 = NullSink(name="spec"), NullSink(name="audio")
    g.connect_chain(src, fir, fft, s1)
    g.connect(fir, dem)
    g.connect_chain(dem, audio, s2)
    compiled = gr.compile_graph(g, block_len=block_len, sample_rate=fs,
                                batch_steps=batch_steps)
    return compiled


def _force_complete(sink_ins, deadline_s: float) -> dict:
    """Checksum readback of the sink outputs — the ONLY trustworthy
    completion signal on this transport (see the timing-honesty note in main).
    Runs on a daemon thread with a deadline because D2H over the axon tunnel
    can wedge for minutes.

    ROUND-3 ROOT CAUSE (docs/PERFORMANCE.md): the relay's 0-d D2H is
    permanently UNIMPLEMENTED — the round-2 `float(<0-d jit result>)` here
    raised/hung on EVERY attempt, masquerading as a transport outage. The
    fix is an 8-lane float32 broadcast readback (>=1-element float D2H
    works), via utils.transfer."""
    import threading
    import numpy as _np
    import jax
    import jax.numpy as jnp
    result: dict = {}

    def rb():
        try:
            vec = jax.jit(
                lambda t: jnp.broadcast_to(
                    sum(jnp.sum(jnp.abs(v)) for ins in t.values()
                        for v in ins.values()).astype(jnp.float32),
                    (8,)))(sink_ins)
            result["check"] = float(_np.asarray(vec)[0])
        except Exception as e:  # pragma: no cover
            result["error"] = f"{type(e).__name__}: {e}"
    th = threading.Thread(target=rb, daemon=True)
    th.start()
    th.join(timeout=deadline_s)
    if th.is_alive():
        result.setdefault("error", "timeout")
        result["wedged"] = True
    return result


def main() -> None:
    import os
    import jax
    # persistent compile cache: the relay's XLA compile of the barrier'd
    # 8Mi-sample chain takes minutes; cache entries make later runs (and the
    # driver's end-of-round capture) start from warm
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(
                              __file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    # hard child watchdog: on this transport even COMPILE/device_put can hang
    # with no exception (observed round 3) — no in-band guard can cover that,
    # so the child self-destructs after its budget and the parent retries /
    # falls back. rc=7 marks a watchdog kill.
    import threading as _wd_th
    _budget = float(os.environ.get("GR4_BENCH_CHILD_BUDGET_S", "900"))
    _wd_th.Thread(target=lambda: (time.sleep(_budget), os._exit(7)),
                  daemon=True).start()
    if os.environ.get("GR4_BENCH_FORCE_CPU") == "1":
        # last-resort mode: the TPU transport failed every attempt — measure on
        # CPU instead and SAY SO in the metric (platform tag) rather than
        # returning nothing for the round
        jax.config.update("jax_platforms", "cpu")
    # TIMING HONESTY (round-2 finding, NOTES.md): the axon relay DEFERS
    # execution — jax.block_until_ready returns without waiting for device
    # completion, so plain wall-clock over dispatched steps measures the HOST
    # DISPATCH RATE, not compute (proven by an 8x-FLOPs chain timing
    # identically). The only honest protocol is readback-terminated
    # DIFFERENTIAL timing: time (N steps + scalar checksum readback) at two
    # step counts — the readback latency cancels in the slope. When D2H is in
    # an outage window (it is, for hours at a time), the bench falls back to
    # the dispatch-rate number and SAYS SO in the metric + 'verified' field.
    platform = jax.devices()[0].platform
    # 8 Mi samples/step on accelerators; CPU smoke runs use small windows.
    # Step batching (round-5): GR4TPU_BENCH_BATCH sub-steps fuse into one
    # dispatch (lax.scan), amortizing the measured ~6 ms/dispatch relay
    # floor; default 1 until a sweep window verifies the batched points.
    block_len = (1 << 23) if platform != "cpu" else (1 << 18)
    batch = max(1, int(os.environ.get("GR4TPU_BENCH_BATCH", "1")))
    win_small, win_big = (64, 512) if platform != "cpu" else (4, 16)
    if batch > 1:   # same sample budget per window
        win_small = max(2, win_small // batch)
        win_big = max(win_small * 4, win_big // batch)
    compiled = build_step(block_len, batch_steps=batch)
    states = compiled.init_states()
    params = compiled.gather_params()

    # warmup: compile + tunnel establishment. block_until_ready itself can
    # wedge on a half-working transport — deadline-guard it and move on (it
    # is only a warmup synchronization hint; see the honesty note above)
    import threading as _th
    for _ in range(3):
        states, sink_ins = compiled.step(states, params, {})
    _w = _th.Thread(target=lambda: jax.block_until_ready((states, sink_ins)),
                    daemon=True)
    _w.start()
    _w.join(timeout=60.0)
    wedged = _w.is_alive()   # wedged threads → hard-exit at the end

    # first-contact probe must cover the relay's XLA compile of the whole
    # chain (minutes when the persistent cache is cold — measured ~280 s)
    first_probe_s = float(os.environ.get("GR4_BENCH_FIRST_PROBE_S", "420"))

    def _good_check(r: dict) -> bool:
        # the chain sums |FFT magnitude| + |demod audio| of a pure tone — the
        # checksum must be finite and strictly positive or the "compute" it
        # certifies is garbage (NaN-poisoned or never-ran)
        return "check" in r and np.isfinite(r["check"]) and r["check"] > 0

    probe = _force_complete(sink_ins, deadline_s=first_probe_s)
    verified = _good_check(probe)
    wedged = wedged or bool(probe.get("wedged"))

    if verified:
        # readback-terminated differential timing: slope between window
        # sizes cancels the (large, variable) D2H latency. Even DISPATCH can
        # block when the transport applies backpressure — budget the loops.
        # THREE windows (round-5): the two independent slopes must agree
        # within 40% or the window is drifting and the number is a lie
        # (drift produced physically-impossible suite rows on 2026-08-20).
        from gnuradio4_tpu.utils.bench_timing import (guarded_slope,
                                                       three_windows)
        win_small, win_mid, win_big = three_windows(win_small, win_big)
        walls: dict[int, float] = {}
        for steps in (win_small, win_mid, win_big):
            t0 = time.perf_counter()
            for k in range(steps):
                states, sink_ins = compiled.step(states, params, {})
                if (k & 7) == 7 and time.perf_counter() - t0 > 150.0:
                    print(f"# dispatch window stalled at step {k}/{steps} — "
                          f"transport backpressure; falling back",
                          file=sys.stderr)
                    verified = False
                    break
            if not verified:
                break
            # a healthy window completes in seconds; a sync that
            # needs minutes IS an outage — bail to the labeled
            # fallback instead of blowing the hunt budget
            r = _force_complete(sink_ins, deadline_s=120.0)
            wedged = wedged or bool(r.get("wedged"))
            if not _good_check(r):
                verified = False
                break
            walls[steps] = time.perf_counter() - t0
        if verified:
            dt_per_step, why = guarded_slope(
                (win_small, win_mid, win_big), walls)
            if dt_per_step is None:
                # stalls/drift make the slope meaningless; fall back to the
                # labeled dispatch-rate path rather than print nonsense
                print(f"# drift guard: {why} — falling back",
                      file=sys.stderr)
                verified = False
            else:
                msps = block_len * batch / dt_per_step / 1e6
                print(f"# verified: readback-terminated differential timing, "
                      f"walls {walls}", file=sys.stderr)

    if not verified:
        # dispatch-rate fallback (upper bound on sustainable host-side rate;
        # NOT a device-compute measurement); every sync is deadline-guarded —
        # a wedged transport must never hang the round's bench
        steps = win_small
        best_rate = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            done = 0
            for done in range(1, steps + 1):
                states, sink_ins = compiled.step(states, params, {})
                if (done & 7) == 0 and time.perf_counter() - t0 > 120.0:
                    break          # backpressured dispatch — rate over what ran
            dispatch_dt = time.perf_counter() - t0
            _s = _th.Thread(
                target=lambda a=(states, sink_ins): jax.block_until_ready(a),
                daemon=True)
            _s.start()
            # once the transport is known-wedged, long waits buy nothing and
            # blow the parent's hunt budget — bail fast
            _s.join(timeout=20.0 if wedged else 120.0)
            if _s.is_alive():      # sync wedged: use the pure dispatch time
                wedged = True
                dt = dispatch_dt
            else:
                dt = time.perf_counter() - t0
            best_rate = max(best_rate, done * block_len * batch / dt)
        msps = best_rate / 1e6
        print(f"# UNVERIFIED: D2H outage ({probe.get('error', '?')}) — this is "
              f"the host dispatch rate, not measured device compute",
              file=sys.stderr)

    _report_roofline(msps, platform)
    # metric line goes out BEFORE the regression gate can raise — a gated
    # regression must still record its number for the round
    print(json.dumps({
        "metric": f"complex Msamples/s/chip, FIR127+FFT4096+demod chain "
                  f"({platform}{'' if verified else ', dispatch-rate UNVERIFIED'})",
        "value": round(msps, 2),
        "unit": "Msps",
        "vs_baseline": round(msps / NORTH_STAR_PER_CHIP_MSPS, 4),
        "verified": verified,
        "batch_steps": batch,
    }), flush=True)
    _regression_gate(msps, platform, verified)
    if wedged:
        # a readback thread is stuck inside the PJRT client; interpreter
        # teardown would abort the process (SIGABRT) while cancelling it —
        # hard-exit cleanly instead, the result is already on stdout
        import os
        os._exit(0)


# v5e per-chip peaks (public spec): 197 TFLOP/s bf16 MXU; 819 GB/s HBM. Used
# only for roofline FRACTIONS (stderr diagnostics) — the headline metric stays
# measured Msps.
_V5E_PEAK_BF16_TFLOPS = 197.0
_V5E_HBM_GBPS = 819.0

# analytic per-input-sample costs of the chain's stages (complex MAC = 8 real
# FLOPs; FFT 5·N·log2 N per frame; bytes = streamed operands at complex64)
_STAGES = {
    "fir127_xlating": {"flops": 127 * 8, "bytes": 8 + 8},
    "fft4096_mag":    {"flops": 5 * 12 + 8, "bytes": 8 + 4},
    "quad_demod":     {"flops": 12, "bytes": 8 + 4},
    "audio_fir63_d8": {"flops": 63 * 2 // 8, "bytes": 4 + 4 // 8},
}


def _report_roofline(msps: float, platform: str) -> None:
    """Per-stage analytic roofline fractions at the measured rate (stderr)."""
    sps = msps * 1e6
    total_fl = sum(s["flops"] for s in _STAGES.values())
    total_by = sum(s["bytes"] for s in _STAGES.values())
    stages = {
        name: {"gflops": round(sps * s["flops"] / 1e9, 1),
               "gbytes_s": round(sps * s["bytes"] / 1e9, 1)}
        for name, s in _STAGES.items()}
    rep = {
        "roofline": {
            "platform": platform,
            "stages": stages,
            "chain_tflops": round(sps * total_fl / 1e12, 3),
            "stream_gbps_upper_bound": round(sps * total_by / 1e9, 1),
            "mxu_fraction_bf16": round(sps * total_fl / 1e12
                                       / _V5E_PEAK_BF16_TFLOPS, 4),
            "hbm_write_gbps": round(sps * (4 + 4 / 8) / 1e9, 1),
            "note": "analytic per-sample costs (secondary diagnostic). The "
                    "PRIMARY per-stage MFU/HBM fractions are SLOPE-MEASURED "
                    "on device: SWEEP_r04.json + scripts/stage_mfu.py "
                    "(round-4). Stream bytes here are an upper bound — "
                    "sources generate on-device and XLA keeps fused "
                    "intermediates VMEM-resident",
        }
    }
    print("# " + json.dumps(rep), file=sys.stderr)


def _gate_records() -> list[str]:
    """All gate-eligible records, oldest→newest: driver BENCH_r*.json plus
    builder-committed VERIFIED_BENCH_*.json."""
    import glob
    import os
    here = os.environ.get("GR4_BENCH_RECORD_DIR") \
        or os.path.dirname(os.path.abspath(__file__))
    return sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))
                  + glob.glob(os.path.join(here, "VERIFIED_BENCH_*.json")),
                  key=os.path.getmtime)


def _regression_gate(msps: float, platform: str, verified: bool) -> None:
    """Compare against the newest LIKE-FOR-LIKE record — same platform AND
    same verified-ness (a dispatch-rate record is an upper bound, not a
    measurement; a verified run must never be gated against one, and vice
    versa). The gate searches backwards through every record instead of
    silently skipping when the newest record differs in mode (round-2
    weakness #6: during a long D2H outage the gate protected nothing).
    Warns below 0.8x; with GR4_BENCH_GATE=1 exits 3 (no-retry)."""
    import os
    match = None
    skipped = []
    for rec in reversed(_gate_records()):
        try:
            parsed = json.load(open(rec))["parsed"]
            if f"({platform}" not in parsed.get("metric", ""):
                skipped.append(f"{rec.rsplit('/', 1)[-1]}(platform)")
                continue
            if bool(parsed.get("verified", True)) != verified:
                skipped.append(f"{rec.rsplit('/', 1)[-1]}(verified-mode)")
                continue
            match = (rec, float(parsed["value"]))
            break
        except Exception:
            skipped.append(f"{rec.rsplit('/', 1)[-1]}(unparsable)")
    if match is None:
        mode = "verified" if verified else "dispatch-rate"
        print(f"# regression-gate: no prior {platform}/{mode} record to "
              f"compare against"
              + (f" (skipped: {', '.join(skipped)})" if skipped else ""),
              file=sys.stderr)
        return
    rec, last = match
    ratio = msps / last if last else float("inf")
    line = (f"# regression-gate: {msps:.0f} Msps vs last "
            f"{'verified' if verified else 'dispatch-rate'} record "
            f"{last:.0f} ({rec.rsplit('/', 1)[-1]}) = {ratio:.2f}x")
    print(line, file=sys.stderr)
    if ratio < 0.8:
        msg = f"PERF REGRESSION: {ratio:.2f}x of last recorded rate"
        print("# " + msg, file=sys.stderr)
        if os.environ.get("GR4_BENCH_GATE") == "1":
            # rc 3: the metric line already printed; the parent must NOT
            # burn retries or fall back to CPU for a genuine regression
            raise SystemExit(3)


def _main_with_retry() -> None:
    """The remote-TPU transport raises transient UNIMPLEMENTED errors AND a
    failed call poisons the in-process PJRT client (every later call in the
    same process fails while a fresh process succeeds — observed round 2).
    Retry in FRESH SUBPROCESSES; the child's JSON line passes through."""
    import os
    import subprocess
    if os.environ.get("GR4_BENCH_CHILD") == "1":
        main()
        return

    def _run_child():
        return subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "GR4_BENCH_CHILD": "1"},
            capture_output=True, text=True)

    def _emit(r):
        sys.stderr.write(r.stderr)
        sys.stdout.write(r.stdout)
        sys.stdout.flush()

    # hunting for a healthy D2H window must never overrun the driver's bench
    # budget: once the deadline nears, emit the held (unverified) result
    deadline = time.monotonic() + float(
        os.environ.get("GR4_BENCH_DEADLINE_S", "1500"))
    child_cost = 300.0                  # compile + windows, worst case
    last_unverified = None
    kills = 0
    for attempt in range(6):
        r = _run_child()
        out_of_time = time.monotonic() + child_cost + 45 > deadline
        if r.returncode in (0, 3):
            if '"verified": false' not in r.stdout or attempt >= 3 \
                    or out_of_time:
                _emit(r)
                raise SystemExit(3 if r.returncode == 3 else None)
            # rc ok but D2H was in an outage window (dispatch-rate fallback).
            # The flap timescale is minutes (round-2 notes): hold the result
            # and retry a few fresh processes hoping to catch a healthy
            # window with a *verified* compute measurement.
            last_unverified = r
            wait = 30 * (attempt + 1)
            print(f"# attempt {attempt + 1} ran but UNVERIFIED (D2H outage) — "
                  f"hunting a healthy window in {wait} s", file=sys.stderr)
            time.sleep(wait)
            continue
        if out_of_time and last_unverified is not None:
            _emit(last_unverified)
            return
        if r.returncode == 7:
            kills = kills + 1
            if kills >= 2:        # transport hard-down: stop burning budget
                print("# two watchdog-killed children — transport hard-down; "
                      "going to CPU fallback", file=sys.stderr)
                break
        wait = 30 * (attempt + 1)
        print(f"# bench attempt {attempt + 1} failed (rc={r.returncode}); "
              f"fresh-process retry in {wait} s", file=sys.stderr)
        time.sleep(wait)
    if last_unverified is not None:   # never caught a verified window
        _emit(last_unverified)
        return
    # total transport outage: every attempt failed before producing a number.
    # Measure on CPU instead — the metric line carries a '(cpu' platform tag
    # so the record can never be mistaken for a TPU result.
    print("# all TPU attempts failed — last-resort CPU measurement",
          file=sys.stderr)
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env={**os.environ, "GR4_BENCH_CHILD": "1", "GR4_BENCH_FORCE_CPU": "1"})
    if r.returncode == 0:
        return
    raise SystemExit("bench failed after 6 fresh-process attempts + CPU fallback")


if __name__ == "__main__":
    sys.exit(_main_with_retry())
