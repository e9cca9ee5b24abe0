"""Round-4 on-device perf sweep: every candidate kernel variant, measured with
the readback-terminated differential protocol (the only honest timing on the
axon relay — NOTES.md timing-honesty finding).

Groups (``--group``, default all, each in THIS process — run the script in a
fresh process per attempt; a failed D2H poisons the PJRT client):

  tone   direct per-sample NCO vs factored outer-product ramp
  fir    freq-xlating old (heterodyned complex taps, 8 dots) vs new
         (rotate + real taps, 4 dots) at precision high|bf16; plain FIR127;
         audio FIR63 decim 8 at high|bf16; tile sweep
  fft    FFT4096+mag: native HLO vs matmul four-step (high|bf16, n1=64|128)
  chain  full headline graph (compile_graph) under engine/precision combos
  wbfm   config-3 chain at the latency block (2^18) and throughput block (2^23)

Prints one JSON line per measurement: {"name", "ms_per_step", "msps",
"verified"}. A measurement is verified iff its checksum readback returned a
finite positive float at both window sizes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _checksum_fn():
    import jax.numpy as jnp

    def checksum(v):
        return jnp.broadcast_to(jnp.sum(jnp.abs(v)).astype(jnp.float32), (8,))
    return checksum


def measure(name: str, call, n_samples: int, wins=(4, 32)) -> dict:
    """Differential timing of ``call`` (returns an 8-lane checksum array).

    Three-point linearity guard (round-5): a mid window is timed too and the
    two independent slopes must agree within 40%, else the window is
    drifting and the row reports the drift instead of a fake number."""
    rec = {"name": name}
    try:
        h = np.asarray(call())
        if not (np.isfinite(h[0]) and h[0] > 0):
            rec.update(error=f"bad checksum {h[0]}")
            return rec
        from gnuradio4_tpu.utils.bench_timing import (guarded_slope,
                                                       three_windows)
        pts = three_windows(wins[0], wins[1])
        walls = {}
        for steps in pts:
            t0 = time.perf_counter()
            out = None
            for _ in range(steps):
                out = call()
            v = np.asarray(out)
            if not (np.isfinite(v[0]) and v[0] > 0):
                rec.update(error="checksum went bad mid-window")
                return rec
            walls[steps] = time.perf_counter() - t0
        dt, why = guarded_slope(pts, walls)
        if dt is None:
            rec.update(error=why)
            return rec
        rec.update(ms_per_step=round(dt * 1e3, 3),
                   msps=round(n_samples / dt / 1e6, 1), verified=True)
    except Exception as e:
        rec.update(error=f"{type(e).__name__}: {str(e)[:200]}")
    return rec


def group_tone(n):
    import jax
    import jax.numpy as jnp
    from gnuradio4_tpu.ops.signal import complex_exp_ramp
    checksum = _checksum_fn()
    fs, f0 = 20e6, 1e6

    def direct():
        t = jnp.arange(n, dtype=jnp.float32)
        ph = 2 * jnp.pi * (f0 / fs) * t
        return checksum(jax.lax.complex(jnp.cos(ph), jnp.sin(ph)))

    dphi = np.uint32(round((f0 / fs) * 2**32))

    def factored():
        return checksum(complex_exp_ramp(jnp.uint32(0), jnp.uint32(dphi), n))

    def poly():
        # quadrant-folded minimax sin/cos pair on the uint32 phase grid:
        # u = frac cycles in [0,1); fold to t in [-0.25, 0.25) and a swap bit
        idx = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)[:, 0]
        ph = idx * jnp.uint32(dphi)
        u = ph.astype(jnp.float32) * jnp.float32(2.0**-32)      # [0,1)
        q = jnp.floor(u * 4.0 + 0.5)                            # quadrant
        t = u - q * 0.25                                        # [-0.125,0.125)
        r = t * jnp.float32(2.0 * np.pi)                        # [-pi/4, pi/4)
        r2 = r * r
        # degree-7/6 minimax on [-pi/4, pi/4): ~1e-8 class
        s = r * (1.0 + r2 * (-1.6666654611e-1 + r2 * (8.3321608736e-3
                                                      + r2 * -1.9515295891e-4)))
        c = 1.0 + r2 * (-0.5 + r2 * (4.1666668e-2 + r2 * (
            -1.3888889e-3 + r2 * 2.47955e-5)))
        qi = q.astype(jnp.int32) & 3
        cosv = jnp.where(qi == 0, c, jnp.where(qi == 1, -s,
                         jnp.where(qi == 2, -c, s)))
        sinv = jnp.where(qi == 0, s, jnp.where(qi == 1, c,
                         jnp.where(qi == 2, -s, -c)))
        return checksum(jax.lax.complex(cosv, sinv))

    jd, jf, jp = jax.jit(direct), jax.jit(factored), jax.jit(poly)
    yield measure("tone_direct", lambda: jd(), n, wins=(128, 1024))
    yield measure("tone_factored", lambda: jf(), n, wins=(128, 1024))
    yield measure("tone_poly", lambda: jp(), n, wins=(128, 1024))


def group_fir(n):
    import jax
    import jax.numpy as jnp
    import gnuradio4_tpu.ops.fir as fir_mod
    from gnuradio4_tpu.ops import filter_design as fd
    from gnuradio4_tpu.ops.fir import fir_apply, fir_init_state
    from gnuradio4_tpu.ops.signal import complex_exp_ramp
    checksum = _checksum_fn()
    fs = 20e6
    taps = fd.design_fir("lowpass", 127, sample_rate=fs,
                         f_low=2e6).astype(np.float32)
    from gnuradio4_tpu.ops.fir import freq_xlating_taps
    ctaps = freq_xlating_taps(taps, 3e6, fs)
    audio_taps = fd.design_fir("lowpass", 63, sample_rate=fs,
                               f_low=1e6).astype(np.float32)
    x0 = jax.jit(lambda: complex_exp_ramp(
        jnp.uint32(0), jnp.uint32(round(0.05 * 2**32)), n))()
    xr0 = jax.jit(lambda x: jnp.real(x))(x0)
    hist = jax.jit(lambda: fir_init_state(0, 127, jnp.complex64))()
    ahist = jax.jit(lambda: fir_init_state(0, 63, jnp.float32))()
    dphi = np.uint32(round((3e6 / fs) * 2**32))

    from gnuradio4_tpu.ops.signal import nco_rotate

    def xlate_old(x, h):
        y, _ = fir_apply(x, ctaps, h)
        return checksum(y)

    def xlate_new(x, h):
        xrot = x * complex_exp_ramp(jnp.uint32(0), jnp.uint32(dphi), n)
        y, _ = fir_apply(xrot.astype(jnp.complex64), taps, h)
        return checksum(y)

    def xlate_fused(x, h):
        y, _ = fir_apply(nco_rotate(x, jnp.uint32(0), jnp.uint32(dphi)),
                         taps, h)
        return checksum(y)

    def nco_only(x, h):
        return checksum(nco_rotate(x, jnp.uint32(0), jnp.uint32(dphi)))

    def fir_plain(x, h):
        y, _ = fir_apply(x, taps, h)
        return checksum(y)

    def fir_ilv(x, h):
        y, _ = fir_apply(x, taps, h, method="matmul_ilv")
        return checksum(y)

    def xlate_old_ilv(x, h):
        y, _ = fir_apply(x, ctaps, h, method="matmul_ilv")
        return checksum(y)

    def xlate_new_ilv(x, h):
        xrot = x * complex_exp_ramp(jnp.uint32(0), jnp.uint32(dphi), n)
        y, _ = fir_apply(xrot.astype(jnp.complex64), taps, h,
                         method="matmul_ilv")
        return checksum(y)

    def fir_pal(x, h):
        y, _ = fir_apply(x, taps, h, method="pallas")
        return checksum(y)

    def xlate_old_pal(x, h):
        y, _ = fir_apply(x, ctaps, h, method="pallas")
        return checksum(y)

    # round-5 fused FIR+demod Pallas pass (VERDICT r4 weak #1): the complex
    # FIR intermediate never round-trips HBM. Compare against the
    # composition (xlate_old + demod_only rows).
    from gnuradio4_tpu.ops.demod import quadrature_demod
    from gnuradio4_tpu.ops.fir import fir_quad_demod_fused
    # prev rides the HISTORY arg (h[-1] is an arbitrary but valid complex
    # sample): a concrete device complex scalar CLOSED OVER as a jit
    # constant forces a trace-time D2H the relay rejects (capability
    # matrix; bisected r5) — deriving it from a traced argument is the
    # proven-deterministic form

    def xlate_demod_fused(x, h):
        xc = jnp.concatenate([h.astype(x.dtype), x])[None, :]
        return checksum(fir_quad_demod_fused(xc, ctaps, 1,
                                             h[-1] + (1 + 0j), 1.0))

    def fir_demod_fused(x, h):
        xc = jnp.concatenate([h.astype(x.dtype), x])[None, :]
        return checksum(fir_quad_demod_fused(xc, taps, 1,
                                             h[-1] + (1 + 0j), 1.0))

    def demod_only(x, h):
        y, _ = quadrature_demod(x, h[-1] + (1 + 0j), gain=1.0)
        return checksum(y)

    def audio(x, h):
        y, _ = fir_apply(x, audio_taps, h, decim=8)
        return checksum(y)

    prec = {"high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT,
            "bf16": jax.lax.Precision.HIGH}
    for mode in ("high", "default", "bf16"):
        fir_mod._MODE = mode
        fir_mod._PRECISION = prec[mode]
        for nm, fn, xin, h in (("xlate_old", xlate_old, x0, hist),
                               ("xlate_new", xlate_new, x0, hist),
                               ("xlate_fused", xlate_fused, x0, hist),
                               ("nco_only", nco_only, x0, hist),
                               ("fir127", fir_plain, x0, hist),
                               ("fir127_ilv", fir_ilv, x0, hist),
                               ("xlate_old_ilv", xlate_old_ilv, x0, hist),
                               ("xlate_new_ilv", xlate_new_ilv, x0, hist),
                               ("fir127_pal", fir_pal, x0, hist),
                               ("xlate_old_pal", xlate_old_pal, x0, hist),
                               ("xlate_demod_fused", xlate_demod_fused,
                                x0, hist),
                               ("fir_demod_fused", fir_demod_fused, x0, hist),
                               ("demod_only", demod_only, x0, hist),
                               ("audio_d8", audio, xr0, ahist)):
            if nm in ("nco_only", "demod_only") and mode != "high":
                continue                      # precision-independent
            if (nm.endswith("_ilv") or nm.endswith("_pal")
                    or nm.endswith("_fused")) and mode != "high":
                continue                      # layout question, not precision
            jf = jax.jit(fn)
            yield measure(f"{nm}[{mode}]", lambda jf=jf, xin=xin, h=h:
                          jf(xin, h), n)
    fir_mod._MODE = "high"
    fir_mod._PRECISION = jax.lax.Precision.HIGH


def group_firtile(n):
    """FIR tile-size A/B (round-5): the banded-Toeplitz FIR is the headline
    chain's biggest stage at ~7x its HBM floor; GR4TPU_FIR_TILE shipped in
    round 4 with no device rows. Cost model: tile L does 2L MACs/sample
    (vs ntaps ideal) in [n/L, L]x[L, L] dots — bigger tiles buy fewer,
    bigger dots at more redundant FLOPs. Measures where the trade lands."""
    import jax
    import jax.numpy as jnp
    from gnuradio4_tpu.ops import filter_design as fd
    from gnuradio4_tpu.ops.fir import fir_apply, fir_init_state, \
        freq_xlating_taps
    from gnuradio4_tpu.ops.signal import complex_exp_ramp
    checksum = _checksum_fn()
    fs = 20e6
    taps = fd.design_fir("lowpass", 127, sample_rate=fs,
                         f_low=2e6).astype(np.float32)
    ctaps = freq_xlating_taps(taps, 3e6, fs)
    x0 = jax.jit(lambda: complex_exp_ramp(
        jnp.uint32(0), jnp.uint32(round(0.05 * 2**32)), n))()
    hist = jax.jit(lambda: fir_init_state(0, 127, jnp.complex64))()
    saved = os.environ.get("GR4TPU_FIR_TILE")
    try:
        for tile in (0, 256, 512, 1024):
            os.environ["GR4TPU_FIR_TILE"] = str(tile)
            # fresh trace per tile (weights/shapes are trace-time constants)
            jf = jax.jit(lambda x, h: checksum(fir_apply(x, taps, h)[0]))
            jx = jax.jit(lambda x, h: checksum(fir_apply(x, ctaps, h)[0]))
            lbl = tile or 128
            yield measure(f"fir127[tile={lbl}]",
                          lambda jf=jf: jf(x0, hist), n, wins=(16, 128))
            yield measure(f"xlate_old[tile={lbl}]",
                          lambda jx=jx: jx(x0, hist), n, wins=(16, 128))
    finally:
        os.environ.pop("GR4TPU_FIR_TILE", None) if saved is None \
            else os.environ.__setitem__("GR4TPU_FIR_TILE", saved)


def group_fft(n):
    import jax
    import jax.numpy as jnp
    from gnuradio4_tpu.ops.fft import matmul_fft
    from gnuradio4_tpu.ops.signal import complex_exp_ramp
    from gnuradio4_tpu.ops.windows import make_window
    checksum = _checksum_fn()
    win = make_window("Hann", 4096).astype(np.float32)
    x0 = jax.jit(lambda: complex_exp_ramp(
        jnp.uint32(0), jnp.uint32(round(0.05 * 2**32)), n))()

    def native(x):
        fr = x.reshape(-1, 4096) * win
        return checksum(jnp.abs(jnp.fft.fft(fr, axis=-1)))

    def mm(x, n1, mode):
        fr = x.reshape(-1, 4096) * win
        return checksum(jnp.abs(matmul_fft(fr, 4096, n1=n1, mode=mode)))

    jn = jax.jit(native)
    yield measure("fft_hlo", lambda: jn(x0), n, wins=(16, 128))
    for n1 in (64, 128):
        for mode in ("high", "bf16", "highest"):
            jm = jax.jit(lambda x, n1=n1, mode=mode: mm(x, n1, mode))
            yield measure(f"fft_matmul[n1={n1},{mode}]",
                          lambda jm=jm: jm(x0), n, wins=(16, 128))

    # round-5: the IFFT matmul engine shipped round-4 with no device number —
    # measure conj-four-step vs the IFFT HLO (VERDICT r4 item 5)
    def inative(x):
        return checksum(jnp.abs(jnp.fft.ifft(x.reshape(-1, 4096), axis=-1)))

    def imm(x, mode):
        y = jnp.conj(matmul_fft(jnp.conj(x.reshape(-1, 4096)), 4096,
                                mode=mode)) * jnp.float32(1.0 / 4096)
        return checksum(jnp.abs(y))

    ji = jax.jit(inative)
    yield measure("ifft_hlo", lambda: ji(x0), n, wins=(16, 128))
    for mode in ("high", "bf16", "highest"):
        jim = jax.jit(lambda x, mode=mode: imm(x, mode))
        yield measure(f"ifft_matmul[{mode}]", lambda jim=jim: jim(x0), n,
                      wins=(16, 128))


def _chain_step(block_len):
    import bench
    compiled = bench.build_step(block_len)
    states = compiled.init_states()
    params = compiled.gather_params()
    return compiled, states, params


def group_chain(n):
    import jax
    import jax.numpy as jnp
    import gnuradio4_tpu.ops.fir as fir_mod
    checksum = _checksum_fn()
    cs = jax.jit(lambda t: jnp.broadcast_to(
        sum(jnp.sum(jnp.abs(v)) for ins in t.values()
            for v in ins.values()).astype(jnp.float32), (8,)))
    import jax.lax
    prec = {"high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT,
            "bf16": jax.lax.Precision.HIGH}
    for fir_mode in ("high", "default", "bf16"):
        for fft_eng in ("xla", "matmul_bf16"):
            fir_mod._MODE = fir_mode
            fir_mod._PRECISION = prec[fir_mode]
            os.environ["GR4TPU_FFT_ENGINE"] = fft_eng
            compiled, states, params = _chain_step(n)
            box = {"s": states}

            def call(compiled=compiled, params=params, box=box):
                box["s"], sink_ins = compiled.step(box["s"], params, {})
                return cs(sink_ins)

            yield measure(f"chain[fir={fir_mode},fft={fft_eng}]", call, n)
    fir_mod._MODE = "high"
    fir_mod._PRECISION = jax.lax.Precision.HIGH
    os.environ.pop("GR4TPU_FFT_ENGINE", None)


def group_wbfm(n):
    import jax
    import jax.numpy as jnp
    import bench_suite
    checksum = _checksum_fn()
    cs = jax.jit(lambda t: jnp.broadcast_to(
        sum(jnp.sum(jnp.abs(v)) for ins in t.values()
            for v in ins.values()).astype(jnp.float32), (8,)))
    for bl in (1 << 18, 1 << 23):
        compiled = bench_suite.config3(bl)
        states = compiled.init_states()
        params = compiled.gather_params()
        box = {"s": states}

        def call(compiled=compiled, params=params, box=box):
            box["s"], sink_ins = compiled.step(box["s"], params, {})
            return cs(sink_ins)

        yield measure(f"wbfm[bl=2^{bl.bit_length()-1}]", call, bl,
                      wins=(4, 32) if bl >= (1 << 22) else (16, 128))


def group_batch(n):
    """Round-5 step batching: the headline chain and the wbfm config-3 chain
    at several batch_steps. The round-4 sweep measured ~6 ms/dispatch nearly
    independent of block size (wbfm 6.09 ms at 2^18 vs 6.63 at 2^23) — one
    scan-fused dispatch of S sub-steps should amortize that floor S-fold.
    msps counts block_len·S samples per dispatch."""
    import jax
    import jax.numpy as jnp
    import bench
    import bench_suite
    cs = jax.jit(lambda t: jnp.broadcast_to(
        sum(jnp.sum(jnp.abs(v)) for ins in t.values()
            for v in ins.values()).astype(jnp.float32), (8,)))

    def rows(builder, label, bl, batches, wins_of):
        for S in batches:
            compiled = builder(bl, S)
            states = compiled.init_states()
            params = compiled.gather_params()
            box = {"s": states}

            def call(compiled=compiled, params=params, box=box):
                box["s"], sink_ins = compiled.step(box["s"], params, {}, {}) \
                    if compiled.batch_steps > 1 else \
                    compiled.step(box["s"], params, {})
                return cs(sink_ins)

            yield measure(f"{label}[bl=2^{bl.bit_length()-1},batch={S}]",
                          call, bl * S, wins=wins_of(S))

    yield from rows(lambda bl, S: bench.build_step(bl, batch_steps=S),
                    "chain", n, (1, 2, 4, 8),
                    lambda S: (4, 32) if S <= 2 else (2, 16))
    small = min(n, 1 << 18)
    yield from rows(bench_suite.config3, "wbfm", small, (1, 8, 32),
                    lambda S: (16, 128) if S == 1 else (4, 32))
    if n > small:
        yield from rows(bench_suite.config3, "wbfm", n, (1, 4, 8),
                        lambda S: (4, 32) if S <= 2 else (2, 16))


def group_ab(n):
    """Round-5 within-window headline A/B (VERDICT r4 weak #2): the
    round-3-equivalent chain vs current defaults in the SAME window/process.
    r3-equivalent = no rotation absorption (full-rate de-rotation NCO pass
    after the heterodyned-taps FIR) + associative-scan one-pole. Each leg is
    the same compile_graph program the bench measures."""
    import jax
    import jax.numpy as jnp
    import bench
    cs = jax.jit(lambda t: jnp.broadcast_to(
        sum(jnp.sum(jnp.abs(v)) for ins in t.values()
            for v in ins.values()).astype(jnp.float32), (8,)))

    def leg(label, env, builder=None, n_leg=None):
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        nl = n_leg or n
        try:
            compiled = (builder or bench.build_step)(nl)
            states = compiled.init_states()
            params = compiled.gather_params()
            box = {"s": states}

            def call(compiled=compiled, params=params, box=box):
                box["s"], sink_ins = compiled.step(box["s"], params, {})
                return cs(sink_ins)

            return measure(label, call, nl)
        finally:
            for k, v in saved.items():
                os.environ.pop(k, None) if v is None \
                    else os.environ.__setitem__(k, v)

    yield leg("chain_r3equiv[no_absorb,scan_onepole]",
              {"GR4TPU_NO_ROTATION_ABSORB": "1",
               "GR4TPU_NO_BLOCKED_ONEPOLE": "1"})
    yield leg("chain_current[defaults]", {})
    # and once more in reverse order so a mid-group window drift shows up
    yield leg("chain_r3equiv_rep", {"GR4TPU_NO_ROTATION_ABSORB": "1",
                                    "GR4TPU_NO_BLOCKED_ONEPOLE": "1"})
    yield leg("chain_current_rep", {})
    # epilogue fusion A/B (round-5): wbfm's FIR→demod edge is single-reader —
    # GR4TPU_FUSE_EPILOGUE=1 drops its barrier so XLA may fuse the FIR into
    # the demod and skip the complex intermediate's HBM round trip
    import bench_suite
    yield leg("wbfm_fuse_epilogue[on]", {"GR4TPU_FUSE_EPILOGUE": "1"},
              builder=bench_suite.config3)
    yield leg("wbfm_fuse_epilogue[off]", {}, builder=bench_suite.config3)


def group_cfg5(n):
    """Round-5 config-5 stage times for SCALING_r05.json's model slots:
    PFB256 alone, per-channel demod alone, per-channel audio FIR alone, and
    the full compiled config-5 chain (unbatched + batch=4). Replaces the
    model's measured-proxy/analytic assumptions with verified device rows."""
    import jax
    import jax.numpy as jnp
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.ops.channelizer import (design_pfb_taps, pfb_analyze,
                                               pfb_init_state)
    from gnuradio4_tpu.ops.demod import quadrature_demod
    from gnuradio4_tpu.ops import filter_design as fd
    from gnuradio4_tpu.ops.fir import fir_apply, fir_init_state
    from gnuradio4_tpu.ops.signal import complex_exp_ramp
    checksum = _checksum_fn()
    nch = 256
    taps = design_pfb_taps(nch, 8)
    nn = (n // nch) * nch
    x0 = jax.jit(lambda: complex_exp_ramp(
        jnp.uint32(0), jnp.uint32(round(0.003 * 2**32)), nn))()
    st0 = pfb_init_state(nch, 8)

    def pfb(x, st):
        y, _ = pfb_analyze(x, taps, st)
        return checksum(jnp.abs(y))

    jp = jax.jit(pfb)
    yield measure(f"pfb{nch}", lambda: jp(x0, st0), nn)

    # per-channel stages on the channelized [256, T/256] layout
    chx = jax.jit(lambda x, st: pfb_analyze(x, taps, st)[0])(x0, st0)
    from gnuradio4_tpu.utils.transfer import device_zeros
    last0 = device_zeros((nch,), jnp.complex64)
    jd = jax.jit(lambda c, l: checksum(
        quadrature_demod(c, l, gain=1.0)[0]))
    yield measure("demod_perchan", lambda: jd(chx, last0), nn)
    ataps = fd.design_fir("lowpass", 17, sample_rate=1.0,
                          f_low=0.1).astype(np.float32)
    h0 = jax.jit(lambda: fir_init_state(nch, 17, jnp.float32))()

    def audio(c, h):
        y, _ = fir_apply(jnp.real(c), ataps, h, decim=4)
        return checksum(y)

    ja = jax.jit(audio)
    yield measure("audio_perchan_d4", lambda: ja(chx, h0), nn)

    # full config-5 compiled chain, unbatched and batched
    from audit_collectives import build_config5
    cs = jax.jit(lambda t: jnp.broadcast_to(
        sum(jnp.sum(jnp.abs(v)) for ins in t.values()
            for v in ins.values()).astype(jnp.float32), (8,)))
    for S in (1, 4):
        compiled = gr.compile_graph(
            build_config5(nn, None).graph, block_len=nn, sample_rate=1e9,
            batch_steps=S) if S > 1 else build_config5(nn, None)
        states = compiled.init_states()
        params = compiled.gather_params()
        box = {"s": states}

        def call(compiled=compiled, params=params, box=box):
            box["s"], sink_ins = compiled.step(box["s"], params, {})
            return cs(sink_ins)

        yield measure(f"cfg5_chain[batch={S}]", call, nn * S,
                      wins=(4, 32) if S == 1 else (2, 16))


GROUPS = {"tone": group_tone, "fir": group_fir, "fft": group_fft,
          "firtile": group_firtile,
          "chain": group_chain, "wbfm": group_wbfm, "batch": group_batch,
          "ab": group_ab, "cfg5": group_cfg5}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", default="all")
    ap.add_argument("--n", type=int, default=1 << 23)
    ap.add_argument("--budget-s", type=float, default=600.0)
    args = ap.parse_args()
    import threading
    threading.Thread(target=lambda: (time.sleep(args.budget_s), os._exit(7)),
                     daemon=True).start()
    import jax
    try:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(here, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    if os.environ.get("GR4_BENCH_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    platform = jax.devices()[0].platform
    n = args.n if platform != "cpu" else min(args.n, 1 << 18)
    keys = list(GROUPS) if args.group == "all" else args.group.split(",")
    for key in keys:
        for rec in GROUPS[key.strip()](n):
            rec["platform"] = platform
            rec["n"] = n
            print(json.dumps(rec), flush=True)
    os._exit(0)   # wedged readback threads must not abort teardown


if __name__ == "__main__":
    sys.exit(main())
