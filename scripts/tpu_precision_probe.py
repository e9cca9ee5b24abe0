"""Measure ACTUAL on-chip error of each matmul-precision rung against f64.

The on-chip suite diagnosis (docs/TPU_DIAGNOSIS.json) shows every
matmul-equivalence test failing at f32 tolerances while the SNR-contract
tests pass — consistent with TPU dot semantics (DEFAULT = bf16 inputs)
leaking into test-side ``@`` and the HIGH rung being coarser on this chip
than the CPU emulation suggests. This probe prints the measured relative
error of einsum at DEFAULT/HIGH/HIGHEST and of the library paths the
failing tests exercise (FIR matmul 'high', matmul_fft 'high', Jacobi SVD
reconstruction at both default-precision settings).

Run in a FRESH process (a failed call poisons the PJRT client).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    budget = float(os.environ.get("GR4_BENCH_CHILD_BUDGET_S", "420"))
    threading.Thread(target=lambda: (time.sleep(budget), os._exit(7)),
                     daemon=True).start()
    import jax
    if os.environ.get("GR4_BENCH_FORCE_CPU") == "1":
        # the axon plugin overrides JAX_PLATFORMS from the environment; only
        # an explicit config update reaches the CPU backend
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from gnuradio4_tpu.utils.transfer import host_array

    rng = np.random.default_rng(0)
    out: dict = {"platform": jax.devices()[0].platform}

    a = rng.standard_normal((256, 128)).astype(np.float32)
    b = rng.standard_normal((128, 128)).astype(np.float32)
    ref = a.astype(np.float64) @ b.astype(np.float64)

    def rel(y):
        y = host_array(y).astype(np.float64)
        return float(np.max(np.abs(y - ref)) / np.max(np.abs(ref)))

    for prec in ("default", "high", "highest"):
        p = {"default": jax.lax.Precision.DEFAULT,
             "high": jax.lax.Precision.HIGH,
             "highest": jax.lax.Precision.HIGHEST}[prec]
        y = jax.jit(lambda a, b, p=p: jnp.einsum(
            "ij,jk->ik", a, b, precision=p))(a, b)
        out[f"einsum_{prec}_relerr"] = rel(y)

    # FIR matmul path at its default 'high' rung vs numpy (the failing
    # test_fir_methods contract: atol = ntaps*3e-6)
    from gnuradio4_tpu.ops.fir import fir_apply, fir_init_state
    taps = rng.standard_normal(127).astype(np.float32)
    x = rng.standard_normal(2048).astype(np.float32)
    fref = np.convolve(x.astype(np.float64), taps)[: len(x)]
    for mode in ("high", "highest"):
        y, _ = jax.jit(lambda x, mode=mode: fir_apply(
            x, taps,                      # host taps: matmul path contract
            fir_init_state(0, 127, jnp.float32), method="matmul",
            precision=mode))(x)
        out[f"fir_matmul_{mode}_abserr"] = float(
            np.max(np.abs(host_array(y).astype(np.float64) - fref)))

    # matmul FFT 'high' SNR vs f64 DFT (docs claim >120 dB)
    from gnuradio4_tpu.ops.fft import matmul_fft
    xc = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096))
    Xref = np.fft.fft(xc)
    xr = xc.real.astype(np.float32)
    xi = xc.imag.astype(np.float32)
    for mode in ("high", "bf16"):
        # complex H2D is UNIMPLEMENTED on the relay: assemble on device
        X = jax.jit(lambda r, i, mode=mode: matmul_fft(
            jax.lax.complex(r, i), 4096, mode=mode))(xr, xi)
        Xh = host_array(jnp.stack([jnp.real(X), jnp.imag(X)]))
        Xh = Xh[0].astype(np.float64) + 1j * Xh[1].astype(np.float64)
        snr = 10 * np.log10(np.sum(np.abs(Xref) ** 2)
                            / max(np.sum(np.abs(Xh - Xref) ** 2), 1e-30))
        out[f"matmul_fft_{mode}_snr_db"] = round(float(snr), 1)

    # Jacobi SVD reconstruction: op-side error with the test's @ at
    # default precision vs pinned-highest
    from gnuradio4_tpu.ops.svd import jacobi_svd
    m = rng.standard_normal((48, 16)).astype(np.float32)
    u, s, vt = jax.jit(jacobi_svd)(jnp.asarray(m))
    for prec in ("default", "highest"):
        p = {"default": jax.lax.Precision.DEFAULT,
             "highest": jax.lax.Precision.HIGHEST}[prec]
        rec = jax.jit(lambda u, s, vt, p=p: jnp.einsum(
            "ij,jk->ik", u * s[None, :], vt, precision=p))(u, s, vt)
        out[f"svd_recon_{prec}_maxerr"] = float(
            np.max(np.abs(host_array(rec).astype(np.float64) - m)))

    print(json.dumps(out), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
