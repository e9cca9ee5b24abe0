"""Scaling-efficiency harness: the sharded wideband RX step at 1..N devices.

On a real pod slice this measures the BASELINE "N-host scaling efficiency"
number; on this box it runs over virtual CPU devices (set
XLA_FLAGS=--xla_force_host_platform_device_count=N) to exercise the harness and
the collectives. Prints one JSON line per mesh size + a final efficiency line.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_scaling.py --channels 64 --block 65536 [--cpu]

Multi-host (real pods / localhost rehearsal): every host runs the same command
with its own --process-id; the mesh spans all processes (DCN over the 'host'
boundary) and throughput is measured on the global step:
  python bench_scaling.py --multihost --coordinator 10.0.0.1:9911 \
      --num-processes 4 --process-id $ID
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def measure(n_devices: int, channels: int, block_len: int, steps: int) -> float:
    import jax
    import jax.numpy as jnp
    from gnuradio4_tpu.parallel.mesh import make_mesh
    from gnuradio4_tpu.parallel.sharded_rx import (ShardedRxConfig,
                                                   build_sharded_rx)
    devs = jax.devices()[:n_devices]
    dp = 1
    sp = n_devices
    mesh = make_mesh(shape=(dp, sp), axes=("dp", "sp"), devices=devs)
    cfg = ShardedRxConfig(n_channels=channels, taps_per_phase=8, audio_decim=4,
                          audio_ntaps=32, batch=dp,
                          block_len=block_len)
    step, init_state, x_sharding = build_sharded_rx(mesh, cfg)
    x = np.zeros((cfg.batch, cfg.block_len), np.complex64)
    x[:, :] = np.exp(2j * np.pi * 0.11 * np.arange(cfg.block_len))[None]
    if jax.process_count() > 1:
        # every process computes the full block; contribute the local time slice
        npz, pidx = jax.process_count(), jax.process_index()
        tl = cfg.block_len // npz
        xd = jax.make_array_from_process_local_data(
            x_sharding, np.ascontiguousarray(x[:, pidx * tl:(pidx + 1) * tl]),
            x.shape)
    else:
        xd = jax.device_put(jnp.asarray(x), x_sharding)
    state = init_state()
    state, audio, power = step(state, xd)
    jax.block_until_ready(audio)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, audio, power = step(state, xd)
    jax.block_until_ready(audio)
    dt = time.perf_counter() - t0
    return steps * cfg.block_len * cfg.batch / dt / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--block", type=int, default=1 << 16)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed and bench the global mesh")
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (multihost)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.multihost:
        from gnuradio4_tpu.parallel.multihost import init_distributed
        if not init_distributed(args.coordinator, args.num_processes,
                                args.process_id):
            print(json.dumps({"error": "jax.distributed init failed"}))
            return 1
    import jax
    n_avail = len(jax.devices())
    if args.multihost:
        # one measurement over the full global mesh; every process runs it
        msps = measure(n_avail, args.channels, args.block, args.steps)
        print(json.dumps({"devices": n_avail,
                          "processes": jax.process_count(),
                          "process_id": jax.process_index(),
                          "msps": round(msps, 1),
                          "platform": jax.devices()[0].platform}), flush=True)
        return 0
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail
             and args.channels % n == 0]
    results = {}
    for n in sizes:
        msps = measure(n, args.channels, args.block, args.steps)
        results[n] = msps
        print(json.dumps({"devices": n, "msps": round(msps, 1),
                          "platform": jax.devices()[0].platform}), flush=True)
    if len(results) > 1:
        base = results[sizes[0]]
        eff = {n: round(results[n] / (base * n / sizes[0]), 3) for n in sizes}
        print(json.dumps({"scaling_efficiency_vs_1dev": eff}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
