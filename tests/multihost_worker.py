"""Multi-host worker: runs an sp-sharded Graph through the Scheduler as one
process of a jax.distributed (Gloo/CPU) cluster and verifies its local shard
bit-matches the numpy reference. Spawned by test_multihost.py — not a test.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.blocks.filter import FirFilter
    from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource
    from gnuradio4_tpu.parallel.multihost import global_mesh

    mesh = global_mesh(axes=("sp",))
    n_total = len(jax.devices())
    assert mesh.shape["sp"] == n_total

    rng = np.random.default_rng(11)
    n = 8192
    x = rng.standard_normal(n).astype(np.float32)
    taps = (np.hamming(31) / np.hamming(31).sum()).astype(np.float32)

    g = gr.Graph()
    src = VectorSource(x)
    fir = FirFilter(taps=taps)
    snk = VectorSink()
    g.connect_chain(src, fir, snk)
    sched = gr.Scheduler(g, block_len=n // 2, mesh=mesh, pipeline_depth=1)
    sched.run_and_wait()
    local = snk.data()

    # round-5: the SAME chain with step batching — global feeds are stacked
    # [S, ...] before _globalize_feeds; both processes must agree
    g2 = gr.Graph()
    src2 = VectorSource(x)
    fir2 = FirFilter(taps=taps)
    snk2 = VectorSink()
    g2.connect_chain(src2, fir2, snk2)
    gr.Scheduler(g2, block_len=n // 4, mesh=mesh, pipeline_depth=1,
                 batch_steps=2).run_and_wait()
    local_b = snk2.data()

    # numpy reference, then this process's per-step local slices
    ref = np.convolve(x, taps)[:n].astype(np.float32)
    t_step = n // 2
    t_loc = t_step // nproc
    expect = np.concatenate([
        ref[s * t_step + pid * t_loc: s * t_step + (pid + 1) * t_loc]
        for s in range(2)])
    assert local.shape == expect.shape, (local.shape, expect.shape)
    err = float(np.max(np.abs(local - expect)))
    assert err < 1e-5, f"process {pid}: max err {err}"

    t_step_b = n // 4
    t_loc_b = t_step_b // nproc
    expect_b = np.concatenate([
        ref[s * t_step_b + pid * t_loc_b: s * t_step_b + (pid + 1) * t_loc_b]
        for s in range(4)])
    assert local_b.shape == expect_b.shape, (local_b.shape, expect_b.shape)
    err_b = float(np.max(np.abs(local_b - expect_b)))
    assert err_b < 1e-5, f"process {pid} (batched): max err {err_b}"
    print(f"[{pid}] OK shard={local.shape} err={err:.2e} "
          f"batched_err={err_b:.2e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
