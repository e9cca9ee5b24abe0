"""Multi-host failure-semantics worker (VERDICT r2 #4): process 1 dies
mid-run; process 0's Scheduler must fail FAST and DIAGNOSABLY — either the
wedged collective is flagged by the watchdog (watchdog_action='error' →
ERROR state + collective-timeout GrError) or the collective itself raises —
never a silent hang. Spawned by test_multihost.py.

Usage: python multihost_failure_worker.py <process_id> <num_processes> <port>
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid,
                               initialization_timeout=60)

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import gnuradio4_tpu as gr
    from gnuradio4_tpu.blocks.filter import FirFilter
    from gnuradio4_tpu.blocks.testing import VectorSink, VectorSource
    from gnuradio4_tpu.core.errors import GrError
    from gnuradio4_tpu.parallel.multihost import global_mesh

    mesh = global_mesh(axes=("sp",))
    rng = np.random.default_rng(3)
    block = 2048
    n_steps = 400                       # long stream: survivor must not finish
    x = rng.standard_normal(block * n_steps).astype(np.float32)
    taps = (np.hamming(31) / np.hamming(31).sum()).astype(np.float32)

    g = gr.Graph()
    src = VectorSource(x)
    fir = FirFilter(taps=taps)         # sp halo exchange → ppermute collective
    snk = VectorSink()
    g.connect_chain(src, fir, snk)

    if pid == 1:
        # run a couple of steps so both processes are mid-stream, then DIE
        sched = gr.Scheduler(g, block_len=block, mesh=mesh, pipeline_depth=1)
        sched.init()
        sched.fsm.transition_to(gr.State.RUNNING) if hasattr(gr, "State") \
            else None
        for _ in range(3):
            sched.step_once()
        print(f"[{pid}] dying abruptly mid-run", flush=True)
        os._exit(17)

    # survivor: watchdog must escalate within its timeout
    sched = gr.Scheduler(g, block_len=block, mesh=mesh, pipeline_depth=1,
                         watchdog_timeout=3.0, watchdog_action="error")
    t0 = time.monotonic()
    sched.start()
    deadline = t0 + 90.0
    while time.monotonic() < deadline:
        try:
            sched.wait_done(timeout=2.0)
            # a clean finish before the peer died enough steps in would be a
            # test-setup failure — the stream is 400 steps on purpose
            print(f"[{pid}] UNEXPECTED-CLEAN-FINISH", flush=True)
            return 2
        except TimeoutError:
            continue
        except GrError as e:
            dt = time.monotonic() - t0
            print(f"[{pid}] GOT-ERROR after {dt:.1f}s: {e}", flush=True)
            # hard-exit: the interpreter's jax.distributed shutdown barrier
            # would block/raise on the dead peer (and a pump thread may be
            # wedged in Gloo) — the verdict is already on stdout
            os._exit(0)
        except Exception as e:   # collective raised directly
            dt = time.monotonic() - t0
            print(f"[{pid}] GOT-ERROR after {dt:.1f}s: "
                  f"{type(e).__name__}: {e}", flush=True)
            os._exit(0)
    print(f"[{pid}] HUNG — no error within 90s", flush=True)
    os._exit(3)


if __name__ == "__main__":
    sys.exit(main())
