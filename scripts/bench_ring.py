#!/usr/bin/env python
"""Host ring-buffer throughput: native double-mapped ring (ringbuf.cpp) vs the
pure-Python fallback vs a stdlib queue.Queue of ndarray chunks.

One producer thread, one consumer thread, float32 items. The ring paths move
data via zero-copy spans (reserve/publish + read/release); the queue path pays
one array allocation + one copy per chunk, modelling the naive approach.

Usage: python scripts/bench_ring.py [--chunk 65536] [--total-mb 512]
"""

from __future__ import annotations

import argparse
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gnuradio4_tpu.native.ring import HostRing, native_available


def bench_ring(chunk: int, total_items: int, *, force_python: bool,
               n_readers: int = 1) -> float:
    ring = HostRing(4 * chunk, np.float32, force_python=force_python)
    rids = [ring.add_reader() for _ in range(n_readers)]
    src = np.arange(chunk, dtype=np.float32)
    consumed = np.zeros(n_readers, np.int64)

    def consumer(slot: int, rid: int):
        acc = 0
        while acc < total_items:
            span = ring.read(rid, chunk)
            if len(span) == 0:
                time.sleep(5e-5)   # realistic backoff; sleep(0) = GIL thrash
                continue
            n = len(span)
            ring.release(rid, n)
            acc += n
        consumed[slot] = acc

    threads = [threading.Thread(target=consumer, args=(s, r), daemon=True)
               for s, r in enumerate(rids)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    produced = 0
    while produced < total_items:
        span = ring.reserve(min(chunk, total_items - produced))
        if len(span) == 0:
            time.sleep(5e-5)
            continue
        span[:] = src[: len(span)]
        ring.publish(len(span))
        produced += len(span)
    for t in threads:
        t.join(timeout=60)
    dt = time.perf_counter() - t0
    assert np.all(consumed == total_items), f"consumers saw {consumed}"
    return total_items * 4 / dt / 1e9  # producer GB/s (readers keep pace)


def bench_queue(chunk: int, total_items: int) -> float:
    import queue
    q: "queue.Queue[np.ndarray | None]" = queue.Queue(maxsize=4)
    src = np.arange(chunk, dtype=np.float32)
    consumed = np.zeros(1, np.int64)

    def consumer():
        acc = 0
        while True:
            item = q.get()
            if item is None:
                break
            acc += len(item)
        consumed[0] = acc

    t = threading.Thread(target=consumer, daemon=True)
    t0 = time.perf_counter()
    t.start()
    produced = 0
    while produced < total_items:
        n = min(chunk, total_items - produced)
        q.put(src[:n].copy())  # the copy is the point: queue hands off ownership
        produced += n
    q.put(None)
    t.join(timeout=60)
    dt = time.perf_counter() - t0
    assert consumed[0] == total_items
    return total_items * 4 / dt / 1e9


def bench_wakeup(strategy: str, iters: int = 2000) -> dict:
    """One-way producer→consumer wakeup latency per wait strategy.

    'block' parks in the kernel on the ring's futex epoch
    (gr4_ring_wait_readable, ≈ reference BlockingWaitStrategy
    WaitStrategy.hpp:54); 'sleep' is the 50 µs sleep-poll loop the feeder
    used before the futex path existed; 'spin' busy-polls readable().

    Each iteration: the consumer arms, waits for 1 item; the producer stamps
    t0 and publishes; the consumer stamps on wake. Reports p50/p90/max µs.
    """
    ring = HostRing(1024, np.float32)
    rid = ring.add_reader()
    armed = threading.Event()
    done = threading.Event()
    deltas = np.zeros(iters, np.int64)
    t0_ns = np.zeros(1, np.int64)

    def consumer():
        for i in range(iters):
            armed.set()
            if strategy == "block":
                ring.wait_readable(rid, 1, timeout=10.0)
            else:
                while ring.readable(rid) < 1:
                    if strategy == "sleep":
                        time.sleep(50e-6)
            deltas[i] = time.perf_counter_ns() - t0_ns[0]
            ring.release(rid, len(ring.read(rid, 1)))
            done.set()

    th = threading.Thread(target=consumer, daemon=True)
    th.start()
    one = np.ones(1, np.float32)
    for _ in range(iters):
        armed.wait(); armed.clear()
        time.sleep(200e-6)       # let the consumer actually park
        t0_ns[0] = time.perf_counter_ns()
        ring.write(one)
        done.wait(); done.clear()
    th.join(timeout=10)
    us = deltas / 1e3
    return {"strategy": strategy,
            "p50_us": round(float(np.percentile(us, 50)), 1),
            "p90_us": round(float(np.percentile(us, 90)), 1),
            "max_us": round(float(us.max()), 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--total-mb", type=int, default=512)
    args = ap.parse_args()
    total_items = args.total_mb * (1 << 20) // 4

    print(f"chunk={args.chunk} items, total={args.total_mb} MiB, "
          f"native_available={native_available()}")
    rows = []
    for nr in (1, 4):
        if native_available():
            rows.append((f"native ring, {nr} reader(s)",
                         bench_ring(args.chunk, total_items,
                                    force_python=False, n_readers=nr)))
        rows.append((f"python-fallback ring, {nr} reader(s)",
                     bench_ring(args.chunk, total_items,
                                force_python=True, n_readers=nr)))
    rows.append(("queue.Queue + per-chunk copy",
                 bench_queue(args.chunk, total_items)))
    for name, gbps in rows:
        print(f"{name:34s} {gbps:8.2f} GB/s")

    print("\nwakeup latency (producer publish → parked consumer wake):")
    for strat in ("block", "sleep", "spin"):
        r = bench_wakeup(strat)
        print(f"  {r['strategy']:6s} p50={r['p50_us']:7.1f} µs  "
              f"p90={r['p90_us']:7.1f} µs  max={r['max_us']:9.1f} µs")


if __name__ == "__main__":
    main()
