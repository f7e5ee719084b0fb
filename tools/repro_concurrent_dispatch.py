"""Minimal repro: concurrent device dispatch from two host threads.

Round 4's BA-prewarm daemon thread (372ab77) dispatched dummy SoA-LM
solves while the mapper's init kernel ran on the main thread, and the
tunneled-v5e TPU worker crashed in-context (same fault class as the
round-3 fused-PCG demotion, e0b7a29).  JAX documents dispatch as
thread-safe, so the fault is in the backend/tunnel, not the repo — this
tool reproduces the trigger standalone: two threads hammering distinct
jitted matmul chains on the same client.

Run it LAST in a session: if the fault reproduces, the in-context
worker crash kills this process's TPU client and a fresh client pays
the remote-claim cooldown (verify skill, round-4 addenda).

Outcome on a tolerant backend (CPU, healthy GPU): prints OK.
Outcome observed on the axon-tunneled v5e: worker fault / wedge.
"""
from __future__ import annotations

import threading
import time

import jax
import jax.numpy as jnp


def _chain(mat, n):
    def body(i, x):
        return jnp.tanh(x @ mat)
    return jax.lax.fori_loop(0, n, body, mat)


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    f = jax.jit(_chain, static_argnums=1)
    a = jnp.ones((512, 512), jnp.float32) * 0.01
    b = jnp.ones((768, 768), jnp.float32) * 0.01
    # Warm both compiles serially first — the fault is concurrent
    # *dispatch*, not concurrent compile.
    jax.block_until_ready(f(a, 8))
    jax.block_until_ready(f(b, 8))
    errs = []

    def worker(mat, tag):
        try:
            for _ in range(50):
                jax.block_until_ready(f(mat, 8))
        except Exception as e:  # noqa: BLE001 — record, don't mask
            errs.append((tag, repr(e)))

    t0 = time.time()
    threads = [threading.Thread(target=worker, args=(a, "A")),
               threading.Thread(target=worker, args=(b, "B"))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    alive = [t.name for t in threads if t.is_alive()]
    if alive:
        print(f"WEDGED: threads still alive after 120 s: {alive}")
    elif errs:
        print("FAULT:", errs)
    else:
        print(f"OK: 100 concurrent dispatches in {time.time()-t0:.1f} s")


if __name__ == "__main__":
    main()
