"""Self-measuring dispatch/readback RTT for benchmarking.

The axon remote backend adds a fixed dispatch+readback cost per call
(~30 ms historically, but it drifts with the tunnel) and
``block_until_ready`` does not reliably block on it.  Every wall-clock
benchmark in this repo subtracts that RTT; hard-coding it makes every
recorded number silently shift when the tunnel changes (VERDICT r3 weak
#8).  This helper measures it per run: time N empty jitted readbacks of
an 8-byte scalar and take the median — the same dispatch+readback path
the benchmarks' single-scalar readbacks use, with ~zero device compute.

On a local backend (CPU tests, local TPU) the measured value is the true
near-zero dispatch cost, so subtracting it stays correct everywhere.
"""
import time


def measure_rtt(n=9):
    """Median wall time of an empty jitted scalar readback, in seconds."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _ping(x):
        return x + 1.0

    x = jnp.float32(0.0)
    float(_ping(x))  # compile + warm the path
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(_ping(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]
