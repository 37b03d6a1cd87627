"""Characterise the device link and raw chip speed, separately from the
pipeline (VERDICT r5 item 1: prove whether a halved night throughput is
the code or the deployment).

Measures, on the current default backend:

* D2H pull latency: per-pull wall time of a 4-byte device array
  (documented round-3/4 value on this tunnel: ~37 ms).
* D2H bandwidth: incremental wall time of an 8 MiB pull over the tiny
  pull (documented: ~16 MB/s).
* H2D push latency/bandwidth, same method.
* Device compute rate: slope-method timing (N enqueues + one tiny sync
  pull, difference of two N) of a 1024^2 bf16->f32 matmul chain — the
  MXU rate is deployment-independent, so a shifted night throughput
  with an unshifted matmul rate and shifted link numbers pins the
  regression on the link.

Prints one JSON line; append results (with a date) to
benchmarks/LINK_LOG.md.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def _sync_pull(x):
    return np.asarray(x)


def pull_stats(reps=15):
    # a FRESH device value per rep: jax Arrays cache their fetched host
    # copy, so re-pulling the same array measures nothing.  The +i add
    # is enqueued async and costs ~us of device time; the timed pull
    # carries the wait + transfer.
    tiny_d = jax.device_put(np.zeros(1, np.float32))
    big_d = jax.device_put(np.zeros(2 * 1024 * 1024, np.float32))  # 8 MiB
    add = jax.jit(lambda x, i: x + i)
    _sync_pull(add(tiny_d, 0)); _sync_pull(add(big_d, 0))   # compile
    lat, bw = [], []
    for i in range(1, reps + 1):
        y = add(tiny_d, i)
        t0 = time.perf_counter()
        _sync_pull(y)
        lat.append(time.perf_counter() - t0)
        z = add(big_d, i)
        t0 = time.perf_counter()
        _sync_pull(z)
        bw.append(time.perf_counter() - t0)
    lat_s = float(np.median(lat))
    big_s = float(np.median(bw))
    mb = big_d.size * 4 / 1e6
    return lat_s, mb / max(big_s - lat_s, 1e-9)


def push_stats(reps=15):
    tiny = np.zeros(1, np.float32)
    big = np.zeros(2 * 1024 * 1024, np.float32)   # 8 MiB
    lat, bw = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_put(tiny).block_until_ready()
        lat.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.device_put(big).block_until_ready()
        bw.append(time.perf_counter() - t0)
    lat_s = float(np.median(lat))
    big_s = float(np.median(bw))
    return lat_s, big.nbytes / 1e6 / max(big_s - lat_s, 1e-9)


from functools import partial


@partial(jax.jit, static_argnums=2)
def _mm_chain(a, b, n_steps):
    def body(c, _):
        c = jnp.dot(a + c[0, 0], b)
        return c, None
    c, _ = jax.lax.scan(body, b, None, length=n_steps)
    return c[:1, :1]


def matmul_rate():
    """Slope method: enqueue N1/N2 chained 1024^2 matmuls + one tiny
    pull; the difference isolates device time from dispatch/link."""
    a = jax.device_put(np.random.default_rng(0).standard_normal(
        (1024, 1024)).astype(np.float32))
    b = jax.device_put(np.random.default_rng(1).standard_normal(
        (1024, 1024)).astype(np.float32))

    def run(n):
        t0 = time.perf_counter()
        _sync_pull(_mm_chain(a, b, n))
        return time.perf_counter() - t0

    n_lo, n_hi = 32, 1024               # chain lengths well above the
    run(n_lo); run(n_hi)                # ~30 ms link-latency noise
    t_lo = min(run(n_lo) for _ in range(5))
    t_hi = min(run(n_hi) for _ in range(5))
    per_mm = (t_hi - t_lo) / (n_hi - n_lo)
    flops = 2 * 1024 ** 3
    return per_mm, flops / per_mm / 1e12


def main():
    dev = jax.devices()[0]
    d2h_lat, d2h_bw = pull_stats()
    h2d_lat, h2d_bw = push_stats()
    mm_s, tflops = matmul_rate()
    print(json.dumps({
        "device": str(dev),
        "d2h_latency_ms": round(d2h_lat * 1e3, 2),
        "d2h_bandwidth_MBps": round(d2h_bw, 1),
        "h2d_latency_ms": round(h2d_lat * 1e3, 2),
        "h2d_bandwidth_MBps": round(h2d_bw, 1),
        "matmul_1024_us": round(mm_s * 1e6, 1),
        "matmul_tflops_f32": round(tflops, 2),
        "documented_round3": {"d2h_latency_ms": 37.0,
                              "d2h_bandwidth_MBps": 16.0},
    }))


if __name__ == "__main__":
    main()
