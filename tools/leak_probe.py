"""Host-RSS leak probe for the TPU tunnel client.

Round-4's canonical quality gate died from a host OOM at 130 GB RSS —
~35 MB leaked per training iteration (3560 iters across two arms).  The
per-iteration host work is: assemble a fresh ~35 MB numpy batch,
device_put it, run a step, fetch scalars.  This probe isolates which of
those legs leaks host memory on the axon backend:

  A. re-put the SAME host buffer         (transfer-buffer leak?)
  B. put a FRESH host buffer every iter  (per-buffer pinning?)
  C. fetch a large device output         (device->host path?)

Run: timeout 1800 python tools/leak_probe.py
"""

import time

import numpy as np


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return -1.0


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), "start RSS", rss_gb(),
          flush=True)

    @jax.jit
    def step(x):
        return jnp.sum(x) * 1.0001

    @jax.jit
    def big_out(x):
        return x * 2.0

    mb36 = np.random.default_rng(0).random((512, 512, 36), np.float32)
    float(step(mb36))
    _ = np.asarray(big_out(mb36[..., :8]))
    print("after compile RSS", rss_gb(), flush=True)

    n = 60
    r0 = rss_gb()
    t0 = time.perf_counter()
    for i in range(n):
        float(step(jax.device_put(mb36)))
    dt = time.perf_counter() - t0
    print(f"A same-buffer x{n}: RSS {r0:.2f} -> {rss_gb():.2f} GB "
          f"({(rss_gb() - r0) * 1e3 / n:.1f} MB/iter, {dt / n * 1e3:.0f} "
          f"ms/iter)", flush=True)

    r0 = rss_gb()
    t0 = time.perf_counter()
    for i in range(n):
        fresh = mb36 + np.float32(i)
        float(step(jax.device_put(fresh)))
    dt = time.perf_counter() - t0
    print(f"B fresh-buffer x{n}: RSS {r0:.2f} -> {rss_gb():.2f} GB "
          f"({(rss_gb() - r0) * 1e3 / n:.1f} MB/iter, {dt / n * 1e3:.0f} "
          f"ms/iter)", flush=True)

    r0 = rss_gb()
    t0 = time.perf_counter()
    small = mb36[..., :8]
    for i in range(n):
        _ = np.asarray(big_out(small))
    dt = time.perf_counter() - t0
    print(f"C big-fetch x{n}:   RSS {r0:.2f} -> {rss_gb():.2f} GB "
          f"({(rss_gb() - r0) * 1e3 / n:.1f} MB/iter, {dt / n * 1e3:.0f} "
          f"ms/iter)", flush=True)


if __name__ == "__main__":
    main()
