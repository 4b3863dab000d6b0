"""Probe the axon tunnel's H2D/D2H latency+bandwidth shape.

Questions this answers (round-3 perf work):
  1. Is device_put per-call latency-bound (so packing K batches into one
     transfer wins) or bandwidth-bound?
  2. Does a dict device_put pay one RPC per leaf or one total?
  3. What does a D2H fetch cost vs size (pred-fetch batching win)?
  4. What does a jitted dispatch cost with and without fetching?
"""
import time

import jax
import numpy as np


def force(x):
    # block_until_ready lies on axon; fetch one element
    jax.tree_util.tree_map(lambda a: np.asarray(a.addressable_shards[0].data)[:1]
                           if hasattr(a, "addressable_shards") else None, x)


def t(fn, reps=5):
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("platform:", jax.devices()[0].platform, jax.devices()[0])

    # --- H2D single array, varying size
    for mb in (0.125, 0.5, 2.3, 8, 32):
        n = int(mb * 1e6 / 4)
        a = np.random.default_rng(0).integers(0, 1 << 30, n).astype(np.int32)

        def put():
            x = jax.device_put(a)
            _ = np.asarray(x[:1])

        s = t(put)
        print(f"H2D 1x{mb:6.3f}MB: {s*1e3:7.1f} ms  {mb/s:8.1f} MB/s")

    # --- H2D as k separate arrays totaling 2.3MB (simulates the batch dict)
    for k in (1, 3, 6, 12):
        n = int(2.3e6 / 4 / k)
        arrs = [np.random.default_rng(i).integers(0, 1 << 30, n).astype(np.int32)
                for i in range(k)]

        def putk():
            xs = [jax.device_put(a) for a in arrs]
            for x in xs:
                _ = np.asarray(x[:1])

        s = t(putk)
        print(f"H2D {k:2d}x{2.3/k:5.2f}MB (list, separate puts): {s*1e3:7.1f} ms")

    # --- H2D one dict device_put with k leaves
    for k in (3, 6):
        n = int(2.3e6 / 4 / k)
        d = {f"a{i}": np.random.default_rng(i).integers(0, 1 << 30, n).astype(np.int32)
             for i in range(k)}

        def putd():
            x = jax.device_put(d)
            for v in x.values():
                _ = np.asarray(v[:1])

        s = t(putd)
        print(f"H2D dict of {k} leaves (one device_put): {s*1e3:7.1f} ms")

    # --- D2H fetch, varying size
    for mb in (0.128, 0.512, 2, 8):
        n = int(mb * 1e6 / 4)
        x = jax.device_put(np.zeros(n, np.float32))
        _ = np.asarray(x[:1])

        def get():
            _ = np.asarray(x)

        s = t(get)
        print(f"D2H {mb:6.3f}MB: {s*1e3:7.1f} ms  {mb/s:8.1f} MB/s")

    # --- dispatch cost: jitted add on resident 2.3MB, no fetch vs fetch
    x = jax.device_put(np.zeros(int(2.3e6 / 4), np.float32))
    f = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(f(x)[:1])

    def disp_nofetch():
        y = x
        for _ in range(10):
            y = f(y)
        _ = np.asarray(y[:1])

    s = t(disp_nofetch)
    print(f"dispatch 10x jitted add (1 final fetch): {s*1e3:7.1f} ms "
          f"({s/10*1e3:.1f} ms/step)")

    def disp_fetch():
        for _ in range(10):
            _ = np.asarray(f(x)[:1])

    s = t(disp_fetch)
    print(f"dispatch 10x jitted add (fetch each): {s*1e3:7.1f} ms "
          f"({s/10*1e3:.1f} ms/step)")

    # --- overlap: can H2D and D2H proceed concurrently from 2 threads?
    import threading
    a = np.random.default_rng(0).integers(0, 1 << 30, int(2.3e6 / 4)).astype(np.int32)
    big = jax.device_put(np.zeros(int(2.3e6 / 4), np.float32))
    _ = np.asarray(big[:1])

    def h2d_many():
        for _ in range(8):
            x = jax.device_put(a)
            _ = np.asarray(x[:1])

    def d2h_many():
        for _ in range(8):
            _ = np.asarray(big)

    s1 = t(h2d_many, reps=2)
    s2 = t(d2h_many, reps=2)

    def both():
        th = threading.Thread(target=d2h_many)
        th.start()
        h2d_many()
        th.join()

    s3 = t(both, reps=2)
    print(f"8x H2D alone {s1*1e3:.0f} ms; 8x D2H alone {s2*1e3:.0f} ms; "
          f"concurrently {s3*1e3:.0f} ms (serial would be {(s1+s2)*1e3:.0f})")


if __name__ == "__main__":
    main()
