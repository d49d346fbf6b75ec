"""Host->device upload microbenchmark over the axon tunnel.

Establishes the BYTES FLOOR for upload-bound stages (the texture path
moves 1.54 MB/frame of raw sensor bytes: uint16 disparity + uint8 RGB —
models/texture.py). Measures:

  1. device_put bandwidth vs transfer size (latency + throughput fit)
  2. whether two concurrent device_put streams aggregate bandwidth
     (decides if deeper multi-buffering can beat single-stream upload)
  3. a device-side consume (sum) to force materialization — on axon,
     block_until_ready can return before real execution (CLAUDE.md), so
     each timing fetches a scalar reduction of the uploaded buffer.

Usage: python tools/upload_bench.py
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from lidar_slam_tpu.utils.profiling import devices_or_die
    devices_or_die()
    import jax.numpy as jnp
    import numpy as np

    consume = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))

    def timed_upload(mb, reps=3, seed0=0):
        n = int(mb * 1e6)
        best = np.inf
        for r in range(reps):
            # fresh VALUES each rep: the runtime memoizes value-identical
            # computations (CLAUDE.md)
            host = np.random.default_rng(seed0 + r).integers(
                0, 255, n, dtype=np.uint8)
            t0 = time.time()
            dev = jax.device_put(host)
            s = int(np.asarray(consume(dev)))
            dt = time.time() - t0
            best = min(best, dt)
            del dev, host, s
        return best

    # warm-up: compile consume + first-execution overheads at each shape
    for mb in (0.25, 1, 4, 16, 32, 64):
        timed_upload(mb, reps=1, seed0=100)

    print("size_MB  best_s   MB/s")
    results = {}
    for mb in (0.25, 1, 4, 16, 32, 64):
        dt = timed_upload(mb)
        results[mb] = dt
        print(f"{mb:7.2f}  {dt:6.3f}  {mb / dt:7.1f}")

    # latency/throughput fit from the two extremes
    b1, b2 = 1, 64
    bw = (b2 - b1) * 1e6 / (results[b2] - results[b1])
    lat = results[b1] - b1 * 1e6 / bw
    print(f"fit: latency ~{lat * 1e3:.1f} ms/transfer, "
          f"throughput ~{bw / 1e6:.0f} MB/s")
    frame_bytes = 480 * 640 * 5  # uint16 disparity + uint8 rgb
    print(f"texture floor at this link: "
          f"{frame_bytes / bw * 1e3:.1f} ms/frame streaming, "
          f"dataset-20 (2,407 frames) {frame_bytes * 2407 / bw:.0f}s")

    # concurrent streams: do 2 parallel device_puts beat one-at-a-time?
    from concurrent.futures import ThreadPoolExecutor
    mb = 16
    n = int(mb * 1e6)
    hosts = [np.random.default_rng(200 + i).integers(0, 255, n,
                                                     dtype=np.uint8)
             for i in range(4)]

    def put_consume(h):
        return int(np.asarray(consume(jax.device_put(h))))

    t0 = time.time()
    for h in hosts:
        put_consume(h)
    serial = time.time() - t0
    with ThreadPoolExecutor(max_workers=2) as ex:
        t0 = time.time()
        list(ex.map(put_consume, hosts))
        par = time.time() - t0
    print(f"4x{mb}MB serial {serial:.3f}s vs 2-thread {par:.3f}s "
          f"({serial / par:.2f}x)")


if __name__ == "__main__":
    main()
