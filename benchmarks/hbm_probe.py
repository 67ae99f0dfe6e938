"""Effective HBM bandwidth probe.

Measures sustained device memory read bandwidth with a big int8 reduction
(reads N bytes, writes nothing significant) and a bf16 copy (read+write).
Interprets the flagship decode step cost against it: the beam step reads
~0.8 GB of int8 weights + ~0.5 GB of KV cache per token; if the measured
bandwidth says that takes ~10 ms, the decode loop is already at the memory
roofline of this (possibly virtualized) chip and further kernel work is
pointless; if it says ~2 ms, there is fusion/overhead headroom to chase.

Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    GB = 1 << 30
    size = int(float(os.environ.get("HBM_PROBE_GB", "4")) * GB)
    x8 = jnp.ones((size,), jnp.int8)
    x16 = jnp.ones((size // 4,), jnp.bfloat16)  # size/2 bytes

    # NOTE: through the axon relay, block_until_ready does not reliably wait
    # for execution — only a device→host transfer forces a full sync. Every
    # timed iteration therefore fetches a scalar, and the relay round-trip
    # baseline (no-op fetch) is measured and subtracted.
    read_fn = jax.jit(lambda a: jnp.sum(a.astype(jnp.int32)))
    # True copy bandwidth: materialize a same-size output (reads size/2
    # bytes, writes size/2 bytes) and sync by fetching one element. A fused
    # multiply-reduce would read-only and report ~2x inflated "copy" numbers.
    copy_fn = jax.jit(lambda a: a * jnp.bfloat16(1.0000305))
    noop_fn = jax.jit(lambda a: a + 1)
    rtt_probe = jnp.zeros((), jnp.int32)

    def timed(fn, a, iters=8):
        out = fn(a)  # compile + warm
        np.asarray(out.ravel()[0] if out.ndim else out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(a)
            # Device→host fetch of one element forces full execution through
            # the relay (block_until_ready alone does not, see NOTE above).
            np.asarray(out.ravel()[0] if out.ndim else out)
        return (time.perf_counter() - t0) / iters

    t_rtt = timed(noop_fn, rtt_probe, iters=16)

    t_read = max(timed(read_fn, x8) - t_rtt, 1e-6)
    t_copy = max(timed(copy_fn, x16) - t_rtt, 1e-6)
    read_bw = size / t_read / GB
    copy_bw = (2 * (size // 2)) / t_copy / GB  # reads size/2 + writes size/2
    step_bytes = 1.3e9  # flagship decode step: int8 weights + KV traffic
    print(
        json.dumps(
            {
                "rtt_s": round(t_rtt, 4),
                "read_GBps": round(read_bw, 1),
                "copy_GBps": round(copy_bw, 1),
                "t_read_s": round(t_read, 4),
                "t_copy_s": round(t_copy, 4),
                "implied_decode_step_ms_at_read_bw": round(1e3 * step_bytes / (read_bw * GB), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
