"""Persistent TPU experiment server.

The tunneled relay charges a multi-minute staging cost to EVERY process's
first device fetch, which makes one-shot experiment scripts impractical.
This server pays it once: it warms the device, then watches /tmp/tpu_repl_cmd/
for numbered python files, execs each in a shared namespace, and appends
stdout + errors to /tmp/tpu_repl.log.  Drop `NN.py` files in; `poison.py`
containing `QUIT = True` shuts it down.

Usage:
    nohup python tools/tpu_repl.py & echo $! > /tmp/tpu_repl.pid
    # wait for "warm" in /tmp/tpu_repl.log (~5 min staging), then drop files

Measured fetch-strategy baseline (v5e behind the axon relay, tiny [16,6]
payload, medians of 20): blocking np.asarray 24.6 ms, device_get 26.1 ms,
bg-thread asarray 25.1 ms, is_ready+0.5ms-sleep poll 49.2 ms, dispatch
0.01 ms.  Conclusion: every device->host fetch pays a ~25 ms round-trip
floor regardless of strategy; sleep-polling roughly doubles it (each
is_ready probe is itself a relay round trip when not ready).  Dispatch is
free — all overlap must come from hiding the fetch behind host work, never
from a cheaper fetch primitive.
"""

import io
import os
import sys
import time
import traceback

CMD_DIR = "/tmp/tpu_repl_cmd"
LOG = "/tmp/tpu_repl.log"
os.makedirs(CMD_DIR, exist_ok=True)


def log(msg):
    with open(LOG, "a") as f:
        f.write(msg + "\n")


def main():
    t0 = time.monotonic()
    log(f"=== server starting pid={os.getpid()} ===")
    import numpy as np  # noqa
    import jax  # noqa
    import jax.numpy as jnp  # noqa

    sys.path.insert(0, "/root/repo")
    from pointcloud_rl_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    jax.devices()
    log(f"[{time.monotonic()-t0:.0f}s] devices ok: {jax.devices()}")
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    np.asarray(f(jnp.zeros((16, 6), jnp.float32)))
    log(f"[{time.monotonic()-t0:.0f}s] warm (first fetch paid); watching {CMD_DIR}")

    ns = {"np": np, "jax": jax, "jnp": jnp, "time": time}
    seen = set()
    while True:
        files = sorted(fn for fn in os.listdir(CMD_DIR) if fn.endswith(".py") and fn not in seen)
        for fn in files:
            seen.add(fn)
            path = os.path.join(CMD_DIR, fn)
            with open(path) as fh:
                src = fh.read()
            log(f"--- exec {fn} [{time.monotonic()-t0:.0f}s] ---")
            buf = io.StringIO()
            old = sys.stdout
            sys.stdout = buf
            try:
                exec(compile(src, fn, "exec"), ns)
            except Exception:
                traceback.print_exc(file=buf)
            finally:
                sys.stdout = old
            log(buf.getvalue().rstrip())
            log(f"--- done {fn} ---")
            if ns.pop("QUIT", False):
                log("=== server exiting ===")
                return
        time.sleep(0.5)


if __name__ == "__main__":
    main()
