"""Persistent TPU experiment server (dev tool).

The tunneled TPU costs ~2 min of handshake per process; this server pays it
once and then executes Python snippets dropped into INBOX, writing stdout +
traceback to OUTBOX/<name>.out.  Snippets share one global namespace (G), so
params/models stay resident between experiments.

Usage:  python tools/expserver.py &         # leave running
        echo 'print(1+1)' > /tmp/exp/inbox/e01.py
        cat /tmp/exp/outbox/e01.py.out
"""
from __future__ import annotations

import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INBOX = "/tmp/exp/inbox"
OUTBOX = "/tmp/exp/outbox"
os.makedirs(INBOX, exist_ok=True)
os.makedirs(OUTBOX, exist_ok=True)

G: dict = {}


def main():
    print("expserver: warming device...", flush=True)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from yolov8_vit_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    t0 = time.time()
    float(jax.jit(lambda: jnp.zeros(()))())   # handshake
    G.update(jax=jax, jnp=jnp, np=np)
    print(f"expserver: ready on {jax.devices()[0]} "
          f"(handshake {time.time()-t0:.0f}s)", flush=True)
    with open(os.path.join(OUTBOX, "READY"), "w") as f:
        f.write(str(jax.devices()[0]))
    while True:
        files = sorted(f for f in os.listdir(INBOX) if f.endswith(".py"))
        if not files:
            time.sleep(0.5)
            continue
        name = files[0]
        path = os.path.join(INBOX, name)
        # skip very fresh files: a writer may still be streaming the
        # snippet (non-atomic writes would exec a truncated prefix).
        # Bound the wait — a future mtime (cp -p across clock skew) would
        # otherwise keep files[0] "fresh" forever and deadlock the whole
        # queue behind it with no log line.
        try:
            age = time.time() - os.path.getmtime(path)
            if 0 <= age < 0.6:
                time.sleep(0.3)
                continue
            if age < 0:
                print(f"expserver: {name} has a future mtime ({-age:.0f}s "
                      f"ahead); executing anyway", flush=True)
        except OSError:
            continue
        with open(path) as f:
            src = f.read()
        done = os.path.join(OUTBOX, "..", "done")
        os.makedirs(done, exist_ok=True)
        os.replace(path, os.path.join(done, name))
        buf = io.StringIO()
        real = sys.stdout
        sys.stdout = buf
        t0 = time.time()
        try:
            exec(compile(src, name, "exec"), G)
            status = "OK"
        except SystemExit as e:
            # snippets pasted from scripts end with sys.exit(...): report
            # it instead of killing the server (and the ~2 min handshake)
            print(f"[snippet called sys.exit({e.code})]", file=buf)
            status = "OK" if not e.code else "ERROR"
        except Exception:
            traceback.print_exc(file=buf)
            status = "ERROR"
        finally:
            sys.stdout = real
        out = buf.getvalue() + f"\n[{status} in {time.time()-t0:.1f}s]\n"
        with open(os.path.join(OUTBOX, name + ".out"), "w") as f:
            f.write(out)
        print(f"expserver: {name} -> {status}", flush=True)


if __name__ == "__main__":
    main()
