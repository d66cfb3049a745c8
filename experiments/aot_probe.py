"""Cold-start mitigation probes (VERDICT r4 task 3).

The persistent compile cache writes but its warm LOAD hangs on this backend
(NOTES round 3). Never-tried alternatives probed here:

  1. executable serialization: jax.experimental.serialize_executable
     (pickle a Compiled, unpickle + run in a fresh process)
  2. server-side compile memoization: does a FRESH process compiling the
     byte-identical program get a fast remote compile?

Each phase runs under its own timeout so a backend hang cannot eat the
session. Usage:
    python experiments/aot_probe.py            # orchestrates subprocesses
    python experiments/aot_probe.py child_ser  # (internal)
    python experiments/aot_probe.py child_rec  # (internal)
"""
import subprocess
import sys
import time

MARKER_K = 37  # unusual shape so no earlier session warmed it


def build():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    import numpy as np

    def fit(X, y, alpha):
        XtX = X.T @ X + alpha * jnp.eye(X.shape[1], dtype=jnp.float64)
        L = jnp.linalg.cholesky(XtX)
        beta = jax.scipy.linalg.cho_solve((L, True), X.T @ y)
        return X @ beta

    X = jnp.asarray(np.random.default_rng(0).normal(size=(4096, MARKER_K)))
    y = jnp.asarray(np.random.default_rng(1).normal(size=4096))
    return jax.jit(fit), (X, y, 0.1)


def child_ser():
    """Phase 1 child: compile, serialize, deserialize in-process, run."""
    import numpy as np

    f, args = build()
    t0 = time.time()
    lowered = f.lower(*args)
    compiled = lowered.compile()
    print(f"compile: {time.time() - t0:.1f}s", flush=True)
    from jax.experimental import serialize_executable as se

    t0 = time.time()
    payload, in_tree, out_tree = se.serialize(compiled)
    print(f"serialize: {time.time() - t0:.2f}s bytes={len(payload)}", flush=True)
    with open("/tmp/aot_exec.bin", "wb") as fh:
        fh.write(payload)
    t0 = time.time()
    compiled2 = se.deserialize_and_load(payload, in_tree, out_tree)
    print(f"deserialize: {time.time() - t0:.2f}s", flush=True)
    t0 = time.time()
    out = compiled2(*args)
    np.asarray(out[:1])
    print(f"run-deserialized: {time.time() - t0:.2f}s OK", flush=True)


def child_rec():
    """Phase 2 child: fresh process, compile the SAME program, time it."""
    f, args = build()
    t0 = time.time()
    f.lower(*args).compile()
    print(f"fresh-process recompile: {time.time() - t0:.1f}s", flush=True)


def main():
    for name, timeout in (("child_ser", 420), ("child_rec", 300)):
        print(f"--- {name} (timeout {timeout}s)")
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, __file__, name],
                timeout=timeout,
                capture_output=True,
                text=True,
            )
            print(r.stdout)
            if r.returncode != 0:
                print(f"rc={r.returncode}\n{r.stderr[-2000:]}")
        except subprocess.TimeoutExpired as e:
            print(f"TIMED OUT after {time.time() - t0:.0f}s")
            if e.stdout:
                print(e.stdout if isinstance(e.stdout, str) else e.stdout.decode())


if __name__ == "__main__":
    if len(sys.argv) > 1:
        {"child_ser": child_ser, "child_rec": child_rec}[sys.argv[1]]()
    else:
        main()
