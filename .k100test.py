import numpy as np, time, jax
import polars_ols_tpu as pot
from polars_ols_tpu import col
from polars_ols_tpu.ops.rolling import solve_rolling_ols
from polars_ols_tpu.ops.recursive import solve_recursive_least_squares
import jax.numpy as jnp

rng = np.random.default_rng(0)
R, K = 10_240, 100
Xp = jax.device_put(rng.normal(size=(1, R, K)))
yp = jax.device_put(rng.normal(size=(1, R)))
vp = jax.device_put(np.ones((1, R), dtype=bool))
for chunk in (512, 128, 64):
    try:
        t0 = time.perf_counter()
        out = solve_rolling_ols(Xp, yp, vp, window=252, min_periods=None, alpha=0.0, positional=True, chunk=chunk)
        s = float(np.asarray(out[0, -1]).sum())
        print(f"rolling chunk={chunk}: ok {time.perf_counter()-t0:.1f}s sum={s:.3f}", flush=True)
        break
    except Exception as e:
        print(f"rolling chunk={chunk}: FAIL {str(e)[:90]}", flush=True)
for chunk in (512, 128, 64):
    try:
        t0 = time.perf_counter()
        out = solve_recursive_least_squares(Xp, yp, vp, half_life=252.0, initial_state_covariance=10.0, initial_state_mean=None, chunk=chunk)
        s = float(np.asarray(out[0, -1]).sum())
        print(f"rls chunk={chunk}: ok {time.perf_counter()-t0:.1f}s sum={s:.3f}", flush=True)
        break
    except Exception as e:
        print(f"rls chunk={chunk}: FAIL {str(e)[:90]}", flush=True)
print("DONE", flush=True)
