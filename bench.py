"""Headline benchmark: grouped-OLS throughput per chip.

Runs the engine's north-star workload (BASELINE.json): grouped ordinary
least squares fit + predict over many groups, end-to-end through the
expression API (host layout + device solve + fetch), on whatever backend
JAX selects (the real TPU chip under the driver).

Baseline: the reference polars_ols sustains ~10.3M rows/s/core on its
n=2,000 x k=5 OLS-QR benchmark (BASELINE.md, README.md:217). We use the
same K=5 shape scaled to 8M rows across 10k groups — the reference would
dispatch 10k rayon plugin calls for this; the TPU engine runs one batched
program.

Two numbers are measured and reported in ONE JSON line:

* ``materialized`` (the headline ``value``): every query's output column is
  fully materialized in row order on device — the conservative reading of
  the BASELINE gate (includes the [N]-element permutation out of the
  engine's group-block layout, fused into the query program).
* ``lazy``: the engine's default columnar output — block-ordered values
  with a deferred row-order permutation (series.BlockPermuted) that
  reductions/joins/slices never need to pay.

Protocol: batches of back-to-back queries (a serving pipeline), one sync
per batch — the device executes programs in order, so fetching a tail
slice of the LAST query's output (which depends on every group's moments
and coefficients) bounds the whole batch. min-of-7 batches (the tunnel's
run-to-run variance reaches +-50%; the minimum estimates the device
program cost).
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

import numpy as np

N_ROWS = 8_000_000
N_FEATURES = 5
N_GROUPS = 10_000
REFERENCE_ROWS_PER_S = 10.3e6  # polars_ols OLS-QR @ k=5 (BASELINE.md)
BATCH = 4
REPS = 7


def _measure(df, expr, sync):
    def run():
        return df.select(expr)

    sync(run())  # compile + warm layout caches
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        outs = [run() for _ in range(BATCH)]
        sync(outs[-1])  # device executes in order: last done => all done
        times.append((time.perf_counter() - t0) / BATCH)
    return float(np.min(times)), float(np.median(times))


def _backend_reachable(attempts: int = 5, probe_timeout_s: int = 120) -> bool:
    """The axon tunnel can die such that jax.devices() hangs forever (no
    error). Probe in a subprocess with a timeout so a dead tunnel yields an
    honest failure line instead of hanging the harness; retry a few times
    in case the outage is a blip."""
    probe = "import jax; jax.devices(); print('ok')"
    for i in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=probe_timeout_s,
                capture_output=True,
                text=True,
            )
            if out.returncode == 0 and "ok" in out.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if i < attempts - 1:
            time.sleep(60)
    return False


def _last_recorded_result() -> dict | None:
    """Most recent successful BENCH_r*.json artifact next to this script —
    context for an unreachable-backend report, NOT this run's result."""
    def round_number(path: pathlib.Path) -> int:
        digits = "".join(c for c in path.stem if c.isdigit())
        return int(digits) if digits else -1

    here = pathlib.Path(__file__).resolve().parent
    for path in sorted(here.glob("BENCH_r*.json"), key=round_number, reverse=True):
        try:
            rec = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if rec.get("parsed", {}).get("value"):
            return {"artifact": path.name, **rec["parsed"]}
        if rec.get("value"):
            return {"artifact": path.name, **rec}
    return None


def main() -> None:
    if not _backend_reachable():
        report = {
            "metric": "grouped_ols_rows_per_s_per_chip_materialized",
            "value": 0,
            "unit": "rows/s",
            "vs_baseline": 0.0,
            "error": "accelerator backend unreachable: jax device "
            "enumeration hung past the probe timeout on 5 attempts. "
            "This is an environment outage (the remote-device tunnel "
            "drops for hours at a time), not an engine failure — rerun "
            "when device enumeration responds.",
        }
        last = _last_recorded_result()
        if last is not None:
            # the same workload measured on-chip in an earlier round —
            # context only, NOT this run's result
            report["last_recorded_onchip"] = last
        print(json.dumps(report))
        return
    import polars_ols_tpu as pot
    from polars_ols_tpu import CONFIG

    rng = np.random.default_rng(0)
    x = rng.normal(size=(N_ROWS, N_FEATURES))
    y = x.sum(axis=1) + rng.normal(size=N_ROWS) * 0.1
    g = rng.integers(N_GROUPS, size=N_ROWS).astype(float)
    df = pot.DataFrame(
        {"y": y, **{f"x{i + 1}": x[:, i] for i in range(N_FEATURES)}, "group": g}
    )
    features = [pot.col(f"x{i + 1}") for i in range(N_FEATURES)]
    expr = pot.col("y").least_squares.ols(*features).over("group")

    # --- materialized: row-order output fused into the query program ---
    CONFIG.lazy_row_order = False

    def sync_mat(out):
        return np.asarray(out["y"].values[-4:])

    mat_min, mat_med = _measure(df, expr, sync_mat)

    # --- lazy: deferred row-order permutation (columnar default) ---
    CONFIG.lazy_row_order = True

    def sync_lazy(out):
        return out["y"].tail(4).to_numpy()

    lazy_min, lazy_med = _measure(df, expr, sync_lazy)

    mat_rps = N_ROWS / mat_min
    lazy_rps = N_ROWS / lazy_min
    print(
        json.dumps(
            {
                "metric": "grouped_ols_rows_per_s_per_chip_materialized",
                "value": round(mat_rps),
                "unit": "rows/s",
                "vs_baseline": round(mat_rps / REFERENCE_ROWS_PER_S, 3),
                "lazy_rows_per_s": round(lazy_rps),
                "lazy_vs_baseline": round(lazy_rps / REFERENCE_ROWS_PER_S, 3),
                "materialized_ms_median": round(mat_med * 1e3, 1),
                "lazy_ms_median": round(lazy_med * 1e3, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
