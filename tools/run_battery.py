"""Run the full regression battery (tests/test_regression_battery.py ROWS)
and write a per-row result manifest BATTERY_r{N}.json: row -> measured
l2/cv/cv_gll/min/max + pass/fail per assert.

Incremental + resumable: rows already present in the output JSON are
skipped, and the file is rewritten after every row, so the runner can be
stopped/restarted freely. Usage:

    JAX_PLATFORMS=cpu python tools/run_battery.py [out.json] [row_id ...]
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
jax.config.update("jax_enable_x64", True)

from compose_tpu import driver  # noqa: E402
from tests.test_regression_battery import ROWS  # noqa: E402

BOUNDS_SLACK = 5e-13  # same slack as tests/test_regression_battery._run_row


def check(out, asserts):
    checks = {}
    if "l2" in asserts:
        checks["l2"] = (out.l2_err, asserts["l2"], out.l2_err <= asserts["l2"])
    if "cv" in asserts:
        checks["cv"] = (out.cv, asserts["cv"], out.cv <= asserts["cv"])
    if "cv_gll" in asserts:
        checks["cv_gll"] = (out.cv_gll, asserts["cv_gll"],
                            out.cv_gll <= asserts["cv_gll"])
    if "min" in asserts:
        checks["min"] = (out.min_e, asserts["min"],
                         out.min_e >= asserts["min"] - BOUNDS_SLACK)
    if "max" in asserts:
        checks["max"] = (out.max_e, asserts["max"],
                         out.max_e <= asserts["max"] + BOUNDS_SLACK)
    return checks


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BATTERY_r04.json"
    only = set(sys.argv[2:])
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path)).get("rows", {})
    for row_id, ref, kwargs, asserts in ROWS:
        if only and row_id not in only:
            continue
        if row_id in results and "error" not in results[row_id]:
            continue
        t0 = time.time()
        try:
            out = driver.run(verbose=False, **kwargs)
            checks = check(out, asserts)
            rec = {
                "ref": ref,
                "measured": {"l2": out.l2_err, "cv": out.cv,
                             "cv_gll": out.cv_gll, "min": out.min_e,
                             "max": out.max_e},
                "checks": {k: {"value": v[0], "golden": v[1], "pass": v[2]}
                           for k, v in checks.items()},
                "pass": all(v[2] for v in checks.values()),
                "sec": round(time.time() - t0, 1),
            }
        except Exception as e:  # noqa: BLE001 - record and continue
            rec = {"ref": ref, "error": repr(e)[:500], "pass": False,
                   "sec": round(time.time() - t0, 1)}
            traceback.print_exc()
        results[row_id] = rec
        npass = sum(1 for r in results.values() if r.get("pass"))
        doc = {"n_rows": len(ROWS), "n_run": len(results), "n_pass": npass,
               "rows": results}
        with open(out_path + ".tmp", "w") as f:
            json.dump(doc, f, indent=1)
        os.replace(out_path + ".tmp", out_path)
        print(f"{row_id}: pass={rec['pass']} ({rec['sec']}s) "
              f"[{npass}/{len(results)} of {len(ROWS)}]", flush=True)
    print("done")


if __name__ == "__main__":
    main()
