"""Chip-side bench gate (`make check-chip`, VERDICT r4 #1c).

Round 4 shipped a bench that was green on the CPU smoke
(`scripts/check_gate.py` forces the CPU backend) but crashed on the real
TPU — the roofline guard was chip-only, so `make check` could not see
the failure and the round snapshot went out with NO perf record.

This gate runs `python bench.py` against the REAL chip and fails when:
  * the process exits nonzero,
  * the JSON line is missing or unparsable,
  * any ``*_error`` key is present,
  * ``roofline_violations`` is non-empty (a kernel measurement implied
    more HBM bandwidth than the chip physically has — a leak, not a
    result).

It is a precondition for the end-of-round snapshot, same rule as
VERDICT r3 #9 ("never snapshot red") extended to the environment the
CPU gate cannot see.  On success the validated JSON is written to
``/tmp/bench_chip_gate.json`` for inspection.
"""

import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main() -> int:
    proc = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True, text=True, cwd=str(ROOT), timeout=7200,
    )
    if proc.returncode != 0:
        print(proc.stdout[-4000:])
        print(proc.stderr[-4000:])
        print("check_bench_chip: FAIL — bench exited nonzero")
        return 1
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln]
    try:
        out = json.loads(lines[-1])
    except (IndexError, json.JSONDecodeError) as e:
        print(proc.stdout[-4000:])
        print(f"check_bench_chip: FAIL — no JSON line ({e})")
        return 1
    pathlib.Path("/tmp/bench_chip_gate.json").write_text(json.dumps(out))
    errors = {k: v for k, v in out.items() if k.endswith("_error")}
    if errors:
        print(f"check_bench_chip: FAIL — bench errors: {errors}")
        return 1
    if out.get("roofline_violations"):
        print(
            "check_bench_chip: FAIL — roofline violations: "
            f"{out['roofline_violations']}"
        )
        return 1
    import jax  # after the run: report which backend the bench saw

    print(
        f"check_bench_chip: OK — backend={jax.default_backend()} "
        f"value={out.get('value')} e2e={out.get('e2e_value')} "
        f"tpch_geomean={out.get('tpch_geomean_rows_per_s')}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
