"""Round-end verification gate (VERDICT r3 item 3).

Runs the FULL pytest suite and the FULL contract sweep (every
queries()/oracle_sql() key vs DuckDB at sf0.01), teeing everything to
``logs/gate_r{N}.log`` so each round ships a committed, post-change
verification artifact instead of a stale mid-round log.

Usage: python tools/round_gate.py <round>     # e.g. 4 → logs/gate_r4.log

Exit code 0 only if BOTH runs are fully green.  Run this as the LAST
commit of every round; the log is small (tails of both runs + verdict
lines) and lives in logs/ which is otherwise gitignored — force-add it.
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(label: str, cmd: list[str], log) -> int:
    t0 = time.monotonic()
    print(f"=== {label}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    dt = time.monotonic() - t0
    log.write(f"\n=== {label} (rc={proc.returncode}, {dt:.1f}s) ===\n")
    log.write(f"$ {' '.join(cmd)}\n")
    # full stdout for the contract sweep (one line per key).  Spark's
    # progress bars are \r-overwritten spam that displaces the real
    # lines after truncation — normalize \r to \n and drop them, so the
    # committed log shows every per-key OK/FAIL verbatim.
    out = (proc.stdout + proc.stderr).replace("\r", "\n")
    lines = [l for l in out.splitlines()
             if l.strip() and not l.lstrip().startswith("[Stage")]
    keep = lines if len(lines) <= 400 else lines[:20] + ["... (truncated) ..."] + lines[-380:]
    log.write("\n".join(keep) + "\n")
    print(f"=== {label}: rc={proc.returncode} in {dt:.1f}s", flush=True)
    return proc.returncode


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "X"
    log_path = REPO / "logs" / f"gate_r{rnd}.log"
    log_path.parent.mkdir(exist_ok=True)
    with open(log_path, "w") as log:
        log.write(f"round_gate r{rnd} — started {time.strftime('%Y-%m-%d %H:%M:%S')}\n")
        rc_tests = run("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"], log)
        rc_contract = run(
            "contract", [sys.executable, "tools/check_contract.py"], log
        )
        verdict = "GREEN" if rc_tests == 0 and rc_contract == 0 else "RED"
        log.write(f"\n=== GATE {verdict}: pytest rc={rc_tests}, contract rc={rc_contract} ===\n")
    print(f"gate {verdict}: {log_path}")
    return 0 if verdict == "GREEN" else 1


if __name__ == "__main__":
    raise SystemExit(main())
