"""Execute every ``examples/*.py`` script at a smoke budget.

The examples are user-facing executable documentation; parsing them
(tools/lint.py) proves only syntax, so each script is RUN here in a fresh
subprocess with ``VIABEL_EXAMPLES_SCALE`` shrunk (see examples/_smoke.py)
and ``VIABEL_FORCE_CPU=1`` (never contend with a TPU benchmark — CLAUDE.md
"One TPU process at a time").  A non-zero exit or a timeout fails the
gate.  Wired into ``make examples`` and the slow test tier
(tests/test_examples.py); counterpart of the notebooks' execution
receipts (tools/run_notebooks.py).

Usage: ``python tools/run_examples.py [script.py ...]`` — no args runs the
whole directory.  Env: ``VIABEL_EXAMPLES_SCALE`` (default 0.02),
``VIABEL_EXAMPLES_TIMEOUT`` seconds per script (default 900).
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_examples(paths=None, scale=None, timeout=None):
    """Run each script; return a list of (path, returncode, seconds)."""
    if not paths:
        ex_dir = os.path.join(REPO, "examples")
        paths = sorted(
            os.path.join(ex_dir, f) for f in os.listdir(ex_dir)
            if f.endswith(".py") and not f.startswith("_"))
    scale = scale or os.environ.get("VIABEL_EXAMPLES_SCALE", "0.02")
    timeout = float(timeout
                    or os.environ.get("VIABEL_EXAMPLES_TIMEOUT", "900"))
    env = dict(os.environ, VIABEL_EXAMPLES_SCALE=str(scale),
               VIABEL_FORCE_CPU="1")
    results = []
    for path in paths:
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, path], env=env, cwd=REPO, timeout=timeout,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
            code, out = proc.returncode, proc.stdout
        except subprocess.TimeoutExpired as exc:
            code = -1
            out = (exc.stdout or b"").decode(errors="replace") \
                if isinstance(exc.stdout, bytes) else (exc.stdout or "")
            out += f"\n*** TIMEOUT after {timeout:.0f}s"
        dt = time.perf_counter() - t0
        status = "ok" if code == 0 else f"FAILED (exit {code})"
        print(f"[{status:>16}] {os.path.relpath(path, REPO)}  ({dt:.1f}s)")
        if code != 0:
            print(out)
        results.append((path, code, dt))
    return results


def main(argv=None):
    results = run_examples(paths=list(argv or [])[1:] or None)
    failed = [os.path.relpath(p, REPO) for p, c, _ in results if c != 0]
    total = sum(dt for _, _, dt in results)
    print(f"\n{len(results) - len(failed)}/{len(results)} examples executed "
          f"cleanly in {total:.0f}s at scale "
          f"{os.environ.get('VIABEL_EXAMPLES_SCALE', '0.02')}")
    if failed:
        print("failing examples:", ", ".join(failed))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
