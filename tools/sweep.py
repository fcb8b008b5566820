#!/usr/bin/env python3
"""Multi-scale parity sweep: Verify + DuckDB parity across sf dirs.

Rounding and ordering seams between Spark and DuckDB only surface as
row counts grow (the q01/q42 decimal-cast seams appeared at 10× the
gate's sf — see SCALE.md), so every new aggregate should sweep larger
dirs too, not just the sf0.01 gate. This tool institutionalizes that
habit:

    python3 tools/sweep.py /root/testdata/sf0.01 /root/testdata/sf0.1
    python3 tools/sweep.py --skip q36_simhash_pairs,q41_cosine_neardup \
        /tmp/graft_sf1

`--skip` excludes queries from BOTH the Spark dump and the oracle
(via GRAFT_VERIFY_SKIP) — use it for the two documented O(n²) oracle
fixtures at scale factors where a quadratic pair scan is meaningless.
Generate bigger dirs with tools/gen_sf.py. Exit 0 iff every swept dir
is fully green; prints per-dir runtimes for the SCALE.md evidence note.
"""
import os
import subprocess
import sys
import time


def main():
    args = sys.argv[1:]
    skip = ""
    if args and args[0] == "--skip":
        skip = args[1]
        args = args[2:]
    if not args:
        print(__doc__)
        sys.exit(2)

    results = []
    for sf_dir in args:
        out_dir = f"/tmp/graft_sweep_{os.path.basename(sf_dir.rstrip('/'))}"
        env = dict(os.environ, GRAFT_VERIFY_SKIP=skip)
        t0 = time.time()
        v = subprocess.run(
            ["sbt", "-batch",
             f"runMain graft.Verify {sf_dir} {out_dir}"],
            env=env, capture_output=True, text=True)
        t_verify = time.time() - t0
        if v.returncode != 0:
            results.append((sf_dir, "VERIFY-FAIL", t_verify, 0.0))
            print(v.stdout[-3000:], v.stderr[-3000:])
            continue
        t1 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "parity.py"),
             out_dir, sf_dir],
            capture_output=True, text=True)
        t_parity = time.time() - t1
        status = "OK" if p.returncode == 0 else "FAIL"
        if p.returncode != 0:
            fails = [ln for ln in p.stdout.splitlines()
                     if not ln.startswith("OK")]
            print("\n".join(fails[:40]))
        n_ok = sum(1 for ln in p.stdout.splitlines()
                   if ln.startswith("OK"))
        results.append((sf_dir, f"{status} ({n_ok} queries)",
                        t_verify, t_parity))

    print("\n== sweep summary ==")
    for sf_dir, status, tv, tp in results:
        print(f"{sf_dir}: {status}  verify={tv:.0f}s parity={tp:.0f}s")
    sys.exit(0 if all("OK" in s for _, s, _, _ in results) else 1)


if __name__ == "__main__":
    main()
