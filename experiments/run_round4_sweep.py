"""One-process round-4 TPU measurement sweep.

The axon tunnel on this rig intermittently wedges when fresh processes
attach (round-4 incident log, NOTES_ROUND4.md), so all pending
measurements run from ONE process back to back:

  1. headline bench (current tree)          -> bench.py main()
  2. dN/dX df1 + df3                        -> bench_dndx.main()
  3. sampler device-phase attribution       -> probe_sampler_device.main()
  4. 10M-cell df2 proof                     -> bench_1m_e2e at 10M
(df3 10M and the calibration diff-decays rows run separately; this
script already takes ~35 min.)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/run_round4_sweep.py [steps]
  steps: comma list from {bench,dndx,sampler,10m}; default all
"""
import sys
import os
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def step(name, fn):
    print(f"\n===== {name} =====", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print(f"===== {name} FAILED (continuing) =====", flush=True)
    else:
        print(f"===== {name} done =====", flush=True)


def main():
    want = (sys.argv[1].split(",") if len(sys.argv) > 1
            else ["bench", "dndx", "sampler", "10m"])
    if "bench" in want:
        import bench as bench_mod
        step("headline bench", bench_mod.main)
    if "dndx" in want:
        import bench_dndx
        step("dN/dX", bench_dndx.main)
    if "sampler" in want:
        import probe_sampler_device
        step("sampler device phases", probe_sampler_device.main)
    if "10m" in want:
        import bench_1m_e2e
        argv = sys.argv[:]
        sys.argv = ["bench_1m_e2e.py", "10000000", "2"]
        step("10M-cell df2", bench_1m_e2e.main)
        sys.argv = argv


if __name__ == "__main__":
    main()
