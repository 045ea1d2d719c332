"""Profile the resonance-decay feed-down pass: where does the time go?

Runs the full SMASH-list decay cascade on a synthetic smooth spectrum and
times (a) host prep (_prepare_parent tail fits), (b) wave dispatches,
(c) total.  Run: PYTHONPATH=. python experiments/profile_decays.py [cpu]
"""
import sys
import time
import numpy as np

import jax
if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

from is3d_tpu.config import Config
from is3d_tpu.io import pdg
from is3d_tpu.kernels import decays as dec


class Grid:
    pass


def main():
    # smash list by default; "urqmd" exercises the 3-body-heavy channel set
    hrg_eos = 1 if "urqmd" in sys.argv[1:] else 2
    table = pdg.read_resonances("/root/reference/PDG", hrg_eos)
    # chosen = all species in the table (full production setting)
    mcids = np.asarray(table.mc_id)
    S = len(mcids)
    grid = Grid()
    grid.pT = np.linspace(0.1, 3.0, 32)
    grid.phi = np.linspace(0.05, 2 * np.pi - 0.05, 24)
    grid.y = np.array([0.0])
    # physically-shaped fake spectra: exp(-mT/T) with vn modulation
    mT = np.sqrt(grid.pT[:, None, None] ** 2
                 + np.asarray(table.mass)[:, None, None, None] ** 2)
    spectra = np.exp(-mT / 0.15) * (1 + 0.1 * np.cos(2 * grid.phi)[None, None, :, None])
    spectra = np.ascontiguousarray(spectra.reshape(S, 32, 24, 1))

    cfg = Config(operation=1, dimension=2, lightest_particle=111)

    # instrument
    t_prep = [0.0]
    orig_prep = dec._prepare_parent

    def timed_prep(*a, **k):
        t0 = time.perf_counter()
        out = orig_prep(*a, **k)
        t_prep[0] += time.perf_counter() - t0
        return out

    t_disp = [0.0]
    n_disp = [0]
    orig_wave = dec._run_wave

    def timed_wave(tasks2, tasks3, *a, **k):
        B = dec._wave_bucket(2)
        n_disp[0] += (len(tasks2) + B - 1) // B + (len(tasks3) + B - 1) // B
        t0 = time.perf_counter()
        out = orig_wave(tasks2, tasks3, *a, **k)
        t_disp[0] += time.perf_counter() - t0
        return out

    dec._prepare_parent = timed_prep
    dec._run_wave = timed_wave

    for rep in range(2):   # rep 0 includes compile time
        t0 = time.perf_counter()
        out = dec.do_resonance_decays(spectra, table, mcids, grid, cfg)
        total = time.perf_counter() - t0
        tag = "cold" if rep == 0 else "warm"
        print(f"[{tag}] total        {total:8.2f} s  (backend={jax.default_backend()})")
        print(f"  prepare_parent {t_prep[0]:7.2f} s")
        print(f"  wave dispatch  {t_disp[0]:7.2f} s  ({n_disp[0]} buckets)")
        print(f"  other host     {total - t_prep[0] - t_disp[0]:7.2f} s")
        print(f"  pi+ feed-down sum: {out[mcids == 211].sum():.6e}")
        t_prep[0] = t_disp[0] = 0.0
        n_disp[0] = 0


if __name__ == "__main__":
    main()
