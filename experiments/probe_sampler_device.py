"""Probe: where does the sampler's DEVICE budget go?

The e2e sampler rate on this rig is transfer-bound (docs/PERF.md), so the
only device-side lever is the event kernel itself (~900 k hadrons/s
device-only, round-2 number).  This probe times the full packed event
batch kernel (`_event_batch_packed_jit`, everything on device, scalar
readback only) and then each structural phase STANDALONE at the same
shapes, attributing the budget across:

  draw     - Poisson + cell inverse-CDF searchsorted + species row
             binary search (the categorical machinery)
  gather   - the combined (n_cap, NF) per-slot row gather
  reject   - the batched-proposal rejection while_loop (light+heavy mix)
  lab      - LRF -> lab boost + spacetime reconstruction
  pack     - keep-compaction scatter into the (cap_total,) transfer arrays

Standalone phases lose cross-phase fusion, so their sum can exceed the
full kernel; the RELATIVE magnitudes are the attribution.  Fresh keys per
repetition (serving-layer cache countermeasure) and scalar-sum readbacks
(forces execution without a bulk transfer).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/probe_sampler_device.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from is3d_tpu.config import Config
from is3d_tpu.io.surface import ThermoAverages
from is3d_tpu.kernels import sample as smp
from is3d_tpu.testing import (synthetic_surface, synthetic_species,
                              synthetic_deltaf_data)

N_CELLS = 65536
N_EVENTS = 16          # one batch worth


def bench(fn, make_args, label, evals, reps=5):
    f = jax.jit(fn)
    jax.block_until_ready(f(*make_args(0)))
    dts, checks = [], []
    for i in range(reps):
        args = make_args(100 + i)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = f(*args)
        checks.append(float(jnp.sum(jax.tree.leaves(out)[0])))
        dts.append(time.perf_counter() - t0)
    assert len(set(checks)) > 1, f"{label}: outputs identical across reps"
    dt = float(np.median(dts))
    print(f"{label:8s} {dt*1e3:8.1f} ms   ({evals/dt/1e3:8.0f} k hadron-slots/s)")
    return dt


def main():
    dtype = jnp.float32
    cfg = Config(operation=2, mode=1, dimension=2, df_mode=2,
                 include_shear_deltaf=1, include_bulk_deltaf=1,
                 regulate_deltaf=1, precision="f32")
    surface = synthetic_surface(N_CELLS, dimension=2, seed=1, dtype=dtype)
    species = synthetic_species(320, dtype=dtype)
    df_data = synthetic_deltaf_data(dtype=dtype)
    plasma = ThermoAverages(0.155, 0.33, 0.057, 0.0, 0.0)
    lag = smp._laguerre_device(dtype)
    cell = smp._build_cell_data(surface, species, df_data, cfg, plasma, lag)
    lam = float(jnp.sum(cell["dn_tot"]))
    n_cap = smp._slot_capacity(lam)
    ntot = min(smp._mean_total_yield(cell, cfg), lam) or lam
    cap_total = smp._packed_capacity(N_EVENTS, ntot, n_cap)
    slots = N_EVENTS * n_cap
    print(f"lambda = {lam:.0f}, n_cap = {n_cap}, B = {N_EVENTS}, "
          f"slots = {slots}")
    lam_dev = jnp.asarray(lam, dtype)

    def keys_of(seed):
        return jax.vmap(lambda i: jax.random.fold_in(jax.random.key(seed), i)
                        )(jnp.arange(N_EVENTS))

    # ---- full kernel (device only: scalar readback) --------------------
    t_full = bench(
        lambda ks: smp._event_batch_packed_jit(cell, species, ks, lam_dev,
                                               n_cap, cap_total, cfg),
        lambda s: (keys_of(s),), "full", slots)

    # ---- draw: poisson + cell searchsorted + species binsearch ---------
    def draw(ks):
        def one(key):
            k0, k1, k2 = jax.random.split(key, 3)
            n = jax.random.poisson(k0, lam_dev)
            u_cell = jax.random.uniform(k1, (n_cap,), dtype=dtype) * lam_dev
            cidx = jnp.clip(jnp.searchsorted(cell["cum_dn"], u_cell,
                                             side="right"),
                            0, cell["cum_dn"].shape[0] - 1)
            S = species.n_species
            v = (jax.random.uniform(k2, (n_cap,), dtype=dtype)
                 * cell["rowcum"][cidx, S - 1])
            sidx = smp._row_categorical(cell["rowcum"], cidx, v)
            return cidx, sidx, n
        return jax.vmap(one)(ks)
    t_draw = bench(draw, lambda s: (keys_of(s),), "draw", slots)

    # ---- draw_alias: the O(1) Walker-alias replacement (round 4) -------
    def draw_alias(ks):
        def one(key):
            k0, k1, k2, k3 = jax.random.split(key, 4)
            n = jax.random.poisson(k0, lam_dev)
            cidx, sidx = smp._alias_cell_species_draw(cell, k1, k2, k3,
                                                      n_cap, dtype)
            return cidx, sidx, n
        return jax.vmap(one)(ks)
    if "grp_prob" in cell:
        t_draw_a = bench(draw_alias, lambda s: (keys_of(s),), "draw_a", slots)

    # ---- gather: the combined per-slot row gather ----------------------
    gkeys = smp._pre_fields(cfg) + smp._LAB_FIELDS
    packed_rows = jnp.stack([cell[k].astype(dtype) for k in gkeys], axis=1)
    print(f"row fields NF = {packed_rows.shape[1]}")

    def gather(ks):
        def one(key):
            u = jax.random.uniform(key, (n_cap,), dtype=dtype) * lam_dev
            cidx = jnp.clip(jnp.searchsorted(cell["cum_dn"], u, side="right"),
                            0, cell["cum_dn"].shape[0] - 1)
            return jnp.sum(packed_rows[cidx], axis=0)
        return jax.vmap(one)(ks)
    t_gather = bench(gather, lambda s: (keys_of(s),), "gather", slots)

    # ---- gather_sorted: same row gather with SORTED indices ------------
    # (tests whether TPU gather cost is locality-sensitive: if sorted
    # indices are much faster, a sort+unsort pipeline could pay)
    def gather_sorted(ks):
        def one(key):
            u = jax.random.uniform(key, (n_cap,), dtype=dtype) * lam_dev
            cidx = jnp.clip(jnp.searchsorted(cell["cum_dn"], u, side="right"),
                            0, cell["cum_dn"].shape[0] - 1)
            cidx = jnp.sort(cidx)
            return jnp.sum(packed_rows[cidx], axis=0)
        return jax.vmap(one)(ks)
    bench(gather_sorted, lambda s: (keys_of(s),), "gat_srt", slots)

    # ---- reject: the batched-proposal while_loop -----------------------
    mass_all = species.mass
    def reject(ks):
        def one(key):
            km, kr = jax.random.split(key)
            sidx = jax.random.randint(km, (n_cap,), 0, species.n_species)
            mass = mass_all[sidx]
            sign = species.sign[sidx]
            mbar = mass / 0.155
            chem = jnp.zeros_like(mbar)

            def cond(st):
                done, *_, rounds, _ = st
                return (~jnp.all(done)) & (rounds < smp.MAX_REJECTION_ROUNDS)

            def body(st):
                done, pbar, Ebar, phi, cost, rounds, k = st
                k, sub = jax.random.split(k)
                acc, pb, Eb, ph, ct = smp._propose(sub, mbar, sign, chem,
                                                   ~done)
                return (done | acc, jnp.where(acc, pb, pbar),
                        jnp.where(acc, Eb, Ebar), jnp.where(acc, ph, phi),
                        jnp.where(acc, ct, cost), rounds + 1, k)

            z = jnp.zeros((n_cap,), dtype)
            st0 = (jnp.zeros((n_cap,), bool), z, z + 1.0, z, z,
                   jnp.int32(0), kr)
            done, pbar, Ebar, *_ = lax.while_loop(cond, body, st0)
            return pbar
        return jax.vmap(one)(ks)
    t_rej = bench(reject, lambda s: (keys_of(s),), "reject", slots)

    # ---- lab: boost + spacetime reconstruction -------------------------
    def lab(ks):
        def one(key):
            ku, kc, ky = jax.random.split(key, 3)
            u = jax.random.uniform(ku, (n_cap,), dtype=dtype) * lam_dev
            cidx = jnp.clip(jnp.searchsorted(cell["cum_dn"], u, side="right"),
                            0, cell["cum_dn"].shape[0] - 1)
            rows = packed_rows[cidx][:, len(gkeys) - len(smp._LAB_FIELDS):]
            p = jax.random.normal(kc, (4, n_cap), dtype)
            E = jnp.sqrt(0.02 + p[0]**2 + p[1]**2 + p[2]**2)
            out = smp._lab_kinematics(rows, 0.14 + 0.0 * E, E, p[0], p[1],
                                      p[2], ky, cfg)
            return out["E"]
        return jax.vmap(one)(ks)
    t_lab = bench(lab, lambda s: (keys_of(s),), "lab", slots)

    # ---- pack: keep-compaction scatter ---------------------------------
    def pack(ks):
        def one(key):
            kk, kv = jax.random.split(key)
            keep = jax.random.uniform(kk, (n_cap,), dtype=dtype) < 0.3
            vals = jax.random.normal(kv, (4, n_cap), dtype)
            return keep, vals
        keep, vals = jax.vmap(one)(ks)
        keepf = keep.reshape(-1)
        pos = jnp.cumsum(keepf.astype(jnp.int32)) - 1
        idx = jnp.where(keepf, pos, cap_total)
        out = [jnp.zeros((cap_total,), dtype).at[idx].set(
                   vals[:, i].reshape(-1), mode="drop") for i in range(4)]
        return sum(jnp.sum(o) for o in out)
    t_pack = bench(pack, lambda s: (keys_of(s),), "pack", slots)

    # ---- tetrad lever (round 5): full-kernel paired A/B ----------------
    # cfg.sampler_gather_tetrad=0 drops the 8 Milne tetrad fields from
    # the row gather (NF 39 -> 31) and rebuilds the basis per slot from
    # (u, tau) already in the row.  Gathers cost per element (round-4
    # probe), so this trades ~20% of gathered elements for VPU math.
    cfg_nt = cfg.replace(sampler_gather_tetrad=0)
    cell_nt = dict(cell)     # same phase-A data; the kernel gathers less
    t_full_nt = bench(
        lambda ks: smp._event_batch_packed_jit(cell_nt, species, ks,
                                               lam_dev, n_cap, cap_total,
                                               cfg_nt),
        lambda s: (keys_of(s),), "full_nt", slots)
    t_full_ab = bench(
        lambda ks: smp._event_batch_packed_jit(cell, species, ks, lam_dev,
                                               n_cap, cap_total, cfg),
        lambda s: (keys_of(s),), "full_ab", slots)
    print(f"tetrad lever: gather-tetrad {t_full_ab*1e3:.1f} ms vs "
          f"recompute {t_full_nt*1e3:.1f} ms "
          f"({100.0 * (t_full_ab - t_full_nt) / t_full_ab:+.1f}% "
          f"same-session paired)")

    t_sum = t_draw + t_gather + t_rej + t_lab + t_pack
    print(f"\nphase sum {t_sum*1e3:.1f} ms vs full {t_full*1e3:.1f} ms "
          f"(standalone phases double-count the shared index machinery)")
    for name, t in (("draw", t_draw), ("gather", t_gather),
                    ("reject", t_rej), ("lab", t_lab), ("pack", t_pack)):
        print(f"  {name:8s} {100.0 * t / t_sum:5.1f} % of phase sum")


if __name__ == "__main__":
    main()
