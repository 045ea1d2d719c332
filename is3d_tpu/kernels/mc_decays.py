"""Monte-Carlo resonance decays for sampled particle lists (afterburner-lite).

The reference hands its sampled events to an external afterburner and ships
a disabled smooth feed-down routine (emissionfunction_resonance_decays.cpp,
unconditional exit at :128-129); it has NO event-level decay capability at
all.  This module adds one: every unstable resonance in a sampled event is
decayed through the PDG table's 2- and 3-body channels down to stable
hadrons, with physical decay vertices (exponential proper lifetime
tau ~ hbar/Gamma propagated along p^mu/m).  It is the event-by-event twin
of kernels/decays.py (smooth feed-down), and the two are cross-validated
statistically in tests/test_mc_decays.py.

TPU-first structure: the whole cascade is ONE fixed-shape jitted program.
Events are concatenated into a single hadron batch of static capacity C
(an exact upper bound: sum over input hadrons of the species' worst-case
final multiplicity, computed host-side from the table).  A lax.fori_loop
runs `n_passes` generations (the table's longest decay-chain depth); in
each pass every currently-unstable hadron decays simultaneously:

Per-hadron lineage RNG (DECAY_STREAM_VERSION 2): every hadron carries its
own Threefry key.  A root hadron's key is
fold_in(fold_in(base_key, GLOBAL event index), in-event ordinal); a decay
derives daughter keys by fold_in(parent_key, 1..3) and draws its uniforms
from fold_in(parent_key, 0).  Streams therefore depend only on (seed,
event, ordinal, decay path) -- NEVER on the hadron's position in the
concatenated batch -- so any event-slice partition of a batch (the pod
sampler's per-process slices, api.py operation=2) decays every hadron
byte-identically to the single-process run.  Version 1 keyed draws by
batch position (fold_in(key, pass) over a (7, C) block), which forced
pod slices onto lane-derived seeds and made pod decays only
statistically equal; the stream version is recorded in oversampling
manifests so resumed runs refuse to mix the two.

  * channel choice: one uniform against the per-species cumulative
    branching table (open 2-/3-body channels only, renormalized),
  * 2-body: isotropic in the parent rest frame at the Kallen momentum
    p* = sqrt(lambda(M^2, m1^2, m2^2)) / 2M, boosted to the lab,
  * 3-body: the (2,3) pair's invariant mass m23 is drawn by inverse-CDF
    from the pure phase-space weight g(m23) ~ p*(M, m1, m23) p*(m23, m2, m3)
    (the same g(s) the smooth 3-body integral uses, reference
    resonance_decays :99-121), via a per-channel quantile table built on
    the host; then two sequential isotropic 2-body decays,
  * daughter 1 overwrites the parent slot; daughters 2-3 are scattered to
    fresh slots at n + exclusive-cumsum offsets (the sampler's
    cumsum-scatter pack pattern, kernels/sample.py) -- no host round-trip
    between generations, no dynamic shapes.

Only UNSTABLE hadrons enter the device cascade: a sampled event is
typically ~85% stable already (urqmd list at T=0.155: 12.5% unstable), so
the host partitions the batch and passes stable hadrons through untouched,
shrinking the cascade's static capacity and both H2D/D2H transfers ~8x.
Measured on one v5e chip (5M-hadron batch, urqmd table): 6.8-13 s warm
end-to-end (380-740 k in-hadrons/s through the tunneled link; the
device cascade itself runs ~740 k/s), vs ~56 s without the partition.

Deliberate semantic differences from the smooth cascade (documented, both
are physics choices forced by event-level sampling):
  * kinematically closed channels are dropped and the remaining branching
    ratios renormalized (the smooth cascade width-shifts masses to open
    sub-threshold channels, which has no event-level analogue with
    fixed-mass sampled hadrons);
  * channels with 4+ daughters or daughters missing from the table are
    dropped the same way (the smooth cascade skips them too);
  * a species whose open-channel list comes up empty is treated as stable.
Like the smooth cascade, the particle with mc id == cfg.lightest_particle
is never decayed (reference do_resonance_decays loop, :160-166).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..units import HBARC
from .common import next_pow2 as _next_pow2

# The phase-space density vanishes like sqrt(distance) at both m23
# endpoints, so the quantile function has infinite slope at q = 0 and 1;
# the node count must be high enough that linearizing each q-segment is
# below statistical resolution (tests pin the m23 histogram at 6 sigma).
KQ = 257          # inverse-CDF quantile nodes per 3-body channel
_M23_GRID = 2048  # host-side CDF resolution


# ======================================================================
# host-side table preparation
# ======================================================================

@dataclass
class DecayTables:
    """Device-ready decay tables derived from a ParticleTable.

    All (S, CH)-shaped arrays are padded with no-op channels (cum=1, nd=2,
    daughters=0); `quant` rows of 2-body channels hold the constant m2 so
    the gather never reads uninitialized memory.
    """
    mc_id: np.ndarray        # (S,) int64
    mass: np.ndarray         # (S,)
    ctau: np.ndarray         # (S,) hbar c / Gamma [fm], 0 where stable/zero width
    stable: np.ndarray       # (S,) bool: effective stability (see module doc)
    cum: np.ndarray          # (S, CH) cumulative renormalized branch ratios
    nd: np.ndarray           # (S, CH) int32, 2 or 3
    d1: np.ndarray           # (S, CH) int32 daughter species indices
    d2: np.ndarray
    d3: np.ndarray
    quant: np.ndarray        # (S, CH, KQ) m23 inverse-CDF quantile tables
    maxmult: np.ndarray      # (S,) int64 worst-case final multiplicity
    n_passes: int            # longest decay-chain depth over the table

    def device(self, dtype):
        f = lambda a: jnp.asarray(a, dtype)
        i = lambda a: jnp.asarray(a, jnp.int32)
        return dict(mass=f(self.mass), ctau=f(self.ctau),
                    stable=jnp.asarray(self.stable), cum=f(self.cum),
                    nd=i(self.nd), d1=i(self.d1), d2=i(self.d2),
                    d3=i(self.d3), quant=f(self.quant))


def _pstar(M, m1, m2):
    lam = (M * M - (m1 + m2) ** 2) * (M * M - (m1 - m2) ** 2)
    return np.sqrt(np.maximum(lam, 0.0)) / (2.0 * np.maximum(M, 1e-30))


def _m23_quantiles(M, m1, m2, m3):
    """Inverse CDF of g(m23) ~ p*(M,m1,m23) p*(m23,m2,m3) at KQ nodes."""
    lo, hi = m2 + m3, M - m1
    g = np.linspace(lo, hi, _M23_GRID)
    w = _pstar(M, m1, g) * _pstar(g, m2, m3)
    cdf = np.concatenate([[0.0], np.cumsum(0.5 * (w[1:] + w[:-1]))])
    if cdf[-1] <= 0.0:            # degenerate channel right at threshold
        return np.full(KQ, 0.5 * (lo + hi))
    cdf /= cdf[-1]
    q = np.linspace(0.0, 1.0, KQ)
    return np.interp(q, cdf, g)


def build_decay_tables(table, lightest_particle: int = 111) -> DecayTables:
    """Compile a ParticleTable's decay channels into fixed-shape arrays."""
    S = len(table)
    mass = np.asarray(table.mass, dtype=np.float64)
    width = np.asarray(table.width, dtype=np.float64)
    stable = np.asarray(table.stable, dtype=bool).copy()
    stable |= np.asarray(table.mc_id) == int(lightest_particle)

    mcid_to_idx = {int(m): i for i, m in enumerate(table.mc_id)}
    channels = [[] for _ in range(S)]   # (prob, nd, i1, i2, i3, quant)
    for s in range(S):
        if stable[s]:
            continue
        M = mass[s]
        for ch in range(len(table.decays_branch[s])):
            b = float(table.decays_branch[s][ch])
            nd = abs(int(table.decays_n[s][ch]))
            if b <= 0.0 or nd < 2 or nd > 3:
                continue
            d_mcids = [int(m) for m in table.decays_part[s][ch][:nd]]
            try:
                didx = [mcid_to_idx[m] for m in d_mcids]
            except KeyError:
                continue
            dm = mass[didx]
            if dm.sum() >= M:               # closed at nominal masses
                continue
            if nd == 2:
                channels[s].append((b, 2, didx[0], didx[1], 0, None))
            else:
                quant = _m23_quantiles(M, dm[0], dm[1], dm[2])
                channels[s].append((b, 3, didx[0], didx[1], didx[2], quant))
        if not channels[s]:
            stable[s] = True                # nothing this cascade can do

    CH = max(1, max(len(c) for c in channels))
    cum = np.ones((S, CH), dtype=np.float64)
    nd = np.full((S, CH), 2, dtype=np.int32)
    d1 = np.zeros((S, CH), dtype=np.int32)
    d2 = np.zeros((S, CH), dtype=np.int32)
    d3 = np.zeros((S, CH), dtype=np.int32)
    quant = np.zeros((S, CH, KQ), dtype=np.float64)
    for s, chs in enumerate(channels):
        if not chs:
            continue
        probs = np.array([c[0] for c in chs])
        cum[s, :len(chs)] = np.cumsum(probs / probs.sum())
        # the last REAL channel must close the unit interval exactly: a
        # cumsum end a few ulp below 1.0 would let a uniform select a
        # padding channel (a bogus 2-body decay into table row 0)
        cum[s, len(chs) - 1:] = 1.0
        for j, (_, n, i1, i2, i3, q) in enumerate(chs):
            nd[s, j] = n
            d1[s, j], d2[s, j], d3[s, j] = i1, i2, i3
            quant[s, j] = mass[i2] if q is None else q

    # worst-case final multiplicity + chain depth, ascending-mass order
    # (every open channel's daughters are strictly lighter than the parent)
    maxmult = np.ones(S, dtype=np.int64)
    depth = np.zeros(S, dtype=np.int64)
    for s in np.argsort(mass, kind="stable"):
        if stable[s] or not channels[s]:
            continue
        best_m, best_d = 1, 0
        for (_, n, i1, i2, i3, _) in channels[s]:
            ds = (i1, i2, i3)[:n]
            best_m = max(best_m, sum(int(maxmult[d]) for d in ds))
            best_d = max(best_d, 1 + max(int(depth[d]) for d in ds))
        maxmult[s] = best_m
        depth[s] = best_d

    ctau = np.where(~stable & (width > 0.0), HBARC / np.maximum(width, 1e-30),
                    0.0)
    return DecayTables(mc_id=np.asarray(table.mc_id, dtype=np.int64),
                       mass=mass, ctau=ctau, stable=stable, cum=cum, nd=nd,
                       d1=d1, d2=d2, d3=d3, quant=quant, maxmult=maxmult,
                       n_passes=int(depth.max()) if S else 0)


# ======================================================================
# device cascade (one jit, fixed shapes)
# ======================================================================

def _boost(Ep, Px, Py, Pz, invM, Er, qx, qy, qz):
    """Boost (Er, q) from the rest frame of a particle with lab four-momentum
    (Ep, P) and inverse mass invM to the lab frame."""
    dot = Px * qx + Py * qy + Pz * qz
    Eout = (Ep * Er + dot) * invM
    coef = (dot / (Ep + 1.0 / invM) + Er) * invM
    return Eout, qx + Px * coef, qy + Py * coef, qz + Pz * coef


def _iso_dir(u_cos, u_phi, pmag):
    cth = 2.0 * u_cos - 1.0
    sth = jnp.sqrt(jnp.maximum(1.0 - cth * cth, 0.0))
    ph = (2.0 * math.pi) * u_phi
    return pmag * sth * jnp.cos(ph), pmag * sth * jnp.sin(ph), pmag * cth


@partial(jax.jit, static_argnames=("n_passes",))
def _cascade_jit(sidx, E, px, py, pz, t, x, y, z, eid, eg, ordv, n0, key,
                 tabs, n_passes: int):
    """Run the full decay cascade in-device.  All arrays have static
    capacity C; `n0` hadrons are live on entry.  Each hadron carries
    (C, 2) uint32 lineage key data seeded from
    fold_in(fold_in(key, eg), ordv) -- global event index and in-event
    ordinal (see module docstring): draws come from fold_in(k, 0),
    daughters inherit fold_in(k, 1..3), so every hadron's stream is
    independent of its batch position.  Returns the updated state and the
    final live count."""
    kd = jax.vmap(lambda e, o: jax.random.key_data(
        jax.random.fold_in(jax.random.fold_in(key, e), o)))(eg, ordv)
    C = sidx.shape[0]
    dtype = E.dtype
    iota = jnp.arange(C, dtype=jnp.int32)
    tiny = jnp.asarray(1e-8, dtype)

    def body(i, st):
        sidx, E, px, py, pz, t, x, y, z, eid, kd, n = st
        keys = jax.random.wrap_key_data(kd)              # (C,) key array
        u = jax.vmap(lambda k: jax.random.uniform(
            jax.random.fold_in(k, 0), (7,), dtype=dtype))(keys).T
        kid = jax.vmap(
            lambda k: jnp.stack([jax.random.key_data(jax.random.fold_in(k, j))
                                 for j in (1, 2, 3)]))(keys)   # (C, 3, 2)
        alive = iota < n
        dec = alive & ~tabs["stable"][sidx]
        M = tabs["mass"][sidx]
        invM = 1.0 / jnp.maximum(M, tiny)

        cumrow = tabs["cum"][sidx]                          # (C, CH)
        ch = jnp.minimum(
            jnp.sum(u[0][:, None] >= cumrow, axis=1).astype(jnp.int32),
            cumrow.shape[1] - 1)
        nd = tabs["nd"][sidx, ch]
        D1 = tabs["d1"][sidx, ch]
        D2 = tabs["d2"][sidx, ch]
        D3 = tabs["d3"][sidx, ch]
        m1 = tabs["mass"][D1]
        m2 = tabs["mass"][D2]
        m3 = tabs["mass"][D3]
        is3 = nd == 3

        # cluster mass: m23 by inverse CDF for 3-body, m2 for 2-body.
        # flat 2-node gather -- a (C, KQ) row gather would materialize
        # C*KQ floats per pass just to interpolate one segment
        qflat = tabs["quant"].reshape(-1)
        posq = u[1] * (KQ - 1)
        i0 = jnp.clip(posq.astype(jnp.int32), 0, KQ - 2)
        fr = posq - i0.astype(dtype)
        base = (sidx * tabs["quant"].shape[1] + ch) * KQ + i0
        qa = qflat[base]
        qb = qflat[base + 1]
        mc = jnp.where(is3, qa * (1.0 - fr) + qb * fr, m2)

        # stage A: parent -> daughter1 + cluster, isotropic at p*
        lamA = (M * M - (m1 + mc) ** 2) * (M * M - (m1 - mc) ** 2)
        pA = jnp.sqrt(jnp.maximum(lamA, 0.0)) * (0.5 * invM)
        q1x, q1y, q1z = _iso_dir(u[2], u[3], pA)
        E1r = jnp.sqrt(m1 * m1 + pA * pA)
        Ecr = jnp.sqrt(mc * mc + pA * pA)
        E1, p1x, p1y, p1z = _boost(E, px, py, pz, invM, E1r, q1x, q1y, q1z)
        Ec, pcx, pcy, pcz = _boost(E, px, py, pz, invM, Ecr, -q1x, -q1y, -q1z)

        # stage B (3-body only): cluster -> daughter2 + daughter3
        invmc = 1.0 / jnp.maximum(mc, tiny)
        lamB = (mc * mc - (m2 + m3) ** 2) * (mc * mc - (m2 - m3) ** 2)
        pB = jnp.sqrt(jnp.maximum(lamB, 0.0)) * (0.5 * invmc)
        q2x, q2y, q2z = _iso_dir(u[4], u[5], pB)
        E2r = jnp.sqrt(m2 * m2 + pB * pB)
        E3r = jnp.sqrt(m3 * m3 + pB * pB)
        E2b, p2bx, p2by, p2bz = _boost(Ec, pcx, pcy, pcz, invmc,
                                       E2r, q2x, q2y, q2z)
        E3, p3x, p3y, p3z = _boost(Ec, pcx, pcy, pcz, invmc,
                                   E3r, -q2x, -q2y, -q2z)
        E2 = jnp.where(is3, E2b, Ec)
        p2x = jnp.where(is3, p2bx, pcx)
        p2y = jnp.where(is3, p2by, pcy)
        p2z = jnp.where(is3, p2bz, pcz)

        # decay vertex: exponential proper time along p^mu / M
        taup = -tabs["ctau"][sidx] * jnp.log1p(-u[6])
        tD = t + taup * E * invM
        xD = x + taup * px * invM
        yD = y + taup * py * invM
        zD = z + taup * pz * invM

        # daughter 1 overwrites the parent slot (and inherits lineage
        # child-key 1; non-decaying slots keep their key untouched)
        sidx = jnp.where(dec, D1, sidx)
        E = jnp.where(dec, E1, E)
        px = jnp.where(dec, p1x, px)
        py = jnp.where(dec, p1y, py)
        pz = jnp.where(dec, p1z, pz)
        t = jnp.where(dec, tD, t)
        x = jnp.where(dec, xD, x)
        y = jnp.where(dec, yD, y)
        z = jnp.where(dec, zD, z)
        kd = jnp.where(dec[:, None], kid[:, 0], kd)

        # daughters 2-3 scatter to fresh slots
        extra = jnp.where(dec, nd - 1, 0).astype(jnp.int32)
        offs = n + jnp.cumsum(extra) - extra
        pos2 = jnp.where(dec, offs, C)
        pos3 = jnp.where(dec & is3, offs + 1, C)

        def put(arr, v2, v3):
            arr = arr.at[pos2].set(v2.astype(arr.dtype), mode="drop")
            return arr.at[pos3].set(v3.astype(arr.dtype), mode="drop")

        sidx = put(sidx, D2, D3)
        E = put(E, E2, E3)
        px = put(px, p2x, p3x)
        py = put(py, p2y, p3y)
        pz = put(pz, p2z, p3z)
        t = put(t, tD, tD)
        x = put(x, xD, xD)
        y = put(y, yD, yD)
        z = put(z, zD, zD)
        eid = put(eid, eid, eid)
        kd = put(kd, kid[:, 1], kid[:, 2])
        n = n + jnp.sum(extra, dtype=jnp.int32)
        return (sidx, E, px, py, pz, t, x, y, z, eid, kd, n)

    st = (sidx, E, px, py, pz, t, x, y, z, eid, kd,
          jnp.asarray(n0, dtype=jnp.int32))
    st = jax.lax.fori_loop(0, n_passes, body, st)
    return st


# ======================================================================
# host orchestration
# ======================================================================

# id(table)-keyed; each entry holds a strong reference to the source table
# so a garbage-collected table's recycled address can never alias a stale
# entry.  Bounded by the number of distinct particle tables in a process.
_TABLE_CACHE = {}


def _cached_tables(table, lightest) -> DecayTables:
    k = (id(table), int(lightest))
    if k not in _TABLE_CACHE:
        _TABLE_CACHE[k] = (table, build_decay_tables(table, lightest), {})
    return _TABLE_CACHE[k][1]


def _cached_device_tables(table, lightest, tabs: DecayTables, dtype):
    """The immutable on-device table dict, uploaded once per dtype."""
    dev = _TABLE_CACHE[(id(table), int(lightest))][2]
    key = np.dtype(dtype).name
    if key not in dev:
        dev[key] = tabs.device(dtype)
    return dev[key]


# Bumped whenever the cascade's draw-keying scheme changes (recorded in
# oversampling manifests; a resumed run refuses on mismatch).  Version 2:
# per-hadron lineage keys (see module docstring).
DECAY_STREAM_VERSION = 2


def derive_decay_seed(seed: int) -> int:
    """An independent decay-stream seed from a sampler seed.

    The cascade must not consume the same Threefry streams as the sampler
    that produced the events (fold_in over the global event index appears
    in both), so callers derive the decay seed through a distinct
    SeedSequence branch.  One shared seed serves every pod process /
    worker: lineage keying makes slices byte-identical by construction
    (the former per-process ``lane`` parameter is gone with stream
    version 2)."""
    return int(np.random.SeedSequence((int(seed), 0x6D63)).generate_state(
        2, dtype=np.uint64)[0] % (2**63))


def decay_events(events: list, table, cfg=None, seed: int = 0,
                 lightest_particle: int | None = None,
                 event_offset: int = 0) -> list:
    """Decay all unstable resonances in sampled events to stable hadrons.

    events: list of per-event dicts with the sampler's EVENT_FIELDS schema
    (kernels/sample.py).  Returns a NEW list in the same schema holding only
    final-state (stable) hadrons, with decay products carrying physical
    decay vertices.

    ``event_offset``: the GLOBAL index of events[0].  Per-hadron streams
    key on (seed, event_offset + local index, in-event ordinal), so
    decaying an event slice with its true global offset is byte-identical
    to decaying the full list in one call (the pod sampler's per-process
    slices rely on this; tests/test_mc_decays.py proves the invariance).
    Deterministic in (events, seed, event_offset).
    """
    if lightest_particle is None:
        lightest_particle = int(getattr(cfg, "lightest_particle", 111))
    tabs = _cached_tables(table, lightest_particle)
    if not events:
        return []

    counts = [len(e["E"]) for e in events]
    N = int(sum(counts))
    if N == 0:
        return [dict(e) for e in events]

    FIELDS = ("mcid", "mass", "E", "px", "py", "pz", "t", "x", "y", "z",
              "tau", "eta", "yp")
    cols = {k: np.concatenate([np.asarray(e[k]) for e in events])
            for k in FIELDS}
    mcid_in = cols["mcid"].astype(np.int64)
    eid_in = np.repeat(np.arange(len(events), dtype=np.int32), counts)
    # in-event ordinal = position in the event's FULL hadron list: the
    # sampler's per-event lists are byte-identical across partitionings,
    # so (global event, ordinal) is a partition-invariant stream address
    ord_in = (np.arange(N, dtype=np.int32)
              - np.repeat(np.cumsum([0] + counts[:-1]).astype(np.int32),
                          counts))

    order = np.argsort(tabs.mc_id, kind="stable")
    pos = np.searchsorted(tabs.mc_id[order], mcid_in)
    pos = np.clip(pos, 0, len(order) - 1)
    sidx_all = order[pos].astype(np.int32)
    bad = tabs.mc_id[sidx_all] != mcid_in
    if bad.any():
        raise KeyError(f"sampled mc id(s) not in the particle table: "
                       f"{np.unique(mcid_in[bad])[:5]}")

    # only unstable hadrons enter the device cascade (typically a minority
    # of a sampled event); stable ones pass through host-side untouched,
    # shrinking the cascade's static capacity and both transfer directions
    unst = ~tabs.stable[sidx_all]
    pass_cols = {k: v[~unst] for k, v in cols.items()}
    eid_pass = eid_in[~unst]
    sidx_in = sidx_all[unst]
    eid_unst = eid_in[unst]
    ord_unst = ord_in[unst]
    n_u = int(sidx_in.shape[0])

    dtype = np.asarray(events[0]["E"]).dtype
    if dtype not in (np.float32, np.float64):
        dtype = np.float64

    if n_u == 0:
        out_cols = pass_cols
        eid_o = eid_pass
    else:
        C = _next_pow2(int(tabs.maxmult[sidx_in].sum()))

        def pad_f(v):
            out = np.zeros(C, dtype=dtype)
            out[:n_u] = v
            return jnp.asarray(out)

        sidx = jnp.asarray(np.pad(sidx_in, (0, C - n_u)))
        eid = jnp.asarray(np.pad(eid_unst, (0, C - n_u), constant_values=-1))
        eg = jnp.asarray(np.pad(
            eid_unst.astype(np.int64) + int(event_offset), (0, C - n_u)),
            jnp.int32)
        ordv = jnp.asarray(np.pad(ord_unst, (0, C - n_u)), jnp.int32)
        args = [pad_f(cols[k][unst])
                for k in ("E", "px", "py", "pz", "t", "x", "y", "z")]

        dev_tabs = _cached_device_tables(table, lightest_particle, tabs,
                                         dtype)
        st = _cascade_jit(sidx, *args, eid, eg, ordv, n_u,
                          jax.random.key(int(seed)), dev_tabs,
                          n_passes=tabs.n_passes)
        nf = int(st[-1])
        if nf > C:
            raise RuntimeError(f"decay cascade overflow: {nf} hadrons > "
                               f"capacity {C} (worst-case bound violated)")
        # device-side slice to a rounded live bound before readback --
        # C is a power of two and can be ~2x the live count; rounding the
        # bound (not using nf itself) caps slice-program recompiles
        bound = min(C, -(-nf // 65536) * 65536)
        sidx_o, E, px, py, pz, t, x, y, z, eid_c = (
            np.asarray(v[:bound])[:nf] for v in st[:-2])
        if np.any(~tabs.stable[sidx_o]):
            raise RuntimeError("unstable hadrons survived the cascade; the "
                               "table's chain depth exceeded n_passes")

        casc = dict(mcid=tabs.mc_id[sidx_o],
                    mass=tabs.mass[sidx_o].astype(dtype),
                    E=E, px=px, py=py, pz=pz, t=t, x=x, y=y, z=z)
        casc["tau"] = np.sqrt(np.maximum(t * t - z * z, 0.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            casc["eta"] = 0.5 * np.log(
                np.maximum(t + z, 1e-45) / np.maximum(t - z, 1e-45))
            casc["yp"] = 0.5 * np.log(
                (E + pz) / np.maximum(E - pz, 1e-45))
        out_cols = {k: np.concatenate([np.asarray(pass_cols[k], dtype=v.dtype),
                                       v]) for k, v in casc.items()}
        eid_o = np.concatenate([eid_pass, eid_c])

    order = np.argsort(eid_o, kind="stable")
    bounds = np.searchsorted(eid_o[order], np.arange(len(events) + 1))
    out = []
    for e in range(len(events)):
        rows = order[bounds[e]:bounds[e + 1]]
        out.append({k: v[rows] for k, v in out_cols.items()})
    return out
