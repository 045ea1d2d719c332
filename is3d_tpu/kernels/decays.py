"""Resonance decay feed-down on smooth spectra (2- and 3-body).

The reference's routine (src/cpp/emissionfunction_resonance_decays.cpp) is
hard-disabled (unconditional exit at :128-129, "need to change the linear
interpolation's MTmax ..."), so this module is a fresh implementation of the
documented algorithm (documentation/resonance decays/*.tex; Sollfrank et al. /
"fast resonance decays" formulation the reference follows):

For each unstable parent resonance R (heaviest -> lightest) and each decay
channel R -> 1 + 2 (+ 3), the daughter spectrum gains

  dN_1/(pT dpT dphi dy) += (mult . b . M) / (8 pi? . pstar)   [2-body]
      * int dv dzeta  J(v) MT dN_R/(dY MT dMT dPhi)|_(Y, MT, Phi solutions)

evaluated with 12-pt Gauss-Legendre in the parent rapidity variable
v (Y = y + v DeltaY) and in zeta (MT = MTbar + DeltaMT cos zeta), with the
parent spectrum log-bilinearly interpolated on its (MT, Phip) grid and
exponentially extrapolated exp(c + s MT) beyond the grid.  The 3-body case
adds an outer 12-pt integral over the invariant mass squared s of the
(2,3) pair, normalized by the Q factor.  (Reference structure:
two_body_decay :296-815, three_body_decay :816-1412, interpolators
:1413-2030, MT tail fit :2032-2158, Q factor :99-121.)

All (pT, phi[, y], v, zeta[, s]) tensors are fixed-shape jnp einsum blocks --
one jit specialization per (dimension, n-body), reused for every channel.

Deliberate fixes of reference defects (beyond the disabling bug):
* the MT grid values where the parent spectrum is <= 0 are patched with the
  exponential tail fit before interpolation (the exact issue named in the
  disable message -- log(0) = -inf corrupting the bilinear stencil);
* Estar uses the *other* daughter's mass per group (the reference always uses
  particle_2's mass, :414-417, wrong when daughter 2 is the particle of
  interest of the group);
* the adjusted (width-shifted) masses used to open sub-threshold channels are
  used consistently in Estar/pstar (the reference adjusts, then reads the
  unadjusted table masses, which can make pstar = sqrt(negative) = NaN);
* cos(Phip_tilde) is clipped to [-1, 1] (the reference acos()'s values that
  exceed 1 by roundoff, :620-624 commented-out error);
* kinematically closed channels (sum of daughter masses above the parent
  mass that the width shift cannot open) are skipped instead of exiting.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

TWO_PI = 2.0 * math.pi
GAUSS_PTS = 12
_GL_X, _GL_W = np.polynomial.legendre.leggauss(GAUSS_PTS)
_Q_X, _Q_W = np.polynomial.legendre.leggauss(24)

MT_FIT_THRESHOLD2 = 2.73   # mT^2 > 2.73 M^2 for tail-fit points (ref :2063)


# ======================================================================
# parent-spectrum preparation (host, numpy)
# ======================================================================

def _tail_fit_and_patch(logdN, MT_grid, mT_min):
    """Per (phi[, y]) column: least-squares fit log dN = c + s MT on the
    relativistic, positive part; patch non-finite grid entries with the fit.

    logdN: (P, F, Y); MT_grid: (P,).  Returns (patched, const (F,Y), slope).
    """
    P, F, Y = logdN.shape
    const = np.zeros((F, Y))
    slope = np.zeros((F, Y))
    patched = logdN.copy()
    for f in range(F):
        for y in range(Y):
            col = logdN[:, f, y]
            finite = np.isfinite(col)
            pts = finite & (MT_grid > mT_min)
            if pts.sum() < 2:
                pts = finite.copy()
                if pts.sum() > 2:        # use the last two finite points
                    idx = np.nonzero(pts)[0][-2:]
                    pts[:] = False
                    pts[idx] = True
            if pts.sum() >= 2:
                A = np.stack([np.ones(pts.sum()), MT_grid[pts]], 1)
                x, *_ = np.linalg.lstsq(A, col[pts], rcond=None)
                const[f, y], slope[f, y] = x
            else:
                const[f, y], slope[f, y] = -745.0, 0.0
            bad = ~finite
            if bad.any():
                patched[bad, f, y] = const[f, y] + slope[f, y] * MT_grid[bad]
    return patched, const, slope


def _prepare_parent(parent_spectra, pT, mass_parent):
    """(P, F, Y) parent spectra -> (patched log, tail const/slope, MT grid)."""
    MT_grid = np.sqrt(pT ** 2 + mass_parent ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        logdN = np.where(parent_spectra > 0.0, np.log(
            np.where(parent_spectra > 0.0, parent_spectra, 1.0)), -np.inf)
    mT_min = MT_FIT_THRESHOLD2 ** 0.5 * mass_parent
    return (*_tail_fit_and_patch(logdN, MT_grid, mT_min), MT_grid)


# ======================================================================
# parent-spectrum evaluation (jnp, inside jit)
# ======================================================================

def _interp_phi_indices(phi_grid, Phip):
    """Wrap-around linear interpolation stencil in Phip.
    Returns (iL, iR, wL, wR)."""
    F = phi_grid.shape[0]
    inside = (Phip >= phi_grid[0]) & (Phip <= phi_grid[-1])
    iR_in = jnp.clip(jnp.searchsorted(phi_grid, Phip), 1, F - 1)
    iL_in = iR_in - 1
    # outside: between (phi[-1] - 2pi) and phi[0]; map angle near 0
    Phip_out = Phip - jnp.floor(Phip / math.pi) * TWO_PI
    phiL = jnp.where(inside, phi_grid[iL_in], phi_grid[-1] - TWO_PI)
    phiR = jnp.where(inside, phi_grid[iR_in], phi_grid[0])
    x = jnp.where(inside, Phip, Phip_out)
    iL = jnp.where(inside, iL_in, F - 1)
    iR = jnp.where(inside, iR_in, 0)
    t = (x - phiL) / (phiR - phiL)
    return iL, iR, 1.0 - t, t


def _eval_parent_2d(logdN, tc, ts, MT_grid, phi_grid, MT, Phip):
    """exp(log dN) at (MT, Phip), boost-invariant parent.
    logdN: (P, F) patched; tc/ts: (F,) tail fit; MT/Phip: any shape."""
    P = MT_grid.shape[0]
    iL, iR, wL, wR = _interp_phi_indices(phi_grid, Phip)

    iMR = jnp.clip(jnp.searchsorted(MT_grid, MT), 1, P - 1)
    iML = iMR - 1
    tM = (MT - MT_grid[iML]) / (MT_grid[iMR] - MT_grid[iML])

    bi = ((logdN[iML, iL] * wL + logdN[iML, iR] * wR) * (1.0 - tM)
          + (logdN[iMR, iL] * wL + logdN[iMR, iR] * wR) * tM)
    tail = (tc[iL] + ts[iL] * MT) * wL + (tc[iR] + ts[iR] * MT) * wR
    return jnp.exp(jnp.where(MT <= MT_grid[-1], bi, tail))


def _eval_parent_3d(logdN, tc, ts, MT_grid, phi_grid, y_grid, MT, Phip, Y):
    """Trilinear (MT, Phip, Y) evaluation; zero outside |Y| > Ymax.
    logdN: (P, F, NY); tc/ts: (F, NY)."""
    NY = y_grid.shape[0]
    iYR = jnp.clip(jnp.searchsorted(y_grid, Y), 1, NY - 1)
    iYL = iYR - 1
    tY = (Y - y_grid[iYL]) / (y_grid[iYR] - y_grid[iYL])

    def eval_plane(iY):
        P = MT_grid.shape[0]
        iL, iR, wL, wR = _interp_phi_indices(phi_grid, Phip)
        iMR = jnp.clip(jnp.searchsorted(MT_grid, MT), 1, P - 1)
        iML = iMR - 1
        tM = (MT - MT_grid[iML]) / (MT_grid[iMR] - MT_grid[iML])
        bi = ((logdN[iML, iL, iY] * wL + logdN[iML, iR, iY] * wR) * (1.0 - tM)
              + (logdN[iMR, iL, iY] * wL + logdN[iMR, iR, iY] * wR) * tM)
        tail = ((tc[iL, iY] + ts[iL, iY] * MT) * wL
                + (tc[iR, iY] + ts[iR, iY] * MT) * wR)
        return jnp.where(MT <= MT_grid[-1], bi, tail)

    logL = eval_plane(iYL)
    logR = eval_plane(iYR)
    out = jnp.exp(logL * (1.0 - tY) + logR * tY)
    return jnp.where(jnp.abs(Y) <= jnp.abs(y_grid[-1]), out, 0.0)


# ======================================================================
# decay integrals (jit)
# ======================================================================

def _decay_kinematics(pT, mass2_1, Estar, pstar, mass_parent, dtype):
    """(P, V) tables shared by 2-/3-body: MTbar, DeltaMT, v weights, etc."""
    v = jnp.asarray(_GL_X, dtype)
    wv = jnp.asarray(_GL_W, dtype)
    pT2 = pT ** 2
    mT2 = pT2 + mass2_1
    mT = jnp.sqrt(mT2)
    Estar2 = Estar ** 2
    DeltaY = jnp.log((pstar + jnp.sqrt(Estar2 + pT2)) / mT)       # (P,)

    coshv = jnp.cosh(v[None, :] * DeltaY[:, None])                # (P,V)
    mT2c2 = mT2[:, None] * coshv ** 2
    denom = mT2c2 - pT2[:, None]
    MTbar = Estar * mass_parent * mT[:, None] * coshv / denom
    DeltaMT = (mass_parent * pT[:, None]
               * jnp.sqrt(jnp.abs(Estar2 + pT2[:, None] - mT2c2)) / denom)
    mTcosh_over_pT = mT[:, None] * coshv / pT[:, None]
    vw = DeltaY[:, None] * wv[None, :] / jnp.sqrt(jnp.abs(denom))
    return MTbar, DeltaMT, mTcosh_over_pT, vw, DeltaY


def _parent_MT_Phip(pT, phi, MTbar, DeltaMT, mTcosh_over_pT, Estar,
                    mass_parent, dtype):
    """(P, F, V, Z) parent MT and the two Phip solutions."""
    x = jnp.asarray(_GL_X, dtype)
    coszeta = jnp.cos(0.5 * math.pi * (1.0 + x))                  # (Z,)
    MT = MTbar[:, :, None] + DeltaMT[:, :, None] * coszeta        # (P,V,Z)
    PT = jnp.sqrt(jnp.maximum(MT ** 2 - mass_parent ** 2, 1e-300))
    cosPhip_t = jnp.clip(
        (MT * mTcosh_over_pT[:, :, None] - (Estar * mass_parent / pT)[:, None, None])
        / PT, -1.0, 1.0)
    Phip_t = jnp.arccos(cosPhip_t)                                # (P,V,Z)
    Phip1 = jnp.mod(Phip_t[:, None] + phi[None, :, None, None], TWO_PI)
    Phip2 = jnp.mod(-Phip_t[:, None] + phi[None, :, None, None], TWO_PI)
    return MT[:, None], Phip1, Phip2                              # (P,1|F,V,Z)


@partial(jax.jit, static_argnames=("dimension",))
def _two_body_integral(logdN, tc, ts, MT_grid, pT, phi, y_grid,
                       mass2_1, Estar, pstar, mass_parent, dimension: int):
    """(P, F[, Y]) feed-down integral (without prefactor)."""
    dtype = logdN.dtype
    wz = jnp.asarray(_GL_W, dtype)
    MTbar, DeltaMT, mTc, vw, DeltaY = _decay_kinematics(
        pT, mass2_1, Estar, pstar, mass_parent, dtype)
    MT, Phip1, Phip2 = _parent_MT_Phip(pT, phi, MTbar, DeltaMT, mTc, Estar,
                                       mass_parent, dtype)
    if dimension == 2:
        dN = (_eval_parent_2d(logdN[:, :, 0], tc[:, 0], ts[:, 0], MT_grid,
                              phi, MT, Phip1)
              + _eval_parent_2d(logdN[:, :, 0], tc[:, 0], ts[:, 0], MT_grid,
                                phi, MT, Phip2))
        integrand = MT * dN                                       # (P,F,V,Z)
        zsum = jnp.einsum("pfvz,z->pfv", integrand, wz)
        out = jnp.einsum("pfv,pv->pf", zsum, vw)
        return out[:, :, None]
    else:
        v = jnp.asarray(_GL_X, dtype)
        Y = y_grid[None, None, :] + v[None, :, None] * DeltaY[:, None, None]
        # Y: (P, V, NY) -> (P, 1, NY, V, 1) to broadcast with (P, F, NY, V, Z)
        Yb = jnp.transpose(Y, (0, 2, 1))[:, None, :, :, None]
        MTb = MT[:, :, None]                                      # (P,1,1,V,Z)
        P1 = Phip1[:, :, None]
        P2 = Phip2[:, :, None]
        dN = (_eval_parent_3d(logdN, tc, ts, MT_grid, phi, y_grid,
                              MTb, P1, Yb)
              + _eval_parent_3d(logdN, tc, ts, MT_grid, phi, y_grid,
                                MTb, P2, Yb))
        integrand = MTb * dN                                      # (P,F,NY,V,Z)
        zsum = jnp.einsum("pfyvz,z->pfyv", integrand, wz)
        return jnp.einsum("pfyv,pv->pfy", zsum, vw)


@partial(jax.jit, static_argnames=("dimension",))
def _three_body_integral(logdN, tc, ts, MT_grid, pT, phi, y_grid,
                         mass2_1, mass_parent, s_minus, s_plus, d,
                         dimension: int):
    """Outer s-integral of the 2-body kernel (without prefactor)."""
    dtype = logdN.dtype
    x = jnp.asarray(_GL_X, dtype)
    w = jnp.asarray(_GL_W, dtype)
    s = s_minus + (s_plus - s_minus) * (1.0 + x) / 2.0            # (S,)
    Estar = (mass_parent ** 2 + mass2_1 - s) / (2.0 * mass_parent)
    pstar = jnp.sqrt(jnp.maximum(Estar ** 2 - mass2_1, 1e-300))
    sw = w * jnp.sqrt(jnp.abs((s - s_minus) * (s - d))) / s       # (S,)

    def per_s(args):
        Estar_k, pstar_k = args
        return _two_body_integral(logdN, tc, ts, MT_grid, pT, phi, y_grid,
                                  mass2_1, Estar_k, pstar_k, mass_parent,
                                  dimension)

    outs = jax.lax.map(per_s, (Estar, pstar))                     # (S,P,F,Y)
    return jnp.einsum("spfy,s->pfy", outs, sw)


# ---- batched (per-parent) wrappers: one dispatch for all channel-groups

@partial(jax.jit, static_argnames=("dimension", "K"))
def _two_body_batch(logdN, tc, ts, pT, phi, y_grid, MT_grids, m2s, Estars,
                    pstars, Ms, dimension: int, K: int):
    f = lambda MTg, m2, Es, ps, M: _two_body_integral(
        logdN, tc, ts, MTg, pT, phi, y_grid, m2, Es, ps, M, dimension)
    return jax.vmap(f)(MT_grids, m2s, Estars, pstars, Ms)


@partial(jax.jit, static_argnames=("dimension", "K"))
def _three_body_batch(logdN, tc, ts, pT, phi, y_grid, MT_grids, m2s, Ms,
                      s_minus, s_plus, ds, dimension: int, K: int):
    f = lambda MTg, m2, M, sm, sp_, d_: _three_body_integral(
        logdN, tc, ts, MTg, pT, phi, y_grid, m2, M, sm, sp_, d_, dimension)
    return jax.vmap(f)(MT_grids, m2s, Ms, s_minus, s_plus, ds)


TASK_BUCKET = 8   # fixed vmap width: exactly one compiled shape per topology


def _run_two_body_tasks(tasks, logdN, tc, ts, pT, phi, y_grid, dimension,
                        spectra):
    """tasks: list of (target_row, prefactor, MT_grid, m2, Estar, pstar, M).
    Dispatched in fixed-size buckets (padding repeats task 0 with zero
    prefactor applied host-side), so only one jit specialization exists."""
    B = TASK_BUCKET
    for lo in range(0, len(tasks), B):
        chunk = tasks[lo:lo + B]
        pad = B - len(chunk)
        full = chunk + [chunk[0]] * pad
        MTg = np.stack([t[2] for t in full])
        m2 = np.array([t[3] for t in full])
        Es = np.array([t[4] for t in full])
        ps = np.array([t[5] for t in full])
        Ms = np.array([t[6] for t in full])
        out = np.asarray(_two_body_batch(
            jnp.asarray(logdN), jnp.asarray(tc), jnp.asarray(ts),
            jnp.asarray(pT), jnp.asarray(phi), jnp.asarray(y_grid),
            jnp.asarray(MTg), jnp.asarray(m2), jnp.asarray(Es),
            jnp.asarray(ps), jnp.asarray(Ms), dimension, B))
        for k, t in enumerate(chunk):
            spectra[t[0]] += t[1] * out[k]


def _run_three_body_tasks(tasks, logdN, tc, ts, pT, phi, y_grid, dimension,
                          spectra):
    """tasks: (target_row, prefactor, MT_grid, m2, M, s_minus, s_plus, d)."""
    B = TASK_BUCKET
    for lo in range(0, len(tasks), B):
        chunk = tasks[lo:lo + B]
        pad = B - len(chunk)
        full = chunk + [chunk[0]] * pad
        MTg = np.stack([t[2] for t in full])
        m2 = np.array([t[3] for t in full])
        Ms = np.array([t[4] for t in full])
        sm = np.array([t[5] for t in full])
        sp_ = np.array([t[6] for t in full])
        ds = np.array([t[7] for t in full])
        out = np.asarray(_three_body_batch(
            jnp.asarray(logdN), jnp.asarray(tc), jnp.asarray(ts),
            jnp.asarray(pT), jnp.asarray(phi), jnp.asarray(y_grid),
            jnp.asarray(MTg), jnp.asarray(m2), jnp.asarray(Ms),
            jnp.asarray(sm), jnp.asarray(sp_), jnp.asarray(ds), dimension, B))
        for k, t in enumerate(chunk):
            spectra[t[0]] += t[1] * out[k]


# ======================================================================
# driver (host)
# ======================================================================

def _group_daughters(daughter_idx, chosen_pos):
    """Group chosen daughters by species -> list of (table_idx, multiplicity,
    other_daughter_table_indices)."""
    groups = {}
    for i, di in enumerate(daughter_idx):
        if di in chosen_pos:
            if di not in groups:
                others = list(daughter_idx)
                others.remove(di)
                groups[di] = [0, others]
            groups[di][0] += 1
    return [(di, mult, others) for di, (mult, others) in groups.items()]


def do_resonance_decays(spectra, table, mcids, grid, cfg) -> np.ndarray:
    """Apply 2-/3-body decay feed-down to smooth spectra in place.

    spectra: (S, PT, PHI, Y) numpy array in chosen-particle (mcids) order.
    Parents are processed heaviest -> lightest so that feed-down cascades
    (reference do_resonance_decays loop order, :143-203).
    Returns the updated spectra array.
    """
    # the decay quadrature is float64 and latency- rather than
    # throughput-bound; run it on the host CPU device even when a TPU is
    # attached (f64 is emulated on TPU)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return _do_resonance_decays_impl(spectra, table, mcids, grid, cfg)


def _do_resonance_decays_impl(spectra, table, mcids, grid, cfg) -> np.ndarray:
    spectra = np.array(spectra, dtype=np.float64, copy=True)
    mcids = np.asarray(mcids)
    S = spectra.shape[0]
    pT = np.asarray(grid.pT, dtype=np.float64)
    phi = np.asarray(grid.phi, dtype=np.float64)
    y_grid = np.asarray(grid.y, dtype=np.float64)
    dimension = int(cfg.dimension)

    chosen_table_idx = np.array([table.index_of_mcid(int(m)) for m in mcids])
    chosen_pos = {int(ti): i for i, ti in enumerate(chosen_table_idx)}

    # heaviest -> lightest among chosen, skip the lightest particle
    order = np.argsort(-table.mass[chosen_table_idx], kind="stable")
    lightest = cfg.lightest_particle

    n_channels_done = 0
    for ichosen in order:
        ti = int(chosen_table_idx[ichosen])
        if table.stable[ti]:
            continue
        if int(mcids[ichosen]) == int(lightest):
            continue
        mass_parent0 = float(table.mass[ti])
        width_parent = float(table.width[ti])

        parent = spectra[ichosen]                                 # (P,F,Y)
        if not np.any(parent > 0.0):
            continue
        logdN, tc, ts, MT_grid0 = _prepare_parent(parent, pT, mass_parent0)
        tasks2 = []            # batched per parent: one dispatch for all
        tasks3 = []            # 2-body / 3-body channel-groups

        nch = len(table.decays_branch[ti])
        for ch in range(nch):
            branch = float(table.decays_branch[ti][ch])
            nd = abs(int(table.decays_n[ti][ch]))
            if branch <= 0.0 or nd in (0, 1) or nd > 3:
                continue
            d_mcids = [int(m) for m in table.decays_part[ti][ch][:nd]]
            try:
                d_idx = [table.index_of_mcid(m) for m in d_mcids]
            except KeyError:
                continue

            if nd == 2:
                i1, i2 = d_idx
                m1 = float(table.mass[i1])
                m2 = float(table.mass[i2])
                M = mass_parent0
                # width shift to open sub-threshold channels (ref :242-258)
                closed = False
                while m1 + m2 > M:
                    M += 0.25 * width_parent
                    m1 -= 0.5 * float(table.width[i1])
                    m2 -= 0.5 * float(table.width[i2])
                    if m1 < 0.0 or m2 < 0.0:
                        closed = True
                        break
                if closed:
                    continue
                adj_mass = {i1: m1, i2: m2}
                MT_grid = np.sqrt(pT ** 2 + M ** 2)
                for di, mult, others in _group_daughters(d_idx, chosen_pos):
                    ma = adj_mass[di]
                    # the *other* daughter's mass (see module docstring)
                    mb = adj_mass[others[0]]
                    Estar = (M * M + ma * ma - mb * mb) / (2.0 * M)
                    pstar2 = Estar * Estar - ma * ma
                    if pstar2 <= 0.0:
                        continue
                    pstar = math.sqrt(pstar2)
                    pref = mult * M * branch / (8.0 * pstar)
                    tasks2.append((chosen_pos[di], pref, MT_grid, ma * ma,
                                   Estar, pstar, M))
                    n_channels_done += 1
            else:  # nd == 3
                M = mass_parent0
                for di, mult, others in _group_daughters(d_idx, chosen_pos):
                    ma = float(table.mass[di])
                    mb = float(table.mass[others[0]])
                    mc_ = float(table.mass[others[1]])
                    s_plus = (M - ma) ** 2
                    s_minus = (mb + mc_) ** 2
                    d_ = (mb - mc_) ** 2
                    if s_plus <= s_minus:
                        continue  # kinematically closed at nominal masses
                    Q = _q_factor(M, ma, mb, mc_)
                    if Q <= 0.0:
                        continue
                    MT_grid = np.sqrt(pT ** 2 + M ** 2)
                    pref = mult * M * M * (s_plus - s_minus) * branch / (8.0 * Q)
                    tasks3.append((chosen_pos[di], pref, MT_grid, ma * ma,
                                   M, s_minus, s_plus, d_))
                    n_channels_done += 1

        # one batched dispatch per parent for each decay topology
        _run_two_body_tasks(tasks2, logdN, tc, ts, pT, phi, y_grid,
                            dimension, spectra)
        _run_three_body_tasks(tasks3, logdN, tc, ts, pT, phi, y_grid,
                              dimension, spectra)

    print(f"Resonance decays: {n_channels_done} channel-contributions added")
    return spectra


def _q_factor(M, m1, m2, m3):
    """Normalization Q = int_{s-}^{s+} ds g(s) (reference :99-121)."""
    a = (M + m1) ** 2
    b = (M - m1) ** 2
    c = (m2 + m3) ** 2
    d = (m2 - m3) ** 2
    s = c + (b - c) * (1.0 + _Q_X) / 2.0
    return float(np.sum(_Q_W * (b - c)
                        * np.sqrt(np.abs((a - s) * (b - s) * (s - c) * (s - d)))
                        / (2.0 * s)))
