"""Monte-Carlo event-level decay cascade (kernels/mc_decays.py).

Validation strategy (no reference counterpart exists -- the reference
delegates sampled-event decays to an external afterburner):

1. exact conservation laws per decay (energy-momentum, on-shell daughters,
   timelike-forward vertices),
2. analytic rest-frame targets (2-body line energy, isotropy moments,
   3-body m23 phase-space distribution vs the same g(s) weight the smooth
   feed-down integral uses),
3. channel statistics vs branching ratios,
4. cascade semantics (chain termination, event bookkeeping, determinism),
5. statistical cross-validation against the smooth feed-down cascade
   (kernels/decays.py) on the real PDG table.
"""

import math

import numpy as np
import pytest

from is3d_tpu.io.pdg import ParticleTable
from is3d_tpu.kernels import mc_decays as mcd
from is3d_tpu.units import HBARC


# ----------------------------------------------------------------------
# synthetic tables
# ----------------------------------------------------------------------

def _mk_table(rows, decays):
    """rows: list of (mcid, mass, width, stable). decays: {mcid: [(branch,
    [daughter mcids])]}."""
    n = len(rows)
    mcids = np.array([r[0] for r in rows], dtype=np.int64)
    z = np.zeros(n)
    tab = ParticleTable(
        mc_id=mcids, name=[f"p{r[0]}" for r in rows],
        mass=np.array([r[1] for r in rows]),
        width=np.array([r[2] for r in rows]),
        gspin=np.ones(n), baryon=z.astype(int), strange=z.astype(int),
        charm=z.astype(int), bottom=z.astype(int), gisospin=z.astype(int),
        charge=z.astype(int), sign=-np.ones(n, dtype=int),
        stable=np.array([r[3] for r in rows], dtype=bool))
    for mcid, _, _, _ in rows:
        chs = decays.get(mcid, [])
        tab.decays_n.append(np.array([len(d) for _, d in chs] or [1]))
        tab.decays_branch.append(np.array([b for b, _ in chs] or [1.0]))
        parts = [list(d) + [0] * (5 - len(d)) for _, d in chs] or [[mcid, 0, 0, 0, 0]]
        tab.decays_part.append(np.array(parts, dtype=np.int64))
    return tab


RHO_TABLE = _mk_table(
    [(113, 0.7752, 0.1491, False), (211, 0.1396, 0.0, True),
     (-211, 0.1396, 0.0, True)],
    {113: [(1.0, [211, -211])]})

OMEGA_TABLE = _mk_table(
    [(223, 0.7827, 8.49e-3, False), (211, 0.1396, 0.0, True),
     (-211, 0.1396, 0.0, True), (111, 0.1350, 0.0, True)],
    {223: [(1.0, [211, -211, 111])]})

CHAIN_TABLE = _mk_table(
    # A -> B + c, B -> d + e: two-generation chain
    [(900, 2.0, 0.1, False), (901, 1.2, 0.2, False), (902, 0.3, 0.0, True),
     (903, 0.4, 0.0, True), (904, 0.5, 0.0, True)],
    {900: [(1.0, [901, 902])], 901: [(1.0, [903, 904])]})


def _events_of(mcid, mass, p4s, t0=1.0):
    """Build one event dict holding len(p4s) copies of a species."""
    p = np.asarray(p4s, dtype=np.float64)
    n = len(p)
    E = np.sqrt(mass**2 + (p**2).sum(axis=1))
    zeros = np.zeros(n)
    return [dict(mcid=np.full(n, mcid, dtype=np.int64), mass=np.full(n, mass),
                 E=E, px=p[:, 0], py=p[:, 1], pz=p[:, 2],
                 t=np.full(n, t0), x=zeros, y=zeros, z=zeros,
                 tau=np.full(n, t0), eta=zeros, yp=zeros)]


def _p4sum(ev):
    return np.array([ev[k].sum() for k in ("E", "px", "py", "pz")])


# ----------------------------------------------------------------------
# conservation + kinematics
# ----------------------------------------------------------------------

def test_two_body_conservation_and_onshell():
    rng = np.random.default_rng(1)
    p4s = rng.normal(0.0, 1.2, size=(4000, 3))
    ev = _events_of(113, 0.7752, p4s)
    out = mcd.decay_events(ev, RHO_TABLE, seed=3)
    assert len(out) == 1
    o = out[0]
    assert len(o["E"]) == 8000
    assert set(np.unique(o["mcid"])) == {-211, 211}
    # per-event four-momentum conserved
    np.testing.assert_allclose(_p4sum(o), _p4sum(ev[0]), rtol=1e-9)
    # daughters exactly on-shell
    m2 = o["E"]**2 - o["px"]**2 - o["py"]**2 - o["pz"]**2
    np.testing.assert_allclose(m2, 0.1396**2, rtol=1e-6)


def test_two_body_rest_frame_line_energy():
    """A rho at rest gives pions at exactly E* = M/2 with back-to-back p."""
    ev = _events_of(113, 0.7752, np.zeros((500, 3)))
    o = mcd.decay_events(ev, RHO_TABLE, seed=5)[0]
    np.testing.assert_allclose(o["E"], 0.7752 / 2.0, rtol=1e-9)
    # pairwise momentum balance: total is zero per event by conservation
    assert abs(o["px"].sum()) < 1e-8


def test_two_body_isotropy():
    """cos(theta) of daughter 1 in the parent rest frame is uniform."""
    ev = _events_of(113, 0.7752, np.zeros((20000, 3)))
    o = mcd.decay_events(ev, RHO_TABLE, seed=7)[0]
    sel = o["mcid"] == 211
    p = np.sqrt(o["px"][sel]**2 + o["py"][sel]**2 + o["pz"][sel]**2)
    cth = o["pz"][sel] / p
    # moments of U[-1, 1]: mean 0 (se ~ 1/sqrt(3N)), var 1/3
    n = sel.sum()
    assert abs(cth.mean()) < 4.0 / math.sqrt(3 * n)
    assert abs(cth.var() - 1.0 / 3.0) < 0.01
    phi = np.arctan2(o["py"][sel], o["px"][sel])
    assert abs(np.mean(np.cos(2 * phi))) < 4.0 / math.sqrt(0.5 * n)


def test_three_body_conservation_and_m23_shape():
    """omega -> 3pi at rest: conservation + m23 matches phase space g(s)."""
    M, mpi = 0.7827, 0.1396
    m23_pi0 = 0.1350
    ev = _events_of(223, M, np.zeros((30000, 3)))
    o = mcd.decay_events(ev, OMEGA_TABLE, seed=11)[0]
    assert len(o["E"]) == 90000
    np.testing.assert_allclose(_p4sum(o), _p4sum(ev[0]), rtol=1e-9, atol=1e-7)
    # m23 of the (pi-, pi0) pair recovered per decay: group by triples
    # (daughter order within an event is cascade-internal, so recompute the
    # pair mass from total minus the pi+)
    sel = o["mcid"] == 211
    E23 = M - o["E"][sel]
    p23 = np.stack([-o["px"][sel], -o["py"][sel], -o["pz"][sel]], axis=1)
    m23 = np.sqrt(np.maximum(E23**2 - (p23**2).sum(axis=1), 0.0))
    lo, hi = mpi + m23_pi0, M - mpi
    assert m23.min() > lo - 1e-6 and m23.max() < hi + 1e-6
    # histogram vs g(m23) ~ p*(M, m1, m23) p*(m23, m2, m3)
    g = np.linspace(lo, hi, 41)
    centers = 0.5 * (g[1:] + g[:-1])
    w = (mcd._pstar(M, mpi, centers) * mcd._pstar(centers, mpi, m23_pi0))
    w /= w.sum()
    hist, _ = np.histogram(m23, bins=g)
    frac = hist / hist.sum()
    # multinomial fluctuation scale
    err = np.sqrt(np.maximum(w * (1 - w) / hist.sum(), 1e-12))
    assert np.all(np.abs(frac - w) < 6 * err + 0.1 * w)


def test_decay_vertex_timelike_and_lifetime():
    """Vertices lie forward on the parent world line; proper time is
    exponential with mean hbar*c / Gamma."""
    rng = np.random.default_rng(2)
    p4s = rng.normal(0.0, 0.8, size=(20000, 3))
    ev = _events_of(113, 0.7752, p4s, t0=5.0)
    o = mcd.decay_events(ev, RHO_TABLE, seed=13)[0]
    dt = o["t"] - 5.0
    dr = np.sqrt(o["x"]**2 + o["y"]**2 + o["z"]**2)
    assert np.all(dt >= 0.0)
    assert np.all(dr <= dt + 1e-9)          # inside the light cone
    # dt = tau_proper * E/M with tau ~ Exp(HBARC / Gamma) independent of E,
    # so <dt> = (HBARC / Gamma) <E> / M
    M = 0.7752
    Ep = np.sqrt(M**2 + (p4s**2).sum(axis=1))
    want = (HBARC / 0.1491) * np.mean(Ep) / M
    np.testing.assert_allclose(np.mean(dt), want, rtol=0.1)
    # daughters of one decay share the vertex: distinct vertex count is
    # the parent count, not the hadron count
    assert len(np.unique(np.round(o["t"], 10))) <= len(p4s) + 1


# ----------------------------------------------------------------------
# channel statistics + cascade semantics
# ----------------------------------------------------------------------

def test_branching_ratios():
    tab = _mk_table(
        [(800, 1.5, 0.2, False), (801, 0.2, 0.0, True), (802, 0.3, 0.0, True),
         (803, 0.4, 0.0, True)],
        {800: [(0.6, [801, 801]), (0.3, [802, 802]), (0.1, [801, 802, 803])]})
    ev = _events_of(800, 1.5, np.zeros((30000, 3)))
    o = mcd.decay_events(ev, tab, seed=17)[0]
    n3 = (o["mcid"] == 803).sum()
    n_ch2 = ((o["mcid"] == 802).sum() - n3) // 2
    n_ch1 = ((o["mcid"] == 801).sum() - n3) // 2
    tot = n3 + n_ch1 + n_ch2
    assert tot == 30000
    for frac, want in ((n_ch1 / tot, 0.6), (n_ch2 / tot, 0.3),
                       (n3 / tot, 0.1)):
        assert abs(frac - want) < 5 * math.sqrt(want * (1 - want) / tot)


def test_chain_cascade_terminates():
    """A -> B + c, B -> d + e runs to the stable leaves in one call."""
    rng = np.random.default_rng(3)
    ev = _events_of(900, 2.0, rng.normal(0, 1, (3000, 3)))
    o = mcd.decay_events(ev, CHAIN_TABLE, seed=19)[0]
    assert sorted(np.unique(o["mcid"])) == [902, 903, 904]
    assert len(o["E"]) == 9000
    np.testing.assert_allclose(_p4sum(o), _p4sum(ev[0]), rtol=1e-9)


def test_closed_channels_renormalize_and_stabilize():
    """Sub-threshold-only species become stable; partially closed tables
    renormalize over the open channels (documented divergence from the
    smooth cascade's width-shift)."""
    tab = _mk_table(
        [(810, 0.5, 0.1, False), (811, 0.4, 0.0, True), (812, 0.3, 0.0, True)],
        {810: [(1.0, [811, 812])]})       # 0.7 > 0.5: closed
    t = mcd.build_decay_tables(tab)
    assert t.stable.all()
    ev = _events_of(810, 0.5, np.zeros((10, 3)))
    o = mcd.decay_events(ev, tab, seed=23)[0]
    assert np.all(o["mcid"] == 810)       # untouched

    tab2 = _mk_table(
        [(820, 1.0, 0.1, False), (821, 0.4, 0.0, True), (822, 0.3, 0.0, True)],
        {820: [(0.5, [821, 821, 821]), (0.5, [821, 822])]})  # first closed
    o2 = mcd.decay_events(_events_of(820, 1.0, np.zeros((50, 3))), tab2,
                          seed=23)[0]
    assert sorted(np.unique(o2["mcid"])) == [821, 822]
    assert len(o2["E"]) == 100            # all through the open 2-body


def test_lightest_particle_not_decayed():
    """mc id == lightest_particle is pinned stable (pi0 semantics)."""
    tab = _mk_table(
        [(111, 0.1350, 7.8e-9, False), (22, 0.0, 0.0, True)],
        {111: [(1.0, [22, 22])]})
    ev = _events_of(111, 0.1350, np.zeros((10, 3)))
    o = mcd.decay_events(ev, tab, seed=29, lightest_particle=111)[0]
    assert np.all(o["mcid"] == 111)
    o2 = mcd.decay_events(ev, tab, seed=29, lightest_particle=22)[0]
    assert np.all(o2["mcid"] == 22)


def test_event_bookkeeping_and_determinism():
    rng = np.random.default_rng(4)
    evs = []
    for n in (7, 0, 31):
        e = _events_of(113, 0.7752, rng.normal(0, 1, (max(n, 1), 3)))[0]
        if n == 0:
            e = {k: v[:0] for k, v in e.items()}
        evs.append(e)
    out1 = mcd.decay_events(evs, RHO_TABLE, seed=31)
    out2 = mcd.decay_events(evs, RHO_TABLE, seed=31)
    out3 = mcd.decay_events(evs, RHO_TABLE, seed=32)
    assert [len(e["E"]) for e in out1] == [14, 0, 62]
    for a, b in zip(out1, out2):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    assert not np.array_equal(out1[0]["px"], out3[0]["px"])
    # derived fields consistent
    o = out1[2]
    np.testing.assert_allclose(o["tau"]**2, np.maximum(
        o["t"]**2 - o["z"]**2, 0.0), atol=1e-9)


def test_partition_invariant_lineage_streams():
    """Decaying any event-slice partition with its true global offsets is
    BYTE-identical to decaying the full list in one call: lineage keys
    depend on (seed, global event, in-event ordinal, decay path), never on
    batch position (DECAY_STREAM_VERSION 2; the pod sampler's decays-on
    byte-identity rides on exactly this invariance).  Uses the chain table
    so multi-generation daughters (whose slots land at partition-dependent
    positions) are covered too."""
    rng = np.random.default_rng(11)
    evs = []
    for n in (5, 3, 0, 17, 9):
        e = _events_of(900, 2.0, rng.normal(0, 0.7, (max(n, 1), 3)))[0]
        if n == 0:
            e = {k: v[:0] for k, v in e.items()}
        evs.append(e)
    full = mcd.decay_events(evs, CHAIN_TABLE, seed=77)
    # uneven 3-way split: offsets 0, 2, 3
    for lo, hi in ((0, 2), (2, 3), (3, 5)):
        part = mcd.decay_events(evs[lo:hi], CHAIN_TABLE, seed=77,
                                event_offset=lo)
        assert len(part) == hi - lo
        for a, b in zip(full[lo:hi], part):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # per-event singleton slices too (the finest possible partition)
    for i in range(len(evs)):
        one = mcd.decay_events(evs[i:i + 1], CHAIN_TABLE, seed=77,
                               event_offset=i)
        for k in full[i]:
            np.testing.assert_array_equal(full[i][k], one[0][k], err_msg=k)


def test_unknown_mcid_raises():
    ev = _events_of(999999, 1.0, np.zeros((3, 3)))
    with pytest.raises(KeyError):
        mcd.decay_events(ev, RHO_TABLE, seed=1)


# ----------------------------------------------------------------------
# real table: structure + smooth-cascade cross-validation
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def real_table(reference_dir):
    from is3d_tpu.io import pdg
    return pdg.read_resonances(f"{reference_dir}/PDG", 1)


def test_real_table_builds_and_terminates(real_table):
    t = mcd.build_decay_tables(real_table)
    assert t.n_passes >= 3
    assert t.maxmult.max() >= 4
    # every non-stable species has a normalized open-channel table
    unstable = ~t.stable
    np.testing.assert_allclose(t.cum[unstable].max(axis=1), 1.0, atol=1e-12)
    # sample a few heavy resonances through the full cascade
    heavy = np.argsort(real_table.mass)[-5:]
    for s in heavy:
        if t.stable[s]:
            continue
        ev = _events_of(int(real_table.mc_id[s]), float(real_table.mass[s]),
                        np.zeros((200, 3)))
        # decay_events itself asserts full termination (raises otherwise)
        o = mcd.decay_events(ev, real_table, seed=int(s))[0]
        np.testing.assert_allclose(_p4sum(o), _p4sum(ev[0]),
                                   rtol=1e-7, atol=1e-7)


def test_api_operation2_decays_events(tmp_path, reference_dir):
    """IS3D wiring: operation=2 with do_resonance_decays=1 runs the MC
    cascade on the sampled events -- output holds only stable hadrons and
    the OSCAR writer accepts the decayed schema."""
    import os
    from is3d_tpu.api import IS3D
    from is3d_tpu.config import Config

    chosen = tmp_path / "chosen.dat"
    chosen.write_text("211\n-211\n113\n223\n")
    rng = np.random.default_rng(12)
    n = 12
    cols = dict(
        tau=rng.uniform(1, 4, n), x=rng.uniform(-2, 2, n),
        y=rng.uniform(-2, 2, n), eta=np.zeros(n),
        dat=rng.uniform(0.2, 1.0, n), dax=rng.uniform(-0.2, 0.2, n),
        day=rng.uniform(-0.2, 0.2, n), dan=np.zeros(n),
        ux=rng.uniform(-0.3, 0.3, n), uy=rng.uniform(-0.3, 0.3, n),
        un=np.zeros(n),
        E=rng.uniform(0.25, 0.4, n), T=rng.uniform(0.15, 0.16, n),
        P=rng.uniform(0.04, 0.08, n),
        pixx=np.zeros(n), pixy=np.zeros(n), pixn=np.zeros(n),
        piyy=np.zeros(n), piyn=np.zeros(n), bulkPi=np.zeros(n))

    def run(decays):
        cfg = Config(operation=2, mode=1, dimension=2, df_mode=1, hrg_eos=1,
                     do_resonance_decays=decays, sampler_seed=97,
                     max_num_samples=4, min_num_hadrons=1.0, y_cut=3.0)
        r = IS3D(cfg, data_dir=reference_dir,
                 results_dir=str(tmp_path / f"res{decays}"),
                 chosen_file=str(chosen))
        r.read_fo_surf_from_memory(**cols)
        return r.run_particlization(write_files=True).events

    raw = run(0)
    n_raw = sum(len(e["E"]) for e in raw)
    n_res = sum(int(np.isin(e["mcid"], (113, 223)).sum()) for e in raw)
    assert n_raw > 0 and n_res > 0      # resonances actually sampled

    dec = run(1)
    assert len(dec) == len(raw)
    tabs = mcd.build_decay_tables(
        __import__("is3d_tpu.io.pdg", fromlist=["pdg"]).read_resonances(
            f"{reference_dir}/PDG", 1))
    stable_ids = set(tabs.mc_id[tabs.stable].tolist())
    for e in dec:
        assert set(np.unique(e["mcid"])) <= stable_ids
        for k in ("E", "px", "py", "pz", "t", "x", "y", "z",
                  "tau", "eta", "yp", "mass"):
            assert len(e[k]) == len(e["mcid"])
    assert sum(len(e["E"]) for e in dec) > n_raw  # decays add hadrons
    assert os.path.exists(tmp_path / "res1" / "particle_list_osc.dat")


def test_mc_vs_smooth_feed_down_yield(real_table):
    """Statistical twin check: decaying sampled rho(770) events gives the
    same pi+ multiplicity as the smooth feed-down's yield bookkeeping
    (branch * multiplicity per parent, exactly, since rho -> 2pi is the
    only channel)."""
    t = mcd.build_decay_tables(real_table)
    s_rho = real_table.index_of_mcid(113)
    assert not t.stable[s_rho]
    rng = np.random.default_rng(6)
    n_par = 5000
    ev = _events_of(113, float(real_table.mass[s_rho]),
                    rng.normal(0, 0.7, (n_par, 3)))
    o = mcd.decay_events(ev, real_table, seed=41)[0]
    # rho0 -> pi+ pi- with BR 1: exactly one pi+ per parent
    br_pip = 0.0
    for ch in range(len(real_table.decays_branch[s_rho])):
        nd = abs(int(real_table.decays_n[s_rho][ch]))
        d = [int(m) for m in real_table.decays_part[s_rho][ch][:nd]]
        br_pip += float(real_table.decays_branch[s_rho][ch]) * d.count(211)
    got = (o["mcid"] == 211).sum() / n_par
    assert abs(got - br_pip) < 0.05 * max(br_pip, 0.1), (got, br_pip)


def test_mc_decays_spectra_match_smooth_feed_down(real_table, reference_dir):
    """Full twin check on momentum spectra: sampling rho0+pions and running
    the event-level MC cascade must reproduce the pion dN/dy and pT shape
    of smooth Cooper-Frye spectra + the smooth feed-down cascade
    (kernels/decays.py) on the same surface -- the two independent decay
    implementations are cross-validated through the sampler (reference
    methodology scripts/compare_sampling_smooth.py, extended to feed-down).
    Both comparisons are exact in expectation for a boost-invariant
    surface: daughter pT is invariant under longitudinal boosts, so the
    all-daughter histogram / (2 y_cut nev) estimates the y-differential
    feed-down spectrum without edge corrections."""
    import jax.numpy as jnp
    from is3d_tpu.config import Config
    from is3d_tpu.data import SpeciesArrays
    from is3d_tpu.io import pdg, deltaf as deltaf_io
    from is3d_tpu.io.tables import native_momentum_grid
    from is3d_tpu.kernels.smooth import smooth_spectra
    from is3d_tpu.kernels.sample import sample_particles
    from is3d_tpu.kernels.decays import do_resonance_decays
    from is3d_tpu import observables
    from test_sampler import small_surface, equilibrium_density, PLASMA
    from oracle import bin_fractions_from_grid

    table = real_table
    ids = [211, -211, 113]
    idx = pdg.chosen_indices(table, ids)
    mcids = table.mc_id[idx].astype(np.int32)
    i_pip = int(np.where(mcids == 211)[0][0])
    sp = SpeciesArrays(
        mass=jnp.asarray(table.mass[idx]),
        sign=jnp.asarray(table.sign[idx], dtype=jnp.float64),
        degeneracy=jnp.asarray(table.gspin[idx]),
        baryon=jnp.asarray(table.baryon[idx], dtype=jnp.float64),
        equilibrium_density=jnp.zeros(len(idx)),
        bulk_density=jnp.zeros(len(idx)),
        diff_density=jnp.zeros(len(idx)))
    neq = equilibrium_density(np.asarray(sp.mass), np.asarray(sp.degeneracy),
                              np.asarray(sp.sign), np.asarray(sp.baryon),
                              0.155)
    sp = sp.replace(equilibrium_density=jnp.asarray(neq))
    df_data = deltaf_io.build_deltaf_data(
        f"{reference_dir}/deltaf_coefficients", hrg_eos=1,
        particle_table=table, T_avg=0.155)

    surf = small_surface(n=24, seed=11)
    y_cut = 4.0
    cfg = Config(operation=2, dimension=2, df_mode=1, y_cut=y_cut,
                 sampler_seed=21)     # ideal df: both sides exactly equal

    # smooth side: CF spectra then the wave-levelized feed-down
    grid = native_momentum_grid(dimension=2, n_pT=48, pT_max=5.0, n_phi=24,
                                n_eta=48)
    spectra = np.asarray(smooth_spectra(
        surf, sp, grid, df_data, cfg.replace(operation=1, cell_chunk=32)))
    decayed = do_resonance_decays(spectra.copy(), table, mcids, grid, cfg)
    dNdy_sm = np.asarray(observables.dN_dy(jnp.asarray(decayed), grid))[:, 0]
    dNpT_sm = np.asarray(observables.dN_twopipTdpTdy(
        jnp.asarray(decayed), grid))[i_pip, :, 0]

    # sampled side: sample all three species, MC-decay the rho0s
    nev = 1000
    events = sample_particles(surf, sp, mcids, None, df_data, cfg, PLASMA,
                              nevents=nev)
    n_rho = sum(int((e["mcid"] == 113).sum()) for e in events)
    assert n_rho > 500                  # the test must actually decay rhos
    events = mcd.decay_events(events, table, seed=33)
    mcid_all = np.concatenate([e["mcid"] for e in events])
    pT_all = np.concatenate([np.hypot(e["px"], e["py"]) for e in events])
    assert not np.any(mcid_all == 113)

    # per-species dN/dy incl. feed-down (number conservation makes the
    # total/(2 y_cut) estimator exact even though daughters leave |y|<y_cut)
    for i, mcid in enumerate(mcids):
        if mcid == 113:
            continue
        n_s = int((mcid_all == mcid).sum())
        got = n_s / (2.0 * y_cut) / nev
        sig = math.sqrt(max(n_s, 1)) / (2.0 * y_cut) / nev
        assert abs(got - dNdy_sm[i]) < 5.0 * sig + 0.02 * dNdy_sm[i], \
            (mcid, got, dNdy_sm[i])

    # pi+ pT shape incl. the feed-down bump at pT ~ p*(rho)
    edges = np.array([0.0, 0.25, 0.45, 0.7, 1.0, 1.5, 5.0])
    pred = bin_fractions_from_grid(np.asarray(grid.pT), dNpT_sm, edges)
    counts, _ = np.histogram(pT_all[mcid_all == 211], bins=edges)
    frac = counts / counts.sum()
    sig = np.sqrt(np.maximum(counts, 1)) / counts.sum()
    assert np.all(np.abs(frac - pred) < 5.0 * sig + 0.015), (frac, pred)


def test_mc_decays_3d_rapidity_twin(real_table, reference_dir):
    """3+1D statistical twin: the MC cascade's daughter RAPIDITY
    distribution must match the smooth feed-down's y-differential spectra
    on a genuinely 3+1D surface.  The 2+1D twin above checks only the pT
    shape -- daughter pT is exactly invariant under longitudinal boosts
    there, so the cascade's longitudinal kinematics (parent rapidity
    structure + decay rapidity kick) went untested.  Here the surface
    carries cells at eta in [-2, 2] and the comparison is per-species
    dN/dy binned in rapidity, 5 sigma."""
    import jax.numpy as jnp
    from is3d_tpu.config import Config
    from is3d_tpu.data import SpeciesArrays
    from is3d_tpu.io import pdg, deltaf as deltaf_io
    from is3d_tpu.io.tables import native_momentum_grid
    from is3d_tpu.kernels.smooth import smooth_spectra
    from is3d_tpu.kernels.sample import sample_particles
    from is3d_tpu.kernels.decays import do_resonance_decays
    from is3d_tpu import observables
    from test_sampler import small_surface, equilibrium_density, PLASMA

    table = real_table
    ids = [211, -211, 113]
    idx = pdg.chosen_indices(table, ids)
    mcids = table.mc_id[idx].astype(np.int32)
    sp = SpeciesArrays(
        mass=jnp.asarray(table.mass[idx]),
        sign=jnp.asarray(table.sign[idx], dtype=jnp.float64),
        degeneracy=jnp.asarray(table.gspin[idx]),
        baryon=jnp.asarray(table.baryon[idx], dtype=jnp.float64),
        equilibrium_density=jnp.zeros(len(idx)),
        bulk_density=jnp.zeros(len(idx)),
        diff_density=jnp.zeros(len(idx)))
    neq = equilibrium_density(np.asarray(sp.mass), np.asarray(sp.degeneracy),
                              np.asarray(sp.sign), np.asarray(sp.baryon),
                              0.155)
    sp = sp.replace(equilibrium_density=jnp.asarray(neq))
    df_data = deltaf_io.build_deltaf_data(
        f"{reference_dir}/deltaf_coefficients", hrg_eos=1,
        particle_table=table, T_avg=0.155)

    surf = small_surface(n=24, seed=13, dimension=3)
    cfg = Config(operation=2, dimension=3, df_mode=1, sampler_seed=27)

    # smooth side: 3+1D CF spectra on a y grid generously covering the
    # surface's eta support (+- 2) plus the decay rapidity kick, then the
    # wave-levelized feed-down
    grid = native_momentum_grid(dimension=3, n_pT=24, pT_max=4.0, n_phi=16,
                                y_max=5.0, n_y=41)
    spectra = np.asarray(smooth_spectra(
        surf, sp, grid, df_data, cfg.replace(operation=1, cell_chunk=32)))
    decayed = do_resonance_decays(spectra.copy(), table, mcids, grid, cfg)
    dNdy_sm = np.asarray(observables.dN_dy(jnp.asarray(decayed), grid))
    y_nodes = np.asarray(grid.y)
    # containment: the spectrum must have died off by the y grid edge,
    # otherwise the binned comparison below leaks
    assert dNdy_sm[:, 0].max() < 1e-2 * dNdy_sm.max()
    assert dNdy_sm[:, -1].max() < 1e-2 * dNdy_sm.max()

    # sampled side
    nev = 6000
    events = sample_particles(surf, sp, mcids, None, df_data, cfg, PLASMA,
                              nevents=nev)
    n_rho = sum(int((e["mcid"] == 113).sum()) for e in events)
    assert n_rho > 500
    events = mcd.decay_events(events, table, seed=35)
    mcid_all = np.concatenate([e["mcid"] for e in events])
    y_all = np.concatenate([e["yp"] for e in events])
    assert not np.any(mcid_all == 113)

    edges = np.array([-5.0, -2.5, -1.5, -0.7, 0.0, 0.7, 1.5, 2.5, 5.0])
    fine = np.linspace(-5.0, 5.0, 4001)
    for i, mcid in enumerate(mcids):
        if mcid == 113:
            continue
        dens = np.interp(fine, y_nodes, dNdy_sm[i])
        pred_bins = np.array([
            np.trapezoid(np.where((fine >= lo) & (fine < hi), dens, 0.0),
                         fine)
            for lo, hi in zip(edges[:-1], edges[1:])]) * nev
        counts, _ = np.histogram(y_all[mcid_all == mcid], bins=edges)
        sig = np.sqrt(np.maximum(counts, 1.0))
        ok = np.abs(counts - pred_bins) < 5.0 * sig + 0.02 * pred_bins + 2.0
        assert ok.all(), (mcid, counts, pred_bins)
