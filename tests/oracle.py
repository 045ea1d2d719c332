"""Independent numpy oracle for the smooth Cooper-Frye spectra.

Deliberately written as straightforward per-cell / per-momentum-point loops
following the documented physics (Cooper-Frye formula with linear 14-moment /
Chapman-Enskog delta-f; SURVEY.md Appendix B), sharing no code with the
is3d_tpu kernels.  Used as the parity target for small surfaces.
"""

import numpy as np

HBARC = 0.197327053
PREFACTOR = (2.0 * np.pi * HBARC) ** -3


def oracle_smooth_spectra(cells, species, grid, df_eval, *,
                          df_mode, dimension, include_shear, include_bulk,
                          include_baryon, include_baryondiff,
                          regulate_deltaf, outflow):
    """cells: dict of per-cell numpy arrays with keys
       tau, eta, dat, dax, day, dan, ux, uy, un, T, E, P,
       pixx, pixy, pixn, piyy, piyn, bulkPi, muB, nB, Vx, Vy, Vn.
    species: dict with mass, sign, degeneracy, baryon arrays.
    grid: dict with pT, phi, y, eta, eta_weight arrays.
    df_eval(T, muB, E, P) -> dict of coefficients
       (c0..c4, F, G, betabulk, betaV, betapi).
    Returns spectra (S, nPT, nPHI, nY_out)."""
    n_cells = len(cells["tau"])
    S = len(species["mass"])
    pTs, phis = grid["pT"], grid["phi"]
    if dimension == 2:
        ys = [0.0]
        etas, etaws = grid["eta"], grid["eta_weight"]
    else:
        ys = grid["y"]
        etas, etaws = None, None

    out = np.zeros((S, len(pTs), len(phis), len(ys)))

    for ic in range(n_cells):
        tau = cells["tau"][ic]
        tau2 = tau * tau
        ux, uy, un = cells["ux"][ic], cells["uy"][ic], cells["un"][ic]
        ut = np.sqrt(1.0 + ux**2 + uy**2 + tau2 * un**2)
        dat, dax, day, dan = (cells[k][ic] for k in ("dat", "dax", "day", "dan"))
        if ut * dat + ux * dax + uy * day + un * dan <= 0.0:
            continue
        T, E, P = cells["T"][ic], cells["E"][ic], cells["P"][ic]

        pitt = pitx = pity = pitn = pixx = pixy = pixn = piyy = piyn = pinn = 0.0
        if include_shear:
            pixx, pixy, pixn = cells["pixx"][ic], cells["pixy"][ic], cells["pixn"][ic]
            piyy, piyn = cells["piyy"][ic], cells["piyn"][ic]
            ut2, ux2, uy2 = ut*ut, ux*ux, uy*uy
            utperp2 = 1.0 + ux2 + uy2
            pinn = (pixx*(ux2 - ut2) + piyy*(uy2 - ut2)
                    + 2.0*(pixy*ux*uy + tau2*un*(pixn*ux + piyn*uy))) / (tau2*utperp2)
            pitn = (pixn*ux + piyn*uy + tau2*pinn*un) / ut
            pity = (pixy*ux + piyy*uy + tau2*piyn*un) / ut
            pitx = (pixx*ux + pixy*uy + tau2*pixn*un) / ut
            pitt = (pitx*ux + pity*uy + tau2*pitn*un) / ut

        bulkPi = cells["bulkPi"][ic] if include_bulk else 0.0

        muB = alphaB = nB = Vt = Vx = Vy = Vn = benth = 0.0
        if include_baryon:
            muB = cells["muB"][ic]
            alphaB = muB / T
        if include_baryon and include_baryondiff:
            nB = cells["nB"][ic]
            Vx, Vy, Vn = cells["Vx"][ic], cells["Vy"][ic], cells["Vn"][ic]
            Vt = (Vx*ux + Vy*uy + tau2*Vn*un) / ut
            benth = nB / (E + P)

        co = df_eval(T, muB, E, P)
        if df_mode == 1:
            shear_coeff = 0.5 / (T*T*(E + P))
            bulk0, bulk1, bulk2 = co["c0"] - co["c2"], co["c1"], 4.0*co["c2"] - co["c0"]
        else:
            shear_coeff = 0.5 / (co["betapi"] * T)
            bulk0 = co["F"] / (T*T*co["betabulk"])
            bulk1 = co["G"] / co["betabulk"]
            bulk2 = 1.0 / (3.0*T*co["betabulk"])

        eta_cell = cells["eta"][ic]

        for isp in range(S):
            mass = species["mass"][isp]
            mass2 = mass*mass
            sign = species["sign"][isp]
            deg = species["degeneracy"][isp]
            baryon = species["baryon"][isp]
            chem = baryon * alphaB
            for ipT, pT in enumerate(pTs):
                mT = np.sqrt(mass2 + pT*pT)
                for iphi, phi in enumerate(phis):
                    px, py = pT*np.cos(phi), pT*np.sin(phi)
                    for iy, y in enumerate(ys):
                        total = 0.0
                        pairs = (zip(etas, etaws) if dimension == 2
                                 else [(eta_cell, 1.0)])
                        for eta, w in pairs:
                            pt = mT*np.cosh(y - eta)
                            pn = mT/tau*np.sinh(y - eta)
                            t2pn = tau2*pn
                            pds = w*(pt*dat + px*dax + py*day + pn*dan)
                            if outflow and pds <= 0.0:
                                continue
                            pdotu = pt*ut - px*ux - py*uy - t2pn*un
                            feq = 1.0/(np.exp(pdotu/T - chem) + sign)
                            feqbar = 1.0 - sign*feq
                            pipp = (pitt*pt*pt + pixx*px*px + piyy*py*py
                                    + pinn*t2pn*t2pn
                                    + 2.0*(-(pitx*px + pity*py)*pt + pixy*px*py
                                           + t2pn*(pixn*px + piyn*py - pitn*pt)))
                            Vp = Vt*pt - Vx*px - Vy*py - Vn*t2pn
                            if df_mode == 1:
                                df = feqbar*(shear_coeff*pipp
                                             + (bulk0*mass2 + (bulk1*baryon + bulk2*pdotu)*pdotu)*bulkPi
                                             + (co["c3"]*baryon + co["c4"]*pdotu)*Vp)
                            else:
                                df = feqbar*(shear_coeff*pipp/pdotu
                                             + (bulk0*pdotu + bulk1*baryon
                                                + bulk2*(pdotu - mass2/pdotu))*bulkPi
                                             + (benth - baryon/pdotu)*Vp/co["betaV"])
                            if regulate_deltaf:
                                df = max(-1.0, min(df, 1.0))
                            total += pds*feq*(1.0 + df)
                        out[isp, ipT, iphi, iy] += PREFACTOR*deg*total
    return out


def ideal_boltzmann_1cell_y0(mass, degeneracy, T, tau, dat, pT, etas, etaws):
    """Semi-analytic check for a single cell at rest with dsigma = (dat,0,0,0),
    Boltzmann statistics (sign -> 0 handled via series), y = 0:
    dN/(pT dpT dphi dy) = deg/(2 pi hbarC)^3 * dat * sum_eta w mT cosh(eta)
                          exp(-mT cosh(eta)/T)."""
    mT = np.sqrt(mass**2 + pT**2)
    s = sum(w*mT*np.cosh(e)*np.exp(-mT*np.cosh(e)/T) for e, w in zip(etas, etaws))
    return PREFACTOR*degeneracy*dat*s


def oracle_feqmod_spectra(cells, species, grid, df_eval, *,
                          df_mode, dimension, include_shear, include_bulk,
                          include_baryon, include_baryondiff,
                          regulate_deltaf, outflow, deta_min, mass_pion0,
                          laguerre):
    """Independent loop implementation of the feqmod smooth spectra
    (df modes 3/4).  df_eval(T, muB, E, P, bulkPi) must return a dict with
    F, G, betabulk, betaV, betapi, lam, z, delta_lambda, delta_z.
    laguerre: {alpha: (roots, weights)}.  Uses np.linalg for the 3x3 solve."""
    TWO_PI2_HBARC3 = 2.0 * np.pi**2 * HBARC**3
    r1, w1 = laguerre[1]
    r2, w2 = laguerre[2]

    def gauss(fn, r, w, mbar, alphaB, baryon, sign):
        return sum(wk * fn(rk, mbar, alphaB, baryon, sign) for rk, wk in zip(r, w))

    def neq_int(p, m, a, b, s):
        return p * np.exp(p) / (np.exp(np.sqrt(p*p + m*m) - b*a) + s)

    def J10_int(p, m, a, b, s):
        e = np.sqrt(p*p + m*m)
        q = np.exp(e - b*a) + s
        return p * np.exp(p + e - b*a) / (q*q)

    def J20_int(p, m, a, b, s):
        e = np.sqrt(p*p + m*m)
        q = np.exp(e - b*a) + s
        return e * np.exp(p + e - b*a) / (q*q)

    n_cells = len(cells["tau"])
    S = len(species["mass"])
    pTs, phis = grid["pT"], grid["phi"]
    if dimension == 2:
        ys = [0.0]
        etas, etaws = grid["eta"], grid["eta_weight"]
    else:
        ys = grid["y"]

    out = np.zeros((S, len(pTs), len(phis), len(ys)))

    for ic in range(n_cells):
        tau = cells["tau"][ic]; tau2 = tau*tau
        ux, uy, un = cells["ux"][ic], cells["uy"][ic], cells["un"][ic]
        ut = np.sqrt(1.0 + ux**2 + uy**2 + tau2*un**2)
        dat, dax, day, dan = (cells[k][ic] for k in ("dat", "dax", "day", "dan"))
        if ut*dat + ux*dax + uy*day + un*dan <= 0.0:
            continue
        T, E, P = cells["T"][ic], cells["E"][ic], cells["P"][ic]

        pitt = pitx = pity = pitn = pixx = pixy = pixn = piyy = piyn = pinn = 0.0
        if include_shear:
            pixx, pixy, pixn = cells["pixx"][ic], cells["pixy"][ic], cells["pixn"][ic]
            piyy, piyn = cells["piyy"][ic], cells["piyn"][ic]
            ut2, ux2, uy2 = ut*ut, ux*ux, uy*uy
            utperp2 = 1.0 + ux2 + uy2
            pinn = (pixx*(ux2-ut2) + piyy*(uy2-ut2)
                    + 2.0*(pixy*ux*uy + tau2*un*(pixn*ux + piyn*uy)))/(tau2*utperp2)
            pitn = (pixn*ux + piyn*uy + tau2*pinn*un)/ut
            pity = (pixy*ux + piyy*uy + tau2*piyn*un)/ut
            pitx = (pixx*ux + pixy*uy + tau2*pixn*un)/ut
            pitt = (pitx*ux + pity*uy + tau2*pitn*un)/ut

        bulkPi = cells["bulkPi"][ic] if include_bulk else 0.0
        muB = cells["muB"][ic] if include_baryon else 0.0
        alphaB = muB/T if include_baryon else 0.0
        benth = 0.0
        Vt = Vx = Vy = Vn = 0.0

        co = df_eval(T, muB, E, P, bulkPi)
        if df_mode == 4:
            # clamp bulkPi to the spline domain like the kernel
            if bulkPi < -P:
                bulkPi = -(1.0 - 1e-5)*P
            if bulkPi/P > co["bulk_max"]:
                bulkPi = P*(co["bulk_max"] - 1e-5)
            co = df_eval(T, muB, E, P, bulkPi)

        # Milne basis
        uperp = np.sqrt(ux*ux + uy*uy)
        utperp = np.sqrt(1.0 + ux*ux + uy*uy)
        sinhL, coshL = tau*un/utperp, ut/utperp
        Xt, Zt = uperp*coshL, sinhL
        Xn, Zn = uperp*sinhL/tau, coshL/tau
        if uperp > 1e-5:
            Xx, Xy = utperp*ux/uperp, utperp*uy/uperp
            Yx, Yy = -uy/uperp, ux/uperp
        else:
            Xx, Xy, Yx, Yy = 1.0, 0.0, 0.0, 1.0

        # pi_LRF
        pixx_L = (pitt*Xt*Xt + pixx*Xx*Xx + piyy*Xy*Xy + tau2*tau2*pinn*Xn*Xn
                  + 2.0*(-Xt*(pitx*Xx + pity*Xy) + pixy*Xx*Xy
                         + tau2*Xn*(pixn*Xx + piyn*Xy - pitn*Xt)))
        pixy_L = (Yx*(-pitx*Xt + pixx*Xx + pixy*Xy + tau2*pixn*Xn)
                  + Yy*(-pity*Xt + pixy*Xx + piyy*Xy + tau2*piyn*Xn))
        pixz_L = (Zt*(pitt*Xt - pitx*Xx - pity*Xy - tau2*pitn*Xn)
                  - tau2*Zn*(pitn*Xt - pixn*Xx - piyn*Xy - tau2*pinn*Xn))
        piyy_L = pixx*Yx*Yx + 2.0*pixy*Yx*Yy + piyy*Yy*Yy
        piyz_L = -Zt*(pitx*Yx + pity*Yy) + tau2*Zn*(pixn*Yx + piyn*Yy)
        pizz_L = -(pixx_L + piyy_L)

        if df_mode == 3:
            T_mod = T + bulkPi*co["F"]/co["betabulk"]
            alphaB_mod = alphaB + bulkPi*co["G"]/co["betabulk"]
            bulk_mod = bulkPi/(3.0*co["betabulk"])
        else:
            T_mod, alphaB_mod = T, alphaB
            bulk_mod = co["lam"]
        shear_mod = 0.5/co["betapi"]

        A = np.array([
            [1.0 + pixx_L*shear_mod + bulk_mod, pixy_L*shear_mod, pixz_L*shear_mod],
            [pixy_L*shear_mod, 1.0 + piyy_L*shear_mod + bulk_mod, piyz_L*shear_mod],
            [pixz_L*shear_mod, piyz_L*shear_mod, 1.0 + pizz_L*shear_mod + bulk_mod]])
        detA = np.linalg.det(A)

        # breakdown: mode 3 per the reference test; mode 4 mirrors the
        # kernel's deliberate divergence (detA <= deta_min -> linearized
        # Jonah fallback; the reference evaluates an indefinite transform
        # there, see feqmod._prepare_feqmod_cells)
        breakdown = (df_mode == 4) and (detA <= deta_min)
        if df_mode == 3:
            mbar_pi = mass_pion0/T
            neq_fact = T**3/TWO_PI2_HBARC3
            neq_pi = neq_fact*gauss(neq_int, r1, w1, mbar_pi, 0.0, 0.0, -1.0)
            J20_pi = T*neq_fact*gauss(J20_int, r2, w2, mbar_pi, 0.0, 0.0, -1.0)
            dn_pi = bulkPi*(neq_pi + J20_pi*co["F"]/T/T)/co["betabulk"]
            breakdown = (detA <= deta_min) or (neq_pi + dn_pi < 0.0)

        # eta rescale supplies the 1/detA jacobian in 2+1D for ALL
        # detA > detA_min (the reference spectra kernel's extra `detA < 1`
        # clause is a defect -- see reference_compat_feqmod_eta in config.py)
        eta_scale = 1.0
        if detA > deta_min and dimension == 2:
            eta_scale = detA
        A_inv = np.linalg.inv(A) if abs(detA) > 1e-300 else np.eye(3)

        for isp in range(S):
            mass = species["mass"][isp]; mass2 = mass*mass
            sign = species["sign"][isp]; deg = species["degeneracy"][isp]
            baryon = species["baryon"][isp]
            chem, chem_mod = baryon*alphaB, baryon*alphaB_mod

            renorm = 1.0
            if include_bulk:
                if df_mode == 3:
                    mbar, mbar_mod = mass/T, mass/T_mod
                    neq_fact = T**3/TWO_PI2_HBARC3
                    neq = neq_fact*deg*gauss(neq_int, r1, w1, mbar, alphaB, baryon, sign)
                    N10 = baryon*neq_fact*deg*gauss(J10_int, r1, w1, mbar, alphaB, baryon, sign)
                    J20 = T*neq_fact*deg*gauss(J20_int, r2, w2, mbar, alphaB, baryon, sign)
                    n_lin = neq + bulkPi/co["betabulk"]*(neq + N10*co["G"] + J20*co["F"]/T/T)
                    n_mod = (T_mod**3/TWO_PI2_HBARC3)*deg*gauss(
                        neq_int, r1, w1, mbar_mod, alphaB_mod, baryon, sign)
                    renorm = n_lin/n_mod
                else:
                    renorm = co["z"]
            if not np.isfinite(renorm):
                continue
            if dimension == 3:
                renorm = renorm/detA

            for ipT, pT in enumerate(pTs):
                mT = np.sqrt(mass2 + pT*pT)
                for iphi, phi in enumerate(phis):
                    px, py = pT*np.cos(phi), pT*np.sin(phi)
                    for iy, y in enumerate(ys):
                        total = 0.0
                        pairs = (zip(etas, etaws) if dimension == 2
                                 else [(cells["eta"][ic], 1.0)])
                        for eta, w in pairs:
                            narrow = (dimension == 3 and not breakdown
                                      and detA < 0.01 and abs(y - eta) < detA)
                            if breakdown or narrow:
                                pt = mT*np.cosh(y - eta)
                                pn = mT/tau*np.sinh(y - eta)
                                t2pn = tau2*pn
                                pds = w*(pt*dat + px*dax + py*day + pn*dan)
                                if outflow and pds <= 0.0:
                                    continue
                                pdotu = pt*ut - px*ux - py*uy - t2pn*un
                                pipp = (pitt*pt*pt + pixx*px*px + piyy*py*py
                                        + pinn*t2pn*t2pn
                                        + 2.0*(-(pitx*px + pity*py)*pt + pixy*px*py
                                               + t2pn*(pixn*px + piyn*py - pitn*pt)))
                                if df_mode == 3:
                                    feq = 1.0/(np.exp(pdotu/T - chem) + sign)
                                    feqbar = 1.0 - sign*feq
                                    dfv = feqbar*(0.5/(co["betapi"]*T)*pipp/pdotu
                                                  + (co["F"]/(T*T*co["betabulk"])*pdotu
                                                     + co["G"]/co["betabulk"]*baryon
                                                     + (pdotu - mass2/pdotu)/(3.0*T*co["betabulk"]))*bulkPi
                                                  + (benth - baryon/pdotu)*0.0)
                                else:
                                    feq = 1.0/(np.exp(pdotu/T) + sign)
                                    feqbar = 1.0 - sign*feq
                                    dfv = (feqbar*0.5/(co["betapi"]*T)*pipp/pdotu
                                           + co["delta_z"] - 3.0*co["delta_lambda"]
                                           + feqbar*co["delta_lambda"]*(pdotu - mass2/pdotu)/T)
                                if regulate_deltaf:
                                    dfv = max(-1.0, min(dfv, 1.0))
                                f = feq*(1.0 + dfv)
                            else:
                                pt = mT*np.cosh(y - eta_scale*eta)
                                pn = mT/tau*np.sinh(y - eta_scale*eta)
                                t2pn = tau2*pn
                                pds = w*(pt*dat + px*dax + py*day + pn*dan)
                                if outflow and pds <= 0.0:
                                    continue
                                pL = np.array([
                                    -Xt*pt + Xx*px + Xy*py + Xn*t2pn,
                                    Yx*px + Yy*py,
                                    -Zt*pt + Zn*t2pn])
                                pmod = np.linalg.solve(A, pL)
                                E_mod = np.sqrt(mass2 + pmod @ pmod)
                                f = abs(renorm)/(np.exp(E_mod/T_mod - chem_mod) + sign)
                            total += pds*f
                        out[isp, ipT, iphi, iy] += PREFACTOR*deg*total
    return out


def bin_fractions_from_grid(pT_nodes, dN_pT_dpT, edges, n_fine=4000):
    """Fractions of the yield in pT bins, from a spectrum sampled on a
    quadrature grid.

    NEVER restrict Gauss-Legendre (node, weight) sums to a sub-interval:
    the weights are only exact for the FULL interval, and partial sums
    mis-bin a steep spectrum by tens of percent (measured: [0.346, 0.431]
    vs the true [0.385, 0.361] on a thermal spectrum with 48 nodes).
    Instead interpolate log(spectrum) onto a fine grid (log-linear
    extrapolation beyond the outermost nodes) and trapezoid-integrate
    pT * dN/(2pi pT dpT dy) per bin."""
    pT_nodes = np.asarray(pT_nodes, dtype=np.float64)
    y = np.log(np.maximum(np.asarray(dN_pT_dpT, dtype=np.float64), 1e-300))
    pts = np.linspace(0.0, float(edges[-1]), n_fine)
    logS = np.interp(pts, pT_nodes, y)
    lo_m = pts < pT_nodes[0]
    hi_m = pts > pT_nodes[-1]
    sl0 = (y[1] - y[0]) / (pT_nodes[1] - pT_nodes[0])
    sl1 = (y[-1] - y[-2]) / (pT_nodes[-1] - pT_nodes[-2])
    logS = np.where(lo_m, y[0] + sl0 * (pts - pT_nodes[0]), logS)
    logS = np.where(hi_m, y[-1] + sl1 * (pts - pT_nodes[-1]), logS)
    s = np.exp(logS)
    vals = np.array([
        np.trapezoid(np.where((pts >= lo) & (pts < hi), s * pts, 0.0), pts)
        for lo, hi in zip(edges[:-1], edges[1:])])
    return vals / vals.sum()
