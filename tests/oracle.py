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
