"""Typed run configuration.

Parses the reference's ``iS3D_parameters.dat`` format (``name = value  # comment``;
reference: src/cpp/ParameterReader.cpp) into a frozen, typed dataclass.  All
~45 parameters of the reference are covered with the same names and defaults,
plus TPU-specific knobs (dtype, cell-chunk size, mesh axes) that have no
reference counterpart.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class Config:
    # --- operation selection (reference: iS3D_parameters.dat) ---
    operation: int = 1          # 0: dN/dX spacetime, 1: smooth spectra, 2: sampler
    mode: int = 1               # freeze-out surface format (0-7)
    hrg_eos: int = 1            # 1: urqmd, 2: smash, 3: smash box
    set_FO_temperature: int = 0
    T_switch: float = 0.151     # GeV
    dimension: int = 2          # 2: boost-invariant (2+1)D, 3: (3+1)D
    df_mode: int = 1            # 1: 14-moment, 2: Chapman-Enskog, 3: Mike feqmod, 4: Jonah feqmod

    # --- df switches ---
    include_baryon: int = 0
    include_bulk_deltaf: int = 0
    include_shear_deltaf: int = 0
    include_baryondiff_deltaf: int = 0
    regulate_deltaf: int = 0
    outflow: int = 0

    # --- feqmod breakdown ---
    deta_min: float = 1.0e-5    # minimum detA before feqmod falls back to linear df
    mass_pion0: float = 0.138   # GeV, for the linearized pion-density breakdown test

    # --- particle grouping ---
    group_particles: int = 0
    particle_diff_tolerance: float = 0.01

    # --- resonance decays ---
    # operation=1: smooth feed-down (kernels/decays.py); operation=2:
    # event-level MC cascade on the sampled hadrons (kernels/mc_decays.py)
    do_resonance_decays: int = 0
    lightest_particle: int = 111  # PDG MC id of lightest decay product

    # --- sampler ---
    oversample: int = 0
    min_num_hadrons: float = 1.0e7
    max_num_samples: int = 100
    fast: int = 0
    y_cut: float = 5.0
    sampler_seed: int = -1
    test_sampler: int = 0

    # --- sampler-test binning ---
    pT_lower_cut: float = 0.0
    pT_upper_cut: float = 3.0
    pT_bins: int = 100
    y_bins: int = 50
    eta_cut: float = 7.0
    eta_bins: int = 70
    tau_min: float = 0.0
    tau_max: float = 12.0
    tau_bins: int = 120
    r_min: float = 0.0
    r_max: float = 12.0
    r_bins: int = 60

    # --- reference compatibility quirks (no reference counterpart) ---
    # reproduce the reference's dN/dy and dN/dX momentum integrals, which
    # omit the pT Jacobian (write_dN_dy_toFile, calculate_dN_dX); default
    # is the physically correct integral
    reference_compat_dndy: int = 0
    # reproduce the reference SPECTRA kernel's 2+1D feqmod eta handling,
    # which skips the detA rescale for detA >= 1 and thereby drops the
    # 1/detA momentum-space jacobian on bulk-expanded cells
    # (emissionfunction_smooth_kernels.cpp:728 `detA < 1.0`).  The
    # reference is internally inconsistent here: its own dN_dX kernel
    # (:1847) and its Monte-Carlo sampler (p = A p_mod includes the
    # jacobian automatically) both keep the factor.  Default is the
    # consistent, correct behavior
    reference_compat_feqmod_eta: int = 0

    # --- TPU-native knobs (no reference counterpart) ---
    precision: str = "f64"      # "f64" for parity runs, "f32"/"bf16" fast path
    cell_chunk: int = 65536     # cells per scan step (reference FO_chunk=10000)
    cell_slab: int = 262144     # cells per device dispatch (bounds single-call
                                # runtime; results are summed host-side)
    mesh_axis: str = "cells"    # sharded axis name for multi-chip runs
    reduce_groups: int = 8      # groups of the canonical cell-reduction
                                # tree (parallel/mesh.py): spectra are
                                # bit-identical for every device count
                                # (raised in multiples of itself so a
                                # group stays under cell_slab)
    feqmod_partition: int = 1   # in-kernel chunk routing of the feqmod
                                # pass (kernels/feqmod.routed_switch): each
                                # scan chunk runs only the evaluation chain
                                # it needs -- feqmod-only when no cell broke
                                # down, fallback-only when every valid cell
                                # did, both-branch otherwise.  Same math per
                                # cell; 0 forces the single both-branch
                                # kernel (the AD/vmap paths do)
    feqmod_partition_min_cells: int = 16384  # below this, routing is skipped
                                # (3x branch compile cost dwarfs the saved
                                # work; tiny parity fixtures keep pinning
                                # the exact both-branch artifact)
    vah_df_gate: int = 1        # host-side probe of the VAH residual-df
                                # inputs (c0..c4, bulkPi): chains whose
                                # coefficient columns are identically zero
                                # are structurally absent from the compiled
                                # VAH kernels (bit-identical -- the removed
                                # terms are exact zeros).  Fires on every
                                # real mode-2/3 surface: no VAH hydro format
                                # carries the c0..c4 columns (the reference
                                # reader never fills them either,
                                # emissionfunction.cpp).  Tracer columns
                                # (vmap/AD) are treated as nonzero, so
                                # batched and differentiated runs keep the
                                # chains (kernels/vah.effective_vah_cfg)
    vah_coefficient_tables: int = 0  # opt-in: fill missing per-cell VAH
                                # residual-df coefficients c0..c4 on mode-2/3
                                # surfaces by bilinear interpolation of the
                                # shipped deltaf_coefficients/vah tables in
                                # (Lambda, aL) -- a data asset the reference
                                # C++ build never loads (its kernel reads
                                # zero-filled FO_surf fields; only the legacy
                                # CUDA port wired them, deltafReader.cu:208).
                                # Default off: zero / user-supplied columns,
                                # bug-compatible with the reference
    remat_scan: int = 0         # jax.checkpoint the per-chunk scan bodies of
                                # the smooth kernels so reverse-mode AD
                                # (is3d_tpu.diff) recomputes each chunk's
                                # (C, R, S, M) emission block instead of
                                # storing it: backward memory ~ one chunk
                                # regardless of surface size.  Default off:
                                # the forward-only production path keeps the
                                # exact compiled artifact the bit-parity
                                # suite pins
    sampler_cell_chunk: int = 0  # sampler phase-A memory bound, in cells:
                                # the sampler never materializes (C, S)
                                # tables wider than this -- larger surfaces
                                # are sampled as independent cell chunks
                                # (exact by Poisson superposition,
                                # kernels/sample._sample_cell_chunked).
                                # 0 = auto (chunk at 2^19 cells once the
                                # surface exceeds 2^20); -1 = never chunk;
                                # explicit N = chunk size (engages when
                                # C > N).  Changing the chunk plan changes
                                # the random streams (documented), never
                                # the distribution.
    sampler_gather_tetrad: int = 1  # 1: the per-slot row gather carries the
                                # 8 Milne tetrad fields (Xt..Zn); 0: drop
                                # them and rebuild the basis per slot from
                                # (u, tau) already in the row -- fewer
                                # gathered elements vs extra VPU math
                                # (probe_sampler_device round-5 A/B; same
                                # events, lab momenta equal to fp roundoff)
    sampler_alias: int = 1      # O(1) Walker-alias categorical draws for
                                # the sampler's (cell, species) assignment
                                # (kernels/sample._alias_build); 0 restores
                                # the binary-search draws (identical
                                # distribution, different random streams)
    sampler_pack: str = "auto"  # sampled-hadron device->host transfer
                                # precision: "f16" halves the D2H bytes of
                                # the bottleneck link (<= 2^-11 relative
                                # momentum rounding, see kernels/sample.py);
                                # "f32" ships exactly what the device
                                # computed; "auto" = f16 on the f32/bf16
                                # fast path, exact on f64 parity runs

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


_FIELD_TYPES = {f.name: f.type for f in dataclasses.fields(Config)}
_INT_FIELDS = {
    f.name for f in dataclasses.fields(Config) if f.type in ("int", int)
}
_FLOAT_FIELDS = {
    f.name for f in dataclasses.fields(Config) if f.type in ("float", float)
}


def parse_parameter_text(text: str) -> dict:
    """Parse ``name = value # comment`` lines into a raw dict of strings.

    Mirrors the reference parser's tolerance (reference:
    src/cpp/ParameterReader.cpp: comments stripped at '#', blank lines and
    lines without '=' skipped).
    """
    out = {}
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or "=" not in line:
            continue
        name, value = line.split("=", 1)
        name = name.strip()
        value = value.strip()
        if name and value:
            out[name] = value
    return out


def _coerce(name: str, raw: str):
    if name in _INT_FIELDS:
        # the reference stores everything as double; ints like 1.0e+8 appear
        return int(float(raw))
    if name in _FLOAT_FIELDS:
        return float(raw)
    return raw


def load_config(path: Optional[str] = None, text: Optional[str] = None,
                overrides: Optional[dict] = None, strict: bool = False) -> Config:
    """Build a Config from an iS3D_parameters.dat-style file and/or overrides.

    Unknown keys are ignored unless ``strict`` (the reference accepts any key;
    we only type-check the ones we model).  ``overrides`` (e.g. from CLI
    ``key=value`` arguments, reference: src/cpp/ParameterReader.cpp:102) win
    over file values.
    """
    raw = {}
    if path is not None:
        with open(path) as f:
            raw.update(parse_parameter_text(f.read()))
    if text is not None:
        raw.update(parse_parameter_text(text))
    if overrides:
        raw.update({k: str(v) for k, v in overrides.items()})

    kwargs = {}
    for name, value in raw.items():
        if name not in _FIELD_TYPES:
            if strict:
                raise KeyError(f"unknown parameter: {name}")
            continue
        kwargs[name] = _coerce(name, value)
    return Config(**kwargs)
