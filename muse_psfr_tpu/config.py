"""Static configuration of the GALACSI WFM ground-layer AO system.

The reference implementation hardcodes these constants inside
``simul_psd_wfm`` (reference psfrec.py:70-104) and scatters a few more magic
numbers through ``psf_muse``/``convolve_final_psf`` (psfrec.py:655-659, 899).
Here they live in one frozen, hashable dataclass so the whole pipeline can be
traced once per configuration by ``jax.jit`` (the config is a static
argument: every field is a Python scalar, and derived grids are rebuilt at
trace time).

Changing ``dim``/``dim_pup`` gives the high-resolution (2048^2) and the tiny
multi-chip dry-run configurations with the same code path.
"""

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class GalacsiConfig:
    # --- telescope / AO system (reference psfrec.py:70-104) ---------------
    dpup: float = 8.0          # telescope diameter [m]
    occ: float = 0.14          # central obscuration (linear fraction)
    alt_dm: float = 1.0        # DM conjugation altitude [m]
    h_sodium: float = 90000.0  # sodium layer altitude [m] (debug only)
    lambda_ref: float = 0.5    # PSD reference wavelength [um]
    nact: float = 24.0         # linear number of DM actuators
    nsspup: float = 24.0       # linear number of WFS subapertures
    fsamp: float = 1000.0      # WFS sampling frequency [Hz]
    delay_ms: float = 2.5      # loop delay (readout + RTC) [ms]
    sep_lgs: float = 63.0      # LGS radial separation [arcsec]
    noise_lgs2: float = 1.0    # WFS noise a priori [rad^2]
    wind_speed: float = 12.5   # layer wind speed [m/s] (see int-h quirk)
    wind_dir_0: float = 0.628163   # layer 0 wind direction [rad] (pinned)
    wind_dir_1: float = -0.326497  # layer 1 wind direction [rad] (pinned)
    lse: bool = True           # LSE reconstructor (False -> MAP prior)

    # --- numerical grids (reference psfrec.py:103, 655-659, 899) ----------
    dim: int = 1280            # full PSD / OTF grid [px]
    dim_pup: int = 40          # correction-zone pupil size [px]
    dimpsf: int = 40           # output PSF cube size [px]
    pixscale: float = 0.2      # output PSF pixel scale [arcsec/px]
    samp: float = 2.0          # PSF sampling (Nyquist)
    lambda_chunk: int = 7      # wavelengths processed per OTF step: the
                               # serial per-lambda loop underutilises the
                               # chip (4.3x measured); each step holds
                               # ~rows*lambda_chunk*ndir*dim^2 floats
    pallas_lambda_chunk: int = 12  # wavelength chunk for the FUSED Pallas
                               # zoom kernel (0 = use lambda_chunk).  The
                               # kernel never materialises the OTF in HBM,
                               # so the XLA-path memory bound above does
                               # not apply — only the VMEM gate
                               # (otf/psf.py:_pallas_lambda_chunk) caps it:
                               # the dim=1280 full-window bucket still
                               # runs at its VMEM-fit chunk 7, the reduced
                               # windowed bucket at 12 (3 kernel launches
                               # per 35-lambda cube instead of 5, pad 1).
                               # Measured on TPU v5 lite (2026-08-17):
                               # 12 -> windowed-kernel 5.5 vs 6.5
                               # us/lambda and the 9-direction 100-row
                               # night 309 vs 268 rows/s (1.16x); k=9
                               # measured WORSE than both 7 and 12
                               # (misaligned nl*m2 output tiling).
    pallas_dir_block: object = "auto"  # directions per fused-kernel grid
                               # step ("auto" = largest divisor of ndir
                               # whose VMEM budget fits at the chosen
                               # wavelength chunk; an int forces it; 0/1
                               # disables).  db directions accumulate in
                               # a LOCAL value before one scratch
                               # read-modify-write (db-fold fewer), and
                               # db == ndir drops the scratch entirely
                               # and issues each wavelength's MXU
                               # contraction right after its
                               # exponentials (VPU/MXU overlap).
                               # Measured (v5e, 2026-08-18,
                               # measure_dir_block.py): windowed ndir=9
                               # kernel 5.73 -> 3.80 us/lambda (1.51x)
                               # at db=9; the full-window bucket stays
                               # db=1 ("auto" rejects db>1 there: its
                               # VMEM-fit chunk would drop 7 -> 5, a
                               # measured per-lambda wash, and db=9
                               # OOMs Mosaic even at k=2).  ndir=1
                               # (npsflin=1): "auto" uses the
                               # scratch-free immediate-contraction
                               # body (bit-identical; the freed
                               # scratch VMEM lets the FULL window run
                               # the big wavelength chunk of 12 — 8.44
                               # -> 7.83 us/lambda incl. the padding
                               # lambda, measure_ndir1_body.py); an
                               # explicit int/0 pins the legacy
                               # scratch body + chunk 7.  NOTE:
                               # "auto" also REPAIRS the dim=2048
                               # full-window 9-direction shape, whose
                               # old single-launch layout fails to
                               # compile (RESULTS.md) — 0/int restores
                               # that layout and with it the crash
                               # at that one shape.

    # --- telemetry validity limits (reference psfrec.py:30-31) ------------
    min_l0: float = 8.0        # minimum valid outer scale [m]
    max_l0: float = 30.0       # maximum valid outer scale [m]

    # --- compute policy ----------------------------------------------------
    dtype: str = "float32"     # compute dtype for the heavy stages
    fit_dtype: str = "float32" # dtype of the Moffat LM solve
    use_zoom_dft: bool = True  # zoom-DFT (MXU matmuls) instead of full IFFT
    use_fft: bool = True       # device FFTs for the structure function /
                               # convolutions; False = MXU DFT-matmul +
                               # direct-convolution path (exact, FFT-free —
                               # also the fallback when the TPU runtime's
                               # FFT custom call is unavailable)
    matmul_precision: str = "highest"  # TPU f32 matmul passes for the OTF
                               # transforms: "highest" = 6-pass (true f32,
                               # 4.2e-8 rms vs the f64 oracle), "high" =
                               # 3-pass bf16 (1.2e-6 rms, no measurable
                               # pipeline speedup — the zoom stage is
                               # HBM-bound), "default" = 1-pass bf16
                               # (~1e-5 — fails the accuracy budget)
    zoom_precision: str = "high"  # TPU f32 passes for the big zoom-DFT
                               # contraction only (A2 @ OTF — 82% of the
                               # post-split pipeline): "high" = 3-pass
                               # bf16 (hi*hi + hi*lo + lo*hi), "highest" =
                               # 6-pass true f32.  Measured (v5e, 300-row
                               # night): 1069 vs 830 rows/s at rms
                               # 2.6e-8 vs 2.2e-8 against the f64 oracle
                               # (budget 1e-5) — "high" is the default
    zoom_exp2: bool = True     # evaluate the fused-kernel damping as
                               # exp2(alpha*log2e*D + log2 w) instead of
                               # exp(alpha*D)*w: one fma + exp2 per
                               # element instead of mul + exp + mul.
                               # Identical math up to argument rounding
                               # (~ln2*|exponent|*eps relative, i.e.
                               # large only where the OTF has damped to
                               # nothing).  Measured 1.05-1.13x on the
                               # full-window ndir=9 kernel, ~1.02x full
                               # ndir=1, a wash on windowed buckets
                               # (benchmarks/measure_exp2_kernel.py);
                               # pipeline rms unchanged vs the f64
                               # oracle (docs/precision.md)
    conv_precision: str = "highest"  # TPU f32 passes for the final-PSF
                               # convolution DFT matmuls (tip-tilt +
                               # instrument Moffat).  "high" (3-pass
                               # bf16) measures ~2e-7 rms vs the f64
                               # oracle (budget 1e-5) but its speedup is
                               # inside the run-to-run variance — the
                               # conv stage is ~0.09 ms/row of ~0.4 —
                               # so full f32 stays the default
    use_dphi_split: bool = True  # linearity split of the structure
                               # function: the fitting-PSD transform is
                               # precomputed per config (Taylor basis in
                               # 1/L0^2, certified <=1e-7 relative for
                               # L0 >= dphi_split_l0_min) and only the
                               # centrally-supported correction-zone block
                               # is transformed per row (~16x fewer FLOPs).
                               # The batch layer falls back to the exact
                               # full transform when any row's L0 is below
                               # dphi_split_l0_min.
    dphi_split_degree: int = 5  # certified 8.9e-9 relative at l0_min=2.5
                               # (fc=1.5); two extra precomputed basis
                               # planes per row (~negligible next to the
                               # zoom stage).  Raised from 3/5.0 so
                               # synthetic low-L0 sweep points (the valid
                               # telemetry range is L0 in [8, 30]) stay on
                               # the fast split path instead of spilling
                               # into the exact-transform executable.
    dphi_split_l0_min: float = 2.5
    use_sym_fold: bool = True  # point-symmetry fold of the OTF-side
                               # contractions: PSDs and the pupil
                               # autocorrelation are transforms of real
                               # fields, so every OTF-side array satisfies
                               # G[i, j] = G[(N-i)%N, (N-j)%N]; the final
                               # zoom contraction's per-column terms are
                               # then equal in mirrored pairs and only
                               # columns 0..N/2 need computing (mirrors
                               # get weight 2).  Cuts the dominant exp +
                               # zoom-matmul work ~1.67x (10 -> 6 column
                               # tiles at dim=1280) and the structure-
                               # function transform ~2.5x.  Exact up to
                               # float-noise symmetrisation (measured
                               # against the f64 oracle); requires
                               # dim % 256 == 0 and the zoom-DFT path,
                               # silently off otherwise.
    otf_support: int = 0       # OTF support inf-radius [px]: the system
                               # OTF exp(-Dphi/2)*dl decays below any
                               # threshold well inside the grid (the
                               # residual structure function saturates at
                               # 2*sigma_res^2), so the zoom/dphi
                               # contractions only compute the centred
                               # block rows [c-S, c+S) x cols [c-S,
                               # c+128) under the fold.  0 = full half
                               # grid; the batch layer sets it per batch
                               # from a host-side rigorous bound on the
                               # least-damped row (see
                               # parallel/batch.py:estimate_otf_support).
                               # Must be a multiple of 128 (tile-aligned);
                               # each distinct value is a separate
                               # compilation of the pipeline.
    otf_blue: tuple = None     # optional blue-segment window split
                               # (nb, S_blue): the first nb wavelengths
                               # (which must be the BLUEST — the batch
                               # planner only engages it on ascending
                               # grids) run the whole OTF/zoom machinery
                               # on the smaller centred sub-window
                               # S_blue < otf_window S, the rest on the
                               # bucket window.  The structure function
                               # is wavelength-free but the damping
                               # exponent scales as (2pi/lambda)^2, so
                               # blue planes admit much smaller windows
                               # than the band maximum that sizes the
                               # per-row bucket: on the bench-night
                               # telemetry 100% of S=256-bucket rows
                               # admit S=128 for lambda <= 658 nm
                               # (area 1/3) and ~72% of full-window
                               # rows admit S=256 there (area 1/5) —
                               # benchmarks/measure_perlambda_window.py.
                               # Set per GROUP by the batch planner from
                               # the host-side admission model
                               # (parallel/batch.py:rows_windowable at
                               # max(lambda[:nb])), backstopped by the
                               # extended device window guard; each
                               # distinct value is a separate pipeline
                               # compilation.  None = single window.
    blue_tiers: int = 0        # max blue subgroups the planner may form
                               # per support bucket (a LADDER of
                               # descending segment lengths — admission
                               # is graded in nb, so strong admitters
                               # can run a longer blue segment than a
                               # single group-wide nb allows).  Each
                               # tier is one more compiled executable,
                               # guarded by the same 4/3 score rule as
                               # the single-subgroup split; env override
                               # MUSE_PSFR_BLUE_TIERS.  1 = the
                               # round-4-measured single-subgroup plan;
                               # 0 = AUTO: 2 tiers for multi-direction
                               # runs (ndir >= 9 — measured 1.04 paired
                               # median, 7/8 pairs, on the 9-direction
                               # 1000-row night, healthy link,
                               # measure_blue_tiers.py round 5; the
                               # round-4 wash was link contention), 1
                               # otherwise (single-direction nights are
                               # pull/dispatch-bound and keep the
                               # round-4 plans bit-identical).
    zoom_anchor: str = "off"   # anchored-Taylor evaluation of the OTF
                               # damping exp(alpha_l * Dphi_d) inside the
                               # fused Pallas kernel: ONE anchor
                               # exponential e^x per direction per
                               # wavelength chunk (x = alpha* * Dphi_d,
                               # alpha* the chunk's midpoint alpha) and
                               # every wavelength reconstructed as
                               # e^x * sum_j ((rho_l - 1) x)^j / j!
                               # (rho_l = alpha_l/alpha*) — cutting the
                               # VPU transcendentals per chunk pixel from
                               # ndir*nl to ndir (63 -> 9 at npsflin=3).
                               # "auto": the batch layer certifies the
                               # analytic per-pixel OTF error bound
                               # (otf/psf.py:zoom_anchor_bound) against
                               # zoom_anchor_budget on the host and turns
                               # it on only for multi-direction runs
                               # (ndir >= zoom_anchor_min_ndir) on the
                               # Pallas path; "on"/"off" force it.
                               # Traced-lambda standalone calls see
                               # "auto" as off (certification needs the
                               # host-side wavelength grid).
                               # DEFAULT OFF: measured a net LOSS on TPU
                               # v5 lite (2026-08-17) — the 9-direction
                               # 100-row night ran 228 vs 268 rows/s
                               # (anchor deg8 vs exact), and the kernel
                               # A/B shows the saved exponentials are
                               # repaid with interest in VMEM scratch
                               # read-modify-writes of the (degree+1)
                               # power sums (7.9 vs 6.5 us/lambda
                               # windowed, ~equal at best on the full
                               # bucket across every certifiable
                               # (chunk, degree)); see RESULTS.md
                               # "anchored-Taylor" and
                               # benchmarks/measure_anchor_kernel.py.
    zoom_anchor_degree: int = 8   # Taylor degree of the per-wavelength
                               # reconstruction; the certified bound at
                               # the MUSE grid's worst (bluest) chunk is
                               # ~5e-8 per OTF pixel (budget 1e-6)
    zoom_anchor_budget: float = 1e-6  # max certified per-pixel OTF
                               # abs-error bound for "auto" to engage
    zoom_anchor_min_ndir: int = 4  # anchor sharing only wins when the
                               # anchor exp amortises over directions:
                               # at ndir=1 the per-lambda polynomial
                               # costs more VPU work than the exp it
                               # replaces (measured; RESULTS.md)
    use_pallas: bool = True    # fused exp+zoom-DFT Pallas kernel (TPU
                               # only, float32, dim % 128 == 0; silently
                               # falls back to the XLA zoom path
                               # otherwise).  Builds the direction-
                               # averaged system OTF tile-wise in VMEM
                               # (all wavelengths of a chunk, exp on the
                               # VPU, zoom contraction on the MXU) so it
                               # never hits HBM and the structure
                               # function is read once per chunk; honours
                               # the symmetry fold and support windows.
    pallas_disc_skip: bool = False  # skip fused-kernel work outside the
                               # pupil-autocorrelation (diffraction OTF)
                               # support, where `G * dl` vanishes no
                               # matter the damping: the full-window
                               # slab's corner blocks, ~10% of its VPU
                               # exp work, dropped by a static column-
                               # group split of the kernel call
                               # (otf/psf.py:_disc_block_mask,
                               # ops/zoom_dft.py:fused_exp_zoom_disc;
                               # certified <=1e-12 of the PSF peak).
                               # MEASURED NEGATIVE end-to-end on TPU v5
                               # lite (2026-08-17): the isolated kernel
                               # wins 2-4% at ndir=9, but the night runs
                               # ~5% SLOWER (291 vs 306 rows/s median,
                               # 4/4 alternating reps) — the two extra
                               # launches + the u-concatenation per
                               # lambda chunk repay the savings
                               # (benchmarks/measure_disc_skip.py).
                               # Default off; the machinery stays for
                               # chips/shapes where launch overhead is
                               # smaller.  No-op on windows fully inside
                               # the disc (the default windowed bucket).
    use_pallas_conv: bool = True  # fused Pallas final-PSF convolution
                               # chain (ops/conv_dft.py): both 'same'
                               # convolutions + the middle crop in one
                               # launch, wavelength planes lane-packed
                               # (pallas_conv_pack) so every DFT matmul fills the
                               # 128 lanes at the production L=64
                               # transform size; the intermediate PSF
                               # never exists in HBM.  TPU + float32 +
                               # FFT-free mode only; falls back to the
                               # XLA DFT path otherwise.
    pallas_conv_pack: int = 3  # wavelength planes per fused-conv grid
                               # step (lane-packing factor).  Measured
                               # kernel-level on TPU v5 lite (2026-08-18,
                               # us/row at the production shape, XLA
                               # path 62.4): pack=2 41.2, pack=3 38.1
                               # (best — 35 lambdas pack into 12 groups
                               # with one padded plane), pack=4 42.1
                               # (the block-diagonal right-multiply
                               # matrices grow quadratically in pack and
                               # repay the lane fill past 3).
                               # benchmarks/measure_conv_kernel.py.
    pallas_disc_min_ndir: int = 4  # engage the disc split only at
                               # ndir >= this: the extra kernel launches
                               # + small-group pipeline ramp cost ~20%
                               # at ndir=1; at ndir=9 the isolated
                               # kernel wins but the pipeline loses
                               # (see pallas_disc_skip)

    # --- derived ------------------------------------------------------------
    @property
    def dimall(self) -> int:
        """Correction-zone PSD grid size (2x the pupil, psfrec.py:138)."""
        return 2 * self.dim_pup

    @property
    def pitch(self) -> float:
        """DM inter-actuator distance [m] (psfrec.py:132) — sets the
        fitting-PSD cutoff ``fc``.  The WFS transfer functions use
        :attr:`wfs_pitch` (the reference keeps the two separate:
        psfrec.py:578 vs :582; its reconstructor's ``pitchs_dm``
        parameter is dead)."""
        return self.dpup / self.nact

    @property
    def wfs_pitch(self) -> float:
        """WFS subaperture pitch ``dpup/nsspup`` [m] (psfrec.py:578) —
        drives the WFS transfer-function sinc response and cutoffs.
        Equal to :attr:`pitch` in the GALACSI default (nsspup == nact ==
        24, psfrec.py:77-78)."""
        return self.dpup / self.nsspup

    @property
    def fc(self) -> float:
        """AO fitting cutoff frequency 1/(2*pitch) [1/m]."""
        return 1.0 / (2.0 * self.pitch)

    @property
    def fold_ncols(self):
        """OTF-grid columns actually computed under the symmetry fold.

        ``dim//2 + 128`` (columns 0..dim/2 rounded up to a full 128-lane
        tile; the pad columns carry zero fold weight), or ``None`` when
        the fold does not apply (no zoom-DFT resampling, or ``dim`` not a
        multiple of 256 — the fold needs dim/2 tile-aligned).
        """
        if not (self.use_sym_fold and self.use_zoom_dft
                and self.dim % 256 == 0):
            return None
        return min(self.dim, self.dim // 2 + 128)

    @property
    def otf_window(self):
        """(row_lo, S): the computed OTF block under the symmetry fold.

        Rows ``[c-S, c+S)``, columns ``[c-S, c+128)`` of the full
        (dim, dim) OTF grid, where ``c = dim//2`` and ``S`` is
        ``otf_support`` (full half grid when 0).  ``None`` when the fold
        is off (full grid, no windowing).
        """
        if self.fold_ncols is None:
            return None
        c = self.dim // 2
        S = min(self.otf_support, c) if self.otf_support else c
        if S % 128 != 0 or S <= 0:
            raise ValueError(f"otf_support must be a positive multiple "
                             f"of 128, got {self.otf_support}")
        return (c - S, S)

    @property
    def npup(self) -> int:
        """Pupil support on the full grid [px] (psfrec.py:656)."""
        return self.dim // 2

    @property
    def cdtype(self):
        """Complex dtype matching ``dtype``."""
        return "complex64" if self.dtype == "float32" else "complex128"

    def with_(self, **kw) -> "GalacsiConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = GalacsiConfig()

#: small configuration for multi-chip dry runs and fast unit tests:
#: same code path, tiny grids, red wavelengths only (so the lambda-dependent
#: crop fits inside the small grid).
TINY_CONFIG = GalacsiConfig(dim=256, dim_pup=16, dimpsf=8)
