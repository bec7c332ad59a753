"""Runtime configuration for the TPU-native urban LES framework.

Mirrors the uDALES namelist groups (reference: src/modstartup.f90:105-172 and the
module-initializer defaults in src/modglobal.f90 / src/modsubgrid.f90:89) so that
reference ``namoptions.<expnr>`` files can be ingested directly.  The design is
functional: one frozen dataclass tree, hashable, usable as a jit static argument.
"""
from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Tuple

# ---------------------------------------------------------------------------
# Enumerations (reference: src/modglobal.f90:95-176, 388-400)
# ---------------------------------------------------------------------------

# Advection schemes (modglobal.f90:397-400)
IADV_UPW = 1
IADV_CD2 = 2
IADV_KAPPA = 7

# Poisson solver flavours (modglobal.f90:388-394)
POISS_FFT2D = 0
POISS_CYC = 1
POISS_FFT3D = 2
POISS_FFT2D_2DECOMP = 3

# Lateral BCs (modglobal.f90:95-136): 1=periodic, 2=profile, 3=driver, 4=custom
BC_PERIODIC = 1
BC_PROFILE = 2
BC_DRIVER = 3
BC_CUSTOM = 4

# Top BCs for momentum (modglobal.f90:140-142)
BCTOPM_FREESLIP = 1
BCTOPM_NOSLIP = 2
BCTOPM_PRESSURE = 3
# Top BCs for scalars (modglobal.f90:144-151): 1=flux, 2=value
BCTOP_FLUX = 1
BCTOP_VALUE = 2

# Bottom BCs (modglobal.f90:160-169)
BCBOTM_FREESLIP = 1
BCBOTM_WF = 2
BCBOTM_WFNEUTRAL = 3
BCBOT_FLUX = 1
BCBOT_WF = 2

# Subgrid models (selected by logicals in the reference, NAMSUBGRID;
# here a single enum for clarity)
SGS_VREMAN = 0
SGS_SMAGORINSKY = 1
SGS_ONEEQN = 2
SGS_DNS = 3  # constant molecular viscosity


@dataclass(frozen=True)
class DomainConfig:
    """&DOMAIN (modstartup.f90) + grid geometry."""
    itot: int = 64
    jtot: int = 64
    ktot: int = 64
    xlen: float = -1.0
    ylen: float = -1.0
    # z grid comes from prof.inp (cell-centre heights); a uniform fallback:
    zsize: float = -1.0
    xlat: float = 52.0        # site latitude/longitude + date (&DOMAIN); used
    xlon: float = 0.0         # by preprocessing (solar position), not the core
    xday: float = 1.0
    xtime: float = 0.0
    ksp: int = -1             # lowest sponge-layer level, 1-based as in the
                              # reference (modboundary.f90:47-49); -1 = default


@dataclass(frozen=True)
class RunConfig:
    """&RUN (modstartup.f90:105-172)."""
    iexpnr: int = 0
    runtime: float = 300.0
    dtmax: float = 20.0
    trestart: float = 10000.0
    ladaptive: bool = False
    courant: float = -1.0     # <0 means scheme default (modglobal.f90:563-577)
    diffnr: float = 0.25
    lrandomize: bool = True
    irandom: int = 43
    randu: float = 0.01
    randthl: float = 0.0      # read by the reference (&RUN) but the current
    randqt: float = 0.0       # code only randomizes u/v/w (modstartup.f90:1212)
    krand: int = 10**9        # capped at ktot
    libm: bool = True         # master IBM switch (modglobal.f90:190)
    lwalldist: bool = False   # accepted; unused by the reference solver too
    lreadmean: bool = False
    lper2inout: bool = False
    nprocx: int = 1           # informational; TPU mesh shape set separately
    nprocy: int = 1
    lwarmstart: bool = False
    lstratstart: bool = False  # warmstart but re-impose thl/qt from prof.inp
                               # (modstartup.f90:991-1084)
    startfile: str = ""
    runmode: int = 1


@dataclass(frozen=True)
class PhysicsConfig:
    """&PHYSICS."""
    lbuoyancy: bool = False
    ltempeq: bool = False
    lmoist: bool = False
    lcoriol: bool = False
    lprofforc: bool = False
    ifixuinf: int = 0
    lvinf: bool = False
    tscale: float = -1.0
    uflowrate: float = 1.0
    vflowrate: float = 1.0
    luoutflowr: bool = False
    lvoutflowr: bool = False
    luvolflowr: bool = False
    lvvolflowr: bool = False
    xlat: float = 52.0
    xlon: float = 0.0
    ps: float = 101325.0      # surface pressure [Pa]
    igrw_damp: int = 0
    geodamptime: float = 7200.0
    lnudge: bool = False
    lnudgevel: bool = True
    tnudge: float = 60.0
    nnudge: int = 0
    dpdx: float = 0.0         # constant streamwise pressure gradient
    lmomsubs: bool = False    # subsidence acts on momentum too
    ds: float = 0.0           # shifted-PBC spanwise shift
    inletav: float = 0.0      # averaging time for the ifixuinf=2 controller
    # time-dependent forcing switches (&PHYSICS, modtimedep.f90)
    ltimedepsurf: bool = False
    ntimedepsurf: int = 0
    ltimedepnudge: bool = False
    ntimedepnudge: int = 0
    ltimedeplw: bool = False
    ntimedeplw: int = 0
    ltimedepsw: bool = False
    ntimedepsw: int = 0
    lconservativeibm: bool = False  # conservative cd2 scalar IBM correction


@dataclass(frozen=True)
class DynamicsConfig:
    """&DYNAMICS."""
    iadv_mom: int = IADV_CD2
    iadv_tke: int = -1
    iadv_thl: int = -1
    iadv_qt: int = -1
    iadv_sv: int = IADV_KAPPA  # scalars forced to kappa (modglobal.f90:556-560)
    ipoiss: int = POISS_FFT2D
    lqlnr: bool = False        # Newton-Raphson saturation adjustment
                               # (modthermodynamics.f90:449-476)
    lles: bool = True


@dataclass(frozen=True)
class BCConfig:
    """&BC boundary-condition switches (modglobal.f90:95-176)."""
    BCxm: int = BC_PERIODIC
    BCxT: int = BC_PERIODIC
    BCxq: int = BC_PERIODIC
    BCxs: int = BC_PERIODIC
    BCym: int = BC_PERIODIC
    BCyT: int = BC_PERIODIC
    BCyq: int = BC_PERIODIC
    BCys: int = BC_PERIODIC
    BCtopm: int = BCTOPM_FREESLIP
    BCtopT: int = BCTOP_FLUX
    BCtopq: int = BCTOP_FLUX
    BCtops: int = BCTOP_FLUX
    BCbotm: int = BCBOTM_WF
    BCbotT: int = BCBOT_FLUX
    BCbotq: int = BCBOT_FLUX
    BCbots: int = BCBOT_FLUX
    BCzp: int = 1              # 1: tridiagonal in z, 2: cosine transform
    bctfz: float = 0.0         # top temperature flux (wttop)
    bctfxm: float = 0.0
    bctfxp: float = 0.0
    bctfym: float = 0.0
    bctfyp: float = 0.0
    # fixed IBM facet moisture fluxes for iwallmoist==1 (modibm.f90:1555-1570)
    bcqfxm: float = 0.0
    bcqfxp: float = 0.0
    bcqfym: float = 0.0
    bcqfyp: float = 0.0
    bcqfz: float = 0.0
    wttop: float = 0.0
    wqtop: float = 0.0
    thl_top: float = -1.0
    qt_top: float = -1.0
    qts: float = 0.0           # surface specific humidity; bottom qt0h value
                               # (modthermodynamics.f90:536). The reference
                               # defaults to the sentinel -1; 0 is used here so
                               # dry runs get physical near-surface buoyancy.
    wsvsurfdum: float = 0.0    # scalar surface/top fluxes: read by the
    wsvtopdum: float = 0.0     # reference but unused downstream (accepted)
    wtsurf: float = -1.0
    wqsurf: float = -1.0
    thls: float = -1.0
    z0: float = -1.0
    z0h: float = -1.0
    Uinf: float = 0.0
    Vinf: float = 0.0


@dataclass(frozen=True)
class WallsConfig:
    """&WALLS (modstartup.f90:152): IBM input sizes + wall-function selection."""
    nfcts: int = -1
    nsolpts_u: int = 0
    nsolpts_v: int = 0
    nsolpts_w: int = 0
    nsolpts_c: int = 0
    nbndpts_u: int = 0
    nbndpts_v: int = 0
    nbndpts_w: int = 0
    nbndpts_c: int = 0
    nfctsecs_u: int = 0
    nfctsecs_v: int = 0
    nfctsecs_w: int = 0
    nfctsecs_c: int = 0
    iwallmom: int = 2   # 1: zero-flux, 2: stability wall function, 3: neutral
    iwalltemp: int = 1  # 1: fixed flux, 2: wall function
    iwallmoist: int = 1
    iwallscal: int = 1
    prandtlturb: float = 0.71  # turbulent Prandtl in the Uno stability
                               # functions (&WALLS, modglobal.f90:304)
    fkar: float = 0.41         # von Karman constant (&WALLS; accepted)
    lbottom: bool = False
    lnorec: bool = False  # disable reconstruction-point interpolation
    lwritefac: bool = False
    dtfac: float = 10.0


@dataclass(frozen=True)
class SubgridConfig:
    """&NAMSUBGRID (modsubgrid.f90:89)."""
    model: int = SGS_VREMAN      # lvreman default true in uDALES namelists
    lvreman: bool = True
    lsmagorinsky: bool = False
    loneeqn: bool = False
    lbuoycorr: bool = False
    cf: float = 2.5
    cn: float = 0.76
    rigc: float = 0.25
    prandtl: float = 0.333      # turbulent Prandtl (prandtli = 1/3 default)
    lmason: bool = False
    cs: float = -1.0
    nmason: float = 2.0
    c_vreman: float = 0.07


@dataclass(frozen=True)
class ScalarsConfig:
    """&SCALARS."""
    nsv: int = 0
    lreadscal: bool = False
    lscasrc: bool = False
    lscasrcl: bool = False
    lscasrcr: bool = False
    nscasrc: int = 0
    nscasrcl: int = 0


@dataclass(frozen=True)
class EnergyBalanceConfig:
    """&ENERGYBALANCE (modEB.f90 + initfac.f90)."""
    lEB: bool = False
    lwriteEBfiles: bool = False
    lperiodicEBcorr: bool = False
    lconstW: bool = False
    dtEB: float = 10.0
    bldT: float = 0.0
    flrT: float = 0.0
    wsoil: float = 0.0
    wgrmax: float = 450.0
    wwilt: float = 171.0
    wfc: float = 313.0
    skyLW: float = 0.0
    GRLAI: float = 2.0
    rsmin: float = 110.0
    nfaclyrs: int = 3
    lfacTlyrs: bool = False
    lvfsparse: bool = False
    nnz: int = 0
    fraction: float = 1.0
    sinkbase: int = 0


@dataclass(frozen=True)
class DriverConfig:
    """&DRIVER / &INLET (moddriver.f90, modinlet.f90)."""
    idriver: int = 0
    iinletgen: int = 0
    tdriverstart: float = 0.0
    dtdriver: float = 0.1
    driverstore: int = 0
    driverjobnr: int = 0
    iplane: int = 0
    lchunkread: bool = False
    chunkread_size: int = 100
    iangledeg: float = 0.0
    # &INLET legacy rescale-recycle generator options (modinlet.f90)
    di: float = 0.0            # inlet BL thickness
    dti: float = 0.0           # inlet thermal BL thickness
    linletRA: bool = False     # running average instead of fixed inletav
    lstoreplane: bool = False  # record inlet planes to file
    lreadminl: bool = False
    lfixinlet: bool = False    # freeze the mean inlet profiles
    lfixutauin: bool = False   # freeze utau at the inlet
    lwallfunc: bool = True


@dataclass(frozen=True)
class ChemistryConfig:
    """&CHEMISTRY (modchem.f90)."""
    lchem: bool = False
    k1: float = 0.0
    JNO2: float = 0.0


@dataclass(frozen=True)
class TreesConfig:
    """&TREES (vegetation.f90)."""
    ltrees: bool = False
    itree_mode: int = 1
    ntrees: int = 0
    cd: float = 0.0
    ud: float = 0.0
    lad: float = 0.0
    lsize: float = 0.0
    r_s: float = 0.0
    dec: float = 0.0
    Qstar: float = 0.0
    dQdt: float = 0.0


@dataclass(frozen=True)
class PurifsConfig:
    """&PURIFS (modpurifiers.f90)."""
    lpurif: bool = False
    npurif: int = 0
    Qpu: float = 0.0
    epu: float = 0.0


@dataclass(frozen=True)
class HeatpumpConfig:
    """&HEATPUMP (heatpump.f90)."""
    lheatpump: bool = False
    lfan_hp: bool = True
    nhppoints: int = 0
    QH_dot_hp: float = 0.0
    Q_dot_hp: float = 0.0


@dataclass(frozen=True)
class OutputConfig:
    """&OUTPUT (modstatsdump.f90:85 + modglobal switches)."""
    lfielddump: bool = False
    tfielddump: float = 10000.0
    fieldvars: str = ""
    ltdump: bool = False
    lmintdump: bool = False
    ltreedump: bool = False
    lxydump: bool = False
    lxytdump: bool = False
    lydump: bool = False
    lytdump: bool = False
    ltkedump: bool = False
    lkslicedump: bool = False
    lislicedump: bool = False
    ljslicedump: bool = False
    kslice: int = 1
    islice: int = 1
    jslice: int = 1
    tstatsdump: float = 10000.0
    tsample: float = 5.0
    tstatstart: float = 0.0
    tcheck: float = 0.0


@dataclass(frozen=True)
class Config:
    """Full solver configuration — the union of all namelist groups."""
    domain: DomainConfig = field(default_factory=DomainConfig)
    run: RunConfig = field(default_factory=RunConfig)
    physics: PhysicsConfig = field(default_factory=PhysicsConfig)
    dynamics: DynamicsConfig = field(default_factory=DynamicsConfig)
    bc: BCConfig = field(default_factory=BCConfig)
    walls: WallsConfig = field(default_factory=WallsConfig)
    subgrid: SubgridConfig = field(default_factory=SubgridConfig)
    scalars: ScalarsConfig = field(default_factory=ScalarsConfig)
    eb: EnergyBalanceConfig = field(default_factory=EnergyBalanceConfig)
    driver: DriverConfig = field(default_factory=DriverConfig)
    chem: ChemistryConfig = field(default_factory=ChemistryConfig)
    trees: TreesConfig = field(default_factory=TreesConfig)
    purifs: PurifsConfig = field(default_factory=PurifsConfig)
    heatpump: HeatpumpConfig = field(default_factory=HeatpumpConfig)
    output: OutputConfig = field(default_factory=OutputConfig)
    # numerical precision for field arrays ("float32" | "float64" | "bfloat16")
    dtype: str = "float32"

    # ---------------------------------------------------------------
    # Derived quantities (reference: modglobal.f90:initglobal)
    # ---------------------------------------------------------------
    @property
    def courant(self) -> float:
        """Scheme-dependent default Courant number (modglobal.f90:563-577)."""
        if self.run.courant > 0:
            return self.run.courant
        c = 1.5 if self.dynamics.iadv_mom == IADV_CD2 else 1.4
        schemes = (self.iadv_thl, self.iadv_qt, self.iadv_tke, self.dynamics.iadv_sv)
        if any(s in (IADV_KAPPA, IADV_UPW) for s in schemes):
            c = min(c, 1.1)
        return c

    @property
    def iadv_thl(self) -> int:
        v = self.dynamics.iadv_thl
        return self.dynamics.iadv_mom if v < 0 else v

    @property
    def iadv_qt(self) -> int:
        v = self.dynamics.iadv_qt
        return self.dynamics.iadv_mom if v < 0 else v

    @property
    def iadv_tke(self) -> int:
        v = self.dynamics.iadv_tke
        return self.dynamics.iadv_mom if v < 0 else v

    @property
    def halo(self) -> int:
        """Max halo width needed in x/y. Reference varies per-scheme
        (modglobal.f90:585-609); we always carry the max (2 with kappa)."""
        schemes = (self.dynamics.iadv_mom, self.iadv_thl, self.iadv_qt,
                   self.iadv_tke, self.dynamics.iadv_sv)
        return 2 if (IADV_KAPPA in schemes or IADV_UPW in schemes) else 1


# ---------------------------------------------------------------------------
# Fortran namelist parsing (reads reference namoptions.<expnr> files)
# ---------------------------------------------------------------------------

_NML_GROUP_RE = re.compile(r"&(\w+)(.*?)(?:^|\n)\s*/", re.S)
_NML_ITEM_RE = re.compile(r"(\w+)\s*=\s*([^\n!]+)")


def _parse_value(raw: str):
    raw = raw.strip().rstrip(",").strip()
    low = raw.lower()
    if low in (".true.", "t", ".t."):
        return True
    if low in (".false.", "f", ".f."):
        return False
    if raw.startswith("'") or raw.startswith('"'):
        return raw.strip("'\"")
    # list of values (iadv_sv = 7,7 etc.) -> take as tuple
    parts = raw.replace(",", " ").split()
    vals = []
    for p in parts:
        try:
            vals.append(int(p))
        except ValueError:
            try:
                vals.append(float(p))
            except ValueError:
                vals.append(p)
    if len(vals) == 1:
        return vals[0]
    return tuple(vals)


def parse_namelists(text: str) -> dict:
    """Parse a Fortran namelist file into {GROUP: {key: value}} (keys lowercase)."""
    groups: dict = {}
    for m in _NML_GROUP_RE.finditer(text):
        gname = m.group(1).upper()
        body = m.group(2)
        items = {}
        for line in body.splitlines():
            line = line.split("!")[0]
            for im in _NML_ITEM_RE.finditer(line):
                items[im.group(1).lower()] = _parse_value(im.group(2))
        groups.setdefault(gname, {}).update(items)
    return groups


def _apply(dc, values: dict):
    """Return a dataclass copy updated with matching keys from `values`."""
    names = {f.name.lower(): f.name for f in dataclasses.fields(dc)}
    updates = {}
    for k, v in values.items():
        if k in names:
            fname = names[k]
            ftype = type(getattr(dc, fname))
            if isinstance(v, tuple):
                v = v[0]  # per-scalar arrays: take the uniform value
            if ftype is bool:
                v = bool(v)
            elif ftype is int and not isinstance(v, bool):
                v = int(v)
            elif ftype is float:
                v = float(v)
            updates[fname] = v
    return dataclasses.replace(dc, **updates) if updates else dc


def load_namoptions(path: str | Path, dtype: str = "float32") -> Config:
    """Build a Config from a reference ``namoptions.<expnr>`` file.

    Group-to-dataclass mapping follows modstartup.f90:105-172. Unknown keys are
    ignored (the preprocessor's &INPS group, for instance).
    """
    text = Path(path).read_text()
    g = parse_namelists(text)
    cfg = Config(dtype=dtype)
    merged_bc = {**g.get("BC", {}), **g.get("INLET", {})}
    cfg = dataclasses.replace(
        cfg,
        domain=_apply(cfg.domain, g.get("DOMAIN", {})),
        run=_apply(cfg.run, g.get("RUN", {})),
        # xlat/xlon live in &DOMAIN in the reference but drive coriolis
        # (physics); apply DOMAIN keys to physics too so they land there.
        physics=_apply(cfg.physics,
                       {**g.get("DOMAIN", {}), **g.get("PHYSICS", {})}),
        dynamics=_apply(cfg.dynamics, g.get("DYNAMICS", {})),
        bc=_apply(cfg.bc, merged_bc),
        walls=_apply(cfg.walls, g.get("WALLS", {})),
        subgrid=_apply(cfg.subgrid, g.get("NAMSUBGRID", {})),
        scalars=_apply(cfg.scalars, g.get("SCALARS", {})),
        eb=_apply(cfg.eb, g.get("ENERGYBALANCE", {})),
        driver=_apply(cfg.driver, {**g.get("DRIVER", {}), **g.get("INLET", {})}),
        chem=_apply(cfg.chem, g.get("CHEMISTRY", {})),
        trees=_apply(cfg.trees, g.get("TREES", {})),
        purifs=_apply(cfg.purifs, g.get("PURIFS", {})),
        heatpump=_apply(cfg.heatpump, g.get("HEATPUMP", {})),
        output=_apply(cfg.output, g.get("OUTPUT", {})),
    )
    # subgrid model enum from logicals (reference NAMSUBGRID logicals)
    sg = cfg.subgrid
    if sg.loneeqn:
        model = SGS_ONEEQN
    elif sg.lsmagorinsky:
        model = SGS_SMAGORINSKY
    elif sg.lvreman:
        model = SGS_VREMAN
    else:
        model = SGS_VREMAN if cfg.dynamics.lles else SGS_DNS
    if not cfg.dynamics.lles:
        model = SGS_DNS
    cfg = dataclasses.replace(cfg, subgrid=dataclasses.replace(sg, model=model))
    return cfg


# Physical constants (reference: src/modglobal.f90:270-325)
class const:
    pi = 3.141592653589793116
    grav = 9.81
    rd = 287.04
    rv = 461.5
    cp = 1004.0
    rlv = 2.26e6
    ep = rd / rv
    ep2 = rv / rd - 1.0
    rcp = rd / cp
    cpr = cp / rd
    rlvocp = rlv / cp
    rhoa = 1.2
    numol = 1.5e-5
    prandtlmol = 0.71
    prandtlmoli = 1.0 / 0.71
    rhow = 0.998e3
    pref0 = 1.0e5
    tmelt = 273.16
    es0 = 610.78
    at = 17.27
    bt = 35.86
    ekmin = 1.0e-12
    e12min = 5.0e-5
    fkar = 0.41
    eps1 = 1.0e-10
    epscloud = 1.0e-5
    boltz = 5.67e-8
    chi_half = 0.5
