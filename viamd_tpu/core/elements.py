"""Periodic-table element data.

TPU-native equivalent of mdlib's element tables (reference capability:
md_util.h element inference / radii / masses, used at
/root/reference/src/viamd.cpp:690-692 via md_util_system_postprocess, and the
periodic-table remapping UI in src/components/dataset/dataset.cpp:350).

Data is standard public reference data: atomic masses (CIAAW 2021, rounded),
van-der-Waals radii (Bondi 1964 / Alvarez 2013, Å), covalent radii
(Cordero 2008, Å), and CPK/Jmol display colors.

All tables are NumPy arrays indexed by atomic number (0 = unknown/X), so
per-atom element properties broadcast as simple gathers — which is also how
they are fed to device kernels (radii/mass arrays become jnp gathers).
"""

from __future__ import annotations

import numpy as np

# fmt: off
# symbol, name, mass (u), vdw radius (Å), covalent radius (Å), CPK color (0xRRGGBB)
_ELEMENTS = [
    ("X",  "Unknown",        0.000, 1.50, 0.77, 0xFF00FF),
    ("H",  "Hydrogen",       1.008, 1.10, 0.31, 0xFFFFFF),
    ("He", "Helium",         4.003, 1.40, 0.28, 0xD9FFFF),
    ("Li", "Lithium",        6.941, 1.81, 1.28, 0xCC80FF),
    ("Be", "Beryllium",      9.012, 1.53, 0.96, 0xC2FF00),
    ("B",  "Boron",         10.811, 1.92, 0.84, 0xFFB5B5),
    ("C",  "Carbon",        12.011, 1.70, 0.76, 0x909090),
    ("N",  "Nitrogen",      14.007, 1.55, 0.71, 0x3050F8),
    ("O",  "Oxygen",        15.999, 1.52, 0.66, 0xFF0D0D),
    ("F",  "Fluorine",      18.998, 1.47, 0.57, 0x90E050),
    ("Ne", "Neon",          20.180, 1.54, 0.58, 0xB3E3F5),
    ("Na", "Sodium",        22.990, 2.27, 1.66, 0xAB5CF2),
    ("Mg", "Magnesium",     24.305, 1.73, 1.41, 0x8AFF00),
    ("Al", "Aluminium",     26.982, 1.84, 1.21, 0xBFA6A6),
    ("Si", "Silicon",       28.086, 2.10, 1.11, 0xF0C8A0),
    ("P",  "Phosphorus",    30.974, 1.80, 1.07, 0xFF8000),
    ("S",  "Sulfur",        32.066, 1.80, 1.05, 0xFFFF30),
    ("Cl", "Chlorine",      35.453, 1.75, 1.02, 0x1FF01F),
    ("Ar", "Argon",         39.948, 1.88, 1.06, 0x80D1E3),
    ("K",  "Potassium",     39.098, 2.75, 2.03, 0x8F40D4),
    ("Ca", "Calcium",       40.078, 2.31, 1.76, 0x3DFF00),
    ("Sc", "Scandium",      44.956, 2.11, 1.70, 0xE6E6E6),
    ("Ti", "Titanium",      47.880, 2.14, 1.60, 0xBFC2C7),
    ("V",  "Vanadium",      50.942, 2.03, 1.53, 0xA6A6AB),
    ("Cr", "Chromium",      51.996, 1.97, 1.39, 0x8A99C7),
    ("Mn", "Manganese",     54.938, 1.96, 1.39, 0x9C7AC7),
    ("Fe", "Iron",          55.933, 1.96, 1.32, 0xE06633),
    ("Co", "Cobalt",        58.933, 1.95, 1.26, 0xF090A0),
    ("Ni", "Nickel",        58.693, 1.63, 1.24, 0x50D050),
    ("Cu", "Copper",        63.546, 1.40, 1.32, 0xC88033),
    ("Zn", "Zinc",          65.390, 1.39, 1.22, 0x7D80B0),
    ("Ga", "Gallium",       69.732, 1.87, 1.22, 0xC28F8F),
    ("Ge", "Germanium",     72.610, 2.11, 1.20, 0x668F8F),
    ("As", "Arsenic",       74.922, 1.85, 1.19, 0xBD80E3),
    ("Se", "Selenium",      78.972, 1.90, 1.20, 0xFFA100),
    ("Br", "Bromine",       79.904, 1.85, 1.20, 0xA62929),
    ("Kr", "Krypton",       84.800, 2.02, 1.16, 0x5CB8D1),
    ("Rb", "Rubidium",      84.468, 3.03, 2.20, 0x702EB0),
    ("Sr", "Strontium",     87.620, 2.49, 1.95, 0x00FF00),
    ("Y",  "Yttrium",       88.906, 2.32, 1.90, 0x94FFFF),
    ("Zr", "Zirconium",     91.224, 2.23, 1.75, 0x94E0E0),
    ("Nb", "Niobium",       92.906, 2.18, 1.64, 0x73C2C9),
    ("Mo", "Molybdenum",    95.950, 2.17, 1.54, 0x54B5B5),
    ("Tc", "Technetium",    98.907, 2.16, 1.47, 0x3B9E9E),
    ("Ru", "Ruthenium",    101.070, 2.13, 1.46, 0x248F8F),
    ("Rh", "Rhodium",      102.906, 2.10, 1.42, 0x0A7D8C),
    ("Pd", "Palladium",    106.420, 2.10, 1.39, 0x006985),
    ("Ag", "Silver",       107.868, 1.72, 1.45, 0xC0C0C0),
    ("Cd", "Cadmium",      112.411, 1.58, 1.44, 0xFFD98F),
    ("In", "Indium",       114.818, 1.93, 1.42, 0xA67573),
    ("Sn", "Tin",          118.710, 2.17, 1.39, 0x668080),
    ("Sb", "Antimony",     121.760, 2.06, 1.39, 0x9E63B5),
    ("Te", "Tellurium",    127.600, 2.06, 1.38, 0xD47A00),
    ("I",  "Iodine",       126.904, 1.98, 1.39, 0x940094),
    ("Xe", "Xenon",        131.290, 2.16, 1.40, 0x429EB0),
    ("Cs", "Caesium",      132.905, 3.43, 2.44, 0x57178F),
    ("Ba", "Barium",       137.327, 2.68, 2.15, 0x00C900),
    ("La", "Lanthanum",    138.905, 2.43, 2.07, 0x70D4FF),
    ("Ce", "Cerium",       140.115, 2.42, 2.04, 0xFFFFC7),
    ("Pr", "Praseodymium", 140.908, 2.40, 2.03, 0xD9FFC7),
    ("Nd", "Neodymium",    144.240, 2.39, 2.01, 0xC7FFC7),
    ("Pm", "Promethium",   144.913, 2.38, 1.99, 0xA3FFC7),
    ("Sm", "Samarium",     150.360, 2.36, 1.98, 0x8FFFC7),
    ("Eu", "Europium",     151.965, 2.35, 1.98, 0x61FFC7),
    ("Gd", "Gadolinium",   157.250, 2.34, 1.96, 0x45FFC7),
    ("Tb", "Terbium",      158.925, 2.33, 1.94, 0x30FFC7),
    ("Dy", "Dysprosium",   162.500, 2.31, 1.92, 0x1FFFC7),
    ("Ho", "Holmium",      164.930, 2.30, 1.92, 0x00FF9C),
    ("Er", "Erbium",       167.260, 2.29, 1.89, 0x00E675),
    ("Tm", "Thulium",      168.934, 2.27, 1.90, 0x00D452),
    ("Yb", "Ytterbium",    173.040, 2.26, 1.87, 0x00BF38),
    ("Lu", "Lutetium",     174.967, 2.24, 1.87, 0x00AB24),
    ("Hf", "Hafnium",      178.490, 2.23, 1.75, 0x4DC2FF),
    ("Ta", "Tantalum",     180.948, 2.22, 1.70, 0x4DA6FF),
    ("W",  "Tungsten",     183.850, 2.18, 1.62, 0x2194D6),
    ("Re", "Rhenium",      186.207, 2.16, 1.51, 0x267DAB),
    ("Os", "Osmium",       190.230, 2.16, 1.44, 0x266696),
    ("Ir", "Iridium",      192.220, 2.13, 1.41, 0x175487),
    ("Pt", "Platinum",     195.080, 1.75, 1.36, 0xD0D0E0),
    ("Au", "Gold",         196.967, 1.66, 1.36, 0xFFD123),
    ("Hg", "Mercury",      200.590, 1.55, 1.32, 0xB8B8D0),
    ("Tl", "Thallium",     204.383, 1.96, 1.45, 0xA6544D),
    ("Pb", "Lead",         207.200, 2.02, 1.46, 0x575961),
    ("Bi", "Bismuth",      208.980, 2.07, 1.48, 0x9E4FB5),
    ("Po", "Polonium",     208.982, 1.97, 1.40, 0xAB5C00),
    ("At", "Astatine",     209.987, 2.02, 1.50, 0x754F45),
    ("Rn", "Radon",        222.018, 2.20, 1.50, 0x428296),
    ("Fr", "Francium",     223.020, 3.48, 2.60, 0x420066),
    ("Ra", "Radium",       226.025, 2.83, 2.21, 0x007D00),
    ("Ac", "Actinium",     227.028, 2.47, 2.15, 0x70ABFA),
    ("Th", "Thorium",      232.038, 2.45, 2.06, 0x00BAFF),
    ("Pa", "Protactinium", 231.036, 2.43, 2.00, 0x00A1FF),
    ("U",  "Uranium",      238.029, 2.41, 1.96, 0x008FFF),
    ("Np", "Neptunium",    237.048, 2.39, 1.90, 0x0080FF),
    ("Pu", "Plutonium",    244.064, 2.43, 1.87, 0x006BFF),
    ("Am", "Americium",    243.061, 2.44, 1.80, 0x545CF2),
    ("Cm", "Curium",       247.070, 2.45, 1.69, 0x785CE3),
    ("Bk", "Berkelium",    247.070, 2.44, 1.68, 0x8A4FE3),
    ("Cf", "Californium",  251.080, 2.45, 1.68, 0xA136D4),
    ("Es", "Einsteinium",  252.083, 2.45, 1.65, 0xB31FD4),
    ("Fm", "Fermium",      257.095, 2.45, 1.67, 0xB31FBA),
    ("Md", "Mendelevium",  258.098, 2.46, 1.73, 0xB30DA6),
    ("No", "Nobelium",     259.101, 2.46, 1.76, 0xBD0D87),
    ("Lr", "Lawrencium",   262.110, 2.46, 1.61, 0xC70066),
    ("Rf", "Rutherfordium",261.000, 2.30, 1.57, 0xCC0059),
    ("Db", "Dubnium",      262.000, 2.30, 1.49, 0xD1004F),
    ("Sg", "Seaborgium",   266.000, 2.30, 1.43, 0xD90045),
    ("Bh", "Bohrium",      264.000, 2.30, 1.41, 0xE00038),
    ("Hs", "Hassium",      269.000, 2.30, 1.34, 0xE6002E),
    ("Mt", "Meitnerium",   268.000, 2.30, 1.29, 0xEB0026),
    ("Ds", "Darmstadtium", 281.000, 2.30, 1.28, 0xEE0023),
    ("Rg", "Roentgenium",  280.000, 2.30, 1.21, 0xF10020),
    ("Cn", "Copernicium",  285.000, 2.30, 1.22, 0xF4001D),
    ("Nh", "Nihonium",     286.000, 2.30, 1.36, 0xF6001A),
    ("Fl", "Flerovium",    289.000, 2.30, 1.43, 0xF80017),
    ("Mc", "Moscovium",    290.000, 2.30, 1.62, 0xFA0014),
    ("Lv", "Livermorium",  293.000, 2.30, 1.75, 0xFC0011),
    ("Ts", "Tennessine",   294.000, 2.30, 1.65, 0xFD000E),
    ("Og", "Oganesson",    294.000, 2.30, 1.57, 0xFE000B),
]
# fmt: on

NUM_ELEMENTS = len(_ELEMENTS)

SYMBOLS: tuple[str, ...] = tuple(e[0] for e in _ELEMENTS)
NAMES: tuple[str, ...] = tuple(e[1] for e in _ELEMENTS)
MASSES = np.array([e[2] for e in _ELEMENTS], dtype=np.float32)
VDW_RADII = np.array([e[3] for e in _ELEMENTS], dtype=np.float32)
COVALENT_RADII = np.array([e[4] for e in _ELEMENTS], dtype=np.float32)
CPK_COLORS = np.array([e[5] for e in _ELEMENTS], dtype=np.uint32)

_SYMBOL_TO_Z = {s.upper(): i for i, s in enumerate(SYMBOLS)}
_NAME_TO_Z = {n.upper(): i for i, n in enumerate(NAMES)}

# Common non-element atom names seen in MM force fields / PDB files whose
# leading characters would otherwise mis-resolve (e.g. "HG11" is a hydrogen,
# not mercury; "CA" in a protein residue is an alpha-carbon, not calcium).
_AMINO_ACIDS = {
    "ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS", "ILE",
    "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP", "TYR", "VAL",
    "SEC", "PYL", "ASX", "GLX", "XLE", "UNK", "HSD", "HSE", "HSP", "HID",
    "HIE", "HIP", "CYX", "CYM", "LYN", "GLH", "ASH",
}
_NUCLEIC = {"A", "C", "G", "T", "U", "DA", "DC", "DG", "DT", "DU", "DI"}
_WATER = {"HOH", "H2O", "SOL", "WAT", "TIP", "TIP2", "TIP3", "TIP4", "SPC", "ICE"}


def symbol_to_z(symbol: str) -> int:
    """Resolve an element symbol (case-insensitive) to atomic number; 0 if unknown."""
    return _SYMBOL_TO_Z.get(symbol.strip().upper(), 0)


def name_to_z(name: str) -> int:
    """Resolve a full element name (case-insensitive) to atomic number; 0 if unknown."""
    return _NAME_TO_Z.get(name.strip().upper(), 0)


def infer_element(atom_name: str, res_name: str = "") -> int:
    """Infer atomic number from an atom name + residue context.

    Mirrors the capability of mdlib's element inference pass
    (md_util_system_postprocess, called at /root/reference/src/viamd.cpp:692):
    strip digits/punctuation, then try the two-letter symbol, then one-letter,
    with residue-aware disambiguation for amino acids / nucleic acids / water
    (where atoms are only H/C/N/O/S/P + terminal oxygens).
    """
    name = atom_name.strip()
    # Strip leading digits (e.g. "1HB2", "2H") and common prime marks
    core = name.lstrip("0123456789'\"*")
    if not core:
        return 0
    res = res_name.strip().upper()
    bio = res in _AMINO_ACIDS or res in _NUCLEIC or res in _WATER
    if bio:
        # Biomolecular residues contain only these elements; first letter wins.
        c0 = core[0].upper()
        if c0 in ("H", "C", "N", "O", "S", "P"):
            return _SYMBOL_TO_Z[c0]
    # General heuristics for ambiguous names ("FE"/"CL"/"NA" vs "F"/"C"/"N"):
    # 1. the whole core IS a 2-letter symbol (ion/metal naming) → take it;
    # 2. mixed-case 2-letter prefix ("Fe3") → take it;
    # 3. otherwise the 1-letter symbol wins, falling back to 2-letter prefix.
    if len(core) >= 2:
        z2 = _SYMBOL_TO_Z.get(core[:2].upper(), 0)
        if z2 and (len(core) == 2 or core[1].islower()):
            return z2
        z1 = _SYMBOL_TO_Z.get(core[0].upper(), 0)
        return z1 if z1 else z2
    return _SYMBOL_TO_Z.get(core[0].upper(), 0)


def vdw_radius(z) -> np.ndarray:
    """Van-der-Waals radius (Å) for atomic number(s) z (scalar or array)."""
    return VDW_RADII[np.asarray(z)]


def covalent_radius(z) -> np.ndarray:
    return COVALENT_RADII[np.asarray(z)]


def mass(z) -> np.ndarray:
    return MASSES[np.asarray(z)]


def cpk_color(z) -> np.ndarray:
    return CPK_COLORS[np.asarray(z)]
